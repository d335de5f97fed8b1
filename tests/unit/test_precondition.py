"""Energy-basis (congruence) preconditioning of the space dimension:
amplitude invariance + float32 accuracy (the TPU bench precision story)."""

import numpy as np
import jax.numpy as jnp

from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0, evaluate_modes_1d


class TestPrecondition:
    def test_amplitudes_invariant_f64(self):
        sep, Vs = parametric_elliptic(n_x=40, n_p=12, num_params=2)
        res_plain = SeparatedPGD(sep, n_max=8, tol=1e-12, tol_fp=1e-8).solve()
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        res_pc = SeparatedPGD(sep_pc, n_max=8, tol=1e-12, tol_fp=1e-8).solve()
        n = min(res_plain.n_modes, res_pc.n_modes)
        np.testing.assert_allclose(
            res_plain.amplitudes[:n], res_pc.amplitudes[:n], rtol=1e-8
        )
        # reconstructed full-dof modes agree with the plain run (rank-1
        # product comparison at a parameter point)
        full0 = tf.modes_to_full(res_pc.modes[0])
        p = (0.25, 0.5)
        for res, m0 in [(res_plain, np.asarray(res_plain.modes[0])), (res_pc, full0)]:
            fac = np.ones(n)
            for j, pj in enumerate(p):
                vals = np.asarray(
                    evaluate_modes_1d(Vs[1 + j], res.modes[1 + j], np.asarray([pj]), xp=np)
                )[0]
                fac *= vals[:n]
            u = fac @ m0[:n]
            if res is res_plain:
                u_ref = u
        np.testing.assert_allclose(u, u_ref, rtol=1e-8, atol=1e-12)

    def test_f32_accuracy(self):
        # the whole point: f32 solves in the energy basis stay accurate
        sep, Vs = parametric_elliptic(n_x=256, n_p=32, num_params=2)
        sep_pc, tf = precondition_dim0(sep, dtype=np.float32)
        res32 = SeparatedPGD(sep_pc, n_max=20, tol=1e-12, tol_fp=1e-6).solve()

        res64 = SeparatedPGD(sep, n_max=20, tol=1e-12, tol_fp=1e-6).solve()
        n = min(res32.n_modes, res64.n_modes)
        # amplitudes agree to f32 resolution while above the f32 noise floor
        sig = res64.amplitudes[:n] > 1e-4
        np.testing.assert_allclose(
            res32.amplitudes[:n][sig].astype(np.float64),
            res64.amplitudes[:n][sig],
            rtol=1e-3,
        )

        # reconstruction at an on-grid parameter point vs the f64 solution
        full0 = tf.modes_to_full(res32.modes[0]).astype(np.float64)
        p = (0.375, 0.75)
        fac32 = np.ones(res32.n_modes)
        fac64 = np.ones(res64.n_modes)
        for j, pj in enumerate(p):
            v32 = np.asarray(
                evaluate_modes_1d(Vs[1 + j], res32.modes[1 + j], np.asarray([pj]), xp=np)
            )[0]
            fac32 *= v32[: res32.n_modes]
            v64 = np.asarray(
                evaluate_modes_1d(Vs[1 + j], res64.modes[1 + j], np.asarray([pj]), xp=np)
            )[0]
            fac64 *= v64[: res64.n_modes]
        u32 = fac32 @ full0[: res32.n_modes]
        u64 = fac64 @ np.asarray(res64.modes[0])[: res64.n_modes]
        err = np.linalg.norm(u32 - u64) / np.linalg.norm(u64)
        print("f32 vs f64 reconstruction rel err:", err)
        assert err < 5e-6


class TestPreconditionAnyDim:
    def test_composed_dims_amplitudes_invariant(self):
        # precondition_dim generalizes the congruence to ANY dim: composing
        # dim-0 and dim-1 transforms must leave amplitudes and the
        # reconstructed rank-1 fields invariant (f64)
        from pgdrome_tpu.separated import precondition_dim

        sep, Vs = parametric_elliptic(n_x=24, n_p=10, num_params=2)
        res_plain = SeparatedPGD(sep, n_max=6, tol=1e-12, tol_fp=1e-9).solve()

        sep0, tf0 = precondition_dim(sep, dim=0, dtype=np.float64)
        sep01, tf1 = precondition_dim(sep0, dim=1, dtype=np.float64)
        assert tf1.dim == 1
        res_pc = SeparatedPGD(sep01, n_max=6, tol=1e-12, tol_fp=1e-9).solve()

        n = min(res_plain.n_modes, res_pc.n_modes)
        # the two bases iterate the (converged) fixed point differently;
        # late small modes can differ at ~1e-6 relative
        np.testing.assert_allclose(
            res_plain.amplitudes[:n], res_pc.amplitudes[:n], rtol=1e-5
        )

        # reconstruct u at an on-grid sample: back-transform each dim with
        # its own transform, then compare against the plain solve
        full0 = tf0.modes_to_full(res_pc.modes[0])
        full1 = tf1.modes_to_full(res_pc.modes[1])
        grid1 = Vs[1].tabulate_dof_coordinates()[:, 0]
        ip, p2 = 3, 0.5
        fac_pc = full1[:n, ip] * np.asarray(
            evaluate_modes_1d(Vs[2], res_pc.modes[2], np.asarray([p2]), xp=np)
        )[0][:n]
        u_pc = fac_pc @ full0[:n]
        fac_pl = np.asarray(res_plain.modes[1])[:n, ip] * np.asarray(
            evaluate_modes_1d(Vs[2], res_plain.modes[2], np.asarray([p2]), xp=np)
        )[0][:n]
        u_pl = fac_pl @ np.asarray(res_plain.modes[0])[:n]
        np.testing.assert_allclose(u_pc, u_pl, rtol=1e-5, atol=1e-10)


class TestMinresF32Recipe:
    """The f32-stable minimal-residual recipe: diag-sum congruence bases
    (ne_dim_base, Cauchy-Schwarz bounds the ne cross terms) + Euclidean
    mid-sweep renorm (renorm_sweep).  Without BOTH, the f32 solve NaNs on
    the first sweep at scale (measured at n_t=257)."""

    def test_f32_matches_f64(self):
        from pgdrome_tpu.models.problems import moving_heat_source
        from pgdrome_tpu.separated import (
            ne_dim_base, normal_equations, precondition_dim,
        )

        sep, Vs, factors, _ = moving_heat_source(
            n_x=48, n_t=32, n_P=6, n_v=8, af=0.12, source_rank=20
        )
        ne = normal_equations(sep)
        ne_pc, tf = precondition_dim(ne, dim=0, dtype=np.float64,
                                     base=ne_dim_base(sep, 0))
        ne_pc, tf1 = precondition_dim(ne_pc, dim=1, dtype=np.float64,
                                      base=ne_dim_base(sep, 1))
        res = {}
        for dt in (np.float64, np.float32):
            res[dt] = SeparatedPGD(
                ne_pc, n_max=6, tol=0.0, tol_fp=1e-6, solver="chol",
                residual_check=False, dtype=dt, renorm_sweep=True,
            ).solve()
        n = min(res[np.float64].n_modes, res[np.float32].n_modes)
        assert n >= 4
        np.testing.assert_allclose(
            np.asarray(res[np.float32].amplitudes[:n], dtype=np.float64),
            res[np.float64].amplitudes[:n], rtol=1e-3,
        )

    def test_renorm_sweep_invariant_on_well_scaled(self):
        # on a well-scaled linear problem the mid-sweep renormalization
        # must not change the computed amplitudes (rank-1 products are
        # invariant under redistributing scale between factors); the stop
        # metric is RELATIVE under renorm vs the reference's absolute, so
        # the two may stop a converged fixed point 1-2 sweeps apart —
        # compare at the fp-tolerance level, not exactly
        sep, Vs = parametric_elliptic(n_x=30, n_p=10, num_params=2)
        kw = dict(n_max=6, tol=1e-12, tol_fp=1e-9)
        a = SeparatedPGD(sep, **kw).solve()
        b = SeparatedPGD(sep, renorm_sweep=True, **kw).solve()
        n = min(a.n_modes, b.n_modes)
        np.testing.assert_allclose(
            a.amplitudes[:n], b.amplitudes[:n], rtol=1e-4
        )

    def test_renorm_sweep_rejects_scan_params(self):
        import pytest

        sep, Vs = parametric_elliptic(n_x=12, n_p=6, num_params=2)
        with pytest.raises(ValueError, match="renorm_sweep"):
            SeparatedPGD(sep, renorm_sweep=True, scan_params=True)


class TestEquilibrate:
    def test_solution_invariant(self):
        # moving scalar factors between dims of the same tensor term must
        # not change relative amplitudes or the reconstructed field
        from pgdrome_tpu.separated import equilibrate

        sep, Vs = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        # make the scales artificially wild: the raw problem is well-scaled
        import dataclasses
        ops = [np.asarray(o).copy() for o in sep.ops]
        rhs = [np.asarray(r).copy() for r in sep.rhs]
        ops[1] *= 1e6
        ops[0] /= 1e6
        rhs[2] *= 1e4
        rhs[0] /= 1e4
        from pgdrome_tpu.separated import SeparatedProblem
        wild = SeparatedProblem(ops=ops, rhs=rhs, mass=list(sep.mass),
                                bc_dofs=list(sep.bc_dofs))
        eq = equilibrate(wild)
        for d in range(eq.num_dims):
            if d:
                assert np.max(np.abs(np.asarray(eq.ops[d]))) <= 1.0 + 1e-12
        kw = dict(n_max=5, tol=1e-12, tol_fp=1e-9)
        a = SeparatedPGD(sep, **kw).solve()
        b = SeparatedPGD(eq, **kw).solve()
        n = min(a.n_modes, b.n_modes)
        np.testing.assert_allclose(
            a.amplitudes[:n], b.amplitudes[:n], rtol=1e-5
            # (fp stop boundary: the rescaled norms round differently)
        )
