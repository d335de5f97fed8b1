"""End-to-end recipe pipelines (recipes.py) at test scale."""

import numpy as np
import pytest

from pgdrome_tpu.models.problems import moving_heat_source, parametric_elliptic
from pgdrome_tpu.recipes import two_stage_elliptic, two_stage_minres
from pgdrome_tpu.separated import evaluate_modes_1d


class TestTwoStageElliptic:
    def test_beats_plain_single_stage(self):
        from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0

        sep, Vs = parametric_elliptic(n_x=64, n_p=16, num_params=2,
                                      degree_x=2)
        res, tf = two_stage_elliptic(
            sep, n_stage1=12, n_stage2=8, n_deploy=10, dtype=np.float32
        )
        assert res.n_modes == 10

        # verify against per-sample f64 FEM at a few on-grid points
        from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix

        full0 = tf.modes_to_full(res.modes[0]).astype(np.float64)
        grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        b_full = load_vector(Vs[0], lambda x: np.ones_like(x))
        errs = []
        for p in [(grid[3], grid[5]), (grid[-2], grid[1])]:
            kap = lambda x: 1.0 + sum(
                p[i] * np.sin((i + 1) * np.pi * x) ** 2 / 4.0
                for i in range(2)
            )
            K = stiffness_matrix(Vs[0], weight=kap)
            u_ref = np.zeros(K.shape[0])
            u_ref[1:-1] = np.linalg.solve(K[1:-1, 1:-1], b_full[1:-1])
            fac = np.ones(res.n_modes)
            for j in range(2):
                vals = np.asarray(evaluate_modes_1d(
                    Vs[1 + j], res.modes[1 + j], np.asarray([p[j]]), xp=np
                ))[0]
                fac *= vals[: res.n_modes].astype(np.float64)
            u = fac @ full0[: res.n_modes]
            errs.append(np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref))
        two_stage_err = max(errs)

        # single-stage f32 at the same total budget for comparison
        sep_pc, tf1 = precondition_dim0(sep, dtype=np.float64)
        res1 = SeparatedPGD(sep_pc, n_max=20, tol=0.0, tol_fp=1e-7,
                            residual_check=False,
                            dtype=np.float32).solve_fused()
        full1 = tf1.modes_to_full(res1.modes[0]).astype(np.float64)
        errs1 = []
        for p in [(grid[3], grid[5]), (grid[-2], grid[1])]:
            kap = lambda x: 1.0 + sum(
                p[i] * np.sin((i + 1) * np.pi * x) ** 2 / 4.0
                for i in range(2)
            )
            K = stiffness_matrix(Vs[0], weight=kap)
            u_ref = np.zeros(K.shape[0])
            u_ref[1:-1] = np.linalg.solve(K[1:-1, 1:-1], b_full[1:-1])
            fac = np.ones(res1.n_modes)
            for j in range(2):
                vals = np.asarray(evaluate_modes_1d(
                    Vs[1 + j], res1.modes[1 + j], np.asarray([p[j]]), xp=np
                ))[0]
                fac *= vals[: res1.n_modes].astype(np.float64)
            u = fac @ full1[: res1.n_modes]
            errs1.append(np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref))

        assert two_stage_err < 5e-5, f"two-stage err {two_stage_err:.3e}"
        assert two_stage_err <= max(errs1) * 1.5, (
            f"two-stage {two_stage_err:.3e} should not lose to "
            f"single-stage {max(errs1):.3e}"
        )


class TestTwoStageMinres:
    def test_transient_error_drops(self):
        sep, Vs, factors, sep_err = moving_heat_source(
            n_x=48, n_t=32, n_P=6, n_v=8, af=0.12, source_rank=24
        )
        res = two_stage_minres(sep, n_stage1=16, n_stage2=10,
                               dtype=np.float32)
        assert res.n_modes >= 20
        # every dim is nodal: reconstruct at one (t,P,v) grid point and
        # compare against a dense space-time solve
        from scipy import sparse as sps
        from scipy.sparse import linalg as spla

        nx, nt = sep.sizes[0], sep.sizes[1]
        ip, iv = 3, 4
        P_val = Vs[2].tabulate_dof_coordinates()[ip, 0]
        Mx = np.asarray(sep.mass[0])
        Mt = np.asarray(sep.ops[1][1])
        A = (sps.kron(sps.csr_matrix(np.asarray(sep.ops[0][0])),
                      sps.csr_matrix(np.asarray(sep.ops[1][0])))
             + sps.kron(sps.csr_matrix(np.asarray(sep.ops[0][1])),
                        sps.csr_matrix(np.asarray(sep.ops[1][1])))).tolil()
        b = sum(
            np.kron(P_val * factors[2][r][iv] * (Mx @ factors[0][r]),
                    Mt @ factors[1][r])
            for r in range(factors[0].shape[0])
        )
        for ix in range(nx):
            rr = ix * nt
            A.rows[rr] = [rr]
            A.data[rr] = [1.0]
            b[rr] = 0.0
        u_fom = spla.spsolve(A.tocsr(), b).reshape(nx, nt)
        K = res.n_modes
        fac = (np.asarray(res.modes[2])[:K, ip]
               * np.asarray(res.modes[3])[:K, iv])
        u = np.einsum("k,ki,kj->ij", fac, np.asarray(res.modes[0])[:K],
                      np.asarray(res.modes[1])[:K])
        err = np.linalg.norm(u - u_fom) / np.linalg.norm(u_fom)
        # the separation floor bounds what's reachable; the two-stage
        # pipeline must land near it (single-stage f32 floors higher)
        assert err < max(5 * sep_err, 2e-3), f"err {err:.3e} (sep {sep_err:.3e})"


class TestAdaptiveMinres:
    def test_reaches_bound_with_transient_verifier(self):
        from pgdrome_tpu.models.problems import transient_dense_verifier
        from pgdrome_tpu.recipes import adaptive_minres

        sep, Vs, factors, sep_err = moving_heat_source(
            n_x=40, n_t=28, n_P=6, n_v=8, af=0.15, source_rank=24
        )
        verify = transient_dense_verifier(sep, Vs, factors, af=0.15,
                                          true_source=False, n_random=3,
                                          seeds=(7,))
        bound = max(5 * sep_err, 2e-3)
        best, history = adaptive_minres(
            sep, verify, bound=bound, n_stage1=12, stage_budget=8,
            max_stages=6, dtype=np.float64,
        )
        assert history[-1]["max"] < bound
        assert len(history) < 6  # stopped AT the bound
        assert verify(best)["max"] < bound
        # ranks grow monotonically across restarts
        ranks = [h["rank"] for h in history]
        assert ranks == sorted(ranks)

    def test_dd_steering_and_stall(self):
        """Scripted verifier: dd engages only below rhs_comp_below and
        the stall guard returns the best result."""
        from pgdrome_tpu.recipes import adaptive_minres

        sep, Vs, factors, _ = moving_heat_source(
            n_x=24, n_t=16, n_P=4, n_v=5, af=0.2, source_rank=8
        )
        script = iter([1e-3, 5e-5, 4e-5, 6e-5, 7e-5])
        best, history = adaptive_minres(
            sep, lambda res: next(script), bound=1e-9,
            n_stage1=6, stage_budget=4, max_stages=5,
            rhs_comp="auto", rhs_comp_below=1e-4, stall_stages=2,
            dtype=np.float32, rhs_bucket=32,
        )
        # stage 2 sees 1e-3 (no dd); stages 3+ see <1e-4 (dd)
        assert [h["rhs_comp"] for h in history] == [
            False, False, True, True, True]
        # best was stage 3 (4e-5); stalls 2 stages later
        assert len(history) == 5
        assert best.n_modes == history[2]["rank"]


class TestTransientDenseVerifier:
    def test_matches_inline_fom_and_steers(self):
        """The packaged space-time FOM verifier (the reference
        PGDErrorComputation discipline for the transient family) agrees
        with an inline kron solve and exposes the adaptive_cascade
        feedback interface."""
        from pgdrome_tpu.models.problems import transient_dense_verifier
        from pgdrome_tpu.recipes import two_stage_minres
        from scipy import sparse as sps
        from scipy.sparse import linalg as spla

        sep, Vs, factors, sep_err = moving_heat_source(
            n_x=40, n_t=28, n_P=6, n_v=8, af=0.15, source_rank=20
        )
        res = two_stage_minres(sep, n_stage1=12, n_stage2=8,
                               dtype=np.float64)
        verify = transient_dense_verifier(sep, Vs, factors, af=0.15,
                                          true_source=False, n_random=3,
                                          seeds=(7,))
        out = verify(res)
        assert {"corners", "interior", "max", "worst_points"} <= set(out)
        assert out["max"] == max(out["corners"], out["interior"])
        assert np.all(np.diff(out["worst_errors"]) <= 0)
        assert out["worst_errors"][0] == pytest.approx(out["corners"])
        # the two-stage result must land near the separation floor
        assert out["max"] < max(5 * sep_err, 2e-3)

        # cross-check one sample against an inline dense space-time solve
        nx, nt = sep.sizes[0], sep.sizes[1]
        ip, iv = 2, 3
        P_val = Vs[2].tabulate_dof_coordinates()[ip, 0]
        A = (sps.kron(sps.csr_matrix(np.asarray(sep.ops[0][0])),
                      sps.csr_matrix(np.asarray(sep.ops[1][0])))
             + sps.kron(sps.csr_matrix(np.asarray(sep.ops[0][1])),
                        sps.csr_matrix(np.asarray(sep.ops[1][1])))).tolil()
        Mx = np.asarray(sep.mass[0])
        Mt = np.asarray(sep.ops[1][1])
        b = sum(
            np.kron(P_val * factors[2][r][iv] * (Mx @ factors[0][r]),
                    Mt @ factors[1][r])
            for r in range(factors[0].shape[0])
        )
        for ix in range(nx):
            rr = ix * nt
            A.rows[rr] = [rr]
            A.data[rr] = [1.0]
            b[rr] = 0.0
        u_fom = spla.spsolve(A.tocsr(), b).reshape(nx, nt)
        K = res.n_modes
        fac = (np.asarray(res.modes[2])[:K, ip]
               * np.asarray(res.modes[3])[:K, iv])
        u = np.einsum("k,ki,kj->ij", fac, np.asarray(res.modes[0])[:K],
                      np.asarray(res.modes[1])[:K])
        inline = np.linalg.norm(u - u_fom) / np.linalg.norm(u_fom)
        packaged = verify.sample_errors(res, [(ip, iv)])[0]
        np.testing.assert_allclose(packaged, inline, rtol=1e-10)

    def test_true_source_includes_separation_floor(self):
        """With a deliberately COARSE source separation, the true-source
        error must sit at/above the separation floor while the
        separated-source error can be far below it."""
        from pgdrome_tpu.models.problems import transient_dense_verifier
        from pgdrome_tpu.recipes import two_stage_minres

        sep, Vs, factors, sep_err = moving_heat_source(
            n_x=40, n_t=28, n_P=6, n_v=8, af=0.15, source_rank=4
        )
        assert sep_err > 1e-3  # rank 4 is genuinely coarse
        res = two_stage_minres(sep, n_stage1=12, n_stage2=8,
                               dtype=np.float64)
        v_sep = transient_dense_verifier(sep, Vs, factors, af=0.15,
                                         true_source=False, n_random=2,
                                         seeds=(7,))(res)
        v_true = transient_dense_verifier(sep, Vs, factors, af=0.15,
                                          true_source=True, n_random=2,
                                          seeds=(7,))(res)
        assert v_true["max"] > v_sep["max"]
        assert v_true["max"] > 0.1 * sep_err

    def test_rejects_non_mass_parameter_operators(self):
        from pgdrome_tpu.models.problems import transient_dense_verifier
        from pgdrome_tpu.separated import SeparatedProblem

        sep, Vs, factors, _ = moving_heat_source(
            n_x=16, n_t=12, n_P=4, n_v=4, af=0.2, source_rank=3
        )
        ops = [np.asarray(o).copy() for o in sep.ops]
        ops[2][0] *= 2.0  # no longer the mass
        bad = SeparatedProblem(
            ops=ops, rhs=list(sep.rhs), mass=list(sep.mass),
            bc_dofs=list(sep.bc_dofs),
        )
        with pytest.raises(ValueError, match="mass"):
            transient_dense_verifier(bad, Vs, factors)


class TestMinresExtraStages:
    def test_third_stage_stacks(self):
        # extra_stages adds residual restarts that must not hurt: the
        # deeper cascade stays at least as accurate as the two-stage
        sep, Vs, factors, sep_err = moving_heat_source(
            n_x=32, n_t=24, n_P=5, n_v=6, af=0.15, source_rank=16
        )
        res2 = two_stage_minres(sep, n_stage1=10, n_stage2=6,
                                dtype=np.float64)
        res3 = two_stage_minres(sep, n_stage1=10, n_stage2=6,
                                extra_stages=(6,), dtype=np.float64)
        assert res3.n_modes > res2.n_modes

        from scipy import sparse as sps
        from scipy.sparse import linalg as spla

        nx, nt = sep.sizes[0], sep.sizes[1]
        ip, iv = 2, 3
        P_val = Vs[2].tabulate_dof_coordinates()[ip, 0]
        Mx = np.asarray(sep.mass[0])
        Mt = np.asarray(sep.ops[1][1])
        A = (sps.kron(sps.csr_matrix(np.asarray(sep.ops[0][0])),
                      sps.csr_matrix(np.asarray(sep.ops[1][0])))
             + sps.kron(sps.csr_matrix(np.asarray(sep.ops[0][1])),
                        sps.csr_matrix(np.asarray(sep.ops[1][1])))).tolil()
        b = sum(
            np.kron(P_val * factors[2][r][iv] * (Mx @ factors[0][r]),
                    Mt @ factors[1][r])
            for r in range(factors[0].shape[0])
        )
        for ix in range(nx):
            rr = ix * nt
            A.rows[rr] = [rr]
            A.data[rr] = [1.0]
            b[rr] = 0.0
        u_fom = spla.spsolve(A.tocsr(), b).reshape(nx, nt)

        def err(res):
            K = res.n_modes
            fac = (np.asarray(res.modes[2])[:K, ip]
                   * np.asarray(res.modes[3])[:K, iv])
            u = np.einsum("k,ki,kj->ij", fac, np.asarray(res.modes[0])[:K],
                          np.asarray(res.modes[1])[:K])
            return np.linalg.norm(u - u_fom) / np.linalg.norm(u_fom)

        e2, e3 = err(res2), err(res3)
        assert e3 <= e2 * 1.2 + 1e-12, (e2, e3)

    def test_rhs_comp_residual_stages(self):
        # rhs_comp routes the residual stages through the compensated dd
        # contraction; on a benign stack it must track the plain result
        # (the at-scale payoff is measured in scripts/probe_minres_floor
        # — dd breaks the 1.5e-6 wide-cascade floor)
        sep, Vs, factors, sep_err = moving_heat_source(
            n_x=32, n_t=24, n_P=5, n_v=6, af=0.15, source_rank=16
        )
        plain = two_stage_minres(sep, n_stage1=8, n_stage2=5,
                                 dtype=np.float32)
        comp = two_stage_minres(sep, n_stage1=8, n_stage2=5,
                                dtype=np.float32, rhs_comp=True)
        assert comp.n_modes == plain.n_modes
        t_p = np.einsum(
            "ki,kj->ij", np.asarray(plain.modes[0], dtype=np.float64),
            np.asarray(plain.modes[1], dtype=np.float64),
        )
        t_c = np.einsum(
            "ki,kj->ij", np.asarray(comp.modes[0], dtype=np.float64),
            np.asarray(comp.modes[1], dtype=np.float64),
        )
        assert np.abs(t_c - t_p).max() <= 1e-3 * np.abs(t_p).max()


class TestTransientServing:
    def test_minres_result_serves_via_vademecum(self):
        # two_stage_minres returns nodal modes for every dim, so the
        # serving container can sweep over (t, P, v) directly
        import jax.numpy as jnp
        from pgdrome_tpu.serving import Vademecum

        sep, Vs, factors, _ = moving_heat_source(
            n_x=24, n_t=16, n_P=5, n_v=6, af=0.15, source_rank=12
        )
        res = two_stage_minres(sep, n_stage1=8, n_stage2=4,
                               dtype=np.float64)
        vd = Vademecum(Vs, res, dtype=np.float64)
        samples = jnp.asarray(
            np.random.default_rng(0).uniform(0.55, 0.95, size=(11, 3))
        )
        fields = np.asarray(vd.fields(samples))
        assert fields.shape == (11, sep.sizes[0])
        assert np.isfinite(fields).all()
        # cross-check one sample against direct per-dim evaluation
        i = 4
        fac = np.ones(res.n_modes)
        for j in range(1, 4):
            vals = np.asarray(evaluate_modes_1d(
                Vs[j], res.modes[j], np.asarray([float(samples[i, j - 1])]),
                xp=np,
            ))[0]
            fac *= vals[: res.n_modes]
        u = fac @ np.asarray(res.modes[0])[: res.n_modes]
        np.testing.assert_allclose(fields[i], u, rtol=1e-8, atol=1e-12)


class TestResidualCascade:
    def test_stage_problems_override(self):
        # late-stage re-targeting: a boosted-measure problem for the last
        # stage must leave the solution consistent (weights cancel per
        # grid point) — solutions from the plain and boosted-stage
        # cascades agree to the cascade's own accuracy level
        from pgdrome_tpu.recipes import residual_cascade
        from pgdrome_tpu.separated import galerkin_update, precondition_dim0

        sep_p, Vs = parametric_elliptic(n_x=48, n_p=12, num_params=2)
        sep_b, _ = parametric_elliptic(n_x=48, n_p=12, num_params=2,
                                       boundary_boost=(16.0, 6))
        pc_p, tf = precondition_dim0(sep_p, dtype=np.float64)
        pc_b, _ = precondition_dim0(sep_b, dtype=np.float64)
        res_plain = residual_cascade(pc_p, (8, 6), dtype=np.float64)
        res_boost = residual_cascade(pc_p, (8, 6), dtype=np.float64,
                                     stage_problems={2: pc_b})
        g_p = galerkin_update(pc_p, res_plain)
        g_b = galerkin_update(pc_p, res_boost)

        # both must approximate the SAME per-sample FEM solution (the
        # boosted measure re-targets enrichment; it does not change the
        # per-grid-point equations), to comparable truncation accuracy
        from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix

        grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        p = (grid[5], grid[7])
        kap = lambda x: 1.0 + sum(
            p[i] * np.sin((i + 1) * np.pi * x) ** 2 / 4.0 for i in range(2)
        )
        K = stiffness_matrix(Vs[0], weight=kap)
        b_full = load_vector(Vs[0], lambda x: np.ones_like(x))
        u_ref = np.zeros(K.shape[0])
        u_ref[1:-1] = np.linalg.solve(K[1:-1, 1:-1], b_full[1:-1])

        errs = {}
        for name, g in (("plain", g_p), ("boost", g_b)):
            full0 = tf.modes_to_full(g.modes[0])[: g.n_modes]
            fac = np.ones(g.n_modes)
            for j in range(2):
                v = np.asarray(evaluate_modes_1d(
                    Vs[1 + j], g.modes[1 + j], np.asarray([p[j]]), xp=np
                ))[0]
                fac *= v[: g.n_modes]
            u = fac @ full0
            errs[name] = np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)
        assert errs["plain"] < 1e-4 and errs["boost"] < 1e-4, errs
        # the override must not degrade interior accuracy by more than
        # the measure re-weighting plausibly costs
        assert errs["boost"] < 10 * errs["plain"] + 1e-7, errs

    def test_rhs_comp_from_stage(self):
        # rhs_comp_from=2: stage 1 plain f32, later stages compensated
        # double-f32 — the measured all-on-chip hybrid as one call.
        # On a benign (no-cancellation) problem all precision variants
        # agree to f32 accuracy; this checks the wiring end-to-end.
        from pgdrome_tpu.recipes import residual_cascade
        from pgdrome_tpu.separated import precondition_dim0

        sep, _ = parametric_elliptic(n_x=32, n_p=8, num_params=2)
        pc, _tf = precondition_dim0(sep, dtype=np.float64)
        kw = dict(dtype=np.float32, solver="cg", cg_iters=25)
        a = residual_cascade(pc, (6, 4, 4), rhs_comp_from=2, **kw)
        b = residual_cascade(pc, (6, 4, 4), rhs_comp=True, **kw)
        assert a.n_modes == b.n_modes

        def tensor(res):
            K = res.n_modes
            t = np.einsum(
                "ki,kj->kij",
                np.asarray(res.modes[0], dtype=np.float64)[:K],
                np.asarray(res.modes[1], dtype=np.float64)[:K],
            )
            return np.einsum(
                "kij,kl->ijl", t,
                np.asarray(res.modes[2], dtype=np.float64)[:K],
            )

        ta, tb = tensor(a), tensor(b)
        scale = np.abs(tb).max()
        assert np.abs(ta - tb).max() / scale < 1e-3

    def test_extra_stage_improves(self):
        # a third floor-restart must not hurt and typically halves the
        # remaining error (PERF.md 5-param measurements)
        from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix

        sep, Vs = parametric_elliptic(n_x=64, n_p=16, num_params=2,
                                      degree_x=2)

        def max_err(res, tf):
            full0 = tf.modes_to_full(res.modes[0]).astype(np.float64)
            grid = Vs[1].tabulate_dof_coordinates()[:, 0]
            b_full = load_vector(Vs[0], lambda x: np.ones_like(x))
            errs = []
            for p in [(grid[2], grid[7]), (grid[-2], grid[3])]:
                kap = lambda x: 1.0 + sum(
                    p[i] * np.sin((i + 1) * np.pi * x) ** 2 / 4.0
                    for i in range(2)
                )
                K = stiffness_matrix(Vs[0], weight=kap)
                u_ref = np.zeros(K.shape[0])
                u_ref[1:-1] = np.linalg.solve(K[1:-1, 1:-1], b_full[1:-1])
                fac = np.ones(res.n_modes)
                for j in range(2):
                    vals = np.asarray(evaluate_modes_1d(
                        Vs[1 + j], res.modes[1 + j], np.asarray([p[j]]),
                        xp=np,
                    ))[0]
                    fac *= vals[: res.n_modes].astype(np.float64)
                u = fac @ full0[: res.n_modes]
                errs.append(np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref))
            return max(errs)

        res2, tf2 = two_stage_elliptic(sep, n_stage1=10, n_stage2=6,
                                       n_deploy=None, dtype=np.float32)
        res3, tf3 = two_stage_elliptic(sep, n_stage1=10, n_stage2=6,
                                       n_deploy=None, dtype=np.float32,
                                       extra_stages=(6,))
        e2, e3 = max_err(res2, tf2), max_err(res3, tf3)
        assert res3.n_modes == res2.n_modes + 6
        assert e3 <= e2 * 1.2, f"stage-3 hurt: {e3:.3e} vs {e2:.3e}"


class TestEllipticDenseVerifier:
    def test_converged_solve_verifies_small(self):
        from pgdrome_tpu.models.problems import elliptic_dense_verifier
        from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0

        sep, Vs = parametric_elliptic(n_x=64, n_p=16, num_params=2,
                                      degree_x=2)
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        res = SeparatedPGD(sep_pc, n_max=24, tol=0.0, tol_fp=1e-9,
                           residual_check=False,
                           dtype=np.float64).solve_fused()
        verify = elliptic_dense_verifier(Vs, tf, n_random=4,
                                         seeds=(7, 101))
        errs = verify(res)
        assert {"corners", "interior", "max"} <= set(errs)
        assert errs["max"] == max(errs["corners"], errs["interior"])
        assert errs["max"] < 1e-5, errs

    def test_corner_cap_subsets_corners(self):
        from pgdrome_tpu.models.problems import elliptic_dense_verifier
        from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0

        sep, Vs = parametric_elliptic(n_x=32, n_p=8, num_params=3,
                                      degree_x=2)
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        res = SeparatedPGD(sep_pc, n_max=10, tol=0.0, tol_fp=1e-8,
                           residual_check=False,
                           dtype=np.float64).solve_fused()
        full = elliptic_dense_verifier(Vs, tf, n_random=2, seeds=(7,))
        capped = elliptic_dense_verifier(Vs, tf, n_random=2, seeds=(7,),
                                         corner_cap=4)
        # the capped sweep sees a subset of corners, so its corner max
        # cannot exceed the full one; interiors are identical draws
        assert capped(res)["corners"] <= full(res)["corners"] + 1e-15
        assert capped(res)["interior"] == full(res)["interior"]


class TestAdaptiveCascade:
    def _problem(self, boost=None):
        from pgdrome_tpu.separated import precondition_dim0

        sep, Vs = parametric_elliptic(n_x=64, n_p=16, num_params=2,
                                      degree_x=2, boundary_boost=boost)
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        return sep_pc, tf, Vs

    def test_reaches_bound_and_stops(self):
        from pgdrome_tpu.models.problems import elliptic_dense_verifier
        from pgdrome_tpu.recipes import adaptive_cascade

        sep_pc, tf, Vs = self._problem()
        verify = elliptic_dense_verifier(Vs, tf, n_random=6,
                                         seeds=(7, 101))
        best, history = adaptive_cascade(
            sep_pc, verify, bound=5e-5, n_stage1=16, stage_budget=10,
            max_stages=8, dtype=np.float32,
        )
        assert history[-1]["max"] < 5e-5
        # stops AT the bound, not at max_stages
        assert len(history) < 8
        # best is the Galerkin-updated result of the bound-meeting stage
        assert best.n_modes == history[-1]["rank"]
        assert verify(best)["max"] < 5e-5

    def test_measure_and_precision_steering(self):
        """Scripted verifier: the boost window opens exactly while
        corners bind (> bound and > margin x interior) and dd stages
        engage exactly below rhs_comp_below."""
        from pgdrome_tpu.recipes import adaptive_cascade

        sep_pc, _, _ = self._problem()
        sep_boost, _, _ = self._problem(boost=(16.0, 6))
        script = iter([
            {"corners": 1e-3, "interior": 1e-5},   # -> stage 2 boosted
            {"corners": 1.5e-5, "interior": 1e-5},  # -> stage 3 plain+dd
            {"corners": 2e-3, "interior": 1e-3},    # (stage 3 result)
        ])
        best, history = adaptive_cascade(
            sep_pc, lambda res: next(script), bound=1e-7,
            n_stage1=8, stage_budget=6, max_stages=3,
            boost_problem=sep_boost, boost_margin=2.0,
            rhs_comp="auto", rhs_comp_below=1e-4, dtype=np.float32,
        )
        assert [h["boosted"] for h in history] == [False, True, False]
        assert [h["rhs_comp"] for h in history] == [False, False, True]
        # best tracks the smallest verified max (stage 2), not the last
        assert best.n_modes == history[1]["rank"]

    def test_corner_seeded_boost_stages(self):
        """With corner_seed_range set and a verifier exposing
        worst_points, boosted stages run corner-SEEDED (fp_init at the
        measured-worst boundary points, non-fused solve) and still
        converge; rhs_bucket keeps the stage shapes stable."""
        from pgdrome_tpu.models.problems import elliptic_dense_verifier
        from pgdrome_tpu.recipes import adaptive_cascade

        sep_pc, tf, Vs = self._problem()
        sep_boost, _, _ = self._problem(boost=(16.0, 6))
        verify = elliptic_dense_verifier(Vs, tf, n_random=4, seeds=(7,))
        grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        best, history = adaptive_cascade(
            sep_pc, verify, bound=2e-6, n_stage1=10, stage_budget=8,
            max_stages=6, boost_problem=sep_boost, boost_margin=0.0,
            corner_seed_range=(grid[1], grid[-2]), rhs_bucket=64,
            dtype=np.float32,
        )
        # boost_margin=0 forces every post-stage-1 stage boosted while
        # above bound; worst_points exist from stage 1 -> all seeded
        assert history[0]["seeded"] is False
        assert all(h["seeded"] for h in history[1:])
        assert all(h["boosted"] for h in history[1:])
        # seeding must not break convergence
        assert history[-1]["max"] < history[0]["max"]
        assert best is not None

    def test_verifier_exposes_ranked_worst_points(self):
        from pgdrome_tpu.models.problems import elliptic_dense_verifier
        from pgdrome_tpu.separated import SeparatedPGD

        sep_pc, tf, Vs = self._problem()
        res = SeparatedPGD(sep_pc, n_max=6, tol=0.0, tol_fp=1e-7,
                           residual_check=False,
                           dtype=np.float32).solve_fused()
        verify = elliptic_dense_verifier(Vs, tf, n_random=2, seeds=(7,),
                                         n_edge=4)
        out = verify(res)
        wp, we = out["worst_points"], out["worst_errors"]
        assert wp.shape[0] == we.shape[0] == 4 + 4  # corners + edges
        assert wp.shape[1] == 2
        # ranked worst-first and consistent with the reported max
        assert np.all(np.diff(we) <= 0)
        assert we[0] == pytest.approx(out["corners"])

    def test_stall_stops_early_and_returns_best(self):
        from pgdrome_tpu.recipes import adaptive_cascade

        sep_pc, _, _ = self._problem()
        best, history = adaptive_cascade(
            sep_pc, lambda res: 1e-3, bound=1e-9,
            n_stage1=8, stage_budget=6, max_stages=10,
            stall_stages=2, dtype=np.float32,
        )
        # stage 1 is the best forever -> stalls after 2 more stages
        assert len(history) == 3
        assert best.n_modes == history[0]["rank"]

    def test_warm_start_from_init_result(self):
        from pgdrome_tpu.models.problems import elliptic_dense_verifier
        from pgdrome_tpu.recipes import adaptive_cascade
        from pgdrome_tpu.separated import SeparatedPGD

        sep_pc, tf, Vs = self._problem()
        init = SeparatedPGD(sep_pc, n_max=16, tol=0.0, tol_fp=1e-7,
                            residual_check=False,
                            dtype=np.float32).solve_fused()
        verify = elliptic_dense_verifier(Vs, tf, n_random=6,
                                         seeds=(7, 101))
        best, history = adaptive_cascade(
            sep_pc, verify, bound=5e-5, stage_budget=10, max_stages=8,
            dtype=np.float32, init_result=init,
        )
        assert history[0]["rank"] == init.n_modes  # stage 1 = the input
        assert history[-1]["max"] < 5e-5

    def test_checkpoint_called_per_stage_and_resumable(self):
        """The per-stage checkpoint receives (stage_line, RAW result) and
        the raw result warm-starts a new cascade (the killed-run resume
        path the probes rely on)."""
        from pgdrome_tpu.recipes import adaptive_cascade

        sep_pc, tf, Vs = self._problem()
        script = iter([1e-3, 5e-4, 2e-4])
        saved = []
        adaptive_cascade(
            sep_pc, lambda res: next(script), bound=1e-7,
            n_stage1=8, stage_budget=6, max_stages=3,
            dtype=np.float32,
            checkpoint=lambda line, raw: saved.append((dict(line), raw)),
        )
        assert [line["stage"] for line, _ in saved] == [1, 2, 3]
        # checkpointed raw rank matches the history line; ranks grow
        ranks = [line["rank"] for line, _ in saved]
        assert all(line["rank"] == raw.n_modes for line, raw in saved)
        assert ranks == sorted(ranks) and ranks[-1] > ranks[0]
        # resume: warm-starting from the last checkpoint verifies the
        # input as stage 1 at the same rank (no re-solve of the past)
        _, history2 = adaptive_cascade(
            sep_pc, lambda res: 1e-3, bound=1e-7,
            stage_budget=6, max_stages=1, dtype=np.float32,
            init_result=saved[-1][1],
        )
        assert history2[0]["rank"] == ranks[-1]

    def test_edge_samples_extend_the_sweep(self):
        from pgdrome_tpu.models.problems import elliptic_dense_verifier
        from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0

        sep, Vs = parametric_elliptic(n_x=32, n_p=8, num_params=3,
                                      degree_x=2)
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        res = SeparatedPGD(sep_pc, n_max=10, tol=0.0, tol_fp=1e-8,
                           residual_check=False,
                           dtype=np.float64).solve_fused()
        plain = elliptic_dense_verifier(Vs, tf, n_random=2, seeds=(7,))
        edged = elliptic_dense_verifier(Vs, tf, n_random=2, seeds=(7,),
                                        n_edge=6)
        e_p, e_e = plain(res), edged(res)
        # same interior draw; edge sweep can only raise the boundary max
        assert e_e["interior"] == e_p["interior"]
        assert e_e["corners"] >= e_p["corners"]


class TestCornerSeededInit:
    def test_seed_shapes_and_side_selection(self):
        from pgdrome_tpu.models.problems import corner_seeded_init

        corners = np.array([[0.0, 1.0, 0.0], [1.0, 1.0, 1.0]])
        init = corner_seeded_init(corners, 0.0, 1.0, q=6, bg=0.0)
        sizes = (17, 9, 9, 9)
        f = init(0, sizes)  # targets corner [lo, hi, lo]
        assert tuple(len(v) for v in f) == sizes
        # corner[0] = [0, 1, 0]: dim1 lo, dim2 hi, dim3 lo — the bump
        # peaks at the targeted end and is zero on the other half
        assert f[1][0] == 1.0 and f[1][-1] == 0.0
        assert np.argmax(f[1]) == 0          # lo-side bump peaks at start
        assert np.argmax(f[2]) == len(f[2]) - 1  # hi side
        assert np.argmax(f[3]) == 0
        # modes cycle through the corner list
        f1 = init(1, sizes)
        assert np.argmax(f1[1]) == len(f1[1]) - 1  # all-hi corner
        # deterministic per mode index
        np.testing.assert_array_equal(init(0, sizes)[0], f[0])

    def test_targeted_stage_beats_ones_init_on_corners(self):
        """The frontier mechanism at test scale: same measure, same
        budget, a corner-seeded residual stage must not lose to the
        ones-init one on the measured corner max (f64 — no precision
        confound)."""
        from pgdrome_tpu.models.problems import (
            corner_seeded_init, elliptic_dense_verifier,
            parametric_elliptic,
        )
        from pgdrome_tpu.separated import (
            SeparatedPGD, combine_results, galerkin_update,
            precondition_dim0, residual_problem,
        )

        sep, Vs = parametric_elliptic(n_x=48, n_p=12, num_params=4,
                                      degree_x=2, boundary_boost=(8.0, 6))
        pc, tf = precondition_dim0(sep, dtype=np.float64)
        verifier = elliptic_dense_verifier(Vs, tf, n_random=4, seeds=(7,))
        common = dict(tol=0.0, solver="cg", cg_iters=25,
                      residual_check=False, dtype=np.float64)
        base = SeparatedPGD(pc, n_max=12, tol_fp=1e-7, max_fp_it=40,
                            **common).solve_fused()
        ce0 = verifier.sample_errors(galerkin_update(pc, base),
                                     verifier.corners)
        worst = verifier.corners[np.argsort(ce0)[::-1]]
        grid = Vs[1].tabulate_dof_coordinates()[:, 0]
        sep_res, s_res = residual_problem(pc, base)

        d_ones = SeparatedPGD(sep_res, n_max=8, tol_fp=1e-5, max_fp_it=20,
                              **common).solve()
        d_seed = SeparatedPGD(sep_res, n_max=8, tol_fp=1e-5, max_fp_it=20,
                              fp_init=corner_seeded_init(
                                  worst, grid[1], grid[-2]),
                              **common).solve()
        e_ones = verifier.sample_errors(
            galerkin_update(pc, combine_results(base, d_ones, s_res)),
            verifier.corners).max()
        e_seed = verifier.sample_errors(
            galerkin_update(pc, combine_results(base, d_seed, s_res)),
            verifier.corners).max()
        print("corner max ones/seeded:", e_ones, e_seed)
        assert e_seed <= e_ones * 1.05


class TestRhsZeroRowPadding:
    def test_zero_rhs_rows_are_inert(self):
        """Padding the rhs stack with zero rows (shape-stabilization for
        cascade stages on remote backends - probe_10param_grind_tpu) must
        not change the solve."""
        from pgdrome_tpu.separated import (
            SeparatedPGD, pad_rhs_bucket, precondition_dim0,
            residual_problem,
        )

        sep, Vs = parametric_elliptic(n_x=48, n_p=12, num_params=2,
                                      degree_x=2)
        pc, tf = precondition_dim0(sep, dtype=np.float64)
        common = dict(tol=0.0, solver="cg", cg_iters=25,
                      residual_check=False, dtype=np.float64)
        base = SeparatedPGD(pc, n_max=8, tol_fp=1e-7, **common).solve_fused()
        sep_res, s_res = residual_problem(pc, base)
        R = sep_res.rhs[0].shape[0]
        padded = pad_rhs_bucket(sep_res, R + 16)
        # already-bucketed stacks pass through untouched
        assert pad_rhs_bucket(sep_res, R) is sep_res
        d1 = SeparatedPGD(sep_res, n_max=6, tol_fp=1e-6, **common).solve_fused()
        d2 = SeparatedPGD(padded, n_max=6, tol_fp=1e-6, **common).solve_fused()
        assert padded.rhs[0].shape[0] == R + 16
        np.testing.assert_allclose(
            np.asarray(d1.amplitudes), np.asarray(d2.amplitudes),
            rtol=1e-10,
        )
        np.testing.assert_allclose(d1.normU0, d2.normU0, rtol=1e-12)


class TestHighdFrontier:
    """Reduced-scale drives of recipes.highd_frontier — the packaged
    dimensionality-frontier recipe behind the FRONTIER_d*.json artifacts
    (full-scale runs: scripts/run_frontier.py)."""

    def test_dense_path_reaches_bound_with_artifact(self, tmp_path):
        """Below screen_from the recipe verifies DENSELY (all 2^d corners
        + edges + multi-seed interior, per-sample f64 FEM) and the
        artifact/state files round-trip."""
        import json

        from pgdrome_tpu.recipes import highd_frontier

        art = tmp_path / "frontier_d2.json"
        state = tmp_path / "state_d2.npz"
        best, report = highd_frontier(
            2, bound=5e-5, n_x=64, n_p=16, n_stage1=16, stage_budget=10,
            max_stages=8, state_path=str(state), artifact_path=str(art),
        )
        assert report["screened_verification"] is False
        assert report["verified"]["max"] < 5e-5
        # the claimed max is a measured FEM maximum over all 4 corners
        assert report["verified"]["corners_fem_n"] == 4
        assert report["rank"] == best.n_modes
        assert report["history"][-1]["rank"] == best.n_modes
        with open(art) as f:
            disk = json.load(f)
        assert disk["verified"] == report["verified"]
        # per-stage checkpoint: modes + bookkeeping for run_frontier resume
        with np.load(state) as z:
            assert int(z["n_modes"]) == best.n_modes
            for d in range(3):
                assert z[f"m{d}"].shape[0] >= best.n_modes

    def test_screened_path_reports_audited_estimates(self, tmp_path):
        """At screen_from+ params the per-stage verification is the
        residual screener + FEM-top-k, and the final report carries the
        full audit: measured corner/edge/interior FEM maxima plus the
        calibrated estimate for unmeasured corners."""
        from pgdrome_tpu.recipes import highd_frontier

        best, report = highd_frontier(
            3, bound=1e-3, n_x=64, n_p=16, n_stage1=16, stage_budget=8,
            max_stages=4, screen_from=3, screen_top_k=4,
            n_screen_edges=16, screener_cap=64, final_fem_corners=4,
            artifact_path=str(tmp_path / "d3s.json"),
        )
        assert report["screened_verification"] is True
        fin = report["verified"]
        for key in ("corners_fem_max", "edges_fem_max",
                    "interior_fem_max", "corners_rest_estimate",
                    "edges_rest_estimate", "max"):
            assert key in fin, key
        # 4 of the 8 corners FEM-measured, the rest estimated; same
        # discipline for the 16-4 unmeasured edge candidates
        assert fin["corners_fem_n"] == 4
        assert fin["edges_fem_n"] == 4
        assert fin["max"] >= max(fin["corners_fem_max"],
                                 fin["edges_fem_max"],
                                 fin["interior_fem_max"],
                                 fin["corners_rest_estimate"],
                                 fin["edges_rest_estimate"])
        # stage history keeps the screened audit trail (ADVICE round 3)
        assert all(h.get("screened") for h in report["history"])
        assert all("eta" in h and "measured_max" in h
                   for h in report["history"])

    def test_init_result_resumes_without_resolving_stage1(self):
        """run_frontier.py --resume hands the checkpointed combination
        back as init_result: stage 1 must adopt it (same rank) instead of
        solving n_stage1 fresh modes."""
        from pgdrome_tpu.recipes import highd_frontier

        _, rep0 = highd_frontier(
            2, bound=1e-12, n_x=64, n_p=16, n_stage1=12, stage_budget=8,
            max_stages=1,
        )
        assert rep0["rank"] == 12

        # re-enter with the prior best as the warm start, one stage only
        from pgdrome_tpu.fem.mesh import IntervalMesh
        from pgdrome_tpu.fem.space import FunctionSpace
        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0

        sep, _ = parametric_elliptic(n_x=64, n_p=16, num_params=2,
                                     degree_x=2, boundary_boost=(8.0, 6))
        pc, _ = precondition_dim0(sep, dtype=np.float64)
        warm = SeparatedPGD(pc, n_max=12, tol=0.0, tol_fp=1e-7,
                            residual_check=False,
                            dtype=np.float32).solve_fused()
        _, rep1 = highd_frontier(
            2, bound=1e-12, n_x=64, n_p=16, n_stage1=99, stage_budget=8,
            max_stages=1, init_result=warm,
        )
        assert rep1["rank"] == warm.n_modes  # adopted, not re-solved

    def test_resumed_leg_extends_artifact_history(self, tmp_path):
        """A resumed leg must EXTEND the prior artifact's history (the
        shipped JSON carries the full error-vs-rank law across legs, not
        just the last leg's stages) and accumulate wall_s."""
        import json

        from pgdrome_tpu.recipes import highd_frontier
        from pgdrome_tpu.separated import PGDResult

        art = tmp_path / "d2.json"
        state = tmp_path / "d2_state.npz"
        _, rep0 = highd_frontier(
            2, bound=1e-12, n_x=64, n_p=16, n_stage1=12, stage_budget=6,
            max_stages=2, state_path=str(state), artifact_path=str(art),
        )
        n0 = len(rep0["history"])
        assert rep0["legs"] == 1

        with np.load(state) as z:
            init = PGDResult(
                modes=[z[f"m{d}"] for d in range(3)],
                n_modes=int(z["n_modes"]), amplitudes=z["amplitudes"],
                alpha=z["alpha"], fp_its=z["fp_its"],
                normU0=float(z["normU0"]),
            )
        _, rep1 = highd_frontier(
            2, bound=1e-12, n_x=64, n_p=16, n_stage1=12, stage_budget=6,
            max_stages=1, state_path=str(state), artifact_path=str(art),
            init_result=init,
        )
        assert rep1["legs"] == 2
        assert len(rep1["history"]) > n0  # prior legs retained
        assert rep1["history"][0] == rep0["history"][0]
        assert rep1["history"][-1]["leg"] == 2
        assert rep1["wall_s"] >= rep0["wall_s"]
        with open(art) as f:
            assert json.load(f)["legs"] == 2

    def test_screener_cap_covers_resumed_rank(self, tmp_path):
        """Resuming a screened run at a rank near/above screener_cap must
        raise the cap to the deepest reachable rank instead of crashing
        mid-cascade with a cap-overflow ValueError (wasting the leg)."""
        from pgdrome_tpu.recipes import highd_frontier
        from pgdrome_tpu.separated import PGDResult

        state = tmp_path / "d3s_state.npz"
        highd_frontier(
            3, bound=1e-12, n_x=64, n_p=16, n_stage1=16, stage_budget=8,
            max_stages=1, screen_from=3, screen_top_k=4,
            n_screen_edges=16, screener_cap=4, final_fem_corners=4,
            state_path=str(state),
        )
        with np.load(state) as z:
            init = PGDResult(
                modes=[z[f"m{d}"] for d in range(4)],
                n_modes=int(z["n_modes"]), amplitudes=z["amplitudes"],
                alpha=z["alpha"], fp_its=z["fp_its"],
                normU0=float(z["normU0"]),
            )
        assert init.n_modes > 4  # already beyond the configured cap
        _, rep = highd_frontier(
            3, bound=1e-12, n_x=64, n_p=16, n_stage1=16, stage_budget=8,
            max_stages=2, screen_from=3, screen_top_k=4,
            n_screen_edges=16, screener_cap=4, final_fem_corners=4,
            init_result=init,
        )
        assert rep["rank"] > init.n_modes  # cascade ran past the old cap
