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
