"""Transient 2D-space and moving-heat-source configs (BASELINE.json
configs 2 and 5) + the greedy source separation utility."""

import numpy as np
import pytest
from scipy import sparse as sps
from scipy.sparse import linalg as spla

from pgdrome_tpu.models.problems import transient_heat_2d, moving_heat_source
from pgdrome_tpu.separated import SeparatedPGD, evaluate_modes_1d, galerkin_update
from pgdrome_tpu.utils.separation import separate, separation_error


class TestSeparation:
    def test_exact_rank1(self):
        x = np.linspace(0, 1, 20)
        t = np.linspace(0, 2, 15)
        vals = np.outer(np.sin(x), t**2)
        f = separate(vals, rank=1)
        assert separation_error(vals, f) < 1e-12

    def test_exact_rank2_3way(self):
        x = np.linspace(0, 1, 12)
        y = np.linspace(0, 1, 10)
        z = np.linspace(0, 1, 8)
        X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
        vals = X * Y * Z + np.sin(X) * np.cos(Y) * Z**2
        f = separate(vals, rank=6)
        assert separation_error(vals, f) < 1e-8

    def test_moving_gaussian_decay(self):
        # separation error decreases with rank
        x = np.linspace(0, 1, 60)
        t = np.linspace(0, 1, 40)
        v = np.linspace(0.5, 1.0, 10)
        X, T, V = np.meshgrid(x, t, v, indexing="ij")
        g = np.exp(-((X - 0.15 - V * T) ** 2) / 0.12**2)
        errs = [separation_error(g, separate(g, r)) for r in (5, 15, 40)]
        assert errs[0] > errs[1] > errs[2]
        assert errs[2] < 0.05


def _kron_reference_xt(ops_x, ops_t, rhs_terms, bc_t0_rows, nx, nt):
    """Exact direct solve of Σ_t kron(O_xt, O_tt) u = Σ_r kron(bx, bt);
    IC rows (all x at t=0) set to identity/zero.  Layout: u[x, t] flattened
    x-major."""
    A = sum(sps.kron(sps.csr_matrix(ox), sps.csr_matrix(ot)) for ox, ot in zip(ops_x, ops_t))
    b = sum(np.kron(bx, bt) for bx, bt in rhs_terms)
    A = A.tolil()
    rows = [ix * nt + it0 for ix in range(nx) for it0 in bc_t0_rows]
    for r in rows:
        A.rows[r] = [r]
        A.data[r] = [1.0]
        b[r] = 0.0
    return spla.spsolve(A.tocsr(), b)


class TestTransientHeat2D:
    def test_vs_direct_spacetime_solve(self):
        sep, Vs = transient_heat_2d(nx=8, ny=8, n_t=30)
        res = SeparatedPGD(sep, n_max=25, tol=1e-10, tol_fp=1e-8).solve()

        n2, nt = sep.sizes
        ops = [np.asarray(o) for o in sep.ops]
        u_direct = _kron_reference_xt(
            [ops[0][0], ops[0][1]],
            [np.asarray(sep.ops[1][0]), np.asarray(sep.ops[1][1])],
            [(np.asarray(sep.rhs[0][0]), np.asarray(sep.rhs[1][0]))],
            bc_t0_rows=[0],
            nx=n2,
            nt=nt,
        ).reshape(n2, nt)

        # PGD reconstruction at the final time node
        t_end = Vs[1].tabulate_dof_coordinates()[-1, 0]
        fac = np.asarray(
            evaluate_modes_1d(Vs[1], res.modes[1], np.asarray([t_end]), xp=np)
        )[0][: res.n_modes]
        u_pgd = fac @ np.asarray(res.modes[0])[: res.n_modes]
        err = np.linalg.norm(u_pgd - u_direct[:, -1]) / np.linalg.norm(
            u_direct[:, -1]
        )
        print("transient 2D err at t_end:", err, "modes:", res.n_modes)
        assert err < 1e-3

    def test_matches_backward_euler(self):
        # FD-upwind time ≡ backward Euler also with 2D space
        sep, Vs = transient_heat_2d(nx=6, ny=6, n_t=25)
        n2, nt = sep.sizes
        rc_M = np.asarray(sep.ops[0][0])
        k_K = np.asarray(sep.ops[0][1])
        q = np.asarray(sep.rhs[0][0])
        tg = Vs[1].tabulate_dof_coordinates()[:, 0]

        T = np.zeros(n2)
        for i in range(1, nt):
            dt = tg[i] - tg[i - 1]
            T = np.linalg.solve(rc_M + dt * k_K, dt * q + rc_M @ T)

        u_direct = _kron_reference_xt(
            [rc_M, k_K],
            [np.asarray(sep.ops[1][0]), np.asarray(sep.ops[1][1])],
            [(q, np.asarray(sep.rhs[1][0]))],
            bc_t0_rows=[0],
            nx=n2,
            nt=nt,
        ).reshape(n2, nt)
        # interior time rows coincide exactly with Euler; the final FD row
        # carries the half-weight boundary quirk of the reference FD stencil
        err = np.linalg.norm(u_direct[:, -2] - _euler_at(rc_M, k_K, q, tg, nt - 2))
        assert err / np.linalg.norm(u_direct[:, -2]) < 1e-10


def _euler_at(rc_M, k_K, q, tg, idx):
    T = np.zeros(rc_M.shape[0])
    for i in range(1, idx + 1):
        dt = tg[i] - tg[i - 1]
        T = np.linalg.solve(rc_M + dt * k_K, dt * q + rc_M @ T)
    return T


class TestMovingHeatSource:
    def test_pgd_vs_direct(self):
        sep, Vs, factors, sep_err = moving_heat_source(
            n_x=60, n_t=40, n_P=6, n_v=8, af=0.12, source_rank=45
        )
        assert sep_err < 0.05
        # the 4-way moving-source surrogate is genuinely high-rank (even
        # the (x,t) slice needs ~12 SVD modes for 1e-4); accuracy is
        # rank-limited and decays steadily: measured 5.1% @40 → 2.2% @80 →
        # 0.67% @140 greedy modes.  Test at 80 modes + Galerkin update.
        res = SeparatedPGD(sep, n_max=80, tol=1e-12, tol_fp=1e-7).solve()
        res = galerkin_update(sep, res)  # span-optimal coefficients

        # direct space-time solve at fixed on-grid (P, v), using the SAME
        # separated source (isolates PGD truncation from separation error)
        P_val = Vs[2].tabulate_dof_coordinates()[3, 0]
        v_idx = 4
        v_val = Vs[3].tabulate_dof_coordinates()[v_idx, 0]

        nx, nt = sep.sizes[0], sep.sizes[1]
        ops_x = [np.asarray(sep.ops[0][0]), np.asarray(sep.ops[0][1])]
        ops_t = [np.asarray(sep.ops[1][0]), np.asarray(sep.ops[1][1])]
        R = factors[0].shape[0]
        Mx = np.asarray(sep.mass[0])
        Mt_like = np.asarray(sep.ops[1][1])  # M_t
        rhs_terms = []
        for r in range(R):
            bx = Mx @ factors[0][r]
            bt = Mt_like @ factors[1][r]
            amp = P_val * factors[2][r][v_idx]
            rhs_terms.append((amp * bx, bt))
        u_direct = _kron_reference_xt(
            ops_x, ops_t, rhs_terms, bc_t0_rows=[0], nx=nx, nt=nt
        ).reshape(nx, nt)

        # PGD at (t_end, P_val, v_val)
        t_eval = Vs[1].tabulate_dof_coordinates()[-5, 0]
        t_idx = nt - 5
        fac = np.ones(res.n_modes)
        for j, val in [(1, t_eval), (2, P_val), (3, v_val)]:
            vals = np.asarray(
                evaluate_modes_1d(Vs[j], res.modes[j], np.asarray([val]), xp=np)
            )[0]
            fac *= vals[: res.n_modes]
        u_pgd = fac @ np.asarray(res.modes[0])[: res.n_modes]

        err = np.linalg.norm(u_pgd - u_direct[:, t_idx]) / np.linalg.norm(
            u_direct[:, t_idx]
        )
        print(
            "moving-source err:", err, "modes:", res.n_modes,
            "sep_err:", sep_err, "amp[-1]:", res.amplitudes[-1],
        )
        assert err < 0.025


class TestMinimalResidualPGD:
    def test_normal_equations_converges_faster(self):
        # greedy Galerkin PGD has no minimization principle on the
        # non-symmetric transient operator; minres (normal equations)
        # does — measured 2.2% (Galerkin) vs 0.10% (minres) at 80 modes
        from pgdrome_tpu.separated import normal_equations

        sep, Vs, factors, sep_err = moving_heat_source(
            n_x=60, n_t=40, n_P=6, n_v=8, af=0.12, source_rank=45
        )
        sep_ne = normal_equations(sep)
        res = SeparatedPGD(sep_ne, n_max=80, tol=1e-14, tol_fp=1e-8).solve()

        P_val = Vs[2].tabulate_dof_coordinates()[3, 0]
        v_idx = 4
        v_val = Vs[3].tabulate_dof_coordinates()[v_idx, 0]
        nx, nt = sep.sizes[0], sep.sizes[1]
        Mx = np.asarray(sep.mass[0])
        Mt = np.asarray(sep.ops[1][1])
        rhs_terms = [
            (P_val * factors[2][r][v_idx] * (Mx @ factors[0][r]), Mt @ factors[1][r])
            for r in range(factors[0].shape[0])
        ]
        u_direct = _kron_reference_xt(
            [np.asarray(sep.ops[0][0]), np.asarray(sep.ops[0][1])],
            [np.asarray(sep.ops[1][0]), np.asarray(sep.ops[1][1])],
            rhs_terms, [0], nx, nt,
        ).reshape(nx, nt)

        t_idx = nt - 5
        t_eval = Vs[1].tabulate_dof_coordinates()[t_idx, 0]
        fac = np.ones(res.n_modes)
        for j, val in [(1, t_eval), (2, P_val), (3, v_val)]:
            vals = np.asarray(
                evaluate_modes_1d(Vs[j], res.modes[j], np.asarray([val]), xp=np)
            )[0]
            fac *= vals[: res.n_modes]
        u_pgd = fac @ np.asarray(res.modes[0])[: res.n_modes]
        err = np.linalg.norm(u_pgd - u_direct[:, t_idx]) / np.linalg.norm(
            u_direct[:, t_idx]
        )
        print("minres moving-source err:", err, "modes:", res.n_modes)
        assert err < 2e-3

    def test_symmetric_problem_converges_too(self):
        # on an SPD problem minres converges to the same limit (mode
        # sequences differ, so compare both against the per-sample solve)
        from pgdrome_tpu.separated import normal_equations
        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.fem.assembly import stiffness_matrix, load_vector
        from pgdrome_tpu.fem.bc import DirichletBC

        sep, Vs = parametric_elliptic(n_x=40, n_p=16, num_params=2)
        p = (0.5, 0.5)
        Vx = Vs[0]
        kappa = lambda x: (
            1.0
            + p[0] * np.sin(np.pi * x) ** 2 / 4
            + p[1] * np.sin(2 * np.pi * x) ** 2 / 4
        )
        K = stiffness_matrix(Vx, weight=kappa)
        bl = load_vector(Vx, lambda x: np.ones_like(x))
        bc = DirichletBC(Vx, 0.0, lambda x, onb: onb)
        A2, b2 = bc.apply_system(K, bl)
        u_ref = np.linalg.solve(A2, b2)

        for prob in (sep, normal_equations(sep)):
            r = SeparatedPGD(prob, n_max=25, tol=1e-13, tol_fp=1e-9).solve()
            fac = np.ones(r.n_modes)
            for j, pj in enumerate(p):
                vals = np.asarray(
                    evaluate_modes_1d(Vs[1 + j], r.modes[1 + j], np.asarray([pj]), xp=np)
                )[0]
                fac *= vals[: r.n_modes]
            u = fac @ np.asarray(r.modes[0])[: r.n_modes]
            err = np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)
            assert err < 5e-5


class TestElasticityVademecum:
    def test_fast_path_vector_space_dim(self):
        # fast path with a VECTOR 2D space dimension (config 4): PGD
        # separates trivially (single term, load linear in params), so it
        # must match the per-sample FEM solve almost exactly
        from pgdrome_tpu.models.problems import elasticity_vademecum
        from pgdrome_tpu.fem.bc import DirichletBC

        # the 1/lam_E dependence carries an O(h_E²) parameter-grid floor
        # (same tensor-Galerkin vs per-sample gap as the elliptic config)
        sep, Vs, (C, bL, bR) = elasticity_vademecum(nx=20, ny=4, n_E=64)
        res = SeparatedPGD(sep, n_max=8, tol=1e-12, tol_fp=1e-10).solve()

        lam_p, lam_E = 1.5, 0.75
        Vx = Vs[0]
        K = np.asarray(sep.ops[0][0])  # E_0-scaled elasticity operator
        b = lam_p * (bL + bR) / 1.0
        bc = DirichletBC(Vx, (0.0, 0.0), lambda p: abs(p[0]) < 1e-9)
        A2, b2 = bc.apply_system(lam_E * K, b)
        u_ref = np.linalg.solve(A2, b2)

        fac = np.ones(res.n_modes)
        for j, val in [(1, lam_p), (2, lam_E)]:
            vals = np.asarray(
                evaluate_modes_1d(Vs[j], res.modes[j], np.asarray([val]), xp=np)
            )[0]
            fac *= vals[: res.n_modes]
        u_pgd = fac @ np.asarray(res.modes[0])[: res.n_modes]
        err = np.linalg.norm(u_pgd - u_ref) / np.linalg.norm(u_ref)
        print("elasticity vademecum err:", err, "modes:", res.n_modes)
        assert err < 1e-4


class TestGalerkinUpdateRcond:
    def test_truncated_matches_plain_when_well_conditioned(self):
        # on a well-conditioned Gram the SVD-truncated solve reproduces
        # the direct solve; the rcond knob only matters for the deep
        # residual cascades' nearly collinear accumulated ranks
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, Vs = parametric_elliptic(n_x=40, n_p=10, num_params=2)
        res = SeparatedPGD(sep, n_max=6, tol=1e-12, tol_fp=1e-8).solve()
        g_plain = galerkin_update(sep, res)
        g_trunc = galerkin_update(sep, res, rcond=1e-12)
        np.testing.assert_allclose(
            np.asarray(g_trunc.modes[0])[: res.n_modes],
            np.asarray(g_plain.modes[0])[: res.n_modes],
            rtol=1e-8, atol=1e-14,
        )


class TestHierarchicalSeparation:
    def test_better_than_greedy_per_budget(self):
        from pgdrome_tpu.utils.separation import (
            separate,
            separate_hierarchical,
            separation_error,
        )

        x = np.linspace(0, 1, 80)
        t = np.linspace(0, 1, 50)
        v = np.linspace(0.5, 1.0, 10)
        X, T, V = np.meshgrid(x, t, v, indexing="ij")
        g = np.exp(-((X - 0.15 - V * T) ** 2) / 0.1**2)
        eg = separation_error(g, separate(g, 60))
        fh = separate_hierarchical(g, tol=1e-5, max_terms=60)
        eh = separation_error(g, fh)
        print("greedy@60:", eg, "hierarchical@<=60:", eh, fh[0].shape[0])
        assert eh < eg

    def test_moving_source_hierarchical_option(self):
        sep, Vs, factors, sep_err = moving_heat_source(
            n_x=60, n_t=40, n_P=6, n_v=8, af=0.12,
            source_rank=100, separation="hierarchical",
        )
        # measured: 7.1e-4 @ 100 terms (greedy CP: 2.4e-2 @ 60, slow decay)
        assert sep_err < 2e-3


class TestMinresFusedPath:
    def test_normal_equations_through_solve_fused(self):
        # the minres-on-TPU recipe: normal equations -> dim-0 energy
        # preconditioning -> f32 fused single-dispatch solve.  Two
        # calibration facts baked into the thresholds: (a) the normal
        # equations SQUARE the time-dim conditioning — fixed-iteration CG
        # stalls (8e-1 @25 its, 3e-2 @200), so use the exact 'chol' solve;
        # (b) even f64-vs-f64, the preconditioned and plain solves differ
        # ~0.7% at rank 20 (different greedy mode sequences) — that drift
        # floor, not f32, sets the achievable agreement.
        from pgdrome_tpu.separated import (
            SeparatedPGD,
            normal_equations,
            precondition_dim0,
        )

        sep, Vs, factors, sep_err = moving_heat_source(
            n_x=40, n_t=24, n_P=5, n_v=6, af=0.15, source_rank=20
        )
        ne = normal_equations(sep)

        res64 = SeparatedPGD(ne, n_max=20, tol=1e-14, tol_fp=1e-8).solve()

        ne32, tf = precondition_dim0(ne, dtype=np.float32)
        res32 = SeparatedPGD(
            ne32,
            n_max=20,
            tol=0.0,
            tol_fp=1e-6,
            solver="chol",
            residual_check=False,
            scan_params=False,  # param dims here have non-uniform sizes
        ).solve_fused()

        def full(res, modes0_full):
            u = np.zeros(tuple(sep.sizes))
            m0 = np.asarray(modes0_full)
            for k in range(res.n_modes):
                t = m0[k]
                for j in range(1, 4):
                    t = np.multiply.outer(t, np.asarray(res.modes[j])[k])
                u += t
            return u

        u64 = full(res64, res64.modes[0])
        u32 = full(res32, tf.modes_to_full(res32.modes[0]))
        err = np.linalg.norm(u32 - u64) / np.linalg.norm(u64)
        print("minres fused-vs-host full-tensor err:", err, res32.n_modes)
        assert res32.n_modes == res64.n_modes == 20
        assert err < 2e-2


class TestBoostCompoundingWarning:
    def test_warns_when_boost_compounds_past_f32(self):
        import warnings

        from pgdrome_tpu.models.problems import parametric_elliptic

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            parametric_elliptic(n_x=8, n_p=4, num_params=10,
                                boundary_boost=(16.0, 6))
        assert any("compounds" in str(x.message) for x in w)

    def test_no_warning_at_proven_levels(self):
        import warnings

        from pgdrome_tpu.models.problems import parametric_elliptic

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            parametric_elliptic(n_x=8, n_p=4, num_params=3,
                                boundary_boost=(16.0, 6))
            parametric_elliptic(n_x=8, n_p=4, num_params=10,
                                boundary_boost=(2.3, 6))
        assert not [x for x in w if "compounds" in str(x.message)]
