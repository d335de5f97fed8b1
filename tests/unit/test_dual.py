"""Goal-oriented primal-dual output correction (pgdrome_tpu/dual.py).

The load-bearing check is the reduced-vs-direct identity: the
corrector's reduced assembly (theta extraction from collocation stacks,
sparse C_t coupling, rhs reduction) must reproduce the DIRECT dense
computation s_plain + z_r.(b - K(p) u_r) with real per-sample FEM
matrices to near machine precision; and against true per-sample FEM
solves the corrected output error must be exactly (z_true - z_r).r
(the linear-problem identity), i.e. quadratically small."""

import numpy as np
import pytest

from pgdrome_tpu.dual import (
    DualCorrector,
    adjoint_problem,
    collocation_weights,
    point_functional,
)
from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix
from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0

X0 = 0.375  # sensor location (vertex of any structured refinement of 8)


def _solve(sep, n_max, tol_fp=1e-9):
    pc, tf = precondition_dim0(sep, dtype=np.float64)
    res = SeparatedPGD(pc, n_max=n_max, tol=0.0, tol_fp=tol_fp,
                       residual_check=False, dtype=np.float64).solve()
    return res, tf


def _fem(Vx, p, num_params):
    kap = lambda x: 1.0 + sum(
        p[i] * np.sin((i + 1) * np.pi * x) ** 2 / (2 * num_params)
        for i in range(num_params)
    )
    return stiffness_matrix(Vx, weight=kap)


def _samples(Vs, num_params, n=6, seed=3):
    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    rng = np.random.default_rng(seed)
    pts = grid[rng.integers(1, len(grid) - 1, size=(n, num_params))]
    pts[0] = grid[1]       # all-lo corner
    pts[1] = grid[-2]      # all-hi corner
    return pts


class TestReducedIdentity:
    def test_reduced_equals_direct_dense(self):
        """Reduced corrected() == direct dense z_r.(b - K(p) u_r) with
        per-sample FEM operators — validates theta extraction, sparse
        coupling assembly and bc handling end to end."""
        num_params = 2
        sep, Vs = parametric_elliptic(n_x=40, n_p=12,
                                      num_params=num_params, degree_x=2)
        res_u, tf_u = _solve(sep, 5)
        l = point_functional(Vs[0], X0)
        res_z, tf_z = _solve(adjoint_problem(sep, l), 6)
        dc = DualCorrector(sep, Vs, l, res_u, tf_u, res_z, tf_z)

        pts = _samples(Vs, num_params)
        s_corr, s_plain, z_r = dc.corrected(pts, return_parts=True)

        b = load_vector(Vs[0], lambda x: np.ones_like(x))
        U0 = tf_u.modes_to_full(
            np.asarray(res_u.modes[0])[: res_u.n_modes])
        Z0 = tf_z.modes_to_full(
            np.asarray(res_z.modes[0])[: res_z.n_modes])
        scale = float(np.abs(s_plain).max())
        for k, p in enumerate(pts):
            fu = dc._factors(res_u, p[None])[0]
            fz = dc._factors(res_z, p[None])[0]
            u = fu @ U0
            z = fz @ Z0
            K = _fem(Vs[0], p, num_params)
            r = b - K @ u
            r[[0, -1]] = 0.0  # Dirichlet rows carry no residual meaning
            direct = u[np.nonzero(l)[0]] @ l[np.nonzero(l)[0]] + z @ r
            assert abs(s_corr[k] - (s_plain[k] + z @ r)) < 1e-11 * scale
            assert abs(s_corr[k] - direct) < 1e-11 * scale

    def test_boosted_build_identity(self):
        """Boundary-boosted collocation weights cancel out of the
        extracted theta (the measure reweighting must not change the
        corrected output)."""
        num_params = 2
        import warnings

        with warnings.catch_warnings():
            warnings.filterwarnings(
                "ignore", message=".*boundary_boost compounds.*")
            sep_b, Vs = parametric_elliptic(
                n_x=40, n_p=12, num_params=num_params, degree_x=2,
                boundary_boost=(8.0, 6))
        sep_p, _ = parametric_elliptic(n_x=40, n_p=12,
                                       num_params=num_params, degree_x=2)
        res_u, tf_u = _solve(sep_b, 5)
        l = point_functional(Vs[0], X0)
        res_z, tf_z = _solve(adjoint_problem(sep_b, l), 6)

        pts = _samples(Vs, num_params)
        s_b = DualCorrector(sep_b, Vs, l, res_u, tf_u,
                            res_z, tf_z).corrected(pts)
        # same modes through the PLAIN problem's decomposition
        s_p = DualCorrector(sep_p, Vs, l, res_u, tf_u,
                            res_z, tf_z).corrected(pts)
        np.testing.assert_allclose(s_b, s_p, rtol=1e-10)


class TestCorrectionAccuracy:
    def test_quadratic_error_and_beats_plain(self):
        """vs true per-sample FEM outputs: corrected error equals the
        (z_true - z_r).r identity to machine precision and beats the
        plain output error by the dual's relative accuracy."""
        num_params = 3
        sep, Vs = parametric_elliptic(n_x=48, n_p=12,
                                      num_params=num_params, degree_x=2)
        res_u, tf_u = _solve(sep, 4)    # coarse primal: visible error
        l = point_functional(Vs[0], X0)
        res_z, tf_z = _solve(adjoint_problem(sep, l), 10)
        dc = DualCorrector(sep, Vs, l, res_u, tf_u, res_z, tf_z)

        pts = _samples(Vs, num_params, n=8)
        s_corr, s_plain, _ = dc.corrected(pts, return_parts=True)

        b = load_vector(Vs[0], lambda x: np.ones_like(x))
        U0 = tf_u.modes_to_full(
            np.asarray(res_u.modes[0])[: res_u.n_modes])
        Z0 = tf_z.modes_to_full(
            np.asarray(res_z.modes[0])[: res_z.n_modes])
        e_plain, e_corr, ident = [], [], []
        for k, p in enumerate(pts):
            K = _fem(Vs[0], p, num_params)
            u_t = np.zeros(K.shape[0])
            u_t[1:-1] = np.linalg.solve(K[1:-1, 1:-1], b[1:-1])
            z_t = np.zeros(K.shape[0])
            z_t[1:-1] = np.linalg.solve(K[1:-1, 1:-1], l[1:-1])
            s_true = l @ u_t
            e_plain.append(abs(s_plain[k] - s_true))
            e_corr.append(abs(s_corr[k] - s_true))
            u = dc._factors(res_u, p[None])[0] @ U0
            z = dc._factors(res_z, p[None])[0] @ Z0
            r = b - K @ u
            r[[0, -1]] = 0.0
            ident.append(abs((s_true - s_corr[k]) - (z_t - z) @ r))
        e_plain, e_corr = np.asarray(e_plain), np.asarray(e_corr)
        assert max(ident) < 1e-12 * max(abs(s_plain).max(), 1.0)
        assert e_plain.max() > 1e-8           # primal IS coarse
        assert e_corr.max() < 0.02 * e_plain.max()

    def test_adjoint_vademecum_matches_fem(self):
        """adjoint_problem solved by the standard pipeline converges to
        the per-sample FEM adjoint (it's just another vademecum)."""
        num_params = 2
        sep, Vs = parametric_elliptic(n_x=40, n_p=12,
                                      num_params=num_params, degree_x=2)
        l = point_functional(Vs[0], X0)
        res_z, tf_z = _solve(adjoint_problem(sep, l), 12)
        Z0 = tf_z.modes_to_full(
            np.asarray(res_z.modes[0])[: res_z.n_modes])
        dc = None
        from pgdrome_tpu.separated import evaluate_modes_1d

        pts = _samples(Vs, num_params, n=4)
        for p in pts:
            fac = np.ones(res_z.n_modes)
            for j in range(num_params):
                fac *= np.asarray(evaluate_modes_1d(
                    Vs[1 + j], res_z.modes[1 + j], p[j : j + 1], xp=np
                ))[0][: res_z.n_modes]
            z = fac @ Z0
            K = _fem(Vs[0], p, num_params)
            z_t = np.zeros(K.shape[0])
            z_t[1:-1] = np.linalg.solve(K[1:-1, 1:-1], l[1:-1])
            # the point-source adjoint has a kink at x0 — slower to
            # separate than the smooth primal; rank 12 measures ~2.5e-5
            assert (np.linalg.norm(z - z_t)
                    < 1e-4 * np.linalg.norm(z_t))


class TestDeviceSweep:
    def test_matches_host_corrector(self):
        """The jitted f32 device sweep must track the host f64 corrector
        to ~1e-6 of the OUTPUT (the dd z·b + per-mode pre-cancellation
        keep the correction's cancellation out of f32), and must keep
        the corrected accuracy gain."""
        from pgdrome_tpu.dual import make_corrected_sensor_fn

        num_params = 3
        sep, Vs = parametric_elliptic(n_x=48, n_p=16,
                                      num_params=num_params, degree_x=2)
        res_u, tf_u = _solve(sep, 5)
        l = point_functional(Vs[0], X0)
        res_z, tf_z = _solve(adjoint_problem(sep, l), 10)
        dc = DualCorrector(sep, Vs, l, res_u, tf_u, res_z, tf_z)

        pts = _samples(Vs, num_params, n=16)
        s_host, s_plain_host, _ = dc.corrected(pts, return_parts=True)
        fn = make_corrected_sensor_fn(dc, aot=False)
        s_dev, s_plain_dev = (np.asarray(a) for a in fn(pts))

        scale = np.abs(s_host).max()
        assert np.abs(s_dev - s_host).max() < 2e-6 * scale
        assert np.abs(s_plain_dev - s_plain_host).max() < 1e-5 * scale
        # the device sweep preserves most of the correction: against
        # FEM truth it must stay far below the plain output error
        b = load_vector(Vs[0], lambda x: np.ones_like(x))
        e_p, e_c = [], []
        for k, p in enumerate(pts):
            K = _fem(Vs[0], p, num_params)
            u_t = np.zeros(K.shape[0])
            u_t[1:-1] = np.linalg.solve(K[1:-1, 1:-1], b[1:-1])
            s_true = l @ u_t
            e_p.append(abs(s_plain_host[k] - s_true))
            e_c.append(abs(s_dev[k] - s_true))
        assert max(e_c) < 0.05 * max(e_p)

    def test_explicit_theta_rejected(self):
        from pgdrome_tpu.dual import make_corrected_sensor_fn

        sep, Vs = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        res_u, tf_u = _solve(sep, 3)
        l = point_functional(Vs[0], X0)
        res_z, tf_z = _solve(adjoint_problem(sep, l), 3)
        dc = DualCorrector(sep, Vs, l, res_u, tf_u, res_z, tf_z,
                           theta_ops=lambda s: np.ones((len(s), 3)),
                           theta_rhs=lambda s: np.ones((len(s), 1)))
        with pytest.raises(ValueError, match="auto-extracted"):
            make_corrected_sensor_fn(dc, aot=False)


class TestElasticityFlagship:
    def test_corrected_outputs_on_4dim_elasticity(self):
        """Generality beyond 1D Poisson: the 4-dim elasticity flagship
        (vector 2D space ⊗ λp ⊗ λE ⊗ ν, TWO operator terms, TWO rhs
        terms) through the same DualCorrector — verified against
        per-sample FEM with ANALYTIC affine coefficients
        A = E0·λE·(f1(ν)K1 + f2(ν)K2), b = λp(bL+bR)."""
        from pgdrome_tpu.models.problems import (
            _nu_f1,
            _nu_f2,
            elasticity_vademecum,
        )

        from pgdrome_tpu.separated import precondition_dim

        sep, Vs, _ = elasticity_vademecum(
            nx=10, ny=3, n_p=6, n_E=6, n_nu=6,
            param_discretization="collocation")

        def _solve_el(problem, n_max):
            # K1 alone is singular (no shear) — precondition with the
            # SPD term sum, the flagship recipe (test_elasticity_nu)
            base = (np.asarray(problem.ops[0][0])
                    + np.asarray(problem.ops[0][1]))
            pc, tf = precondition_dim(problem, dim=0, dtype=np.float64,
                                      base=base)
            res = SeparatedPGD(pc, n_max=n_max, tol=0.0, tol_fp=1e-9,
                               residual_check=False,
                               dtype=np.float64).solve()
            return res, tf

        res_u, tf_u = _solve_el(sep, 4)

        # sensor: one displacement dof (point value of a component at a
        # node) with significant response, away from the clamped edge
        U0 = tf_u.modes_to_full(np.asarray(res_u.modes[0])[:1])
        j = int(np.argmax(np.abs(U0[0])))
        l = np.zeros(sep.sizes[0])
        l[j] = 1.0

        res_z, tf_z = _solve_el(adjoint_problem(sep, l), 10)
        dc = DualCorrector(sep, Vs, l, res_u, tf_u, res_z, tf_z)

        grids = [Vs[1 + k].tabulate_dof_coordinates()[:, 0]
                 for k in range(3)]
        rng = np.random.default_rng(11)
        pts = np.stack([g[rng.integers(1, len(g) - 1, size=8)]
                        for g in grids], axis=1)
        pts[0] = [g[1] for g in grids]
        pts[1] = [g[-2] for g in grids]
        s_corr, s_plain, _ = dc.corrected(pts, return_parts=True)

        E0 = 30000.0
        K1 = np.asarray(sep.ops[0][0], dtype=np.float64) / E0
        K2 = np.asarray(sep.ops[0][1], dtype=np.float64) / E0
        bLR = np.asarray(sep.rhs[0], dtype=np.float64).sum(axis=0)
        free = np.setdiff1d(np.arange(sep.sizes[0]),
                            np.asarray(sep.bc_dofs[0]))
        e_plain, e_corr = [], []
        for k, (lp, lE, nu) in enumerate(pts):
            A = E0 * lE * (_nu_f1(nu) * K1 + _nu_f2(nu) * K2)
            u_t = np.zeros(sep.sizes[0])
            u_t[free] = np.linalg.solve(A[np.ix_(free, free)],
                                        lp * bLR[free])
            s_true = u_t[j]
            e_plain.append(abs(s_plain[k] - s_true))
            e_corr.append(abs(s_corr[k] - s_true))
        assert max(e_plain) > 1e-10 * abs(s_plain).max()
        assert max(e_corr) < 0.05 * max(e_plain)


class TestAdjointVerifier:
    def test_dense_verifier_rhs_vec(self):
        """elliptic_dense_verifier(rhs_vec=l) measures the ADJOINT
        vademecum against per-sample FEM adjoint solves — a converged
        adjoint must verify tight, and a truncated one must verify
        strictly worse."""
        from pgdrome_tpu.models.problems import elliptic_dense_verifier

        num_params = 2
        sep, Vs = parametric_elliptic(n_x=40, n_p=12,
                                      num_params=num_params, degree_x=2)
        l = point_functional(Vs[0], X0)
        res_z, tf_z = _solve(adjoint_problem(sep, l), 14)
        verify = elliptic_dense_verifier(Vs, tf_z, n_random=8,
                                         seeds=(7,), rhs_vec=l)
        v = verify(res_z)
        assert v["max"] < 5e-5
        # truncation sensitivity: fewer modes -> measurably worse
        import dataclasses

        res_trunc = dataclasses.replace(res_z, n_modes=4)
        assert verify(res_trunc)["max"] > 5.0 * v["max"]


class TestGuaranteedBound:
    def test_bound_dominates_true_error(self):
        """guaranteed_output_bound: |s_true - s_corr| <= bound at EVERY
        sample (the A(p) >= K0 Cauchy-Schwarz certificate), with finite
        overestimation, and validity rejection for negative-coefficient
        problems is exercised via the theta check."""
        from pgdrome_tpu.dual import guaranteed_output_bound

        num_params = 3
        sep, Vs = parametric_elliptic(n_x=48, n_p=12,
                                      num_params=num_params, degree_x=2)
        res_u, tf_u = _solve(sep, 4)
        l = point_functional(Vs[0], X0)
        res_z, tf_z = _solve(adjoint_problem(sep, l), 6)
        dc = DualCorrector(sep, Vs, l, res_u, tf_u, res_z, tf_z)
        bnd = guaranteed_output_bound(sep, Vs, l, res_u, tf_u,
                                      res_z, tf_z)

        pts = _samples(Vs, num_params, n=10)
        s_corr = dc.corrected(pts)
        b = load_vector(Vs[0], lambda x: np.ones_like(x))
        true_err, bounds = [], np.asarray(bnd(pts))
        for k, p in enumerate(pts):
            K = _fem(Vs[0], p, num_params)
            u_t = np.zeros(K.shape[0])
            u_t[1:-1] = np.linalg.solve(K[1:-1, 1:-1], b[1:-1])
            true_err.append(abs(s_corr[k] - l @ u_t))
        true_err = np.asarray(true_err)
        # rigorous domination (tiny slack for the dd/f32 indicator
        # arithmetic at ~2^-48 of the contraction)
        assert np.all(true_err <= bounds * (1 + 1e-6) + 1e-14)
        # and it is a usable bound, not vacuous
        assert bounds.max() < 1e3 * max(true_err.max(), 1e-16)
        assert bounds.max() > 0

    def test_multi_term_rhs_rejected(self):
        from pgdrome_tpu.dual import guaranteed_output_bound
        from pgdrome_tpu.models.problems import elasticity_vademecum

        sep, Vs, _ = elasticity_vademecum(
            nx=8, ny=3, n_p=4, n_E=4, n_nu=4,
            param_discretization="collocation")
        l = np.zeros(sep.sizes[0])
        l[10] = 1.0
        with pytest.raises(ValueError, match="single p-independent"):
            guaranteed_output_bound(sep, Vs, l, None, None, None, None)


class TestServingBridge:
    def test_vademecum_corrected_sensors(self):
        """Vademecum.attach_corrector / corrected_sensors: both the
        device-staged and host paths, and the no-corrector raise."""
        from pgdrome_tpu.serving import Vademecum

        num_params = 2
        sep, Vs = parametric_elliptic(n_x=32, n_p=10,
                                      num_params=num_params, degree_x=2)
        res_u, tf_u = _solve(sep, 4)
        l = point_functional(Vs[0], X0)
        res_z, tf_z = _solve(adjoint_problem(sep, l), 8)
        dc = DualCorrector(sep, Vs, l, res_u, tf_u, res_z, tf_z)

        vd = Vademecum(Vs, res_u, dim0_transform=tf_u,
                       dtype=np.float64)
        with pytest.raises(RuntimeError, match="no corrector"):
            vd.corrected_sensors(np.zeros((1, num_params)) + 0.5)

        pts = _samples(Vs, num_params, n=5)
        s_host_ref, s_plain_ref, est_ref = dc.corrected(
            pts, return_parts=True)

        vd.attach_corrector(dc, device=False)
        s_host, est_host = vd.corrected_sensors(pts,
                                                return_estimate=True)
        np.testing.assert_allclose(s_host, s_host_ref, rtol=0, atol=0)
        np.testing.assert_allclose(est_host, est_ref, rtol=0, atol=0)

        vd.attach_corrector(dc, device=True)
        s_dev = vd.corrected_sensors(pts)
        scale = np.abs(s_host_ref).max()
        assert np.abs(s_dev - s_host_ref).max() < 2e-6 * scale


class TestValidation:
    def test_galerkin_params_rejected(self):
        sep, _ = parametric_elliptic(n_x=24, n_p=8, num_params=2,
                                     param_discretization="galerkin")
        with pytest.raises(ValueError, match="collocation-diagonal"):
            collocation_weights(sep, 1)

    def test_l_shape_checked(self):
        sep, Vs = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        with pytest.raises(ValueError, match="expected"):
            adjoint_problem(sep, np.ones(7))

    def test_out_of_box_samples_rejected(self):
        sep, Vs = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        res_u, tf_u = _solve(sep, 3)
        l = point_functional(Vs[0], X0)
        res_z, tf_z = _solve(adjoint_problem(sep, l), 3)
        dc = DualCorrector(sep, Vs, l, res_u, tf_u, res_z, tf_z)
        with pytest.raises(ValueError, match="parameter box"):
            dc.corrected(np.array([[0.5, 1.5]]))

    def test_out_of_domain_sensor_rejected(self):
        sep, Vs = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        with pytest.raises(ValueError, match="outside the mesh"):
            point_functional(Vs[0], 2.0)

    def test_none_bc_dofs_supported(self):
        import dataclasses

        from pgdrome_tpu.separated import SeparatedProblem

        sep, Vs = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        sep2 = SeparatedProblem(
            ops=sep.ops, rhs=sep.rhs, mass=sep.mass,
            bc_dofs=[sep.bc_dofs[0], None, None])
        adj = adjoint_problem(sep2, point_functional(Vs[0], X0))
        assert all(len(b) == 0 for b in adj.bc_dofs[1:])

    def test_point_functional_is_point_eval(self):
        sep, Vs = parametric_elliptic(n_x=32, n_p=8, num_params=2)
        l = point_functional(Vs[0], X0)
        x = Vs[0].tabulate_dof_coordinates()[:, 0]
        u = np.sin(2.3 * x) + 0.5 * x**2
        # P2 interpolation of a smooth function: nodal-exactness at dofs
        assert abs(l @ u - (np.sin(2.3 * X0) + 0.5 * X0**2)) < 2e-5
