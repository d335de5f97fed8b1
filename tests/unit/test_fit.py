"""Batched parameter identification (Vademecum.fit_parameters /
make_fit_fn): box-projected Gauss–Newton with the analytic rank-1
Jacobian.  The reference has no inverse capability — its closest
workflow is per-sample scipy.optimize over evaluate() calls; here every
(observation × start) is one compiled batched program."""

import numpy as np
import jax.numpy as jnp
import pytest

from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD
from pgdrome_tpu.serving import Vademecum


@pytest.fixture(scope="module")
def trained():
    sep, Vs = parametric_elliptic(n_x=40, n_p=16, num_params=2)
    res = SeparatedPGD(sep, n_max=8, tol=1e-12, tol_fp=1e-8).solve()
    return Vs, res


@pytest.fixture(scope="module")
def vd(trained):
    Vs, res = trained
    return Vademecum(Vs, res, dtype=np.float64)


PTS = np.array([0.2, 0.4, 0.6, 0.8])


class TestRecovery:
    def test_exact_recovery(self, vd):
        rng = np.random.default_rng(3)
        p_true = rng.uniform(0.15, 0.85, size=(7, 2))
        obs = np.asarray(vd.sensors(PTS)(jnp.asarray(p_true)))
        p_hat, res = vd.fit_parameters(PTS, obs, n_iter=40)
        np.testing.assert_allclose(p_hat, p_true, atol=5e-7)
        assert np.all(res < 1e-10)

    def test_explicit_starts(self, vd):
        p_true = np.array([[0.3, 0.7]])
        obs = np.asarray(vd.sensors(PTS)(jnp.asarray(p_true)))
        p0 = np.array([[0.5, 0.5]])
        p_hat, res = vd.fit_parameters(PTS, obs, p0=p0, n_iter=40)
        np.testing.assert_allclose(p_hat, p_true, atol=1e-6)

    def test_noisy_observations(self, vd):
        rng = np.random.default_rng(11)
        p_true = np.array([[0.4, 0.6], [0.7, 0.25]])
        clean = np.asarray(vd.sensors(PTS)(jnp.asarray(p_true)))
        sigma = 1e-5 * np.abs(clean).mean()
        obs = clean + rng.normal(0, sigma, clean.shape)
        p_hat, res = vd.fit_parameters(PTS, obs, n_iter=40)
        # the residual floor is the noise, the recovery error scales
        # with noise / sensitivity — just sanity bounds here
        assert np.all(res < 10 * sigma * np.sqrt(len(PTS)))
        np.testing.assert_allclose(p_hat, p_true, atol=0.05)

    def test_box_projection(self, vd):
        # observations from OUTSIDE the reachable set (scaled fields):
        # the solver must stay inside the parameter box and return
        # finite residuals, not NaNs
        p_true = np.array([[0.5, 0.5]])
        obs = 5.0 * np.asarray(vd.sensors(PTS)(jnp.asarray(p_true)))
        p_hat, res = vd.fit_parameters(PTS, obs, n_iter=25)
        assert np.all(np.isfinite(p_hat)) and np.all(np.isfinite(res))
        assert np.all(p_hat >= 0.0 - 1e-12) and np.all(p_hat <= 1.0 + 1e-12)

    def test_f32_path(self, trained):
        Vs, res = trained
        vf = Vademecum(Vs, res, dtype=np.float32)
        p_true = np.array([[0.35, 0.65]], np.float32)
        obs = np.asarray(vf.sensors(PTS)(jnp.asarray(p_true)))
        p_hat, r = vf.fit_parameters(PTS, obs, n_iter=30)
        np.testing.assert_allclose(p_hat, p_true, atol=5e-3)


class TestWeightsAndPrior:
    def test_weights_chi_statistic(self, vd):
        rng = np.random.default_rng(17)
        p_true = np.array([[0.5, 0.5]])
        clean = np.asarray(vd.sensors(PTS)(jnp.asarray(p_true)))
        sig = np.array([1e-6, 2e-6, 5e-7, 1e-6])
        obs = clean + rng.normal(0, 1.0, clean.shape) * sig
        p_hat, chi = vd.fit_parameters(PTS, obs, weights=1.0 / sig,
                                       n_iter=40)
        # weighted residual norm ~ sqrt(dof): order-one chi statistic
        assert 0.05 < chi[0] < 10.0
        np.testing.assert_allclose(p_hat, p_true, atol=1e-3)

    def test_weights_change_optimum(self, vd):
        # inconsistent observations (sensor 0 from a different p): from
        # the SAME start, the unweighted fit moves away from matching
        # sensor 0 (balances all four), the heavily-weighted one stays
        # pinned to it
        p_a = np.array([[0.3, 0.6]])
        p_b = np.array([[0.6, 0.3]])
        obs = np.asarray(vd.sensors(PTS)(jnp.asarray(p_a)))
        obs_b = np.asarray(vd.sensors(PTS)(jnp.asarray(p_b)))
        mixed = obs.copy()
        mixed[0, 0] = obs_b[0, 0]  # sensor 0 disagrees
        w_hi = np.array([1000.0, 1.0, 1.0, 1.0])
        p1, _ = vd.fit_parameters(PTS, mixed, p0=p_b, n_iter=40)
        p2, _ = vd.fit_parameters(PTS, mixed, p0=p_b, weights=w_hi,
                                  n_iter=40)
        r1 = np.asarray(vd.sensors(PTS)(jnp.asarray(p1)))[0, 0] - mixed[0, 0]
        r2 = np.asarray(vd.sensors(PTS)(jnp.asarray(p2)))[0, 0] - mixed[0, 0]
        assert abs(r2) < 0.1 * abs(r1)
        # weighted resnorm IS the weighted norm (chi convention)
        _, rn = vd.fit_parameters(PTS, mixed, p0=p_b, weights=w_hi,
                                  n_iter=40)
        f = np.asarray(vd.sensors(PTS)(
            jnp.asarray(vd.fit_parameters(PTS, mixed, p0=p_b,
                                          weights=w_hi, n_iter=40)[0])
        ))
        man = np.linalg.norm((f - mixed) * w_hi[None, :], axis=1)
        np.testing.assert_allclose(rn, man, rtol=1e-8)

    def test_prior_resolves_underdetermined(self, vd):
        # ONE sensor, TWO parameters: the solution manifold is a curve;
        # the Tikhonov prior picks the prior-closest point on it
        pt1 = np.array([0.5])
        p_true = np.array([[0.4, 0.6]])
        obs = np.asarray(vd.sensors(pt1)(jnp.asarray(p_true)))
        p_prior = np.array([0.35, 0.55])
        p_hat, res = vd.fit_parameters(
            pt1, obs, prior=(p_prior, 1e-4), n_iter=60,
        )
        # on the manifold (observation matched up to the tiny Tikhonov
        # bias — gamma trades a ~gamma²·|Δp| manifold violation)...
        fitted = np.asarray(vd.sensors(pt1)(jnp.asarray(p_hat)))
        np.testing.assert_allclose(fitted, obs, atol=1e-6)
        # ...and near the prior, NOT at an arbitrary point
        assert np.linalg.norm(p_hat[0] - p_prior) < 0.08

    def test_multistart_winner_uses_regularized_cost(self, vd):
        # underdetermined + prior with MULTI-START (no p0): every start
        # reaches near-zero data residual somewhere on the manifold; the
        # winner must be chosen by the full regularized cost, i.e. land
        # near the prior, not at an arbitrary manifold point
        pt1 = np.array([0.5])
        p_true = np.array([[0.4, 0.6]])
        obs = np.asarray(vd.sensors(pt1)(jnp.asarray(p_true)))
        p_prior = np.array([0.38, 0.58])
        p_hat, _ = vd.fit_parameters(pt1, obs, prior=(p_prior, 1e-4),
                                     n_starts=8, n_iter=60)
        assert np.linalg.norm(p_hat[0] - p_prior) < 0.08

    def test_covariance_includes_prior_precision(self, vd):
        # a gauge set well-posed ONLY through the prior: without the
        # prior precision in the linearized posterior, (J^T J)^{-1}
        # explodes along the unconstrained direction
        pts3 = np.array([0.48, 0.5, 0.52])  # nearly-redundant sensors
        p_true = np.array([[0.4, 0.6]])
        rng = np.random.default_rng(23)
        obs = np.asarray(vd.sensors(pts3)(jnp.asarray(p_true)))
        obs = obs + rng.normal(0, 1e-7, obs.shape)
        gamma = 0.05
        p_hat, res, cov = vd.fit_parameters(
            pts3, obs, prior=(np.array([0.4, 0.6]), gamma),
            return_covariance=True,
        )
        # bounded by the prior: std along ANY direction <= sigma_hat/gamma
        sig2 = res[0] ** 2 / (len(pts3) - 2)
        ev = np.linalg.eigvalsh(cov[0])
        assert np.all(ev > 0)
        assert ev.max() <= sig2 / gamma**2 * (1 + 1e-9)

    def test_prior_validation(self, vd):
        obs = np.ones((1, 4))
        with pytest.raises(ValueError, match="p_prior"):
            vd.fit_parameters(PTS, obs, prior=(np.ones(3), 1.0))
        with pytest.raises(ValueError, match="weights"):
            vd.fit_parameters(PTS, obs, weights=np.ones(3))


class TestCovariance:
    def test_formula(self, vd):
        rng = np.random.default_rng(5)
        p_true = np.array([[0.45, 0.55]])
        clean = np.asarray(vd.sensors(PTS)(jnp.asarray(p_true)))
        sigma = 1e-6
        obs = clean + rng.normal(0, sigma, clean.shape)
        p_hat, res, cov = vd.fit_parameters(PTS, obs, n_iter=40,
                                            return_covariance=True)
        assert cov.shape == (1, 2, 2)
        # manual: sigma_hat^2 (J^T J)^-1 at p_hat
        J = np.asarray(vd.sensors_jacobian(PTS)(jnp.asarray(p_hat)))
        s2 = res[0] ** 2 / (len(PTS) - 2)
        man = s2 * np.linalg.inv(J[0].T @ J[0])
        np.testing.assert_allclose(cov[0], man, rtol=1e-10)
        # SPD and roughly at the noise scale
        ev = np.linalg.eigvalsh(cov[0])
        assert np.all(ev > 0)
        assert np.all(np.sqrt(np.diag(cov[0])) < 100 * sigma / 1e-2)

    def test_needs_overdetermined(self, vd):
        obs = np.asarray(vd.sensors(np.array([0.4, 0.6]))(
            jnp.asarray([[0.5, 0.5]])
        ))
        with pytest.raises(ValueError, match="n_out > d_p"):
            vd.fit_parameters(np.array([0.4, 0.6]), obs,
                              return_covariance=True)


class TestValidation:
    def test_bad_obs_shape(self, vd):
        with pytest.raises(ValueError, match="observations"):
            vd.fit_parameters(PTS, np.ones(4))

    def test_bad_p0_shape(self, vd):
        with pytest.raises(ValueError, match="p0 must be"):
            vd.fit_parameters(PTS, np.ones((2, 4)), p0=np.ones((3, 2)))

    def test_cached_program(self, vd):
        obs = np.asarray(vd.sensors(PTS)(jnp.asarray([[0.5, 0.5]])))
        vd.fit_parameters(PTS, obs)
        key = ("fit", np.asarray(PTS, np.float64).tobytes(), PTS.shape,
               30, 1e-9, b"", b"")
        assert key in vd._sensor_cache


class TestDesignSensors:
    def _additive(self):
        from pgdrome_tpu.fem.mesh import IntervalMesh
        from pgdrome_tpu.fem.space import FunctionSpace
        from pgdrome_tpu.separated import PGDResult

        Vx = FunctionSpace(IntervalMesh(10, 0.0, 1.0), "P", 2)
        Vp = FunctionSpace(IntervalMesh(6, 0.0, 1.0), "P", 1)
        Vq = FunctionSpace(IntervalMesh(6, 0.0, 1.0), "P", 2)
        x = Vx.dof_coords[:, 0]
        p = Vp.dof_coords[:, 0]
        q = Vq.dof_coords[:, 0]
        res = PGDResult(
            modes=[np.stack([x, x * x]),
                   np.stack([p, np.ones_like(p)]),
                   np.stack([np.ones_like(q), q * q])],
            n_modes=2, amplitudes=np.ones(2), alpha=np.ones(2),
            fp_its=np.ones(2, int), normU0=1.0,
        )
        return Vademecum([Vx, Vp, Vq], res, dtype=np.float64)

    def test_analytic_optimum(self):
        # u = x·p + x²·q²: at the box center the Jacobian row of a
        # sensor at x is [x, x²]; the D-optimal pair over a grid
        # maximizes x1²x2²(x2−x1)² → {0.5, 1.0}
        vd = self._additive()
        cands = np.round(np.linspace(0.1, 1.0, 19), 4)
        idx, pts = vd.design_sensors(cands, 2)
        assert set(np.round(pts, 2)) == {0.5, 1.0}

    def test_beats_clustered_design(self):
        # posterior volume with the designed sensors must beat a
        # clustered (nearly redundant) gauge set
        rng = np.random.default_rng(31)
        vd = self._additive()
        cands = np.linspace(0.1, 1.0, 19)
        _, good = vd.design_sensors(cands, 3)
        bad = np.array([0.48, 0.5, 0.52])
        p_true = np.array([[0.4, 0.6]])
        for pts, label in [(good, "good"), (bad, "bad")]:
            obs = np.asarray(vd.sensors(pts)(jnp.asarray(p_true)))
            obs = obs + rng.normal(0, 1e-6, obs.shape)
            _, _, cov = vd.fit_parameters(pts, obs, n_iter=40,
                                          return_covariance=True)
            if label == "good":
                det_good = np.linalg.det(cov[0])
            else:
                det_bad = np.linalg.det(cov[0])
        assert det_good < det_bad

    def test_validation(self):
        vd = self._additive()
        with pytest.raises(ValueError, match="k must be"):
            vd.design_sensors(np.linspace(0, 1, 5), 9)


class TestTransient:
    def test_spacetime_recovery(self):
        from pgdrome_tpu.fem.mesh import IntervalMesh
        from pgdrome_tpu.fem.space import FunctionSpace
        from pgdrome_tpu.separated import PGDResult
        from pgdrome_tpu.serving import TransientVademecum

        # hand-built space-time vademecum: u = (x·t)·p + (x²·t²)·p²
        Vx = FunctionSpace(IntervalMesh(8, 0.0, 1.0), "P", 2)
        Vt = FunctionSpace(IntervalMesh(6, 0.0, 1.0), "P", 2)
        Vp = FunctionSpace(IntervalMesh(12, 0.0, 1.0), "P", 2)
        x = Vx.dof_coords[:, 0]
        t = Vt.dof_coords[:, 0]
        p = Vp.dof_coords[:, 0]
        res = PGDResult(
            modes=[np.stack([x, x * x]), np.stack([t, t * t]),
                   np.stack([p, p * p])],
            n_modes=2, amplitudes=np.ones(2), alpha=np.ones(2),
            fp_its=np.ones(2, int), normU0=1.0,
        )
        tv = TransientVademecum([Vx, Vt, Vp], res, field_dims=2,
                                dtype=np.float64)
        pts = np.array([[0.5, 0.5], [0.75, 1.0], [1.0, 0.25]])
        p_true = np.array([[0.37], [0.81]])
        obs = np.asarray(tv.sensors(pts)(jnp.asarray(p_true)))
        p_hat, r = tv.fit_parameters(pts, obs, n_iter=40)
        np.testing.assert_allclose(p_hat, p_true, atol=1e-8)
        assert np.all(r < 1e-12)
