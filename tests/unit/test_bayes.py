"""Bayesian posterior sampling over the vademecum (parallel/bayes.py +
Vademecum.sample_posterior) and the MCMC diagnostics (uq.split_rhat /
uq.effective_sample_size).

Ground truth: vademecums built LINEAR in the parameters make the
posterior an (effectively untruncated) Gaussian with closed-form
mean/covariance — the sampler's moments must match to Monte-Carlo
error.  The reference has no Bayesian capability at all (its closest
workflow is per-sample scipy over evaluate() calls)."""

import numpy as np
import pytest

from pgdrome_tpu.fem.mesh import IntervalMesh
from pgdrome_tpu.fem.space import FunctionSpace
from pgdrome_tpu.separated import PGDResult
from pgdrome_tpu.serving import TransientVademecum, Vademecum
from pgdrome_tpu.uq import effective_sample_size, split_rhat


def _space(n, degree, a=0.0, b=1.0):
    return FunctionSpace(IntervalMesh(n, a, b), "P", degree)


def _result(modes):
    modes = [np.asarray(m, np.float64) for m in modes]
    K = modes[0].shape[0]
    return PGDResult(
        modes=modes, n_modes=K, amplitudes=np.ones(K),
        alpha=np.ones(K), fp_its=np.ones(K, int), normU0=1.0,
    )


@pytest.fixture(scope="module")
def linear_vd():
    """u(x, p, q) = x·p + x²·q — LINEAR in (p, q): observations at
    points x_i give y = A θ + ε with A rows [x_i, x_i²]."""
    Vx, Vp, Vq = _space(8, 2), _space(6, 1), _space(6, 1)
    x = Vx.dof_coords[:, 0]
    p = Vp.dof_coords[:, 0]
    q = Vq.dof_coords[:, 0]
    res = _result([
        np.stack([x, x**2]),
        np.stack([p, np.ones_like(p)]),
        np.stack([np.ones_like(q), q]),
    ])
    return Vademecum([Vx, Vp, Vq], res, dtype=np.float64)


def _gaussian_posterior(A, y, sig, prior=None):
    """Exact Gaussian posterior for y = Aθ + N(0, diag(sig²))."""
    Aw = A / sig[:, None]
    H = Aw.T @ Aw
    b = Aw.T @ (y / sig)
    if prior is not None:
        pp, gamma = prior
        g2 = np.broadcast_to(np.asarray(gamma, float) ** 2, (A.shape[1],))
        H = H + np.diag(g2)
        b = b + g2 * np.asarray(pp, float)
    cov = np.linalg.inv(H)
    return cov @ b, cov


class TestConjugateGaussian:
    def test_flat_prior(self, linear_vd):
        pts = np.array([0.25, 0.5, 0.9])
        A = np.stack([pts, pts**2], axis=1)
        theta = np.array([0.55, 0.35])
        sig = np.full(3, 0.004)
        rng = np.random.default_rng(5)
        y = A @ theta + rng.normal(0.0, sig)
        out = linear_vd.sample_posterior(
            pts, y, sig, n_samples=2500, n_chains=32, seed=1,
        )
        mu, cov = _gaussian_posterior(A, y, sig)
        # posterior comfortably inside the unit box -> untruncated
        assert np.all(mu - 5 * np.sqrt(np.diag(cov)) > 0)
        assert np.all(mu + 5 * np.sqrt(np.diag(cov)) < 1)
        ess = out["ess"].min()
        assert ess > 200, f"ESS too small: {out['ess']}"
        # MC error of the mean ~ std/sqrt(ESS); allow 5 sigma
        tol = 5 * np.sqrt(np.diag(cov)) / np.sqrt(ess)
        assert np.all(np.abs(out["samples"].mean(0) - mu) < tol), (
            out["samples"].mean(0), mu, tol
        )
        # covariance to ~25% (second moments converge slower)
        cov_mc = np.cov(out["samples"].T)
        assert np.all(
            np.abs(cov_mc - cov) < 0.25 * np.outer(
                np.sqrt(np.diag(cov)), np.sqrt(np.diag(cov))
            ) + 1e-12
        )
        assert np.all(out["r_hat"] < 1.05), out["r_hat"]
        assert 0.1 < out["acceptance"] < 0.6
        # MAP agrees with the analytic mean (flat prior, interior)
        assert np.allclose(out["p_map"], mu, atol=1e-6)

    def test_gaussian_prior_underdetermined(self, linear_vd):
        # ONE sensor, two parameters: likelihood alone is degenerate;
        # the Gaussian prior makes the posterior a proper Gaussian
        pts = np.array([0.5])
        A = np.array([[0.5, 0.25]])
        theta = np.array([0.5, 0.5])
        sig = np.full(1, 0.003)
        y = A @ theta  # noise-free observation
        prior = (np.array([0.45, 0.55]), 25.0)  # sigma_prior = 0.04
        out = linear_vd.sample_posterior(
            pts, y, sig, n_samples=2500, n_chains=32, seed=3,
            prior=prior,
        )
        mu, cov = _gaussian_posterior(A, y, sig, prior=prior)
        assert np.all(mu - 5 * np.sqrt(np.diag(cov)) > 0)
        assert np.all(mu + 5 * np.sqrt(np.diag(cov)) < 1)
        ess = out["ess"].min()
        assert ess > 200
        tol = 5 * np.sqrt(np.diag(cov)) / np.sqrt(ess)
        assert np.all(np.abs(out["samples"].mean(0) - mu) < tol)
        cov_mc = np.cov(out["samples"].T)
        assert np.all(
            np.abs(cov_mc - cov) < 0.25 * np.outer(
                np.sqrt(np.diag(cov)), np.sqrt(np.diag(cov))
            ) + 1e-12
        )
        # the data constrains one direction far below the prior: the
        # constrained direction's posterior std << prior std
        v = A[0] / np.linalg.norm(A[0])
        assert v @ cov_mc @ v < (0.04) ** 2 / 4

    def test_box_truncation(self, linear_vd):
        # observation pushed outside the box: every sample stays in it
        pts = np.array([0.5, 1.0])
        A = np.stack([pts, pts**2], axis=1)
        y = A @ np.array([1.3, 0.5])  # implied p > 1 (outside)
        sig = np.full(2, 0.05)
        out = linear_vd.sample_posterior(
            pts, y, sig, n_samples=800, n_chains=16, seed=7,
        )
        s = out["samples"]
        assert np.all(s >= 0.0) and np.all(s <= 1.0)
        # mass piles against the constrained face
        assert s[:, 0].mean() > 0.8


class TestTransientPath:
    def test_smoke_xt_points(self):
        Vx, Vt, Vp = _space(6, 1), _space(5, 1), _space(7, 1)
        x = Vx.dof_coords[:, 0]
        t = Vt.dof_coords[:, 0]
        p = Vp.dof_coords[:, 0]
        res = _result([
            np.stack([x, x * x]),
            np.stack([t, np.ones_like(t)]),
            np.stack([p, np.ones_like(p)]),
        ])
        vd = TransientVademecum([Vx, Vt, Vp], res, field_dims=2,
                                dtype=np.float64)
        # u(x, t, p) = x·t·p + x²: linear in p
        pts = np.array([[0.5, 0.4], [1.0, 0.8]])
        a = pts[:, 0] * pts[:, 1]
        y = a * 0.6 + pts[:, 0] ** 2
        out = vd.sample_posterior(pts, y, 0.01, n_samples=800,
                                  n_chains=16, seed=11)
        mu, cov = _gaussian_posterior(a[:, None], y - pts[:, 0] ** 2,
                                      np.full(2, 0.01))
        assert abs(out["samples"][:, 0].mean() - mu[0]) < 0.02
        assert np.all(out["r_hat"] < 1.1)


class TestDiagnostics:
    def test_iid_chains(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2000, 8, 3))
        r = split_rhat(x)
        np.testing.assert_allclose(r, 1.0, atol=0.01)
        ess = effective_sample_size(x)
        assert np.all(ess > 0.5 * 2000 * 8)

    def test_sticky_chains(self):
        rng = np.random.default_rng(1)
        # random walks: huge autocorrelation, chains diverge
        x = np.cumsum(rng.standard_normal((2000, 8, 2)), axis=0)
        assert np.all(split_rhat(x) > 1.1)
        assert np.all(effective_sample_size(x) < 0.05 * 2000 * 8)

    def test_deterministic_dim(self):
        x = np.zeros((100, 4, 1))
        assert split_rhat(x)[0] == 1.0
        assert effective_sample_size(x)[0] == 400

    def test_shape_guard(self):
        with pytest.raises(ValueError, match="chains must be"):
            split_rhat(np.zeros((2, 3)))
        with pytest.raises(ValueError, match="chains must be"):
            effective_sample_size(np.zeros((3, 2, 1)))


class TestErrorPaths:
    def test_bad_sigma(self, linear_vd):
        with pytest.raises(ValueError, match="sigma must be positive"):
            linear_vd.sample_posterior(np.array([0.5]), [0.1], 0.0,
                                       n_samples=8, n_chains=2)

    def test_min_chains(self, linear_vd):
        with pytest.raises(ValueError, match="n_chains"):
            linear_vd.sample_posterior(np.array([0.5]), [0.1], 0.1,
                                       n_samples=8, n_chains=1)
