"""Serving analytics: sensitivity Jacobians, streaming UQ moments, and
derivative-vademecum serving (serving.py round-3 additions).

The reference has no batched analogue of any of these — its sensitivity
story is finite differences over per-sample evaluate calls and its
derivative fields are recomputed per sample (model.py:724-860,
1088-1206); the parity target here is the MATH, checked against direct
dense computation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD, evaluate_modes_1d
from pgdrome_tpu.serving import Vademecum


@pytest.fixture(scope="module")
def trained():
    sep, Vs = parametric_elliptic(n_x=40, n_p=16, num_params=2)
    res = SeparatedPGD(sep, n_max=8, tol=1e-12, tol_fp=1e-8).solve()
    return sep, Vs, res


def _cell_interior_samples(n, num_params, n_p=16, seed=0):
    """Random samples placed strictly inside parameter-grid cells so
    one-sided derivatives at grid nodes never enter the comparisons."""
    rng = np.random.default_rng(seed)
    cells = rng.integers(1, n_p - 1, size=(n, num_params))
    frac = rng.uniform(0.25, 0.75, size=(n, num_params))
    return (cells + frac) / n_p


class TestEvaluateModesDerivative:
    def test_matches_central_difference(self, trained):
        _, Vs, res = trained
        pts = _cell_interior_samples(11, 1, seed=3)[:, 0]
        h = 1e-7
        d = np.asarray(
            evaluate_modes_1d(Vs[1], res.modes[1], pts, derivative=True)
        )
        fp = np.asarray(evaluate_modes_1d(Vs[1], res.modes[1], pts + h))
        fm = np.asarray(evaluate_modes_1d(Vs[1], res.modes[1], pts - h))
        fd = (fp - fm) / (2 * h)
        np.testing.assert_allclose(d, fd, rtol=1e-5, atol=1e-5)

    def test_host_numpy_path(self, trained):
        _, Vs, res = trained
        pts = _cell_interior_samples(7, 1, seed=4)[:, 0]
        dev = np.asarray(
            evaluate_modes_1d(Vs[1], res.modes[1], pts, derivative=True)
        )
        host = evaluate_modes_1d(
            Vs[1], np.asarray(res.modes[1]), pts, xp=np, derivative=True
        )
        np.testing.assert_allclose(dev, host, rtol=1e-12)


class TestSensorsJacobian:
    def test_vs_finite_difference(self, trained):
        _, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        pts = np.array([0.23, 0.61, 0.88])
        samples = _cell_interior_samples(9, 2, seed=1)
        J = np.asarray(vd.sensors_jacobian(pts)(jnp.asarray(samples)))
        assert J.shape == (9, 3, 2)
        sensor = vd.sensors(pts)
        h = 1e-7
        for j in range(2):
            dp = np.zeros((1, 2))
            dp[0, j] = h
            fd = (
                np.asarray(sensor(jnp.asarray(samples + dp)))
                - np.asarray(sensor(jnp.asarray(samples - dp)))
            ) / (2 * h)
            np.testing.assert_allclose(J[:, :, j], fd, rtol=1e-5, atol=1e-6)

    def test_vs_jacfwd(self, trained):
        # the analytic column assembly == forward-mode AD through the
        # sensor sweep (cell-interior points: derivative defined)
        _, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        pts = np.array([0.4, 0.75])
        samples = _cell_interior_samples(5, 2, seed=2)
        J = np.asarray(vd.sensors_jacobian(pts)(jnp.asarray(samples)))
        sensor = vd.sensors(pts)
        Jad = jax.vmap(jax.jacfwd(lambda p: sensor(p[None])[0]))(
            jnp.asarray(samples)
        )
        np.testing.assert_allclose(J, np.asarray(Jad), rtol=1e-9, atol=1e-12)

    def test_cached_like_sensors(self, trained):
        _, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        pts = np.array([0.3, 0.5])
        f1 = vd.sensors_jacobian(pts)
        f2 = vd.sensors_jacobian(pts)
        assert f1 is f2
        # distinct from the plain sensor entry for the same points
        assert vd.sensors(pts) is not f1


class TestMoments:
    def test_matches_direct(self, trained):
        _, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        samples = np.random.default_rng(5).uniform(0.1, 0.9, size=(57, 2))
        mean, var = vd.moments(samples, chunk=16, depth=2)
        u = np.asarray(vd.fields(jnp.asarray(samples)), np.float64)
        np.testing.assert_allclose(mean, u.mean(axis=0), rtol=1e-10)
        np.testing.assert_allclose(
            var, u.var(axis=0), rtol=1e-8, atol=1e-14 * (u.max() ** 2)
        )

    def test_chunk_exceeds_batch(self, trained):
        _, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        samples = np.random.default_rng(6).uniform(0.1, 0.9, size=(12, 2))
        mean, var = vd.moments(samples)  # default chunk >> B
        u = np.asarray(vd.fields(jnp.asarray(samples)), np.float64)
        np.testing.assert_allclose(mean, u.mean(axis=0), rtol=1e-10)
        np.testing.assert_allclose(var, u.var(axis=0), rtol=1e-8, atol=1e-18)

    def test_factor_moments_shapes_and_psd(self, trained):
        _, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        samples = np.random.default_rng(7).uniform(0.1, 0.9, size=(33, 2))
        fbar, C = vd.factor_moments(samples, chunk=8)
        n_max = np.asarray(res.modes[1]).shape[0]
        assert fbar.shape == (n_max,) and C.shape == (n_max, n_max)
        np.testing.assert_allclose(C, C.T, rtol=1e-12)
        cov = C - np.outer(fbar, fbar)
        w = np.linalg.eigvalsh(cov)
        assert w.min() > -1e-10 * max(w.max(), 1.0)

    def test_empty_batch_raises(self, trained):
        _, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        with pytest.raises(ValueError):
            vd.moments(np.zeros((0, 2)))


class TestDerivativeVademecum:
    def test_fields_match_per_sample_derivative(self, trained):
        # d/dx commutes with the rank-1 sum: the derivative vademecum's
        # fields == derivative_function of each reconstructed field
        from pgdrome_tpu.fem.derivative import derivative_function
        from pgdrome_tpu.fem.function import Function

        _, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        dvd = vd.derivative()
        samples = np.random.default_rng(8).uniform(0.1, 0.9, size=(6, 2))
        du = np.asarray(dvd.fields(jnp.asarray(samples)))
        u = np.asarray(vd.fields(jnp.asarray(samples)))
        for b in range(len(samples)):
            ref = derivative_function(Function(Vs[0], u[b])).array
            np.testing.assert_allclose(du[b], ref, rtol=1e-10, atol=1e-12)

    def test_sensors_on_derivative(self, trained):
        from pgdrome_tpu.fem.interpolate import eval_dofs_at_points

        _, Vs, res = trained
        vd = Vademecum(Vs, res, dtype=np.float64)
        dvd = vd.derivative()
        pts = np.array([0.2, 0.55, 0.9])
        samples = np.random.default_rng(9).uniform(0.1, 0.9, size=(4, 2))
        resp = np.asarray(dvd.sensors(pts)(jnp.asarray(samples)))
        du = np.asarray(dvd.fields(jnp.asarray(samples)))
        for b in range(len(samples)):
            ref = np.asarray(
                eval_dofs_at_points(dvd.spaces[0], du[b], pts)
            )
            np.testing.assert_allclose(resp[b], ref, rtol=1e-10, atol=1e-12)

    def test_streaming_moments_of_derivative(self, trained):
        # composition: UQ moments of the spatial-derivative field
        _, Vs, res = trained
        dvd = Vademecum(Vs, res, dtype=np.float64).derivative()
        samples = np.random.default_rng(10).uniform(0.1, 0.9, size=(25, 2))
        mean, var = dvd.moments(samples, chunk=8)
        du = np.asarray(dvd.fields(jnp.asarray(samples)), np.float64)
        np.testing.assert_allclose(mean, du.mean(axis=0), rtol=1e-10)
        np.testing.assert_allclose(var, du.var(axis=0), rtol=1e-8, atol=1e-18)


class TestFusedFactorPath:
    def test_fused_identity_factors_match_xla(self, trained):
        # the moments accumulator's TPU path: fused kernel with an
        # identity dim-0 table returns the masked mode-product factors
        # (interpret mode here; bit-parity asserted on-chip by bench.py)
        import jax.numpy as jnp

        from pgdrome_tpu.ops.pallas_kernels import make_fused_sweep

        _, Vs, res = trained
        n_max = np.asarray(res.modes[1]).shape[0]
        modes32 = [
            jnp.asarray(np.asarray(m, np.float32)) for m in res.modes
        ]
        fused = make_fused_sweep(
            Vs, [jnp.asarray(np.eye(n_max, dtype=np.float32))]
            + modes32[1:], res.n_modes,
        )
        samples = np.random.default_rng(11).uniform(
            0.1, 0.9, size=(17, 2)
        ).astype(np.float32)
        fac = np.asarray(fused(jnp.asarray(samples)))
        ref = np.ones((17, n_max), np.float64)
        for j in (1, 2):
            ref *= np.asarray(
                evaluate_modes_1d(
                    Vs[j], np.asarray(modes32[j], np.float64),
                    samples[:, j - 1].astype(np.float64), xp=np,
                )
            )
        ref[:, res.n_modes:] = 0.0
        np.testing.assert_allclose(fac, ref, rtol=2e-6, atol=2e-6)
