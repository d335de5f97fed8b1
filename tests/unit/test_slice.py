"""Partial evaluation (Vademecum.fix_parameters): folding fixed
parameter dims into mode weights must be EXACTLY equivalent to
evaluating the full vademecum with those parameters pinned — fixing is
factor evaluation, not approximation.  The reference has no
partial-evaluation concept (evaluate() always takes the full tuple,
reference model.py:724-860)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pgdrome_tpu.fem.mesh import IntervalMesh
from pgdrome_tpu.fem.space import FunctionSpace
from pgdrome_tpu.separated import PGDResult
from pgdrome_tpu.serving import TransientVademecum, Vademecum


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
def vd4():
    """Random rank-5 vademecum with 3 parameter dims."""
    rng = np.random.default_rng(9)
    Vx = _space(7, 2)
    Vps = [_space(4, 1), _space(5, 2), _space(6, 1)]
    modes = [rng.standard_normal((5, V.dof_coords.shape[0]))
             for V in [Vx] + Vps]
    return Vademecum([Vx] + Vps, _result(modes), dtype=np.float64)


class TestFixParameters:
    def test_fields_parity(self, vd4):
        rng = np.random.default_rng(1)
        free = rng.uniform(0, 1, (40, 2))
        v1 = 0.37
        sub = vd4.fix_parameters({1: v1})
        assert sub.num_dims == 3
        full = np.column_stack([free[:, 0],
                                np.full(40, v1), free[:, 1]])
        u_sub = np.asarray(sub.fields(jnp.asarray(free)))
        u_full = np.asarray(vd4.fields(jnp.asarray(full)))
        np.testing.assert_allclose(u_sub, u_full, rtol=1e-12, atol=1e-14)

    def test_sensors_parity_and_composition(self, vd4):
        rng = np.random.default_rng(2)
        pts = np.array([0.2, 0.8])
        v0, v2 = 0.61, 0.25
        # fixing two dims at once == one at a time (note index shift:
        # after dropping dim 0, original dim 2 is the new dim 1)
        both = vd4.fix_parameters({0: v0, 2: v2})
        chained = vd4.fix_parameters({0: v0}).fix_parameters({1: v2})
        free = rng.uniform(0, 1, (25, 1))
        full = np.column_stack([np.full(25, v0), free[:, 0],
                                np.full(25, v2)])
        s_both = np.asarray(both.sensors(pts)(jnp.asarray(free)))
        s_chain = np.asarray(chained.sensors(pts)(jnp.asarray(free)))
        s_full = np.asarray(vd4.sensors(pts)(jnp.asarray(full)))
        np.testing.assert_allclose(s_both, s_full, rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(s_chain, s_full, rtol=1e-12,
                                   atol=1e-14)

    def test_analytics_compose(self, vd4):
        # the sliced vademecum is a first-class citizen: sobol and
        # moments run on it (conditional-on-p1 indices)
        sub = vd4.fix_parameters({1: 0.5})
        out = sub.sobol(points=np.array([0.5]))
        assert out["first"].shape == (2, 1)
        mean, cov = sub.output_covariance(np.array([0.3, 0.7]))
        assert cov.shape == (2, 2)

    def test_box_parity_at_bounds(self, vd4):
        # fixing at the exact box bound is allowed and exact
        sub = vd4.fix_parameters({2: 1.0})
        free = np.array([[0.5, 0.5]])
        full = np.array([[0.5, 0.5, 1.0]])
        np.testing.assert_allclose(
            np.asarray(sub.fields(jnp.asarray(free))),
            np.asarray(vd4.fields(jnp.asarray(full))),
            rtol=1e-12, atol=1e-14,
        )

    def test_errors(self, vd4):
        with pytest.raises(ValueError, match="at least one parameter"):
            vd4.fix_parameters({})
        with pytest.raises(ValueError, match="stay free"):
            vd4.fix_parameters({0: 0.5, 1: 0.5, 2: 0.5})
        with pytest.raises(ValueError, match="indices must be"):
            vd4.fix_parameters({7: 0.5})
        with pytest.raises(ValueError, match="outside its"):
            vd4.fix_parameters({0: 1.5})


class TestTransientFixParameters:
    def test_xt_parity(self):
        rng = np.random.default_rng(5)
        Vx, Vt = _space(6, 1), _space(5, 1)
        Vp, Vq = _space(4, 1), _space(7, 2)
        modes = [rng.standard_normal((4, V.dof_coords.shape[0]))
                 for V in [Vx, Vt, Vp, Vq]]
        vd = TransientVademecum([Vx, Vt, Vp, Vq], _result(modes),
                                field_dims=2, dtype=np.float64)
        vq = 0.44
        sub = vd.fix_parameters({1: vq})
        assert isinstance(sub, TransientVademecum)
        assert sub.field_shape == vd.field_shape
        pts = np.array([[0.5, 0.2], [0.9, 0.8]])
        free = rng.uniform(0, 1, (20, 1))
        full = np.column_stack([free[:, 0], np.full(20, vq)])
        np.testing.assert_allclose(
            np.asarray(sub.sensors(pts)(jnp.asarray(free))),
            np.asarray(vd.sensors(pts)(jnp.asarray(full))),
            rtol=1e-12, atol=1e-14,
        )
        # full space-time field parity too
        np.testing.assert_allclose(
            np.asarray(sub.fields(jnp.asarray(free))),
            np.asarray(vd.fields(jnp.asarray(full))),
            rtol=1e-12, atol=1e-14,
        )
