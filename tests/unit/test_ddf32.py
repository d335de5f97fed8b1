"""Double-float32 compensated arithmetic (ops/ddf32.py) — the TPU-native
equivalent of the rhs_f64 mixed-precision stage solves.

Error-free-transform properties are checked against exact f64 arithmetic
(the conftest enables x64 on the CPU backend); the end-to-end cancellation
recovery mirrors TestRhsF64 with rhs_comp=True."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgdrome_tpu.ops import ddf32


def _rng(seed=0):
    return np.random.default_rng(seed)


class TestErrorFreeTransforms:
    def test_two_sum_exact(self):
        r = _rng(1)
        a = (r.standard_normal(4096) * 10.0 ** r.integers(-8, 8, 4096)).astype(
            np.float32
        )
        b = (r.standard_normal(4096) * 10.0 ** r.integers(-8, 8, 4096)).astype(
            np.float32
        )
        s, e = jax.jit(ddf32.two_sum)(a, b)
        # s + e == a + b exactly (both f32-representable, so f64 captures it)
        exact = a.astype(np.float64) + b.astype(np.float64)
        np.testing.assert_array_equal(
            np.asarray(s, dtype=np.float64) + np.asarray(e, dtype=np.float64),
            exact,
        )

    def test_two_prod_exact(self):
        r = _rng(2)
        a = (r.standard_normal(4096) * 10.0 ** r.integers(-6, 6, 4096)).astype(
            np.float32
        )
        b = (r.standard_normal(4096) * 10.0 ** r.integers(-6, 6, 4096)).astype(
            np.float32
        )
        p, e = jax.jit(ddf32.two_prod)(a, b)
        # product of two 24-bit mantissas is exact in f64
        exact = a.astype(np.float64) * b.astype(np.float64)
        np.testing.assert_array_equal(
            np.asarray(p, dtype=np.float64) + np.asarray(e, dtype=np.float64),
            exact,
        )

    def test_dd_sum_cancelling_series(self):
        # Σ of pairs (+C·x, -C·x) plus an O(1) tail: plain f32 loses the
        # tail in the C·eps noise, dd recovers it to ~2^-45 relative
        r = _rng(3)
        C = np.float32(1e6)
        x = r.standard_normal(512).astype(np.float32)
        tail = r.standard_normal(512).astype(np.float32)
        seq = np.concatenate([C * x, -(C * x), tail])
        exact = seq.astype(np.float64).sum()
        h, l = jax.jit(lambda v: ddf32.dd_sum(v, jnp.zeros_like(v)))(seq)
        dd_val = float(np.asarray(h, dtype=np.float64) + np.asarray(l, np.float64))
        plain = float(np.asarray(jnp.sum(seq)))
        # dd bound: ~eps32² · C · √n absolute (2^-48 relative of the
        # OPERANDS — see dd_add docstring), i.e. ~1e-9 here; plain f32
        # carries eps32·C ≈ 0.06
        assert abs(dd_val - exact) / abs(exact) < 1e-8
        assert abs(plain - exact) > 100 * abs(dd_val - exact)

    def test_dd_sum_odd_length_and_axis(self):
        r = _rng(4)
        x = r.standard_normal((7, 5)).astype(np.float32)
        h, l = ddf32.dd_sum(jnp.asarray(x), jnp.zeros_like(x), axis=1)
        np.testing.assert_allclose(
            np.asarray(h) + np.asarray(l), x.astype(np.float64).sum(axis=1),
            rtol=1e-7,
        )
        assert h.shape == (7,)

    def test_dd_from_f64_roundtrip(self):
        r = _rng(5)
        x = r.standard_normal(1000) * 10.0 ** r.integers(-10, 10, 1000)
        dd = ddf32.dd_from_f64(x)
        assert dd.shape == (1000, 2) and dd.dtype == np.float32
        back = dd[..., 0].astype(np.float64) + dd[..., 1].astype(np.float64)
        np.testing.assert_allclose(back, x, rtol=3e-15)

    def test_dd_dot_vs_f64(self):
        # rows of wildly mixed scale: dd dot tracks the f64 dot to ~1e-13
        r = _rng(6)
        R = r.standard_normal((40, 300)) * 10.0 ** r.integers(-5, 5, (40, 1))
        F = r.standard_normal(300).astype(np.float32)
        wh, wl = jax.jit(ddf32.dd_dot)(
            jnp.asarray(ddf32.dd_from_f64(R)), jnp.asarray(F)
        )
        exact = R @ F.astype(np.float64)
        got = np.asarray(wh, np.float64) + np.asarray(wl, np.float64)
        np.testing.assert_allclose(got, exact, rtol=1e-12)

    def test_dd_contract_cancellation(self):
        # the product-path analogue of the rhs cascade: coefficients ±C
        # multiply identical rows that cancel to an O(1) load
        r = _rng(7)
        g = r.standard_normal(128)
        C = 1e5
        stack = np.stack([(1.0 + C) * g, -C * g, 0.5 * g])
        coef = np.ones(3)
        exact = coef @ stack  # == 1.5 g exactly
        ch = jnp.asarray(coef, dtype=jnp.float32)
        b = jax.jit(ddf32.dd_contract)(
            ch, jnp.zeros_like(ch), jnp.asarray(ddf32.dd_from_f64(stack))
        )
        plain = np.asarray(
            jnp.einsum(
                "r,ri->i", ch, jnp.asarray(stack, dtype=jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        err_dd = np.abs(np.asarray(b, np.float64) - exact).max()
        err_plain = np.abs(plain.astype(np.float64) - exact).max()
        assert err_dd < 1e-6 * np.abs(exact).max()
        assert err_plain > 50 * max(err_dd, 1e-300)


class TestRhsCompSolve:
    """SeparatedPGD(rhs_comp=True): on-chip compensated rhs contraction."""

    def _cancelling_problem(self):
        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import SeparatedProblem, precondition_dim0

        sep, _ = parametric_elliptic(n_x=32, n_p=8, num_params=1)
        sep_pc, _tf = precondition_dim0(sep, dtype=np.float64)
        C = 3.0e5
        g0 = np.asarray(sep_pc.rhs[0], dtype=np.float64)
        g1 = np.asarray(sep_pc.rhs[1], dtype=np.float64)
        rhs0 = np.concatenate([(1.0 + C) * g0, -C * g0], axis=0)
        rhs1 = np.concatenate([g1, g1], axis=0)
        sep_c = SeparatedProblem(
            ops=list(sep_pc.ops), rhs=[rhs0, rhs1], mass=list(sep_pc.mass),
            bc_dofs=list(sep_pc.bc_dofs),
        )
        return sep_pc, sep_c

    def test_cancelling_rhs_recovers_accuracy(self):
        from pgdrome_tpu.separated import SeparatedPGD

        sep_pc, sep_c = self._cancelling_problem()
        kw = dict(n_max=4, tol=0.0, tol_fp=1e-7, max_fp_it=40,
                  residual_check=False)
        ref = SeparatedPGD(sep_pc, dtype=np.float64, **kw).solve_fused()
        comp = SeparatedPGD(sep_c, dtype=np.float32, rhs_comp=True,
                            **kw).solve_fused()
        plain = SeparatedPGD(sep_c, dtype=np.float32, **kw).solve_fused()

        def tensor(res):
            K = res.n_modes
            return np.einsum(
                "ki,kj->ij",
                np.asarray(res.modes[0], dtype=np.float64)[:K],
                np.asarray(res.modes[1], dtype=np.float64)[:K],
            )

        t_ref = tensor(ref)
        scale = np.abs(t_ref).max()
        err_comp = np.abs(tensor(comp) - t_ref).max() / scale
        err_plain = np.abs(tensor(plain) - t_ref).max() / scale
        assert err_comp < 2e-6, err_comp
        assert err_plain > 100 * err_comp, (err_plain, err_comp)

    def test_matches_plain_when_rhs_benign(self):
        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import SeparatedPGD

        sep, _ = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        kw = dict(n_max=3, tol=0.0, tol_fp=1e-6, max_fp_it=30,
                  residual_check=False, dtype=np.float32)
        a = SeparatedPGD(sep, rhs_comp=True, **kw).solve_fused()
        b = SeparatedPGD(sep, **kw).solve_fused()
        np.testing.assert_allclose(
            np.asarray(a.amplitudes), np.asarray(b.amplitudes), rtol=2e-4
        )

    def test_residual_check_path(self):
        # residual_norm also runs the dd contraction — cover it
        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import SeparatedPGD

        sep, _ = parametric_elliptic(n_x=16, n_p=6, num_params=2)
        res = SeparatedPGD(sep, rhs_comp=True, dtype=np.float32, n_max=2,
                           tol=0.0, tol_fp=1e-5, max_fp_it=10).solve()
        assert res.n_modes >= 1

    def test_invalid_combinations(self):
        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import SeparatedPGD

        sep, _ = parametric_elliptic(n_x=16, n_p=6, num_params=2)
        with pytest.raises(ValueError, match="rhs_comp"):
            SeparatedPGD(sep, rhs_comp=True, scan_params=True)
        with pytest.raises(ValueError, match="exclusive"):
            SeparatedPGD(sep, rhs_comp=True, rhs_f64=True)
