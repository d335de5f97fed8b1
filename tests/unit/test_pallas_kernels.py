"""Pallas kernels vs einsum references (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp



class TestFusedSweep:
    def test_matches_xla_sweep(self):
        import jax.numpy as jnp

        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import SeparatedPGD
        from pgdrome_tpu.parallel.vademecum import make_sweep_fn
        from pgdrome_tpu.ops.pallas_kernels import make_fused_sweep

        sep, Vs = parametric_elliptic(n_x=40, n_p=16, num_params=2)
        res = SeparatedPGD(
            sep, n_max=10, tol=1e-12, tol_fp=1e-8, dtype=np.float32
        ).solve()
        modes = [jnp.asarray(m) for m in res.modes]
        samples = np.random.default_rng(0).uniform(
            0.05, 0.95, size=(73, 2)
        ).astype(np.float32)
        ref = np.asarray(make_sweep_fn(Vs, modes, res.n_modes)(jnp.asarray(samples)))
        fused = make_fused_sweep(Vs, modes, res.n_modes, block_b=64, block_n=128)
        out = np.asarray(fused(samples))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=5e-7 * np.abs(ref).max())

    def test_bf16_output(self):
        # out_dtype narrows only the store: bf16 output within its
        # quantization of the f32 kernel, same shape
        import jax.numpy as jnp

        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import SeparatedPGD
        from pgdrome_tpu.ops.pallas_kernels import make_fused_sweep

        sep, Vs = parametric_elliptic(n_x=40, n_p=16, num_params=2)
        res = SeparatedPGD(
            sep, n_max=6, tol=1e-12, tol_fp=1e-8, dtype=np.float32
        ).solve()
        modes = [jnp.asarray(m) for m in res.modes]
        samples = np.random.default_rng(1).uniform(
            0.05, 0.95, size=(50, 2)
        ).astype(np.float32)
        f32 = np.asarray(
            make_fused_sweep(Vs, modes, res.n_modes, block_b=64,
                             block_n=128)(samples), dtype=np.float64
        )
        out = make_fused_sweep(Vs, modes, res.n_modes, block_b=64,
                               block_n=128, out_dtype=jnp.bfloat16)(samples)
        assert out.dtype == jnp.bfloat16 and out.shape == f32.shape
        err = np.abs(np.asarray(out, dtype=np.float64) - f32).max()
        assert err < 1.6e-2 * np.abs(f32).max()

    def test_p2_param_dims(self):
        # degree-2 parameter spaces exercise the 3-point two-hot branch
        import jax.numpy as jnp

        from pgdrome_tpu import IntervalMesh, FunctionSpace
        from pgdrome_tpu.parallel.vademecum import make_sweep_fn
        from pgdrome_tpu.ops.pallas_kernels import make_fused_sweep

        Vx = FunctionSpace(IntervalMesh(16, 0.0, 1.0), "P", 1)
        Vp = FunctionSpace(IntervalMesh(8, 0.0, 2.0), "P", 2)
        rng = np.random.default_rng(1)
        modes = [
            jnp.asarray(rng.normal(size=(6, Vx.ndofs)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(6, Vp.ndofs)).astype(np.float32)),
        ]
        samples = rng.uniform(0.01, 1.99, size=(37, 1)).astype(np.float32)
        ref = np.asarray(
            make_sweep_fn([Vx, Vp], modes, 5)(jnp.asarray(samples))
        )
        out = np.asarray(
            make_fused_sweep([Vx, Vp], modes, 5, block_b=64, block_n=128)(samples)
        )
        np.testing.assert_allclose(out, ref, atol=1e-5 * np.abs(ref).max())

    def test_nonuniform_grid_rejected(self):
        import jax.numpy as jnp

        from pgdrome_tpu import IntervalMesh, FunctionSpace
        from pgdrome_tpu.ops.pallas_kernels import make_fused_sweep

        mesh = IntervalMesh.from_points(np.array([0.0, 0.1, 0.5, 1.0]))
        Vp = FunctionSpace(mesh, "P", 1)
        Vx = FunctionSpace(IntervalMesh(4, 0.0, 1.0), "P", 1)
        modes = [
            jnp.zeros((3, Vx.ndofs), jnp.float32),
            jnp.zeros((3, Vp.ndofs), jnp.float32),
        ]
        with pytest.raises(ValueError):
            make_fused_sweep([Vx, Vp], modes, 2)
