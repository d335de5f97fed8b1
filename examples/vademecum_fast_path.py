"""Parametric-elliptic vademecum on the TPU fast path.

Builds κ(x; p1..p3)-parameterized Poisson, trains a 50-mode separated
surrogate in one compiled XLA program, then sweeps 100k parameter samples.

Run: python examples/vademecum_fast_path.py  (CPU fallback works; pass
smaller sizes for a quick look)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import jax

if not os.environ.get("PGDROME_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")  # TPU opt-in via env

import numpy as np

import pgdrome_tpu.config as cfg
from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0, galerkin_update
from pgdrome_tpu.parallel.vademecum import make_sweep_fn

cfg.use_full_f32_matmul()

# host-f64 assembly; energy-basis f32 for the device
sep, spaces = parametric_elliptic(n_x=512, n_p=64, num_params=3)
sep_pc, tf = precondition_dim0(sep, dtype=np.float64)

solver = SeparatedPGD(
    sep_pc, n_max=50, tol=1e-7, tol_fp=1e-7, solver="cg", cg_iters=25,
    residual_check=False, scan_params=True, dtype=np.float32,
)
t0 = time.perf_counter()
result = solver.solve_fused()
print(f"solve: {result.n_modes} modes in {time.perf_counter()-t0:.2f}s "
      f"(incl. compile); final rel amplitude {result.amplitudes[-1]:.2e}")

result = galerkin_update(sep_pc, result)  # span-optimal coefficients (f64)

# inference sweep
import jax.numpy as jnp

full0 = jnp.asarray(tf.modes_to_full(result.modes[0]).astype(np.float32))
modes = [full0] + [jnp.asarray(m) for m in result.modes[1:]]
sweep = make_sweep_fn(spaces, modes, result.n_modes, method="auto")
samples = jnp.asarray(
    np.random.default_rng(0).uniform(0.05, 0.95, (100_000, 3)).astype(np.float32)
)
fields = sweep(samples)
t0 = time.perf_counter()
fields = sweep(samples)
fields.block_until_ready()
dt = time.perf_counter() - t0
print(f"sweep: {samples.shape[0]:,} full fields in {dt*1e3:.1f} ms "
      f"({samples.shape[0]/dt:,.0f} fields/s)")
