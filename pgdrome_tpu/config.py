"""Global configuration: dtypes and precision control.

The reference CI asserts accuracy down to 1e-8 (e.g. linear/nonlinear
amplitude agreement, test_solver_problem.py:752), which requires float64.
On TPU the performance path runs float32 (MXU-native); tests enable x64 on
the CPU backend via :func:`use_x64`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Default dtype used when building meshes/operators.  Follows jax's x64 flag.


def default_dtype():
    """Floating dtype consistent with the current jax x64 setting."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def use_x64(enable: bool = True) -> None:
    """Enable (or disable) double precision globally.

    Must be called before arrays are created.  The reference accuracy
    thresholds (BASELINE.md) need float64; the TPU benchmark path does not.
    """
    jax.config.update("jax_enable_x64", enable)


def use_full_f32_matmul() -> None:
    """Force true-f32 matmul precision globally.

    TPU matmuls default to bf16 inputs (~4e-3 relative error); the PGD
    Gram contractions and the LU solves inside jnp.linalg.solve need full
    f32.  The separated-solver einsums pin HIGHEST precision themselves;
    this flag additionally covers linalg internals."""
    jax.config.update("jax_default_matmul_precision", "highest")


def is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no devices at all
        return False
