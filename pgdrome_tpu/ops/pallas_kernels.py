"""Pallas TPU kernels for the PGD hot ops.

Two kernels cover the innermost loops of the fast path
(pgdrome_tpu/separated.py):

* :func:`gram_stack` — w_t = Fᵀ O_t F for a stack of T operators in ONE
  pass over the operator tensor (the XLA einsum reads A once per term;
  fusing the T terms halves HBM traffic for the dominant (T, n, n) read).
* :func:`rank1_reconstruct` — the vademecum sweep kernel: per-sample mode
  factors (B, K) × space modes (K, n) tiled over samples and dofs, MXU
  matmul per tile.

Both run in interpreter mode on CPU (tests) and compiled on TPU.  They are
drop-in replacements validated against the einsum formulations; the
separated solver uses the einsum path by default (XLA fusion is already
near-roofline for these sizes) — the kernels exist for the large-n regime
and as the tuning surface for later rounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# -------------------------------------------------------------- gram stack

def gram_stack(A, F, block_rows: int = 256, interpret: bool | None = None):
    """w_t = Fᵀ A_t F for stacked operators A (T, n, n), single pass.

    Tiled over row-blocks; each grid step loads a (T, bi, n) slab, computes
    the partial quadratic form and accumulates into the (T,) output."""
    A = jnp.asarray(A)
    F = jnp.asarray(F)
    T, n, _ = A.shape
    interpret = (not _on_tpu()) if interpret is None else interpret

    bi = min(block_rows, n)
    grid = (pl.cdiv(n, bi),)

    # pack F twice: row 0 = full F (contraction), row 1 = the block slice
    # (outer product side); simplest layout that keeps the kernel 2D
    def kernel(a_ref, ffull_ref, fblk_ref, out_ref):
        i = pl.program_id(0)
        Af = jax.lax.dot_general(
            a_ref[:, :, :],
            ffull_ref[0, :],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=out_ref.dtype,
        )  # (T, bi)
        acc = jnp.sum(Af * fblk_ref[0, :][None, :], axis=1)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += acc

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, bi, n), lambda i: (0, i, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, bi), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((T,), lambda i: (0,)),
        out_shape=jax.ShapeDtypeStruct((T,), A.dtype),
        interpret=interpret,
    )(A, F[None, :], F[None, :])


# ------------------------------------------------------- rank-1 reconstruct

def rank1_reconstruct(factors, modes0, block_b: int = 128, block_n: int = 256,
                      interpret: bool | None = None):
    """Vademecum sweep kernel: out[b, i] = Σ_k factors[b, k] · modes0[k, i].

    One MXU matmul per (sample-block × dof-block) tile; the K (mode) axis
    stays resident in VMEM."""
    factors = jnp.asarray(factors)
    modes0 = jnp.asarray(modes0)
    B, K = factors.shape
    _, n = modes0.shape
    interpret = (not _on_tpu()) if interpret is None else interpret

    bb = min(block_b, B)
    bn = min(block_n, n)
    grid = (pl.cdiv(B, bb), pl.cdiv(n, bn))

    def kernel(f_ref, m_ref, out_ref):
        out_ref[:, :] = jax.lax.dot_general(
            f_ref[:, :],
            m_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=out_ref.dtype,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bb, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((B, n), factors.dtype),
        interpret=interpret,
    )(factors, modes0)
