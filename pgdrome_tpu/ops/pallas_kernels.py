"""Pallas TPU kernels for the PGD hot ops.

The production kernel is :func:`make_fused_sweep` — the serving-path
vademecum sweep (cell locate + two-hot basis + mode products + rank-1
reconstruction fused in VMEM; bit-identical to the XLA path and ~2.7× its
rate at bench scale, PERF.md "Sweep roofline").  It also serves the sensor
sweep with the point table standing in for the dim-0 modes.

Earlier exploratory kernels (``gram_stack``, ``rank1_reconstruct``) were
REMOVED in round 3: the XLA einsum formulations they duplicated already
run within ~1.3× of the HBM bandwidth bound inside the fused enrichment
program (PERF.md "Solve roofline"), so a custom kernel has no headroom
there, and the fused sweep superseded the bare rank-1 matmul.  Runs in
interpreter mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import numpy as np

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


# ------------------------------------------------------- fused sweep kernel

def make_fused_sweep(spaces, modes, n_modes, block_b: int = 512,
                     block_n: int = 2048, interpret: bool | None = None,
                     out_dtype=None):
    """Fully fused vademecum sweep: samples (B, d−1) → fields (B, n0) in
    ONE kernel — cell locate (arithmetic, uniform grids), two-hot basis
    weights, per-dim mode evaluation, mode product, and the rank-1
    reconstruction matmul, with every intermediate in VMEM.

    Why: the XLA sweep (parallel/vademecum.make_sweep_fn) materializes the
    (B, ndof_p) two-hot weight matrices and (B, K) factors in HBM per
    parameter dim — measured ~30× off the HBM roofline at bench scale,
    with per-dim mode evaluation ≈ all of the cost (PERF.md).  Here the
    per-block weights (Bb, ndof_p) and factors (Bb, K) never leave VMEM;
    HBM traffic is essentially the (B, n0) output write.

    Requirements (falls back is the caller's job): 1D parameter spaces on
    UNIFORM grids, degree 1 or 2 (dofs of cell c start at deg·c and the
    basis is arithmetic).  The mode-count mask is folded into the dim-0
    table (rows ≥ n_modes zeroed), so padded-buffer garbage contributes
    exactly 0.
    """
    nd = len(spaces)
    NP = nd - 1
    modes = [jnp.asarray(m, dtype=jnp.float32) for m in modes]
    K = modes[0].shape[0]
    n0 = modes[0].shape[1]
    interpret = (not _on_tpu()) if interpret is None else interpret
    # out_dtype: optional narrower OUTPUT quantization (compute stays
    # true-f32 in VMEM; only the HBM store narrows).  bfloat16 halves the
    # output traffic/footprint — at bench scale that lets 1M-sample
    # chunks keep two in flight under 16 GB HBM, which is what pushes the
    # streamed field rate to the compute-marginal ~17.5 M/s (PERF.md).
    out_dtype = jnp.float32 if out_dtype is None else jnp.dtype(out_dtype)

    def _round_up(x, m):
        return -(-x // m) * m

    degs, x0s, inv_hs, ncells = [], [], [], []
    for j in range(1, nd):
        V = spaces[j]
        verts = V.mesh().coordinates()[:, 0]
        dv = verts[1:] - verts[:-1]
        if not (abs(dv - dv[0]) <= 1e-12 * abs(dv[0])).all():
            raise ValueError("fused sweep needs uniform parameter grids")
        if V.degree not in (1, 2):
            raise ValueError("fused sweep supports P1/P2 parameter dims")
        degs.append(int(V.degree))
        x0s.append(float(verts[0]))
        inv_hs.append(float(1.0 / dv[0]))
        ncells.append(float(len(verts) - 1))

    K128 = _round_up(K, 128)
    # block shapes must be (×8, ×128); the ARRAYS may stay ragged — Mosaic
    # masks the partial edge tiles, so no padded copies of the (B, n0)
    # output are ever materialized
    n_tiles = -(-n0 // block_n)
    bn = min(_round_up(-(-n0 // n_tiles), 128), _round_up(n0, 128))
    ndof_max = max(m.shape[1] for m in modes[1:])
    ndofp = _round_up(ndof_max, 128)

    # dim-0 table with the mode mask folded in (rows >= n_modes are zero)
    mask = (jnp.arange(K128) < n_modes).astype(jnp.float32)
    m0 = jnp.zeros((K128, n0), jnp.float32).at[:K, :].set(modes[0])
    m0 = m0 * mask[:, None]
    # stacked parameter tables (NP, ndofp, K128)
    tabs = jnp.zeros((NP, ndofp, K128), jnp.float32)
    for j in range(NP):
        tabs = tabs.at[j, : modes[1 + j].shape[1], :K].set(modes[1 + j].T)
    # grid params in SMEM: rows x0, inv_h, ncell
    gp = jnp.asarray(np.stack([x0s, inv_hs, ncells]), dtype=jnp.float32)

    bb = block_b

    def kernel(gp_ref, s_ref, tab_ref, m0_ref, out_ref):
        fac = None
        for jd in range(NP):  # static unroll over parameter dims
            x = s_ref[jd, :]  # (bb,)
            t = (x - gp_ref[0, jd]) * gp_ref[1, jd]
            c = jnp.clip(jnp.floor(t), 0.0, gp_ref[2, jd] - 1.0)
            xi = t - c
            base = (degs[jd] * c).astype(jnp.int32)
            iota = jax.lax.broadcasted_iota(jnp.int32, (bb, ndofp), 1)
            if degs[jd] == 1:
                basis = (1.0 - xi, xi)
            else:
                basis = (
                    (1.0 - xi) * (1.0 - 2.0 * xi),
                    4.0 * xi * (1.0 - xi),
                    xi * (2.0 * xi - 1.0),
                )
            W = jnp.zeros((bb, ndofp), jnp.float32)
            for l, bl in enumerate(basis):
                W = W + bl[:, None] * (iota == base[:, None] + l).astype(
                    jnp.float32
                )
            # precision=HIGHEST: Mosaic's default f32 dot runs the MXU in
            # bf16 (measured 2.3e-3 relative on-chip); HIGHEST is true f32
            vals = jax.lax.dot_general(
                W, tab_ref[jd],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (bb, K128)
            fac = vals if fac is None else fac * vals
        out_ref[:, :] = jax.lax.dot_general(
            fac, m0_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(out_dtype)

    # the tables enter as jit INPUTS (not closure constants): the compiled
    # executable is value-independent — one persisted program serves every
    # same-shaped vademecum (retrains, mode-count changes via the folded
    # mask, re-weighted models) exactly like the solver's data-as-inputs
    # design (separated._ProblemArrays)
    def sweep_impl(samples, gp_in, tabs_in, m0_in):
        samples = jnp.asarray(samples, dtype=jnp.float32)
        B = samples.shape[0]
        sT = samples.T
        grid = (pl.cdiv(B, bb), pl.cdiv(n0, bn))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                (pl.BlockSpec((3, NP), lambda i, j: (0, 0),
                              memory_space=pltpu.SMEM)
                 if _HAS_PLTPU and not interpret
                 else pl.BlockSpec((3, NP), lambda i, j: (0, 0))),
                pl.BlockSpec((NP, bb), lambda i, j: (0, i)),
                pl.BlockSpec((NP, ndofp, K128), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((K128, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bb, bn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((B, n0), out_dtype),
            interpret=interpret,
        )(gp_in, sT, tabs_in, m0_in)

    jitted = jax.jit(sweep_impl)

    def sweep(samples):
        return jitted(samples, gp, tabs, m0)

    # (jitted fn, table operands, program-identity key parts) — the aot
    # wiring in parallel/vademecum._try_fused uses these to persist the
    # value-independent executable
    sweep._aot_parts = (jitted, (gp, tabs, m0),
                        ("fused-vi", tuple(degs), str(out_dtype),
                         bool(interpret), bb, bn))
    return sweep
