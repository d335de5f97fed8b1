"""Deep residual cascade with on-chip compensated precision (rhs_comp).

Pure-f32 residual cascades freeze at ~1.5e-6: each stage's rhs stack
ships rows of magnitude ~1/s that cancel to O(1) in the per-dim load
contraction, and f32 cannot resolve the cancellation (PERF.md round-3
finding #5).  TPUs have no hardware float64 — but their VPU's f32
add/mul are correctly rounded, so the framework ships the stack as
double-f32 pairs and contracts compensated (`ops/ddf32.py`, ~2^-48
relative).  `residual_cascade(..., rhs_comp_from=k)` turns that on from
stage k: plain f32 to its floor, dd stages after — the measured recipe
that lands the 5-parameter vademecum at 9.7e-7 entirely on-chip
(PERF.md round-3 finding #7; scripts/probe_5param.py --rhs-comp at
full scale).

This demo engineers the same cancellation at toy scale — a rhs stack
whose rows of magnitude C=3e5 cancel to the unit load — and shows the
dd cascade matching the f64 reference where plain f32 carries C·eps
noise.

Run: python examples/deep_cascade.py  (~1 min on CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # CPU demo; drop for TPU
jax.config.update("jax_enable_x64", True)

from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.recipes import residual_cascade
from pgdrome_tpu.separated import (
    SeparatedPGD,
    SeparatedProblem,
    galerkin_update,
    precondition_dim0,
)


def tensor(res, nd):
    K = res.n_modes
    t = np.asarray(res.modes[0], dtype=np.float64)[:K]
    out = t
    for d in range(1, nd):
        m = np.asarray(res.modes[d], dtype=np.float64)[:K]
        out = np.einsum("k...,kj->k...j", out, m)
    return out.sum(axis=0)


def main():
    sep, _ = parametric_elliptic(n_x=48, n_p=10, num_params=2)
    sep_pc, _tf = precondition_dim0(sep, dtype=np.float64)

    # engineer the cascade cancellation: rows (1+C)·g and -C·g cancel to
    # the original load exactly — the structure every residual stage's
    # rescaled stack has
    C = 3.0e5
    rhs = [np.asarray(r, dtype=np.float64) for r in sep_pc.rhs]
    sep_c = SeparatedProblem(
        ops=list(sep_pc.ops),
        rhs=[np.concatenate([(1.0 + C) * rhs[0], -C * rhs[0]]),
             np.concatenate([rhs[1], rhs[1]]),
             np.concatenate([rhs[2], rhs[2]])],
        mass=list(sep_pc.mass),
        bc_dofs=list(sep_pc.bc_dofs),
    )

    kw = dict(n_max=8, tol=0.0, tol_fp=1e-7, max_fp_it=40,
              residual_check=False)
    ref = SeparatedPGD(sep_pc, dtype=np.float64, **kw).solve_fused()
    t_ref = tensor(ref, 3)
    scale = np.abs(t_ref).max()

    for label, extra in (("plain f32", {}),
                         ("rhs_comp (double-f32)", dict(rhs_comp=True))):
        res = SeparatedPGD(sep_c, dtype=np.float32, **kw, **extra)
        err = np.abs(tensor(res.solve_fused(), 3) - t_ref).max() / scale
        print(f"  {label:24s} max rel deviation vs f64: {err:.3e}")

    # the packaged form: a 3-stage cascade with dd from stage 2, against
    # the same-budget full-f64 cascade — isolates precision, not rank
    kw_c = dict(dtype=np.float32, rhs_comp_from=2)
    res = galerkin_update(sep_pc, residual_cascade(sep_pc, (8, 6, 6), **kw_c))
    ref_c = galerkin_update(
        sep_pc, residual_cascade(sep_pc, (8, 6, 6), dtype=np.float64)
    )
    t_c = tensor(ref_c, 3)
    err = np.abs(tensor(res, 3) - t_c).max() / np.abs(t_c).max()
    print(f"  cascade (8,6,6) rhs_comp_from=2 vs same-budget f64: {err:.3e}")


if __name__ == "__main__":
    main()
