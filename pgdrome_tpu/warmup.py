"""Precompile and AOT-cache the standard solver programs.

``python -m pgdrome_tpu.warmup [--quick]``

On remote/tunneled TPU backends the first compile of each program shape
is server-bound (105-390 s measured; jax's compilation cache does not
intercept it).  The persistent AOT-executable cache
(utils/aot_cache.py, $PGDROME_AOT_CACHE) removes the recompile on every
later run — this tool populates it ahead of time, so deployments and CI
pay the compile once, off the serving path.

Programs warmed (the bench.py / serving shapes):
  * stage-1 fused enrichment (64 modes, cg) on the parametric-elliptic
    north-star shapes
  * stage-2 residual re-solve program (48 modes, fp8)
  * stage-3 re-solve on the second residual's larger rhs stack (the
    three-stage headline pipeline; the stack grows again, so it is a
    distinct program shape)
  * the flagship 4-dim elasticity solve (elasticity_vademecum(n_nu=...),
    bench elasticity_nu phase)

The enrichment programs take the problem data as jit INPUTS, so one
cached executable serves every same-shaped problem regardless of values.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def warmup(n_x=1024, n_p=128, num_params=3, n_modes=(64, 48, 48)):
    os.environ.setdefault(
        "PGDROME_AOT_CACHE", os.path.expanduser("~/.cache/pgdrome_aot")
    )
    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    from pgdrome_tpu.models.problems import parametric_elliptic
    from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0

    t0 = time.perf_counter()
    sep, Vs = parametric_elliptic(
        n_x=n_x, n_p=n_p, num_params=num_params, degree_x=2
    )
    sep_pc, _ = precondition_dim0(sep, dtype=np.float64)
    log(f"warmup: built shapes ({time.perf_counter()-t0:.1f}s)")

    from pgdrome_tpu.separated import residual_problem

    stage1, stage2 = n_modes[0], n_modes[1]
    s1 = SeparatedPGD(
        sep_pc, n_max=stage1, tol=0.0, tol_fp=1e-7, max_fp_it=40,
        solver="cg", cg_iters=25, residual_check=False, dtype=np.float32,
    )
    t0 = time.perf_counter()
    res = s1.solve_fused()
    log(
        f"warmup: stage1 ({stage1} modes) ready in "
        f"{time.perf_counter()-t0:.1f}s — aot cache {s1.last_compile_status}"
    )
    # stage 2 must be warmed on the RESIDUAL problem: residual_problem
    # grows the rhs stack from R to R + T·K rows, and the AOT key hashes
    # data shapes — warming the base-problem shapes would never match the
    # serving-path program
    sep_res, _ = residual_problem(sep_pc, res)
    s2 = SeparatedPGD(
        sep_res, n_max=stage2, tol=0.0, tol_fp=1e-5, max_fp_it=8,
        solver="cg", cg_iters=25, residual_check=False, dtype=np.float32,
    )
    t0 = time.perf_counter()
    delta = s2.solve_fused()
    log(
        f"warmup: stage2 ({stage2} modes, residual-shaped rhs) ready in "
        f"{time.perf_counter()-t0:.1f}s — aot cache {s2.last_compile_status}"
    )
    if len(n_modes) < 3:
        return
    # stage 3 is again a DISTINCT shape: the second residual is taken of
    # the combined rank-(stage1+stage2) result, so its rhs stack is
    # larger still (R + T·(K1+K2) rows)
    from pgdrome_tpu.separated import combine_results

    stage3 = n_modes[2]
    sep_res3, _ = residual_problem(sep_pc, combine_results(res, delta, 1.0))
    s3 = SeparatedPGD(
        sep_res3, n_max=stage3, tol=0.0, tol_fp=1e-5, max_fp_it=8,
        solver="cg", cg_iters=25, residual_check=False, dtype=np.float32,
    )
    t0 = time.perf_counter()
    s3.solve_fused()
    log(
        f"warmup: stage3 ({stage3} modes, second-residual rhs) ready in "
        f"{time.perf_counter()-t0:.1f}s — aot cache {s3.last_compile_status}"
    )

def warmup_elasticity_nu(quick=False):
    from pgdrome_tpu.models.problems import elasticity_vademecum
    from pgdrome_tpu.separated import SeparatedPGD, precondition_dim

    dims = (
        dict(nx=8, ny=3, n_p=6, n_E=6, n_nu=8)
        if quick
        else dict(nx=24, ny=6, n_p=16, n_E=16, n_nu=16)
    )
    n_modes = 6 if quick else 16
    t0 = time.perf_counter()
    sep, Vs, _ = elasticity_vademecum(
        degree=2, param_discretization="collocation", **dims
    )
    K1 = np.asarray(sep.ops[0][0])
    K2 = np.asarray(sep.ops[0][1])
    sep_pc, _tf = precondition_dim(sep, dim=0, dtype=np.float64,
                                   base=K1 + K2)
    s = SeparatedPGD(
        sep_pc, n_max=n_modes, tol=0.0, tol_fp=1e-6, max_fp_it=30,
        solver="cg", cg_iters=30, residual_check=False, dtype=np.float32,
    )
    s.solve_fused()
    log(
        f"warmup: elasticity-nu ({n_modes} modes, {sep_pc.sizes[0]} dofs) "
        f"ready in {time.perf_counter()-t0:.1f}s — aot cache "
        f"{s.last_compile_status}"
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes (smoke test, seconds)")
    ap.add_argument("--prune-days", type=float, default=None,
                    help="first prune AOT-cache entries untouched for "
                    "this many days (orphaned keys from code edits)")
    args = ap.parse_args(argv)
    if args.prune_days is not None:
        from pgdrome_tpu.utils.aot_cache import prune

        os.environ.setdefault(
            "PGDROME_AOT_CACHE", os.path.expanduser("~/.cache/pgdrome_aot")
        )
        n, freed = prune(max_age_days=args.prune_days)
        log(f"pruned {n} entries ({freed/1e6:.1f} MB)")
    if args.quick:
        warmup(n_x=64, n_p=16, num_params=2, n_modes=(6, 4, 4))
    else:
        warmup()
    warmup_elasticity_nu(quick=args.quick)


if __name__ == "__main__":
    main()
