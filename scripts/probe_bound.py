"""Round-3 probe: the 3-param headline bound under the stricter
multi-seed verification.

bench.py's 3x64-sample multi-seed check (round-2 VERDICT weak #5) exposed
a 1.047e-6 pocket at seed 1234 that the round-2 40-sample draw missed.
This probe separates the candidate causes on the exact bench pipeline:

  A. rank-112 combination, Galerkin only (no compression)  -> is the
     pocket already in the uncompressed two-stage result (stage-2 f32
     floor) or introduced by the rank-50 CP-ALS compression?
  B. the shipped bench path (compress 112->50 + Galerkin)  -> reproduce.
  C. three-stage cascade (+48 f32 residual modes), uncompressed.
  D. three-stage, compressed to the deployed rank 50.
  E. (--rhs-comp) TWO-stage with the stage-2 solve in compensated
     double-f32 (rhs_comp=True, ops/ddf32.py): if the stage-2 f32
     floor is the rhs-stack cancellation, dd resolves it in ONE
     restart — dropping stage 3 (and ~0.6 s) from the headline.

Reuses bench.build / bench.tpu_solve / bench.verify so every knob matches
the shipped pipeline; stage-1/2 executables AOT-hit, stage 3 is one new
compile (rhs stack 1+4*112 rows).

Usage: python scripts/probe_bound.py [--stage3-budget 48]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from pgdrome_tpu.separated import (
    combine_results,
    compress_modes,
    galerkin_update,
    residual_problem,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def check(tag, sep_pc64, Vs, tf, res):
    t0 = time.perf_counter()
    mx, per_seed = bench.verify(Vs, res, tf)
    print(
        json.dumps(
            {
                "probe": tag,
                "rank": int(res.n_modes),
                "max_err": f"{mx:.3e}",
                "per_seed": {str(k): f"{v:.3e}" for k, v in per_seed.items()},
                "verify_s": round(time.perf_counter() - t0, 1),
            }
        ),
        flush=True,
    )
    return mx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage3-budget", type=int, default=48)
    ap.add_argument("--skip-two-stage", action="store_true",
                    help="skip the A/B reproduction checks")
    ap.add_argument("--rhs-comp", action="store_true",
                    help="run probe E (dd stage-2) instead of C/D")
    args = ap.parse_args()

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    sep_pc64, tf, Vs, meta, t_setup, _ = bench.build()
    mass_c = [np.asarray(sep_pc64.mass[0])] + [
        np.asarray(sep_pc64.ops[j][0]) for j in range(1, 1 + bench.NUM_PARAMS)
    ]

    res1, *_ = bench.tpu_solve(sep_pc64)
    sep_res, s_res = residual_problem(sep_pc64, res1)
    delta, *_ = bench.tpu_solve(
        sep_res, n_max=bench.N_MODES_STAGE2, tag="stage2", tol_fp=1e-5,
        max_fp_it=8, rhs_comp=args.rhs_comp,
    )
    res = combine_results(res1, delta, s_res)

    if args.rhs_comp:
        check("E_two_stage_dd_rank112_galerkin", sep_pc64, Vs, tf,
              galerkin_update(sep_pc64, res))
        check("E_two_stage_dd_compress50", sep_pc64, Vs, tf,
              galerkin_update(
                  sep_pc64, compress_modes(res, mass_c, bench.N_MODES,
                                           n_iters=20)))
        return

    if not args.skip_two_stage:
        check("A_two_stage_rank112_galerkin", sep_pc64, Vs, tf,
              galerkin_update(sep_pc64, res))
        check("B_two_stage_compress50", sep_pc64, Vs, tf,
              galerkin_update(
                  sep_pc64, compress_modes(res, mass_c, bench.N_MODES,
                                           n_iters=20)))

    # stage 3: f64-exact residual of the raw rank-112 combination,
    # re-solved f32 (the floor-restart mechanism, third application)
    t0 = time.perf_counter()
    sep_res3, s3 = residual_problem(sep_pc64, res)
    log(f"stage-3 residual build: {time.perf_counter()-t0:.2f}s "
        f"(|r| = {s3:.3e})")
    delta3, t_s3, t_first3, aot3 = bench.tpu_solve(
        sep_res3, n_max=args.stage3_budget, tag="stage3", tol_fp=1e-5,
        max_fp_it=8,
    )
    res3 = combine_results(res, delta3, s3)
    check("C_three_stage_full_rank_galerkin", sep_pc64, Vs, tf,
          galerkin_update(sep_pc64, res3))
    check("D_three_stage_compress50", sep_pc64, Vs, tf,
          galerkin_update(
              sep_pc64, compress_modes(res3, mass_c, bench.N_MODES,
                                       n_iters=20)))


if __name__ == "__main__":
    main()
