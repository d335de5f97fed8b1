"""Probe: the bench postprocess split (CP-ALS compression vs Galerkin)
and whether fewer ALS iterations keep the 1e-6 bound.

The round-3 bench spends ~0.48 s in "postprocess" (compress 160->50 +
galerkin) — the largest single chunk of the 1.7 s headline.  This probe
replays the (fully AOT/setup-cached) three-stage pipeline once, then
re-runs ONLY the postprocess at several ALS iteration counts, timing the
compression and the Galerkin update separately and dense-verifying each
variant (8 corners + 3 seeds x 64).

Usage: python scripts/probe_postprocess.py [--iters 20,12,8,5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # reuse the bench pipeline (functions are importable)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", default="20,12,8,5")
    args = ap.parse_args()

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    from pgdrome_tpu.separated import (
        combine_results,
        compress_modes,
        galerkin_update,
        residual_problem,
    )

    sep_pc64, tf, Vs, meta, _, _ = bench.build()
    res0, *_ = bench.tpu_solve(sep_pc64)
    for tag, budget in (("stage2", bench.N_MODES_STAGE2),
                        ("stage3", bench.N_MODES_STAGE3)):
        sep_res, s_res = residual_problem(sep_pc64, res0)
        delta, *_ = bench.tpu_solve(
            sep_res, n_max=budget, tag=tag, tol_fp=1e-5, max_fp_it=8
        )
        res0 = combine_results(res0, delta, s_res)
    n_solved = int(res0.n_modes)
    mass_c = [np.asarray(sep_pc64.mass[0])] + [
        np.asarray(sep_pc64.ops[j][0]) for j in range(1, 1 + bench.NUM_PARAMS)
    ]
    for n_iters in (int(i) for i in args.iters.split(",")):
        t0 = time.perf_counter()
        res_c = compress_modes(res0, mass_c, bench.N_MODES, n_iters=n_iters)
        t_comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        res_g = galerkin_update(sep_pc64, res_c)
        t_gal = time.perf_counter() - t0
        max_err, per_seed = bench.verify(Vs, res_g, tf)
        print(json.dumps({
            "n_iters": n_iters,
            "compress_s": round(t_comp, 3),
            "galerkin_s": round(t_gal, 3),
            "max_err": f"{max_err:.3e}",
            "per_seed": {str(k): f"{v:.3e}" for k, v in per_seed.items()},
            "rank": f"{n_solved}->{res_g.n_modes}",
        }), flush=True)


if __name__ == "__main__":
    main()
