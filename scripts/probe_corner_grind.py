"""Feedback-targeted corner grind at 10 params (reduced scale, f64 CPU).

The round-3 frontier experiment of record (PERF.md "Dimensionality
frontier"): every stage (a) re-measures ALL 2^10 corner errors vs
per-sample banded f64 FEM, (b) seeds each of the stage's 64 modes at a
measured-worst corner (models.problems.corner_seeded_init — the corner
barrier is the ones-init of the alternating fixed point, proven here in
f64 where no precision confound exists), (c) solves the residual stage
against the boosted measure, and (d) Galerkin-updates under the BALANCED
(8,6) base (per-dim boundary mass ~ interior; an unbalanced refit
discards corner content — measured 3x on the same span).

Measured trajectory (21 stages): all-1024-corner max 3.2e-3 -> 1.30e-4,
~1.2x/stage, until corners fall below the frozen interior (1.36e-4) and
corner-targeted stages saturate — alternate plain stages from there
(recipes.adaptive_cascade automates the alternation).

Usage: python scripts/probe_corner_grind.py [--stages 21] [--budget 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=int, default=21)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--num-params", type=int, default=10)
    ap.add_argument("--nx", type=int, default=256)
    ap.add_argument("--np", type=int, default=32, dest="n_p")
    ap.add_argument("--stage-boost", default="16,6")
    ap.add_argument("--base-boost", default="8,6")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import warnings

    warnings.filterwarnings("ignore", message=".*compounds.*")

    from pgdrome_tpu.models.problems import (
        corner_seeded_init,
        elliptic_dense_verifier,
        parametric_elliptic,
    )
    from pgdrome_tpu.separated import (
        SeparatedPGD, combine_results, galerkin_update, precondition_dim0,
        residual_problem,
    )

    def parse_boost(s):
        b, q = s.split(",")
        return (float(b), int(q))

    D = args.num_params
    sep_b, Vs = parametric_elliptic(
        n_x=args.nx, n_p=args.n_p, num_params=D, degree_x=2,
        boundary_boost=parse_boost(args.base_boost),
    )
    sep_s, _ = parametric_elliptic(
        n_x=args.nx, n_p=args.n_p, num_params=D, degree_x=2,
        boundary_boost=parse_boost(args.stage_boost),
    )
    pc_b, tf = precondition_dim0(sep_b, dtype=np.float64)
    pc_s, _ = precondition_dim0(sep_s, dtype=np.float64)
    verifier = elliptic_dense_verifier(Vs, tf, n_random=8, seeds=(7, 101),
                                       n_edge=8)
    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    lo, hi = grid[1], grid[-2]
    all_corners = np.array(
        [[lo if (c >> i) & 1 == 0 else hi for i in range(D)]
         for c in range(2 ** D)]
    )

    common = dict(tol=0.0, solver="cg", cg_iters=25, residual_check=False,
                  dtype=np.float64)
    res = SeparatedPGD(pc_b, n_max=96, tol_fp=1e-7, max_fp_it=40,
                       **common).solve_fused()
    ce = verifier.sample_errors(galerkin_update(pc_b, res), all_corners)
    print(json.dumps({"stage": 1, "rank": res.n_modes,
                      "corner_max_all": f"{ce.max():.3e}"}), flush=True)

    for stage in range(2, args.stages + 1):
        t0 = time.perf_counter()
        res_g = galerkin_update(pc_b, res)
        ce = verifier.sample_errors(res_g, all_corners)
        worst = all_corners[np.argsort(ce)[::-1][: args.budget]]
        sep_res, s_res = residual_problem(pc_s, res)
        delta = SeparatedPGD(
            sep_res, n_max=args.budget, tol_fp=1e-5, max_fp_it=20,
            fp_init=corner_seeded_init(worst, lo, hi), **common,
        ).solve()
        res = combine_results(res, delta, s_res)
        res_g = galerkin_update(pc_b, res)
        ce2 = verifier.sample_errors(res_g, all_corners)
        e = verifier(res_g)
        print(json.dumps({
            "stage": stage, "rank": res.n_modes,
            "corner_max_all": f"{ce2.max():.3e}",
            "corner_p99": f"{np.quantile(ce2, 0.99):.3e}",
            "boundary_incl_edges": f"{e['corners']:.3e}",
            "interior": f"{e['interior']:.3e}",
            "s": round(time.perf_counter() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
