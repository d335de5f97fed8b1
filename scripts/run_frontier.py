"""Dimensionality-frontier runner: one packaged recipe call
(recipes.highd_frontier) per parameter count, emitting the verified
JSON artifact the frontier claim ships with (FRONTIER.md / FRONTIER_d*.json).

Usage:
  python scripts/run_frontier.py --d 7 [--bound 1e-6] [--minutes 150]
      [--budget 128] [--max-stages 20] [--resume STATE.npz]
      [--artifact FRONTIER_d7.json]

Runs on the default backend (axon TPU under the driver; CPU with
JAX_PLATFORMS=cpu for reduced-scale rehearsals).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("PGDROME_AOT_CACHE", "/root/.cache/pgdrome_aot")
os.environ.setdefault("PGDROME_SETUP_CACHE", "/root/.cache/pgdrome_setup")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, required=True)
    ap.add_argument("--bound", type=float, default=1e-6)
    ap.add_argument("--minutes", type=float, default=150.0)
    ap.add_argument("--budget", type=int, default=128)
    ap.add_argument("--stage1", type=int, default=128)
    ap.add_argument("--max-stages", type=int, default=20)
    ap.add_argument("--n-x", type=int, default=1024)
    ap.add_argument("--n-p", type=int, default=128)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--state-out", default=None)
    ap.add_argument("--artifact", default=None)
    ap.add_argument("--final-fem-corners", type=int, default=1024)
    ap.add_argument("--screener-cap", type=int, default=3072)
    ap.add_argument("--boost-margin", type=float, default=1.2)
    ap.add_argument("--anova", type=int, default=0,
                    help="anchored-ANOVA init order (0 = off, 2 = "
                         "mean+axes+pairs; pgdrome_tpu/anova.py)")
    ap.add_argument("--seed-plain", action="store_true",
                    help="corner-seed stages even on the plain measure "
                         "(the finishing regime near the f32 floor)")
    args = ap.parse_args()

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    from pgdrome_tpu.recipes import highd_frontier
    from pgdrome_tpu.separated import PGDResult

    state_out = args.state_out or f"/tmp/frontier_d{args.d}_state.npz"
    artifact = args.artifact or f"FRONTIER_d{args.d}.json"

    init = None
    if args.resume and os.path.exists(args.resume):
        with np.load(args.resume) as z:
            init = PGDResult(
                modes=[z[f"m{d}"] for d in range(1 + args.d)],
                n_modes=int(z["n_modes"]),
                amplitudes=z["amplitudes"], alpha=z["alpha"],
                fp_its=z["fp_its"], normU0=float(z["normU0"]),
            )
        log(f"resumed rank {init.n_modes} from {args.resume}")

    best, report = highd_frontier(
        args.d, bound=args.bound, n_x=args.n_x, n_p=args.n_p,
        n_stage1=args.stage1, stage_budget=args.budget,
        max_stages=args.max_stages, minutes=args.minutes,
        state_path=state_out, init_result=init, log=log,
        final_fem_corners=args.final_fem_corners,
        screener_cap=args.screener_cap,
        boost_margin=args.boost_margin,
        artifact_path=artifact,
        anova_order=args.anova,
        seed_always=args.seed_plain,
    )
    print(json.dumps({
        "d": args.d, "rank": report["rank"],
        "verified_max": report["verified"]["max"],
        "corners_fem_max": report["verified"].get("corners_fem_max"),
        "artifact": artifact,
    }), flush=True)


if __name__ == "__main__":
    main()
