"""CLI for the packaged goal-oriented output certification
(recipes.goal_oriented_frontier): load a frontier primal state, drive
OUTPUT-error-driven adjoint cascades per sensor (stop at the bound,
boost while output corners bind, seed at output-worst corners), and
write the verified artifact.

Usage:
  python scripts/run_goal_oriented.py --d 10 \
      --state states/frontier_d10_state.npz --sensors 0.5 0.25 \
      --bound 1e-6 --artifact FRONTIER_DUAL_d10.json
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
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--state", default="states/frontier_d10_state.npz")
    ap.add_argument("--sensors", type=float, nargs="+", default=[0.5, 0.25])
    ap.add_argument("--bound", type=float, default=1e-6)
    ap.add_argument("--n-x", type=int, default=1024)
    ap.add_argument("--n-p", type=int, default=128)
    ap.add_argument("--dual-stages", type=int, default=8)
    ap.add_argument("--minutes", type=float, default=60.0)
    ap.add_argument("--n-corners", type=int, default=0)
    ap.add_argument("--artifact", default=None)
    ap.add_argument("--state-prefix", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    from pgdrome_tpu.recipes import goal_oriented_frontier
    from pgdrome_tpu.separated import PGDResult

    with np.load(args.state) as z:
        primal = PGDResult(
            modes=[z[f"dd{d}"] if f"dd{d}" in z else z[f"m{d}"]
                   for d in range(1 + args.d)],
            n_modes=int(z["n_modes"]), amplitudes=z["amplitudes"],
            alpha=z["alpha"], fp_its=z["fp_its"],
            normU0=float(z["normU0"]))
    log(f"primal state: rank {primal.n_modes}")

    artifact = args.artifact or f"FRONTIER_DUAL_d{args.d}.json"
    prefix = args.state_prefix or f"states/frontier_dual_d{args.d}"
    duals, report = goal_oriented_frontier(
        args.d, args.sensors, primal, bound=args.bound,
        n_x=args.n_x, n_p=args.n_p, max_dual_stages=args.dual_stages,
        minutes=args.minutes, n_corners=args.n_corners,
        state_prefix=prefix, log=log, artifact_path=artifact)
    print(json.dumps({
        "d": args.d, "corrected_rel_max": report["corrected_rel_max"],
        "met_bound": all(s["met_bound"] for s in report["sensors"]),
        "artifact": artifact,
    }), flush=True)


if __name__ == "__main__":
    main()
