"""Bench-scale NONLINEAR vademecum artifact (round-4 VERDICT weak #3):
outer-Picard nonlinear solve at n_x=1024 (2049 P2 dofs) × 2 params on
the TPU fast path, dense-verified against per-sample banded-Newton
truth, served through Vademecum.  Emits NONLINEAR.json.

Usage: python scripts/run_nonlinear.py [--eps 2.0] [--n-x 1024]
           [--n-p 64] [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("PGDROME_AOT_CACHE", "/root/.cache/pgdrome_aot")
os.environ.setdefault("PGDROME_SETUP_CACHE", "/root/.cache/pgdrome_setup")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eps", type=float, default=2.0)
    ap.add_argument("--n-x", type=int, default=1024)
    ap.add_argument("--n-p", type=int, default=64)
    ap.add_argument("--num-params", type=int, default=2)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--artifact", default="NONLINEAR.json")
    args = ap.parse_args()

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    from pgdrome_tpu.models.problems import (
        nonlinear_dense_verifier,
        nonlinear_elliptic,
    )
    from pgdrome_tpu.recipes import nonlinear_vademecum
    from pgdrome_tpu.serving import Vademecum

    if args.quick:
        args.n_x, args.n_p = 128, 16

    t0 = time.perf_counter()
    sep, Vs, ml = nonlinear_elliptic(
        n_x=args.n_x, n_p=args.n_p, num_params=args.num_params)
    t_setup = time.perf_counter() - t0

    t0 = time.perf_counter()
    res, tf, rep = nonlinear_vademecum(
        sep, Vs, ml, args.eps, budgets=(64, 48, 48),
        dtype=np.float32, rhs_bucket=512, log=log)
    t_solve = time.perf_counter() - t0
    log(f"solve: {t_solve:.1f}s over {rep['outer_iterations']} outer "
        f"iterations (setup {t_setup:.1f}s)")

    t0 = time.perf_counter()
    ver = nonlinear_dense_verifier(Vs, args.eps, ml, tf, n_random=16,
                                   seeds=(7, 101, 1234), n_edge=8)
    v = ver(res)
    t_verify = time.perf_counter() - t0
    log(f"dense Newton verification: {v} ({t_verify:.1f}s)")

    # serving sanity through the container
    vd = Vademecum(Vs, res, dim0_transform=tf)
    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    rng = np.random.default_rng(0)
    q = grid[rng.integers(1, len(grid) - 1,
                          size=(256, args.num_params))]
    t0 = time.perf_counter()
    fields = np.asarray(vd.fields(q))
    t_serve = time.perf_counter() - t0

    report = {
        "eps": args.eps, "n_x": args.n_x, "n_p": args.n_p,
        "num_params": args.num_params,
        "rank": rep["rank"],
        "outer_iterations": rep["outer_iterations"],
        "picard_history": rep["history"],
        "verified": {k: float(val) for k, val in v.items()
                     if isinstance(val, (int, float, np.floating))},
        "solve_s": round(t_solve, 1),
        "verify_s": round(t_verify, 1),
        "serve_256_fields_s": round(t_serve, 3),
        "fields_shape": list(fields.shape),
    }
    with open(args.artifact, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"verified_max": float(v["max"]),
                      "rank": rep["rank"],
                      "solve_s": round(t_solve, 1)}), flush=True)


if __name__ == "__main__":
    main()
