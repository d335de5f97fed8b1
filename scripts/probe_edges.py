"""Edge/face audit of the headline <1e-6 claims.

The shipped verification (bench.py, probe_5param.py) sweeps all
parameter-box CORNERS plus multi-seed random INTERIOR samples — but
never partial-extreme points (some dims pinned at the box boundary,
the rest interior).  Random draws have every dim interior w.h.p., so
edges/faces are a blind spot, and they are exactly where the
boundary-boosted greedy measure could leave pockets: the boost weight
compounds per extreme dim, so a (d-1)-extreme edge gets beta^(d-1)
weight — less targeted than corners, more than the interior.

This probe rebuilds the EXACT bench pipeline (imports bench.py's own
functions) and verifies the deployed rank-50 vademecum on edge samples:
per seed, n_edge points with a random 1..d-1 dims at the extremes.

Usage: python scripts/probe_edges.py [--n-edge 32] [--five-param]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PGDROME_AOT_CACHE", "/root/.cache/pgdrome_aot")
os.environ.setdefault("PGDROME_SETUP_CACHE", "/root/.cache/pgdrome_setup")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-edge", type=int, default=32)
    ap.add_argument("--state", default=None,
                    help="verify a saved cascade state npz (probe_5param "
                    "format) instead of re-running the bench pipeline; "
                    "give --num-params with it")
    ap.add_argument("--num-params", type=int, default=3)
    ap.add_argument("--boost", default="16,6",
                    help="base boost of the saved state's problem (the "
                    "Galerkin measure): '16,6' for the 5-param states, "
                    "'4,6' for the 10-param ones")
    ap.add_argument("--corner-cap", type=int, default=64)
    args = ap.parse_args()

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    from pgdrome_tpu.models.problems import elliptic_dense_verifier

    if args.state:
        from pgdrome_tpu.fem.mesh import IntervalMesh
        from pgdrome_tpu.fem.space import FunctionSpace
        from pgdrome_tpu.separated import PGDResult

        sys.argv = [sys.argv[0]]  # keep probe imports argument-free
        import scripts.probe_5param as p5

        p5.NUM_PARAMS = args.num_params
        b, q = args.boost.split(",")
        sep_pc, tf, Vs = p5.build(boost=(float(b), int(q)))
        with np.load(args.state) as z:
            res = PGDResult(
                modes=[z[f"m{d}"] for d in range(1 + args.num_params)],
                n_modes=int(z["n_modes"]),
                amplitudes=z["amplitudes"], alpha=z["alpha"],
                fp_its=z["fp_its"], normU0=float(z["normU0"]),
            )
        from pgdrome_tpu.separated import galerkin_update

        res = galerkin_update(sep_pc, res)
    else:
        import bench

        sep_pc, tf, Vs, meta, t_setup, setup_status = bench.build()
        log(f"setup {t_setup:.1f}s ({setup_status})")
        res, t_solve, t_first, aot = bench.tpu_solve(sep_pc)
        from pgdrome_tpu.separated import (
            combine_results, compress_modes, galerkin_update,
            residual_problem,
        )

        for tag, n in (("stage2", bench.N_MODES_STAGE2),
                       ("stage3", bench.N_MODES_STAGE3)):
            sep_res, s_res = residual_problem(sep_pc, res)
            delta, *_ = bench.tpu_solve(sep_res, n_max=n, tag=tag,
                                        tol_fp=1e-5, max_fp_it=8)
            res = combine_results(res, delta, s_res)
        if res.n_modes > bench.N_MODES:
            mass_c = [np.asarray(sep_pc.mass[0])] + [
                np.asarray(sep_pc.ops[j][0])
                for j in range(1, 1 + bench.NUM_PARAMS)
            ]
            res = compress_modes(res, mass_c, bench.N_MODES, n_iters=20)
        res = galerkin_update(sep_pc, res)
        log(f"deployed rank {res.n_modes}")

    t0 = time.perf_counter()
    verify = elliptic_dense_verifier(
        Vs, tf, n_random=16, seeds=(7, 101, 1234, 777),
        corner_cap=args.corner_cap, n_edge=args.n_edge,
    )
    errs = verify(res)
    # corners-only rerun isolates the edge contribution
    errs_plain = elliptic_dense_verifier(
        Vs, tf, n_random=0, seeds=(7,), corner_cap=args.corner_cap,
    )(res)
    print(json.dumps({
        "num_params": len(Vs) - 1, "rank": res.n_modes,
        "boundary_max_incl_edges": f"{errs['corners']:.3e}",
        "pure_corner_max": f"{errs_plain['corners']:.3e}",
        "interior_max": f"{errs['interior']:.3e}",
        "max": f"{errs['max']:.3e}",
        "n_edge_per_seed": args.n_edge,
        "verify_s": round(time.perf_counter() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
