"""Bench-scale TPU measurement of the certified residual indicator
(parallel/certify.py): compile/table-build cost and sustained
certification throughput on the north-star 3-param elliptic at deployed
rank.  Run on the TPU (no env overrides); results recorded in PERF.md.

Usage: python scripts/probe_certify.py [--samples 4096] [--chunk N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # reuses the bench setup cache + AOT-cached solve programs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--n-modes", type=int, default=None,
                    help="stage-1 greedy budget (default: bench's)")
    args = ap.parse_args()

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    sep_pc64, tf, Vs, meta, t_setup, setup_status = bench.build()
    res, t_solve, t_first, aot = bench.tpu_solve(
        sep_pc64, n_max=args.n_modes
    )

    from pgdrome_tpu.parallel.certify import make_residual_indicator

    # pc-problem shortcut: Euclidean residual on the pc stacks IS the
    # energy-preconditioned indicator (certify.py docstring)
    t0 = time.perf_counter()
    ind = make_residual_indicator(sep_pc64, Vs, res, chunk=args.chunk)
    t_build = time.perf_counter() - t0
    bench.log(
        f"indicator build (host G tables): {t_build:.2f}s, "
        f"chunk={ind.chunk}"
    )

    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    rng = np.random.default_rng(7)
    samples = grid[
        rng.integers(1, len(grid) - 1, size=(args.samples, len(Vs) - 1))
    ]

    t0 = time.perf_counter()
    vals = ind(samples[: ind.chunk])  # first dispatch: compile/AOT
    t_compile = time.perf_counter() - t0
    bench.log(f"first dispatch (incl. compile): {t_compile:.1f}s")

    t0 = time.perf_counter()
    vals = ind(samples)
    t_sweep = time.perf_counter() - t0
    rate = args.samples / t_sweep
    bench.log(
        f"certification sweep: {args.samples} samples in {t_sweep:.2f}s "
        f"= {rate:,.0f} samples/s; residual range "
        f"[{vals.min():.3e}, {vals.max():.3e}]"
    )

    # corners: the certification queries that matter most
    from pgdrome_tpu.models.problems import box_corners

    lo, hi = grid[1], grid[-2]
    corners = box_corners(lo, hi, len(Vs) - 1)
    cvals = ind(corners)
    bench.log(
        f"corner residuals: max {cvals.max():.3e} min {cvals.min():.3e}"
    )

    # f32 screener (the per-stage ranking path for adaptive cascades):
    # padded cap exercises the recompile-free shape, values checked
    # against the dd indicator
    from pgdrome_tpu.parallel.certify import make_screener

    screen = make_screener(sep_pc64, Vs, n_modes_cap=256)
    t0 = time.perf_counter()
    svals = screen(res, samples[:64])
    t_first_s = time.perf_counter() - t0
    bench.log(f"screener first call (incl. compile): {t_first_s:.1f}s")
    t0 = time.perf_counter()
    svals = screen(res, samples)
    t_screen = time.perf_counter() - t0
    dd_ref = vals
    reldev = np.abs(svals - dd_ref) / dd_ref
    bench.log(
        f"screener sweep: {args.samples} samples in {t_screen:.2f}s = "
        f"{args.samples / t_screen:,.0f} samples/s; max dev vs dd "
        f"{reldev.max():.2e} (median {np.median(reldev):.2e})"
    )


if __name__ == "__main__":
    main()
