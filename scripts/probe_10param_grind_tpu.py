"""Full-scale 10-param frontier grind on the TPU: seeded corner stages
alternating with plain stages, error-driven, checkpointed.

Combines every round-3 frontier finding (PERF.md "Dimensionality
frontier"):
* BALANCED (8,6) base measure for Galerkin + plain stages;
* (16,6) stage measure for corner stages, whose modes are SEEDED at the
  measured-worst corners (models.problems.corner_seeded_init — the
  ones-init barrier);
* compensated dd rhs everywhere (f32 on-chip);
* alternation: corner stage while the boundary binds (> margin x
  interior), plain stage otherwise;
* rhs-stack BUCKET PADDING: the residual stack grows with rank, which
  would recompile the enrich programs every stage on the
  server-bound axon backend — zero rhs rows are inert in every
  contraction, so padding R up to a bucket multiple keeps the compiled
  shapes stable for ~bucket/(T*budget) stages per compile.

Usage:
  python scripts/probe_10param_grind_tpu.py --resume /tmp/p10h_state.npz \
      [--minutes 240] [--budget 64] [--bound 3e-5]
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


from pgdrome_tpu.separated import pad_rhs_bucket  # noqa: F401 (re-export
# for probe_10param_screened back-compat; the implementation moved into
# the library)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", default="/tmp/p10h_state.npz")
    ap.add_argument("--minutes", type=float, default=240.0)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--bound", type=float, default=3e-5)
    ap.add_argument("--margin", type=float, default=1.5)
    ap.add_argument("--bucket", type=int, default=4096)
    ap.add_argument("--fb-corners", type=int, default=128,
                    help="corner-feedback subset size (full 2^10 costs "
                    "~6 min of host FEM per stage)")
    ap.add_argument("--state-out", default="/tmp/p10_grind_state.npz")
    args = ap.parse_args()

    import warnings

    warnings.filterwarnings("ignore", message=".*compounds.*")
    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    from pgdrome_tpu.fem.mesh import IntervalMesh
    from pgdrome_tpu.fem.space import FunctionSpace
    from pgdrome_tpu.models.problems import (
        corner_seeded_init, elliptic_dense_verifier,
    )
    from pgdrome_tpu.separated import (
        PGDResult, SeparatedPGD, combine_results, galerkin_update,
        residual_problem,
    )
    import scripts.probe_10param_adaptive as pa

    pa.NUM_PARAMS = D = 10
    pc8, tf = pa.build((8.0, 6))
    pc16, _ = pa.build((16.0, 6))
    Vx = FunctionSpace(IntervalMesh(pa.N_X, 0.0, 1.0), "P", 2)
    Vp = [FunctionSpace(IntervalMesh(pa.N_P, 0.0, 1.0), "P", 1)
          for _ in range(D)]
    Vs = [Vx] + Vp
    verifier = elliptic_dense_verifier(Vs, tf, n_random=16, seeds=(7, 101),
                                       corner_cap=args.fb_corners, n_edge=8)
    fb_corners = verifier.corners
    grid = Vp[0].tabulate_dof_coordinates()[:, 0]
    lo, hi = grid[1], grid[-2]

    with np.load(args.resume) as z:
        res = PGDResult(
            modes=[z[f"m{d}"] for d in range(1 + D)],
            n_modes=int(z["n_modes"]),
            amplitudes=z["amplitudes"], alpha=z["alpha"],
            fp_its=z["fp_its"], normU0=float(z["normU0"]),
        )
    log(f"resumed rank {res.n_modes}")

    common = dict(tol=0.0, solver="cg", cg_iters=25, residual_check=False,
                  dtype=np.float32, rhs_comp=True)
    t_start = time.perf_counter()
    stage = 0
    while time.perf_counter() - t_start < args.minutes * 60.0:
        stage += 1
        t0 = time.perf_counter()
        res_g = galerkin_update(pc8, res)
        ce = verifier.sample_errors(res_g, fb_corners)
        e = verifier(res_g)
        boundary = max(float(ce.max()), e["corners"])
        line = {
            "stage": stage, "rank": res.n_modes,
            "boundary": f"{boundary:.3e}",
            "corners_fb": f"{ce.max():.3e}",
            "verify_boundary": f"{e['corners']:.3e}",
            "interior": f"{e['interior']:.3e}",
        }
        if max(boundary, e["interior"]) < args.bound:
            line["done"] = True
            print(json.dumps(line), flush=True)
            break
        corner_stage = boundary > args.margin * e["interior"]
        prob_s = pc16 if corner_stage else pc8
        sep_res, s_res = residual_problem(prob_s, res)
        sep_res = pad_rhs_bucket(sep_res, args.bucket)
        if corner_stage:
            worst = fb_corners[np.argsort(ce)[::-1][: args.budget]]
            delta = SeparatedPGD(
                sep_res, n_max=args.budget, tol_fp=1e-5, max_fp_it=20,
                fp_init=corner_seeded_init(worst, lo, hi), **common,
            ).solve()
        else:
            delta = SeparatedPGD(
                sep_res, n_max=args.budget, tol_fp=1e-5, max_fp_it=8,
                **common,
            ).solve_fused()
        res = combine_results(res, delta, s_res)
        line.update({"mode": "corner" if corner_stage else "plain",
                     "new_rank": res.n_modes,
                     "s": round(time.perf_counter() - t0, 1)})
        print(json.dumps(line), flush=True)
        arrs = {f"m{d}": np.asarray(res.modes[d], dtype=np.float64)
                for d in range(1 + D)}
        np.savez(args.state_out, n_modes=res.n_modes,
                 amplitudes=np.asarray(res.amplitudes),
                 alpha=np.asarray(res.alpha),
                 fp_its=np.asarray(res.fp_its),
                 normU0=res.normU0, stage=stage, **arrs)


if __name__ == "__main__":
    main()
