"""10-param frontier grind with SCREENED full-coverage verification.

The round-3 grind (scripts/probe_10param_grind_tpu.py) steered corner
stages from a CAPPED 128-corner FEM feedback subset — the full 2^10
corner sweep costs ~6 min of host FEM per stage, so 7/8 of the corners
were never measured and the seeding could miss the true worst ones.
This version uses the f32 residual screener (parallel/certify.py,
round-3 late) to rank ALL 1024 corners + large edge/face + interior
candidate pools in three device dispatches per stage, FEM-verifying
only the top-k of each pool:

* full corner coverage every stage (seeding targets the true worst);
* edge/face pockets (the 5-param lesson) watched continuously;
* per-stage verification cost ~15 s instead of ~6 min.

Reported errors for unmeasured candidates are calibrated estimates
(eta = safety * max(true/residual) over the measured top-k); the final
state should be confirmed with a full FEM corner sweep once.

Usage:
  python scripts/probe_10param_screened.py [--minutes 240] [--budget 64]
      [--resume /tmp/p10s_state.npz] [--state-out /tmp/p10s_state.npz]
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


def save_state(path, res, D, stage):
    arrs = {f"m{d}": np.asarray(res.modes[d], dtype=np.float64)
            for d in range(1 + D)}
    np.savez(path, n_modes=res.n_modes,
             amplitudes=np.asarray(res.amplitudes),
             alpha=np.asarray(res.alpha),
             fp_its=np.asarray(res.fp_its),
             normU0=res.normU0, stage=stage, **arrs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", default=None)
    ap.add_argument("--minutes", type=float, default=240.0)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--stage1", type=int, default=128)
    ap.add_argument("--bound", type=float, default=3e-5)
    ap.add_argument("--margin", type=float, default=1.5)
    ap.add_argument("--bucket", type=int, default=4096)
    ap.add_argument("--cap", type=int, default=3072,
                    help="screener mode cap (grind aborts at this rank)")
    ap.add_argument("--top-corners", type=int, default=32)
    ap.add_argument("--top-edges", type=int, default=12)
    ap.add_argument("--top-interior", type=int, default=12)
    ap.add_argument("--n-edge-cands", type=int, default=2048)
    ap.add_argument("--n-int-cands", type=int, default=4096)
    ap.add_argument("--safety", type=float, default=1.5)
    ap.add_argument("--state-out", default="/tmp/p10s_state.npz")
    ap.add_argument("--final-corners", type=int, default=1024,
                    help="size of the one-off final FEM corner "
                    "confirmation sweep (worst-screened subset)")
    args = ap.parse_args()

    import warnings

    warnings.filterwarnings("ignore", message=".*compounds.*")
    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    from pgdrome_tpu.fem.mesh import IntervalMesh
    from pgdrome_tpu.fem.space import FunctionSpace
    from pgdrome_tpu.models.problems import (
        box_corners,
        corner_seeded_init,
        elliptic_dense_verifier,
    )
    from pgdrome_tpu.parallel.certify import make_screener
    from pgdrome_tpu.separated import (
        PGDResult,
        SeparatedPGD,
        combine_results,
        galerkin_update,
        residual_problem,
    )
    import scripts.probe_10param_adaptive as pa
    from pgdrome_tpu.separated import pad_rhs_bucket

    pa.NUM_PARAMS = D = 10
    pc8, tf = pa.build((8.0, 6))
    pc16, _ = pa.build((16.0, 6))
    Vx = FunctionSpace(IntervalMesh(pa.N_X, 0.0, 1.0), "P", 2)
    Vp = [FunctionSpace(IntervalMesh(pa.N_P, 0.0, 1.0), "P", 1)
          for _ in range(D)]
    Vs = [Vx] + Vp
    # FEM ground truth for the top-k candidates (the verifier's
    # sample_errors path; its own corner/interior draw is unused here)
    verifier = elliptic_dense_verifier(Vs, tf, n_random=0, seeds=(7,),
                                       corner_cap=2)
    grid = Vp[0].tabulate_dof_coordinates()[:, 0]
    lo, hi = grid[1], grid[-2]

    # full corner set: all 2^10 combinations
    corners = box_corners(lo, hi, D)
    rng = np.random.default_rng(424242)
    interior_cands = grid[
        rng.integers(1, len(grid) - 1, size=(args.n_int_cands, D))
    ]
    edge_cands = grid[
        rng.integers(1, len(grid) - 1, size=(args.n_edge_cands, D))
    ]
    for r in range(args.n_edge_cands):
        k = int(rng.integers(1, D))
        dims = rng.choice(D, size=k, replace=False)
        edge_cands[r, dims] = np.where(
            rng.integers(0, 2, size=k) == 0, lo, hi
        )

    screen = make_screener(pc8, Vs, n_modes_cap=args.cap)

    if args.resume and os.path.exists(args.resume):
        with np.load(args.resume) as z:
            res = PGDResult(
                modes=[z[f"m{d}"] for d in range(1 + D)],
                n_modes=int(z["n_modes"]),
                amplitudes=z["amplitudes"], alpha=z["alpha"],
                fp_its=z["fp_its"], normU0=float(z["normU0"]),
            )
        log(f"resumed rank {res.n_modes}")
    else:
        log(f"fresh stage-1 solve ({args.stage1} modes, base measure)")
        t0 = time.perf_counter()
        res = SeparatedPGD(
            pc8, n_max=args.stage1, tol=0.0, tol_fp=1e-5, max_fp_it=8,
            solver="cg", cg_iters=25,
            residual_check=False, dtype=np.float32, rhs_comp=True,
        ).solve_fused()
        log(f"stage 1: rank {res.n_modes} in "
            f"{time.perf_counter() - t0:.1f}s")
        save_state(args.state_out, res, D, 1)

    def screened_errors(res_g, pool, top_k):
        """Screen the pool, FEM-verify the top_k worst (top_k >= 1);
        returns (max_measured, max_estimated, worst_points,
        measured_errors, eta)."""
        rs = screen(res_g, pool)
        order = np.argsort(rs)
        k = min(max(1, int(top_k)), len(order))
        worst = order[len(order) - k:]
        te = verifier.sample_errors(res_g, pool[worst])
        eta = args.safety * float(
            (te / np.maximum(rs[worst], 1e-300)).max()
        )
        rest = order[: len(order) - k]
        est = float(eta * rs[rest].max()) if len(rest) else 0.0
        return float(te.max()), est, pool[worst], te, eta

    common = dict(tol=0.0, solver="cg", cg_iters=25, residual_check=False,
                  dtype=np.float32, rhs_comp=True)
    t_start = time.perf_counter()
    stage = 0
    c_meas = c_est = i_meas = float("nan")
    while time.perf_counter() - t_start < args.minutes * 60.0:
        stage += 1
        if res.n_modes + args.budget > args.cap:
            log(f"rank {res.n_modes} near screener cap {args.cap}; stop")
            break
        t0 = time.perf_counter()
        res_g = galerkin_update(pc8, res)
        t_gal = time.perf_counter() - t0

        t0 = time.perf_counter()
        c_meas, c_est, worst_c, te_c, eta_c = screened_errors(
            res_g, corners, args.top_corners
        )
        e_meas, e_est, _, _, _ = screened_errors(
            res_g, edge_cands, args.top_edges
        )
        i_meas, i_est, _, _, _ = screened_errors(
            res_g, interior_cands, args.top_interior
        )
        t_ver = time.perf_counter() - t0
        boundary = max(c_meas, c_est, e_meas, e_est)
        interior = max(i_meas, i_est)
        line = {
            "stage": stage, "rank": res.n_modes,
            "corners": f"{c_meas:.3e}", "corners_est": f"{c_est:.3e}",
            "edges": f"{e_meas:.3e}", "edges_est": f"{e_est:.3e}",
            "interior": f"{i_meas:.3e}", "interior_est": f"{i_est:.3e}",
            "eta_c": round(eta_c, 2),
            "gal_s": round(t_gal, 1), "verify_s": round(t_ver, 1),
        }
        if max(boundary, interior) < args.bound:
            line["done"] = True
            print(json.dumps(line), flush=True)
            break

        corner_stage = boundary > args.margin * interior
        prob_s = pc16 if corner_stage else pc8
        t0 = time.perf_counter()
        sep_res, s_res = residual_problem(prob_s, res)
        sep_res = pad_rhs_bucket(sep_res, args.bucket)
        if corner_stage:
            # seed at the true measured-worst corners (full coverage —
            # the capped-feedback grind could miss these entirely)
            seed_order = np.argsort(te_c)[::-1]
            delta = SeparatedPGD(
                sep_res, n_max=args.budget, tol_fp=1e-5, max_fp_it=20,
                fp_init=corner_seeded_init(
                    worst_c[seed_order][: args.budget], lo, hi
                ),
                **common,
            ).solve()
        else:
            delta = SeparatedPGD(
                sep_res, n_max=args.budget, tol_fp=1e-5, max_fp_it=8,
                **common,
            ).solve_fused()
        res = combine_results(res, delta, s_res)
        line.update({"mode": "corner" if corner_stage else "plain",
                     "new_rank": res.n_modes,
                     "stage_s": round(time.perf_counter() - t0, 1)})
        print(json.dumps(line), flush=True)
        save_state(args.state_out, res, D, stage)

    # final: FEM confirmation of the screened corner claim on the best
    # Galerkin-updated result (one sweep at the end, not per stage) —
    # worst-screened subset when --final-corners < 1024
    res_g = galerkin_update(pc8, res)
    rs_fin = screen(res_g, corners)
    sub = corners[np.argsort(rs_fin)[-args.final_corners:]]
    t0 = time.perf_counter()
    te_full = verifier.sample_errors(res_g, sub)
    log(
        f"FINAL corner FEM sweep ({len(sub)} solves, "
        f"{time.perf_counter() - t0:.0f}s): max {te_full.max():.3e} "
        f"(screened estimate said {max(c_meas, c_est):.3e})"
    )
    print(json.dumps({
        "final_rank": int(res_g.n_modes),
        "final_corner_max_fem": float(f"{te_full.max():.3e}"),
        "final_interior": f"{i_meas:.3e}",
    }), flush=True)


if __name__ == "__main__":
    main()
