"""Goal-oriented output certification at the dimensionality frontier.

NOTE: the PACKAGED form of this flow is
``recipes.goal_oriented_frontier`` (scripts/run_goal_oriented.py) —
it drives the dual cascade on the FEM-verified corrected-output error
directly (stop-at-bound, output-worst corner seeding).  This probe is
the original fixed-stage driver, kept for the recorded artifact's
provenance and for ad-hoc dual-cascade experiments.

The d=10 FIELD error is rank-walled (measured law ~ rank^-1.5,
FRONTIER.md) — but outputs aren't: with an adjoint vademecum z_r per
sensor, the corrected output s_corr = l·u_r + z_r·r has error
(z_true − z_r)·r ≈ dual_error × primal_residual (pgdrome_tpu/dual.py).
This script loads the committed d=10 primal state, drives a modest
adaptive cascade on the ADJOINT problem per sensor (same executables as
the primal stages — shapes match, AOT hits), and verifies the corrected
outputs against per-sample f64 FEM on the full corner-inclusive set
(ALL 2^d corners + edges + multi-seed interior).

Usage:
  python scripts/probe_dual_frontier.py --d 10 \
      --state states/frontier_d10_state.npz \
      --sensors 0.5 0.25 --dual-stages 5 --minutes 45 \
      --artifact FRONTIER_DUAL_d10.json
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
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--state", default="states/frontier_d10_state.npz")
    ap.add_argument("--sensors", type=float, nargs="+", default=[0.5, 0.25])
    ap.add_argument("--n-x", type=int, default=1024)
    ap.add_argument("--n-p", type=int, default=128)
    ap.add_argument("--dual-stage1", type=int, default=128)
    ap.add_argument("--dual-budget", type=int, default=128)
    ap.add_argument("--dual-stages", type=int, default=5)
    ap.add_argument("--dual-bound", type=float, default=1e-3)
    ap.add_argument("--minutes", type=float, default=45.0,
                    help="per-sensor dual cascade budget")
    ap.add_argument("--n-corners", type=int, default=0,
                    help="0 = ALL 2^d corners in the output sweep")
    ap.add_argument("--n-edge", type=int, default=48)
    ap.add_argument("--n-random", type=int, default=64)
    ap.add_argument("--seeds", type=int, nargs="+", default=[7, 101, 1234])
    ap.add_argument("--artifact", default="FRONTIER_DUAL_d10.json")
    ap.add_argument("--resume-dual", action="store_true",
                    help="resume dual cascades from saved states")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (rehearsals; the axon "
                         "plugin ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()

    from scipy.linalg import solve_banded

    from pgdrome_tpu.dual import DualCorrector, adjoint_problem, \
        point_functional
    from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix
    from pgdrome_tpu.models.problems import (
        box_corners,
        elliptic_dense_verifier,
        parametric_elliptic,
    )
    from pgdrome_tpu.recipes import adaptive_cascade
    from pgdrome_tpu.separated import (
        PGDResult,
        galerkin_update,
        precondition_dim0,
    )
    from pgdrome_tpu.utils.setup_cache import cached_setup

    d = args.d
    t_all = time.perf_counter()

    # ---- problems (same cached keys as highd_frontier) ----
    def build(boost):
        def _build():
            import warnings

            with warnings.catch_warnings():
                warnings.filterwarnings(
                    "ignore", message=".*boundary_boost compounds.*")
                sep64, _ = parametric_elliptic(
                    n_x=args.n_x, n_p=args.n_p, num_params=d, degree_x=2,
                    boundary_boost=boost)
            return precondition_dim0(sep64, dtype=np.float64)

        (sep_pc64, tf), status = cached_setup(
            _build,
            key_data=["probe5_build_v1", args.n_x, args.n_p, d, boost],
            code_objects=(parametric_elliptic, stiffness_matrix,
                          load_vector),
        )
        log(f"setup cache {status} (boost {boost})")
        return sep_pc64, tf

    sep_base_pc, tf_u = build((8.0, 6))
    sep_boost_pc, _ = build((16.0, 6))
    log("building raw (un-preconditioned) problem for the corrector ...")
    sep_plain, Vs = parametric_elliptic(
        n_x=args.n_x, n_p=args.n_p, num_params=d, degree_x=2)
    import warnings

    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message=".*boundary_boost compounds.*")
        sep_b16_raw, _ = parametric_elliptic(
            n_x=args.n_x, n_p=args.n_p, num_params=d, degree_x=2,
            boundary_boost=(16.0, 6))

    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    lo, hi = grid[1], grid[-2]
    Vx = Vs[0]
    b_full = load_vector(Vx, lambda x: np.ones_like(x))

    # ---- primal state -> deployed (Galerkin-updated) result ----
    with np.load(args.state) as z:
        res_u_raw = PGDResult(
            modes=[z[f"m{dd}"] for dd in range(1 + d)],
            n_modes=int(z["n_modes"]),
            amplitudes=z["amplitudes"], alpha=z["alpha"],
            fp_its=z["fp_its"], normU0=float(z["normU0"]),
        )
    log(f"primal state: rank {res_u_raw.n_modes}")
    t0 = time.perf_counter()
    res_u = galerkin_update(sep_base_pc, res_u_raw)
    log(f"primal galerkin_update: {time.perf_counter() - t0:.1f} s")

    # ---- verification sample set (shared across sensors) ----
    n_c = 2 ** d
    idx = np.arange(n_c)
    if args.n_corners and n_c > args.n_corners:
        rng_c = np.random.default_rng(0)
        idx = np.concatenate(
            [[0, n_c - 1],
             rng_c.choice(n_c - 2, size=args.n_corners - 2,
                          replace=False) + 1])
    corners = box_corners(lo, hi, d, idx)
    sets = [("corners", corners)]
    for seed in args.seeds:
        rng = np.random.default_rng(seed)
        if args.n_random:
            sets.append((f"interior_{seed}", grid[
                rng.integers(1, len(grid) - 1, size=(args.n_random, d))]))
        if args.n_edge:
            pts = grid[rng.integers(1, len(grid) - 1,
                                    size=(args.n_edge, d))]
            for r in range(args.n_edge):
                k = int(rng.integers(1, d))
                dims = rng.choice(d, size=k, replace=False)
                pts[r, dims] = np.where(
                    rng.integers(0, 2, size=k) == 0, lo, hi)
            sets.append((f"edges_{seed}", pts))
    samples = np.concatenate([s for _, s in sets])
    log(f"verification set: {len(samples)} samples "
        f"({len(corners)} corners)")

    # ---- per-sample f64 FEM truth (one solve serves every sensor) ----
    K_probe = stiffness_matrix(Vx)
    bw = max(k for k in range(K_probe.shape[0])
             if np.any(np.diagonal(K_probe, k) != 0.0))
    ls = [point_functional(Vx, x0) for x0 in args.sensors]
    t0 = time.perf_counter()
    s_true = np.zeros((len(samples), len(ls)))
    for si, p in enumerate(samples):
        kappa = lambda x: 1.0 + sum(
            p[i] * np.sin((i + 1) * np.pi * x) ** 2 / (2 * d)
            for i in range(d))
        K = stiffness_matrix(Vx, weight=kappa)
        n = K.shape[0] - 2
        ab = np.zeros((2 * bw + 1, n))
        for k in range(-bw, bw + 1):
            dg = np.diagonal(K, k)[1: 1 + n - abs(k)]
            if k >= 0:
                ab[bw - k, k:] = dg
            else:
                ab[bw - k, : n + k] = dg
        u_t = np.zeros(K.shape[0])
        u_t[1:-1] = solve_banded((bw, bw), ab, b_full[1:-1])
        for j, l in enumerate(ls):
            s_true[si, j] = l @ u_t
        if si % 256 == 255:
            log(f"  fem truth {si + 1}/{len(samples)}")
    log(f"fem truth sweep: {time.perf_counter() - t0:.1f} s")

    report = {
        "d": d, "primal_rank": int(res_u.n_modes),
        "primal_state": args.state,
        "n_samples": int(len(samples)), "n_corners": int(len(corners)),
        "seeds": list(args.seeds), "sensors": [],
    }

    for j, x0 in enumerate(args.sensors):
        log(f"=== sensor x0={x0} ===")
        l = ls[j]
        adj_pc, tf_z = precondition_dim0(
            adjoint_problem(sep_plain, l), dtype=np.float64)
        adj_boost_pc, _ = precondition_dim0(
            adjoint_problem(sep_b16_raw, l), dtype=np.float64)
        dual_state = f"states/frontier_dual_d{d}_s{j}.npz"
        init = None
        if args.resume_dual and os.path.exists(dual_state):
            with np.load(dual_state) as z:
                init = PGDResult(
                    modes=[z[f"m{dd}"] for dd in range(1 + d)],
                    n_modes=int(z["n_modes"]),
                    amplitudes=z["amplitudes"], alpha=z["alpha"],
                    fp_its=z["fp_its"], normU0=float(z["normU0"]))
            log(f"resumed dual rank {init.n_modes}")

        verify = elliptic_dense_verifier(
            Vs, tf_z, n_random=16, seeds=(7, 101), corner_cap=32,
            n_edge=16, rhs_vec=l)

        def checkpoint(stage_line, raw):
            arrs = {f"m{dd}": np.asarray(raw.modes[dd], dtype=np.float64)
                    for dd in range(1 + d)}
            np.savez(dual_state, n_modes=raw.n_modes,
                     amplitudes=np.asarray(raw.amplitudes),
                     alpha=np.asarray(raw.alpha),
                     fp_its=np.asarray(raw.fp_its),
                     normU0=raw.normU0, **arrs)

        t0 = time.perf_counter()
        res_z, hist = adaptive_cascade(
            adj_pc, verify, bound=args.dual_bound,
            n_stage1=args.dual_stage1, stage_budget=args.dual_budget,
            max_stages=args.dual_stages, boost_problem=adj_boost_pc,
            boost_margin=1.2, rhs_comp=True, dtype=np.float32,
            log=log, init_result=init, checkpoint=checkpoint,
            corner_seed_range=(lo, hi), rhs_bucket=4096,
            minutes=args.minutes)
        dual_s = time.perf_counter() - t0
        dual_field_err = min(h["max"] for h in hist)
        log(f"dual cascade: rank {res_z.n_modes} field err "
            f"{dual_field_err:.2e} in {dual_s:.0f} s")

        t0 = time.perf_counter()
        dc = DualCorrector(sep_plain, Vs, l, res_u, tf_u, res_z, tf_z)
        s_corr, s_plain, est = dc.corrected(samples, return_parts=True)
        corr_s = time.perf_counter() - t0

        st = s_true[:, j]
        denom = np.abs(st)
        e_plain = np.abs(s_plain - st) / denom
        e_corr = np.abs(s_corr - st) / denom
        true_err = st - s_plain
        big = np.abs(true_err) > 1e-12 * np.abs(st).max()
        eff = est[big] / true_err[big]

        def _split_max(errs):
            out, off = {}, 0
            for name, pts in sets:
                out[name] = float(errs[off: off + len(pts)].max())
                off += len(pts)
            return out

        sensor = {
            "x0": float(x0),
            "dual_rank": int(res_z.n_modes),
            "dual_field_err": float(dual_field_err),
            "dual_history": [
                {k: v for k, v in h.items()
                 if not isinstance(v, np.ndarray)} for h in hist],
            "dual_cascade_s": round(dual_s, 1),
            "corrector_s": round(corr_s, 1),
            "output_abs_range": [float(np.abs(st).min()),
                                 float(np.abs(st).max())],
            "plain_rel_max": float(e_plain.max()),
            "plain_rel_median": float(np.median(e_plain)),
            "corrected_rel_max": float(e_corr.max()),
            "corrected_rel_median": float(np.median(e_corr)),
            "corrected_by_set": _split_max(e_corr),
            "plain_by_set": _split_max(e_plain),
            "improvement_max": float(e_plain.max() / e_corr.max()),
            "estimate_effectivity": {
                "median": float(np.median(eff)),
                "p05": float(np.quantile(eff, 0.05)),
                "p95": float(np.quantile(eff, 0.95)),
                "n": int(big.sum()),
            },
            "dual_state": dual_state,
        }
        report["sensors"].append(sensor)
        log(json.dumps({k: sensor[k] for k in
                        ("x0", "dual_rank", "plain_rel_max",
                         "corrected_rel_max", "improvement_max")}))
        with open(args.artifact, "w") as f:
            json.dump(report, f, indent=1)

    report["total_s"] = round(time.perf_counter() - t_all, 1)
    with open(args.artifact, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({
        "d": d, "primal_rank": report["primal_rank"],
        "corrected_rel_max": max(s["corrected_rel_max"]
                                 for s in report["sensors"]),
        "plain_rel_max": max(s["plain_rel_max"]
                             for s in report["sensors"]),
        "artifact": args.artifact,
    }), flush=True)


if __name__ == "__main__":
    main()
