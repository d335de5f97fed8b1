"""Exact global-sensitivity analysis of a dimensionality-frontier
vademecum (scripts/run_frontier.py state checkpoints): closed-form
Sobol' first-order/total/pairwise indices of the d-parameter solution —
the serving-side payoff of the separated structure at parameter counts
where sampling-based sensitivity is hopeless (a d=10 pick-freeze MC at
this fidelity needs (d+2)·N FOM solves; this is O(d²·rank²) host f64,
seconds).

Usage:
  python scripts/sobol_frontier.py --state /tmp/frontier_d10_state.npz \
      --d 10 [--n-x 1024] [--n-p 128] [--points 0.25 0.5 0.75] \
      [--out SOBOL_d10.json]

CPU-only (jax not touched): the factor stats are FE mass-matrix
contractions and the output Gram is one BLAS matmul.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("PGDROME_SETUP_CACHE", "/root/.cache/pgdrome_setup")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True)
    ap.add_argument("--d", type=int, required=True)
    ap.add_argument("--n-x", type=int, default=1024)
    ap.add_argument("--n-p", type=int, default=128)
    ap.add_argument("--boost", type=float, nargs=2, default=(8.0, 6))
    ap.add_argument("--points", type=float, nargs="*", default=[0.5])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    # (float(beta), int(q)) — CLI floats would change the setup-cache
    # key vs the frontier runs and force a minutes-long d=10 rebuild
    args.boost = (float(args.boost[0]), int(args.boost[1]))

    from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix
    from pgdrome_tpu.fem.mesh import IntervalMesh
    from pgdrome_tpu.fem.space import FunctionSpace
    from pgdrome_tpu.models.problems import parametric_elliptic
    from pgdrome_tpu.separated import precondition_dim0
    from pgdrome_tpu.uq import factor_stats, sobol_from_stats
    from pgdrome_tpu.utils.setup_cache import cached_setup

    z = np.load(args.state)
    K = int(z["n_modes"])
    modes = [np.asarray(z[f"m{d}"], np.float64)[:K]
             for d in range(1 + args.d)]
    log(f"state: rank {K}, dim0 {modes[0].shape[1]}, d={args.d}")

    # rebuild ONLY the dim-0 congruence transform (same cached key as
    # the frontier runs — the operator stacks come along but are free on
    # a cache hit)
    def _build():
        import warnings

        with warnings.catch_warnings():
            warnings.filterwarnings(
                "ignore", message=".*boundary_boost compounds.*"
            )
            sep64, _ = parametric_elliptic(
                n_x=args.n_x, n_p=args.n_p, num_params=args.d, degree_x=2,
                boundary_boost=tuple(args.boost),
            )
        return precondition_dim0(sep64, dtype=np.float64)

    t0 = time.perf_counter()
    (sep_pc64, tf), status = cached_setup(
        _build,
        key_data=["probe5_build_v1", args.n_x, args.n_p, args.d,
                  tuple(args.boost)],
        code_objects=(parametric_elliptic, stiffness_matrix, load_vector),
    )
    log(f"setup cache {status} ({time.perf_counter() - t0:.1f}s)")

    Vx = FunctionSpace(IntervalMesh(args.n_x, 0.0, 1.0), "P", 2)
    Vp = [FunctionSpace(IntervalMesh(args.n_p, 0.0, 1.0), "P", 1)
          for _ in range(args.d)]

    t0 = time.perf_counter()
    modes0 = tf.modes_to_full(modes[0])  # physical dim-0 dof values
    stats = factor_stats(Vp, modes[1:], K)

    # aggregated (generalized) indices over the spatial mass measure
    from pgdrome_tpu.fem.assembly import mass_matrix

    W = mass_matrix(Vx, sparse=True).tocsr()  # banded: O(nnz·R) product
    vol = float(np.sum(Vx.q_weights))
    B = modes0 @ (W @ modes0.T) / vol
    agg = sobol_from_stats(stats, out_gram=B, second_order=True)
    t_agg = time.perf_counter() - t0
    log(f"aggregated indices in {t_agg:.1f}s "
        f"(rank {K}, {args.d} params)")

    # per-point indices at requested sensor locations
    from pgdrome_tpu.fem.interpolate import eval_dofs_at_points

    pts = np.asarray(args.points, np.float64)
    table = np.stack([
        np.asarray(eval_dofs_at_points(Vx, modes0[k], pts))
        for k in range(K)
    ]).reshape(K, -1)
    pt = sobol_from_stats(stats, table=table)

    s2 = agg["second"]
    iu = np.triu_indices(args.d, 1)
    pair_vals = s2[iu]
    order = np.argsort(pair_vals)[::-1][:5]
    top_pairs = [
        {"pair": [int(iu[0][o]), int(iu[1][o])], "S2": float(pair_vals[o])}
        for o in order
    ]
    report = {
        "state": os.path.abspath(args.state),
        "rank": K,
        "num_params": args.d,
        "aggregated": {
            "variance": float(agg["variance"]),
            "first": [float(v) for v in agg["first"]],
            "total": [float(v) for v in agg["total"]],
            "first_sum": float(np.sum(agg["first"])),
            "interaction_share": float(1.0 - np.sum(agg["first"])),
            "top_pair_interactions": top_pairs,
        },
        "points": {
            "x": pts.tolist(),
            "mean": pt["mean"].tolist(),
            "variance": pt["variance"].tolist(),
            "first": pt["first"].tolist(),
            "total": pt["total"].tolist(),
        },
        "seconds": t_agg,
    }
    out = json.dumps(report)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
