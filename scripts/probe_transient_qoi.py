"""Bench-scale measurement of the exact rhs-parametric output surrogate
(dual.rhs_parametric_qoi) on the transient moving-heat-source flagship:
one backward space-time adjoint solve per sensor, then closed-form
outputs verified against the TRUE-Gaussian-source FOM (the honest
end-to-end number, including the source-separation truncation).

Usage: python scripts/probe_transient_qoi.py [--n-x 512 --n-t 256
    --n-P 32 --n-v 64 --source-rank 256 --sep-tol 1e-7]
Writes TRANSIENT_QOI.json.  Host-only (numpy/scipy f64): no TPU, no jax.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-x", type=int, default=512)
    ap.add_argument("--n-t", type=int, default=256)
    ap.add_argument("--n-P", type=int, default=32)
    ap.add_argument("--n-v", type=int, default=64)
    ap.add_argument("--source-rank", type=int, default=256)
    ap.add_argument("--sep-tol", type=float, default=1e-7)
    ap.add_argument("--sensors", type=float, nargs="+",
                    default=[0.55, 0.8, 0.3, 0.5, 0.85, 0.95],
                    help="flat (x, t) pairs")
    ap.add_argument("--n-random", type=int, default=12)
    ap.add_argument("--out", default="TRANSIENT_QOI.json")
    args = ap.parse_args()

    from scipy import sparse as sps
    from scipy.sparse import linalg as spla

    from pgdrome_tpu.dual import point_functional, rhs_parametric_qoi
    from pgdrome_tpu.models.problems import moving_heat_source

    sensors = [(args.sensors[2 * i], args.sensors[2 * i + 1])
               for i in range(len(args.sensors) // 2)]

    t0 = time.perf_counter()
    sep, Vs, factors, sep_err = moving_heat_source(
        n_x=args.n_x, n_t=args.n_t, n_P=args.n_P, n_v=args.n_v,
        source_rank=args.source_rank, separation="hierarchical",
        separation_tol=args.sep_tol)
    build_s = time.perf_counter() - t0
    log(f"problem built in {build_s:.1f} s, separation floor {sep_err:.2e}")

    t0 = time.perf_counter()
    qoi = rhs_parametric_qoi(sep, Vs, sensors)
    adjoint_s = time.perf_counter() - t0
    log(f"adjoint solves + reduction: {adjoint_s:.1f} s "
        f"({len(sensors)} sensors, R={qoi.weights.shape[1]})")

    # serving rate of the closed form (host numpy)
    rng = np.random.default_rng(0)
    P_grid = Vs[2].tabulate_dof_coordinates()[:, 0]
    v_grid = Vs[3].tabulate_dof_coordinates()[:, 0]
    big = np.stack([rng.uniform(P_grid[0], P_grid[-1], size=200_000),
                    rng.uniform(v_grid[0], v_grid[-1], size=200_000)], 1)
    t0 = time.perf_counter()
    _ = qoi(big)
    rate = big.shape[0] * len(sensors) / (time.perf_counter() - t0)
    log(f"closed-form serving: {rate:,.0f} outputs/s (host, 1 core)")

    # TRUE-source FOM verification
    t0 = time.perf_counter()
    nx, nt = sep.sizes[0], sep.sizes[1]
    ops0 = np.asarray(sep.ops[0], dtype=np.float64)
    ops1 = np.asarray(sep.ops[1], dtype=np.float64)
    A = sum(sps.kron(sps.csr_matrix(ops0[t]), sps.csr_matrix(ops1[t]))
            for t in range(ops0.shape[0])).tolil()
    ic = [ix * nt for ix in range(nx)]
    for rr in ic:
        A.rows[rr] = [rr]
        A.data[rr] = [1.0]
    lu = spla.splu(A.tocsr().tocsc())
    fom_lu_s = time.perf_counter() - t0
    log(f"FOM LU: {fom_lu_s:.1f} s")

    Mx = np.asarray(sep.mass[0], dtype=np.float64)
    Mt = np.asarray(sep.ops[1][1], dtype=np.float64)
    x = Vs[0].tabulate_dof_coordinates()[:, 0]
    tg = Vs[1].tabulate_dof_coordinates()[:, 0]
    ls = [np.kron(point_functional(Vs[0], x0), point_functional(Vs[1], t1))
          for x0, t1 in sensors]

    n_P, n_v = len(P_grid), len(v_grid)
    pairs = [(0, 0), (0, n_v - 1), (n_P - 1, 0), (n_P - 1, n_v - 1)]
    pairs += [(int(rng.integers(1, n_P - 1)), int(rng.integers(1, n_v - 1)))
              for _ in range(args.n_random)]
    samples = np.array([[P_grid[i], v_grid[j]] for i, j in pairs])
    t0 = time.perf_counter()
    s = qoi(samples)
    errs = np.zeros_like(s)
    s_true = np.zeros_like(s)
    for k, (ip, iv) in enumerate(pairs):
        g = np.exp(-((x[:, None] - 0.15 - v_grid[iv] * tg[None, :]) ** 2)
                   / 0.08 ** 2)
        b = P_grid[ip] * (Mx @ g @ Mt.T).ravel()
        b[ic] = 0.0
        u = lu.solve(b)
        for j, l in enumerate(ls):
            s_true[k, j] = l @ u
            errs[k, j] = abs(s[k, j] - s_true[k, j])
    verify_s = time.perf_counter() - t0
    scale = np.abs(s_true).max(axis=0)
    rel = errs / scale[None, :]
    log(f"verification ({len(pairs)} FOM solves): {verify_s:.1f} s")
    report = {
        "config": {k: getattr(args, k.replace('-', '_')) for k in
                   ("n_x", "n_t", "n_P", "n_v", "source_rank", "sep_tol")},
        "sensors": sensors,
        "separation_floor": float(sep_err),
        "rel_err_max": float(rel.max()),
        "rel_err_per_sensor": [float(r) for r in rel.max(axis=0)],
        "corners_rel_max": float(rel[:4].max()),
        "output_scale_per_sensor": [float(v) for v in scale],
        "n_verify": len(pairs),
        "build_s": round(build_s, 1),
        "adjoint_s": round(adjoint_s, 1),
        "fom_lu_s": round(fom_lu_s, 1),
        "verify_s": round(verify_s, 1),
        "serving_outputs_per_s": int(rate),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("rel_err_max", "corners_rel_max",
                       "separation_floor", "adjoint_s",
                       "serving_outputs_per_s")}), flush=True)


if __name__ == "__main__":
    main()
