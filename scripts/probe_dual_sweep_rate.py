"""TPU rate + precision-floor measurement of the dual-corrected sensor
sweep (dual.make_corrected_sensor_fn) at the d=10 frontier scale:
primal rank 2688 × dual rank 768 × 11 affine terms.

Measures (1) corrected outputs/s on-device (the MXU contraction is
T·rz·ru ≈ 45 MFLOP/sample), (2) the device f32 floor vs the host f64
corrector on a held-out batch — the number that backs the device path's
precision design (per-mode pre-cancellation + dd z·b; see dual.py).

Usage: python scripts/probe_dual_sweep_rate.py [--b 65536] [--chunks 8]
Writes DUAL_SWEEP_RATE.json.
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
    ap.add_argument("--dual-state",
                    default="states/frontier_dual_d10_s0.npz")
    ap.add_argument("--x0", type=float, default=0.5)
    ap.add_argument("--b", type=int, default=65536)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--n-check", type=int, default=4096)
    ap.add_argument("--out", default="DUAL_SWEEP_RATE.json")
    ap.add_argument("--n-x", type=int, default=1024)
    ap.add_argument("--n-p", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()

    import jax

    from pgdrome_tpu.dual import (
        DualCorrector,
        adjoint_problem,
        make_corrected_sensor_fn,
        point_functional,
    )
    from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix
    from pgdrome_tpu.models.problems import parametric_elliptic
    from pgdrome_tpu.separated import (
        PGDResult,
        galerkin_update,
        precondition_dim0,
    )
    from pgdrome_tpu.utils.setup_cache import cached_setup

    d = args.d

    def build(boost):
        def _build():
            import warnings

            with warnings.catch_warnings():
                warnings.filterwarnings(
                    "ignore", message=".*boundary_boost compounds.*")
                sep64, _ = parametric_elliptic(
                    n_x=args.n_x, n_p=args.n_p, num_params=d,
                    degree_x=2, boundary_boost=boost)
            return precondition_dim0(sep64, dtype=np.float64)

        (sep_pc64, tf), status = cached_setup(
            _build,
            key_data=["probe5_build_v1", args.n_x, args.n_p, d, boost],
            code_objects=(parametric_elliptic, stiffness_matrix,
                          load_vector))
        return sep_pc64, tf

    sep_pc, tf_u = build((8.0, 6))
    sep_plain, Vs = parametric_elliptic(n_x=args.n_x, n_p=args.n_p,
                                        num_params=d, degree_x=2)

    def load_state(path):
        with np.load(path) as z:
            return PGDResult(
                modes=[z[f"m{dd}"] for dd in range(1 + d)],
                n_modes=int(z["n_modes"]),
                amplitudes=z["amplitudes"], alpha=z["alpha"],
                fp_its=z["fp_its"], normU0=float(z["normU0"]))

    res_u = galerkin_update(sep_pc, load_state(args.state))
    res_z_raw = load_state(args.dual_state)
    adj_pc, tf_z = precondition_dim0(
        adjoint_problem(sep_plain, point_functional(Vs[0], args.x0)),
        dtype=np.float64)
    res_z = galerkin_update(adj_pc, res_z_raw)
    log(f"primal rank {res_u.n_modes}, dual rank {res_z.n_modes}")

    l = point_functional(Vs[0], args.x0)
    t0 = time.perf_counter()
    dc = DualCorrector(sep_plain, Vs, l, res_u, tf_u, res_z, tf_z)
    log(f"reduced assembly: {time.perf_counter() - t0:.1f} s")

    fn = make_corrected_sensor_fn(dc)
    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    rng = np.random.default_rng(0)

    def batch(n):
        return grid[rng.integers(1, len(grid) - 1, size=(n, d))].astype(
            np.float32)

    # compile + warm
    t0 = time.perf_counter()
    s, sp = fn(batch(args.b))
    s.block_until_ready()
    first_s = time.perf_counter() - t0
    log(f"first call: {first_s:.1f} s")
    t0 = time.perf_counter()
    for _ in range(args.chunks):
        s, sp = fn(batch(args.b))
    s.block_until_ready()
    dt = time.perf_counter() - t0
    rate = args.b * args.chunks / dt
    log(f"corrected sweep: {rate:,.0f} outputs/s "
        f"({args.chunks}x{args.b} in {dt:.2f} s)")

    # device floor vs host f64 corrector
    chk = batch(args.n_check).astype(np.float64)
    s_dev, sp_dev = (np.asarray(a) for a in fn(chk.astype(np.float32)))
    s_host, sp_host, _ = dc.corrected(chk, return_parts=True)
    scale = np.abs(s_host).max()
    floor = np.abs(s_dev - s_host).max() / scale
    floor_plain = np.abs(sp_dev - sp_host).max() / scale
    log(f"device floor vs host f64: corrected {floor:.2e}, "
        f"plain {floor_plain:.2e} (relative to output scale)")

    report = {
        "primal_rank": int(res_u.n_modes),
        "dual_rank": int(res_z.n_modes), "d": d, "x0": args.x0,
        "outputs_per_s": int(rate), "batch": args.b,
        "chunks": args.chunks, "first_call_s": round(first_s, 1),
        "device_floor_rel": float(floor),
        "device_floor_plain_rel": float(floor_plain),
        "n_check": args.n_check,
        "flops_per_output": int(2 * dc.C.shape[0] * dc.C.shape[1]
                                * dc.C.shape[2]),
        "platform": jax.devices()[0].platform,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
