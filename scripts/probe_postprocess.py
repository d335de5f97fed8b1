"""Probe: the bench postprocess split (CP-ALS compression vs Galerkin)
and whether fewer ALS iterations keep the 1e-6 bound.

The round-3 bench spends ~0.48 s in "postprocess" (compress 160->50 +
galerkin) — the largest single chunk of the 1.7 s headline.  This probe
replays the (fully AOT/setup-cached) three-stage pipeline once, then
re-runs ONLY the postprocess at several ALS iteration counts, timing the
compression and the Galerkin update separately and dense-verifying each
variant (8 corners + 3 seeds x 64).

Usage: python scripts/probe_postprocess.py [--iters 20,12,8,5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # reuse the bench pipeline (functions are importable)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", default="20,12,8,5")
    ap.add_argument("--jacobian-rate", action="store_true",
                    help="also measure the sensors_jacobian serving rate "
                    "at bench scale (8 points, streamed depth-2)")
    args = ap.parse_args()

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    from pgdrome_tpu.separated import (
        combine_results,
        compress_modes,
        galerkin_update,
        residual_problem,
    )

    sep_pc64, tf, Vs, meta, _, _ = bench.build()
    res0, *_ = bench.tpu_solve(sep_pc64)
    for tag, budget in (("stage2", bench.N_MODES_STAGE2),
                        ("stage3", bench.N_MODES_STAGE3)):
        sep_res, s_res = residual_problem(sep_pc64, res0)
        delta, *_ = bench.tpu_solve(
            sep_res, n_max=budget, tag=tag, tol_fp=1e-5, max_fp_it=8
        )
        res0 = combine_results(res0, delta, s_res)
    n_solved = int(res0.n_modes)
    mass_c = [np.asarray(sep_pc64.mass[0])] + [
        np.asarray(sep_pc64.ops[j][0]) for j in range(1, 1 + bench.NUM_PARAMS)
    ]
    for n_iters in (int(i) for i in args.iters.split(",")):
        t0 = time.perf_counter()
        res_c = compress_modes(res0, mass_c, bench.N_MODES, n_iters=n_iters)
        t_comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        res_g = galerkin_update(sep_pc64, res_c)
        t_gal = time.perf_counter() - t0
        max_err, per_seed = bench.verify(Vs, res_g, tf)
        print(json.dumps({
            "n_iters": n_iters,
            "compress_s": round(t_comp, 3),
            "galerkin_s": round(t_gal, 3),
            "max_err": f"{max_err:.3e}",
            "per_seed": {str(k): f"{v:.3e}" for k, v in per_seed.items()},
            "rank": f"{n_solved}->{res_g.n_modes}",
        }), flush=True)

    if args.jacobian_rate:
        import jax.numpy as jnp

        from pgdrome_tpu.separated import PGDResult
        from pgdrome_tpu.serving import Vademecum, _stream_pipeline

        res_c = compress_modes(res0, mass_c, bench.N_MODES, n_iters=20)
        res_g = galerkin_update(sep_pc64, res_c)
        full0 = tf.modes_to_full(np.asarray(res_g.modes[0])).astype(
            np.float32
        )
        res_srv = PGDResult(
            modes=[full0] + [np.asarray(m, np.float32)
                             for m in res_g.modes[1:]],
            n_modes=res_g.n_modes,
            amplitudes=np.asarray(res_g.amplitudes),
            alpha=np.asarray(res_g.alpha), fp_its=np.asarray(res_g.fp_its),
        )
        vd = Vademecum(Vs, res_srv)
        pts = np.linspace(0.1, 0.9, 8)
        jac = vd.sensors_jacobian(pts)
        rng = np.random.default_rng(3)
        n_chunk = 4 * 524_288
        big = jnp.asarray(rng.uniform(
            0.02, 0.98, size=(4 * n_chunk, bench.NUM_PARAMS)
        ).astype(np.float32))
        _stream_pipeline(jac, big[: 2 * n_chunk], n_chunk, 2,
                         lambda y: None)  # compile + warm
        dt = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            _stream_pipeline(jac, big, n_chunk, 2, lambda y: None)
            dt = min(dt, time.perf_counter() - t0)
        print(json.dumps({
            "jacobian_samples_per_s": round(big.shape[0] / dt),
            "points": 8, "params": bench.NUM_PARAMS,
            "chunk": n_chunk,
        }), flush=True)


if __name__ == "__main__":
    main()
