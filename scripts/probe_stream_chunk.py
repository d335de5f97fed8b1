"""Round-3 probe: fields_stream chunk sizing vs the ~40 ms tunnel
dispatch floor (VERDICT #5 — serve within 1.2x of the marginal rate).

Theory from the measured numbers: the axon tunnel costs ~40 ms of HOST
time per dispatch (serial enqueue — pipeline depth cannot hide it), so
the stream rate ceils at chunk/40ms regardless of depth until the
per-chunk device compute exceeds the enqueue cost.  At the measured
marginal 17.5 M fields/s that crossover is ~700k samples/chunk; HBM
bounds the chunk at ~16GB/2/8.2KB ≈ 950k (two live outputs, drain-
before-dispatch).  This probe measures the actual rate at several
chunk sizes to pick the shipped default.

Usage: python scripts/probe_stream_chunk.py [--chunks 524288,655360,786432]
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
    ap.add_argument("--chunks", default="524288,655360,786432")
    ap.add_argument("--total", type=int, default=2 * 1024 * 1024)
    args = ap.parse_args()
    chunks = [int(c) for c in args.chunks.split(",")]

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    import bench
    import jax
    import jax.numpy as jnp

    from pgdrome_tpu.separated import PGDResult, galerkin_update
    from pgdrome_tpu.serving import Vademecum

    sep_pc64, tf, Vs, meta, *_ = bench.build()
    res, *_ = bench.tpu_solve(sep_pc64)
    res = galerkin_update(sep_pc64, res)
    full0 = jnp.asarray(
        tf.modes_to_full(res.modes[0]).astype(np.float32)
    )
    modes = [full0] + [jnp.asarray(m) for m in res.modes[1:]]
    res_full = PGDResult(
        modes=modes, n_modes=res.n_modes,
        amplitudes=np.asarray(res.amplitudes),
        alpha=np.asarray(res.alpha), fp_its=np.asarray(res.fp_its),
    )
    vd = Vademecum(Vs, res_full)
    rng = np.random.default_rng(3)
    big = jnp.asarray(
        rng.uniform(0.02, 0.98, size=(args.total, bench.NUM_PARAMS)).astype(
            np.float32
        )
    )
    for chunk in chunks:
        try:
            # warm/compile this chunk shape
            vd.fields_stream(big[: 2 * chunk], consumer=lambda y: None,
                             chunk=chunk, depth=2)
            dt = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                vd.fields_stream(big, consumer=lambda y: None, chunk=chunk,
                                 depth=2)
                dt = min(dt, time.perf_counter() - t0)
            rate = args.total / dt
            print(json.dumps({
                "chunk": chunk, "total": args.total,
                "best_s": round(dt, 4), "fields_per_s": round(rate),
                "ms_per_chunk": round(dt / (args.total / chunk) * 1e3, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"chunk": chunk, "error": str(e)}), flush=True)


if __name__ == "__main__":
    main()
