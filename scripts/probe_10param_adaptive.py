"""Round-3 dimensionality-frontier probe: 10-parameter elliptic (an
11-dim separated tensor) driven by the ERROR-ADAPTIVE cascade.

Fixed-recipe findings that motivate this (see /tmp/p10*.jsonl history and
PERF.md round-3): at 10 params the boundary-boost measure compounds
per-dim, so no single boost level works end-to-end —

* beta=16 (beta^d = 1e12): greedy sees the corners but the interior
  drowns below the corner rows' f32 noise floor — corners stall ~6e-4
  (rhs_comp / more fp sweeps change nothing: the noise is in the gram
  sums, not the rhs contraction);
* beta=2.3 (beta^d = 4e3, the 3-param level): interior converges to
  ~2e-5 but corners sit at ~5e-3 — the corner REGION carries ~1e-12 of
  the measure mass, invisible to the greedy;
* beta=7 window (beta^d = 2.8e8, the 5-param window level): one 3.5x
  corner improvement, then flat — the per-dim boosted mass fraction
  (~0.45) still suppresses the all-extreme region by 0.45^10 ~ 3e-4.

The adaptive cascade alternates instead: STRONG-boost stages (beta=16 —
corner content, proven) only while corners bind, plain-base stages
(beta=4, beta^d ~ 1e6 = the proven 5-param base level) to repair the
interior, dd-rhs throughout, every stage verified vs per-sample banded
f64 FEM.  Each stage solves a RESCALED O(1) residual, so the beta=16
noise floor bites at the residual's scale (~current error), not at the
solution's — the alternation can pass the single-measure walls.

Usage:
  python scripts/probe_10param_adaptive.py \
      [--resume /tmp/p10f_state.npz] [--max-stages 8] [--budget 128]
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

NUM_PARAMS = 10  # --num-params overrides
N_X, N_P = 1024, 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(boost):
    from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix
    from pgdrome_tpu.models.problems import parametric_elliptic
    from pgdrome_tpu.separated import precondition_dim, precondition_dim0
    from pgdrome_tpu.utils.setup_cache import cached_setup

    def _build():
        sep64, _ = parametric_elliptic(
            n_x=N_X, n_p=N_P, num_params=NUM_PARAMS, degree_x=2,
            boundary_boost=boost,
        )
        sep_pc64, tf = precondition_dim0(sep64, dtype=np.float64)
        return sep_pc64, tf

    (sep_pc64, tf), status = cached_setup(
        _build,
        key_data=["probe5_build_v1", N_X, N_P, NUM_PARAMS, boost],
        code_objects=(parametric_elliptic, precondition_dim,
                      stiffness_matrix, load_vector),
    )
    log(f"setup cache {status} (boost {boost})")
    return sep_pc64, tf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", default=None,
                    help="npz state (scripts/probe_5param.py --save-state "
                    "format) to warm-start from")
    ap.add_argument("--num-params", type=int, default=10)
    ap.add_argument("--n-edge", type=int, default=0,
                    help="edge/face samples per seed in the per-stage "
                    "verification (boundary-bound steering sees them as "
                    "corner errors)")
    ap.add_argument("--max-stages", type=int, default=8)
    ap.add_argument("--budget", type=int, default=128)
    ap.add_argument("--bound", type=float, default=1e-6)
    ap.add_argument("--boost-margin", type=float, default=1.2)
    ap.add_argument("--base-boost", default="4,6")
    ap.add_argument("--window-boost", default="16,6")
    ap.add_argument("--corner-cap", type=int, default=64)
    ap.add_argument("--state-out", default="/tmp/p10_adaptive_state.npz")
    args = ap.parse_args()
    global NUM_PARAMS
    NUM_PARAMS = args.num_params

    import warnings

    warnings.filterwarnings("ignore", message=".*boundary_boost compounds.*")

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    from pgdrome_tpu.fem.mesh import IntervalMesh
    from pgdrome_tpu.fem.space import FunctionSpace
    from pgdrome_tpu.models.problems import elliptic_dense_verifier
    from pgdrome_tpu.recipes import adaptive_cascade
    from pgdrome_tpu.separated import PGDResult

    def parse_boost(s):
        b, q = s.split(",")
        return (float(b), int(q))

    sep_base, tf = build(parse_boost(args.base_boost))
    sep_boost, _ = build(parse_boost(args.window_boost))
    Vx = FunctionSpace(IntervalMesh(N_X, 0.0, 1.0), "P", 2)
    Vp = [FunctionSpace(IntervalMesh(N_P, 0.0, 1.0), "P", 1)
          for _ in range(NUM_PARAMS)]
    Vs = [Vx] + Vp

    init = None
    if args.resume:
        with np.load(args.resume) as z:
            init = PGDResult(
                modes=[z[f"m{d}"] for d in range(1 + NUM_PARAMS)],
                n_modes=int(z["n_modes"]),
                amplitudes=z["amplitudes"], alpha=z["alpha"],
                fp_its=z["fp_its"], normU0=float(z["normU0"]),
            )
        log(f"warm start: rank {init.n_modes} from {args.resume}")

    verify = elliptic_dense_verifier(
        Vs, tf, n_random=16, seeds=(7, 101, 1234, 777),
        corner_cap=args.corner_cap, n_edge=args.n_edge,
    )

    def checkpoint(stage_line, raw):
        print(json.dumps(stage_line), flush=True)
        arrs = {f"m{d}": np.asarray(raw.modes[d], dtype=np.float64)
                for d in range(1 + NUM_PARAMS)}
        np.savez(args.state_out, n_modes=raw.n_modes,
                 amplitudes=np.asarray(raw.amplitudes),
                 alpha=np.asarray(raw.alpha),
                 fp_its=np.asarray(raw.fp_its),
                 normU0=raw.normU0, stage=int(stage_line["stage"]), **arrs)

    t0 = time.perf_counter()
    best, history = adaptive_cascade(
        sep_base, verify, bound=args.bound, stage_budget=args.budget,
        max_stages=args.max_stages, boost_problem=sep_boost,
        boost_margin=args.boost_margin, rhs_comp=True,
        dtype=np.float32, log=log, init_result=init,
        checkpoint=checkpoint,
    )
    log(f"total {time.perf_counter()-t0:.1f}s; best max "
        f"{min(h['max'] for h in history):.3e} at rank {best.n_modes}")


if __name__ == "__main__":
    main()
