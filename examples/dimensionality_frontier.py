"""Dimensionality frontier: one call from operators to a VERIFIED
uniform bound at parameter counts the reference could never reach.

The core scientific claim of PGD is dimensionality separation
(reference solver.py:538-724: the enrichment loop never forms the full
tensor).  In practice the hard part at high d is not the solve — it is
certifying a UNIFORM bound: the parameter-box corners carry high-order
parameter interactions that a global-L2 greedy never sees (measured
walls in PERF.md "Dimensionality frontier").  `recipes.highd_frontier`
packages the full measured discipline:

* balanced base measure (per-dim boundary mass ~ interior) so the
  Galerkin refit keeps corner content,
* boost-window stages only while corners bind, corner-SEEDED fixed
  points (the ones init has ~(1/n_p)^(d-1) corner overlap),
* compensated double-f32 rhs in the cancellation-bound region,
* verification by per-sample float64 FEM: every 2^d corner below 8
  params; above, a residual screener ranks all corners + thousands of
  edge candidates and the worst are FEM-measured, with the calibrated
  remainder reported as an ESTIMATE, clearly audited.

Full-scale artifacts shipped with the repo (scripts/run_frontier.py):
FRONTIER_d7.json — d=7, rank 3840, max 9.87e-7 over ALL 128 corners
(FEM) + edges + interior; FRONTIER_d10.json — the d=10 state of the
art with its measured error-vs-rank history.

This demo runs d=3 (a 4-dimensional separated tensor) at reduced scale
and verifies 1e-5 uniformly — all 8 corners + edges + multi-seed
interior against per-sample f64 FEM.  (Higher d at full scale is the
same one call with a bigger budget — see scripts/run_frontier.py and
the shipped artifacts.)

Run: python examples/dimensionality_frontier.py  (~2-4 min on CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # CPU demo; drop for TPU

import pgdrome_tpu.config as cfg

cfg.use_full_f32_matmul()  # accuracy demo: no bf16 matmuls

from pgdrome_tpu.recipes import highd_frontier


def main():
    best, report = highd_frontier(
        3,                    # parameters -> 4-dim separated tensor
        bound=1e-5,
        n_x=128, n_p=32,      # reduced scale for the CPU demo
        n_stage1=32, stage_budget=24, max_stages=8,
        # round-5 headline: the anchored-ANOVA start (exact per-grid-
        # point solves for mean + axes + pairs) — at d=10 this broke
        # the measured rank^-1.55 wall (FRONTIER_ANOVA_d10.json:
        # 5.75e-6 at rank 1309 where flat extrapolated rank ~19k)
        anova_order=2,
        log=lambda *a: print(*a, file=sys.stderr, flush=True),
    )
    if report.get("anova"):
        print(f"anova init: rank {report['anova']['rank']} "
              f"(order {report['anova']['order']})", file=sys.stderr)

    v = report["verified"]
    print(f"\nrank {report['rank']} vademecum over "
          f"{report['num_params']} parameters")
    print(f"verified max rel. error {v['max']:.3e} "
          f"(all {v['corners_fem_n']} corners FEM-measured: "
          f"{v['corners_fem_max']:.3e}, interior {v['interior_fem_max']:.3e})")
    print("error-vs-rank law:")
    for h in report["history"]:
        tags = "".join(
            t for t, on in ((" [boost]", h["boosted"]),
                            (" [seeded]", h["seeded"]),
                            (" [dd]", h["rhs_comp"])) if on
        )
        print(f"  stage {int(h['stage']):2d} rank {int(h['rank']):4d} "
              f"corners {h['corners']:.2e} interior {h['interior']:.2e}"
              + tags)
    assert v["max"] < 1e-5
    print("OK: uniform 1e-5 certified (corner-inclusive, per-sample f64 FEM)")


if __name__ == "__main__":
    main()
