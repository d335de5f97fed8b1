"""Round-3 probe: what binds the two-stage minres transient at 2.5e-4?

PERF.md's at-scale table stops at two stages (128+64 -> 2.5-2.9e-4,
"the remaining error is the stage-2 correction's own f32 floor").  Two
candidate attacks, both cheap now:

  A. a third residual stage (extra_stages=(64,)) — another floor restart;
  B. compensated double-f32 rhs contraction in the residual stages
     (two_stage_minres(rhs_comp=True), ops/ddf32.py) — if the floor is
     the NE residual stack's cancellation (the elliptic-cascade
     mechanism), dd clears it without extra rank.

Verification: per-sample sparse space-time FOM solves (the
test_recipes.py harness at full 513x257 scale) over a (P, v) grid-point
set.  One JSON line per variant.

Usage: python scripts/probe_minres_floor.py [--variants base,extra,dd,dd_extra]
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

N_X, N_T, N_P, N_V = 512, 256, 32, 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(source_rank=160, sep_tol=1e-5):
    from pgdrome_tpu.models.problems import moving_heat_source
    from pgdrome_tpu.utils.separation import separate_hierarchical
    from pgdrome_tpu.utils.setup_cache import cached_setup

    def _build():
        return moving_heat_source(
            n_x=N_X, n_t=N_T, n_P=N_P, n_v=N_V, af=0.12,
            source_rank=source_rank, separation="hierarchical",
            separation_tol=sep_tol,
        )

    (sep, Vs, factors, sep_err), status = cached_setup(
        _build,
        key_data=["probe_minres_build_v1", N_X, N_T, N_P, N_V, 0.12,
                  source_rank, "hierarchical", sep_tol],
        code_objects=(moving_heat_source, separate_hierarchical),
    )
    log(f"setup cache {status}; separation floor {sep_err:.3e} "
        f"(source rank {source_rank})")
    return sep, Vs, factors, sep_err


def verify(sep, Vs, factors, res, samples, true_source=False):
    """Max relative L2 error vs per-sample sparse space-time FOM.

    ``true_source=True`` builds the FOM load from the EXACT Gaussian
    g(x − v·t) at the sample's grid (P, v) instead of the separated
    factors — the end-to-end error including the source-separation
    truncation, not just the solver error."""
    from scipy import sparse as sps
    from scipy.sparse import linalg as spla

    nx, nt = sep.sizes[0], sep.sizes[1]
    A = (sps.kron(sps.csr_matrix(np.asarray(sep.ops[0][0])),
                  sps.csr_matrix(np.asarray(sep.ops[1][0])))
         + sps.kron(sps.csr_matrix(np.asarray(sep.ops[0][1])),
                    sps.csr_matrix(np.asarray(sep.ops[1][1])))).tolil()
    ic_rows = [ix * nt for ix in range(nx)]
    for rr in ic_rows:
        A.rows[rr] = [rr]
        A.data[rr] = [1.0]
    A = A.tocsr()
    lu = spla.splu(A.tocsc())
    Mx = np.asarray(sep.mass[0])
    Mt = np.asarray(sep.ops[1][1])
    MxF = np.asarray(factors[0]) @ Mx.T   # (R, nx)
    MtF = np.asarray(factors[1]) @ Mt.T   # (R, nt)
    x_grid = Vs[0].tabulate_dof_coordinates()[:, 0]
    t_grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    v_grid = Vs[3].tabulate_dof_coordinates()[:, 0]
    K = res.n_modes
    m0 = np.asarray(res.modes[0], dtype=np.float64)[:K]
    m1 = np.asarray(res.modes[1], dtype=np.float64)[:K]
    errs = []
    for ip, iv in samples:
        P_val = Vs[2].tabulate_dof_coordinates()[ip, 0]
        if true_source:
            g = np.exp(
                -((x_grid[:, None] - 0.15 - v_grid[iv] * t_grid[None, :])
                  ** 2) / 0.12 ** 2
            )
            b = P_val * (Mx @ g @ Mt.T).ravel()
        else:
            w = P_val * np.asarray(factors[2])[:, iv]       # (R,)
            b = np.einsum("r,ri,rj->ij", w, MxF, MtF).ravel()
        b[ic_rows] = 0.0
        u_fom = lu.solve(b).reshape(nx, nt)
        fac = (np.asarray(res.modes[2], dtype=np.float64)[:K, ip]
               * np.asarray(res.modes[3], dtype=np.float64)[:K, iv])
        u = np.einsum("k,ki,kj->ij", fac, m0, m1)
        errs.append(np.linalg.norm(u - u_fom) / np.linalg.norm(u_fom))
    return float(np.max(errs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,extra,dd,dd_extra")
    ap.add_argument("--fp-cap", type=int, default=50)
    ap.add_argument("--source-rank", type=int, default=160,
                    help="hierarchical source-separation rank (160 -> "
                    "3.6e-5 floor; 256 @tol 1e-7 -> 5.0e-7 — the floor "
                    "binds once the cascade passes ~3e-5)")
    ap.add_argument("--sep-tol", type=float, default=1e-5,
                    help="separation SVD truncation tol (builder default "
                    "1e-5 caps rank-256 at 2.7e-5; 1e-7 reaches 5.0e-7)")
    ap.add_argument("--stages", default=None,
                    help="explicit comma budgets (e.g. 128,64,64,64,64,"
                    "64) — overrides --variants with one custom run")
    ap.add_argument("--stages-rhs-comp", action="store_true",
                    help="with --stages: rhs_comp in the residual stages")
    args = ap.parse_args()

    import pgdrome_tpu.config as cfg

    cfg.use_full_f32_matmul()
    from pgdrome_tpu.recipes import two_stage_minres

    sep, Vs, factors, sep_err = build(args.source_rank, args.sep_tol)
    # (P, v) verification set: corners + center of the parameter grid
    samples = [(1, 1), (1, N_V - 2), (N_P - 2, 1), (N_P - 2, N_V - 2),
               (N_P // 2, N_V // 2)]
    variants = {
        "base": dict(extra_stages=(), rhs_comp=False),
        "extra": dict(extra_stages=(64,), rhs_comp=False),
        "extra2": dict(extra_stages=(64, 64), rhs_comp=False),
        "extra3": dict(extra_stages=(64, 64, 64), rhs_comp=False),
        "dd": dict(extra_stages=(), rhs_comp=True),
        "dd_extra": dict(extra_stages=(64,), rhs_comp=True),
    }
    runs = args.variants.split(",")
    if args.stages:
        budgets = [int(b) for b in args.stages.split(",")]
        variants = {"custom": dict(extra_stages=tuple(budgets[2:]),
                                   rhs_comp=args.stages_rhs_comp,
                                   _b1=budgets[0], _b2=budgets[1])}
        runs = ["custom"]
    for name in runs:
        kw = dict(variants[name])
        b1 = kw.pop("_b1", 128)
        b2 = kw.pop("_b2", 64)
        t0 = time.perf_counter()
        res = two_stage_minres(sep, n_stage1=b1, n_stage2=b2,
                               max_fp_it=args.fp_cap, **kw)
        t_solve = time.perf_counter() - t0
        t0 = time.perf_counter()
        mx = verify(sep, Vs, factors, res, samples)
        mx_true = verify(sep, Vs, factors, res, samples, true_source=True)
        print(json.dumps({
            "variant": name, "rank": int(res.n_modes),
            "max_rel_err": f"{mx:.3e}",
            "max_rel_err_true_source": f"{mx_true:.3e}",
            "sep_floor": f"{sep_err:.3e}",
            "solve_s": round(t_solve, 2),
            "verify_s": round(time.perf_counter() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
