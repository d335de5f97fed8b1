"""Minimal-residual PGD for a non-symmetric transient problem.

A moving heat source on a 1D bar, separated as x ⊗ t ⊗ P ⊗ v (space,
time, source power, source velocity).  The upwind time operator makes the
problem non-symmetric, so greedy Galerkin PGD has no minimization
principle and converges slowly; the minimal-residual formulation (normal
equations, reference-free — see pgdrome_tpu/separated.py normal_equations)
minimizes the true residual monotonically.

The normal equations square the per-dim conditioning, so the per-dim
solves use the exact 'chol' solver instead of fixed-iteration CG.

Run: python examples/minres_transient.py       (CPU or TPU; ~1 min on CPU)
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

import jax

if not os.environ.get("PGDROME_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")  # TPU opt-in via env

import numpy as np

import pgdrome_tpu.config as cfg

cfg.use_full_f32_matmul()

from pgdrome_tpu.models.problems import moving_heat_source
from pgdrome_tpu.separated import (
    PGDResult,
    SeparatedPGD,
    ne_dim_base,
    normal_equations,
    precondition_dim,
    evaluate_modes_1d,
)


def main():
    sep, Vs, factors, sep_err = moving_heat_source(
        n_x=60, n_t=40, n_P=6, n_v=8, af=0.12, source_rank=40
    )
    print(f"source separation error: {sep_err:.2e}")

    # Galerkin (plain) vs minimal-residual (normal equations + chol).
    # On this non-symmetric operator the Galerkin fixed point STALLS after
    # a few modes (a vanishing mode trips the noise-floor stop) — that is
    # the point of this example: greedy Galerkin has no minimization
    # principle here, minres does.
    res_gal = SeparatedPGD(sep, n_max=60, tol=0.0, tol_fp=1e-7).solve()

    ne = normal_equations(sep)
    # the f32-stable recipe (required at scale, e.g. n_t=257 — see
    # PERF.md): congruence-precondition BOTH big dims with the diag-sum
    # base Σ_t O_tᵀO_t (the ne stack's first entry alone can be the
    # weakest term), and renormalize factors mid-sweep (renorm_sweep) so
    # the cross-dim Gram coefficients stay O(1)
    ne32, tf = precondition_dim(ne, dim=0, dtype=np.float32,
                                base=ne_dim_base(sep, 0))
    ne32, tft = precondition_dim(ne32, dim=1, dtype=np.float32,
                                 base=ne_dim_base(sep, 1))
    res_mr = SeparatedPGD(
        ne32, n_max=60, tol=0.0, tol_fp=1e-6, solver="chol",
        residual_check=False, renorm_sweep=True,
    ).solve_fused()
    # back-transform the two congruence dims to nodal bases for evaluation
    res_mr = PGDResult(
        modes=[tf.modes_to_full(res_mr.modes[0]),
               tft.modes_to_full(res_mr.modes[1])] + list(res_mr.modes[2:]),
        n_modes=res_mr.n_modes, amplitudes=res_mr.amplitudes,
        alpha=res_mr.alpha, fp_its=res_mr.fp_its, normU0=res_mr.normU0,
    )

    # evaluate both at a probe (t, P, v) and compare against a direct solve
    from scipy import sparse as sps
    from scipy.sparse import linalg as spla

    P_val = Vs[2].tabulate_dof_coordinates()[3, 0]
    v_idx = 4
    v_val = Vs[3].tabulate_dof_coordinates()[v_idx, 0]
    nx, nt = sep.sizes[0], sep.sizes[1]
    Mx = np.asarray(sep.mass[0])
    Mt = np.asarray(sep.ops[1][1])
    A = sum(
        sps.kron(sps.csr_matrix(np.asarray(sep.ops[0][i])), sps.csr_matrix(np.asarray(sep.ops[1][i])))
        for i in range(2)
    ).tolil()
    b = sum(
        np.kron(
            P_val * factors[2][r][v_idx] * (Mx @ factors[0][r]),
            Mt @ factors[1][r],
        )
        for r in range(factors[0].shape[0])
    )
    for ix in range(nx):  # initial condition rows (t=0)
        r = ix * nt
        A.rows[r] = [r]
        A.data[r] = [1.0]
        b[r] = 0.0
    u_direct = spla.spsolve(A.tocsr(), b).reshape(nx, nt)

    t_idx = nt - 5
    t_val = Vs[1].tabulate_dof_coordinates()[t_idx, 0]

    def reconstruct(res, modes0_full):
        fac = np.ones(res.n_modes)
        for j, val in [(1, t_val), (2, P_val), (3, v_val)]:
            vals = np.asarray(
                evaluate_modes_1d(Vs[j], res.modes[j], np.asarray([val]), xp=np)
            )[0]
            fac *= vals[: res.n_modes]
        return fac @ np.asarray(modes0_full)[: res.n_modes]

    ref = u_direct[:, t_idx]
    for name, res, m0 in [
        ("galerkin ", res_gal, res_gal.modes[0]),
        ("minres   ", res_mr, res_mr.modes[0]),
    ]:
        u = reconstruct(res, m0)
        err = np.linalg.norm(u - ref) / np.linalg.norm(ref)
        note = " (stalled)" if res.n_modes < 10 else ""
        print(f"{name}: {res.n_modes} modes, rel err at probe {err:.3e}{note}")


if __name__ == "__main__":
    main()
