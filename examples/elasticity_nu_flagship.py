"""The reference's flagship problem on the TPU fast path.

2D plane-strain elasticity u((x,y), λp, λE, ν) with Poisson's ratio as a
separated coordinate — the hardest integration case of the reference
(test_solver_problem.py:552-568): the elasticity tensor separates as

    C(ν) = f1(ν)·C1 + f2(ν)·C2,
    f1 = 1/(2(1+ν)(1−2ν)),  f2 = 1/(2(1+ν))

and the rational coefficients enter as collocation (diagonal) parameter
operators, so the converged vademecum equals fixed-ν FEM exactly at the
grid points.  Two solves are shown: the f64 host path (reference-parity
semantics) and the f32 two-stage TPU recipe (congruence preconditioning
with the SPD term sum + f64-exact residual restart).

Run: python examples/elasticity_nu_flagship.py   (CPU, ~1 min)
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")  # the axon plugin ignores env vars
jax.config.update("jax_enable_x64", True)

import numpy as np

from pgdrome_tpu.models.problems import elasticity_vademecum, _nu_f1, _nu_f2
from pgdrome_tpu.separated import (
    SeparatedPGD,
    combine_results,
    evaluate_modes_1d,
    galerkin_update,
    precondition_dim,
    residual_problem,
)


def main():
    sep, Vs, (parts, bL, bR) = elasticity_vademecum(
        nx=10, ny=4, n_p=8, n_E=8, n_nu=10, degree=2,
        param_discretization="collocation",
    )
    print(f"flagship 4-dim problem: {sep.sizes[0]} space dofs x "
          f"{sep.sizes[1]}x{sep.sizes[2]}x{sep.sizes[3]} parameter grid")

    # --- reference-parity f64 solve
    res64 = SeparatedPGD(sep, n_max=8, tol=1e-12, tol_fp=1e-9,
                         max_fp_it=100).solve(verbose=True)

    # --- TPU recipe: f32 + congruence preconditioning + residual restart
    K1 = np.asarray(sep.ops[0][0])
    K2 = np.asarray(sep.ops[0][1])
    sep_pc, tf = precondition_dim(sep, dim=0, dtype=np.float64,
                                  base=K1 + K2)
    kw = dict(tol=0.0, tol_fp=1e-6, max_fp_it=40, dtype=np.float32,
              solver="cg", cg_iters=30, residual_check=False)
    res = SeparatedPGD(sep_pc, n_max=10, **kw).solve_fused()
    sep_res, s_res = residual_problem(sep_pc, res)
    delta = SeparatedPGD(sep_res, n_max=8, **kw).solve_fused()
    res = galerkin_update(sep_pc, combine_results(res, delta, s_res))
    full0 = tf.modes_to_full(res.modes[0])

    # compare both against per-grid-point FEM at one sample
    from pgdrome_tpu.fem.assembly import mass_matrix

    w_p = np.diagonal(np.asarray(sep.ops[1][0]))
    p_eff = np.asarray(sep.rhs[1][0]) / w_p
    w_E = mass_matrix(Vs[2]).sum(axis=1)
    E_eff = np.diagonal(np.asarray(sep.ops[2][0])) / w_E
    grids = [Vs[d].tabulate_dof_coordinates()[:, 0] for d in (1, 2, 3)]
    a, b_i, c = 3, 2, 4
    mask = np.asarray(sep.bc_masks[0], dtype=np.float64)
    K = E_eff[b_i] * (_nu_f1(grids[2][c]) * K1 + _nu_f2(grids[2][c]) * K2)
    A = K * mask[:, None] * mask[None, :] + np.diag(1.0 - mask)
    u_ref = np.linalg.solve(A, p_eff[a] * (bL + bR) * mask)

    for name, modes0, r in (("f64 greedy", np.asarray(res64.modes[0]), res64),
                            ("f32 two-stage", full0, res)):
        fac = np.ones(r.n_modes)
        for j, val in enumerate((grids[0][a], grids[1][b_i], grids[2][c])):
            v = np.asarray(evaluate_modes_1d(
                Vs[1 + j], r.modes[1 + j], np.asarray([val]), xp=np))[0]
            fac *= v[: r.n_modes].astype(np.float64)
        u = fac @ np.asarray(modes0, dtype=np.float64)[: r.n_modes]
        err = np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)
        print(f"{name}: {r.n_modes} modes, rel error vs per-sample FEM "
              f"{err:.2e}")


if __name__ == "__main__":
    main()
