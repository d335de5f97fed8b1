"""Two-stage PGD with boundary-boosted collocation: sub-1e-6 at the
parameter-box corners.

A plain global-L2 greedy underweights corner-localized error by
~(1/n_p)^(d/2), and f32 enrichment floors at ~1e-7 relative amplitudes.
This example shows the round-2 recipe on a mid-scale problem:

1. collocation parameter operators (the converged vademecum equals the
   per-sample FEM exactly at every grid point),
2. boundary-boosted measure (re-aims greedy at the corners; the weights
   cancel per grid point so the solution is unchanged),
3. stage-1 greedy + two-stage residual re-solve (f64-exact rhs rescaled
   to O(1) restarts the f32 floor),
4. corner-weighted CP-ALS compression + Galerkin coefficients.

Run: python examples/two_stage_corners.py  (~1 min on CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # CPU demo; drop for TPU
jax.config.update("jax_enable_x64", True)

from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import (
    SeparatedPGD,
    combine_results,
    compress_modes,
    evaluate_modes_1d,
    galerkin_update,
    residual_problem,
)
from pgdrome_tpu.fem.assembly import stiffness_matrix, load_vector
from pgdrome_tpu.fem.bc import DirichletBC

NP = 2
sep, Vs = parametric_elliptic(
    n_x=96, n_p=32, num_params=NP, boundary_boost=(16.0, 6)
)

# stage 1: greedy enrichment
base = SeparatedPGD(sep, n_max=24, tol=0.0, tol_fp=1e-8,
                    residual_check=False).solve()

# stage 2: re-solve the f64-exact, rescaled residual
sep_res, s = residual_problem(sep, base)
delta = SeparatedPGD(sep_res, n_max=12, tol=0.0, tol_fp=1e-6,
                     max_fp_it=10, residual_check=False).solve()
combined = combine_results(base, delta, s)

# deploy at rank 20: corner-weighted compression + Galerkin coefficients
mass_c = [np.asarray(sep.mass[0])] + [
    np.asarray(sep.ops[j][0]) for j in range(1, 1 + NP)
]
deployed = galerkin_update(sep, compress_modes(combined, mass_c, 20))

# check the corners against per-sample FEM
grid = Vs[1].tabulate_dof_coordinates()[:, 0]
lo, hi = grid[1], grid[-2]
corners = [(a, b) for a in (lo, hi) for b in (lo, hi)]


def fem_at(p):
    kappa = lambda x: 1.0 + sum(
        p[i] * np.sin((i + 1) * np.pi * x) ** 2 / (2 * NP) for i in range(NP)
    )
    K = stiffness_matrix(Vs[0], weight=kappa)
    b = load_vector(Vs[0], lambda x: np.ones_like(x))
    A2, b2 = DirichletBC(Vs[0], 0.0, lambda x, onb: onb).apply_system(K, b)
    return np.linalg.solve(A2, b2)


def pgd_at(r, p):
    fac = np.ones(r.n_modes)
    for j, pj in enumerate(p):
        v = np.asarray(
            evaluate_modes_1d(Vs[1 + j], r.modes[1 + j], np.asarray([pj]), xp=np)
        )[0]
        fac *= v[: r.n_modes]
    return fac @ np.asarray(r.modes[0])[: r.n_modes]


for tag, r in (("stage-1 only (rank 24)", galerkin_update(sep, base)),
               ("two-stage deployed (rank 20)", deployed)):
    errs = []
    for p in corners:
        u_ref = fem_at(p)
        u = pgd_at(r, p)
        errs.append(np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref))
    print(f"{tag}: worst corner rel-L2 = {max(errs):.3e}")
