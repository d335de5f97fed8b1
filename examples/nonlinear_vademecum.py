"""Nonlinear parametric vademecum: −∇·(κ(x;p)∇u) + ε·u³ = f.

The nonlinear counterpart of the elliptic flagship (reference nonlinear
path: FP_solve _problem='nonlinear', reference solver.py:579-595 — one
dolfin Newton re-assembly per fixed-point sweep).  Here the nonlinear
solve is OUTER Picard over the linear fast path: every iteration
CP-compresses the current iterate's cube into rhs terms and re-solves
the SAME preconditioned operators — one compiled program for the whole
nonlinear solve, and the final vademecum is verified against
per-sample banded-NEWTON truth (not against itself).

Run: python examples/nonlinear_vademecum.py    (CPU, ~1 min)
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from pgdrome_tpu.models.problems import (
    nonlinear_dense_verifier,
    nonlinear_elliptic,
)
from pgdrome_tpu.recipes import nonlinear_vademecum
from pgdrome_tpu.serving import Vademecum

EPS = 2.0

t0 = time.perf_counter()
sep, Vs, ml = nonlinear_elliptic(n_x=128, n_p=16, num_params=2)
res, tf, rep = nonlinear_vademecum(
    sep, Vs, ml, EPS, budgets=(24, 16), dtype=np.float64,
    rhs_bucket=128, log=print)
print(f"solved: rank {res.n_modes} in {rep['outer_iterations']} Picard "
      f"iterations, {time.perf_counter() - t0:.1f}s")

ver = nonlinear_dense_verifier(Vs, EPS, ml, tf, n_random=8,
                               seeds=(7, 101), n_edge=4)
v = ver(res)
print(f"dense banded-Newton verification: corners {v['corners']:.2e}, "
      f"interior {v['interior']:.2e}")
assert v["max"] < 1e-6

# how nonlinear is it? the LINEAR vademecum misses by ~2e-3
from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0

sep_pc, _ = precondition_dim0(sep, dtype=np.float64)
res_lin = SeparatedPGD(sep_pc, n_max=24, tol=0.0, residual_check=False,
                       dtype=np.float64).solve_fused()
print(f"linear solution vs nonlinear truth: {ver(res_lin)['max']:.2e} "
      "(the nonlinearity is not a perturbation)")

# serve it like any other vademecum
vd = Vademecum(Vs, res, dim0_transform=tf, dtype=np.float64)
grid = Vs[1].tabulate_dof_coordinates()[:, 0]
q = np.array([[grid[4], grid[11]], [grid[8], grid[2]]])
fields = np.asarray(vd.fields(q))
print(f"served {fields.shape[0]} nonlinear fields, "
      f"max |u| = {np.abs(fields).max():.4f}")
print("nonlinear vademecum example OK")
