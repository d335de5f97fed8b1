"""Goal-oriented output correction: serve SENSOR outputs orders of
magnitude more accurate than the field they come from.

The classic certified-RB primal-dual trick (pgdrome_tpu/dual.py): solve
a second vademecum for the ADJOINT of each output functional, and serve

    s_corr(p) = l·u_r(p) + z_r(p)·r(p)

whose error is (z_true − z_r)·r — the PRODUCT of the dual error and the
primal residual.  A coarse rank-5 primal plus a rank-12 dual gives
outputs ~1000× more accurate than the primal field supports, and the
correction term itself is an output error ESTIMATE with effectivity ≈ 1.

The reference has no counterpart: its only output-error story is
per-sample FOM solves (reference model.py:1666-1825).  At the d=10
dimensionality frontier this is what turns a rank-walled 1.8e-4 field
into <1e-6-certified outputs (FRONTIER.md "Goal-oriented outputs").

Run: python examples/goal_oriented_outputs.py   (CPU, ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if not os.environ.get("GOAL_ORIENTED_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np

import pgdrome_tpu.config as cfg
from pgdrome_tpu.dual import (
    DualCorrector,
    adjoint_problem,
    make_corrected_sensor_fn,
    point_functional,
)
from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix
from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0

cfg.use_full_f32_matmul()

num_params = 3
sep, Vs = parametric_elliptic(n_x=128, n_p=32, num_params=num_params,
                              degree_x=2)

# --- primal: a deliberately COARSE vademecum (rank 5) ---
pc, tf = precondition_dim0(sep, dtype=np.float64)
res_u = SeparatedPGD(pc, n_max=5, tol=0.0, tol_fp=1e-9,
                     residual_check=False, dtype=np.float64).solve()

# --- dual: the adjoint of the output functional s = u(x0) ---
x0 = 0.375
l = point_functional(Vs[0], x0)
adj_pc, tf_z = precondition_dim0(adjoint_problem(sep, l),
                                 dtype=np.float64)
res_z = SeparatedPGD(adj_pc, n_max=12, tol=0.0, tol_fp=1e-9,
                     residual_check=False, dtype=np.float64).solve()
print(f"primal rank {res_u.n_modes}, dual rank {res_z.n_modes}")

dc = DualCorrector(sep, Vs, l, res_u, tf, res_z, tf_z)

# --- verify against per-sample f64 FEM truth ---
grid = Vs[1].tabulate_dof_coordinates()[:, 0]
rng = np.random.default_rng(0)
pts = grid[rng.integers(1, len(grid) - 1, size=(24, num_params))]
pts[0], pts[1] = grid[1], grid[-2]          # parameter-box corners

s_corr, s_plain, est = dc.corrected(pts, return_parts=True)
b = load_vector(Vs[0], lambda x: np.ones_like(x))
e_plain, e_corr, eff = [], [], []
for k, p in enumerate(pts):
    kap = lambda x: 1.0 + sum(
        p[i] * np.sin((i + 1) * np.pi * x) ** 2 / (2 * num_params)
        for i in range(num_params))
    K = stiffness_matrix(Vs[0], weight=kap)
    u_t = np.zeros(K.shape[0])
    u_t[1:-1] = np.linalg.solve(K[1:-1, 1:-1], b[1:-1])
    s_true = l @ u_t
    e_plain.append(abs(s_plain[k] - s_true))
    e_corr.append(abs(s_corr[k] - s_true))
    eff.append(est[k] / (s_true - s_plain[k]))

print(f"plain output error   (max): {max(e_plain):.3e}")
print(f"corrected output err (max): {max(e_corr):.3e}  "
      f"({max(e_plain) / max(e_corr):,.0f}x better)")
print(f"error-estimate effectivity: "
      f"{np.median(eff):.4f} (median over {len(pts)} samples)")

# --- the jitted device sweep (TPU path; dd-compensated z·b) ---
fn = make_corrected_sensor_fn(dc, aot=False)
s_dev, _ = (np.asarray(a) for a in fn(pts))
print(f"device sweep vs host corrector: "
      f"{np.abs(s_dev - s_corr).max():.2e} max abs diff")

# --- or through the serving container ---
from pgdrome_tpu.serving import Vademecum

vd = Vademecum(Vs, res_u, dim0_transform=tf, dtype=np.float64)
vd.attach_corrector(dc, device=False)       # host f64: certification grade
s_served, est_served = vd.corrected_sensors(pts, return_estimate=True)
assert np.array_equal(s_served, s_corr)
print(f"served corrected outputs match; estimate range "
      f"[{est_served.min():.2e}, {est_served.max():.2e}]")

assert max(e_corr) < 0.02 * max(e_plain)
print("OK")
