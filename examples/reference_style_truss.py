"""Reference-style usage: the elastic truss u(x, p, E) through the
PGDProblem API (drop-in for PGDrome users; same callback sequence, with
pre-assembled operators instead of UFL forms).

Run: python examples/reference_style_truss.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if not os.environ.get("PGDROME_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")  # TPU opt-in via env

import numpy as np

from pgdrome_tpu import (
    IntervalMesh,
    FunctionSpace,
    DirichletBC,
    PGDProblem,
    PGDErrorComputation,
    mass_matrix,
    stiffness_matrix,
    load_vector,
    gram,
)

meshes, vs = [], []
for ne, (a, b) in zip([113, 2, 100], [(0, 1), (-1, 3), (0.2, 2)]):
    m = IntervalMesh(ne, a, b)
    meshes.append(m)
    vs.append(FunctionSpace(m, "P", 2))

param = {
    "A": 1.0, "p_0": 1.0, "E_0": 1.0,
    "K_x": stiffness_matrix(vs[0]),
    "M_p": mass_matrix(vs[1]),
    "M_E_w": mass_matrix(vs[2], weight=lambda E: E),
}
load = [
    [load_vector(vs[0], lambda x: np.ones_like(x))],
    [load_vector(vs[1], lambda p: p)],
    [load_vector(vs[2], lambda E: np.ones_like(E))],
]


def bc_fct(Vs, dom, p):
    return [[DirichletBC(Vs[0], 0.0, lambda x: x < 1e-5),
             DirichletBC(Vs[0], 0.0, lambda x: x > 1 - 1e-5)], 0, 0]


def lhs(fct_F, var_F, Fs, meshes, dom, p, typ, dim):
    if typ == "r":
        return gram(Fs[1], p["M_p"], Fs[1]) * gram(Fs[2], p["M_E_w"], Fs[2]) * p["K_x"]
    if typ == "s":
        return gram(Fs[0], p["K_x"], Fs[0]) * gram(Fs[2], p["M_E_w"], Fs[2]) * p["M_p"]
    return gram(Fs[0], p["K_x"], Fs[0]) * gram(Fs[1], p["M_p"], Fs[1]) * p["M_E_w"]


def rhs(fct_F, var_F, Fs, meshes, dom, p, G, PGD_func, typ, nE, dim):
    j, k, d = {"r": (1, 2, 0), "s": (0, 2, 1), "t": (0, 1, 2)}[typ]
    ops = {0: p["K_x"], 1: p["M_p"], 2: p["M_E_w"]}
    l = (Fs[j].array @ G[j][0]) * (Fs[k].array @ G[k][0]) * G[d][0]
    for o in range(nE):
        c = gram(Fs[j], ops[j], PGD_func[j][o]) * gram(Fs[k], ops[k], PGD_func[k][o])
        l = l - c * (ops[d] @ PGD_func[d][o].array)
    return l


prob = PGDProblem(
    name="truss", name_coord=["X", "P", "E"],
    modes_info=["U_x", "Node", "Scalar"], Vs=vs, bc_fct=bc_fct,
    load=load, param=param, rhs_fct=rhs, lhs_fct=lhs,
    probs=["r", "s", "t"], seq_fp=[0, 1, 2], PGD_nmax=10,
)
prob.stop_fp = "norm"
prob.norm_modes = "stiff"
prob.solve_PGD()
solution = prob.return_PGD()


class FOM:
    def __init__(self, x):
        self.x = x

    def __call__(self, data):
        return data[0] / (2 * data[1]) * (self.x - self.x**2)


err = PGDErrorComputation(
    fixed_dim=[0], n_samples=10,
    FOM_model=FOM(meshes[0].coordinates()[:, 0]), PGD_model=solution,
)
errors, mean_e, max_e = err.evaluate_error()
print(f"modes: {prob.PGD_modes}, mean rel-L2 vs analytic: {mean_e:.2e}")
