"""2D Poisson separated as x⊗y⊗q⊗u0, FEM and FD variants.

Mirrors reference tests/integration/test_laplace.py: the same problem runs
through FEM-operator callbacks and FD-matrix callbacks, both must converge
in EXACTLY 1 mode (test_laplace.py:970-971), and random-sample errors vs a
2D FEM reference must satisfy FD < 2e-4, FEM < 1e-6
(test_laplace.py:1091-1092).  BC lift is added externally after evaluate
(homogenized solve, test_laplace.py:986-1010)."""

import unittest
import numpy as np
from scipy.sparse import linalg as spla
from scipy import sparse as sp

from pgdrome_tpu import (
    IntervalMesh,
    RectangleMesh,
    Point,
    FunctionSpace,
    DirichletBC,
    PGDProblem,
    Function,
    interpolate,
    mass_matrix,
    stiffness_matrix,
    gram,
    FD_matrices,
)
from pgdrome_tpu.ops.fd import apply_matrix_bc, apply_vector_bc


def create_meshes(num_elem, ords, ranges):
    meshes, Vs = [], []
    for ne, o, r in zip(num_elem, ords, ranges):
        mesh = IntervalMesh(ne, r[0], r[1])
        meshes.append(mesh)
        Vs.append(FunctionSpace(mesh, "CG", o))
    return meshes, Vs


def create_bc(Vs, dom, param):
    lx = param["lx"]
    cond = DirichletBC(
        Vs[0], 0, lambda x, on_b: on_b and (abs(x) < 1e-6 or abs(x - lx) < 1e-6)
    )
    return [cond, 0, 0, 0]  # x, y, q, u0


# --------------------------------------------------------------- FEM variant

def problem_assemble_lhs_FEM(fct_F, var_F, Fs, meshes, dom, param, typ, dim):
    M, K = param["M"], param["K"]
    k = param["k"]
    g = lambda i, A: gram(Fs[i], A, Fs[i])
    if typ == "r":
        return (
            g(1, M[1]) * g(2, M[2]) * g(3, M[3]) * k * K[0]
            + g(1, K[1]) * g(2, M[2]) * g(3, M[3]) * k * M[0]
        )
    if typ == "s":
        return (
            g(0, K[0]) * g(2, M[2]) * g(3, M[3]) * k * M[1]
            + g(0, M[0]) * g(2, M[2]) * g(3, M[3]) * k * K[1]
        )
    if typ == "t":
        return (
            g(0, K[0]) * g(1, M[1]) * g(3, M[3]) * k * M[2]
            + g(0, M[0]) * g(1, K[1]) * g(3, M[3]) * k * M[2]
        )
    if typ == "u":
        return (
            g(0, K[0]) * g(1, M[1]) * g(2, M[2]) * k * M[3]
            + g(0, M[0]) * g(1, K[1]) * g(2, M[2]) * k * M[3]
        )


def problem_assemble_rhs_FEM(fct_F, var_F, Fs, meshes, dom, param, Q, PGD_func, typ, nE, dim):
    M, K = param["M"], param["K"]
    k = param["k"]
    BC = [param["BC_x"], param["BC_y"], param["BC_q"], param["BC_u0"]]

    def gq(i, A, f):
        return gram(Fs[i], A, f)

    if typ == "r":
        l = (
            gq(1, M[1], Q[1][0]) * gq(2, M[2], Q[2][0]) * gq(3, M[3], Q[3][0])
            * (M[0] @ Q[0][0].array)
            - gq(1, M[1], BC[1]) * gq(2, M[2], BC[2]) * gq(3, M[3], BC[3])
            * k * (K[0] @ BC[0].array)
            - gq(1, K[1], BC[1]) * gq(2, M[2], BC[2]) * gq(3, M[3], BC[3])
            * k * (M[0] @ BC[0].array)
        )
        for o in range(nE):
            l -= gq(1, M[1], PGD_func[1][o]) * gq(2, M[2], PGD_func[2][o]) * gq(
                3, M[3], PGD_func[3][o]
            ) * k * (K[0] @ PGD_func[0][o].array)
            l -= gq(1, K[1], PGD_func[1][o]) * gq(2, M[2], PGD_func[2][o]) * gq(
                3, M[3], PGD_func[3][o]
            ) * k * (M[0] @ PGD_func[0][o].array)
        return l
    if typ == "s":
        l = (
            gq(0, M[0], Q[0][0]) * gq(2, M[2], Q[2][0]) * gq(3, M[3], Q[3][0])
            * (M[1] @ Q[1][0].array)
            - gq(0, K[0], BC[0]) * gq(2, M[2], BC[2]) * gq(3, M[3], BC[3])
            * k * (M[1] @ BC[1].array)
            - gq(0, M[0], BC[0]) * gq(2, M[2], BC[2]) * gq(3, M[3], BC[3])
            * k * (K[1] @ BC[1].array)
        )
        for o in range(nE):
            l -= gq(0, K[0], PGD_func[0][o]) * gq(2, M[2], PGD_func[2][o]) * gq(
                3, M[3], PGD_func[3][o]
            ) * k * (M[1] @ PGD_func[1][o].array)
            l -= gq(0, M[0], PGD_func[0][o]) * gq(2, M[2], PGD_func[2][o]) * gq(
                3, M[3], PGD_func[3][o]
            ) * k * (K[1] @ PGD_func[1][o].array)
        return l
    if typ == "t":
        l = (
            gq(0, M[0], Q[0][0]) * gq(1, M[1], Q[1][0]) * gq(3, M[3], Q[3][0])
            * (M[2] @ Q[2][0].array)
            - gq(0, K[0], BC[0]) * gq(1, M[1], BC[1]) * gq(3, M[3], BC[3])
            * k * (M[2] @ BC[2].array)
            - gq(0, M[0], BC[0]) * gq(1, K[1], BC[1]) * gq(3, M[3], BC[3])
            * k * (M[2] @ BC[2].array)
        )
        for o in range(nE):
            l -= gq(0, K[0], PGD_func[0][o]) * gq(1, M[1], PGD_func[1][o]) * gq(
                3, M[3], PGD_func[3][o]
            ) * k * (M[2] @ PGD_func[2][o].array)
            l -= gq(0, M[0], PGD_func[0][o]) * gq(1, K[1], PGD_func[1][o]) * gq(
                3, M[3], PGD_func[3][o]
            ) * k * (M[2] @ PGD_func[2][o].array)
        return l
    if typ == "u":
        l = (
            gq(0, M[0], Q[0][0]) * gq(1, M[1], Q[1][0]) * gq(2, M[2], Q[2][0])
            * (M[3] @ Q[3][0].array)
            - gq(0, K[0], BC[0]) * gq(1, M[1], BC[1]) * gq(2, M[2], BC[2])
            * k * (M[3] @ BC[3].array)
            - gq(0, M[0], BC[0]) * gq(1, K[1], BC[1]) * gq(2, M[2], BC[2])
            * k * (M[3] @ BC[3].array)
        )
        for o in range(nE):
            l -= gq(0, K[0], PGD_func[0][o]) * gq(1, M[1], PGD_func[1][o]) * gq(
                2, M[2], PGD_func[2][o]
            ) * k * (M[3] @ PGD_func[3][o].array)
            l -= gq(0, M[0], PGD_func[0][o]) * gq(1, K[1], PGD_func[1][o]) * gq(
                2, M[2], PGD_func[2][o]
            ) * k * (M[3] @ PGD_func[3][o].array)
        return l


# ---------------------------------------------------------------- FD variant

def problem_assemble_lhs_FD(fct_F, var_F, Fs, meshes, dom, param, typ, dim):
    k = param["k"]
    Mx, My, Mq, Mu = param["M_x"], param["M_y"], param["M_q"], param["M_u"]
    D2x, D2y = param["D2_x"], param["D2_y"]
    F = [f.array for f in Fs]
    if typ == "r":
        a = (
            -(F[1] @ My @ F[1]) * (F[2] @ Mq @ F[2]) * (F[3] @ Mu @ F[3]) * k * D2x
            - (F[1] @ D2y @ F[1]) * (F[2] @ Mq @ F[2]) * (F[3] @ Mu @ F[3]) * k * Mx
        )
        return apply_matrix_bc(a, param["bc_idx"])
    if typ == "s":
        return (
            -(F[0] @ D2x @ F[0]) * (F[2] @ Mq @ F[2]) * (F[3] @ Mu @ F[3]) * k * My
            - (F[0] @ Mx @ F[0]) * (F[2] @ Mq @ F[2]) * (F[3] @ Mu @ F[3]) * k * D2y
        )
    if typ == "t":
        return (
            -(F[0] @ D2x @ F[0]) * (F[1] @ My @ F[1]) * (F[3] @ Mu @ F[3]) * k * Mq
            - (F[0] @ Mx @ F[0]) * (F[1] @ D2y @ F[1]) * (F[3] @ Mu @ F[3]) * k * Mq
        )
    if typ == "u":
        return (
            -(F[0] @ D2x @ F[0]) * (F[1] @ My @ F[1]) * (F[2] @ Mq @ F[2]) * k * Mu
            - (F[0] @ Mx @ F[0]) * (F[1] @ D2y @ F[1]) * (F[2] @ Mq @ F[2]) * k * Mu
        )


def problem_assemble_rhs_FD(fct_F, var_F, Fs, meshes, dom, param, Q, PGD_func, typ, nE, dim):
    k = param["k"]
    Mx, My, Mq, Mu = param["M_x"], param["M_y"], param["M_q"], param["M_u"]
    D2x, D2y = param["D2_x"], param["D2_y"]
    F = [f.array for f in Fs]
    Qv = [q[0].array for q in Q]
    BC = [
        param["BC_x"].array,
        param["BC_y"].array,
        param["BC_q"].array,
        param["BC_u0"].array,
    ]

    if typ == "r":
        l = (
            (F[1] @ My @ Qv[1]) * (F[2] @ Mq @ Qv[2]) * (F[3] @ Mu @ Qv[3])
            * (Mx @ Qv[0])
            + (F[1] @ My @ BC[1]) * (F[2] @ Mq @ BC[2]) * (F[3] @ Mu @ BC[3])
            * k * (D2x @ BC[0])
            + (F[1] @ D2y @ BC[1]) * (F[2] @ Mq @ BC[2]) * (F[3] @ Mu @ BC[3])
            * k * (Mx @ BC[0])
        )
        for o in range(nE):
            P = [PGD_func[d][o].array for d in range(4)]
            l += (F[1] @ My @ P[1]) * (F[2] @ Mq @ P[2]) * (F[3] @ Mu @ P[3]) * k * (
                D2x @ P[0]
            )
            l += (F[1] @ D2y @ P[1]) * (F[2] @ Mq @ P[2]) * (F[3] @ Mu @ P[3]) * k * (
                Mx @ P[0]
            )
        return apply_vector_bc(l, param["bc_idx"])
    if typ == "s":
        l = (
            (F[0] @ Mx @ Qv[0]) * (F[2] @ Mq @ Qv[2]) * (F[3] @ Mu @ Qv[3])
            * (My @ Qv[1])
            + (F[0] @ D2x @ BC[0]) * (F[2] @ Mq @ BC[2]) * (F[3] @ Mu @ BC[3])
            * k * (My @ BC[1])
            + (F[0] @ Mx @ BC[0]) * (F[2] @ Mq @ BC[2]) * (F[3] @ Mu @ BC[3])
            * k * (D2y @ BC[1])
        )
        for o in range(nE):
            P = [PGD_func[d][o].array for d in range(4)]
            l += (F[0] @ D2x @ P[0]) * (F[2] @ Mq @ P[2]) * (F[3] @ Mu @ P[3]) * k * (
                My @ P[1]
            )
            l += (F[0] @ Mx @ P[0]) * (F[2] @ Mq @ P[2]) * (F[3] @ Mu @ P[3]) * k * (
                D2y @ P[1]
            )
        return l
    if typ == "t":
        l = (
            (F[0] @ Mx @ Qv[0]) * (F[1] @ My @ Qv[1]) * (F[3] @ Mu @ Qv[3])
            * (Mq @ Qv[2])
            + (F[0] @ D2x @ BC[0]) * (F[1] @ My @ BC[1]) * (F[3] @ Mu @ BC[3])
            * k * (Mq @ BC[2])
            + (F[0] @ Mx @ BC[0]) * (F[1] @ D2y @ BC[1]) * (F[3] @ Mu @ BC[3])
            * k * (Mq @ BC[2])
        )
        for o in range(nE):
            P = [PGD_func[d][o].array for d in range(4)]
            l += (F[0] @ D2x @ P[0]) * (F[1] @ My @ P[1]) * (F[3] @ Mu @ P[3]) * k * (
                Mq @ P[2]
            )
            l += (F[0] @ Mx @ P[0]) * (F[1] @ D2y @ P[1]) * (F[3] @ Mu @ P[3]) * k * (
                Mq @ P[2]
            )
        return l
    if typ == "u":
        l = (
            (F[0] @ Mx @ Qv[0]) * (F[1] @ My @ Qv[1]) * (F[2] @ Mq @ Qv[2])
            * (Mu @ Qv[3])
            + (F[0] @ D2x @ BC[0]) * (F[1] @ My @ BC[1]) * (F[2] @ Mq @ BC[2])
            * k * (Mu @ BC[3])
            + (F[0] @ Mx @ BC[0]) * (F[1] @ D2y @ BC[1]) * (F[2] @ Mq @ BC[2])
            * k * (Mu @ BC[3])
        )
        for o in range(nE):
            P = [PGD_func[d][o].array for d in range(4)]
            l += (F[0] @ D2x @ P[0]) * (F[1] @ My @ P[1]) * (F[2] @ Mq @ P[2]) * k * (
                Mu @ P[3]
            )
            l += (F[0] @ Mx @ P[0]) * (F[1] @ D2y @ P[1]) * (F[2] @ Mq @ P[2]) * k * (
                Mu @ P[3]
            )
        return l


def create_PGD(param, vs, _type):
    # nonhomogeneous BC lift (added externally after evaluate)
    param["BC_x"] = interpolate(lambda x: 1.0 - x / 3.0, vs[0])
    param["BC_y"] = interpolate(lambda y: np.ones_like(y), vs[1])
    param["BC_q"] = interpolate(lambda q: np.ones_like(q), vs[2])
    param["BC_u0"] = interpolate(lambda u: u, vs[3])

    # separated source, interpolated (parity: test_laplace.py:779-786)
    qx = [interpolate(lambda x: np.where(x < param["lx"] / 2, 1.0, 0.0), vs[0])]
    qy = [interpolate(lambda y: np.ones_like(y), vs[1])]
    qq = [interpolate(lambda q: q, vs[2])]
    qu0 = [interpolate(lambda u: np.ones_like(u), vs[3])]

    if _type == "FEM":
        param["M"] = [mass_matrix(v) for v in vs]
        param["K"] = [stiffness_matrix(v) for v in vs]
        ass_rhs, ass_lhs = problem_assemble_rhs_FEM, problem_assemble_lhs_FEM
        solve_modes = ["FEM"] * 4
    elif _type == "FD":
        # dof coords are already sorted ascending by construction
        xs = [v.tabulate_dof_coordinates()[:, 0] for v in vs]
        param["M_x"], param["D2_x"], _ = FD_matrices(xs[0])
        param["M_y"], param["D2_y"], _ = FD_matrices(xs[1])
        param["M_q"], _, _ = FD_matrices(xs[2])
        param["M_u"], _, _ = FD_matrices(xs[3])
        param["bc_idx"] = np.array(
            [np.where(xs[0] == 0)[0], np.where(xs[0] == param["lx"])[0]]
        ).flatten()
        ass_rhs, ass_lhs = problem_assemble_rhs_FD, problem_assemble_lhs_FD
        solve_modes = ["FD"] * 4

    pgd_prob = PGDProblem(
        name="test_x_y_q_u00",
        name_coord=["X", "Y", "q", "u0"],
        modes_info=["T", "Node", "Scalar"],
        Vs=vs,
        dom=0,
        bc_fct=create_bc,
        load=[qx, qy, qq, qu0],
        param=param,
        rhs_fct=ass_rhs,
        lhs_fct=ass_lhs,
        probs=["r", "s", "t", "u"],
        seq_fp=list(range(4)),
        PGD_nmax=7,
    )
    if _type == "FD":
        pgd_prob.MM = [param["M_x"], param["M_y"], param["M_q"], param["M_u"]]
    pgd_prob.stop_fp = "norm"
    pgd_prob.max_fp_it = 50
    pgd_prob.tol_fp_it = 1e-5
    pgd_prob.norm_modes = "stiff"

    pgd_prob.solve_PGD(_problem="linear", solve_modes=solve_modes)
    return pgd_prob.return_PGD(), param


class FEM_reference:
    """Full 2D FEM solve (sparse), evaluated along regular x points at a
    given y (parity: reference test_laplace.py:867-929)."""

    def __init__(self, param, elem, ords):
        self.param = param
        self.elem = elem
        self.mesh = RectangleMesh(
            Point(0, 0), Point(param["lx"], param["ly"]), elem[0], elem[1]
        )
        self.V = FunctionSpace(self.mesh, "CG", ords[0] + 1)
        self.K = stiffness_matrix(self.V, sparse=True) * param["k"]
        self.bc_template = DirichletBC(
            self.V,
            0.0,
            lambda p, on_b: on_b
            and (abs(p[0]) < 1e-6 or abs(p[0] - param["lx"]) < 1e-6),
        )

    def __call__(self, values):
        y, q00, u00 = values
        lx = self.param["lx"]
        from pgdrome_tpu.fem.assembly import load_vector

        # use the SAME discrete source as the PGD models: the step
        # interpolated on the x grid (P1 hat ramp at lx/2), so the
        # comparison measures separation/discretization error only
        nx = self.elem[0]
        xg = np.linspace(0, lx, nx + 1)
        qg = np.where(xg < lx / 2, 1.0, 0.0)
        b = load_vector(self.V, lambda p: q00 * np.interp(p[..., 0], xg, qg))
        # Dirichlet values u00*(1 - x/3) on left/right
        dofs = self.bc_template.dofs
        pts = self.V.tabulate_dof_coordinates()[dofs]
        gvals = u00 * (1.0 - pts[:, 0] / 3.0)
        A = self.K.tolil()
        b = b - np.asarray(self.K[:, dofs].todense()) @ gvals
        b[dofs] = gvals
        A[dofs, :] = 0.0
        A[:, dofs] = 0.0
        A[dofs, dofs] = 1.0
        T = spla.spsolve(A.tocsr(), b)
        Tf = Function(self.V, T)
        x_x = np.linspace(0, lx, self.elem[0] + 1)
        pts2 = np.stack([x_x, np.full_like(x_x, y)], axis=1)
        return Tf(pts2), x_x, Tf


class problem(unittest.TestCase):
    def setUp(self):
        self.param = {"k": 0.5, "lx": 3, "ly": 3}
        self.ranges = [[0.0, 3.0], [0.0, 3.0], [0.0, 50.0], [10.0, 50.0]]
        self.ord = [1, 1, 1, 1]
        self.elem = [60, 40, 200, 80]
        self.fixed_dim = 0

    def test_solver(self):
        meshes, vs = create_meshes(self.elem, self.ord, self.ranges)

        pgd_fem, param = create_PGD(dict(self.param), vs, "FEM")
        pgd_fd, param = create_PGD(dict(self.param), vs, "FD")

        print("Number of Modes", pgd_fem.numModes, pgd_fd.numModes)
        self.assertTrue(pgd_fem.numModes == 1)
        self.assertTrue(pgd_fd.numModes == 1)

        rng = np.random.default_rng(42)
        ref = FEM_reference(self.param, self.elem, self.ord)
        errors_FEM1, errors_FEM2 = [], []
        for _ in range(10):
            check_values = [
                self.ranges[1][0] + rng.random() * (self.ranges[1][1] - self.ranges[1][0]),
                self.ranges[2][0] + rng.random() * (self.ranges[2][1] - self.ranges[2][0]),
                self.ranges[3][0] + rng.random() * (self.ranges[3][1] - self.ranges[3][0]),
            ]
            lift = param["BC_x"].compute_vertex_values() * param["BC_y"](
                check_values[0]
            ) * param["BC_q"](check_values[1]) * param["BC_u0"](check_values[2])
            u1 = (
                pgd_fd.evaluate(self.fixed_dim, [1, 2, 3], check_values, 0)
                .compute_vertex_values()
                + lift
            )
            u2 = (
                pgd_fem.evaluate(self.fixed_dim, [1, 2, 3], check_values, 0)
                .compute_vertex_values()
                + lift
            )
            u3, _, _ = ref(check_values)
            errors_FEM1.append(np.linalg.norm(u1 - u3) / np.linalg.norm(u3))
            errors_FEM2.append(np.linalg.norm(u2 - u3) / np.linalg.norm(u3))

        print("PGD FD  - FEM:", np.mean(errors_FEM1))
        print("PGD FEM - FEM:", np.mean(errors_FEM2))
        self.assertTrue(np.mean(errors_FEM1) < 2e-4)
        self.assertTrue(np.mean(errors_FEM2) < 1e-6)


if __name__ == "__main__":
    unittest.main()
