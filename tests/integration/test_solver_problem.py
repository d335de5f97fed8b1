"""2D plane-strain elasticity PGD: u((x,y), lam_p, lam_E, nu).

Mirrors reference tests/integration/test_solver_problem.py: vector P2 space
on a crossed RectangleMesh, separated elasticity tensor C = nu1(ν)·C1 +
nu2(ν)·C2 with rational ν-coefficients (test_solver_problem.py:552-568),
boundary tractions on marked top edges.  Runs BOTH the linear and nonlinear
solver paths and asserts amplitude agreement < 1e-8
(test_solver_problem.py:752), point/L2 errors bounded by amplitude[-2], and
cross-validates PGDErrorComputation against manual errors to 8 decimals.

Mesh is [60, 6] (reference: [200, 20]) — assertions are relative to the
PGD's own amplitudes, so they are discretization-independent; the smaller
mesh keeps the single-core CI fast."""

import unittest
import numpy as np

from pgdrome_tpu import (
    IntervalMesh,
    RectangleMesh,
    Point,
    FunctionSpace,
    VectorFunctionSpace,
    DirichletBC,
    PGDProblem,
    PGDErrorComputation,
    Function,
    Expression,
    mass_matrix,
    gram,
)
from pgdrome_tpu.fem.assembly import elasticity_matrix, boundary_load_vector, load_vector

L = [1000.0, 100.0]  # Lx, Ly


def create_meshesExtra(num_elem, ords, ranges):
    meshes, Vs = [], []
    for ne, o, r in zip(num_elem, ords, ranges):
        mesh = IntervalMesh(ne, r[0], r[1])
        meshes.append(mesh)
        Vs.append(FunctionSpace(mesh, "P", o))
    return meshes, Vs


def create_meshX(N, order):
    mesh_x = RectangleMesh(Point(0.0, 0.0), Point(L[0], L[1]), N[0], N[1], "crossed")
    V_x = VectorFunctionSpace(mesh_x, "P", order)
    return mesh_x, V_x


def create_dom(Vs, param):
    # boundary markers on the X mesh (facet-midpoint predicates; parity with
    # the MeshFunction markers of the reference, test_solver_problem.py:77-115)
    markers = {
        1: lambda m: abs(m[0]) < 1e-9,  # left
        2: lambda m: abs(m[1] - L[1]) < 1e-9 and m[0] < 0.5 * L[0],  # top_left
        3: lambda m: abs(m[1] - L[1]) < 1e-9 and m[0] > 0.5 * L[0],  # top_right
        4: lambda m: abs(m[0] - L[0]) < 1e-9,  # right
    }
    return [markers, 0, 0, 0]


def create_bc(Vs, dom, param):
    bc_x = [DirichletBC(Vs[0], (0.0, 0.0), lambda p: abs(p[0]) < 1e-9)]
    return [bc_x, 0, 0, 0]


def problem_assemble_lhs(fct_F, var_F, Fs, meshes, dom, param, typ, dim):
    K1, K2 = param["K1"], param["K2"]
    Mp, MEw = param["M_p"], param["M_E_w"]
    Mnu1, Mnu2 = param["M_nu1"], param["M_nu2"]
    E0 = param["E_0"]
    if typ == "r":
        c1 = gram(Fs[1], Mp, Fs[1]) * E0 * gram(Fs[2], MEw, Fs[2]) * gram(Fs[3], Mnu1, Fs[3])
        c2 = gram(Fs[1], Mp, Fs[1]) * E0 * gram(Fs[2], MEw, Fs[2]) * gram(Fs[3], Mnu2, Fs[3])
        return c1 * K1 + c2 * K2
    if typ == "s":
        c1 = gram(Fs[0], K1, Fs[0]) * E0 * gram(Fs[2], MEw, Fs[2]) * gram(Fs[3], Mnu1, Fs[3])
        c2 = gram(Fs[0], K2, Fs[0]) * E0 * gram(Fs[2], MEw, Fs[2]) * gram(Fs[3], Mnu2, Fs[3])
        return (c1 + c2) * Mp
    if typ == "t":
        c1 = gram(Fs[0], K1, Fs[0]) * gram(Fs[1], Mp, Fs[1]) * gram(Fs[3], Mnu1, Fs[3])
        c2 = gram(Fs[0], K2, Fs[0]) * gram(Fs[1], Mp, Fs[1]) * gram(Fs[3], Mnu2, Fs[3])
        return (c1 + c2) * E0 * MEw
    if typ == "v":
        c1 = gram(Fs[0], K1, Fs[0]) * gram(Fs[1], Mp, Fs[1]) * E0 * gram(Fs[2], MEw, Fs[2])
        c2 = gram(Fs[0], K2, Fs[0]) * gram(Fs[1], Mp, Fs[1]) * E0 * gram(Fs[2], MEw, Fs[2])
        return c1 * Mnu1 + c2 * Mnu2


def problem_assemble_rhs(fct_F, var_F, Fs, meshes, dom, param, G, PGD_func, typ, nE, dim):
    K1, K2 = param["K1"], param["K2"]
    Mp, MEw = param["M_p"], param["M_E_w"]
    Mnu1, Mnu2 = param["M_nu1"], param["M_nu2"]
    E0 = param["E_0"]
    # G[i] = [b_x (boundary load vec), b_p, b_E, b_nu] per traction i; each
    # entry a list over "ext" terms (here length 1)
    if typ == "r":
        l = 0
        for ext in range(len(G[0][0])):
            l = l + (
                (Fs[1].array @ G[0][1][ext])
                * (Fs[2].array @ G[0][2][ext])
                * (Fs[3].array @ G[0][3][ext])
            ) * G[0][0][ext] + (
                (Fs[1].array @ G[1][1][ext])
                * (Fs[2].array @ G[1][2][ext])
                * (Fs[3].array @ G[1][3][ext])
            ) * G[1][0][ext]
        for o in range(nE):
            c1 = gram(Fs[1], Mp, PGD_func[1][o]) * E0 * gram(
                Fs[2], MEw, PGD_func[2][o]
            ) * gram(Fs[3], Mnu1, PGD_func[3][o])
            c2 = gram(Fs[1], Mp, PGD_func[1][o]) * E0 * gram(
                Fs[2], MEw, PGD_func[2][o]
            ) * gram(Fs[3], Mnu2, PGD_func[3][o])
            l = l - c1 * (K1 @ PGD_func[0][o].array) - c2 * (K2 @ PGD_func[0][o].array)
        return l
    if typ == "s":
        l = 0
        for ext in range(len(G[0][1])):
            l = l + (
                (Fs[0].array @ G[0][0][ext])
                * (Fs[2].array @ G[0][2][ext])
                * (Fs[3].array @ G[0][3][ext])
            ) * G[0][1][ext] + (
                (Fs[0].array @ G[1][0][ext])
                * (Fs[2].array @ G[1][2][ext])
                * (Fs[3].array @ G[1][3][ext])
            ) * G[1][1][ext]
        for o in range(nE):
            c1 = gram(Fs[0], K1, PGD_func[0][o]) * E0 * gram(
                Fs[2], MEw, PGD_func[2][o]
            ) * gram(Fs[3], Mnu1, PGD_func[3][o])
            c2 = gram(Fs[0], K2, PGD_func[0][o]) * E0 * gram(
                Fs[2], MEw, PGD_func[2][o]
            ) * gram(Fs[3], Mnu2, PGD_func[3][o])
            l = l - (c1 + c2) * (Mp @ PGD_func[1][o].array)
        return l
    if typ == "t":
        l = 0
        for ext in range(len(G[0][1])):
            l = l + (
                (Fs[0].array @ G[0][0][ext])
                * (Fs[1].array @ G[0][1][ext])
                * (Fs[3].array @ G[0][3][ext])
            ) * G[0][2][ext] + (
                (Fs[0].array @ G[1][0][ext])
                * (Fs[1].array @ G[1][1][ext])
                * (Fs[3].array @ G[1][3][ext])
            ) * G[1][2][ext]
        for o in range(nE):
            c1 = gram(Fs[0], K1, PGD_func[0][o]) * gram(
                Fs[1], Mp, PGD_func[1][o]
            ) * gram(Fs[3], Mnu1, PGD_func[3][o])
            c2 = gram(Fs[0], K2, PGD_func[0][o]) * gram(
                Fs[1], Mp, PGD_func[1][o]
            ) * gram(Fs[3], Mnu2, PGD_func[3][o])
            l = l - (c1 + c2) * E0 * (MEw @ PGD_func[2][o].array)
        return l
    if typ == "v":
        l = 0
        for ext in range(len(G[0][1])):
            l = l + (
                (Fs[0].array @ G[0][0][ext])
                * (Fs[1].array @ G[0][1][ext])
                * (Fs[2].array @ G[0][2][ext])
            ) * G[0][3][ext] + (
                (Fs[0].array @ G[1][0][ext])
                * (Fs[1].array @ G[1][1][ext])
                * (Fs[2].array @ G[1][2][ext])
            ) * G[1][3][ext]
        for o in range(nE):
            c1 = gram(Fs[0], K1, PGD_func[0][o]) * gram(
                Fs[1], Mp, PGD_func[1][o]
            ) * E0 * gram(Fs[2], MEw, PGD_func[2][o])
            c2 = gram(Fs[0], K2, PGD_func[0][o]) * gram(
                Fs[1], Mp, PGD_func[1][o]
            ) * E0 * gram(Fs[2], MEw, PGD_func[2][o])
            l = l - c1 * (Mnu1 @ PGD_func[3][o].array) - c2 * (
                Mnu2 @ PGD_func[3][o].array
            )
        return l


NU1 = lambda nu: 1.0 / (2.0 * (1.0 + nu) * (1.0 - 2.0 * nu))  # plane strain
NU2 = lambda nu: 1.0 / (2.0 * (1.0 + nu))
C1 = np.array([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
C2 = np.array([[1.0, -1.0, 0.0], [-1.0, 1.0, 0.0], [0.0, 0.0, 1.0]])


def main_PGD(vs, params, problem="linear", settings=None):
    params = dict(params)
    Vx = vs[0]
    # separated elasticity operators + per-dim Gram matrices (assembled once)
    params["K1"] = elasticity_matrix(Vx, C1, sparse=True)
    params["K2"] = elasticity_matrix(Vx, C2, sparse=True)
    params["M_p"] = mass_matrix(vs[1])
    params["M_E_w"] = mass_matrix(vs[2], weight=lambda E: E)  # E_func = x[0]
    params["M_nu1"] = mass_matrix(vs[3], weight=NU1)
    params["M_nu2"] = mass_matrix(vs[3], weight=NU2)

    dom = create_dom(vs, params)
    markers = dom[0]

    g1 = Expression((lambda p: 0.0 * p[..., 0], lambda p: -0.5 * np.ones_like(p[..., 0])))
    g2 = Expression((lambda p: 0.0 * p[..., 0], lambda p: -1.5 * np.ones_like(p[..., 0])))

    # traction term i: [boundary load vec on X, load vecs on p/E/nu]
    G1 = [
        [boundary_load_vector(Vx, g1, markers[2])],
        [load_vector(vs[1], lambda p: p)],
        [load_vector(vs[2], lambda E: np.ones_like(E))],
        [load_vector(vs[3], lambda n: np.ones_like(n))],
    ]
    G2 = [
        [boundary_load_vector(Vx, g2, markers[3])],
        [load_vector(vs[1], lambda p: p)],
        [load_vector(vs[2], lambda E: np.ones_like(E))],
        [load_vector(vs[3], lambda n: np.ones_like(n))],
    ]

    pgd_prob = PGDProblem(
        name="PGD_xpEv",
        name_coord=["X", "P", "E", "nu"],
        modes_info=["U", "Node", "Vector"],
        Vs=vs,
        bc_fct=create_bc,
        load=[G1, G2],
        param=params,
        dom_fct=create_dom,
        rhs_fct=problem_assemble_rhs,
        lhs_fct=problem_assemble_lhs,
        probs=["r", "s", "t", "v"],
        seq_fp=[0, 1, 2, 3],
        PGD_nmax=7,
    )
    pgd_prob.max_fp_it = 50
    pgd_prob.stop_fp = "norm"
    pgd_prob.tol_fp_it = 1e-4
    pgd_prob.norm_modes = "stiff"

    pgd_prob.solve_PGD(_problem=problem, settings=settings or {})
    return pgd_prob, pgd_prob.return_PGD()


class FEM_reference:
    """Full 2D elasticity solve at given (p, E, nu)
    (test_solver_problem.py:630-692)."""

    def __init__(self, V_x, params, x_values=[]):
        from scipy.sparse import linalg as spla

        self.V_x = V_x
        self.params = params
        self.x_values = x_values
        self.K1 = elasticity_matrix(V_x, C1, sparse=True)
        self.K2 = elasticity_matrix(V_x, C2, sparse=True)
        markers = create_dom([V_x], params)[0]
        g1 = Expression(
            (lambda p: 0.0 * p[..., 0], lambda p: -0.5 * np.ones_like(p[..., 0]))
        )
        g2 = Expression(
            (lambda p: 0.0 * p[..., 0], lambda p: -1.5 * np.ones_like(p[..., 0]))
        )
        self.b1 = boundary_load_vector(V_x, g1, markers[2])
        self.b2 = boundary_load_vector(V_x, g2, markers[3])
        self.bc = DirichletBC(V_x, (0.0, 0.0), lambda p: abs(p[0]) < 1e-9)
        self._spla = spla

    def __call__(self, values):
        lam_p, lam_E, nu = values
        E = lam_E * self.params["E_0"]
        A = E * (NU1(nu) * self.K1 + NU2(nu) * self.K2)
        b = lam_p * (self.b1 + self.b2)
        A, b = self.bc.apply_system(A, b)
        u = self._spla.spsolve(A.tocsr(), b)
        uf = Function(self.V_x, u)
        if self.x_values:
            return np.stack([np.asarray(uf(np.asarray(x))) for x in self.x_values])
        return uf


class TestSolverProblem(unittest.TestCase):
    def setUp(self):
        self.ords = [2, 1, 1, 1]
        self.ranges = [[0.0, 2.0], [0.5, 1.5], [0.1, 0.4]]  # p, E, nu
        self.numElems = [2, 50, 50]
        self.meshX = [60, 6]  # (reference: [200, 20])
        self.params = {"E_0": 30000}
        self.p = 1.5
        self.E = 0.75
        self.nu = 0.2
        self.x = (L[0] / 2, L[1] / 2)

    def test_solver_options(self):
        _, v_x = create_meshX(self.meshX, self.ords[0])
        _, v_e = create_meshesExtra(self.numElems, self.ords[1:4], self.ranges)
        vs = [v_x] + v_e

        pgd_prob_lin, pgd_s_lin = main_PGD(vs, self.params, problem="linear")
        pgd_prob_nl, pgd_s_nl = main_PGD(
            vs, self.params, problem="nonlinear", settings={"relative_tolerance": 1e-8}
        )

        print("PGD amplitudes", pgd_prob_lin.amplitude, pgd_prob_nl.amplitude)
        amplitude_diff_max = np.max(
            np.array(pgd_prob_lin.amplitude) - np.array(pgd_prob_nl.amplitude)
        )
        print("diff amplitudes", amplitude_diff_max)
        self.assertTrue(amplitude_diff_max < 1e-8)

        # error vs full FEM at one parameter point
        ref_fem = FEM_reference(v_x, self.params)
        pgd_u = pgd_s_lin.evaluate(0, [1, 2, 3], [self.p, self.E, self.nu], 0)
        ref_u = ref_fem([self.p, self.E, self.nu])
        error_point = np.linalg.norm(
            np.asarray(pgd_u(np.asarray(self.x))) - np.asarray(ref_u(np.asarray(self.x)))
        ) / np.linalg.norm(np.asarray(ref_u(np.asarray(self.x))))
        errorL2 = np.linalg.norm(
            pgd_u.compute_vertex_values() - ref_u.compute_vertex_values(), 2
        ) / np.linalg.norm(ref_u.compute_vertex_values(), 2)
        print(error_point, errorL2, pgd_prob_lin.amplitude[-2])

        self.assertTrue(error_point < pgd_prob_lin.amplitude[-2])
        self.assertTrue(errorL2 < pgd_prob_lin.amplitude[-2])

        # PGDErrorComputation vs manual computation
        error_class = PGDErrorComputation(
            fixed_dim=[0],
            data_test=[[self.p, self.E, self.nu]],
            FOM_model=ref_fem,
            PGD_model=pgd_s_lin,
        )
        errors, mean_errorL2, max_errorL2 = error_class.evaluate_error()
        self.assertAlmostEqual(max_errorL2, errorL2, places=8)

        # point-restricted comparison
        ref_fem.x_values = [self.x]
        error_class.fixed_var = [self.x]
        errors, mean_errorL2, max_errorL2 = error_class.evaluate_error()
        self.assertAlmostEqual(max_errorL2, error_point, places=8)

        # random LHS samples over parameters
        ref_fem.x_values = []
        error_random = PGDErrorComputation(
            fixed_dim=[0], n_samples=10, FOM_model=ref_fem, PGD_model=pgd_s_lin
        )
        _, mean_errorL2, max_errorL2 = error_random.evaluate_error()
        print(mean_errorL2, max_errorL2)
        self.assertTrue(mean_errorL2 < pgd_prob_lin.amplitude[-2])
        self.assertTrue(max_errorL2 < pgd_prob_lin.amplitude[-2])


if __name__ == "__main__":
    unittest.main()
