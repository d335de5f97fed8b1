"""1D uniaxial truss PGD: u(x, lam_p, lam_E), constant load, both ends fixed.

Mirrors reference tests/integration/test_elastic.py (3 coords, P2 spaces,
'stiff' norming, 'norm' FP stop) with the TPU-native callback contract:
operators are pre-assembled once and Gram coefficients are vᵀAv
contractions.  Asserts LHS-sampled mean rel-L2 < 1e-4 vs the analytic FOM
and point error at x=0.5 < 1e-5 (reference test_elastic.py:353,380)."""

import unittest
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


def create_meshes(num_elem, ords, ranges):
    meshes, Vs = [], []
    for ne, o, r in zip(num_elem, ords, ranges):
        mesh = IntervalMesh(ne, r[0], r[1])
        meshes.append(mesh)
        Vs.append(FunctionSpace(mesh, "P", o))
    return meshes, Vs


def create_bc(Vs, dom, param):
    bc_l = DirichletBC(Vs[0], 0.0, lambda x: x < 0.0 + 1e-5)
    bc_r = DirichletBC(Vs[0], 0.0, lambda x: x > 1.0 - 1e-5)
    return [[bc_l, bc_r], 0, 0]


def problem_assemble_lhs(fct_F, var_F, Fs, meshes, dom, param, typ, dim):
    # parity with reference test_elastic.py:71-119; operators pre-assembled
    if typ == "r":
        c = gram(Fs[1], param["M_p"], Fs[1]) * gram(Fs[2], param["M_E_w"], Fs[2])
        return c * param["E_0"] * param["A"] * param["K_x"]
    if typ == "s":
        c = (
            param["E_0"]
            * param["A"]
            * gram(Fs[0], param["K_x"], Fs[0])
            * gram(Fs[2], param["M_E_w"], Fs[2])
        )
        return c * param["M_p"]
    if typ == "t":
        c = (
            param["E_0"]
            * param["A"]
            * gram(Fs[0], param["K_x"], Fs[0])
            * gram(Fs[1], param["M_p"], Fs[1])
        )
        return c * param["M_E_w"]


def problem_assemble_rhs(fct_F, var_F, Fs, meshes, dom, param, G, PGD_func, typ, nE, dim):
    # parity with reference test_elastic.py:122-219
    if typ == "r":
        l = (
            (Fs[1].array @ G[1][0])
            * (Fs[2].array @ G[2][0])
            * param["A"]
            * G[0][0]
        )
        for old in range(nE):
            c_old = gram(Fs[1], param["M_p"], PGD_func[1][old]) * gram(
                Fs[2], param["M_E_w"], PGD_func[2][old]
            )
            l = l - c_old * param["E_0"] * param["A"] * (
                param["K_x"] @ PGD_func[0][old].array
            )
        return l
    if typ == "s":
        l = (
            (Fs[0].array @ G[0][0])
            * param["A"]
            * (Fs[2].array @ G[2][0])
            * G[1][0]
        )
        for old in range(nE):
            c_old = (
                param["E_0"]
                * param["A"]
                * gram(Fs[0], param["K_x"], PGD_func[0][old])
                * gram(Fs[2], param["M_E_w"], PGD_func[2][old])
            )
            l = l - c_old * (param["M_p"] @ PGD_func[1][old].array)
        return l
    if typ == "t":
        l = (
            (Fs[0].array @ G[0][0])
            * param["A"]
            * (Fs[1].array @ G[1][0])
            * G[2][0]
        )
        for old in range(nE):
            c_old = (
                param["E_0"]
                * param["A"]
                * gram(Fs[0], param["K_x"], PGD_func[0][old])
                * gram(Fs[1], param["M_p"], PGD_func[1][old])
            )
            l = l - c_old * (param["M_E_w"] @ PGD_func[2][old].array)
        return l


def main(vs, meshes):
    param = {"A": 1.0, "p_0": 1.0, "E_0": 1.0}
    # operators assembled ONCE (the reference re-assembles them per FP step)
    param["K_x"] = stiffness_matrix(vs[0])
    param["M_p"] = mass_matrix(vs[1])
    param["M_E_w"] = mass_matrix(vs[2], weight=lambda E: E)  # Efunc = x[0]

    # separated load: g1=1 (x), g2=p0*A*p (p), g3=1 (E) as load VECTORS
    g1 = [load_vector(vs[0], lambda x: np.ones_like(x))]
    g2 = [load_vector(vs[1], lambda p: param["p_0"] * param["A"] * p)]
    g3 = [load_vector(vs[2], lambda E: np.ones_like(E))]

    pgd_prob = PGDProblem(
        name="Uniaxial1D-PGD-XPE",
        name_coord=["X", "P", "E"],
        modes_info=["U_x", "Node", "Scalar"],
        Vs=vs,
        dom=0,
        bc_fct=create_bc,
        load=[g1, g2, g3],
        param=param,
        rhs_fct=problem_assemble_rhs,
        lhs_fct=problem_assemble_lhs,
        probs=["r", "s", "t"],
        seq_fp=[0, 1, 2],
        PGD_nmax=10,
    )
    pgd_prob.stop_fp = "norm"
    pgd_prob.max_fp_it = 50
    pgd_prob.tol_fp_it = 1e-5
    pgd_prob.norm_modes = "stiff"

    pgd_prob.solve_PGD()
    return pgd_prob.return_PGD(), pgd_prob


class FOM_solution:
    def __init__(self, meshes=[], x=[]):
        self.x = x

    def __call__(self, dataset):
        return (
            1.0
            * dataset[0]
            / (2 * 1.0 * dataset[1] * 1.0)
            * (-self.x * self.x + 1.0 * self.x)
        )


class PGDproblem(unittest.TestCase):
    def setUp(self):
        self.ord = 2
        self.ords = [self.ord] * 3
        self.ranges = [[0, 1], [-1.0, 3.0], [0.2, 2.0]]
        self.fixed_dim = [0]
        self.n_samples = 10

    def test_standard_solver(self):
        meshes, vs = create_meshes([113, 2, 100], self.ords, self.ranges)
        pgd_test, pgd_prob = main(vs, meshes)

        # sampled error vs analytic FOM (reference asserts < 1e-4)
        fun_FOM = FOM_solution(meshes=meshes, x=meshes[0].coordinates()[:, 0])
        error_uPGD = PGDErrorComputation(
            fixed_dim=self.fixed_dim,
            n_samples=self.n_samples,
            FOM_model=fun_FOM,
            PGD_model=pgd_test,
        )
        error1, mean_error1, max_error1 = error_uPGD.evaluate_error()
        print("Mean error", mean_error1, "Max error", max_error1)
        self.assertTrue(mean_error1 < 1e-4)

        # point error at x = 0.5 (reference asserts < 1e-5)
        x_test = [0.5]
        data_test = [[2.0, 1.5], [1.0, 1.0]]
        fun_FOM3 = FOM_solution(meshes=meshes, x=np.array(x_test))
        error_uPGD = PGDErrorComputation(
            fixed_dim=self.fixed_dim,
            FOM_model=fun_FOM3,
            PGD_model=pgd_test,
            data_test=data_test,
            fixed_var=x_test,
        )
        error3, mean_error3, max_error3 = error_uPGD.evaluate_error()
        print("Mean error (Point)", mean_error3, "Max error (Point)", max_error3)
        self.assertTrue(mean_error3 < 1e-5)


if __name__ == "__main__":
    unittest.main()
