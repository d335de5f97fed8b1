"""Dimensionless 1D transient heat (500-element mesh, FD-upwind time).

Mirrors reference tests/integration/test_heat1D_dimless.py: the scaled
equation a1·ρcp·∂T/∂t − a2·k·∂²T/∂x² = b·Q reduces the required mode count;
errors in space and time < 1e-3 (test_heat1D_dimless.py:596-597)."""

import unittest
import numpy as np

from pgdrome_tpu import (
    IntervalMesh,
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
    return [0, DirichletBC(Vs[1], 0, lambda t: t < 0.0 + 1e-5), 0]


def lhs_FDtime(fct_F, var_F, Fs, meshes, dom, param, typ, dim):
    Mx, Kx, Mq = param["M_x"], param["K_x"], param["M_q"]
    Mt, Dt = param["M_t"], param["D1_up_t"]
    c1 = param["a1"] * param["rho"] * param["cp"]
    c2 = param["a2"] * param["k"]
    F1 = Fs[1].array
    if typ == "r":
        return (F1 @ Dt @ F1) * gram(Fs[2], Mq, Fs[2]) * c1 * Mx + (
            F1 @ Mt @ F1
        ) * gram(Fs[2], Mq, Fs[2]) * c2 * Kx
    if typ == "s":
        a = (
            gram(Fs[0], Mx, Fs[0]) * gram(Fs[2], Mq, Fs[2]) * c1 * Dt
            + gram(Fs[0], Kx, Fs[0]) * gram(Fs[2], Mq, Fs[2]) * c2 * Mt
        )
        return apply_matrix_bc(a, param["bc_idx"])
    if typ == "w":
        return gram(Fs[0], Mx, Fs[0]) * (F1 @ Dt @ F1) * c1 * Mq + gram(
            Fs[0], Kx, Fs[0]
        ) * (F1 @ Mt @ F1) * c2 * Mq


def rhs_FDtime(fct_F, var_F, Fs, meshes, dom, param, Q, PGD_func, typ, nE, dim):
    Mx, Kx, Mq = param["M_x"], param["K_x"], param["M_q"]
    Mt, Dt = param["M_t"], param["D1_up_t"]
    c1 = param["a1"] * param["rho"] * param["cp"]
    c2 = param["a2"] * param["k"]
    b = param["b"]
    IC = [param["IC_x"], param["IC_t"], param["IC_q"]]
    F1 = Fs[1].array

    if typ == "r":
        l = (
            (F1 @ Mt @ Q[1].array) * gram(Fs[2], Mq, Q[2]) * b * (Mx @ Q[0].array)
            - (F1 @ Dt @ IC[1].array) * gram(Fs[2], Mq, IC[2]) * c1 * (Mx @ IC[0].array)
            - (F1 @ Mt @ IC[1].array) * gram(Fs[2], Mq, IC[2]) * c2 * (Kx @ IC[0].array)
        )
        for o in range(nE):
            l -= (F1 @ Dt @ PGD_func[1][o].array) * gram(
                Fs[2], Mq, PGD_func[2][o]
            ) * c1 * (Mx @ PGD_func[0][o].array)
            l -= (F1 @ Mt @ PGD_func[1][o].array) * gram(
                Fs[2], Mq, PGD_func[2][o]
            ) * c2 * (Kx @ PGD_func[0][o].array)
        return l
    if typ == "s":
        l = (
            gram(Fs[0], Mx, Q[0]) * gram(Fs[2], Mq, Q[2]) * b * (Mt @ Q[1].array)
            - gram(Fs[0], Mx, IC[0]) * gram(Fs[2], Mq, IC[2]) * c1 * (Dt @ IC[1].array)
            - gram(Fs[0], Kx, IC[0]) * gram(Fs[2], Mq, IC[2]) * c2 * (Mt @ IC[1].array)
        )
        for o in range(nE):
            l -= gram(Fs[0], Mx, PGD_func[0][o]) * gram(
                Fs[2], Mq, PGD_func[2][o]
            ) * c1 * (Dt @ PGD_func[1][o].array)
            l -= gram(Fs[0], Kx, PGD_func[0][o]) * gram(
                Fs[2], Mq, PGD_func[2][o]
            ) * c2 * (Mt @ PGD_func[1][o].array)
        return apply_vector_bc(l, param["bc_idx"])
    if typ == "w":
        l = (
            gram(Fs[0], Mx, Q[0]) * (F1 @ Mt @ Q[1].array) * b * (Mq @ Q[2].array)
            - gram(Fs[0], Mx, IC[0]) * (F1 @ Dt @ IC[1].array) * c1 * (Mq @ IC[2].array)
            - gram(Fs[0], Kx, IC[0]) * (F1 @ Mt @ IC[1].array) * c2 * (Mq @ IC[2].array)
        )
        for o in range(nE):
            l -= gram(Fs[0], Mx, PGD_func[0][o]) * (
                F1 @ Dt @ PGD_func[1][o].array
            ) * c1 * (Mq @ PGD_func[2][o].array)
            l -= gram(Fs[0], Kx, PGD_func[0][o]) * (
                F1 @ Mt @ PGD_func[1][o].array
            ) * c2 * (Mq @ PGD_func[2][o].array)
        return l


def create_PGD(param, vs, q):
    param = dict(param)
    param["IC_x"] = interpolate(param["IC_x"], vs[0])
    param["IC_t"] = interpolate(param["IC_t"], vs[1])
    param["IC_q"] = interpolate(param["IC_q"], vs[2])

    q_x = interpolate(q, vs[0])
    q_t = interpolate(lambda t: np.ones_like(t), vs[1])
    q_q = interpolate(lambda qq: qq * param["Q"], vs[2])

    param["M_x"] = mass_matrix(vs[0])
    param["K_x"] = stiffness_matrix(vs[0])
    param["M_q"] = mass_matrix(vs[2])
    t_dofs = vs[1].tabulate_dof_coordinates()[:, 0]
    M_t, _, D1_up_t = FD_matrices(t_dofs)
    param["M_t"], param["D1_up_t"] = M_t, D1_up_t
    param["bc_idx"] = np.where(t_dofs == 0)[0]

    pgd_prob = PGDProblem(
        name="1DHeatEqu-PGD-XTQ-dimless",
        name_coord=["X", "T", "Q"],
        modes_info=["T", "Node", "Scalar"],
        Vs=vs,
        dom=0,
        bc_fct=create_bc,
        load=[q_x, q_t, q_q],
        param=param,
        rhs_fct=rhs_FDtime,
        lhs_fct=lhs_FDtime,
        probs=["r", "s", "w"],
        seq_fp=list(range(3)),
        PGD_nmax=20,
    )
    pgd_prob.MM = [0, param["M_t"], 0]
    pgd_prob.stop_fp = "norm"
    pgd_prob.max_fp_it = 50
    pgd_prob.tol_fp_it = 1e-5
    pgd_prob.norm_modes = "stiff"
    pgd_prob.PGD_tol = 1e-9

    pgd_prob.solve_PGD(_problem="linear", solve_modes=["FEM", "FD", "FEM"])
    return pgd_prob.return_PGD(), param, pgd_prob


class Reference:
    """Backward Euler with the dimless factors
    (test_heat1D_dimless.py:365-436)."""

    def __init__(self, param={}, vs=[], q=None, x_fixed=None):
        self.vs = vs
        self.param = param
        self.time_mesh = vs[1].mesh().coordinates()[:, 0]
        self.T_n0 = interpolate(param["Tamb_fct"], vs[0])
        self.M = mass_matrix(vs[0])
        self.K = stiffness_matrix(vs[0])
        from pgdrome_tpu.fem.assembly import load_vector

        self.b_q = load_vector(vs[0], q)
        self.fixed_x = x_fixed

    def __call__(self, values):
        p = self.param
        c1 = p["a1"] * p["rho"] * p["cp"]
        c2 = p["a2"] * p["k"]
        Qfac = values[1] * p["Q"] * p["b"]
        T_n = self.T_n0.array.copy()
        Ttime = [T_n.copy()]
        Txfixed = [float(Function(self.vs[0], T_n)(self.fixed_x))]
        for i in range(len(self.time_mesh) - 1):
            dt = self.time_mesh[i + 1] - self.time_mesh[i]
            A = c1 * self.M + dt * c2 * self.K
            bb = dt * Qfac * self.b_q + c1 * (self.M @ T_n)
            T_n = np.linalg.solve(A, bb)
            Ttime.append(T_n.copy())
            Txfixed.append(float(Function(self.vs[0], T_n)(self.fixed_x)))
        return Ttime, np.array(Txfixed)


class problem(unittest.TestCase):
    def setUp(self):
        self.param = {
            "rho": 7100,
            "cp": 3100,
            "k": 100,
            "Q": 100,
            "Tamb": 25,
            "af": 0.002,
            "ar": 0.002,
            "xc": 0.05,
            "lx": 0.1,
            "lt": 10,
        }
        self.factors_o = {"x_0": 0.1, "t_0": 10.0, "T_0": 500}
        self.ranges = [
            [0.0, self.param["lx"] / self.factors_o["x_0"]],
            [0.0, self.param["lt"] / self.factors_o["t_0"]],
            [0.5, 1.0],
        ]
        self.param["a1"] = self.factors_o["T_0"] / self.factors_o["t_0"]
        self.param["a2"] = self.factors_o["T_0"] / self.factors_o["x_0"] ** 2
        self.param["b"] = 1.0
        self.ords = [1, 1, 1]
        self.elems = [500, 100, 10]
        self.t_fixed = 0.9 * self.param["lt"] / self.factors_o["t_0"]
        self.q_fixed = 1.0
        self.x_fixed = 0.5 * self.param["lx"] / self.factors_o["x_0"]

    def test_heating(self):
        p = dict(self.param)
        ff = 6 * np.sqrt(3) / (
            (p["af"] + p["ar"]) * p["af"] ** 2 * np.pi ** 1.5
        )
        dimf = self.factors_o["x_0"]
        q = lambda x: ff * np.exp(-3 * (x * dimf - p["xc"]) ** 2 / p["af"] ** 2)

        p["Tamb_fct"] = lambda x: (p["Tamb"] / self.factors_o["T_0"]) * np.ones_like(x)
        p["IC_t"] = p["Tamb_fct"]
        p["IC_x"] = lambda x: np.ones_like(x)
        p["IC_q"] = lambda qq: np.ones_like(qq)

        meshes, vs = create_meshes(self.elems, self.ords, self.ranges)
        pgd_fd, param, prob = create_PGD(p, vs, q)
        print("PGD modes (dimless):", prob.PGD_modes, "amplitudes:", prob.amplitude)

        tidx = np.where(meshes[1].coordinates()[:, 0] == self.t_fixed)[0][0]
        u_fem, u_fem2 = Reference(param=p, vs=vs, q=q, x_fixed=self.x_fixed)(
            [self.ranges[1][1], self.q_fixed]
        )

        upgd_fd = pgd_fd.evaluate(0, [1, 2], [self.t_fixed, self.q_fixed], 0)
        upgd_fd_bc = upgd_fd.compute_vertex_values() + param[
            "IC_x"
        ].compute_vertex_values() * param["IC_t"](self.t_fixed) * param["IC_q"](
            self.q_fixed
        )
        ref_sp = u_fem[tidx]
        err_space = np.linalg.norm(upgd_fd_bc - ref_sp) / np.linalg.norm(ref_sp)
        print("error in space", err_space)

        upgd_fd2 = pgd_fd.evaluate(1, [0, 2], [self.x_fixed, self.q_fixed], 0)
        upgd_fd2_bc = upgd_fd2.compute_vertex_values() + param["IC_x"](
            self.x_fixed
        ) * param["IC_t"].compute_vertex_values() * param["IC_q"](self.q_fixed)
        err_time = np.linalg.norm(upgd_fd2_bc - u_fem2) / np.linalg.norm(u_fem2)
        print("error in time", err_time)

        self.assertTrue(err_space < 1e-3)
        self.assertTrue(err_time < 1e-3)


if __name__ == "__main__":
    unittest.main()
