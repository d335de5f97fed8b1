"""1D transient heat X⊗T⊗Q with Goldak source: FEM-in-time vs FD-upwind
hybrid (solve_modes=["FEM","FD","FEM"]).

Mirrors reference tests/integration/test_heat1D.py: heating and cooling
cases against a backward-Euler FEM reference; asserted errors
heating < 1e-3 (space) / < 1e-2 (time), cooling < 1e-6 / < 5e-6
(test_heat1D.py:804-807, 903-904)."""

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
    advection_matrix,
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
    initCond = DirichletBC(Vs[1], 0, lambda t: t < 0.0 + 1e-5)
    return [0, initCond, 0]


# -------------------------------------------------------------- FEM in time

def problem_assemble_lhs_FEM(fct_F, var_F, Fs, meshes, dom, param, typ, dim):
    Mx, Kx = param["M_x"], param["K_x"]
    Mt, At = param["M_t_fem"], param["A_t"]
    Mq = param["M_q"]
    rc, k = param["rho"] * param["cp"], param["k"]
    if typ == "r":
        return (
            gram(Fs[1], At, Fs[1]) * gram(Fs[2], Mq, Fs[2]) * rc * Mx
            + gram(Fs[1], Mt, Fs[1]) * gram(Fs[2], Mq, Fs[2]) * k * Kx
        )
    if typ == "s":
        return (
            gram(Fs[0], Mx, Fs[0]) * gram(Fs[2], Mq, Fs[2]) * rc * At
            + gram(Fs[0], Kx, Fs[0]) * gram(Fs[2], Mq, Fs[2]) * k * Mt
        )
    if typ == "w":
        return (
            gram(Fs[0], Mx, Fs[0]) * gram(Fs[1], At, Fs[1]) * rc * Mq
            + gram(Fs[0], Kx, Fs[0]) * gram(Fs[1], Mt, Fs[1]) * k * Mq
        )


def problem_assemble_rhs_FEM(fct_F, var_F, Fs, meshes, dom, param, Q, PGD_func, typ, nE, dim):
    Mx, Kx = param["M_x"], param["K_x"]
    Mt, At = param["M_t_fem"], param["A_t"]
    Mq = param["M_q"]
    rc, k = param["rho"] * param["cp"], param["k"]
    IC = [param["IC_x"], param["IC_t"], param["IC_q"]]

    if typ == "r":
        l = (
            gram(Fs[1], Mt, Q[1]) * gram(Fs[2], Mq, Q[2]) * (Mx @ Q[0].array)
            - gram(Fs[1], At, IC[1]) * gram(Fs[2], Mq, IC[2]) * rc * (Mx @ IC[0].array)
            - gram(Fs[1], Mt, IC[1]) * gram(Fs[2], Mq, IC[2]) * k * (Kx @ IC[0].array)
        )
        for o in range(nE):
            l -= gram(Fs[1], At, PGD_func[1][o]) * gram(Fs[2], Mq, PGD_func[2][o]) * rc * (
                Mx @ PGD_func[0][o].array
            )
            l -= gram(Fs[1], Mt, PGD_func[1][o]) * gram(Fs[2], Mq, PGD_func[2][o]) * k * (
                Kx @ PGD_func[0][o].array
            )
        return l
    if typ == "s":
        l = (
            gram(Fs[0], Mx, Q[0]) * gram(Fs[2], Mq, Q[2]) * (Mt @ Q[1].array)
            - gram(Fs[0], Mx, IC[0]) * gram(Fs[2], Mq, IC[2]) * rc * (At @ IC[1].array)
            - gram(Fs[0], Kx, IC[0]) * gram(Fs[2], Mq, IC[2]) * k * (Mt @ IC[1].array)
        )
        for o in range(nE):
            l -= gram(Fs[0], Mx, PGD_func[0][o]) * gram(Fs[2], Mq, PGD_func[2][o]) * rc * (
                At @ PGD_func[1][o].array
            )
            l -= gram(Fs[0], Kx, PGD_func[0][o]) * gram(Fs[2], Mq, PGD_func[2][o]) * k * (
                Mt @ PGD_func[1][o].array
            )
        return l
    if typ == "w":
        l = (
            gram(Fs[0], Mx, Q[0]) * gram(Fs[1], Mt, Q[1]) * (Mq @ Q[2].array)
            - gram(Fs[0], Mx, IC[0]) * gram(Fs[1], At, IC[1]) * rc * (Mq @ IC[2].array)
            - gram(Fs[0], Kx, IC[0]) * gram(Fs[1], Mt, IC[1]) * k * (Mq @ IC[2].array)
        )
        for o in range(nE):
            l -= gram(Fs[0], Mx, PGD_func[0][o]) * gram(Fs[1], At, PGD_func[1][o]) * rc * (
                Mq @ PGD_func[2][o].array
            )
            l -= gram(Fs[0], Kx, PGD_func[0][o]) * gram(Fs[1], Mt, PGD_func[1][o]) * k * (
                Mq @ PGD_func[2][o].array
            )
        return l


# --------------------------------------------------- FD (upwind) in time

def problem_assemble_lhs_FDtime(fct_F, var_F, Fs, meshes, dom, param, typ, dim):
    Mx, Kx = param["M_x"], param["K_x"]
    Mt, Dt = param["M_t"], param["D1_up_t"]
    Mq = param["M_q"]
    rc, k = param["rho"] * param["cp"], param["k"]
    F1 = Fs[1].array
    if typ == "r":
        a1 = F1 @ Dt @ F1
        a2 = F1 @ Mt @ F1
        return (
            a1 * gram(Fs[2], Mq, Fs[2]) * rc * Mx
            + a2 * gram(Fs[2], Mq, Fs[2]) * k * Kx
        )
    if typ == "s":
        a = (
            gram(Fs[0], Mx, Fs[0]) * gram(Fs[2], Mq, Fs[2]) * rc * Dt
            + gram(Fs[0], Kx, Fs[0]) * gram(Fs[2], Mq, Fs[2]) * k * Mt
        )
        return apply_matrix_bc(a, param["bc_idx"])
    if typ == "w":
        a1 = F1 @ Dt @ F1
        a2 = F1 @ Mt @ F1
        return (
            gram(Fs[0], Mx, Fs[0]) * a1 * rc * Mq
            + gram(Fs[0], Kx, Fs[0]) * a2 * k * Mq
        )


def problem_assemble_rhs_FDtime(fct_F, var_F, Fs, meshes, dom, param, Q, PGD_func, typ, nE, dim):
    Mx, Kx = param["M_x"], param["K_x"]
    Mt, Dt = param["M_t"], param["D1_up_t"]
    Mq = param["M_q"]
    rc, k = param["rho"] * param["cp"], param["k"]
    IC = [param["IC_x"], param["IC_t"], param["IC_q"]]
    F1 = Fs[1].array

    if typ == "r":
        betha_1 = F1 @ Mt @ Q[1].array
        alpha_1 = F1 @ Dt @ IC[1].array
        alpha_2 = F1 @ Mt @ IC[1].array
        l = (
            betha_1 * gram(Fs[2], Mq, Q[2]) * (Mx @ Q[0].array)
            - alpha_1 * gram(Fs[2], Mq, IC[2]) * rc * (Mx @ IC[0].array)
            - alpha_2 * gram(Fs[2], Mq, IC[2]) * k * (Kx @ IC[0].array)
        )
        for o in range(nE):
            ao1 = F1 @ Dt @ PGD_func[1][o].array
            ao2 = F1 @ Mt @ PGD_func[1][o].array
            l -= ao1 * gram(Fs[2], Mq, PGD_func[2][o]) * rc * (Mx @ PGD_func[0][o].array)
            l -= ao2 * gram(Fs[2], Mq, PGD_func[2][o]) * k * (Kx @ PGD_func[0][o].array)
        return l
    if typ == "s":
        l = (
            gram(Fs[0], Mx, Q[0]) * gram(Fs[2], Mq, Q[2]) * (Mt @ Q[1].array)
            - gram(Fs[0], Mx, IC[0]) * gram(Fs[2], Mq, IC[2]) * rc * (Dt @ IC[1].array)
            - gram(Fs[0], Kx, IC[0]) * gram(Fs[2], Mq, IC[2]) * k * (Mt @ IC[1].array)
        )
        for o in range(nE):
            l -= gram(Fs[0], Mx, PGD_func[0][o]) * gram(Fs[2], Mq, PGD_func[2][o]) * rc * (
                Dt @ PGD_func[1][o].array
            )
            l -= gram(Fs[0], Kx, PGD_func[0][o]) * gram(Fs[2], Mq, PGD_func[2][o]) * k * (
                Mt @ PGD_func[1][o].array
            )
        return apply_vector_bc(l, param["bc_idx"])
    if typ == "w":
        betha_1 = F1 @ Mt @ Q[1].array
        alpha_1 = F1 @ Dt @ IC[1].array
        alpha_2 = F1 @ Mt @ IC[1].array
        l = (
            gram(Fs[0], Mx, Q[0]) * betha_1 * (Mq @ Q[2].array)
            - gram(Fs[0], Mx, IC[0]) * alpha_1 * rc * (Mq @ IC[2].array)
            - gram(Fs[0], Kx, IC[0]) * alpha_2 * k * (Mq @ IC[2].array)
        )
        for o in range(nE):
            ao1 = F1 @ Dt @ PGD_func[1][o].array
            ao2 = F1 @ Mt @ PGD_func[1][o].array
            l -= gram(Fs[0], Mx, PGD_func[0][o]) * ao1 * rc * (Mq @ PGD_func[2][o].array)
            l -= gram(Fs[0], Kx, PGD_func[0][o]) * ao2 * k * (Mq @ PGD_func[2][o].array)
        return l


def create_PGD(param, vs, q, _type):
    param = dict(param)
    param["IC_x"] = interpolate(param["IC_x"], vs[0])
    param["IC_t"] = interpolate(param["IC_t"], vs[1])
    param["IC_q"] = interpolate(param["IC_q"], vs[2])

    q_x = interpolate(q, vs[0])
    q_t = interpolate(lambda t: np.ones_like(t), vs[1])
    q_q = interpolate(lambda qq: qq * param["Q"], vs[2])

    # shared operators (assembled once)
    param["M_x"] = mass_matrix(vs[0])
    param["K_x"] = stiffness_matrix(vs[0])
    param["M_q"] = mass_matrix(vs[2])

    if _type == "FEM":
        param["M_t_fem"] = mass_matrix(vs[1])
        param["A_t"] = advection_matrix(vs[1])
        ass_rhs, ass_lhs = problem_assemble_rhs_FEM, problem_assemble_lhs_FEM
        solve_modes = ["FEM", "FEM", "FEM"]
    elif _type == "FDtime":
        t_dofs = vs[1].tabulate_dof_coordinates()[:, 0]  # sorted ascending
        M_t, _, D1_up_t = FD_matrices(t_dofs)
        param["M_t"], param["D1_up_t"] = M_t, D1_up_t
        param["bc_idx"] = np.where(t_dofs == 0)[0]
        ass_rhs, ass_lhs = problem_assemble_rhs_FDtime, problem_assemble_lhs_FDtime
        solve_modes = ["FEM", "FD", "FEM"]

    pgd_prob = PGDProblem(
        name="1DHeatEqu-PGD-XTQ",
        name_coord=["X", "T", "Q"],
        modes_info=["T", "Node", "Scalar"],
        Vs=vs,
        dom=0,
        bc_fct=create_bc,
        load=[q_x, q_t, q_q],
        param=param,
        rhs_fct=ass_rhs,
        lhs_fct=ass_lhs,
        probs=["r", "s", "w"],
        seq_fp=list(range(3)),
        PGD_nmax=20,
    )
    if _type == "FDtime":
        pgd_prob.MM = [0, param["M_t"], 0]
    pgd_prob.stop_fp = "norm"
    pgd_prob.max_fp_it = 50
    pgd_prob.tol_fp_it = 1e-5
    pgd_prob.norm_modes = "stiff"
    pgd_prob.PGD_tol = 1e-5

    pgd_prob.solve_PGD(_problem="linear", solve_modes=solve_modes)
    return pgd_prob.return_PGD(), param


class Reference:
    """Backward-Euler FEM-in-space reference (test_heat1D.py:561-624)."""

    def __init__(self, param={}, vs=[], q=None, x_fixed=None):
        self.vs = vs
        self.param = param
        self.q = q
        self.time_mesh = vs[1].mesh().coordinates()[:, 0]
        self.T_n0 = interpolate(param["Tamb_fct"], vs[0])
        self.M = mass_matrix(vs[0])
        self.K = stiffness_matrix(vs[0])
        from pgdrome_tpu.fem.assembly import load_vector

        self.b_q = load_vector(vs[0], q)
        self.fixed_x = x_fixed

    def __call__(self, values):
        rc = self.param["rho"] * self.param["cp"]
        k = self.param["k"]
        Qfac = values[1] * self.param["Q"]
        T_n = self.T_n0.array.copy()
        Ttime = [T_n.copy()]
        Txfixed = [float(Function(self.vs[0], T_n)(self.fixed_x))]
        for i in range(len(self.time_mesh) - 1):
            dt = self.time_mesh[i + 1] - self.time_mesh[i]
            A = rc * self.M + dt * k * self.K
            b = dt * Qfac * self.b_q + rc * (self.M @ T_n)
            T_n = np.linalg.solve(A, b)
            Ttime.append(T_n.copy())
            Txfixed.append(float(Function(self.vs[0], T_n)(self.fixed_x)))
        return Ttime, np.array(Txfixed)


class problem(unittest.TestCase):
    def setUp(self):
        self.param = {
            "rho": 1,
            "cp": 1,
            "k": 0.5,
            "Tamb": 25,
            "Q": 1,
            "af": 0.2,
            "ar": 0.2,
            "xc": 0.5,
            "lx": 1,
            "lt": 1,
        }
        self.ranges = [[0.0, 1.0], [0.0, 1.0], [0.5, 1.0]]
        self.ords = [1, 1, 1]
        self.elems = [15, 10, 10]
        self.fixed_dim = 0
        self.t_fixed = 0.9
        self.q_fixed = 1.0
        self.x_fixed = 0.5

    def test_heating(self):
        p = self.param
        ff = 6 * np.sqrt(3) / ((p["af"] + p["ar"]) * p["af"] ** 2 * np.pi ** 1.5)
        q = lambda x: ff * np.exp(-3 * (x - p["xc"]) ** 2 / p["af"] ** 2)

        p = dict(p)
        p["Tamb_fct"] = lambda x: p["Tamb"] * np.ones_like(x)
        p["IC_t"] = lambda t: p["Tamb"] * np.ones_like(t)
        p["IC_x"] = lambda x: np.ones_like(x)
        p["IC_q"] = lambda qq: np.ones_like(qq)

        meshes, vs = create_meshes(self.elems, self.ords, self.ranges)
        pgd_fem, param_fem = create_PGD(p, vs, q, "FEM")
        pgd_fd, param_fd = create_PGD(p, vs, q, "FDtime")

        tidx = np.where(meshes[1].coordinates()[:, 0] == self.t_fixed)[0][0]
        u_fem, u_fem2 = Reference(param=p, vs=vs, q=q, x_fixed=self.x_fixed)(
            [self.ranges[1][1], self.q_fixed]
        )

        def lift_space(param):
            return param["IC_x"].compute_vertex_values() * param["IC_t"](
                self.t_fixed
            ) * param["IC_q"](self.q_fixed)

        upgd_fem = pgd_fem.evaluate(0, [1, 2], [self.t_fixed, self.q_fixed], 0)
        upgd_fem_bc = upgd_fem.compute_vertex_values() + lift_space(param_fem)
        upgd_fd = pgd_fd.evaluate(0, [1, 2], [self.t_fixed, self.q_fixed], 0)
        upgd_fd_bc = upgd_fd.compute_vertex_values() + lift_space(param_fd)

        ref_sp = u_fem[tidx]
        errors_FEM11 = np.linalg.norm(upgd_fd_bc - ref_sp) / np.linalg.norm(ref_sp)
        errors_FEM12 = np.linalg.norm(upgd_fem_bc - ref_sp) / np.linalg.norm(ref_sp)
        print("error in space FD:", errors_FEM11, "FEM:", errors_FEM12)

        def lift_time(param):
            return param["IC_x"](self.x_fixed) * param["IC_t"].compute_vertex_values() * param[
                "IC_q"
            ](self.q_fixed)

        upgd_fem2 = pgd_fem.evaluate(1, [0, 2], [self.x_fixed, self.q_fixed], 0)
        upgd_fem2_bc = upgd_fem2.compute_vertex_values() + lift_time(param_fem)
        upgd_fd2 = pgd_fd.evaluate(1, [0, 2], [self.x_fixed, self.q_fixed], 0)
        upgd_fd2_bc = upgd_fd2.compute_vertex_values() + lift_time(param_fd)

        errors_FEM21 = np.linalg.norm(upgd_fd2_bc - u_fem2) / np.linalg.norm(u_fem2)
        errors_FEM22 = np.linalg.norm(upgd_fem2_bc - u_fem2) / np.linalg.norm(u_fem2)
        print("error in time FD:", errors_FEM21, "FEM:", errors_FEM22)

        self.assertTrue(errors_FEM11 < 1e-3)
        self.assertTrue(errors_FEM21 < 1e-2)
        self.assertTrue(errors_FEM12 < 1e-3)
        self.assertTrue(errors_FEM22 < 1e-2)

    def test_cooling(self):
        p = dict(self.param)
        q = lambda x: np.zeros_like(x)
        vf_a = 6 * np.sqrt(3) / (2 * p["af"] ** 3 * np.pi ** 1.5)
        p["Tamb_fct"] = lambda x: self.q_fixed * vf_a * np.exp(
            -3 * (x - p["xc"]) ** 2 / p["af"] ** 2
        )
        p["IC_t"] = lambda t: np.ones_like(t)
        p["IC_x"] = lambda x: vf_a * np.exp(-3 * (x - p["xc"]) ** 2 / p["af"] ** 2)
        p["IC_q"] = lambda qq: qq

        meshes, vs = create_meshes(self.elems, self.ords, self.ranges)
        pgd_fd, param_fd = create_PGD(p, vs, q, "FDtime")

        tidx = np.where(meshes[1].coordinates()[:, 0] == self.t_fixed)[0][0]
        u_fem, u_fem2 = Reference(param=p, vs=vs, q=q, x_fixed=self.x_fixed)(
            [self.ranges[1][1], self.q_fixed]
        )

        upgd_fd = pgd_fd.evaluate(0, [1, 2], [self.t_fixed, self.q_fixed], 0)
        upgd_fd_bc = upgd_fd.compute_vertex_values() + param_fd[
            "IC_x"
        ].compute_vertex_values() * param_fd["IC_t"](self.t_fixed) * param_fd["IC_q"](
            self.q_fixed
        )
        ref_sp = u_fem[tidx]
        errors_FEM11 = np.linalg.norm(upgd_fd_bc - ref_sp) / np.linalg.norm(ref_sp)
        print("error in space", errors_FEM11)

        upgd_fd2 = pgd_fd.evaluate(1, [0, 2], [self.x_fixed, self.q_fixed], 0)
        upgd_fd2_bc = upgd_fd2.compute_vertex_values() + param_fd["IC_x"](
            self.x_fixed
        ) * param_fd["IC_t"].compute_vertex_values() * param_fd["IC_q"](self.q_fixed)
        errors_FEM21 = np.linalg.norm(upgd_fd2_bc - u_fem2) / np.linalg.norm(u_fem2)
        print("error in time", errors_FEM21)

        self.assertTrue(errors_FEM11 < 1e-6)
        self.assertTrue(errors_FEM21 < 5e-6)


if __name__ == "__main__":
    unittest.main()
