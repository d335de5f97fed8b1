"""FD matrices ≡ backward Euler time stepping.

Mirrors reference tests/unit/test_FD.py:147-170: the (M, D1_up) pair must
reproduce a hand-rolled backward-Euler loop to < 1e-8, and a CG1
FEM-in-time discretization must be *worse*.
"""

import numpy as np

from pgdrome_tpu import (
    IntervalMesh,
    FunctionSpace,
    Function,
    interpolate,
    mass_matrix,
    advection_matrix,
    load_vector,
    FD_matrices,
    DirichletBC,
)
from pgdrome_tpu.ops.fd import apply_matrix_bc, apply_vector_bc
from pgdrome_tpu.ops.solvers import solve_dense


PARAM = {"rho": 71.0, "c_p": 31.0, "P": 250.0, "T_amb": 25.0}


def heat_source(t):
    t = np.asarray(t, dtype=np.float64)
    return np.where((t >= 5) & (t <= 20), PARAM["P"], 0.0)


def ref_backward_euler(tpts):
    T = np.zeros(len(tpts))
    T[0] = PARAM["T_amb"]
    for i in range(1, len(tpts)):
        T[i] = T[i - 1] + (tpts[i] - tpts[i - 1]) / (
            PARAM["rho"] * PARAM["c_p"]
        ) * heat_source(tpts[i])
    return T


class TestFDMatrices:
    def setup_method(self):
        self.mesh = IntervalMesh(200, 0.0, 50.0)
        self.V = FunctionSpace(self.mesh, "P", 1)
        self.tpts = self.V.tabulate_dof_coordinates()[:, 0]

    def test_fd_equals_backward_euler(self):
        M, _, D1_up = FD_matrices(self.tpts)
        Q = np.asarray(interpolate(heat_source, self.V).array)

        IC = np.zeros(len(Q))
        IC[0] = PARAM["T_amb"]  # dofs sorted ascending: t=0 is dof 0

        A = PARAM["rho"] * PARAM["c_p"] * np.asarray(D1_up)
        F = np.asarray(M) @ Q - PARAM["rho"] * PARAM["c_p"] * np.asarray(D1_up) @ IC
        F = apply_vector_bc(F, [0])
        A = apply_matrix_bc(A, [0])
        T = solve_dense(A, F) + IC

        Tref = ref_backward_euler(self.tpts)
        err = np.linalg.norm(T - Tref) / np.sqrt(len(T))
        assert err < 1e-8

    def test_fem_in_time_worse(self):
        # CG1 FEM for rho*cp*dT/dt = q(t): A = rho cp * advection, l = Mq
        M, _, D1_up = FD_matrices(self.tpts)
        A_fem = PARAM["rho"] * PARAM["c_p"] * np.asarray(advection_matrix(self.V))
        b_fem = np.asarray(load_vector(self.V, heat_source))
        bc = DirichletBC(self.V, PARAM["T_amb"], lambda x: x < 1e-5)
        A2, b2 = bc.apply_system(A_fem, b_fem)
        T_fem = solve_dense(A2, b2)

        Q = np.asarray(interpolate(heat_source, self.V).array)
        IC = np.zeros(len(Q))
        IC[0] = PARAM["T_amb"]
        A = PARAM["rho"] * PARAM["c_p"] * np.asarray(D1_up)
        F = np.asarray(M) @ Q - PARAM["rho"] * PARAM["c_p"] * np.asarray(D1_up) @ IC
        F = apply_vector_bc(F, [0])
        A = apply_matrix_bc(A, [0])
        T_fd = solve_dense(A, F) + IC

        Tref = ref_backward_euler(self.tpts)
        err_fd = np.linalg.norm(T_fd - Tref)
        err_fem = np.linalg.norm(T_fem - Tref)
        assert err_fd < 1e-8 * np.sqrt(len(Tref))
        assert err_fem > err_fd  # FEM-in-time not useful here (reference quote)

    def test_nonuniform_mass_is_trapezoid(self):
        x = np.array([0.0, 0.3, 1.0, 1.1, 2.5])
        M, _, _ = FD_matrices(x)
        M = np.asarray(M)
        # row sums of lumped trapezoid mass = total length
        assert abs(M.sum() - 2.5) < 1e-13
        assert abs(M[0, 0] - 0.15) < 1e-13
        assert abs(M[2, 2] - (0.7 + 0.1) / 2) < 1e-13

    def test_d2_constant_second_derivative(self):
        # u = x²: M^{-1} D2 u ≈ 2 in the interior
        x = np.linspace(0, 1, 21)
        M, D2, _ = FD_matrices(x)
        u = x**2
        d2 = np.linalg.solve(np.asarray(M), np.asarray(D2) @ u)
        np.testing.assert_allclose(d2[1:-1], 2.0, atol=1e-9)
