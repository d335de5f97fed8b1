"""HOST-path nonlinear coverage (restored per round-3 code review):
FD-Newton on residual-form callbacks (newton_solve_np, Bratu), Picard on
quasi-linear systems (picard_solve_np), and a genuinely nonlinear
separated problem through PGDProblem's 'nonlinear' dispatch.  The
device-path analogues live in test_nonlinear.py (solver='newton' +
the separable `nonlinear` hook)."""

import numpy as np

from pgdrome_tpu import (
    IntervalMesh,
    FunctionSpace,
    DirichletBC,
    PGDProblem,
    mass_matrix,
    stiffness_matrix,
    load_vector,
)
from pgdrome_tpu.ops.solvers import newton_solve_np, picard_solve_np


class TestNewtonNP:
    def test_bratu_style_1d(self):
        # -u'' + u³ = f with manufactured u = sin(pi x), homogeneous bc
        mesh = IntervalMesh(40, 0.0, 1.0)
        V = FunctionSpace(mesh, "P", 2)
        K = stiffness_matrix(V)
        M = mass_matrix(V)
        x = V.tabulate_dof_coordinates()[:, 0]
        u_ex = np.sin(np.pi * x)
        # weak rhs: ∫(pi² sin + sin³) φ  (consistent with the discrete
        # nonlinearity M u³ to FE accuracy)
        f = load_vector(
            V, lambda s: np.pi**2 * np.sin(np.pi * s) + np.sin(np.pi * s) ** 3
        )
        bc = DirichletBC(V, 0.0, lambda s, onb: onb)

        def residual(u):
            return K @ u + M @ (u**3) - f

        u, converged, its = newton_solve_np(
            residual, np.zeros(V.dim()), bc.dofs, bc.values, atol=1e-12
        )
        assert converged
        err = np.linalg.norm(u - u_ex) / np.linalg.norm(u_ex)
        print("bratu newton err:", err, "its:", its)
        assert err < 1e-3  # FE discretization level

    def test_picard_quasilinear(self):
        # (1 + 0.5|u|) u = b  solved by Picard
        rng = np.random.default_rng(0)
        n = 12
        A0 = np.eye(n) * 2.0
        b = rng.normal(size=n)

        def system(u):
            return A0 + 0.5 * np.diag(np.abs(u)), b

        u, converged, its = picard_solve_np(system, np.zeros(n), atol=1e-14)
        assert converged
        res = (A0 + 0.5 * np.diag(np.abs(u))) @ u - b
        assert np.linalg.norm(res) < 1e-10


class TestNonlinearPGDPath:
    def test_residual_form_callbacks(self):
        # a genuinely nonlinear separated problem through the solver's
        # 'nonlinear' dispatch: BOTH dims' callbacks return residual
        # VECTORS (the reference's form-evaluated-at-u semantics), with the
        # cubic term consistently projected onto each dimension
        mesh_x = IntervalMesh(24, 0.0, 1.0)
        Vx = FunctionSpace(mesh_x, "P", 1)
        mesh_q = IntervalMesh(6, 0.5, 1.5)
        Vq = FunctionSpace(mesh_q, "P", 1)
        K = stiffness_matrix(Vx)
        Mx = mass_matrix(Vx)
        Mq = mass_matrix(Vq)
        bx = load_vector(Vx, lambda s: np.ones_like(s))
        bq = load_vector(Vq, lambda q: q)

        eps = 0.1  # weak cubic term keeps the alternation contractive

        def lhs(fct_F, var_F, Fs, meshes, dom, param, typ, dim):
            u = fct_F.array
            if typ == "r":
                c = float(Fs[1].array @ (Mq @ Fs[1].array))
                c3 = float(Fs[1].array @ (Mq @ Fs[1].array**3))
                return c * (K @ u) + eps * c3 * (Mx @ (u**3))
            d = float(Fs[0].array @ (K @ Fs[0].array))
            d3 = float(Fs[0].array @ (Mx @ Fs[0].array**3))
            return d * (Mq @ u) + eps * d3 * (Mq @ (u**3))

        def rhs(fct_F, var_F, Fs, meshes, dom, param, load, PGD_func, typ, n_enr, dim):
            if typ == "r":
                return float(Fs[1].array @ bq) * bx
            return float(Fs[0].array @ bx) * bq

        def bc_fct(Vs, dom, param):
            return [DirichletBC(Vs[0], 0.0, lambda s, onb: onb), 0]

        prob = PGDProblem(
            name="nl",
            name_coord=["X", "Q"],
            modes_info=["U", "Node", "Scalar"],
            Vs=[Vx, Vq],
            bc_fct=bc_fct,
            load=None,
            param={},
            rhs_fct=rhs,
            lhs_fct=lhs,
            probs=["r", "s"],
            seq_fp=[0, 1],
            PGD_nmax=1,
        )
        prob.tol_fp_it = 1e-12
        prob.max_fp_it = 100
        # keep the raw fixed point: renormalizing factors rescales the
        # CUBIC term differently from the linear ones
        prob.norm_modes = "no"
        prob.solve_PGD(
            _problem="nonlinear",
            settings={"absolute_tolerance": 1e-14, "relative_tolerance": 1e-13},
        )

        # the produced rank-1 pair must satisfy the nonlinear x-equation
        F0 = prob.PGD_func[0][0].array
        F1 = prob.PGD_func[1][0].array
        c = float(F1 @ (Mq @ F1))
        c3 = float(F1 @ (Mq @ F1**3))
        r = c * (K @ F0) + eps * c3 * (Mx @ (F0**3)) - float(F1 @ bq) * bx
        r[bc_fct([Vx, Vq], 0, {})[0].dofs] = 0.0
        rel = np.linalg.norm(r) / np.linalg.norm(float(F1 @ bq) * bx)
        print("nonlinear PGD residual:", rel)
        assert rel < 1e-8
