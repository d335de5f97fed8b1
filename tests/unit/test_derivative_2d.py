"""2D / vector derivative parity (VERDICT r3 missing #2): exact grad
projection onto DG spaces, fixed-dim derivative evaluation through the
model layer, and served derivative/strain sweeps.

Reference: create_derivation_fct projects f.dx(0) (scalar) / grad(f)
(vector → DG TensorFunctionSpace) onto DG(degree−1)
(reference model.py:1088-1206); evaluate_derivative refuses the fixed dim
("not possible in the moment", model.py:1232) — implemented here.
"""

import unittest

import numpy as np

from pgdrome_tpu.fem.mesh import IntervalMesh, Point, RectangleMesh
from pgdrome_tpu.fem.space import FunctionSpace, VectorFunctionSpace
from pgdrome_tpu.fem.function import Function
from pgdrome_tpu.fem.derivative import derivative_function, gradient_function
from pgdrome_tpu.fem.interpolate import eval_dofs_at_points


def _interp_scalar(V, fn):
    return Function(V, fn(V.dof_coords))


class TestGradientFunction(unittest.TestCase):
    def setUp(self):
        self.mesh = RectangleMesh(Point(0, 0), Point(2, 1), 5, 4, "crossed")
        rng = np.random.default_rng(0)
        self.pts = np.stack(
            [rng.uniform(0, 2, 150), rng.uniform(0, 1, 150)], axis=1
        )

    def test_scalar_p2_grad_exact(self):
        V = FunctionSpace(self.mesh, "P", 2)
        u = _interp_scalar(
            V, lambda xy: xy[:, 0] ** 2 + 3 * xy[:, 0] * xy[:, 1] - xy[:, 1] ** 2
        )
        G = gradient_function(u)
        self.assertEqual(G.function_space().value_size, 2)
        self.assertEqual(G.function_space().family, "DG")
        self.assertEqual(G.function_space().degree, 1)
        g = eval_dofs_at_points(G.function_space(), G.array, self.pts)
        gx = 2 * self.pts[:, 0] + 3 * self.pts[:, 1]
        gy = 3 * self.pts[:, 0] - 2 * self.pts[:, 1]
        np.testing.assert_allclose(g[:, 0], gx, atol=1e-10)
        np.testing.assert_allclose(g[:, 1], gy, atol=1e-10)

    def test_scalar_p1_grad_dg0(self):
        V = FunctionSpace(self.mesh, "P", 1)
        u = _interp_scalar(V, lambda xy: 2 * xy[:, 0] - 5 * xy[:, 1])
        G = gradient_function(u)
        self.assertEqual(G.function_space().degree, 0)
        g = eval_dofs_at_points(G.function_space(), G.array, self.pts)
        np.testing.assert_allclose(g[:, 0], 2.0, atol=1e-12)
        np.testing.assert_allclose(g[:, 1], -5.0, atol=1e-12)

    def test_derivative_function_direction(self):
        V = FunctionSpace(self.mesh, "P", 2)
        u = _interp_scalar(V, lambda xy: xy[:, 0] ** 2 * 0.5 + xy[:, 1] ** 2)
        d0 = derivative_function(u, 0)
        d1 = derivative_function(u, 1)
        self.assertEqual(d0.function_space().value_size, 1)
        v0 = eval_dofs_at_points(d0.function_space(), d0.array, self.pts)
        v1 = eval_dofs_at_points(d1.function_space(), d1.array, self.pts)
        np.testing.assert_allclose(v0, self.pts[:, 0], atol=1e-10)
        np.testing.assert_allclose(v1, 2 * self.pts[:, 1], atol=1e-10)
        with self.assertRaises(ValueError):
            derivative_function(u, 2)

    def test_vector_p2_grad_tensor(self):
        V = VectorFunctionSpace(self.mesh, "P", 2)
        xy = V.dof_coords
        arr = np.zeros(V.dim())
        arr[0::2] = xy[:, 0] ** 2 + xy[:, 1]  # u_x
        arr[1::2] = xy[:, 0] * xy[:, 1]  # u_y
        u = Function(V, arr)
        G = derivative_function(u)  # vector source → full grad tensor
        self.assertEqual(G.function_space().value_size, 4)
        g = eval_dofs_at_points(G.function_space(), G.array, self.pts)
        # row-major: [du_x/dx, du_x/dy, du_y/dx, du_y/dy]
        exact = np.stack(
            [
                2 * self.pts[:, 0],
                np.ones(len(self.pts)),
                self.pts[:, 1],
                self.pts[:, 0],
            ],
            axis=1,
        )
        np.testing.assert_allclose(g, exact, atol=1e-10)

    def test_1d_unchanged(self):
        V = FunctionSpace(IntervalMesh(10, 0, 1), "P", 2)
        u = Function(V, V.dof_coords[:, 0] ** 2)
        D = derivative_function(u)
        q = np.linspace(0.01, 0.99, 37)
        np.testing.assert_allclose(
            eval_dofs_at_points(D.function_space(), D.array, q), 2 * q,
            atol=1e-12,
        )


class TestModelLayerFixedDimDerivative(unittest.TestCase):
    """evaluate_derivative / evaluate_derivative_sensor_response with
    d_dim == fixed_dim (2D space dim)."""

    def _build_pgd(self, vector=False):
        from pgdrome_tpu.model import PGD

        mesh = RectangleMesh(Point(0, 0), Point(1, 1), 4, 4, "crossed")
        Vx = (
            VectorFunctionSpace(mesh, "P", 2)
            if vector
            else FunctionSpace(mesh, "P", 2)
        )
        Vp = FunctionSpace(IntervalMesh(8, 1.0, 2.0), "P", 1)
        K = 3
        rng = np.random.default_rng(5)
        if vector:
            modes_x = []
            for _ in range(K):
                c = rng.uniform(-1, 1, 6)
                xy = Vx.dof_coords
                arr = np.zeros(Vx.dim())
                arr[0::2] = c[0] * xy[:, 0] ** 2 + c[1] * xy[:, 1]
                arr[1::2] = c[2] * xy[:, 0] * xy[:, 1] + c[3]
                modes_x.append(Function(Vx, arr))
        else:
            modes_x = [
                _interp_scalar(
                    Vx,
                    lambda xy, c=rng.uniform(-1, 1, 3): c[0] * xy[:, 0] ** 2
                    + c[1] * xy[:, 0] * xy[:, 1]
                    + c[2] * xy[:, 1] ** 2,
                )
                for _ in range(K)
            ]
        modes_p = [
            Function(Vp, rng.standard_normal(Vp.dim())) for _ in range(K)
        ]
        pgd = PGD(
            name="d2d",
            n_modes=K,
            fmeshes=[mesh, Vp.mesh()],
            pgd_modes=[modes_x, modes_p],
            name_coord=["X", "P"],
            modes_info=["U", "Node", "Vector" if vector else "Scalar"],
            spaces=[Vx, Vp],
        )
        return pgd, Vx, Vp, modes_x, modes_p

    def test_scalar_fixed_dim_gradient_field(self):
        pgd, Vx, Vp, modes_x, modes_p = self._build_pgd()
        p = [1.37]
        # scalar modes: create_derivation_fct keeps the reference's
        # f.dx(0) semantics — the field is du/dx
        D = pgd.evaluate_derivative(0, [1], p, 0, d_dim=0)
        fk = np.array(
            [
                eval_dofs_at_points(Vp, m.array, np.asarray(p))[0]
                for m in modes_p
            ]
        )
        pts = np.array([[0.31, 0.62], [0.77, 0.18]])
        served = eval_dofs_at_points(D.function_space(), D.array, pts)
        manual = np.zeros_like(served)
        for k, mx in enumerate(modes_x):
            G = gradient_function(mx)
            manual += fk[k] * np.asarray(
                eval_dofs_at_points(G.function_space(), G.array, pts)
            )[:, 0]
        np.testing.assert_allclose(served, manual, atol=1e-12)

    def test_scalar_sensor_response_fixed_dim(self):
        pgd, Vx, Vp, modes_x, modes_p = self._build_pgd()
        p = [1.81]
        pts = np.array([[0.5, 0.5], [0.25, 0.75], [0.9, 0.1]])
        out = pgd.evaluate_derivative_sensor_response(0, [1], p, 0, 0, pts)
        fk = np.array(
            [
                eval_dofs_at_points(Vp, m.array, np.asarray(p))[0]
                for m in modes_p
            ]
        )
        manual = np.zeros(3)
        for k, mx in enumerate(modes_x):
            G = gradient_function(mx)
            manual += fk[k] * np.asarray(
                eval_dofs_at_points(G.function_space(), G.array, pts)
            )[:, 0]
        np.testing.assert_allclose(out, manual, atol=1e-12)

    def test_scalar_direction_1(self):
        # model-layer access to ∂/∂x1 for 2D scalar dims: the direction
        # parameter of create_derivation_fct (the reference hardcodes
        # dx(0); serving gradient() was previously the only way)
        pgd, Vx, Vp, modes_x, modes_p = self._build_pgd()
        pgd.create_derivation_fct([0], 0, direction=1)
        p = [1.37]
        D = pgd.evaluate_derivative(0, [1], p, 0, d_dim=0)
        fk = np.array(
            [
                eval_dofs_at_points(Vp, m.array, np.asarray(p))[0]
                for m in modes_p
            ]
        )
        pts = np.array([[0.31, 0.62], [0.77, 0.18]])
        served = eval_dofs_at_points(D.function_space(), D.array, pts)
        manual = np.zeros_like(served)
        for k, mx in enumerate(modes_x):
            G = gradient_function(mx)
            manual += fk[k] * np.asarray(
                eval_dofs_at_points(G.function_space(), G.array, pts)
            )[:, 1]  # the x1 component
        np.testing.assert_allclose(served, manual, atol=1e-12)

    def test_vector_fixed_dim_tensor(self):
        pgd, Vx, Vp, modes_x, modes_p = self._build_pgd(vector=True)
        D = pgd.evaluate_derivative(0, [1], [1.5], 0, d_dim=0)
        self.assertEqual(D.function_space().value_size, 4)

    def test_free_dim_derivative_still_works(self):
        pgd, Vx, Vp, modes_x, modes_p = self._build_pgd()
        # d/dp of the parameter factor, evaluated as a field over X
        D = pgd.evaluate_derivative(0, [1], [1.5], 0, d_dim=1)
        fpk = np.array(
            [
                eval_dofs_at_points(
                    Vp, m.array, np.asarray([1.5]), derivative=True
                )[0]
                for m in modes_p
            ]
        )
        manual = np.zeros(Vx.dim())
        for k, mx in enumerate(modes_x):
            manual += fpk[k] * np.asarray(mx.array)
        np.testing.assert_allclose(np.asarray(D.array), manual, atol=1e-12)


class TestServedDerivatives(unittest.TestCase):
    """Vademecum.derivative()/gradient()/strain() on 2D dim-0 spaces."""

    def _vademecum(self, vector=False):
        from pgdrome_tpu.separated import PGDResult
        from pgdrome_tpu.serving import Vademecum

        mesh = RectangleMesh(Point(0, 0), Point(1, 1), 3, 3, "crossed")
        Vx = (
            VectorFunctionSpace(mesh, "P", 2)
            if vector
            else FunctionSpace(mesh, "P", 2)
        )
        Vp = FunctionSpace(IntervalMesh(6, 1.0, 2.0), "P", 1)
        K = 3
        rng = np.random.default_rng(9)
        m0 = rng.standard_normal((K, Vx.dim())).astype(np.float32)
        m1 = rng.standard_normal((K, Vp.dim())).astype(np.float32)
        res = PGDResult(
            modes=[m0, m1],
            n_modes=K,
            amplitudes=np.ones(K),
            alpha=np.ones(K),
            fp_its=np.ones(K, dtype=int),
            normU0=1.0,
        )
        return Vademecum([Vx, Vp], res), Vx, Vp, m0, m1

    def test_served_gradient_parity(self):
        vd, Vx, Vp, m0, m1 = self._vademecum()
        dvd = vd.gradient()
        samples = np.array([[1.2], [1.9]], dtype=np.float32)
        fields = np.asarray(dvd.fields(samples))  # (B, ndg*2)
        # manual
        fac = np.stack(
            [
                np.asarray(
                    eval_dofs_at_points(Vp, m1[k], samples[:, 0])
                )
                for k in range(3)
            ],
            axis=1,
        )  # (B, K)
        gm = np.stack(
            [
                np.asarray(
                    gradient_function(Function(Vx, m0[k].astype(np.float64))).array
                )
                for k in range(3)
            ]
        )  # (K, ndg*2)
        manual = fac @ gm
        np.testing.assert_allclose(fields, manual, rtol=2e-5, atol=2e-5)

    def test_served_strain_voigt(self):
        vd, Vx, Vp, m0, m1 = self._vademecum(vector=True)
        svd = vd.strain()
        self.assertEqual(svd.spaces[0].value_size, 3)
        samples = np.array([[1.5]], dtype=np.float32)
        eps = np.asarray(svd.fields(samples)).reshape(-1, 3)
        # parity vs the grad tensor sweep: ε_xx=g0, ε_yy=g3, γ_xy=g1+g2
        g = np.asarray(vd.derivative().fields(samples)).reshape(-1, 4)
        # f32 serving: two computation orders agree to f32 roundoff
        np.testing.assert_allclose(eps[:, 0], g[:, 0], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(eps[:, 1], g[:, 3], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(
            eps[:, 2], g[:, 1] + g[:, 2], rtol=1e-5, atol=1e-4
        )

    def test_strain_requires_vector(self):
        vd, *_ = self._vademecum(vector=False)
        with self.assertRaises(ValueError):
            vd.strain()


if __name__ == "__main__":
    unittest.main()
