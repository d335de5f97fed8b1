"""FEM-layer robustness: Expression strings/params, vector bc components,
vector sensor responses, Constants, split()."""

import numpy as np
import pytest

from pgdrome_tpu import (
    IntervalMesh,
    RectangleMesh,
    Point,
    FunctionSpace,
    VectorFunctionSpace,
    Function,
    Expression,
    Constant,
    DirichletBC,
    interpolate,
)


class TestExpression:
    def test_string_1d(self):
        e = Expression("x[0]*x[0] + a", degree=2, a=1.5)
        x = np.array([0.0, 2.0])
        np.testing.assert_allclose(e(x), [1.5, 5.5])

    def test_string_param_update(self):
        e = Expression("p*x[0]", degree=1, p=2.0)
        assert e(np.array([3.0])) == 6.0
        e.p = 5.0  # dolfin-style attribute parameter update
        assert e(np.array([3.0])) == 15.0

    def test_string_2d(self):
        e = Expression("x[0] + 10*x[1]", degree=1)
        pts = np.array([[1.0, 2.0], [0.5, 0.25]])
        np.testing.assert_allclose(e(pts), [21.0, 3.0])

    def test_constant_vector(self):
        c = Constant((1.0, -2.5))
        assert c.value_size == 2
        np.testing.assert_allclose(c.values(), [1.0, -2.5])

    def test_conditional_numpy_syntax(self):
        e = Expression("where(x[0] < 0.5, 1.0, 0.0)", degree=1)
        np.testing.assert_allclose(e(np.array([0.2, 0.7])), [1.0, 0.0])


class TestVectorBC:
    def test_component_bc(self):
        mesh = RectangleMesh(Point(0, 0), Point(1, 1), 3, 3, "crossed")
        V = VectorFunctionSpace(mesh, "P", 1)
        bc = DirichletBC(V, 7.0, lambda p: abs(p[0]) < 1e-9, component=1)
        f = Function(V)
        bc.apply(f)
        arr = f.array.reshape(-1, 2)
        pts = V.tabulate_dof_coordinates()
        on_left = np.abs(pts[:, 0]) < 1e-9
        np.testing.assert_allclose(arr[on_left, 1], 7.0)
        np.testing.assert_allclose(arr[on_left, 0], 0.0)

    def test_vector_value_bc(self):
        mesh = RectangleMesh(Point(0, 0), Point(1, 1), 2, 2, "crossed")
        V = VectorFunctionSpace(mesh, "P", 2)
        bc = DirichletBC(V, (1.0, 2.0), lambda p: abs(p[1]) < 1e-9)
        f = Function(V)
        bc.apply(f)
        arr = f.array.reshape(-1, 2)
        pts = V.tabulate_dof_coordinates()
        bot = np.abs(pts[:, 1]) < 1e-9
        np.testing.assert_allclose(arr[bot, 0], 1.0)
        np.testing.assert_allclose(arr[bot, 1], 2.0)


class TestVectorFunction:
    def test_split_and_vertex_values(self):
        mesh = RectangleMesh(Point(0, 0), Point(2, 1), 4, 2, "crossed")
        V = VectorFunctionSpace(mesh, "P", 1)
        u = interpolate(
            Expression((lambda p: p[..., 0], lambda p: 3 * p[..., 1])), V
        )
        ux, uy = u.split()
        np.testing.assert_allclose(ux.array, V.tabulate_dof_coordinates()[:, 0])
        vv = u.compute_vertex_values()
        nv = mesh.num_vertices()
        assert len(vv) == 2 * nv
        np.testing.assert_allclose(vv[:nv], mesh.coordinates()[:, 0])

    def test_vector_point_eval_batch(self):
        mesh = RectangleMesh(Point(0, 0), Point(1, 1), 5, 5, "crossed")
        V = VectorFunctionSpace(mesh, "P", 2)
        u = interpolate(
            Expression(
                (lambda p: p[..., 0] ** 2, lambda p: p[..., 0] * p[..., 1])
            ),
            V,
        )
        pts = np.array([[0.3, 0.7], [0.9, 0.1]])
        vals = u(pts)
        np.testing.assert_allclose(vals[:, 0], pts[:, 0] ** 2, atol=1e-12)
        np.testing.assert_allclose(vals[:, 1], pts[:, 0] * pts[:, 1], atol=1e-12)


class TestVectorSensorResponse:
    def test_vector_field_sensor(self):
        # vector fixed-dim sensor responses: (np, vs, K) path
        from pgdrome_tpu.model import PGD

        mesh_x = RectangleMesh(Point(0, 0), Point(1, 1), 4, 4, "crossed")
        Vx = VectorFunctionSpace(mesh_x, "P", 1)
        Vp = FunctionSpace(IntervalMesh(8, 0.0, 2.0), "P", 1)
        modes = [
            [interpolate(Expression((lambda p: p[..., 0], lambda p: p[..., 1])), Vx),
             interpolate(Expression((lambda p: np.ones_like(p[..., 0]), lambda p: 0 * p[..., 0])), Vx)],
            [interpolate(lambda q: q, Vp), interpolate(lambda q: q**2, Vp)],
        ]
        pgd = PGD(
            name="vec",
            n_modes=2,
            fmeshes=[mesh_x, Vp.mesh()],
            pgd_modes=modes,
            name_coord=["X", "Q"],
            modes_info=["U", "Node", "Vector"],
        )
        pts = np.array([[0.25, 0.5], [0.75, 0.25]])
        q = 1.5
        out = pgd.evaluate_sensor_response(0, [1], [q], 0, pts)
        expected = np.stack(
            [pts[:, 0] * q + q**2, pts[:, 1] * q], axis=1
        )
        np.testing.assert_allclose(out, expected, atol=1e-12)
