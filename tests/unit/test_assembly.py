"""FEM assembly kernels vs closed-form / dense numpy references.

Pattern: reference tests/unit/test_FD.py (numerical-kernel unit tests)."""

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
    interpolate,
    mass_matrix,
    stiffness_matrix,
    advection_matrix,
    load_vector,
    gram,
    norm,
)
from pgdrome_tpu.fem.assembly import (
    elasticity_matrix,
    vector_mass_matrix,
    boundary_load_vector,
)


class TestMass1D:
    def test_p1_uniform_total(self):
        # sum of all mass entries = measure of domain
        mesh = IntervalMesh(10, 0.0, 2.0)
        V = FunctionSpace(mesh, "P", 1)
        M = np.asarray(mass_matrix(V))
        assert abs(M.sum() - 2.0) < 1e-12

    def test_p1_element_values(self):
        mesh = IntervalMesh(1, 0.0, 1.0)
        V = FunctionSpace(mesh, "P", 1)
        M = np.asarray(mass_matrix(V))
        np.testing.assert_allclose(M, [[1 / 3, 1 / 6], [1 / 6, 1 / 3]], atol=1e-14)

    def test_p2_exactness(self):
        # For u = x^2, v = x: ∫ u v dx on [0,1] = 1/4
        mesh = IntervalMesh(4, 0.0, 1.0)
        V = FunctionSpace(mesh, "P", 2)
        M = mass_matrix(V)
        u = interpolate(lambda x: x**2, V)
        v = interpolate(lambda x: x, V)
        assert abs(float(gram(u, M, v)) - 0.25) < 1e-13

    def test_weighted_mass(self):
        # ∫ x * u * v dx with u=v=1 on [0,2] = 2
        mesh = IntervalMesh(7, 0.0, 2.0)
        V = FunctionSpace(mesh, "P", 1)
        Mw = mass_matrix(V, weight=lambda x: x)
        ones = interpolate(lambda x: np.ones_like(x), V)
        assert abs(float(gram(ones, Mw, ones)) - 2.0) < 1e-12

    def test_weighted_mass_function_weight(self):
        mesh = IntervalMesh(9, 0.0, 1.0)
        V = FunctionSpace(mesh, "P", 2)
        w = interpolate(lambda x: 1.0 + x, V)
        Mw = mass_matrix(V, weight=w)
        u = interpolate(lambda x: x, V)
        # ∫ (1+x) x^2 dx = 1/3 + 1/4
        assert abs(float(gram(u, Mw, u)) - (1 / 3 + 1 / 4)) < 1e-12


class TestStiffness1D:
    def test_p1_uniform(self):
        mesh = IntervalMesh(4, 0.0, 1.0)
        V = FunctionSpace(mesh, "P", 1)
        K = np.asarray(stiffness_matrix(V))
        h = 0.25
        expected_diag = np.array([1, 2, 2, 2, 1]) / h
        np.testing.assert_allclose(np.diag(K), expected_diag, atol=1e-12)

    def test_energy_linear(self):
        # u = 3x on [0,2]: ∫ u'^2 = 9*2 = 18
        mesh = IntervalMesh(11, 0.0, 2.0)
        V = FunctionSpace(mesh, "P", 2)
        K = stiffness_matrix(V)
        u = interpolate(lambda x: 3 * x, V)
        assert abs(float(gram(u, K, u)) - 18.0) < 1e-11

    def test_energy_quadratic_p2(self):
        # u = x^2: ∫0^1 (2x)^2 = 4/3 exactly representable in P2
        mesh = IntervalMesh(3, 0.0, 1.0)
        V = FunctionSpace(mesh, "P", 2)
        K = stiffness_matrix(V)
        u = interpolate(lambda x: x**2, V)
        assert abs(float(gram(u, K, u)) - 4 / 3) < 1e-12


class TestAdvection1D:
    def test_integral(self):
        # ∫ v * u' dx with v = x, u = x² on [0,1]: ∫ x·2x = 2/3
        mesh = IntervalMesh(5, 0.0, 1.0)
        V = FunctionSpace(mesh, "P", 2)
        A = advection_matrix(V)
        v = interpolate(lambda x: x, V)
        u = interpolate(lambda x: x**2, V)
        assert abs(float(gram(v, A, u)) - 2 / 3) < 1e-12


class TestLoadVector:
    def test_constant_source(self):
        mesh = IntervalMesh(6, 0.0, 3.0)
        V = FunctionSpace(mesh, "P", 1)
        b = np.asarray(load_vector(V, lambda x: np.ones_like(x)))
        assert abs(b.sum() - 3.0) < 1e-12

    def test_expression_source(self):
        mesh = IntervalMesh(50, 0.0, 1.0)
        V = FunctionSpace(mesh, "P", 2)
        g = Expression("x[0]*p", degree=2, p=2.0)
        b = np.asarray(load_vector(V, g))
        # Σ b_i = ∫ 2x dx = 1
        assert abs(b.sum() - 1.0) < 1e-12


class TestNorm:
    def test_l2_norm(self):
        mesh = IntervalMesh(8, 0.0, 1.0)
        V = FunctionSpace(mesh, "P", 2)
        u = interpolate(lambda x: x, V)
        # ||x||_L2 on [0,1] = 1/sqrt(3)
        assert abs(float(norm(u)) - 1 / np.sqrt(3)) < 1e-12


class TestMass2D:
    def test_total_area_crossed(self):
        mesh = RectangleMesh(Point(0, 0), Point(2.0, 3.0), 4, 5, "crossed")
        V = FunctionSpace(mesh, "P", 1)
        M = np.asarray(mass_matrix(V))
        assert abs(M.sum() - 6.0) < 1e-11

    def test_total_area_right(self):
        mesh = RectangleMesh(Point(0, 0), Point(1.0, 1.0), 3, 3, "right")
        V = FunctionSpace(mesh, "P", 2)
        M = np.asarray(mass_matrix(V))
        assert abs(M.sum() - 1.0) < 1e-12

    def test_p2_exact_quartic(self):
        # ∫ (x²)(y²) over [0,1]² with u=x², v=y² in P2 = 1/9
        mesh = RectangleMesh(Point(0, 0), Point(1, 1), 2, 2, "crossed")
        V = FunctionSpace(mesh, "P", 2)
        M = mass_matrix(V)
        u = interpolate(lambda p: p[..., 0] ** 2, V)
        v = interpolate(lambda p: p[..., 1] ** 2, V)
        assert abs(float(gram(u, M, v)) - 1 / 9) < 1e-12


class TestStiffness2D:
    def test_energy_linear_field(self):
        # u = 2x + y on [0,1]²: ∫ |∇u|² = 4 + 1 = 5
        mesh = RectangleMesh(Point(0, 0), Point(1, 1), 3, 4, "crossed")
        V = FunctionSpace(mesh, "P", 1)
        K = stiffness_matrix(V)
        u = interpolate(lambda p: 2 * p[..., 0] + p[..., 1], V)
        assert abs(float(gram(u, K, u)) - 5.0) < 1e-11

    def test_energy_quadratic_p2(self):
        # u = x² + xy: ∇u = (2x+y, x); ∫ over [0,1]² = ∫(2x+y)² + x²
        # = ∫ 4x²+4xy+y² + x² = 4/3 + 1 + 1/3 + 1/3 = 3
        mesh = RectangleMesh(Point(0, 0), Point(1, 1), 2, 3, "crossed")
        V = FunctionSpace(mesh, "P", 2)
        K = stiffness_matrix(V)
        u = interpolate(lambda p: p[..., 0] ** 2 + p[..., 0] * p[..., 1], V)
        assert abs(float(gram(u, K, u)) - 3.0) < 1e-11


class TestElasticity2D:
    def test_uniaxial_energy(self):
        # u = (a*x, 0): eps = (a, 0, 0); energy = a² C00 * area
        C = np.array([[2.0, 1.0, 0.0], [1.0, 3.0, 0.0], [0.0, 0.0, 0.5]])
        mesh = RectangleMesh(Point(0, 0), Point(2, 1), 4, 2, "crossed")
        V = VectorFunctionSpace(mesh, "P", 2)
        K = elasticity_matrix(V, C)
        a = 0.7
        u = interpolate(
            Expression((lambda p: a * p[..., 0], lambda p: 0.0 * p[..., 0])), V
        )
        expected = a**2 * C[0, 0] * 2.0
        assert abs(float(gram(u, K, u)) - expected) < 1e-10

    def test_shear_energy(self):
        # u = (b*y, 0): gxy = b; energy = b² C22 * area
        C = np.array([[2.0, 1.0, 0.0], [1.0, 3.0, 0.0], [0.0, 0.0, 0.5]])
        mesh = RectangleMesh(Point(0, 0), Point(1, 1), 3, 3, "crossed")
        V = VectorFunctionSpace(mesh, "P", 1)
        K = elasticity_matrix(V, C)
        b = 1.3
        u = interpolate(
            Expression((lambda p: b * p[..., 1], lambda p: 0.0 * p[..., 0])), V
        )
        expected = b**2 * C[2, 2] * 1.0
        assert abs(float(gram(u, K, u)) - expected) < 1e-10

    def test_vector_mass(self):
        mesh = RectangleMesh(Point(0, 0), Point(1, 1), 2, 2, "crossed")
        V = VectorFunctionSpace(mesh, "P", 1)
        M = vector_mass_matrix(V)
        u = interpolate(
            Expression((lambda p: np.ones_like(p[..., 0]), lambda p: 2 * np.ones_like(p[..., 0]))), V
        )
        # ∫ |u|² = 1 + 4 = 5
        assert abs(float(gram(u, M, u)) - 5.0) < 1e-12


class TestBoundaryLoad:
    def test_top_traction_total(self):
        # constant traction (0, -1.5) on the left half of the top edge of
        # [0,1000]x[0,100]: total force = -1.5 * 500
        mesh = RectangleMesh(Point(0, 0), Point(1000, 100), 10, 4, "crossed")
        V = VectorFunctionSpace(mesh, "P", 2)
        g = Expression((lambda p: 0.0 * p[..., 0], lambda p: -1.5 * np.ones_like(p[..., 0])))
        b = np.asarray(
            boundary_load_vector(
                V, g, marker=lambda m: abs(m[1] - 100.0) < 1e-9 and m[0] < 500.0
            )
        )
        fy = b[1::2].sum()
        fx = b[0::2].sum()
        assert abs(fy - (-1.5 * 500)) < 1e-9
        assert abs(fx) < 1e-12


class TestPointEvaluation:
    def test_p1_1d(self):
        mesh = IntervalMesh(10, 0.0, 1.0)
        V = FunctionSpace(mesh, "P", 1)
        u = interpolate(lambda x: 2 * x + 1, V)
        assert abs(u(0.37) - (2 * 0.37 + 1)) < 1e-12

    def test_p2_1d_quadratic_exact(self):
        mesh = IntervalMesh(4, 0.0, 2.0)
        V = FunctionSpace(mesh, "P", 2)
        u = interpolate(lambda x: x**2 - x, V)
        for x in [0.0, 0.123, 0.9, 1.77, 2.0]:
            assert abs(u(x) - (x**2 - x)) < 1e-12

    def test_out_of_range_raises(self):
        mesh = IntervalMesh(4, 0.5, 1.0)
        V = FunctionSpace(mesh, "P", 1)
        u = interpolate(lambda x: x, V)
        with pytest.raises(ValueError):
            u(0.2)

    def test_2d_crossed(self):
        mesh = RectangleMesh(Point(0, 0), Point(1, 1), 5, 5, "crossed")
        V = FunctionSpace(mesh, "P", 2)
        u = interpolate(lambda p: p[..., 0] ** 2 + 3 * p[..., 1], V)
        for pt in [(0.21, 0.77), (0.5, 0.5), (0.99, 0.01)]:
            assert abs(u(np.array(pt)) - (pt[0] ** 2 + 3 * pt[1])) < 1e-12

    def test_2d_vector(self):
        mesh = RectangleMesh(Point(0, 0), Point(2, 1), 4, 3, "crossed")
        V = VectorFunctionSpace(mesh, "P", 1)
        u = interpolate(
            Expression((lambda p: p[..., 0], lambda p: 2 * p[..., 1])), V
        )
        val = u(np.array((1.0, 0.5)))
        np.testing.assert_allclose(val, [1.0, 1.0], atol=1e-12)
