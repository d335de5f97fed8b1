"""3D FEM layer: BoxMesh (Kuhn tets), P1 spaces, elasticity, point eval."""

import numpy as np

from pgdrome_tpu.fem.mesh import BoxMesh, Point
from pgdrome_tpu.fem.space import FunctionSpace, VectorFunctionSpace
from pgdrome_tpu.fem.function import interpolate, Expression
from pgdrome_tpu.fem.bc import DirichletBC
from pgdrome_tpu.fem.assembly import (
    mass_matrix,
    stiffness_matrix,
    elasticity_matrix_3d,
    vector_mass_matrix,
    load_vector,
    gram,
)


class Test3D:
    def test_volume_and_energy(self):
        mesh = BoxMesh(Point(0, 0, 0), Point(2, 1, 1), 4, 3, 3)
        V = FunctionSpace(mesh, "P", 1)
        assert abs(np.asarray(mass_matrix(V)).sum() - 2.0) < 1e-12
        K = stiffness_matrix(V)
        u = interpolate(lambda p: 2 * p[..., 0] + 3 * p[..., 1] - p[..., 2], V)
        assert abs(gram(u, K, u) - 28.0) < 1e-10

    def test_point_eval_linear_exact(self):
        mesh = BoxMesh(Point(0, 0, 0), Point(1, 1, 1), 3, 4, 5)
        V = FunctionSpace(mesh, "P", 1)
        u = interpolate(lambda p: 2 * p[..., 0] - p[..., 1] + 0.5 * p[..., 2], V)
        pts = np.random.default_rng(0).uniform(0.01, 0.99, size=(200, 3))
        np.testing.assert_allclose(
            u(pts), 2 * pts[:, 0] - pts[:, 1] + 0.5 * pts[:, 2], atol=1e-12
        )

    def test_poisson_3d_solve(self):
        # -Δu = 1 on unit cube, u=0 on boundary; check center value sanity
        mesh = BoxMesh(Point(0, 0, 0), Point(1, 1, 1), 6, 6, 6)
        V = FunctionSpace(mesh, "P", 1)
        K = stiffness_matrix(V)
        b = load_vector(V, lambda p: np.ones_like(p[..., 0]))
        bc = DirichletBC(V, 0.0, lambda p, onb: onb)
        A, bb = bc.apply_system(K, b)
        u = np.linalg.solve(A, bb)
        from pgdrome_tpu.fem.function import Function

        uc = Function(V, u)(np.array([0.5, 0.5, 0.5]))
        # exact center value of the unit-cube Poisson problem ≈ 0.0562
        assert abs(uc - 0.0562) < 5e-3

    def test_elasticity_3d_energy(self):
        # u = (a x, 0, 0): eps = (a,0,0,0,0,0); E = a² C00 · vol
        lam, mu = 1.2, 0.8
        C = np.zeros((6, 6))
        C[:3, :3] = lam
        C[0, 0] = C[1, 1] = C[2, 2] = lam + 2 * mu
        C[3, 3] = C[4, 4] = C[5, 5] = mu
        mesh = BoxMesh(Point(0, 0, 0), Point(1, 1, 2), 2, 2, 3)
        V = VectorFunctionSpace(mesh, "P", 1)
        K = elasticity_matrix_3d(V, C)
        a = 0.7
        u = interpolate(
            Expression(
                (
                    lambda p: a * p[..., 0],
                    lambda p: 0.0 * p[..., 0],
                    lambda p: 0.0 * p[..., 0],
                )
            ),
            V,
        )
        expected = a**2 * C[0, 0] * 2.0
        assert abs(gram(u, K, u) - expected) < 1e-10

    def test_vector_mass_3d(self):
        mesh = BoxMesh(Point(0, 0, 0), Point(1, 1, 1), 2, 2, 2)
        V = VectorFunctionSpace(mesh, "P", 1)
        M = vector_mass_matrix(V)
        u = interpolate(
            Expression(
                (
                    lambda p: np.ones_like(p[..., 0]),
                    lambda p: 2 * np.ones_like(p[..., 0]),
                    lambda p: 3 * np.ones_like(p[..., 0]),
                )
            ),
            V,
        )
        assert abs(gram(u, M, u) - 14.0) < 1e-12
