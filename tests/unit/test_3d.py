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


class TestP2Tets:
    """3D degree parity (round-4 VERDICT missing #2): P2 tet spaces with
    the Keast degree-5 rule, quadratic-exact interpolation/assembly, and
    2D/3D gradient point-eval."""

    def test_tet_quadrature_degree5(self):
        from math import factorial

        from pgdrome_tpu.fem.space import _TET_RULE_DEG5

        bary, w = _TET_RULE_DEG5
        rng = np.random.default_rng(0)
        # cover the FULL degree-5 monomial range including single-axis
        # powers up to 5 (l0^5, l0^4 l1, ...): a rule typo that breaks
        # only high-exponent monomials must not slip through
        for _ in range(40):
            exps = rng.integers(0, 6, size=4)
            while exps.sum() > 5:
                exps = rng.integers(0, 6, size=4)
            quad = (w * np.prod(bary ** exps[None, :], axis=1)).sum()
            a, b, c, d = (int(e) for e in exps)
            exact = (
                factorial(a) * factorial(b) * factorial(c) * factorial(d)
                * 6.0 / factorial(a + b + c + d + 3)
            ) / 6.0  # reference tet volume 1/6
            assert abs(quad - exact) < 1e-14, (exps, quad, exact)

    def test_p2_interpolation_quadratic_exact(self):
        mesh = BoxMesh(Point(0, 0, 0), Point(1, 2, 1), 3, 3, 2)
        V = FunctionSpace(mesh, "P", 2)
        f = lambda p: (p[..., 0] ** 2 - 2 * p[..., 0] * p[..., 1]
                       + 0.5 * p[..., 2] ** 2 + p[..., 1] - 1.0)
        u = interpolate(f, V)
        pts = np.random.default_rng(1).uniform(0.01, 0.99, size=(200, 3))
        pts[:, 1] *= 2.0
        np.testing.assert_allclose(u(pts), f(pts), atol=1e-12)

    def test_p2_mass_and_stiffness_exact_on_monomials(self):
        """u^T M v and u^T K v for interpolated quadratics equal the
        analytic integrals on the unit cube (integrands degree ≤ 4,
        within the Keast rule's exactness) — pins dofmap, shape
        functions and the quadrature switch together."""
        mesh = BoxMesh(Point(0, 0, 0), Point(1, 1, 1), 3, 3, 3)
        V = FunctionSpace(mesh, "P", 2)
        M = mass_matrix(V)
        K = stiffness_matrix(V)
        x2 = interpolate(lambda p: p[..., 0] ** 2, V)
        y2 = interpolate(lambda p: p[..., 1] ** 2, V)
        xy = interpolate(lambda p: p[..., 0] * p[..., 1], V)
        xz = interpolate(lambda p: p[..., 0] * p[..., 2], V)
        # ∫ x²y² = 1/9, ∫ ∇(x²)·∇(y²) = 0, ∫ ∇(x²)·∇(x²) = 4/3,
        # ∫ ∇(xy)·∇(xz) = ∫ yz = 1/4
        assert abs(gram(x2, M, y2) - 1.0 / 9.0) < 1e-12
        assert abs(gram(x2, K, y2)) < 1e-12
        assert abs(gram(x2, K, x2) - 4.0 / 3.0) < 1e-12
        assert abs(gram(xy, K, xz) - 0.25) < 1e-12

    def test_p2_poisson_beats_p1(self):
        """−Δu = f, u = sin(πx)sin(πy)sin(πz): P2 on a coarse mesh beats
        P1 on the same mesh by a large factor (h³ vs h² classes)."""
        f = lambda p: 3 * np.pi ** 2 * (
            np.sin(np.pi * p[..., 0]) * np.sin(np.pi * p[..., 1])
            * np.sin(np.pi * p[..., 2])
        )
        exact = lambda p: (
            np.sin(np.pi * p[..., 0]) * np.sin(np.pi * p[..., 1])
            * np.sin(np.pi * p[..., 2])
        )
        errs = {}
        for deg in (1, 2):
            mesh = BoxMesh(Point(0, 0, 0), Point(1, 1, 1), 4, 4, 4)
            V = FunctionSpace(mesh, "P", deg)
            K = np.asarray(stiffness_matrix(V), dtype=np.float64)
            b = np.asarray(load_vector(V, f), dtype=np.float64)
            bc = DirichletBC(V, 0.0, lambda x, onb: onb)
            free = np.setdiff1d(np.arange(V.dim()), bc.dofs)
            u = np.zeros(V.dim())
            u[free] = np.linalg.solve(K[np.ix_(free, free)], b[free])
            pts = np.random.default_rng(2).uniform(0.1, 0.9, size=(64, 3))
            from pgdrome_tpu.fem.interpolate import eval_dofs_at_points

            errs[deg] = np.abs(
                eval_dofs_at_points(V, u, pts) - exact(pts)
            ).max()
        assert errs[2] < 0.2 * errs[1], errs

    def test_p2_boundary_dofs_box_and_simplicial_agree(self):
        """The geometric (BoxMesh) and topological (SimplicialMesh) P2
        boundary-dof detections must mark the same dof SET on identical
        mesh data — covers the 3D boundary-EDGE membership fix."""
        from pgdrome_tpu.fem.mesh import SimplicialMesh

        box = BoxMesh(Point(0, 0, 0), Point(1, 1, 1), 2, 2, 2)
        V_box = FunctionSpace(box, "P", 2)
        simp = SimplicialMesh(box.coordinates(), box.cells())
        V_s = FunctionSpace(simp, "P", 2)
        bc_box = DirichletBC(V_box, 0.0, lambda x, onb: onb)
        bc_s = DirichletBC(V_s, 0.0, lambda x, onb: onb)
        # same vertex/edge enumeration (same arrays) → same dof indexing
        np.testing.assert_array_equal(np.sort(bc_box.dofs),
                                      np.sort(bc_s.dofs))
        assert len(bc_box.dofs) > 0

    def test_gradient_point_eval_2d_3d(self):
        from pgdrome_tpu.fem.interpolate import eval_dofs_at_points
        from pgdrome_tpu.fem.mesh import RectangleMesh

        # 2D scalar P2: ∇(x² − xy + 2y) = (2x − y, −x + 2)
        m2 = RectangleMesh(Point(0, 0), Point(1, 1), 4, 3)
        V2 = FunctionSpace(m2, "P", 2)
        u2 = interpolate(
            lambda p: p[..., 0] ** 2 - p[..., 0] * p[..., 1]
            + 2 * p[..., 1], V2
        )
        pts2 = np.random.default_rng(3).uniform(0.05, 0.95, size=(50, 2))
        g2 = eval_dofs_at_points(V2, u2.vector(), pts2, derivative=True)
        np.testing.assert_allclose(
            g2,
            np.stack([2 * pts2[:, 0] - pts2[:, 1], -pts2[:, 0] + 2.0],
                     axis=-1),
            atol=1e-11,
        )
        # 3D scalar P2: ∇(x² + yz) = (2x, z, y)
        m3 = BoxMesh(Point(0, 0, 0), Point(1, 1, 1), 3, 3, 3)
        V3 = FunctionSpace(m3, "P", 2)
        u3 = interpolate(
            lambda p: p[..., 0] ** 2 + p[..., 1] * p[..., 2], V3
        )
        pts3 = np.random.default_rng(4).uniform(0.05, 0.95, size=(50, 3))
        g3 = eval_dofs_at_points(V3, u3.vector(), pts3, derivative=True)
        np.testing.assert_allclose(
            g3,
            np.stack([2 * pts3[:, 0], pts3[:, 2], pts3[:, 1]], axis=-1),
            atol=1e-11,
        )
        # 3D vector P1: ∇u tensor of u = (x, 2z, −y): rows (1,0,0),
        # (0,0,2), (0,−1,0)
        W3 = VectorFunctionSpace(m3, "P", 1, dim=3)
        w = interpolate(
            lambda p: np.stack(
                [p[..., 0], 2 * p[..., 2], -p[..., 1]], axis=-1), W3
        )
        gw = eval_dofs_at_points(W3, w.vector(), pts3, derivative=True)
        expect = np.zeros((50, 3, 3))
        expect[:, 0, 0] = 1.0
        expect[:, 1, 2] = 2.0
        expect[:, 2, 1] = -1.0
        np.testing.assert_allclose(gw, expect, atol=1e-11)

    def test_gradient_point_eval_jittable(self):
        import jax
        import jax.numpy as jnp

        from pgdrome_tpu.fem.interpolate import eval_dofs_at_points

        mesh = BoxMesh(Point(0, 0, 0), Point(1, 1, 1), 2, 2, 2)
        V = FunctionSpace(mesh, "P", 2)
        u = interpolate(lambda p: p[..., 0] ** 2, V)
        dofs = jnp.asarray(u.vector())

        @jax.jit
        def g(pts):
            return eval_dofs_at_points(V, dofs, pts, derivative=True,
                                       xp=jnp)

        pts = np.random.default_rng(5).uniform(0.1, 0.9, size=(8, 3))
        out = np.asarray(g(jnp.asarray(pts)))
        np.testing.assert_allclose(
            out[:, 0], 2 * pts[:, 0], atol=1e-5)
        np.testing.assert_allclose(out[:, 1:], 0.0, atol=1e-5)
