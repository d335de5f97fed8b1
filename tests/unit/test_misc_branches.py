"""Remaining branch coverage: 'direct' solve mode dispatch, cross-space
re-interpolation, vector max-norm reducer, 3D vector split."""

import numpy as np

from pgdrome_tpu import (
    IntervalMesh,
    RectangleMesh,
    BoxMesh,
    Point,
    FunctionSpace,
    VectorFunctionSpace,
    DirichletBC,
    PGDProblem,
    Function,
    Expression,
    interpolate,
    mass_matrix,
    stiffness_matrix,
    load_vector,
    gram,
)


class TestDirectSolveMode:
    def test_direct_dispatch(self):
        # 'direct' per-dim mode (reference solver.py:637,909-925): lhs is a
        # SCALAR, rhs a vector, solve = elementwise b/a. Model the p-dim of
        # the truss pointwise (collocation): exact for u = w(x)·p.
        mesh_x = IntervalMesh(40, 0.0, 1.0)
        Vx = FunctionSpace(mesh_x, "P", 1)
        mesh_p = IntervalMesh(10, 0.5, 2.0)
        Vp = FunctionSpace(mesh_p, "P", 1)
        K = stiffness_matrix(Vx)
        Mx = mass_matrix(Vx)
        bx = load_vector(Vx, lambda x: np.ones_like(x))
        p_nodes = Vp.tabulate_dof_coordinates()[:, 0]

        def lhs(fct_F, var_F, Fs, meshes, dom, param, typ, dim):
            if typ == "r":
                # collocation Gram over p: Σ F1(p_i)²
                return float(Fs[1].array @ Fs[1].array) * K
            # p-dim: pointwise scalar operator a = F0ᵀ K F0
            return float(Fs[0].array @ (K @ Fs[0].array))

        def rhs(fct_F, var_F, Fs, meshes, dom, param, load, PGD_func, typ, nE, dim):
            if typ == "r":
                return float(Fs[1].array @ p_nodes) * bx
            # pointwise rhs: (F0·bx)·p_i per collocation point
            return float(Fs[0].array @ bx) * p_nodes

        def bc_fct(Vs, dom, param):
            return [DirichletBC(Vs[0], 0.0, lambda s, onb: onb), 0]

        prob = PGDProblem(
            name="direct",
            name_coord=["X", "P"],
            modes_info=["U", "Node", "Scalar"],
            Vs=[Vx, Vp],
            bc_fct=bc_fct,
            load=None,
            param={},
            rhs_fct=rhs,
            lhs_fct=lhs,
            probs=["r", "s"],
            seq_fp=[0, 1],
            PGD_nmax=1,
        )
        prob.norm_modes = "no"
        prob.tol_fp_it = 1e-12
        prob.solve_PGD(_problem="linear", solve_modes=["FEM", "direct"])

        F0 = prob.PGD_func[0][0].array
        F1 = prob.PGD_func[1][0].array
        # the p-factor must be exactly proportional to p (b/a is pointwise)
        ratio = F1 / p_nodes
        np.testing.assert_allclose(ratio, ratio[0], rtol=1e-12)
        # x-factor solves c·K w = c2·bx
        c = float(F1 @ F1)
        r = c * (K @ F0) - float(F1 @ p_nodes) * bx
        r[[0, -1]] = 0
        assert np.linalg.norm(r) < 1e-10


class TestCrossSpaceInterpolate:
    def test_reinterpolate_scalar(self):
        mesh1 = IntervalMesh(20, 0.0, 1.0)
        V1 = FunctionSpace(mesh1, "P", 2)
        mesh2 = IntervalMesh(33, 0.0, 1.0)
        V2 = FunctionSpace(mesh2, "P", 1)
        u1 = interpolate(lambda x: x**2, V1)
        u2 = interpolate(u1, V2)  # Function → other space
        xs = V2.tabulate_dof_coordinates()[:, 0]
        np.testing.assert_allclose(u2.array, xs**2, atol=1e-12)  # P2 exact

    def test_same_space_copy(self):
        V = FunctionSpace(IntervalMesh(5, 0, 1), "P", 1)
        u = interpolate(lambda x: x, V)
        v = interpolate(u, V)
        v.array[0] = 99.0
        assert u.array[0] != 99.0  # deep copy


class TestVectorMaxNorm:
    def test_max_norm_2d_vector(self):
        from pgdrome_tpu.model import PGD

        mesh_x = RectangleMesh(Point(0, 0), Point(1, 1), 3, 3, "crossed")
        Vx = VectorFunctionSpace(mesh_x, "P", 1)
        Vp = FunctionSpace(IntervalMesh(4, 0.0, 1.0), "P", 1)
        modes = [
            [interpolate(Expression((lambda p: 3 * p[..., 0], lambda p: 4 * p[..., 0])), Vx)],
            [interpolate(lambda q: np.ones_like(q), Vp)],
        ]
        pgd = PGD(
            name="v", n_modes=1, fmeshes=[mesh_x, Vp.mesh()], pgd_modes=modes,
            name_coord=["X", "Q"], modes_info=["U", "Node", "Vector"],
        )
        mn = pgd.evaluate_max_norm(0, [1], [0.5], 0)
        # |u| = 5x, max at x=1 → 5
        assert abs(mn - 5.0) < 1e-12


class TestSplit3D:
    def test_split_components(self):
        mesh = BoxMesh(Point(0, 0, 0), Point(1, 1, 1), 2, 2, 2)
        V = VectorFunctionSpace(mesh, "P", 1)
        u = interpolate(
            Expression(
                (
                    lambda p: p[..., 0],
                    lambda p: 2 * p[..., 1],
                    lambda p: 3 * p[..., 2],
                )
            ),
            V,
        )
        ux, uy, uz = u.split()
        pts = V.tabulate_dof_coordinates()
        np.testing.assert_allclose(ux.array, pts[:, 0], atol=1e-14)
        np.testing.assert_allclose(uz.array, 3 * pts[:, 2], atol=1e-14)


class TestNormalizationInvariance:
    def _solve(self, norm_modes, fp_init=""):
        from pgdrome_tpu.models.problems import elastic_truss, pgd_problem_from_separated

        sep, Vs = elastic_truss(n_x=30, n_E=20)
        prob = pgd_problem_from_separated(sep, Vs)
        prob.PGD_nmax = 4
        prob.tol_fp_it = 1e-9
        prob.norm_modes = norm_modes
        prob.fp_init = fp_init
        prob.solve_PGD(_problem="linear")
        sol = prob.return_PGD()
        u = sol.evaluate(0, [1, 2], [1.5, 0.8], 0)
        return np.asarray(u.array), prob

    def test_all_normings_same_solution(self):
        # 'no' / 'l2' / 'stiff' rescale factors differently but preserve
        # the rank-1 products (reference solver.py:404-470 comments)
        u_no, _ = self._solve("no")
        u_l2, _ = self._solve("l2")
        u_st, _ = self._solve("stiff")
        np.testing.assert_allclose(u_l2, u_no, rtol=1e-9, atol=1e-14)
        np.testing.assert_allclose(u_st, u_no, rtol=1e-9, atol=1e-14)

    def test_randomized_init_converges(self):
        # fp_init='randomized' (reference solver.py:193-197): different
        # start, same converged solution for this contractive problem
        np.random.seed(7)
        u_r, prob = self._solve("stiff", fp_init="randomized")
        u_o, _ = self._solve("stiff")
        np.testing.assert_allclose(u_r, u_o, rtol=1e-6, atol=1e-10)


class TestWarmupCLI:
    def test_quick_warmup_populates_cache(self, tmp_path, monkeypatch):
        # the warmup tool must compile the standard programs into the AOT
        # cache dir (on CPU the cache layer is a no-op 'off' — assert it
        # runs end-to-end and reports a status)
        monkeypatch.setenv("PGDROME_AOT_CACHE", str(tmp_path))
        from pgdrome_tpu import warmup

        warmup.main(["--quick"])
