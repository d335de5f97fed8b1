"""Device-side (JAX) assembly: parity with the host assembly, jit
compatibility, matrix-free applies, and the quasilinear_diffusion hook
wired through SeparatedPGD's nonlinear path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pgdrome_tpu.fem import assembly as ha
from pgdrome_tpu.fem import assembly_jax as da
from pgdrome_tpu.fem.mesh import IntervalMesh, RectangleMesh, Point
from pgdrome_tpu.fem.space import FunctionSpace


def _nonuniform_1d(n=17, degree=2):
    pts = np.sort(np.concatenate([[0.0, 1.0],
                                  np.random.default_rng(5).uniform(
                                      0.02, 0.98, n - 1)]))
    return FunctionSpace(IntervalMesh.from_points(pts), "P", degree)


def _weight_q(V, fn):
    """Host evaluation of a weight callable at the quadrature points."""
    pts = V.q_points[..., 0] if V.mesh().geometry_dim() == 1 else V.q_points
    return np.asarray(fn(pts), dtype=np.float64)


CASES = [
    ("1d_p1", lambda: FunctionSpace(IntervalMesh(13, 0.0, 2.0), "P", 1)),
    ("1d_p2_nonuniform", lambda: _nonuniform_1d()),
    ("2d_p1", lambda: FunctionSpace(
        RectangleMesh(Point(0, 0), Point(1.5, 1.0), 5, 4, "crossed"),
        "P", 1)),
    ("2d_p2", lambda: FunctionSpace(
        RectangleMesh(Point(0, 0), Point(1.0, 1.0), 3, 3, "crossed"),
        "P", 2)),
]


class TestHostParity:
    @pytest.mark.parametrize("name,mk", CASES, ids=[c[0] for c in CASES])
    def test_unweighted_operators(self, name, mk):
        V = mk()
        tb = da.AssemblyTables(V, dtype=jnp.float64)
        np.testing.assert_allclose(
            np.asarray(da.mass_matrix(tb)), ha.mass_matrix(V),
            rtol=1e-13, atol=1e-15,
        )
        np.testing.assert_allclose(
            np.asarray(da.stiffness_matrix(tb)), ha.stiffness_matrix(V),
            rtol=1e-13, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(da.advection_matrix(tb)), ha.advection_matrix(V),
            rtol=1e-13, atol=1e-13,
        )

    @pytest.mark.parametrize("name,mk", CASES, ids=[c[0] for c in CASES])
    def test_weighted_operators_and_load(self, name, mk):
        V = mk()
        tb = da.AssemblyTables(V, dtype=jnp.float64)
        if V.mesh().geometry_dim() == 1:
            w = lambda x: 1.0 + 0.5 * np.sin(3.0 * x)
        else:
            w = lambda p: 1.0 + 0.3 * p[..., 0] * p[..., 1]
        wq = jnp.asarray(_weight_q(V, w))
        np.testing.assert_allclose(
            np.asarray(da.mass_matrix(tb, wq)), ha.mass_matrix(V, weight=w),
            rtol=1e-13, atol=1e-15,
        )
        np.testing.assert_allclose(
            np.asarray(da.stiffness_matrix(tb, wq)),
            ha.stiffness_matrix(V, weight=w), rtol=1e-13, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(da.load_vector(tb, wq)), ha.load_vector(V, w),
            rtol=1e-13, atol=1e-15,
        )

    def test_at_quadrature_matches_host(self):
        V = _nonuniform_1d()
        tb = da.AssemblyTables(V, dtype=jnp.float64)
        u = np.random.default_rng(0).normal(size=V.ndofs)
        host = np.einsum("cl,clq->cq", u[V.element_dofs], V.q_basis)
        np.testing.assert_allclose(
            np.asarray(da.at_quadrature(tb, jnp.asarray(u))), host,
            rtol=1e-13, atol=1e-14,
        )


class TestMatrixFree:
    @pytest.mark.parametrize("name,mk", CASES[:3], ids=[c[0] for c in CASES[:3]])
    def test_applies_match_assembled(self, name, mk):
        V = mk()
        tb = da.AssemblyTables(V, dtype=jnp.float64)
        rng = np.random.default_rng(1)
        u = jnp.asarray(rng.normal(size=V.ndofs))
        wq = jnp.asarray(1.0 + 0.2 * rng.uniform(size=tb.qw.shape))
        np.testing.assert_allclose(
            np.asarray(da.mass_apply(tb, wq, u)),
            np.asarray(da.mass_matrix(tb, wq)) @ np.asarray(u),
            rtol=1e-12, atol=1e-13,
        )
        np.testing.assert_allclose(
            np.asarray(da.stiffness_apply(tb, wq, u)),
            np.asarray(da.stiffness_matrix(tb, wq)) @ np.asarray(u),
            rtol=1e-12, atol=1e-12,
        )

    def test_jit_with_traced_weight(self):
        V = _nonuniform_1d(degree=1)
        tb = da.AssemblyTables(V, dtype=jnp.float64)
        rng = np.random.default_rng(2)
        u = jnp.asarray(rng.normal(size=V.ndofs))

        @jax.jit
        def resid(wq, u):
            return da.stiffness_apply(tb, wq, u) - da.load_vector(tb, wq)

        wq = jnp.asarray(1.0 + 0.1 * rng.uniform(size=tb.qw.shape))
        out = resid(wq, u)
        ref = (np.asarray(da.stiffness_matrix(tb, wq)) @ np.asarray(u)
               - np.asarray(da.load_vector(tb, wq)))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12,
                                   atol=1e-12)


class TestQuasilinearHook:
    def _problem(self):
        from pgdrome_tpu.models.problems import parametric_elliptic

        return parametric_elliptic(n_x=32, n_p=8, num_params=1)

    def _host_hook(self, V, eps):
        """Equivalent host-assembled hook: K[eps·u_q²] @ u via the host
        weighted stiffness — the reference-style 'reassemble each
        iteration' formulation, used here as the parity oracle."""
        qb = V.q_basis
        ed = V.element_dofs

        def apply_fn(u):
            u = np.asarray(u, dtype=np.float64)
            uq = np.einsum("cl,clq->cq", u[ed], qb)
            K = ha.stiffness_matrix(V, weight=None, sparse=False) * 0.0
            Ae = np.einsum("cq,ciqg,cjqg->cij",
                           V.q_weights * (eps * uq**2), V.q_grads, V.q_grads)
            rows = np.broadcast_to(ed[:, :, None], Ae.shape)
            cols = np.broadcast_to(ed[:, None, :], Ae.shape)
            np.add.at(K, (rows, cols), Ae)
            return jnp.asarray(K @ u)

        return apply_fn

    def test_device_hook_matches_host_assembly(self):
        sep, Vs = self._problem()
        eps = 2.0
        apply_d, weight_d = da.quasilinear_diffusion(
            Vs[0], lambda uq: eps * uq**2, dtype=jnp.float64
        )
        apply_h = self._host_hook(Vs[0], eps)
        u = np.random.default_rng(3).normal(size=Vs[0].ndofs)
        np.testing.assert_allclose(
            np.asarray(apply_d(jnp.asarray(u))),
            np.asarray(apply_h(u)), rtol=1e-12, atol=1e-12,
        )
        # weight contract: weight(F) = F·apply(F)
        w = float(weight_d(jnp.asarray(u)))
        assert np.isclose(w, u @ np.asarray(apply_d(jnp.asarray(u))),
                          rtol=1e-12)

    def test_enrichment_with_device_assembly(self):
        # quasi-linear diffusion −∇·((1 + ε u²)∇u) = f on the fast path:
        # the x-dim operator is re-assembled on device inside the jitted
        # fixed point; Picard (lu) and Newton agree, and ε→0 recovers
        # the linear solve
        from pgdrome_tpu.separated import SeparatedPGD
        from pgdrome_tpu.fem.assembly import mass_matrix

        sep, Vs = self._problem()
        eps = 3.0
        hook_x = da.quasilinear_diffusion(
            Vs[0], lambda uq: eps * uq**2, dtype=jnp.float64
        )
        # parameter dim enters linearly: identity-weight entry
        Mp_l = jnp.asarray(np.diag(mass_matrix(Vs[1]).sum(axis=1)))
        hook_p = (lambda u: Mp_l @ u**3, lambda F: F @ (Mp_l @ F**3))
        nl = (hook_x, hook_p)
        kw = dict(n_max=1, tol=1e-12, tol_fp=1e-12, max_fp_it=120,
                  nonlinear=nl)
        res_p = SeparatedPGD(sep, solver="lu", **kw).solve()
        res_n = SeparatedPGD(sep, solver="newton", **kw).solve()
        u_p = np.outer(res_p.modes[0][0], res_p.modes[1][0])
        u_n = np.outer(res_n.modes[0][0], res_n.modes[1][0])
        np.testing.assert_allclose(u_p, u_n, rtol=1e-6, atol=1e-11)

        hook_x0 = da.quasilinear_diffusion(
            Vs[0], lambda uq: 0.0 * uq, dtype=jnp.float64
        )
        nl0 = (hook_x0, (lambda u: 0.0 * u, lambda F: 0.0))
        res_0 = SeparatedPGD(sep, solver="newton", n_max=1, tol=1e-12,
                             tol_fp=1e-11, max_fp_it=60,
                             nonlinear=nl0).solve()
        res_lin = SeparatedPGD(sep, solver="lu", n_max=1, tol=1e-12,
                               tol_fp=1e-11, max_fp_it=60).solve()
        u_0 = np.outer(res_0.modes[0][0], res_0.modes[1][0])
        u_l = np.outer(res_lin.modes[0][0], res_lin.modes[1][0])
        np.testing.assert_allclose(u_0, u_l, rtol=1e-9, atol=1e-13)

    def test_aot_key_distinguishes_meshes(self):
        # same source, same shapes, different mesh coords → different keys
        pts_a = np.linspace(0.0, 1.0, 9)
        pts_b = np.concatenate([[0.0], np.linspace(0.05, 1.0, 8)])
        Va = FunctionSpace(IntervalMesh.from_points(pts_a), "P", 1)
        Vb = FunctionSpace(IntervalMesh.from_points(pts_b), "P", 1)
        wfun = lambda uq: uq**2
        ka = da.quasilinear_diffusion(Va, wfun)[0]._pgdrome_key
        kb = da.quasilinear_diffusion(Vb, wfun)[0]._pgdrome_key
        assert ka != kb
