"""Exact Sobol'/ANOVA sensitivity indices from the separated structure
(pgdrome_tpu/uq.py + Vademecum.sobol).

Verified three independent ways: (1) hand-built separated solutions with
closed-form analytic indices (the FE spaces represent the factors
exactly, so the module's 'exact' claim is testable to f64 roundoff);
(2) Saltelli pick-freeze Monte-Carlo through the serving sensor sweep on
a trained PGD; (3) the TransientVademecum overrides against an explicit
kron-mass computation.  The reference has no counterpart capability —
its sensitivity story is per-sample FD/derivatives (reference
model.py:1088-1206)."""

import numpy as np
import pytest

from pgdrome_tpu.fem.mesh import IntervalMesh
from pgdrome_tpu.fem.space import FunctionSpace
from pgdrome_tpu.separated import PGDResult
from pgdrome_tpu.serving import TransientVademecum, Vademecum
from pgdrome_tpu.uq import factor_stats, sobol_from_stats


def _space(n, degree, a=0.0, b=1.0):
    return FunctionSpace(IntervalMesh(n, a, b), "P", degree)


def _result(modes):
    modes = [np.asarray(m, np.float64) for m in modes]
    K = modes[0].shape[0]
    return PGDResult(
        modes=modes, n_modes=K, amplitudes=np.ones(K),
        alpha=np.ones(K), fp_its=np.ones(K, int), normU0=1.0,
    )


@pytest.fixture(scope="module")
def additive():
    """u(x, p, q) = x·p + x²·q² on [0,1]³ — exactly representable
    (P2 space dim, P1 p, P2 q), additive (no interaction): S == ST,
    V_p(x) = x²/12, V_q(x) = x⁴·(4/45)."""
    Vx, Vp, Vq = _space(8, 2), _space(6, 1), _space(6, 2)
    x = Vx.dof_coords[:, 0]
    p = Vp.dof_coords[:, 0]
    q = Vq.dof_coords[:, 0]
    res = _result([
        np.stack([x, x**2]),
        np.stack([p, np.ones_like(p)]),
        np.stack([np.ones_like(q), q**2]),
    ])
    return Vademecum([Vx, Vp, Vq], res, dtype=np.float64)


class TestAnalyticAdditive:
    def test_pointwise(self, additive):
        pts = np.array([0.3, 0.7, 1.0])
        out = additive.sobol(points=pts)
        mean = pts / 2 + pts**2 / 3
        v_p = pts**2 / 12
        v_q = pts**4 * (4 / 45)
        var = v_p + v_q
        np.testing.assert_allclose(out["mean"], mean, rtol=1e-12)
        np.testing.assert_allclose(out["variance"], var, rtol=1e-12)
        np.testing.assert_allclose(out["first"][0], v_p / var, rtol=1e-12)
        np.testing.assert_allclose(out["first"][1], v_q / var, rtol=1e-12)
        # additive model: total == first
        np.testing.assert_allclose(out["total"], out["first"], rtol=1e-12)

    def test_aggregated(self, additive):
        out = additive.sobol()
        # ∫V_p = 1/36, ∫V_q = 4/225 (unit domain: already the means)
        v_p, v_q = 1 / 36, 4 / 225
        var = v_p + v_q
        np.testing.assert_allclose(out["variance"], var, rtol=1e-12)
        np.testing.assert_allclose(out["first"], [v_p / var, v_q / var],
                                   rtol=1e-12)
        np.testing.assert_allclose(out["total"], out["first"], rtol=1e-12)
        # aggregated mean is the mean FIELD at the dim-0 dofs
        Vx = additive.spaces[0]
        x = Vx.dof_coords[:, 0]
        np.testing.assert_allclose(out["mean"], x / 2 + x**2 / 3,
                                   rtol=1e-12, atol=1e-15)

    def test_density(self, additive):
        # unnormalized ρ(p) = p on [0,1]: E[p] = 2/3, Var(p) = 1/18
        out = additive.sobol(points=np.array([0.5]),
                             densities=[lambda t: t, None])
        v_p = 0.25 / 18
        v_q = 0.5**4 * (4 / 45)
        np.testing.assert_allclose(out["variance"], v_p + v_q, rtol=1e-12)
        np.testing.assert_allclose(out["first"][0], v_p / (v_p + v_q),
                                   rtol=1e-12)


class TestInteraction:
    def test_product_model(self):
        """u = x·p·q (pure interaction on the centered parts):
        closed-form S_p = S_q = (Var·E²)/(E[p²]E[q²]−E²E²) style —
        computed from raw moments below."""
        Vx, Vp, Vq = _space(4, 1), _space(5, 1), _space(7, 1)
        x = Vx.dof_coords[:, 0]
        p = Vp.dof_coords[:, 0]
        q = Vq.dof_coords[:, 0]
        vd = Vademecum(
            [Vx, Vp, Vq], _result([x[None], p[None], q[None]]),
            dtype=np.float64,
        )
        out = vd.sobol(points=np.array([1.0]))
        ep, ep2 = 1 / 2, 1 / 3
        var = ep2 * ep2 - (ep * ep) ** 2
        v_first = ep**2 * (ep2 - ep**2)  # Var of E[u|p] = p·E[q]
        np.testing.assert_allclose(out["variance"][0], var, rtol=1e-12)
        np.testing.assert_allclose(out["first"][0, 0], v_first / var,
                                   rtol=1e-12)
        np.testing.assert_allclose(out["first"][1, 0], v_first / var,
                                   rtol=1e-12)
        # total = 1 - V_other/Var
        v_tot = var - v_first
        np.testing.assert_allclose(out["total"][0, 0], v_tot / var,
                                   rtol=1e-12)
        # interaction present: total strictly above first
        assert out["total"][0, 0] > out["first"][0, 0] + 0.05

    def test_second_order_product_model(self):
        # u = p·q at x=1: S_p = S_q computed above, and the REST of the
        # variance is pure pairwise interaction: S_pq = 1 - S_p - S_q
        Vx, Vp, Vq = _space(4, 1), _space(5, 1), _space(7, 1)
        x = Vx.dof_coords[:, 0]
        p = Vp.dof_coords[:, 0]
        q = Vq.dof_coords[:, 0]
        vd = Vademecum(
            [Vx, Vp, Vq], _result([x[None], p[None], q[None]]),
            dtype=np.float64,
        )
        out = vd.sobol(points=np.array([1.0]), second_order=True)
        s2 = out["second"]
        assert s2.shape == (2, 2, 1)
        np.testing.assert_allclose(s2[0, 0], 0.0, atol=1e-15)
        np.testing.assert_allclose(
            s2[0, 1], 1.0 - out["first"].sum(axis=0), rtol=1e-12
        )
        np.testing.assert_allclose(s2[0, 1], s2[1, 0], rtol=1e-15)

    def test_second_order_additive_is_zero(self, additive):
        out = additive.sobol(points=np.array([0.4]), second_order=True)
        np.testing.assert_allclose(out["second"], 0.0, atol=1e-12)

    def test_group_indices(self):
        # u = x·(p + q·r): group {q, r} closed == combined q,r effects;
        # group of ALL dims: closed == total == 1
        Vx = _space(4, 1)
        Vp, Vq, Vr = _space(5, 1), _space(6, 1), _space(7, 1)
        x = Vx.dof_coords[:, 0]
        p = Vp.dof_coords[:, 0]
        q = Vq.dof_coords[:, 0]
        r = Vr.dof_coords[:, 0]
        one = np.ones_like
        vd = Vademecum(
            [Vx, Vp, Vq, Vr],
            _result([
                np.stack([x, x]),
                np.stack([p, one(p)]),
                np.stack([one(q), q]),
                np.stack([one(r), r]),
            ]),
            dtype=np.float64,
        )
        pts = np.array([1.0])
        g = vd.sobol_group([1, 2], points=pts)
        # Var(E[u|q,r]) = Var(q·r) = E[q²]E[r²] − (E[q]E[r])²
        vqr = (1 / 3) ** 2 - (1 / 4) ** 2
        var = 1 / 12 + vqr  # p additive with the q·r block
        np.testing.assert_allclose(g["variance"][0], var, rtol=1e-12)
        np.testing.assert_allclose(g["closed"][0], vqr / var, rtol=1e-12)
        # no p↔(q,r) interaction: total == closed
        np.testing.assert_allclose(g["total"], g["closed"], rtol=1e-12)
        gall = vd.sobol_group([0, 1, 2], points=pts)
        np.testing.assert_allclose(gall["closed"], 1.0, rtol=1e-12)
        np.testing.assert_allclose(gall["total"], 1.0, rtol=1e-12)
        with pytest.raises(ValueError, match="subset"):
            vd.sobol_group([5], points=pts)

    def test_deterministic_dim(self):
        # a parameter the solution does not depend on: S = ST = 0
        Vx, Vp, Vq = _space(4, 1), _space(5, 1), _space(5, 1)
        x = Vx.dof_coords[:, 0]
        p = Vp.dof_coords[:, 0]
        ones = np.ones(Vq.dof_coords.shape[0])
        vd = Vademecum(
            [Vx, Vp, Vq], _result([x[None], p[None], ones[None]]),
            dtype=np.float64,
        )
        out = vd.sobol(points=np.array([0.8]))
        np.testing.assert_allclose(out["first"][1], 0.0, atol=1e-13)
        np.testing.assert_allclose(out["total"][1], 0.0, atol=1e-13)
        np.testing.assert_allclose(out["first"][0], 1.0, rtol=1e-12)


class TestMonteCarloCrossCheck:
    def test_saltelli_pick_freeze(self):
        import jax.numpy as jnp

        from pgdrome_tpu.models.problems import parametric_elliptic
        from pgdrome_tpu.separated import SeparatedPGD

        sep, Vs = parametric_elliptic(n_x=40, n_p=16, num_params=3)
        res = SeparatedPGD(sep, n_max=6, tol=1e-12, tol_fp=1e-8).solve()
        vd = Vademecum(Vs, res, dtype=np.float64)
        pts = np.array([0.35, 0.6])
        out = vd.sobol(points=pts)
        sensor = vd.sensors(pts)
        rng = np.random.default_rng(7)
        N = 60_000
        A = rng.uniform(0.0, 1.0, size=(N, 3))
        B = rng.uniform(0.0, 1.0, size=(N, 3))
        yA = np.asarray(sensor(jnp.asarray(A)), np.float64)
        yB = np.asarray(sensor(jnp.asarray(B)), np.float64)
        # CENTERED pick-freeze (Janon): the uncentered ⟨yA·yC⟩−μ²
        # estimator noise scales with mean²/var ≈ 500 here and needs
        # millions of samples; centering removes the μ² cancellation
        mu = 0.5 * (yA.mean(axis=0) + yB.mean(axis=0))
        var = 0.5 * (yA.var(axis=0) + yB.var(axis=0))
        np.testing.assert_allclose(out["variance"], var, rtol=0.05)
        np.testing.assert_allclose(out["mean"], mu, rtol=0.01)
        for j in range(3):
            C = B.copy()
            C[:, j] = A[:, j]
            yC = np.asarray(sensor(jnp.asarray(C)), np.float64)
            s_mc = ((yA - mu) * (yC - mu)).mean(axis=0) / var
            st_mc = 0.5 * ((yB - yC) ** 2).mean(axis=0) / var
            np.testing.assert_allclose(out["first"][j], s_mc, atol=0.02)
            np.testing.assert_allclose(out["total"][j], st_mc, atol=0.02)
        # sanity on the exact values themselves
        assert np.all(out["first"] > -1e-10)
        assert np.all(out["total"] >= out["first"] - 1e-10)


class TestTransient:
    def _vd(self):
        Vx, Vt, Vp = _space(6, 1), _space(5, 1), _space(7, 1)
        x = Vx.dof_coords[:, 0]
        t = Vt.dof_coords[:, 0]
        p = Vp.dof_coords[:, 0]
        res = _result([
            np.stack([x, x * x]),
            np.stack([t, np.ones_like(t)]),
            np.stack([p, p * p]),
        ])
        return TransientVademecum([Vx, Vt, Vp], res, field_dims=2,
                                  dtype=np.float64), (Vx, Vt, Vp)

    def test_pointwise_matches_manual(self):
        vd, (Vx, Vt, Vp) = self._vd()
        # points AT mesh nodes (x: 6 cells, t: 5 cells) so the P1
        # interpolants reproduce x·t and x² exactly there
        pts = np.array([[0.5, 0.2], [1.0, 1.0]])
        out = vd.sobol(points=pts)
        # manual: u(x,t,p) = (x·t)·p + x²·p²; at fixed (x,t) the output
        # weights are a_1 = x·t, a_2 = x²
        p = Vp.dof_coords[:, 0]
        stats = factor_stats([Vp], [np.stack([p, p * p])], 2)
        a = np.stack([pts[:, 0] * pts[:, 1], pts[:, 0] ** 2])
        man = sobol_from_stats(stats, table=a)
        np.testing.assert_allclose(out["variance"], man["variance"],
                                   rtol=1e-12)
        np.testing.assert_allclose(out["first"], man["first"], rtol=1e-12)
        np.testing.assert_allclose(out["total"], man["total"], rtol=1e-12)

    def test_aggregated_matches_explicit_kron(self):
        from pgdrome_tpu.fem.assembly import mass_matrix

        vd, (Vx, Vt, Vp) = self._vd()
        out = vd.sobol()
        Mx = np.asarray(mass_matrix(Vx), np.float64)
        Mt = np.asarray(mass_matrix(Vt), np.float64)
        W = np.kron(Mx, Mt)
        U = np.asarray(vd._modes[0], np.float64)
        vol = float(np.sum(Vx.q_weights)) * float(np.sum(Vt.q_weights))
        p = Vp.dof_coords[:, 0]
        stats = factor_stats([Vp], [np.stack([p, p * p])], 2)
        man = sobol_from_stats(stats, out_gram=U @ W @ U.T / vol)
        np.testing.assert_allclose(out["variance"], man["variance"],
                                   rtol=1e-12)
        np.testing.assert_allclose(out["first"], man["first"], rtol=1e-12)
        np.testing.assert_allclose(out["total"], man["total"], rtol=1e-12)


class TestMainEffect:
    def test_analytic(self, additive):
        # u = x·p + x²·q²: g_p(v; x) = x·(v − 1/2), g_q(v; x) = x²(v² − 1/3)
        x = np.array([0.4, 0.9])
        v = np.array([0.0, 0.25, 0.5, 1.0])
        mean, gp = additive.main_effect(0, v, points=x)
        np.testing.assert_allclose(mean, x / 2 + x**2 / 3, rtol=1e-12)
        np.testing.assert_allclose(gp, np.outer(v - 0.5, x), rtol=1e-12,
                                   atol=1e-15)
        _, gq = additive.main_effect(1, v, points=x)
        np.testing.assert_allclose(gq, np.outer(v**2 - 1 / 3, x**2),
                                   rtol=1e-12, atol=1e-15)

    def test_variance_consistency(self, additive):
        # ∫ g_j(v)² dv == the first-order Sobol numerator V_j (uniform
        # density; Gauss–Legendre over v, exact for these polynomials)
        from numpy.polynomial.legendre import leggauss

        xg, wg = leggauss(8)
        xg, wg = (xg + 1) / 2, wg / 2
        pt = np.array([0.6])
        out = additive.sobol(points=pt)
        for j in range(2):
            _, g = additive.main_effect(j, xg, points=pt)
            vj = float(wg @ (g[:, 0] ** 2))
            np.testing.assert_allclose(
                vj, out["first"][j, 0] * out["variance"][0], rtol=1e-12
            )

    def test_bad_dim(self, additive):
        with pytest.raises(ValueError, match="j must be"):
            additive.main_effect(5, np.array([0.5]), points=np.array([0.5]))


class TestComposition:
    def test_derivative_vademecum_sobol(self, additive):
        # sobol composes with derivative(): du/dx = p + 2x·q², so at any
        # x the variance split is Var(p)=1/12 vs 4x²·Var(q²)=4x²·4/45
        dvd = additive.derivative()
        x = 0.5
        out = dvd.sobol(points=np.array([x]))
        v_p, v_q = 1 / 12, 4 * x**2 * (4 / 45)
        np.testing.assert_allclose(out["variance"][0], v_p + v_q,
                                   rtol=1e-10)
        np.testing.assert_allclose(out["first"][0, 0], v_p / (v_p + v_q),
                                   rtol=1e-10)

    def test_vector_dim0_aggregated(self):
        # vector space dim: u = (x·p, x²·q) — aggregated variance sums
        # components under the block mass: ∫x²/12 + ∫x⁴·(4/45)
        from pgdrome_tpu.fem.space import VectorFunctionSpace

        Vx = VectorFunctionSpace(IntervalMesh(8, 0.0, 1.0), "P", 2, dim=2)
        Vp, Vq = _space(5, 1), _space(6, 2)
        # interleaved dofs (component index fastest); dof_coords lists
        # each scalar node once
        xs = Vx.dof_coords[:, 0]
        m1 = np.zeros(2 * xs.shape[0])
        m1[0::2] = xs
        m2 = np.zeros_like(m1)
        m2[1::2] = xs**2
        p = Vp.dof_coords[:, 0]
        q = Vq.dof_coords[:, 0]
        vd = Vademecum(
            [Vx, Vp, Vq],
            _result([
                np.stack([m1, m2]),
                np.stack([p, np.ones_like(p)]),
                np.stack([np.ones_like(q), q]),
            ]),
            dtype=np.float64,
        )
        out = vd.sobol()
        v_p = 1 / 36            # ∫x² dx · Var(p)
        v_q = (1 / 5) * (1 / 12)  # ∫x⁴ dx · Var(q)
        np.testing.assert_allclose(out["variance"], v_p + v_q, rtol=1e-12)
        np.testing.assert_allclose(
            out["first"], [v_p / (v_p + v_q), v_q / (v_p + v_q)],
            rtol=1e-12,
        )


class TestBruteForceRandom:
    """Random separated solutions vs direct tensor-grid ANOVA: per-dim
    per-cell Gauss nodes integrate the piecewise-poly factor products
    EXACTLY, so the brute force is exact too and everything must match
    to f64 roundoff (no hand-picked structure — rank 6, 3 params)."""

    def test_random_modes_full_anova(self):
        from pgdrome_tpu.fem.interpolate import eval_dofs_at_points

        rng = np.random.default_rng(42)
        K = 6
        Vx = _space(5, 2)
        Vps = [_space(4, 1), _space(5, 2), _space(3, 1)]
        modes = [rng.standard_normal((K, V.dof_coords.shape[0]))
                 for V in [Vx] + Vps]
        vd = Vademecum([Vx] + Vps, _result(modes), dtype=np.float64)
        pts = np.array([0.3, 0.85])
        out = vd.sobol(points=pts, second_order=True)

        # brute force: flattened per-dim quadrature nodes/weights
        nodes, weights, vals = [], [], []
        for V, m in zip(Vps, modes[1:]):
            x = V.q_points.reshape(-1)
            w = V.q_weights.reshape(-1)
            nodes.append(x)
            weights.append(w / w.sum())
            vals.append(np.stack([
                np.asarray(eval_dofs_at_points(V, m[k], x))
                for k in range(K)
            ]))
        a = np.stack([
            np.asarray(eval_dofs_at_points(Vx, modes[0][k], pts))
            for k in range(K)
        ])  # (K, n_pts)
        # u on the tensor grid: (n_pts, n1, n2, n3)
        u = np.einsum("kp,ka,kb,kc->pabc", a, *vals)
        w1, w2, w3 = weights
        mean = np.einsum("pabc,a,b,c->p", u, w1, w2, w3)
        e2 = np.einsum("pabc,pabc,a,b,c->p", u, u, w1, w2, w3)
        var = e2 - mean**2
        np.testing.assert_allclose(out["mean"], mean, rtol=1e-11)
        np.testing.assert_allclose(out["variance"], var, rtol=1e-10)

        # conditional means per dim -> first/total/second
        cm = [
            np.einsum("pabc,b,c->pa", u, w2, w3),
            np.einsum("pabc,a,c->pb", u, w1, w3),
            np.einsum("pabc,a,b->pc", u, w1, w2),
        ]
        v_first = [
            np.einsum("pa,pa,a->p", cm[0], cm[0], w1) - mean**2,
            np.einsum("pb,pb,b->p", cm[1], cm[1], w2) - mean**2,
            np.einsum("pc,pc,c->p", cm[2], cm[2], w3) - mean**2,
        ]
        for j in range(3):
            np.testing.assert_allclose(out["first"][j], v_first[j] / var,
                                       rtol=1e-8)
        # total via complements
        cm2 = [
            np.einsum("pabc,a->pbc", u, w1),   # integrate out p1
            np.einsum("pabc,b->pac", u, w2),
            np.einsum("pabc,c->pab", u, w3),
        ]
        v_rest = [
            np.einsum("pbc,pbc,b,c->p", cm2[0], cm2[0], w2, w3) - mean**2,
            np.einsum("pac,pac,a,c->p", cm2[1], cm2[1], w1, w3) - mean**2,
            np.einsum("pab,pab,a,b->p", cm2[2], cm2[2], w1, w2) - mean**2,
        ]
        for j in range(3):
            np.testing.assert_allclose(out["total"][j],
                                       (var - v_rest[j]) / var, rtol=1e-8)
        # pairwise interaction S_01 from closed V_{01} = Var(E[u|p1,p2])
        v01 = (np.einsum("pab,pab,a,b->p", cm2[2], cm2[2], w1, w2)
               - mean**2)
        s01 = (v01 - v_first[0] - v_first[1]) / var
        np.testing.assert_allclose(out["second"][0, 1], s01,
                                   rtol=1e-7, atol=1e-12)
        # group {0, 2}: closed == Var(E[u | p1, p3])
        from pgdrome_tpu.uq import sobol_group

        g = vd.sobol_group([0, 2], points=pts)
        v02 = (np.einsum("pac,pac,a,c->p", cm2[1], cm2[1], w1, w3)
               - mean**2)
        np.testing.assert_allclose(g["closed"], v02 / var, rtol=1e-8)
        np.testing.assert_allclose(g["total"], (var - v_first[1]) / var,
                                   rtol=1e-8)


class TestOutputCovariance:
    def test_analytic_additive(self, additive):
        # u = x·p + x²·q²: Cov(u(a), u(b)) = ab·Var(p) + a²b²·Var(q²)
        pts = np.array([0.3, 0.7, 1.0])
        mean, cov = additive.output_covariance(pts)
        np.testing.assert_allclose(mean, pts / 2 + pts**2 / 3, rtol=1e-12)
        expect = (np.outer(pts, pts) / 12
                  + np.outer(pts**2, pts**2) * (4 / 45))
        np.testing.assert_allclose(cov, expect, rtol=1e-12)
        # diagonal == per-output ANOVA variance
        out = additive.sobol(points=pts)
        np.testing.assert_allclose(np.diag(cov), out["variance"],
                                   rtol=1e-12)

    def test_random_modes_brute_force(self):
        from pgdrome_tpu.fem.interpolate import eval_dofs_at_points

        rng = np.random.default_rng(3)
        K = 5
        Vx = _space(5, 2)
        Vps = [_space(4, 1), _space(5, 2)]
        modes = [rng.standard_normal((K, V.dof_coords.shape[0]))
                 for V in [Vx] + Vps]
        vd = Vademecum([Vx] + Vps, _result(modes), dtype=np.float64)
        pts = np.array([0.2, 0.55, 0.9])
        mean, cov = vd.output_covariance(pts)
        # brute force on per-cell Gauss tensor grid (exact for the
        # piecewise-polynomial integrand)
        weights, vals = [], []
        for V, m in zip(Vps, modes[1:]):
            x = V.q_points.reshape(-1)
            w = V.q_weights.reshape(-1)
            weights.append(w / w.sum())
            vals.append(np.stack([
                np.asarray(eval_dofs_at_points(V, m[k], x))
                for k in range(K)
            ]))
        a = np.stack([
            np.asarray(eval_dofs_at_points(Vx, modes[0][k], pts))
            for k in range(K)
        ])
        u = np.einsum("kp,ka,kb->pab", a, *vals)
        w1, w2 = weights
        mean_bf = np.einsum("pab,a,b->p", u, w1, w2)
        cov_bf = (np.einsum("pab,qab,a,b->pq", u, u, w1, w2)
                  - np.outer(mean_bf, mean_bf))
        np.testing.assert_allclose(mean, mean_bf, rtol=1e-11)
        np.testing.assert_allclose(cov, cov_bf, rtol=1e-9, atol=1e-13)
        # symmetric PSD (up to roundoff)
        np.testing.assert_allclose(cov, cov.T, rtol=0, atol=0)
        assert np.linalg.eigvalsh(cov).min() > -1e-12

    def test_transient_diag_matches_sobol(self):
        Vx, Vt, Vp = _space(6, 1), _space(5, 1), _space(7, 1)
        x = Vx.dof_coords[:, 0]
        t = Vt.dof_coords[:, 0]
        p = Vp.dof_coords[:, 0]
        res = _result([
            np.stack([x, x * x]),
            np.stack([t, np.ones_like(t)]),
            np.stack([p, p * p]),
        ])
        vd = TransientVademecum([Vx, Vt, Vp], res, field_dims=2,
                                dtype=np.float64)
        pts = np.array([[0.5, 0.2], [1.0, 1.0]])
        mean, cov = vd.output_covariance(pts)
        out = vd.sobol(points=pts)
        np.testing.assert_allclose(mean, out["mean"], rtol=1e-12)
        np.testing.assert_allclose(np.diag(cov), out["variance"],
                                   rtol=1e-12)

    def test_bad_table_shape(self):
        from pgdrome_tpu.uq import output_covariance

        Vp = _space(4, 1)
        p = Vp.dof_coords[:, 0]
        stats = factor_stats([Vp], [np.stack([p, p * p])], 2)
        with pytest.raises(ValueError, match="table must be"):
            output_covariance(stats, np.ones((3, 2)))


class TestErrorPaths:
    def test_bad_density_count(self, additive):
        with pytest.raises(ValueError, match="one entry per parameter"):
            additive.sobol(densities=[None])

    def test_table_xor_gram(self):
        Vp = _space(4, 1)
        p = Vp.dof_coords[:, 0]
        stats = factor_stats([Vp], [p[None]], 1)
        with pytest.raises(ValueError, match="exactly one"):
            sobol_from_stats(stats)
        with pytest.raises(ValueError, match="exactly one"):
            sobol_from_stats(stats, table=np.ones((1, 1)),
                             out_gram=np.ones((1, 1)))

    def test_negative_density_mass(self, additive):
        with pytest.raises(ValueError, match="positive mass"):
            additive.sobol(densities=[lambda t: -np.ones_like(t), None])

    def test_nonscalar_param_dim_rejected(self):
        from pgdrome_tpu.fem.mesh import RectangleMesh

        V2 = FunctionSpace(RectangleMesh((0, 0), (1, 1), 2, 2), "P", 1)
        with pytest.raises(ValueError, match="1D scalar"):
            factor_stats([V2], [np.ones((1, V2.dof_coords.shape[0]))], 1)
