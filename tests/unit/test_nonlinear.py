"""Device-side nonlinear enrichment (solver='newton' + separable
quasi-linear terms).

Reference parity: the reference solves the SAME weak forms through either
the linear or the Newton (nonlinear) FEM dispatch and asserts the
amplitudes agree to 1e-8 (test_solver_problem.py:729-752, solver.py
:579-595).  Here the fast path grows the same capability:
``SeparatedPGD(solver='newton')`` runs ``ops.newton_solve`` (jax.jacfwd
Jacobian under ``lax.while_loop``) on every per-dim subproblem, and a
separable nonlinear term N(u) = ⊗_d N_d can be attached via the
``nonlinear`` hook (Picard with a direct solver, or full Newton).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pgdrome_tpu.models.problems import elastic_truss, parametric_elliptic
from pgdrome_tpu.separated import SeparatedPGD, make_enrich_step


class TestNewtonLinearParity:
    """Newton on a linear problem == the linear path (reference
    test_solver_problem.py:752 semantics on the fast path)."""

    def test_amplitudes_match_elliptic(self):
        sep, Vs = parametric_elliptic(n_x=48, n_p=12, num_params=2)
        kw = dict(n_max=6, tol=1e-12, tol_fp=1e-9, max_fp_it=60)
        res_lin = SeparatedPGD(sep, solver="lu", **kw).solve()
        res_newton = SeparatedPGD(sep, solver="newton", **kw).solve()
        assert res_newton.n_modes == res_lin.n_modes
        np.testing.assert_allclose(
            res_newton.amplitudes, res_lin.amplitudes, rtol=1e-8
        )
        for d in range(len(res_lin.modes)):
            np.testing.assert_allclose(
                np.asarray(res_newton.modes[d])[: res_lin.n_modes],
                np.asarray(res_lin.modes[d])[: res_lin.n_modes],
                rtol=1e-6, atol=1e-10,
            )

    def test_amplitudes_match_truss(self):
        # the reference's 1D truss physics (test_elastic.py) through both
        # dispatches
        sep, Vs = elastic_truss(n_x=31, n_E=20)
        kw = dict(n_max=4, tol=1e-12, tol_fp=1e-9, max_fp_it=60)
        res_lin = SeparatedPGD(sep, solver="lu", **kw).solve()
        res_newton = SeparatedPGD(sep, solver="newton", **kw).solve()
        np.testing.assert_allclose(
            res_newton.amplitudes, res_lin.amplitudes, rtol=1e-8
        )

    def test_scan_params_rejects_newton(self):
        sep, Vs = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        with pytest.raises(ValueError, match="linear direct solvers"):
            SeparatedPGD(sep, scan_params=True, solver="newton")

    def test_unknown_solver_still_raises(self):
        sep, Vs = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        with pytest.raises(ValueError, match="unknown solver"):
            SeparatedPGD(sep, solver="cholesky")


def _cubic_problem(eps, n_x=32, n_p=8):
    """−u'' + eps·u³ = f separated as x ⊗ p with collocation (lumped)
    nonlinear weights: N(u) = ⊗(M_lump u³) — a separable rank-1 nonlinear
    term the hook models exactly."""
    sep, Vs = parametric_elliptic(n_x=n_x, n_p=n_p, num_params=1)
    from pgdrome_tpu.fem.assembly import mass_matrix

    Mx_l = np.diag(mass_matrix(Vs[0]).sum(axis=1))
    Mp_l = np.diag(mass_matrix(Vs[1]).sum(axis=1))
    Mx_j = jnp.asarray(Mx_l)
    Mp_j = jnp.asarray(Mp_l)
    # contract: apply_d and weight_d are the SAME dim-d factor of the
    # separable term (weight_d(F) = F · apply_d(F)), so the scalar eps
    # appears in both dim-x entries
    nonlinear = (
        (lambda u: eps * (Mx_j @ u**3), lambda F: F @ (eps * (Mx_j @ F**3))),
        (lambda u: Mp_j @ u**3, lambda F: F @ (Mp_j @ F**3)),
    )
    return sep, Vs, nonlinear


class TestSeparableNonlinear:
    def test_newton_solves_the_subproblems(self):
        # at the fixed point every per-dim nonlinear residual must vanish:
        # the Newton solves actually solved their subproblems
        eps = 5.0
        sep, Vs, nl = _cubic_problem(eps)
        solver = SeparatedPGD(
            sep, n_max=1, tol=1e-12, tol_fp=1e-12, max_fp_it=80,
            solver="newton", nonlinear=nl,
        )
        res = solver.solve()
        assert res.n_modes == 1
        F = [np.asarray(m[0], dtype=np.float64) for m in res.modes]
        ops = [np.asarray(o, dtype=np.float64) for o in sep.ops]
        rhs = [np.asarray(r, dtype=np.float64) for r in sep.rhs]
        masks = [np.asarray(m, dtype=np.float64) for m in sep.bc_masks]
        from pgdrome_tpu.fem.assembly import mass_matrix

        Mx_l = np.diag(mass_matrix(Vs[0]).sum(axis=1))
        Mp_l = np.diag(mass_matrix(Vs[1]).sum(axis=1))
        # mirror the device contract exactly: weight_d(F) = F·apply_d(F)
        apply = [lambda u: eps * (Mx_l @ u**3), lambda u: Mp_l @ u**3]
        weight = [lambda G: G @ apply[0](G), lambda G: G @ apply[1](G)]
        for k in range(2):
            j = 1 - k
            # full term sum: A_k = Σ_t (F_j O_tj F_j) O_tk
            coef = np.einsum("tij,i,j->t", ops[j], F[j], F[j])
            A = np.einsum("t,tij->ij", coef, ops[k])
            b = (rhs[j][0] @ F[j]) * rhs[k][0]
            # BC system as the solver builds it
            m = masks[k]
            A = A * m[:, None] * m[None, :] + np.diag(1.0 - m)
            b = b * m
            theta = weight[j](F[j])
            r = A @ F[k] - b + theta * m * apply[k](F[k])
            assert np.linalg.norm(r) < 1e-8 * max(np.linalg.norm(b), 1.0)

    def test_picard_matches_newton(self):
        # mild nonlinearity: the lagged-Picard path (direct solver) and
        # full Newton converge to the same rank-1 fixed point
        sep, Vs, nl = _cubic_problem(eps=1.0)
        kw = dict(n_max=1, tol=1e-12, tol_fp=1e-12, max_fp_it=120,
                  nonlinear=nl)
        res_n = SeparatedPGD(sep, solver="newton", **kw).solve()
        res_p = SeparatedPGD(sep, solver="lu", **kw).solve()
        u_n = np.outer(res_n.modes[0][0], res_n.modes[1][0])
        u_p = np.outer(res_p.modes[0][0], res_p.modes[1][0])
        np.testing.assert_allclose(u_p, u_n, rtol=1e-7, atol=1e-12)

    def test_eps_zero_limit_is_linear(self):
        # eps → 0 recovers the linear solution (continuity sanity)
        sep, Vs, nl = _cubic_problem(eps=0.0)
        kw = dict(n_max=1, tol=1e-12, tol_fp=1e-11, max_fp_it=60)
        res_nl = SeparatedPGD(sep, solver="newton", nonlinear=nl, **kw).solve()
        res_lin = SeparatedPGD(sep, solver="lu", **kw).solve()
        u_nl = np.outer(res_nl.modes[0][0], res_nl.modes[1][0])
        u_lin = np.outer(res_lin.modes[0][0], res_lin.modes[1][0])
        np.testing.assert_allclose(u_nl, u_lin, rtol=1e-9, atol=1e-13)

    def test_nonlinearity_changes_the_solution(self):
        # the hook must actually do something: a strong cubic term damps
        # the solution vs the linear one
        sep, Vs, nl = _cubic_problem(eps=50.0)
        kw = dict(n_max=1, tol=1e-12, tol_fp=1e-11, max_fp_it=120)
        res_nl = SeparatedPGD(sep, solver="newton", nonlinear=nl, **kw).solve()
        res_lin = SeparatedPGD(sep, solver="lu", **kw).solve()
        u_nl = np.abs(np.outer(res_nl.modes[0][0], res_nl.modes[1][0]))
        u_lin = np.abs(np.outer(res_lin.modes[0][0], res_lin.modes[1][0]))
        assert u_nl.max() < u_lin.max()  # cubic damping

    def test_solve_fused_newton(self):
        # the single-dispatch fused program supports the newton path too
        sep, Vs = parametric_elliptic(n_x=32, n_p=8, num_params=2)
        kw = dict(n_max=4, tol=0.0, tol_fp=1e-9, max_fp_it=60,
                  residual_check=False)
        res_lu = SeparatedPGD(sep, solver="lu", **kw).solve_fused()
        res_nw = SeparatedPGD(sep, solver="newton", **kw).solve_fused()
        np.testing.assert_allclose(
            res_nw.amplitudes, res_lu.amplitudes, rtol=1e-8
        )
