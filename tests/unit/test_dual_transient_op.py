"""Goal-oriented outputs for the OPERATOR-parametric transient family
(round-4 VERDICT weak #5): the space-time DualCorrector (n_fixed=2) and
the backward-in-time adjoint (adjoint_problem_nd — upwind transposes to
downwind) against the exact sparse-LU space-time FOM."""

import numpy as np
import pytest

from pgdrome_tpu.dual import DualCorrector, adjoint_problem_nd
from pgdrome_tpu.models.problems import (
    transient_conductivity_fom,
    transient_parametric_conductivity,
)
from pgdrome_tpu.recipes import two_stage_minres
from pgdrome_tpu.separated import evaluate_modes_1d


@pytest.fixture(scope="module")
def problem():
    sep, Vs = transient_parametric_conductivity(
        n_x=32, n_t=16, n_p=10, num_params=2)
    return sep, Vs, transient_conductivity_fom(sep, Vs)


@pytest.fixture(scope="module")
def primal(problem):
    sep, Vs, _ = problem
    return two_stage_minres(sep, n_stage1=20, n_stage2=12,
                            dtype=np.float64, tol_fp=1e-9)


def _sensor_factors(Vs, ix0):
    l_x = np.zeros(Vs[0].dim())
    l_x[ix0] = 1.0
    l_t = np.zeros(Vs[1].dim())
    l_t[-1] = 1.0
    return l_x, l_t


def test_fom_matches_collocation_system(problem):
    """The sparse-LU kron truth == the per-grid-point dense masked
    tensor system (the collocation semantics the separated solver
    converges to)."""
    sep, Vs, fom = problem
    grid = Vs[2].tabulate_dof_coordinates()[:, 0]
    p_idx = (3, 7)
    p = grid[list(p_idx)]
    ops = [np.asarray(o, dtype=np.float64) for o in sep.ops]
    c = np.ones(ops[0].shape[0])
    g = np.ones(sep.rhs[0].shape[0])
    for d, a in enumerate(p_idx):
        c *= np.diagonal(ops[2 + d], axis1=1, axis2=2)[:, a]
        g *= np.asarray(sep.rhs[2 + d])[:, a]
    A = sum(c[t] * np.kron(ops[0][t], ops[1][t])
            for t in range(len(c)))
    b = g @ np.asarray(sep.rhs[0])  # (R=1) → just rhs[0][0]*g
    b = np.kron(np.asarray(sep.rhs[0])[0], np.asarray(sep.rhs[1])[0]) * g[0]
    m = (np.asarray(sep.bc_masks[0])[:, None]
         * np.asarray(sep.bc_masks[1])[None, :]).ravel()
    A = A * m[:, None] * m[None, :] + np.diag(1.0 - m)
    u = np.linalg.solve(A, b * m)
    U = fom(p)
    np.testing.assert_allclose(U.ravel(), u, atol=1e-12)


def test_adjoint_transposes_time_stencil(problem):
    sep, Vs, _ = problem
    l_x, l_t = _sensor_factors(Vs, 5)
    adj = adjoint_problem_nd(sep, [l_x, l_t], n_fixed=2)
    np.testing.assert_allclose(
        np.asarray(adj.ops[1][0]), np.asarray(sep.ops[1][0]).T,
        atol=0,
    )
    # upwind stencil is NOT symmetric: transpose must differ
    assert np.abs(np.asarray(sep.ops[1][0])
                  - np.asarray(sep.ops[1][0]).T).max() > 0
    # functional masked at the primal's constrained t=0 row
    assert np.asarray(adj.rhs[1])[0][0] == 0.0 or l_t[0] == 0.0


def test_corrected_outputs_beat_field_floor(problem, primal):
    sep, Vs, fom = problem
    res_u = primal
    ix0 = Vs[0].dim() // 2
    l_x, l_t = _sensor_factors(Vs, ix0)
    adj = adjoint_problem_nd(sep, [l_x, l_t], n_fixed=2)
    res_z = two_stage_minres(adj, n_stage1=20, n_stage2=12,
                             dtype=np.float64, tol_fp=1e-9)
    dc = DualCorrector(sep, Vs, None, res_u, None, res_z, None,
                       n_fixed=2, l_factors=[l_x, l_t])
    grid = Vs[2].tabulate_dof_coordinates()[:, 0]
    rng = np.random.default_rng(0)
    pts = grid[rng.integers(1, len(grid) - 1, size=(6, 2))]
    pts[0] = (grid[1], grid[1])
    pts[1] = (grid[-2], grid[-2])
    s_true = np.array([fom(p)[ix0, -1] for p in pts])
    s_corr, s_plain, z_r = dc.corrected(pts, return_parts=True)
    scale = np.abs(s_true).max()
    plain_err = np.abs(s_plain - s_true).max() / scale
    corr_err = np.abs(s_corr - s_true).max() / scale
    assert corr_err < 0.05 * plain_err
    # the correction term IS the output error estimate (effectivity→1)
    eff = z_r / (s_true - s_plain)
    assert np.all(np.abs(eff - 1.0) < 0.05)


def test_exact_identity_with_exact_dual(problem, primal):
    """The discrete-adjoint identity  s_true = l·u_r + z·r(p)  holds to
    MACHINE precision for an EXACT per-sample adjoint z = A(p)⁻ᵀ(ml)
    and ANY reduced primal u_r — this pins the masked-system transpose
    bookkeeping (the 'FOM-identity gotcha': bc rows identity, bc
    columns not) independently of solver quality; the reduced dual's
    corrected error is then quadratic by construction."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    sep, Vs, fom = problem
    res_u = primal
    ix0 = 9
    l_x, l_t = _sensor_factors(Vs, ix0)
    grid = Vs[2].tabulate_dof_coordinates()[:, 0]
    ops = [np.asarray(o, dtype=np.float64) for o in sep.ops]
    mx = np.asarray(sep.bc_masks[0])
    mt = np.asarray(sep.bc_masks[1])
    m = (mx[:, None] * mt[None, :]).ravel()
    b = (np.kron(np.asarray(sep.rhs[0])[0],
                 np.asarray(sep.rhs[1])[0]) * m)
    lvec = np.kron(l_x * mx, l_t * mt)
    for p_idx in ((2, 8), (9, 3)):
        p = grid[list(p_idx)]
        c = np.ones(ops[0].shape[0])
        g1 = 1.0
        for d, a in enumerate(p_idx):
            c *= np.diagonal(ops[2 + d], axis1=1, axis2=2)[:, a]
            g1 *= np.asarray(sep.rhs[2 + d])[0, a]
        A = sum(c[t] * np.kron(ops[0][t] * mx[:, None] * mx[None, :],
                               ops[1][t] * mt[:, None] * mt[None, :])
                for t in range(len(c))) + np.diag(1.0 - m)
        A = sp.csc_matrix(A)
        u_true = spla.spsolve(A, b * g1)
        s_true = lvec @ u_true
        # ANY reduced primal: evaluate res_u at p
        fac = np.ones(res_u.n_modes)
        for j, a in enumerate(p_idx):
            vals = np.asarray(evaluate_modes_1d(
                Vs[2 + j], res_u.modes[2 + j],
                np.asarray([grid[a]]), xp=np))[0]
            fac *= vals[: res_u.n_modes]
        u_r = np.einsum(
            "k,ki,kj->ij", fac,
            np.asarray(res_u.modes[0])[: res_u.n_modes],
            np.asarray(res_u.modes[1])[: res_u.n_modes],
        ).ravel()
        z = spla.spsolve(A.T.tocsc(), lvec)
        s_corr = lvec @ u_r + z @ (b * g1 - A @ u_r)
        assert abs(s_corr - s_true) < 1e-12 * abs(s_true)


def test_recipe_small_scale():
    from pgdrome_tpu.recipes import transient_goal_oriented

    duals, rep = transient_goal_oriented(
        [0.5], n_x=32, n_t=16, n_p=10, num_params=2, bound=5e-7,
        primal_stages=(20, 12), dual_stage1=12, dual_budget=12,
        max_dual_stages=3, n_random=4, seeds=(7,), dtype=np.float64,
        tol_fp=1e-9)
    assert rep["max_corrected"] < 0.05 * rep["primal_field_rel_max"]
    assert rep["sensors"][0]["history"]  # per-stage audit present
