"""Anchored-ANOVA initialization (pgdrome_tpu/anova.py).

The construction promises exactness on the anchored axis lines (order 1)
and pair planes (order 2) at parameter GRID points — those are per-point
f64 FOM solves by derivation — plus a strictly smaller interaction
remainder than the anchor solve alone.  Verified against the per-sample
banded f64 FEM truth (models.problems.elliptic_dense_verifier), the same
oracle the frontier claims use."""

import numpy as np
import pytest

from pgdrome_tpu.anova import CollocationPointSolver, anova_init
from pgdrome_tpu.models.problems import (
    elliptic_dense_verifier,
    parametric_elliptic,
)
from pgdrome_tpu.separated import precondition_dim0


@pytest.fixture(scope="module")
def small_problem():
    sep, Vs = parametric_elliptic(n_x=48, n_p=12, num_params=3, degree_x=2)
    sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
    return sep, sep_pc, tf, Vs


def test_point_solver_matches_fem(small_problem):
    """Per-grid-point collocation solve == the banded FEM truth solver
    (collocation semantics: vademecum = exact lookup table,
    models/problems.py:68-75)."""
    from pgdrome_tpu.models.problems import elliptic_fem_solver

    sep, _, _, Vs = small_problem
    ps = CollocationPointSolver(sep)
    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    fem = elliptic_fem_solver(Vs[0], 3)
    # interior grid indices only: row-sum lumping of the linear weight
    # is exact over interior P1 hats but not the boundary half-hats,
    # which is why the verified parameter box is the INNER grid
    # (models/problems.py:68-75, elliptic_dense_verifier lo/hi).
    for idx in [(1, 3, 7), (5, 5, 5), (11, 1, 9)]:
        u = ps.solve(idx)
        u_ref = fem(grid[list(idx)])
        assert np.linalg.norm(u - u_ref) <= 1e-10 * np.linalg.norm(u_ref)


def test_axis_line_exactness(small_problem):
    sep, _, tf, Vs = small_problem
    res, rep = anova_init(sep, order=1, tf=tf)
    ver = elliptic_dense_verifier(Vs, tf, n_random=4, seeds=(7,))
    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    anc = grid[rep["anchor"][0]]
    pts = np.array([[grid[2], anc, anc], [anc, grid[9], anc],
                    [anc, anc, grid[1]]])
    errs = ver.sample_errors(res, pts)
    assert errs.max() < 1e-8  # svd tol_axis truncation floor


def test_pair_plane_exactness_and_improvement(small_problem):
    sep, _, tf, Vs = small_problem
    res1, rep1 = anova_init(sep, order=1, tf=tf)
    res2, rep2 = anova_init(sep, order=2, tf=tf)
    assert res2.n_modes > res1.n_modes
    ver = elliptic_dense_verifier(Vs, tf, n_random=8, seeds=(7, 101))
    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    anc = grid[rep2["anchor"][2]]
    pts = np.array([[grid[2], grid[10], anc], [grid[11], grid[1], anc]])
    errs = ver.sample_errors(res2, pts)
    # pair tables held in f32 + tol_pair truncation: ~1e-7 floor
    assert errs.max() < 5e-6
    v1, v2 = ver(res1), ver(res2)
    assert v2["max"] < 0.25 * v1["max"]


def test_anchor_report_and_custom_anchor(small_problem):
    sep, _, tf, _ = small_problem
    res, rep = anova_init(sep, order=1, tf=tf, anchor=[3, 4, 5])
    assert rep["anchor"] == [3, 4, 5]
    assert rep["rank"] == res.n_modes
    assert len(rep["axis"]) == 3
    assert all(a["tail"] < 1e-9 for a in rep["axis"])


def test_non_collocation_raises():
    sep, _ = parametric_elliptic(n_x=24, n_p=8, num_params=2,
                                 param_discretization="galerkin")
    with pytest.raises(ValueError, match="collocation"):
        CollocationPointSolver(sep)


def test_full_to_modes_roundtrip(small_problem):
    _, _, tf, Vs = small_problem
    rng = np.random.default_rng(0)
    n_full = Vs[0].dim()
    X = np.zeros((4, n_full))
    X[:, tf.interior] = rng.standard_normal((4, len(tf.interior)))
    back = tf.modes_to_full(tf.full_to_modes(X))
    assert np.abs(back - X).max() < 1e-12 * np.abs(X).max()


def test_cascade_from_anova_init(small_problem):
    """adaptive_cascade consumes the ANOVA surrogate as init_result and
    improves on it (the round-5 frontier recipe,
    recipes.highd_frontier(anova_order=2))."""
    from pgdrome_tpu.recipes import adaptive_cascade

    sep, sep_pc, tf, Vs = small_problem
    init, _ = anova_init(sep, order=2, tf=tf)
    ver = elliptic_dense_verifier(Vs, tf, n_random=4, seeds=(7,))
    base = ver(init)["max"]
    best, hist = adaptive_cascade(
        sep_pc, ver, bound=1e-9, n_stage1=8, stage_budget=8,
        max_stages=2, init_result=init, rhs_bucket=256,
    )
    assert hist[0]["rank"] == init.n_modes  # stage 1 verifies the input
    assert hist[-1]["max"] < 0.2 * base
