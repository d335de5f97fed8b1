"""Nonlinear vademecum at honest semantics (round-4 VERDICT weak #3):
outer Picard with CP-compressed cube rhs on the linear fast path,
dense-verified against per-sample banded-NEWTON truth."""

import numpy as np
import pytest

from pgdrome_tpu.models.problems import (
    nonlinear_dense_verifier,
    nonlinear_elliptic,
    nonlinear_elliptic_fom,
)
from pgdrome_tpu.recipes import nonlinear_vademecum

EPS = 2.0


@pytest.fixture(scope="module")
def solved():
    sep, Vs, ml = nonlinear_elliptic(n_x=96, n_p=12, num_params=2)
    res, tf, rep = nonlinear_vademecum(
        sep, Vs, ml, EPS, budgets=(20, 14), dtype=np.float64,
        rhs_bucket=128, n_outer=8)
    return sep, Vs, ml, res, tf, rep


def test_newton_truth_solves_the_equation():
    sep, Vs, ml = nonlinear_elliptic(n_x=48, n_p=8, num_params=2)
    from pgdrome_tpu.fem.assembly import load_vector, stiffness_matrix

    fom = nonlinear_elliptic_fom(Vs[0], 2, EPS, ml)
    p = np.array([0.3, 0.8])
    u = fom(p)
    kap = lambda x: 1.0 + sum(
        p[i] * np.sin((i + 1) * np.pi * x) ** 2 / 4.0 for i in range(2))
    K = stiffness_matrix(Vs[0], weight=kap)
    b = load_vector(Vs[0], lambda x: np.ones_like(x))
    r = K @ u + EPS * np.asarray(ml) * u ** 3 - b
    assert np.abs(r[1:-1]).max() < 1e-11 * np.abs(b).max()
    assert u[0] == u[-1] == 0.0


def test_nonlinearity_is_significant(solved):
    """The linear solution must be FAR from the nonlinear truth (else
    the 'nonlinear' claim is a perturbation): measured ~2e-3 at eps=2."""
    sep, Vs, ml, res, tf, _ = solved
    from pgdrome_tpu.separated import SeparatedPGD, precondition_dim0

    ver = nonlinear_dense_verifier(Vs, EPS, ml, tf, n_random=4,
                                   seeds=(7,), n_edge=2)
    sep_pc, _ = precondition_dim0(sep, dtype=np.float64)
    res_lin = SeparatedPGD(sep_pc, n_max=20, tol=0.0,
                           residual_check=False,
                           dtype=np.float64).solve_fused()
    assert ver(res_lin)["max"] > 1e-3


def test_dense_verified_bound(solved):
    sep, Vs, ml, res, tf, rep = solved
    ver = nonlinear_dense_verifier(Vs, EPS, ml, tf, n_random=6,
                                   seeds=(7, 101), n_edge=4)
    v = ver(res)
    assert v["max"] < 1e-6, v
    # picard actually iterated and contracted
    assert rep["outer_iterations"] >= 3
    assert rep["history"][1]["rel_change"] < 1e-2
    assert rep["history"][1]["cube_terms"] > 0


def test_served_through_vademecum(solved):
    from pgdrome_tpu.serving import Vademecum

    sep, Vs, ml, res, tf, _ = solved
    vd = Vademecum(Vs, res, dim0_transform=tf, dtype=np.float64)
    grid = Vs[1].tabulate_dof_coordinates()[:, 0]
    p = np.array([[grid[3], grid[9]]])
    field = np.asarray(vd.fields(p))[0]
    fom = nonlinear_elliptic_fom(Vs[0], 2, EPS, ml)
    u_ref = fom(p[0])
    assert (np.linalg.norm(field - u_ref)
            < 1e-6 * np.linalg.norm(u_ref))
