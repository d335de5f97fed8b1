"""Randomized property parity: fast path == orchestration layer on random
separated problems.

Each case draws a random separated elliptic problem — number of dims,
per-dim mesh sizes and extents, space degree, lhs term count, rhs rank,
operator weights — plus random solver knobs (norm_modes, stop_fp, a random
seq_fp permutation), and asserts the jitted fast path (SeparatedPGD)
reproduces the reference-semantics orchestration layer (PGDProblem via
pgd_problem_from_separated) amplitude-for-amplitude to 1e-8.  This sweeps
knob combinations the hand-written parity tests pin individually
(reference semantics: solver.py:306-506 enrichment + :508-881 FP)."""

import numpy as np
import pytest

from pgdrome_tpu.fem.assembly import mass_matrix, stiffness_matrix
from pgdrome_tpu.fem.mesh import IntervalMesh
from pgdrome_tpu.fem.space import FunctionSpace
from pgdrome_tpu.models.problems import pgd_problem_from_separated
from pgdrome_tpu.separated import SeparatedPGD, SeparatedProblem


def random_problem(seed):
    """Random SPD separated problem: term 0 is a pure (weighted) tensor
    mass (strictly PD), terms 1..T-1 carry a stiffness in one cycling dim
    with weighted masses elsewhere — a randomly-weighted
    reaction–diffusion operator, Dirichlet ends in dim 0 only."""
    rng = np.random.default_rng(seed)
    nd = int(rng.integers(2, 4))
    sizes = [int(rng.integers(7, 22)) for _ in range(nd)]
    Vs = []
    for d, n_el in enumerate(sizes):
        lo = float(rng.uniform(-1.0, 0.5))
        hi = lo + float(rng.uniform(0.5, 2.0))
        deg = int(rng.integers(1, 3)) if d == 0 else 1
        Vs.append(FunctionSpace(IntervalMesh(n_el, lo, hi), "P", deg))
    M = [mass_matrix(V) for V in Vs]
    K = [stiffness_matrix(V) for V in Vs]

    T = int(rng.integers(2, 4))
    ops = []
    for d in range(nd):
        terms = [float(rng.uniform(0.3, 1.5)) * M[d]]
        for t in range(1, T):
            dim_k = (t - 1) % nd
            w = float(rng.uniform(0.2, 2.0))
            terms.append(w * (K[d] if d == dim_k else M[d]))
        ops.append(np.stack(terms))

    R = int(rng.integers(1, 4))
    rhs = []
    for d in range(nd):
        x = Vs[d].tabulate_dof_coordinates()[:, 0]
        rows = []
        for r in range(R):
            c = rng.normal(size=3)
            f = c[0] + c[1] * x + c[2] * np.sin(np.pi * x)
            rows.append(M[d] @ f)
        rhs.append(np.stack(rows))

    n0 = ops[0].shape[1]
    bc_dofs = [np.array([0, n0 - 1])] + [
        np.array([], dtype=np.int64) for _ in range(nd - 1)
    ]
    sep = SeparatedProblem(ops=ops, rhs=rhs, mass=list(M), bc_dofs=bc_dofs)

    knobs = {
        "norm_modes": str(rng.choice(["stiff", "l2", "no"])),
        "stop_fp": str(rng.choice(["norm", "delta"])),
        "seq_fp": list(rng.permutation(nd)),
    }
    return sep, Vs, knobs


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505])
def test_random_problem_fast_path_parity(seed):
    sep, Vs, knobs = random_problem(seed)
    n_max = 5
    fast = SeparatedPGD(
        sep, n_max=n_max, tol=1e-12, tol_fp=1e-8, max_fp_it=60,
        residual_check=False, norm_modes=knobs["norm_modes"],
        stop_fp=knobs["stop_fp"], seq_fp=knobs["seq_fp"],
    )
    res = fast.solve()

    compat = pgd_problem_from_separated(sep, Vs)
    compat.PGD_nmax = n_max
    compat.PGD_tol = 1e-12
    compat.tol_fp_it = 1e-8
    compat.max_fp_it = 60
    compat.stop_fp = knobs["stop_fp"]
    compat.norm_modes = knobs["norm_modes"]
    compat.seq_fp = knobs["seq_fp"]
    compat.solve_PGD(_problem="linear")

    amp_fast = np.asarray(res.amplitudes)
    amp_compat = np.asarray(compat.amplitude)
    # a random problem can be exactly low-rank (the next amplitude hits the
    # f64 floor, ~1e-16) — the layers may disagree on recording that final
    # below-tolerance mode, so compare the common prefix
    n = min(len(amp_fast), len(amp_compat))
    assert n >= 2, f"too few modes to compare (fast {len(amp_fast)}, compat {len(amp_compat)})"
    np.testing.assert_allclose(amp_fast[:n], amp_compat[:n], rtol=1e-6)
    # well-above-floor modes to reference precision; late tiny modes can
    # differ at ~1e-8 relative because the two layers may stop the (both
    # converged) fixed point at different sweep counts
    lead = [k for k in range(n) if amp_compat[k] > 1e-4]
    np.testing.assert_allclose(
        amp_fast[lead], amp_compat[lead], rtol=1e-8
    )
    if knobs["norm_modes"] != "no":
        np.testing.assert_allclose(
            np.asarray(res.alpha)[lead], np.asarray(compat.alpha)[lead],
            rtol=1e-8,
        )


@pytest.mark.parametrize("seed", [606, 707])
def test_random_problem_fused_matches_stepwise(seed):
    # the fully-fused fori_loop program must reproduce the per-mode jitted
    # path on the same random problem (same knobs, 'stiff'/'norm' only —
    # the fused program's supported configuration)
    sep, Vs, knobs = random_problem(seed)
    kw = dict(n_max=4, tol=0.0, tol_fp=1e-8, max_fp_it=40,
              residual_check=False, seq_fp=knobs["seq_fp"])
    res_step = SeparatedPGD(sep, **kw).solve()
    res_fused = SeparatedPGD(sep, **kw).solve_fused()
    np.testing.assert_allclose(
        np.asarray(res_fused.amplitudes)[: res_step.n_modes],
        np.asarray(res_step.amplitudes)[: res_step.n_modes],
        rtol=1e-9,
    )
