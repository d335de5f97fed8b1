"""Greedy separated (CP-like) approximation of multivariate functions.

PGD needs LOADS in separated form (Σ_r ⊗_d g_rd).  Simple sources separate
by inspection, but e.g. a moving heat source q(x − v·t) (welding/AM
surrogates, BASELINE.json config 5) does not.  This module builds a rank-R
separated approximation of a sampled tensor by greedy successive SVDs:

    values ≈ Σ_r  u_r ⊗ w_r(rest)   with  w_r  separated recursively.

For 2D tensors this is the truncated SVD (optimal); for d > 2 it is the
standard greedy PGD-style separation (each rank-1 term from leading
singular vectors of the residual's unfoldings).
"""

from __future__ import annotations

import numpy as np


def separate_rank1(values: np.ndarray, als_iters: int = 12):
    """Dominant rank-1 term of a d-way tensor: HOSVD leading vectors as the
    initial guess, refined by alternating least squares (each factor is the
    tensor contracted with all other normalized factors — the optimal
    rank-1 update per dimension).  Returns (factors, rank1_tensor)."""
    d = values.ndim
    factors = []
    for axis in range(d):
        unfold = np.moveaxis(values, axis, 0).reshape(values.shape[axis], -1)
        u, _, _ = np.linalg.svd(unfold, full_matrices=False)
        factors.append(u[:, 0])

    letters = "ijklmnop"[:d]
    for _ in range(als_iters):
        for axis in range(d):
            others = [factors[a] for a in range(d) if a != axis]
            sub = letters.replace(letters[axis], "")
            expr = f"{letters}," + ",".join(sub) + f"->{letters[axis]}"
            num = np.einsum(expr, values, *others)
            denom = np.prod([f @ f for f in others])
            factors[axis] = num / (denom + 1e-300)
        # renormalize all but the first factor for stability
        for axis in range(1, d):
            n = np.linalg.norm(factors[axis])
            if n > 0:
                factors[axis] /= n
                factors[0] *= n

    t = factors[0]
    for f in factors[1:]:
        t = np.multiply.outer(t, f)
    return factors, t


def separate(values: np.ndarray, rank: int, tol: float = 1e-10):
    """Greedy rank-R separation: returns a list over dims of (R, n_d)
    factor matrices with  values ≈ Σ_r ⊗_d factors[d][r].

    Greedy: repeatedly strip the dominant rank-1 term from the residual.
    Relative Frobenius tolerance `tol` stops early."""
    values = np.asarray(values, dtype=np.float64)
    d = values.ndim
    norm0 = np.linalg.norm(values)
    residual = values.copy()
    facs = [[] for _ in range(d)]
    for r in range(rank):
        f, t = separate_rank1(residual)
        for dim in range(d):
            facs[dim].append(f[dim])
        residual = residual - t
        if norm0 > 0 and np.linalg.norm(residual) / norm0 < tol:
            break
    return [np.stack(f) for f in facs]


def separation_error(values: np.ndarray, factors) -> float:
    """Relative Frobenius error of a separated representation."""
    approx = np.zeros_like(values, dtype=np.float64)
    R = factors[0].shape[0]
    for r in range(R):
        t = factors[0][r]
        for d in range(1, len(factors)):
            t = np.multiply.outer(t, factors[d][r])
        approx += t
    return float(np.linalg.norm(values - approx) / np.linalg.norm(values))


def separate_function(fn, grids, rank: int, tol: float = 1e-10):
    """Sample ``fn(*mesh coordinates)`` on the tensor grid and separate.

    fn: callable taking d broadcastable coordinate arrays;
    grids: per-dim 1D coordinate arrays.  Returns factor matrices (R, n_d).
    """
    mesh = np.meshgrid(*grids, indexing="ij")
    values = np.asarray(fn(*mesh), dtype=np.float64)
    return separate(values, rank, tol)
