"""Anchored-ANOVA initialization for high-dimensional collocation PGD.

Motivation (FRONTIER.md, FRONTIER_SOBOL_d10.json): the d=10 frontier
field is rank-walled — flat rank-1 enrichment follows err ~ rank^-1.55,
extrapolating to rank ~19k for a uniform 1e-5 — yet its own Sobol'
decomposition shows the solution is measurably near-additive
(interaction variance share 0.08%).  Flat PGD spends full d-dimensional
modes on an essentially additive object.

This module builds the additive (and pairwise) structure EXACTLY and
hands the cascade only the genuine interaction remainder:

* For a collocation-discretized separated problem (diagonal parameter
  operators — :func:`models.problems.parametric_elliptic`'s default),
  the tensor system decouples into one dim-0 FEM system per parameter
  grid point:  [Σ_t (Π_d C_td[a_d]) A_t] u = Σ_r (Π_d g_rd[a_d]) b_r.
  Each system is a banded f64 host solve (~0.2 ms at n0=2049), so
  full axis sweeps (d·n_p solves) and pair tables (n_p² solves) are
  cheap and EXACT — no PGD truncation, no f32 floor.
* The anchored-ANOVA surrogate
      u ≈ u(p̄) + Σ_i [u(p_i, p̄_-i) − u(p̄)]
            + Σ_{i<j} [u(p_i, p_j, p̄_-ij) − u_i − u_j − u(p̄)]
  is exact on every axis line (order ≥ 1) and pair plane (order ≥ 2)
  through the anchor p̄; its global error is the 2nd/3rd-order
  interaction remainder — the ~1e-3-smaller target the full-mode
  cascade then enriches (:func:`recipes.adaptive_cascade`
  ``init_result``).
* Tables are SVD-compressed (axis: exact thin SVD; pair: randomized
  range finder + per-component SVD) into separated rank-1 modes whose
  factors are ONES on untouched dims — the standard PGD format, so all
  downstream machinery (residual cascade, Galerkin update, screened
  verification, serving) applies unchanged.

Reference contrast: PGDrome's core claim is dimensionality separation
itself (reference solver.py:538-724 enriches flat rank-1 modes); it has
no structure-exploiting initialization — at d=10 flat enrichment is
exactly what hits the measured rank wall.
"""

from __future__ import annotations

import numpy as np

from pgdrome_tpu.separated import PGDResult, SeparatedProblem

__all__ = ["CollocationPointSolver", "anova_init"]


class CollocationPointSolver:
    """Exact f64 per-parameter-grid-point solver for a collocation
    separated problem: banded dim-0 solves with per-point separated
    coefficients.

    Requires every parameter dim's operator stack to be DIAGONAL
    (collocation / lumped discretization) — then the tensor system
    block-diagonalizes over the parameter grid and ``solve(idx)``
    returns the exact FOM solution at that grid point (boundary-boost
    measure re-weightings cancel between lhs and rhs by construction,
    models/problems.py:113-164)."""

    def __init__(self, sep: SeparatedProblem):
        ops0 = np.asarray(sep.ops[0], dtype=np.float64)
        m = np.asarray(sep.bc_masks[0], dtype=np.float64)
        T, n, _ = ops0.shape
        Am = ops0 * m[None, :, None] * m[None, None, :]
        bw = 0
        for t in range(T):
            r, c = np.nonzero(Am[t])
            if r.size:
                bw = max(bw, int(np.abs(r - c).max()))
        self.bw = bw
        self.n0 = n
        bands = np.zeros((T, 2 * bw + 1, n))
        for t in range(T):
            for k in range(-bw, bw + 1):
                d = np.diagonal(Am[t], k)
                if k >= 0:
                    bands[t, bw - k, k:k + d.size] = d
                else:
                    bands[t, bw - k, :d.size] = d
        self.bands = bands
        self.diag_bc = 1.0 - m  # identity rows on constrained dofs
        self.rhs0 = np.asarray(sep.rhs[0], dtype=np.float64) * m[None, :]
        self.C = []   # per param dim: (T, n_d) lhs diagonals
        self.G = []   # per param dim: (R, n_d) rhs factors
        for d in range(1, sep.num_dims):
            od = np.asarray(sep.ops[d], dtype=np.float64)
            diag = np.ascontiguousarray(
                np.diagonal(od, axis1=1, axis2=2))
            off = np.abs(od - diag[:, :, None] * np.eye(od.shape[1])).max()
            if off > 1e-12 * max(np.abs(diag).max(), 1.0):
                raise ValueError(
                    f"dim {d} operator stack is not diagonal "
                    f"(max off-diagonal {off:.2e}): anchored-ANOVA axis "
                    "sweeps need a collocation discretization "
                    "(parametric_elliptic param_discretization="
                    "'collocation')")
            self.C.append(diag)
            self.G.append(np.asarray(sep.rhs[d], dtype=np.float64))

    def solve_coeffs(self, c_t: np.ndarray, g_r: np.ndarray) -> np.ndarray:
        """Solve the dim-0 system with lhs term weights ``c_t`` (T,) and
        rhs term weights ``g_r`` (R,)."""
        from scipy.linalg import solve_banded

        ab = np.tensordot(c_t, self.bands, axes=1)
        ab[self.bw] += self.diag_bc
        b = g_r @ self.rhs0
        return solve_banded((self.bw, self.bw), ab, b)

    def point_coeffs(self, idx):
        """(c_t, g_r) for the parameter grid multi-index ``idx``."""
        c = np.ones(self.bands.shape[0])
        g = np.ones(self.rhs0.shape[0])
        for d, a in enumerate(idx):
            c = c * self.C[d][:, a]
            g = g * self.G[d][:, a]
        return c, g

    def solve(self, idx) -> np.ndarray:
        """Exact FOM dof vector at parameter grid multi-index ``idx``."""
        return self.solve_coeffs(*self.point_coeffs(idx))


def _rand_range_svd(X: np.ndarray, k: int, n_power: int = 2,
                    rng=None):
    """Randomized thin SVD of ``X.T`` (n0 × n_ab): returns
    (U (n0,k), s (k,), Vt (k,n_ab)).  Cost O(n0·n_ab·k) — the exact
    2049×16641 SVD is ~7e10 flops on the 1-core host; this is ~100×
    cheaper at pair-interaction ranks."""
    rng = rng or np.random.default_rng(0)
    n_ab, n0 = X.shape
    k = min(k, n_ab, n0)
    Om = rng.standard_normal((n_ab, k))
    Y = X.T @ Om                       # (n0, k)
    Q, _ = np.linalg.qr(Y)
    for _ in range(n_power):
        Z = X @ Q                      # (n_ab, k)
        Q, _ = np.linalg.qr(X.T @ Z)
    B = Q.T @ X.T                      # (k, n_ab)
    Ub, s, Vt = np.linalg.svd(B, full_matrices=False)
    return Q @ Ub, s, Vt


def anova_init(sep: SeparatedProblem, *, order: int = 2, anchor=None,
               tf=None, tol_axis: float = 1e-10, tol_pair: float = 2e-7,
               pairs=None, max_pair_rank: int = 48, pair_dtype=np.float32,
               log=None):
    """Build the anchored-ANOVA surrogate of a collocation separated
    problem as a :class:`PGDResult` — the structure-exploiting
    ``init_result`` for :func:`recipes.adaptive_cascade`.

    order: 1 = mean + axis corrections (exact on axis lines through the
    anchor); 2 = additionally the pairwise corrections (exact on pair
    planes).  anchor: per-param grid indices of p̄ (default: grid
    middle).  tol_axis/tol_pair: singular-value truncation thresholds
    RELATIVE to ‖u(p̄)‖₂.  pairs: explicit list of (i, j) 0-based param
    pairs for order 2 (default: all).  tf: optional
    :class:`separated.Dim0Transform` — emit dim-0 factors in its
    preconditioned basis (what a ``precondition_dim0`` cascade
    consumes).  pair_dtype: pair tables are held in f32 by default
    (the deltas are O(1e-3)·‖u‖, so f32 resolves them to ~1e-10
    absolute; a d=10 f64 table is 273 MB on a ~100 MB/s host).

    Returns ``(result, report)``: report carries per-axis/per-pair kept
    ranks and truncation tails (σ of the first dropped component,
    relative to ‖u(p̄)‖) — the certifiable part of the construction;
    the interaction remainder is what the cascade's verified stages
    measure."""
    import time

    say = log or (lambda *a: None)
    ps = CollocationPointSolver(sep)
    P = sep.num_dims - 1
    sizes = [np.asarray(sep.ops[d]).shape[1] for d in range(sep.num_dims)]
    if anchor is None:
        anchor = [sizes[1 + d] // 2 for d in range(P)]
    anchor = list(anchor)

    t0 = time.perf_counter()
    cA = [ps.C[d][:, anchor[d]] for d in range(P)]
    gA = [ps.G[d][:, anchor[d]] for d in range(P)]

    def coeffs_at(over: dict):
        """(c_t, g_r) with dims in ``over`` at the given grid index and
        all others at the anchor."""
        c = np.ones(ps.bands.shape[0])
        g = np.ones(ps.rhs0.shape[0])
        for d in range(P):
            a = over.get(d)
            if a is None:
                c, g = c * cA[d], g * gA[d]
            else:
                c, g = c * ps.C[d][:, a], g * ps.G[d][:, a]
        return c, g

    u0 = ps.solve_coeffs(*coeffs_at({}))
    nrm0 = float(np.linalg.norm(u0))

    # -------------------------------------------------- axis sweeps
    axis_tab = []      # per dim: (n_d, n0) exact FOM sweep minus u0
    mode_x = [u0]      # dim-0 factors (nodal, scale folded in)
    mode_p = [[np.ones(sizes[1 + d]) for d in range(P)]]  # param factors
    report = {"order": int(order), "anchor": anchor, "norm_u0": nrm0,
              "axis": [], "pairs": []}
    for i in range(P):
        n_i = sizes[1 + i]
        Ui = np.empty((n_i, ps.n0))
        for a in range(n_i):
            Ui[a] = ps.solve_coeffs(*coeffs_at({i: a}))
        Ui -= u0[None, :]
        axis_tab.append(Ui.copy())
        U, s, Vt = np.linalg.svd(Ui.T, full_matrices=False)
        k = int(np.sum(s > tol_axis * nrm0))
        report["axis"].append({
            "dim": i, "rank": k,
            "tail": float(s[k] / nrm0) if k < s.size else 0.0,
        })
        for r in range(k):
            mode_x.append(U[:, r] * s[r])
            fac = [np.ones(sizes[1 + d]) for d in range(P)]
            fac[i] = Vt[r].copy()
            mode_p.append(fac)
    say(f"anova axes: {P} sweeps, ranks "
        f"{[a['rank'] for a in report['axis']]}, "
        f"{time.perf_counter() - t0:.1f} s")

    # -------------------------------------------------- pair tables
    if order >= 2:
        if pairs is None:
            pairs = [(i, j) for i in range(P) for j in range(i + 1, P)]
        rng = np.random.default_rng(7)
        for (i, j) in pairs:
            t1 = time.perf_counter()
            n_i, n_j = sizes[1 + i], sizes[1 + j]
            D = np.empty((n_i * n_j, ps.n0), dtype=pair_dtype)
            for a in range(n_i):
                base = u0 + axis_tab[i][a]
                for b in range(n_j):
                    c, g = coeffs_at({i: a, j: b})
                    D[a * n_j + b] = (
                        ps.solve_coeffs(c, g) - base - axis_tab[j][b]
                    )
            U, s, Vt = _rand_range_svd(D, max_pair_rank, rng=rng)
            k = int(np.sum(s > tol_pair * nrm0))
            capped = k == s.size  # rank cap hit: the dropped tail is
            # UNKNOWN (bounded by s[-1], not by tol_pair) — reported
            # honestly below instead of a silent 0.0
            kept = 0
            for r in range(k):
                W = Vt[r].reshape(n_i, n_j)
                Uw, sw, Vtw = np.linalg.svd(W, full_matrices=False)
                for q in range(sw.size):
                    if s[r] * sw[q] <= tol_pair * nrm0:
                        break
                    mode_x.append(U[:, r] * (s[r] * sw[q]))
                    fac = [np.ones(sizes[1 + d]) for d in range(P)]
                    fac[i] = Uw[:, q].copy()
                    fac[j] = Vtw[q].copy()
                    mode_p.append(fac)
                    kept += 1
            report["pairs"].append({
                "pair": (i, j), "rank": kept,
                "sigma1": float(s[0] / nrm0) if s.size else 0.0,
                # clean truncation: first dropped σ.  Rank-capped: the
                # next σ is unknown but ≤ the last computed one — report
                # that bound and flag it
                "tail": (float(s[k] / nrm0) if not capped
                         else float(s[-1] / nrm0)),
                "rank_capped": bool(capped),
                "s": round(time.perf_counter() - t1, 2),
            })
            say(f"anova pair ({i},{j}): sigma1 {s[0] / nrm0:.2e} "
                f"rank {kept} ({time.perf_counter() - t1:.1f} s)")

    K = len(mode_x)
    m0 = np.stack(mode_x)                      # (K, n0) nodal
    if tf is not None:
        m0 = tf.full_to_modes(m0)
    modes = [m0]
    for d in range(P):
        modes.append(np.stack([mode_p[r][d] for r in range(K)]))
    report["rank"] = K
    report["wall_s"] = round(time.perf_counter() - t0, 1)
    say(f"anova init: rank {K} ({report['wall_s']} s)")
    res = PGDResult(
        modes=modes, n_modes=K, amplitudes=np.ones(K),
        alpha=np.ones(K), fp_its=np.zeros(K), normU0=1.0,
    )
    return res, report
