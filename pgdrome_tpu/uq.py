"""Exact variance-based (Sobol'/ANOVA) sensitivity analysis of separated
PGD solutions.

With independent parameters p_j and a separated vademecum

    u(x, p) = sum_k F0_k(x) * prod_j Fj_k(p_j)

every ANOVA term reduces to products of per-dim 1D moments of the FE
factor interpolants,

    m_j[k]   = E_{p_j}[ Fj_k ],      G_j[k,l] = E_{p_j}[ Fj_k Fj_l ],

both EXACT through the factor mass matrix (FE quadrature integrates the
piecewise-polynomial products exactly: ``\\int f g rho = f^T M_rho g``).
Mean, total variance, first-order and total-effect Sobol' indices then
follow from O(d^2 * rank^2) host-f64 contractions — no sampling, no FOM
solves, no tensor grid.

The reference has no global-sensitivity capability at all: its closest
tools are per-sample derivative evaluation (reference
model.py:1088-1206) and Monte-Carlo error sampling over per-sample FOM
solves (reference model.py:1666-1825).  Closed-form global sensitivity
is a payoff of the separated representation itself; this module is the
serving-side realization (see ``Vademecum.sobol``).

Formulas (independent parameters; standard Sobol'/Hoeffding ANOVA):

    E[u]      = sum_k a_k P_k,                 P_k   = prod_j m_j[k]
    E[u^2]    = sum_kl a_k a_l Q_kl,           Q     = prod_j G_j  (elementwise)
    Var       = E[u^2] - E[u]^2
    V_j       = sum_kl a_k a_l (G_j ∘ prod_{i≠j} m_i m_i^T)_kl - E[u]^2
    V_{~j}    = sum_kl a_k a_l (m_j m_j^T ∘ prod_{i≠j} G_i)_kl - E[u]^2
    S_j  = V_j / Var          (first order)
    ST_j = 1 - V_{~j} / Var   (total effect)

with a_k the dim-0 output weights (mode values at sensor points, or the
identity for aggregated field indices — see ``sobol_from_stats``).
Generalized (field-aggregated) indices follow Lamboni/Gamboa: numerator
and denominator variances are integrated against the dim-0 mass measure
before the ratio.
"""

from __future__ import annotations

import numpy as np


def factor_stats(spaces, modes, n_modes, densities=None):
    """Exact per-parameter-dim factor moments ``[(m (R,), G (R, R)), …]``.

    spaces/modes: the PARAMETER dims only (each a 1D scalar
    FunctionSpace + (>=R, n_j) mode buffer).  densities: optional list
    (len == number of parameter dims) of UNNORMALIZED densities — each
    None (uniform) or a scalar / callable / fem Function accepted as an
    assembly ``weight``; normalization happens here.  All math f64."""
    from pgdrome_tpu.fem.assembly import mass_matrix

    if densities is None:
        densities = [None] * len(spaces)
    if len(densities) != len(spaces):
        raise ValueError(
            f"densities must have one entry per parameter dim "
            f"({len(spaces)}), got {len(densities)}"
        )
    stats = []
    for V, mbuf, rho in zip(spaces, modes, densities):
        if V.value_size != 1 or V.mesh().topology_dim() != 1:
            raise ValueError(
                "parameter dims must be 1D scalar spaces "
                f"(got value_size={V.value_size}, "
                f"tdim={V.mesh().topology_dim()})"
            )
        M = np.asarray(mass_matrix(V, weight=rho), np.float64)
        ones = np.ones(M.shape[0])
        vol = float(ones @ M @ ones)
        if not (np.isfinite(vol) and vol > 0.0):
            raise ValueError(
                f"density must have positive mass (got integral {vol})"
            )
        F = np.asarray(mbuf, np.float64)[: int(n_modes)]
        MF = F @ M  # (R, n_j)
        stats.append((MF @ ones / vol, MF @ F.T / vol))
    return stats


def _anova_matrices(stats):
    """Q = prod_j G_j, and per-j (A_j, Abar_j) as in the module formulas.

    Yields (Q, [(A_j, Abar_j)]) without storing prefix/suffix stacks:
    O(d^2 R^2) flops, O(R^2) memory — the R^2 temporaries dominate and a
    d-deep prefix stack would cost d× that (PERF: host copies are the
    slow resource, not flops)."""
    ms = [m for m, _ in stats]
    Gs = [G for _, G in stats]
    d = len(stats)
    Q = Gs[0].copy()
    for G in Gs[1:]:
        Q *= G
    per_j = []
    for j in range(d):
        A = Gs[j].copy()
        Abar = np.outer(ms[j], ms[j])
        for i in range(d):
            if i == j:
                continue
            mm = np.outer(ms[i], ms[i])
            A *= mm
            Abar *= Gs[i]
        per_j.append((A, Abar))
    return Q, per_j


def sobol_from_stats(stats, table=None, out_gram=None):
    """ANOVA/Sobol' contractions from per-dim factor stats.

    stats: ``factor_stats`` output.  Exactly one of:

    * ``table (R, n_out)`` — dim-0 output weights per mode (e.g. mode
      values at sensor points): PER-OUTPUT indices, arrays ``(…, n_out)``;
    * ``out_gram (R, R)`` — Gram of the dim-0 modes under the output
      measure (``U W U^T``): AGGREGATED (generalized) indices, scalars.

    Returns dict with ``mean`` (table path only), ``variance``,
    ``first (d, …)``, ``total (d, …)``.  Indices are NOT clipped: values
    outside [0, 1] at roundoff scale are honest numerical noise, large
    violations indicate a broken input."""
    if (table is None) == (out_gram is None):
        raise ValueError("pass exactly one of table / out_gram")
    Q, per_j = _anova_matrices(stats)
    P = np.ones_like(stats[0][0])
    for m, _ in stats:
        P = P * m

    if table is not None:
        t = np.asarray(table, np.float64)

        def quad(X):
            return np.einsum("ko,ko->o", X @ t, t)

        mean = P @ t
        mean2 = mean * mean
    else:
        B = np.asarray(out_gram, np.float64)

        def quad(X):
            return float(np.einsum("kl,kl->", X, B))

        mean = None
        mean2 = float(P @ B @ P)

    e2 = quad(Q)
    var = e2 - mean2
    first, total = [], []
    for A, Abar in per_j:
        first.append(quad(A) - mean2)
        total.append(e2 - quad(Abar))
    first = np.asarray(first)
    total = np.asarray(total)
    # guard the all-deterministic edge (variance ~ 0): indices undefined
    eps = np.finfo(np.float64).tiny
    denom = np.where(np.abs(var) < eps, np.inf, var)
    out = {
        "variance": var,
        "first": first / denom,
        "total": total / denom,
    }
    if mean is not None:
        out["mean"] = mean
    return out
