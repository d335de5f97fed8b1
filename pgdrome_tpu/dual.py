"""Goal-oriented (primal–dual) output correction for separated vademecums.

The dimensionality-frontier grind (FRONTIER.md) showed the uniform FIELD
error at high parameter counts is rank-walled: the measured d=10 law is
error ~ rank^-1.5, so 1e-5 needs rank ~2e4.  But serving users consume
OUTPUTS — sensor values s(p) = l·u(p) — and for outputs the classic
certified-RB primal–dual trick applies: with an adjoint vademecum
z_r(p) ≈ A(p)^{-T} l, the corrected output

    s_corr(p) = l·u_r(p) + z_r(p)·r(p),     r(p) = b(p) − A(p) u_r(p)

has error  s(p) − s_corr(p) = (z(p) − z_r(p))·r(p)  — EXACTLY (for the
linear problems here), i.e. |error| ≲ dual_error × primal_residual.  A
modest-rank adjoint multiplied by the rank-walled primal beats either
alone quadratically.  The reference has no counterpart (its only output
error story is per-sample FOM solves, reference model.py:1666-1825).

Everything here is REDUCED: the affine coefficients θ_t(p) of the
per-sample operator A(p) = Σ_t θ_t(p) A_t and the rhs are extracted
from the collocation-diagonal parameter stacks, so a corrected output
costs O(rank_z · rank_u) per sample after a one-off sparse assembly of
the coupling matrices C_t = Z₀ᵀ A_t U₀ — no full-space work per sample,
TPU-batchable (`DualCorrector.corrected`).

Conventions match the problem builders (models/problems.py):
host-f64 un-preconditioned :class:`SeparatedProblem`, parameter dims
collocation-lumped (diagonal stacks), term 0 the unit-coefficient base
term (its parameter diagonals ARE the collocation measure weights; the
boundary-boost reweighting cancels out of θ by construction).
"""

from __future__ import annotations

import numpy as np

__all__ = ["adjoint_problem", "collocation_weights", "DualCorrector",
           "guaranteed_output_bound", "make_corrected_sensor_fn",
           "point_functional", "rhs_parametric_qoi"]


def point_functional(V, x0):
    """Point-evaluation functional over a 1D space: l with l·u = u(x0)
    (the usual sensor output; any dim-0 dof functional works as ``l_vec``
    — e.g. a load vector for a weighted average)."""
    from pgdrome_tpu.fem.interpolate import _locate_1d, _shape_1d_x

    verts = V.mesh().coordinates()[:, 0]
    if not (verts[0] <= float(x0) <= verts[-1]):
        raise ValueError(
            f"sensor x0={x0} is outside the mesh domain "
            f"[{verts[0]}, {verts[-1]}] (the clipped cell locate would "
            "silently extrapolate)"
        )
    cell, xi = _locate_1d(V.mesh(), np.asarray([float(x0)]), np)
    basis = _shape_1d_x(V.degree, xi, np)[0]
    l = np.zeros(V.dim(), dtype=np.float64)
    l[np.asarray(V.element_dofs)[int(cell[0])]] = basis
    return l


def collocation_weights(sep, dim):
    """Collocation measure weights w_j of parameter dim ``dim``: the
    diagonal of the base (term-0) lumped operator.  Raises when the
    dim's stack is not collocation-diagonal."""
    ops = np.asarray(sep.ops[dim])
    off = ops - ops * np.eye(ops.shape[1])[None]
    if np.abs(off).max() > 1e-12 * max(np.abs(ops).max(), 1.0):
        raise ValueError(
            f"dim {dim} operator stack is not collocation-diagonal; pass "
            "explicit theta_ops/theta_rhs to DualCorrector (affine "
            "coefficients cannot be extracted from consistent-Galerkin "
            "parameter operators)"
        )
    w = np.diagonal(ops[0]).astype(np.float64)
    if np.any(w <= 0):
        raise ValueError(f"dim {dim} base-term diagonal is not positive")
    return w


def adjoint_problem(sep, l_vec, *, param_rhs=None):
    """Adjoint separated problem  A(p)ᵀ z = l  for the output functional
    s(p) = l·u(p): operator stacks transposed per term, rhs = l ⊗ w_1 ⊗
    … ⊗ w_d with w_j the collocation weights (so the per-grid-point
    system is exactly the FEM adjoint at that parameter point — same
    weight-cancellation argument as the primal,
    models/problems.py:113-122).

    ``l_vec`` is the output functional over FULL dim-0 dofs (e.g. a
    point-evaluation row, a load vector for an average, …); entries at
    constrained dofs are zeroed.  ``param_rhs`` overrides the per-dim
    parameter rhs factors (list over dims 1..) for non-collocation
    problems.

    Returns a host-f64 :class:`SeparatedProblem` ready for
    :func:`~pgdrome_tpu.separated.precondition_dim0` + any solve
    pipeline — the adjoint is just another vademecum."""
    return adjoint_problem_nd(sep, [l_vec], n_fixed=1,
                              param_rhs=param_rhs)


def adjoint_problem_nd(sep, l_factors, *, n_fixed=2, param_rhs=None):
    """Adjoint separated problem for SPACE-TIME (multi-fixed-dim)
    vademecums:  A(p)ᵀ z = ⊗_d l_d  over the leading ``n_fixed``
    deterministic dims, collocation params after.

    The transient case (dims x ⊗ t ⊗ p…): every dim's operator stack is
    transposed per term — the upwind time stencil D1_up transposes to
    the DOWNWIND stencil, i.e. the adjoint propagates BACKWARD in time
    from the functional, as it must.  The bc bookkeeping is the
    discrete-adjoint one: the solver's masked system is
    mAm + diag(1−m), whose transpose is mAᵀm + diag(1−m) — the SAME
    constrained dofs (the primal's t=0 rows), with the functional
    masked there.  The exact output identity then holds in masked
    quantities:  s = (ml)·u = z·(mb)  (this is the CLAUDE.md
    "FOM-identity gotcha" resolved structurally rather than by
    patching z).

    ``l_factors``: per-fixed-dim functional factors (e.g. a sensor row
    e_{x0} and a final-time row e_T).  Parameter-dim rhs factors are
    the collocation weights (per-grid-point weight cancellation, same
    argument as the primal).  Reference contrast: PGDrome has no
    adjoint capability at all; its transient outputs go through full
    fields (reference solver.py:947-988 is the time stencil this
    transposes)."""
    from pgdrome_tpu.separated import SeparatedProblem

    nd = sep.num_dims
    if not 1 <= n_fixed < nd:
        raise ValueError(f"n_fixed must be in [1, {nd})")
    if len(l_factors) != n_fixed:
        raise ValueError(
            f"need {n_fixed} functional factors, got {len(l_factors)}"
        )
    ops = [np.swapaxes(np.asarray(o, dtype=np.float64), 1, 2)
           for o in sep.ops]
    rhs = []
    for d in range(n_fixed):
        l = np.asarray(l_factors[d], dtype=np.float64).copy()
        if l.shape != (sep.sizes[d],):
            raise ValueError(
                f"l_factors[{d}] has shape {l.shape}, expected "
                f"({sep.sizes[d]},)"
            )
        if sep.bc_dofs[d] is not None and len(sep.bc_dofs[d]):
            l[np.asarray(sep.bc_dofs[d])] = 0.0
        rhs.append(l[None, :])
    if param_rhs is None:
        param_rhs = [collocation_weights(sep, j)
                     for j in range(n_fixed, nd)]
    rhs += [np.asarray(w, dtype=np.float64)[None, :] for w in param_rhs]
    return SeparatedProblem(
        ops=ops,
        rhs=rhs,
        mass=[np.asarray(m, dtype=np.float64) for m in sep.mass],
        bc_dofs=[np.array([], dtype=np.int64) if b is None
                 else np.asarray(b) for b in sep.bc_dofs],
    )


class DualCorrector:
    """Reduced primal–dual corrected outputs over a separated vademecum.

    Parameters
    ----------
    sep : the HOST-f64 un-preconditioned primal :class:`SeparatedProblem`
        (the builders' convention) — source of the affine operator/rhs
        decomposition.
    Vs : the spaces (dim 0 fixed, dims 1.. parameters).
    l_vec : output functional over full dim-0 dofs (s = l·u).
    res_u, tf_u : primal result + its dim-0 congruence transform
        (``precondition_dim0``), or ``tf_u=None`` for nodal-basis modes.
    res_z, tf_z : adjoint result + transform (solve
        :func:`adjoint_problem` with any pipeline).
    theta_ops, theta_rhs : optional ``(samples)->(S,T)`` / ``(S,R)``
        affine coefficient callables; default extracts them from the
        collocation-diagonal parameter stacks (exact at on-grid samples,
        P1-interpolated between).

    The constructor does the one-off reduced assembly (sparse dim-0
    operators, cost ~T·rank_z·n·rank_u flops); ``corrected(samples)``
    then costs O(rank_z·rank_u) per sample.
    """

    def __init__(self, sep, Vs, l_vec, res_u, tf_u, res_z, tf_z, *,
                 theta_ops=None, theta_rhs=None, cache=None,
                 n_fixed: int = 1, l_factors=None):
        import scipy.sparse as sp

        self.Vs = Vs
        self.res_u, self.res_z = res_u, res_z
        nd = sep.num_dims
        self.n_fixed = int(n_fixed)
        self.num_params = nd - self.n_fixed
        if self.n_fixed > 1 and l_factors is None:
            raise ValueError(
                "space-time correctors (n_fixed > 1) need l_factors "
                "(per-fixed-dim functional factors)"
            )
        if l_factors is None:
            l_factors = [l_vec]
        # cache: user-held dict reused across corrector builds that
        # share (sep, Vs, l_vec, res_u, tf_u) and vary only the DUAL —
        # the per-stage verify of recipes.goal_oriented_frontier.  The
        # Z-independent host work (modes_to_full expansion, dense→CSR
        # conversions, theta extraction) is the O(n²)-traffic part the
        # 60-120 MB/s host should not redo every stage.
        cache = cache if cache is not None else {}

        def _full(res, tf, d=0):
            md = np.asarray(res.modes[d])[: res.n_modes]
            return (tf.modes_to_full(md) if (tf is not None and d == 0)
                    else md).astype(np.float64)

        nf = self.n_fixed
        if "U0" not in cache:
            cache["U0"] = [_full(res_u, tf_u, d) for d in range(nf)]
        Us = cache["U0"]                 # per fixed dim (ru, n_d)
        Zs = [_full(res_z, tf_z, d) for d in range(nf)]
        if "L" not in cache:
            L = np.ones(res_u.n_modes)
            for d in range(nf):
                l = np.asarray(l_factors[d], dtype=np.float64).copy()
                if sep.bc_dofs[d] is not None and len(sep.bc_dofs[d]):
                    l[np.asarray(sep.bc_dofs[d])] = 0.0
                L = L * (Us[d] @ l)
            cache["L"] = L
        self.L = cache["L"]              # (ru,)

        if "A_csr" not in cache:
            # fixed-dim FEM/stencil matrices are banded; dense n²·rank
            # einsums are host-prohibitive at frontier scale
            cache["A_csr"] = [
                [sp.csr_matrix(np.asarray(sep.ops[d], dtype=np.float64)[t])
                 for t in range(sep.num_terms)]
                for d in range(nf)
            ]
        C = np.ones((sep.num_terms, res_z.n_modes, res_u.n_modes))
        for d in range(nf):
            C = C * np.stack([
                Zs[d] @ (A @ Us[d].T) for A in cache["A_csr"][d]
            ])
        self.C = C                       # (T, rz, ru)
        B = np.ones((sep.num_rhs, res_z.n_modes))
        for d in range(nf):
            B = B * (np.asarray(sep.rhs[d], dtype=np.float64) @ Zs[d].T)
        self.B = B                       # (R, rz)

        self._grids = self._g_ops = self._g_rhs = None
        self._ranges = [
            (float(Vs[nf + j].mesh().coordinates()[0, 0]),
             float(Vs[nf + j].mesh().coordinates()[-1, 0]))
            for j in range(self.num_params)
        ]
        both_auto = theta_ops is None and theta_rhs is None
        if theta_ops is None or theta_rhs is None:
            if "theta_tables" not in cache:
                grids = [Vs[nf + j].tabulate_dof_coordinates()[:, 0]
                         for j in range(self.num_params)]
                w = [collocation_weights(sep, nf + j)
                     for j in range(self.num_params)]
                cache["theta_tables"] = (
                    grids,
                    [np.diagonal(np.asarray(sep.ops[nf + j]),
                                 axis1=1, axis2=2) / w[j][None, :]
                     for j in range(self.num_params)],     # (T, n_p)
                    [np.asarray(sep.rhs[nf + j]) / w[j][None, :]
                     for j in range(self.num_params)],     # (R, n_p)
                )
            grids, g_ops, g_rhs = cache["theta_tables"]
            # retained for the device sweep (make_corrected_sensor_fn):
            # the tables are P1 grid functions, evaluated on device with
            # the same mode-table interpolation as the factors.  Only
            # when BOTH thetas are auto-extracted — a half-override
            # would make the device sweep silently disagree with the
            # host corrected() (user callable vs interpolated table)
            if both_auto:
                self._grids, self._g_ops, self._g_rhs = grids, g_ops, g_rhs

            def _theta(tables):
                def ev(samples):
                    s = np.atleast_2d(np.asarray(samples, dtype=np.float64))
                    out = np.ones((s.shape[0], tables[0].shape[0]))
                    for j, tab in enumerate(tables):
                        for t in range(tab.shape[0]):
                            out[:, t] *= np.interp(s[:, j], grids[j],
                                                   tab[t])
                    return out
                return ev

            theta_ops = theta_ops or _theta(g_ops)
            theta_rhs = theta_rhs or _theta(g_rhs)
        self.theta_ops, self.theta_rhs = theta_ops, theta_rhs

    def _factors(self, res, samples):
        from pgdrome_tpu.separated import evaluate_modes_1d

        s = np.atleast_2d(np.asarray(samples, dtype=np.float64))
        fac = np.ones((s.shape[0], res.n_modes))
        for j in range(self.num_params):
            vals = np.asarray(evaluate_modes_1d(
                self.Vs[self.n_fixed + j], res.modes[self.n_fixed + j],
                s[:, j], xp=np
            ))[:, : res.n_modes].astype(np.float64)
            fac *= vals
        return fac

    def qoi(self, samples):
        """Plain vademecum outputs l·u_r(p), shape (S,)."""
        return self._factors(self.res_u, samples) @ self.L

    def corrected(self, samples, *, return_parts=False):
        """Dual-corrected outputs s_corr(p) = l·u_r + z_r·(b(p) − A(p)u_r),
        shape (S,).  ``return_parts`` additionally returns
        ``(s_plain, z_dot_r)`` — the correction term z_r·r(p) is itself
        the classic output ERROR ESTIMATE (effectivity → 1 as the dual
        converges)."""
        s = np.atleast_2d(np.asarray(samples, dtype=np.float64))
        for j, (lo, hi) in enumerate(self._ranges):
            if s[:, j].min() < lo or s[:, j].max() > hi:
                # outside the box the reduced residual matches no
                # single-sample A(p)u−b(p): np.interp CLAMPS the theta
                # tables while the factor eval EXTRAPOLATES modes, so
                # the exact-error identity silently breaks — refuse
                raise ValueError(
                    f"samples leave the parameter box in dim {j} "
                    f"([{lo}, {hi}]): corrected outputs are only "
                    "defined inside the vademecum's box"
                )
        fu = self._factors(self.res_u, samples)       # (S, ru)
        fz = self._factors(self.res_z, samples)       # (S, rz)
        th = self.theta_ops(samples)                  # (S, T)
        hr = self.theta_rhs(samples)                  # (S, R)
        s_plain = fu @ self.L
        z_b = np.einsum("sr,rs->s", hr, self.B @ fz.T)
        # per-term accumulation: one (S, ru) temporary, not (S, T, ru) —
        # the frontier-scale batch would otherwise hold ~200 MB live on
        # the 60-120 MB/s host
        z_au = np.zeros(fu.shape[0])
        for t in range(self.C.shape[0]):
            z_au += th[:, t] * ((fz @ self.C[t]) * fu).sum(axis=1)
        z_r = z_b - z_au
        s = s_plain + z_r
        if return_parts:
            return s, s_plain, z_r
        return s


def rhs_parametric_qoi(sep, Vs, sensors, *, fixed_dims=(0, 1)):
    """EXACT separated output surrogate for parametric-RHS problems.

    When the operator does not depend on the parameters — the transient
    moving-heat-source family (models/problems.py:562: A = ρcp·M⊗D1_up
    + k·K⊗M_t, only the load carries (P, v)) — the adjoint route gives
    the output EXACTLY, with no vademecum rank entering at all:

        s(p) = lᵀ A⁻¹ b(p) = zᵀ b(p),    z = A⁻ᵀ l  (ONE backward
                                          space-time solve per sensor)

    and since b(p) is separated (Σ_r ⊗_f g_rf · Π_j c_rj(p_j)), the
    output collapses to the closed form  s(p) = Σ_r W_r Π_j c_rj(p_j)
    with R precomputed scalars W_r = zᵀ(⊗_f g_rf) per sensor — ~R
    multiply-adds per sample, error = the SOURCE-SEPARATION floor only
    (vs the exact-source FOM; vs the separated-source FOM it is f64
    machine exact, tested).  The pointwise parameter coefficients
    c_rj = M_j⁻¹ rhs_j[r] are recovered from the weak factors (exact
    for the builders' P1 quadrature of polynomial coefficients).

    Parameters: ``sep`` the HOST-f64 problem, ``Vs`` its spaces,
    ``sensors`` a list of per-fixed-dim coordinate tuples (e.g.
    ``[(x0, t0), ...]``; each becomes l = ⊗_f point_functional).
    ``fixed_dims`` must be a prefix (0,) or (0, 1); every OTHER dim's
    operator stack must equal its mass matrix (the parametric-rhs
    condition — validated, same check as
    models/problems.py:transient_dense_verifier).

    Returns ``qoi(samples) -> (S, n_sensors)`` with attributes
    ``.weights (n_sensors, R)`` and ``.adjoints`` (the z fields).
    Complements the field vademecum: serve fields from the PGD result,
    sensor outputs from this closed form (PERF.md round-4 transient
    outputs row)."""
    from functools import reduce

    from scipy import sparse as sps
    from scipy.sparse import linalg as spla

    if tuple(fixed_dims) not in ((0,), (0, 1)):
        raise ValueError("fixed_dims must be (0,) or (0, 1)")
    nd = sep.num_dims
    param_dims = [d for d in range(nd) if d not in fixed_dims]
    for d in param_dims:
        od = np.asarray(sep.ops[d], dtype=np.float64)
        md = np.asarray(sep.mass[d], dtype=np.float64)
        for t in range(od.shape[0]):
            if not np.allclose(od[t], md, rtol=0.0,
                               atol=1e-12 * np.abs(md).max()):
                raise ValueError(
                    f"parameter dim {d} operator term {t} is not the "
                    "mass: the operator is parameter-dependent — use "
                    "adjoint_problem/DualCorrector instead"
                )
        if sep.bc_dofs[d] is not None and len(sep.bc_dofs[d]):
            raise ValueError(f"parameter dim {d} carries bc dofs")

    sizes = [sep.sizes[f] for f in fixed_dims]
    opsF = [np.asarray(sep.ops[f], dtype=np.float64) for f in fixed_dims]
    A = sum(
        reduce(sps.kron, (sps.csr_matrix(o[t]) for o in opsF))
        for t in range(opsF[0].shape[0])
    ).tolil()
    # constrained rows of the kron system → identity (the per-sample FOM
    # convention, transient_dense_verifier)
    bc_mask = np.zeros(tuple(sizes), dtype=bool)
    for k, f in enumerate(fixed_dims):
        dofs = sep.bc_dofs[f]
        if dofs is None or not len(dofs):
            continue
        np.moveaxis(bc_mask, k, 0)[np.asarray(dofs)] = True
    bc_rows = np.nonzero(bc_mask.reshape(-1))[0]
    for rr in bc_rows:
        A.rows[rr] = [int(rr)]
        A.data[rr] = [1.0]
    lu = spla.splu(A.tocsr().tocsc())

    rhsF = [np.asarray(sep.rhs[f], dtype=np.float64) for f in fixed_dims]
    R = rhsF[0].shape[0]
    # adjoint field + reduced weights per sensor
    adjoints, weights = [], []
    for coords in sensors:
        if np.ndim(coords) == 0:
            coords = (coords,)
        if len(coords) != len(fixed_dims):
            raise ValueError(
                f"sensor {coords!r}: need one coordinate per fixed dim"
            )
        l = reduce(np.kron, (point_functional(Vs[f], c)
                             for f, c in zip(fixed_dims, coords)))
        l[bc_rows] = 0.0
        z = lu.solve(l, trans="T")
        adjoints.append(z)
        # the per-sample FOM zeroes b at constrained rows; masking z
        # there is the same contraction (A's bc ROWS are identity but
        # its bc COLUMNS are not, so z is nonzero on bc rows)
        zm = z.copy()
        zm[bc_rows] = 0.0
        if len(fixed_dims) == 2:
            Z = zm.reshape(sizes)
            weights.append(np.einsum("ri,ij,rj->r", rhsF[0], Z, rhsF[1]))
        else:
            weights.append(rhsF[0] @ zm)
    W = np.stack(weights)                      # (n_sensors, R)

    grids = [Vs[j].tabulate_dof_coordinates()[:, 0] for j in param_dims]
    cs = []
    for j in param_dims:
        M = np.asarray(sep.mass[j], dtype=np.float64)
        cs.append(np.linalg.solve(M, np.asarray(
            sep.rhs[j], dtype=np.float64).T).T)   # (R, n_j) pointwise

    def qoi(samples):
        s = np.atleast_2d(np.asarray(samples, dtype=np.float64))
        if s.shape[1] != len(param_dims):
            raise ValueError(
                f"samples have {s.shape[1]} columns, expected "
                f"{len(param_dims)} (one per parameter dim)"
            )
        fac = np.ones((s.shape[0], R))
        for k in range(len(param_dims)):
            g = grids[k]
            if s[:, k].min() < g[0] or s[:, k].max() > g[-1]:
                raise ValueError(
                    f"samples leave the parameter box in column {k} "
                    f"([{g[0]}, {g[-1]}]): the closed form would "
                    "silently extrapolate the coefficient tables"
                )
            i = np.clip(np.searchsorted(g, s[:, k], side="right") - 1,
                        0, len(g) - 2)
            w = (s[:, k] - g[i]) / (g[i + 1] - g[i])
            # vectorized P1 interpolation of all R coefficient rows
            fac *= (cs[k][:, i] * (1.0 - w) + cs[k][:, i + 1] * w).T
        return fac @ W.T                       # (S, n_sensors)

    qoi.weights = W
    qoi.adjoints = adjoints
    return qoi


def guaranteed_output_bound(sep, Vs, l_vec, res_u, tf_u, res_z, tf_z, *,
                            chunk=None):
    """GUARANTEED (not calibrated) per-sample bound on the corrected
    output error: returns ``bound(samples) -> (B,)`` with

        |s_true(p) − s_corr(p)| = |(z−z_r)ᵀ r(p)|
            ≤ ‖r_dual(p)‖_{K0⁻¹} · ‖r_primal(p)‖_{K0⁻¹} ≥ guaranteed

    valid whenever A(p) ⪰ K0 on the parameter box — true for the
    canonical affine family (every K_t PSD — stiffness with
    nonnegative weights — and θ_t(p) ≥ 0, θ_0 ≡ 1, so
    A(p) = K0 + Σ θ_t K_t ⪰ K0): then ‖z−z_r‖_{K0} ≤ ‖z−z_r‖_{A} =
    ‖r_dual‖_{A⁻¹} ≤ ‖r_dual‖_{K0⁻¹} and Cauchy–Schwarz in the
    K0 inner product gives the product bound.  Both residual norms are
    the certifier's energy-preconditioned dd indicators
    (`parallel.certify.make_residual_indicator`) — exact to ~2^-48 of
    the contraction, at sweep speed, no FEM anywhere.

    This upgrades the effectivity-1 output error ESTIMATE
    (``DualCorrector.corrected(return_parts=True)``) to a certificate:
    the estimate says where the error IS, the bound says it cannot be
    more.  Cauchy–Schwarz slack is real (measured ~10–10³×; the d=10
    artifact's measured errors sit far below it) — use the bound for
    guarantees, the estimate for sharpness.

    θ-nonnegativity and θ_0 ≡ 1 are validated from the collocation
    tables; the PSD of the K_t is structural for the builders
    (stiffness matrices with nonnegative coefficient weights) and is
    NOT re-verified numerically here."""
    from pgdrome_tpu.parallel.certify import make_residual_indicator

    g0 = np.asarray(sep.rhs[0], dtype=np.float64)
    if g0.shape[0] != 1:
        raise ValueError(
            "guaranteed_output_bound assumes a single p-independent "
            f"primal rhs term (got {g0.shape[0]}) — the per-sample "
            "‖b(p)‖ would otherwise vary"
        )
    from pgdrome_tpu.parallel.certify import validate_spd_family

    validate_spd_family(sep)

    l = np.asarray(l_vec, dtype=np.float64).copy()
    if sep.bc_dofs[0] is not None and len(sep.bc_dofs[0]):
        l[np.asarray(sep.bc_dofs[0])] = 0.0
    ind_u = make_residual_indicator(sep, Vs, res_u, tf=tf_u, chunk=chunk)
    adj = adjoint_problem(sep, l)
    ind_z = make_residual_indicator(adj, Vs, res_z, tf=tf_z, chunk=chunk)

    # the indicators are RELATIVE to ‖L⁻¹b‖; both per-sample rhs are
    # p-independent here (unit load / sensor functional), so the
    # absolute norms are constants computed once on the host
    def _rhs_norm(tf, b):
        v = np.asarray(b, dtype=np.float64)[tf.interior]
        return float(np.linalg.norm(tf.apply_Linv(v[:, None])[:, 0]))

    mask0 = np.asarray(sep.bc_masks[0], dtype=np.float64)
    nb = _rhs_norm(tf_u, g0[0] * mask0)
    nl = _rhs_norm(tf_z, l * mask0)

    def bound(samples):
        return (np.asarray(ind_z(samples)) * nl
                * np.asarray(ind_u(samples)) * nb)

    bound.rhs_norm_primal = nb
    bound.rhs_norm_dual = nl
    return bound


def make_corrected_sensor_fn(dc: DualCorrector, *, aot: bool = True,
                             mesh=None):
    """Device (TPU) sweep of dual-corrected outputs: jitted
    ``samples (B, d) → (s_corr, s_plain)``, both ``(B,)`` f32.

    Precision design (the correction is a ~1e-5-of-output cancellation;
    naive f32 einsums would floor it at ~1e-6 relative):

    * the adjoint identity  z_trueᵀ A(p) u_n = lᵀ u_n  pre-cancels the
      big terms PER PRIMAL MODE:  c_n(p) = L_n − Σ_t θ_t (f_zᵀ C_t)_n
      is O(dual_err · |u_n|), so the MXU f32 contractions only ever
      subtract like-sized small quantities (noise/signal ~ eps·√K /
      dual_err, measured harmless);
    * the one remaining LARGE reduction, z_r·b(p) (O(output), rz
      summands), runs compensated in double-f32 on the VPU
      (ops/ddf32.py) — its f32 rounding alone (~1.4e-7 abs) would
      dominate the corrected error;
    * s_corr = z_r·b + Σ_n φ_n(p) c_n(p);  s_plain (returned for the
      error estimate est = s_corr − s_plain) is a plain f32 reduction —
      its ~3e-7 abs rounding only perturbs the ESTIMATE by ~1%, never
      s_corr.

    Requires the corrector's auto-extracted collocation thetas (the
    tables are interpolated on device exactly like mode factors).

    Measured at the d=10 frontier scale (primal 2688 × dual 768 × 11
    terms, 45 MFLOP/output): **324k corrected outputs/s** on one v5e
    chip (14.7 TFLOPs sustained), device floor **5.1e-7 relative** vs
    the host f64 corrector (`DUAL_SWEEP_RATE.json`).  The floor is the
    f32 MXU accumulation of the early (large-amplitude) primal modes in
    W — shared with the PLAIN output path (measured 6.0e-7), i.e. the
    correction's cancellation contributes nothing extra, as designed.
    For sub-1e-6 CERTIFIED outputs use the host `corrected()` (f64),
    as the frontier artifact does; the device sweep is the
    throughput path.
    """
    import jax
    import jax.numpy as jnp

    from pgdrome_tpu.ops.ddf32 import dd_from_f64, dd_mul_f, dd_sum
    from pgdrome_tpu.separated import evaluate_modes_1d
    from pgdrome_tpu.utils.aot_cache import aot_jit, array_fingerprint

    if dc._g_ops is None:
        raise ValueError(
            "make_corrected_sensor_fn needs the auto-extracted "
            "collocation thetas (explicit theta callables cannot be "
            "staged onto the device)"
        )
    spaces = dc.Vs
    nf = getattr(dc, "n_fixed", 1)
    ru, rz = dc.res_u.n_modes, dc.res_z.n_modes
    f32 = jnp.float32
    mu = [jnp.asarray(np.asarray(dc.res_u.modes[nf + j])[:ru], f32)
          for j in range(dc.num_params)]
    mz = [jnp.asarray(np.asarray(dc.res_z.modes[nf + j])[:rz], f32)
          for j in range(dc.num_params)]
    g_ops = [jnp.asarray(g, f32) for g in dc._g_ops]
    g_rhs = [jnp.asarray(g, f32) for g in dc._g_rhs]
    L = jnp.asarray(dc.L, f32)                       # (ru,)
    C = jnp.asarray(dc.C, f32)                       # (T, rz, ru)
    B_dd = jnp.asarray(dd_from_f64(dc.B))            # (R, rz, 2)
    prec = jax.lax.Precision.HIGHEST

    def _prod(tables, samples):
        out = None
        for j, tab in enumerate(tables):
            v = evaluate_modes_1d(spaces[nf + j], tab, samples[:, j])
            out = v if out is None else out * v
        return out

    def fn(samples):
        samples = jnp.asarray(samples, f32)
        fu = _prod(mu, samples)                      # (B, ru)
        fz = _prod(mz, samples)                      # (B, rz)
        th = _prod(g_ops, samples)                   # (B, T)
        hr = _prod(g_rhs, samples)                   # (B, R)
        # per-mode pre-cancelled correction coefficients
        W = jnp.zeros_like(fu)
        for t in range(C.shape[0]):
            W = W + th[:, t : t + 1] * jnp.einsum(
                "bm,mn->bn", fz, C[t], precision=prec)
        corr = jnp.einsum("bn,bn->b", fu, L[None, :] - W, precision=prec)
        # z_r · b(p): compensated (dd) over the dual rank
        ph, pl = dd_mul_f(B_dd[:, None, :, 0], B_dd[:, None, :, 1],
                          fz[None, :, :])            # (R, B, rz)
        zb_h, zb_l = dd_sum(ph, pl, axis=2)          # (R, B)
        zb = jnp.einsum("rb,br->b", zb_h + zb_l, hr, precision=prec)
        s_plain = jnp.einsum("bn,n->b", fu, L, precision=prec)
        return zb + corr, s_plain

    jitted = jax.jit(fn)
    if mesh is not None:
        # dp-sharded corrected-output sweep: the sample batch axis rides
        # the mesh's 'dp' axis, tables replicate (each output is a
        # device-local contraction — collective-free, asserted in
        # tests/unit/test_multichip_paths.py).  Bypasses the persistent
        # AOT cache (loaded executables are single-device).
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        shard = NamedSharding(mesh, P("dp"))
        n_dev = mesh.size

        def sharded(samples):
            s = np.asarray(samples, dtype=np.float32)
            # pad the batch to a mesh multiple (device_put of a
            # non-divisible axis raises), slice the outputs back
            pad = (-len(s)) % n_dev
            if pad:
                s = np.concatenate([s, np.repeat(s[-1:], pad, axis=0)])
            out = jitted(jax.device_put(jnp.asarray(s), shard))
            if pad:
                out = tuple(o[:-pad] for o in out)
            return out

        sharded._jitted = jitted
        return sharded
    if not aot:
        return jitted
    from pgdrome_tpu.parallel.vademecum import _serving_key

    key = _serving_key(
        "dual_corrected", spaces, ru,
        [np.asarray(m) for m in dc.res_u.modes[1:]],
        extra=("dual_v1", int(rz),
               array_fingerprint(dc.L, dc.B, dc.C,
                                 *[np.asarray(m) for m in
                                   dc.res_z.modes[1:]],
                                 *dc._g_ops, *dc._g_rhs)),
    )
    return aot_jit(jitted, key)
