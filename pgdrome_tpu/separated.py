"""TPU fast path: fully jitted progressive PGD on a separated-term IR.

This is the performance heart of the framework (BASELINE.json north star).
Where :mod:`pgdrome_tpu.solver` mirrors the reference's Python orchestration
(callbacks per fixed-point step), this module compiles ONE XLA program per
problem:

* the problem is a list of rank-1 operator terms  a(u,v) = Σ_t ⊗_d O_td
  and rank-1 right-hand sides  f = Σ_r c_r ⊗_d g_rd  (BC lifts fold into
  extra rhs terms, reference homogenization semantics preserved),
* per-dim operators are stacked dense tensors ``(T, n_d, n_d)`` so Gram
  coefficients are batched einsums on the MXU,
* the alternating fixed point runs under ``lax.while_loop``; the
  previous-modes sum is a masked batched contraction over a padded mode
  buffer (no dynamic shapes, SURVEY.md §7 "growing state under jit"),
* Dirichlet BCs are mask + identity-row operations (shape static).

Algorithmic semantics (residual check, 'norm' fixed-point stop, 'stiff'
normalization, amplitude convergence) replicate pgdrome/solver.py:306-506 so
amplitudes match the orchestration layer (and hence the reference) to
floating-point accuracy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

# TPU matmuls default to bf16 inputs (8-bit mantissa, ~4e-3 error) — the
# PGD Gram contractions and solves need true f32.  All hot-path einsums
# below pin HIGHEST precision; set use_full_f32_matmul() (config.py) too so
# linalg internals (LU) follow.
_PREC = jax.lax.Precision.HIGHEST


@dataclass
class SeparatedProblem:
    """Separated weak form: Σ_t ⊗_d O_td (lhs) and Σ_r ⊗_d g_rd (rhs).

    ops:   per dim, stacked lhs operators (T, n_d, n_d)
    rhs:   per dim, stacked rhs vectors (R, n_d)  (lift terms included)
    mass:  per dim, consistent mass matrix (n_d, n_d) for norms
    bc_dofs: per dim, constrained dof indices (possibly empty) — homogenized
    """

    ops: Sequence[jnp.ndarray]
    rhs: Sequence[jnp.ndarray]
    mass: Sequence[jnp.ndarray]
    bc_dofs: Sequence[np.ndarray]

    def __post_init__(self):
        self.num_dims = len(self.ops)
        self.num_terms = self.ops[0].shape[0]
        self.num_rhs = self.rhs[0].shape[0]
        self.sizes = tuple(o.shape[1] for o in self.ops)
        # bc masks: 1 interior, 0 constrained (same array module as ops, so
        # host-f64 problems stay full precision until device conversion)
        self.bc_masks = []
        for d in range(self.num_dims):
            m = np.ones(self.sizes[d], dtype=np.asarray(self.ops[d]).dtype if isinstance(self.ops[d], np.ndarray) else None)
            if self.bc_dofs[d] is not None and len(self.bc_dofs[d]):
                m[np.asarray(self.bc_dofs[d])] = 0.0
            if isinstance(self.ops[d], np.ndarray):
                self.bc_masks.append(m)
            else:
                self.bc_masks.append(jnp.asarray(m, dtype=self.ops[d].dtype))

    def as_device(self, dtype=None) -> "SeparatedProblem":
        """Copy with all arrays as device (jnp) arrays of `dtype`.

        Keep problem construction/preconditioning in host f64 and convert
        here: casting ill-conditioned raw operators to f32 costs
        cond(K)·eps accuracy, casting the preconditioned ones is benign."""
        return SeparatedProblem(
            ops=[jnp.asarray(np.asarray(o), dtype=dtype) for o in self.ops],
            rhs=[jnp.asarray(np.asarray(r), dtype=dtype) for r in self.rhs],
            mass=[jnp.asarray(np.asarray(m), dtype=dtype) for m in self.mass],
            bc_dofs=list(self.bc_dofs),
        )


@dataclass
class PGDResult:
    modes: list  # per dim (n_max, n_d) padded buffers
    n_modes: int
    amplitudes: np.ndarray  # relConv per enrichment (trimmed)
    alpha: np.ndarray
    fp_its: np.ndarray
    normU0: float = 1.0  # absolute normU of the first mode (resume scale)

    def mode_list(self, dim):
        return [np.asarray(self.modes[dim][k]) for k in range(self.n_modes)]


# --------------------------------------------------------------------- core

class _ProblemArrays:
    """Duck-typed view of a SeparatedProblem built from runtime arrays.

    The enrichment programs can take the problem data (ops/rhs/mass/bc
    masks) as JIT INPUTS instead of closing over them as constants: the
    compiled executable is then value-independent — one AOT-cached program
    serves every problem with the same shapes (re-weighted measures,
    residual re-solves, parameter studies) with zero recompiles."""

    __slots__ = ("ops", "rhs", "mass", "bc_masks", "num_dims", "num_terms",
                 "sizes")

    def __init__(self, ops, rhs, mass, bc_masks):
        self.ops = tuple(ops)
        self.rhs = tuple(rhs)
        self.mass = tuple(mass)
        self.bc_masks = tuple(bc_masks)
        self.num_dims = len(self.ops)
        self.num_terms = self.ops[0].shape[0]
        self.sizes = tuple(o.shape[1] for o in self.ops)


def _term_weights(A_d, F_d):
    """w_t = F_dᵀ O_td F_d for all terms: einsum('tij,i,j->t')."""
    return jnp.einsum("tij,i,j->t", A_d, F_d, F_d, precision=_PREC)


def _rhs_weights(R_d, F_d):
    """c_r = F_d · g_rd for all rhs terms."""
    return jnp.einsum("ri,i->r", R_d, F_d, precision=_PREC)


def _contract_rhs(rhs, Fs, k, nd):
    """Per-dim rhs assembly b_i = Σ_r (Π_{j≠k} F_j·g_rj) g_rki, in the
    stack's own precision: plain (R, n) stacks contract in their dtype
    (f32/f64), double-f32 (R, n, 2) stacks via the compensated ddf32
    path — both downcast only at the end."""
    if rhs[k].ndim == 3:  # dd storage (rhs_comp=True)
        from pgdrome_tpu.ops import ddf32

        rh = jnp.ones((rhs[0].shape[0],), dtype=rhs[k].dtype)
        rl = jnp.zeros_like(rh)
        for j in range(nd):
            if j != k:
                wh, wl = ddf32.dd_dot(rhs[j], Fs[j])
                rh, rl = ddf32.dd_mul(rh, rl, wh, wl)
        return ddf32.dd_contract(rh, rl, rhs[k])
    rcoef = jnp.ones((rhs[0].shape[0],), dtype=rhs[0].dtype)
    for j in range(nd):
        if j != k:
            rcoef = rcoef * _rhs_weights(rhs[j], Fs[j])
    return jnp.einsum("r,ri->i", rcoef, rhs[k], precision=_PREC)


def _apply_bc_system(A, b, mask):
    """Homogeneous Dirichlet: zero rows/cols, 1 on diag, zero rhs entries."""
    A = A * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
    b = b * mask
    return A, b


def _cg_solve(A, b, iters):
    """Fixed-iteration CG (SPD A).  For the energy-basis preconditioned
    systems cond(A) = O(1), so ~20 iterations reach f32 accuracy — and the
    compiled program is a tiny matvec loop instead of an LU pivot cascade
    (order-of-magnitude faster XLA compile AND runtime on TPU).

    The system is scale-normalized first (Â = A/s_A, b̂ = b/‖b‖) so every
    internal quantity is O(1): late PGD modes have tiny right-hand sides
    whose squared norms would otherwise underflow/denormalize in f32 and
    collapse the iteration."""
    dt = b.dtype
    s_A = jnp.mean(jnp.abs(jnp.diagonal(A))) + jnp.asarray(1e-30, dt)
    nb = jnp.sqrt(jnp.einsum("i,i->", b, b, precision=_PREC))
    safe_nb = jnp.where(nb > 0, nb, 1.0)
    Ah = A / s_A
    bh = b / safe_nb

    def body(i, state):
        x, r, p, rs = state
        Ap = jnp.einsum("ij,j->i", Ah, p, precision=_PREC)
        pAp = jnp.einsum("i,i->", p, Ap, precision=_PREC)
        alpha = jnp.where(pAp > 0, rs / (pAp + 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.einsum("i,i->", r, r, precision=_PREC)
        beta = jnp.where(rs > 0, rs_new / (rs + 1e-30), 0.0)
        p = r + beta * p
        return (x, r, p, rs_new)

    x0 = jnp.zeros_like(bh)
    rs0 = jnp.einsum("i,i->", bh, bh, precision=_PREC)
    y, _, _, _ = jax.lax.fori_loop(0, iters, body, (x0, bh, bh, rs0))
    return y * (nb / s_A)


def _chol_solve(A, b):
    """Exact SPD solve via Cholesky + two triangular solves, scale-normalized
    like :func:`_cg_solve` so every internal quantity is O(1) in f32.

    Use when fixed-iteration CG is insufficient — e.g. normal-equations IRs
    (:func:`normal_equations`) whose per-dim conditioning is SQUARED, where
    CG needs ~200 iterations but Cholesky is exact.  Compiles and runs on
    the TPU in f32, where generic pivoted LU does not (no f64 LU on-chip,
    and the pivot cascade compiles poorly)."""
    dt = b.dtype
    s_A = jnp.mean(jnp.abs(jnp.diagonal(A))) + jnp.asarray(1e-30, dt)
    nb = jnp.sqrt(jnp.einsum("i,i->", b, b, precision=_PREC))
    safe_nb = jnp.where(nb > 0, nb, 1.0)
    L = jnp.linalg.cholesky(A / s_A)
    y = jax.scipy.linalg.solve_triangular(L, b / safe_nb, lower=True)
    x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return x * (nb / s_A)


def problem_data(problem):
    """The problem's runtime arrays as the jit-input pytree
    (ops, rhs, mass, bc_masks) every enrichment program takes — the ONE
    definition of that layout (SeparatedPGD and the multichip step both
    use it).  Passing data as INPUTS (not closures) makes compiled
    executables value-independent: one program serves every same-shaped
    problem with zero recompiles."""
    return (
        tuple(problem.ops), tuple(problem.rhs), tuple(problem.mass),
        tuple(problem.bc_masks),
    )


def _solve_dim(problem, k, Fs, modes, mode_mask, rhs, solver="lu", cg_iters=30,
               nonlinear=None, newton_max_it=25):
    """One alternating-direction solve for dim k given current factors Fs
    and the padded previous-mode buffers.

    ``solver="newton"`` solves the per-dim subproblem with Newton on its
    residual (``ops.newton_solve`` under ``lax.while_loop``) instead of a
    direct linear solve — the fast-path equivalent of the reference's
    ``_problem='nonlinear'`` FEM dispatch (solver.py:579-595, Newton via
    UFL ``derivative``).  For a linear problem the warm-started Newton
    terminates immediately and the amplitudes agree with the linear path
    (reference parity check, test_solver_problem.py:752).

    ``nonlinear``: optional separable nonlinear term N(u) = ⊗_d N_d — a
    per-dim tuple of ``(apply_fn, weight_fn)`` where ``apply_fn(u)`` is
    the dim's nonlinear operator on the solve factor (e.g.
    ``lambda u: M @ u**3``) and ``weight_fn(F)`` its scalar Gram weight
    when the dim is NOT being solved.  The two entries of a dim must
    represent the SAME factor of the term — ``weight_d(F) = F ·
    apply_d(F)`` in the natural pairing — so scalar prefactors live in
    BOTH (or the term is inconsistent across solve dims).  The dim-k
    residual gains ``(Π_{j≠k} weight_j(F_j)) · N_k(u)``."""
    T = problem.num_terms
    nd = problem.num_dims

    # lhs: A_k = Σ_t (Π_{j≠k} w_jt) O_tk
    coef = jnp.ones((T,), dtype=Fs[k].dtype)
    for j in range(nd):
        if j != k:
            coef = coef * _term_weights(problem.ops[j], Fs[j])
    A_k = jnp.einsum("t,tij->ij", coef, problem.ops[k], precision=_PREC)

    # rhs loads: b = Σ_r (Π_{j≠k} c_rj) g_rk.  Computed in the RHS
    # dtype: with rhs_f64=True the stack stays float64 while everything
    # else is f32 — residual-cascade stages ship rows of magnitude ~1/s
    # that cancel to O(1) here, and resolving that cancellation in f32
    # floors the cascade at ~1.5e-6 (measured, PERF.md round-3); the
    # f64 contraction collapses it exactly, then the O(1) b casts down
    # losslessly.  With rhs_comp=True the stack is double-f32 (R, n, 2)
    # and the same cancellation is resolved on-chip (ops/ddf32.py) —
    # the TPU-native equivalent (no x64 backend needed).
    b = _contract_rhs(rhs, Fs, k, nd).astype(Fs[k].dtype)

    # previous modes: b -= Σ_t Σ_m (Π_{j≠k} F_jᵀ O_tj G_jm) O_tk G_km
    # P[m,t] = Π_{j≠k} (F_jᵀ O_tj) · modes_j[m] — F on the TEST index;
    # using the trial index instead would transpose non-symmetric operators
    # (e.g. the upwind time stencil) and silently corrupt the rhs
    P = jnp.ones((modes[k].shape[0], T), dtype=Fs[k].dtype)
    for j in range(nd):
        if j != k:
            FAj = jnp.einsum("i,tij->tj", Fs[j], problem.ops[j], precision=_PREC)
            P = P * jnp.einsum("mj,tj->mt", modes[j], FAj, precision=_PREC)
    P = P * mode_mask[:, None]
    W = jnp.einsum("mt,mi->ti", P, modes[k], precision=_PREC)  # (T, n_k)
    b = b - jnp.einsum("tij,tj->i", problem.ops[k], W, precision=_PREC)

    A_k, b = _apply_bc_system(A_k, b, problem.bc_masks[k])
    if nonlinear is not None and solver != "newton":
        # Picard: lag the separable nonlinear term at the incoming factor
        # and fold it into the rhs — the alternating fixed point itself is
        # the Picard iteration (converges for mild nonlinearities; use
        # solver='newton' for stiff ones)
        mask = problem.bc_masks[k]
        theta = jnp.ones((), dtype=Fs[k].dtype)
        for j in range(nd):
            if j != k:
                theta = theta * nonlinear[j][1](Fs[j])
        b = b - theta * (mask * nonlinear[k][0](Fs[k]))
    if solver == "newton":
        from pgdrome_tpu.ops.solvers import newton_solve

        mask = problem.bc_masks[k]
        if nonlinear is not None:
            apply_k = nonlinear[k][0]
            theta = jnp.ones((), dtype=Fs[k].dtype)
            for j in range(nd):
                if j != k:
                    theta = theta * nonlinear[j][1](Fs[j])

            def residual(u):
                # BC rows of (A_k, b) are identity/zero after
                # _apply_bc_system; mask the nonlinear rows to match
                return (
                    jnp.einsum("ij,j->i", A_k, u, precision=_PREC) - b
                    + theta * (mask * apply_k(u))
                )
        else:

            def residual(u):
                return jnp.einsum("ij,j->i", A_k, u, precision=_PREC) - b

        # warm start from the linear solve: for a linear problem Newton
        # then terminates with the direct solution (amplitude parity with
        # solver='lu'); for quasi-linear terms it is the Picard predictor
        u0 = jnp.linalg.solve(A_k, b)
        u, _, _ = newton_solve(residual, u0, max_iter=newton_max_it)
        return u
    if solver == "cg":
        return _cg_solve(A_k, b, cg_iters)
    if solver == "chol":
        return _chol_solve(A_k, b)
    return jnp.linalg.solve(A_k, b)


def _norm_d(problem, d, v):
    return jnp.sqrt(jnp.abs(_inner_d(problem, d, v, v)))


def _inner_d(problem, d, u, v):
    return jnp.einsum("i,ij,j->", u, problem.mass[d], v, precision=_PREC)


def make_enrich_step(problem: SeparatedProblem, seq_fp=None, max_fp_it=50,
                     tol_fp=1e-5, solver="lu", cg_iters=30,
                     residual_check=True, stop_fp="norm",
                     norm_modes="stiff", renorm_sweep=False,
                     nonlinear=None, newton_max_it=25):
    """Build the jitted enrichment step: (mode buffers, n) → new mode set.

    Returns a function of (modes, n_modes) producing
    (Fs_new, norm_Fs, fp_iters, residual) — semantics of reference
    solver.py FP_solve with the 'norm' stop.

    ``renorm_sweep``: renormalize each factor (mass norm) right after its
    per-dim solve, leaving the LAST dim of ``seq_fp`` to carry the mode's
    scale.  For a linear problem the rank-1 iterates are mathematically
    identical (a rank-1 product is invariant under redistributing scale
    between factors), but every cross-dim Gram coefficient stays O(1) —
    REQUIRED for f32 on badly-scaled compositions (measured: the minres
    transient's mode amplitude is ~1e-6 of its rhs, so the unnormalized
    factor's Grams fall below the f32 noise floor and the next dim's
    system assembles indefinite → chol NaN on the first sweep).  Off by
    default to keep the reference's exact iteration (solver.py FP_solve
    never renormalizes mid-sweep)."""
    nd = problem.num_dims
    seq = list(seq_fp) if seq_fp is not None else list(range(nd))
    if norm_modes not in ("stiff", "l2", "no"):
        raise ValueError(
            f"unknown norm_modes {norm_modes!r}: expected 'stiff', 'l2' or 'no'"
        )

    def init_modes(P):
        Fs = []
        for d in range(nd):
            f = jnp.ones(P.sizes[d], dtype=P.ops[d].dtype)
            f = f * P.bc_masks[d]
            if renorm_sweep:
                # match the mid-sweep convention: unit 2-norm inits keep
                # the first sweep's Gram coefficients O(1) even when a
                # congruence-transformed mass carries a huge scale
                f = f / jnp.linalg.norm(f)
            else:
                f = f / _norm_d(P, d, f)
            Fs.append(f)
        return tuple(Fs)

    def residual_norm(P, Fs, modes, mode_mask, rhs):
        # reference residual check (solver.py:345-395): per-dim rhs with
        # init modes, bc entries zeroed, res = sqrt(Σ_d ||b_d||²)
        res = 0.0
        for d in range(nd):
            # rhs-dtype contraction then downcast: see _solve_dim
            b = _contract_rhs(rhs, Fs, d, nd).astype(Fs[d].dtype)
            Pm = jnp.ones((modes[d].shape[0], P.num_terms), dtype=Fs[d].dtype)
            for j in range(nd):
                if j != d:
                    FAj = jnp.einsum("i,tij->tj", Fs[j], P.ops[j], precision=_PREC)
                    Pm = Pm * jnp.einsum("mj,tj->mt", modes[j], FAj, precision=_PREC)
            Pm = Pm * mode_mask[:, None]
            W = jnp.einsum("mt,mi->ti", Pm, modes[d], precision=_PREC)
            b = b - jnp.einsum("tij,tj->i", P.ops[d], W, precision=_PREC)
            b = b * P.bc_masks[d]
            res = res + jnp.sum(b * b)
        return jnp.sqrt(res)

    def fp_sweep(P, Fs, modes, mode_mask, rhs):
        Fs = list(Fs)
        for i, k in enumerate(seq):
            Fs[k] = _solve_dim(
                P, k, Fs, modes, mode_mask, rhs, solver=solver,
                cg_iters=cg_iters, nonlinear=nonlinear,
                newton_max_it=newton_max_it,
            )
            if renorm_sweep and i < len(seq) - 1:
                # EUCLIDEAN norm on purpose: the per-dim Gram coefficients
                # are plain einsums of the factor against the (equilibrated,
                # O(1)) operators, so unit-2-norm factors keep them O(1);
                # a transformed mass norm can carry the congruence scale
                # (measured ~1e14 on the preconditioned minres space dim)
                # and leave the Grams at the f32 noise floor
                nrm = jnp.sqrt(
                    jnp.einsum("i,i->", Fs[k], Fs[k], precision=_PREC)
                )
                Fs[k] = Fs[k] / jnp.where(nrm > 0, nrm, 1.0)
        return tuple(Fs)

    def enrich(modes, n_modes, rhs=None, init=None, data=None):
        # data: optional (ops, rhs, mass, bc_masks) runtime arrays — when
        # given, the program is value-independent (see _ProblemArrays)
        P = problem if data is None else _ProblemArrays(*data)
        rhs = tuple(P.rhs) if rhs is None else tuple(rhs)
        mode_mask = (jnp.arange(modes[0].shape[0]) < n_modes).astype(
            P.ops[0].dtype
        )
        # optional explicit fixed-point init (reference get_Fsinit
        # 'randomized', solver.py:158-304): used by the stall-retry path;
        # masked + M-normalized like the default ones-init
        if init is None:
            Fs0 = init_modes(P)
        else:
            Fs0 = []
            for d in range(nd):
                f = jnp.asarray(init[d], dtype=P.ops[d].dtype)
                f = f * P.bc_masks[d]
                # match init_modes: the renorm convention needs
                # unit-2-norm inits too, or the stall retry re-enters the
                # Gram-noise failure it is meant to escape
                nrm = jnp.linalg.norm(f) if renorm_sweep else _norm_d(P, d, f)
                Fs0.append(f / nrm)
            Fs0 = tuple(Fs0)
        if residual_check:
            res = residual_norm(P, Fs0, modes, mode_mask, rhs)
        else:
            # skip the (sizeable) residual program; semantics only matter
            # for degenerate zero-residual problems (solver.py:391-395)
            res = jnp.asarray(1.0, dtype=P.ops[0].dtype)

        def cond(state):
            Fs, Fs_prev, err, it = state
            return (err >= tol_fp) & (it < max_fp_it)

        def body(state):
            Fs, _, _, it = state
            Fs_new = fp_sweep(P, Fs, modes, mode_mask, rhs)
            if stop_fp == "delta":
                # 'delta' stop (solver.py:763-811): per-dim relative max DOF
                # change; iterate while any dim exceeds the tolerance
                err = 0.0
                for d in range(nd):
                    dd = jnp.abs(Fs_new[d] - Fs[d])
                    mi = jnp.argmax(dd)
                    ref = jnp.abs(Fs_new[d][mi])
                    delta_d = jnp.where(ref < 1e-8, dd[mi], dd[mi] / ref)
                    err = jnp.maximum(err, delta_d)
            else:
                # 'norm' stop (solver.py:812-871): product inner products
                newnew, newold, oldold = 1.0, 1.0, 1.0
                for d in range(nd):
                    newnew = newnew * _inner_d(P, d, Fs_new[d], Fs_new[d])
                    newold = newold * _inner_d(P, d, Fs_new[d], Fs[d])
                    oldold = oldold * _inner_d(P, d, Fs[d], Fs[d])
                err = jnp.sqrt(jnp.abs(newnew + oldold - 2 * newold))
                if renorm_sweep:
                    # the absolute reference metric is meaningless under
                    # the renorm convention (unit-Euclidean factors on
                    # congruence-scaled masses give newnew ~ 1e10 — the
                    # tolerance would only fire on bit-exact fixed
                    # points); compare relative to the iterate's own norm
                    err = err / jnp.sqrt(
                        jnp.maximum(newnew, jnp.asarray(1e-30, err.dtype))
                    )
            return (Fs_new, Fs, err, it + 1)

        big = jnp.asarray(jnp.inf, dtype=P.ops[0].dtype)
        Fs, _, err, fp_its = jax.lax.while_loop(
            cond, body, (Fs0, Fs0, big, 0)
        )

        norm_Fs = jnp.stack([_norm_d(P, d, Fs[d]) for d in range(nd)])
        normU = jnp.prod(norm_Fs)

        # all three reference normalizations (solver.py:404-470) store the
        # SAME rank-1 function — they only redistribute scale across the
        # factors (Π_d F_d is invariant); amplitudes are therefore
        # identical across modes
        if norm_modes == "no":
            # store as solved (solver.py:407-411); alpha fixed to 1
            alpha = jnp.ones((), dtype=norm_Fs.dtype)
            Fstored = tuple(Fs)
        elif norm_modes == "l2":
            # equidistribute the product of norms (solver.py:458-470)
            alpha = normU
            norm_all = normU ** (1.0 / nd)
            Fstored = tuple(
                jnp.where(norm_Fs[d] > 0, norm_all / norm_Fs[d], 0.0) * Fs[d]
                for d in range(nd)
            )
        else:
            # 'stiff' (solver.py:413-456): evaluate the full lhs Gram on
            # L2-normalized factors
            Fn = [Fs[d] / norm_Fs[d] for d in range(nd)]
            wprod = jnp.ones((P.num_terms,), dtype=norm_Fs.dtype)
            for d in range(nd):
                wprod = wprod * _term_weights(P.ops[d], Fn[d])
            norm_aux = jnp.sum(wprod)
            norm_fac = jnp.sqrt(jnp.abs(norm_aux)) ** (1.0 / nd)
            alpha = normU * norm_fac ** nd
            # guard the f32 noise floor: a vanishing mode must not poison
            # the buffers with NaN (0/0); it is reported with normU = 0
            scale = jnp.where(norm_fac > 0, alpha ** (1.0 / nd) / norm_fac, 0.0)
            Fstored = tuple(Fn[d] * scale for d in range(nd))
        new_modes = tuple(
            modes[d].at[n_modes].set(Fstored[d]) for d in range(nd)
        )
        return new_modes, normU, alpha, fp_its, res

    return enrich


def make_enrich_step_scanned(problem: SeparatedProblem, max_fp_it=50,
                             tol_fp=1e-5, solver="cg", cg_iters=30,
                             norm_modes="stiff"):
    """Enrichment step with the parameter dimensions folded into ONE
    ``lax.scan`` — exact Gauss-Seidel semantics via the prefix-new /
    suffix-old product trick.

    The unrolled step traces one solve program per dimension; for
    many-parameter vademecums that bloats XLA compile time linearly in d.
    Here dims 1..d-1 (which must share shapes, the usual vademecum case)
    are stacked to (P, T, n, n) and the alternating sweep scans over them:
    the coefficient for dim p is  w0 · Π_{q<p} w_q^new · Π_{q>p} w_q^old,
    with the prefix carried and the suffix precomputed by reverse cumprod.
    Compile cost becomes independent of the number of parameters.

    Requires residual_check semantics disabled (bench path) and uniform
    parameter-dim shapes."""
    nd = problem.num_dims
    P = nd - 1
    if len({problem.sizes[d] for d in range(1, nd)}) != 1:
        raise ValueError("scanned enrich needs uniform parameter-dim shapes")
    if norm_modes not in ("stiff", "l2", "no"):
        raise ValueError(
            f"unknown norm_modes {norm_modes!r}: expected 'stiff', 'l2' or 'no'"
        )

    T = problem.num_terms

    def solve_system(A, b, mask):
        A, b = _apply_bc_system(A, b, mask)
        if solver == "cg":
            return _cg_solve(A, b, cg_iters)
        if solver == "chol":
            return _chol_solve(A, b)
        return jnp.linalg.solve(A, b)

    def enrich(modes, n_modes, rhs=None, init=None, data=None):
        # data: optional (ops, rhs, mass, bc_masks) runtime arrays — the
        # stacks below then become jit inputs and the compiled program is
        # value-independent (see _ProblemArrays)
        Pv = problem if data is None else _ProblemArrays(*data)
        OPS_P = jnp.stack([jnp.asarray(Pv.ops[d]) for d in range(1, nd)])
        MASS_P = jnp.stack([jnp.asarray(Pv.mass[d]) for d in range(1, nd)])
        MASK_P = jnp.stack([jnp.asarray(Pv.bc_masks[d]) for d in range(1, nd)])
        ops0 = jnp.asarray(Pv.ops[0])
        mass0 = jnp.asarray(Pv.mass[0])
        mask0 = jnp.asarray(Pv.bc_masks[0])

        def param_weights(FP):
            return jnp.einsum("ptij,pi,pj->pt", OPS_P, FP, FP, precision=_PREC)

        rhs = tuple(Pv.rhs) if rhs is None else tuple(rhs)
        rhs0 = jnp.asarray(rhs[0])
        RHS_P = jnp.stack([jnp.asarray(rhs[d]) for d in range(1, nd)])
        R = rhs0.shape[0]
        M = modes[0].shape[0]
        MODES_P = jnp.stack([modes[d] for d in range(1, nd)])  # (P, M, n)
        modes0 = modes[0]
        dt = ops0.dtype
        mode_mask = (jnp.arange(M) < n_modes).astype(dt)

        # init factors (normalized masked ones, or an explicit init —
        # reference get_Fsinit 'randomized', solver.py:158-304)
        if init is None:
            F0 = jnp.ones(Pv.sizes[0], dtype=dt) * mask0
            FP = jnp.ones((P, Pv.sizes[1]), dtype=dt) * MASK_P
        else:
            F0 = jnp.asarray(init[0], dtype=dt) * mask0
            FP = jnp.stack([jnp.asarray(f, dtype=dt) for f in init[1:]]) * MASK_P
        F0 = F0 / jnp.sqrt(jnp.abs(jnp.einsum("i,ij,j->", F0, mass0, F0, precision=_PREC)))
        FPn = jnp.sqrt(jnp.abs(jnp.einsum("pi,pij,pj->p", FP, MASS_P, FP, precision=_PREC)))
        FP = FP / FPn[:, None]

        def sweep(F0, FP):
            # all-param weights with current values
            w_p = param_weights(FP)  # (P, T)
            r_p = jnp.einsum("pri,pi->pr", RHS_P, FP, precision=_PREC)  # (P, R)
            FA_p = jnp.einsum("pi,ptij->ptj", FP, OPS_P, precision=_PREC)
            pm_p = jnp.einsum("pmj,ptj->pmt", MODES_P, FA_p, precision=_PREC)

            # ---- dim 0 solve
            coef = jnp.prod(w_p, axis=0)  # (T,)
            A0 = jnp.einsum("t,tij->ij", coef, ops0, precision=_PREC)
            rc = jnp.prod(r_p, axis=0)  # (R,)
            b0 = jnp.einsum("r,ri->i", rc, rhs0, precision=_PREC)
            Pm = jnp.prod(pm_p, axis=0) * mode_mask[:, None]  # (M, T)
            W = jnp.einsum("mt,mi->ti", Pm, modes0, precision=_PREC)
            b0 = b0 - jnp.einsum("tij,tj->i", ops0, W, precision=_PREC)
            F0n = solve_system(A0, b0, mask0)

            # dim-0 weights with the new factor
            w0 = jnp.einsum("tij,i,j->t", ops0, F0n, F0n, precision=_PREC)
            r0 = jnp.einsum("ri,i->r", rhs0, F0n, precision=_PREC)
            FA0 = jnp.einsum("i,tij->tj", F0n, ops0, precision=_PREC)
            pm0 = jnp.einsum("mj,tj->mt", modes0, FA0, precision=_PREC)  # (M, T)

            # ---- scanned Gauss-Seidel over parameter dims
            # suffix products over q > p of OLD values: reverse cumprod
            def rev_suffix(x, unit_shape):
                rc_ = jnp.cumprod(x[::-1], axis=0)[::-1]  # (P, ...)
                ones = jnp.ones((1,) + unit_shape, dtype=x.dtype)
                return jnp.concatenate([rc_[1:], ones], axis=0)  # suffix[p]=Π_{q>p}

            suff_w = rev_suffix(w_p, (T,))
            suff_r = rev_suffix(r_p, (R,))
            suff_pm = rev_suffix(pm_p, (M, T))

            def body(carry, xs):
                pre_w, pre_r, pre_pm = carry
                Op, Rp, Mo, Mk, sw, sr, spm = xs
                coef = w0 * pre_w * sw
                A = jnp.einsum("t,tij->ij", coef, Op, precision=_PREC)
                b = jnp.einsum(
                    "r,ri->i", r0 * pre_r * sr, Rp, precision=_PREC
                )
                Pm = pm0 * pre_pm * spm * mode_mask[:, None]
                Wp = jnp.einsum("mt,mi->ti", Pm, Mo, precision=_PREC)
                b = b - jnp.einsum("tij,tj->i", Op, Wp, precision=_PREC)
                Fp = solve_system(A, b, Mk)
                # fold the updated factor into the prefixes
                pre_w = pre_w * jnp.einsum("tij,i,j->t", Op, Fp, Fp, precision=_PREC)
                pre_r = pre_r * jnp.einsum("ri,i->r", Rp, Fp, precision=_PREC)
                FAp = jnp.einsum("i,tij->tj", Fp, Op, precision=_PREC)
                pre_pm = pre_pm * jnp.einsum("mj,tj->mt", Mo, FAp, precision=_PREC)
                return (pre_w, pre_r, pre_pm), Fp

            init = (
                jnp.ones((T,), dtype=dt),
                jnp.ones((R,), dtype=dt),
                jnp.ones((M, T), dtype=dt),
            )
            _, FPn = jax.lax.scan(
                body, init, (OPS_P, RHS_P, MODES_P, MASK_P, suff_w, suff_r, suff_pm)
            )
            return F0n, FPn

        def cond(state):
            F0, FP, F0p, FPp, err, it = state
            return (err >= tol_fp) & (it < max_fp_it)

        def body(state):
            F0, FP, _, _, _, it = state
            F0n, FPn = sweep(F0, FP)
            # 'norm' stop: product of per-dim inner products
            i0nn = jnp.einsum("i,ij,j->", F0n, mass0, F0n, precision=_PREC)
            i0no = jnp.einsum("i,ij,j->", F0n, mass0, F0, precision=_PREC)
            i0oo = jnp.einsum("i,ij,j->", F0, mass0, F0, precision=_PREC)
            ipnn = jnp.einsum("pi,pij,pj->p", FPn, MASS_P, FPn, precision=_PREC)
            ipno = jnp.einsum("pi,pij,pj->p", FPn, MASS_P, FP, precision=_PREC)
            ipoo = jnp.einsum("pi,pij,pj->p", FP, MASS_P, FP, precision=_PREC)
            newnew = i0nn * jnp.prod(ipnn)
            newold = i0no * jnp.prod(ipno)
            oldold = i0oo * jnp.prod(ipoo)
            err = jnp.sqrt(jnp.abs(newnew + oldold - 2 * newold))
            return (F0n, FPn, F0, FP, err, it + 1)

        big = jnp.asarray(jnp.inf, dtype=dt)
        F0, FP, _, _, err, fp_its = jax.lax.while_loop(
            cond, body, (F0, FP, F0, FP, big, 0)
        )

        n0 = jnp.sqrt(jnp.abs(jnp.einsum("i,ij,j->", F0, mass0, F0, precision=_PREC)))
        np_ = jnp.sqrt(jnp.abs(jnp.einsum("pi,pij,pj->p", FP, MASS_P, FP, precision=_PREC)))
        F0n = F0 / n0
        FPn = FP / np_[:, None]
        normU = n0 * jnp.prod(np_)

        # reference normalizations (solver.py:404-470) — scale
        # redistribution only, Π_d F_d invariant (see make_enrich_step)
        if norm_modes == "no":
            alpha = jnp.ones((), dtype=normU.dtype)
            F0_store, FP_store = F0, FP
        elif norm_modes == "l2":
            alpha = normU
            norm_all = normU ** (1.0 / nd)
            F0_store = F0n * norm_all
            FP_store = FPn * norm_all
        else:
            # 'stiff' on L2-normalized factors
            wprod = jnp.einsum("tij,i,j->t", ops0, F0n, F0n, precision=_PREC)
            wprod = wprod * jnp.prod(param_weights(FPn), axis=0)
            norm_aux = jnp.sum(wprod)
            norm_fac = jnp.sqrt(jnp.abs(norm_aux)) ** (1.0 / nd)
            alpha = normU * norm_fac ** nd
            scale = jnp.where(norm_fac > 0, alpha ** (1.0 / nd) / norm_fac, 0.0)
            F0_store = F0n * scale
            FP_store = FPn * scale

        new_modes = (modes[0].at[n_modes].set(F0_store),) + tuple(
            modes[d].at[n_modes].set(FP_store[d - 1]) for d in range(1, nd)
        )
        res = jnp.asarray(1.0, dtype=dt)  # residual check not supported here
        return new_modes, normU, alpha, fp_its, res

    return enrich


class SeparatedPGD:
    """Progressive PGD driver over a :class:`SeparatedProblem`.

    ``solve()`` keeps the enrichment loop on the host (one jitted
    ``enrich_step`` call per mode — compiled once), matching the reference
    control flow: residual check → fixed point → 'stiff' norming →
    amplitude convergence (solver.py:306-506).

    ``solver``: per-dim linear solve inside the fixed point —
    ``"lu"`` (``jnp.linalg.solve``; host/f64 runs), ``"cg"``
    (fixed-iteration scale-normalized CG; the TPU fast path for
    energy-preconditioned systems, cond O(1)), or ``"chol"`` (exact SPD
    Cholesky; TPU-safe in f32, for squared-conditioning systems such as
    :func:`normal_equations` IRs where fixed-iteration CG stalls).
    """

    def __init__(
        self,
        problem: SeparatedProblem,
        n_max: int = 20,
        tol: float = 1e-10,
        tol_fp: float = 1e-5,
        max_fp_it: int = 50,
        seq_fp=None,
        dtype=None,
        solver: str = "lu",
        cg_iters: int = 30,
        residual_check: bool = True,
        scan_params: bool = False,
        stop_fp: str = "norm",
        fp_init: str = "ones",
        stall_retries: int = 1,
        aot_cache_dir: str | None = None,
        norm_modes: str = "stiff",
        renorm_sweep: bool = False,
        nonlinear=None,
        newton_max_it: int = 25,
        rhs_f64: bool = False,
        rhs_comp: bool = False,
    ):
        if solver not in ("lu", "cg", "chol", "newton"):
            raise ValueError(
                f"unknown solver {solver!r}: expected 'lu', 'cg', 'chol' "
                "or 'newton'"
            )
        if renorm_sweep and scan_params:
            raise ValueError("renorm_sweep is not supported with scan_params")
        if scan_params and (solver == "newton" or nonlinear is not None):
            raise ValueError(
                "the scanned (uniform-parameter) step supports linear "
                "direct solvers only; use scan_params=False for "
                "'newton'/nonlinear"
            )
        if rhs_comp and rhs_f64:
            # checked before the x64 guard: a TPU user combining the two
            # should be told to drop rhs_f64, not to enable x64
            raise ValueError("rhs_comp and rhs_f64 are exclusive")
        if (rhs_comp or rhs_f64) and not (
            isinstance(problem.rhs[0], np.ndarray)
            and problem.rhs[0].dtype == np.float64
        ):
            # a problem already cast to device f32 has no lo parts left to
            # preserve — dd_from_f64 of a round-tripped f32 stack is all
            # zeros and the mixed-precision flag silently does nothing.
            # Explicit failure over silent no-op (repo policy).
            raise ValueError(
                "rhs_f64/rhs_comp need the HOST float64 problem (builders' "
                "convention) — this problem's rhs is already "
                f"{'device' if not isinstance(problem.rhs[0], np.ndarray) else str(problem.rhs[0].dtype)}"
            )
        if rhs_f64:
            # mixed-precision stage solves: ship the rhs stack in f64 so
            # the load contraction resolves its ~1/s cancellation exactly
            # (the f32 cascade floor, PERF.md round-3).  Everything else
            # (ops, factors, solves) stays `dtype`.  Needs x64 — i.e. a
            # CPU/host backend; TPUs have no f64 (use the hybrid recipe:
            # early stages on TPU, rhs_f64 finishing stages on CPU).
            from jax import config as _jcfg

            if not _jcfg.jax_enable_x64:
                raise ValueError(
                    "rhs_f64=True needs jax_enable_x64 (CPU/host backend)"
                )
            if scan_params:
                raise ValueError("rhs_f64 is not supported with scan_params")
            rhs64 = [np.asarray(r, dtype=np.float64) for r in problem.rhs]
        else:
            rhs64 = None
        if rhs_comp:
            # the TPU-native counterpart of rhs_f64: the stack is shipped
            # as double-f32 pairs (R, n, 2) and the load contraction runs
            # compensated on the VPU (ops/ddf32.py) — ~2^-48 relative,
            # enough to resolve the cascade cancellation on a backend
            # with no hardware f64.  Split from the HOST f64 stack before
            # any device cast (a f32 round-trip would destroy the lo
            # parts this exists to keep).
            if scan_params:
                raise ValueError("rhs_comp is not supported with scan_params")
            from pgdrome_tpu.ops.ddf32 import dd_from_f64

            rhs_dd = [dd_from_f64(np.asarray(r, dtype=np.float64))
                      for r in problem.rhs]
        else:
            rhs_dd = None
        if rhs64 is not None:
            rhs_dev = [jnp.asarray(r, dtype=jnp.float64) for r in rhs64]
        elif rhs_dd is not None:
            rhs_dev = [jnp.asarray(r) for r in rhs_dd]
        else:
            rhs_dev = None
        if isinstance(problem.ops[0], np.ndarray):
            if rhs_dev is not None:
                # don't cast+upload the doomed f32 rhs stack via
                # as_device just to replace it — on deep cascades it is
                # the largest array and the host link is ~60-120 MB/s
                problem = SeparatedProblem(
                    ops=[jnp.asarray(np.asarray(o), dtype=dtype)
                         for o in problem.ops],
                    rhs=rhs_dev,
                    mass=[jnp.asarray(np.asarray(m), dtype=dtype)
                          for m in problem.mass],
                    bc_dofs=list(problem.bc_dofs),
                )
            else:
                problem = problem.as_device(dtype)
        elif rhs_dev is not None:
            problem = SeparatedProblem(
                ops=list(problem.ops), rhs=rhs_dev,
                mass=list(problem.mass), bc_dofs=list(problem.bc_dofs),
            )
        self.problem = problem
        # problem data as a runtime pytree: the jitted programs take these
        # as inputs, so compiled executables (and the AOT cache) are
        # value-independent — any same-shaped problem reuses them
        self._data = problem_data(problem)
        self.n_max = n_max
        self.tol = tol
        self._max_fp_it = max_fp_it
        self._tol_fp = tol_fp
        self._solver = solver
        self._cg_iters = cg_iters
        self._seq_fp = seq_fp
        self._residual_check = residual_check
        self._scan_params = scan_params
        self._norm_modes = norm_modes
        self._renorm_sweep = renorm_sweep
        self._nonlinear = nonlinear
        self._newton_max_it = newton_max_it
        if scan_params:
            step = make_enrich_step_scanned(
                problem, max_fp_it=max_fp_it, tol_fp=tol_fp, solver=solver,
                cg_iters=cg_iters, norm_modes=norm_modes,
            )
        else:
            step = make_enrich_step(
                problem, seq_fp=seq_fp, max_fp_it=max_fp_it, tol_fp=tol_fp,
                solver=solver, cg_iters=cg_iters, residual_check=residual_check,
                stop_fp=stop_fp, norm_modes=norm_modes,
                renorm_sweep=renorm_sweep, nonlinear=nonlinear,
                newton_max_it=newton_max_it,
            )
        self._enrich = jax.jit(step)
        self._stop_fp = stop_fp
        # reference fp_init knob (solver.py get_Fsinit 'randomized') + a
        # stall-recovery policy the reference lacks: a mode whose fixed
        # point collapses (normU → 0/NaN, common for greedy Galerkin on
        # non-symmetric operators) is retried with a randomized init
        # before giving up
        self._fp_init = fp_init
        self._stall_retries = stall_retries
        # persistent AOT-executable cache (utils/aot_cache.py): on remote
        # TPU backends the 100-1000 s server-side compile of the fused
        # program is the real time-to-first-solution; None defers to the
        # $PGDROME_AOT_CACHE env var (unset = off)
        self._aot_cache_dir = aot_cache_dir
        self.last_compile_status = None  # 'hit' | 'miss' | 'off' | None

    def _nonlinear_key(self):
        """AOT-cache key component for the nonlinear hook: SOURCE-hashed
        (a plain repr would embed memory addresses and miss every
        process; unsourceable callables fall back to their qualname).
        Hooks may carry an explicit ``_pgdrome_key`` attribute which
        wins over the source hash — builders that close over mesh data
        (fem.assembly_jax.quasilinear_diffusion) include a table
        fingerprint there, because identical source on a different mesh
        bakes different constants into the program."""
        if self._nonlinear is None:
            return None
        import inspect

        parts = [self._solver, self._newton_max_it]
        for entry in self._nonlinear:
            for fn in entry:
                explicit = getattr(fn, "_pgdrome_key", None)
                if explicit is not None:
                    parts.append(explicit)
                    continue
                try:
                    parts.append(inspect.getsource(fn))
                except (OSError, TypeError):
                    parts.append(getattr(fn, "__qualname__", repr(fn)))
        return tuple(parts)

    def _random_init(self, n, attempt):
        rng = np.random.default_rng(3452 + 7919 * n + attempt)
        return tuple(
            rng.uniform(-1.0, 1.0, size=s).astype(
                np.asarray(self.problem.ops[0]).dtype
            )
            for s in self.problem.sizes
        )

    def init_buffers(self):
        return tuple(
            jnp.zeros((self.n_max, n), dtype=self.problem.ops[0].dtype)
            for n in self.problem.sizes
        )

    def solve(self, verbose: bool = False, resume_from: PGDResult | None = None) -> PGDResult:
        """Progressive enrichment; pass ``resume_from`` (a prior PGDResult,
        e.g. loaded from a checkpoint) to continue enriching instead of
        restarting — PGD is progressive, so previous modes ARE the solver
        state (SURVEY.md §5 checkpoint/resume)."""
        if resume_from is not None:
            modes = tuple(
                jnp.zeros((self.n_max, n), dtype=self.problem.ops[0].dtype)
                .at[: resume_from.n_modes]
                .set(jnp.asarray(np.asarray(m)[: resume_from.n_modes]))
                for m, n in zip(resume_from.modes, self.problem.sizes)
            )
            n = resume_from.n_modes
            # amplitudes are stored relative; recover the absolute trace
            normConv = list(
                np.asarray(resume_from.amplitudes, dtype=np.float64)
                * resume_from.normU0
            )
            alphas = list(np.asarray(resume_from.alpha, dtype=np.float64))
            fps = list(np.asarray(resume_from.fp_its))
        else:
            modes = self.init_buffers()
            normConv, alphas, fps = [], [], []
            n = 0
        from pgdrome_tpu.utils.profiling import EnrichmentMetrics

        self.metrics = EnrichmentMetrics()
        while n < self.n_max:
            attempt = 0
            while True:
                if callable(self._fp_init) and attempt == 0:
                    # custom per-mode fixed-point seed: fn(mode_index,
                    # sizes) -> per-dim vectors.  High-dim corner capture
                    # needs this: an end-localized rank-1 target has
                    # ~(1/n_p)^(d-1) overlap with the default ones init,
                    # so the alternating sweeps never find it (measured
                    # at 10 params — PERF.md round-3 frontier notes);
                    # seeding the parameter factors at the box boundary
                    # removes the barrier.  Stall retries still fall back
                    # to the randomized init.
                    init = self._fp_init(n, self.problem.sizes)
                else:
                    init = (
                        self._random_init(n, attempt)
                        if (self._fp_init == "randomized" or attempt > 0)
                        else None
                    )
                with self.metrics.step():
                    modes_new, normU, alpha, fp_its, res = (
                        self._enrich(modes, n, data=self._data)
                        if init is None
                        else self._enrich(modes, n, init=init, data=self._data)
                    )
                    jax.block_until_ready(modes_new)
                res = float(res)
                stalled = not np.isfinite(float(normU)) or float(normU) <= 0
                if not stalled or attempt >= self._stall_retries:
                    break
                attempt += 1
                if verbose:
                    print(f"mode {n} stalled: randomized retry {attempt}")
            if res < 1e-10:
                if verbose:
                    print(f"residual {res:.3e} < 1e-10 at mode {n}: stop")
                break
            if stalled:
                if verbose:
                    print(f"mode {n} hit the fp noise floor: stop")
                break
            modes = modes_new
            normConv.append(float(normU))
            alphas.append(float(alpha))
            fps.append(int(fp_its))
            n += 1
            rel = normConv[-1] / normConv[0]
            self.metrics.record(mode=n - 1, amplitude=rel, fp_its=int(fp_its))
            if verbose:
                print(f"mode {n}: relConv={rel:.3e} fp_its={fp_its}")
            if rel < self.tol:
                break
        rel = np.asarray(normConv) / (normConv[0] if normConv else 1.0)
        return PGDResult(
            modes=list(modes),
            n_modes=n,
            amplitudes=rel,
            alpha=np.asarray(alphas),
            fp_its=np.asarray(fps),
            normU0=float(normConv[0]) if normConv else 1.0,
        )

    def solve_fused(self, n_enrich: int | None = None):
        """Whole enrichment loop as ONE jitted program (lax.fori_loop over
        modes) — a single device dispatch, no host round-trips.  This is
        the benchmark path: on a remote/tunneled TPU the per-call latency
        of the host loop would dominate.

        Runs a fixed number of enrichments (padded buffers); amplitude
        convergence is evaluated on the host afterwards from the recorded
        normU trace (semantics unchanged: trailing modes past the tolerance
        are simply truncated)."""
        n_enrich = n_enrich or self.n_max
        # cache one jitted program per enrichment budget: the fori_loop
        # bound and output buffer lengths are baked in at trace time, so a
        # second call with a different n_enrich must not reuse the first
        # call's program
        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}
        if n_enrich not in self._fused_cache:
            if self._scan_params:
                enrich = make_enrich_step_scanned(
                    self.problem,
                    max_fp_it=self._max_fp_it,
                    tol_fp=self._tol_fp,
                    solver=self._solver,
                    cg_iters=self._cg_iters,
                    norm_modes=self._norm_modes,
                )
            else:
                enrich = make_enrich_step(
                    self.problem,
                    seq_fp=self._seq_fp,
                    max_fp_it=self._max_fp_it,
                    tol_fp=self._tol_fp,
                    solver=self._solver,
                    cg_iters=self._cg_iters,
                    residual_check=self._residual_check,
                    stop_fp=self._stop_fp,
                    norm_modes=self._norm_modes,
                    renorm_sweep=self._renorm_sweep,
                    nonlinear=self._nonlinear,
                    newton_max_it=self._newton_max_it,
                )
            nd = self.problem.num_dims

            def fused(modes, data):
                def body(i, carry):
                    modes, normUs, alphas, fps = carry
                    modes_new, normU, alpha, fp_its, res = enrich(
                        modes, i, data=data
                    )
                    # preserve residual early-exit semantics AND stop at the
                    # fp noise floor: keep the old buffers if the residual
                    # vanished or the new mode collapsed/NaN'd
                    keep = (res >= 1e-10) & jnp.isfinite(normU) & (normU > 0)
                    modes = tuple(
                        jnp.where(keep, mn, mo)
                        for mn, mo in zip(modes_new, modes)
                    )
                    normUs = normUs.at[i].set(jnp.where(keep, normU, 0.0))
                    alphas = alphas.at[i].set(jnp.where(keep, alpha, 0.0))
                    fps = fps.at[i].set(fp_its)
                    return (modes, normUs, alphas, fps)

                dt = self.problem.ops[0].dtype
                init = (
                    modes,
                    jnp.zeros(n_enrich, dtype=dt),
                    jnp.zeros(n_enrich, dtype=dt),
                    jnp.zeros(n_enrich, dtype=jnp.int32),
                )
                return jax.lax.fori_loop(0, n_enrich, body, init)

            from pgdrome_tpu.utils.aot_cache import compile_cached, default_cache_dir

            jitted = jax.jit(fused)
            if self._aot_cache_dir or default_cache_dir():
                # the problem data are jit INPUTS, so the key only needs
                # shapes/dtypes + the knobs that shape the program — the
                # cached executable serves any same-shaped problem
                key_data = [
                    "solve_fused_v2",
                    tuple(
                        (tuple(a.shape), str(a.dtype))
                        for grp in self._data
                        for a in grp
                    ),
                    n_enrich,
                    self.n_max,
                    self._solver,
                    self._cg_iters,
                    self._tol_fp,
                    self._max_fp_it,
                    tuple(self._seq_fp) if self._seq_fp else None,
                    self._residual_check,
                    self._scan_params,
                    self._stop_fp,
                    self._norm_modes,
                    # versioned: the renorm program's semantics changed
                    # (relative 'norm' stop, Euclidean explicit-init) —
                    # stale executables must not serve the new knobs;
                    # False-keyed (default-path) entries are unchanged
                    "renorm-v2" if self._renorm_sweep else False,
                ]
                if self._solver == "newton":
                    # the Newton iteration cap is baked into the compiled
                    # while_loop bound — two caps must not share a cache
                    # entry.  Appended only when active so non-newton
                    # keys (and warm entries) stay stable.
                    key_data.append(("newton_max_it", self._newton_max_it))
                if self._nonlinear is not None:
                    # appended only when active, so the default path's
                    # cache keys (and warm entries) stay stable; plain
                    # solver='newton' is already keyed via self._solver
                    key_data.append(self._nonlinear_key())
                compiled, status = compile_cached(
                    jitted, (self.init_buffers(), self._data),
                    self._aot_cache_dir, key_data=key_data,
                )
                self._fused_cache[n_enrich] = compiled
                self.last_compile_status = status
            else:
                self._fused_cache[n_enrich] = jitted
                self.last_compile_status = "off"

        modes, normUs, alphas, fps = self._fused_cache[n_enrich](
            self.init_buffers(), self._data
        )
        normUs = np.asarray(normUs)
        valid = normUs > 0
        nrun = int(valid.sum())
        rel = normUs[:nrun] / (normUs[0] if nrun else 1.0)
        # truncate at amplitude tolerance (host-side, reference semantics)
        below = np.where(rel < self.tol)[0]
        n = int(below[0]) + 1 if len(below) else nrun
        return PGDResult(
            modes=list(modes),
            n_modes=n,
            amplitudes=rel[:n],
            alpha=np.asarray(alphas)[:n],
            fp_its=np.asarray(fps)[:n],
            normU0=float(normUs[0]) if nrun else 1.0,
        )


# ------------------------------------------------------------ update step

def galerkin_update(problem: SeparatedProblem, result: PGDResult,
                    rcond: float | None = None) -> PGDResult:
    """Galerkin update ("PGD with update"): re-solve the coefficients of the
    computed rank-1 terms by projecting the FULL problem onto their span.

    Progressive (greedy) PGD fixes each mode's amplitude when it is
    enriched; for non-symmetric / transient problems the greedy amplitudes
    can be far from the span-optimal ones and convergence stalls.  The
    update solves the K×K system

        Σ_j ⟨⊗F^i, A ⊗F^j⟩ α_j = ⟨⊗F^i, f⟩

    using separated contractions (cost O(T·K²) small dots) and folds α into
    the dim-0 modes.  Cheap, and often shaves orders of magnitude off the
    error for the same mode count.

    ``rcond``: when set, the K×K system is solved by SVD-truncated least
    squares (``np.linalg.lstsq``) instead of a direct solve — a safety
    valve for singular Grams (duplicate modes).  NOTE measured on the
    rank-320..960 5-parameter cascade: truncation at rcond=1e-12 made
    errors 2-4× WORSE — the small-singular directions of the accumulated
    Gram carry real signal there, and the plain f64 solve is fine.  Use
    only when the direct solve actually fails."""
    K = result.n_modes
    nd = problem.num_dims
    ops = [np.asarray(o, dtype=np.float64) for o in problem.ops]
    rhs = [np.asarray(r, dtype=np.float64) for r in problem.rhs]
    modes = [np.asarray(m, dtype=np.float64)[:K] for m in result.modes]

    # G[i,j] = Σ_t Π_d (F_d^i · O_td · F_d^j) — via BLAS batched matmuls
    # (np.einsum's 3-operand path is ~30x slower at n=2047)
    G = np.ones((ops[0].shape[0], K, K))
    for d in range(nd):
        tmp = np.matmul(modes[d][None, :, :], ops[d])  # (T, K, n_d)
        G = G * np.matmul(tmp, modes[d].T[None, :, :])  # (T, K, K)
    Gmat = G.sum(axis=0)

    # b[i] = Σ_r Π_d (F_d^i · g_rd)
    B = np.ones((rhs[0].shape[0], K))
    for d in range(nd):
        B = B * (rhs[d] @ modes[d].T)
    bvec = B.sum(axis=0)

    if rcond is None:
        alpha = np.linalg.solve(Gmat, bvec)
    else:
        alpha = np.linalg.lstsq(Gmat, bvec, rcond=rcond)[0]
    new_modes0 = np.array(result.modes[0], dtype=np.float64)
    new_modes0[:K] = alpha[:, None] * modes[0]
    dt0 = np.asarray(result.modes[0]).dtype
    out = PGDResult(
        # host numpy results stay host numpy (jnp f64 truncates, x64 off)
        modes=[new_modes0.astype(dt0, copy=False)
               if isinstance(result.modes[0], np.ndarray)
               else jnp.asarray(new_modes0, dtype=dt0)]
        + list(result.modes[1:]),
        n_modes=K,
        amplitudes=result.amplitudes,
        alpha=result.alpha,
        fp_its=result.fp_its,
        normU0=result.normU0,
    )
    return out


def compress_modes(result: PGDResult, mass, n_to: int, n_iters: int = 40,
                   tol: float = 1e-12) -> PGDResult:
    """PGD compression: replace the rank-K greedy separated solution by the
    OPTIMAL rank-R (R < K) separated representation, via CP-ALS in the
    mass-weighted inner product (host float64, milliseconds at solver
    scales — all contractions are (R,K)/(R,R) Gram matrices).

    Greedy enrichment is not rank-optimal: the tail error of K greedy
    modes is typically reachable with fewer optimal modes.  Solving a few
    extra greedy modes and compressing back gives strictly better accuracy
    at the SAME deployed rank (measured on the bench problem: rank-64
    greedy → rank-50 compressed beats rank-50 greedy).

    ``mass``: per-dim mass matrices defining the inner product (use the
    problem's — for a ``precondition_dim0``-transformed problem its
    transformed mass reproduces exactly the original L2 product).  Each
    ALS half-step solves  (⊙_{d≠j} B_d M_d B_dᵀ) B_j = (⊙_{d≠j} B_d M_d A_dᵀ) A_j.
    """
    K = result.n_modes
    if not (0 < n_to < K):
        raise ValueError(f"n_to must be in (0, {K}); got {n_to}")
    nd = len(result.modes)
    A = [np.asarray(m, dtype=np.float64)[:K] for m in result.modes]
    M = [np.asarray(m, dtype=np.float64) for m in mass]
    MA = [M[d] @ A[d].T for d in range(nd)]  # (n_d, K)

    # init with the first n_to greedy modes (they are roughly ordered)
    B = [A[d][:n_to].copy() for d in range(nd)]
    # cache the expensive mass products (M_d is n_d×n_d — dim 0 can be
    # thousands of dofs; everything else in the sweep is (R,K)-sized)
    MB = [M[d] @ B[d].T for d in range(nd)]  # (n_d, R)

    # ||T||^2 is constant: Hadamard product of per-dim A-Grams
    GA = np.ones((K, K))
    for d in range(nd):
        GA = GA * (A[d] @ MA[d])
    normT2 = GA.sum()

    prev_err2 = np.inf
    for _ in range(n_iters):
        for j in range(nd):
            G = np.ones((n_to, n_to))
            H = np.ones((n_to, K))
            for d in range(nd):
                if d != j:
                    G = G * (B[d] @ MB[d])
                    H = H * (B[d] @ MA[d])
            # regularize: ALS factors can become collinear mid-iteration
            G = G + 1e-14 * np.trace(G) / n_to * np.eye(n_to)
            B[j] = np.linalg.solve(G, H @ A[j])
            MB[j] = M[j] @ B[j].T
        GS = np.ones((n_to, n_to))
        TS = np.ones((n_to, K))
        for d in range(nd):
            GS = GS * (B[d] @ MB[d])
            TS = TS * (B[d] @ MA[d])
        err2 = normT2 - 2.0 * TS.sum() + GS.sum()
        if abs(prev_err2 - err2) <= tol * abs(normT2):
            break
        prev_err2 = err2

    dt = np.asarray(result.modes[0]).dtype
    buf_n = np.asarray(result.modes[0]).shape[0]
    host = isinstance(result.modes[0], np.ndarray)
    new_modes = []
    for d in range(nd):
        buf = np.zeros((buf_n, B[d].shape[1]), dtype=np.float64)
        buf[:n_to] = B[d]
        # host numpy results stay host numpy (jnp f64 truncates, x64 off)
        new_modes.append(
            buf.astype(dt, copy=False) if host else jnp.asarray(buf, dtype=dt)
        )
    return PGDResult(
        modes=new_modes,
        n_modes=n_to,
        amplitudes=np.asarray(result.amplitudes)[:n_to],
        alpha=np.asarray(result.alpha)[:n_to],
        fp_its=np.asarray(result.fp_its)[:n_to],
        normU0=result.normU0,
    )


def residual_problem(sep: SeparatedProblem, result: PGDResult):
    """Two-stage (hierarchical) PGD: build the separated problem for the
    correction δ* with  A (s·δ*) = f − A u_K,  rescaled to O(1).

    Why: greedy enrichment in f32 hits a relative amplitude floor (~4e-7 on
    the bench problem) — inside the step, the previous-mode sum subtracts
    two O(1) quantities whose difference is the O(1e-6) residual, so f32
    cancellation noise dominates late modes.  Here the residual right-hand
    side  f − A u_K  is formed ONCE on the host in float64 (exact), then
    scaled by 1/s to O(1); solving the returned problem restarts the f32
    floor at the residual's scale, buying the full dynamic range again.
    Deployment:  u = u_K + s·δ*  (:func:`combine_results`).

    Separated structure: each lhs term t × mode k contributes a rank-1 rhs
    term  −⊗_d (O_td u_kd), so the new rhs stack has R + T·K terms; the
    operators are unchanged.  Returns ``(sep_res, s)`` with ``s = ‖f − A
    u_K‖₂`` (product-space 2-norm, computed via separated Gram algebra —
    no full tensor is ever materialized)."""
    K = result.n_modes
    nd = sep.num_dims
    ops = [np.asarray(o, dtype=np.float64) for o in sep.ops]
    modes = [np.asarray(m, dtype=np.float64)[:K] for m in result.modes]
    T = sep.num_terms

    new_rhs = []
    for d in range(nd):
        # the solver enforces Dirichlet rows via masks, so the residual
        # lives in the MASKED (homogenized) system: constrained rows/cols
        # carry no residual (cf. normal_equations).  Mask the (small)
        # modes/rhs and the OUTPUT rows instead of copying the O(T·n²)
        # operator stack (~134 MB at bench scale on a ~100 MB/s host).
        m = np.asarray(sep.bc_masks[d], dtype=np.float64)
        rhs_m = np.asarray(sep.rhs[d], dtype=np.float64) * m[None, :]
        # W_d[t, k] = O_td @ (m∘u_kd), batched over terms (BLAS broadcast,
        # reads ops once); then mask the output rows
        W = np.matmul(ops[d], (modes[d] * m[None, :]).T)  # (T, n, K)
        W = W * m[None, :, None]
        W = W.transpose(0, 2, 1).reshape(T * K, ops[d].shape[1])  # (T·K, n)
        if d == 0:
            W = -W  # the minus sign of f − A·u_K, folded into dim 0
        new_rhs.append(np.concatenate([rhs_m, W], axis=0))

    # s = ‖r‖: Σ_{a,b} Π_d (g_ad · g_bd) via per-dim Grams
    G = np.ones((new_rhs[0].shape[0],) * 2)
    for d in range(nd):
        G = G * (new_rhs[d] @ new_rhs[d].T)
    s = float(np.sqrt(max(G.sum(), 0.0)))
    if s > 0:
        new_rhs[0] = new_rhs[0] / s

    sep_res = SeparatedProblem(
        ops=ops,
        rhs=new_rhs,
        mass=[np.asarray(m, dtype=np.float64) for m in sep.mass],
        bc_dofs=list(sep.bc_dofs),
    )
    return sep_res, s


def pad_rhs_bucket(sep: SeparatedProblem, bucket: int) -> SeparatedProblem:
    """Pad every dim's rhs stack with zero rows up to a ``bucket``
    multiple (all dims share the row count by construction).  Zero rows
    contribute nothing to the load contractions or ``normU0`` (tested:
    tests/unit/test_recipes.py zero-row inertness); they exist purely to
    STABILIZE the compiled program shapes across cascade stages — each
    :func:`residual_problem` restart grows the rhs stack by T·K rows, and
    on a remote-compile backend every new shape is a 100–1000 s XLA
    compile.  Bucketed shapes make deep cascades reuse a handful of
    executables (the 10-param frontier grind runs 30+ stages on ~3)."""
    R = sep.rhs[0].shape[0]
    Rpad = int(-(-R // bucket) * bucket)
    if Rpad == R:
        return sep
    rhs = [
        np.concatenate(
            [r, np.zeros((Rpad - R, r.shape[1]), dtype=np.asarray(r).dtype)]
        )
        for r in (np.asarray(r) for r in sep.rhs)
    ]
    return SeparatedProblem(
        ops=list(sep.ops),
        rhs=rhs,
        mass=list(sep.mass),
        bc_dofs=[np.flatnonzero(np.asarray(m) == 0.0) for m in sep.bc_masks],
    )


def compress_rhs(sep: SeparatedProblem, rank: int, n_iters: int = 30) -> SeparatedProblem:
    """Compress the separated right-hand side Σ_r ⊗_d g_rd to a lower-rank
    stack via CP-ALS in the problem's mass metric.

    Use when the rhs stack is the dominant per-sweep cost (many separated
    load terms relative to the operator count).  NOTE: measured on the
    bench's two-stage residual (R=257 → 32), the stage-2 solve time did
    NOT improve — there the fixed-point sweep count dominates, not the
    rhs contractions — and the compression adds ~2 s host time plus a
    small (≤1e-7) error drift; it is not part of the bench pipeline.
    Returns a new problem with the same operators and the compressed
    rhs."""
    R = sep.num_rhs
    if rank >= R:
        return sep
    fake = PGDResult(
        modes=[np.asarray(r, dtype=np.float64) for r in sep.rhs],
        n_modes=R,
        amplitudes=np.ones(R),
        alpha=np.ones(R),
        fp_its=np.zeros(R),
    )
    comp = compress_modes(fake, sep.mass, rank, n_iters=n_iters)
    return SeparatedProblem(
        ops=list(sep.ops),
        rhs=[np.asarray(m, dtype=np.float64)[:rank] for m in comp.modes],
        mass=list(sep.mass),
        bc_dofs=list(sep.bc_dofs),
    )


def combine_results(base: PGDResult, delta: PGDResult, scale: float) -> PGDResult:
    """Concatenate a base PGD and a (rescaled) correction PGD:
    u = u_base + scale·u_delta — the deployment step of the two-stage
    refinement (:func:`residual_problem`).  The scale folds into the dim-0
    factors; run :func:`galerkin_update` / :func:`compress_modes` on the
    combined result afterwards as usual."""
    K1, K2 = base.n_modes, delta.n_modes
    nd = len(base.modes)
    dt = np.asarray(base.modes[0]).dtype
    host = isinstance(base.modes[0], np.ndarray)
    new_modes = []
    for d in range(nd):
        b = np.asarray(base.modes[d], dtype=np.float64)[:K1]
        e = np.asarray(delta.modes[d], dtype=np.float64)[:K2]
        if d == 0:
            e = e * scale
        buf = np.concatenate([b, e], axis=0)
        # host numpy results stay host numpy: jnp.asarray(f64) with x64
        # off silently truncates nodal f64 modes to f32
        new_modes.append(
            buf.astype(dt, copy=False) if host else jnp.asarray(buf, dtype=dt)
        )
    return PGDResult(
        modes=new_modes,
        n_modes=K1 + K2,
        amplitudes=np.concatenate(
            [np.asarray(base.amplitudes)[:K1],
             np.asarray(delta.amplitudes)[:K2]
             * (scale * delta.normU0 / base.normU0 if base.normU0 else 1.0)]
        ),
        alpha=np.concatenate(
            [np.asarray(base.alpha)[:K1], np.asarray(delta.alpha)[:K2]]
        ),
        fp_its=np.concatenate(
            [np.asarray(base.fp_its)[:K1], np.asarray(delta.fp_its)[:K2]]
        ),
        normU0=base.normU0,
    )


def normal_equations(sep: SeparatedProblem) -> SeparatedProblem:
    """Minimal-residual PGD: transform to the normal equations AᵀA u = Aᵀf.

    Greedy Galerkin PGD has no minimization principle for non-symmetric
    operators (upwind time, advection) and can converge slowly or stall;
    on AᵀA it minimizes the true residual monotonically.  Separated
    structure is preserved: T lhs terms → T² (O_tdᵀ O_t'd per dim), R rhs
    terms → T·R (O_tdᵀ g_rd).  Condition numbers square — combine with
    :func:`precondition_dim0` for f32 runs.

    Dirichlet dofs are assumed homogenized (they are eliminated in the
    solver via masks; the masked system's normal equations coincide with
    masking these transformed operators because constrained entries carry
    zeros through every factor)."""
    ops = [np.asarray(o, dtype=np.float64) for o in sep.ops]
    rhs = [np.asarray(r, dtype=np.float64) for r in sep.rhs]
    nd = sep.num_dims
    T = sep.num_terms
    R = sep.num_rhs

    # zero out constrained rows/cols first so AᵀA matches the masked system
    masked_ops = []
    for d in range(nd):
        m = np.asarray(sep.bc_masks[d], dtype=np.float64)
        masked_ops.append(ops[d] * m[None, :, None] * m[None, None, :])
    masked_rhs = []
    for d in range(nd):
        m = np.asarray(sep.bc_masks[d], dtype=np.float64)
        masked_rhs.append(rhs[d] * m[None, :])

    new_ops = []
    new_rhs = []
    for d in range(nd):
        O = masked_ops[d]
        OtO = np.einsum("tik,uij->tukj", O, O).reshape(T * T, O.shape[1], O.shape[2])
        new_ops.append(OtO)
        # Aᵀ f per dim: O_tdᵀ g_rd
        Otg = np.einsum("tik,ri->trk", O, masked_rhs[d]).reshape(
            T * R, O.shape[1]
        )
        new_rhs.append(Otg)

    return SeparatedProblem(
        ops=new_ops,
        rhs=new_rhs,
        mass=[np.asarray(m, dtype=np.float64) for m in sep.mass],
        bc_dofs=list(sep.bc_dofs),
    )


def ne_dim_base(sep: SeparatedProblem, dim: int) -> np.ndarray:
    """The SPD congruence base ``Σ_t O_tdᵀ O_td`` (bc-masked) for
    preconditioning dimension ``dim`` of :func:`normal_equations`
    problems: by Cauchy–Schwarz every ne cross term O_tᵀO_u is bounded by
    this sum, so :func:`precondition_dim` with this base makes the ne
    per-dim systems uniformly well-conditioned — the stack's first entry
    alone (the default base) can be the WEAKEST term (e.g. mass² for the
    heat operator) and leaves ~n⁴ spreads.  Pass the ORIGINAL problem
    (before the ne transform)."""
    m = np.asarray(sep.bc_masks[dim], dtype=np.float64)
    B = np.zeros((sep.sizes[dim], sep.sizes[dim]))
    for t in range(sep.num_terms):
        O = np.asarray(sep.ops[dim][t], dtype=np.float64)
        O = O * m[:, None] * m[None, :]
        B += O.T @ O
    return B


# ---------------------------------------------------- preconditioned basis

@dataclass
class Dim0Transform:
    """Back-transform data from :func:`precondition_dim` /
    :func:`precondition_dim0`: full-dof mode reconstruction is
    ``u = scatter(Linv.T @ y)``.

    Holds the Cholesky factor DATA (banded ``Lb``/``Ub`` storage, or a
    dense ``L``) instead of solver closures, so the whole transform is
    picklable — the host-setup cache (utils/setup_cache.py) persists it
    alongside the preconditioned operator stacks.  ``apply_Linv`` /
    ``apply_LinvT`` map an (n_int, m) column block through L⁻¹ / L⁻ᵀ —
    banded or dense triangular solves, never an explicit inverse.
    ``dim`` records which dimension the transform applies to (apply
    ``modes_to_full`` to ``result.modes[dim]``)."""

    interior: np.ndarray  # interior dof indices into the full dof vector
    n_full: int
    dim: int = 0
    # exactly one of the two factor representations is set:
    banded: tuple | None = None  # (Lb, Ub): lower/upper banded storage
    dense_L: np.ndarray | None = None

    def apply_Linv(self, B):
        """L⁻¹ @ B for an (n_int, m) block."""
        from scipy.linalg import solve_banded, solve_triangular

        if self.banded is not None:
            Lb, _ = self.banded
            return solve_banded((Lb.shape[0] - 1, 0), Lb, B)
        return solve_triangular(self.dense_L, B, lower=True)

    def apply_LinvT(self, B):
        """L⁻ᵀ @ B for an (n_int, m) block."""
        from scipy.linalg import solve_banded, solve_triangular

        if self.banded is not None:
            _, Ub = self.banded
            return solve_banded((0, Ub.shape[0] - 1), Ub, B)
        return solve_triangular(self.dense_L.T, B, lower=False)

    def modes_to_full(self, modes0):
        """(n_max, n_int) transformed modes → (n_max, n_full) dof modes."""
        y = np.asarray(modes0, dtype=np.float64)
        u_int = self.apply_LinvT(y.T).T  # rows: Linv.T @ y_k
        out = np.zeros((y.shape[0], self.n_full), dtype=u_int.dtype)
        out[:, self.interior] = u_int
        return out

    def full_to_modes(self, modes_full):
        """(n_max, n_full) nodal dof modes → (n_max, n_int) transformed
        modes: the exact inverse of :meth:`modes_to_full` for modes
        supported on the interior dofs — ``y = Lᵀ u_int`` (banded or
        dense multiply, never a triangular solve).  Lets externally
        constructed modes (e.g. the anchored-ANOVA surrogate,
        ``pgdrome_tpu/anova.py``) enter a ``precondition_dim``
        cascade's basis."""
        u = np.asarray(modes_full, dtype=np.float64)[:, self.interior].T
        if self.banded is not None:
            _, Ub = self.banded          # Lᵀ in scipy upper-banded layout
            ku = Ub.shape[0] - 1
            n = u.shape[0]
            y = np.zeros_like(u)
            for mo in range(ku + 1):
                y[: n - mo] += Ub[ku - mo, mo:n][:, None] * u[mo:n]
            return y.T
        return (self.dense_L.T @ u).T


def equilibrate(sep: SeparatedProblem, dtype=None) -> SeparatedProblem:
    """Rescale every per-dim operator/rhs factor to O(1) max magnitude,
    folding the scalars into dim 0 — the tensor operator and rhs are
    EXACTLY unchanged (a scalar moved between factors of the same tensor
    product), so solutions and amplitude traces are bit-for-bit-identical
    mathematics.

    Why: the alternating-direction coefficient products
    ``Π_{j≠k} F_jᵀ O_tj F_j`` multiply per-dim magnitudes across ALL dims.
    With physical scalings (dt⁻² from a squared time stencil, h² from
    parameter masses) the products span ~1e±11 — harmless in f64, but in
    f32 they overflow/underflow and the per-dim systems degenerate
    (measured: the minres transient at n_t=257 NaNs on the FIRST sweep
    without this, converges with it).  Run before
    :func:`precondition_dim`/:func:`normal_equations` f32 solves.

    The mass matrices are similarly rescaled to O(1); relative amplitude
    traces are invariant (each factor's norm and its amplitude
    contribution rescale inversely)."""
    dt = dtype or (np.asarray(sep.ops[0]).dtype)
    nd = sep.num_dims
    T = sep.num_terms
    R = sep.num_rhs
    ops = [np.asarray(o, dtype=np.float64) for o in sep.ops]
    rhs = [np.asarray(r, dtype=np.float64) for r in sep.rhs]
    mass = [np.asarray(m, dtype=np.float64) for m in sep.mass]

    new_ops = [o.copy() for o in ops]
    for t in range(T):
        carry = 1.0
        for d in range(1, nd):
            s = np.max(np.abs(ops[d][t])) or 1.0
            new_ops[d][t] = ops[d][t] / s
            carry *= s
        new_ops[0][t] = ops[0][t] * carry

    new_rhs = [r.copy() for r in rhs]
    for r in range(R):
        carry = 1.0
        for d in range(1, nd):
            s = np.max(np.abs(rhs[d][r])) or 1.0
            new_rhs[d][r] = rhs[d][r] / s
            carry *= s
        new_rhs[0][r] = rhs[0][r] * carry

    new_mass = []
    for d in range(nd):
        mu = np.mean(np.abs(np.diagonal(mass[d]))) or 1.0
        new_mass.append(mass[d] / mu)

    return SeparatedProblem(
        ops=[o.astype(dt, copy=False) for o in new_ops],
        rhs=[r.astype(dt, copy=False) for r in new_rhs],
        mass=[m.astype(dt, copy=False) for m in new_mass],
        bc_dofs=list(sep.bc_dofs),
    )


def precondition_dim0(sep: SeparatedProblem, dtype=None):
    """:func:`precondition_dim` on dimension 0 (the usual space dim)."""
    return precondition_dim(sep, dim=0, dtype=dtype)


def precondition_dim(sep: SeparatedProblem, dim: int = 0, dtype=None,
                     base=None):
    """Congruence-transform dimension ``dim`` by the Cholesky factor of its
    first operator so that dim's transformed stack is ``[I, G_1, ...]``
    with condition number O(1).

    Why: the per-dim systems A = Σ_t c_t O_td inherit the O(n²)
    conditioning of the stiffness matrix (O(n⁴) after a
    :func:`normal_equations` transform squares it), which destroys float32
    accuracy on TPU (measured: 3% error at n=1024; a stalled-at-mode-0
    f32 Cholesky for the squared upwind time operator at n_t=257).
    Solving in the energy basis of the base operator (computed once,
    float64, on host) makes every TPU solve backward-stable at f32 —
    the MXU runs bf16/f32 at full speed and 1e-6 accuracy survives.

    Composable across dims: ``precondition_dim(precondition_dim(sep, 0)[0],
    1)`` transforms both; back-transform each dim's modes with its own
    returned transform.  The first operator of ``dim`` must be SPD on the
    interior (mass, stiffness, or a normal-equations square).

    ``base``: explicit SPD matrix to factor instead of the stack's first
    operator.  Essential for :func:`normal_equations` stacks, whose first
    entry is O_0ᵀO_0 — often the WEAKEST term (mass² for a heat problem),
    leaving the transformed cross terms spanning ~n⁴.  Pass the diagonal
    sum ``Σ_t O_tdᵀ O_td`` (see :func:`ne_dim_base`): Cauchy–Schwarz
    bounds every cross term by it, so the transformed per-dim systems are
    uniformly f32-well-conditioned.

    Dirichlet dofs of ``dim`` are eliminated by restriction (homogenized).
    Amplitudes are congruence-invariant, so results match the
    untransformed problem exactly (up to fp).
    """
    dt = dtype or np.float32
    from scipy.linalg import cholesky, cholesky_banded

    n0 = sep.sizes[dim]
    interior = np.setdiff1d(
        np.arange(n0), np.asarray(sep.bc_dofs[dim], dtype=np.int64)
    )
    ii = np.ix_(interior, interior)

    ops0 = [np.asarray(o, dtype=np.float64) for o in sep.ops[dim]]
    K = (np.asarray(base, dtype=np.float64)[ii] if base is not None
         else ops0[0][ii])
    n = len(interior)

    # FEM stiffness on a 1D mesh is banded (P1: tri-, P2: penta-diagonal).
    # Exploit it: banded Cholesky is O(n·b²) and every Linv application a
    # O(n·b)-per-column banded solve — the dense explicit inverse this
    # replaces was the 36 s hotspot of the round-1 bench setup on the
    # 1-core host (VERDICT.md round-1 weak #2).
    nz_i, nz_j = np.nonzero(K)
    bw = int(np.max(np.abs(nz_i - nz_j))) if nz_i.size else 0
    if (bw + 1) * 8 <= n:
        ab = np.zeros((bw + 1, n))
        for k in range(bw + 1):
            ab[k, : n - k] = np.diagonal(K, -k)
        Lb = cholesky_banded(ab, lower=True)  # Lb[k, j] = L[j+k, j]
        # upper-banded storage of L.T for the back-transform solves
        Ub = np.zeros_like(Lb)
        for k in range(bw + 1):
            Ub[bw - k, k:] = Lb[k, : n - k]
        tf = Dim0Transform(
            interior=interior, n_full=n0, dim=dim, banded=(Lb, Ub)
        )
    else:
        # dense fallback (e.g. 2D spaces without band-friendly dof order):
        # still no explicit inverse — triangular solves (BLAS dtrsm) only
        L = cholesky(K, lower=True)
        tf = Dim0Transform(interior=interior, n_full=n0, dim=dim, dense_L=L)
    apply_Linv = tf.apply_Linv

    if base is None:
        new_ops0 = [np.eye(n)]  # Linv O_0 LinvT is exactly I by construction
        rest = range(1, len(ops0))
    else:
        new_ops0 = []
        rest = range(len(ops0))
    for t in rest:
        X = apply_Linv(ops0[t][ii])  # Linv @ A
        new_ops0.append(apply_Linv(X.T).T)  # (Linv @ A) @ Linv.T
    new_rhs0 = apply_Linv(
        np.asarray(sep.rhs[dim], dtype=np.float64)[:, interior].T
    ).T
    Xm = apply_Linv(np.asarray(sep.mass[dim], dtype=np.float64)[ii])
    new_mass0 = apply_Linv(Xm.T).T

    # host numpy output (builders' convention): device casting happens at
    # solver construction, so requesting f64 works regardless of the jax
    # x64 flag (jnp would silently truncate)
    # cast per-term BEFORE stacking: halves the large copies for f32
    # and avoids a redundant full-stack copy for f64 (1-core host)
    new_ops = [np.asarray(o, dtype=dt) for o in sep.ops]
    new_rhs = [np.asarray(r, dtype=dt) for r in sep.rhs]
    new_mass = [np.asarray(m, dtype=dt) for m in sep.mass]
    new_bc = list(sep.bc_dofs)
    new_ops[dim] = np.stack([a.astype(dt, copy=False) for a in new_ops0])
    new_rhs[dim] = new_rhs0.astype(dt, copy=False)
    new_mass[dim] = new_mass0.astype(dt, copy=False)
    new_bc[dim] = np.array([], dtype=np.int64)
    new = SeparatedProblem(ops=new_ops, rhs=new_rhs, mass=new_mass,
                           bc_dofs=new_bc)
    return new, tf


# -------------------------------------------------------------- evaluation

def make_evaluator(result_modes, n_modes):
    """Jitted rank-1 reconstruction over the first (fixed) dimension for a
    BATCH of parameter factor matrices.

    Given per-free-dim factor values ``fac[j]`` of shape (B, n_max) —
    typically interpolation weights already contracted with the mode
    buffers — this is one einsum.  See pgdrome_tpu.parallel.vademecum for
    the sharded sweep built on top."""

    modes0 = result_modes[0]  # (n_max, n0)

    @jax.jit
    def reconstruct(free_factors):
        # free_factors: (B, n_max) product over free dims of per-mode values
        return free_factors @ modes0  # (B, n0)

    return reconstruct


def evaluate_modes_1d(V, modes_buf, points, xp=jnp, method="auto",
                      derivative=False):
    """Evaluate all buffered modes of a 1D space at a batch of points:
    returns (npoints, n_max).  Shared cell-locate + basis.

    On device ("auto"/"twohot", ndof ≤ 512) the per-point row gather is
    re-expressed as a dense interpolation-weight matmul: W (B, ndof) with
    the nl basis values scattered arithmetically per row, contracted
    against the mode table on the MXU.  TPU gathers of short rows run at
    ~4 GB/s; the matmul form measured ~11% faster end-to-end at B=512k
    and is numerically the same sum (≤1e-7 f32 reordering).  Large tables
    or host numpy fall back to the gather.

    derivative=True evaluates d(mode)/dp instead (chain-ruled reference
    shape derivatives, one-sided at cell boundaries) — the building block
    for parameter-sensitivity sweeps (parallel.vademecum
    make_sensor_jacobian_fn)."""
    from pgdrome_tpu.fem.interpolate import (
        _dshape_1d_x,
        _locate_1d,
        _shape_1d_x,
    )

    pts = xp.asarray(points)
    cell, xi = _locate_1d(V.mesh(), pts, xp)
    if derivative:
        verts = xp.asarray(V.mesh().coordinates()[:, 0])
        h = verts[cell + 1] - verts[cell]
        basis = _dshape_1d_x(V.degree, xi, xp) / h[..., None]  # (B, nl)
    else:
        basis = _shape_1d_x(V.degree, xi, xp)  # (B, nl)
    ed = xp.asarray(V.element_dofs)
    local = ed[cell]  # (B, nl)
    ndof = modes_buf.shape[1]
    if xp is jnp and (method == "twohot" or (method == "auto" and ndof <= 512)):
        ar = jnp.arange(ndof)[None, :]
        W = jnp.zeros((pts.shape[0], ndof), basis.dtype)
        for l in range(local.shape[1]):
            W = W + basis[:, l : l + 1] * (local[:, l : l + 1] == ar)
        return jnp.einsum("bp,np->bn", W, modes_buf, precision=_PREC)
    # modes_buf: (n_max, ndof) → gather (B, nl, n_max)
    gathered = modes_buf.T[local]  # (B, nl, n_max)
    if xp is jnp:
        return xp.einsum("bl,bln->bn", basis, gathered, precision=_PREC)
    return xp.einsum("bl,bln->bn", basis, gathered)
