"""Device-side (JAX) assembly: jit-compatible operator assembly and
matrix-free applies.

The host assembly (:mod:`pgdrome_tpu.fem.assembly`) runs once at setup
time and feeds the solver pre-assembled per-term operators — the right
split for SEPARABLE problems, where the fixed point only reweights fixed
matrices.  What it cannot do is run *inside* a jitted fixed point.  The
reference pays exactly that cost host-side: dolfin re-assembles the
weighted Gram forms in every fixed-point iteration (its dominant cost,
reference solver.py:547-569).

This module is the TPU-native version of "assembly inside the loop":
the quadrature/topology tables of a :class:`FunctionSpace` are fixed
arrays, so assembly is one einsum over cells plus a scatter-add — both
jit/grad/vmap-compatible, with only the quadrature weight field traced.
Use it when an operator depends on the CURRENT iterate (quasi-linear
diffusion K[w(u)]), via :func:`quasilinear_diffusion` which plugs
directly into ``SeparatedPGD(nonlinear=...)`` — the per-dim operator is
then re-assembled ON DEVICE inside the ``lax.while_loop`` fixed point,
no host round trip.

Matrix-free variants (:func:`mass_apply`, :func:`stiffness_apply`) skip
the (n, n) scatter entirely: per-cell gather → quadrature contraction →
scatter-add of the result vector, O(nc·nl·nq) work and O(n) memory —
the idiomatic TPU formulation for repeated applications.
"""

from __future__ import annotations

import hashlib

import numpy as np
import jax.numpy as jnp

from pgdrome_tpu.fem.space import FunctionSpace


class AssemblyTables:
    """Static per-space assembly data as device arrays.

    ``qw`` (nc, nq) quadrature weights × Jacobians; ``qb`` (nc, nl, nq)
    basis values; ``qg`` (nc, nl, nq, g) basis gradients; ``ed``
    (nc, nl) element→dof map; ``n`` total dofs.  ``fingerprint`` hashes
    the numeric content — two same-shaped spaces on different meshes get
    different fingerprints (AOT-cache correctness: closed-over tables
    are baked into compiled programs as constants)."""

    def __init__(self, V: FunctionSpace, dtype=jnp.float32):
        if V.value_size > 1:
            raise ValueError(
                "AssemblyTables covers scalar spaces; vector/elasticity "
                "operators assemble host-side (fem.assembly)"
            )
        qw = np.asarray(V.q_weights, dtype=np.float64)
        qb = np.asarray(V.q_basis, dtype=np.float64)
        qg = np.asarray(V.q_grads, dtype=np.float64)
        h = hashlib.sha256()
        for a in (qw, qb, qg, V.element_dofs):
            h.update(np.ascontiguousarray(a).tobytes())
        h.update(str(np.dtype(dtype)).encode())
        self.fingerprint = h.hexdigest()[:16]
        if np.dtype(dtype) == np.float64:
            from jax import config as _jcfg

            if not _jcfg.jax_enable_x64:
                # explicit failure over silent truncation (repo policy:
                # jnp.asarray(f64) with x64 off quietly downcasts)
                raise ValueError(
                    "AssemblyTables(dtype=float64) needs jax_enable_x64; "
                    "enable it or pass dtype=jnp.float32"
                )
        self.qw = jnp.asarray(qw, dtype=dtype)
        self.qb = jnp.asarray(qb, dtype=dtype)
        self.qg = jnp.asarray(qg, dtype=dtype)
        self.ed = jnp.asarray(V.element_dofs)
        self.n = int(V.ndofs)
        self.dtype = dtype


def at_quadrature(tables: AssemblyTables, u):
    """Nodal coefficients → values at quadrature points: (n,) → (nc, nq)."""
    return jnp.einsum("cl,clq->cq", u[tables.ed], tables.qb)


def _wq(tables, wq):
    w = tables.qw if wq is None else tables.qw * wq
    return w


def mass_matrix(tables: AssemblyTables, wq=None):
    """M[i,j] = ∫ w φi φj dx; ``wq`` (nc, nq) traced weight (None = 1)."""
    Ae = jnp.einsum("cq,ciq,cjq->cij", _wq(tables, wq), tables.qb, tables.qb)
    return _scatter_matrix(tables, Ae)


def stiffness_matrix(tables: AssemblyTables, wq=None):
    """K[i,j] = ∫ w ∇φi·∇φj dx; ``wq`` (nc, nq) traced weight."""
    Ae = jnp.einsum(
        "cq,ciqg,cjqg->cij", _wq(tables, wq), tables.qg, tables.qg
    )
    return _scatter_matrix(tables, Ae)


def advection_matrix(tables: AssemblyTables, wq=None, direction: int = 0):
    """A[i,j] = ∫ w φi ∂φj/∂x_dir dx (test=i rows, trial=j cols)."""
    Ae = jnp.einsum(
        "cq,ciq,cjq->cij",
        _wq(tables, wq), tables.qb, tables.qg[..., direction],
    )
    return _scatter_matrix(tables, Ae)


def load_vector(tables: AssemblyTables, gq):
    """b[i] = ∫ g φi dx with ``gq`` (nc, nq) the load at quadrature."""
    be = jnp.einsum("cq,ciq->ci", tables.qw * gq, tables.qb)
    return jnp.zeros((tables.n,), dtype=be.dtype).at[tables.ed].add(be)


def _scatter_matrix(tables, Ae):
    rows = jnp.broadcast_to(tables.ed[:, :, None], Ae.shape)
    cols = jnp.broadcast_to(tables.ed[:, None, :], Ae.shape)
    return jnp.zeros((tables.n, tables.n), dtype=Ae.dtype).at[
        rows, cols
    ].add(Ae)


def mass_apply(tables: AssemblyTables, wq, u):
    """Matrix-free M[w] @ u: gather → quadrature → scatter, O(n) memory."""
    uq = at_quadrature(tables, u)
    be = jnp.einsum("cq,ciq->ci", _wq(tables, wq) * uq, tables.qb)
    return jnp.zeros((tables.n,), dtype=be.dtype).at[tables.ed].add(be)


def stiffness_apply(tables: AssemblyTables, wq, u):
    """Matrix-free K[w] @ u (weighted flux form)."""
    du = jnp.einsum("cl,clqg->cqg", u[tables.ed], tables.qg)
    be = jnp.einsum(
        "cqg,ciqg->ci", _wq(tables, wq)[..., None] * du, tables.qg
    )
    return jnp.zeros((tables.n,), dtype=be.dtype).at[tables.ed].add(be)


def quasilinear_diffusion(V: FunctionSpace, wfun, dtype=jnp.float32):
    """Device-assembled quasi-linear diffusion hook for
    ``SeparatedPGD(nonlinear=...)``: the dim's nonlinear operator is
    N(u) = K[wfun(u_q)] @ u, RE-ASSEMBLED on device (matrix-free) at
    every evaluation inside the jitted fixed point.

    ``wfun``: traced map of the solution values at quadrature points to
    the diffusion weight there, e.g. ``lambda uq: eps * uq**2`` for
    κ(u) = κ0 + ε u² (pass the constant κ0 part through the LINEAR term
    list; the hook carries only the u-dependent part).

    Returns the ``(apply_fn, weight_fn)`` pair of the ``nonlinear``
    protocol (separated.py:_solve_dim).  Both carry an AOT-cache key
    that includes the table fingerprint — same-shaped spaces on
    different meshes must not share cached executables (the tables are
    compile-time constants)."""
    import inspect

    tb = AssemblyTables(V, dtype=dtype)

    def apply_fn(u):
        uq = at_quadrature(tb, u)
        return stiffness_apply(tb, wfun(uq), u)

    def weight_fn(F):
        return F @ apply_fn(F)

    try:
        src = inspect.getsource(wfun)
    except (OSError, TypeError):
        src = getattr(wfun, "__qualname__", repr(wfun))
    key = ("quasilinear_diffusion", src, tb.fingerprint, str(dtype))
    apply_fn._pgdrome_key = key + ("apply",)
    weight_fn._pgdrome_key = key + ("weight",)
    return apply_fn, weight_fn
