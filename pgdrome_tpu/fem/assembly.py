"""Operator assembly: mass / stiffness / advection / elasticity matrices and
load vectors as dense arrays.

This is the TPU-native replacement for dolfin's UFL+FFC assembly pipeline
(reference SURVEY.md §2.3).  Key design decision: operators are assembled
ONCE per (space, operator, weight) and reused — the reference re-assembles
the same 1D Gram forms inside every fixed-point iteration
(solver.py:547-569, its dominant cost).  Gram coefficients then become
``vᵀ A w`` contractions.

Per-dim meshes are small, so dense matrices are the idiomatic layout:
assembly is one vectorized einsum over cells + scatter-add on the host
(setup-time), and the assembled operators feed the jitted TPU fast path
(:mod:`pgdrome_tpu.separated`) as device arrays where every solve /
contraction maps onto the MXU.
"""

from __future__ import annotations

import numpy as np

from pgdrome_tpu.fem.space import FunctionSpace, gauss_legendre_01, _shape_1d
from pgdrome_tpu.fem.function import Function, Expression, Constant


# ------------------------------------------------------------------ helpers

def _weight_at_quadrature(V: FunctionSpace, w):
    """Evaluate a weight (None | scalar | Expression | callable | Function)
    at the space's quadrature points. Returns (nc, nq) array or scalar."""
    if w is None:
        return 1.0
    if isinstance(w, (int, float)):
        return float(w)
    if isinstance(w, Constant):
        return float(w)
    if isinstance(w, Function):
        Vw = w.function_space()
        if Vw.value_size > 1:
            raise ValueError("scalar weight required")
        if Vw is V or (
            Vw.mesh() is V.mesh() and Vw.degree == V.degree and Vw.family == V.family
        ):
            return np.einsum("cl,clq->cq", w.array[V.element_dofs], V.q_basis)
        from pgdrome_tpu.fem.interpolate import eval_dofs_at_points

        pts = V.q_points[..., 0] if V.mesh().geometry_dim() == 1 else V.q_points
        return eval_dofs_at_points(Vw, w.array, pts)
    # Expression / plain callable
    qp = V.q_points
    pts = qp[..., 0] if V.mesh().geometry_dim() == 1 else qp
    return np.asarray(w(pts), dtype=np.float64)


def _scatter_matrix(V: FunctionSpace, Ae):
    """Scatter per-cell element matrices (nc, nl, nl) into a dense (n, n).

    Uses the native C++ scatter kernel when available (np.add.at is ~10x
    slower); see pgdrome_tpu/native.py."""
    from pgdrome_tpu.utils import native

    ed = V.element_dofs
    n = V.ndofs
    rows = np.broadcast_to(ed[:, :, None], Ae.shape)
    cols = np.broadcast_to(ed[:, None, :], Ae.shape)
    A = np.zeros((n, n))
    native.scatter_add_dense(A, rows, cols, Ae)
    return A


def _scatter_matrix_sparse(V: FunctionSpace, Ae):
    """Scatter element matrices into a scipy CSR matrix (large 2D reference
    solves; the PGD per-dim operators stay dense)."""
    from scipy import sparse

    ed = V.element_dofs
    rows = np.broadcast_to(ed[:, :, None], Ae.shape).ravel()
    cols = np.broadcast_to(ed[:, None, :], Ae.shape).ravel()
    n = V.ndofs
    return sparse.coo_matrix((Ae.ravel(), (rows, cols)), shape=(n, n)).tocsr()


def _scatter_vector(V: FunctionSpace, be):
    from pgdrome_tpu.utils import native

    b = np.zeros(V.ndofs)
    native.scatter_add_vector(b, V.element_dofs, be)
    return b


def _require_scalar(V):
    if V.value_size > 1:
        raise ValueError(
            "scalar-space operator requested on a vector space; "
            "use the elasticity/vector variants"
        )


# ----------------------------------------------------------------- matrices

def mass_matrix(V: FunctionSpace, weight=None, sparse: bool = False):
    """M[i,j] = ∫ w φi φj dx  (UFL parity: `w*fct_F*var_F*dx`)."""
    _require_scalar(V)
    if weight is None and not sparse and "mass" in V._cache:
        return V._cache["mass"]
    wq = _weight_at_quadrature(V, weight)
    Ae = np.einsum("cq,ciq,cjq->cij", V.q_weights * wq, V.q_basis, V.q_basis)
    if sparse:
        return _scatter_matrix_sparse(V, Ae)
    M = _scatter_matrix(V, Ae)
    if weight is None:
        V._cache["mass"] = M
    return M


def stiffness_matrix(V: FunctionSpace, weight=None, sparse: bool = False):
    """K[i,j] = ∫ w ∇φi·∇φj dx  (UFL parity: `w*fct_F.dx(0)*var_F.dx(0)*dx`
    in 1D, `w*inner(grad(u),grad(v))*dx` in 2D)."""
    _require_scalar(V)
    if weight is None and not sparse and "stiff" in V._cache:
        return V._cache["stiff"]
    wq = _weight_at_quadrature(V, weight)
    Ae = np.einsum("cq,ciqg,cjqg->cij", V.q_weights * wq, V.q_grads, V.q_grads)
    if sparse:
        return _scatter_matrix_sparse(V, Ae)
    K = _scatter_matrix(V, Ae)
    if weight is None:
        V._cache["stiff"] = K
    return K


def advection_matrix(V: FunctionSpace, weight=None, direction: int = 0) -> np.ndarray:
    """A[i,j] = ∫ w φi ∂φj/∂x_direction dx
    (UFL parity: `w*fct_F.dx(0)*var_F*dx`; test=i rows, trial=j cols)."""
    _require_scalar(V)
    wq = _weight_at_quadrature(V, weight)
    Ae = np.einsum(
        "cq,ciq,cjq->cij", V.q_weights * wq, V.q_basis, V.q_grads[..., direction]
    )
    return _scatter_matrix(V, Ae)


# ------------------------------------------------------------------ vectors

def load_vector(V: FunctionSpace, g, weight=None) -> np.ndarray:
    """b[i] = ∫ w g φi dx for scalar spaces;  g may be Expression/Function/
    callable/Constant (UFL parity: `g*var_F*dx`)."""
    _require_scalar(V)
    gq = _weight_at_quadrature(V, g)
    wq = _weight_at_quadrature(V, weight)
    if np.isscalar(gq):
        gq = gq * np.ones_like(V.q_weights)
    be = np.einsum("cq,ciq->ci", V.q_weights * wq * gq, V.q_basis)
    return _scatter_vector(V, be)


def assemble_vector(V: FunctionSpace, g, weight=None) -> np.ndarray:
    """Alias of :func:`load_vector` (reads closer to dolfin.assemble)."""
    return load_vector(V, g, weight)


# ------------------------------------------------------- vector-space (2D)

def elasticity_matrix(V: FunctionSpace, C, sparse: bool = False):
    """K[i,j] = ∫ ε(φi) : C : ε(φj) dx for a 2D vector space, with C a
    constant 3×3 Voigt matrix (εxx, εyy, γxy).

    UFL parity: `inner(eps(v), C*eps(u))*dx` with separated elasticity
    tensors (reference test_solver_problem.py:552-568)."""
    if V.value_size != 2:
        raise ValueError("elasticity_matrix needs a 2D vector space")
    C = np.asarray(C, dtype=np.float64)
    grads = V.q_grads  # (nc, nl, nq, 2) scalar-basis gradients
    nc, nl, nq, _ = grads.shape
    zeros = np.zeros((nc, nl, nq))
    gx = grads[..., 0]
    gy = grads[..., 1]
    Bx = np.stack([gx, zeros, gy], axis=-1)  # comp 0: (exx, eyy, gxy)
    By = np.stack([zeros, gy, gx], axis=-1)  # comp 1
    B = np.stack([Bx, By], axis=2).reshape(nc, nl * 2, nq, 3)  # dof-major (l,c)
    CB = np.einsum("vw,cjqw->cjqv", C, B)
    Ae = np.einsum("cq,ciqv,cjqv->cij", V.q_weights, B, CB)
    ed = V.element_dofs
    vd = (ed[:, :, None] * 2 + np.arange(2)[None, None, :]).reshape(nc, nl * 2)
    n = V.dim()
    rows = np.broadcast_to(vd[:, :, None], Ae.shape)
    cols = np.broadcast_to(vd[:, None, :], Ae.shape)
    if sparse:
        from scipy import sparse as sps

        return sps.coo_matrix(
            (Ae.ravel(), (rows.ravel(), cols.ravel())), shape=(n, n)
        ).tocsr()
    A = np.zeros((n, n))
    np.add.at(A, (rows, cols), Ae)
    return A


def elasticity_matrix_3d(V: FunctionSpace, C, sparse: bool = False):
    """K[i,j] = ∫ ε(φi) : C : ε(φj) dx for a 3D vector space; C is a 6×6
    Voigt matrix (εxx, εyy, εzz, γyz, γxz, γxy)."""
    if V.value_size != 3:
        raise ValueError("elasticity_matrix_3d needs a 3D vector space")
    C = np.asarray(C, dtype=np.float64)
    grads = V.q_grads  # (nc, nl, nq, 3)
    nc, nl, nq, _ = grads.shape
    z = np.zeros((nc, nl, nq))
    gx, gy, gz = grads[..., 0], grads[..., 1], grads[..., 2]
    # component c of dof l contributes rows of the Voigt strain vector
    Bx = np.stack([gx, z, z, z, gz, gy], axis=-1)
    By = np.stack([z, gy, z, gz, z, gx], axis=-1)
    Bz = np.stack([z, z, gz, gy, gx, z], axis=-1)
    B = np.stack([Bx, By, Bz], axis=2).reshape(nc, nl * 3, nq, 6)
    CB = np.einsum("vw,cjqw->cjqv", C, B)
    Ae = np.einsum("cq,ciqv,cjqv->cij", V.q_weights, B, CB)
    ed = V.element_dofs
    vd = (ed[:, :, None] * 3 + np.arange(3)[None, None, :]).reshape(nc, nl * 3)
    n = V.dim()
    rows = np.broadcast_to(vd[:, :, None], Ae.shape)
    cols = np.broadcast_to(vd[:, None, :], Ae.shape)
    if sparse:
        from scipy import sparse as sps

        return sps.coo_matrix(
            (Ae.ravel(), (rows.ravel(), cols.ravel())), shape=(n, n)
        ).tocsr()
    A = np.zeros((n, n))
    from pgdrome_tpu.utils import native

    native.scatter_add_dense(A, rows, cols, Ae)
    return A


def vector_mass_matrix(V: FunctionSpace, weight=None, sparse: bool = False):
    """Block mass matrix for a vector space (interleaved dofs)."""
    key = "vmass_sp" if sparse else "vmass"
    if weight is None and key in V._cache:
        return V._cache[key]
    Vs = FunctionSpace(V.mesh(), V.family, V.degree)
    vs = V.value_size
    n = Vs.ndofs
    if sparse:
        from scipy import sparse as sps

        Ms = mass_matrix(Vs, weight, sparse=True).tocoo()
        rows = np.concatenate([Ms.row * vs + c for c in range(vs)])
        cols = np.concatenate([Ms.col * vs + c for c in range(vs)])
        data = np.concatenate([Ms.data for _ in range(vs)])
        M = sps.coo_matrix((data, (rows, cols)), shape=(n * vs, n * vs)).tocsr()
    else:
        Ms = mass_matrix(Vs, weight)
        M = np.zeros((n * vs, n * vs))
        for c in range(vs):
            idx = np.arange(n) * vs + c
            M[np.ix_(idx, idx)] += Ms
    if weight is None:
        V._cache[key] = M
    return M


def _boundary_edges(V: FunctionSpace):
    """Boundary edges of a 2D mesh: scalar dofs whose trace lives on the
    edge in 1D order [va, (mid,) vb], plus their endpoint coordinates."""
    mesh = V.mesh()
    cells = mesh.cells()
    e_all = np.concatenate(
        [cells[:, [1, 2]], cells[:, [0, 2]], cells[:, [0, 1]]], axis=0
    )
    e_sorted = np.sort(e_all, axis=1)
    uniq, counts = np.unique(e_sorted, axis=0, return_counts=True)
    boundary = np.where(counts == 1)[0]
    out = []
    coords = mesh.coordinates()
    nv = mesh.num_vertices()
    for eidx in boundary:
        va, vb = uniq[eidx]
        if V.degree == 2:
            mid_dof = nv + eidx  # matches edge-dof numbering in space.py
            dofs = np.array([va, mid_dof, vb])
        else:
            dofs = np.array([va, vb])
        out.append((dofs, coords[[va, vb]]))
    return out


def boundary_load_vector(V: FunctionSpace, g, marker=None) -> np.ndarray:
    """b[i] = ∫_Γ g·φi ds over boundary facets selected by `marker`
    (callable on the facet midpoint → bool; None = whole boundary).

    UFL parity: `dot(g, v)*ds(tag)` with MeshFunction-marked boundaries
    (reference test_solver_problem.py:78-120)."""
    vs = max(V.value_size, 1)
    deg = V.degree
    nq = 2 * deg + 1
    xi, w = gauss_legendre_01(nq)
    vals, _ = _shape_1d(deg, xi)  # trace basis (nl1d, nq)
    b = np.zeros(V.dim())
    for dofs, endpoints in _boundary_edges(V):
        pa, pb = endpoints
        mid = 0.5 * (pa + pb)
        if marker is not None and not marker(mid):
            continue
        length = float(np.linalg.norm(pb - pa))
        qpts = pa[None, :] + xi[:, None] * (pb - pa)[None, :]  # (nq, 2)
        gvals = np.asarray(g(qpts), dtype=np.float64)  # (nq,) or (nq, vs)
        if vs == 1:
            b[dofs] += (vals * (w * gvals)[None, :]).sum(axis=1) * length
        else:
            if gvals.ndim == 1:
                gvals = np.tile(gvals[:, None], (1, vs))
            for c in range(vs):
                b[dofs * vs + c] += (
                    vals * (w * gvals[:, c])[None, :]
                ).sum(axis=1) * length
    return b


# ----------------------------------------------------------- contractions

def gram(f, A, g) -> float:
    """Scalar ⟨f, A g⟩ = fᵀ A g for Functions or raw arrays (A may be
    dense or scipy-sparse).

    Replaces the reference idiom `dolfin.assemble(F*w*F*dx)` — the operator
    A is assembled once, the contraction is a single matvec+dot."""
    fa = f.array if isinstance(f, Function) else np.asarray(f)
    ga = g.array if isinstance(g, Function) else np.asarray(g)
    return float(fa @ (A @ ga))


def norm(f, M=None) -> float:
    """L2 norm sqrt(fᵀ M f); M defaults to the consistent mass matrix of
    f's space (dolfin.norm parity, reference solver.py:207)."""
    if isinstance(f, Function):
        V = f.function_space()
        if M is None:
            M = vector_mass_matrix(V) if V.value_size > 1 else mass_matrix(V)
        arr = f.array
    else:
        arr = np.asarray(f)
        if M is None:
            raise ValueError("raw-array norm needs an explicit mass matrix")
    return float(np.sqrt(np.abs(arr @ (M @ arr))))


def inner_l2(f, g, M=None) -> float:
    """⟨f, g⟩_L2 = fᵀ M g with the consistent mass matrix."""
    if isinstance(f, Function) and M is None:
        V = f.function_space()
        M = vector_mass_matrix(V) if V.value_size > 1 else mass_matrix(V)
    return gram(f, M, g)
