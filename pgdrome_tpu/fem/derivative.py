"""Exact derivatives of FE functions onto DG spaces.

Parity: the reference projects ``f.dx(0)`` (scalar modes) or ``grad(f)``
(vector modes → DG TensorFunctionSpace) onto a DG space of degree−1
(reference model.py:1088-1206, create_derivation_fct).  For piecewise
polynomials that projection is exact interpolation, so we build the DG
function directly — no solve needed.

Shapes:

* 1D scalar CG(deg)  → DG(deg−1) scalar (d/dx)
* 2D scalar CG(deg)  → DG(deg−1) 2-vector (∇u) via
  :func:`gradient_function`; :func:`derivative_function` extracts one
  component (``direction``, default 0 — the reference's ``f.dx(0)``)
* 2D vector CG(deg)  → DG(deg−1) ``vs·gdim``-vector (row-major ∇u:
  component ``i·gdim+j`` = ∂u_i/∂x_j — the dolfin ``grad`` convention the
  reference projects onto a TensorFunctionSpace, model.py:1151-1162)
* 3D scalar/vector P1 → DG0 gradient (beyond the reference, which marks
  the vector branch NOT YET TESTED, model.py:1163)
"""

from __future__ import annotations

import numpy as np

from pgdrome_tpu.fem.space import (
    FunctionSpace,
    VectorFunctionSpace,
    _shape_1d,
    _shape_tri,
    _shape_tet,
)
from pgdrome_tpu.fem.function import Function


def _dg_local_nodes(tdim: int, deg: int) -> np.ndarray:
    """Barycentric positions of the DG(deg) local nodes — MUST match the
    DG dofmap layout in space.FunctionSpace._build_dofmap."""
    if tdim == 2:
        if deg == 0:
            return np.array([[1 / 3, 1 / 3, 1 / 3]])
        if deg == 1:
            return np.eye(3)
        if deg == 2:
            return np.concatenate(
                [np.eye(3), np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]])]
            )
    if tdim == 3 and deg == 0:
        return np.full((1, 4), 0.25)
    raise NotImplementedError(f"DG local nodes tdim={tdim} deg={deg}")


def _cell_jacobian_inverse(mesh):
    """Per-cell inverse affine Jacobians (nc, tdim, tdim): gradients wrt
    the reduced barycentric coords map to global via J^{-1}.  Cached on
    the mesh — serving maps this over every mode of a vademecum and the
    O(nc) inverses are identical each time."""
    cached = getattr(mesh, "_jinv_cache", None)
    if cached is not None:
        return cached
    coords = mesh.coordinates()
    cells = mesh.cells()
    tdim = mesh.topology_dim()
    verts = coords[cells]
    v0 = verts[:, 0]
    J = np.stack([verts[:, i + 1] - v0 for i in range(tdim)], axis=2)
    Jinv = np.linalg.inv(J)
    mesh._jinv_cache = Jinv
    return Jinv


def _dg_space(mesh, deg, dim=None):
    """DG target space for derivative outputs, cached per mesh: the
    dofmap/quadrature tabulation is O(nc·nq) host work and identical for
    every mode mapped by serving."""
    cache = getattr(mesh, "_dg_space_cache", None)
    if cache is None:
        cache = {}
        mesh._dg_space_cache = cache
    key = (deg, dim)
    if key not in cache:
        if dim is None:
            cache[key] = FunctionSpace(mesh, "DG", deg)
        else:
            cache[key] = VectorFunctionSpace(mesh, "DG", deg, dim=dim)
    return cache[key]


def _simplex_gradients(V: FunctionSpace, bar: np.ndarray) -> np.ndarray:
    """Global gradients of V's local basis at barycentric points ``bar``:
    (nc, nl, nq, gdim)."""
    mesh = V.mesh()
    tdim = mesh.topology_dim()
    cache = getattr(mesh, "_basis_grad_cache", None)
    if cache is None:
        cache = {}
        mesh._basis_grad_cache = cache
    # key on the point VALUES, not just the count — same-degree callers
    # with a different same-size point set must not get stale gradients
    key = (V.degree, bar.shape[0],
           hash(np.ascontiguousarray(bar).tobytes()))
    if key in cache:
        return cache[key]
    if tdim == 2:
        _, dbary = _shape_tri(V.degree, bar)  # (nl, nq, 3)
    else:
        _, dbary = _shape_tet(V.degree, bar)  # (nl, nq, 4)
    dref = np.stack(
        [dbary[:, :, i + 1] - dbary[:, :, 0] for i in range(tdim)], axis=2
    )  # (nl, nq, tdim)
    Jinv = _cell_jacobian_inverse(mesh)  # (nc, tdim, tdim)
    grads = np.einsum("lqr,crg->clqg", dref, Jinv)
    cache[key] = grads
    return grads


def gradient_function(f: Function) -> Function:
    """Exact ∇f as a DG(degree−1) Function.

    Scalar source → DG vector (gdim components); vector source → DG
    "tensor" stored as a vector space with ``vs·gdim`` components in
    row-major order (∂u_i/∂x_j at component ``i·gdim+j``).  1D scalar
    sources return the scalar DG derivative (identical to
    :func:`derivative_function`)."""
    V = f.function_space()
    mesh = V.mesh()
    tdim = mesh.topology_dim()
    if tdim == 1:
        if V.value_size > 1:
            raise NotImplementedError("1D vector gradient not needed")
        return derivative_function(f)

    deg = V.degree
    if deg < 1:
        raise ValueError("gradient of a DG0/P0 function is zero")
    bar = _dg_local_nodes(tdim, deg - 1)  # (nq, tdim+1)
    grads = _simplex_gradients(V, bar)  # (nc, nl, nq, gdim)
    vs = max(V.value_size, 1)
    gdim = mesh.geometry_dim()
    ed = V.element_dofs  # (nc, nl) scalar dofs
    arr = np.asarray(f.array)

    if vs == 1:
        src = arr[ed]  # (nc, nl)
        vals = np.einsum("cl,clqg->cqg", src, grads)  # (nc, nq, gdim)
        Vd = _dg_space(mesh, deg - 1, dim=gdim)
        out = np.zeros(Vd.dim())
        # DG scalar dof of (cell c, node q) is ed_d[c, q]; vector dof =
        # scalar dof · gdim + g
        ed_d = Vd.element_dofs  # (nc, nq)
        for g in range(gdim):
            out[ed_d * gdim + g] = vals[..., g]
        return Function(Vd, out)

    # vector source → row-major grad tensor
    ncomp = vs * gdim
    Vd = _dg_space(mesh, deg - 1, dim=ncomp)
    ed_d = Vd.element_dofs
    out = np.zeros(Vd.dim())
    for i in range(vs):
        src_i = arr[ed * vs + i]  # (nc, nl)
        vals_i = np.einsum("cl,clqg->cqg", src_i, grads)
        for j in range(gdim):
            out[ed_d * ncomp + i * gdim + j] = vals_i[..., j]
    return Function(Vd, out)


def derivative_function(f: Function, direction: int = 0) -> Function:
    """Reference-parity derivative of a CG function as a DG(degree−1)
    Function (reference create_derivation_fct, model.py:1088-1206):

    * 1D scalar → d/dx (scalar DG)
    * 2D/3D scalar → ∂/∂x_direction (scalar DG; the reference hardcodes
      ``f.dx(0)`` — ``direction=0`` matches it)
    * 2D/3D vector → full ∇f tensor (the reference's grad branch)
    """
    V = f.function_space()
    mesh = V.mesh()
    tdim = mesh.topology_dim()
    if tdim != 1:
        if V.value_size > 1:
            return gradient_function(f)
        G = gradient_function(f)  # DG vector, gdim comps
        Vg = G.function_space()
        gdim = mesh.geometry_dim()
        if not (0 <= direction < gdim):
            raise ValueError(f"direction {direction} out of range")
        Vd = _dg_space(mesh, V.degree - 1)
        return Function(
            Vd, np.asarray(G.array).reshape(-1, Vg.value_size)[:, direction].copy()
        )
    if V.value_size > 1:
        raise NotImplementedError("1D vector derivative not needed")
    deg = V.degree
    Vd = _dg_space(mesh, deg - 1)
    cells = mesh.cells()
    coords = mesh.coordinates()[:, 0]
    h = coords[cells[:, 1]] - coords[cells[:, 0]]

    # local nodes of the DG target space on the reference cell
    if deg - 1 == 0:
        loc = np.array([0.5])
    elif deg - 1 == 1:
        loc = np.array([0.0, 1.0])
    else:
        loc = np.array([0.0, 0.5, 1.0])

    _, dref = _shape_1d(deg, loc)  # (nl_src, n_loc)
    src = np.asarray(f.array)[V.element_dofs]  # (nc, nl_src)
    vals = (src @ dref) / h[:, None]  # (nc, n_loc)
    return Function(Vd, vals.reshape(-1))
