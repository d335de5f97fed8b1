"""Point evaluation of FE functions: cell-locate + local basis eval.

Replaces dolfin point evaluation / fenicstools.Probes (reference
model.py:107-130, 822-842).  For structured meshes the containing cell is
computed arithmetically (no search trees), so a batch of query points is a
single fused gather.

Array-module generic: ``xp=numpy`` (default) for the host orchestration
layer, ``xp=jax.numpy`` for the jitted TPU fast path (everything here is
shape-static and trace-safe).
"""

from __future__ import annotations

import numpy as np

from pgdrome_tpu.fem.mesh import IntervalMesh, RectangleMesh


class BucketLocator:
    """Static-shape bucketed point locator for unstructured simplicial
    meshes (SimplicialMesh.locator()).

    Replaces dolfin's BoundingBoxTree point location (used implicitly by
    every reference point eval on non-structured meshes, reference
    model.py:822-842) with a jit-traceable design: a uniform bucket grid
    over the bounding box, each bucket carrying a PADDED candidate-cell
    list, and per-query selection of the candidate with the largest
    minimum barycentric coordinate.  Everything is a fixed-shape gather +
    small einsum — works with ``xp=numpy`` on the host and ``xp=jnp``
    under jit.
    """

    def __init__(self, mesh, max_buckets_per_axis: int = 64):
        import itertools

        coords = mesh.coordinates()
        cells = mesh.cells()
        tdim = mesh.topology_dim()
        verts = coords[cells]  # (nc, tdim+1, gdim)
        v0 = verts[:, 0]
        # affine map x = v0 + T @ bary_rest with T columns = edge vectors;
        # store T^{-1} so bary_rest = Tinv @ (x - v0) is one small matmul
        T = np.stack([verts[:, i + 1] - v0 for i in range(tdim)], axis=2)
        self.v0 = v0
        self.Tinv = np.linalg.inv(T)  # (nc, tdim, tdim)
        nc = cells.shape[0]
        lo = coords.min(axis=0)
        hi = coords.max(axis=0)
        # ~1 cell per bucket on average (each cell lands in the buckets
        # its bbox overlaps, so candidate lists stay short)
        nb = int(np.clip(round(nc ** (1.0 / tdim)), 1, max_buckets_per_axis))
        h = (hi - lo) / nb
        h[h == 0] = 1.0
        self.lo, self.h, self.nb, self.tdim = lo, h, nb, tdim

        cmin = verts.min(axis=1)
        cmax = verts.max(axis=1)
        bmin = np.clip(np.floor((cmin - lo) / h).astype(np.int64), 0, nb - 1)
        bmax = np.clip(np.floor((cmax - lo) / h).astype(np.int64), 0, nb - 1)
        buckets = [[] for _ in range(nb**tdim)]
        for c in range(nc):
            for idx in itertools.product(
                *[range(bmin[c, a], bmax[c, a] + 1) for a in range(tdim)]
            ):
                flat = 0
                for a in range(tdim):
                    flat = flat * nb + idx[a]
                buckets[flat].append(c)
        K = max(1, max(len(b) for b in buckets))
        cand = np.zeros((len(buckets), K), dtype=np.int32)
        for i, b in enumerate(buckets):
            if b:
                cand[i, : len(b)] = b
                cand[i, len(b):] = b[-1]  # pad by repetition: harmless
                # under the best-candidate argmax
        self.cand = cand

    # roundoff slack on barycentric containment (dimensionless; points on
    # edges/vertices sit at exactly 0)
    CONTAIN_TOL = 1e-9

    def locate(self, pts, xp):
        """pts (..., gdim) → (cell (...,), bary (..., tdim+1)).

        Points outside the mesh (best candidate's min barycentric
        coordinate < -CONTAIN_TOL — e.g. inside the bounding box but in a
        hole of a non-convex mesh) RAISE on the host path, matching
        dolfin's BoundingBoxTree behavior the reference relies on
        (model.py:822-842).  Under jit (xp=jnp) raising is impossible:
        the barycentric weights are NaN-poisoned instead, so downstream
        values are NaN rather than silently extrapolated garbage."""
        pts = xp.asarray(pts)
        lo = xp.asarray(self.lo)
        h = xp.asarray(self.h)
        nb = self.nb
        idx = xp.clip(
            xp.floor((pts - lo) / h).astype(np.int32), 0, nb - 1
        )  # (..., tdim)
        flat = idx[..., 0]
        for a in range(1, self.tdim):
            flat = flat * nb + idx[..., a]
        cand = xp.asarray(self.cand)[flat]  # (..., K)
        v0 = xp.asarray(self.v0)[cand]  # (..., K, gdim)
        Tinv = xp.asarray(self.Tinv)[cand]  # (..., K, tdim, tdim)
        rel = pts[..., None, :] - v0
        br = xp.einsum("...ij,...j->...i", Tinv, rel)  # (..., K, tdim)
        l0 = 1.0 - xp.sum(br, axis=-1, keepdims=True)
        bary = xp.concatenate([l0, br], axis=-1)  # (..., K, tdim+1)
        best = xp.argmax(xp.min(bary, axis=-1), axis=-1)  # (...)
        cell = xp.take_along_axis(cand, best[..., None], axis=-1)[..., 0]
        bary_best = xp.take_along_axis(
            bary, best[..., None, None], axis=-2
        )[..., 0, :]
        outside = xp.min(bary_best, axis=-1) < -self.CONTAIN_TOL
        if xp is np:
            if np.any(outside):
                bad = np.asarray(pts)[np.asarray(outside)]
                raise ValueError(
                    f"{bad.shape[0]} point(s) outside the mesh (first few: "
                    f"{bad[:3].tolist()})"
                )
        else:
            bary_best = xp.where(
                outside[..., None], xp.full_like(bary_best, xp.nan), bary_best
            )
        return cell, bary_best


def _locate_1d(mesh, x, xp):
    """Cell index + local coordinate xi for 1D points."""
    verts = xp.asarray(mesh.coordinates()[:, 0])
    nc = mesh.num_cells()
    x = xp.asarray(x)
    idx = xp.clip(xp.searchsorted(verts, x, side="right") - 1, 0, nc - 1)
    a = verts[idx]
    b = verts[idx + 1]
    xi = (x - a) / (b - a)
    return idx, xi


def _shape_1d_x(degree, xi, xp):
    if degree == 1:
        return xp.stack([1.0 - xi, xi], axis=-1)
    if degree == 2:
        return xp.stack(
            [(1.0 - xi) * (1.0 - 2.0 * xi), 4.0 * xi * (1.0 - xi), xi * (2.0 * xi - 1.0)],
            axis=-1,
        )
    if degree == 0:
        return xp.ones(xi.shape + (1,))
    raise NotImplementedError


def _dshape_1d_x(degree, xi, xp):
    if degree == 1:
        return xp.stack([-xp.ones_like(xi), xp.ones_like(xi)], axis=-1)
    if degree == 2:
        return xp.stack([4.0 * xi - 3.0, 4.0 - 8.0 * xi, 4.0 * xi - 1.0], axis=-1)
    if degree == 0:
        return xp.zeros(xi.shape + (1,))
    raise NotImplementedError


def _shape_tri_x(degree, bary, xp):
    l0, l1, l2 = bary[..., 0], bary[..., 1], bary[..., 2]
    if degree == 1:
        return xp.stack([l0, l1, l2], axis=-1)
    if degree == 2:
        return xp.stack(
            [
                l0 * (2 * l0 - 1),
                l1 * (2 * l1 - 1),
                l2 * (2 * l2 - 1),
                4 * l1 * l2,
                4 * l0 * l2,
                4 * l0 * l1,
            ],
            axis=-1,
        )
    if degree == 0:
        return xp.ones(l0.shape + (1,))
    raise NotImplementedError


def _locate_2d(mesh: RectangleMesh, pts, xp):
    """Cell index for points in a RectangleMesh (arithmetic, no search)."""
    (x0, x1), (y0, y1) = mesh.bounds
    nx, ny = mesh.nx, mesh.ny
    hx = (x1 - x0) / nx
    hy = (y1 - y0) / ny
    x = pts[..., 0]
    y = pts[..., 1]
    i = xp.clip(xp.floor((x - x0) / hx).astype(np.int32), 0, nx - 1)
    j = xp.clip(xp.floor((y - y0) / hy).astype(np.int32), 0, ny - 1)
    u = (x - (x0 + i * hx)) / hx
    v = (y - (y0 + j * hy)) / hy
    quad = j * nx + i
    if mesh.diagonal == "crossed":
        # 4 triangles per quad: bottom(0), right(1), top(2), left(3)
        below_main = v <= u
        below_anti = v <= 1.0 - u
        local = xp.where(
            below_main & below_anti,
            0,
            xp.where(below_main, 1, xp.where(~below_anti, 2, 3)),
        )
        cell = quad * 4 + local
    elif mesh.diagonal == "right":
        cell = quad * 2 + xp.where(v <= u, 0, 1)
    else:  # left
        cell = quad * 2 + xp.where(u + v <= 1.0, 0, 1)
    return cell


def _bary_in_cell(mesh, cell, pts, xp):
    coords = xp.asarray(mesh.coordinates())
    cells = xp.asarray(mesh.cells())
    tri = coords[cells[cell]]  # (..., 3, 2)
    v0, v1, v2 = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    d = (v1[..., 0] - v0[..., 0]) * (v2[..., 1] - v0[..., 1]) - (
        v2[..., 0] - v0[..., 0]
    ) * (v1[..., 1] - v0[..., 1])
    l1 = (
        (pts[..., 0] - v0[..., 0]) * (v2[..., 1] - v0[..., 1])
        - (v2[..., 0] - v0[..., 0]) * (pts[..., 1] - v0[..., 1])
    ) / d
    l2 = (
        (v1[..., 0] - v0[..., 0]) * (pts[..., 1] - v0[..., 1])
        - (pts[..., 0] - v0[..., 0]) * (v1[..., 1] - v0[..., 1])
    ) / d
    l0 = 1.0 - l1 - l2
    return xp.stack([l0, l1, l2], axis=-1)


def _dshape_tri_x(degree, bary, xp):
    """Triangle basis gradients wrt barycentric coords: (..., nl, 3)."""
    l0, l1, l2 = bary[..., 0], bary[..., 1], bary[..., 2]
    z = xp.zeros_like(l0)
    if degree == 1:
        o = xp.ones_like(l0)
        rows = [[o, z, z], [z, o, z], [z, z, o]]
    elif degree == 2:
        rows = [
            [4 * l0 - 1, z, z],
            [z, 4 * l1 - 1, z],
            [z, z, 4 * l2 - 1],
            [z, 4 * l2, 4 * l1],
            [4 * l2, z, 4 * l0],
            [4 * l1, 4 * l0, z],
        ]
    elif degree == 0:
        rows = [[z, z, z]]
    else:
        raise NotImplementedError
    return xp.stack([xp.stack(r, axis=-1) for r in rows], axis=-2)


# local edge pairs of the P2 tet (must match fem.space._TET_EDGES)
_TET_EDGE_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _shape_tet_x(degree, bary, xp):
    if degree == 1:
        return bary
    if degree == 2:
        ls = [bary[..., i] for i in range(4)]
        vals = [li * (2.0 * li - 1.0) for li in ls]
        vals += [4.0 * ls[a] * ls[b] for (a, b) in _TET_EDGE_PAIRS]
        return xp.stack(vals, axis=-1)
    if degree == 0:
        return xp.ones(bary.shape[:-1] + (1,))
    raise NotImplementedError


def _dshape_tet_x(degree, bary, xp):
    """Tet basis gradients wrt barycentric coords: (..., nl, 4)."""
    ls = [bary[..., i] for i in range(4)]
    z = xp.zeros_like(ls[0])
    if degree == 1:
        o = xp.ones_like(ls[0])
        rows = [[o if j == i else z for j in range(4)] for i in range(4)]
    elif degree == 2:
        rows = [
            [4 * ls[i] - 1 if j == i else z for j in range(4)]
            for i in range(4)
        ]
        for (a, b) in _TET_EDGE_PAIRS:
            r = [z, z, z, z]
            r[a] = 4 * ls[b]
            r[b] = 4 * ls[a]
            rows.append(r)
    elif degree == 0:
        rows = [[z, z, z, z]]
    else:
        raise NotImplementedError
    return xp.stack([xp.stack(r, axis=-1) for r in rows], axis=-2)


def _cell_jinv(mesh, cell, xp, tdim):
    """Per-point inverse Jacobian of the located cells: (..., tdim, tdim)
    with J columns the cell edge vectors v_i − v_0 (the affine map of
    the reference simplex)."""
    coords = xp.asarray(mesh.coordinates())
    cells = xp.asarray(mesh.cells())
    verts = coords[cells[cell]]                    # (..., nl_v, gdim)
    v0 = verts[..., 0, :]
    J = xp.stack(
        [verts[..., i + 1, :] - v0 for i in range(tdim)], axis=-1
    )  # (..., gdim, tdim)
    if tdim == 2:
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, d = J[..., 1, 0], J[..., 1, 1]
        det = a * d - b * c
        return xp.stack(
            [xp.stack([d, -b], axis=-1), xp.stack([-c, a], axis=-1)],
            axis=-2,
        ) / det[..., None, None]
    # 3×3 adjugate (jit-friendly, no linalg call)
    m = J
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c02 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c10 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c20 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    c21 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    det = (m[..., 0, 0] * c00 + m[..., 0, 1] * c10 + m[..., 0, 2] * c20)
    adj = xp.stack(
        [xp.stack([c00, c01, c02], axis=-1),
         xp.stack([c10, c11, c12], axis=-1),
         xp.stack([c20, c21, c22], axis=-1)],
        axis=-2,
    )
    return adj / det[..., None, None]


def _grad_basis_simplex(mesh, V, cell, bary, xp, tdim):
    """Global-coordinate basis gradients at located points:
    (..., nl, gdim) — barycentric gradients mapped through the cell's
    inverse Jacobian (d/dl_i wrt the reference coords l_1..l_tdim is
    dbary_i − dbary_0)."""
    if tdim == 2:
        dbary = _dshape_tri_x(V.degree, bary, xp)  # (..., nl, 3)
    else:
        dbary = _dshape_tet_x(V.degree, bary, xp)  # (..., nl, 4)
    dref = xp.stack(
        [dbary[..., i + 1] - dbary[..., 0] for i in range(tdim)], axis=-1
    )  # (..., nl, tdim)
    Jinv = _cell_jinv(mesh, cell, xp, tdim)        # (..., tdim, tdim)
    return xp.einsum("...lr,...rg->...lg", dref, Jinv)


def _locate_3d(mesh, pts, xp):
    """Cell index + barycentric coords for points in a BoxMesh (Kuhn split:
    the tet of permutation π contains local coords with u_{π0} ≥ u_{π1} ≥
    u_{π2})."""
    (x0, x1), (y0, y1), (z0, z1) = mesh.bounds
    nx, ny, nz = mesh.nx, mesh.ny, mesh.nz
    hx, hy, hz = (x1 - x0) / nx, (y1 - y0) / ny, (z1 - z0) / nz
    i = xp.clip(xp.floor((pts[..., 0] - x0) / hx).astype(np.int32), 0, nx - 1)
    j = xp.clip(xp.floor((pts[..., 1] - y0) / hy).astype(np.int32), 0, ny - 1)
    k = xp.clip(xp.floor((pts[..., 2] - z0) / hz).astype(np.int32), 0, nz - 1)
    u = (pts[..., 0] - (x0 + i * hx)) / hx
    v = (pts[..., 1] - (y0 + j * hy)) / hy
    w = (pts[..., 2] - (z0 + k * hz)) / hz
    hexid = (k * ny + j) * nx + i
    # the Kuhn tet containing (u,v,w) is given by the descending sort order
    # of the local coordinates; rank each axis (0 = largest, ties broken
    # toward the lower axis → a valid adjacent tet, bary stays continuous)
    a0 = (u < v).astype(np.int32) + (u < w).astype(np.int32)  # rank of u
    a1 = (v <= u).astype(np.int32) + (v < w).astype(np.int32)  # rank of v
    # perm index in BoxMesh._KUHN_PERMS order:
    # (0,1,2)->0 (0,2,1)->1 (1,0,2)->2 (1,2,0)->3 (2,0,1)->4 (2,1,0)->5
    first = xp.where(a0 == 0, 0, xp.where(a1 == 0, 1, 2))
    second = xp.where(a0 == 1, 0, xp.where(a1 == 1, 1, 2))
    local = xp.where(
        (first == 0) & (second == 1), 0,
        xp.where((first == 0) & (second == 2), 1,
        xp.where((first == 1) & (second == 0), 2,
        xp.where((first == 1) & (second == 2), 3,
        xp.where((first == 2) & (second == 0), 4, 5)))),
    )
    cell = hexid * 6 + local
    # barycentric coords along the Kuhn path: sort desc s0>=s1>=s2 then
    # l0 = 1-s0, l1 = s0-s1, l2 = s1-s2, l3 = s2
    s0 = xp.maximum(xp.maximum(u, v), w)
    s2 = xp.minimum(xp.minimum(u, v), w)
    s1 = u + v + w - s0 - s2
    bary = xp.stack([1.0 - s0, s0 - s1, s1 - s2, s2], axis=-1)
    return cell, bary


def eval_dofs_at_points(V, dofs, points, derivative: bool = False, xp=np):
    """Evaluate a FE function (dof vector `dofs` on space `V`) at `points`.

    points: (..., gdim) or (...,) for 1D. Returns (...,) for scalar spaces,
    (..., value_size) for vector spaces.  ``derivative=True`` evaluates
    the spatial derivative instead: d/dx in 1D (same output shapes),
    the GRADIENT in 2D/3D — (..., gdim) for scalar spaces,
    (..., value_size, gdim) for vector ones (matching the reference's
    ``evaluate(..., derivative=...)`` capability, reference
    model.py:1088-1412, which this extends to point evaluation).
    Pass ``xp=jax.numpy`` for a traced/jittable version.
    """
    dofs = xp.asarray(dofs)
    mesh = V.mesh()
    tdim = mesh.topology_dim()
    vs = max(V.value_size, 1)
    ed = xp.asarray(V.element_dofs)

    if tdim == 1:
        pts = xp.asarray(points)
        if pts.ndim and pts.shape[-1] == 1 and pts.ndim > 1:
            pts = pts[..., 0]
        cell, xi = _locate_1d(mesh, pts, xp)
        if derivative:
            verts = xp.asarray(mesh.coordinates()[:, 0])
            h = verts[cell + 1] - verts[cell]
            basis = _dshape_1d_x(V.degree, xi, xp) / h[..., None]
        else:
            basis = _shape_1d_x(V.degree, xi, xp)  # (..., nl)
    elif tdim == 2:
        pts = xp.asarray(points)
        if isinstance(mesh, RectangleMesh):
            cell = _locate_2d(mesh, pts, xp)
            bary = _bary_in_cell(mesh, cell, pts, xp)
        else:  # unstructured triangulation: bucketed locate
            cell, bary = mesh.locator().locate(pts, xp)
        basis = (_grad_basis_simplex(mesh, V, cell, bary, xp, 2)
                 if derivative else _shape_tri_x(V.degree, bary, xp))
    else:  # 3D: BoxMesh (arithmetic) or unstructured tets (bucketed)
        pts = xp.asarray(points)
        if hasattr(mesh, "nz"):  # BoxMesh
            cell, bary = _locate_3d(mesh, pts, xp)
        else:
            cell, bary = mesh.locator().locate(pts, xp)
        basis = (_grad_basis_simplex(mesh, V, cell, bary, xp, 3)
                 if derivative else _shape_tet_x(V.degree, bary, xp))

    local_sdofs = ed[cell]  # (..., nl) — or basis (..., nl, gdim) for grads
    grad_nd = derivative and tdim >= 2
    if vs == 1:
        if grad_nd:
            return xp.sum(dofs[local_sdofs][..., None] * basis, axis=-2)
        return xp.sum(dofs[local_sdofs] * basis, axis=-1)
    if grad_nd:
        comp_vals = [
            xp.sum(dofs[local_sdofs * vs + c][..., None] * basis, axis=-2)
            for c in range(vs)
        ]
        return xp.stack(comp_vals, axis=-2)  # (..., vs, gdim)
    comp_vals = [
        xp.sum(dofs[local_sdofs * vs + c] * basis, axis=-1) for c in range(vs)
    ]
    return xp.stack(comp_vals, axis=-1)


def check_in_range(V, points) -> None:
    """Raise ValueError if any point lies outside the mesh (host-side).

    Parity: scipy interp1d bounds error used by the reference container
    (model.py:636, test_pgdclass.py:319-326)."""
    mesh = V.mesh()
    pts = np.asarray(points, dtype=np.float64)
    if mesh.topology_dim() == 1:
        lo = float(mesh.coordinates()[:, 0].min())
        hi = float(mesh.coordinates()[:, 0].max())
        flat = pts.ravel()
        if np.any(flat < lo - 1e-12) or np.any(flat > hi + 1e-12):
            raise ValueError(
                f"point(s) outside mesh range [{lo}, {hi}]: "
                f"{flat[(flat < lo) | (flat > hi)]}"
            )
    else:
        gdim = mesh.geometry_dim()
        pflat = pts.reshape(-1, gdim)
        for ax, (lo, hi) in enumerate(mesh.bounds):
            if np.any(pflat[:, ax] < lo - 1e-12) or np.any(pflat[:, ax] > hi + 1e-12):
                raise ValueError(f"point(s) outside mesh bounds on axis {ax}")
