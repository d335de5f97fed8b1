"""Function spaces: P1/P2 (CG) and DG0/DG1 on 1D/2D structured meshes,
plus P1 on 3D tetrahedral BoxMeshes.

Replaces dolfin.FunctionSpace / VectorFunctionSpace (used throughout the
reference, e.g. tests/integration/test_elastic.py:46,
test_solver_problem.py:72).  Design:

* dof layout is deterministic and coordinate-sorted in 1D (vertex i at dof
  2i for P2, midpoints interleaved), so FD matrices built on sorted
  coordinates need no argsort dance (cf. reference
  test_laplace.py:47-57 `get_coordinates_and_sorts`).
* per-cell tabulated basis values/gradients at quadrature points are cached
  as dense device arrays → assembly is one vmapped einsum + scatter-add,
  jit-friendly, no Python→C++ crossings per form like the reference
  (SURVEY.md §3.1 "hundreds of crossings per enrichment step").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pgdrome_tpu.config import default_dtype
from pgdrome_tpu.fem.mesh import Mesh, IntervalMesh


# ----------------------------- quadrature ---------------------------------

def gauss_legendre_01(n: int):
    """n-point Gauss-Legendre rule on [0, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w


# Symmetric triangle rules on the reference triangle (area 1/2), exact to the
# stated polynomial degree.  Points are barycentric triplets.
_TRI_RULES = {
    # degree 2: 3-point
    2: (
        np.array(
            [
                [2 / 3, 1 / 6, 1 / 6],
                [1 / 6, 2 / 3, 1 / 6],
                [1 / 6, 1 / 6, 2 / 3],
            ]
        ),
        np.array([1 / 6, 1 / 6, 1 / 6]),
    ),
    # degree 4: 6-point (Dunavant)
    4: (
        np.array(
            [
                [0.108103018168070, 0.445948490915965, 0.445948490915965],
                [0.445948490915965, 0.108103018168070, 0.445948490915965],
                [0.445948490915965, 0.445948490915965, 0.108103018168070],
                [0.816847572980459, 0.091576213509771, 0.091576213509771],
                [0.091576213509771, 0.816847572980459, 0.091576213509771],
                [0.091576213509771, 0.091576213509771, 0.816847572980459],
            ]
        ),
        0.5
        * np.array(
            [
                0.223381589678011,
                0.223381589678011,
                0.223381589678011,
                0.109951743655322,
                0.109951743655322,
                0.109951743655322,
            ]
        ),
    ),
}


# --------------------------- 1D shape functions ----------------------------

def _shape_1d(degree: int, xi: np.ndarray):
    """Values and d/dxi of 1D Lagrange basis at reference coords xi∈[0,1].

    Returns (vals, grads) with shape (ndof_local, nq).
    """
    xi = np.asarray(xi)
    if degree == 1:
        vals = np.stack([1.0 - xi, xi])
        grads = np.stack([-np.ones_like(xi), np.ones_like(xi)])
    elif degree == 2:
        # nodes at xi = 0, 0.5, 1
        vals = np.stack(
            [
                (1.0 - xi) * (1.0 - 2.0 * xi),
                4.0 * xi * (1.0 - xi),
                xi * (2.0 * xi - 1.0),
            ]
        )
        grads = np.stack([4.0 * xi - 3.0, 4.0 - 8.0 * xi, 4.0 * xi - 1.0])
    elif degree == 0:
        vals = np.ones((1,) + xi.shape)
        grads = np.zeros((1,) + xi.shape)
    else:
        raise NotImplementedError(f"1D degree {degree}")
    return vals, grads


# --------------------------- 2D shape functions ----------------------------

def _shape_tri(degree: int, bary: np.ndarray):
    """Values and barycentric gradients of triangle Lagrange basis.

    bary: (nq, 3) barycentric coords. Returns vals (nl, nq) and
    dvals_dbary (nl, nq, 3).
    """
    l0, l1, l2 = bary[:, 0], bary[:, 1], bary[:, 2]
    if degree == 1:
        vals = np.stack([l0, l1, l2])
        d = np.zeros((3, len(l0), 3))
        d[0, :, 0] = 1.0
        d[1, :, 1] = 1.0
        d[2, :, 2] = 1.0
    elif degree == 2:
        # dof order: 3 vertices then 3 edge midpoints (edge i opposite to
        # vertex i: edge0=(v1,v2), edge1=(v0,v2), edge2=(v0,v1))
        vals = np.stack(
            [
                l0 * (2 * l0 - 1),
                l1 * (2 * l1 - 1),
                l2 * (2 * l2 - 1),
                4 * l1 * l2,
                4 * l0 * l2,
                4 * l0 * l1,
            ]
        )
        d = np.zeros((6, len(l0), 3))
        d[0, :, 0] = 4 * l0 - 1
        d[1, :, 1] = 4 * l1 - 1
        d[2, :, 2] = 4 * l2 - 1
        d[3, :, 1] = 4 * l2
        d[3, :, 2] = 4 * l1
        d[4, :, 0] = 4 * l2
        d[4, :, 2] = 4 * l0
        d[5, :, 0] = 4 * l1
        d[5, :, 1] = 4 * l0
    elif degree == 0:
        vals = np.ones((1, len(l0)))
        d = np.zeros((1, len(l0), 3))
    else:
        raise NotImplementedError(f"triangle degree {degree}")
    return vals, d


# 4-point degree-2 rule on the reference tetrahedron (volume 1/6),
# barycentric quadruplets
_TET_RULE = (
    np.array(
        [
            [0.5854101966249685, 0.1381966011250105, 0.1381966011250105, 0.1381966011250105],
            [0.1381966011250105, 0.5854101966249685, 0.1381966011250105, 0.1381966011250105],
            [0.1381966011250105, 0.1381966011250105, 0.5854101966249685, 0.1381966011250105],
            [0.1381966011250105, 0.1381966011250105, 0.1381966011250105, 0.5854101966249685],
        ]
    ),
    np.full(4, 1.0 / 24.0),
)


def _keast14():
    """Keast 14-point degree-5 rule on the reference tet (volume 1/6):
    two vertex-type orbits + one edge-type orbit; weights sum to 1
    before the 1/6 volume factor.  Needed for P2 tet mass matrices
    (integrand degree 4); exactness through degree 5 is pinned by
    tests/unit/test_3d.py::test_tet_quadrature_degree5."""
    pts, wts = [], []
    for a, w in ((0.0673422422100983, 0.1126879257180162),
                 (0.7217942490673264, 0.0734930431163619)):
        b = (1.0 - a) / 3.0
        for i in range(4):
            p = [b, b, b, b]
            p[i] = a
            pts.append(p)
            wts.append(w)
    a, w = 0.4544962958743506, 0.0425460207770812
    b = 0.5 - a  # = 0.0455037041256494: (a, a, b, b) permutations
    for (i, j) in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
        p = [b, b, b, b]
        p[i] = p[j] = a
        pts.append(p)
        wts.append(w)
    return np.asarray(pts), np.asarray(wts) / 6.0


_TET_RULE_DEG5 = _keast14()

# local edges of the reference tet for P2 dofs (lexicographic pairs);
# the dofmap's edge enumeration and _shape_tet must agree
_TET_EDGES = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _shape_tet(degree: int, bary: np.ndarray):
    """P0/P1/P2 tetrahedral basis: values (nl, nq) and barycentric
    gradients (nl, nq, 4).  P2 dof order: 4 vertices then the 6 edges
    of ``_TET_EDGES``."""
    nq = bary.shape[0]
    if degree == 1:
        vals = bary.T.copy()
        d = np.zeros((4, nq, 4))
        for i in range(4):
            d[i, :, i] = 1.0
    elif degree == 2:
        vals = np.empty((10, nq))
        d = np.zeros((10, nq, 4))
        for i in range(4):
            li = bary[:, i]
            vals[i] = li * (2.0 * li - 1.0)
            d[i, :, i] = 4.0 * li - 1.0
        for e, (a, b) in enumerate(_TET_EDGES):
            la, lb = bary[:, a], bary[:, b]
            vals[4 + e] = 4.0 * la * lb
            d[4 + e, :, a] = 4.0 * lb
            d[4 + e, :, b] = 4.0 * la
    elif degree == 0:
        vals = np.ones((1, nq))
        d = np.zeros((1, nq, 4))
    else:
        raise NotImplementedError("3D supports P1/P2 (and DG0)")
    return vals, d


_CG_FAMILIES = {"P", "CG", "Lagrange"}
_DG_FAMILIES = {"DG", "Discontinuous Lagrange"}


class FunctionSpace:
    """Scalar Lagrange space on a 1D or 2D structured mesh.

    Parity: dolfin.FunctionSpace(mesh, family, degree).
    """

    def __init__(self, mesh: Mesh, family: str = "P", degree: int = 1):
        if family not in _CG_FAMILIES | _DG_FAMILIES:
            raise ValueError(f"unknown family '{family}'")
        self._mesh = mesh
        self.family = "DG" if family in _DG_FAMILIES else "P"
        self.degree = int(degree)
        self.num_sub_spaces = 0  # scalar
        self.value_size = 1
        self._build_dofmap()
        self._tabulate_quadrature()
        self._cache = {}

    # ------------------------------------------------------------------ dofs
    def _build_dofmap(self):
        mesh, deg = self._mesh, self.degree
        tdim = mesh.topology_dim()
        cells = mesh.cells()
        coords = mesh.coordinates()
        if self.family == "DG":
            nl = {
                1: deg + 1,
                2: (deg + 1) * (deg + 2) // 2,
                3: (deg + 1) * (deg + 2) * (deg + 3) // 6,
            }[tdim]
            if tdim == 3 and deg > 0:
                raise NotImplementedError("3D DG degree must be 0")
            ncells = mesh.num_cells()
            self.element_dofs = np.arange(ncells * nl, dtype=np.int32).reshape(
                ncells, nl
            )
            # dof coordinates: local nodes mapped per cell
            if tdim == 1:
                if deg == 0:
                    loc = np.array([[0.5]])
                elif deg == 1:
                    loc = np.array([[0.0], [1.0]])
                else:
                    loc = np.array([[0.0], [0.5], [1.0]])
                a = coords[cells[:, 0], 0]
                b = coords[cells[:, 1], 0]
                dof_x = a[:, None] + (b - a)[:, None] * loc[:, 0][None, :]
                self.dof_coords = dof_x.reshape(-1, 1)
            elif tdim == 3:  # DG0 only: centroid per tet
                bar = np.full((1, 4), 0.25)
                tet = coords[cells]  # (nc, 4, gdim)
                self.dof_coords = np.einsum("lk,ckg->clg", bar, tet).reshape(
                    -1, coords.shape[1]
                )
            else:
                if deg == 0:
                    bar = np.array([[1 / 3, 1 / 3, 1 / 3]])
                elif deg == 1:
                    bar = np.eye(3)
                else:
                    bar = np.concatenate(
                        [np.eye(3), np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]])]
                    )
                tri = coords[cells]  # (nc, 3, gdim)
                self.dof_coords = np.einsum("lk,ckg->clg", bar, tri).reshape(
                    -1, coords.shape[1]
                )
            self.ndofs = self.element_dofs.size
            return

        if tdim == 1:
            nv = mesh.num_vertices()
            if deg == 1:
                self.element_dofs = cells.astype(np.int32)
                self.dof_coords = coords.copy()
                self.ndofs = nv
            elif deg == 2:
                # vertex i -> dof 2i, midpoint of cell e -> dof 2e+1
                ncells = mesh.num_cells()
                ed = np.stack(
                    [2 * cells[:, 0], 2 * np.arange(ncells) + 1, 2 * cells[:, 1]],
                    axis=1,
                ).astype(np.int32)
                self.element_dofs = ed
                dof_x = np.zeros(2 * ncells + 1)
                dof_x[::2] = coords[:, 0]
                dof_x[1::2] = 0.5 * (coords[cells[:, 0], 0] + coords[cells[:, 1], 0])
                self.dof_coords = dof_x[:, None]
                self.ndofs = 2 * ncells + 1
            else:
                raise NotImplementedError("1D CG degree must be 1 or 2")
        elif tdim == 2:
            nv = mesh.num_vertices()
            if deg == 1:
                self.element_dofs = cells.astype(np.int32)
                self.dof_coords = coords.copy()
                self.ndofs = nv
            elif deg == 2:
                # edges: unique sorted vertex pairs; local edge i opposite
                # local vertex i
                e_all = np.concatenate(
                    [cells[:, [1, 2]], cells[:, [0, 2]], cells[:, [0, 1]]], axis=0
                )
                e_sorted = np.sort(e_all, axis=1)
                uniq, inv = np.unique(e_sorted, axis=0, return_inverse=True)
                nedges = len(uniq)
                ncells = mesh.num_cells()
                edge_dof = nv + inv.reshape(3, ncells).T  # (ncells, 3)
                self.element_dofs = np.concatenate(
                    [cells, edge_dof], axis=1
                ).astype(np.int32)
                mid = 0.5 * (coords[uniq[:, 0]] + coords[uniq[:, 1]])
                self.dof_coords = np.concatenate([coords, mid], axis=0)
                self.ndofs = nv + nedges
                # sorted vertex pair of edge e → dof nv + e; the
                # topological-boundary bc path on unstructured meshes
                # needs this mapping (fem.bc._on_boundary_mask)
                self.edge_vertices = uniq
            else:
                raise NotImplementedError("2D CG degree must be 1 or 2")
        elif tdim == 3:
            nv = mesh.num_vertices()
            if deg == 1:
                self.element_dofs = cells.astype(np.int32)
                self.dof_coords = coords.copy()
                self.ndofs = nv
            elif deg == 2:
                # tet edges: unique sorted vertex pairs over the local
                # edge list _TET_EDGES (same ordering as _shape_tet)
                e_all = np.concatenate(
                    [cells[:, list(e)] for e in _TET_EDGES], axis=0
                )
                e_sorted = np.sort(e_all, axis=1)
                uniq, inv = np.unique(e_sorted, axis=0, return_inverse=True)
                ncells = mesh.num_cells()
                edge_dof = nv + inv.reshape(6, ncells).T  # (ncells, 6)
                self.element_dofs = np.concatenate(
                    [cells, edge_dof], axis=1
                ).astype(np.int32)
                mid = 0.5 * (coords[uniq[:, 0]] + coords[uniq[:, 1]])
                self.dof_coords = np.concatenate([coords, mid], axis=0)
                self.ndofs = nv + len(uniq)
                self.edge_vertices = uniq
            else:
                raise NotImplementedError("3D CG degree must be 1 or 2")
        else:
            raise NotImplementedError("only 1D/2D/3D meshes")

    # ----------------------------------------------------------- quadrature
    def _tabulate_quadrature(self):
        """Cache per-cell quadrature: global points, weights×|J|, basis
        values and *global* basis gradients at quadrature points.

        Host numpy: assembly is setup-time work done once per space; the
        hot on-device path (pgdrome_tpu.separated) consumes the assembled
        operators as device arrays."""
        mesh, deg = self._mesh, self.degree
        tdim = mesh.topology_dim()
        coords = mesh.coordinates()
        cells = mesh.cells()
        if tdim == 1:
            nq = max(2 * deg + 1, 3)
            xi, w = gauss_legendre_01(nq)
            vals, dref = _shape_1d(deg, xi)  # (nl, nq)
            a = coords[cells[:, 0], 0]
            b = coords[cells[:, 1], 0]
            h = b - a  # (nc,)
            qpts = a[:, None] + np.outer(h, xi)  # (nc, nq)
            wJ = np.outer(h, w)  # (nc, nq)
            grads = dref[None, :, :] / h[:, None, None]  # (nc, nl, nq)
            self.q_points = qpts[..., None]  # (nc, nq, 1)
            self.q_weights = wJ
            self.q_basis = np.broadcast_to(vals, (len(cells),) + vals.shape)
            self.q_grads = grads[..., None]  # (nc, nl, nq, 1)
        elif tdim == 3:
            # P2 mass integrands are degree 4: the 4-point degree-2 rule
            # underintegrates them — switch to the Keast degree-5 rule
            bary, w = _TET_RULE if deg <= 1 else _TET_RULE_DEG5
            vals, dbary = _shape_tet(deg, bary)  # (nl,nq), (nl,nq,4)
            tet = coords[cells]  # (nc, 4, 3)
            v0 = tet[:, 0]
            J = np.stack(
                [tet[:, 1] - v0, tet[:, 2] - v0, tet[:, 3] - v0], axis=2
            )  # (nc,3,3), columns = edge vectors
            detJ = np.linalg.det(J)
            Jinv = np.linalg.inv(J)  # (nc,3,3)
            dref = np.stack(
                [dbary[:, :, i + 1] - dbary[:, :, 0] for i in range(3)], axis=2
            )  # (nl, nq, 3) wrt (l1,l2,l3)
            grads = np.einsum("lqr,crg->clqg", dref, Jinv)
            qpts = np.einsum("qk,ckg->cqg", bary, tet)
            wJ = np.abs(detJ)[:, None] * w[None, :]
            self.q_points = qpts
            self.q_weights = wJ
            self.q_basis = np.broadcast_to(vals, (len(cells),) + vals.shape)
            self.q_grads = grads
        else:
            rule_deg = 2 if deg <= 1 else 4
            bary, w = _TRI_RULES[rule_deg]
            vals, dbary = _shape_tri(deg, bary)  # (nl,nq), (nl,nq,3)
            tri = coords[cells]  # (nc, 3, 2)
            # affine map x = v0 + J @ (l1, l2) with J columns v1-v0, v2-v0
            v0 = tri[:, 0]
            J = np.stack([tri[:, 1] - v0, tri[:, 2] - v0], axis=2)  # (nc,2,2)
            detJ = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
            Jinv = (
                np.stack(
                    [
                        np.stack([J[:, 1, 1], -J[:, 0, 1]], axis=1),
                        np.stack([-J[:, 1, 0], J[:, 0, 0]], axis=1),
                    ],
                    axis=1,
                )
                / detJ[:, None, None]
            )  # (nc,2,2)
            # gradients wrt (l1,l2): d/dl1 = d/dbary1 - d/dbary0 etc.
            dref = np.stack(
                [dbary[:, :, 1] - dbary[:, :, 0], dbary[:, :, 2] - dbary[:, :, 0]],
                axis=2,
            )  # (nl, nq, 2)
            # global grads: (nc, nl, nq, 2) = dref (nl,nq,2) @ Jinv (nc,2,2)
            grads = np.einsum("lqr,crg->clqg", dref, Jinv)
            qpts = np.einsum("qk,ckg->cqg", bary, tri)  # (nc, nq, 2)
            wJ = np.abs(detJ)[:, None] * w[None, :]
            self.q_points = qpts
            self.q_weights = wJ
            self.q_basis = np.broadcast_to(vals, (len(cells),) + vals.shape)
            self.q_grads = grads

    # ------------------------------------------------- device-array views
    @property
    def element_dofs_j(self):
        if "_edj" not in self._cache:
            self._cache["_edj"] = jnp.asarray(self.element_dofs)
        return self._cache["_edj"]

    @property
    def dof_coords_j(self):
        if "_dcj" not in self._cache:
            self._cache["_dcj"] = jnp.asarray(self.dof_coords, dtype=default_dtype())
        return self._cache["_dcj"]

    # -------------------------------------------------------------- queries
    def mesh(self) -> Mesh:
        return self._mesh

    def dim(self) -> int:
        return self.ndofs * max(self.value_size, 1)

    def tabulate_dof_coordinates(self) -> np.ndarray:
        """Dof coordinates, one row per (scalar) dof.

        Parity: dolfin V.tabulate_dof_coordinates() (reference
        test_laplace.py:54)."""
        return self.dof_coords

    def scalar_space(self) -> "FunctionSpace":
        return self

    def ufl_element(self):
        return _ElementShim(self)

    def ufl_function_space(self):
        return self

    def __repr__(self):
        kind = "Vector" if self.value_size > 1 else ""
        return (
            f"{kind}FunctionSpace({self.family}{self.degree}, "
            f"ndofs={self.dim()}, tdim={self._mesh.topology_dim()})"
        )


class _ElementShim:
    def __init__(self, V):
        self._V = V

    def degree(self):
        return self._V.degree

    def family(self):
        return self._V.family

    def __str__(self):
        if self._V.value_size > 1:
            return f"<vector element {self._V.family}{self._V.degree}>"
        return f"<element {self._V.family}{self._V.degree}>"


class VectorFunctionSpace(FunctionSpace):
    """Vector-valued Lagrange space; dofs interleaved (node-major):
    dof(scalar_dof s, component c) = s * value_size + c.

    Parity: dolfin.VectorFunctionSpace (reference
    test_solver_problem.py:72)."""

    def __init__(self, mesh: Mesh, family: str = "P", degree: int = 1, dim: int | None = None):
        super().__init__(mesh, family, degree)
        vs = dim if dim is not None else mesh.geometry_dim()
        self.value_size = int(vs)
        self.num_sub_spaces = self.value_size

    def component_dofs(self, c: int) -> np.ndarray:
        return np.arange(self.ndofs) * self.value_size + c
