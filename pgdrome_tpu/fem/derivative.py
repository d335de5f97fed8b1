"""Exact derivatives of FE functions onto DG spaces.

Parity: the reference projects ``f.dx(0)`` onto a DG space of degree−1
(model.py:1088-1206, create_derivation_fct).  For piecewise polynomials that
projection is exact interpolation, so we build the DG function directly —
no solve needed.
"""

from __future__ import annotations

import numpy as np

from pgdrome_tpu.fem.space import FunctionSpace, _shape_1d
from pgdrome_tpu.fem.function import Function


def derivative_function(f: Function) -> Function:
    """d/dx of a 1D CG function as a DG(degree−1) Function."""
    V = f.function_space()
    mesh = V.mesh()
    if mesh.topology_dim() != 1:
        raise NotImplementedError(
            "derivative_function: only 1D implemented (the reference's "
            "vector->tensor derivative is marked NOT YET TESTED, model.py:1163)"
        )
    if V.value_size > 1:
        raise NotImplementedError("1D vector derivative not needed")
    deg = V.degree
    Vd = FunctionSpace(mesh, "DG", deg - 1)
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
