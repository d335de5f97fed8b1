"""Native FEM layer: meshes, function spaces, assembly, boundary conditions.

Replaces the DOLFIN C++ core the reference delegates to
(SURVEY.md §2.3): structured 1D/2D meshes, P1/P2 scalar and vector function
spaces, quadrature-based operator assembly as dense/batched JAX arrays, and
vmapped point evaluation.  Everything is shape-static and jit-friendly.
"""

from pgdrome_tpu.fem.mesh import (
    BoxMesh,
    IntervalMesh,
    Point,
    RectangleMesh,
    SimplicialMesh,
)
from pgdrome_tpu.fem.space import FunctionSpace, VectorFunctionSpace
from pgdrome_tpu.fem.function import Function, Expression, Constant, interpolate
from pgdrome_tpu.fem.bc import DirichletBC

__all__ = [
    "BoxMesh",
    "IntervalMesh",
    "RectangleMesh",
    "SimplicialMesh",
    "Point",
    "FunctionSpace",
    "VectorFunctionSpace",
    "Function",
    "Expression",
    "Constant",
    "interpolate",
    "DirichletBC",
]
