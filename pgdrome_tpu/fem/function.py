"""FE functions, expressions, constants and interpolation.

Parity targets: dolfin.Function / Expression / Constant / interpolate as used
throughout the reference test suite (e.g. test_elastic.py:230-236).  A
``Function`` is a thin wrapper over a dof array — ``f.vector()[:]`` returns
the array (matching the reference's ubiquitous ``.vector()[:]`` idiom, e.g.
test_laplace.py:374) and ``f(x)`` does vectorized point evaluation.

Dof arrays in this orchestration layer are host numpy (mutable, zero
dispatch overhead for the many tiny per-dim operations); the jitted TPU
fast path (:mod:`pgdrome_tpu.separated`) works on padded device buffers
instead.
"""

from __future__ import annotations

import math
import numpy as np

from pgdrome_tpu.fem.space import FunctionSpace
from pgdrome_tpu.fem.interpolate import eval_dofs_at_points, check_in_range


class _VectorView:
    """Mutable view over a Function's dof array (dolfin Vector parity)."""

    def __init__(self, fn: "Function"):
        self._fn = fn

    def __getitem__(self, idx):
        return self._fn.array[idx]

    def __setitem__(self, idx, val):
        self._fn.array[idx] = val

    def __len__(self):
        return self._fn.array.shape[0]

    def get_local(self):
        return self._fn.array

    def set_local(self, values):
        self._fn.array[:] = np.asarray(values)

    def axpy(self, a, other: "_VectorView"):
        self._fn.array += a * other._fn.array

    def max(self):
        return float(np.max(self._fn.array))

    def min(self):
        return float(np.min(self._fn.array))

    def __array__(self, dtype=None):
        arr = self._fn.array
        return arr.astype(dtype) if dtype is not None else arr


class Function:
    """FE function: function space + dof array."""

    def __init__(self, V: FunctionSpace, array=None, name: str = "f"):
        self._V = V
        self.name = name
        if array is None:
            self.array = np.zeros(V.dim(), dtype=np.float64)
        else:
            self.array = np.array(array, dtype=np.float64).reshape(-1)
            if self.array.shape != (V.dim(),):
                raise ValueError(
                    f"dof array shape {self.array.shape} != ({V.dim()},)"
                )

    # --- dolfin-style API ---
    def function_space(self) -> FunctionSpace:
        return self._V

    def vector(self) -> _VectorView:
        return _VectorView(self)

    def copy(self, deepcopy: bool = True) -> "Function":
        return Function(self._V, self.array.copy(), name=self.name)

    def ufl_element(self):
        return self._V.ufl_element()

    def __call__(self, x):
        """Point evaluation. Scalar input for 1D, (2,) point for 2D, or
        batches thereof."""
        pts = _points_as_array(self._V, x)
        check_in_range(self._V, pts)
        vals = eval_dofs_at_points(self._V, self.array, pts)
        out = np.asarray(vals)
        if out.ndim == 0:
            return float(out)
        return out

    def compute_vertex_values(self):
        """Values at mesh vertices; vector fields component-major
        (dolfin parity: [u_x at all verts, u_y at all verts, ...])."""
        V = self._V
        mesh = V.mesh()
        nv = mesh.num_vertices()
        vs = max(V.value_size, 1)
        if V.family == "P":
            if mesh.topology_dim() == 1 and V.degree == 2:
                scalar_vertex_dofs = 2 * np.arange(nv)
            else:
                scalar_vertex_dofs = np.arange(nv)  # P1 & 2D P2: verts first
            if vs == 1:
                return self.array[scalar_vertex_dofs]
            comps = [self.array[scalar_vertex_dofs * vs + c] for c in range(vs)]
            return np.concatenate(comps)
        # DG: evaluate at vertices via point evaluation
        pts = mesh.coordinates()
        pts_in = pts[:, 0] if mesh.geometry_dim() == 1 else pts
        vals = np.asarray(eval_dofs_at_points(V, self.array, pts_in))
        if vs == 1:
            return vals
        return np.concatenate([vals[:, c] for c in range(vs)])

    def split(self):
        """Per-component scalar Functions (vector spaces)."""
        V = self._V
        vs = V.value_size
        if vs <= 1:
            raise ValueError("split() needs a vector function")
        scalar_V = FunctionSpace(V.mesh(), V.family, V.degree)
        return tuple(
            Function(scalar_V, self.array[np.arange(V.ndofs) * vs + c])
            for c in range(vs)
        )

    def __repr__(self):
        return f"Function({self._V!r}, name={self.name})"


def _points_as_array(V, x):
    if hasattr(x, "coords"):
        return np.asarray(x.coords, dtype=np.float64)
    return np.asarray(x, dtype=np.float64)


class Expression:
    """Coordinate expression: a python callable (or convenience string using
    ``x[0]``/``x[1]``) with named parameters.

    Parity: dolfin.Expression (reference test_elastic.py:230).  The `degree`
    kwarg is accepted and ignored (quadrature is chosen by the space).
    Convention: 1D-mesh expressions receive coordinates of arbitrary shape
    ``(...,)``; 2D points arrive as ``(..., 2)``."""

    def __init__(self, expr, degree: int = 1, element=None, **params):
        self.degree = degree
        self.params = dict(params)
        if isinstance(expr, (tuple, list)):
            self._components = [Expression(e, degree=degree, **params) for e in expr]
            self._fn = None
        elif callable(expr):
            self._components = None
            self._fn = expr
        elif isinstance(expr, str):
            self._components = None
            self._fn = _compile_expr(expr)
        else:  # constant value
            val = float(expr)
            self._components = None
            self._fn = lambda x: val * np.ones_like(_first_coord(x))

    @property
    def value_size(self):
        return len(self._components) if self._components else 1

    def __call__(self, x, **extra):
        p = {**self.params, **extra}
        if self._components:
            return np.stack([c(x) for c in self._components], axis=-1)
        x = np.asarray(x, dtype=np.float64)
        out = self._fn(x, **p) if _wants_params(self._fn) else self._fn(x)
        return np.asarray(out, dtype=np.float64)

    def assign(self, **params):
        self.params.update(params)

    def __setattr__(self, key, value):
        # allow `expr.p = 2.0` parameter updates (dolfin idiom)
        if key in ("degree", "params", "_components", "_fn"):
            object.__setattr__(self, key, value)
        elif "params" in self.__dict__ and key in self.params:
            self.params[key] = value
        else:
            object.__setattr__(self, key, value)


def _wants_params(fn):
    import inspect

    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return False
    return len(sig.parameters) > 1 or any(
        p.kind == p.VAR_KEYWORD for p in sig.parameters.values()
    )


def _first_coord(x):
    x = np.asarray(x)
    if x.ndim >= 2 and x.shape[-1] in (2, 3):
        return x[..., 0]
    return x


def _compile_expr(src: str):
    """Compile a tiny expression string over ``x[0]``/``x[1]`` (python
    syntax; numpy funcs available)."""

    def fn(x, **params):
        x = np.asarray(x, dtype=np.float64)
        if x.ndim >= 2 and x.shape[-1] in (2, 3) and "x[1]" in src:
            xv = [x[..., i] for i in range(x.shape[-1])]
        else:
            xv = [x]
        ns = {
            "x": xv,
            "np": np,
            "pi": math.pi,
            "sin": np.sin,
            "cos": np.cos,
            "exp": np.exp,
            "sqrt": np.sqrt,
            "pow": np.power,
            "abs": np.abs,
            "where": np.where,
        }
        ns.update(params)
        out = eval(src, {"__builtins__": {}}, ns)
        return np.broadcast_to(np.asarray(out, dtype=np.float64), xv[0].shape).copy()

    return fn


class Constant(Expression):
    """Constant scalar or vector (dolfin.Constant parity)."""

    def __init__(self, value):
        if isinstance(value, (tuple, list, np.ndarray)):
            vals = [float(v) for v in np.asarray(value).ravel()]
            super().__init__(
                tuple(
                    (lambda v: (lambda x: v * np.ones_like(_first_coord(x))))(v)
                    for v in vals
                )
            )
            self.values_list = vals
        else:
            v = float(value)
            super().__init__(lambda x: v * np.ones_like(_first_coord(x)))
            self.values_list = [v]

    def assign(self, value):
        Constant.__init__(self, float(value))

    def values(self):
        return np.asarray(self.values_list)

    def __float__(self):
        return float(self.values_list[0])


def interpolate(expr, V: FunctionSpace) -> Function:
    """Interpolate an Expression/callable/Function onto space V.

    Parity: dolfin.interpolate (reference solver.py:182)."""
    if isinstance(expr, Function):
        if expr.function_space() is V:
            return expr.copy()
        pts = V.tabulate_dof_coordinates()
        pts_in = pts[:, 0] if expr.function_space().mesh().geometry_dim() == 1 else pts
        vals = np.asarray(
            eval_dofs_at_points(expr.function_space(), expr.array, pts_in)
        )
        return Function(V, vals.reshape(-1))

    pts = V.tabulate_dof_coordinates()
    pts_in = pts[:, 0] if V.mesh().geometry_dim() == 1 else pts
    vals = np.asarray(expr(pts_in) if callable(expr) else expr, dtype=np.float64)
    vs = max(V.value_size, 1)
    if vs == 1:
        if vals.ndim == 0:
            vals = np.full(V.ndofs, float(vals))
        return Function(V, vals)
    if vals.ndim == 1:  # same value for all components
        vals = np.tile(vals[:, None], (1, vs))
    return Function(V, vals.reshape(-1))
