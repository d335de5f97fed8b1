"""pgdrome_tpu — a TPU-native Proper Generalized Decomposition (PGD) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of BAMresearch/PGDrome
(reference: /root/reference/pgdrome). A parametric PDE solution
``u(x, p1, ..., p_{d-1})`` is approximated as a sum of rank-1 separated modes

    u ≈ Σ_k F1_k(x) · F2_k(p1) · ... · Fd_k(p_{d-1})

with each factor living on its own small mesh.  The progressive enrichment +
alternating fixed-point solver lives in :mod:`pgdrome_tpu.solver`
(reference parity: pgdrome/solver.py), the solution container / evaluation /
I/O layer in :mod:`pgdrome_tpu.model` (reference parity: pgdrome/model.py),
and a fully jitted TPU fast path in :mod:`pgdrome_tpu.separated`.

Unlike the reference there is no FEniCS/DOLFIN dependency: per-dimension FEM
assembly, FD operators, linear solvers and point evaluation are implemented
natively in JAX (see :mod:`pgdrome_tpu.fem` and :mod:`pgdrome_tpu.ops`).
"""

from pgdrome_tpu import config as config
from pgdrome_tpu.fem.mesh import (
    IntervalMesh,
    RectangleMesh,
    BoxMesh,
    SimplicialMesh,
    Point,
)
from pgdrome_tpu.fem.space import FunctionSpace, VectorFunctionSpace
from pgdrome_tpu.fem.function import Function, Expression, Constant, interpolate
from pgdrome_tpu.fem.bc import DirichletBC
from pgdrome_tpu.fem import assembly
from pgdrome_tpu.fem.assembly import (
    mass_matrix,
    stiffness_matrix,
    advection_matrix,
    load_vector,
    gram,
    norm,
    assemble_vector,
)
from pgdrome_tpu.ops.fd import FD_matrices
from pgdrome_tpu.solver import PGDProblem
from pgdrome_tpu.model import PGD, PGDMesh, PGDAttribute, PGDErrorComputation
from pgdrome_tpu.separated import (
    SeparatedProblem,
    SeparatedPGD,
    PGDResult,
    precondition_dim0,
    precondition_dim,
    equilibrate,
    ne_dim_base,
    galerkin_update,
    normal_equations,
)
from pgdrome_tpu.anova import anova_init
from pgdrome_tpu.dual import (
    DualCorrector,
    adjoint_problem,
    adjoint_problem_nd,
    guaranteed_output_bound,
    point_functional,
    rhs_parametric_qoi,
)
from pgdrome_tpu.recipes import (
    adaptive_cascade,
    adaptive_minres,
    goal_oriented_frontier,
    highd_frontier,
    nonlinear_vademecum,
    residual_cascade,
    transient_goal_oriented,
    two_stage_elliptic,
    two_stage_minres,
)
from pgdrome_tpu.serving import TransientVademecum, Vademecum
from pgdrome_tpu.uq import (
    effective_sample_size,
    factor_stats,
    main_effect,
    output_covariance,
    sobol_from_stats,
    sobol_group,
    split_rhat,
)
from pgdrome_tpu.utils.pgd_config import PGDConfig

__version__ = "0.1.0"

__all__ = [
    "config",
    "IntervalMesh",
    "RectangleMesh",
    "Point",
    "FunctionSpace",
    "VectorFunctionSpace",
    "Function",
    "Expression",
    "Constant",
    "interpolate",
    "DirichletBC",
    "assembly",
    "mass_matrix",
    "stiffness_matrix",
    "advection_matrix",
    "load_vector",
    "gram",
    "norm",
    "assemble_vector",
    "FD_matrices",
    "PGDProblem",
    "PGD",
    "PGDMesh",
    "PGDAttribute",
    "PGDErrorComputation",
    "BoxMesh",
    "SimplicialMesh",
    "SeparatedProblem",
    "SeparatedPGD",
    "PGDResult",
    "precondition_dim0",
    "precondition_dim",
    "equilibrate",
    "ne_dim_base",
    "galerkin_update",
    "normal_equations",
    "TransientVademecum",
    "Vademecum",
    "factor_stats",
    "effective_sample_size",
    "main_effect",
    "output_covariance",
    "split_rhat",
    "sobol_from_stats",
    "sobol_group",
    "DualCorrector",
    "adjoint_problem",
    "adjoint_problem_nd",
    "anova_init",
    "guaranteed_output_bound",
    "point_functional",
    "rhs_parametric_qoi",
    "adaptive_cascade",
    "adaptive_minres",
    "goal_oriented_frontier",
    "highd_frontier",
    "nonlinear_vademecum",
    "residual_cascade",
    "transient_goal_oriented",
    "two_stage_elliptic",
    "two_stage_minres",
    "PGDConfig",
]
