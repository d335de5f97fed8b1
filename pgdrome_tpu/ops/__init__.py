"""Numerical kernels: FD operators, linear solvers, Pallas TPU kernels."""

from pgdrome_tpu.ops.fd import FD_matrices, apply_matrix_bc, apply_vector_bc
from pgdrome_tpu.ops.solvers import solve_dense, newton_solve

__all__ = [
    "FD_matrices",
    "apply_matrix_bc",
    "apply_vector_bc",
    "solve_dense",
    "newton_solve",
]
