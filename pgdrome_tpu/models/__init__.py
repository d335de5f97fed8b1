"""Model-problem families (the BASELINE.json configs).

Canonical builders live in :mod:`pgdrome_tpu.models.problems`; this package gives
them their model-zoo home:

- :func:`poisson_xy` — 2D Poisson separated as x⊗y
- :func:`transient_heat_2d` — 2D space ⊗ FD-upwind time
- :func:`parametric_elliptic` — elliptic vademecum, space × N parameters
  (the north-star benchmark config)
- :func:`elastic_truss` — 1D truss u(x, load, E)
- :func:`moving_heat_source` — welding/AM surrogate,
  space ⊗ time ⊗ power ⊗ velocity (greedy CP-separated source)
"""

from pgdrome_tpu.models.problems import (
    poisson_xy,
    transient_heat_2d,
    parametric_elliptic,
    elastic_truss,
    moving_heat_source,
    pgd_problem_from_separated,
)

__all__ = [
    "poisson_xy",
    "transient_heat_2d",
    "parametric_elliptic",
    "elastic_truss",
    "moving_heat_source",
    "pgd_problem_from_separated",
]
