"""Frozen configuration dataclass for the PGD solvers.

The reference configures solves through constructor kwargs plus
post-construction attribute mutation (`pgd_prob.stop_fp = 'norm'` etc. —
the documented idiom, SURVEY.md §5 "Config / flag system").  Both styles
keep working; :class:`PGDConfig` is the structured alternative the survey
recommends — identical names and defaults to pgdrome/solver.py:96-134.
"""

from __future__ import annotations

from dataclasses import dataclass, asdict, replace


@dataclass(frozen=True)
class PGDConfig:
    # enrichment
    PGD_nmax: int = 20          # max enrichment steps (solver.py:96)
    PGD_tol: float = 1e-10      # relative-amplitude stop (solver.py:97)
    # fixed point
    max_fp_it: int = 50         # solver.py:114
    tol_fp_it: float = 1e-5     # solver.py:115
    tol_abs: float = 1e-6       # solver.py:116
    stop_fp: str = "norm"       # 'norm' | 'delta' (solver.py:119)
    fp_init: str = ""           # '' (ones) | 'randomized' (solver.py:120)
    norm_modes: str = "stiff"   # 'no' | 'l2' | 'stiff' (solver.py:121)
    # fast-path extras (TPU)
    solver: str = "lu"          # 'lu' | 'cg' (per-dim dense solves)
    cg_iters: int = 30
    residual_check: bool = True

    def apply(self, problem) -> None:
        """Apply to a PGDProblem (mirrors the attribute-mutation idiom)."""
        problem.PGD_nmax = self.PGD_nmax
        problem.PGD_tol = self.PGD_tol
        problem.max_fp_it = self.max_fp_it
        problem.tol_fp_it = self.tol_fp_it
        problem.tol_abs = self.tol_abs
        problem.stop_fp = self.stop_fp
        problem.fp_init = self.fp_init
        problem.norm_modes = self.norm_modes

    def separated_kwargs(self) -> dict:
        """Kwargs for SeparatedPGD(...)."""
        return dict(
            n_max=self.PGD_nmax,
            tol=self.PGD_tol,
            tol_fp=self.tol_fp_it,
            max_fp_it=self.max_fp_it,
            solver=self.solver,
            cg_iters=self.cg_iters,
            residual_check=self.residual_check,
        )

    def with_(self, **kw) -> "PGDConfig":
        return replace(self, **kw)

    def to_dict(self) -> dict:
        return asdict(self)
