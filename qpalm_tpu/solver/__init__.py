from .core import (
    init_state,
    solve_from_state,
    compute_residuals,
    compute_objective,
    compute_dual_objective,
)
from .linesearch import exact_linesearch
from .nonconvex import lobpcg_min_eig, min_eig_settings

__all__ = [
    "init_state",
    "solve_from_state",
    "compute_residuals",
    "compute_objective",
    "compute_dual_objective",
    "exact_linesearch",
    "lobpcg_min_eig",
    "min_eig_settings",
]
