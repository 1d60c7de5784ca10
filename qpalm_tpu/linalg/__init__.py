from .dense import (
    norm_inf,
    norm_two,
    vec_mid,
    gershgorin_max,
    cholesky_shifted,
    cho_solve,
    newton_solve_schur,
    newton_solve_kkt,
)

__all__ = [
    "norm_inf",
    "norm_two",
    "vec_mid",
    "gershgorin_max",
    "cholesky_shifted",
    "cho_solve",
    "newton_solve_schur",
    "newton_solve_kkt",
]
