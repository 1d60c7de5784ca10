"""Ruiz equilibration of the problem data (reference: src/scaling.c:34-113).

Pure function on dense arrays; the fixed `scaling` iteration count unrolls at
trace time so the whole thing fuses into a handful of XLA ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import MIN_SCALING
from .linalg.dense import norm_inf
from .types import QPData, ScalingInfo


def _limit_scaling(v: jnp.ndarray) -> jnp.ndarray:
    """Clamp tiny norms to 1 (reference: scaling.c:26-32)."""
    return jnp.where(v < MIN_SCALING, jnp.ones_like(v), v)


def identity_scaling(n: int, m: int, dtype) -> ScalingInfo:
    one = jnp.ones((), dtype)
    return ScalingInfo(
        D=jnp.ones((n,), dtype),
        Dinv=jnp.ones((n,), dtype),
        E=jnp.ones((m,), dtype),
        Einv=jnp.ones((m,), dtype),
        c=one,
        cinv=one,
    )


def scale_data(data: QPData, iters: int, Qx=None):
    """Scale the problem (reference: src/scaling.c:34-113).

    Returns (scaled QPData, ScalingInfo).  `Qx` is the current Q@x workspace
    vector (zeros at setup) used in the cost-scaling norm, matching the
    reference flow at scaling.c:84-89.  Handles dense arrays and BCOO
    sparse matrices (the large-problem path) with identical semantics.
    """
    from .linalg.sparse import (
        col_inf_norms,
        is_sparse,
        row_inf_norms,
        scale_rows_cols,
        scale_scalar,
    )

    Q, A, q, bmin, bmax = data.Q, data.A, data.q, data.bmin, data.bmax
    n, m = data.n, data.m
    sparse = is_sparse(A)
    dtype = Q.dtype if not sparse else Q.data.dtype
    if Qx is None:
        Qx = jnp.zeros((n,), dtype)

    D = jnp.ones((n,), dtype)
    E = jnp.ones((m,), dtype)
    for _ in range(iters):
        if sparse:
            col_norms = col_inf_norms(A)
            row_norms = row_inf_norms(A)
        else:
            col_norms = jnp.max(jnp.abs(A), axis=0)
            row_norms = jnp.max(jnp.abs(A), axis=1)
        Dt = 1.0 / jnp.sqrt(_limit_scaling(col_norms))
        Et = 1.0 / jnp.sqrt(_limit_scaling(row_norms))
        if sparse:
            A = scale_rows_cols(A, Et, Dt)
        else:
            A = Et[:, None] * A * Dt[None, :]
        D = D * Dt
        E = E * Et

    q = D * q
    Qx = D * Qx
    c = 1.0 / jnp.maximum(1.0, norm_inf(Qx + q))
    q = c * q
    if sparse:
        Q = scale_scalar(scale_rows_cols(Q, D, D), c)
    else:
        Q = c * (D[:, None] * Q * D[None, :])
    bmin = E * bmin
    bmax = E * bmax

    scal = ScalingInfo(D=D, Dinv=1.0 / D, E=E, Einv=1.0 / E, c=c, cinv=1.0 / c)
    return QPData(Q=Q, A=A, q=q, bmin=bmin, bmax=bmax, c=data.c), scal
