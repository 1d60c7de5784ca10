"""Preconditioned conjugate gradients for the semismooth-Newton system.

The large-sparse analogue of the reference's LDL' solve
(reference: newton.c:22-113): instead of factorizing
M = Q + (1/gamma) I + A' diag(sigma*active) A, solve M d = -dphi with
Jacobi-preconditioned CG using only matvecs — O(nnz) per iteration, no
fill, no n x n memory.  The preconditioner is diag(M), exactly computable
from the sparse structures (linalg/sparse.py).

Matrix-free with fixed shapes: jits, and the while_loop tolerance ties to
the solver's inner tolerance ladder so early outer iterations use loose
Newton solves (inexact-Newton semantics; the reference's iterative
refinement loop plays the same role in reverse, newton.c:57-90).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def pcg(
    matvec: Callable,
    b: jnp.ndarray,
    diag_precond: jnp.ndarray,
    tol: jnp.ndarray,
    max_iter: int = 250,
    x0=None,
):
    """Solve M x = b, M SPD, to ||r||_2 <= tol * max(||b||_2, tiny).

    `diag_precond` is either the diagonal of M (Jacobi) or a callable
    z = precond(r) applying a general SPD preconditioner (e.g. the
    block-Jacobi factors from linalg.sparse.block_jacobi_apply).

    Returns (x, final residual norm, iterations).
    """
    dtype = b.dtype
    if callable(diag_precond):
        apply_p = diag_precond
    else:
        Minv = 1.0 / jnp.maximum(diag_precond, 1e-30)
        apply_p = lambda r: Minv * r
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x) if x0 is not None else b
    z = apply_p(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.sqrt(jnp.vdot(b, b))
    thresh = tol * jnp.maximum(bnorm, jnp.asarray(1e-30, dtype))

    def cond(carry):
        x, r, z, p, rz, k = carry
        return (jnp.sqrt(jnp.vdot(r, r)) > thresh) & (k < max_iter)

    def body(carry):
        x, r, z, p, rz, k = carry
        Mp = matvec(p)
        alpha = rz / jnp.vdot(p, Mp)
        x = x + alpha * p
        r = r - alpha * Mp
        z = apply_p(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return x, r, z, p, rz_new, k + 1

    k0 = jnp.zeros((), jnp.int32)
    x, r, _, _, _, k = jax.lax.while_loop(cond, body, (x, r, z, p, rz, k0))
    return x, jnp.sqrt(jnp.vdot(r, r)), k
