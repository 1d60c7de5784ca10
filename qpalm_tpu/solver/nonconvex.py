"""Nonconvex handling: minimum-eigenvalue estimation and gamma pinning.

The reference (src/nonconvex.c) runs LOBPCG (block size 1) on Q, with
LAPACK dsyev/dsygv for the 2x2 / 3x3 compressed eigenproblems.  Here the
compressed solves are closed-form-sized `jnp.linalg.eigh` calls and the whole
iteration is a `lax.while_loop`, so it jits, vmaps and runs on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..constants import LOBPCG_MAX_ITER, LOBPCG_TOL
from ..linalg.dense import norm_inf, norm_two


def _eigh_gen_min(B: jnp.ndarray, Cm: jnp.ndarray):
    """Smallest eigenpair of the generalized problem B y = lambda C y
    (reference uses LAPACKE_dsygv, nonconvex.c:149-153).

    Solved via the Cholesky reduction C = L L', G = L^-1 B L^-T.
    """
    L = jnp.linalg.cholesky(Cm)
    G = solve_triangular(L, B, lower=True)
    G = solve_triangular(L, G.T, lower=True).T
    w, V = jnp.linalg.eigh(G)
    y = solve_triangular(L, V[:, 0], lower=True, trans=1)
    return w[0], y


def lobpcg_min_eig(Q: jnp.ndarray, x0: jnp.ndarray) -> jnp.ndarray:
    """Estimate the minimum eigenvalue of symmetric Q.

    Mirrors reference nonconvex.c:29-168: a 3-vector LOBPCG ([x, w, p]
    subspace) with the reference's exit adjustment lambda -= sqrt(2)*||w||_2
    + 1e-6 as a safe lower bound.  `x0` is the (already normalized) initial
    eigenvector guess.
    """
    dtype = Q.dtype
    n = Q.shape[-1]
    x = x0
    Ax = Q @ x
    lam = jnp.vdot(x, Ax)

    # first iteration: 2x2 standard eigenproblem (nonconvex.c:84-101)
    w = Ax - lam * x
    w = w - jnp.vdot(x, w) * x
    w = w / norm_two(w)
    Aw = Q @ w
    xAw = jnp.vdot(Aw, x)
    wAw = jnp.vdot(Aw, w)
    B2 = jnp.array([[0.0, 0.0], [0.0, 0.0]], dtype).at[0, 0].set(lam)
    B2 = B2.at[0, 1].set(xAw).at[1, 0].set(xAw).at[1, 1].set(wAw)
    w2, V2 = jnp.linalg.eigh(B2)
    lam = w2[0]
    y = V2[:, 0]

    p = y[1] * w
    Ap = y[1] * Aw
    x = y[0] * x + p
    Ax = y[0] * Ax + Ap

    def cond(carry):
        i, x, Ax, p, Ap, lam, converged = carry
        return (~converged) & (i < LOBPCG_MAX_ITER)

    def body(carry):
        i, x, Ax, p, Ap, lam, _ = carry
        w = Ax - lam * x
        converged = norm_inf(w) < LOBPCG_TOL

        def step(ops):
            x, Ax, p, Ap, lam, w = ops
            w = w - jnp.vdot(x, w) * x
            w = w / norm_two(w)
            Aw = Q @ w
            xAw = jnp.vdot(Ax, w)
            wAw = jnp.vdot(w, Aw)
            p_norm_inv = 1.0 / norm_two(p)
            p = p * p_norm_inv
            Ap = Ap * p_norm_inv
            xAp = jnp.vdot(Ax, p)
            wAp = jnp.vdot(Aw, p)
            pAp = jnp.vdot(Ap, p)
            xp = jnp.vdot(x, p)
            wp = jnp.vdot(w, p)
            B = jnp.array(
                [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]], dtype
            )
            B = B.at[0, 0].set(lam).at[0, 1].set(xAw).at[0, 2].set(xAp)
            B = B.at[1, 0].set(xAw).at[1, 1].set(wAw).at[1, 2].set(wAp)
            B = B.at[2, 0].set(xAp).at[2, 1].set(wAp).at[2, 2].set(pAp)
            Cm = jnp.eye(3, dtype=dtype)
            Cm = Cm.at[0, 2].set(xp).at[2, 0].set(xp)
            Cm = Cm.at[1, 2].set(wp).at[2, 1].set(wp)
            lam_new, y = _eigh_gen_min(B, Cm)
            p_new = y[2] * p + y[1] * w
            Ap_new = y[2] * Ap + y[1] * Aw
            x_new = x * y[0] + p_new
            Ax_new = Ax * y[0] + Ap_new
            return x_new, Ax_new, p_new, Ap_new, lam_new

        x, Ax, p, Ap, lam = jax.lax.cond(
            converged,
            lambda ops: ops[:5],
            step,
            (x, Ax, p, Ap, lam, w),
        )
        return i + 1, x, Ax, p, Ap, lam, converged

    i0 = jnp.zeros((), jnp.int32)
    _, x, Ax, p, Ap, lam, converged = jax.lax.while_loop(
        cond, body, (i0, x, Ax, p, Ap, lam, jnp.zeros((), bool))
    )

    # theoretical bound on exit (nonconvex.c:117-121)
    w = Ax - lam * x
    norm_w = norm_two(w)
    lam_out = lam - (jnp.sqrt(jnp.asarray(2.0, dtype)) * norm_w + 1e-6)
    if n <= 3:
        lam_out = lam_out - 1e-6
    # if the loop hit max_iter without convergence, still apply the bound
    return jnp.where(converged, lam_out, lam_out)


def batch_gamma_pins(data, settings):
    """Per-problem nonconvex gamma pins for a stacked batch
    (reference: nonconvex.c:171-183 applied per problem).

    Runs the vmapped LOBPCG on each problem's *scaled* Q (the reference
    pins gamma after scaling, qpalm.c:294-296) and returns
    ``(gamma_init (B,), gamma_max (B,))``: problems with lambda_min < 0
    get gamma_init = gamma_max = 1/|lambda_min| (every subproblem convex);
    genuinely convex members keep the settings defaults.  Host-side
    (uses a numpy RNG for the eigenvector seed); shared by the general
    vmapped path (`batch.solve_batch`) and the fused-kernel path
    (`fused.solve_batch_fused`) so both pin identically.
    """
    import numpy as np

    B, n_pad = data.q.shape
    dtype = data.q.dtype
    if settings.scaling:
        from ..scaling import scale_data

        sQ = jax.jit(
            jax.vmap(lambda d: scale_data(d, settings.scaling)[0].Q)
        )(data)
    else:
        sQ = data.Q
    rng = np.random.default_rng(0)
    v0 = rng.random((B, n_pad)).astype(dtype)
    v0 /= np.linalg.norm(v0, axis=1, keepdims=True)
    lams = np.asarray(jax.jit(jax.vmap(lobpcg_min_eig))(sQ, jnp.asarray(v0)))
    pins = np.where(lams < 0, 1.0 / np.abs(lams), settings.gamma_init)
    gamma_max = jnp.asarray(
        np.where(lams < 0, pins, settings.gamma_max).astype(dtype)
    )
    gamma_init = jnp.asarray(
        np.where(lams < 0, pins, settings.gamma_init).astype(dtype)
    )
    return gamma_init, gamma_max


def min_eig_settings(lam: float, settings):
    """Adjust settings for a nonconvex QP (reference: nonconvex.c:171-183).

    If lambda_min < 0 the proximal penalty is pinned to 1/|lambda_min| so
    every subproblem is convex; otherwise the problem is treated as convex.
    Host-side: returns a new Settings.
    """
    if lam < 0:
        return settings.replace(
            proximal=True,
            gamma_init=1.0 / abs(lam),
            gamma_max=1.0 / abs(lam),
        )
    return settings.replace(nonconvex=False)
