"""Shared test helpers: KKT-condition oracle for verifying QP solutions
independently of any other solver."""

import numpy as np


def kkt_check(Q, A, q, bmin, bmax, x, y, tol=1e-4):
    """Assert (x, y) satisfies the KKT conditions of
    min 0.5 x'Qx + q'x  s.t.  bmin <= Ax <= bmax  to tolerance `tol`."""
    Q = np.asarray(Q, float)
    A = np.asarray(A, float)
    Ax = A @ x
    scale_p = max(1.0, np.max(np.abs(Ax)) if Ax.size else 1.0)
    # primal feasibility
    assert np.all(Ax >= np.asarray(bmin) - tol * scale_p), "primal lb violated"
    assert np.all(Ax <= np.asarray(bmax) + tol * scale_p), "primal ub violated"
    # stationarity
    grad = Q @ x + np.asarray(q) + A.T @ y
    scale_d = max(
        1.0, np.max(np.abs(Q @ x)), np.max(np.abs(q)), np.max(np.abs(A.T @ y))
    )
    assert np.max(np.abs(grad)) <= tol * scale_d, (
        f"stationarity violated: {np.max(np.abs(grad))} > {tol * scale_d}"
    )
    # complementarity / dual signs
    for i in range(A.shape[0]):
        at_lb = Ax[i] <= bmin[i] + tol * scale_p
        at_ub = Ax[i] >= bmax[i] - tol * scale_p
        if not at_lb and not at_ub:
            assert abs(y[i]) <= tol * max(1.0, np.max(np.abs(y))), (
                f"nonzero multiplier {y[i]} on inactive constraint {i}"
            )
        elif at_ub and not at_lb:
            assert y[i] >= -tol * max(1.0, np.max(np.abs(y)))
        elif at_lb and not at_ub:
            assert y[i] <= tol * max(1.0, np.max(np.abs(y)))


def random_convex_qp(n, m, seed=0, density=1.0):
    """Seeded random strictly-convex QP with box constraints on Ax
    (protocol mirrors reference simulations/randomQP.m:22-47)."""
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    if density < 1.0:
        M *= rng.random((n, n)) < density
    Q = M @ M.T + 0.1 * np.eye(n)
    A = rng.standard_normal((m, n))
    if density < 1.0:
        A *= rng.random((m, n)) < density
    q = rng.standard_normal(n)
    u = rng.random(m) * 2.0
    return Q, A, q, -u, u
