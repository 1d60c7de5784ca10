"""Nonconvex QPs: LOBPCG gamma pinning + stationarity
(reference: tests/src/test_nonconvex_qp.c — run with scaling off "so we can
retrieve the actual eigenvalue")."""

import numpy as np
import pytest

import qpalm_tpu
from qpalm_tpu import QPALM, Settings, solve
from qpalm_tpu.solver.nonconvex import lobpcg_min_eig


def _indefinite_box_qp(n=8, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    Q = 0.5 * (Q + Q.T) - 1.0 * np.eye(n)
    return Q, np.eye(n), rng.standard_normal(n), -np.ones(n), np.ones(n)


def test_gamma_pinned_to_min_eigenvalue():
    """With scaling off, gamma must be pinned to 1/|lambda_min(Q)|
    (reference: nonconvex.c:171-183, test protocol test_nonconvex_qp.c:19-22)."""
    Q, A, q, bmin, bmax = _indefinite_box_qp(seed=3)
    lam_true = np.linalg.eigvalsh(Q)[0]
    assert lam_true < 0
    s = Settings(nonconvex=True, scaling=0, eps_abs=1e-6, eps_rel=1e-6,
                 verbose=False)
    solver = QPALM(Q, A, q, bmin, bmax, settings=s)
    # the pin is a traced override; LOBPCG's estimate is a safe lower bound
    pin = solver._gamma_override
    assert pin is not None
    lam_est = -1.0 / pin
    assert lam_est <= lam_true + 1e-9  # safe (under-)estimate
    assert abs(lam_est - lam_true) < 0.05 * abs(lam_true) + 1e-3
    res = solver.solve()
    assert res.info.status == "solved"
    assert float(res.state.gamma) == pytest.approx(pin, rel=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nonconvex_stationary_point(seed):
    Q, A, q, bmin, bmax = _indefinite_box_qp(seed=seed)
    res = solve(Q, A, q, bmin, bmax,
                settings=Settings(nonconvex=True, eps_abs=1e-6, eps_rel=1e-6,
                                  verbose=False))
    assert res.info.status == "solved"
    x = res.solution.x
    g = Q @ x + q
    for j in range(len(x)):
        if bmin[j] + 1e-5 < x[j] < bmax[j] - 1e-5:
            assert abs(g[j]) < 1e-4
        elif x[j] >= bmax[j] - 1e-5:
            assert g[j] <= 1e-4
        else:
            assert g[j] >= -1e-4


def test_nonconvex_1d_exact():
    """1-D concave objective on a box: the solution is a box corner with
    lower objective."""
    Q = np.array([[-2.0]])
    q = np.array([0.5])
    res = solve(Q, np.eye(1), q, np.array([-1.0]), np.array([1.0]),
                settings=Settings(nonconvex=True, eps_abs=1e-6, eps_rel=1e-6,
                                  scaling=0, verbose=False))
    assert res.info.status == "solved"
    # f(x) = -x^2 + 0.5x: f(-1) = -1.5, f(1) = -0.5 -> global min at -1
    assert res.solution.x[0] == pytest.approx(-1.0, abs=1e-6)


def test_convex_detected_despite_flag():
    """nonconvex=True on a PD Hessian: LOBPCG finds lambda_min > 0 and the
    solver proceeds convex (reference: nonconvex.c:180-182)."""
    rng = np.random.default_rng(5)
    M = rng.standard_normal((6, 6))
    Q = M @ M.T + 0.5 * np.eye(6)
    solver = QPALM(Q, np.eye(6), rng.standard_normal(6),
                   -np.ones(6), np.ones(6),
                   settings=Settings(nonconvex=True, scaling=0,
                                     eps_abs=1e-6, eps_rel=1e-6, verbose=False))
    assert solver._gamma_override is None
    assert solver.settings.nonconvex is False
    assert solver.solve().info.status == "solved"


def test_lobpcg_matches_eigh():
    rng = np.random.default_rng(7)
    Q = rng.standard_normal((30, 30))
    Q = 0.5 * (Q + Q.T)
    v0 = rng.random(30)
    v0 /= np.linalg.norm(v0)
    import jax.numpy as jnp

    lam = float(lobpcg_min_eig(jnp.asarray(Q), jnp.asarray(v0)))
    lam_true = np.linalg.eigvalsh(Q)[0]
    assert lam <= lam_true + 1e-9
    assert abs(lam - lam_true) < 0.02 * abs(lam_true) + 1e-4
