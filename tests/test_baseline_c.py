"""Differential test: the native C/LAPACK baseline solver vs the JAX solver.

The baseline (native/qpalm_baseline.cpp) is bench.py's stand-in for the
reference C solver, so its solutions must agree with the JAX implementation
and satisfy the KKT conditions independently.
"""

import numpy as np
import pytest

from qpalm_tpu import QPALM, Settings, baseline_c

from helpers import kkt_check, random_convex_qp

pytestmark = pytest.mark.skipif(
    baseline_c.load_library() is None,
    reason="native baseline library unavailable",
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_baseline_matches_jax_solver(seed):
    Q, A, q, bl, bu = random_convex_qp(24, 36, seed=seed, density=0.5)
    r = baseline_c.solve(Q, A, q, bl, bu, eps_abs=1e-6, eps_rel=1e-6,
                         scaling=2, delta=10.0)
    assert r["status"] == 1
    kkt_check(Q, A, q, bl, bu, r["x"], r["y"], tol=1e-4)

    s = Settings(eps_abs=1e-9, eps_rel=1e-9, verbose=False)
    ref = QPALM(Q=Q, A=A, q=q, bmin=bl, bmax=bu, settings=s).solve()
    assert np.max(np.abs(r["x"] - np.asarray(ref.solution.x))) < 1e-5
    assert abs(r["objective"] - ref.info.objective) < 1e-6


def test_baseline_unscaled_and_default_delta():
    Q, A, q, bl, bu = random_convex_qp(16, 24, seed=9)
    r = baseline_c.solve(Q, A, q, bl, bu, eps_abs=1e-8, eps_rel=1e-8,
                         scaling=0, delta=100.0)
    assert r["status"] == 1
    kkt_check(Q, A, q, bl, bu, r["x"], r["y"], tol=1e-6)


def test_baseline_max_iter_status():
    Q, A, q, bl, bu = random_convex_qp(16, 24, seed=10)
    r = baseline_c.solve(Q, A, q, bl, bu, eps_abs=1e-12, eps_rel=0.0,
                         max_iter=3)
    assert r["status"] == -2
    assert r["iter"] == 3
