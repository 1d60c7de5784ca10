"""Large sparse QP demo: the matrix-free CG path (no n x n memory).

Solves a banded n=5000 QP with random sparse coupling constraints to the
reference tolerance 1e-6 — a problem size the dense path cannot densify.
Run: python examples/sparse_demo.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp

from qpalm_tpu import QPALM, Settings

rng = np.random.default_rng(0)
n, m = 5000, 7000
Q = sp.diags(
    [2.0 * np.ones(n), -0.5 * np.ones(n - 1), -0.5 * np.ones(n - 1)],
    [0, 1, -1],
).tocsc()
A = sp.random(m, n, density=5e-4, random_state=1,
              data_rvs=rng.standard_normal).tocsc()
q = rng.standard_normal(n)
u = 2 * rng.random(m) + 0.5

t0 = time.perf_counter()
solver = QPALM(Q, A, q, -u, u,
               settings=Settings(
                   eps_abs=1e-6, eps_rel=1e-6, verbose=False,
                   # delta=10 (vs the reference default 100): gentler
                   # penalty growth keeps the CG system conditioned —
                   # 123 iters instead of thousands on this problem
                   delta=10.0,
               ))
print(f"sparse path auto-selected: {solver.sparse} "
      f"(method {solver.settings.factorization_method} = CG)")
res = solver.solve()
print(f"status: {res.info.status}, iterations: {int(res.info.iter)}, "
      f"wall: {time.perf_counter()-t0:.1f}s")

x, y = res.solution.x, res.solution.y
g = Q @ x + q + A.T @ y
Ax = A @ x
print("stationarity:", float(np.abs(g).max()),
      " primal violation:", max(0.0, float((Ax - u).max()),
                                float((-u - Ax).max())))
