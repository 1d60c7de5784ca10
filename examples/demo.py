"""Basic demo: setup -> solve -> warm start -> parametric update re-solve.

Port of the reference demos (examples/qpalm_demo.c and
interfaces/python/qpalm_python_demo.py) onto the qpalm_tpu API.
Run: python examples/demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # single f64 solves: CPU is fastest

import numpy as np

from qpalm_tpu import QPALM, Settings

# the reference python demo problem (qpalm_python_demo.py:11-24)
Q = np.array([[1.0, -1.0, 0.0], [-1.0, 2.0, 0.0], [0.0, 0.0, 0.0]])
q = np.array([-2.0, -6.0, 1.0])
A = np.array([
    [1.0, 1.0, 1.0],
    [1.0, 0.0, 0.0],
    [0.0, 1.0, 0.0],
    [0.0, 0.0, 1.0],
])
bmin = np.array([0.5, -10.0, -10.0, -10.0])
bmax = np.array([0.5, 10.0, 10.0, 10.0])

settings = Settings(eps_abs=1e-10, eps_rel=1e-10, verbose=True)
solver = QPALM(Q, A, q, bmin, bmax, settings=settings)
res = solver.solve()
print("x =", res.solution.x)
assert np.allclose(res.solution.x, [5.5, 5.0, -10.0], atol=1e-5)

# warm start with the solution: expect an immediate exit
solver.warm_start(res.solution.x, res.solution.y)
res2 = solver.solve()
print("warm-started resolve iterations:", int(res2.info.iter))

# parametric updates (reference demo lines 45-60)
solver.update_bounds(bmin - 1.0, bmax + 1.0)
solver.update_q(np.array([0.0, -3.0, 2.0]))
res3 = solver.solve()
print("after updates:", res3.info.status, "objective:", float(res3.info.objective))
