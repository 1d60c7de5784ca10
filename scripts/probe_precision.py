"""One-off hardware probe: does matmul precision explain the fused-vs-XLA
iteration drift seen in tpu_smoke.py?  Compares, on one B=128 n=16 batch:
  - XLA vmapped loop at default matmul precision (bf16 passes on TPU)
  - XLA vmapped loop under jax.default_matmul_precision('highest')
  - fused Pallas kernel
  - CPU f64 oracle iteration counts (solve_batch_jit on CPU, f64)
"""
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np

from helpers import random_convex_qp
from qpalm_tpu.batch import solve_batch_jit, stack_problems
from qpalm_tpu.solver.fused import solve_batch_fused
from qpalm_tpu.types import Settings

probs = [random_convex_qp(16, 24, seed=60 + i, density=0.5)
         for i in range(128)]
s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=100,
             scaling=2, max_refine=0, delta=10.0)

data = stack_problems(probs, np.float32)
B = data.q.shape[0]
zx = jnp.zeros_like(data.q)
zy = jnp.zeros_like(data.bmin)
g = jnp.full((B,), s.gamma_init, jnp.float32)


def run_xla():
    r = solve_batch_jit(data, zx, zy, g, s, False, False)
    jax.block_until_ready(r.x)
    return np.asarray(r.status), np.asarray(r.iterations), np.asarray(r.x)


st_d, it_d, x_d = run_xla()
with jax.default_matmul_precision("highest"):
    st_h, it_h, x_h = run_xla()

xf, yf, stf, itf, *_ = solve_batch_fused(data, s)
jax.block_until_ready(xf)
stf, itf = np.asarray(stf), np.asarray(itf)

print("xla default vs highest: status diff",
      int((st_d != st_h).sum()), "iter diff", int((it_d != it_h).sum()),
      "max |iter delta|", int(np.abs(it_d.astype(int) - it_h.astype(int)).max()))
print("fused vs xla-default : status diff",
      int((stf != st_d).sum()), "iter diff", int((itf != it_d).sum()))
print("fused vs xla-highest : status diff",
      int((stf != st_h).sum()), "iter diff", int((itf != it_h).sum()),
      "max |iter delta|", int(np.abs(itf.astype(int) - it_h.astype(int)).max()))
print("x maxdiff fused-vs-highest", float(np.abs(xf - x_h).max()))
print("mean iters: default %.1f highest %.1f fused %.1f"
      % (it_d.mean(), it_h.mean(), itf.mean()))
