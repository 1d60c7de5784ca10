"""Hardware probe for the n_pad=256 streaming kernel.

History: with the 16 input_output_aliases this shape Mosaic-compiled but
silently corrupted state (83/128 NaN lanes) at every VMEM-limit/chunking
variant, while interpret mode was clean (round-3 bisects; the isolated
scratch/DMA probes in probe_mosaic_scratch.py all passed).  Round 4
bisected the trigger to the ALIASES themselves: the alias-free program
(fused_chunk auto-selects it past ALIAS_WALL=224) runs clean at
232/256/288/320/352 with per-lane f64 KKT checks, and n_pad=384 fails
loudly at Mosaic compile.  This probe now validates the fix: it runs the
(auto-no-alias) kernel at n_pad=256 and checks parity vs the XLA loop."""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np

from helpers import random_convex_qp
from qpalm_tpu.batch import solve_batch_jit, stack_problems
from qpalm_tpu.solver.fused import solve_batch_fused
from qpalm_tpu.types import Settings

N, M = 254, 382  # pads to 256 / 384
s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=200,
             scaling=2, max_refine=0, delta=10.0)
probs = [random_convex_qp(N, M, seed=70 + i, density=0.5)
         for i in range(128)]
data = stack_problems(probs, np.float32)
print("padded:", data.q.shape, data.bmin.shape, flush=True)

t0 = time.time()
x, y, st, it, *_ = solve_batch_fused(data, s, qa_panel=16)
jax.block_until_ready(x)
t_compile = time.time() - t0
print(f"n256 streaming kernel compiled+ran in {t_compile:.0f}s", flush=True)

# timed rep (perturb to defeat memoization)
data2 = stack_problems(
    [(Q, A, q * 1.000001, lo, hi) for (Q, A, q, lo, hi) in probs],
    np.float32)
t0 = time.time()
x2, y2, st2, it2, *_ = solve_batch_fused(data2, s, qa_panel=16)
jax.block_until_ready(x2)
t_fused = time.time() - t0

# XLA loop comparison
B = data.q.shape[0]
zx = jnp.zeros_like(data.q); zy = jnp.zeros_like(data.bmin)
g = jnp.full((B,), s.gamma_init, jnp.float32)
r = solve_batch_jit(data2, zx, zy, g, s, False, False)
jax.block_until_ready(r.x)
t0 = time.time()
r = solve_batch_jit(data2, zx, zy, g, s, False, False)
jax.block_until_ready(r.x)
t_xla = time.time() - t0

st2, it2 = np.asarray(st2), np.asarray(it2)
print("parity: status diff", int((st2 != np.asarray(r.status)).sum()),
      "iter diff", int((it2 != np.asarray(r.iterations)).sum()),
      "x maxdiff", float(np.abs(np.asarray(x2) - np.asarray(r.x)).max()))
print(f"fused {t_fused:.3f}s ({128/t_fused:.0f} solves/s) vs "
      f"xla-loop {t_xla:.3f}s ({128/t_xla:.0f} solves/s) -> "
      f"{t_xla/t_fused:.2f}x")
