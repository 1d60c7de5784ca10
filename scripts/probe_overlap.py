#!/usr/bin/env python
"""Is the bench's device/host overlap real?  (directive r5-#1)

Measures per-round time of: (A) kernel+fetch only, (B) serial
kernel+fetch+polish, (C) bench-style pipelined.  If C ~= max(A, host leg)
the overlap works; if C ~= A + host leg it never did.
"""
import os
import time

os.environ.setdefault("QPALM_TPU_PALLAS", "0")

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import B, EPS_F32, EPS_TARGET, M_DIM, N_DIM, make_problems  # noqa: E402

from qpalm_tpu import Settings  # noqa: E402
from qpalm_tpu.batch import stack_problems  # noqa: E402
from qpalm_tpu.polish import polish_batch_np  # noqa: E402
from qpalm_tpu.solver.fused import fused_solve_jit  # noqa: E402

K = 6
cpu = jax.devices("cpu")[0]
probs = [make_problems(B, N_DIM, M_DIM, seed=7 + 1000 * k) for k in range(K + 1)]
datas = [stack_problems(p, np.float32) for p in probs]
Bp, n_pad = datas[0].q.shape
m_pad = datas[0].bmin.shape[1]
with jax.default_device(cpu):
    datas64 = [jax.tree.map(np.asarray, stack_problems(p, np.float64))
               for p in probs]
zx = jnp.zeros((Bp, n_pad), jnp.float32)
zy = jnp.zeros((Bp, m_pad), jnp.float32)
s32 = Settings(dtype="float32", eps_abs=EPS_F32, eps_rel=EPS_F32,
               max_iter=96, scaling=2, max_refine=0, delta=10.0)


@jax.jit
def _pack(x, y):
    return jnp.concatenate([x, y], axis=1)


def tpu_solve(k):
    r = fused_solve_jit(datas[k], zx, zy, s32)
    packed = _pack(r[0], r[1])
    packed.copy_to_host_async()
    r[3].copy_to_host_async()
    return packed, r[3]


def polish(k, xy):
    x32, y32 = xy[:, :n_pad], xy[:, n_pad:]
    p1 = polish_batch_np(datas64[k], x32, y32, eps_abs=EPS_TARGET,
                         eps_rel=EPS_TARGET, rounds=1, refine_steps=0)
    ok = np.asarray(p1.ok)
    bad = np.where(~ok)[0]
    if len(bad):
        sub = jax.tree.map(lambda a: a[bad], datas64[k])
        polish_batch_np(sub, x32[bad], y32[bad], eps_abs=EPS_TARGET,
                        eps_rel=EPS_TARGET, rounds=3)
    return ok


# warm-up
r0 = tpu_solve(K)
xy = np.asarray(r0[0]); np.asarray(r0[1])
polish(K, xy)

# A: kernel+fetch serial
t0 = time.perf_counter()
for k in range(K):
    r = tpu_solve(k)
    np.asarray(r[0]); np.asarray(r[1])
tA = time.perf_counter() - t0
print(f"A kernel+fetch serial : {tA/K*1e3:8.1f} ms/round")

# B: serial kernel+fetch+polish
t0 = time.perf_counter()
for k in range(K):
    r = tpu_solve(k)
    xy = np.asarray(r[0]); np.asarray(r[1])
    polish(k, xy)
tB = time.perf_counter() - t0
print(f"B serial + polish     : {tB/K*1e3:8.1f} ms/round")

# C: bench-style pipelined
t0 = time.perf_counter()
pending = tpu_solve(0)
for k in range(K):
    nxt = tpu_solve(k + 1) if k + 1 < K else None
    xy = np.asarray(pending[0]); np.asarray(pending[1])
    polish(k, xy)
    pending = nxt
tC = time.perf_counter() - t0
print(f"C pipelined (bench)   : {tC/K*1e3:8.1f} ms/round")

# D: dispatch ALL rounds first, then polish all (max overlap test)
t0 = time.perf_counter()
rs = [tpu_solve(k) for k in range(K)]
for k in range(K):
    xy = np.asarray(rs[k][0]); np.asarray(rs[k][1])
    polish(k, xy)
tD = time.perf_counter() - t0
print(f"D dispatch-all-first  : {tD/K*1e3:8.1f} ms/round")

# E: pipelined + background prefetch thread (hides the fetch RPC wait)
from concurrent.futures import ThreadPoolExecutor
fetch_pool = ThreadPoolExecutor(max_workers=1)


def tpu_solve_prefetch(k):
    r = fused_solve_jit(datas[k], zx, zy, s32)
    packed = _pack(r[0], r[1])
    packed.copy_to_host_async()
    r[3].copy_to_host_async()
    return fetch_pool.submit(lambda: (np.asarray(packed), np.asarray(r[3])))


for trial in range(2):
    t0 = time.perf_counter()
    pending = tpu_solve_prefetch(0)
    for k in range(K):
        nxt = tpu_solve_prefetch(k + 1) if k + 1 < K else None
        xy, _ = pending.result()
        polish(k, xy)
        pending = nxt
    tE = time.perf_counter() - t0
    print(f"E pipelined+prefetch  : {tE/K*1e3:8.1f} ms/round")
