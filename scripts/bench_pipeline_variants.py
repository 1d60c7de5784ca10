#!/usr/bin/env python
"""A/B the headline-bench pipeline shapes in ONE process (shared compiles).

Variants (same TPU pass + polish, different orchestration):
  A interleave:      dispatch k+1, then fetch+polish k on the main thread
                     (round-1/2 shape)
  B interleave+pack: same, but x/y packed into one device array -> single
                     tunnel transfer
  C queue+thread:    dispatch all rounds up front, fetch on main thread,
                     polish in a 1-worker pool (the shape that measured
                     SLOWER in the full bench)
  D interleave+pack+thread: B's fetch with C's polish worker

Each variant gets its own problem set (axon memoizes identical inputs).
Prints a JSON dict of per-variant pipeline seconds.
"""

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from qpalm_tpu import Settings
    from qpalm_tpu.batch import stack_problems
    from qpalm_tpu.polish import polish_batch_np
    from qpalm_tpu.solver.fused import fused_solve_jit

    K, B = bench.K_ROUNDS, bench.B
    cpu = jax.devices("cpu")[0]
    s32 = Settings(dtype="float32", eps_abs=bench.EPS_F32,
                   eps_rel=bench.EPS_F32, max_iter=96, scaling=2,
                   max_refine=0, delta=10.0)

    def make(seed0):
        rounds = [bench.make_problems(B, bench.N_DIM, bench.M_DIM,
                                      seed=seed0 + 1000 * k)
                  for k in range(K)]
        datas = [stack_problems(p, np.float32) for p in rounds]
        with jax.default_device(cpu):
            datas64 = [jax.tree.map(np.asarray,
                                    stack_problems(p, np.float64))
                       for p in rounds]
        return datas, datas64

    d0, _ = make(1)
    Bp, n_pad = d0[0].q.shape
    m_pad = d0[0].bmin.shape[1]
    zx = jnp.zeros((Bp, n_pad), jnp.float32)
    zy = jnp.zeros((Bp, m_pad), jnp.float32)

    @jax.jit
    def _pack(x, y):
        return jnp.concatenate([x, y], axis=1)

    def solve_raw(d):
        r = fused_solve_jit(d, zx, zy, s32)
        for out in (r[0], r[1]):
            out.copy_to_host_async()
        return r

    def solve_packed(d):
        r = fused_solve_jit(d, zx, zy, s32)
        p = _pack(r[0], r[1])
        p.copy_to_host_async()
        return p

    def polish(d64, x32, y32):
        pol = polish_batch_np(d64, x32, y32, eps_abs=1e-6, eps_rel=1e-6,
                              rounds=1, refine_steps=0)
        bad = np.where(~np.asarray(pol.ok))[0]
        if len(bad):
            sub = jax.tree.map(lambda a: a[bad], d64)
            polish_batch_np(sub, x32[bad], y32[bad], eps_abs=1e-6,
                            eps_rel=1e-6, rounds=3)

    # warm up compiles (both graphs) + polish pools
    r = solve_raw(d0[0]); jax.block_until_ready(r[0])
    p = solve_packed(d0[0]); np.asarray(p)
    _, w64 = make(1)
    x = np.asarray(r[0]); y = np.asarray(r[1])
    polish(w64[0], x, y)

    results = {}

    def variant_A(datas, datas64):
        pending = solve_raw(datas[0])
        for k in range(K):
            nxt = solve_raw(datas[k + 1]) if k + 1 < K else None
            x32, y32 = jax.device_get((pending[0], pending[1]))
            polish(datas64[k], x32, y32)
            pending = nxt

    def variant_B(datas, datas64):
        pending = solve_packed(datas[0])
        for k in range(K):
            nxt = solve_packed(datas[k + 1]) if k + 1 < K else None
            xy = np.asarray(pending)
            polish(datas64[k], xy[:, :n_pad], xy[:, n_pad:])
            pending = nxt

    def variant_C(datas, datas64):
        pend = [solve_packed(d) for d in datas]
        futs = []
        with ThreadPoolExecutor(1) as pool:
            for k in range(K):
                xy = np.asarray(pend[k])
                futs.append(pool.submit(
                    polish, datas64[k], xy[:, :n_pad], xy[:, n_pad:]))
            for f in futs:
                f.result()

    def variant_D(datas, datas64):
        futs = []
        with ThreadPoolExecutor(1) as pool:
            pending = solve_packed(datas[0])
            for k in range(K):
                nxt = solve_packed(datas[k + 1]) if k + 1 < K else None
                xy = np.asarray(pending)
                futs.append(pool.submit(
                    polish, datas64[k], xy[:, :n_pad], xy[:, n_pad:]))
                pending = nxt
            for f in futs:
                f.result()

    def variant_E(datas, datas64):
        # interleave + polish worker, raw two-array fetch (no pack op)
        futs = []
        with ThreadPoolExecutor(1) as pool:
            pending = solve_raw(datas[0])
            for k in range(K):
                nxt = solve_raw(datas[k + 1]) if k + 1 < K else None
                x32, y32 = jax.device_get((pending[0], pending[1]))
                futs.append(pool.submit(polish, datas64[k], x32, y32))
                pending = nxt
            for f in futs:
                f.result()

    for name, fn, seed in [("A_interleave", variant_A, 11),
                           ("B_pack", variant_B, 22),
                           ("C_queue_thread", variant_C, 33),
                           ("D_pack_thread", variant_D, 44),
                           ("E_thread", variant_E, 88),
                           ("A2_interleave", variant_A, 55),
                           ("E2_thread", variant_E, 99),
                           ("D2_pack_thread", variant_D, 77)]:
        datas, datas64 = make(seed)
        t0 = time.perf_counter()
        fn(datas, datas64)
        results[name] = round(time.perf_counter() - t0, 4)
        results[name + "_solves_per_s"] = round(
            K * B / results[name], 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
