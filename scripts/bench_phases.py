#!/usr/bin/env python
"""Phase-timing diagnostic for the headline bench pipeline.

Times each stage separately (no overlap) so the critical path is visible:
  - tpu_pass: fused_solve_jit wall time per round (block_until_ready)
  - fetch: device_get of x/y/iters
  - polish: polish_batch_np (rounds=1 + retry)
  - fallback: f64 re-solves of failed lanes
Prints a JSON dict of phase medians + the implied overlapped throughput.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (reuse problem generator + constants)


def main():
    import jax
    import jax.numpy as jnp

    from qpalm_tpu import Settings
    from qpalm_tpu.batch import stack_problems
    from qpalm_tpu.polish import polish_batch_np
    from qpalm_tpu.solver.fused import LANES, fused_solve_jit

    K, B = bench.K_ROUNDS, bench.B
    cpu = jax.devices("cpu")[0]
    rounds = [
        bench.make_problems(B, bench.N_DIM, bench.M_DIM, seed=7 + 1000 * k)
        for k in range(K)
    ]
    s32 = Settings(dtype="float32", eps_abs=bench.EPS_F32,
                   eps_rel=bench.EPS_F32, max_iter=96, scaling=2,
                   max_refine=0, delta=10.0)
    datas = [stack_problems(p, np.float32) for p in rounds]
    Bp, n_pad = datas[0].q.shape
    m_pad = datas[0].bmin.shape[1]
    zx = jnp.zeros((Bp, n_pad), jnp.float32)
    zy = jnp.zeros((Bp, m_pad), jnp.float32)
    with jax.default_device(cpu):
        datas64 = [jax.tree.map(np.asarray, stack_problems(p, np.float64))
                   for p in rounds]

    # warm up / compile
    r = fused_solve_jit(datas[0], zx, zy, s32)
    jax.block_until_ready(r[0])

    t_tpu, t_fetch, t_pol, iters_info = [], [], [], []
    fails_total = 0
    for k in range(K):
        t0 = time.perf_counter()
        r = fused_solve_jit(datas[k], zx, zy, s32)
        jax.block_until_ready(r[3])
        t1 = time.perf_counter()
        x32, y32 = jax.device_get((r[0], r[1]))
        it = np.asarray(r[3]).reshape(-1, LANES)
        t2 = time.perf_counter()
        pol = polish_batch_np(datas64[k], x32, y32, eps_abs=1e-6,
                              eps_rel=1e-6, rounds=1, refine_steps=0)
        ok = np.asarray(pol.ok)
        bad = np.where(~ok)[0]
        if len(bad):
            sub = jax.tree.map(lambda a: a[bad], datas64[k])
            polish_batch_np(sub, x32[bad], y32[bad], eps_abs=1e-6,
                            eps_rel=1e-6, rounds=3)
        t3 = time.perf_counter()
        fails_total += len(bad)
        t_tpu.append(t1 - t0)
        t_fetch.append(t2 - t1)
        t_pol.append(t3 - t2)
        iters_info.append((it.max(axis=1).tolist(),
                           float(it.mean()), float(np.percentile(it, 50))))

    out = {
        "tpu_pass_s": [round(t, 4) for t in t_tpu],
        "fetch_s": [round(t, 4) for t in t_fetch],
        "polish_s": [round(t, 4) for t in t_pol],
        "polish_fail_lanes": fails_total,
        "block_max_iters": iters_info[0][0],
        "iters_mean": iters_info[0][1],
        "iters_p50": iters_info[0][2],
        "tpu_median": round(float(np.median(t_tpu)), 4),
        "implied_overlap_solves_per_s": round(
            B / max(np.median(t_tpu) + np.median(t_fetch),
                    np.median(t_pol)), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
