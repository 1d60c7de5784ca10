#!/usr/bin/env python
"""Phase-level profile of the headline bench pipeline (directive r5-#1).

Times each component of bench.py's per-round host leg separately:
  - fused kernel execution (device, block_until_ready)
  - packed-result fetch (tunnel transfer of a ready buffer)
  - polish stage 1 (rounds=1, refine_steps=0) with a further breakdown
  - retry + finisher tail
Run on the real TPU.
"""
import os
import sys
import time

os.environ.setdefault("QPALM_TPU_PALLAS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import B, EPS_F32, EPS_TARGET, M_DIM, N_DIM, make_problems  # noqa: E402

from qpalm_tpu import Settings  # noqa: E402
from qpalm_tpu.batch import stack_problems  # noqa: E402
from qpalm_tpu.polish import polish_batch_np  # noqa: E402
from qpalm_tpu.solver.fused import fused_solve_jit  # noqa: E402


def t(name, fn, reps=3):
    ts = []
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    print(f"  {name:44s} min {min(ts)*1e3:8.2f} ms   reps "
          f"{[round(x*1e3, 1) for x in ts]}")
    return out


def main():
    dev = jax.devices()[0]
    print("device:", dev.device_kind, " B:", B)
    cpu = jax.devices("cpu")[0]
    probs = [make_problems(B, N_DIM, M_DIM, seed=7 + 1000 * k) for k in range(3)]
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

    # warm-up/compile
    r = fused_solve_jit(datas[0], zx, zy, s32)
    jax.block_until_ready(r)

    # --- device kernel alone -------------------------------------------------
    def kern(k=0):
        r = fused_solve_jit(datas[k], zx, zy, s32)
        jax.block_until_ready(r)
        return r

    t("fused kernel (block_until_ready)", lambda: kern(1))
    r = kern(0)

    # --- transfers -----------------------------------------------------------
    packed = _pack(r[0], r[1])
    jax.block_until_ready(packed)
    t("fetch packed 512x160 f32, ready, SYNC", lambda: np.asarray(packed))
    tiny = jnp.zeros((8,), jnp.float32) + 1
    jax.block_until_ready(tiny)
    t("fetch tiny (8,) ready array  [RPC floor]", lambda: np.asarray(tiny))

    def fetch_async():
        p2 = _pack(r[0], r[1])
        p2.copy_to_host_async()
        r[3].copy_to_host_async()
        return np.asarray(p2), np.asarray(r[3])

    xy, _ = t("pack+copy_to_host_async+asarray x2", fetch_async)
    x32, y32 = xy[:, :n_pad], xy[:, n_pad:]

    # --- polish stage 1 ------------------------------------------------------
    pol = polish_batch_np(datas64[0], x32, y32, eps_abs=EPS_TARGET,
                          eps_rel=EPS_TARGET, rounds=1, refine_steps=0)
    pol = t("polish stage1 rounds=1 refine=0 (warm)",
            lambda: polish_batch_np(datas64[0], x32, y32, eps_abs=EPS_TARGET,
                                    eps_rel=EPS_TARGET, rounds=1,
                                    refine_steps=0))
    ok = np.asarray(pol.ok)
    print(f"    stage1 ok: {ok.sum()}/{Bp}")

    # stage-1 internals: run the chunk fn single-threaded on a slice to see
    # build/factor/check split
    from qpalm_tpu.polish import _np_polish_chunk
    d = datas64[0]
    Q = np.asarray(d.Q, np.float64); A = np.asarray(d.A, np.float64)
    q = np.asarray(d.q, np.float64)
    bmin = np.asarray(d.bmin, np.float64); bmax = np.asarray(d.bmax, np.float64)
    c = np.asarray(d.c, np.float64)
    x0 = np.asarray(x32, np.float64); y0 = np.asarray(y32, np.float64)
    t("  chunk B=128 single-thread",
      lambda: _np_polish_chunk(Q[:128], A[:128], q[:128], bmin[:128],
                               bmax[:128], c[:128], x0[:128], y0[:128],
                               EPS_TARGET, EPS_TARGET, 1e-4, 1, 0))

    # retry on failures
    bad = np.where(~ok)[0]
    print(f"    bad lanes: {len(bad)}")
    if len(bad):
        sub = jax.tree.map(lambda a: a[bad], datas64[0])
        t("polish retry rounds=3 on bad lanes",
          lambda: polish_batch_np(sub, x32[bad], y32[bad], eps_abs=EPS_TARGET,
                                  eps_rel=EPS_TARGET, rounds=3))

    # --- full host leg as bench does it -------------------------------------
    import bench as bench_mod
    # simulate: fetch + host_polish equivalents
    def host_leg(k):
        rr = fused_solve_jit(datas[k], zx, zy, s32)
        pk = _pack(rr[0], rr[1])
        pk.copy_to_host_async()
        rr[3].copy_to_host_async()
        jax.block_until_ready(pk)   # kernel done; now time host leg only
        t0 = time.perf_counter()
        xy = np.asarray(pk)
        xx, yy = xy[:, :n_pad], xy[:, n_pad:]
        p1 = polish_batch_np(datas64[k], xx, yy, eps_abs=EPS_TARGET,
                             eps_rel=EPS_TARGET, rounds=1, refine_steps=0)
        okk = np.asarray(p1.ok)
        bad = np.where(~okk)[0]
        if len(bad):
            sub = jax.tree.map(lambda a: a[bad], datas64[k])
            polish_batch_np(sub, xx[bad], yy[bad], eps_abs=EPS_TARGET,
                            eps_rel=EPS_TARGET, rounds=3)
        return time.perf_counter() - t0

    for k in range(3):
        print(f"  host leg round {k}: {host_leg(k)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
