#!/usr/bin/env python
"""Headline benchmark: batched QP solves/sec on one TPU chip.

Protocol (north star in BASELINE.md: beat C-QPALM wall-clock via batched
solves at matched optimality gap):

* B random strictly-convex QPs (n=64, m=96, 50%-dense — the protocol of
  reference simulations/randomQP.m scaled up), eps_abs = eps_rel = 3e-5
  (the tightest tolerance the f32 pass holds with zero stragglers on this
  workload; verified honest against f64 KKT audits).
* TPU pass: one vmapped float32 solve (the lockstep while_loop runs until
  the last lane converges or hits max_iter).
* Escalation: lanes the f32 pass could not finish are re-solved in float64
  on the host CPU — wall-clock for both passes is charged.
* Baseline: the same problems solved sequentially (batch of 1) in float64
  on the host CPU — the stand-in for the reference's single-threaded C
  solver, measured on a sample and extrapolated.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_compilation")
)
# Pallas batched Cholesky (QPALM_TPU_PALLAS=1) measured 1.8x faster than
# XLA's at this shape (3.8 vs 6.9 ms per factor+solve; whole bench 846 vs
# 737 solves/s) — but the axon remote compiler does not cache Mosaic
# kernels across processes and its compile time is variable (7-10 min),
# which can blow the bench budget.  Default to the reliably-compiling XLA
# path; flip the env var to benchmark the kernel.
os.environ.setdefault("QPALM_TPU_PALLAS", "0")

import numpy as np  # noqa: E402

B = 512
N_DIM = 64
M_DIM = 96
EPS = 3e-5
SAMPLE_BASELINE = 12


def make_problems(batch, n, m, seed=7):
    rng = np.random.default_rng(seed)
    probs = []
    for _ in range(batch):
        M = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.5)
        Q = M @ M.T / n + 0.1 * np.eye(n)
        A = rng.standard_normal((m, n))
        q = rng.standard_normal(n)
        u = 2 * rng.random(m)
        probs.append((Q, A, q, -u, u))
    return probs


def main():
    import jax
    import jax.numpy as jnp

    from qpalm_tpu import Settings, constants as C
    from qpalm_tpu.batch import solve_batch_jit, stack_problems

    probs = make_problems(B, N_DIM, M_DIM)

    # ---- TPU float32 pass -------------------------------------------------
    # delta=10 (vs the reference default 100): gentler penalty boosts keep
    # the Schur matrix conditioned enough for f32 — empirically removes the
    # max_iter straggler tail entirely on this workload (p99 400 -> 58)
    # max_refine=0: with delta=10 refinement changes nothing on this
    # workload (identical iteration counts) and costs 2 trisolve pairs +
    # ~9 matvecs per vmapped iteration
    # unroll stays at 1: unroll=4 measured only ~4% more throughput (737 vs
    # 708 solves/s) while quadrupling the loop body and its compile time —
    # reliability of the bench run wins
    s32 = Settings(
        dtype="float32", eps_abs=EPS, eps_rel=EPS, max_iter=120,
        scaling=2, max_refine=0, delta=10.0,
    )
    data = stack_problems(probs, np.float32)
    Bp, n_pad = data.q.shape
    m_pad = data.bmin.shape[1]
    xw = jnp.zeros((Bp, n_pad), jnp.float32)
    yw = jnp.zeros((Bp, m_pad), jnp.float32)
    gam = jnp.full((Bp,), s32.gamma_init, jnp.float32)

    res = solve_batch_jit(data, xw, yw, gam, s32, False, False)  # compile
    np.asarray(res.x)  # full fetch — block_until_ready alone can lie via axon

    # NB inputs are perturbed per rep: the axon plugin memoizes executions
    # with bit-identical inputs, which would fake a ~1000x speedup
    times = []
    for k in range(3):
        dk = data._replace(q=data.q * np.float32(1.0 + 1e-6 * (k + 1)))
        t0 = time.perf_counter()
        res = solve_batch_jit(dk, xw, yw, gam, s32, False, False)
        jax.block_until_ready(res.x)
        np.asarray(res.status)
        times.append(time.perf_counter() - t0)
    t_tpu = min(times)
    status = np.asarray(res.status)
    unsolved = [i for i in range(B) if status[i] != C.QPALM_SOLVED]

    # ---- escalation: f64 host re-solve of the stragglers -------------------
    t_esc = 0.0
    cpu = jax.devices("cpu")[0]
    s64 = Settings(eps_abs=EPS, eps_rel=EPS, max_iter=4000, scaling=2)
    if unsolved:
        sub = [probs[i] for i in unsolved]
        with jax.default_device(cpu):
            d2 = stack_problems(sub, np.float64)
            B2, np2 = d2.q.shape
            mp2 = d2.bmin.shape[1]
            args = (
                d2, jnp.zeros((B2, np2)), jnp.zeros((B2, mp2)),
                jnp.full((B2,), s64.gamma_init), s64, False, False,
            )
            r2 = solve_batch_jit(*args)  # compile
            jax.block_until_ready(r2.x)
            t0 = time.perf_counter()
            r2 = solve_batch_jit(*args)
            jax.block_until_ready(r2.x)
            t_esc = time.perf_counter() - t0
        n_solved = int(np.sum(status == C.QPALM_SOLVED)) + int(
            np.sum(np.asarray(r2.status) == C.QPALM_SOLVED)
        )
    else:
        n_solved = int(np.sum(status == C.QPALM_SOLVED))

    total_time = t_tpu + t_esc
    throughput = B / total_time

    # ---- baseline: sequential f64 solves on host CPU ------------------------
    with jax.default_device(cpu):
        sample = probs[:SAMPLE_BASELINE]
        d1 = stack_problems(sample[:1], np.float64)
        B1, np1 = d1.q.shape
        mp1 = d1.bmin.shape[1]
        zx = jnp.zeros((B1, np1))
        zy = jnp.zeros((B1, mp1))
        g1 = jnp.full((B1,), s64.gamma_init)
        r1 = solve_batch_jit(d1, zx, zy, g1, s64, False, False)  # compile
        jax.block_until_ready(r1.x)
        t0 = time.perf_counter()
        for p in sample:
            dp = stack_problems([p], np.float64)
            r1 = solve_batch_jit(dp, zx, zy, g1, s64, False, False)
            jax.block_until_ready(r1.x)
        t_base = (time.perf_counter() - t0) / len(sample)
    baseline_throughput = 1.0 / t_base

    out = {
        "metric": "batched_qp_solves_per_sec_per_chip",
        "value": round(throughput, 2),
        "unit": "solves/s",
        "vs_baseline": round(throughput / baseline_throughput, 2),
        "detail": {
            "batch": B, "n": N_DIM, "m": M_DIM, "eps": EPS,
            "solved": n_solved,
            "tpu_f32_pass_s": round(t_tpu, 4),
            "escalated": len(unsolved),
            "escalation_s": round(t_esc, 4),
            "cpu_f64_sequential_solves_per_s": round(baseline_throughput, 2),
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
