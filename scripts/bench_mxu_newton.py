#!/usr/bin/env python
"""MXU-vs-VPU formulation study for the batched Newton solve.

VERDICT r2 weak item 3 asked for one measured MXU formulation of the hot
per-iteration work — Schur assembly M = Q + A' W A, Cholesky of M, and the
triangular solves — or a quantitative roofline proving the lane-last VPU
kernel is the right design at these shapes.

This script measures BOTH formulations on the same shapes (B=512, the
bench protocol n=64/m=96 plus n=128/m=192):

1. `xla-mxu`: the batched Newton step as XLA batched matmuls
   (einsum/cholesky/solve_triangular under vmap semantics).  XLA lowers
   the (B,m,n)x(B,m,n) assembly einsum and triangular solves onto the
   MXU — this is the "(8,128)x(128,128) MXU panels" formulation: each
   lane's assembly is a genuine matmul, batched over B.  Timed with a
   lax.fori_loop of reps inside one jit (carry-dependent inputs defeat
   the axon stack's memoization), full-f32 precision.

2. `fused-vpu`: the per-iteration cost of the lane-last fused Pallas
   kernel, extracted as (t(T2) - t(T1)) / (T2 - T1) with early exit
   disabled (eps=0) so every lane executes exactly T iterations.  The
   kernel iteration includes the same assembly + Cholesky + solves PLUS
   the full P-ALM bookkeeping (residuals, linesearch with bisection,
   termination) — so this is an UPPER bound on its Newton cost; if it
   still beats the MXU op sequence, the design argument is closed.

Prints one JSON line and a human table; paste the result into STATUS.md.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 30
B = 512


def newton_flops(n, m):
    # assembly 2*n*n*m + cholesky n^3/3 + two triangular solves 2*n^2
    return B * (2.0 * n * n * m + n ** 3 / 3.0 + 2.0 * n * n)


def bench_mxu(n, m, seed=0):
    """Batched Newton step as XLA batched-matmul (MXU) ops."""
    rng = np.random.default_rng(seed)
    Mbase = rng.standard_normal((B, n, n)).astype(np.float32)
    Q = jnp.asarray(Mbase @ Mbase.transpose(0, 2, 1) / n
                    + 2.0 * np.eye(n, dtype=np.float32))
    A = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    w0 = jnp.asarray(rng.random((B, m)).astype(np.float32) + 0.5)

    @jax.jit
    def run(w0):
        def body(k, carry):
            w, acc = carry
            # one batched Newton step at full f32 precision
            Aw = A * w[:, :, None]
            M = Q + jnp.einsum("bmi,bmj->bij", Aw, A,
                               precision=jax.lax.Precision.HIGHEST)
            L = jnp.linalg.cholesky(M)
            z = jax.scipy.linalg.solve_triangular(L, g[..., None],
                                                  lower=True)
            d = jax.scipy.linalg.solve_triangular(
                L, z, lower=True, trans=1)[..., 0]
            # feed the result back into the next rep's weights: defeats
            # CSE/memoization and keeps the loop serially dependent
            w = w0 + 1e-6 * jnp.abs(d[:, :1]) * jnp.ones_like(w0)
            return w, acc + d.sum()

        w, acc = jax.lax.fori_loop(0, REPS, body, (w0, jnp.float32(0)))
        return acc

    run(w0).block_until_ready()  # compile
    t0 = time.perf_counter()
    run(w0).block_until_ready()
    dt = (time.perf_counter() - t0) / REPS
    return dt


def bench_fused_per_iter(n, m, seed=0):
    """Per-iteration cost of the fused kernel at the same shape, early
    exit disabled (eps=0 keeps every lane iterating the full budget)."""
    sys.path.insert(0, "tests")
    from helpers import random_convex_qp

    from qpalm_tpu.batch import stack_problems
    from qpalm_tpu.solver.fused import fused_solve_jit
    from qpalm_tpu.types import Settings

    probs = [random_convex_qp(n - 2, m - 2, seed=seed + i, density=0.5)
             for i in range(B)]
    data = stack_problems(probs, np.float32)
    n_pad = data.q.shape[1]
    m_pad = data.bmin.shape[1]
    zx = jnp.zeros((B, n_pad), jnp.float32)
    zy = jnp.zeros((B, m_pad), jnp.float32)

    times = {}
    for T in (16, 48):
        s = Settings(dtype="float32", eps_abs=0.0, eps_rel=0.0,
                     max_iter=T, scaling=2, max_refine=0, delta=10.0)
        r = fused_solve_jit(data, zx, zy, s)
        jax.block_until_ready(r[0])  # compile
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            r = fused_solve_jit(data, zx, zy, s)
            jax.block_until_ready(r[0])
            best = min(best, time.perf_counter() - t0)
        times[T] = best
    return (times[48] - times[16]) / 32.0, n_pad, m_pad


def main():
    dev = jax.devices()[0]
    out = {"device": getattr(dev, "device_kind", str(dev)), "B": B,
           "shapes": []}
    for n, m in ((64, 96), (128, 192)):
        dt_mxu = bench_mxu(n, m)
        dt_vpu, n_pad, m_pad = bench_fused_per_iter(n, m)
        fl = newton_flops(n, m)
        row = {
            "n": n, "m": m,
            "mxu_newton_ms": round(dt_mxu * 1e3, 3),
            "mxu_gflops": round(fl / dt_mxu / 1e9, 1),
            "fused_iter_ms": round(dt_vpu * 1e3, 3),
            "fused_gflops_newton_equiv": round(
                newton_flops(n_pad, m_pad) / dt_vpu / 1e9, 1),
            "fused_vs_mxu": round(dt_mxu / dt_vpu, 2),
        }
        out["shapes"].append(row)
        print(f"n={n} m={m}: MXU newton {row['mxu_newton_ms']} ms "
              f"({row['mxu_gflops']} GF/s) | fused full-iter "
              f"{row['fused_iter_ms']} ms "
              f"({row['fused_gflops_newton_equiv']} GF/s Newton-equiv) | "
              f"fused is {row['fused_vs_mxu']}x faster", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
