#!/usr/bin/env python
"""Probe: does the TPU support f64 linalg, and at what speed?

Directive r5-#1 feasibility check: moving the f64 active-set KKT polish
solve on-device requires batched f64 matmul/cholesky/triangular_solve (or
an f32-factor + f64-residual refinement scheme).  This measures what the
hardware/runtime actually supports.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

dev = jax.devices()[0]
print("device:", dev.device_kind)

B, n, m = 512, 64, 96
nm = n + m
rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    try:
        r = jax.jit(fn)(*args)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = jax.jit(fn)(*args)
            jax.block_until_ready(r)
            ts.append(time.perf_counter() - t0)
        print(f"  {name}: {min(ts)*1e3:.2f} ms  (reps {[round(t*1e3,2) for t in ts]})")
        return r
    except Exception as e:
        print(f"  {name}: FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None


for dtype in (jnp.float32, jnp.float64):
    print(f"--- dtype {dtype.__name__} ---")
    K = jnp.asarray(rng.standard_normal((B, nm, nm)), dtype)
    K = K @ jnp.swapaxes(K, 1, 2) + 10.0 * jnp.eye(nm, dtype=dtype)
    r = jnp.asarray(rng.standard_normal((B, nm)), dtype)
    Qs = jnp.asarray(rng.standard_normal((B, n, n)), dtype)
    Qs = Qs @ jnp.swapaxes(Qs, 1, 2) + jnp.eye(n, dtype=dtype)

    timeit("batched matvec (B,nm,nm)@(B,nm)", lambda K, r: jnp.einsum("bij,bj->bi", K, r), K, r)
    timeit("batched matmul (B,nm,nm)@(B,nm,nm)", lambda K: K @ K, K)
    L = timeit("batched cholesky (B,160,160)", jnp.linalg.cholesky, K)
    if L is not None:
        timeit(
            "batched chol solve (2 trisolves)",
            lambda L, r: jax.scipy.linalg.cho_solve((L, True), r[..., None]),
            L, r,
        )
    timeit("batched lu solve jnp.linalg.solve", jnp.linalg.solve, K, r)
    # accuracy check for cholesky-based solve in this dtype
    if L is not None:
        x = jax.scipy.linalg.cho_solve((np.asarray(L), True), np.asarray(r)[..., None])[..., 0]
        res = np.einsum("bij,bj->bi", np.asarray(K), x) - np.asarray(r)
        print(f"  chol-solve residual inf-norm: {np.abs(res).max():.2e}")
