"""Pallas batched Cholesky kernels vs numpy oracles (interpret mode on CPU;
the same kernels compile natively on TPU — see qpalm_tpu/linalg/pallas_chol)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qpalm_tpu.linalg.pallas_chol import (
    _chol_kernel,
    _solve_kernel,
    cholesky_batched,
    cholesky_solve_batched,
)


def _spd_batch(B, n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((B, n, n)).astype(dtype)
    return M @ np.transpose(M, (0, 2, 1)) + n * np.eye(n, dtype=dtype)


def _run_chol_interpret(M):
    B, n, _ = M.shape
    return pl.pallas_call(
        _chol_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((B, n, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, n, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, n), M.dtype),
        interpret=True,
    )(M)


@pytest.mark.parametrize("n", [8, 16, 64])
def test_pallas_cholesky_interpret(n):
    M = _spd_batch(4, n)
    R = np.asarray(_run_chol_interpret(jnp.asarray(M)))
    # R is upper triangular with R'R = M
    assert np.allclose(R, np.triu(R))
    rel = np.max(np.abs(np.transpose(R, (0, 2, 1)) @ R - M)) / np.max(np.abs(M))
    assert rel < 1e-5


def test_pallas_solve_interpret():
    B, n = 4, 16
    M = _spd_batch(B, n, seed=1)
    b = np.random.default_rng(2).standard_normal((B, n)).astype(np.float32)
    R = _run_chol_interpret(jnp.asarray(M))
    x = pl.pallas_call(
        _solve_kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        interpret=True,
    )(R, jnp.asarray(b))
    resid = np.einsum("bij,bj->bi", M.astype(np.float64), np.asarray(x)) - b
    assert np.max(np.abs(resid)) < 1e-4


def test_custom_vmap_wrappers_match_oracle():
    # on CPU these route through the jnp fallback; the contract (upper R,
    # R'R = M, solve) must hold identically on every backend
    B, n = 6, 12
    M = _spd_batch(B, n, seed=3, dtype=np.float64)
    b = np.random.default_rng(4).standard_normal((B, n))
    R = jax.jit(jax.vmap(cholesky_batched))(jnp.asarray(M))
    Rn = np.asarray(R)
    assert np.allclose(Rn, np.triu(Rn))
    assert np.allclose(np.transpose(Rn, (0, 2, 1)) @ Rn, M, atol=1e-8)
    x = jax.jit(jax.vmap(cholesky_solve_batched))(R, jnp.asarray(b))
    assert np.allclose(np.einsum("bij,bj->bi", M, np.asarray(x)), b, atol=1e-8)


def test_unbatched_wrappers():
    M = _spd_batch(1, 8, seed=5, dtype=np.float64)[0]
    b = np.arange(8.0)
    R = jax.jit(cholesky_batched)(jnp.asarray(M))
    x = jax.jit(cholesky_solve_batched)(R, jnp.asarray(b))
    assert np.allclose(M @ np.asarray(x), b, atol=1e-8)
