"""Pallas TPU kernels: batched dense Cholesky factorization + solves.

XLA's generic `jnp.linalg.cholesky` on TPU uses a blocked algorithm tuned
for large single matrices; for the batched small systems this solver lives
on (hundreds of n<=256 Schur matrices per Newton step, reference semantics
solver_interface.c:319-405) it runs far below the VPU's speed of light.
These kernels compute the factorization with the textbook outer-product
recurrence, vectorized across a whole batch tile per step:

    step k:  r_k   = A[k, k:] / sqrt(A[k, k])          (row of R = L')
             A    -= r_k' r_k   on the trailing block

Mosaic constraints shape the implementation:
  * dynamic indexing happens only through *ref* slices on the sublane
    (row) dimension — `ref[:, pl.ds(k, 1), :]`;
  * single lane elements (A[k,k], y[k]) are extracted/updated with masked
    reductions / selects against a lane iota, never lane-dynamic slices;
  * the triangular solves use only rows of R: forward substitution in saxpy
    form (column j of L = row j of R), backward in inner-product form.

Numerical note: the factorization is *not* pivoted, exactly like the
reference's LDL' with diagonal shift; the P-ALM Schur matrix is SPD by
construction (Q + 1/gamma I + A' Sigma A).

`cholesky_batched` / `cholesky_solve_batched` carry custom vmap rules so the
per-problem solver code (written unbatched, then vmapped) lowers to one
batched kernel instead of a grid-of-1 per lane; on non-TPU backends they
fall back to jnp/lax implementations with identical semantics (upper R).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lanes per kernel program: the trailing-update tile is (LANES, n, n); for
# n=64 f32 that is 8 * 16 KiB = 128 KiB in VMEM — far under the ~16 MiB cap
_DEFAULT_LANES = 8


def _lane_iota(n: int):
    """(1, n) int32 lane indices (TPU needs >=2D iota)."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _chol_kernel(M_ref, R_ref):
    n = M_ref.shape[-1]
    cols = _lane_iota(n)  # (1, n)
    A = M_ref[:]
    dt = A.dtype
    # n is static: the recurrence is unrolled at trace time, so every index
    # and mask below is a compile-time constant (no scf loops — Mosaic
    # rejects value-carrying fori_loops here — and no dynamic lane ops)
    for k in range(n):
        akk = A[:, k, k]
        inv = jax.lax.rsqrt(akk)
        row = A[:, k, :] * inv[:, None]
        row_trail = row * (cols > k).astype(dt)
        A = A - row_trail[:, :, None] * row_trail[:, None, :]
        # row-k write as a mask blend (scatter is not lowerable in Mosaic)
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == k)
        new_row = row * (cols >= k).astype(dt)
        A = jnp.where(rowsel[None], new_row[:, None, :], A)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    R_ref[:] = A * (rows2 <= cols2).astype(dt)[None]


def _solve_kernel(R_ref, b_ref, x_ref):
    n = R_ref.shape[-1]
    cols = _lane_iota(n)
    R = R_ref[:]
    dt = R.dtype

    # forward substitution L y = b with L = R', saxpy form:
    # column j of L is row j of R, so only row accesses are needed
    y = b_ref[:]
    for j in range(n):
        rrow = R[:, j, :]
        yj = y[:, j] / rrow[:, j]
        y = y - yj[:, None] * (rrow * (cols > j).astype(dt))
        y = jnp.where(cols == j, yj[:, None], y)

    # backward substitution R x = y, inner-product form on rows of R
    x = jnp.zeros_like(y)
    for k in range(n - 1, -1, -1):
        rrow = R[:, k, :]
        dot = jnp.sum(rrow * (cols > k).astype(dt) * x, axis=-1)
        xk = (y[:, k] - dot) / rrow[:, k]
        x = jnp.where(cols == k, xk[:, None], x)
    x_ref[:] = x


def _chol_kernel_loop(M_ref, R_ref):
    """fori_loop variant of _chol_kernel: dynamic row access via ref slices,
    lane extraction via masked reductions.  Much smaller program than the
    unrolled kernel (compiles in seconds instead of minutes); measured
    runtime decides which is used."""
    n = M_ref.shape[-1]
    cols = _lane_iota(n)  # (1, n)
    R_ref[:] = M_ref[:]

    def step(k, carry):
        row = R_ref[:, pl.ds(k, 1), :][:, 0, :]  # (bs, n)
        akk = jnp.sum(jnp.where(cols == k, row, 0.0), axis=-1)
        inv = jax.lax.rsqrt(akk)
        row = row * inv[:, None]
        row_trail = jnp.where(cols > k, row, 0.0)
        R_ref[:] = R_ref[:] - row_trail[:, :, None] * row_trail[:, None, :]
        R_ref[:, pl.ds(k, 1), :] = jnp.where(cols >= k, row, 0.0)[:, None, :]
        return carry

    jax.lax.fori_loop(0, n, step, jnp.float32(0.0))
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    R_ref[:] = jnp.where((rows2 <= cols2)[None], R_ref[:], 0.0)


def _solve_kernel_loop(R_ref, b_ref, x_ref):
    """fori_loop variant of _solve_kernel (same access pattern rules)."""
    n = R_ref.shape[-1]
    cols = _lane_iota(n)

    def fwd(j, y):
        rrow = R_ref[:, pl.ds(j, 1), :][:, 0, :]
        rjj = jnp.sum(jnp.where(cols == j, rrow, 0.0), axis=-1)
        yj = jnp.sum(jnp.where(cols == j, y, 0.0), axis=-1) / rjj
        y = y - yj[:, None] * jnp.where(cols > j, rrow, 0.0)
        return jnp.where(cols == j, yj[:, None], y)

    y = jax.lax.fori_loop(0, n, fwd, b_ref[:])

    def bwd(t, x):
        k = n - 1 - t
        rrow = R_ref[:, pl.ds(k, 1), :][:, 0, :]
        rkk = jnp.sum(jnp.where(cols == k, rrow, 0.0), axis=-1)
        dot = jnp.sum(jnp.where(cols > k, rrow, 0.0) * x, axis=-1)
        yk = jnp.sum(jnp.where(cols == k, y, 0.0), axis=-1)
        xk = (yk - dot) / rkk
        return jnp.where(cols == k, xk[:, None], x)

    x_ref[:] = jax.lax.fori_loop(0, n, bwd, jnp.zeros_like(y))


def _pick_lanes(batch: int) -> int:
    lanes = min(_DEFAULT_LANES, batch)
    while batch % lanes:
        lanes -= 1
    return max(lanes, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_pallas(M: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched Cholesky: M (B, n, n) SPD -> R (B, n, n) upper with R'R = M."""
    B, n, _ = M.shape
    lanes = _pick_lanes(B)
    # the package enables jax_enable_x64 globally (reference f64 parity);
    # under x64 the grid index arithmetic traces as int64, which Mosaic
    # cannot legalize ("failed to legalize operation 'func.return'") —
    # trace the kernel with x64 off (all operands are f32 anyway)
    with jax.enable_x64(False):
        return pl.pallas_call(
        _chol_kernel_loop,
        grid=(B // lanes,),
        in_specs=[
            pl.BlockSpec((lanes, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lanes, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, n), M.dtype),
        interpret=interpret,
    )(M)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _solve_pallas(R: jnp.ndarray, b: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Batched solve of R'R x = b given the upper factor R."""
    B, n, _ = R.shape
    lanes = _pick_lanes(B)
    with jax.enable_x64(False):
        return pl.pallas_call(
        _solve_kernel_loop,
        grid=(B // lanes,),
        in_specs=[
            pl.BlockSpec((lanes, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lanes, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), b.dtype),
        interpret=interpret,
    )(R, b)


def _use_pallas(dtype) -> bool:
    # pallas path: TPU backend, f32 (f64 is emulated on TPU; CPU runs the
    # jnp fallback — the interpreter is exercised only by tests).
    # Gated behind QPALM_TPU_PALLAS=1 for now: on this chip the measured win
    # over XLA's batched cholesky is small (the per-loop-iteration dispatch
    # floor dominates at moderate batch) while the Mosaic compile of the
    # factorization kernel costs ~100s per executable — not a good default
    # trade until the kernel compile is fixed (blocked panels).
    import os

    if os.environ.get("QPALM_TPU_PALLAS", "0") != "1":
        return False
    return jax.default_backend() == "tpu" and dtype == jnp.float32


# --- vmap-aware public ops --------------------------------------------------
#
# The solver core is written per-problem and vmapped; these custom-vmap
# wrappers collapse the vmap into the kernel's batch dimension.

@jax.custom_batching.custom_vmap
def cholesky_batched(M: jnp.ndarray) -> jnp.ndarray:
    """Upper Cholesky factor R (R'R = M) of one SPD matrix (n, n)."""
    if _use_pallas(M.dtype):
        return _chol_pallas(M[None])[0]
    return jnp.linalg.cholesky(M).T


@cholesky_batched.def_vmap
def _chol_vmap(axis_size, in_batched, M):
    del axis_size
    (m_batched,) = in_batched
    assert m_batched
    if _use_pallas(M.dtype):
        return _chol_pallas(M), True
    return jnp.swapaxes(jnp.linalg.cholesky(M), -1, -2), True


@jax.custom_batching.custom_vmap
def cholesky_solve_batched(R: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve R'R x = b for one system given the upper factor R."""
    if _use_pallas(R.dtype):
        return _solve_pallas(R[None], b[None])[0]
    from jax.scipy.linalg import solve_triangular

    y = solve_triangular(R, b, lower=False, trans=1)
    return solve_triangular(R, y, lower=False)


@cholesky_solve_batched.def_vmap
def _solve_vmap(axis_size, in_batched, R, b):
    del axis_size
    r_b, b_b = in_batched
    if not r_b:
        R = jnp.broadcast_to(R, (b.shape[0],) + R.shape)
    if not b_b:
        b = jnp.broadcast_to(b, (R.shape[0],) + b.shape)
    if _use_pallas(R.dtype):
        return _solve_pallas(R, b), True
    from jax.scipy.linalg import solve_triangular

    y = solve_triangular(R, b[..., None], lower=False, trans=1)
    return solve_triangular(R, y, lower=False)[..., 0], True
