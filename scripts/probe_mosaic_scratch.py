"""Minimal repro probe for the n_pad=256 streaming-kernel corruption.

The full solver kernel corrupts state at n_pad=256 on hardware while
interpret mode is clean (scripts/probe_n256.py).  This strips the kernel
to the smallest structure that matters: ONE pallas_call with an
(n, n, 128) f32 VMEM scratch (32 MB at n=256, 24.5 MB at n=224), a
fori_loop that writes a known per-row pattern through the scratch, a
second fori_loop that rank-1-updates it in row chunks (the solver's
access pattern), and a copy-out.  If the checksum is wrong at n=256 but
right at n=224, a single large scratch buffer is sufficient to trigger
the defect; if both pass, the corruption needs more of the solver
kernel's structure (HBM DMA interleaving, aliasing, 18+ operands).

Usage: timeout 1200 python scripts/probe_mosaic_scratch.py

RESULTS (v5e, 2026-08-19): every level of this repro PASSES at n=256 —
the bare 32 MB scratch, the DMA sweep + chunked rank-1 assembly at
~42 MB total, and a separate 64 MB two-scratch pressure probe.  So the
full solver kernel's n=256 corruption is NOT raw VMEM pressure and NOT
the assembly/DMA primitives in isolation; it requires the full kernel's
structure (24 operands, 16 input/output aliases, several sweeps per
iteration inside the T-loop).  Round 4 then bisected the corruption to
the input_output_aliases themselves: the aliased tier is admitted to
ALIAS_WALL=224 and the alias-FREE program extends the wall to
STREAM_WALL=352 (both hardware-validated; see pick_qa_panel's two-tier
gate and scripts/probe_n256.py).
"""
import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


@functools.partial(jax.jit, static_argnames=("n", "rch"))
def scratch_probe(seed_row, n, rch):
    """seed_row: (1, LANES).  Returns (n, LANES) = the scratch's row sums
    after the patterned fill + chunked rank-1 update."""

    def kernel(seed_ref, out_ref, M_s):
        iota_n = jax.lax.broadcasted_iota(
            jnp.int32, (n, LANES), 0).astype(jnp.float32)

        def fill(i, _):
            # row i <- seed + i (distinct per row, checkable on host)
            M_s[pl.ds(i, 1), :, :] = (
                seed_ref[:] + i.astype(jnp.float32)
            )[None, :, :] * jnp.ones((1, n, LANES), jnp.float32)
            return 0

        jax.lax.fori_loop(0, n, fill, 0)

        # chunked rank-1 updates: M -= v v' with v = iota/n, repeated
        def upd(k, _):
            v = iota_n / jnp.float32(n) + k.astype(jnp.float32) * 0.0
            for c in range(n // rch):
                seg = jax.lax.slice(v, (c * rch, 0), (c * rch + rch, LANES))
                M_s[pl.ds(c * rch, rch), :, :] = (
                    M_s[pl.ds(c * rch, rch), :, :]
                    - seg[:, None, :] * v[None, :, :]
                )
            return 0

        jax.lax.fori_loop(0, 8, upd, 0)

        # row sums out
        def rs(i, _):
            out_ref[pl.ds(i, 1), :] = jnp.sum(
                M_s[pl.ds(i, 1), :, :][0], axis=0, keepdims=True
            )
            return 0

        jax.lax.fori_loop(0, n, rs, 0)

    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((1, LANES), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, LANES), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, LANES), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n, n, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(seed_row)


def expected(seed, n):
    rows = seed[None, :] + np.arange(n, dtype=np.float32)[:, None]
    M = np.repeat(rows[:, None, :], n, axis=1)  # (n, n, LANES)
    v = (np.arange(n, dtype=np.float32) / n)[:, None] * np.ones(
        (n, LANES), np.float32)
    for _ in range(8):
        M = M - v[:, None, :] * v[None, :, :]
    return M.sum(axis=1)


@functools.partial(jax.jit, static_argnames=("n", "m", "P", "rch"))
def dma_probe(A, w, n, m, P, rch):
    """The solver's streaming-assembly structure: A (m, n, LANES) stays in
    HBM, P-row panels are DMA'd through a double-buffered VMEM scratch,
    and M = A' diag(w) A accumulates into the (n, n, LANES) scratch in
    rch-row chunks.  Returns M's row sums (n, LANES)."""

    def kernel(A_ref, w_ref, out_ref, M_s, qa_buf, dma_sems):
        M_s[:] = jnp.zeros((n, n, LANES), jnp.float32)

        def start(k, slot):
            pltpu.make_async_copy(
                A_ref.at[pl.ds(k * P, P)], qa_buf.at[slot],
                dma_sems.at[slot],
            ).start()

        start(0, 0)

        def step(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < m // P)
            def _():
                start(k + 1, jax.lax.rem(k + 1, 2))

            pltpu.make_async_copy(
                A_ref.at[pl.ds(k * P, P)], qa_buf.at[slot],
                dma_sems.at[slot],
            ).wait()
            panel = qa_buf[slot]
            wrows = w_ref[pl.ds(k * P, P), :]
            for p in range(P):
                arow = panel[p]
                wa = wrows[p:p + 1] * arow
                for c in range(n // rch):
                    seg = jax.lax.slice(
                        wa, (c * rch, 0), (c * rch + rch, LANES))
                    M_s[pl.ds(c * rch, rch), :, :] = (
                        M_s[pl.ds(c * rch, rch), :, :]
                        + seg[:, None, :] * arow[None, :, :]
                    )
            return 0

        jax.lax.fori_loop(0, m // P, step, 0)

        def rs(i, _):
            out_ref[pl.ds(i, 1), :] = jnp.sum(
                M_s[pl.ds(i, 1), :, :][0], axis=0, keepdims=True
            )
            return 0

        jax.lax.fori_loop(0, n, rs, 0)

    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((m, LANES), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, LANES), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, LANES), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n, n, LANES), jnp.float32),
                pltpu.VMEM((2, P, n, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(A, w)


def main():
    rng = np.random.default_rng(0)
    for n in (128, 224, 256):
        seed = rng.random(LANES).astype(np.float32)
        got = np.asarray(scratch_probe(jnp.asarray(seed[None]), n, 32))
        want = expected(seed, n)
        err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
        print(f"n={n}: scratch {(n*n*LANES*4)/2**20:.1f} MB  rel err "
              f"{err:.2e}  {'OK' if err < 1e-5 else 'CORRUPT'}",
              flush=True)
    for n in (128, 224, 256):
        m = n * 3 // 2
        A = rng.standard_normal((m, n, LANES)).astype(np.float32)
        w = rng.random((m, LANES)).astype(np.float32) + 0.5
        got = np.asarray(dma_probe(jnp.asarray(A), jnp.asarray(w),
                                   n, m, 16, 32))
        want = np.einsum("mnl,ml,mkl->nl", A, w, A, optimize=True).astype(
            np.float32)
        err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
        print(f"n={n} dma-sweep: rel err {err:.2e}  "
              f"{'OK' if err < 1e-3 else 'CORRUPT'}", flush=True)


if __name__ == "__main__":
    main()
