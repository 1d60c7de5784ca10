"""Fused Pallas TPU solve kernel: the whole P-ALM iteration loop in VMEM.

Why this exists.  The vmapped XLA solve loop (solver/core.py) spends ~8 ms
per lockstep iteration at B=512, n=64: XLA's batched Cholesky alone is
~5 ms, the batched triangular solves ~2 ms, and each while_loop trip adds
~5 ms of dispatch overhead on this TPU stack — against ~0.1 ms of actual
arithmetic at VPU speed.  This kernel runs T solver iterations per
`pallas_call` with every operand VMEM-resident, in a lane-last layout
((n, n, LANES) etc., LANES=128 = the VPU lane width), so that

  * the Schur assembly, Cholesky, triangular solves and matvecs are
    column-sweep `fori_loop`s whose every step is a full-width (.., 128)
    VPU op vectorized across 128 problems at once;
  * the exact linesearch is the sort-free safeguarded-Newton/bisection
    form (solver/linesearch.py linesearch_bisection) — sorts don't
    vectorize across lanes, hinge evaluations do;
  * there is ONE device program for the whole chunk: no per-iteration
    dispatch, no HBM round-trips for state.

Semantics: identical to solver/core.py (reference src/qpalm.c:484-711) for
the SCHUR/convex configuration — proximal, any scaling (Ruiz runs outside;
the kernel gets per-lane Dinv/Einv/cinv for the termination norms), warm
starts, BOTH infeasibility certificates computed in-kernel
(termination.c:136-240) with the Farkas vectors returned per lane, and
nonconvex solves (per-lane LOBPCG gamma pins as `_GAMMA`/`_GAMMA_MAX`
scalar rows, the eps_k proximal-center ladder in `_EPSK_*` rows,
nonconvex.c:171-183 + qpalm.c:586-609), and dual-objective termination
(in-kernel Q-Cholesky + solve on outer trips, iteration.c:272-299).
Out of scope (use the general solver): KKT/CG/STAGE factorization modes.
`solve_batch_fused` wires the kernel into the stacked-batch flow.

Reference anchors: iteration math src/iteration.c:24-229, termination
src/termination.c:44-129, Newton src/newton.c:96-113 (Schur path),
linesearch src/linesearch.c:14-120.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..types import QPData, Settings

LANES = 128  # problems per kernel program (= VPU lane width)

# Streaming-kernel admission walls (both hardware-validated on a v5e):
#   ALIAS_WALL  — largest n_pad where the input_output_aliases program is
#                 validated (round-3 smoke: exact fused/XLA parity at 224;
#                 256 with aliases silently corrupts — 83/128 NaN lanes).
#   STREAM_WALL — largest n_pad for the alias-FREE variant (round-4
#                 bisect: dropping the 16 input_output_aliases fixes the
#                 corruption entirely; 232/256/288/320/352 all run clean
#                 with 128/128 f64-KKT-checked solves, and 384 fails
#                 LOUDLY at Mosaic compile, so there is no silent hazard
#                 past this wall).  fused_chunk auto-selects the no-alias
#                 program for n_pad > ALIAS_WALL.
ALIAS_WALL = 224
STREAM_WALL = 352

# scalar-state rows (SC ref layout, one row per per-lane scalar)
_GAMMA, _EPSA_IN, _EPSR_IN, _DONE, _ITER, _PREV_ITER, _NO_CHANGE, \
    _GAMMA_MAXED, _ITER_OUT, _GERSH, _NB_CHANGED, _PRI_NORM, _DUA_NORM, \
    _STATUS, _GAMMA_MAX, _EPSK_ABS, _EPSK_REL, _COBJ, _SC_ROWS = range(19)


def _row_chunk(n: int) -> int:
    """Static row-chunk height for the streaming kernel's full-matrix
    updates: the largest multiple of 8 dividing n with at least ~6 chunks,
    so Mosaic's per-statement stack temporary is (RCH, n, LANES) instead
    of (n, n, LANES)."""
    rch = 8
    for r in range(8, max(n // 6, 8) + 1, 8):
        if n % r == 0:
            rch = r
    return rch


def pick_qa_panel(n_pad: int, m_pad: int, alias: bool = None) -> int:
    """Fused-kernel memory plan for a padded (n, m) shape.

    Returns 0 when the whole working set (Q, A, M scratch, state) fits the
    all-VMEM kernel budget; a panel height P > 0 when only the Schur matrix
    and vector state fit VMEM and Q/A must stream from HBM in P-row panels
    (double-buffered DMA); -1 when even the Schur matrix blows the budget
    (the batch router then falls back to the XLA loop).  This is the one
    seam deciding the VMEM wall the reference never has (its LADEL factor
    lives in host memory, SURVEY §3.2)."""
    if (2 * n_pad * n_pad + n_pad * m_pad) * LANES * 4 <= 11 * 2**20:
        return 0
    for P in (16, 8):
        if n_pad % P or m_pad % P:
            continue
        # vector-state footprint: the aliased tier shares in/out buffers
        # (12n + 13m rows); the no-alias tier past ALIAS_WALL doubles the
        # 8 n-row and 7 m-row state leaves (20n + 20m rows).  `alias=None`
        # derives the tier from the wall; fused_chunk passes its EFFECTIVE
        # alias choice so a forced alias=False below the wall is budgeted
        # against the doubled no-alias footprint it actually uses.
        eff_alias = (n_pad <= ALIAS_WALL) if alias is None else alias
        if eff_alias:
            vec_rows = 12 * n_pad + 13 * m_pad
        else:
            vec_rows = 20 * n_pad + 20 * m_pad
        vmem = (
            n_pad * n_pad            # M_s (Schur factor scratch)
            + _row_chunk(n_pad) * n_pad  # Mosaic stack temp: the rank-1
                                     # updates are row-chunked in
                                     # streaming mode, bounding every
                                     # full-matrix temporary to
                                     # (RCH, n, LANES)
            + 2 * P * n_pad          # double-buffered Q/A panel
            + vec_rows + 2 * _SC_ROWS  # vector state
        ) * LANES * 4
        # streaming kernels compile with an adaptive vmem_limit (plan
        # + 25% headroom).  Admission is gated on BOTH the plan bytes and
        # the n_pad walls — HARDWARE-VALIDATED boundaries, not the
        # physical 128 MB:
        #   * n_pad <= ALIAS_WALL (224, plan <= 38 MB): the aliased
        #     program, round-3-validated with exact fused/XLA status
        #     parity (benchmarks/SMOKE_TPU_r03.txt).
        #   * ALIAS_WALL < n_pad <= STREAM_WALL (352, plan <= 80 MB):
        #     the alias-free program fused_chunk auto-selects in this
        #     tier.  Round-4 bisect: with the 16 input_output_aliases the
        #     n_pad=256 kernel Mosaic-compiles but silently corrupts
        #     state (83/128 NaN lanes; interpret mode clean; the round-3
        #     scratch/DMA probes all passed — scripts/probe_n256.py,
        #     probe_mosaic_scratch.py); WITHOUT the aliases the same
        #     kernel runs clean at 232(P=8)/256/288/320/352, every lane
        #     f64-KKT-checked, and n_pad=384 (plan ~96 MB) fails loudly
        #     at Mosaic compile — no silent hazard past the wall.
        # Shapes past STREAM_WALL fall back to the XLA loop.
        cap = (38 if n_pad <= ALIAS_WALL else 82) * 2**20
        if n_pad <= STREAM_WALL and vmem <= cap:
            return P
    return -1


def _make_kernel(n: int, m: int, T: int, s: Settings, qa_panel: int = 0,
                 alias: bool = True):
    """Build the kernel body for static (n, m, chunk length, settings).

    `qa_panel` 0 keeps Q and A VMEM-resident; P > 0 leaves them in HBM and
    streams P-row panels through a shared double-buffered VMEM scratch —
    every Q/A access in the solver is a sequential row sweep (matvecs,
    Schur assembly), so streaming only re-shapes those sweeps and leaves
    the parity-critical iteration logic untouched.

    `alias` False builds the no-input_output_aliases variant: the state
    outputs are fresh buffers and the kernel copies each state input into
    its output ref before iterating (one ~2 MB VMEM copy per call —
    noise).  This exists because the 16-alias program is the prime
    suspect for the n_pad=256 silent corruption (the round-3 probes ruled
    out raw VMEM pressure and the DMA primitives, and the >8-call alias
    mis-routing documented at MAX_LANES_PER_CALL is the same bug class)."""
    eps_abs = float(s.eps_abs)
    eps_rel = float(s.eps_rel)
    eps_pinf = float(s.eps_prim_inf)
    eps_dinf = float(s.eps_dual_inf)
    scaling_on = bool(s.scaling)
    rho = float(s.rho)
    theta = float(s.theta)
    delta = float(s.delta)
    sigma_max = float(s.sigma_max)
    gamma_upd = float(s.gamma_upd)
    inner_max_iter = int(s.inner_max_iter)
    max_iter = int(s.max_iter)
    proximal = bool(s.proximal)
    nonconvex = bool(s.nonconvex)  # implies proximal (wrapper enforces)
    enable_dual = bool(s.enable_dual_termination)
    dual_limit = float(s.dual_objective_limit)

    def pick(vec_ref_val, iota, k):
        """Row k of a (rows, LANES) value as (1, LANES) via masked reduce."""
        return jnp.sum(jnp.where(iota == k, vec_ref_val, 0.0), axis=0,
                       keepdims=True)

    P = int(qa_panel)

    def kernel(Q_ref, A_ref, q_ref, bmin_ref, bmax_ref, Dinv_ref, Einv_ref,
               cinv_ref,
               _xi, _x0i, _Qxi, _yi, _Axi, _sigi, _prini, _actoldi, _sci,
               _atyi, _xpi, _tqdi, _tadi, _tdi, _certyi, _certxi,
               x_ref, x0_ref, Qx_ref, y_ref, Ax_ref, sig_ref, prin_ref,
               actold_ref, sc_ref,
               aty_ref, xprev_ref, tqd_ref, tad_ref, td_ref,
               certy_ref, certx_ref,
               M_s, d_s, yh_s, w_s, Qd_s, Ad_s, *qa_scratch):
        # With alias=True the state inputs alias the state outputs
        # buffer-for-buffer (input_output_aliases below), so the kernel
        # reads and writes through the out refs only; the *_i refs are the
        # same memory.  With alias=False the out refs are fresh buffers,
        # seeded from the input refs here.
        if not alias:
            for src, dst in (
                (_xi, x_ref), (_x0i, x0_ref), (_Qxi, Qx_ref), (_yi, y_ref),
                (_Axi, Ax_ref), (_sigi, sig_ref), (_prini, prin_ref),
                (_actoldi, actold_ref), (_sci, sc_ref), (_atyi, aty_ref),
                (_xpi, xprev_ref), (_tqdi, tqd_ref), (_tadi, tad_ref),
                (_tdi, td_ref), (_certyi, certy_ref), (_certxi, certx_ref),
            ):
                dst[:] = src[:]
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)
        q = q_ref[:]
        bmin = bmin_ref[:]
        bmax = bmax_ref[:]
        Dinv = Dinv_ref[:]
        Einv = Einv_ref[:]
        cinv = cinv_ref[:]

        if P:
            qa_buf, dma_sems = qa_scratch

            def sweep(src_ref, nrows, body):
                """Double-buffered P-row panel sweep of an HBM operand:
                DMA panel k+1 into the other slot while body(k, panel)
                consumes panel k.  Panels are (P, n, LANES) values."""
                nP = nrows // P

                def start(k, slot):
                    pltpu.make_async_copy(
                        src_ref.at[pl.ds(k * P, P)], qa_buf.at[slot],
                        dma_sems.at[slot],
                    ).start()

                start(0, 0)

                def step(k, _):
                    slot = jax.lax.rem(k, 2)

                    @pl.when(k + 1 < nP)
                    def _():
                        start(k + 1, jax.lax.rem(k + 1, 2))

                    pltpu.make_async_copy(
                        src_ref.at[pl.ds(k * P, P)], qa_buf.at[slot],
                        dma_sems.at[slot],
                    ).wait()
                    body(k, qa_buf[slot])
                    return 0

                jax.lax.fori_loop(0, nP, step, 0)

            def matvec_At(vsrc_ref, out_ref):
                """out (n, LANES) = A' @ vsrc, A streamed in panels."""
                out_ref[:] = jnp.zeros((n, LANES), jnp.float32)

                def body(k, panel):
                    vrows = vsrc_ref[pl.ds(k * P, P), :]     # (P, LANES)
                    out_ref[:] = out_ref[:] + jnp.sum(
                        panel * vrows[:, None, :], axis=0
                    )

                sweep(A_ref, m, body)

            def matvec_A(vsrc_ref, out_ref):
                """out (m, LANES) = A @ vsrc, A streamed in panels."""
                def body(k, panel):
                    out_ref[pl.ds(k * P, P), :] = jnp.sum(
                        panel * vsrc_ref[:][None, :, :], axis=1
                    )

                sweep(A_ref, m, body)

            def matvec_Q(vsrc_ref, out_ref):
                """out (n, LANES) = Q @ vsrc, Q streamed in panels."""
                def body(k, panel):
                    out_ref[pl.ds(k * P, P), :] = jnp.sum(
                        panel * vsrc_ref[:][None, :, :], axis=1
                    )

                sweep(Q_ref, n, body)

            def set_Ms_from_Q():
                def body(k, panel):
                    M_s[pl.ds(k * P, P), :, :] = panel

                sweep(Q_ref, n, body)
        else:
            def matvec_At(vsrc_ref, out_ref):
                """out (n, LANES) = A' @ vsrc, lane-vectorized."""
                out_ref[:] = jnp.zeros((n, LANES), jnp.float32)

                def step(mi, _):
                    arow = A_ref[pl.ds(mi, 1), :, :][0]      # (n, LANES)
                    vrow = vsrc_ref[pl.ds(mi, 1), :]         # (1, LANES)
                    out_ref[:] = out_ref[:] + arow * vrow
                    return 0

                jax.lax.fori_loop(0, m, step, 0)

            def matvec_A(vsrc_ref, out_ref):
                """out (m, LANES) = A @ vsrc, lane-vectorized."""
                def step(mi, _):
                    arow = A_ref[pl.ds(mi, 1), :, :][0]      # (n, LANES)
                    out_ref[pl.ds(mi, 1), :] = jnp.sum(
                        arow * vsrc_ref[:], axis=0, keepdims=True
                    )
                    return 0

                jax.lax.fori_loop(0, m, step, 0)

            def matvec_Q(vsrc_ref, out_ref):
                """out (n, LANES) = Q @ vsrc (Q symmetric, row sweep)."""
                def step(i, _):
                    qrow = Q_ref[pl.ds(i, 1), :, :][0]       # (n, LANES)
                    out_ref[pl.ds(i, 1), :] = jnp.sum(
                        qrow * vsrc_ref[:], axis=0, keepdims=True
                    )
                    return 0

                jax.lax.fori_loop(0, n, step, 0)

            def set_Ms_from_Q():
                M_s[:] = Q_ref[:]

        # Row-chunked full-matrix updates (streaming mode only): a whole-
        # matrix expression like `M_s[:] -= rt[:,None,:]*rt[None,:,:]`
        # makes Mosaic stack-allocate an (n, n, LANES) temporary — at
        # n_pad >= 256 that temporary alone is 32 MB and the compiled
        # kernel corrupts state near the VMEM ceiling (2026-08-19 bisect).
        # Chunking the i-axis into static RCH-row blocks bounds every
        # temporary to (RCH, n, LANES); the all-VMEM tier (n_pad <= ~80)
        # keeps the unchunked single-statement form.
        if P:
            RCH = _row_chunk(n)
            NCH = n // RCH

        def chol_solve_Ms_ds():
            """Factor M_s in place (upper R, R'R = M, lane-vectorized) and
            solve M_s x = d_s in place."""
            def chol(k, _):
                row = M_s[pl.ds(k, 1), :, :][0]              # (n, LANES)
                akk = pick(row, iota_n, k)                   # (1, LANES)
                inv = jax.lax.rsqrt(akk)
                row = row * inv
                rt = jnp.where(iota_n > k, row, 0.0)
                if P:
                    for c in range(NCH):
                        seg = jax.lax.slice(
                            rt, (c * RCH, 0), (c * RCH + RCH, LANES))
                        M_s[pl.ds(c * RCH, RCH), :, :] = (
                            M_s[pl.ds(c * RCH, RCH), :, :]
                            - seg[:, None, :] * rt[None, :, :]
                        )
                else:
                    M_s[:] = M_s[:] - rt[:, None, :] * rt[None, :, :]
                M_s[pl.ds(k, 1), :, :] = jnp.where(iota_n >= k, row, 0.0)[
                    None
                ]
                return 0

            jax.lax.fori_loop(0, n, chol, 0)

            # forward substitution L z = b with L = R' (z overwrites d_s)
            def fwd(j, _):
                rrow = M_s[pl.ds(j, 1), :, :][0]             # (n, LANES)
                rjj = pick(rrow, iota_n, j)
                bj = d_s[pl.ds(j, 1), :] / rjj
                d_s[:] = d_s[:] - bj * jnp.where(iota_n > j, rrow, 0.0)
                d_s[pl.ds(j, 1), :] = bj
                return 0

            jax.lax.fori_loop(0, n, fwd, 0)

            # backward substitution R x = z
            def bwd(t, _):
                k = n - 1 - t
                rrow = M_s[pl.ds(k, 1), :, :][0]
                rkk = pick(rrow, iota_n, k)
                dot = jnp.sum(
                    jnp.where(iota_n > k, rrow, 0.0) * d_s[:], axis=0,
                    keepdims=True,
                )
                d_s[pl.ds(k, 1), :] = (d_s[pl.ds(k, 1), :] - dot) / rkk
                return 0

            jax.lax.fori_loop(0, n, bwd, 0)

        def newton_solve(gamma_inv):
            """M = Q + A'diag(w)A (+ gamma_inv I); d = M^{-1} (-dphi).
            w_s holds the masked sigma, d_s holds -dphi on entry and the
            direction on exit.  Returns the Gershgorin bound of A'WA."""
            if P:
                # streaming order: assemble A'WA first so the Gershgorin
                # bound reads it directly (no second Q pass), then add the
                # streamed Q panels — same math, different f32 rounding
                # than the VMEM path's (Q + A'WA) - Q
                M_s[:] = jnp.zeros((n, n, LANES), jnp.float32)

                def asm(k, panel):
                    wrows = w_s[pl.ds(k * P, P), :]          # (P, LANES)
                    for p in range(P):
                        arow = panel[p]                      # (n, LANES)
                        wa = wrows[p:p + 1] * arow           # (n, LANES)
                        for c in range(NCH):
                            seg = jax.lax.slice(
                                wa, (c * RCH, 0), (c * RCH + RCH, LANES))
                            M_s[pl.ds(c * RCH, RCH), :, :] = (
                                M_s[pl.ds(c * RCH, RCH), :, :]
                                + seg[:, None, :] * arow[None, :, :]
                            )

                sweep(A_ref, m, asm)
                gersh = jnp.zeros((1, LANES), jnp.float32)
                for c in range(NCH):
                    blk = M_s[pl.ds(c * RCH, RCH), :, :]     # (RCH,n,LANES)
                    gersh = jnp.maximum(
                        gersh,
                        jnp.max(jnp.sum(jnp.abs(blk), axis=1), axis=0,
                                keepdims=True),
                    )                                        # (1, LANES)

                def addq(k, panel):
                    M_s[pl.ds(k * P, P), :, :] = (
                        M_s[pl.ds(k * P, P), :, :] + panel
                    )

                sweep(Q_ref, n, addq)
            else:
                M_s[:] = Q_ref[:]

                def asm(mi, _):
                    arow = A_ref[pl.ds(mi, 1), :, :][0]      # (n, LANES)
                    wrow = w_s[pl.ds(mi, 1), :]              # (1, LANES)
                    M_s[:] = M_s[:] + (wrow * arow)[:, None, :] \
                        * arow[None, :, :]
                    return 0

                jax.lax.fori_loop(0, m, asm, 0)
                # Gershgorin upper bound of A'WA = M - Q: all entries of a
                # PSD Gram matrix row; diagonal is >= 0 so plain |.| row
                # sums work
                G = M_s[:] - Q_ref[:]
                gersh = jnp.max(jnp.sum(jnp.abs(G), axis=1), axis=0,
                                keepdims=True)               # (1, LANES)
            if proximal and P:
                for c in range(NCH):
                    eyef = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (RCH, n, 1), 0) + c * RCH
                        == jax.lax.broadcasted_iota(
                            jnp.int32, (RCH, n, 1), 1)
                    ).astype(jnp.float32)
                    M_s[pl.ds(c * RCH, RCH), :, :] = (
                        M_s[pl.ds(c * RCH, RCH), :, :]
                        + eyef * gamma_inv[None, :, :]
                    )
            elif proximal:
                # 3-D iota from the start: Mosaic cannot reshape i1
                # vectors to add a minor dim, so the mask is built f32
                eyef = (
                    jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
                ).astype(jnp.float32)
                M_s[:] = M_s[:] + eyef * gamma_inv[None, :, :]

            chol_solve_Ms_ds()
            return gersh

        def linesearch(eta, beta, sqs, Ad, Ax, y, sig):
            """Sort-free exact linesearch (linesearch_bisection twin).
            All operands (m, LANES) / (1, LANES); returns tau (1, LANES)."""
            sad = sqs * Ad
            alo = (y + sig * (Ax - bmin)) / sqs
            ahi = (-y + sig * (bmax - Ax)) / sqs
            tiny = jnp.float32(np.finfo(np.float32).tiny)

            def ab_at(tau):
                # hinge sums over both breakpoint families
                act1 = (-sad * tau - alo) > 0
                act2 = (sad * tau - ahi) > 0
                dd = sad * sad
                a = eta + jnp.sum(
                    jnp.where(act1, dd, 0.0) + jnp.where(act2, dd, 0.0),
                    axis=0, keepdims=True,
                )
                b = beta - jnp.sum(
                    jnp.where(act1, -sad * alo, 0.0)
                    + jnp.where(act2, sad * ahi, 0.0),
                    axis=0, keepdims=True,
                )
                return a, b

            a0, b0 = ab_at(tiny)
            big = jnp.float32(1e30)
            s1 = alo / (-sad)
            s2 = ahi / sad
            smax = jnp.maximum(
                jnp.max(jnp.where((s1 > 0) & (s1 < big), s1, 0.0),
                        axis=0, keepdims=True),
                jnp.max(jnp.where((s2 > 0) & (s2 < big), s2, 0.0),
                        axis=0, keepdims=True),
            )
            actf1 = -sad > 0
            actf2 = sad > 0
            dd = sad * sad
            a_fin = eta + jnp.sum(
                jnp.where(actf1, dd, 0.0) + jnp.where(actf2, dd, 0.0),
                axis=0, keepdims=True,
            )
            b_fin = beta - jnp.sum(
                jnp.where(actf1, -sad * alo, 0.0)
                + jnp.where(actf2, sad * ahi, 0.0),
                axis=0, keepdims=True,
            )
            tau_fin = -b_fin / jnp.maximum(a_fin, tiny)
            hi = jnp.maximum(jnp.maximum(smax, tau_fin), 1.0) * 1.01 + 1.0
            lo = jnp.zeros_like(hi)
            tau0 = jnp.minimum(-b0 / jnp.maximum(a0, tiny), hi)
            tau0 = jnp.where(tau0 > 0, tau0, 0.5 * hi)

            def bstep(_, state):
                lo, hi, tau = state
                a, b = ab_at(tau)
                prop = -b / jnp.maximum(a, tiny)
                mid = 0.5 * (lo + hi)
                prop = jnp.where((prop > lo) & (prop < hi), prop, mid)
                pa, pb = ab_at(prop)
                pos = pa * prop + pb > 0
                return (
                    jnp.where(pos, lo, prop),
                    jnp.where(pos, prop, hi),
                    prop,
                )

            lo, hi, tau = jax.lax.fori_loop(0, 26, bstep, (lo, hi, tau0))
            a, b = ab_at(tau)
            tau_star = -b / jnp.maximum(a, tiny)
            return jnp.where(a0 * tiny + b0 > 0, -b0 / a0, tau_star)

        def iteration(t, _):
            # predicated early exit: once every lane in the block is done,
            # the remaining fori trips execute nothing (a fori_loop cannot
            # break, but a skipped body is nearly free)
            @pl.when(jnp.min(sc_ref[pl.ds(_DONE, 1), :]) < 0.5)
            def _body():
                _iteration_body(t)

            return 0

        def _iteration_body(t):
            x = x_ref[:]
            x0 = x0_ref[:]
            Qx = Qx_ref[:]
            y = y_ref[:]
            Ax = Ax_ref[:]
            sig = sig_ref[:]
            sc = sc_ref[:]
            gamma = sc[_GAMMA][None]                           # (1, LANES)
            done = sc[_DONE][None] > 0.5

            # ---- residuals (iteration.c:24-48) ----
            sinv = 1.0 / sig
            Axys = Ax + y * sinv
            z = jnp.clip(Axys, bmin, bmax)
            pri_res = Ax - z
            yh = y + sig * pri_res
            yh_s[:] = yh
            df = Qx + q
            if proximal:
                df = df - x0 / gamma
            matvec_At(yh_s, d_s)                               # d_s = A'yh
            Atyh = d_s[:]
            dphi = df + Atyh

            # ---- termination (termination.c:44-129) ----
            pri_norm = jnp.max(jnp.abs(Einv * pri_res), axis=0, keepdims=True)
            if proximal:
                dd_ = dphi - (x - x0) / gamma
            else:
                dd_ = dphi
            dua_norm = jnp.max(jnp.abs(Dinv * dd_), axis=0, keepdims=True) \
                * cinv
            dua2_norm = jnp.max(jnp.abs(Dinv * dphi), axis=0, keepdims=True) \
                * cinv
            axz_max = jnp.maximum(
                jnp.max(jnp.abs(Einv * Ax), axis=0, keepdims=True),
                jnp.max(jnp.abs(Einv * z), axis=0, keepdims=True),
            )
            eps_pri = eps_abs + eps_rel * axz_max
            max_norm = jnp.maximum(
                jnp.max(jnp.abs(Dinv * Qx), axis=0, keepdims=True),
                jnp.maximum(
                    jnp.max(jnp.abs(Dinv * q), axis=0, keepdims=True),
                    jnp.max(jnp.abs(Dinv * Atyh), axis=0, keepdims=True),
                ),
            ) * cinv
            eps_dua = eps_abs + eps_rel * max_norm
            eps_dua_in = sc[_EPSA_IN][None] + sc[_EPSR_IN][None] * max_norm

            solved = (pri_norm < eps_pri) & (dua_norm < eps_dua) & ~done

            # ---- infeasibility certificates (termination.c:136-240) ----
            # cert refs are aliased state (zeroed at init, carried across
            # chunked calls so a certificate found in an earlier chunk
            # survives)

            Ev = 1.0 / Einv
            Dv = 1.0 / Dinv
            cfac = 1.0 / cinv
            dy = yh - y
            eps_p = eps_pinf * jnp.max(jnp.abs(Ev * dy), axis=0,
                                       keepdims=True)
            At_dy = Dinv * (Atyh - aty_ref[:])
            has_ub = bmax < Ev * jnp.float32(C.QPALM_INFTY)
            has_lb = bmin > -Ev * jnp.float32(C.QPALM_INFTY)
            oob = jnp.sum(
                jnp.where(has_ub, bmax * jnp.maximum(dy, 0.0), 0.0)
                + jnp.where(has_lb, bmin * jnp.minimum(dy, 0.0), 0.0),
                axis=0, keepdims=True,
            )
            pinf = (
                (eps_p > 0)
                & (jnp.max(jnp.abs(At_dy), axis=0, keepdims=True) <= eps_p)
                & (oob <= -eps_p)
                & ~done & ~solved
            )

            dx = x - xprev_ref[:]
            Ddx = Dv * dx
            eps_d = eps_dinf * jnp.max(jnp.abs(Ddx), axis=0, keepdims=True)
            dxdx = jnp.sum(Ddx * Ddx, axis=0, keepdims=True)
            A_dx = Einv * tad_ref[:]
            viol = jnp.max(
                jnp.where(has_ub & (A_dx >= eps_d), 1.0, 0.0)
                + jnp.where(has_lb & (A_dx <= -eps_d), 1.0, 0.0),
                axis=0, keepdims=True,
            ) > 0.5
            dxQdx = jnp.sum(dx * tqd_ref[:], axis=0, keepdims=True)
            e2 = jnp.float32(eps_dinf * eps_dinf)
            cs = cfac if scaling_on else jnp.ones_like(cfac)
            qdx = jnp.sum(q * dx, axis=0, keepdims=True)
            curv = (dxQdx <= -cs * e2 * dxdx) | (
                (dxQdx <= cs * e2 * dxdx) & (qdx <= -cs * eps_d)
            )
            dinf = (eps_d > 0) & ~viol & curv & ~done & ~solved & ~pinf

            do_term = solved | pinf | dinf
            certy_ref[:] = jnp.where(pinf, Ev * (cinv * dy), certy_ref[:])
            certx_ref[:] = jnp.where(dinf, Dv * dx, certx_ref[:])

            subproblem_done = dua2_norm <= eps_dua_in
            outer_trigger = subproblem_done | (sc[_NO_CHANGE][None] >= 3)
            exhausted = sc[_ITER][None] == (
                sc[_PREV_ITER][None] + inner_max_iter
            )
            live = ~done & ~do_term & (sc[_ITER][None] < max_iter)
            b_outer = live & outer_trigger
            b_exh = live & ~outer_trigger & exhausted
            b_inner = live & ~outer_trigger & ~exhausted
            b_sig = b_outer | b_exh

            # ---- sigma update (iteration.c:86-145), outer/exhausted ----
            pn_uns = jnp.max(jnp.abs(pri_res), axis=0, keepdims=True)
            sig_enabled = b_sig & (sc[_ITER_OUT][None] > 0) \
                & (pri_norm > eps_pri)
            cond_k = sig_enabled & (
                jnp.abs(pri_res) > theta * jnp.abs(prin_ref[:])
            ) & (actold_ref[:] > 0.5)
            mult = jnp.maximum(1.0, delta * jnp.abs(pri_res) / (pn_uns + 1e-6))
            sig_new = jnp.where(
                cond_k, jnp.minimum(mult * sig, sigma_max), sig
            )

            # ---- outer update (qpalm.c:515-644) ----
            y_new = jnp.where(b_outer, yh, y)
            epsa_new = jnp.where(
                b_outer, jnp.maximum(eps_abs, rho * sc[_EPSA_IN][None]),
                sc[_EPSA_IN][None],
            )
            epsr_new = jnp.where(
                b_outer, jnp.maximum(eps_rel, rho * sc[_EPSR_IN][None]),
                sc[_EPSR_IN][None],
            )

            if enable_dual:
                # dual-objective termination on outer trips (core.py
                # compute_dual_objective / reference iteration.c:272-299,
                # checked at qpalm.c's subproblem-converged branch):
                # v = Q^{-1} g with g = A'yh + q (assumes Q PD — a
                # non-PD Q NaNs the comparison and never terminates, the
                # reference's own caveat).  Reuses M_s/d_s, which the
                # Newton step below rebuilds from scratch anyway.
                g_dual = Atyh + q
                set_Ms_from_Q()
                d_s[:] = g_dual
                chol_solve_Ms_ds()
                g_v = jnp.sum(g_dual * d_s[:], axis=0, keepdims=True)
                contrib = jnp.sum(
                    jnp.where(yh > 0, yh * bmax, yh * bmin),
                    axis=0, keepdims=True,
                )
                dobj = (-0.5 * g_v - contrib) * cinv + sc[_COBJ][None]
                # NaN-guard (PSD-singular Q NaNs the Q-Cholesky): the
                # check must deterministically not fire on non-finite
                # dual objectives
                dual_term = (
                    b_outer
                    & jnp.isfinite(dobj)
                    & (dobj > jnp.float32(dual_limit))
                )
            else:
                dual_term = jnp.zeros_like(b_outer)

            gamma_new = gamma
            Qx_g = Qx
            actold_after = actold_ref[:]
            nbch_new = sc[_NB_CHANGED][None]
            gmaxed_new = sc[_GAMMA_MAXED][None]
            epsk_abs_new = sc[_EPSK_ABS][None]
            epsk_rel_new = sc[_EPSK_REL][None]
            gmax_l = sc[_GAMMA_MAX][None]  # per-lane gamma cap
            x0_new = x0
            if nonconvex:
                # nonconvex mode (per-lane gamma pinned by the wrapper's
                # LOBPCG, nonconvex.c:171-183): NO gamma boost; the proximal
                # center moves only once pri_res has caught up with its own
                # shrinking tolerance ladder (qpalm.c:586-609)
                eps_k = epsk_abs_new + epsk_rel_new * axz_max
                move = b_outer & (pri_norm < eps_k)
                epsk_abs_new = jnp.where(
                    move, jnp.maximum(eps_abs, rho * epsk_abs_new),
                    epsk_abs_new,
                )
                epsk_rel_new = jnp.where(
                    move, jnp.maximum(eps_rel, rho * epsk_rel_new),
                    epsk_rel_new,
                )
                x0_new = jnp.where(move, x, x0)
                # exhausted trips still step gamma toward the per-lane cap
                # (qpalm.c:647-660 -> update_gamma); pinned lanes sit at
                # gamma == gamma_max so this is a no-op for them
                g_exh = jnp.where(
                    gamma < gmax_l,
                    jnp.minimum(gamma * gamma_upd, gmax_l), gamma,
                )
                gamma_new = jnp.where(b_exh, g_exh, gamma)
                diff = 1.0 / gamma_new - 1.0 / gamma
                Qx_g = jnp.where(b_exh & (gamma_new != gamma),
                                 Qx + diff * x, Qx)
            elif proximal:
                # boost when the active set has settled (qpalm.c:612-630)
                check = b_outer & (gmaxed_new < 0.5) \
                    & (sc[_ITER_OUT][None] > 0) \
                    & (sc[_NB_CHANGED][None] < 0.5) & (pri_norm < eps_pri)
                sinv2 = 1.0 / sig_new
                Axys2 = Ax + y_new * sinv2
                act2 = ((Axys2 <= bmin) | (Axys2 >= bmax)).astype(jnp.float32)
                nb2 = jnp.sum(
                    jnp.abs(act2 - actold_ref[:]), axis=0, keepdims=True
                )
                nact2 = jnp.sum(act2, axis=0, keepdims=True)
                boost = check & (nb2 < 0.5)
                boosted = jnp.where(
                    nact2 > 0.5,
                    jnp.maximum(
                        gmax_l, 1e14 / jnp.maximum(sc[_GERSH][None], 1e-30)
                    ),
                    jnp.float32(1e12),
                )
                stepped = jnp.where(
                    gamma < gmax_l,
                    jnp.minimum(gamma * gamma_upd, gmax_l),
                    gamma,
                )
                g_out = jnp.where(boost, boosted, stepped)
                g_exh = jnp.where(
                    gamma < gmax_l,
                    jnp.minimum(gamma * gamma_upd, gmax_l),
                    gamma,
                )
                gamma_new = jnp.where(
                    b_outer, g_out, jnp.where(b_exh, g_exh, gamma)
                )
                diff = 1.0 / gamma_new - 1.0 / gamma
                Qx_g = jnp.where(b_sig & (gamma_new != gamma),
                                 Qx + diff * x, Qx)
                gmaxed_new = jnp.where(
                    boost & (nact2 > 0.5), jnp.float32(1.0), gmaxed_new
                )
                # the boost check overwrites the active-set DIFF
                # (qpalm.c:617-618 side effect) but NOT the active_old
                # baseline (newton.c:116 copies it only at the end of a
                # newton step)
                nbch_new = jnp.where(check, jnp.minimum(nb2, 1.0), nbch_new)
                x0_new = jnp.where(b_sig, x, x0)

            prin_new = jnp.where(b_sig, pri_res, prin_ref[:])
            iter_out_new = sc[_ITER_OUT][None] + b_sig.astype(jnp.float32)
            prev_iter_new = jnp.where(
                b_sig, sc[_ITER][None], sc[_PREV_ITER][None]
            )
            no_change_after_outer = jnp.where(
                b_sig, jnp.float32(0.0), sc[_NO_CHANGE][None]
            )

            # ---- inner newton step (qpalm.c:662-678) ----
            active = ((Axys <= bmin) | (Axys >= bmax)).astype(jnp.float32)
            nb_inner = jnp.sum(
                jnp.abs(active - actold_ref[:]), axis=0, keepdims=True
            )
            # the stall counter reads the PREVIOUS newton step's
            # enter/leave count (reference qpalm.c:664-665; the current
            # trip's diff is stored for the NEXT trip below)
            no_change_new = jnp.where(
                b_inner,
                jnp.where(nbch_new > 0.5, 0.0, no_change_after_outer + 1.0),
                no_change_after_outer,
            )
            actold_new = jnp.where(b_inner, active, actold_after)
            nbch_final = jnp.where(
                b_inner, jnp.minimum(nb_inner, 1.0), nbch_new
            )

            # Newton solve runs for every lane (vmap-style: masked apply)
            w_s[:] = active * sig_new
            d_s[:] = -dphi
            ginv = (1.0 / gamma_new) if proximal else jnp.zeros_like(gamma)
            gersh = newton_solve(ginv)
            gersh_new = jnp.where(b_inner, gersh, sc[_GERSH][None])

            # Qd = Q d (+ d/gamma), Ad = A d
            matvec_Q(d_s, Qd_s)
            Qd_pure = Qd_s[:]
            if proximal:
                Qd_s[:] = Qd_pure + d_s[:] / gamma_new
            matvec_A(d_s, Ad_s)
            d = d_s[:]
            Qd = Qd_s[:]
            Ad = Ad_s[:]
            eta = jnp.sum(d * Qd, axis=0, keepdims=True)
            beta = jnp.sum(d * df, axis=0, keepdims=True)
            sqs = jnp.sqrt(sig_new)
            tau = linesearch(eta, beta, sqs, Ad, Ax, y_new, sig_new)

            # jnp.where (not arithmetic masking): a masked-off lane's
            # Newton/linesearch can produce NaN (e.g. rank-deficient M on
            # a boosted done lane) and 0 * NaN would poison the state
            x_ref[:] = jnp.where(b_inner, x + tau * d, x)
            Qx_ref[:] = jnp.where(b_inner, Qx_g + tau * Qd, Qx_g)
            Ax_ref[:] = jnp.where(b_inner, Ax + tau * Ad, Ax)
            x0_ref[:] = x0_new
            y_ref[:] = y_new
            sig_ref[:] = jnp.where(b_sig, sig_new, sig)
            prin_ref[:] = prin_new
            actold_ref[:] = actold_new
            # certificate state: the pure tau*Qd / tau*Ad / tau*d and the
            # previous iterate of the last inner step (termination.c:184-240
            # reads them on the NEXT iteration's dual-infeasibility test)
            aty_ref[:] = jnp.where(b_outer, Atyh, aty_ref[:])
            xprev_ref[:] = jnp.where(b_inner, x, xprev_ref[:])
            tqd_ref[:] = jnp.where(b_inner, tau * Qd_pure, tqd_ref[:])
            tad_ref[:] = jnp.where(b_inner, tau * Ad, tad_ref[:])
            td_ref[:] = jnp.where(b_inner, tau * d, td_ref[:])

            # ---- scalar state (solved lanes stop counting: the reference
            # for-loop does not advance iter on the terminating trip) ----
            done_new = (done | do_term | dual_term).astype(jnp.float32)
            status_new = jnp.where(
                solved, jnp.float32(C.QPALM_SOLVED),
                jnp.where(
                    pinf, jnp.float32(C.QPALM_PRIMAL_INFEASIBLE),
                    jnp.where(
                        dinf, jnp.float32(C.QPALM_DUAL_INFEASIBLE),
                        jnp.where(
                            dual_term,
                            jnp.float32(C.QPALM_DUAL_TERMINATED),
                            sc[_STATUS][None],
                        ),
                    ),
                ),
            )
            # the terminating trip is not counted (core.py freezes iter
            # once done — dual termination sets done inside this trip)
            iter_new = sc[_ITER][None] + (live & ~dual_term).astype(
                jnp.float32)
            rows = [
                (_GAMMA, gamma_new),
                (_EPSA_IN, epsa_new),
                (_EPSR_IN, epsr_new),
                (_DONE, done_new),
                (_ITER, iter_new),
                (_PREV_ITER, prev_iter_new),
                (_NO_CHANGE, no_change_new),
                (_GAMMA_MAXED,
                 gmaxed_new if proximal else sc[_GAMMA_MAXED][None]),
                (_ITER_OUT, iter_out_new),
                (_GERSH, gersh_new),
                (_NB_CHANGED, nbch_final),
                (_PRI_NORM, pri_norm),
                (_DUA_NORM, dua_norm),
                (_STATUS, status_new),
            ]
            if nonconvex:
                rows += [(_EPSK_ABS, epsk_abs_new),
                         (_EPSK_REL, epsk_rel_new)]
            for row_idx, val in rows:
                sc_ref[pl.ds(row_idx, 1), :] = val

        jax.lax.fori_loop(0, T, iteration, 0)

    return kernel


class FusedState(NamedTuple):
    """Lane-last kernel state (leading dim = vector length, trailing = B)."""

    x: jnp.ndarray        # (n, B)
    x0: jnp.ndarray       # (n, B)
    Qx: jnp.ndarray       # (n, B)
    y: jnp.ndarray        # (m, B)
    Ax: jnp.ndarray       # (m, B)
    sigma: jnp.ndarray    # (m, B)
    pri_res_in: jnp.ndarray  # (m, B)
    act_old: jnp.ndarray  # (m, B) 0/1 mask
    sc: jnp.ndarray       # (_SC_ROWS, B) per-lane scalars
    aty: jnp.ndarray      # (n, B) A'y (refreshed at outer updates)
    x_prev: jnp.ndarray   # (n, B) previous inner iterate
    tqd: jnp.ndarray      # (n, B) tau * Q d (pure) of the last inner step
    tad: jnp.ndarray      # (m, B) tau * A d
    td: jnp.ndarray       # (n, B) tau * d
    cert_y: jnp.ndarray   # (m, B) primal-infeasibility certificate
    cert_x: jnp.ndarray   # (n, B) dual-infeasibility certificate


@functools.partial(
    jax.jit, static_argnames=("T", "settings", "interpret", "qa_panel",
                              "alias")
)
def fused_chunk(data_t, scal_t, st: FusedState, T: int, settings: Settings,
                interpret: bool = False, qa_panel: int = -2,
                alias: bool = True) -> FusedState:
    """Run T solver iterations on lane-last stacked data.

    data_t: (Q (n,n,B), A (m,n,B), q (n,B), bmin (m,B), bmax (m,B))
    scal_t: (Dinv (n,B), Einv (m,B), cinv (1,B))  — identity when unscaled.
    `qa_panel` -2 picks the memory plan from the shape (pick_qa_panel);
    0 forces the all-VMEM kernel, P > 0 forces HBM-streamed Q/A panels.
    `alias` False drops the input_output_aliases (see _make_kernel);
    past ALIAS_WALL the aliased program is known-corrupt on hardware, so
    the no-alias variant is forced regardless of the flag.
    """
    Q, A, q, bmin, bmax = data_t
    n, _, B = Q.shape
    m = A.shape[0]
    assert B % LANES == 0, B
    alias = alias and n <= ALIAS_WALL
    if qa_panel == -2:
        qa_panel = pick_qa_panel(n, m, alias=alias)
    assert qa_panel >= 0, (n, m, qa_panel)
    kernel = _make_kernel(n, m, T, settings, qa_panel, alias)

    def spec(rows):
        return pl.BlockSpec((rows, LANES), lambda: (0, 0),
                            memory_space=pltpu.VMEM)

    def spec3(r1, r2):
        return pl.BlockSpec((r1, r2, LANES), lambda: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    if qa_panel:
        # Q and A stay HBM-resident; the kernel DMAs P-row panels
        qa_specs = [pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY)]
    else:
        qa_specs = [spec3(n, n), spec3(m, n)]
    in_specs = qa_specs + [
        spec(n), spec(m), spec(m),
        spec(n), spec(m), spec(1),
        spec(n), spec(n), spec(n), spec(m), spec(m), spec(m), spec(m),
        spec(m), spec(_SC_ROWS),
        spec(n), spec(n), spec(n), spec(m), spec(n),
        spec(m), spec(n),
    ]
    out_specs = tuple(
        [spec(n), spec(n), spec(n), spec(m), spec(m), spec(m), spec(m),
         spec(m), spec(_SC_ROWS),
         spec(n), spec(n), spec(n), spec(m), spec(n),
         spec(m), spec(n)]
    )

    def one_block(args):
        """One LANES-wide block, grid-less: a multi-program grid makes
        pallas double-buffer the ~5 MB of block inputs and the Mosaic
        compile crashes at this VMEM pressure — so the B//LANES blocks are
        issued as separate pallas_calls inside this jit (the kernel binary
        is compiled once and reused)."""
        out_shape = tuple(
            jax.ShapeDtypeStruct(args[k].shape, jnp.float32)
            for k in range(8, 24)  # 14 state leaves + cert_y + cert_x
        )
        scratch_shapes = [
            pltpu.VMEM((n, n, LANES), jnp.float32),   # M_s
            pltpu.VMEM((n, LANES), jnp.float32),      # d_s
            pltpu.VMEM((m, LANES), jnp.float32),      # yh_s
            pltpu.VMEM((m, LANES), jnp.float32),      # w_s
            pltpu.VMEM((n, LANES), jnp.float32),      # Qd_s
            pltpu.VMEM((m, LANES), jnp.float32),      # Ad_s
        ]
        if qa_panel:
            scratch_shapes += [
                pltpu.VMEM((2, qa_panel, n, LANES), jnp.float32),  # qa_buf
                pltpu.SemaphoreType.DMA((2,)),
            ]
        # Streaming shapes need the scoped-VMEM ceiling raised past the
        # 16 MB default: besides the planned buffers, Mosaic stack-allocates
        # a (RCH, n, LANES) temporary per row-chunked rank-1 accumulation
        # (the updates are chunked to _row_chunk(n) rows exactly so this
        # temporary stays bounded; pre-chunking it was the full (n, n,
        # LANES) — measured 19.52 MB at n=128/m=192 against the 16 MB
        # default, a hardware Mosaic OOM, 2026-08-19 smoke run).  The limit
        # is sized from the plan (n^2 for M_s + RCH*n for the stack temp
        # + panels + vectors) with 25% headroom, capped at 100 MB under
        # the v5e's 128 MB physical VMEM; pick_qa_panel() budgets the
        # identical formula at admission time.
        if qa_panel:
            vec_rows = (12 * n + 13 * m) if alias else (20 * n + 20 * m)
            need = (
                n * n + _row_chunk(n) * n + 2 * qa_panel * n
                + vec_rows + 2 * _SC_ROWS
            ) * LANES * 4
            params = pltpu.CompilerParams(
                vmem_limit_bytes=min(int(need * 1.25) + 2 * 2**20,
                                     100 * 2**20)
            )
        else:
            params = None
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            input_output_aliases=(
                {8: 0, 9: 1, 10: 2, 11: 3, 12: 4, 13: 5,
                 14: 6, 15: 7, 16: 8, 17: 9, 18: 10,
                 19: 11, 20: 12, 21: 13, 22: 14, 23: 15}
                if alias else {}
            ),
            compiler_params=params,
            interpret=interpret,
        )(*args)

    with jax.enable_x64(False):
        blocks = []
        for c in range(B // LANES):
            sl = slice(c * LANES, (c + 1) * LANES)
            args = (
                Q[..., sl], A[..., sl], q[..., sl], bmin[..., sl],
                bmax[..., sl], scal_t[0][..., sl], scal_t[1][..., sl],
                scal_t[2][..., sl],
                st.x[..., sl], st.x0[..., sl], st.Qx[..., sl],
                st.y[..., sl], st.Ax[..., sl], st.sigma[..., sl],
                st.pri_res_in[..., sl], st.act_old[..., sl],
                st.sc[..., sl],
                st.aty[..., sl], st.x_prev[..., sl], st.tqd[..., sl],
                st.tad[..., sl], st.td[..., sl],
                st.cert_y[..., sl], st.cert_x[..., sl],
            )
            blocks.append(one_block(args))
        outs = [
            jnp.concatenate([b[k] for b in blocks], axis=-1)
            for k in range(16)
        ]
    return FusedState(*outs)


def _init_fused(data_t, settings: Settings, x_ws=None, y_ws=None,
                gamma_init=None, gamma_max=None, c_lane=None):
    """Cold/warm-start state in lane-last layout (qpalm.c:322-399 and the
    sigma heuristic iteration.c:50-84, matching core.init_state).

    `gamma_init`/`gamma_max` are optional per-lane (B,) overrides carrying
    nonconvex gamma pins (core.init_state has the same override seam)."""
    Q, A, q, bmin, bmax = data_t
    n, _, B = Q.shape
    m = A.shape[0]
    f32 = jnp.float32
    g0 = jnp.asarray(gamma_init, f32) if gamma_init is not None \
        else jnp.full((B,), settings.gamma_init, f32)
    gmax = jnp.asarray(gamma_max, f32) if gamma_max is not None \
        else jnp.full((B,), settings.gamma_max, f32)
    if x_ws is not None:
        x = jnp.asarray(x_ws, f32)
        Qx_pure = jnp.einsum("ijb,jb->ib", Q, x)
        Qx = Qx_pure + x / g0[None, :] if settings.proximal \
            else Qx_pure
        Ax = jnp.einsum("ijb,jb->ib", A, x)
    else:
        x = jnp.zeros((n, B), f32)
        Qx = jnp.zeros((n, B), f32)
        Ax = jnp.zeros((m, B), f32)
    y = jnp.asarray(y_ws, f32) if y_ws is not None else jnp.zeros((m, B), f32)

    f = 0.5 * jnp.sum(x * Qx, axis=0) + jnp.sum(q * x, axis=0)
    dist = Ax - jnp.clip(Ax, bmin, bmax)
    dist2 = jnp.sum(dist * dist, axis=0)
    sig0 = jnp.clip(
        settings.sigma_init * jnp.maximum(1.0, jnp.abs(f))
        / jnp.maximum(1.0, 0.5 * dist2),
        1e-4, 1e4,
    ).astype(f32)
    sigma = jnp.broadcast_to(sig0[None, :], (m, B)).copy()

    sc = jnp.zeros((_SC_ROWS, B), f32)
    sc = sc.at[_GAMMA].set(g0)
    sc = sc.at[_GAMMA_MAX].set(gmax)
    sc = sc.at[_EPSA_IN].set(settings.eps_abs_in)
    sc = sc.at[_EPSR_IN].set(settings.eps_rel_in)
    sc = sc.at[_EPSK_ABS].set(settings.eps_abs_in)
    sc = sc.at[_EPSK_REL].set(settings.eps_rel_in)
    sc = sc.at[_STATUS].set(float(C.QPALM_UNSOLVED))
    if c_lane is not None:
        # per-lane objective constant, read by the in-kernel dual-objective
        # termination (sc row is never written by the kernel)
        sc = sc.at[_COBJ].set(jnp.asarray(c_lane, f32))
    return FusedState(
        x=x, x0=x, Qx=Qx, y=y, Ax=Ax, sigma=sigma,
        pri_res_in=jnp.zeros((m, B), f32),
        act_old=jnp.zeros((m, B), f32),
        sc=sc,
        # Aty starts at zero exactly like core.init_state (the first outer
        # update refreshes it); certificate scratch starts empty
        aty=jnp.zeros((n, B), f32),
        x_prev=x,
        tqd=jnp.zeros((n, B), f32),
        tad=jnp.zeros((m, B), f32),
        td=jnp.zeros((n, B), f32),
        cert_y=jnp.zeros((m, B), f32),
        cert_x=jnp.zeros((n, B), f32),
    )


def _prepare(data: QPData, settings: Settings, x_ws, y_ws,
             has_x: bool, has_y: bool, gamma_init=None, gamma_max=None):
    """Scale, transpose to lane-last, and build the initial state."""
    from ..scaling import scale_data

    B = data.q.shape[0]
    n = data.q.shape[1]
    m = data.bmin.shape[1]
    f32 = jnp.float32
    d32 = jax.tree.map(lambda a: jnp.asarray(a, f32), data)
    if settings.scaling:
        sdata, scal = jax.vmap(
            lambda d: scale_data(d, settings.scaling)
        )(d32)
    else:
        from ..types import ScalingInfo

        sdata = d32
        one_n = jnp.ones((B, n), f32)
        one_m = jnp.ones((B, m), f32)
        one = jnp.ones((B,), f32)
        scal = ScalingInfo(D=one_n, Dinv=one_n, E=one_m, Einv=one_m,
                           c=one, cinv=one)

    tr = lambda a: jnp.moveaxis(a, 0, -1)  # lane-last
    data_t = (tr(sdata.Q), tr(sdata.A), tr(sdata.q), tr(sdata.bmin),
              tr(sdata.bmax))
    scal_t = (tr(scal.Dinv), tr(scal.Einv), tr(scal.cinv)[None])
    xw = tr(jnp.asarray(x_ws, f32) * scal.Dinv) if has_x else None
    yw = tr(jnp.asarray(y_ws, f32) * scal.Einv * scal.c[:, None]) \
        if has_y else None
    st = _init_fused(data_t, settings, xw, yw, gamma_init, gamma_max,
                     c_lane=sdata.c)
    return data_t, scal_t, scal, st


def _finish(data_t, scal, st: FusedState):
    """Unscale + final multipliers (termination.c:242-252)."""
    tr = lambda a: jnp.moveaxis(a, 0, -1)
    sinv = 1.0 / st.sigma
    Axys = st.Ax + st.y * sinv
    z = jnp.clip(Axys, data_t[3], data_t[4])
    yh = st.y + st.sigma * (st.Ax - z)
    D = tr(scal.D)
    E = tr(scal.E)
    cinv_l = tr(scal.cinv)[None]
    x_sol = jnp.moveaxis(D * st.x, -1, 0)
    y_sol = jnp.moveaxis(E * (cinv_l * yh), -1, 0)
    done = st.sc[_DONE] > 0.5
    status = jnp.where(
        done, st.sc[_STATUS].astype(jnp.int32),
        jnp.asarray(C.QPALM_MAX_ITER_REACHED, jnp.int32),
    )
    # certificate vectors are already unscaled by the kernel
    delta_y = jnp.moveaxis(st.cert_y, -1, 0)
    delta_x = jnp.moveaxis(st.cert_x, -1, 0)
    return (
        x_sol, y_sol, status, st.sc[_ITER].astype(jnp.int32),
        st.sc[_PRI_NORM], st.sc[_DUA_NORM], delta_y, delta_x,
    )


# Hard cap on 128-lane blocks (grid-less pallas_calls) per jitted
# program.  More aliased custom-calls than this in ONE executable
# mis-route their buffers on this TPU runtime: measured 2026-08-19,
# 4- and 8-call programs are exact, a 16-call program returns garbage
# for every block past the second (statuses read like iteration counts,
# NaN solutions) at every shape tried.  Larger batches are split on the
# host — one extra dispatch per 1024 lanes, microseconds against the
# solve time.
MAX_LANES_PER_CALL = 8 * LANES


@functools.partial(
    jax.jit,
    static_argnames=("settings", "has_x", "has_y", "interpret", "qa_panel",
                     "alias"),
)
def _fused_solve_core(
    data: QPData,
    x_ws,
    y_ws,
    settings: Settings,
    has_x: bool = False,
    has_y: bool = False,
    interpret: bool = False,
    gamma_init=None,
    gamma_max=None,
    qa_panel: int = -2,
    alias: bool = True,
):
    """The whole fused solve (scale + init + max_iter kernel iterations +
    unscale) as ONE jitted program.  B must be <= MAX_LANES_PER_CALL."""
    data_t, scal_t, scal, st = _prepare(
        data, settings, x_ws, y_ws, has_x, has_y, gamma_init, gamma_max
    )
    st = fused_chunk(data_t, scal_t, st, int(settings.max_iter), settings,
                     interpret, qa_panel, alias)
    return _finish(data_t, scal, st)


def fused_solve_jit(
    data: QPData,
    x_ws,
    y_ws,
    settings: Settings,
    has_x: bool = False,
    has_y: bool = False,
    interpret: bool = False,
    gamma_init=None,
    gamma_max=None,
    qa_panel: int = -2,
    alias: bool = True,
):
    """Host-splitting front for `_fused_solve_core`: batches above
    MAX_LANES_PER_CALL are solved in <=1024-lane groups (see the cap's
    comment) and concatenated.  Pass zero arrays for x_ws/y_ws when
    has_x/has_y are False; the per-lane `gamma_init`/`gamma_max` (or
    None) carry nonconvex pins."""
    B = data.q.shape[0]
    if B <= MAX_LANES_PER_CALL:
        return _fused_solve_core(
            data, x_ws, y_ws, settings, has_x, has_y, interpret,
            gamma_init, gamma_max, qa_panel, alias,
        )
    outs = []
    for s0 in range(0, B, MAX_LANES_PER_CALL):
        sl = slice(s0, s0 + MAX_LANES_PER_CALL)
        outs.append(_fused_solve_core(
            jax.tree.map(lambda a: a[sl], data),
            x_ws[sl], y_ws[sl], settings, has_x, has_y, interpret,
            None if gamma_init is None else gamma_init[sl],
            None if gamma_max is None else gamma_max[sl],
            qa_panel, alias,
        ))
    return tuple(
        jnp.concatenate([o[k] for o in outs], axis=0)
        for k in range(len(outs[0]))
    )


def solve_batch_fused(
    data: QPData,
    settings: Settings,
    x_ws=None,
    y_ws=None,
    chunk: int = 0,
    interpret: bool = False,
    gamma_init=None,
    gamma_max=None,
    qa_panel: int = -2,
    alias: bool = True,
):
    """Solve a stacked batch (leading batch axis, as from stack_problems)
    with the fused kernel.  Returns (x (B,n), y (B,m), status (B,),
    iterations (B,), pri_norm (B,), dua_norm (B,), delta_y (B,m),
    delta_x (B,n)) — unscaled, certificates NaN-free only when the lane
    reported the matching infeasibility status.

    Scaling (reference scaling.c) runs outside the kernel, vmapped; the
    kernel receives per-lane Dinv/Einv/cinv for its termination norms.
    `chunk` 0 means one fully-jitted call covering max_iter iterations;
    a nonzero chunk runs T-iteration kernel calls with a host early-exit
    check in between.  For `settings.nonconvex` pass the per-lane pins
    from `nonconvex.batch_gamma_pins` as `gamma_init`/`gamma_max`.
    """
    B = data.q.shape[0]
    n = data.q.shape[1]
    m = data.bmin.shape[1]
    if settings.nonconvex:
        settings = settings.replace(proximal=True)
    if chunk != 0 and B > MAX_LANES_PER_CALL:
        # the host-chunked iteration mode calls fused_chunk directly, so
        # it needs the same <=8-blocks-per-program split (see
        # MAX_LANES_PER_CALL) applied out here
        outs = []
        for s0 in range(0, B, MAX_LANES_PER_CALL):
            sl = slice(s0, s0 + MAX_LANES_PER_CALL)
            outs.append(solve_batch_fused(
                jax.tree.map(lambda a: a[sl], data), settings,
                None if x_ws is None else x_ws[sl],
                None if y_ws is None else y_ws[sl],
                chunk, interpret,
                None if gamma_init is None else gamma_init[sl],
                None if gamma_max is None else gamma_max[sl],
                qa_panel, alias,
            ))
        return tuple(
            jnp.concatenate([o[k] for o in outs], axis=0)
            for k in range(len(outs[0]))
        )
    if chunk == 0:
        zx = x_ws if x_ws is not None else jnp.zeros((B, n), jnp.float32)
        zy = y_ws if y_ws is not None else jnp.zeros((B, m), jnp.float32)
        return fused_solve_jit(
            data, zx, zy, settings,
            has_x=x_ws is not None, has_y=y_ws is not None,
            interpret=interpret,
            gamma_init=gamma_init, gamma_max=gamma_max,
            qa_panel=qa_panel, alias=alias,
        )

    data_t, scal_t, scal, st = _prepare(
        data, settings, x_ws, y_ws, x_ws is not None, y_ws is not None,
        gamma_init, gamma_max,
    )
    iters_done = 0
    while iters_done < settings.max_iter:
        step = min(int(chunk), int(settings.max_iter) - iters_done)
        st = fused_chunk(data_t, scal_t, st, step, settings, interpret,
                         qa_panel, alias)
        iters_done += step
        if iters_done < settings.max_iter:
            if bool(jnp.all(st.sc[_DONE] > 0.5)):
                break
    return _finish(data_t, scal, st)
