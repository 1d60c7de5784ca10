"""Fused Pallas solve kernel vs the general solver: same iterates, same
iteration counts, same solutions (interpret mode on CPU).

The fused kernel re-implements the whole solve loop in lane-last layout, so
equality of per-lane iteration counts with solver/core.py is the strongest
cheap parity check available — any drift in branch logic, sigma/gamma
schedules, or the linesearch changes iteration counts immediately.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qpalm_tpu import Settings, constants as C
from qpalm_tpu.batch import solve_batch_jit, stack_problems
from qpalm_tpu.solver.fused import LANES, solve_batch_fused

from helpers import kkt_check, random_convex_qp


def _probs(seed, n, m, count):
    return [random_convex_qp(n, m, seed=seed + i, density=0.5)
            for i in range(count)]


def _general(data, s, x0=None, y0=None):
    B, n_pad = data.q.shape
    m_pad = data.bmin.shape[1]
    has = x0 is not None
    xw = jnp.asarray(x0, jnp.float32) if has else jnp.zeros((B, n_pad),
                                                            jnp.float32)
    yw = jnp.asarray(y0, jnp.float32) if has else jnp.zeros((B, m_pad),
                                                            jnp.float32)
    return solve_batch_jit(
        data, xw, yw, jnp.full((B,), s.gamma_init, jnp.float32), s, has,
        False,
    )


@pytest.mark.parametrize("scaling", [2, 0])
def test_fused_matches_general_solver(scaling):
    probs = _probs(60, 16, 24, LANES)
    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=100,
                 scaling=scaling, max_refine=0, delta=10.0)
    data = stack_problems(probs, np.float32)
    x, y, status, iters, prn, dan, _, _ = solve_batch_fused(
        data, s, interpret=True)
    ref = _general(data, s)
    assert np.array_equal(np.asarray(status), np.asarray(ref.status))
    assert np.array_equal(np.asarray(iters), np.asarray(ref.iterations))
    assert np.max(np.abs(np.asarray(x) - np.asarray(ref.x))) < 1e-4
    assert np.max(np.abs(np.asarray(y) - np.asarray(ref.y))) < 1e-3
    for i in range(0, LANES, 37):
        Q, A, q, bl, bu = probs[i]
        kkt_check(Q, A, q, bl, bu,
                  np.asarray(x)[i][:16], np.asarray(y)[i][:24], tol=2e-3)


@pytest.mark.parametrize("scaling", [2, 0])
def test_fused_streaming_matches_vmem(scaling):
    """The HBM-streaming kernel (qa_panel > 0: Q/A DMA'd in double-buffered
    row panels) must track the all-VMEM kernel exactly — same statuses and
    iteration counts, solutions to f32 rounding (the Newton assembly sums
    A'WA before Q instead of after, so bitwise equality is not expected)."""
    probs = _probs(61, 16, 24, LANES)
    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=100,
                 scaling=scaling, max_refine=0, delta=10.0)
    data = stack_problems(probs, np.float32)
    r0 = solve_batch_fused(data, s, interpret=True, qa_panel=0)
    r1 = solve_batch_fused(data, s, interpret=True, qa_panel=8)
    assert np.array_equal(np.asarray(r0[2]), np.asarray(r1[2]))
    assert np.array_equal(np.asarray(r0[3]), np.asarray(r1[3]))
    assert np.max(np.abs(np.asarray(r0[0]) - np.asarray(r1[0]))) < 1e-4
    assert np.all(np.asarray(r1[2]) == C.QPALM_SOLVED)
    ref = _general(data, s)
    assert np.array_equal(np.asarray(r1[2]), np.asarray(ref.status))
    assert np.max(np.abs(np.asarray(r1[0]) - np.asarray(ref.x))) < 1e-4


def test_fused_streaming_dual_termination():
    """Streaming path with dual-objective termination on: exercises the
    panel-streamed Q copy into M_s (set_Ms_from_Q) on outer trips."""
    probs = _probs(91, 16, 24, LANES)
    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=100,
                 scaling=2, max_refine=0, delta=10.0,
                 enable_dual_termination=True, dual_objective_limit=-1e9)
    data = stack_problems(probs, np.float32)
    r0 = solve_batch_fused(data, s, interpret=True, qa_panel=0)
    r1 = solve_batch_fused(data, s, interpret=True, qa_panel=8)
    assert np.array_equal(np.asarray(r0[2]), np.asarray(r1[2]))
    assert np.array_equal(np.asarray(r0[3]), np.asarray(r1[3]))
    assert np.max(np.abs(np.asarray(r0[0]) - np.asarray(r1[0]))) < 1e-4


def test_fused_warm_start_matches_general():
    probs = _probs(70, 12, 18, LANES)
    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=100,
                 scaling=2, max_refine=0, delta=10.0)
    data = stack_problems(probs, np.float32)
    x, y, status, iters, _, _, _, _ = solve_batch_fused(data, s,
                                                        interpret=True)
    assert np.all(np.asarray(status) == C.QPALM_SOLVED)
    # warm-started resolve: must track the general solver exactly (at f32 /
    # 1e-4 a fresh residual check near the tolerance boundary legitimately
    # takes a few polish iterations; the parity claim is that the fused
    # path does precisely what the general path does)
    x2, y2, status2, iters2, _, _, _, _ = solve_batch_fused(
        data, s, x_ws=np.asarray(x), y_ws=np.asarray(y), interpret=True
    )
    ref = _general(data, s, x0=np.asarray(x), y0=np.asarray(y))
    assert np.all(np.asarray(status2) == C.QPALM_SOLVED)
    # warm-start Qx is rebuilt with a different f32 op order than the
    # general path, so a lane sitting exactly at the tolerance boundary can
    # flip its iteration-0 termination check and run one more inner cycle;
    # that must stay rare, and the bulk must match exactly
    diff = np.abs(np.asarray(iters2) - np.asarray(ref.iterations))
    assert np.mean(diff > 0) <= 0.05, diff
    assert int(np.asarray(iters2).max()) < int(np.asarray(iters).max())


def test_fused_max_iter_status():
    probs = _probs(80, 8, 12, LANES)
    s = Settings(dtype="float32", eps_abs=1e-12, eps_rel=0.0, max_iter=7,
                 scaling=2, max_refine=0, delta=10.0)
    data = stack_problems(probs, np.float32)
    _, _, status, iters, _, _, _, _ = solve_batch_fused(data, s,
                                                        interpret=True)
    assert np.all(np.asarray(status) == C.QPALM_MAX_ITER_REACHED)
    assert np.all(np.asarray(iters) == 7)


def test_fused_chunked_equals_single_call():
    probs = _probs(90, 12, 18, LANES)
    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=60,
                 scaling=2, max_refine=0, delta=10.0)
    data = stack_problems(probs, np.float32)
    a = solve_batch_fused(data, s, interpret=True)
    b = solve_batch_fused(data, s, chunk=13, interpret=True)
    assert np.array_equal(np.asarray(a[2]), np.asarray(b[2]))
    assert np.array_equal(np.asarray(a[3]), np.asarray(b[3]))
    # the single-call path runs fully jitted, the chunked path prepares
    # eagerly — XLA fuses the scaling slightly differently, so solutions
    # agree to f32 fp noise, not bitwise
    assert np.max(np.abs(np.asarray(a[0]) - np.asarray(b[0]))) < 1e-5


def test_fused_infeasibility_certificates():
    """The kernel detects primal/dual infeasibility in-kernel and returns
    the Farkas certificates (reference termination.c:136-240)."""
    # LANES lanes: lane 0 primal-infeasible, lane 1 dual-infeasible,
    # the rest ordinary solvable QPs
    probs = _probs(55, 6, 8, LANES)
    n, m = 6, 8
    A_p = np.zeros((m, n)); A_p[0, 0] = 1.0; A_p[1, 0] = 1.0
    bl_p = np.full(m, -20.0); bu_p = np.full(m, 20.0)
    bl_p[0], bu_p[0] = 1.0, 30.0   # x0 >= 1
    bl_p[1], bu_p[1] = -30.0, 0.0  # x0 <= 0
    probs[0] = (np.eye(n), A_p, np.zeros(n), bl_p, bu_p)
    probs[1] = (np.zeros((n, n)), np.zeros((m, n)), -np.ones(n),
                np.full(m, -np.inf), np.full(m, np.inf))
    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=150,
                 scaling=2, max_refine=0, delta=10.0)
    data = stack_problems(probs, np.float32)
    x, y, status, iters, _, _, dy, dx = solve_batch_fused(data, s,
                                                          interpret=True)
    st = np.asarray(status)
    assert st[0] == C.QPALM_PRIMAL_INFEASIBLE, st[0]
    assert st[1] == C.QPALM_DUAL_INFEASIBLE, st[1]
    assert np.all(st[2:] == C.QPALM_SOLVED)
    # Farkas conditions on the returned certificates
    dy0 = np.asarray(dy)[0][:m]
    assert np.abs(dy0).max() > 0
    assert np.abs(A_p.T @ dy0).max() <= 1e-3 * np.abs(dy0).max()
    dx1 = np.asarray(dx)[1][:n]
    assert np.abs(dx1).max() > 0
    assert float(-np.ones(n) @ dx1) < 0  # descent direction

    # the general solver agrees lane-for-lane
    ref = _general(data, s)
    assert np.array_equal(st, np.asarray(ref.status))


def test_fused_nonconvex_matches_general():
    """Nonconvex mode in-kernel: per-lane LOBPCG gamma pins carried in the
    _GAMMA/_GAMMA_MAX scalar rows and the eps_k proximal-center ladder in
    _EPSK_* (reference nonconvex.c:171-183, qpalm.c:586-609).  Half the
    lanes are indefinite, half convex, so both the pinned and the default
    per-lane gamma schedules are exercised in one kernel launch."""
    from qpalm_tpu.batch import _solve_batch_gi
    from qpalm_tpu.solver.nonconvex import batch_gamma_pins

    rng = np.random.default_rng(42)
    n, m = 8, 8
    probs = []
    for i in range(LANES):
        if i % 2 == 0:
            Q = rng.standard_normal((n, n))
            Q = 0.5 * (Q + Q.T) - 1.5 * np.eye(n)  # indefinite
        else:
            M = rng.standard_normal((n, n))
            Q = M @ M.T + 0.1 * np.eye(n)
        probs.append((Q, np.eye(m, n), rng.standard_normal(n),
                      -np.ones(m), np.ones(m)))
    s = Settings(dtype="float32", nonconvex=True, eps_abs=1e-4,
                 eps_rel=1e-4, max_iter=400, scaling=2, max_refine=0,
                 delta=10.0)
    data = stack_problems(probs, np.float32)
    gi, gm = batch_gamma_pins(data, s)
    x, y, status, iters, prn, dan, _, _ = solve_batch_fused(
        data, s, gamma_init=gi, gamma_max=gm, interpret=True)
    ref = _solve_batch_gi(
        data, jnp.zeros_like(data.q), jnp.zeros_like(data.bmin),
        gi, gm, s.replace(proximal=True, verbose=False), False)
    st = np.asarray(status)
    assert np.array_equal(st, np.asarray(ref.status))
    assert np.array_equal(np.asarray(iters), np.asarray(ref.iterations))
    assert np.max(np.abs(np.asarray(x) - np.asarray(ref.x))) < 1e-4
    assert np.mean(st == C.QPALM_SOLVED) > 0.9
    # KKT check with the returned multipliers for solved sampled lanes:
    # dual residual Qx + q + A'y ~ 0 and y has the right sign pattern
    # (a coordinate can sit within the primal tolerance of its bound yet
    # carry a large multiplier, so a pure "interior gradient" test is
    # wrong at eps 1e-4)
    for i in range(0, LANES, 13):
        if st[i] != C.QPALM_SOLVED:
            continue
        Q, A, q, bl, bu = probs[i]
        xi = np.asarray(x)[i][:n]
        yi = np.asarray(y)[i][:m]
        dua = Q @ xi + q + A.T @ yi
        assert np.max(np.abs(dua)) < 5e-3, (i, np.max(np.abs(dua)))
        # y_j > 0 only near the upper bound, y_j < 0 only near the lower
        ax = A @ xi
        for j in range(m):
            if yi[j] > 1e-3:
                assert ax[j] > bu[j] - 1e-3, (i, j, yi[j], ax[j])
            elif yi[j] < -1e-3:
                assert ax[j] < bl[j] + 1e-3, (i, j, yi[j], ax[j])


def test_fused_dual_termination_matches_general():
    """enable_dual_termination runs in-kernel (Q-Cholesky + solve on outer
    trips, reference iteration.c:272-299): per-lane statuses and iteration
    counts must equal the general solver's, with some lanes genuinely
    dual-terminated and others solved."""
    probs = _probs(90, 16, 24, LANES)
    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=100,
                 scaling=2, max_refine=0, delta=10.0,
                 enable_dual_termination=True, dual_objective_limit=-1.0)
    data = stack_problems(probs, np.float32)
    x, y, status, iters, _, _, _, _ = solve_batch_fused(
        data, s, interpret=True)
    ref = _general(data, s)
    assert np.array_equal(np.asarray(status), np.asarray(ref.status))
    assert np.array_equal(np.asarray(iters), np.asarray(ref.iterations))
    st = np.asarray(status)
    assert (st == C.QPALM_DUAL_TERMINATED).any()
    assert (st == C.QPALM_SOLVED).any()


@pytest.mark.parametrize("n,m", [(7, 13), (24, 8), (9, 33)])
def test_fused_shape_fuzz_matches_general(n, m):
    """Odd (n, m) shapes (padding exercises every masked edge): statuses
    and solutions must match the general solver; iteration counts must
    match on all but a rare tolerance-boundary lane (f32 residual-norm op
    order differs between the two paths, so a lane sitting exactly on the
    inner tolerance can flip one outer cycle — same caveat as the
    warm-start parity test)."""
    probs = _probs(500 + n * m, n, m, LANES)
    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=100,
                 scaling=2, max_refine=0, delta=10.0)
    data = stack_problems(probs, np.float32)
    x, y, status, iters, _, _, _, _ = solve_batch_fused(
        data, s, interpret=True)
    ref = _general(data, s)
    assert np.array_equal(np.asarray(status), np.asarray(ref.status))
    drift = np.asarray(iters) != np.asarray(ref.iterations)
    assert drift.sum() <= max(2, LANES // 50), np.where(drift)[0]
    assert np.max(np.abs(np.asarray(x) - np.asarray(ref.x))) < 1e-4


def test_fused_chunked_keeps_certificates():
    """Regression (review finding): a Farkas certificate found in an early
    chunk must survive later chunked kernel calls (the cert buffers are
    aliased state now, not per-call re-zeroed outputs)."""
    probs = _probs(100, 8, 12, LANES)
    Q, A, q, bl, bu = probs[3]
    A2 = A.copy()
    A2[1] = A2[0]
    bl2, bu2 = bl.copy(), bu.copy()
    bl2[0], bu2[0] = 1.0, 2.0
    bl2[1], bu2[1] = 3.0, 4.0  # contradictory duplicate row
    probs[3] = (Q, A2, q, bl2, bu2)
    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=120,
                 scaling=2, max_refine=0, delta=10.0)
    data = stack_problems(probs, np.float32)
    _, _, status, _, _, _, dy, _ = solve_batch_fused(
        data, s, chunk=10, interpret=True)
    assert np.asarray(status)[3] == C.QPALM_PRIMAL_INFEASIBLE
    cert = np.asarray(dy)[3][:12]
    assert np.abs(cert).max() > 0  # not zeroed by a later chunk
    assert np.abs(A2.T @ cert).max() <= 1e-3 * np.abs(cert).max()


def test_fused_stall_path_matches_general():
    """Regression (review findings): the kernel's no_change stall counter
    must read the PREVIOUS newton step's enter/leave count (reference
    qpalm.c:664-665), and the boost check must not overwrite the
    active_old baseline (newton.c:116).  A tiny rho collapses the inner
    tolerance after the first outer update so lanes sit on stable active
    sets long enough for the no_change==3 trigger to fire; parity with
    the general solver must survive that path."""
    probs = _probs(40, 14, 20, LANES)
    s = Settings(dtype="float32", eps_abs=5e-4, eps_rel=5e-4, max_iter=100,
                 scaling=2, max_refine=0, delta=10.0, rho=1e-8)
    data = stack_problems(probs, np.float32)
    x, y, status, iters, _, _, _, _ = solve_batch_fused(
        data, s, interpret=True)
    ref = _general(data, s)
    assert np.array_equal(np.asarray(status), np.asarray(ref.status))
    drift = np.asarray(iters) != np.asarray(ref.iterations)
    assert drift.sum() <= max(2, LANES // 50), np.where(drift)[0]
    assert np.max(np.abs(np.asarray(x) - np.asarray(ref.x))) < 1e-3


def test_fused_routing_eligibility():
    """solve_batch routes to the fused kernel only for eligible configs on
    a TPU backend; `use_fused` overrides behave as documented."""
    from qpalm_tpu.batch import _fused_eligible

    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4,
                 scaling=2, max_refine=0)
    # on the CPU test backend routing must always be off
    assert not _fused_eligible(s, 128, 64, 96)
    assert not _fused_eligible(s.replace(use_fused="never"), 128, 64, 96)
    # ineligible configurations fail fast under "always"
    for bad in (
        s.replace(dtype="float64"),
        s.replace(factorization_method=C.FACTORIZE_CG),
        s.replace(max_refine=2),
    ):
        with pytest.raises(ValueError):
            _fused_eligible(bad.replace(use_fused="always"), 128, 64, 96)
    # batch misalignment and VMEM overflow are ineligible
    with pytest.raises(ValueError):
        _fused_eligible(s.replace(use_fused="always"), 100, 64, 96)
    with pytest.raises(ValueError):
        _fused_eligible(s.replace(use_fused="always"), 128, 512, 768)


def test_pick_qa_panel_plan_tiers():
    """The kernel memory plan: small shapes all-VMEM (0), mid shapes
    HBM-streamed (P>0), shapes past the hardware-validated boundary
    rejected (-1).  Budget model: n^2 (M_s) + RCH*n (the row-chunked
    rank-1 updates bound Mosaic's stack temporary) + double-buffered
    panels + vector state.  TWO admission tiers, both v5e-validated:
    n_pad <= 224 runs the aliased program (round-3 smoke: exact
    fused/XLA status parity); 224 < n_pad <= 352 runs the ALIAS-FREE
    program (round-4 bisect: the 16 input_output_aliases are what
    corrupts n_pad=256 — without them 232/256/288/320/352 all run
    clean on hardware, and n_pad=384 fails loudly at Mosaic compile).
    See pick_qa_panel's comments and scripts/probe_n256.py."""
    from qpalm_tpu.solver.fused import (
        ALIAS_WALL, LANES, STREAM_WALL, _row_chunk, pick_qa_panel,
    )

    assert (ALIAS_WALL, STREAM_WALL) == (224, 352)
    assert pick_qa_panel(64, 96) == 0          # bench shape: all-VMEM
    assert pick_qa_panel(80, 120) == 0
    P = pick_qa_panel(128, 192)                # smoke-validated streaming
    assert P > 0 and 128 % P == 0
    assert pick_qa_panel(192, 288) > 0         # validated streaming sizes
    assert pick_qa_panel(224, 336) > 0
    # the no-alias tier: every hardware-validated size admits
    assert pick_qa_panel(232, 352) == 8        # multiple of 8 only -> P=8
    assert pick_qa_panel(256, 384) == 16
    assert pick_qa_panel(288, 432) == 16
    assert pick_qa_panel(320, 480) == 16
    assert pick_qa_panel(352, 528) == 16
    # past STREAM_WALL: rejected (n_pad=384 fails loudly at compile
    # anyway; the gate keeps it off the admission path)
    assert pick_qa_panel(384, 576) == -1
    assert pick_qa_panel(512, 768) == -1
    # admitted plans must stay under their tier caps
    for n, m, rows_n, rows_m, cap in (
        (128, 192, 12, 13, 38), (224, 336, 12, 13, 38),
        (256, 384, 20, 20, 82), (352, 528, 20, 20, 82),
    ):
        p = pick_qa_panel(n, m)
        need = (n * n + _row_chunk(n) * n + 2 * p * n
                + rows_n * n + rows_m * m + 38) * LANES * 4
        assert need <= cap * 2**20, (n, m, need / 2**20)
    # row chunks divide n and stay sublane-aligned
    for n in (104, 128, 160, 192, 224, 256, 320, 352):
        r = _row_chunk(n)
        assert r % 8 == 0 and n % r == 0 and n // r >= 4


def test_fused_batch_split_matches_unsplit(monkeypatch):
    """Batches above MAX_LANES_PER_CALL are host-split into groups (the
    TPU runtime mis-routes the aliased buffers of programs containing
    more than 8 grid-less pallas_calls — fused.py MAX_LANES_PER_CALL).
    The split must be invisible: same statuses/iterations/x as one
    unsplit call, and per-lane gamma pins must follow their lanes."""
    import qpalm_tpu.solver.fused as F

    probs = _probs(17, 10, 14, 2 * LANES)
    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=60,
                 scaling=2, max_refine=0, delta=10.0)
    data = stack_problems(probs, np.float32)
    B = data.q.shape[0]
    gi = np.full((B,), s.gamma_init, np.float32)
    gi[LANES:] *= 2.0  # distinct pins in the second group
    whole = solve_batch_fused(data, s, interpret=True,
                              gamma_init=jnp.asarray(gi))
    monkeypatch.setattr(F, "MAX_LANES_PER_CALL", LANES)
    split = solve_batch_fused(data, s, interpret=True,
                              gamma_init=jnp.asarray(gi))
    assert np.array_equal(np.asarray(whole[2]), np.asarray(split[2]))
    assert np.array_equal(np.asarray(whole[3]), np.asarray(split[3]))
    assert np.array_equal(np.asarray(whole[0]), np.asarray(split[0]))
