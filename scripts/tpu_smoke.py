"""On-hardware smoke test for the fused Pallas kernel (run when the TPU
tunnel is up; everything else covers it only in interpret mode on CPU).

Validates, on ONE real-TPU B=128 batch per configuration:
  1. the all-VMEM kernel (n=16) — Mosaic-compiles and matches the XLA
     vmapped loop per lane (statuses equal, iteration counts equal up to
     the known 1-lane-per-~128 f32 tolerance-boundary drift, x close);
  2. the HBM-streaming kernel (n=128: Q/A panel-DMA'd) — same parity bar;
  3. dual-objective termination + nonconvex gamma-pinned configurations
     (the commit-b6ba52a semantics: stall counter, gamma-boost baseline,
     certificate aliasing, NaN-safe masking) — statuses/x asserted;
  4. the alias-free streaming tier (224 < n_pad <= 352, round 4): XLA
     parity at n_pad=256 and 128/128 f64 KKT certification at the
     n_pad=352 wall.

Exit code 0 = all checks passed; prints one PASS/FAIL line per check plus
a trailing JSON summary.  Reference semantics at stake: qpalm.c:664-665,
newton.c:116, termination.c:136-240.

Usage:  timeout 1800 python scripts/tpu_smoke.py
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

C_SOLVED, C_MAX_ITER = 1, -2  # constants.QPALM_SOLVED / _MAX_ITER_REACHED

RESULTS = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        RESULTS.append({"check": name, "ok": True,
                        "seconds": round(time.time() - t0, 1)})
        print(f"PASS {name} ({time.time() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
        RESULTS.append({"check": name, "ok": False, "error": repr(e)[:500],
                        "seconds": round(time.time() - t0, 1)})
        print(f"FAIL {name}: {e!r}", flush=True)


def _probs(seed, n, m, count):
    sys.path.insert(0, "tests")
    from helpers import random_convex_qp

    return [random_convex_qp(n, m, seed=seed + i, density=0.5)
            for i in range(count)]


def _parity(probs, settings, n, m, noise_floor_eps=False, max_iter_drift=0,
            **fused_kw):
    """Fused(TPU) vs XLA loop(TPU) per-lane parity on one batch.

    With the solver's matvecs pinned at full-f32 matmul precision
    (qpalm_tpu.precision), the two paths are iteration-identical on
    hardware at supported tolerances — asserted exactly.  When
    `noise_floor_eps` (eps at/below f32's reachable dual-residual floor,
    e.g. 1e-6 — NOT a supported f32 operating point, used here only to
    stress the stall/boost counters through many outer trips), statuses
    may flip between solved and max_iter on lanes whose dual residual
    sits at the floor; both paths must still produce the same x and
    floor-level residuals, and flips must be confined to floor lanes."""
    import jax.numpy as jnp

    from qpalm_tpu.batch import solve_batch_jit, stack_problems
    from qpalm_tpu.solver.fused import solve_batch_fused

    data = stack_problems(probs, np.float32)
    B = data.q.shape[0]
    x, y, status, iters, prn, dan, _, _ = solve_batch_fused(
        data, settings, **fused_kw)
    jax.block_until_ready(x)
    zx = jnp.zeros_like(data.q)
    zy = jnp.zeros_like(data.bmin)
    g = jnp.full((B,), settings.gamma_init, jnp.float32)
    ref = solve_batch_jit(data, zx, zy, g, settings, False, False)
    jax.block_until_ready(ref.x)
    status, iters = np.asarray(status), np.asarray(iters)
    rstat = np.asarray(ref.status)
    xd = np.max(np.abs(np.asarray(x) - np.asarray(ref.x)))
    assert xd < 1e-3, f"x maxdiff {xd}"
    if noise_floor_eps:
        flips = np.where(status != rstat)[0]
        # flips allowed only between solved(1) and max_iter(-2), only on
        # lanes whose dual residual (both paths) is at the f32 floor
        # (within ~10x of the tolerance), and only on a minority of lanes
        both = {int(C_SOLVED), int(C_MAX_ITER)}
        for i in flips:
            assert {int(status[i]), int(rstat[i])} == both, (
                i, status[i], rstat[i])
        dmax = np.maximum(np.asarray(dan)[flips],
                          np.asarray(ref.dua_res_norm)[flips])
        # the f32 dual-residual floor for these shapes sits at 3e-6..3e-5:
        # flipped lanes must be AT the floor (within ~30x of the 1e-6
        # tolerance), not genuinely unconverged (which would read 1e-3+)
        assert (dmax < 30 * settings.eps_abs).all(), (flips, dmax)
        assert len(flips) <= B // 4, f"{len(flips)} floor flips"
        return
    assert np.array_equal(status, rstat), (
        f"status mismatch: {np.where(status != rstat)[0]}"
    )
    drift = np.asarray(iters) != np.asarray(ref.iterations)
    # max_iter_drift > 0 only for the n_pad=224 HBM-streamed shape: the
    # panel-chunked rank-1 accumulation order differs from XLA's dot by
    # ulps, so ~1 lane in 128 at a subproblem-termination boundary takes
    # one extra inner iteration (statuses and x still asserted equal)
    assert drift.sum() <= max_iter_drift, (
        f"iter drift on {np.where(drift)[0]}")


def main():
    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev})", flush=True)
    if dev.platform != "tpu":
        print("NOT A TPU — this smoke test is meaningless here", flush=True)
        sys.exit(2)

    from qpalm_tpu.solver.fused import pick_qa_panel
    from qpalm_tpu.types import Settings

    s = Settings(dtype="float32", eps_abs=1e-4, eps_rel=1e-4, max_iter=100,
                 scaling=2, max_refine=0, delta=10.0)

    # 1. all-VMEM kernel (the b6ba52a-edited hot path)
    check("vmem_kernel_parity_n16",
          lambda: _parity(_probs(60, 16, 24, 128), s, 16, 24))

    # 2. stall/boost-heavy shape (exercises the b6ba52a counters hard:
    #    tight tolerance + many outer trips)
    s_tight = s.replace(eps_abs=1e-6, eps_rel=1e-6, max_iter=400)
    check("vmem_kernel_parity_tight_eps",
          lambda: _parity(_probs(40, 14, 20, 128), s_tight, 14, 20,
                          noise_floor_eps=True))

    # 3. dual-objective termination (in-kernel Q-Cholesky on outer trips)
    s_dual = s.replace(enable_dual_termination=True,
                       dual_objective_limit=-1.0)
    check("dual_termination_parity",
          lambda: _parity(_probs(90, 16, 24, 128), s_dual, 16, 24))

    # 4. HBM-streaming kernel at n=128 (pick_qa_panel must choose P>0)
    assert pick_qa_panel(128, 192) > 0
    check("streaming_kernel_parity_n128",
          lambda: _parity(_probs(61, 126, 190, 128), s, 126, 190))

    # 5. nonconvex (per-lane gamma pins through the kernel).  f32 at this
    #    gamma pin (1/|lambda_min|) stalls on ~60% of these random
    #    indefinite instances on EVERY backend (CPU f32 measures the same
    #    0.375 solved fraction; f64 solves 128/128) — so the hardware
    #    assertions are: fused/XLA parity, stationarity on solved lanes,
    #    and the documented f32 solved fraction, not a >95% bar.
    def nonconvex_check():
        from qpalm_tpu.batch import solve_batch

        rng = np.random.default_rng(5)
        probs = []
        for _ in range(128):
            Qf = rng.standard_normal((8, 8))
            Q = 0.5 * (Qf + Qf.T)  # indefinite
            A = np.eye(8)
            probs.append((Q, A, rng.standard_normal(8),
                          -np.ones(8), np.ones(8)))
        sn = Settings(dtype="float32", nonconvex=True, eps_abs=1e-4,
                      eps_rel=1e-4, max_iter=400, scaling=2, max_refine=0)
        r = solve_batch(probs, settings=sn.replace(use_fused="always"))
        rx = solve_batch(probs, settings=sn.replace(use_fused="never"))
        st, stx = np.asarray(r.status), np.asarray(rx.status)
        assert np.array_equal(st, stx), (
            f"fused/XLA status mismatch {np.where(st != stx)[0]}")
        solved = (st == 1)
        assert solved.mean() > 0.3, f"solved frac {solved.mean()}"
        # stationarity on every solved lane: Qx + q + A'y ~ 0
        for i in np.where(solved)[0]:
            Q, A, q, lo, hi = probs[i]
            x = np.asarray(r.x)[i][:8]
            y = np.asarray(r.y)[i][:8]
            g = Q @ x + q + A.T @ y
            assert np.abs(g).max() < 5e-3, (i, np.abs(g).max())
        # f64 escalation clears the f32 stall tail: all lanes solve
        r64 = solve_batch(probs, settings=sn.replace(dtype="float64",
                                                     max_iter=4000))
        st64 = np.asarray(r64.status)
        assert (st64 == 1).all(), (
            f"f64 solved frac {(st64 == 1).mean()}")

    check("nonconvex_gamma_pins", nonconvex_check)

    # 6. in-kernel infeasibility certificates (termination.c:136-240):
    #    fused statuses must match XLA per lane on a mixed batch, and the
    #    returned Farkas vectors must certify on the UNSCALED problem.
    def certificate_check():
        import jax.numpy as jnp

        from qpalm_tpu.batch import solve_batch_jit, stack_problems
        from qpalm_tpu.solver.fused import solve_batch_fused

        n, m = 8, 12
        rng = np.random.default_rng(11)
        probs, kinds = [], []
        for i in range(128):
            kind = i % 3
            if kind == 0:  # primal infeasible: x1 >= 1 and x1 <= 0
                A = np.zeros((m, n)); A[0, 0] = 1.0; A[1, 0] = 1.0
                A[2:] = rng.standard_normal((m - 2, n)) * 0.1
                bmin = np.full(m, -20.0); bmax = np.full(m, 20.0)
                bmin[0], bmax[0] = 1.0, np.inf
                bmin[1], bmax[1] = -np.inf, 0.0
                Q = np.eye(n)
                q = rng.standard_normal(n)
            elif kind == 1:  # dual infeasible: unbounded along +e1
                Q = np.zeros((n, n))
                q = np.zeros(n); q[0] = -1.0
                A = np.zeros((m, n)); A[0, 1] = 1.0
                bmin = np.full(m, -np.inf); bmax = np.full(m, np.inf)
                bmax[0] = 1.0
            else:
                Q, A, q, bmin, bmax = _probs(200 + i, n, m, 1)[0]
            probs.append((np.asarray(Q, float), np.asarray(A, float),
                          np.asarray(q, float), bmin, bmax))
            kinds.append(kind)
        sc = s.replace(max_iter=400)
        data = stack_problems(probs, np.float32)
        x, y, status, iters, prn, dan, dy, dx = solve_batch_fused(data, sc)
        zx = jnp.zeros_like(data.q); zy = jnp.zeros_like(data.bmin)
        g = jnp.full((128,), sc.gamma_init, jnp.float32)
        ref = solve_batch_jit(data, zx, zy, g, sc, False, False)
        status = np.asarray(status); rstat = np.asarray(ref.status)
        assert np.array_equal(status, rstat), (
            f"status mismatch {np.where(status != rstat)[0]}")
        dy, dx = np.asarray(dy), np.asarray(dx)
        for i, kind in enumerate(kinds):
            Q, A, q, bmin, bmax = probs[i]
            if kind == 0:
                assert status[i] == -3, (i, status[i])
                v = dy[i][:m]
                nv = np.abs(v).max()
                assert nv > 0 and np.isfinite(nv), (i, nv)
                assert np.abs(A.T @ v).max() <= 1e-3 * nv, i
                sup = (np.where(v > 0, np.where(np.isfinite(bmax),
                                                bmax, 0.0) * v, 0.0)
                       + np.where(v < 0, np.where(np.isfinite(bmin),
                                                  bmin, 0.0) * v, 0.0))
                assert sup.sum() < 0, (i, sup.sum())
            elif kind == 1:
                assert status[i] == -4, (i, status[i])
                v = dx[i][:n]
                nv = np.abs(v).max()
                assert nv > 0 and np.isfinite(nv), (i, nv)
                assert np.abs(Q @ v).max() <= 1e-3 * nv, i
                assert q @ v < 0, (i, q @ v)
                Av = A @ v
                ub = np.isfinite(bmax)
                lb = np.isfinite(bmin)
                assert (Av[ub] <= 1e-3 * nv).all(), i
                assert (Av[lb] >= -1e-3 * nv).all(), i
            else:
                assert status[i] == 1, (i, status[i])

    check("infeasibility_certificates", certificate_check)

    # 7. HBM-streaming kernel AT the validated wall (n_pad = 224 exactly —
    #    the boundary pick_qa_panel gates; anything past it is rejected)
    assert pick_qa_panel(224, 336) > 0
    check("streaming_kernel_parity_n224",
          lambda: _parity(_probs(62, 222, 334, 128), s, 222, 334,
                          max_iter_drift=2))

    # 8. host batch-split seam: >MAX_LANES_PER_CALL batches are split into
    #    groups (the >8-pallas_calls-per-program runtime hazard) — forcing
    #    a smaller cap on the same 1024-lane batch must be BIT-equal
    def split_check():
        import jax.numpy as jnp

        import qpalm_tpu.solver.fused as F
        from qpalm_tpu.batch import stack_problems

        data = stack_problems(_probs(70, 16, 24, 1024), np.float32)
        zx = jnp.zeros_like(data.q); zy = jnp.zeros_like(data.bmin)
        full = F.fused_solve_jit(data, zx, zy, s)
        full = [np.asarray(a) for a in full]
        cap = F.MAX_LANES_PER_CALL
        try:
            F.MAX_LANES_PER_CALL = 256
            split = F.fused_solve_jit(data, zx, zy, s)
            split = [np.asarray(a) for a in split]
        finally:
            F.MAX_LANES_PER_CALL = cap
        for k, (a, b) in enumerate(zip(full, split)):
            assert np.array_equal(a, b, equal_nan=True), f"output {k}"

    check("batch_split_bitequal_1024", split_check)

    # 9. the 10k-scenario path (10240 lanes -> ten 1024-lane groups), with
    #    independent f64 KKT spot-certification
    def scenario_check():
        import jax.numpy as jnp

        from qpalm_tpu.batch import stack_problems
        from qpalm_tpu.solver.fused import fused_solve_jit

        probs = _probs(80, 16, 24, 10240)
        data = stack_problems(probs, np.float32)
        zx = jnp.zeros_like(data.q); zy = jnp.zeros_like(data.bmin)
        x, y, status, *_ = fused_solve_jit(data, zx, zy, s)
        status = np.asarray(status)
        frac = (status == C_SOLVED).mean()
        assert frac >= 0.99, f"solved fraction {frac}"
        x, y = np.asarray(x), np.asarray(y)
        rng = np.random.default_rng(0)
        for i in rng.choice(np.where(status == C_SOLVED)[0], 32,
                            replace=False):
            Q, A, q, bmin, bmax = probs[i]
            xi, yi = x[i][:16], y[i][:24]
            Ax = A @ xi
            pri = np.abs(Ax - np.clip(Ax, bmin, bmax)).max()
            dua = np.abs(Q @ xi + q + A.T @ yi).max()
            # f32 pass at eps 1e-4: residuals must be at tolerance scale
            assert pri < 5e-3 and dua < 5e-3, (i, pri, dua)

    check("scenario_10240_lanes", scenario_check)

    # 10. the alias-free streaming tier at n_pad=256 — the shape whose
    #     ALIASED program silently corrupts (round-3 bisect); fused_chunk
    #     auto-selects the no-alias program past ALIAS_WALL=224.  Full
    #     per-lane parity vs the XLA loop (panel-order f32 rounding allows
    #     a couple of lanes one extra inner iteration, as at n_pad=224).
    assert pick_qa_panel(256, 384) > 0
    check("noalias_streaming_parity_n256",
          lambda: _parity(_probs(63, 254, 382, 128), s, 254, 382,
                          max_iter_drift=3))

    # 11. the alias-free tier AT its wall (n_pad = 352): direct f64 KKT
    #     certification of every lane (the XLA-loop reference compile at
    #     this size is minutes — the independent KKT check is the
    #     stronger assertion anyway)
    def noalias_wall_check():
        from qpalm_tpu.batch import stack_problems
        from qpalm_tpu.solver.fused import solve_batch_fused

        assert pick_qa_panel(352, 528) > 0
        probs = _probs(64, 350, 526, 128)
        data = stack_problems(probs, np.float32)
        x, y, status, iters, *_ = solve_batch_fused(data, s)
        status = np.asarray(status)
        assert (status == C_SOLVED).all(), (
            f"solved {(status == C_SOLVED).sum()}/128")
        x, y = np.asarray(x), np.asarray(y)
        assert not np.isnan(x).any()
        for i in range(128):
            Q, A, q, bmin, bmax = probs[i]
            xi = x[i][:350].astype(np.float64)
            yi = y[i][:526].astype(np.float64)
            Ax = A @ xi
            pri = np.abs(Ax - np.clip(Ax, bmin, bmax)).max()
            dua = np.abs(Q @ xi + q + A.T @ yi).max()
            assert pri < 5e-3 and dua < 5e-3, (i, pri, dua)

    check("noalias_streaming_wall_n352", noalias_wall_check)

    # 12. the large-dense MXU pipeline at n=512 on the real chip
    #     (VERDICT r4 directive #9): f32 XLA Schur loop + f64 host
    #     polish, every problem KKT-certified at 1e-6 by the pipeline's
    #     own contract AND re-checked here independently
    def large_dense_check():
        from qpalm_tpu.large import solve_large_dense

        rng = np.random.default_rng(99)
        probs = []
        for _ in range(3):
            n, m = 512, 768
            M = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.15)
            Q = M @ M.T / n + 0.1 * np.eye(n)
            A = rng.standard_normal((m, n))
            q = rng.standard_normal(n)
            u = 2 * rng.random(m)
            probs.append((Q, A, q, -u, u))
        res = solve_large_dense(probs, eps=1e-6)
        assert res.ok.all(), f"certified {int(res.ok.sum())}/3"
        for i, (Q, A, q, bmin, bmax) in enumerate(probs):
            xi, yi = res.x[i][:512], res.y[i][:768]
            Ax = A @ xi
            pri = np.abs(Ax - np.clip(Ax, bmin, bmax)).max()
            dua = np.abs(Q @ xi + q + A.T @ yi).max()
            scale = max(np.abs(Q @ xi).max(), np.abs(q).max(),
                        np.abs(A.T @ yi).max())
            assert pri <= 1e-6 + 1e-6 * np.abs(Ax).max(), (i, pri)
            assert dua <= 1e-6 + 1e-6 * scale, (i, dua)

    check("large_dense_n512_certified", large_dense_check)

    # 13. on-device polish (round 5, qpalm_tpu.polish_device): the f32-
    #     preconditioned, margin-gated certification that the headline
    #     bench now runs on-chip.  Every lane the DEVICE certifies must
    #     pass the independent HOST polish KKT check in native f64, and
    #     the certified count must reach the host polish's rate.
    def device_polish_check():
        import jax.numpy as jnp

        from qpalm_tpu.polish import polish_batch_np
        from qpalm_tpu.polish_device import polish_batch_tpu
        from qpalm_tpu.solver.fused import fused_solve_jit
        from qpalm_tpu.batch import stack_problems
        from qpalm_tpu.types import Settings

        rng = np.random.default_rng(1234)
        B, n, m = 512, 64, 96
        probs = []
        for _ in range(B):
            M = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.5)
            Q = M @ M.T / n + 0.1 * np.eye(n)
            A = rng.standard_normal((m, n))
            u = 2 * rng.random(m)
            probs.append((Q, A, rng.standard_normal(n), -u, u))
        d32 = stack_problems(probs, np.float32)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            d64h = jax.tree.map(np.asarray,
                                stack_problems(probs, np.float64))
        d64 = jax.tree.map(jnp.asarray, d64h)
        n_pad = d32.q.shape[1]
        m_pad = d32.bmin.shape[1]
        s32 = Settings(dtype="float32", eps_abs=5e-5, eps_rel=5e-5,
                       max_iter=96, scaling=2, max_refine=0, delta=10.0)
        r = fused_solve_jit(d32, jnp.zeros((B, n_pad), jnp.float32),
                            jnp.zeros((B, m_pad), jnp.float32), s32)
        pd = polish_batch_tpu(d64, r[0], r[1], eps_abs=1e-6, eps_rel=1e-6,
                              refine_iters=3, second_round_k=64,
                              seed_guard="norm", residual32=True,
                              accept_viol=0.5)
        ok_dev = np.asarray(pd.ok)
        assert ok_dev.sum() >= int(0.96 * B), f"device {ok_dev.sum()}/{B}"
        chk = polish_batch_np(
            jax.tree.map(lambda a: a[ok_dev], d64h),
            np.asarray(pd.x)[ok_dev], np.asarray(pd.y)[ok_dev],
            eps_abs=1e-6, eps_rel=1e-6, rounds=0,
        )
        n_ref = int(np.asarray(chk.ok).sum())
        assert n_ref == int(ok_dev.sum()), (
            f"host referee {n_ref}/{int(ok_dev.sum())}"
        )

    check("device_polish_referee_parity", device_polish_check)

    ok = all(r["ok"] for r in RESULTS)
    print(json.dumps({"smoke_ok": ok, "checks": RESULTS}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
