"""On-hardware smoke test for the fused Pallas kernel (run when the TPU
tunnel is up; everything else covers it only in interpret mode on CPU).

Validates, on ONE real-TPU B=128 batch per configuration:
  1. the all-VMEM kernel (n=16) — Mosaic-compiles and matches the XLA
     vmapped loop per lane (statuses equal, iteration counts equal up to
     the known 1-lane-per-~128 f32 tolerance-boundary drift, x close);
  2. the HBM-streaming kernel (n=128: Q/A panel-DMA'd) — same parity bar;
  3. dual-objective termination + nonconvex gamma-pinned configurations
     (the commit-b6ba52a semantics: stall counter, gamma-boost baseline,
     certificate aliasing, NaN-safe masking) — statuses/x asserted.

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


def _parity(probs, settings, n, m, noise_floor_eps=False, **fused_kw):
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
        assert (dmax < 10 * settings.eps_abs).all(), (flips, dmax)
        assert len(flips) <= B // 4, f"{len(flips)} floor flips"
        return
    assert np.array_equal(status, rstat), (
        f"status mismatch: {np.where(status != rstat)[0]}"
    )
    drift = np.asarray(iters) != np.asarray(ref.iterations)
    assert drift.sum() == 0, f"iter drift on {np.where(drift)[0]}"


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

    ok = all(r["ok"] for r in RESULTS)
    print(json.dumps({"smoke_ok": ok, "checks": RESULTS}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
