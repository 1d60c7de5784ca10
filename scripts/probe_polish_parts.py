#!/usr/bin/env python
"""Sub-phase timing of the host polish chunk (directive r5-#1)."""
import os
import sys
import time

os.environ.setdefault("QPALM_TPU_PALLAS", "0")
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

from bench import B, M_DIM, N_DIM, make_problems  # noqa: E402
from qpalm_tpu.batch import stack_problems  # noqa: E402
from qpalm_tpu import constants as C  # noqa: E402

probs = make_problems(B, N_DIM, M_DIM, seed=7)
d = jax.tree.map(np.asarray, stack_problems(probs, np.float64))
Q = np.asarray(d.Q); A = np.asarray(d.A); q = np.asarray(d.q)
bmin = np.asarray(d.bmin); bmax = np.asarray(d.bmax)
Bp, m, n = A.shape

# fake an f32-converged start point: solve each lane exactly then perturb
rng = np.random.default_rng(0)
# cheap surrogate: x0=0,y0=0 detect would be wrong; instead run the real
# numpy finisher briefly?  Too slow.  Use a moderate eps solve via polish
# itself to get a realistic active set, then perturb by 1e-5.
from qpalm_tpu.finish_np import palm_finish_np  # noqa: E402

t0 = time.perf_counter()
fin = palm_finish_np(d, np.zeros((Bp, n)), np.zeros((Bp, m)),
                     eps_abs=1e-4, eps_rel=1e-4)
print(f"seed solve: {time.perf_counter()-t0:.1f}s")
x0 = fin.x + 1e-5 * rng.standard_normal((Bp, n))
y0 = fin.y + 1e-5 * rng.standard_normal((Bp, m))

has_lb = bmin > -C.QPALM_INFTY
has_ub = bmax < C.QPALM_INFTY
act_tol, eps_abs = 1e-4, 1e-6
y_strong, y_zero = act_tol, eps_abs
eq = has_lb & has_ub & (bmax - bmin <= 1e-12 * np.maximum(1.0, np.abs(bmax)))


def _mv(M, v):
    return np.matmul(M, v[:, :, None])[:, :, 0]


def t(name, fn, reps=3):
    out = None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    print(f"  {name:40s} {min(ts)*1e3:8.2f} ms")
    return out


from threadpoolctl import threadpool_limits  # noqa: E402

t("threadpool_limits enter/exit", lambda: threadpool_limits(limits=1).__exit__(None, None, None) or 1)


def detect():
    Ax = _mv(A, x0)
    act_lo = has_lb & ((y0 < -y_strong) | ((Ax - bmin < act_tol) & (y0 <= y_zero)))
    act_hi = has_ub & ((y0 > y_strong) | ((bmax - Ax < act_tol) & (y0 >= -y_zero)))
    act_lo = act_lo | eq
    act_hi = act_hi & ~act_lo
    return act_lo, act_hi


act_lo, act_hi = t("detect (A@x + masks)", detect)
act = act_lo | act_hi
print(f"    active count: mean {act.sum(1).mean():.1f} max {act.sum(1).max()}")

b_side = np.where(act_lo, bmin, bmax)
order = np.argsort(~act, axis=1, kind="stable")
cap = int(act.sum(axis=1).max())
idx = order[:, :cap]
sel = np.take_along_axis(act, idx, 1)
Asub = np.take_along_axis(A, idx[:, :, None], 1)
bsub = np.take_along_axis(b_side, idx, 1)
Aact = Asub * sel[:, :, None].astype(Q.dtype)
nk = n + cap
print(f"    cap={cap} nk={nk}")


def build_K(dtype=np.float64):
    K = np.zeros((Bp, nk, nk), dtype)
    K[:, :n, :n] = Q
    K[:, :n, n:] = Aact.transpose(0, 2, 1)
    K[:, n:, :n] = Aact
    dix = np.arange(cap)
    K[:, n + dix, n + dix] = np.where(sel, -1e-9, 1.0)
    return K


K = t("build K f64", build_K)
K32 = t("build K f32", lambda: build_K(np.float32))
rhs = np.concatenate([-q, np.where(sel, bsub, 0.0)], axis=1)

from qpalm_tpu.polish import _bkkt_lib  # noqa: E402
lib = _bkkt_lib()
print("  native bkkt lib:", lib is not None)

with threadpool_limits(limits=1):
    def bk_factor():
        Kc = build_K()
        ipiv = np.empty((Bp, nk), np.int32)
        failv = np.empty(Bp, np.int32)
        sol = rhs.copy()
        lib.bkkt_factor_solve(Bp, nk, Kc, ipiv, sol, failv)
        return sol
    t("BK factor+solve f64 1 thread (incl build)", bk_factor)

# threaded 4-way
from concurrent.futures import ThreadPoolExecutor
pool = ThreadPoolExecutor(max_workers=4)


def bk_factor_chunked():
    bounds = np.linspace(0, Bp, 5).astype(int)
    def run(a, b):
        Kc = K[a:b].copy()
        ipiv = np.empty((b - a, nk), np.int32)
        failv = np.empty(b - a, np.int32)
        sol = rhs[a:b].copy()
        lib.bkkt_factor_solve(b - a, nk, Kc, ipiv, sol, failv)
        return sol
    with threadpool_limits(limits=1):
        return list(pool.map(lambda ab: run(*ab), zip(bounds[:-1], bounds[1:])))


t("BK factor+solve f64 4 threads (K prebuilt)", bk_factor_chunked)

# LU path comparison
with threadpool_limits(limits=1):
    t("np.linalg.solve f64 1 thread", lambda: np.linalg.solve(K, rhs[:, :, None]))
t("np.linalg.solve f64 BLAS-threaded", lambda: np.linalg.solve(K, rhs[:, :, None]))
t("np.linalg.solve f32 BLAS-threaded", lambda: np.linalg.solve(K32, rhs.astype(np.float32)[:, :, None]))


def check(x, y):
    Ax = _mv(A, x)
    z = np.clip(Ax, np.maximum(bmin, -C.QPALM_INFTY), np.minimum(bmax, C.QPALM_INFTY))
    Qx = _mv(Q, x)
    Aty = np.matmul(y[:, None, :], A)[:, 0, :]
    return Ax, z, Qx, Aty


t("check matvecs (A@x, Q@x, y@A)", lambda: check(x0, y0))
