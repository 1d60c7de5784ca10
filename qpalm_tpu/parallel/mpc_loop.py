"""The P-ALM solve loop running stage-sharded across a device mesh.

SURVEY §2.4's "intra-QP partitioning": for stage-structured MPC QPs
(variables z_k = [x_k; u_k], dynamics coupling adjacent stages, box rows
diagonal — the chain80w ladder, simulations/chain80w/info.txt:20-24), the
*entire* solve loop lives inside one `shard_map` with the horizon sharded
over the mesh:

  * A / A' matvecs are stage-local plus one `ppermute` halo exchange,
  * the Schur matrix is assembled block-locally (it is exactly
    block-tridiagonal in this ordering) and every Newton system is solved
    by the distributed SPIKE reduction — per-chunk block-Thomas
    factorization, one `all_gather` interface solve over ICI, local
    back-substitution (`block_tridiag.spike_solve_local`),
  * linesearch breakpoints are built locally and `all_gather`ed for the
    replicated sort-and-scan,
  * all norms/counters reduce with `pmax` / `psum`.

Scope (v1, the chain80w protocol): convex, proximal off, scaling off,
statuses solved / max-iter (MPC ladders are feasible by construction, so
the infeasibility certificates of the general solver are not replicated
here).  Semantics otherwise mirror qpalm_tpu.solver.core / the reference
qpalm.c loop; equivalence to the sequential solver is tested on the same
problems.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import constants as C
from ..solver.linesearch import linesearch_from_breakpoints
from ..types import Settings
from .block_tridiag import spike_solve_local


class MPCStageData(NamedTuple):
    """Stage-sharded MPC QP data (leading axis = stage, shardable).

    Stage variables z_k = [x_{k+1}; u_k]; the dynamics row of stage k is

        G z_k - Aprev z_{k-1} = beq_k,   G = [I  -Bd],  Aprev = [Ad  0]

    (x_{k+1} and u_k live in the SAME stage; x_k in the previous one; the
    k=0 row has no z_{-1} term — the initial state is folded into beq_0),
    followed by nb box rows  lo_k <= z_k <= hi_k.
    """

    H: jnp.ndarray   # (S, nb, nb) stage Hessian blocks
    q: jnp.ndarray   # (S, nb)
    beq: jnp.ndarray  # (S, nx)
    lo: jnp.ndarray   # (S, nb)
    hi: jnp.ndarray   # (S, nb)
    Ad: jnp.ndarray   # (nx, nx) shared dynamics (replicated)
    Bd: jnp.ndarray   # (nx, nu)


def from_mpc_chain(H, A, q, bmin, bmax, meta):
    """Convert a `workloads.mpc_chain` problem (z = [x_1..x_N | u_0..]) to
    stage-sharded MPCStageData (stage-interleaved)."""
    from ..workloads import mpc_stage_permutation

    nx, nu, N = meta["nx"], meta["nu"], meta["N"]
    nb = nx + nu
    perm = mpc_stage_permutation(nx, nu, N)
    Hp = np.asarray(H)[np.ix_(perm, perm)]
    qp = np.asarray(q)[perm]
    H_blocks = np.stack([Hp[k * nb:(k + 1) * nb, k * nb:(k + 1) * nb]
                         for k in range(N)])
    q_blocks = qp.reshape(N, nb)
    m_eq = meta["m_eq"]
    beq = np.asarray(bmin)[:m_eq].reshape(N, nx)
    # box rows of mpc_chain are eye(nz) in the ORIGINAL ordering — permute
    lo = np.asarray(bmin)[m_eq:][perm].reshape(N, nb)
    hi = np.asarray(bmax)[m_eq:][perm].reshape(N, nb)
    return MPCStageData(
        H=jnp.asarray(H_blocks), q=jnp.asarray(q_blocks),
        beq=jnp.asarray(beq), lo=jnp.asarray(lo), hi=jnp.asarray(hi),
        Ad=jnp.asarray(meta["Ad"]), Bd=jnp.asarray(meta["Bd"]),
    )


def _loop_body(data: MPCStageData, settings: Settings, nd: int, axis: str):
    """Build the per-iteration function for the stage-sharded loop.
    All (S_loc, ...) arrays are shard-local; scalars are replicated."""
    nb = data.H.shape[-1]
    nx = data.beq.shape[-1]
    dtype = data.H.dtype
    # dynamics row of stage k:  Gmat z_k - Aprev z_{k-1} = beq_k
    Gmat = jnp.concatenate(
        [jnp.eye(nx, dtype=dtype), -data.Bd], axis=1
    )  # (nx, nb)
    Aprev = jnp.concatenate(
        [data.Ad, jnp.zeros((nx, nb - nx), dtype)], axis=1
    )  # (nx, nb)
    idx = jax.lax.axis_index(axis)
    is_first = idx == 0
    is_last = idx == nd - 1

    def halo_left(v_last):
        """Each device receives the LEFT neighbor's per-stage tail value."""
        got = jax.lax.ppermute(v_last, axis,
                               [(i, (i + 1) % nd) for i in range(nd)])
        return jnp.where(is_first, jnp.zeros_like(got), got)

    def halo_right(v_first):
        got = jax.lax.ppermute(v_first, axis,
                               [(i, (i - 1) % nd) for i in range(nd)])
        return jnp.where(is_last, jnp.zeros_like(got), got)

    def pmax(v):
        return jax.lax.pmax(jnp.max(v), axis)

    def psum(v):
        return jax.lax.psum(jnp.sum(v), axis)

    def a_matvec(z):
        """(eq (S_loc, nx), box (S_loc, nb)) rows of A z."""
        z_prev = jnp.concatenate([halo_left(z[-1])[None], z[:-1]], axis=0)
        eq = z @ Gmat.T - z_prev @ Aprev.T
        return eq, z

    def at_matvec(w_eq, w_box):
        """A' w for stage-split w."""
        w_next = jnp.concatenate(
            [w_eq[1:], halo_right(w_eq[0])[None]], axis=0
        )
        return w_eq @ Gmat - w_next @ Aprev + w_box

    def h_matvec(z):
        return jnp.einsum("sij,sj->si", data.H, z)

    def assemble_blocks(sig_eq, sig_box_act):
        """Block-tridiagonal (D, E) of M = H + A' Sigma_act A."""
        sig_eq_next = jnp.concatenate(
            [sig_eq[1:], halo_right(sig_eq[0])[None]], axis=0
        )
        # D_k = H_k + Gmat' sig_eq_k Gmat + Aprev' sig_eq_{k+1} Aprev
        #       + diag(sig_box_act_k)
        GtSG = jnp.einsum("ri,sr,rj->sij", Gmat, sig_eq, Gmat)
        AtSA = jnp.einsum("ri,sr,rj->sij", Aprev, sig_eq_next, Aprev)
        D = data.H + GtSG + AtSA
        D = D + jnp.einsum(
            "si,ij->sij", sig_box_act, jnp.eye(nb, dtype=dtype)
        )
        # E_k at block (k+1, k): Gmat' sig_eq_{k+1} (-Aprev)
        E = -jnp.einsum("ri,sr,rj->sij", Gmat, sig_eq_next, Aprev)
        return D, E

    def iteration(st):
        (z, y_eq, y_box, sig_eq, sig_box, pri_in_eq, pri_in_box,
         eps_abs_in, eps_rel_in, active_old, nb_enter, nb_leave,
         no_change, it, it_out, prev_it, done, status) = st

        # ---- residuals (iteration.c:24-48, scaling identity) -------------
        Aeq, Abox = a_matvec(z)
        Axys_eq = Aeq + y_eq / sig_eq
        Axys_box = Abox + y_box / sig_box
        zcl_eq = data.beq  # equality rows clamp to beq
        zcl_box = jnp.clip(Axys_box, data.lo, data.hi)
        pri_eq = Aeq - zcl_eq
        pri_box = Abox - zcl_box
        yh_eq = y_eq + sig_eq * pri_eq
        yh_box = y_box + sig_box * pri_box
        Hz = h_matvec(z)
        df = Hz + data.q
        dphi = df + at_matvec(yh_eq, yh_box)

        # ---- termination (termination.c:44-129, unscaled) ----------------
        pri_norm = jnp.maximum(pmax(jnp.abs(pri_eq)), pmax(jnp.abs(pri_box)))
        dua_norm = pmax(jnp.abs(dphi))
        eps_pri = settings.eps_abs + settings.eps_rel * jnp.maximum(
            jnp.maximum(pmax(jnp.abs(Aeq)), pmax(jnp.abs(Abox))),
            jnp.maximum(pmax(jnp.abs(zcl_eq)), pmax(jnp.abs(zcl_box))),
        )
        Atyh = dphi - df
        max_norm = jnp.maximum(
            pmax(jnp.abs(Hz)),
            jnp.maximum(pmax(jnp.abs(data.q)), pmax(jnp.abs(Atyh))),
        )
        eps_dua = settings.eps_abs + settings.eps_rel * max_norm
        eps_dua_in = eps_abs_in + eps_rel_in * max_norm

        solved = (pri_norm < eps_pri) & (dua_norm < eps_dua)
        subproblem_done = dua_norm <= eps_dua_in
        outer_trigger = subproblem_done | (no_change == 3)
        exhausted = it == prev_it + settings.inner_max_iter

        # active sets (equality rows are always active)
        active_box = (Axys_box <= data.lo) | (Axys_box >= data.hi)
        enter = psum((active_box & ~active_old).astype(jnp.int32)).astype(jnp.int32)
        leave = psum((~active_box & active_old).astype(jnp.int32)).astype(jnp.int32)

        # ---- the four branches, fused with where-selects ------------------
        do_term = solved & ~done
        do_outer = ~solved & outer_trigger & ~done
        do_exh = ~solved & ~outer_trigger & exhausted & ~done
        do_inner = ~solved & ~outer_trigger & ~exhausted & ~done

        # outer / exhausted: sigma update + dual update (qpalm.c:515-660)
        upd_sigma = (do_outer | do_exh) & (it_out > 0) & (pri_norm > eps_pri)
        cond_eq = (jnp.abs(pri_eq) > settings.theta * jnp.abs(pri_in_eq))
        cond_box = (
            (jnp.abs(pri_box) > settings.theta * jnp.abs(pri_in_box))
            & active_box
        )
        mult_eq = jnp.maximum(
            1.0, settings.delta * jnp.abs(pri_eq) / (pri_norm + 1e-6)
        )
        mult_box = jnp.maximum(
            1.0, settings.delta * jnp.abs(pri_box) / (pri_norm + 1e-6)
        )
        sig_eq_new = jnp.where(
            upd_sigma & cond_eq,
            jnp.minimum(mult_eq * sig_eq, settings.sigma_max), sig_eq,
        )
        sig_box_new = jnp.where(
            upd_sigma & cond_box,
            jnp.minimum(mult_box * sig_box, settings.sigma_max), sig_box,
        )
        y_eq_new = jnp.where(do_outer, yh_eq, y_eq)
        y_box_new = jnp.where(do_outer, yh_box, y_box)
        eps_abs_in_new = jnp.where(
            do_outer,
            jnp.maximum(settings.eps_abs, settings.rho * eps_abs_in),
            eps_abs_in,
        )
        eps_rel_in_new = jnp.where(
            do_outer,
            jnp.maximum(settings.eps_rel, settings.rho * eps_rel_in),
            eps_rel_in,
        )
        pri_in_eq_new = jnp.where(do_outer | do_exh, pri_eq, pri_in_eq)
        pri_in_box_new = jnp.where(do_outer | do_exh, pri_box, pri_in_box)
        it_out_new = jnp.where(do_outer | do_exh, it_out + 1, it_out)
        prev_it_new = jnp.where(do_outer | do_exh, it, prev_it)

        # inner: Newton via distributed SPIKE + gathered linesearch
        sig_box_act = jnp.where(active_box, sig_box_new, 0.0)
        D, E = assemble_blocks(sig_eq_new, sig_box_act)
        d = spike_solve_local(D, E, -dphi, nd, axis)

        Hd = h_matvec(d)
        eta = psum(d * Hd)
        beta = psum(d * df)
        Ad_eq, Ad_box = a_matvec(d)
        sqrt_se = jnp.sqrt(sig_eq_new)
        sqrt_sb = jnp.sqrt(sig_box_new)
        s_ad = jnp.concatenate(
            [(sqrt_se * Ad_eq).ravel(), (sqrt_sb * Ad_box).ravel()]
        )
        alpha_lo = jnp.concatenate([
            ((y_eq_new + sig_eq_new * (Aeq - data.beq)) / sqrt_se).ravel(),
            ((y_box_new + sig_box_new * (Abox - data.lo)) / sqrt_sb).ravel(),
        ])
        alpha_hi = jnp.concatenate([
            ((-y_eq_new + sig_eq_new * (data.beq - Aeq)) / sqrt_se).ravel(),
            ((-y_box_new + sig_box_new * (data.hi - Abox)) / sqrt_sb).ravel(),
        ])
        delta_l = jnp.concatenate([-s_ad, s_ad])
        alpha_l = jnp.concatenate([alpha_lo, alpha_hi])
        delta_g = jax.lax.all_gather(delta_l, axis).ravel()
        alpha_g = jax.lax.all_gather(alpha_l, axis).ravel()
        tau = linesearch_from_breakpoints(eta, beta, delta_g, alpha_g)

        z_new = jnp.where(do_inner, z + tau * d, z)
        active_old_new = jnp.where(do_inner, active_box, active_old)
        no_change_new = jnp.where(
            do_inner,
            jnp.where(nb_enter + nb_leave > 0, 0, no_change + 1),
            jnp.where(do_outer | do_exh, 0, no_change),
        )
        nb_enter_new = jnp.where(do_inner, enter, nb_enter)
        nb_leave_new = jnp.where(do_inner, leave, nb_leave)

        done_new = done | do_term
        status_new = jnp.where(
            do_term, jnp.asarray(C.QPALM_SOLVED, jnp.int32), status
        )
        it_new = jnp.where(done_new, it, it + 1)

        return (z_new, y_eq_new, y_box_new, sig_eq_new, sig_box_new,
                pri_in_eq_new, pri_in_box_new, eps_abs_in_new,
                eps_rel_in_new, active_old_new, nb_enter_new, nb_leave_new,
                no_change_new, it_new, it_out_new, prev_it_new, done_new,
                status_new)

    return iteration


@functools.partial(jax.jit, static_argnames=("settings", "mesh", "axis"))
def solve_mpc_stage_sharded(
    data: MPCStageData,
    settings: Settings,
    mesh: Mesh,
    axis: str = "stage",
):
    """Solve a stage-structured MPC QP with the horizon sharded over `mesh`.

    Returns (z (S, nb) stage-sharded, status, iterations).  The horizon S
    must be divisible by the mesh size.  See the module docstring for scope.
    """
    nd = mesh.shape[axis]
    spec = P(axis)
    data_specs = MPCStageData(H=spec, q=spec, beq=spec, lo=spec, hi=spec,
                              Ad=P(), Bd=P())

    def local(d: MPCStageData):
        S_loc, nb = d.q.shape
        nx = d.beq.shape[-1]
        dtype = d.H.dtype
        iteration = _loop_body(d, settings, nd, axis)

        def psum(v):
            return jax.lax.psum(jnp.sum(v), axis)

        # initialize_sigma (iteration.c:50-84) at z = 0: f = 0, dist from
        # the zero iterate
        dist2 = psum(d.beq * d.beq) + psum(
            (jnp.clip(jnp.zeros((S_loc, nb), dtype), d.lo, d.hi)) ** 2
        )
        sig0 = jnp.clip(
            settings.sigma_init / jnp.maximum(1.0, 0.5 * dist2), 1e-4, 1e4
        )
        z = jnp.zeros((S_loc, nb), dtype)
        st = (
            z,
            jnp.zeros((S_loc, nx), dtype),       # y_eq
            jnp.zeros((S_loc, nb), dtype),       # y_box
            jnp.full((S_loc, nx), sig0, dtype),  # sig_eq
            jnp.full((S_loc, nb), sig0, dtype),  # sig_box
            jnp.zeros((S_loc, nx), dtype),       # pri_in_eq
            jnp.zeros((S_loc, nb), dtype),       # pri_in_box
            jnp.asarray(settings.eps_abs_in, dtype),
            jnp.asarray(settings.eps_rel_in, dtype),
            jnp.zeros((S_loc, nb), bool),        # active_old
            jnp.zeros((), jnp.int32),            # nb_enter
            jnp.zeros((), jnp.int32),            # nb_leave
            jnp.zeros((), jnp.int32),            # no_change
            jnp.zeros((), jnp.int32),            # iter
            jnp.zeros((), jnp.int32),            # iter_out
            jnp.zeros((), jnp.int32),            # prev_iter
            jnp.zeros((), bool),                 # done
            jnp.asarray(C.QPALM_UNSOLVED, jnp.int32),
        )

        def cond(st):
            return (~st[16]) & (st[13] < settings.max_iter)

        final = jax.lax.while_loop(cond, iteration, st)
        status = jnp.where(
            final[16], final[17],
            jnp.asarray(C.QPALM_MAX_ITER_REACHED, jnp.int32),
        )
        return final[0], status, final[13]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(data_specs,),
        out_specs=(spec, P(), P()),
        check_vma=False,
    )(data)
