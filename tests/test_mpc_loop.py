"""Stage-sharded P-ALM loop: the whole solve distributed over the mesh
(SPIKE Schur reductions per Newton step) must match the sequential solver
on the same MPC problems."""

import numpy as np
import pytest

from qpalm_tpu import QPALM, Settings
from qpalm_tpu.parallel import default_mesh
from qpalm_tpu.parallel.mpc_loop import from_mpc_chain, solve_mpc_stage_sharded
from qpalm_tpu.workloads import mpc_chain, mpc_stage_permutation

S = Settings(eps_abs=1e-6, eps_rel=1e-6, proximal=False, scaling=0,
             verbose=False)


@pytest.mark.parametrize("masses,horizon,seed", [(4, 16, 0), (3, 8, 2)])
def test_stage_sharded_matches_sequential(masses, horizon, seed):
    H, A, q, bmin, bmax, meta = mpc_chain(masses, horizon, seed=seed)
    nx, nu, N = meta["nx"], meta["nu"], meta["N"]
    data = from_mpc_chain(H, A, q, bmin, bmax, meta)
    mesh = default_mesh(8, axis_name="stage")
    z, status, iters = solve_mpc_stage_sharded(data, S, mesh, "stage")
    assert int(status) == 1

    perm = mpc_stage_permutation(nx, nu, N)
    r = QPALM(H[np.ix_(perm, perm)], A[:, perm], q[perm], bmin, bmax,
              settings=S).solve()
    assert r.info.status == "solved"
    # same algorithm, same data => identical iteration counts and iterates
    assert int(iters) == int(r.info.iter)
    np.testing.assert_allclose(
        np.asarray(z).reshape(-1), r.solution.x, atol=1e-10
    )


def test_stage_sharded_chain80w_scale():
    """The chain80w protocol shape: 240 vars, horizon 80, sharded 8 ways."""
    H, A, q, bmin, bmax, meta = mpc_chain(1, 80, seed=0)
    assert H.shape[0] == 240
    data = from_mpc_chain(H, A, q, bmin, bmax, meta)
    mesh = default_mesh(8, axis_name="stage")
    z, status, iters = solve_mpc_stage_sharded(data, S, mesh, "stage")
    assert int(status) == 1

    nx, nu, N = meta["nx"], meta["nu"], meta["N"]
    perm = mpc_stage_permutation(nx, nu, N)
    r = QPALM(H[np.ix_(perm, perm)], A[:, perm], q[perm], bmin, bmax,
              settings=S).solve()
    np.testing.assert_allclose(
        np.asarray(z).reshape(-1), r.solution.x, atol=1e-8
    )
