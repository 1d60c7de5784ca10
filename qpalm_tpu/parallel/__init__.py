"""Multi-device distribution for qpalm_tpu.

The reference is strictly single-process (SURVEY.md §2.4); everything here is
net-new TPU-native design:

* `sharded`   — data-parallel batch solves: the problem batch is sharded over
  a `jax.sharding.Mesh` with `shard_map`; each device runs its own solve loop
  on its local shard (no lockstep), collectives only aggregate metrics.
* `schur`     — intra-QP parallelism: constraint-dimension sharding of the
  Schur assembly A' diag(sigma) A and the m-sized iteration vectors, with
  `psum`/`all_gather` over ICI (the model-parallel analogue flagged in
  SURVEY.md §2.4).
"""

from .sharded import (
    default_mesh,
    pad_batch_to_devices,
    solve_batch_sharded,
)
from .schur import solve_constraint_sharded

__all__ = [
    "default_mesh",
    "pad_batch_to_devices",
    "solve_batch_sharded",
    "solve_constraint_sharded",
]
