"""Matmul-precision policy for the solver's device compute paths.

On TPU, JAX lowers float32 `dot`/`@`/`einsum` at *default* precision to
single-pass bfloat16 MXU products (~8 mantissa bits).  For an optimization
solver whose residuals, Newton systems and certificates live at 1e-4..1e-6
that is the wrong default: measured on a v5e (scripts/probe_precision.py,
B=128 random QPs, n=16), bf16-precision matvecs cost ~21% more P-ALM
iterations (mean 14.4 vs 11.9) and make iteration counts drift on 121/128
lanes versus full-f32 arithmetic; at eps 1e-6 in f32 they flip
solved/max_iter statuses outright.  The fused Pallas kernel always computes
full-f32 dots (Mosaic does not demote), so the XLA paths must match or the
two flagship paths diverge on hardware only.

`full_matmul_precision` scopes `jax.default_matmul_precision("highest")`
(f32 via 3-pass bf16 on the MXU — the same scheme Mosaic uses) around a
traced function body.  Applied beneath `jax.jit` on the root compute
functions, the whole nested trace (newton, linesearch, CG, certificates)
inherits it without touching library-global config.

Reference anchor: the reference is all-double C (`c_float = double`,
global_opts.h:21); full f32 + f64 polish is this framework's documented
speed/accuracy trade (BASELINE.md north star).
"""
from __future__ import annotations

import functools

import jax

__all__ = ["full_matmul_precision"]


def full_matmul_precision(fn):
    """Trace `fn` under jax.default_matmul_precision('highest')."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
