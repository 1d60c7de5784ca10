"""Checkpoint / resume of solver results and warm-start state.

The reference has no serialization; its functional equivalent is the
warm-start + parametric-update API that keeps a workspace alive across
solves (SURVEY.md §5, reference qpalm.c:322-399, 739-871).  Here the solver
state is an immutable pytree, so checkpointing is literally saving arrays:
long sweeps can persist (x, y) pairs per problem and resume by warm starting.
"""

from __future__ import annotations

import numpy as np

from .types import SolveResult


def save_solution(path: str, result: SolveResult) -> None:
    """Persist a solve's warm-start payload (x, y) plus status metadata."""
    np.savez(
        path,
        x=np.asarray(result.solution.x),
        y=np.asarray(result.solution.y),
        status=np.asarray(result.info.status_val),
        iterations=np.asarray(result.info.iter),
        objective=np.asarray(result.info.objective),
    )


def load_solution(path: str):
    """Load a saved solution; returns (x, y, meta dict).  Feed (x, y) to
    `QPALM.warm_start` to resume."""
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        return (
            z["x"],
            z["y"],
            {
                "status": int(z["status"]),
                "iterations": int(z["iterations"]),
                "objective": float(z["objective"]),
            },
        )


def save_batch(path: str, result) -> None:
    """Persist a BatchResult (stacked warm starts + statuses) for a sweep."""
    np.savez(
        path,
        x=np.asarray(result.x),
        y=np.asarray(result.y),
        status=np.asarray(result.status),
        iterations=np.asarray(result.iterations),
        objective=np.asarray(result.objective),
    )


def load_batch(path: str) -> dict:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        return {k: z[k] for k in z.files}
