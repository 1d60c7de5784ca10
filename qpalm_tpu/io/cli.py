"""Command-line QPS driver.

TPU-native equivalent of the reference `qpalm_qps` executable (reference:
interfaces/qps/src/qpalm_qps.c:694-806):

    python -m qpalm_tpu.io.cli problem.qps [settings.txt]
    python -m qpalm_tpu.io.cli --mtx A.mtx Q.mtx q.mtx bmin.mtx bmax.mtx

Prints the problem name, iterations, status, objective and runtime.

A single float64 solve is latency- not throughput-bound, so the CLI defaults
to the host CPU backend (TPU f64 is emulated and the per-shape compile is
slow); pass `--platform tpu` to run on the accelerator (float32 batched
sweeps should use qpalm_tpu.batch directly).
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    platform = "cpu"
    if "--platform" in argv:
        i = argv.index("--platform")
        platform = argv[i + 1]
        del argv[i : i + 2]
    if not argv:
        print(
            "Usage: python -m qpalm_tpu.io.cli [--platform cpu|tpu] problem.qps [settings.txt]\n"
            "       python -m qpalm_tpu.io.cli --mtx A Q q bmin bmax [settings.txt]",
            file=sys.stderr,
        )
        return 1
    if platform != "default":
        import jax

        jax.config.update("jax_platforms", platform)

    from .mtx import load_mtx
    from .qps import load_qps
    from .settings_io import read_settings_file

    settings_path = None
    if argv[0] == "--mtx":
        if len(argv) < 6:
            print("--mtx needs 5 files: A Q q bmin bmax", file=sys.stderr)
            return 1
        prob = load_mtx(*argv[1:6])
        if len(argv) > 6:
            settings_path = argv[6]
    else:
        prob = load_qps(argv[0])
        if len(argv) > 1:
            settings_path = argv[1]
    print(f"Reading problem {prob.name or argv[0]}")
    print(f"n = {prob.n}, m = {prob.m}")

    from ..api import solve
    from ..types import Settings

    settings = Settings()
    if settings_path is not None:
        settings = read_settings_file(settings_path, settings)

    res = solve(
        prob.Q, prob.A, prob.q, prob.bmin, prob.bmax, c=prob.c,
        settings=settings,
    )
    print(f"Iter: {int(res.info.iter)}")
    print(f"Status: {res.info.status}")
    print(f"Objective: {float(res.info.objective):.6e}")
    print(f"Runtime: {res.info.run_time:.6f} seconds")
    return 0


if __name__ == "__main__":
    sys.exit(main())
