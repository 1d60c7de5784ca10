#!/usr/bin/env python
"""Process-per-device scaling run: no host-core oversubscription.

The single-process virtual-mesh scaling table (`bench_scaling.py`) is
polluted above 4 devices by core oversubscription, and even below it by
XLA:CPU's shared intra-op thread pool: the 1-device run already uses all
host cores, so collective overhead and host contention are conflated.

This script runs ONE XLA:CPU device per OS process, each process pinned to
its own physical core (`taskset`), with gloo cross-process collectives —
the closest this 4-core box gets to "N chips with a real interconnect".
Efficiency loss in these tables is attributable to communication (gloo
over localhost + collective structure), not to host contention.

Workloads match `bench_scaling.py` row-for-row (same seeds/shapes):
  * DP weak scaling: `solve_batch_sharded`, 48 QPs/device, n=32, m=48.
  * Stage-sharded overhead: `solve_mpc_stage_sharded`, chain of 10
    masses, horizon 128 (strong scaling of one QP's horizon).

Usage:
  python scripts/bench_scaling_multiproc.py          # parent: runs 1/2/4
  python scripts/bench_scaling_multiproc.py WORKER I N PORT   # internal

Writes benchmarks/RESULTS_scaling_multiproc.md, splices a summary section
into benchmarks/RESULTS_scaling.md, and prints one JSON line.
"""

import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SIZES = [1, 2, 4]
B_PER_DEV, N, M = 48, 32, 48
REPS = 5


def worker(pid: int, nproc: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import qpalm_tpu  # noqa: F401  (enables x64)
    from qpalm_tpu import Settings, constants as C
    from qpalm_tpu.batch import stack_problems
    from qpalm_tpu.parallel.mpc_loop import (
        mpc_chain_stage_data, solve_mpc_stage_sharded,
    )
    from qpalm_tpu.parallel.sharded import default_mesh, solve_batch_sharded
    from qpalm_tpu.workloads import random_qp

    assert len(jax.devices()) == nproc, jax.devices()

    def make_global(arr, mesh, axis):
        """Shard identical full-host copies over the process mesh."""
        arr = np.asarray(arr)
        sh = NamedSharding(mesh, P(axis, *([None] * (arr.ndim - 1))))
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )

    def replicate(arr, mesh):
        arr = np.asarray(arr)
        sh = NamedSharding(mesh, P(*([None] * arr.ndim)))
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )

    def barrier(mesh):
        """Synchronise all processes before starting a timed region."""
        x = replicate(np.zeros(()), mesh)
        y = jax.jit(lambda v: v + 1.0,
                    out_shardings=NamedSharding(mesh, P()))(x)
        jax.block_until_ready(y)

    def timed(run, mesh, reps=REPS):
        ts = []
        for _ in range(reps):
            barrier(mesh)
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # ---- DP weak scaling ---------------------------------------------------
    s = Settings(eps_abs=1e-4, eps_rel=1e-4, max_iter=200, scaling=2,
                 verbose=False)
    B = B_PER_DEV * nproc
    probs = [random_qp(N, M, seed=100 + i) for i in range(B)]
    data = stack_problems(probs, np.float64)
    n_pad, m_pad = data.q.shape[1], data.bmin.shape[1]
    mesh = default_mesh(nproc)
    gdata = jax.tree.map(lambda a: make_global(a, mesh, "qp"), data)
    gx = make_global(np.zeros((B, n_pad)), mesh, "qp")
    gy = make_global(np.zeros((B, m_pad)), mesh, "qp")
    gg = make_global(np.full((B,), s.gamma_init), mesh, "qp")

    def run_dp():
        res, agg = solve_batch_sharded(gdata, gx, gy, gg, s, False, False,
                                       mesh, "qp")
        jax.block_until_ready(res.x)
        return agg

    def run_dp_local():
        # aggregate=False: no cross-process collectives at all — the
        # aggregates come back as device-local partials (itemizes how much
        # of the weak-scaling loss is the gloo reductions themselves)
        res, agg = solve_batch_sharded(gdata, gx, gy, gg, s, False, False,
                                       mesh, "qp", aggregate=False)
        jax.block_until_ready(res.x)
        return agg

    agg = run_dp()
    n_solved = int(agg["n_solved"])
    total_iters = int(agg["total_iters"])
    assert n_solved == B, (nproc, n_solved)
    agg_l = run_dp_local()
    # the no-collective partials are process-local shards: each process
    # checks ITS shard solved all of its local problems
    local_solved = sum(int(np.asarray(sh.data).sum())
                       for sh in agg_l["n_solved"].addressable_shards)
    assert local_solved == B // nproc, (nproc, local_solved)
    t = timed(run_dp, mesh)
    t_local = timed(run_dp_local, mesh)
    if pid == 0:
        print("DP_RESULT " + json.dumps({
            "devices": nproc, "batch": B, "time_s": round(t, 4),
            "time_s_noagg": round(t_local, 4),
            "solves_per_s": round(B / t, 1),
            "iters_per_s": round(total_iters / t, 1),
        }), flush=True)

    # ---- stage-sharded strong scaling ---------------------------------------
    # two block regimes: the small-block chain (nb=30 — latency-bound,
    # the round-3 overhead case) and a LARGE-block chain (nb=120: the
    # O(nb^3) per-stage Thomas factors dominate — the crossover regime)
    ss = Settings(eps_abs=1e-6, eps_rel=1e-6, max_iter=500, scaling=2,
                  verbose=False)
    mesh_s = default_mesh(nproc, axis_name="stage")
    # four regimes (VERDICT r4 directive #4 adds the two _long rows):
    #  * small (nb=29, S=128): the round-3 latency-bound overhead case
    #  * large (nb=119, S=64): the first profitable config (round 4)
    #  * small_long (nb=29, S=1536): the cost model's own predicted gloo
    #    crossover point for small blocks (S >~ 1,500 at D=2) — the
    #    model's second testable prediction, run to validate it
    #  * large_long (nb=119, S=256): C(1)/4 >> O(4) — the regime where
    #    adding devices must KEEP paying (D=4 > D=2 > D=1)
    st_rows = (("small", 10, 128, REPS), ("large", 40, 64, REPS),
               ("small_long", 10, 1536, 3), ("large_long", 40, 256, 3))
    for tag, masses, horizon, row_reps in st_rows:
        # stage-block-direct constructor: the dense mpc_chain route holds
        # ~27 GB of resident vstack pages per process at horizon 1536 —
        # four processes OOM a 125 GB box (observed 2026-08-20)
        sdata = mpc_chain_stage_data(masses, horizon, seed=3)
        nb_blk = sdata.q.shape[1]
        gsdata = type(sdata)(*[
            make_global(a, mesh_s, "stage") for a in sdata
        ])

        def run_st():
            res = solve_mpc_stage_sharded(gsdata, ss, mesh_s, "stage")
            jax.block_until_ready(res.z)
            return res

        res = run_st()
        assert int(res.status) == C.QPALM_SOLVED, (nproc, int(res.status))
        iters = int(res.iterations)
        t = timed(run_st, mesh_s, reps=row_reps)
        if pid == 0:
            nb = nb_blk
            print(f"ST_RESULT_{tag} " + json.dumps({
                "devices": nproc, "nb": nb, "stages": horizon,
                "time_s": round(t, 4), "iterations": iters,
                "iters_per_s": round(iters / t, 1),
            }), flush=True)

    if nproc > 1:
        jax.distributed.shutdown()


def run_size(nproc: int, port: int):
    """Spawn nproc core-pinned workers; return (dp_row, st_row)."""
    procs = []
    for i in range(nproc):
        cmd = ["taskset", "-c", str(i), sys.executable,
               os.path.abspath(__file__), "WORKER", str(i), str(nproc),
               str(port)]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=_REPO,
        ))
    out0, _ = procs[0].communicate(timeout=3600)
    rcs = [procs[0].returncode]
    for p in procs[1:]:
        p.communicate(timeout=600)
        rcs.append(p.returncode)
    if any(rc != 0 for rc in rcs):
        sys.stderr.write(out0)
        raise RuntimeError(f"size {nproc}: worker rcs {rcs}")
    dp = None
    st = {}
    for line in out0.splitlines():
        if line.startswith("DP_RESULT "):
            dp = json.loads(line[len("DP_RESULT "):])
        elif line.startswith("ST_RESULT_"):
            tag, payload = line[len("ST_RESULT_"):].split(" ", 1)
            st[tag] = json.loads(payload)
    if dp is None or set(st) != {"small", "large", "small_long",
                                 "large_long"}:
        sys.stderr.write(out0)
        raise RuntimeError(f"size {nproc}: missing result lines "
                           f"(got {sorted(st)})")
    return dp, st


MARKER = "## Process-per-device scaling (no core oversubscription)"


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "WORKER":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return 0

    # per-size resume cache: each completed size is persisted immediately,
    # so an OOM/crash at size N only costs size N on the re-run (the full
    # 1/2/4 sweep is ~50 min of wall-clock).  Delete the file for a fresh
    # measurement.
    cache_path = os.path.join(_REPO, "benchmarks",
                              ".scaling_multiproc_cache.json")
    cache = {}
    if os.path.exists(cache_path) and not os.environ.get(
            "QPALM_SCALING_FRESH"):
        with open(cache_path) as f:
            cache = json.load(f)

    dp_rows = []
    st_tabs = {t: [] for t in ("small", "large", "small_long",
                               "large_long")}
    for k, nproc in enumerate(SIZES):
        key = str(nproc)
        if key in cache:
            dp, st = cache[key]["dp"], cache[key]["st"]
            print(f"size {nproc}: cached", flush=True)
        else:
            dp, st = run_size(nproc, 47731 + k)
            cache[key] = {"dp": dp, "st": st}
            with open(cache_path, "w") as f:
                json.dump(cache, f)
        dp_rows.append(dp)
        for tag, row in st.items():
            st_tabs[tag].append(row)
        print(f"size {nproc}: dp {dp['solves_per_s']} solves/s, "
              + ", ".join(f"stage-{t} {st[t]['iters_per_s']} it/s"
                          for t in sorted(st)), flush=True)

    base = dp_rows[0]["solves_per_s"]
    for r in dp_rows:
        r["weak_efficiency"] = round(
            r["solves_per_s"] / (base * r["devices"]), 3)
    st_rows = st_tabs["small"]
    base_t = st_rows[0]["time_s"]
    for r in st_rows:
        r["overhead_factor"] = round(r["time_s"] / base_t, 3)
    for tag in ("large", "small_long", "large_long"):
        base_tl = st_tabs[tag][0]["time_s"]
        for r in st_tabs[tag]:
            r["speedup"] = round(base_tl / r["time_s"], 3)
    stl_rows = st_tabs["large"]

    lines = [
        MARKER,
        "",
        "Generated by `python scripts/bench_scaling_multiproc.py`: one",
        "XLA:CPU device per OS process, each pinned to its own physical",
        "core (`taskset`), gloo cross-process collectives.  Unlike the",
        "virtual-mesh tables above, every process has a dedicated core, so",
        "efficiency loss here is communication (gloo over localhost +",
        "collective structure), not host contention.  Same workloads and",
        "seeds as the virtual-mesh tables.",
        "",
        f"### DP weak scaling ({B_PER_DEV} QPs/process, n={N}, m={M})",
        "",
        "`no-agg` times the identical solve with aggregate=False (zero",
        "cross-process collectives; metrics fetched as local partials) —",
        "the gap between the two columns is the gloo reduction cost.",
        "",
        "| processes | batch | time (s) | no-agg time (s) | solves/s "
        "| weak efficiency | no-agg efficiency |",
        "|---|---|---|---|---|---|---|",
    ]
    base_na = dp_rows[0].get("time_s_noagg", dp_rows[0]["time_s"])
    for r in dp_rows:
        na = r.get("time_s_noagg", r["time_s"])
        na_eff = round(base_na / na, 3)
        lines.append(f"| {r['devices']} | {r['batch']} | {r['time_s']} | "
                     f"{na} | {r['solves_per_s']} | {r['weak_efficiency']} "
                     f"| {na_eff} |")
    lines += [
        "",
        "### Stage-sharded distribution overhead (chain of 10 masses, "
        "horizon 128)",
        "",
        "| processes | time (s) | P-ALM iterations | iters/s | overhead "
        "factor |",
        "|---|---|---|---|---|",
    ]
    for r in st_rows:
        lines.append(f"| {r['devices']} | {r['time_s']} | "
                     f"{r['iterations']} | {r['iters_per_s']} | "
                     f"{r['overhead_factor']} |")
    lines += [
        "",
        f"### Stage-sharded LARGE blocks (chain of 40 masses, nb="
        f"{stl_rows[0].get('nb', 120)}, horizon "
        f"{stl_rows[0].get('stages', 64)})",
        "",
        "The crossover regime: per-stage block-Thomas work is O(nb^3),",
        "so at nb=120 each device's local factor work dominates the",
        "(fused, latency-bound) collectives.",
        "",
        "| processes | time (s) | P-ALM iterations | iters/s | speedup "
        "vs 1 proc |",
        "|---|---|---|---|---|",
    ]
    for r in stl_rows:
        lines.append(f"| {r['devices']} | {r['time_s']} | "
                     f"{r['iterations']} | {r['iters_per_s']} | "
                     f"{r['speedup']} |")
    for tag, title, blurb in (
        ("small_long",
         "Stage-sharded small blocks at the cost model's predicted "
         "crossover (chain of 10 masses, nb=29, horizon 1536)",
         "COST_MODEL_distributed.md predicts the small-block chain "
         "starts paying on gloo at D=2 around S >~ 1,500 stages — this "
         "row is that prediction, measured."),
        ("large_long",
         "Stage-sharded large blocks, long horizon (chain of 40 "
         "masses, nb=119, horizon 256)",
         "The regime where C(1)/4 >> O(4): adding devices must KEEP "
         "paying (D=4 > D=2 > D=1)."),
    ):
        rows_t = st_tabs[tag]
        lines += [
            "",
            f"### {title}",
            "",
            blurb,
            "",
            "| processes | time (s) | P-ALM iterations | iters/s | "
            "speedup vs 1 proc |",
            "|---|---|---|---|---|",
        ]
        for r in rows_t:
            lines.append(f"| {r['devices']} | {r['time_s']} | "
                         f"{r['iterations']} | {r['iters_per_s']} | "
                         f"{r['speedup']} |")
    lines.append("")
    section = "\n".join(lines)

    out_path = os.path.join(_REPO, "benchmarks",
                            "RESULTS_scaling_multiproc.md")
    with open(out_path, "w") as f:
        f.write(section)

    # splice into the main scaling report (replace any previous section)
    main_path = os.path.join(_REPO, "benchmarks", "RESULTS_scaling.md")
    if os.path.exists(main_path):
        with open(main_path) as f:
            body = f.read()
        body = re.split(re.escape(MARKER), body)[0].rstrip() + "\n\n"
        with open(main_path, "w") as f:
            f.write(body + section)

    print(json.dumps({"dp": dp_rows, "stage": st_rows,
                      "stage_large": stl_rows,
                      "stage_small_long": st_tabs["small_long"],
                      "stage_large_long": st_tabs["large_long"],
                      "report": out_path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
