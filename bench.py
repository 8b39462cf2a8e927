"""Benchmark harness: headline CDC replay throughput + per-query timings.

Prints ONE JSON line:
  {"metric": "cdc_replay_sec", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": <sf>, "num_cpus": N, "events_per_s": ...}

``--scaling`` runs the identical job in two fresh processes at
num_cpus=8 and num_cpus=32 (N vs 4N parallelism — the sandbox evidence for
the two-cluster-size criterion, see BASELINE.md) and reports both
throughputs plus scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from database_delta_plugins_ray.pipelines.queries import (
        ensure_log,
        fresh_lake,
        sf_tag,
    )
    from database_delta_plugins_ray.pipelines.replicate import (
        log_files,
        run_replication,
    )

    sf = sf_tag(SF_DIR)
    log = ensure_log(SF_DIR)
    import json as _json

    with open(os.path.join(log, "meta.json")) as fh:
        log_meta = _json.load(fh)

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    for f in log_files(log):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    timings: dict[str, float] = {}
    extras: dict = {}

    # headline: one-shot full replay
    lake = fresh_lake(SF_DIR, f"bench_lake_{NUM_CPUS}")
    t0 = time.time()
    s = run_replication(log, lake, num_partitions=max(32, NUM_CPUS * 2))
    timings["cdc_replay"] = time.time() - t0
    # throughput counts every log event replayed end-to-end (the per-batch
    # LWW combiner reduces what reaches the shuffle, but each event was
    # read, normalized and reflected in the final state)
    extras["log_events"] = log_meta["total_events"]
    extras["events_applied"] = s["events_applied"]
    extras["events_per_s"] = log_meta["total_events"] / timings["cdc_replay"]

    # incremental no-op poll (checkpoint fast path)
    t0 = time.time()
    run_replication(log, lake, num_partitions=max(32, NUM_CPUS * 2))
    timings["cdc_incremental_noop"] = time.time() - t0

    # other query benches (analytics module, if present)
    try:
        from database_delta_plugins_ray.pipelines.analytics import BENCH_QUERIES

        for name, fn in BENCH_QUERIES.items():
            t0 = time.time()
            res = fn(SF_DIR)
            if hasattr(res, "materialize"):
                res.materialize()
            timings[name] = time.time() - t0
    except ImportError:
        pass

    ray.shutdown()
    return {
        "metric": "cdc_replay_sec",
        "value": round(timings["cdc_replay"], 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "num_cpus": NUM_CPUS,
        **{k: (round(v, 1) if isinstance(v, float) else v) for k, v in extras.items()},
    }


def run_scaling() -> dict:
    """Same input, fresh process at 8 and at 32 CPUs; efficiency =
    (t_8 / t_32) / 4 (1.0 = linear)."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "cdc_replay_scaling",
        "sf": r_hi["sf"],
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"events_per_s_{lo}": r_lo.get("events_per_s"),
        f"events_per_s_{hi}": r_hi.get("events_per_s"),
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
