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
#: exchange strategy for the replay: "fragment" (hash-partitioned write,
#: no sort barrier — the default; see run_replication docstring) or "sort"
EXCHANGE = os.environ.get("RAY_GRAFT_EXCHANGE", "fragment")


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

    # warm the worker pool (spawn + heavy imports) so the timed sections
    # measure steady-state throughput, not one-time process startup
    def _warm(batch):
        import pandas  # noqa: F401

        import database_delta_plugins_ray.stages.normalize  # noqa: F401
        import database_delta_plugins_ray.stages.merge  # noqa: F401

        return batch

    ray.data.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 8).map_batches(
        _warm
    ).materialize()

    timings: dict[str, float] = {}
    extras: dict = {}

    # Host self-calibration: a fixed-flop numpy burn (zero data movement,
    # no engine code) timed in the same session. The sandbox host's speed
    # varies >2x across hours (hypervisor neighbors); dividing any query
    # time by (compute_sec / quiet-host reference) normalizes runs to
    # comparable host conditions. The burn is exactly ONE WAVE (tasks ==
    # num_cpus) so its wall time measures per-core speed and is invariant
    # to the parallelism level — a fixed task count would take more waves
    # at low num_cpus and over-correct that level.
    def _burn(b):
        import numpy as np

        x = np.arange(1 << 14, dtype=np.float64)
        for _ in range(1500):
            x = np.sqrt(x * 1.000001 + 1.0)
        return {"acc": np.array([float(x.sum())])}

    t0 = time.time()
    ray.data.range(NUM_CPUS, override_num_blocks=NUM_CPUS).map_batches(
        _burn
    ).materialize()
    compute_sec = time.time() - t0

    # Second calibration axis: a bare parallel SCAN of the same log bytes
    # (read_parquet + one Arrow kernel, no engine code). The dominant host
    # noise on this box is data-movement-shaped (shared memory bandwidth /
    # hypervisor neighbors) and is INVISIBLE to the flop burn — sessions
    # with compute_sec at the quiet reference have shown 2x swings on
    # byte-moving work. scan_sec / quiet reference normalizes that axis.
    def _scan(b):
        import pyarrow as pa
        import pyarrow.compute as pc

        content = pc.struct_field(b["after"], "content")
        return pa.table({
            "bytes": pa.array(
                [pc.sum(pc.binary_length(content)).as_py() or 0])})

    t0 = time.time()
    ray.data.read_parquet(
        log_files(log), columns=["lsn", "after"],
        override_num_blocks=NUM_CPUS * 2,
    ).map_batches(_scan, batch_format="pyarrow",
                  zero_copy_batch=True).take_all()
    extras["host_calibration"] = {
        "compute_sec": round(compute_sec, 3),
        "quiet_host_reference_sec": 0.40,
        "scan_sec": round(time.time() - t0, 3),
        "quiet_scan_reference_sec": 1.10,
    }

    # headline: full replay, MIN of two runs into fresh lakes. The first
    # sample pays residual one-time costs the import warm-up can't reach
    # (merger actor-pool spawn, plasma store growth) and is fully exposed
    # to transient host stalls; the min is the steady-state engine number
    # (standard best-of-N timing). Both samples are reported.
    samples = []
    s = None
    best_dt = float("inf")
    for rep in range(2):
        lake = fresh_lake(SF_DIR, f"bench_lake_{NUM_CPUS}_{rep}")
        t0 = time.time()
        s_rep = run_replication(log, lake,
                                num_partitions=max(32, NUM_CPUS * 2),
                                exchange=EXCHANGE)
        dt = time.time() - t0
        samples.append(round(dt, 3))
        if dt < best_dt:
            best_dt, s, lake_best = dt, s_rep, lake
    lake = lake_best
    timings["cdc_replay"] = round(best_dt, 3)
    extras["replay_samples"] = samples
    # host-independent engine metric: replay wall over bare-scan wall of
    # the SAME bytes in the SAME session — ~2.2 on this engine whether
    # the host's data path is quiet or 3x degraded (see BASELINE.md)
    scan_sec = extras["host_calibration"]["scan_sec"]
    if scan_sec > 0:
        extras["replay_over_scan"] = round(min(samples) / scan_sec, 2)
    # throughput counts every log event replayed end-to-end (the per-batch
    # LWW combiner reduces what reaches the shuffle, but each event was
    # read, normalized and reflected in the final state)
    extras["log_events"] = log_meta["total_events"]
    extras["events_applied"] = s["events_applied"]
    extras["events_per_s"] = log_meta["total_events"] / timings["cdc_replay"]
    extras["phases"] = s.get("phases", {})

    # incremental no-op poll (checkpoint fast path)
    t0 = time.time()
    run_replication(log, lake, num_partitions=max(32, NUM_CPUS * 2),
                    exchange=EXCHANGE)
    timings["cdc_incremental_noop"] = time.time() - t0

    # other query benches (analytics module, if present); skipped in
    # headline-only mode (used by --scaling subprocesses)
    if os.environ.get("RAY_GRAFT_HEADLINE_ONLY"):
        ray.shutdown()
        return {
            "metric": "cdc_replay_sec",
            "value": round(timings["cdc_replay"], 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": sf,
            "num_cpus": NUM_CPUS,
            **{k: (round(v, 1) if isinstance(v, float) else v)
               for k, v in extras.items()},
        }

    try:
        from database_delta_plugins_ray.pipelines.analytics import BENCH_QUERIES

        # min of two runs per query, matching the headline protocol: the
        # first sample pays stage-specific worker/actor cold start
        # (measured 5x on some queries) and transient host stalls; the
        # min is the steady-state number
        for name, fn in BENCH_QUERIES.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                res = fn(SF_DIR)
                if hasattr(res, "materialize"):
                    res.materialize()
                best = min(best, time.time() - t0)
            timings[name] = best
    except ImportError:
        pass

    # all-datatypes replication (the type-conformance core, end to end);
    # log generation happens once outside the timed section
    from database_delta_plugins_ray.pipelines.queries import (
        cdc_all_datatypes,
        ensure_typed_log,
    )

    ensure_typed_log(SF_DIR)
    best = float("inf")
    for _ in range(2):  # fresh lake per call; same min-of-2 protocol
        t0 = time.time()
        cdc_all_datatypes(SF_DIR).materialize()
        best = min(best, time.time() - t0)
    timings["cdc_all_datatypes"] = best

    # incremental view maintenance over the SAME 2.1M-event log: full
    # one-shot maintain (fresh view per sample, min-of-2), then the
    # caught-up no-op poll (the steady-state incremental cost)
    import shutil as _shutil

    from database_delta_plugins_ray.pipelines.ivm import maintain_view
    from database_delta_plugins_ray.pipelines.queries import (
        CACHE_ROOT,
        log_dir_for,
    )

    log_dir = log_dir_for(SF_DIR)
    view_dir = os.path.join(CACHE_ROOT, f"sf{sf}", "bench_view")
    best = float("inf")
    for _ in range(2):
        _shutil.rmtree(view_dir, ignore_errors=True)
        t0 = time.time()
        maintain_view(log_dir, view_dir, num_partitions=32)
        best = min(best, time.time() - t0)
    timings["ivm_maintain_view"] = best
    t0 = time.time()
    maintain_view(log_dir, view_dir, num_partitions=32)
    timings["ivm_incremental_noop"] = time.time() - t0

    # lake → Debezium wire relay (the CDC outbox encoder path): history
    # lake built once OUTSIDE the timed section; timed = snapshot leg at
    # half + change-feed leg half→end, min-of-2 into fresh feed dirs
    import json as _json

    from database_delta_plugins_ray.stages.relay import (
        relay_changes_jsonl,
        relay_snapshot_jsonl,
    )

    relay_lake = fresh_lake(SF_DIR, "bench_relay_lake")
    with open(os.path.join(log, "meta.json")) as fh:
        half = _json.load(fh)["max_lsn"] // 2
    run_replication(log, relay_lake, num_partitions=max(32, NUM_CPUS * 2),
                    history=True, upto_lsn=half)
    run_replication(log, relay_lake, num_partitions=max(32, NUM_CPUS * 2),
                    history=True)
    best = float("inf")
    for rep in range(2):
        wire = fresh_lake(SF_DIR, f"bench_relay_wire_{rep}")
        t0 = time.time()
        relay_snapshot_jsonl(relay_lake, wire, as_of_lsn=half)
        relay_changes_jsonl(relay_lake, wire, half)
        best = min(best, time.time() - t0)
    timings["cdc_wire_relay"] = best

    # sustained-follow steady state (compact sample; the full >=20-poll
    # protocol is `bench.py --follow`, recorded in BASELINE.md)
    fol = run_follow(16, init_ray=False)
    extras["follow"] = {k: fol[k] for k in (
        "value", "polls", "busy_polls", "first_poll_s",
        "poll_latency_p50_s", "poll_latency_p95_s", "noop_poll_p50_s",
        "log_events_drained") if k in fol}
    timings["cdc_follow_poll_p50"] = fol.get("poll_latency_p50_s") or 0.0

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


def run_control(kind: str) -> dict:
    """Host-calibration control jobs for the scaling measurement — NO engine
    code, NO shuffle, embarrassingly parallel by construction:

    - ``scan``: ``read_parquet`` over the SAME event-log bytes the replay
      reads, one cheap Arrow kernel per batch (sum of content byte lengths),
      per-batch partials to the driver. Mirrors the replay's memory/IO
      traffic profile; any efficiency it loses at higher num_cpus is the
      HOST's ceiling (ambient daemon cores, shared memory bandwidth), not
      engine serialism.
    - ``compute``: fixed-flop numpy loop on an L2-resident array per task,
      near-zero data movement. Shows what Ray task scheduling alone scales
      like on this box (the upper bound any job could reach).

    Efficiency(engine) / efficiency(scan-control) ~= 1.0 is the evidence
    that the replay adds no serial stage beyond what a bare parallel scan
    of the same bytes exhibits on this host."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from database_delta_plugins_ray.pipelines.queries import ensure_log, sf_tag
    from database_delta_plugins_ray.pipelines.replicate import log_files

    log = ensure_log(SF_DIR)
    files = log_files(log)
    for f in files:  # same page-cache warmup as the replay bench
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    def _warm(batch):
        import numpy  # noqa: F401
        import pyarrow.compute  # noqa: F401

        return batch

    ray.data.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 8).map_batches(
        _warm
    ).materialize()

    if kind == "scan":
        def partial(b):
            import pyarrow as pa
            import pyarrow.compute as pc

            content = pc.struct_field(b["after"], "content")
            return pa.table({
                "bytes": pa.array(
                    [pc.sum(pc.binary_length(content)).as_py() or 0]),
                "lsn_max": pa.array([pc.max(b["lsn"]).as_py() or 0]),
            })

        t0 = time.time()
        parts = (
            ray.data.read_parquet(
                files, columns=["lsn", "after"],
                override_num_blocks=max(2 * NUM_CPUS, min(len(files), 4 * NUM_CPUS)),
            )
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .take_all()
        )
        wall = time.time() - t0
        checksum = sum(r["bytes"] for r in parts)
    else:  # compute
        n_tasks = int(os.environ.get("RAY_GRAFT_CONTROL_TASKS", "64"))

        def burn(b):
            import numpy as np

            x = np.arange(1 << 14, dtype=np.float64)
            for _ in range(1500):
                x = np.sqrt(x * 1.000001 + 1.0)
            return {"acc": np.array([float(x.sum())])}

        t0 = time.time()
        res = (
            ray.data.range(n_tasks, override_num_blocks=n_tasks)
            .map_batches(burn)
            .take_all()
        )
        wall = time.time() - t0
        checksum = round(sum(r["acc"] for r in res), 3)
    ray.shutdown()
    return {
        "metric": f"control_{kind}_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "sf": sf_tag(SF_DIR),
        "num_cpus": NUM_CPUS,
        "checksum": checksum,
    }


def run_scaling() -> dict:
    """Same input, fresh process per parallelism level; efficiency =
    (t_N / t_4N) / 4 (1.0 = linear).

    Default pair is N=2 vs 4N=8: on this single box the pipeline saturates
    memory bandwidth around 8-16 cores (8 CPUs ~= 32 CPUs wall time), so
    the CPU-scaling signal is only visible below the bandwidth ceiling —
    on a real multi-node cluster each node brings its own bandwidth. The
    8-vs-32 pair is reported alongside for transparency; override with
    RAY_GRAFT_SCALING_CPUS="lo,hi".

    When ``taskset`` is available (RAY_GRAFT_SCALING_PINNED=0 disables),
    each leg's WHOLE Ray process tree is affinity-pinned to exactly N
    cores — the faithful fixed-size-node model. Unpinned, Ray's driver/
    raylet/plasma daemons run outside the num_cpus budget and help the
    small-N leg disproportionately (~1.5 ambient cores), structurally
    capping the measured ratio at ~0.68 regardless of engine linearity
    (BASELINE.md quantifies this)."""

    def one(ncpu: int, control: str | None = None) -> dict:
        # ARROW_IO_THREADS=1: pyarrow's parquet scanner decodes on its own
        # 8-thread-per-process IO pool, which escapes Ray's CPU accounting
        # and makes num_cpus=2 read as fast as num_cpus=32 on one box.
        # Capping it makes num_cpus a faithful proxy for cluster size.
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   RAY_GRAFT_HEADLINE_ONLY="1", ARROW_IO_THREADS="1")
        if control:
            env["RAY_GRAFT_CONTROL"] = control
        cmd = [sys.executable, os.path.abspath(__file__)]
        if _PINNED:
            # OS-level affinity pins the WHOLE Ray process tree (driver,
            # raylet, plasma, workers) to exactly ncpu cores — the
            # faithful fixed-size-node model. Without it, Ray's ambient
            # daemons run on cores OUTSIDE the num_cpus budget and help
            # the small-N leg disproportionately (~1.5 bonus cores),
            # structurally capping the measured ratio at ~0.68 no matter
            # how linear the engine is (see BASELINE.md).
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd,
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    pair = os.environ.get("RAY_GRAFT_SCALING_CPUS", "2,8")
    rounds = int(os.environ.get("RAY_GRAFT_SCALING_ROUNDS", "2"))
    lo, hi = (int(x) for x in pair.split(","))
    import shutil as _shutil

    _PINNED = (_shutil.which("taskset") is not None
               and os.environ.get("RAY_GRAFT_SCALING_PINNED", "1") != "0")
    # the sandbox host is oversubscribed (steal time spikes) AND its
    # absolute speed drifts >4x across hours: interleave lo/hi rounds,
    # take the per-level MIN, and ALSO normalize each sample by its own
    # in-session compute-control factor (host_calibration) so a sample
    # taken in a slow phase doesn't bias the efficiency ratio
    lo_secs, hi_secs = [], []
    lo_norm, hi_norm = [], []
    sf, n_events = None, 0
    for _ in range(rounds):
        r_lo, r_hi = one(lo), one(hi)
        sf = r_hi["sf"]
        n_events = r_hi.get("log_events", 0)
        lo_secs.append(r_lo["value"])
        hi_secs.append(r_hi["value"])
        for r, acc in ((r_lo, lo_norm), (r_hi, hi_norm)):
            cal = r.get("host_calibration", {})
            f = (cal.get("compute_sec", 0)
                 / cal.get("quiet_host_reference_sec", 1) or 1)
            # symmetric normalization: each sample divided by its OWN host
            # factor, so the quiet-host reference cancels in the ratio; the
            # clamp only guards against a degenerate calibration sample
            acc.append(round(r["value"] / min(max(f, 0.25), 8.0), 3))
    t_lo, t_hi = min(lo_secs), min(hi_secs)
    eff = (t_lo / t_hi) / (hi / lo)
    n_lo, n_hi = min(lo_norm), min(hi_norm)
    eff_norm = (n_lo / n_hi) / (hi / lo)
    out = {
        "metric": "cdc_replay_scaling",
        "affinity_pinned": _PINNED,
        "sf": sf,
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"samples_{lo}": lo_secs,
        f"samples_{hi}": hi_secs,
        f"normalized_sec_{lo}": n_lo,
        f"normalized_sec_{hi}": n_hi,
        f"events_per_s_{lo}": round(n_events / t_lo, 1) if n_events else None,
        f"events_per_s_{hi}": round(n_events / t_hi, 1) if n_events else None,
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_host_normalized": round(eff_norm, 3),
    }
    if hi < 32:
        r_32 = one(32)
        out["sec_32"] = r_32["value"]
        out["events_per_s_32"] = r_32.get("events_per_s")
        out["note"] = ("single-box memory bandwidth saturates near 8-16 "
                       "cores; 32-CPU time shows the plateau")
    if os.environ.get("RAY_GRAFT_SCALING_CONTROLS", "1") != "0":
        out["controls"] = run_controls(lo, hi, rounds)
        # efficiency relative to the scan control's — i.e. how the engine
        # scales vs a bare parallel read of ITS OWN input bytes measured
        # in the same session. The scan's efficiency IS the host's
        # byte-moving ceiling (ambient cores + shared bandwidth + any
        # transient data-path degradation); a ratio near 1.0 says the
        # replay adds no serial stage beyond what moving the bytes costs
        # on this box. Raw scaling_efficiency remains the number of
        # record; this isolates engine- from host-shaped loss.
        scan_eff = out["controls"].get("scan", {}).get("efficiency")
        if scan_eff:
            # a ceiling cannot exceed linear; a >1.0 scan sample is host
            # noise (one slow lo-level scan), so clamp before dividing
            out["efficiency_vs_scan_ceiling"] = round(
                eff / min(scan_eff, 1.0), 3)
    return out


def run_controls(lo: int, hi: int, rounds: int = 2) -> dict:
    """Measure the two calibration controls (see run_control) at the same
    lo/hi parallelism pair with the same interleaved-min protocol. The
    ``scan`` control's efficiency is the host's structural ceiling for any
    job that moves these bytes; ``engine_vs_scan_ceiling`` near 1.0 means
    the replay scales as well as a bare parallel scan of its own input."""

    import shutil as _shutil

    pinned = (_shutil.which("taskset") is not None
              and os.environ.get("RAY_GRAFT_SCALING_PINNED", "1") != "0")

    def one(ncpu: int, control: str) -> float:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   RAY_GRAFT_CONTROL=control, ARROW_IO_THREADS="1")
        cmd = [sys.executable, os.path.abspath(__file__)]
        if pinned:  # same affinity model as the replay legs
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd,
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])["value"]

    res: dict = {}
    for control in ("scan", "compute"):
        lo_s, hi_s = [], []
        for _ in range(rounds):
            lo_s.append(one(lo, control))
            hi_s.append(one(hi, control))
        t_lo, t_hi = min(lo_s), min(hi_s)
        res[control] = {
            f"sec_{lo}": t_lo, f"sec_{hi}": t_hi,
            f"samples_{lo}": lo_s, f"samples_{hi}": hi_s,
            "efficiency": round((t_lo / t_hi) / (hi / lo), 3),
        }
    return res


def run_follow(n_files: int = 40, init_ray: bool = True) -> dict:
    """Sustained-follow steady state (round-5 verdict #6): a writer
    thread drip-feeds a Debezium JSONL stream, file by file, while
    ``follow_replication`` (with the JSONL tail converter as its
    ``pre_poll`` ingest hook) keeps the lake current. Reports
    steady-state apply throughput and per-poll latency percentiles over
    ≥20 busy polls, plus the caught-up no-op poll latency."""
    import shutil as _shutil
    import threading

    import ray

    if init_ray:
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

    from database_delta_plugins_ray.pipelines.queries import CACHE_ROOT
    from database_delta_plugins_ray.pipelines.replicate import (
        follow_replication)
    from database_delta_plugins_ray.sources.debezium_json import (
        tail_jsonl_segments, write_debezium_jsonl)
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)

    root = os.path.join(CACHE_ROOT, "follow_bench")
    n_files = int(os.environ.get("RAY_GRAFT_FOLLOW_FILES", n_files))
    log = os.path.join(root, f"log{n_files}")
    jdir = os.path.join(root, f"jsonl{n_files}")
    # cached across runs (deterministic); ~240k events over n_files files
    generate_log(log, GenConfig(n_keys=24000, n_events=240000, seed=9,
                                n_segments=n_files))
    if not os.path.isdir(jdir) or len(os.listdir(jdir)) != n_files:
        _shutil.rmtree(jdir, ignore_errors=True)
        write_debezium_jsonl(log, jdir)
    files = sorted(os.listdir(jdir))

    feed = os.path.join(root, "feed")
    segs = os.path.join(root, "segs")
    lake = os.path.join(root, "lake")
    for d in (feed, segs, lake):
        _shutil.rmtree(d, ignore_errors=True)
    os.makedirs(feed)

    drip_interval = float(os.environ.get("RAY_GRAFT_FOLLOW_DRIP", "0.8"))

    # first file lands synchronously so the first poll has a segment
    _shutil.copy(os.path.join(jdir, files[0]), os.path.join(feed, files[0]))

    def writer():
        for f in files[1:]:
            time.sleep(drip_interval)
            tmp = os.path.join(feed, f + ".tmp")
            _shutil.copy(os.path.join(jdir, f), tmp)
            os.rename(tmp, os.path.join(feed, f))

    lat: list[float] = []
    ingest: list[float] = []
    applied: list[int] = []
    drained: list[int] = []
    t_poll = [0.0]
    seen_events = [0]

    def pre():
        t_poll[0] = time.time()
        m = tail_jsonl_segments(feed, segs)
        ingest.append(time.time() - t_poll[0])
        drained.append(m["total_events"] - seen_events[0])
        seen_events[0] = m["total_events"]

    def on_poll(s):
        lat.append(time.time() - t_poll[0])
        applied.append(s["events_applied"])

    th = threading.Thread(target=writer)
    t0 = time.time()
    th.start()
    s = follow_replication(
        segs, lake, poll_interval_s=0.05, idle_polls_to_stop=8,
        pre_poll=pre, on_poll=on_poll, num_partitions=NUM_CPUS)
    wall = time.time() - t0
    th.join()

    busy_seq = [l for l, a in zip(lat, applied) if a > 0]
    # the first busy poll pays one-time costs (snapshot bulk + worker/
    # actor spawn) — report it separately, percentiles over steady state
    first_busy = busy_seq[0] if busy_seq else None
    busy = sorted(busy_seq[1:])
    idle = sorted(l for l, a in zip(lat, applied) if a == 0)
    busy_ingest = sorted(g for g, a in zip(ingest, applied) if a > 0)
    q = lambda xs, p: xs[min(len(xs) - 1, int(p * len(xs)))] if xs else None
    # throughput counts LOG EVENTS drained end-to-end (jsonl -> segment
    # -> lake) over the busy-poll wall; the per-batch LWW combiner means
    # events_applied counts post-combine rows, not stream events
    total_events = int(sum(drained))
    busy_wall = sum(l for l, a in zip(lat, applied) if a > 0)
    if init_ray:
        ray.shutdown()
    return {
        "metric": "cdc_follow_events_per_s",
        "value": round(total_events / busy_wall, 1) if busy_wall else 0.0,
        "unit": "events/s",
        "num_cpus": NUM_CPUS,
        "log_events_drained": total_events,
        "rows_applied": int(sum(applied)),
        "polls": s["polls"],
        "busy_polls": len(busy),
        "wall_sec": round(wall, 3),
        "drip_interval_s": drip_interval,
        "n_files": n_files,
        "first_poll_s": round(first_busy, 3) if first_busy else None,
        "poll_latency_p50_s": round(q(busy, 0.50), 3) if busy else None,
        "poll_latency_p95_s": round(q(busy, 0.95), 3) if busy else None,
        "ingest_p50_s": (round(q(busy_ingest, 0.50), 3)
                         if busy_ingest else None),
        "noop_poll_p50_s": round(q(idle, 0.50), 4) if idle else None,
        "stopped_by": s["stopped_by"],
    }


if __name__ == "__main__":
    if os.environ.get("RAY_GRAFT_CONTROL"):
        print(json.dumps(run_control(os.environ["RAY_GRAFT_CONTROL"])))
    elif "--controls" in sys.argv:
        pair = os.environ.get("RAY_GRAFT_SCALING_CPUS", "2,8")
        lo, hi = (int(x) for x in pair.split(","))
        print(json.dumps(run_controls(
            lo, hi, int(os.environ.get("RAY_GRAFT_SCALING_ROUNDS", "2")))))
    elif "--follow" in sys.argv:
        print(json.dumps(run_follow()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
