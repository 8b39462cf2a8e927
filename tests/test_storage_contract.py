"""Multi-node storage & memory contracts (round-5 verdict items #7/#8).

1. **Moved-lake / foreign-mountpoint contract**: lake manifests are
   written by whatever node ran the merger, at whatever path that node
   mounted the lake. A reader (or a resumed run) on another node — or
   after the lake directory was moved/renamed — must still resolve every
   data file. ``state/checkpoint.py`` rebases stored file paths onto the
   reader's own ``lake_dir`` at manifest-load time; these tests move a
   committed lake and prove read + time-travel + RESUME all still work.

2. **Constrained-object-store streaming proof**: the sf0.1 replay (2.1M
   events, ~370 MB parquet log) must complete with the SAME final state
   under a small Ray object store — evidence that no stage materializes
   the log in memory (the streaming executor pipelines and the store
   spills). Runs in a subprocess because the proof needs its own
   ``ray.init(object_store_memory=...)``.
"""
import json
import os
import shutil
import subprocess
import sys
import textwrap

import pytest


def _mk_log(tmp_path, **kw):
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=400, n_events=3000, seed=11, **kw))
    return log


def _sig(lake):
    from database_delta_plugins_ray.pipelines.replicate import final_state

    rows = final_state(lake).take_all()
    return sorted((r["table"], r["repo"], r["path"], r["content_sha"],
                   r["_sequence_num"]) for r in rows)


def test_moved_lake_reads_and_resumes(ray_session, tmp_path):
    """Replicate to one path, move the lake, then read AND resume from
    the new path: manifests' stored absolute prefixes are writer-local
    and must be rebased, not trusted."""
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        run_replication)

    log = _mk_log(tmp_path)
    with open(os.path.join(log, "meta.json")) as fh:
        half = json.load(fh)["max_lsn"] // 2
    lake_a = str(tmp_path / "lake_a")
    run_replication(log, lake_a, num_partitions=4, upto_lsn=half)

    lake_b = str(tmp_path / "moved" / "lake_b")
    os.makedirs(os.path.dirname(lake_b), exist_ok=True)
    shutil.move(lake_a, lake_b)

    # read from the moved location
    assert len(_sig(lake_b)) > 0
    # RESUME from the moved location (the merger re-reads base files
    # through the rebased manifests) and finish the log
    run_replication(log, lake_b, num_partitions=4)
    want = {k: (v["content_sha"], v["_sequence_num"])
            for k, v in replay(log).items()}
    got = {(t, r, p): (sha, seq) for t, r, p, sha, seq in _sig(lake_b)}
    assert got == want


def test_moved_history_lake_time_travel(ray_session, tmp_path):
    """Version-log manifests (time travel / change feed) rebase too."""
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, lake_diff, run_replication)

    log = _mk_log(tmp_path)
    with open(os.path.join(log, "meta.json")) as fh:
        half = json.load(fh)["max_lsn"] // 2
    lake_a = str(tmp_path / "hlake_a")
    run_replication(log, lake_a, num_partitions=4, history=True,
                    upto_lsn=half)
    run_replication(log, lake_a, num_partitions=4, history=True)
    n_half = final_state(lake_a, as_of_lsn=half).count()
    diff_n = lake_diff(lake_a, half).count()

    lake_b = str(tmp_path / "hlake_b")
    shutil.move(lake_a, lake_b)
    assert final_state(lake_b, as_of_lsn=half).count() == n_half
    assert lake_diff(lake_b, half).count() == diff_n
    assert len(_sig(lake_b)) > 0


_CONSTRAINED = textwrap.dedent("""
    import json, sys
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR",
             object_store_memory=2 * 1024**3)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, {repo!r})
    from database_delta_plugins_ray.pipelines.queries import ensure_log
    from database_delta_plugins_ray.pipelines.replicate import (
        run_replication, final_state)
    import pyarrow.compute as pc
    import numpy as np

    log = ensure_log("/root/testdata/sf0.1")
    out = {out!r}
    s = run_replication(log, out + "/lake_small_store", num_partitions=16)

    def agg(lake):
        ds = final_state(lake, columns=["content_sha"])
        n = 0
        acc = 0
        for b in ds.iter_batches(batch_format="pyarrow"):
            n += b.num_rows
            h = np.array([int(x[:15], 16) for x in
                          b["content_sha"].to_pylist()], dtype=np.int64)
            acc = (acc + int(h.sum())) % (1 << 62)
        return n, acc

    print(json.dumps({{"applied": s["events_applied"],
                       "agg": agg(out + "/lake_small_store")}}))
    ray.shutdown()
""")


def test_sf01_replay_under_2gib_object_store(tmp_path):
    """sf0.1 replay (2.1M events) completes under a 2 GiB object store
    and produces the identical final state as an unconstrained replay —
    no stage holds the log in memory."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _CONSTRAINED.format(repo=repo, out=str(tmp_path))
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-4000:]
    got = json.loads(r.stdout.strip().splitlines()[-1])

    # reference: unconstrained replay in THIS session (its correctness
    # vs the SQL oracle is gated by the driver separately)
    from database_delta_plugins_ray.pipelines.queries import ensure_log
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    import numpy as np

    log = ensure_log("/root/testdata/sf0.1")
    ref_lake = str(tmp_path / "lake_ref")
    run_replication(log, ref_lake, num_partitions=16)
    ds = final_state(ref_lake, columns=["content_sha"])
    n = 0
    acc = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        n += b.num_rows
        h = np.array([int(x[:15], 16) for x in
                      b["content_sha"].to_pylist()], dtype=np.int64)
        acc = (acc + int(h.sum())) % (1 << 62)
    assert got["agg"] == [n, acc] or tuple(got["agg"]) == (n, acc)


def test_moved_lake_skip_index_still_prunes(ray_session, tmp_path):
    """The Bloom file-skipping index keys blooms by LAKE-RELATIVE file
    identity, so it survives the lake moving: after a move, lookups
    must still prune (an absolute-path key would silently degrade every
    partition to 'not indexed -> must read')."""
    from database_delta_plugins_ray.pipelines.maintenance import (
        build_skip_index, optimize_lake, skip_scan_eq)
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)

    log = _mk_log(tmp_path)
    lake_a = str(tmp_path / "slake_a")
    run_replication(log, lake_a, num_partitions=4)
    optimize_lake(lake_a)
    build_skip_index(lake_a, "commit")
    target = final_state(lake_a, columns=["commit"]).min("commit")

    lake_b = str(tmp_path / "slake_b")
    shutil.move(lake_a, lake_b)
    # index keys are relative -> still resolvable against the new path
    import json as _json

    idx = _json.load(open(os.path.join(
        lake_b, "_checkpoints", "skipindex-commit.json")))
    assert all(not os.path.isabs(k) for k in idx["files"])
    rows = skip_scan_eq(lake_b, "commit", target,
                        columns=["repo", "path", "commit"]).take_all()
    assert rows and all(r["commit"] == target for r in rows)
