"""Delta commits + crash-in-commit recovery.

Covers the two failure/efficiency contracts the merge layer guarantees:

* an incremental run commits a DELTA file of only the changed keys (bounded
  write amplification — the base's payload columns are never read or
  rewritten), and readers reduce base+deltas by max ``_sequence_num`` per
  key (stages/merge.py delta path, state/checkpoint.py ``extra_files``);
* ``commit_partition`` writes the manifest BEFORE deleting superseded data
  files, so a crash at ANY point inside the commit leaves either the old
  (manifest, data) pair intact or the new one — never a manifest pointing
  at a deleted file (offset-commit-after-apply contract,
  MySqlConstantOffsetBackingStore.java:30-32).
"""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from database_delta_plugins_ray.state import checkpoint as ckpt


@pytest.mark.usefixtures("ray_session")
def test_incremental_run_commits_delta_not_full_rewrite(tmp_path):
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    meta = generate_log(
        log, GenConfig(n_keys=4000, n_events=5000, n_repos=8, seed=31,
                       n_segments=8, ddl_plan=False, skew="uniform")
    )
    lake = str(tmp_path / "lake")
    # base = 95% of the log; the increment touches only a small key subset,
    # so the delta files must be materially smaller than the base
    cut = int(meta["max_lsn"] * 0.95)

    run_replication(log, lake, num_partitions=4, upto_lsn=cut)
    base_bytes = {
        f: os.path.getsize(f)
        for f in glob.glob(os.path.join(lake, "part=*", "data-*.parquet"))
    }

    s2 = run_replication(log, lake, num_partitions=4)
    # second run appended delta files; the base files were NOT rewritten
    for f, size in base_bytes.items():
        assert os.path.exists(f), f"base file {f} deleted by delta commit"
        assert os.path.getsize(f) == size
    manifests = ckpt.all_manifests(lake)
    assert any(len(m["files"]) > 1 for m in manifests.values())
    delta_bytes = sum(
        os.path.getsize(f)
        for m in manifests.values()
        for f in m["files"]
        if f not in base_bytes
    )
    assert delta_bytes < 0.5 * sum(base_bytes.values())

    # read-time reduction across base+delta matches the pure-Python oracle
    oracle = replay(log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(got) == set(oracle)
    for k, o in oracle.items():
        assert got[k]["content_sha"] == o["content_sha"], k
        assert got[k]["_sequence_num"] == o["_sequence_num"], k
    # summary row/live counts agree with the reduced lake
    assert s2["live_rows"] == len(oracle)

    # a third (no-op) run must not touch any data file
    before = sorted(glob.glob(os.path.join(lake, "part=*", "data-*.parquet")))
    s3 = run_replication(log, lake, num_partitions=4)
    assert s3["events_applied"] == 0
    assert sorted(glob.glob(os.path.join(lake, "part=*", "data-*.parquet"))) == before
    assert s3["live_rows"] == len(oracle)


@pytest.mark.usefixtures("ray_session")
def test_vacuum_compacts_deltas(tmp_path):
    from database_delta_plugins_ray.pipelines.maintenance import vacuum_lake
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    meta = generate_log(
        log, GenConfig(n_keys=300, n_events=3000, n_repos=6, seed=32,
                       n_segments=4, ddl_plan=False)
    )
    lake = str(tmp_path / "lake")
    third = meta["max_lsn"] // 3
    run_replication(log, lake, num_partitions=4, upto_lsn=third)
    run_replication(log, lake, num_partitions=4, upto_lsn=2 * third)
    run_replication(log, lake, num_partitions=4)
    assert any(len(m["files"]) > 1 for m in ckpt.all_manifests(lake).values())

    vacuum_lake(lake)
    manifests = ckpt.all_manifests(lake)
    assert all(len(m["files"]) == 1 for m in manifests.values())
    oracle = replay(log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r["content_sha"] for r in rows}
    assert got == {k: o["content_sha"] for k, o in oracle.items()}


@pytest.mark.usefixtures("ray_session")
def test_max_delta_files_triggers_compaction(tmp_path):
    from database_delta_plugins_ray.pipelines.replicate import run_replication
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    meta = generate_log(
        log, GenConfig(n_keys=100, n_events=1200, n_repos=4, seed=33,
                       n_segments=4, ddl_plan=False)
    )
    lake = str(tmp_path / "lake")
    steps = 6
    for i in range(1, steps + 1):
        run_replication(log, lake, num_partitions=2,
                        upto_lsn=meta["max_lsn"] * i // steps,
                        max_delta_files=3)
    for m in ckpt.all_manifests(lake).values():
        assert len(m["files"]) <= 3


def _crash_commit(lake, part, crash_at):
    """Replicate commit_partition's exact write sequence, crashing at a
    chosen point: 'after_rename' (data renamed, manifest not written) or
    'after_manifest' (manifest written, superseded files not yet deleted)."""
    d = ckpt.part_dir(lake, part)
    os.makedirs(d, exist_ok=True)
    new_lsn = 999
    final = ckpt.data_file(lake, part, new_lsn)
    tmp = final + ".tmp.crash"
    pq.write_table(pa.table({"k": ["x"], "_sequence_num": [new_lsn]}), tmp)
    os.replace(tmp, final)
    if crash_at == "after_rename":
        return
    old = ckpt.read_manifest(lake, part)
    ckpt.write_manifest(lake, part, dict(old, last_lsn=new_lsn, file=final,
                                         files=[final]))
    # crash before deleting superseded data files


@pytest.mark.usefixtures("ray_session")
def test_crash_inside_commit_never_dangles(tmp_path):
    """Whichever side of the manifest write a crash lands on, every file a
    manifest references still exists, and resume converges to the oracle."""
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    meta = generate_log(
        log, GenConfig(n_keys=200, n_events=2000, n_repos=4, seed=34,
                       n_segments=4, ddl_plan=False)
    )
    lake = str(tmp_path / "lake")
    run_replication(log, lake, num_partitions=3, upto_lsn=meta["max_lsn"] // 2)

    # crash window 1: data file renamed, manifest NOT yet written -> the old
    # manifest must still point at existing files
    _crash_commit(lake, 0, "after_rename")
    for m in ckpt.all_manifests(lake).values():
        for f in m["files"]:
            assert os.path.exists(f), f"manifest references deleted file {f}"

    # the orphan data file from the interrupted commit must not break resume
    # (watermark comes from manifests, the orphan is garbage-collected by the
    # next successful commit of that partition)
    run_replication(log, lake, num_partitions=3)
    oracle = replay(log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r["_sequence_num"] for r in rows}
    assert got == {k: o["_sequence_num"] for k, o in oracle.items()}


def test_commit_partition_manifest_before_delete(tmp_path):
    """Unit-level ordering proof: after commit_partition returns, superseded
    files are gone; but the manifest written mid-sequence (simulated crash
    via write_fn raising after the rename) still references live files."""
    lake = str(tmp_path / "lake")
    t1 = pa.table({"k": ["a"], "_sequence_num": [1]})
    f1 = ckpt.commit_partition(lake, 0, t1, 1, lambda t, p: pq.write_table(t, p),
                               {"events_applied": 1, "rows": 1, "live_rows": 1})
    assert os.path.exists(f1)

    # second commit supersedes the first; old file removed AFTER manifest
    t2 = pa.table({"k": ["a"], "_sequence_num": [2]})
    f2 = ckpt.commit_partition(lake, 0, t2, 2, lambda t, p: pq.write_table(t, p),
                               {"events_applied": 2, "rows": 1, "live_rows": 1})
    m = ckpt.read_manifest(lake, 0)
    assert m["files"] == [f2]
    assert not os.path.exists(f1)

    # delta commit keeps the base alive
    t3 = pa.table({"k": ["b"], "_sequence_num": [3]})
    f3 = ckpt.commit_partition(lake, 0, t3, 3, lambda t, p: pq.write_table(t, p),
                               {"events_applied": 3, "rows": 2, "live_rows": 2},
                               extra_files=[f2])
    m = ckpt.read_manifest(lake, 0)
    assert sorted(m["files"]) == sorted([f2, f3])
    assert os.path.exists(f2) and os.path.exists(f3)


def test_global_watermark_roundtrip(tmp_path):
    lake = str(tmp_path / "lake")
    assert ckpt.read_global_watermark(lake) == 0
    ckpt.write_global_watermark(lake, 123)
    assert ckpt.read_global_watermark(lake) == 123
    # min_watermark uses the global mark even when partitions lack manifests
    assert ckpt.min_watermark(lake, num_partitions=8) == 123
