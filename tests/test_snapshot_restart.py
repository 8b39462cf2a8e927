"""Mid-snapshot restart semantics (round-2 verdict #10): all snapshot
data events share ONE offset (MySqlEventReader.java:144-155 — a resume
cannot position inside the snapshot), and a resume that finds a
partially-committed lake with no completed run either wipes-and-restarts
the snapshot (``snapshot_restart="wipe"``, the reference behavior) or
continues idempotently off the partition fences — final state must be
identical both ways."""

import json
import os
import shutil

import pytest


def _parity(lake, log):
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import final_state

    oracle = replay(log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(got) == set(oracle)
    for k, o in oracle.items():
        assert got[k]["content_sha"] == o["content_sha"], k
        assert got[k]["_sequence_num"] == o["_sequence_num"], k


@pytest.fixture(scope="module")
def shared_log(tmp_path_factory, ray_session):
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    d = str(tmp_path_factory.mktemp("sharedlog") / "log")
    meta = generate_log(d, GenConfig(
        n_keys=400, n_events=2500, n_repos=6, seed=61, n_segments=4,
        snapshot_shared_offset=True, ddl_plan=False))
    return d, meta


def test_snapshot_events_share_one_offset(shared_log):
    import pyarrow.dataset as pads

    log, meta = shared_log
    files = [os.path.join(log, f) for f in sorted(os.listdir(log))
             if f.startswith("seg-")]
    t = pads.dataset(files, format="parquet").to_table(
        columns=["lsn", "is_snapshot", "op"])
    snap_lsns = {r["lsn"] for r in t.to_pylist()
                 if r["is_snapshot"] and r["op"] != "DDL"}
    assert snap_lsns == {meta["snapshot_shared_lsn"]}
    # DDL prefix (schema phase) keeps distinct positions BELOW the shared
    # data-phase offset; the stream starts above it
    stream_lsns = [r["lsn"] for r in t.to_pylist()
                   if not r["is_snapshot"] and r["op"] != "DDL"]
    assert min(stream_lsns) > meta["snapshot_shared_lsn"]


def _fabricate_mid_snapshot_lake(log, scratch, lake, keep_parts=2):
    """Deterministic 'crashed mid-snapshot' lake: run the snapshot fully
    into a scratch lake, then copy only SOME partition commits (and no
    global watermark, no schema history) — exactly the on-disk state a
    SIGKILL between partition commits leaves behind."""
    from database_delta_plugins_ray.pipelines.replicate import run_replication

    run_replication(log, scratch, num_partitions=4)
    os.makedirs(os.path.join(lake, "_checkpoints"), exist_ok=True)
    shutil.copy(os.path.join(scratch, "_checkpoints", "lake_config.json"),
                os.path.join(lake, "_checkpoints", "lake_config.json"))
    copied = 0
    for f in sorted(os.listdir(os.path.join(scratch, "_checkpoints"))):
        if not f.startswith("part-") or copied >= keep_parts:
            continue
        src = os.path.join(scratch, "_checkpoints", f)
        with open(src) as fh:
            m = json.load(fh)
        for sf in (m.get("files") or [m["file"]]):
            dst = os.path.join(lake, os.path.relpath(sf, scratch))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy(sf, dst)
        with open(src) as fh:
            manifest = fh.read().replace(scratch, lake)
        with open(os.path.join(lake, "_checkpoints", f), "w") as fh:
            fh.write(manifest)
        copied += 1
    assert copied == keep_parts


def test_mid_snapshot_resume_wipe_restarts_and_converges(shared_log, tmp_path):
    from database_delta_plugins_ray.pipelines.replicate import run_replication
    from database_delta_plugins_ray.state import checkpoint as ckpt

    log, _meta = shared_log
    lake = str(tmp_path / "lake_wipe")
    _fabricate_mid_snapshot_lake(log, str(tmp_path / "scratch"), lake)
    assert len(ckpt.all_manifests(lake)) == 2  # partial commit state

    s = run_replication(log, lake, num_partitions=4,
                        snapshot_restart="wipe")
    assert s["snapshot_restarted"] is True
    _parity(lake, log)

    # a completed lake must NOT be wiped by a later wipe-mode poll
    s2 = run_replication(log, lake, num_partitions=4,
                         snapshot_restart="wipe")
    assert s2["events_applied"] == 0
    assert s2.get("snapshot_restarted", False) is False


def test_mid_snapshot_resume_continue_converges(shared_log, tmp_path):
    """The engine's native resume (partition watermark fences) reaches the
    SAME final state without the wipe — shared snapshot offsets make the
    re-read idempotent because each partition commits its snapshot group
    atomically."""
    from database_delta_plugins_ray.pipelines.replicate import run_replication

    log, _meta = shared_log
    lake = str(tmp_path / "lake_cont")
    _fabricate_mid_snapshot_lake(log, str(tmp_path / "scratch2"), lake)

    s = run_replication(log, lake, num_partitions=4)  # default: continue
    assert s["snapshot_restarted"] is False
    _parity(lake, log)
