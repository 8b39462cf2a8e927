"""Incremental JSONL tail: per-file idempotent conversion of a growing
Debezium JSONL feed into log segments, and continuous replication off it
(follow_debezium_jsonl)."""
import json
import os
import shutil
import threading
import time

import pytest


def _make_jsonl(tmp_path, n_keys=150, n_events=1200, seed=21, n_segments=4):
    """Full log -> one .jsonl per segment. Returns (log_dir, jsonl_dir)."""
    from database_delta_plugins_ray.sources.debezium_json import (
        write_debezium_jsonl)
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=n_keys, n_events=n_events, seed=seed,
                                n_segments=n_segments))
    jdir = str(tmp_path / "jsonl")
    write_debezium_jsonl(log, jdir)
    return log, jdir


def _seg_replay_parity(log_dir, seg_dir, lake_dir, parts=8):
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)

    run_replication(seg_dir, lake_dir, num_partitions=parts)
    rows = final_state(lake_dir).take_all()
    got = {(r["table"], r["repo"], r["path"]):
           (r["content_sha"], r["_sequence_num"])
           for r in rows if not r["_is_deleted"]}
    exp = {k: (v["content_sha"], v["_sequence_num"])
           for k, v in replay(log_dir).items()}
    assert got == exp


def test_tail_converts_incrementally(ray_session, tmp_path):
    from database_delta_plugins_ray.sources.debezium_json import (
        tail_jsonl_segments)

    log, jdir = _make_jsonl(tmp_path)
    files = sorted(os.listdir(jdir))
    assert len(files) >= 3
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    sdir = str(tmp_path / "segs")

    # feed files one at a time; only the new file converts each call
    seen_rows = 0
    for i, f in enumerate(files):
        shutil.copy(os.path.join(jdir, f), os.path.join(feed, f))
        meta = tail_jsonl_segments(feed, sdir)
        assert meta["converted_files"] == [f]
        assert meta["total_events"] > seen_rows
        seen_rows = meta["total_events"]
        # untouched files cost a stat, not a conversion
        meta2 = tail_jsonl_segments(feed, sdir)
        assert meta2["converted_files"] == []
        assert meta2["total_events"] == seen_rows

    # the cumulative meta matches the batch converter's contract
    with open(os.path.join(log, "meta.json")) as fh:
        src = json.load(fh)
    assert meta["total_events"] == src["total_events"]
    assert meta["max_lsn"] == src["max_lsn"]
    # meta segment list == directory contents (log_max_lsn fast path)
    on_disk = {f for f in os.listdir(sdir)
               if f.startswith("seg-") and f.endswith(".parquet")}
    assert set(meta["segments"]) == on_disk

    _seg_replay_parity(log, sdir, str(tmp_path / "lake"))


def test_tail_grown_file_reconverges(ray_session, tmp_path):
    from database_delta_plugins_ray.sources.debezium_json import (
        tail_jsonl_segments)

    log, jdir = _make_jsonl(tmp_path)
    files = sorted(os.listdir(jdir))
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    sdir = str(tmp_path / "segs")

    # all but the last file are "rotated"; the last starts half-written
    for f in files[:-1]:
        shutil.copy(os.path.join(jdir, f), os.path.join(feed, f))
    active_src = os.path.join(jdir, files[-1])
    active = os.path.join(feed, files[-1])
    lines = open(active_src).readlines()
    with open(active, "w") as fh:
        fh.writelines(lines[: len(lines) // 2])
    m1 = tail_jsonl_segments(feed, sdir)
    assert files[-1] in m1["converted_files"]

    # the active file grows: its old segments replace, no double count
    with open(active, "a") as fh:
        fh.writelines(lines[len(lines) // 2:])
    m2 = tail_jsonl_segments(feed, sdir)
    assert m2["converted_files"] == [files[-1]]
    with open(os.path.join(log, "meta.json")) as fh:
        src = json.load(fh)
    assert m2["total_events"] == src["total_events"]
    on_disk = {f for f in os.listdir(sdir)
               if f.startswith("seg-") and f.endswith(".parquet")}
    assert set(m2["segments"]) == on_disk

    _seg_replay_parity(log, sdir, str(tmp_path / "lake"))


def test_tail_crash_rerun_idempotent(ray_session, tmp_path):
    """A crash between segment writes and the state commit re-converts
    the same file with no duplicates (per-file tagged names)."""
    from database_delta_plugins_ray.sources.debezium_json import (
        TAIL_STATE, tail_jsonl_segments)

    log, jdir = _make_jsonl(tmp_path, n_segments=2)
    feed = str(tmp_path / "feed")
    shutil.copytree(jdir, feed)
    sdir = str(tmp_path / "segs")
    m1 = tail_jsonl_segments(feed, sdir)

    # simulate the crash: state says one file was never recorded
    spath = os.path.join(sdir, TAIL_STATE)
    with open(spath) as fh:
        state = json.load(fh)
    victim = sorted(state["files"])[0]
    del state["files"][victim]
    with open(spath, "w") as fh:
        json.dump(state, fh)

    m2 = tail_jsonl_segments(feed, sdir)
    assert m2["converted_files"] == [victim]
    assert m2["total_events"] == m1["total_events"]
    assert sorted(m2["segments"]) == sorted(m1["segments"])
    _seg_replay_parity(log, sdir, str(tmp_path / "lake"))


def test_tail_refuses_foreign_segment_dir(ray_session, tmp_path):
    from database_delta_plugins_ray.sources.debezium_json import (
        jsonl_to_segments, tail_jsonl_segments)

    log, jdir = _make_jsonl(tmp_path, n_segments=2)
    sdir = str(tmp_path / "segs")
    jsonl_to_segments(jdir, sdir)  # batch-owned segments, no tail state
    with pytest.raises(ValueError, match="tail mode owns"):
        tail_jsonl_segments(jdir, sdir)


def test_follow_debezium_jsonl_end_to_end(ray_session, tmp_path):
    """Writer thread drip-feeds jsonl files while the follow loop runs;
    the drained lake must equal the oracle replay of the whole log."""
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import final_state
    from database_delta_plugins_ray.sources.debezium_json import (
        follow_debezium_jsonl)

    log, jdir = _make_jsonl(tmp_path)
    files = sorted(os.listdir(jdir))
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    shutil.copy(os.path.join(jdir, files[0]), os.path.join(feed, files[0]))

    def writer():
        for f in files[1:]:
            time.sleep(0.4)
            tmp = os.path.join(feed, f + ".tmp")
            shutil.copy(os.path.join(jdir, f), tmp)
            os.rename(tmp, os.path.join(feed, f))

    t = threading.Thread(target=writer)
    t.start()
    sdir = str(tmp_path / "segs")
    lake = str(tmp_path / "lake")
    s = follow_debezium_jsonl(
        feed, sdir, lake, poll_interval_s=0.2,
        idle_polls_to_stop=6, num_partitions=8)
    t.join()
    assert s["stopped_by"] == "idle"

    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]):
           (r["content_sha"], r["_sequence_num"])
           for r in rows if not r["_is_deleted"]}
    exp = {k: (v["content_sha"], v["_sequence_num"])
           for k, v in replay(log).items()}
    assert got == exp

def test_tail_snapshot_blocks_sharing_one_offset_all_survive(
        ray_session, tmp_path):
    """A snapshot-phase feed stamps ONE offset on every event; blocks
    then share (lo, hi) and a range+count segment name would collide and
    silently overwrite. Names carry a content digest instead — every
    event must reach disk."""
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.sources.debezium_json import (
        tail_jsonl_segments)

    jdir = str(tmp_path / "jsonl")
    os.makedirs(jdir)
    n = 30
    with open(os.path.join(jdir, "feed-000.jsonl"), "w") as fh:
        for i in range(n):
            env = {"payload": {
                "op": "r",
                "before": None,
                "after": {"repo": "r0", "path": f"f{i}.py",
                          "commit": "c0", "lang": "py",
                          "content": f"x = {i}", "stars": i,
                          "language": None},
                "source": {"db": "repos", "table": "files", "pos": 7,
                           "txId": "snap", "snapshot": True,
                           "schema_version": 0},
                "ts_ms": 1_700_000_000_000,
            }}
            fh.write(json.dumps(env) + "\n")

    seg_dir = str(tmp_path / "segs")
    meta = tail_jsonl_segments(jdir, seg_dir, rows_per_segment=8)
    files = [os.path.join(seg_dir, s) for s in meta["segments"]]
    assert len(set(files)) == len(files)  # distinct names
    on_disk = sum(pq.read_metadata(f).num_rows for f in files)
    assert on_disk == n
    assert meta["total_events"] == n


def test_tail_discards_tombstones(ray_session, tmp_path):
    """A feed carrying Debezium tombstones (null-payload records after
    deletes — tombstones.on.delete defaults to true in real Debezium)
    must convert cleanly through the tail path: tombstone rows are
    discarded BEFORE the per-row source column attaches, or the column
    lengths desynchronize and the follow loop dies."""
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.sources.debezium_json import (
        tail_jsonl_segments)

    log, jdir = _make_jsonl(tmp_path)
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    # copy the real feed, injecting a tombstone after every delete line
    n_tomb = 0
    for f in sorted(os.listdir(jdir)):
        with open(os.path.join(jdir, f)) as src, \
                open(os.path.join(feed, f), "w") as dst:
            for line in src:
                dst.write(line)
                if '"op": "d"' in line or '"op":"d"' in line:
                    dst.write('{"payload": null}\n')
                    n_tomb += 1
    assert n_tomb > 0, "fixture must exercise deletes"

    sdir = str(tmp_path / "segs")
    meta = tail_jsonl_segments(feed, sdir)
    exp_events = sum(1 for fn in os.listdir(jdir)
                     for _ in open(os.path.join(jdir, fn)))
    assert meta["total_events"] == exp_events  # tombstones not counted
    _seg_replay_parity(log, sdir, str(tmp_path / "lake"))
