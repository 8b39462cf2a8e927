"""Continuous-tail (follow) mode: the long-lived replication job the
reference runs (EventReader.start/stop lifecycle with graceful, flushing
stop — MySqlEventReader.java:85-185). Covers: drain-as-segments-arrive,
flush-on-graceful-stop (in-process event and cross-process stop file),
and SIGTERM/SIGKILL process semantics via the CLI."""

import json
import os
import shutil
import signal
import subprocess
import sys
import threading
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _copy_seg(src_log: str, dst_log: str, name: str) -> None:
    """Atomic segment publish (writer contract: tmp + rename)."""
    tmp = os.path.join(dst_log, name + ".tmp.test")
    shutil.copy(os.path.join(src_log, name), tmp)
    os.replace(tmp, os.path.join(dst_log, name))


def _assert_parity(lake: str, log: str) -> None:
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import final_state

    oracle = replay(log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(got) == set(oracle)
    for k, o in oracle.items():
        assert got[k]["content_sha"] == o["content_sha"], k
        assert got[k]["_sequence_num"] == o["_sequence_num"], k


@pytest.mark.usefixtures("ray_session")
def test_follow_drains_segments_as_they_arrive(tmp_path):
    """Segments published between polls are drained incrementally; the
    loop stops after the configured idle streak; the lake matches the
    oracle replay of the full log."""
    from database_delta_plugins_ray.pipelines.replicate import (
        follow_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    staged = str(tmp_path / "staged")
    meta = generate_log(staged, GenConfig(n_keys=300, n_events=3000,
                                          n_repos=6, seed=31, n_segments=5))
    segs = sorted(f for f in os.listdir(staged) if f.startswith("seg-"))
    live = str(tmp_path / "live")
    os.makedirs(live)
    _copy_seg(staged, live, segs[0])
    pending = segs[1:]

    def on_poll(_summary):
        if pending:
            _copy_seg(staged, live, pending.pop(0))

    lake = str(tmp_path / "lake")
    # fragment exchange under follow: incremental polls are the fragment
    # path's sweet spot (few fragments, no sort barrier)
    s = follow_replication(
        live, lake, poll_interval_s=0.05, idle_polls_to_stop=2,
        on_poll=on_poll, num_partitions=4, exchange="fragment",
    )
    assert not pending
    assert s["stopped_by"] == "idle"
    assert s["polls"] >= len(segs) + 1
    assert s["last_lsn"] == meta["max_lsn"]
    _assert_parity(lake, staged)


@pytest.mark.usefixtures("ray_session")
def test_follow_graceful_stop_flushes_pending(tmp_path):
    """A stop request observed mid-wait triggers ONE final drain poll
    before exit (flush-on-stop), so events published just before the stop
    are applied — the reference's drain-on-shutdown contract."""
    from database_delta_plugins_ray.pipelines.replicate import (
        follow_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    staged = str(tmp_path / "staged")
    generate_log(staged, GenConfig(n_keys=200, n_events=2000, n_repos=5,
                                   seed=33, n_segments=4))
    segs = sorted(f for f in os.listdir(staged) if f.startswith("seg-"))
    live = str(tmp_path / "live")
    os.makedirs(live)
    for name in segs[:-1]:
        _copy_seg(staged, live, name)

    lake = str(tmp_path / "lake")
    ev = threading.Event()
    first_poll_done = threading.Event()
    result: dict = {}

    def run():
        result.update(follow_replication(
            live, lake, poll_interval_s=30.0, stop_event=ev,
            on_poll=lambda s: first_poll_done.set(), num_partitions=4,
        ))

    t = threading.Thread(target=run)
    t.start()
    assert first_poll_done.wait(timeout=120)
    # publish the last segment, THEN request stop: the flush poll must
    # pick it up even though the loop was sleeping on a 30 s interval
    _copy_seg(staged, live, segs[-1])
    ev.set()
    t.join(timeout=120)
    assert not t.is_alive()
    assert result["stopped_by"] == "stop_event"
    _assert_parity(lake, staged)


@pytest.mark.usefixtures("ray_session")
def test_follow_stop_file_is_consumed(tmp_path):
    """request_stop() (the cross-process StopContext analog) stops the
    loop after a flush poll and the marker is consumed."""
    from database_delta_plugins_ray.pipelines.replicate import (
        _stop_file,
        follow_replication,
        request_stop,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=100, n_events=800, seed=35,
                                n_segments=2))
    lake = str(tmp_path / "lake")
    request_stop(lake)
    s = follow_replication(log, lake, poll_interval_s=0.05,
                           num_partitions=2)
    assert s["stopped_by"] == "stop_file"
    assert s["polls"] == 1  # the flush poll drained the whole log
    assert not os.path.exists(_stop_file(lake))
    _assert_parity(lake, log)


FOLLOW_CLI = [sys.executable, "-m", "database_delta_plugins_ray",
              "--num-cpus", "4"]


@pytest.mark.usefixtures("ray_session")
def test_follow_cli_sigterm_graceful_then_sigkill_resume(tmp_path):
    """CLI lifecycle: SIGTERM exits 0 with a flushed summary (graceful
    stop); a later SIGKILL mid-poll is the crash case — a fresh follow
    run resumes exactly-once off the watermark fences."""
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    staged = str(tmp_path / "staged")
    generate_log(staged, GenConfig(n_keys=300, n_events=3000, n_repos=6,
                                   seed=37, n_segments=6))
    segs = sorted(f for f in os.listdir(staged) if f.startswith("seg-"))
    live = str(tmp_path / "live")
    os.makedirs(live)
    for name in segs[:3]:
        _copy_seg(staged, live, name)
    lake = str(tmp_path / "lake")

    env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="local")
    p = subprocess.Popen(
        FOLLOW_CLI + ["replicate", "--log", live, "--lake", lake,
                      "--partitions", "4", "--follow",
                      "--poll-interval", "0.3"],
        stdout=subprocess.PIPE, text=True, env=env, cwd=REPO)
    # wait for the first poll to commit (watermark file appears)
    wm = os.path.join(lake, "_checkpoints", "log_watermark.json")
    deadline = time.time() + 180
    while not os.path.exists(wm) and time.time() < deadline:
        time.sleep(0.2)
    assert os.path.exists(wm), "follow loop never committed a poll"

    # graceful: SIGTERM → flush → exit 0 with a JSON summary
    _copy_seg(staged, live, segs[3])
    time.sleep(0.1)
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=180)
    assert p.returncode == 0
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["stopped_by"] == "stop_event"

    # crash case: SIGKILL a new follow loop mid-drain of fresh segments
    for name in segs[4:]:
        _copy_seg(staged, live, name)
    p2 = subprocess.Popen(
        FOLLOW_CLI + ["replicate", "--log", live, "--lake", lake,
                      "--partitions", "4", "--follow",
                      "--poll-interval", "0.2"],
        stdout=subprocess.PIPE, text=True, env=env, cwd=REPO)
    time.sleep(4.0)
    p2.send_signal(signal.SIGKILL)
    p2.wait()

    # resume in-process: one bounded follow converges to full parity
    from database_delta_plugins_ray.pipelines.replicate import (
        follow_replication,
    )

    follow_replication(live, lake, poll_interval_s=0.05, max_polls=1,
                       num_partitions=4)
    _assert_parity(lake, staged)


@pytest.mark.usefixtures("ray_session")
def test_follow_post_commit_keeps_index_current(tmp_path):
    """post_commit hooks keep derived artifacts following the lake: a
    text-index refresh hook leaves the index equal to a fresh rebuild
    when the follow loop stops."""
    from database_delta_plugins_ray.pipelines.replicate import (
        follow_replication,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import (
        GenConfig,
        generate_log,
    )
    from database_delta_plugins_ray.stages.invindex import LakeTextIndex

    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    idx_dir = str(tmp_path / "idx")
    meta = generate_log(log, GenConfig(n_keys=200, n_events=1500, seed=3,
                                       n_segments=3))
    half = meta["max_lsn"] // 2
    run_replication(log, lake, num_partitions=4, history=True,
                    upto_lsn=half)
    LakeTextIndex.build(lake, idx_dir)

    refreshes = []

    def refresh_index(lake_dir):
        s = LakeTextIndex(idx_dir).refresh(lake_dir)
        refreshes.append(s)

    s = follow_replication(log, lake, num_partitions=4, history=True,
                           poll_interval_s=0.05, idle_polls_to_stop=2,
                           post_commit=[refresh_index])
    assert s["events_applied"] > 0
    assert refreshes and sum(r["changed"] for r in refreshes) > 0

    idx = LakeTextIndex(idx_dir)
    rebuilt = LakeTextIndex.build(lake, str(tmp_path / "idx_rb"))
    assert idx.meta["watermark"] == rebuilt.meta["watermark"]
    assert idx.meta["n_docs"] == rebuilt.meta["n_docs"]
    assert idx.meta["total_tokens"] == rebuilt.meta["total_tokens"]
    got = {r["doc_key"]: r["score"]
           for r in idx.lookup(["def"], mode="or").take_all()}
    want = {r["doc_key"]: r["score"]
            for r in rebuilt.lookup(["def"], mode="or").take_all()}
    assert got == want and got


@pytest.mark.usefixtures("ray_session")
def test_follow_auto_optimize_bounds_file_count(tmp_path):
    """The auto-OPTIMIZE hook keeps per-partition live file counts
    bounded while the follow loop tails a log that accretes delta
    commits; final state stays exact."""
    from database_delta_plugins_ray.pipelines.maintenance import (
        auto_optimize_hook,
    )
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        follow_replication,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import (
        GenConfig,
        generate_log,
    )
    from database_delta_plugins_ray.state import checkpoint as ckpt

    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    meta = generate_log(src, GenConfig(n_keys=150, n_events=2400, seed=9,
                                       n_segments=8))
    os.makedirs(log)
    segs = sorted(f for f in os.listdir(src) if f.startswith("seg-"))
    # seed with the first segment, then feed the rest mid-follow so each
    # poll lands a delta commit
    _copy_seg(src, log, segs[0])

    feed = iter(segs[1:])

    def on_poll(_s):
        nxt = next(feed, None)
        if nxt:
            _copy_seg(src, log, nxt)

    s = follow_replication(
        log, lake, num_partitions=2, poll_interval_s=0.05,
        idle_polls_to_stop=2, on_poll=on_poll,
        post_commit=[auto_optimize_hook(max_files_per_partition=2)])
    assert s["events_applied"] > 0

    worst = max(len(m.get("files") or [m["file"]])
                for m in ckpt.all_manifests(lake).values())
    assert worst <= 3  # bounded: threshold 2 + at most one fresh delta

    want = replay(log)
    got = {(r["table"], r["repo"], r["path"]): r["content_sha"]
           for r in final_state(lake).take_all()}
    assert got == {k: v["content_sha"] for k, v in want.items()}


@pytest.mark.usefixtures("ray_session")
def test_follow_export_incremental_keeps_export_current(tmp_path):
    """post_commit export hook (the CLI's --export-incremental): the
    materialized shard export follows the lake — after the loop stops
    it equals a fresh full export, and the polls rewrote only touched
    shards (never the whole export per poll)."""
    import glob

    import pyarrow.parquet as pq

    from database_delta_plugins_ray.pipelines.replicate import (
        follow_replication,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import (
        GenConfig,
        generate_log,
    )
    from database_delta_plugins_ray.stages.export import (
        export_lake_incremental,
    )

    def rows_of(out_dir):
        got = {}
        for f in glob.glob(os.path.join(out_dir, "shard=*", "*.parquet")):
            for r in pq.read_table(f).to_pylist():
                got[(r["table"], r["repo"], r["path"])] = (
                    r["content_sha"], r["_sequence_num"])
        return got

    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    out = str(tmp_path / "export")
    from database_delta_plugins_ray.pipelines.queries import (
        _time_travel_boundary,
    )

    meta = generate_log(log, GenConfig(n_keys=200, n_events=1800, seed=5,
                                       n_segments=4))
    # first export past all schema evolution: the export pins its Arrow
    # schema at first call (documented contract — re-export after DDL)
    half = _time_travel_boundary(log)
    run_replication(log, lake, num_partitions=4, history=True,
                    upto_lsn=half)
    export_lake_incremental(lake, out, nshards=16)

    calls = []

    def export_hook(lake_dir):
        calls.append(export_lake_incremental(lake_dir, out, nshards=16))

    s = follow_replication(log, lake, num_partitions=4, history=True,
                           poll_interval_s=0.05, idle_polls_to_stop=2,
                           post_commit=[export_hook])
    assert s["events_applied"] > 0
    applied = [c for c in calls if c["rewritten_shards"] > 0]
    assert applied  # the hook actually advanced the export

    full = str(tmp_path / "full")
    export_lake_incremental(lake, full, nshards=16)
    assert rows_of(out) == rows_of(full)


def test_follow_hooks_require_history(tmp_path, capsys):
    """--refresh-index / --refresh-vecindex / --export-incremental walk
    lake_diff over retained versions; on a non-history lake deletes
    leave no trace and the derived artifact silently diverges. The CLI
    must reject the combination up front (before ray.init)."""
    from database_delta_plugins_ray.__main__ import main

    for flag in ("--refresh-index", "--refresh-vecindex",
                 "--export-incremental"):
        with pytest.raises(SystemExit) as ei:
            main(["replicate", "--log", str(tmp_path / "log"),
                  "--lake", str(tmp_path / "lake"), "--follow",
                  flag, str(tmp_path / "idx")])
        assert ei.value.code == 2
        assert "requires --history" in capsys.readouterr().err


def test_follow_refresh_tokens_requires_existing_pack(tmp_path, capsys):
    """--refresh-tokens on a directory with no token pack would fire a
    FileNotFoundError from the first post-commit hook and kill the
    follow loop mid-stream; the CLI must reject it at argument time
    (and reject a pack that is not lake-tagged)."""
    import json as _json

    from database_delta_plugins_ray.__main__ import main

    args = ["replicate", "--log", str(tmp_path / "log"),
            "--lake", str(tmp_path / "lake"), "--follow", "--history",
            "--refresh-tokens", str(tmp_path / "pack")]
    with pytest.raises(SystemExit) as ei:
        main(args)
    assert ei.value.code == 2
    assert "no manifest.json" in capsys.readouterr().err

    # a pack exists but was not exported from a lake: also rejected
    (tmp_path / "pack").mkdir()
    (tmp_path / "pack" / "manifest.json").write_text(
        _json.dumps({"source_tag": "adhoc"}))
    with pytest.raises(SystemExit) as ei:
        main(args)
    assert ei.value.code == 2
    assert "not lake-tagged" in capsys.readouterr().err
