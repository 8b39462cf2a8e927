"""Lake → Debezium-wire relay (stages/relay.py): publish a replicated
lake as a Debezium JSONL feed and prove a consumer of that feed — this
engine's own wire reader — reconstructs the source exactly.

Gold gate: snapshot-at-half + changes half→end, ingested into a FRESH
lake, equals the source's final state INCLUDING per-key positions
(positions='preserve'); the reference-semantics 'shared' snapshot mode
equals on content with positions restarted at the snapshot offset."""

import glob
import json
import os

import pandas as pd
import pytest

from database_delta_plugins_ray.pipelines.replicate import (
    final_state,
    run_replication,
)
from database_delta_plugins_ray.sources.debezium_json import (
    jsonl_to_segments,
)
from database_delta_plugins_ray.stages.relay import (
    relay_changes_jsonl,
    relay_snapshot_jsonl,
)

COLS = ["table", "repo", "path", "commit", "language", "stars",
        "content_sha", "_sequence_num"]


def _frame(lake, cols=COLS):
    df = final_state(lake, columns=cols).to_pandas()
    return (df.sort_values(["table", "repo", "path"])
              .reset_index(drop=True))


@pytest.fixture()
def relayed(ray_session, small_log, tmp_path):
    log_dir, _, meta = small_log
    src = str(tmp_path / "src")
    half = meta["max_lsn"] // 2
    run_replication(log_dir, src, num_partitions=8, history=True,
                    upto_lsn=half)
    run_replication(log_dir, src, num_partitions=8, history=True)
    return log_dir, src, half


@pytest.mark.usefixtures("ray_session")
def test_roundtrip_preserve_positions(relayed, tmp_path):
    log_dir, src, half = relayed
    wire = str(tmp_path / "wire")
    s = relay_snapshot_jsonl(src, wire, as_of_lsn=half)
    c = relay_changes_jsonl(src, wire, half)
    assert s["events"] > 0 and c["events"] > 0
    assert c["created"] >= 0 and c["deleted"] > 0 and c["updated"] > 0

    seg = str(tmp_path / "seg")
    jsonl_to_segments(sorted(glob.glob(os.path.join(wire, "*.jsonl"))), seg)
    dst = str(tmp_path / "dst")
    run_replication(seg, dst, num_partitions=4)
    # bit-exact INCLUDING each key's winning position and derived sha
    pd.testing.assert_frame_equal(_frame(src), _frame(dst))


@pytest.mark.usefixtures("ray_session")
def test_roundtrip_shared_snapshot_offset(relayed, tmp_path):
    """Reference snapshot semantics: every snapshot row at the ONE
    watermark position (SURVEY §2.7) — content round-trips exactly;
    positions of snapshot-era keys restart at the watermark."""
    log_dir, src, half = relayed
    wire = str(tmp_path / "wire")
    relay_snapshot_jsonl(src, wire, as_of_lsn=half, positions="shared")
    relay_changes_jsonl(src, wire, half)
    for f in glob.glob(os.path.join(wire, "snap-*.jsonl")):
        with open(f) as fh:
            for line in fh:
                assert json.loads(line)["payload"]["source"]["pos"] == half

    seg = str(tmp_path / "seg")
    jsonl_to_segments(sorted(glob.glob(os.path.join(wire, "*.jsonl"))), seg)
    dst = str(tmp_path / "dst")
    run_replication(seg, dst, num_partitions=4)
    cols = [c for c in COLS if c != "_sequence_num"]
    pd.testing.assert_frame_equal(_frame(src, cols), _frame(dst, cols))
    got = _frame(dst)
    assert (got["_sequence_num"] >= half).all()


@pytest.mark.usefixtures("ray_session")
def test_relay_idempotent_and_deletes_fenced(relayed, tmp_path):
    """Deterministic content-keyed names: a re-run overwrites its own
    files (same set, no duplicates); deleted keys never surface
    downstream even though their tombstones ride at the horizon."""
    log_dir, src, half = relayed
    wire = str(tmp_path / "wire")
    relay_snapshot_jsonl(src, wire, as_of_lsn=half)
    c1 = relay_changes_jsonl(src, wire, half)
    files1 = sorted(os.listdir(wire))
    relay_snapshot_jsonl(src, wire, as_of_lsn=half)
    c2 = relay_changes_jsonl(src, wire, half)
    assert sorted(os.listdir(wire)) == files1
    assert c1["files"] == c2["files"] and c1["events"] == c2["events"]

    seg = str(tmp_path / "seg")
    jsonl_to_segments(sorted(glob.glob(os.path.join(wire, "*.jsonl"))), seg)
    dst = str(tmp_path / "dst")
    run_replication(seg, dst, num_partitions=4)
    src_keys = set(map(tuple, _frame(src)[["repo", "path"]].to_numpy()))
    dst_keys = set(map(tuple, _frame(dst)[["repo", "path"]].to_numpy()))
    assert src_keys == dst_keys
    # the change feed really carried deletes of snapshot-era keys
    snap_keys = set(map(tuple, final_state(
        src, columns=["repo", "path"],
        as_of_lsn=half).to_pandas().to_numpy()))
    assert snap_keys - src_keys, "fixture deleted no snapshot-era key"
    assert not (snap_keys - src_keys) & dst_keys


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("dialect", ["mysql", "postgres", "mongo"])
def test_roundtrip_other_dialects(relayed, tmp_path, dialect):
    """The relay speaks the public Debezium position families through
    the same offset bridges the reader uses — a feed emitted in any
    dialect round-trips bit-exactly (positions reconstructed through
    file+pos / pg_lsn sequence arrays / BSON sec+ord)."""
    log_dir, src, half = relayed
    wire = str(tmp_path / f"wire_{dialect}")
    relay_snapshot_jsonl(src, wire, as_of_lsn=half, dialect=dialect)
    relay_changes_jsonl(src, wire, half, dialect=dialect)
    # no native integer position leaks onto the wire
    with open(sorted(glob.glob(os.path.join(wire, "snap-*.jsonl")))[0]) as fh:
        srcblk = json.loads(fh.readline())["payload"]["source"]
    if dialect == "postgres":
        assert "sequence" in srcblk and "pos" not in srcblk
    elif dialect == "mongo":
        assert "sec" in srcblk and "table" not in srcblk
    else:
        assert "file" in srcblk and "gtid" in srcblk

    seg = str(tmp_path / f"seg_{dialect}")
    jsonl_to_segments(sorted(glob.glob(os.path.join(wire, "*.jsonl"))), seg)
    dst = str(tmp_path / f"dst_{dialect}")
    run_replication(seg, dst, num_partitions=4)
    pd.testing.assert_frame_equal(_frame(src), _frame(dst))


@pytest.mark.usefixtures("ray_session")
def test_relay_continue_lifecycle(small_log, tmp_path):
    """The follow-mode hook: first call snapshots, later calls relay the
    change feed, caught-up calls no-op, and a crash between the envelope
    writes and the manifest commit re-runs idempotently."""
    from database_delta_plugins_ray.stages.relay import (
        relay_continue,
        relayed_upto,
    )

    log_dir, _, meta = small_log
    src = str(tmp_path / "src")
    wire = str(tmp_path / "wire")
    half = meta["max_lsn"] // 2
    run_replication(log_dir, src, num_partitions=8, history=True,
                    upto_lsn=half)
    s1 = relay_continue(src, wire)
    assert s1["watermark"] == half and s1["events"] > 0  # snapshot leg
    manifest_after_snap = open(os.path.join(wire, "relay.json")).read()

    run_replication(log_dir, src, num_partitions=8, history=True)
    s2 = relay_continue(src, wire)
    assert s2["from_lsn"] == half and s2["events"] > 0  # changes leg
    s3 = relay_continue(src, wire)
    assert s3.get("noop") and s3["events"] == 0  # caught up
    assert relayed_upto(wire) == meta["max_lsn"]

    # crash between the change-feed files and the manifest commit:
    # roll the manifest back and re-run — same files, same feed
    files = sorted(os.listdir(wire))
    with open(os.path.join(wire, "relay.json"), "w") as fh:
        fh.write(manifest_after_snap)
    s4 = relay_continue(src, wire)
    assert s4["files"] == s2["files"] and sorted(os.listdir(wire)) == files

    seg = str(tmp_path / "seg")
    jsonl_to_segments(sorted(glob.glob(os.path.join(wire, "*.jsonl"))), seg)
    dst = str(tmp_path / "dst")
    run_replication(seg, dst, num_partitions=4)
    pd.testing.assert_frame_equal(_frame(src), _frame(dst))


def test_follow_relay_out_cli(ray_session, small_log, tmp_path):
    """replicate --follow --relay-out keeps the downstream wire feed
    current across a growing log AND across follow restarts."""
    import shutil
    import subprocess
    import sys

    log_dir, _, meta = small_log
    feed_log = str(tmp_path / "feed_log")
    src = str(tmp_path / "src")
    wire = str(tmp_path / "wire")
    os.makedirs(feed_log)
    segs = sorted(f for f in os.listdir(log_dir) if f.startswith("seg-"))
    for f in segs[:2]:
        shutil.copy(os.path.join(log_dir, f), os.path.join(feed_log, f))

    def follow():
        r = subprocess.run(
            [sys.executable, "-m", "database_delta_plugins_ray",
             "--num-cpus", "2", "replicate", "--log", feed_log,
             "--lake", src, "--partitions", "8", "--history", "--follow",
             "--idle-stop", "2", "--poll-interval", "0.2",
             "--relay-out", wire],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]

    follow()
    assert os.path.exists(os.path.join(wire, "relay.json"))
    for f in segs[2:]:
        shutil.copy(os.path.join(log_dir, f), os.path.join(feed_log, f))
    follow()

    seg = str(tmp_path / "seg")
    jsonl_to_segments(sorted(glob.glob(os.path.join(wire, "*.jsonl"))), seg)
    dst = str(tmp_path / "dst")
    run_replication(seg, dst, num_partitions=4)
    pd.testing.assert_frame_equal(_frame(src), _frame(dst))


@pytest.mark.usefixtures("ray_session")
def test_relay_continue_inherits_dialect(small_log, tmp_path):
    """One feed speaks one position family: continue inherits the
    established dialect from the manifest and refuses a mixed one."""
    from database_delta_plugins_ray.stages.relay import relay_continue

    log_dir, _, meta = small_log
    src = str(tmp_path / "src")
    wire = str(tmp_path / "wire")
    half = meta["max_lsn"] // 2
    run_replication(log_dir, src, num_partitions=8, history=True,
                    upto_lsn=half)
    relay_snapshot_jsonl(src, wire, as_of_lsn=half, dialect="mysql")
    run_replication(log_dir, src, num_partitions=8, history=True)
    with pytest.raises(ValueError, match="dialect"):
        relay_continue(src, wire, dialect="native")
    relay_continue(src, wire)  # inherits mysql
    diff_file = sorted(f for f in os.listdir(wire)
                       if f.startswith("diff-") and "ddl" not in f)[0]
    with open(os.path.join(wire, diff_file)) as fh:
        srcblk = json.loads(fh.readline())["payload"]["source"]
    assert "file" in srcblk and "gtid" in srcblk

    seg = str(tmp_path / "seg")
    jsonl_to_segments(sorted(glob.glob(os.path.join(wire, "*.jsonl"))), seg)
    dst = str(tmp_path / "dst")
    run_replication(seg, dst, num_partitions=4)
    pd.testing.assert_frame_equal(_frame(src), _frame(dst))


@pytest.mark.usefixtures("ray_session")
def test_roundtrip_property_random_logs(tmp_path):
    """Property: for arbitrary generated logs (keys, churn, seed), the
    snapshot+changes relay re-ingested into a fresh lake equals the
    source bit-exactly — run over a seed sweep (a hypothesis @given
    around multi-second Ray pipelines would blow every deadline, so the
    sweep is explicit and deterministic)."""
    from database_delta_plugins_ray.sources.gen import (
        GenConfig,
        generate_log,
    )

    for i, (seed, nk, ne) in enumerate(
            [(7, 80, 500), (1234, 40, 900), (999, 150, 700)]):
        log = str(tmp_path / f"log{i}")
        src = str(tmp_path / f"src{i}")
        wire = str(tmp_path / f"wire{i}")
        seg = str(tmp_path / f"seg{i}")
        dst = str(tmp_path / f"dst{i}")
        meta = generate_log(log, GenConfig(
            n_keys=nk, n_events=ne, n_repos=5, seed=seed, n_segments=3))
        half = meta["max_lsn"] // 2
        run_replication(log, src, num_partitions=4, history=True,
                        upto_lsn=half)
        run_replication(log, src, num_partitions=4, history=True)
        relay_snapshot_jsonl(src, wire, as_of_lsn=half)
        relay_changes_jsonl(src, wire, half)
        jsonl_to_segments(
            sorted(glob.glob(os.path.join(wire, "*.jsonl"))), seg)
        run_replication(seg, dst, num_partitions=4)
        pd.testing.assert_frame_equal(_frame(src), _frame(dst)), (seed, nk)


def test_cli_relay_verbs(ray_session, small_log, tmp_path):
    """CLI wraps both relay halves; the emitted feed is consumable."""
    import subprocess
    import sys

    log_dir, _, meta = small_log
    src = str(tmp_path / "src")
    half = meta["max_lsn"] // 2
    run_replication(log_dir, src, num_partitions=8, history=True,
                    upto_lsn=half)
    run_replication(log_dir, src, num_partitions=8, history=True)
    wire = str(tmp_path / "wire")

    def cli(*args):
        r = subprocess.run(
            [sys.executable, "-m", "database_delta_plugins_ray",
             "--num-cpus", "2", "relay", *args],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    s = cli("snapshot", "--lake", src, "--out", wire,
            "--as-of", str(half))
    assert s["events"] > 0 and s["watermark"] == half
    c = cli("changes", "--lake", src, "--out", wire,
            "--from-lsn", str(half))
    assert c["events"] > 0 and c["from_lsn"] == half

    seg = str(tmp_path / "seg")
    jsonl_to_segments(sorted(glob.glob(os.path.join(wire, "*.jsonl"))), seg)
    dst = str(tmp_path / "dst")
    run_replication(seg, dst, num_partitions=4)
    pd.testing.assert_frame_equal(_frame(src), _frame(dst))


def test_tombstones_on_delete_roundtrip(ray_session, tmp_path):
    """tombstones.on.delete: each delete envelope is followed by a
    null-payload record; the ingest discards them, so a feed WITH
    tombstones replicates to the identical lake as one without."""
    import json as _json

    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    from database_delta_plugins_ray.sources.debezium_json import (
        jsonl_to_segments)
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)
    from database_delta_plugins_ray.stages.relay import (
        relay_changes_jsonl, relay_snapshot_jsonl)

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=200, n_events=1500, seed=5))
    with open(os.path.join(log, "meta.json")) as fh:
        half = _json.load(fh)["max_lsn"] // 2
    lake = str(tmp_path / "lake")
    run_replication(log, lake, num_partitions=4, history=True,
                    upto_lsn=half)
    run_replication(log, lake, num_partitions=4, history=True)

    def roundtrip(tomb: bool):
        wire = str(tmp_path / f"wire_{tomb}")
        relay_snapshot_jsonl(lake, wire, as_of_lsn=half)
        s = relay_changes_jsonl(lake, wire, half, tombstones=tomb)
        if tomb:
            assert s["deleted"] > 0, "fixture must exercise deletes"
            assert s["tombstones"] == s["deleted"]
        else:
            assert s["tombstones"] == 0
        import glob as _g

        segs = str(tmp_path / f"segs_{tomb}")
        jsonl_to_segments(sorted(_g.glob(os.path.join(wire, "*.jsonl"))),
                          segs)
        lk = str(tmp_path / f"lake_{tomb}")
        run_replication(segs, lk, num_partitions=4)
        return sorted(
            (r["repo"], r["path"], r["content_sha"])
            for r in final_state(lk).take_all())

    assert roundtrip(True) == roundtrip(False)
