"""Composite (change_lsn, commit_lsn, snapshot) offsets — unit tests
mirroring SqlServerOffset semantics (SqlServerOffset.java:33-123,
SqlServerRecordConsumer.java:93-97) plus an end-to-end resume-from-
composite-positions test over the Debezium JSONL source."""

import pytest

from database_delta_plugins_ray.state.offsets import (
    CompositeOffset,
    Lsn,
)


def test_lsn_parse_format_roundtrip():
    s = "00000025:00000448:0003"
    assert str(Lsn.parse(s)) == s
    assert Lsn.parse(s) == Lsn.parse(s)


def test_lsn_null_sorts_below_everything():
    # Lsn.valueOf(null) semantics: NULL < any valid lsn
    assert Lsn.parse(None) < Lsn.parse("00000000:00000000:0001")
    assert Lsn.parse("") < Lsn.parse("00000000:00000000:0000")
    assert Lsn.parse("garbage") < Lsn.parse("00000000:00000000:0000")
    assert not Lsn.parse(None).is_available


def test_lsn_byte_order_is_integer_order():
    vals = [0, 1, 0xFFFF, 0x10000, 0xFFFF_FFFF_0001, 2**62]
    lsns = [Lsn.from_int(v) for v in vals]
    assert [l.to_int() for l in lsns] == vals  # exact int round-trip
    assert sorted(lsns) == lsns
    # hex rendering compares the same way lexically (fixed width)
    assert sorted(str(l) for l in lsns) == [str(l) for l in lsns]


def test_is_before_or_at_change_lsn_only():
    """isBeforeOrAt (SqlServerOffset.java:91-94) compares CHANGE lsns
    only; commit_lsn and flags do not participate."""
    a = CompositeOffset(change_lsn="00000010:00000000:0001",
                        commit_lsn="00000099:00000000:0001")
    b = CompositeOffset(change_lsn="00000010:00000000:0002",
                        commit_lsn="00000001:00000000:0001")
    assert a.is_before_or_at(b)
    assert not b.is_before_or_at(a)
    assert a.is_before_or_at(a)  # "< 1" includes equality


def test_resume_fence_skips_replayed_but_not_snapshot():
    """SqlServerRecordConsumer.java:93-97: replayed events at/below the
    resume offset are dropped EXCEPT snapshot events (all snapshot events
    share one offset and must re-apply on a snapshot restart)."""
    resume = CompositeOffset(change_lsn="00000020:00000000:0000")
    replayed = CompositeOffset(change_lsn="00000015:00000000:0000")
    fresh = CompositeOffset(change_lsn="00000020:00000000:0001")
    snap = CompositeOffset(change_lsn="00000015:00000000:0000",
                           snapshot=True)
    assert replayed.should_skip_on_resume(resume)
    assert not fresh.should_skip_on_resume(resume)
    assert not snap.should_skip_on_resume(resume)


def test_offset_map_roundtrip_with_ddl_event_sent():
    """getAsOffset serialization (SqlServerOffset.java:63-80): string map
    with comma-joined ddl_event_sent; defaults snapshot_completed=true
    when absent (:52-54)."""
    o = CompositeOffset(
        change_lsn="00000025:00000448:0003",
        commit_lsn="00000025:00000448:0005",
        snapshot=False, snapshot_completed=False,
        ddl_event_sent=frozenset({"db.t1", "db.t2"}),
    )
    m = o.as_map()
    assert m["ddl_event_sent"] == "db.t1,db.t2"
    assert CompositeOffset.from_map(m) == o
    # missing snapshot_completed defaults true
    d = dict(m)
    del d["snapshot_completed"]
    assert CompositeOffset.from_map(d).snapshot_completed is True


def test_int_bridge_overflow_rejected():
    with pytest.raises(ValueError):
        Lsn.from_int(-1)
    with pytest.raises(ValueError):
        Lsn.from_int(1 << 80)


@pytest.mark.usefixtures("ray_session")
def test_composite_positions_drive_replication_and_resume(tmp_path):
    """A Debezium feed carrying SQL-Server composite positions (hex
    change_lsn/commit_lsn, no integer pos) replicates and RESUMES
    correctly: the Lsn bridge preserves ordering, so watermark fences
    work unchanged on composite feeds."""
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.debezium_json import (
        jsonl_to_segments,
        read_debezium_jsonl,
        write_debezium_jsonl,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    meta = generate_log(log, GenConfig(n_keys=250, n_events=2200, n_repos=6,
                                       seed=39, n_segments=3))
    jsonl = write_debezium_jsonl(log, str(tmp_path / "jsonl"), composite=True)

    # the bridge must reproduce the original integer lsns exactly
    got = read_debezium_jsonl(jsonl).take_all()
    orig_lsns = sorted(r["lsn"] for r in replay_lsns(log))
    assert sorted(r["lsn"] for r in got) == orig_lsns
    # commit-lsn tx synthesis applies only where txId was absent (always
    # present in this fixture): tx ids survive
    assert all(r["tx_id"] for r in got)

    segs = str(tmp_path / "segs")
    lake = str(tmp_path / "lake")
    jsonl_to_segments(jsonl, segs)
    half = meta["max_lsn"] // 2
    run_replication(segs, lake, num_partitions=4, upto_lsn=half)
    s = run_replication(segs, lake, num_partitions=4)
    assert s["events_applied"] > 0
    s2 = run_replication(segs, lake, num_partitions=4)
    assert s2["events_applied"] == 0  # caught up

    oracle = replay(log)
    rows = final_state(lake).take_all()
    gotk = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(gotk) == set(oracle)
    for k, o in oracle.items():
        assert gotk[k]["content_sha"] == o["content_sha"], k
        assert gotk[k]["_sequence_num"] == o["_sequence_num"], k


def replay_lsns(log_dir):
    import os

    import pyarrow.dataset as pads

    files = [os.path.join(log_dir, f) for f in sorted(os.listdir(log_dir))
             if f.startswith("seg-")]
    return pads.dataset(files, format="parquet").to_table(
        columns=["lsn"]).to_pylist()
