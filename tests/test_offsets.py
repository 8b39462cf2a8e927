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


# -- MySQL offset shape (MySqlConstantOffsetBackingStore.java:39-45) ----


def test_mysql_offset_map_roundtrip_and_omission():
    from database_delta_plugins_ray.state.offsets import MySqlOffset

    o = MySqlOffset(file="mysql-bin.000042", pos=1234, snapshot=False,
                    row=3, event=1,
                    gtids="3E11FA47-71CA-11E1-9E33-C80AA9429562:1-77")
    m = o.as_map()
    assert m == {"file": "mysql-bin.000042", "pos": "1234",
                 "snapshot": "false", "row": "3", "event": "1",
                 "gtids": "3E11FA47-71CA-11E1-9E33-C80AA9429562:1-77"}
    assert MySqlOffset.from_map(m) == o
    # absent fields are OMITTED from the map, exactly like
    # generateCdapOffsets (MySqlRecordConsumer.java:369-399)
    sparse = MySqlOffset(file="mysql-bin.000001", pos=4, snapshot=True)
    assert set(sparse.as_map()) == {"file", "pos", "snapshot"}
    assert MySqlOffset.from_map(sparse.as_map()) == sparse


def test_mysql_offset_ordering_file_pos_event_row():
    from database_delta_plugins_ray.state.offsets import MySqlOffset

    a = MySqlOffset(file="mysql-bin.000001", pos=900)
    b = MySqlOffset(file="mysql-bin.000002", pos=4)  # later FILE wins
    c = MySqlOffset(file="mysql-bin.000002", pos=4, event=2)
    d = MySqlOffset(file="mysql-bin.000002", pos=4, event=2, row=5)
    assert a.is_before_or_at(b) and not b.is_before_or_at(a)
    assert b.is_before_or_at(c) and c.is_before_or_at(d)
    assert not d.is_before_or_at(c)
    # missing position sorts below everything (the Lsn NULL rule)
    assert MySqlOffset().is_before_or_at(a)


def test_mysql_offset_resume_fence_and_int_bridge():
    from database_delta_plugins_ray.state.offsets import MySqlOffset

    resume = MySqlOffset(file="mysql-bin.000003", pos=500)
    replayed = MySqlOffset(file="mysql-bin.000003", pos=400)
    fresh = MySqlOffset(file="mysql-bin.000003", pos=501)
    snap = MySqlOffset(file="mysql-bin.000003", pos=100, snapshot=True)
    assert replayed.should_skip_on_resume(resume)
    assert not fresh.should_skip_on_resume(resume)
    assert not snap.should_skip_on_resume(resume)  # snapshots re-apply

    # int64 bridge round-trips and preserves order
    vals = [0, 77, (5 << 32) | 123, (5 << 32) | 124, (6 << 32)]
    offs = [MySqlOffset.from_int(v) for v in vals]
    assert [o.to_int() for o in offs] == vals
    for lo, hi in zip(offs, offs[1:]):
        assert lo.is_before_or_at(hi) and not hi.is_before_or_at(lo)
    with pytest.raises(ValueError):
        MySqlOffset.from_int(-1)
    with pytest.raises(ValueError):
        MySqlOffset(file="mysql-bin.000001", pos=1 << 32).to_int()


def test_mysql_gtid_preferred_tx_synthesis():
    from database_delta_plugins_ray.state.offsets import (
        mysql_transaction_id,
    )

    assert mysql_transaction_id("uuid:17", "mysql-bin.000002", 99) == "uuid:17"
    # no gtid -> "file:pos" (MySqlRecordConsumer.java:190-195, sep ':')
    assert (mysql_transaction_id(None, "mysql-bin.000002", 99)
            == "mysql-bin.000002:99")


@pytest.mark.usefixtures("ray_session")
def test_mysql_positions_drive_replication_and_resume(tmp_path):
    """A Debezium feed carrying MySQL binlog positions (file+pos, gtid,
    NO txId) replicates and RESUMES correctly: the (file seq << 32 | pos)
    bridge reproduces the original integer lsns exactly, and the tx id
    synthesizes GTID-first."""
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
                                       seed=40, n_segments=3))
    jsonl = write_debezium_jsonl(log, str(tmp_path / "jsonl"), mysql=True)

    got = read_debezium_jsonl(jsonl).take_all()
    orig_lsns = sorted(r["lsn"] for r in replay_lsns(log))
    assert sorted(r["lsn"] for r in got) == orig_lsns
    # every event's tx id came from the gtid (fixture embeds the
    # original tx_id after the server uuid)
    assert all(r["tx_id"] and ":" in r["tx_id"] for r in got)

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


@pytest.mark.usefixtures("ray_session")
def test_mysql_filepos_tx_fallback_when_no_gtid(tmp_path):
    """Envelopes with file+pos but NO gtid and NO txId synthesize the
    transaction id as 'file:pos' — the reference's non-GTID fallback."""
    import json

    from database_delta_plugins_ray.sources.debezium_json import (
        read_debezium_jsonl,
    )

    p = str(tmp_path / "feed.jsonl")
    envs = [
        {"payload": {
            "op": "c",
            "after": {"repo": "r1", "path": "a.py", "commit": "c1",
                      "language": "py", "content": "x = 1", "stars": 5},
            "source": {"db": "code", "table": "files",
                       "file": "mysql-bin.000001", "pos": 7,
                       "snapshot": False, "schema_version": 2},
            "ts_ms": 1700000000000}},
        {"payload": {
            "op": "u",
            "after": {"repo": "r1", "path": "a.py", "commit": "c2",
                      "language": "py", "content": "x = 2", "stars": 6},
            "source": {"db": "code", "table": "files",
                       "file": "mysql-bin.000001", "pos": 9,
                       "gtid": "uuid-a:55",
                       "snapshot": False, "schema_version": 2},
            "ts_ms": 1700000001000}},
    ]
    with open(p, "w") as fh:
        for e in envs:
            fh.write(json.dumps(e) + "\n")
    rows = sorted(read_debezium_jsonl(p).take_all(),
                  key=lambda r: r["lsn"])
    assert rows[0]["tx_id"] == "mysql-bin.000001:7"  # fallback
    assert rows[1]["tx_id"] == "uuid-a:55"           # gtid preferred
    assert rows[0]["lsn"] == (1 << 32) | 7
    assert rows[1]["lsn"] == (1 << 32) | 9


@pytest.mark.usefixtures("ray_session")
def test_drop_database_miscategorization_workaround(tmp_path):
    """Debezium's signalDropDatabase bug labels a DROP DATABASE event as
    CREATE_DATABASE; the front-end re-types it from the statement text
    (MySqlRecordConsumer.java:299-307)."""
    import json

    from database_delta_plugins_ray.sources.debezium_json import (
        read_debezium_jsonl,
    )

    p = str(tmp_path / "ddl.jsonl")
    envs = [
        {"payload": {  # the buggy envelope: op says CREATE, text says DROP
            "source": {"db": "code", "table": "", "pos": 3,
                       "txId": "t1", "schema_version": 0},
            "ts_ms": 1700000000000,
            "ddl": {"op": "CREATE_DATABASE", "table": "code",
                    "sql": "DROP DATABASE legacy"}}},
        {"payload": {  # a REAL create keeps its type (sql route parses it)
            "source": {"db": "code", "table": "", "pos": 4,
                       "txId": "t2", "schema_version": 0},
            "ts_ms": 1700000001000,
            "ddl": {"op": "CREATE_DATABASE", "table": "code",
                    "sql": "CREATE DATABASE fresh"}}},
    ]
    with open(p, "w") as fh:
        for e in envs:
            fh.write(json.dumps(e) + "\n")
    rows = sorted(read_debezium_jsonl(p).take_all(),
                  key=lambda r: r["lsn"])
    assert rows[0]["op"] == "DDL"
    assert rows[0]["ddl"]["op"] == "DROP_DATABASE"
    # the well-typed statement still goes through the SQL parse route
    assert rows[1]["ddl"]["op"] == "SQL"
