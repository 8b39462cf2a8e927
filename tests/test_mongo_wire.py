"""MongoDB-shaped Debezium wire feed: MongoTs BSON-timestamp bridge,
db.collection identity, lsid/txnNumber transaction synthesis,
end-to-end replay parity vs the pure-Python oracle."""
import json
import os

import pytest


def test_mongots_pack_roundtrip():
    from database_delta_plugins_ray.state.offsets import MongoTs

    v = MongoTs(1700000000, 42)
    assert v.is_available
    assert v.to_int() == (1700000000 << 32) | 42
    assert str(v) == "1700000000:42"
    assert MongoTs.from_int(v.to_int()) == v
    # int bridge is identity on the packed 64-bit BSON-timestamp domain
    for x in (0, 1, 0xFFFFFFFF, 1 << 32, (1 << 63) - 1):
        assert MongoTs.from_int(x).to_int() == x


def test_mongots_null_rule_and_ordering():
    from database_delta_plugins_ray.state.offsets import MongoTs

    null = MongoTs.parse(None, None)
    assert not null.is_available and null.to_int() == -1
    assert str(null) == "NULL"
    for bad in ((None, 1), (1, None), (-1, 0), (0, -1),
                (1 << 31, 0), (1 << 32, 0), (0, 1 << 32), ("junk", 0)):
        assert not MongoTs.parse(*bad).is_available
    # BSON timestamp comparison: sec-major, then ordinal
    assert MongoTs(0, 0) > null
    assert MongoTs(1, 0xFFFFFFFF) < MongoTs(2, 0)
    assert MongoTs(2, 1) < MongoTs(2, 2)


def test_envelope_collection_identity_and_position(ray_session):
    import pyarrow as pa

    from database_delta_plugins_ray.sources.debezium_json import (
        _convert_envelopes)

    env = {
        "op": "c",
        "before": None,
        "after": {"repo": "r1", "path": "p1", "commit": "c1",
                  "lang": "py", "content": "x"},
        "source": {"rs": "rs0", "db": "inventory",
                   "collection": "code_files",
                   "sec": 1700000000, "ord": 3,
                   "lsid": "5f3a", "txnNumber": 7,
                   "snapshot": False, "schema_version": 0},
        "ts_ms": 1000,
    }
    batch = pa.table({"payload": pa.array([env])})
    row = _convert_envelopes(batch).to_pylist()[0]
    assert row["lsn"] == (1700000000 << 32) | 3
    assert row["table"] == "inventory.code_files"  # db.collection
    # multi-doc-transaction identity: lsid:txnNumber
    assert row["tx_id"] == "5f3a:7"


def test_envelope_autocommit_tx_synthesis(ray_session):
    import pyarrow as pa

    from database_delta_plugins_ray.sources.debezium_json import (
        _convert_envelopes)

    # no lsid: each oplog entry is its own auto-commit transaction whose
    # token parses to the event's own lsn in the prefix:tx-start shape
    env = {
        "op": "u",
        "before": None,
        "after": {"repo": "r1", "path": "p1", "commit": "c2",
                  "lang": "py", "content": "y"},
        "source": {"rs": "rs0", "db": "inventory",
                   "collection": "code_files",
                   "sec": 2, "ord": 9,
                   "snapshot": False, "schema_version": 0},
        "ts_ms": 2000,
    }
    batch = pa.table({"payload": pa.array([env])})
    row = _convert_envelopes(batch).to_pylist()[0]
    lsn = (2 << 32) | 9
    assert row["lsn"] == lsn
    assert row["tx_id"] == f"mongo:{lsn}"
    assert int(row["tx_id"].split(":")[1]) == lsn


def test_mongo_feed_replay_parity(ray_session, tmp_path):
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    from database_delta_plugins_ray.sources.debezium_json import (
        jsonl_to_segments, write_debezium_jsonl)
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=200, n_events=1500, seed=13,
                                n_segments=3))
    jdir = str(tmp_path / "jsonl")
    sdir = str(tmp_path / "segs")
    write_debezium_jsonl(log, jdir, mongo=True)
    # no integer position and no table key anywhere on the wire —
    # only BSON-timestamp sec+ord and db+collection identity
    with open(sorted(
            os.path.join(jdir, f) for f in os.listdir(jdir))[0]) as fh:
        first = json.loads(fh.readline())["payload"]["source"]
    assert "pos" not in first and "lsn" not in first
    assert "table" not in first and "txId" not in first
    assert isinstance(first["sec"], int) and isinstance(first["ord"], int)

    jsonl_to_segments(jdir, sdir)
    lake = str(tmp_path / "lake")
    run_replication(sdir, lake, num_partitions=8)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]):
           (r["content_sha"], r["_sequence_num"])
           for r in rows if not r["_is_deleted"]}
    exp = {k: (v["content_sha"], v["_sequence_num"])
           for k, v in replay(log).items()}
    assert got == exp
