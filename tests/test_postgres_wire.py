"""Postgres-shaped Debezium wire feed: PgLsn bridge, schema-namespaced
table identity, sequence-array position decoding, end-to-end replay
parity vs the pure-Python oracle."""
import json
import os

import pytest


def test_pglsn_parse_render_roundtrip():
    from database_delta_plugins_ray.state.offsets import PgLsn

    v = PgLsn.parse("36/68A6C310")
    assert v.is_available
    assert v.to_int() == (0x36 << 32) | 0x68A6C310
    assert str(v) == "36/68A6C310"
    assert PgLsn.from_int(v.to_int()) == v
    # int bridge is identity on the 64-bit WAL domain
    for x in (0, 1, 0xFFFFFFFF, 1 << 32, (1 << 63) - 1):
        assert PgLsn.from_int(x).to_int() == x
        assert PgLsn.parse(str(PgLsn.from_int(x))).to_int() == x


def test_pglsn_null_rule_and_ordering():
    from database_delta_plugins_ray.state.offsets import PgLsn

    null = PgLsn.parse(None)
    assert not null.is_available and null.to_int() == -1
    assert str(null) == "NULL"
    for bad in ("", "junk", "1/2/3", "XYZ/1", "100000000/0"):
        assert not PgLsn.parse(bad).is_available
    assert PgLsn.parse("0/0") > null
    assert PgLsn.parse("0/FF") < PgLsn.parse("1/0")


def test_envelope_sequence_and_schema_namespace(ray_session, tmp_path):
    import pyarrow as pa

    from database_delta_plugins_ray.sources.debezium_json import (
        _convert_envelopes)

    env = {
        "op": "c",
        "before": None,
        "after": {"repo": "r1", "path": "p1", "commit": "c1",
                  "lang": "py", "content": "x"},
        "source": {"db": "postgres", "schema": "inventory",
                   "table": "code_files",
                   "sequence": json.dumps(["0/0", "1/2A"]),
                   "txId": 77, "snapshot": False,
                   "schema_version": 0},
        "ts_ms": 1000,
    }
    batch = pa.table({"payload": pa.array([env])})
    out = _convert_envelopes(batch)
    row = out.to_pylist()[0]
    assert row["lsn"] == (1 << 32) | 0x2A  # LAST sequence element
    assert row["table"] == "inventory.code_files"  # schema, not db
    assert row["tx_id"] == "77"


def test_postgres_feed_replay_parity(ray_session, tmp_path):
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    from database_delta_plugins_ray.sources.debezium_json import (
        jsonl_to_segments, write_debezium_jsonl)
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=200, n_events=1500, seed=11,
                                n_segments=3))
    jdir = str(tmp_path / "jsonl")
    sdir = str(tmp_path / "segs")
    write_debezium_jsonl(log, jdir, postgres=True)
    # no integer position anywhere on the wire
    with open(sorted(
            os.path.join(jdir, f) for f in os.listdir(jdir))[0]) as fh:
        first = json.loads(fh.readline())["payload"]["source"]
    assert "pos" not in first and "lsn" not in first
    assert "/" in json.loads(first["sequence"])[-1]

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
