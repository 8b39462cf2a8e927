"""Oracle-shaped Debezium wire feed: decimal-string SCN bridge,
schema-namespaced identity, opaque txId passthrough, end-to-end replay
parity vs the pure-Python oracle."""
import json
import os

import pytest


def test_oraclescn_bridge_roundtrip():
    from database_delta_plugins_ray.state.offsets import OracleScn

    v = OracleScn.from_int(123456789012345)
    assert v.is_available
    assert str(v) == "123456789012345"
    assert OracleScn.parse(str(v)) == v
    # identity on the non-negative int64 domain
    for x in (0, 1, (1 << 63) - 1):
        assert OracleScn.from_int(x).to_int() == x
    assert OracleScn.parse(" 42 ").to_int() == 42


def test_oraclescn_null_rule_and_ordering():
    from database_delta_plugins_ray.state.offsets import OracleScn

    null = OracleScn.parse(None)
    assert not null.is_available and null.to_int() == -1
    assert str(null) == "NULL"
    for bad in ("junk", "", "-5", None, "1e9"):
        assert not OracleScn.parse(bad).is_available
    assert OracleScn(0) > null
    assert OracleScn(41) < OracleScn(42)
    with pytest.raises(ValueError):
        OracleScn.from_int(-1)


def test_envelope_scn_position_and_schema_identity(ray_session):
    import pyarrow as pa

    from database_delta_plugins_ray.sources.debezium_json import (
        _convert_envelopes)

    env = {
        "op": "c",
        "before": None,
        "after": {"repo": "r1", "path": "p1", "commit": "c1",
                  "lang": "py", "content": "x"},
        "source": {"db": "ORCLPDB1", "schema": "inventory",
                   "table": "code_files",
                   "scn": "7000123", "commit_scn": "7000200",
                   "txId": "t:7000123",
                   "snapshot": False, "schema_version": 0},
        "ts_ms": 1000,
    }
    batch = pa.table({"payload": pa.array([env])})
    row = _convert_envelopes(batch).to_pylist()[0]
    assert row["lsn"] == 7000123
    # oracle namespaces by schema (owning user), not the PDB name
    assert row["table"] == "inventory.code_files"
    assert row["tx_id"] == "t:7000123"  # opaque txId verbatim


def test_oracle_feed_replay_parity(ray_session, tmp_path):
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    from database_delta_plugins_ray.sources.debezium_json import (
        jsonl_to_segments, write_debezium_jsonl)
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=200, n_events=1500, seed=17,
                                n_segments=3))
    jdir = str(tmp_path / "jsonl")
    sdir = str(tmp_path / "segs")
    write_debezium_jsonl(log, jdir, oracle=True)
    # no integer position anywhere on the wire — only decimal-string SCNs
    with open(sorted(
            os.path.join(jdir, f) for f in os.listdir(jdir))[0]) as fh:
        first = json.loads(fh.readline())["payload"]["source"]
    assert "pos" not in first and "lsn" not in first
    assert isinstance(first["scn"], str) and first["scn"].isdigit()
    assert isinstance(first["commit_scn"], str)

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
