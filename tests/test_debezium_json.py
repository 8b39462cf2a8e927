"""Debezium-JSON envelope source: the reference's native wire format
(MySqlRecordConsumer.java:209-225 consumes before/after/op/source envelopes;
op codes c/u/d/r and source.snapshot are public Debezium contract).

Round trip: native Parquet log -> Debezium JSONL -> read/convert ->
Parquet segments -> full replication; final state must equal the
pure-Python oracle replay of the ORIGINAL log.
"""

import os

import pytest

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


@pytest.fixture(scope="module")
def dbz(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("dbz")
    log = str(root / "log")
    meta = generate_log(log, GenConfig(n_keys=300, n_events=2500, n_repos=6,
                                       seed=13, n_segments=3))
    jsonl = write_debezium_jsonl(log, str(root / "jsonl"))
    return {"root": root, "log": log, "meta": meta, "jsonl": jsonl}


def test_envelope_roundtrip_schema_and_counts(dbz):
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads
    import os

    from database_delta_plugins_ray.model import event_log_schema

    ds = read_debezium_jsonl(dbz["jsonl"])
    got = ds.take_all()
    orig = pads.dataset(
        [os.path.join(dbz["log"], f) for f in sorted(os.listdir(dbz["log"]))
         if f.startswith("seg-")], format="parquet").to_table()
    assert len(got) == orig.num_rows
    assert set(ds.schema().names) == set(event_log_schema().names)
    by_lsn = {r["lsn"]: r for r in got}
    want = orig.to_pylist()
    for w in want[:50] + want[-50:]:
        g = by_lsn[w["lsn"]]
        assert g["op"] == w["op"]
        assert g["table"] == w["table"]
        assert g["tx_id"] == w["tx_id"]
        assert bool(g["is_snapshot"]) == bool(w["is_snapshot"])
        assert g["ingest_ts"] == w["ingest_ts"]
        if w["after"] is not None:
            assert g["after"]["content"] == w["after"]["content"]
            assert g["after"]["repo"] == w["after"]["repo"]
        else:
            assert g["after"] is None
        if w["ddl"] is not None:
            assert g["ddl"]["op"] == w["ddl"]["op"]
            assert g["ddl"]["payload"] == w["ddl"]["payload"]


def test_ts_ms_is_utc_regardless_of_host_zone(tmp_path, monkeypatch):
    """ADVICE r2: naive ingest_ts datetimes are UTC wall-clock; exporting
    them through .timestamp() on a non-UTC host shifted ts_ms by the host
    offset. Pin TZ to a -05:00 zone and verify the exported millis."""
    import json as _json
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.model import OP_INSERT, event_log_schema

    schema = event_log_schema()
    ps = schema.field("after").type
    row = {
        "lsn": 7, "tx_id": "t:7", "op": OP_INSERT, "table": "db.t",
        "before": None,
        "after": {f.name: None for f in ps},
        "ddl": None, "is_snapshot": False,
        "ingest_ts": 1_700_000_000_123,  # epoch ms, stored as UTC wall-clock
        "schema_version": 0,
    }
    tbl = pa.Table.from_pylist([row], schema=schema)
    log = tmp_path / "log"
    log.mkdir()
    pq.write_table(tbl, str(log / "seg-00000.parquet"))

    monkeypatch.setenv("TZ", "America/New_York")
    time.tzset()
    try:
        out = write_debezium_jsonl(str(log), str(tmp_path / "jsonl"))
        env = _json.loads(open(out[0]).read().splitlines()[0])
        assert env["payload"]["ts_ms"] == 1_700_000_000_123
    finally:
        monkeypatch.setenv("TZ", "UTC")
        time.tzset()


def test_jsonl_feed_drives_full_replication(dbz, tmp_path):
    segs = str(tmp_path / "segs")
    lake = str(tmp_path / "lake")
    meta = jsonl_to_segments(dbz["jsonl"], segs)
    assert meta["total_events"] == dbz["meta"]["total_events"]

    run_replication(segs, lake, num_partitions=4)
    rows = final_state(lake).take_all()
    oracle = replay(dbz["log"])
    got = {(r["table"], r["repo"], r["path"]) for r in rows}
    assert got == set(oracle)
    for r in rows:
        k = (r["table"], r["repo"], r["path"])
        o = oracle[k]
        assert r["content_sha"] == o["content_sha"]
        assert r["_sequence_num"] == o["_sequence_num"]


def test_stale_segments_swept_before_materialize(dbz, tmp_path):
    """A crashed earlier materialization (or a failed first attempt of
    this one) may leave seg-* files whose names — lsn range + row count
    from a DIFFERENT batching — never collide with the fresh run's, so
    replication's seg-* glob would double-count. jsonl_to_segments owns
    seg_dir: anything seg-* is swept before (re)writing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    segs = str(tmp_path / "segs")
    os.makedirs(segs)
    stale = os.path.join(segs, "seg-" + "9" * 20 + "-" + "9" * 20
                         + "-77.parquet")
    pq.write_table(pa.table({"lsn": [1]}), stale)
    meta = jsonl_to_segments(dbz["jsonl"], segs)
    assert not os.path.exists(stale)
    assert meta["total_events"] == dbz["meta"]["total_events"]
    on_disk = sorted(f for f in os.listdir(segs) if f.startswith("seg-"))
    assert on_disk == meta["segments"]
