"""Normalize-stage unit tests (op mapping M6, image selection M7, filters
M8/M9, projection M4, LWW combiner, no-PK rejection M18) — pure Arrow, no
Ray session needed."""

import json

import numpy as np
import pyarrow as pa
import pytest

from database_delta_plugins_ray.model import PAYLOAD_STRUCT, event_log_schema
from database_delta_plugins_ray.stages.normalize import (
    Normalizer,
    hash_key,
    lww_combine,
    map_ops,
)
from database_delta_plugins_ray.state.ddl import DeltaFailure, Registry


def make_registry():
    reg = Registry()
    reg.apply(1, "CREATE_TABLE", "db.t", "", json.dumps({
        "columns": [["repo", "string"], ["path", "string"], ["commit", "string"],
                    ["lang", "string"], ["content", "large_string"]],
        "primary_key": ["repo", "path"],
    }))
    return reg


def payload(rows):
    full = []
    for r in rows:
        if r is None:
            full.append(None)
        else:
            full.append({
                "repo": r.get("repo", "r"), "path": r.get("path", "p"),
                "commit": r.get("commit", "c" * 40), "lang": r.get("lang", "py"),
                "content": r.get("content", "x"), "stars": r.get("stars"),
                "language": r.get("language"),
            })
    return pa.array(full, type=PAYLOAD_STRUCT)


def make_batch(events):
    """events: list of (lsn, op, after_dict|None, before_dict|None)"""
    n = len(events)
    return pa.table({
        "lsn": pa.array([e[0] for e in events], pa.int64()),
        "tx_id": pa.array([f"tx{e[0]}" for e in events]),
        "op": pa.array([e[1] for e in events]),
        "table": pa.array(["db.t"] * n),
        "before": payload([e[3] for e in events]),
        "after": payload([e[2] for e in events]),
        "ingest_ts": pa.array([ev[0] for ev in events], pa.timestamp("ms")),
    })


def test_map_ops_debezium_aliases():
    # MySqlRecordConsumer.java:170-183: c/r->I, u->U, d->D, unknown -> null
    out = map_ops(pa.array(["c", "r", "u", "d", "I", "zz"]))
    assert out.to_pylist() == ["I", "I", "U", "D", "I", None]


def test_image_selection_and_output():
    norm = Normalizer(make_registry(), num_partitions=8)
    b = make_batch([
        (1, "I", {"repo": "a", "path": "1", "content": "v1"}, None),
        (2, "u", {"repo": "a", "path": "1", "content": "v2"},
         {"repo": "a", "path": "1", "content": "v1"}),
        (3, "d", None, {"repo": "a", "path": "1", "content": "v2"}),
    ])
    out = norm(b)
    # LWW combiner keeps only the last event for key (a,1)
    assert out.num_rows == 1
    assert out["op"][0].as_py() == "D"
    assert out["repo"][0].as_py() == "a"  # delete carries before image
    assert out["lsn"][0].as_py() == 3
    assert "content_sha" in out.column_names and "part" in out.column_names


def test_ddl_and_unknown_rows_dropped():
    norm = Normalizer(make_registry(), num_partitions=8)
    b = make_batch([
        (1, "DDL", None, None),
        (2, "??", None, None),
        (3, "I", {"repo": "a", "path": "2"}, None),
    ])
    assert norm(b).num_rows == 1


def test_table_filter_and_blacklist():
    reg = make_registry()
    b = make_batch([
        (1, "I", {"repo": "a", "path": "1"}, None),
        (2, "D", None, {"repo": "a", "path": "2"}),
    ])
    assert Normalizer(reg, 8, table_filter={"other"})(b).num_rows == 0
    # DML blacklist drops (table, op) pairs (M9)
    out = Normalizer(reg, 8, dml_blacklist={("db.t", "D")})(b)
    assert out.num_rows == 1 and out["op"][0].as_py() == "I"


def test_column_projection():
    out = Normalizer(make_registry(), 8, columns={"repo", "path", "commit"})(
        make_batch([(1, "I", {"repo": "a", "path": "1"}, None)])
    )
    assert "lang" not in out.column_names and "content" not in out.column_names
    assert "repo" in out.column_names


def test_null_pk_rejected():
    norm = Normalizer(make_registry(), 8)
    bad = pa.table({
        "lsn": pa.array([1], pa.int64()),
        "tx_id": pa.array(["t"]),
        "op": pa.array(["I"]),
        "table": pa.array(["db.t"]),
        "before": payload([None]),
        "after": pa.array([{"repo": None, "path": "p", "commit": "c",
                            "lang": None, "content": "x", "stars": None,
                            "language": None}], type=PAYLOAD_STRUCT),
        "ingest_ts": pa.array([1], pa.timestamp("ms")),
    })
    with pytest.raises(DeltaFailure):
        norm(bad)


def test_lww_combine_overkeep_safe():
    t = pa.table({
        "table": pa.array(["t"] * 4),
        "repo": pa.array(["a", "a", "b", "b"]),
        "path": pa.array(["1", "1", "1", "1"]),
        "lsn": pa.array([5, 9, 3, 7], pa.int64()),
    })
    kh = hash_key(*(t[c].to_numpy(zero_copy_only=False) for c in ("table", "repo", "path")))
    out = lww_combine(t, kh)
    got = {(r["repo"], r["path"]): r["lsn"] for r in out.to_pylist()}
    assert got == {("a", "1"): 9, ("b", "1"): 7}
