"""Deterministic synthetic binlog for the ALL-DATATYPES table.

The reference's e2e suite replicates a table covering every supported MySQL
datatype and validates it column-by-column on the target
(mysql-delta-plugins/src/e2e-test/resources/pluginParameters.properties:28-58,
BQValidation.java:104-213). This module generates the equivalent
Ray-side fixture: a change log for ``inventory.all_types`` whose payload
struct carries the RAW source encodings (epoch-day ints, micros-past-
midnight, enum indexes, SET bitmasks, 2-digit years, ISO-8601 strings with
non-UTC offsets, unsigned narrow ints, unpadded BINARY…), while the
CREATE_TABLE DDL declares the target type + value converter per column.
The normalize stage applies the converters (functions/values.py V1-V13,
Records.java:186-271 / MySqlValueConverters.java semantics) so the typed
values flow through normalize → merge → the Parquet lake.

Every column also carries its DuckDB oracle expression (the same decode
expressed in SQL over the raw log) and an Arrow canonicalizer used by the
driver-comparison query, so the whole type system is end-to-end oracled.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, asdict
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..model import (
    DDL_CREATE_DATABASE,
    DDL_CREATE_TABLE,
    DDL_DROP_DATABASE,
    DDL_DROP_TABLE,
    DDL_STRUCT,
    OP_DDL,
    OP_DELETE,
    OP_INSERT,
)
from .gen import _hex_u64, _int_str, _join, _mix, _segmented_state

TYPED_TABLE = "inventory.all_types"
TYPED_DATABASE = "inventory"

_EPOCH_MS = 1_700_000_000_000

ENUM_OPTIONS = ["red", "green", "blue"]
SET_OPTIONS = ["alpha", "beta", "gamma", "delta"]

#: ±838:59:59 in micros (MySqlValueConverters.java:918-927)
_TIME_DUR_LIM = (838 * 3600 + 59 * 60 + 59) * 1_000_000


@dataclass
class TypedCol:
    """One all-datatypes column: raw log encoding -> converted lake type.

    ``sql`` is the DuckDB expression applying the SAME decode to the raw
    log column (placeholder ``{c}``); ``canon`` canonicalizes the FINAL
    lake column to the comparison dtype the SQL produces."""

    name: str
    raw_type: pa.DataType
    final: str  # portable type name (functions/types.arrow_type)
    conv: str | None
    build: Callable[[Callable[[int], np.ndarray]], pa.Array]
    sql: str
    canon: Callable[[pa.ChunkedArray], pa.Array] | None = None
    null_every: int = 0  # every k-th row is null (0 = never)


def _i64(t): return pc.cast(t, pa.int64())


def _hex_canon(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array([v.hex() if v is not None else None for v in arr.to_pylist()],
                    pa.string())


def _dec_str(cents: np.ndarray, scale: int, typ: pa.DataType) -> pa.Array:
    """Exact decimal from integer 'scaled units' via string build + cast."""
    whole = _int_str(cents // (10 ** scale))
    frac = _int_str(cents % (10 ** scale), width=scale)
    return pc.cast(_join(whole, ".", frac), typ)


def _iso_zoned(us_utc: np.ndarray) -> pa.Array:
    """ISO-8601 strings with a +01:00 offset and fractional seconds — the
    reference's own ZonedTimestamp fixture shape (RecordsTest.java:56-71)."""
    local = pa.array(us_utc + 3_600_000_000, pa.int64()).cast(pa.timestamp("us"))
    # Arrow's %S prints the fractional part for sub-second units
    return pc.strftime(local, format="%Y-%m-%dT%H:%M:%S+01:00")


def _build_binary8(h) -> pa.Array:
    """Variable-length raw BINARY values (4/6/8 bytes) so the fixed-length
    zero-pad path (MySqlValueConverters.java:783-790) is actually exercised."""
    b = pc.cast(pa.array(_hex_u64(h(45))), pa.binary())
    sel = h(53) % np.uint64(3)
    return pc.if_else(
        pa.array(sel == 0), pc.binary_slice(b, 0, 4),
        pc.if_else(pa.array(sel == 1), pc.binary_slice(b, 0, 6),
                   pc.binary_slice(b, 0, 8)),
    )


def typed_columns() -> list[TypedCol]:
    c: list[TypedCol] = [
        TypedCol("id", pa.string(), "string", None,
                 lambda h: None,  # built from key id, see _payload
                 "{c}"),
        TypedCol("c_bit", pa.bool_(), "bool", None,
                 lambda h: pa.array(h(21) % 2 == 0),
                 "CAST({c} AS BIGINT)", _i64),
        TypedCol("c_tinyint", pa.int32(), "int32", None,
                 lambda h: pa.array((h(22) % 256).astype(np.int64) - 128, pa.int32()),
                 "CAST({c} AS BIGINT)", _i64),
        TypedCol("c_smallint", pa.int32(), "int32", None,
                 lambda h: pa.array((h(23) % 65536).astype(np.int64) - 32768, pa.int32()),
                 "CAST({c} AS BIGINT)", _i64),
        # MEDIUMINT — the 33-column e2e fixture's COL20/COL21
        # (pluginParameters.properties:28-58): 24-bit signed range; DDL
        # maps it to INT (MySqlAntlrDdlParser.java:134-258)
        TypedCol("c_mediumint", pa.int32(), "int32", None,
                 lambda h: pa.array((h(55) % 16_777_216).astype(np.int64)
                                    - 8_388_608, pa.int32()),
                 "CAST({c} AS BIGINT)", _i64),
        TypedCol("c_int", pa.int32(), "int32", None,
                 lambda h: pa.array((h(24) % 2_000_000).astype(np.int64) - 1_000_000,
                                    pa.int32()),
                 "CAST({c} AS BIGINT)", _i64),
        TypedCol("c_bigint", pa.int64(), "int64", None,
                 lambda h: pa.array((h(25) % 10**12).astype(np.int64) - 5 * 10**11),
                 "CAST({c} AS BIGINT)", _i64),
        # unsigned widening chain (MySqlValueConverters.java:270-300)
        TypedCol("c_tinyint_u", pa.int32(), "int32", "unsigned:TINYINT",
                 lambda h: pa.array((h(26) % 256).astype(np.int64), pa.int32()),
                 "CAST({c} AS BIGINT)", _i64),
        TypedCol("c_smallint_u", pa.int32(), "int32", "unsigned:SMALLINT",
                 lambda h: pa.array((h(27) % 65536).astype(np.int64), pa.int32()),
                 "CAST({c} AS BIGINT)", _i64),
        # MEDIUMINT UNSIGNED widens to int32 like the other narrow
        # unsigneds (MySqlValueConverters.java:270-300)
        TypedCol("c_mediumint_u", pa.int32(), "int32", "unsigned:MEDIUMINT",
                 lambda h: pa.array((h(56) % 16_777_216).astype(np.int64),
                                    pa.int32()),
                 "CAST({c} AS BIGINT)", _i64),
        TypedCol("c_int_u", pa.int64(), "int64", "unsigned:INT",
                 lambda h: pa.array((h(28) % 2**32).astype(np.int64)),
                 "CAST({c} AS BIGINT)", _i64),
        TypedCol("c_bigint_u", pa.int64(), "decimal(20,0)", "unsigned:BIGINT",
                 lambda h: pa.array((h(29) % 2**62).astype(np.int64)),
                 "CAST(CAST({c} AS DECIMAL(20,0)) AS VARCHAR)",
                 lambda t: pc.cast(t, pa.string())),
        TypedCol("c_float", pa.float32(), "float32", None,
                 lambda h: pa.array(((h(30) % 1024).astype(np.float64) / 256.0)
                                    .astype(np.float32)),
                 "{c}"),
        TypedCol("c_double", pa.float64(), "float64", None,
                 lambda h: pa.array((h(31) % 2**20).astype(np.float64) / 1024.0),
                 "{c}"),
        TypedCol("c_decimal", pa.decimal128(10, 2), "decimal(10,2)", None,
                 lambda h: _dec_str((h(32) % 10**8).astype(np.int64), 2,
                                    pa.decimal128(10, 2)),
                 "CAST({c} AS VARCHAR)", lambda t: pc.cast(t, pa.string())),
        TypedCol("c_numeric", pa.decimal128(20, 5), "decimal(20,5)", None,
                 lambda h: _dec_str((h(33) % 10**10).astype(np.int64), 5,
                                    pa.decimal128(20, 5)),
                 "CAST({c} AS VARCHAR)", lambda t: pc.cast(t, pa.string())),
        # temporal logical types (Records.java:186-271)
        TypedCol("c_date", pa.int32(), "date", "epoch_days_date",
                 lambda h: pa.array((h(34) % 25000).astype(np.int64), pa.int32()),
                 "CAST({c} AS BIGINT)",
                 lambda t: _i64(pc.cast(t, pa.int32()))),
        TypedCol("c_time", pa.int64(), "time_micros", "micros_time",
                 lambda h: pa.array((h(35) % 86_400_000_000).astype(np.int64)),
                 "CAST({c} AS BIGINT)", _i64),
        TypedCol("c_time7", pa.int64(), "time_micros", "nanos_time",
                 lambda h: pa.array((h(36) % 86_400_000_000_000).astype(np.int64)),
                 "CAST({c} // 1000 AS BIGINT)", _i64),
        TypedCol("c_datetime", pa.int64(), "datetime", "epoch_ms_datetime",
                 lambda h: pa.array((_EPOCH_MS + h(37) % 10**10).astype(np.int64)),
                 "CAST({c} * 1000 AS BIGINT)", _i64),
        TypedCol("c_timestamp", pa.int64(), "timestamp_micros", "epoch_us_ts_utc",
                 lambda h: pa.array((_EPOCH_MS * 1000 + h(38) % 10**12)
                                    .astype(np.int64)),
                 "CAST({c} AS BIGINT)", _i64),
        TypedCol("c_zoned", pa.string(), "timestamp_micros", "iso8601_ts",
                 lambda h: _iso_zoned((_EPOCH_MS * 1000 + h(39) % 10**12)
                                      .astype(np.int64)),
                 "epoch_us(CAST({c} AS TIMESTAMPTZ))", _i64),
        TypedCol("c_year", pa.int32(), "int32", "year",
                 lambda h: pa.array(
                     np.where(h(40) % 3 == 0,
                              (h(40) % 100).astype(np.int64),
                              1950 + (h(40) % 70).astype(np.int64)),
                     pa.int32()),
                 ("CAST(CASE WHEN {c} BETWEEN 0 AND 69 THEN {c} + 2000 "
                  "WHEN {c} BETWEEN 70 AND 99 THEN {c} + 1900 "
                  "ELSE {c} END AS BIGINT)"), _i64),
        TypedCol("c_char", pa.string(), "string", None,
                 lambda h: _join("c", _int_str((h(41) % 1000).astype(np.int64), 3)),
                 "{c}"),
        TypedCol("c_varchar", pa.string(), "string", None,
                 lambda h: _join("v-", pa.array(_hex_u64(h(42)))),
                 "{c}"),
        TypedCol("c_text", pa.large_string(), "large_string", None,
                 lambda h: pc.cast(
                     _join("text ", pa.array(_hex_u64(h(43))), " / ",
                           pa.array(_hex_u64(h(44)))),
                     pa.large_string()),
                 "{c}", null_every=11),
        TypedCol("c_binary8", pa.binary(), "binary(8)", "binary_pad:8",
                 _build_binary8,
                 "rpad(lower(hex({c})), 16, '0')", _hex_canon),
        TypedCol("c_varbinary", pa.binary(), "bytes", None,
                 lambda h: pc.cast(pa.array(_hex_u64(h(46))), pa.binary()),
                 "lower(hex({c}))", _hex_canon),
        TypedCol("c_enum", pa.int32(), "string", "enum:" + ",".join(ENUM_OPTIONS),
                 lambda h: pa.array((h(47) % (len(ENUM_OPTIONS) + 1))
                                    .astype(np.int64), pa.int32()),
                 ("list_extract(['', "
                  + ", ".join(f"'{o}'" for o in ENUM_OPTIONS)
                  + "], CAST({c} AS BIGINT) + 1)")),
        TypedCol("c_set", pa.int64(), "string", "set:" + ",".join(SET_OPTIONS),
                 lambda h: pa.array((h(48) % (1 << len(SET_OPTIONS)))
                                    .astype(np.int64)),
                 "concat_ws(','"
                 + "".join(
                     f", CASE WHEN {{c}} & {1 << i} > 0 THEN '{o}' END"
                     for i, o in enumerate(SET_OPTIONS))
                 + ")"),
        TypedCol("c_json", pa.string(), "string", "json",
                 lambda h: pc.if_else(
                     pa.array(h(49) % 5 == 0),
                     pa.scalar(""),
                     _join('{"k": ', _int_str((h(49) % 100).astype(np.int64)), "}")),
                 "CASE WHEN {c} IS NULL OR trim({c}) = '' THEN '{}' ELSE {c} END"),
        TypedCol("c_zero_date", pa.string(), "string", "zero_date_null",
                 lambda h: pc.if_else(
                     pa.array(h(50) % 6 == 0),
                     pa.scalar("0000-00-00 00:00:00"),
                     _join("2021-03-", _int_str((h(50) % 28 + 1).astype(np.int64), 2))),
                 "CASE WHEN {c} LIKE '0000-00-00%' THEN NULL ELSE {c} END"),
        TypedCol("c_time_dur", pa.int64(), "int64", "time_duration",
                 lambda h: pa.array(
                     (h(51) % (2 * (_TIME_DUR_LIM + 10**9))).astype(np.int64)
                     - (_TIME_DUR_LIM + 10**9)),
                 ("CASE WHEN {c} BETWEEN -" + str(_TIME_DUR_LIM) + " AND "
                  + str(_TIME_DUR_LIM) + " THEN CAST({c} AS BIGINT) END"), _i64),
        TypedCol("c_bool", pa.bool_(), "bool", None,
                 lambda h: pa.array(h(52) % 3 == 1),
                 "CAST({c} AS BIGINT)", _i64),
        # column-charset decode (V12a, MySqlValueConverters.java:381-399):
        # raw bytes are cp1252-ENCODED text (MySQL "latin1" IS cp1252); the
        # charset converter decodes them to UTF-8 strings in normalize. The
        # DuckDB oracle applies the same decode at the hex level: each
        # cp1252-only byte is rewritten to its UTF-8 byte sequence, then the
        # whole value is decoded as UTF-8. The generator's ASCII alphabet
        # (digits, '-', 'n', 'caf') is chosen so no replaced hex pair can
        # occur straddling a byte boundary.
        TypedCol("c_latin1", pa.binary(), "string", "charset:latin1",
                 lambda h: pc.binary_join_element_wise(
                     pc.cast(_join("n-", _int_str((h(54) % 100000)
                                                  .astype(np.int64), 5)),
                             pa.binary()),
                     pa.scalar("-café-üñ-€".encode("cp1252"), pa.binary()),
                     pa.scalar(b"", pa.binary())),
                 ("decode(unhex(replace(replace(replace(replace("
                  "lower(hex({c})),'e9','c3a9'),'fc','c3bc'),"
                  "'f1','c3b1'),'80','e282ac')))"),
                 null_every=9),
    ]
    return c


def typed_payload_struct() -> pa.DataType:
    return pa.struct([pa.field(col.name, col.raw_type) for col in typed_columns()])


def typed_event_schema() -> pa.Schema:
    ps = typed_payload_struct()
    return pa.schema(
        [
            pa.field("lsn", pa.int64(), nullable=False),
            pa.field("tx_id", pa.string()),
            pa.field("op", pa.string(), nullable=False),
            pa.field("table", pa.string(), nullable=False),
            pa.field("before", ps),
            pa.field("after", ps),
            pa.field("ddl", DDL_STRUCT),
            pa.field("is_snapshot", pa.bool_()),
            pa.field("ingest_ts", pa.timestamp("ms")),
            pa.field("schema_version", pa.int32()),
        ]
    )


def create_table_payload() -> str:
    """CREATE_TABLE DDL payload declaring final types + converters."""
    cols = []
    for c in typed_columns():
        cols.append([c.name, c.final, c.conv] if c.conv else [c.name, c.final])
    return json.dumps({"columns": cols, "primary_key": ["id"]})


@dataclass
class TypedGenConfig:
    n_keys: int = 1_000
    n_events: int = 5_000
    n_base: int | None = None
    seed: int = 77
    p_delete: float = 0.08
    n_segments: int = 6
    table: str = TYPED_TABLE

    def resolved_base(self) -> int:
        return self.n_keys // 2 if self.n_base is None else self.n_base


def _payload(key: np.ndarray, version: np.ndarray, valid: np.ndarray) -> pa.StructArray:
    cols = typed_columns()
    mask_invalid = ~valid

    def h(salt: int) -> np.ndarray:
        return _mix(key, version, salt)

    arrays = []
    for c in cols:
        if c.name == "id":
            arr = _join("key-", _int_str(key.astype(np.int64), 7))
        else:
            arr = c.build(h)
        if c.null_every:
            extra = (h(97) % np.uint64(c.null_every)) == 0
            arr = pc.if_else(pa.array(~extra), arr, pa.scalar(None, arr.type))
        if mask_invalid.any():
            arr = pc.if_else(pa.array(~mask_invalid), arr, pa.scalar(None, arr.type))
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.type != c.raw_type:
            arr = pc.cast(arr, c.raw_type)
        arrays.append(arr)
    return pa.StructArray.from_arrays(
        arrays,
        fields=[pa.field(c.name, c.raw_type) for c in cols],
        mask=pa.array(mask_invalid),
    )


def generate_typed_log(out_dir: str, cfg: TypedGenConfig | None = None, **kw) -> dict:
    """Write the all-datatypes event log (snapshot DDL prefix + snapshot
    inserts + I/U/D stream) as Parquet segments. Idempotent per config."""
    cfg = cfg or TypedGenConfig(**kw)
    # column-set fingerprint: a cached log generated before a column was
    # added/changed must regenerate even under an identical config
    schema_cols = [[c.name, str(c.raw_type), c.conv or ""]
                   for c in typed_columns()]
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if (meta.get("config") == asdict(cfg)
                and meta.get("schema_cols") == schema_cols):
            return meta

    rng = np.random.default_rng(cfg.seed)
    n_base = cfg.resolved_base()
    n = cfg.n_events
    key_ids = rng.integers(0, cfg.n_keys, size=n).astype(np.int64)
    del_flag = rng.random(n) < cfg.p_delete
    in_base_k = np.zeros(cfg.n_keys, dtype=bool)
    in_base_k[:n_base] = True
    op, version = _segmented_state(key_ids, del_flag, in_base_k)

    schema = typed_event_schema()
    ps = typed_payload_struct()
    tables: list[pa.Table] = []

    def nulls(m):
        return pa.nulls(m, type=ps)

    # golden snapshot DDL prefix (MySqlEventReaderIntegrationTest.java:182-245)
    prefix = [
        (DDL_DROP_TABLE, cfg.table, "{}"),
        (DDL_DROP_DATABASE, TYPED_DATABASE, "{}"),
        (DDL_CREATE_DATABASE, TYPED_DATABASE, "{}"),
        (DDL_CREATE_TABLE, cfg.table, create_table_payload()),
    ]
    m = len(prefix)
    ddl = pa.StructArray.from_arrays(
        [pa.array([p[0] for p in prefix]), pa.array([p[1] for p in prefix]),
         pa.array([""] * m), pa.array([p[2] for p in prefix])],
        fields=list(DDL_STRUCT),
    )
    lsns = list(range(1, m + 1))
    tables.append(pa.table(
        {
            "lsn": pa.array(lsns, pa.int64()),
            "tx_id": pa.array([f"ddl:{l}" for l in lsns]),
            "op": pa.array([OP_DDL] * m),
            "table": pa.array([p[1] for p in prefix]),
            "before": nulls(m),
            "after": nulls(m),
            "ddl": ddl,
            "is_snapshot": pa.array([False] * m),
            "ingest_ts": pa.array(np.array(lsns, np.int64) + _EPOCH_MS,
                                  pa.timestamp("ms")),
            "schema_version": pa.array([0] * m, pa.int32()),
        },
        schema=schema,
    ))
    cursor = m + 1

    if n_base:
        bkeys = np.arange(n_base, dtype=np.int64)
        bver = np.ones(n_base, dtype=np.int64)
        blsn = np.arange(cursor, cursor + n_base, dtype=np.int64)
        tables.append(pa.table(
            {
                "lsn": pa.array(blsn),
                "tx_id": _join("binlog.000001:", _int_str(blsn)),
                "op": pa.array(np.full(n_base, OP_INSERT)),
                "table": pa.array([cfg.table] * n_base),
                "before": nulls(n_base),
                "after": _payload(bkeys, bver, np.ones(n_base, bool)),
                "ddl": pa.nulls(n_base, type=DDL_STRUCT),
                "is_snapshot": pa.array(np.ones(n_base, bool)),
                "ingest_ts": pa.array(blsn + _EPOCH_MS, pa.timestamp("ms")),
                "schema_version": pa.array(np.zeros(n_base, np.int32)),
            },
            schema=schema,
        ))
        cursor += n_base

    slsn = np.arange(cursor, cursor + n, dtype=np.int64)
    has_after = op != OP_DELETE
    has_before = op != OP_INSERT
    before_ver = np.where(op == OP_DELETE, version, version - 1)
    tables.append(pa.table(
        {
            "lsn": pa.array(slsn),
            "tx_id": _join("binlog.000002:", _int_str(slsn)),
            "op": pa.array(op),
            "table": pa.array([cfg.table] * n),
            "before": _payload(key_ids, before_ver, has_before),
            "after": _payload(key_ids, version, has_after),
            "ddl": pa.nulls(n, type=DDL_STRUCT),
            "is_snapshot": pa.array(np.zeros(n, bool)),
            "ingest_ts": pa.array(slsn + _EPOCH_MS, pa.timestamp("ms")),
            "schema_version": pa.array(np.zeros(n, np.int32)),
        },
        schema=schema,
    ))

    log = pa.concat_tables(tables)

    os.makedirs(out_dir, exist_ok=True)
    for old in os.listdir(out_dir):
        if old.startswith("seg-"):
            os.remove(os.path.join(out_dir, old))
    total = log.num_rows
    n_seg = max(1, min(cfg.n_segments, total))
    bounds = np.linspace(0, total, n_seg + 1).astype(np.int64)
    segs = []
    for i in range(n_seg):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi <= lo:
            continue
        fname = f"seg-{i:05d}.parquet"
        pq.write_table(log.slice(lo, hi - lo), os.path.join(out_dir, fname))
        segs.append(fname)

    meta = {
        "config": asdict(cfg),
        "schema_cols": schema_cols,
        "total_events": total,
        "max_lsn": int(log["lsn"][total - 1].as_py()),
        "segments": segs,
        "table": cfg.table,
    }
    tmp = meta_path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, meta_path)
    return meta


# ---------------------------------------------------------------------------
# oracle SQL + canonical comparison projection
# ---------------------------------------------------------------------------


def typed_oracle_sql(log_glob: str) -> str:
    """DuckDB LWW replay of the typed log with per-column decode exprs —
    byte-equivalent to replicate->final_state->canonical_batch."""
    cols = typed_columns()
    raw_select = ",\n         ".join(
        f'after.{c.name} AS {c.name}' for c in cols if c.name != "id"
    )
    final_exprs = ",\n       ".join(
        c.sql.replace("{c}", c.name) + f" AS {c.name}" for c in cols
        if c.name != "id"
    )
    return f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.id, before.id) AS id,
         {raw_select}
  FROM read_parquet('{log_glob}')
  WHERE op <> 'DDL'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT id,
       {final_exprs},
       lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def canonical_batch(batch: pa.Table) -> pa.Table:
    """Canonicalize a final-state batch of the typed lake for driver value
    comparison (same dtypes the oracle SQL produces)."""
    cols = {"id": batch["id"]}
    for c in typed_columns():
        if c.name == "id":
            continue
        arr = batch[c.name]
        cols[c.name] = c.canon(arr) if c.canon else arr
    cols["_sequence_num"] = batch["_sequence_num"]
    return pa.table(cols)
