"""Snapshot bootstrap from an EXISTING Parquet table.

The reference's ``replicateExistingData=true`` path (snapshot mode
``initial``, MySqlEventReader.java:85-174 at :126): dump the source
table's current rows as snapshot INSERT events, then tail the live
wire. Here the "source table" is any Parquet dataset of the governed
input shape ``(repo, path, commit, lang, content)`` (BASELINE.json
input_hint; an optional ``stars`` int64 column is carried if present)
— this module converts it into engine log segments so the standard
replication path replays it:

* a DDL prefix segment (CREATE_DATABASE + CREATE_TABLE with schema and
  primary key — the golden snapshot prefix, minus the DROPs a fresh
  lake doesn't need);
* every row as an ``is_snapshot`` INSERT sharing ONE offset — the
  reference's snapshot semantics (all snapshot events carry the same
  offset, so a restart mid-snapshot re-dumps from scratch and the
  resume fence drops the whole snapshot once the watermark passes it;
  SURVEY.md §2.7). One event per primary key (base-table uniqueness)
  keeps per-key LWW well-defined at the shared position.

Continuing with a live feed afterwards needs NO special wiring: point
``run_replication`` / ``follow_debezium_jsonl`` at the live feed's own
segment dir with positions past the snapshot offset — the lake's
watermark fences and persisted registry make the handoff exactly-once.

Fully distributed: read tasks write segments directly (deterministic
names keyed by batch content, so a retried task overwrites rather than
duplicates); the driver assembles ``meta.json`` from per-task stats.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..model import (
    DEFAULT_DATABASE,
    DEFAULT_TABLE,
    OP_DDL,
    OP_INSERT,
    PAYLOAD_STRUCT,
    event_log_schema,
)

#: the snapshot DDL prefix occupies lsns 1..2; every data row shares 3.
SNAPSHOT_LSN = 3

_BASE_COLS = ("repo", "path", "commit", "lang", "content")


def _ddl_prefix_segment(table: str, has_stars: bool = False) -> pa.Table:
    """CREATE_DATABASE + CREATE_TABLE (schema + PK) at lsns 1..2 — the
    golden snapshot prefix for a fresh target (gen.py writes the full
    DROP+CREATE sequence; a bootstrap into a fresh lake needs only the
    CREATEs, and first-seen synthesis would cover even their absence)."""
    from ..model import DDL_CREATE_DATABASE, DDL_CREATE_TABLE, DDL_STRUCT

    cols = [["repo", "string"], ["path", "string"], ["commit", "string"],
            ["lang", "string"], ["content", "large_string"]]
    if has_stars:
        cols.append(["stars", "int64"])
    schema_json = json.dumps({"columns": cols,
                              "primary_key": ["repo", "path"]})
    ops = [DDL_CREATE_DATABASE, DDL_CREATE_TABLE]
    tbls = [DEFAULT_DATABASE, table]
    ddl = pa.StructArray.from_arrays(
        [pa.array(ops), pa.array(tbls), pa.array(["", ""]),
         pa.array(["{}", schema_json])],
        fields=list(DDL_STRUCT))
    return pa.table({
        "lsn": pa.array([1, 2], pa.int64()),
        "tx_id": pa.array(["ddl:1", "ddl:2"]),
        "op": pa.array([OP_DDL] * 2),
        "table": pa.array(tbls),
        "before": pa.array([None, None], PAYLOAD_STRUCT),
        "after": pa.array([None, None], PAYLOAD_STRUCT),
        "ddl": ddl,
        "is_snapshot": pa.array([False, False]),
        "ingest_ts": pa.array([1, 2], pa.timestamp("ms")),
        "schema_version": pa.array([0, 0], pa.int32()),
    }, schema=event_log_schema())


def bootstrap_snapshot_segments(parquet_path: str, seg_dir: str,
                                *, table: str = DEFAULT_TABLE,
                                rows_per_segment: int = 1 << 20) -> dict:
    """Materialize ``parquet_path`` (file or directory of the governed
    input shape) as snapshot log segments under ``seg_dir``. Returns the
    meta dict (same contract as the generators'). ``seg_dir`` must hold
    no segments yet — a bootstrap owns a fresh directory."""
    import numpy as np
    import ray.data

    os.makedirs(seg_dir, exist_ok=True)
    if any(f.startswith("seg-") for f in os.listdir(seg_dir)):
        raise ValueError(f"{seg_dir} already holds segments — bootstrap "
                         "owns a fresh directory")

    ds = ray.data.read_parquet(parquet_path)
    have = set(ds.schema().names)
    missing = [c for c in _BASE_COLS if c not in have]
    if missing:
        raise ValueError(f"bootstrap table lacks required columns "
                         f"{missing} (governed shape: {_BASE_COLS})")
    has_stars = "stars" in have

    # every bootstrap row shares SNAPSHOT_LSN and one tx token, so LWW
    # has no tiebreaker among duplicate keys — final state would depend
    # on block order. Enforce the 'one event per primary key' contract
    # up front with an exact distributed count over the key column only.
    import pyarrow.compute as pc

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.binary_join_element_wise(
            pc.cast(t["repo"], pa.string()),
            pc.cast(t["path"], pa.string()), "\x1f")})

    dup = (ds.map_batches(keyed, batch_format="pyarrow")
           .groupby("k").count()
           .filter(lambda r: r["count()"] > 1).take(1))
    if dup:
        k = dup[0]["k"].replace("\x1f", ", ")
        raise ValueError(
            f"bootstrap table holds duplicate (repo, path) keys "
            f"(e.g. {k!r}) — a snapshot must carry one row per primary "
            "key; de-duplicate the table first")

    pq.write_table(_ddl_prefix_segment(table, has_stars),
                   os.path.join(seg_dir, "seg-00000-ddl.parquet"))

    def write_seg(tbl: pa.Table) -> pa.Table:
        stats_schema = pa.schema(
            [("file", pa.string()), ("rows", pa.int64())])
        n = tbl.num_rows
        if n == 0:
            return stats_schema.empty_table()
        fields = {
            "repo": tbl["repo"].combine_chunks().cast(pa.string()),
            "path": tbl["path"].combine_chunks().cast(pa.string()),
            "commit": tbl["commit"].combine_chunks().cast(pa.string()),
            "lang": tbl["lang"].combine_chunks().cast(pa.string()),
            "content": tbl["content"].combine_chunks().cast(
                pa.large_string()),
            "stars": (tbl["stars"].combine_chunks().cast(pa.int64())
                      if has_stars else pa.nulls(n, pa.int64())),
            "language": pa.nulls(n, pa.string()),
        }
        after = pa.StructArray.from_arrays(
            [fields[f.name] for f in PAYLOAD_STRUCT],
            fields=list(PAYLOAD_STRUCT))
        nulls_payload = pa.array([None] * n, PAYLOAD_STRUCT)
        from ..model import DDL_STRUCT

        lsns = np.full(n, SNAPSHOT_LSN, dtype=np.int64)
        out = pa.table({
            "lsn": pa.array(lsns),
            "tx_id": pa.array([f"snapshot:{SNAPSHOT_LSN}"] * n),
            "op": pa.array([OP_INSERT] * n),
            "table": pa.array([table] * n),
            "before": nulls_payload,
            "after": after,
            "ddl": pa.array([None] * n, DDL_STRUCT),
            "is_snapshot": pa.array(np.ones(n, bool)),
            "ingest_ts": pa.array(lsns, pa.timestamp("ms")),
            "schema_version": pa.array(np.zeros(n, np.int32)),
        }, schema=event_log_schema())
        # deterministic per-batch name: a retried task overwrites its own
        # file instead of duplicating events
        key = hashlib.md5(
            (str(tbl["repo"][0]) + "\x1f" + str(tbl["path"][0]) + "\x1f"
             + str(tbl["repo"][-1]) + "\x1f" + str(tbl["path"][-1])
             + f"\x1f{n}").encode()).hexdigest()[:12]
        fname = f"seg-snap-{key}-{n}.parquet"
        fpath = os.path.join(seg_dir, fname)
        tmp = fpath + f".tmp.{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, fpath)
        return pa.table({"file": [fname], "rows": [n]},
                        schema=stats_schema)

    stats = ds.map_batches(write_seg, batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=rows_per_segment).take_all()
    total = int(sum(r["rows"] for r in stats))
    meta = {
        "total_events": total + 2,  # + the DDL prefix
        "dml_events": total,
        "ddl_events": 2,
        "max_lsn": SNAPSHOT_LSN if total else 2,
        "segments": sorted(["seg-00000-ddl.parquet"]
                           + [r["file"] for r in stats]),
        "table": table,
        "snapshot_shared_lsn": SNAPSHOT_LSN if total else None,
        "source_format": "parquet-bootstrap",
    }
    tmp = os.path.join(seg_dir, f"meta.json.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, os.path.join(seg_dir, "meta.json"))
    return meta
