"""Debezium-JSON envelope source — the reference's native wire format.

The reference consumes Debezium change events (SourceRecord envelopes with
``before`` / ``after`` row images, an ``op`` code and a ``source`` block —
MySqlRecordConsumer.java:209-225 reads exactly these fields; the op codes
``c``/``u``/``d``/``r`` and the ``source.snapshot`` flag are public Debezium
contract). This module lets a user feed the engine from JSONL files in that
envelope shape instead of the native Parquet log:

* ``write_debezium_jsonl(log_dir, out_dir)`` — export a Parquet event log
  as Debezium-envelope JSONL (fixture/interop writer; also the documented
  shape reference).
* ``read_debezium_jsonl(paths)`` — ``ray.data.read_json`` + one vectorized
  ``map_batches`` converting envelopes into the canonical event-log schema
  (model.event_log_schema).
* ``jsonl_to_segments(paths, seg_dir)`` — materialize a JSONL feed as
  Parquet log segments so ``run_replication`` (whose read path is pruned
  Parquet) can replay it with all fences/watermarks intact.

DDL events ride the envelope the way Debezium's schema-change topic does
(a ``ddl`` block next to ``source``); the structured payload mirrors the
engine's DDL struct rather than raw SQL text (SURVEY.md §2.3: structured
DDL by design).

Three source-position shapes are accepted per envelope:
* a direct integer ``pos`` (the engine's native lsn),
* MySQL binlog ``file`` + ``pos`` (+ ``row``/``event`` skip counts,
  ``gtid``/``gtids`` — MySqlConstantOffsetBackingStore.java:39-45) with
  GTID-preferred tx-id synthesis and the DROP_DATABASE
  mis-categorization workaround (MySqlRecordConsumer.java:190-195,
  299-307),
* SQL-Server composite hex ``change_lsn``/``commit_lsn``
  (SqlServerOffset.java:33-55),
* PostgreSQL textual WAL positions: a ``source.sequence`` JSON array of
  ``X/Y`` pg_lsn strings (the public Debezium postgres envelope; the
  reader takes the array's LAST element — the event's own position —
  through the PgLsn bridge) with the pg ``schema`` namespace preferred
  over ``db`` for table identity and numeric ``txId``,
* MongoDB oplog positions: BSON-timestamp ``sec`` + ``ord`` (the public
  Debezium mongodb connector's SourceInfo offset fields) through the
  MongoTs bridge, the table namespaced as ``db.collection`` (``rs`` is
  carried but not part of identity), and transaction identity from the
  multi-document-transaction fields ``lsid`` + ``txnNumber`` (joined
  ``lsid:txnNumber``, the connector's transaction-metadata id shape)
  with a ``mongo:<position>`` auto-commit token where absent — every
  oplog entry outside a multi-doc transaction is its own transaction,
* Oracle SCN positions: decimal-string ``scn`` + ``commit_scn`` (the
  public Debezium oracle connector's SourceInfo offset fields) through
  the identity OracleScn bridge, table identity namespaced by the
  Oracle ``schema`` (owning user — ``db`` is the PDB name) and the
  connector's opaque string ``txId`` passed through verbatim.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
from datetime import timezone

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..model import (
    DDL_STRUCT,
    OP_DDL,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    PAYLOAD_STRUCT,
    event_log_schema,
)
from ..state.offsets import (
    TRX_ID_SEP,
    Lsn,
    MongoTs,
    MySqlOffset,
    OracleScn,
    PgLsn,
)

#: engine op -> Debezium envelope op code (public Debezium contract:
#: c=create, u=update, d=delete, r=snapshot read)
_TO_DBZ = {OP_INSERT: "c", OP_UPDATE: "u", OP_DELETE: "d"}
_FROM_DBZ = {"c": OP_INSERT, "r": OP_INSERT, "u": OP_UPDATE, "d": OP_DELETE}

#: deterministic server uuid for MySQL-shaped fixture gtids
_FIXTURE_SERVER_UUID = "3E11FA47-71CA-11E1-9E33-C80AA9429562"


def _split_table(table: str) -> tuple[str, str]:
    db, _, name = table.partition(".")
    return (db, name) if name else ("", table)


def write_debezium_jsonl(log_dir: str, out_dir: str,
                         composite: bool = False,
                         mysql: bool = False,
                         postgres: bool = False,
                         mongo: bool = False,
                         oracle: bool = False) -> list[str]:
    """Export every ``seg-*.parquet`` log segment as a Debezium-envelope
    ``.jsonl`` file (one JSON envelope per line). Interop/fixture writer —
    runs on the driver; sized for test fixtures, not the 10^10 log.

    ``composite=True`` emits SQL-Server-shaped positions — hex
    ``change_lsn`` / ``commit_lsn`` pairs plus ``snapshot_completed``
    (SqlServerOffset.java:33-55) — instead of the integer ``pos``; the
    reader maps them back through the Lsn bridge.

    ``mysql=True`` emits MySQL-binlog-shaped positions — ``file`` +
    ``pos`` (+ ``row``/``event`` skip counts and a per-event ``gtid``,
    MySqlConstantOffsetBackingStore.java:39-45) with NO ``txId``: the
    reader must synthesize the transaction id GTID-first
    (MySqlRecordConsumer.java:190-195). The fixture gtid embeds the
    log's tx_id (``<server-uuid>:<tx_id>``) so tx identity — not just
    final state — round-trips verifiably.

    ``postgres=True`` emits Postgres-shaped positions — NO integer
    ``pos``/``lsn`` on the wire, only a ``sequence`` JSON array of two
    ``X/Y`` pg_lsn strings ([last commit position, event position], as
    the public Debezium postgres connector renders them), the table
    namespaced by pg ``schema`` (with ``db`` set to the database name,
    NOT the identity namespace) and a numeric ``txId``.

    ``mongo=True`` emits MongoDB-oplog-shaped positions — NO integer
    ``pos`` on the wire, only BSON-timestamp ``sec`` + ``ord`` fields
    (the public Debezium mongodb SourceInfo offset shape), the table
    carried as ``db`` + ``collection`` (no ``table`` key at all) with
    a constant ``rs`` replica-set name, and NO ``txId``: transaction
    identity rides the multi-document-transaction fields ``lsid`` +
    ``txnNumber``. The fixture lsid embeds the log's tx_id so tx
    identity round-trips verifiably (same trick as the mysql gtid)."""
    if sum((composite, mysql, postgres, mongo, oracle)) > 1:
        raise ValueError("pick ONE position shape: composite, mysql, "
                         "postgres, mongo or oracle")
    os.makedirs(out_dir, exist_ok=True)
    out_files = []
    for fname in sorted(os.listdir(log_dir)):
        if not fname.startswith("seg-") or not fname.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(log_dir, fname))
        max_lsn = int(pc.max(tbl["lsn"]).as_py()) if tbl.num_rows else 0
        prev_lsn = 0  # pg ``sequence``: [last commit position, event position]
        out = os.path.join(out_dir, fname.replace(".parquet", ".jsonl"))
        tmp = out + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            for row in tbl.to_pylist():
                db, name = _split_table(row["table"])
                if composite:
                    src = {
                        "db": db,
                        "table": name,
                        "change_lsn": str(Lsn.from_int(row["lsn"])),
                        # commit of the enclosing "transaction": the
                        # segment's last change (fixture semantics)
                        "commit_lsn": str(Lsn.from_int(max_lsn)),
                        "txId": row["tx_id"],
                        "snapshot": bool(row["is_snapshot"]),
                        "snapshot_completed": not bool(row["is_snapshot"]),
                        "schema_version": row["schema_version"],
                    }
                elif mysql:
                    off = MySqlOffset.from_int(row["lsn"])
                    src = {
                        "db": db,
                        "table": name,
                        "file": off.file,
                        "pos": off.pos,
                        "row": 0,
                        "event": 0,
                        "gtid": f"{_FIXTURE_SERVER_UUID}:{row['tx_id']}",
                        "snapshot": bool(row["is_snapshot"]),
                        "schema_version": row["schema_version"],
                    }
                elif mongo:
                    mts = MongoTs.from_int(row["lsn"])
                    # multi-doc-transaction identity: a REALISTIC lsid —
                    # base64 of a (deterministic) session UUID, exactly
                    # the opaque shape a live connector emits. Nothing
                    # downstream may parse it: the tx fence measures
                    # starts from the log, tokens are identity only.
                    lsid = base64.b64encode(hashlib.md5(
                        f"lsid-{row['tx_id']}".encode()).digest()).decode()
                    src = {
                        "rs": "rs0",
                        "db": db,
                        "collection": name,
                        "sec": mts.sec,
                        "ord": mts.ord,
                        "lsid": lsid,
                        "txnNumber": 1,
                        "snapshot": bool(row["is_snapshot"]),
                        "schema_version": row["schema_version"],
                    }
                elif oracle:
                    src = {
                        "db": "ORCLPDB1",
                        "schema": db,  # oracle namespaces tables by
                        # schema (owning user); db is the PDB name
                        "table": name,
                        # decimal-string SCNs (public Debezium oracle
                        # SourceInfo offset shape)
                        "scn": str(OracleScn.from_int(row["lsn"])),
                        "commit_scn": str(OracleScn.from_int(max_lsn)),
                        "txId": row["tx_id"],
                        "snapshot": bool(row["is_snapshot"]),
                        "schema_version": row["schema_version"],
                    }
                elif postgres:
                    tx = row["tx_id"]
                    src = {
                        "db": "postgres",
                        "schema": db,  # pg namespaces tables by schema
                        "table": name,
                        "sequence": json.dumps(
                            [str(PgLsn.from_int(prev_lsn)),
                             str(PgLsn.from_int(row["lsn"]))]),
                        "txId": (int(tx) if str(tx).isdigit() else tx),
                        "snapshot": bool(row["is_snapshot"]),
                        "schema_version": row["schema_version"],
                    }
                    prev_lsn = int(row["lsn"])
                else:
                    src = {
                        "db": db,
                        "table": name,
                        "pos": row["lsn"],
                        "txId": row["tx_id"],
                        "snapshot": bool(row["is_snapshot"]),
                        "schema_version": row["schema_version"],
                    }
                ts = row["ingest_ts"]
                if hasattr(ts, "timestamp"):
                    # stored timestamps are UTC wall-clock; a naive
                    # datetime's .timestamp() would apply the HOST zone
                    # and shift ts_ms on non-UTC machines
                    if ts.tzinfo is None:
                        ts = ts.replace(tzinfo=timezone.utc)
                    ts_ms = int(ts.timestamp() * 1000)
                else:
                    ts_ms = int(ts or 0)
                if row["op"] == OP_DDL:
                    env = {"source": src, "ts_ms": ts_ms, "ddl": row["ddl"]}
                else:
                    env = {
                        "op": ("r" if row["is_snapshot"]
                               else _TO_DBZ[row["op"]]),
                        "before": row["before"],
                        "after": row["after"],
                        "source": src,
                        "ts_ms": ts_ms,
                    }
                fh.write(json.dumps({"payload": env}) + "\n")
        os.replace(tmp, out)
        out_files.append(out)
    return out_files


def _to_struct(col, struct_type: pa.DataType) -> pa.Array:
    """Rebuild ``col`` (a struct array of possibly differing field order /
    inferred types, or an all-null column) as ``struct_type``, matching
    children by NAME and casting each to the declared type."""
    n = len(col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_struct(col.type):
        return pa.nulls(n, type=struct_type)
    have = {col.type.field(i).name for i in range(col.type.num_fields)}
    children = []
    for f in struct_type:
        if f.name in have:
            child = pc.struct_field(col, f.name)
            children.append(pc.cast(child, f.type))
        else:
            children.append(pa.nulls(n, type=f.type))
    null_mask = pc.is_null(col)
    return pa.StructArray.from_arrays(
        children, fields=list(struct_type),
        mask=null_mask.combine_chunks() if isinstance(null_mask, pa.ChunkedArray)
        else null_mask)


def _convert_envelopes(batch: pa.Table) -> pa.Table:
    """One vectorized pass: Debezium envelopes -> canonical event rows.

    Null-payload records are TOMBSTONES (``tombstones.on.delete`` —
    Debezium emits a null-value record after each delete so log-compacted
    topics drop the key); consumers discard them, and so does this
    ingest."""
    pay = batch["payload"]
    if isinstance(pay, pa.ChunkedArray):
        pay = pay.combine_chunks()
    if pay.null_count:
        batch = batch.filter(pc.is_valid(pay))
        pay = batch["payload"]
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
    src = pc.struct_field(pay, "source")
    have = {pay.type.field(i).name for i in range(pay.type.num_fields)}

    db = pc.cast(pc.struct_field(src, "db"), pa.string())
    src_names0 = {src.type.field(i).name
                  for i in range(src.type.num_fields)}
    if "schema" in src_names0:
        # Postgres namespaces tables by SCHEMA, not database (public
        # Debezium postgres envelope: db + schema + table) — prefer it
        # for the identity namespace where present
        sch = pc.cast(pc.struct_field(src, "schema"), pa.string())
        db = pc.if_else(
            pc.equal(pc.fill_null(sch, ""), ""), db, sch)
    name = (pc.cast(pc.struct_field(src, "table"), pa.string())
            if "table" in src_names0
            else pa.nulls(len(pay), type=pa.string()))
    if "collection" in src_names0:
        # MongoDB envelopes name the captured set ``collection`` and
        # carry no ``table`` key at all (public Debezium mongodb source
        # block: rs + db + collection); identity stays db.collection
        coll = pc.cast(pc.struct_field(src, "collection"), pa.string())
        name = pc.if_else(
            pc.equal(pc.fill_null(coll, ""), ""), name, coll)
    table = pc.if_else(
        pc.equal(pc.fill_null(db, ""), ""), name,
        pc.binary_join_element_wise(pc.fill_null(db, ""), name, "."))

    ddl = (_to_struct(pc.struct_field(pay, "ddl"), DDL_STRUCT)
           if "ddl" in have else pa.nulls(len(pay), type=DDL_STRUCT))
    if "ddl" in have:
        # real Debezium schema-change envelopes carry RAW SQL in the ddl
        # block; rewrite such rows to the engine's SQL route (op="SQL",
        # payload={"sql": ...}) — state/sqlddl.py parses them at registry
        # build (V14/V15 quoted-id + enum-escape semantics included)
        raw_ddl = pc.struct_field(pay, "ddl")
        if isinstance(raw_ddl, pa.ChunkedArray):
            raw_ddl = raw_ddl.combine_chunks()
        if (pa.types.is_struct(raw_ddl.type)
                and "sql" in {raw_ddl.type.field(i).name
                              for i in range(raw_ddl.type.num_fields)}):
            sql = pc.cast(pc.struct_field(raw_ddl, "sql"), pa.string())
            if pc.any(pc.is_valid(sql)).as_py():
                rows = ddl.to_pylist() if not isinstance(ddl, pa.ChunkedArray) \
                    else ddl.combine_chunks().to_pylist()
                for i, stmt in enumerate(sql.to_pylist()):
                    if stmt is None:
                        continue
                    cur = rows[i] or {}
                    # Debezium's AbstractDdlParser#signalDropDatabase bug
                    # mis-categorizes DROP DATABASE as CREATE_DATABASE;
                    # re-type from the statement text exactly as the
                    # reference does (MySqlRecordConsumer.java:299-307)
                    if (cur.get("op") == "CREATE_DATABASE"
                            and stmt.lstrip().upper()
                            .startswith("DROP DATABASE")):
                        rows[i] = {"op": "DROP_DATABASE",
                                   "table": cur.get("table") or "",
                                   "prev_table": "", "payload": "{}"}
                        continue
                    rows[i] = {"op": "SQL",
                               "table": cur.get("table") or "",
                               "prev_table": "",
                               "payload": json.dumps({"sql": stmt})}
                ddl = pa.array(rows, type=DDL_STRUCT)
    is_ddl = pc.is_valid(ddl)

    if "op" in have:
        raw_op = pc.cast(pc.struct_field(pay, "op"), pa.string())
    else:
        raw_op = pa.nulls(len(pay), type=pa.string())
    op = pc.case_when(
        pc.make_struct(
            is_ddl,
            pc.equal(raw_op, "u"),
            pc.equal(raw_op, "d"),
        ),
        OP_DDL, OP_UPDATE, OP_DELETE, OP_INSERT,
    )
    snap_src = pc.cast(pc.struct_field(src, "snapshot"), pa.bool_())
    is_snapshot = pc.or_kleene(
        pc.fill_null(snap_src, False), pc.equal(pc.fill_null(raw_op, ""), "r"))
    is_snapshot = pc.and_(is_snapshot, pc.invert(is_ddl))

    before = (_to_struct(pc.struct_field(pay, "before"), PAYLOAD_STRUCT)
              if "before" in have else pa.nulls(len(pay), type=PAYLOAD_STRUCT))
    after = (_to_struct(pc.struct_field(pay, "after"), PAYLOAD_STRUCT)
             if "after" in have else pa.nulls(len(pay), type=PAYLOAD_STRUCT))

    src_names = {src.type.field(i).name for i in range(src.type.num_fields)}
    sv = (pc.cast(pc.struct_field(src, "schema_version"), pa.int32())
          if "schema_version" in src_names
          else pa.nulls(len(pay), type=pa.int32()))
    lsn = (pc.cast(pc.struct_field(src, "pos"), pa.int64())
           if "pos" in src_names else pa.nulls(len(pay), type=pa.int64()))
    if "file" in src_names:
        # MySQL binlog positions: (file, pos) -> the engine's int64 via
        # the order-preserving bridge (file seq << 32 | pos) — a bare
        # ``pos`` with no file stays a direct engine lsn (above)
        fl = pc.struct_field(src, "file")
        if pc.any(pc.is_valid(fl)).as_py():
            po = (pc.struct_field(src, "pos").to_pylist()
                  if "pos" in src_names else [None] * len(pay))
            ints = pa.array(
                [MySqlOffset(file=f, pos=p).to_int()
                 if f is not None and p is not None else None
                 for f, p in zip(fl.to_pylist(), po)], pa.int64())
            lsn = pc.if_else(pc.is_valid(ints), ints, lsn)
    if "sequence" in src_names:
        # Postgres textual WAL positions: sequence = JSON array of
        # pg_lsn "X/Y" strings; the LAST element is the event's own
        # position (public Debezium postgres envelope) — bridge it
        # through PgLsn where no other position shape resolved
        sq = pc.cast(pc.struct_field(src, "sequence"), pa.string())
        if pc.any(pc.is_valid(sq)).as_py():
            def _pg(x):
                if x is None:
                    return None
                try:
                    arr = json.loads(x)
                except ValueError:
                    return None
                if not isinstance(arr, list) or not arr:
                    return None
                v = PgLsn.parse(arr[-1])
                return v.to_int() if v.is_available else None
            ints = pa.array([_pg(x) for x in sq.to_pylist()], pa.int64())
            lsn = pc.if_else(pc.is_valid(lsn), lsn, ints)
    if "sec" in src_names:
        # MongoDB BSON-timestamp positions: (sec, ord) -> the engine's
        # int64 via the packed 64-bit MongoTs bridge — order-preserving
        # by the BSON timestamp comparison rule (sec-major)
        se = pc.struct_field(src, "sec")
        if pc.any(pc.is_valid(se)).as_py():
            od = (pc.struct_field(src, "ord").to_pylist()
                  if "ord" in src_names else [None] * len(pay))
            ints = pa.array(
                [MongoTs.parse(s, o).to_int()
                 if s is not None and o is not None else None
                 for s, o in zip(se.to_pylist(), od)], pa.int64())
            lsn = pc.if_else(pc.is_valid(lsn), lsn, ints)
    if "scn" in src_names:
        # Oracle SCN positions: decimal-string system change numbers
        # (the public Debezium oracle connector's SourceInfo offset
        # fields) -> the engine's int64 via the identity OracleScn
        # bridge; SCN order IS numeric order
        sc = pc.struct_field(src, "scn")
        if pc.any(pc.is_valid(sc)).as_py():
            def _ora(x):
                if x is None:
                    return None
                v = OracleScn.parse(x)
                return v.to_int() if v.is_available else None
            ints = pa.array([_ora(x) for x in sc.to_pylist()], pa.int64())
            lsn = pc.if_else(pc.is_valid(lsn), lsn, ints)
    if "change_lsn" in src_names:
        # composite SQL-Server positions: change_lsn hex -> the engine's
        # int64 via the byte-order-preserving Lsn bridge
        # (SqlServerOffset.java:33-94; ordering is change-lsn order)
        ch = pc.struct_field(src, "change_lsn")
        if pc.any(pc.is_valid(ch)).as_py():
            ints = pa.array(
                [Lsn.parse(x).to_int() if x is not None else None
                 for x in ch.to_pylist()],
                pa.int64(),
            )
            lsn = pc.if_else(pc.is_valid(lsn), lsn, ints)
    tx = (pc.cast(pc.struct_field(src, "txId"), pa.string())
          if "txId" in src_names else pa.nulls(len(pay), type=pa.string()))
    if "gtid" in src_names or "file" in src_names:
        # GTID-preferred tx-id synthesis (MySqlRecordConsumer.java:190-195):
        # the event's gtid when present, else "file:pos" — applied only
        # where the feed carries no explicit txId
        gt = (pc.cast(pc.struct_field(src, "gtid"), pa.string())
              if "gtid" in src_names else pa.nulls(len(pay), pa.string()))
        tx = pc.if_else(pc.is_valid(tx), tx, gt)
        if "file" in src_names:
            fl = pc.fill_null(
                pc.cast(pc.struct_field(src, "file"), pa.string()), "")
            po = pc.fill_null(pc.cast(
                pc.struct_field(src, "pos")
                if "pos" in src_names else pa.nulls(len(pay)),
                pa.string()), "")
            synth = pc.binary_join_element_wise(fl, po, TRX_ID_SEP)
            has_filepos = pc.not_equal(fl, "")
            tx = pc.if_else(pc.or_kleene(pc.is_valid(tx),
                                         pc.invert(has_filepos)),
                            tx, synth)
    if "lsid" in src_names or "sec" in src_names:
        # MongoDB transaction identity: events of one multi-document
        # transaction share (lsid, txnNumber) — join them as the
        # connector's transaction-metadata id shape ``lsid:txnNumber``.
        # An oplog entry OUTSIDE a multi-doc transaction (no lsid) is
        # its own auto-commit transaction: token ``mongo:<position>``
        # in the engine's ``prefix:tx-start`` convention, so the
        # tx-boundary fence parses its start as the event's own lsn.
        if "lsid" in src_names:
            ls = pc.fill_null(
                pc.cast(pc.struct_field(src, "lsid"), pa.string()), "")
            tn = pc.fill_null(pc.cast(
                pc.struct_field(src, "txnNumber")
                if "txnNumber" in src_names else pa.nulls(len(pay)),
                pa.string()), "1")
            synth = pc.binary_join_element_wise(ls, tn, TRX_ID_SEP)
            has_lsid = pc.not_equal(ls, "")
            tx = pc.if_else(pc.or_kleene(pc.is_valid(tx),
                                         pc.invert(has_lsid)),
                            tx, synth)
        if "sec" in src_names:
            se = pc.struct_field(src, "sec")
            if pc.any(pc.is_valid(se)).as_py():
                auto = pc.binary_join_element_wise(
                    "mongo", pc.cast(lsn, pa.string()), TRX_ID_SEP)
                tx = pc.if_else(
                    pc.or_kleene(pc.is_valid(tx), pc.is_null(lsn)),
                    tx, auto)
    if "commit_lsn" in src_names:
        # SQL Server synthesizes the transaction id from the COMMIT lsn
        # when the feed carries none (SqlServerRecordConsumer.java:205-222)
        tx = pc.if_else(
            pc.is_valid(tx), tx,
            pc.cast(pc.struct_field(src, "commit_lsn"), pa.string()))
    out = pa.table(
        {
            "lsn": lsn,
            "tx_id": tx,
            "op": op,
            "table": table,
            "before": before,
            "after": after,
            "ddl": ddl,
            "is_snapshot": is_snapshot,
            "ingest_ts": pc.cast(pc.struct_field(pay, "ts_ms"),
                                 pa.timestamp("ms")),
            "schema_version": pc.fill_null(sv, 0),
        },
        schema=event_log_schema(),
    )
    return out


def _json_safe(t: pa.DataType) -> pa.DataType:
    """Arrow's JSON parser can't target large_string; downgrade recursively
    (the conversion pass casts children back to the declared types)."""
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_struct(t):
        return pa.struct([pa.field(t.field(i).name, _json_safe(t.field(i).type))
                          for i in range(t.num_fields)])
    return t


def envelope_schema() -> pa.Schema:
    """Explicit parse schema for the JSONL feed — inference over null-heavy
    envelope columns (a file of deletes has only null ``after``) is
    unstable, so the parser is always given the full shape."""
    src = pa.struct([
        pa.field("db", pa.string()),
        pa.field("table", pa.string()),
        pa.field("pos", pa.int64()),
        # MySQL binlog positions (MySqlConstantOffsetBackingStore.java:39-45)
        # — file+pos locate the event; row/event are intra-position skip
        # counts; gtid/gtids drive GTID-preferred tx-id synthesis
        pa.field("file", pa.string()),
        pa.field("row", pa.int64()),
        pa.field("event", pa.int64()),
        pa.field("gtid", pa.string()),
        pa.field("gtids", pa.string()),
        # MongoDB-shaped positions and identity (public Debezium mongodb
        # SourceInfo): BSON-timestamp sec+ord locate the oplog entry;
        # rs+collection name the captured set; lsid+txnNumber carry
        # multi-document-transaction identity
        pa.field("rs", pa.string()),
        pa.field("collection", pa.string()),
        pa.field("sec", pa.int64()),
        pa.field("ord", pa.int64()),
        pa.field("lsid", pa.string()),
        pa.field("txnNumber", pa.int64()),
        # SQL-Server-shaped composite positions (SqlServerOffset.java:33-55)
        # — either pos, file+pos, change_lsn OR sec+ord must be present
        # Oracle-shaped positions (public Debezium oracle SourceInfo):
        # decimal-string SCNs; identity namespaced by ``schema``
        pa.field("scn", pa.string()),
        pa.field("commit_scn", pa.string()),
        pa.field("change_lsn", pa.string()),
        pa.field("commit_lsn", pa.string()),
        pa.field("snapshot_completed", pa.bool_()),
        pa.field("txId", pa.string()),
        pa.field("snapshot", pa.bool_()),
        pa.field("schema_version", pa.int32()),
    ])
    payload = pa.struct([
        pa.field("op", pa.string()),
        pa.field("before", _json_safe(PAYLOAD_STRUCT)),
        pa.field("after", _json_safe(PAYLOAD_STRUCT)),
        pa.field("source", src),
        pa.field("ts_ms", pa.int64()),
        # structured ddl fields OR a raw `sql` statement (Debezium's
        # schema-change-topic shape) — both accepted
        pa.field("ddl", pa.struct(
            list(_json_safe(DDL_STRUCT)) + [pa.field("sql", pa.string())])),
    ])
    return pa.schema([pa.field("payload", payload)])


def read_debezium_jsonl(paths: str | list[str]) -> "ray.data.Dataset":
    """Debezium-envelope JSONL -> Dataset in the canonical event-log schema.
    The JSON parse runs distributed in read tasks; the envelope conversion
    is one zero-copy-in Arrow ``map_batches`` pass."""
    import pyarrow.json as pajson
    import ray.data

    ds = ray.data.read_json(
        paths,
        parse_options=pajson.ParseOptions(explicit_schema=envelope_schema()),
    )
    return ds.map_batches(_convert_envelopes, batch_format="pyarrow",
                          zero_copy_batch=True)


def jsonl_to_segments(paths: str | list[str], seg_dir: str,
                      rows_per_segment: int = 1 << 20) -> dict:
    """Materialize a Debezium JSONL feed as Parquet log segments (sorted by
    lsn within each written file) so the Parquet-native replication path —
    pruned reads, footer watermark short-circuits — applies unchanged.
    Returns the meta dict written alongside (same contract as the
    generators').

    Fully distributed: read tasks parse envelopes and WRITE segments
    directly (named by their lsn range, so a replayed task overwrites
    rather than duplicates); the driver only assembles ``meta.json`` from
    the per-task stats rows — no event ever crosses the driver. Segment
    order on disk is irrelevant to replication (per-key lsn order is
    what matters) and the footer-stats pushdowns key off lsn ranges."""
    import ray.data  # noqa: F401  (read path initializes Ray Data)

    os.makedirs(seg_dir, exist_ok=True)
    # seg_dir is owned by this materialization: stale segments from a
    # crashed earlier run (possibly different batching -> different names)
    # would otherwise double-count events next to this run's files
    for f in os.listdir(seg_dir):
        if f.startswith("seg-"):
            os.remove(os.path.join(seg_dir, f))
    ds = read_debezium_jsonl(paths)

    def write_seg(tbl: pa.Table) -> pa.Table:
        stats_schema = pa.schema(
            [("file", pa.string()), ("rows", pa.int64()),
             ("max_lsn", pa.int64())])
        if tbl.num_rows == 0:
            return stats_schema.empty_table()
        tbl = tbl.sort_by("lsn")
        lo = int(tbl["lsn"][0].as_py())
        hi = int(tbl["lsn"][-1].as_py())
        fname = f"seg-{lo:020d}-{hi:020d}-{tbl.num_rows}.parquet"
        out = os.path.join(seg_dir, fname)
        tmp = out + f".tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, out)
        return pa.table({"file": [fname], "rows": [tbl.num_rows],
                         "max_lsn": [hi]}, schema=stats_schema)

    # one retry: a cold Ray worker occasionally hits a transient fsspec
    # circular-import race inside read_json's first task. The failed
    # attempt's partial segments must be swept first — re-execution may
    # batch blocks differently, so its segment NAMES (lsn-range + row
    # count) need not overwrite the leftovers, and replication reads
    # the seg-* glob (the startup sweep above guards the same hazard
    # across process crashes).
    for attempt in (1, 2):
        try:
            stats = ds.map_batches(
                write_seg, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=rows_per_segment,
            ).take_all()
            break
        except Exception:
            if attempt == 2:
                raise
            for f in os.listdir(seg_dir):
                if f.startswith("seg-"):
                    os.remove(os.path.join(seg_dir, f))
            ds = read_debezium_jsonl(paths)
    meta = {"total_events": int(sum(r["rows"] for r in stats)),
            "max_lsn": int(max((r["max_lsn"] for r in stats), default=0)),
            "segments": sorted(r["file"] for r in stats),
            "source_format": "debezium-jsonl"}
    tmp = os.path.join(seg_dir, f"meta.json.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, os.path.join(seg_dir, "meta.json"))
    return meta


TAIL_STATE = "jsonl_tail.json"


def _tail_tag(fname: str) -> str:
    import hashlib

    return hashlib.md5(os.path.basename(fname).encode()).hexdigest()[:10]


def tail_jsonl_segments(jsonl_dir: str, seg_dir: str,
                        rows_per_segment: int = 1 << 20) -> dict:
    """INCREMENTAL JSONL -> segment conversion: bring ``seg_dir`` current
    with a GROWING Debezium JSONL feed directory, converting only files
    that are new or have grown since the last call — the tail-mode
    counterpart of :func:`jsonl_to_segments` (which wipes and rebuilds).

    Contract and crash story:

    * Each source file's segments carry a per-file tag in their name
      (``seg-j<md5(fname)>-<lo>-<hi>-<n>.parquet``), so re-converting a
      file is IDEMPOTENT regardless of Ray's block batching: the file's
      old segments are deleted first, then the whole file converts
      fresh (tmp+rename). A crash between the deletes/writes and the
      state commit re-runs the same per-file conversion harmlessly.
    * A file is re-converted whenever its byte size differs from the
      recorded one — append-grown actives and newly rotated files both
      converge; an untouched file costs one ``stat``. Feeds should
      rotate (bounded file sizes), else each poll re-reads the active
      file; rotation is the normal Debezium-to-file layout.
    * Single writer: run from one process (the follow loop driver).
      Conversion happens between replication polls, so a rewrite of an
      already-applied lsn range never races a reader; the replication
      watermark makes the re-applied prefix a no-op.
    * ``meta.json`` is rebuilt cumulatively from the per-file state so
      the replay path's footer fast path (``log_max_lsn``) stays valid.

    Returns the cumulative meta dict (total_events, max_lsn, segments,
    plus ``converted_files`` for observability).
    """
    import glob as _g

    import ray.data  # noqa: F401  (read path initializes Ray Data)

    os.makedirs(seg_dir, exist_ok=True)
    spath = os.path.join(seg_dir, TAIL_STATE)
    state: dict = {"files": {}}
    if os.path.exists(spath):
        with open(spath) as fh:
            state = json.load(fh)
    else:
        stale = [f for f in os.listdir(seg_dir) if f.startswith("seg-")]
        if stale:
            raise ValueError(
                f"{seg_dir} holds {len(stale)} segments but no tail state "
                f"({TAIL_STATE}) — tail mode owns its segment dir; point "
                "it at a fresh directory")

    feed = sorted(
        f for f in os.listdir(jsonl_dir) if f.endswith(".jsonl"))
    todo: list[tuple[str, int]] = []
    for fname in feed:
        size = os.path.getsize(os.path.join(jsonl_dir, fname))
        rec = state["files"].get(fname)
        if rec is not None and rec["size"] == size:
            continue
        todo.append((fname, size))
    converted = [f for f, _ in todo]

    if todo:
        # ONE Ray Data job converts every new/grown file (a per-file job
        # would pay the dataset-launch fixed cost per file — measured to
        # dominate follow-poll latency); each row carries its source
        # file (include_paths) so the per-file segment tags, stats and
        # idempotence contract are unchanged
        import ray.data as _rd

        def _sweep():
            for fname, _ in todo:
                tag = _tail_tag(fname)
                for old in _g.glob(
                        os.path.join(seg_dir, f"seg-j{tag}-*.parquet")):
                    os.remove(old)

        def _read():
            import pyarrow.json as pajson

            return _rd.read_json(
                [os.path.join(jsonl_dir, f) for f, _ in todo],
                parse_options=pajson.ParseOptions(
                    explicit_schema=envelope_schema()),
                include_paths=True,
            )

        def convert(batch: pa.Table) -> pa.Table:
            # drop tombstones (null payload) BEFORE extracting the
            # per-row source column: _convert_envelopes filters them
            # internally, and an unfiltered __src would no longer align
            # with the converted rows
            pay = batch["payload"]
            if isinstance(pay, pa.ChunkedArray):
                pay = pay.combine_chunks()
            if pay.null_count:
                batch = batch.filter(pc.is_valid(pay))
            src = pc.cast(batch["path"], pa.string())
            out = _convert_envelopes(batch.drop_columns(["path"]))
            return out.append_column("__src", src)

        def write_seg(tbl: pa.Table) -> pa.Table:
            stats_schema = pa.schema(
                [("src", pa.string()), ("file", pa.string()),
                 ("rows", pa.int64()), ("max_lsn", pa.int64())])
            rows = []
            for src in pc.unique(tbl["__src"]).to_pylist():
                sub = (tbl.filter(pc.equal(tbl["__src"], src))
                       .drop_columns(["__src"]).sort_by("lsn"))
                if sub.num_rows == 0:
                    continue
                fname = os.path.basename(src)
                tag = _tail_tag(fname)
                lo = int(sub["lsn"][0].as_py())
                hi = int(sub["lsn"][-1].as_py())
                # name by CONTENT DIGEST, not (lo, hi, rows): a snapshot
                # feed where every event carries one offset yields
                # blocks with identical lsn range and count — a
                # count-based name would overwrite one block with
                # another and silently drop events. The digest is
                # deterministic, so a retried task still overwrites its
                # own file (at-least-once safe).
                import hashlib
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, sub.schema) as w:
                    w.write_table(sub)
                dig = hashlib.md5(
                    sink.getvalue().to_pybytes()).hexdigest()[:12]
                out_name = (f"seg-j{tag}-{lo:020d}-{hi:020d}-"
                            f"{dig}.parquet")
                out = os.path.join(seg_dir, out_name)
                tmp = out + f".tmp.{os.getpid()}"
                pq.write_table(sub, tmp)
                os.replace(tmp, out)
                rows.append((fname, out_name, sub.num_rows, hi))
            if not rows:
                return stats_schema.empty_table()
            return pa.table({k: [r[i] for r in rows]
                             for i, k in enumerate(
                                 ("src", "file", "rows", "max_lsn"))},
                            schema=stats_schema)

        _sweep()
        for attempt in (1, 2):  # same transient-import retry as batch path
            try:
                stats = (_read()
                         .map_batches(convert, batch_format="pyarrow",
                                      zero_copy_batch=True)
                         .map_batches(write_seg, batch_format="pyarrow",
                                      zero_copy_batch=True,
                                      batch_size=rows_per_segment)
                         .take_all())
                break
            except Exception:
                if attempt == 2:
                    raise
                _sweep()
        by_src: dict[str, list] = {}
        for r in stats:
            by_src.setdefault(r["src"], []).append(r)
        for fname, size in todo:
            rs = by_src.get(fname, [])
            state["files"][fname] = {
                "size": size,
                "rows": int(sum(r["rows"] for r in rs)),
                "max_lsn": int(max((r["max_lsn"] for r in rs), default=0)),
                "segments": sorted(r["file"] for r in rs),
            }

    meta = {
        "total_events": int(sum(r["rows"]
                                for r in state["files"].values())),
        "max_lsn": int(max((r["max_lsn"]
                            for r in state["files"].values()), default=0)),
        "segments": sorted(s for r in state["files"].values()
                           for s in r["segments"]),
        "source_format": "debezium-jsonl-tail",
    }
    tmp = spath + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, spath)
    tmpm = os.path.join(seg_dir, f"meta.json.tmp.{os.getpid()}")
    with open(tmpm, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmpm, os.path.join(seg_dir, "meta.json"))
    return dict(meta, converted_files=converted)


def follow_debezium_jsonl(jsonl_dir: str, seg_dir: str, lake_dir: str,
                          **follow_kwargs) -> dict:
    """Continuous replication straight off a growing Debezium JSONL feed:
    every poll first brings ``seg_dir`` current with
    :func:`tail_jsonl_segments`, then drains it into the lake — the
    native-connector lifecycle (EventReader.start/stop tailing a live
    wire, MySqlEventReader.java:85-185) over the file-based wire format.
    Accepts every :func:`~..pipelines.replicate.follow_replication`
    keyword (poll cadence, stop paths, post-commit hooks)."""
    from ..pipelines.replicate import follow_replication

    return follow_replication(
        seg_dir, lake_dir,
        pre_poll=lambda: tail_jsonl_segments(jsonl_dir, seg_dir),
        **follow_kwargs)
