"""Lake → Debezium-wire relay: publish a replicated lake AS a CDC feed.

The engine reads five public Debezium wire shapes
(``sources/debezium_json.py``); this module writes the opposite
direction — the CDC *outbox* / downstream-relay pattern: any consumer
that speaks the Debezium envelope (including this engine itself) can
subscribe to a lake instead of the original database.

* ``relay_snapshot_jsonl(lake, out, as_of_lsn=...)`` — the lake's live
  rows AS OF a watermark as snapshot ``op='r'`` envelopes all sharing
  ONE position (the reference's snapshot-offset semantics,
  MySqlEventReader.java:126 / SURVEY.md §2.7: a mid-snapshot restart
  re-dumps from scratch and the resume fence drops the whole snapshot
  once the watermark passes it), prefixed by CREATE_DATABASE +
  CREATE_TABLE DDL envelopes derived from the lake's own persisted
  schema registry (final post-evolution schema — the consumer starts at
  the current shape, not the source's DDL history).
* ``relay_changes_jsonl(lake, out, from_lsn)`` — the change data feed
  between two retained versions (``history=True`` lakes) as
  ``c``/``u``/``d`` envelopes. Creates/updates carry their TRUE source
  position (the key's winning ``_sequence_num``) and provenance
  (``txId`` = the winning event's tx id, ``ts_ms`` = its ingest time).
  The CDF collapses each key's history, so a delete's own position is
  not retained — deletes ride at the feed horizon (``to_lsn``), which
  applies the tombstone identically under per-key LWW for any consumer
  synced at/after ``from_lsn``.

Round-trip contract (gated hash-exact by ``cdc_wire_relay_roundtrip``):
snapshot at v0 + changes v0→v1, ingested back through
``jsonl_to_segments`` + ``run_replication`` into a FRESH lake, equals
the source lake's final state.

Fully distributed: one writer task per Ray block with content-keyed
deterministic file names (a retried task overwrites its own file — the
bootstrap-writer pattern), tmp+rename; the driver writes only the tiny
DDL prefix and the relay manifest. No event ever crosses the driver.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import json
import os
from datetime import timezone

import pyarrow as pa

from ..model import (
    PAYLOAD_STRUCT,
    ROW_ID,
    SEQUENCE_NUM,
    SOURCE_TIMESTAMP,
)

_META = "relay.json"

#: the wire's declared row-image shape (sources/debezium_json.py
#: envelope_schema parses before/after into exactly this struct): the
#: relay emits only these fields — DERIVED lake columns (content_sha)
#: are recomputed by the consumer's own normalize, and bookkeeping
#: columns ride the source block (pos/txId/ts_ms), not the image
_WIRE_FIELDS = {f.name for f in PAYLOAD_STRUCT}


def _split_table(table: str) -> tuple[str, str]:
    db, _, name = table.partition(".")
    return (db, name) if name else ("", table)


def _ts_ms(v) -> int:
    if v is None:
        return 0
    if hasattr(v, "timestamp"):
        # stored timestamps are UTC wall-clock; a naive datetime's
        # .timestamp() would apply the HOST zone and shift ts_ms
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return int(v.timestamp() * 1000)
    return int(v)


def _write_jsonl(out_dir: str, stem: str, lines: list[str]) -> str:
    """Content-keyed deterministic name + tmp/rename: a retried task
    overwrites its own file instead of duplicating envelopes."""
    key = hashlib.md5(
        (lines[0] + "\x1f" + lines[-1]
         + f"\x1f{len(lines)}").encode()).hexdigest()[:12]
    fname = f"{stem}-{key}-{len(lines)}.jsonl"
    fpath = os.path.join(out_dir, fname)
    tmp = fpath + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, fpath)
    return fname


def _update_manifest(out_dir: str, section: str, payload: dict) -> None:
    mp = os.path.join(out_dir, _META)
    meta = {}
    if os.path.exists(mp):
        with open(mp) as fh:
            meta = json.load(fh)
    meta[section] = payload
    tmp = mp + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, mp)


def _wire_cast(tbl: pa.Table) -> pa.Table:
    """Cast payload columns to their declared wire types. The change
    feed rides a pandas outer-merge, which floats nullable int columns
    (a deleted key's ``stars`` is NaN ⇒ the whole column is float64 and
    json would emit ``31367.0`` where the wire schema demands int64) —
    NaN becomes null, integral floats become ints, exactly once here."""
    import pyarrow.compute as pc

    wire = {f.name: f.type for f in PAYLOAD_STRUCT}
    for i, name in enumerate(tbl.schema.names):
        want = wire.get(name)
        if want is None or tbl.schema.field(i).type == want:
            continue
        a = tbl[name].combine_chunks()
        if pa.types.is_floating(a.type) and not pa.types.is_floating(want):
            a = pc.if_else(pc.is_nan(a), pa.scalar(None, a.type), a)
        tbl = tbl.set_column(i, name, pc.cast(a, want))
    return tbl


#: deterministic server uuid for relayed MySQL-shaped gtids (the same
#: role as debezium_json._FIXTURE_SERVER_UUID — identity only)
_RELAY_SERVER_UUID = "8c3f12aa-41b2-4c09-9e77-0d5a6b7c8d9e"

DIALECTS = ("native", "mysql", "sqlserver", "postgres", "mongo", "oracle")


def _source_block(dialect: str, *, db: str, name: str, pos: int,
                  tx_id: str, snapshot: bool) -> dict:
    """The envelope ``source`` block in one of the five public Debezium
    position shapes the engine's own reader accepts (plus the native
    integer ``pos``), through the same offset bridges the reader uses —
    so a relayed feed in any dialect round-trips bit-exactly."""
    from ..state.offsets import Lsn, MongoTs, MySqlOffset, OracleScn, PgLsn

    if dialect == "native":
        return {"db": db, "table": name, "pos": pos, "txId": tx_id,
                "snapshot": snapshot, "schema_version": 0}
    if dialect == "mysql":
        off = MySqlOffset.from_int(pos)
        return {"db": db, "table": name, "file": off.file, "pos": off.pos,
                "row": 0, "event": 0,
                # gtid embeds the relayed tx token so tx identity — not
                # just final state — survives the dialect (the reader's
                # GTID-preferred tx synthesis picks it up verbatim)
                "gtid": f"{_RELAY_SERVER_UUID}:{tx_id}",
                "snapshot": snapshot, "schema_version": 0}
    if dialect == "sqlserver":
        lsn = str(Lsn.from_int(pos))
        return {"db": db, "table": name, "change_lsn": lsn,
                "commit_lsn": lsn, "txId": tx_id, "snapshot": snapshot,
                "snapshot_completed": not snapshot, "schema_version": 0}
    if dialect == "postgres":
        p = str(PgLsn.from_int(pos))
        return {"db": "postgres", "schema": db, "table": name,
                "sequence": json.dumps([p, p]), "txId": tx_id,
                "snapshot": snapshot, "schema_version": 0}
    if dialect == "mongo":
        mts = MongoTs.from_int(pos)
        return {"rs": "rs0", "db": db, "collection": name,
                "sec": mts.sec, "ord": mts.ord,
                "lsid": hashlib.md5(tx_id.encode()).hexdigest(),
                "txnNumber": 1, "snapshot": snapshot,
                "schema_version": 0}
    if dialect == "oracle":
        scn = str(OracleScn.from_int(pos))
        return {"db": "ORCLPDB1", "schema": db, "table": name,
                "scn": scn, "commit_scn": scn, "txId": tx_id,
                "snapshot": snapshot, "schema_version": 0}
    raise ValueError(f"dialect must be one of {DIALECTS}")


def _row_env(*, op: str, pos: int, table: str, tx_id: str, ts_ms: int,
             snapshot: bool, after: dict | None,
             before: dict | None = None, dialect: str = "native") -> str:
    db, name = _split_table(table)
    env = {
        "op": op,
        "before": before,
        "after": after,
        "source": _source_block(dialect, db=db, name=name, pos=pos,
                                tx_id=tx_id, snapshot=snapshot),
        "ts_ms": ts_ms,
    }
    return json.dumps({"payload": env}, default=str)


def _coalesce_plans(reg) -> dict:
    """table -> [(final_column, historical names newest-first)]: lake
    rows written before a column rename still store the value under the
    OLD name (the read path coalesces at query time) — the relay emits
    the coalesced FINAL image, exactly what its CREATE DDL declares."""
    plans = {}
    for tname in reg.tables:
        plans[tname] = [(f, hist) for f, hist, _ in reg.coalesce_plan(tname)]
    for old, new in reg.table_renames.items():
        plans.setdefault(old, plans[new])
    return plans


def _after_image(row: dict, plan: list) -> dict:
    out = {}
    for final, hist in plan:
        v = None
        for n in hist:
            v = row.get(n)
            if v is not None:
                break
        out[final] = v
    return out


def _load_registry(lake_dir: str, upto_lsn: int | None = None):
    """Registry replayed from the lake's persisted DDL history —
    optionally only up to a watermark (``upto_lsn``), so a snapshot
    relay at v0 declares the schema the v0 rows actually have, and the
    changes leg forwards the DDLs between v0 and v1 at their true
    positions (the consumer replays the same evolution the source saw)."""
    from ..state import checkpoint as ckpt
    from ..state.ddl import Registry

    hist = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR,
                        "schema_history.jsonl")
    if not os.path.exists(hist):
        raise FileNotFoundError(
            f"{hist} missing — the relay derives its CREATE DDL from the "
            "lake's persisted schema registry")
    reg = Registry.load(hist)
    if upto_lsn is None:
        return reg
    cut = Registry()
    for rec in reg.history:
        if rec["lsn"] <= upto_lsn:
            cut.apply(rec["lsn"], rec["op"], rec["table"],
                      rec["prev_table"], rec["payload"])
    return cut


def _sanitize_ddl_payload(payload: str) -> str:
    """Strip value-converter specs from a relayed DDL record: the lake
    stores CONVERTED values, so the consumer must not re-apply the
    source's raw-encoding converters to them."""
    doc = json.loads(payload) if payload else {}
    if "columns" in doc:
        doc["columns"] = [list(c[:2]) for c in doc["columns"]]
    doc.pop("converter", None)
    return json.dumps(doc)


def _ddl_env(rec: dict, dialect: str) -> str:
    """One DDL envelope from a registry-history record, at its position."""
    db, name = _split_table(rec["table"])
    return json.dumps({"payload": {
        "source": _source_block(dialect, db=db, name=name,
                                pos=rec["lsn"], tx_id=f"ddl:{rec['lsn']}",
                                snapshot=False),
        "ts_ms": rec["lsn"],
        "ddl": {"op": rec["op"], "table": rec["table"],
                "prev_table": rec.get("prev_table", ""),
                "payload": _sanitize_ddl_payload(rec["payload"])},
    }})


def _ddl_prefix_lines(lake_dir: str, snapshot_lsn: int,
                      dialect: str = "native") -> list[str]:
    """CREATE_DATABASE + CREATE_TABLE envelopes from the lake's registry
    AS OF the snapshot watermark, at positions 1..n below the snapshot
    offset — the golden snapshot prefix a fresh consumer replays. DDLs
    past the watermark are NOT folded in: the changes leg forwards them
    at their true positions, so the consumer replays the same schema
    evolution the source saw."""
    from ..model import DDL_CREATE_DATABASE, DDL_CREATE_TABLE

    reg = _load_registry(lake_dir, upto_lsn=snapshot_lsn)
    for tname, ts in reg.tables.items():
        extra = [c for c, _ in ts.columns if c not in _WIRE_FIELDS]
        if extra:
            raise ValueError(
                f"table {tname} declares columns {extra} outside the "
                "wire's row-image shape (model.PAYLOAD_STRUCT) — this "
                "lake cannot ride the native-pos Debezium dialect")
    lines: list[str] = []
    lsn = 0
    seen_dbs: set[str] = set()
    for tname in sorted(reg.tables):
        ts = reg.tables[tname]
        db, name = _split_table(tname)
        for op, tbl, payload in (
                [(DDL_CREATE_DATABASE, db, "{}")] if db not in seen_dbs
                else []) + [
                (DDL_CREATE_TABLE, tname, json.dumps(
                    {"columns": [list(c) for c in ts.columns],
                     "primary_key": list(ts.primary_key)}))]:
            seen_dbs.add(db)
            lsn += 1
            lines.append(_ddl_env(
                {"lsn": lsn, "op": op, "table": tbl, "prev_table": "",
                 "payload": payload}, dialect))
    if lsn >= snapshot_lsn:
        raise ValueError(
            f"snapshot watermark {snapshot_lsn} leaves no room below it "
            f"for the {lsn}-event DDL prefix")
    return lines


def relay_snapshot_jsonl(lake_dir: str, out_dir: str, *,
                         as_of_lsn: int | None = None,
                         positions: str = "preserve",
                         dialect: str = "native") -> dict:
    """Publish the lake's live rows as a Debezium snapshot feed: DDL
    prefix (driver-written, tiny) + ``op='r'`` row envelopes, written by
    distributed per-block tasks.

    ``positions="preserve"`` (default) keeps each row's TRUE source
    position (its winning ``_sequence_num``) on the wire — a consumer
    replaying this feed reconstructs the source's per-key positions
    bit-exactly (the round-trip gate compares ``_sequence_num`` too).
    ``positions="shared"`` puts every row at the ONE snapshot offset
    (= the watermark), the reference's snapshot semantics
    (MySqlEventReader.java:126 / SURVEY.md §2.7) — use it when the
    consumer's mid-snapshot-restart behavior must match Debezium's
    re-dump-from-scratch contract; per-key positions then restart at
    the watermark."""
    import ray.data

    from ..pipelines.replicate import final_state
    from ..state import checkpoint as ckpt

    if positions not in ("preserve", "shared"):
        raise ValueError("positions must be 'preserve' or 'shared'")
    if dialect not in DIALECTS:
        raise ValueError(f"dialect must be one of {DIALECTS}")
    os.makedirs(out_dir, exist_ok=True)
    # sweep a crashed earlier attempt's files first: Ray's block
    # batching may differ between runs, so its content-keyed names
    # might not collide with this run's (the jsonl_to_segments rule);
    # duplicate envelopes would be LWW-harmless downstream, but the
    # feed stays exactly one snapshot
    for f in _glob.glob(os.path.join(out_dir, "snap-*.jsonl")):
        os.remove(f)
    g0 = int(as_of_lsn if as_of_lsn is not None
             else ckpt.read_global_watermark(lake_dir))
    ddl = _ddl_prefix_lines(lake_dir, g0, dialect)
    n_ddl = len(ddl)
    dpath = os.path.join(out_dir, "00000000-ddl.jsonl")
    tmp = dpath + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(ddl) + "\n")
    os.replace(tmp, dpath)

    ds = final_state(lake_dir, as_of_lsn=g0)
    # images in the schema AS OF the watermark — matching the DDL prefix
    plans = _coalesce_plans(_load_registry(lake_dir, upto_lsn=g0))
    shared = positions == "shared"

    def write(tbl: pa.Table) -> pa.Table:
        stats = pa.schema([("file", pa.string()), ("n", pa.int64())])
        if tbl.num_rows == 0:
            return stats.empty_table()
        tbl = _wire_cast(tbl)
        lines = []
        for row in tbl.to_pylist():
            pos = g0 if shared else int(row[SEQUENCE_NUM])
            if pos <= n_ddl:
                # preserve mode rides below the DDL prefix only if the
                # source data started at tiny lsns — impossible for logs
                # with their own DDL prefix; fail loudly, never reorder
                raise ValueError(
                    f"row position {pos} collides with the {n_ddl}-event "
                    "DDL prefix — relay with positions='shared'")
            lines.append(_row_env(
                op="r", pos=pos, table=row["table"],
                tx_id=str(row[ROW_ID]), ts_ms=_ts_ms(row[SOURCE_TIMESTAMP]),
                snapshot=True, dialect=dialect,
                after=_after_image(row, plans[row["table"]])))
        fname = _write_jsonl(out_dir, "snap", lines)
        return pa.table({"file": [fname], "n": [len(lines)]}, schema=stats)

    res = ds.map_batches(write, batch_format="pyarrow",
                         zero_copy_batch=True).take_all()
    n = int(sum(r["n"] for r in res))
    out = {"watermark": g0, "events": n, "ddl_events": n_ddl,
           "positions": positions, "dialect": dialect,
           "files": sorted(r["file"] for r in res)}
    _update_manifest(out_dir, "snapshot", out)
    return out


def relayed_upto(out_dir: str) -> int | None:
    """Highest lake version the feed has published (None: no feed yet).
    Taken from the relay manifest, which commits AFTER the envelope
    files — a crash in between re-relays the same deterministic files."""
    mp = os.path.join(out_dir, _META)
    if not os.path.exists(mp):
        return None
    with open(mp) as fh:
        meta = json.load(fh)
    hi = None
    for v in meta.values():
        w = v.get("to_lsn", v.get("watermark"))
        if w is not None:
            hi = int(w) if hi is None else max(hi, int(w))
    return hi


def relay_continue(lake_dir: str, out_dir: str, *,
                   positions: str = "preserve",
                   dialect: str | None = None) -> dict:
    """Bring the wire feed current with the lake — the follow-mode hook
    (``replicate --follow --relay-out``, the continuous CDC outbox):
    the FIRST call publishes a full snapshot at the lake's current
    watermark; every later call relays the change feed from the last
    published version (requires ``history=True`` within retention, like
    every derived-artifact hook); a caught-up call is a manifest-read
    no-op. Exactly-once off the feed's own manifest: a crash between
    the lake commit and this hook re-runs the same deterministic relay
    on the next poll, overwriting its own files.

    ``dialect=None`` (default) inherits the feed's OWN dialect from its
    manifest — one feed speaks one position family; pass a dialect only
    on the first call (or to assert the established one)."""
    from ..state import checkpoint as ckpt

    established = None
    mp = os.path.join(out_dir, _META)
    if os.path.exists(mp):
        with open(mp) as fh:
            established = json.load(fh).get("snapshot", {}).get("dialect")
    if dialect is None:
        dialect = established or "native"
    elif established and dialect != established:
        raise ValueError(
            f"feed {out_dir} was established in dialect {established!r}; "
            f"refusing to mix in {dialect!r}")

    g = int(ckpt.read_global_watermark(lake_dir))
    last = relayed_upto(out_dir)
    if last is None:
        return relay_snapshot_jsonl(lake_dir, out_dir, positions=positions,
                                    dialect=dialect)
    if g <= last:
        return {"from_lsn": last, "to_lsn": g, "events": 0, "noop": True}
    return relay_changes_jsonl(lake_dir, out_dir, last, dialect=dialect)


def relay_changes_jsonl(lake_dir: str, out_dir: str, from_lsn: int, *,
                        to_lsn: int | None = None,
                        dialect: str = "native",
                        tombstones: bool = False) -> dict:
    """Publish the lake's change data feed between two retained versions
    as ``c``/``u``/``d`` Debezium envelopes (requires ``history=True``
    within the retention horizon). See module docstring for position
    semantics; idempotent under re-runs (deterministic file names).

    ``tombstones=True`` is Debezium's ``tombstones.on.delete``: each
    delete envelope is followed by a null-payload record so
    log-compacted topics drop the key; the engine's own ingest (and any
    Debezium consumer) discards them, so the round-trip stays
    bit-identical."""
    from ..pipelines.replicate import lake_diff
    from ..state import checkpoint as ckpt

    if dialect not in DIALECTS:
        raise ValueError(f"dialect must be one of {DIALECTS}")
    os.makedirs(out_dir, exist_ok=True)
    # sweep this leg's files from a crashed earlier attempt (batching
    # may differ between runs — see relay_snapshot_jsonl)
    for f in _glob.glob(os.path.join(out_dir,
                                     f"diff-{from_lsn:020d}-*.jsonl")):
        os.remove(f)
    g1 = int(to_lsn if to_lsn is not None
             else ckpt.read_global_watermark(lake_dir))
    ds = lake_diff(lake_dir, from_lsn, to_lsn)
    reg = _load_registry(lake_dir, upto_lsn=g1)
    plans = _coalesce_plans(reg)
    # forward the DDLs of this window at their TRUE positions (a column
    # rename between two relay legs otherwise strands the consumer on
    # the snapshot-era schema); converter specs are stripped — the lake
    # already stores converted values
    ddl_lines = [_ddl_env(rec, dialect) for rec in reg.history
                 if from_lsn < rec["lsn"] <= g1]
    if ddl_lines:
        dpath = os.path.join(out_dir, f"diff-{from_lsn:020d}-ddl.jsonl")
        dtmp = dpath + f".tmp.{os.getpid()}"
        with open(dtmp, "w") as fh:
            fh.write("\n".join(ddl_lines) + "\n")
        os.replace(dtmp, dpath)
    # delete envelopes carry a key-only before image; the key layout is
    # manifest-declared (``table`` rides source.db/table, not the image)
    any_m = next(iter(ckpt.all_manifests(lake_dir).values()))
    key_cols = [c for c in (any_m.get("key_columns")
                            or ["table", "repo", "path"]) if c != "table"]

    def write(tbl: pa.Table) -> pa.Table:
        stats = pa.schema([("file", pa.string()), ("n", pa.int64()),
                           ("c", pa.int64()), ("u", pa.int64()),
                           ("d", pa.int64())])
        if tbl.num_rows == 0:
            return stats.empty_table()
        tbl = _wire_cast(tbl)
        keys = key_cols
        lines = []
        counts = {"c": 0, "u": 0, "d": 0}
        for row in tbl.to_pylist():
            op = row["change"]
            counts[op] += 1
            if op == "d":
                key = "\x1f".join(str(row[k]) for k in keys)
                lines.append(_row_env(
                    op="d", pos=g1, table=row["table"],
                    tx_id=("relay:d:"
                           + hashlib.md5(key.encode()).hexdigest()[:16]),
                    ts_ms=0, snapshot=False, after=None, dialect=dialect,
                    before={k: row[k] for k in keys}))
                if tombstones:
                    lines.append('{"payload": null}')
            else:
                lines.append(_row_env(
                    op=op, pos=int(row[SEQUENCE_NUM]),
                    table=row["table"], tx_id=str(row[ROW_ID]),
                    ts_ms=_ts_ms(row[SOURCE_TIMESTAMP]), snapshot=False,
                    dialect=dialect,
                    after=_after_image(row, plans[row["table"]])))
        fname = _write_jsonl(out_dir, f"diff-{from_lsn:020d}", lines)
        n_env = counts["c"] + counts["u"] + counts["d"]
        return pa.table(
            {"file": [fname], "n": [n_env],
             "c": [counts["c"]], "u": [counts["u"]], "d": [counts["d"]]},
            schema=stats)

    res = ds.map_batches(write, batch_format="pyarrow").take_all()
    files = sorted(r["file"] for r in res)
    if ddl_lines:
        files.append(f"diff-{from_lsn:020d}-ddl.jsonl")
    out = {"from_lsn": int(from_lsn), "to_lsn": g1,
           "events": int(sum(r["n"] for r in res)),
           "created": int(sum(r["c"] for r in res)),
           "updated": int(sum(r["u"] for r in res)),
           "deleted": int(sum(r["d"] for r in res)),
           "ddl_events": len(ddl_lines),
           "tombstones": (int(sum(r["d"] for r in res))
                          if tombstones else 0),
           "files": files}
    _update_manifest(out_dir, f"changes-{from_lsn}-{g1}", out)
    return out
