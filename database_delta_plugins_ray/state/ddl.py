"""Schema-evolution registry.

Replaces the reference's DDL machinery — the ANTLR DDL parser + in-memory
``Tables`` model (MySqlRecordConsumer.java:230-318) and the persisted
``DBSchemaHistory`` replayed on resume (delta-plugins-common/src/main/java/
io/cdap/delta/plugin/common/DBSchemaHistory.java:41-128) — with structured
DDL events and a pure transition function ``apply_ddl``.

The registry is built once per run on the driver from the (tiny) DDL subset
of the log, broadcast to normalize/merge workers via ``ray.put``, and
persisted as JSON-lines in the lake's ``_checkpoints`` dir so a resumed run
replays the same history (DBSchemaHistory.java:91-95 analog).

Design assumption (documented scale contract): DDL events are rare relative
to DML (thousands vs 10^10), so materializing them on the driver is safe.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field as dc_field

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..functions.types import arrow_type, can_widen
from ..model import (
    DDL_ALTER_TABLE,
    DDL_CREATE_DATABASE,
    DDL_CREATE_TABLE,
    DDL_DROP_DATABASE,
    DDL_DROP_TABLE,
    DDL_RENAME_TABLE,
    DDL_TRUNCATE_TABLE,
    OP_DDL,
)


class DeltaFailure(RuntimeError):
    """Fatal replication error (DeltaFailureRuntimeException analog,
    SqlServerRecordConsumer.java:129-133)."""


@dataclass
class TableState:
    """Evolving logical schema of one replicated table."""

    name: str
    #: ordered (column_name, type_name); current logical schema
    columns: list[tuple[str, str]] = dc_field(default_factory=list)
    primary_key: list[str] = dc_field(default_factory=list)
    #: final_name -> all historical names (for coalesce in normalize)
    history_names: dict[str, list[str]] = dc_field(default_factory=dict)
    #: final_name -> value-converter spec applied by the normalizer
    #: (functions/values.py apply_converter; e.g. "epoch_days_date",
    #: "enum:red,green,blue") — the Debezium-logical-type analog: the LOG
    #: carries raw encodings, the declared schema carries target types
    converters: dict[str, str] = dc_field(default_factory=dict)
    #: lsn fence: rows whose winning event lsn < fence are dead
    fence_lsn: int = 0
    version: int = 0
    dropped: bool = False

    def column_names(self) -> list[str]:
        return [c for c, _ in self.columns]


def apply_ddl(state: "Registry", lsn: int, ddl_op: str, table: str,
              prev_table: str, payload: str) -> None:
    """Pure state transition for one DDL event (MySqlRecordConsumer.java:238-318
    event taxonomy). Mutates ``state`` in place; raises DeltaFailure on
    contract violations (no-PK create, invalid widen)."""
    doc = json.loads(payload) if payload else {}
    if ddl_op == DDL_CREATE_TABLE and doc.get("like"):
        # CREATE TABLE x LIKE y: clone y's current schema (columns, pk,
        # converters); history starts fresh (a clone has no rename past)
        src = state.tables.get(state.resolve_table(doc["like"]))
        if src is None or not src.columns:
            raise DeltaFailure(
                f"CREATE TABLE {table} LIKE {doc['like']}: source table "
                f"unknown")
        state.tables[table] = TableState(
            name=table,
            columns=list(src.columns),
            primary_key=list(src.primary_key),
            history_names={c: [c] for c, _ in src.columns},
            converters=dict(src.converters),
            version=0,
        )
        return
    if ddl_op == DDL_CREATE_TABLE:
        # column entries are [name, type] or [name, type, converter]
        cols = [(c[0], c[1]) for c in doc.get("columns", [])]
        convs = {c[0]: c[2] for c in doc.get("columns", []) if len(c) > 2 and c[2]}
        pk = doc.get("primary_key", [])
        if not pk:
            # no-PK rejection (SqlServerRecordConsumer.java:129-133)
            raise DeltaFailure(f"table {table} has no primary key")
        ts = TableState(
            name=table,
            columns=cols,
            primary_key=pk,
            history_names={c: [c] for c, _ in cols},
            converters=convs,
            version=0,
        )
        state.tables[table] = ts
    elif ddl_op == DDL_ALTER_TABLE:
        ts = state._require(table)
        action = doc.get("action")
        if action == "add":
            col, typ = doc["column"], doc["type"]
            ts.columns.append((col, typ))
            ts.history_names[col] = [col]
            if doc.get("converter"):
                ts.converters[col] = doc["converter"]
        elif action == "rename":
            old, new = doc["column"], doc["new_name"]
            ts.columns = [(new if c == old else c, t) for c, t in ts.columns]
            hist = ts.history_names.pop(old, [old])
            ts.history_names[new] = [new] + hist
            if old in ts.converters:
                ts.converters[new] = ts.converters.pop(old)
        elif action == "widen":
            col, new_t = doc["column"], doc["type"]
            cur = dict(ts.columns).get(col)
            if cur is None:
                raise DeltaFailure(f"widen of unknown column {col} in {table}")
            if not can_widen(cur, new_t):
                raise DeltaFailure(f"illegal type change {cur} -> {new_t} for {table}.{col}")
            ts.columns = [(c, new_t if c == col else t) for c, t in ts.columns]
        elif action == "drop":
            col = doc["column"]
            if col not in dict(ts.columns):
                raise DeltaFailure(f"drop of unknown column {col} in {table}")
            if col in ts.primary_key:
                # key identity is the replication contract — mirroring
                # the no-PK rejection
                raise DeltaFailure(
                    f"cannot drop primary-key column {table}.{col}")
            ts.columns = [(c, t) for c, t in ts.columns if c != col]
            ts.history_names.pop(col, None)
            ts.converters.pop(col, None)
        else:
            raise DeltaFailure(f"unknown ALTER action {action!r}")
        ts.version += 1
    elif ddl_op == DDL_RENAME_TABLE:
        new = doc.get("new_name") or table
        old = prev_table
        ts = state._require(old)
        ts.name = new
        state.tables[new] = ts
        del state.tables[old]
        state.table_renames[old] = new
        state.table_roots[new] = state.table_roots.pop(old, old)
        # re-point older renames transitively
        for k, v in list(state.table_renames.items()):
            if v == old:
                state.table_renames[k] = new
    elif ddl_op in (DDL_TRUNCATE_TABLE, DDL_DROP_TABLE):
        ts = state.tables.get(table)
        if ts is not None:
            ts.fence_lsn = max(ts.fence_lsn, lsn)
            if ddl_op == DDL_DROP_TABLE:
                ts.dropped = True
        elif ddl_op == DDL_DROP_TABLE:
            # pre-snapshot golden DROP of a not-yet-created table: no-op
            state.tables.setdefault(table, TableState(name=table, fence_lsn=lsn))
    elif ddl_op in (DDL_CREATE_DATABASE, DDL_DROP_DATABASE):
        # database-level events carry no per-table schema consequence here
        pass
    else:
        raise DeltaFailure(f"unknown DDL op {ddl_op!r}")


class Registry:
    """All table states + rename map, built by replaying DDL history in lsn
    order. Picklable (broadcast with ``ray.put``)."""

    def __init__(self) -> None:
        self.tables: dict[str, TableState] = {}
        self.table_renames: dict[str, str] = {}
        #: current name -> FIRST name in its rename chain; partition hashing
        #: uses the root so a key's partition never moves across renames
        self.table_roots: dict[str, str] = {}
        self.history: list[dict] = []  # DDL records in lsn order

    def _require(self, table: str) -> TableState:
        t = self.table_renames.get(table, table)
        ts = self.tables.get(t)
        if ts is None:
            raise DeltaFailure(f"DDL for unknown table {table}")
        return ts

    def apply(self, lsn: int, ddl_op: str, table: str, prev_table: str,
              payload: str) -> None:
        apply_ddl(self, lsn, ddl_op, table, prev_table, payload)
        self.history.append(
            {"lsn": lsn, "op": ddl_op, "table": table, "prev_table": prev_table,
             "payload": payload}
        )

    # -- lookups used by the pipeline ------------------------------------

    def resolve_table(self, name: str) -> str:
        return self.table_renames.get(name, name)

    def root_table(self, name: str) -> str:
        """Stable partition-hash identity: the first name in the table's
        rename chain (old names are already roots; new names map back)."""
        return self.table_roots.get(name, name)

    def final_table(self, name: str) -> TableState:
        return self.tables[self.resolve_table(name)]

    def coalesce_plan(self, table: str) -> list[tuple[str, list[str], pa.DataType]]:
        """Per final column: (final_name, [source names newest-first], type)."""
        ts = self.final_table(table)
        out = []
        for col, typ in ts.columns:
            out.append((col, ts.history_names.get(col, [col]), arrow_type(typ)))
        return out

    def union_columns(self, columns: set[str] | None = None) -> list[tuple[str, pa.DataType]]:
        """Ordered union of final (column, type) across all tables — the
        constant output schema of the normalize stage and the lake payload
        layout (multi-table logs share one lake file schema with nulls for
        columns a table lacks)."""
        out: list[tuple[str, pa.DataType]] = []
        seen: set[str] = set()
        for ts in self.tables.values():
            for c, t in ts.columns:
                if c not in seen and (columns is None or c in columns):
                    seen.add(c)
                    out.append((c, arrow_type(t)))
        return out

    def fences(self) -> dict[str, int]:
        """table -> lsn fence from TRUNCATE/DROP (rows older than fence are
        dead; exact dedup/idempotency semantics SURVEY.md §2.6)."""
        return {name: ts.fence_lsn for name, ts in self.tables.items() if ts.fence_lsn}

    # -- persistence (DBSchemaHistory analog) ----------------------------

    def save(self, path: str) -> None:
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            for rec in self.history:
                fh.write(json.dumps(rec) + "\n")
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "Registry":
        reg = cls()
        with open(path) as fh:
            for line in fh:
                rec = json.loads(line)
                reg.apply(rec["lsn"], rec["op"], rec["table"],
                          rec["prev_table"], rec["payload"])
        return reg


def synthesize_table(reg: Registry, table: str, payload_schema: pa.Schema,
                     primary_key: list[str], lsn: int = 0) -> None:
    """First-seen DDL synthesis (SQL Server mode): the source emits no DDL
    stream, so a CREATE_TABLE is synthesized from the first DML's record
    schema + key (SqlServerRecordConsumer.java:154-202; the synthesized set
    is carried in the offset, SqlServerOffset.java:76-78 — here it lands in
    the persisted registry history, which a resume replays)."""
    from ..functions.types import type_name

    cols = [[f.name, type_name(f.type)] for f in payload_schema]
    reg.apply(lsn, DDL_CREATE_TABLE, table, "",
              json.dumps({"columns": cols, "primary_key": primary_key}))


def _footer_distinct_tables(files: list[str]) -> tuple[set[str], list[str]]:
    """Footer-statistics fast path for the distinct-table scan: a file whose
    ``table`` column has min == max in EVERY row group contains exactly that
    one value — no data pages read at all. Returns (resolved values, files
    that still need a scan). On a 10^10-event log where each segment holds
    one table (the overwhelmingly common CDC layout), this turns the
    distinct into a footer-only pass."""
    seen: set[str] = set()
    need_scan: list[str] = []
    for f in files:
        try:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index("table")
            # leaf index of ddl.op: all-null in a row group <=> no DDL rows
            # (DDL rows' table values name databases/dropped tables and must
            # NOT feed the missing-table synthesis)
            ddl_idx = next(
                (i for i in range(md.num_columns)
                 if md.num_row_groups
                 and md.row_group(0).column(i).path_in_schema == "ddl.op"),
                None,
            )
            vals: set[str] = set()
            ok = ddl_idx is not None
            for rg in range(md.num_row_groups) if ok else ():
                st = md.row_group(rg).column(idx).statistics
                dst = md.row_group(rg).column(ddl_idx).statistics
                pure_dml = (dst is not None
                            and dst.null_count == md.row_group(rg).num_rows)
                if (not pure_dml or st is None or st.min is None
                        or st.min != st.max):
                    ok = False
                    break
                vals.add(st.min)
        except (OSError, KeyError, ValueError):
            ok = False
        if ok:
            seen.update(vals)
        else:
            need_scan.append(f)
    return seen, need_scan


def _distinct_dml_tables(files: list[str]) -> set[str]:
    """Distinct ``table`` values across the log's DML rows WITHOUT
    materializing the column on the driver. Footer statistics resolve
    single-table files with no data read; the remainder goes through a
    distributed per-file distinct
    via Ray tasks when Ray is up (each task returns a handful of strings);
    otherwise a streaming scanner that accumulates per-batch uniques —
    either way driver memory is O(#tables), never O(#events)."""
    seen, files = _footer_distinct_tables(files)
    if not files:
        return seen
    try:
        import ray

        ray_up = ray.is_initialized()
    except ImportError:
        ray_up = False
    if ray_up and len(files) > 1:
        import ray

        @ray.remote(num_cpus=1)
        def file_tables(f: str) -> list[str]:
            import pyarrow.dataset as _pads
            import pyarrow.compute as _pc

            out: set[str] = set()
            d = _pads.dataset(f, format="parquet")
            for b in d.to_batches(columns=["table"],
                                  filter=_pads.field("op") != OP_DDL):
                out.update(_pc.unique(b.column(0)).to_pylist())
            return sorted(out)

        parts = ray.get([file_tables.remote(f) for f in files])
        return seen | {t for p in parts for t in p}
    scan_ds = pads.dataset(files, format="parquet")
    for b in scan_ds.to_batches(columns=["table"],
                                filter=pads.field("op") != OP_DDL):
        seen.update(pa.compute.unique(b.column(0)).to_pylist())
    return seen


def build_registry(log_dir: str, upto_lsn: int | None = None,
                   synthesize_missing: bool = True,
                   primary_key: list[str] | None = None,
                   ddl_blacklist: set[tuple[str, str]] | None = None,
                   base: Registry | None = None,
                   after_lsn: int = 0) -> Registry:
    """Scan the log's DDL rows (driver-side, tiny by assumption) and build
    the registry. Reads only the DDL-relevant columns with a pushed-down
    filter — never materializes DML payloads.

    With ``synthesize_missing`` (default), tables that appear in DML but
    have no CREATE_TABLE in the log get a synthesized schema from the log's
    payload struct (M17 first-seen DDL synthesis).

    ``base``/``after_lsn`` support incremental builds on resume: start from
    a persisted history (DBSchemaHistory replay analog) and only scan
    segments whose footer max-lsn exceeds ``after_lsn`` for NEW DDLs."""
    files = [os.path.join(log_dir, f) for f in sorted(os.listdir(log_dir))
             if f.startswith("seg-")]
    if after_lsn:
        def seg_max(f):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index("lsn")
            mx = 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.max is not None:
                    mx = max(mx, st.max)
            return mx

        files = [f for f in files if seg_max(f) > after_lsn]
        if not files:
            return base or Registry()
    ds = pads.dataset(files, format="parquet")
    # footer prune: a file whose ddl.op leaf is all-null in every row group
    # has no DDL rows — skip it entirely (footer-only check; the `op` column's
    # min/max can't exclude 'DDL', but the struct's null counts can)
    ddl_files = []
    for f in files:
        try:
            md = pq.ParquetFile(f).metadata
            ddl_idx = next(
                (i for i in range(md.num_columns)
                 if md.num_row_groups
                 and md.row_group(0).column(i).path_in_schema == "ddl.op"),
                None,
            )
            pure_dml = ddl_idx is not None and all(
                (st := md.row_group(rg).column(ddl_idx).statistics) is not None
                and st.null_count == md.row_group(rg).num_rows
                for rg in range(md.num_row_groups)
            )
        except (OSError, KeyError, ValueError):
            pure_dml = False
        if not pure_dml:
            ddl_files.append(f)
    flt = pads.field("op") == OP_DDL
    if upto_lsn is not None:
        flt = flt & (pads.field("lsn") <= upto_lsn)
    if after_lsn:
        flt = flt & (pads.field("lsn") > after_lsn)
    if ddl_files:
        tbl = pads.dataset(ddl_files, format="parquet").to_table(
            columns=["lsn", "table", "ddl"], filter=flt)
    else:
        tbl = ds.head(0).select(["lsn", "table", "ddl"])
    tbl = tbl.take(pa.compute.sort_indices(tbl, sort_keys=[("lsn", "ascending")]))
    reg = base if base is not None else Registry()
    for row in tbl.to_pylist():
        d = row["ddl"]
        t = d["table"] or row["table"]
        if d["op"] == "SQL":
            # raw-SQL DDL route (M11/V14/V15): the payload carries the
            # statement text (the shape Debezium's schema-change topic
            # emits — possibly a multi-statement script with comments and
            # USE switches); parse into structured events and apply each
            # at this event's position
            from .sqlddl import parse_ddl_script

            stmt = json.loads(d["payload"] or "{}").get("sql", "")
            default_db = t.partition(".")[0] if "." in t else ""
            for op2, t2, prev2, pay2 in parse_ddl_script(stmt, default_db):
                if ddl_blacklist and (t2, op2) in ddl_blacklist:
                    continue
                reg.apply(row["lsn"], op2, t2, prev2, pay2)
            continue
        if ddl_blacklist and (t, d["op"]) in ddl_blacklist:
            # per-table DDL blacklist (M10, MySqlRecordConsumer.java:347-356)
            continue
        reg.apply(row["lsn"], d["op"], t, d["prev_table"] or "", d["payload"] or "{}")
    if synthesize_missing:
        seen = _distinct_dml_tables(files)
        missing = {t for t in seen
                   if reg.resolve_table(t) not in reg.tables
                   or not reg.tables[reg.resolve_table(t)].columns}
        if missing:
            payload_schema = pa.schema(
                list(ds.schema.field("after").type)
            )
            for t in sorted(missing):
                synthesize_table(reg, t, payload_schema,
                                 primary_key or ["repo", "path"])
    return reg
