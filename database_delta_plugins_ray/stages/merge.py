"""Partition merger: the stateful apply stage of the CDC pipeline.

Ray-Data-native replacement for the Delta app's target-apply half (observed
contract: ordered apply, last-writer-wins upsert by PK, soft-delete via
``_is_deleted``, bookkeeping columns ``_row_id, _source_timestamp,
_is_deleted, _sequence_num`` — mysql-delta-plugins/src/e2e-test/java/io/cdap/
plugin/BQValidation.java:86-90).

Used as an actor-pool callable for ``groupby("part").map_groups(...)``: one
call receives ALL (pre-reduced) events of one key partition. Per partition it

1. reduces to the max-lsn event per primary key (exact, hash-join based —
   the per-batch combiner may over-keep on 64-bit hash collisions);
2. fences duplicate replay: drops events with ``lsn <= watermark`` from the
   partition checkpoint (SqlServerRecordConsumer.java:93-97 /
   SqlServerOffset.isBeforeOrAt, SqlServerOffset.java:91-94);
3. merges with the partition's existing lake state (prior rows behave as
   events at their stored ``_sequence_num``);
4. applies TRUNCATE/DROP lsn fences from the schema registry (§2.6);
5. commits an offset-fenced, idempotent Parquet file + checkpoint manifest
   (state/checkpoint.py) and returns a one-row lineage summary.

Ordering note (SURVEY.md §4): order is only required per primary key; LWW by
monotone lsn realizes it without any global sort.

Write amplification (100-TB scale): an incremental run does NOT rewrite the
whole partition state. When the incoming events are small relative to the
base, the merger commits a *delta* file holding only the changed keys' new
rows (LWW guarantees new events supersede base rows: their lsn is past the
watermark); the manifest lists base + deltas, and readers/compaction reduce
across files by max ``_sequence_num`` per key. Once ``max_delta_files``
deltas accumulate — or a fence / schema change arrives — the partition is
compacted back to a single file. The delta decision only reads the base's
narrow key columns (Parquet column pruning), never its payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..model import (
    IS_DELETED,
    OP_DELETE,
    ROW_ID,
    SEQUENCE_NUM,
    SOURCE_TIMESTAMP,
)
from ..state import checkpoint as ckpt
from ..state.ddl import Registry

SUMMARY_SCHEMA = pa.schema(
    [
        pa.field("part", pa.int64()),
        pa.field("events_in", pa.int64()),
        pa.field("events_applied", pa.int64()),
        pa.field("rows", pa.int64()),
        pa.field("live_rows", pa.int64()),
        pa.field("last_lsn", pa.int64()),
        pa.field("skipped", pa.bool_()),
    ]
)


#: Debezium's reserved placeholder for a column whose value was NOT
#: shipped with the change event (public contract: postgres TOAST
#: columns unchanged by an UPDATE arrive as this literal; the sink must
#: carry the previous value forward). Reserved by Debezium — a real
#: payload can never legitimately equal it.
TOAST_SENTINEL = "__debezium_unavailable_value"


def exact_lww_indices(tbl: pa.Table, key_cols: tuple[str, ...], lsn_col: str) -> np.ndarray:
    """Indices of the max-``lsn_col`` row per key — exact (string equality via
    pandas hash table), O(n), no full sort of payload columns."""
    df = pd.DataFrame(
        {c: tbl[c].to_numpy(zero_copy_only=False) for c in key_cols + (lsn_col,)}
    )
    df = df.sort_values(lsn_col, kind="stable")
    idx = df.drop_duplicates(list(key_cols), keep="last").index.to_numpy()
    idx.sort()
    return idx


def schema_sig(tbl: pa.Table) -> list[str]:
    """Stable schema fingerprint stored in the manifest; a delta commit is
    only legal when the new rows' schema matches the base file's exactly
    (schema evolution between commits forces a compaction)."""
    return [f"{f.name}:{f.type}" for f in tbl.schema]


class PartitionMerger:
    """Actor-pool callable for ``groupby("part").map_groups``."""

    def __init__(
        self,
        lake_dir: str,
        registry: Registry,
        payload_columns: list[str],
        key_columns: tuple[str, ...] = ("table", "repo", "path"),
        keep_tombstones: bool = True,
        max_delta_files: int = 4,
        keep_history: bool = False,
        toast_columns: tuple[str, ...] = (),
    ) -> None:
        import ray

        if isinstance(registry, ray.ObjectRef):
            registry = ray.get(registry)  # broadcast read, once per actor
        self.lake_dir = lake_dir
        self.registry = registry
        self.payload_columns = payload_columns
        self.key_columns = key_columns
        self.keep_tombstones = keep_tombstones
        self.max_delta_files = max(1, max_delta_files)
        self.keep_history = keep_history
        self.toast_columns = tuple(toast_columns)
        self.fences = registry.fences()

    # -- helpers ---------------------------------------------------------

    def _events_to_state(self, ev: pa.Table) -> pa.Table:
        """Shape incoming events like lake rows (bookkeeping columns)."""
        cols = {c: ev[c] for c in ("part", *self.key_columns) if c in ev.column_names}
        for c in self.payload_columns:
            cols[c] = ev[c]
        cols[ROW_ID] = ev["tx_id"]
        cols[SOURCE_TIMESTAMP] = ev["ingest_ts"]
        cols[IS_DELETED] = pc.equal(ev["op"], OP_DELETE)
        cols[SEQUENCE_NUM] = ev["lsn"]
        return pa.table(cols)

    def _resolve_toast(self, state: pa.Table) -> pa.Table:
        """Postgres TOAST carry-forward (public Debezium contract): a
        configured column holding ``TOAST_SENTINEL`` inherits the key's
        most recent earlier value — one stable seq sort + per-key ffill
        per column (sentinels convert to NaN first, so nulls from
        delete images are skipped exactly like the SQL oracle's
        ``last_value(... IGNORE NULLS)``). No-op (and not called)
        without configured toast columns."""
        cols = [c for c in self.toast_columns if c in state.column_names]
        if not cols or state.num_rows == 0:
            return state
        seq = state[SEQUENCE_NUM].to_numpy(zero_copy_only=False)
        order = np.argsort(seq, kind="stable")
        keys = [pd.Series(state[k].to_numpy(zero_copy_only=False))
                .iloc[order] for k in self.key_columns]
        for c in cols:
            vals = state[c].to_pandas()
            sent = vals == TOAST_SENTINEL
            if not sent.any():
                continue
            masked = vals.where(~sent)
            filled = masked.iloc[order].groupby(keys, sort=False).ffill()
            filled = filled.reindex(vals.index)
            # substitute ONLY at sentinel positions: a genuine NULL
            # written by an update is a real value (the Debezium
            # contract reserves carry-forward for the placeholder
            # alone) and must NOT inherit the stale previous value
            resolved = vals.where(~sent, filled)
            # a sentinel with no in-scope predecessor stays a SENTINEL
            # (never silently null): _has_sentinel then routes the key
            # through the full merge, where the BASE rows resolve it
            resolved = resolved.where(pd.notna(resolved) | ~sent, vals)
            i = state.schema.get_field_index(c)
            state = state.set_column(
                i, c, pa.array(resolved.where(pd.notna(resolved), None),
                               type=state.schema.field(c).type))
        return state

    def _has_sentinel(self, state: pa.Table) -> bool:
        for c in self.toast_columns:
            if c in state.column_names and bool(
                    pc.any(pc.equal(pc.fill_null(state[c], ""),
                                    TOAST_SENTINEL)).as_py()):
                return True
        return False

    def _apply_fences(self, state: pa.Table) -> pa.Table:
        """TRUNCATE/DROP: rows whose winning lsn predates the fence are dead."""
        if not self.fences:
            return state
        dead = np.zeros(state.num_rows, dtype=bool)
        seq = state[SEQUENCE_NUM].to_numpy(zero_copy_only=False)
        for tname, fence in self.fences.items():
            m = pc.equal(state["table"], tname).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            dead |= m & (seq < fence)
        if dead.any():
            i = state.schema.get_field_index(IS_DELETED)
            new = pc.or_(state[IS_DELETED], pa.array(dead))
            state = state.set_column(i, IS_DELETED, new)
        return state

    def _migrate_state(self, old: pa.Table) -> pa.Table:
        """Cast/rename a previously-committed partition state to the CURRENT
        registry schema (SURVEY.md §1.3: 'the merge actor casts/renames/widens
        old-version batches to the current schema before upsert'). A state
        file written before an ALTER may carry pre-rename column names or
        narrower types; columns dropped from the schema are discarded."""
        names = set(old.column_names)
        # re-point renamed tables: state rows written before a RENAME_TABLE
        # still carry the old id; the LWW key includes `table`, so without
        # this rewrite a resume across the rename would split keys
        if self.registry.table_renames:
            uniq = pc.unique(old["table"]).to_pylist()
            mapping = {t: self.registry.resolve_table(t) for t in uniq}
            if any(k != v for k, v in mapping.items()):
                new_tables = pc.take(
                    pa.array([mapping[t] for t in uniq]),
                    pc.index_in(old["table"], pa.array(uniq)),
                )
                old = old.set_column(
                    old.schema.get_field_index("table"), "table", new_tables
                )
        cols: dict[str, pa.ChunkedArray] = {}
        for c in ("part", *self.key_columns):
            if c in names:
                cols[c] = old[c]
        # table -> coalesce plan (history names per final column)
        plans = {}
        for t in set(pc.unique(old["table"]).to_pylist()):
            try:
                plans[t] = {f: (hist, typ) for f, hist, typ in self.registry.coalesce_plan(t)}
            except KeyError:
                plans[t] = {}
        # single-table fast path (the common case)
        merged_plan: dict[str, tuple[list[str], pa.DataType]] = {}
        for p in plans.values():
            merged_plan.update(p)
        for final in self.payload_columns:
            if final == "content_sha":
                if "content_sha" in names:
                    cols[final] = old["content_sha"]
                continue
            hist, typ = merged_plan.get(final, ([final], None))
            present = [h for h in hist if h in names]
            if not present:
                continue  # column added after this state was written -> null
            arr = old[present[0]] if len(present) == 1 else pc.coalesce(
                *[old[h] for h in present]
            )
            if typ is not None and arr.type != typ:
                arr = pc.cast(arr, typ)
            cols[final] = arr
        for c in (ROW_ID, SOURCE_TIMESTAMP, IS_DELETED, SEQUENCE_NUM):
            cols[c] = old[c]
        return pa.table(cols)

    # -- main ------------------------------------------------------------

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        events_in = group.num_rows

        manifest = ckpt.read_manifest(self.lake_dir, part)
        watermark = manifest["last_lsn"] if manifest else 0
        prior_applied = manifest["events_applied"] if manifest else 0

        # duplicate-replay fence (at-least-once -> effectively-once)
        if watermark:
            group = group.filter(pc.greater(group["lsn"], watermark))
        if group.num_rows == 0:
            return self._summary(part, events_in, 0, manifest, watermark, skipped=True)

        new_state = self._events_to_state(group)
        last_lsn = max(watermark, int(pc.max(group["lsn"]).as_py()))

        if self.toast_columns:
            # resolve sentinels within the incoming events BEFORE the
            # per-key reduce (the winner's value may live in an earlier
            # event of the same batch that LWW would discard)
            new_state = self._resolve_toast(new_state)

        # reduce the NEW events per key first (cheap, no base read): LWW over
        # the incoming events alone — every surviving row supersedes any base
        # row of the same key because its lsn is past the watermark
        idx = exact_lww_indices(new_state, self.key_columns, SEQUENCE_NUM)
        if len(idx) < new_state.num_rows:
            new_state = new_state.take(pa.array(idx))

        # a sentinel that survived the in-batch resolve needs the BASE
        # rows (its value predates this batch) — force the full merge
        toast_needs_base = (bool(self.toast_columns)
                            and self._has_sentinel(new_state))

        base_files = (manifest.get("files") or [manifest["file"]]) if manifest else []

        def write_fn(tbl, path):
            pq.write_table(tbl, path)

        # a delta is legal only when nothing about the base needs rewriting:
        # same schema, no UNAPPLIED fence (a fence the base commit already
        # applied doesn't block), and no table rename since the base commit
        # (base rows under a pre-rename name would split LWW keys)
        fmax = max(self.fences.values(), default=0)
        base_tables = set(manifest.get("tables", [])) if manifest else set()
        can_delta = (
            manifest is not None
            and not toast_needs_base
            and fmax <= manifest.get("fence_max_applied", 0)
            and all(self.registry.resolve_table(t) == t for t in base_tables)
            and self.keep_tombstones
            and len(base_files) < self.max_delta_files
            and manifest.get("schema_sig") == schema_sig(new_state)
        )
        if can_delta:
            rows, live = self._delta_counts(base_files, new_state, manifest)
            ckpt.commit_partition(
                self.lake_dir, part, new_state, last_lsn, write_fn,
                {
                    "events_applied": prior_applied + group.num_rows,
                    "rows": rows,
                    "live_rows": live,
                    "tables": sorted(base_tables
                                     | set(pc.unique(new_state["table"]).to_pylist())),
                    "schema_sig": manifest["schema_sig"],
                    "key_columns": list(self.key_columns),
                    "fence_max_applied": manifest.get("fence_max_applied", 0),
                },
                extra_files=base_files,
                keep_history=self.keep_history,
            )
            return self._result(part, events_in, group.num_rows, rows, live, last_lsn)

        # compaction path: full merge with the existing partition state
        if manifest:
            old = pa.concat_tables(
                [self._migrate_state(pq.read_table(f)) for f in base_files],
                promote_options="default",
            )
            state = pa.concat_tables([old, new_state], promote_options="default")
        else:
            state = new_state

        if toast_needs_base:
            state = self._resolve_toast(state)

        idx = exact_lww_indices(state, self.key_columns, SEQUENCE_NUM)
        state = state.take(pa.array(idx))
        state = self._apply_fences(state)
        if not self.keep_tombstones:
            state = state.filter(pc.invert(state[IS_DELETED]))

        live = state.num_rows - int(pc.sum(pc.cast(state[IS_DELETED], pa.int64())).as_py() or 0)

        ckpt.commit_partition(
            self.lake_dir,
            part,
            state,
            last_lsn,
            write_fn,
            keep_history=self.keep_history,
            manifest={
                "events_applied": prior_applied + group.num_rows,
                "rows": state.num_rows,
                "live_rows": live,
                "tables": sorted(set(pc.unique(state["table"]).to_pylist())),
                "schema_sig": schema_sig(state),
                "key_columns": list(self.key_columns),
                "fence_max_applied": max(
                    max(self.fences.values(), default=0),
                    (manifest or {}).get("fence_max_applied", 0),
                ),
            },
        )
        return self._result(part, events_in, group.num_rows, state.num_rows, live, last_lsn)

    def _delta_counts(self, base_files: list[str], new_state: pa.Table,
                      manifest: dict) -> tuple[int, int]:
        """Row/live-row counts after a delta commit, reading ONLY the base's
        key + _is_deleted + _sequence_num columns (Parquet column pruning —
        the payload, i.e. content, is never read on the delta path)."""
        narrow = list(self.key_columns) + [IS_DELETED, SEQUENCE_NUM]
        base = pa.concat_tables([pq.read_table(f, columns=narrow) for f in base_files])
        # base may itself contain superseded rows (prior deltas): reduce keys
        bidx = exact_lww_indices(base, self.key_columns, SEQUENCE_NUM)
        if len(bidx) < base.num_rows:
            base = base.take(pa.array(bidx))
        bdf = pd.DataFrame(
            {c: base[c].to_numpy(zero_copy_only=False) for c in self.key_columns}
        )
        bdf["_del"] = base[IS_DELETED].to_numpy(zero_copy_only=False)
        ndf = pd.DataFrame(
            {c: new_state[c].to_numpy(zero_copy_only=False) for c in self.key_columns}
        )
        ndf["_del"] = new_state[IS_DELETED].to_numpy(zero_copy_only=False)
        merged = bdf.merge(ndf, on=list(self.key_columns), how="outer",
                           suffixes=("_b", "_n"), indicator=True)
        rows = len(merged)
        win_del = merged["_del_n"].where(
            merged["_merge"] != "left_only", merged["_del_b"]
        ).astype(bool)
        live = int((~win_del).sum())
        return rows, live

    def _result(self, part, events_in, applied, rows, live, last_lsn):
        return pa.table(
            {
                "part": [part],
                "events_in": [events_in],
                "events_applied": [applied],
                "rows": [rows],
                "live_rows": [live],
                "last_lsn": [last_lsn],
                "skipped": [False],
            },
            schema=SUMMARY_SCHEMA,
        )

    def _summary(self, part, events_in, applied, manifest, last_lsn, skipped):
        return pa.table(
            {
                "part": [part],
                "events_in": [events_in],
                "events_applied": [applied],
                "rows": [manifest["rows"] if manifest else 0],
                "live_rows": [manifest["live_rows"] if manifest else 0],
                "last_lsn": [last_lsn],
                "skipped": [skipped],
            },
            schema=SUMMARY_SCHEMA,
        )
