"""Normalize stage: raw change events -> flat, final-schema, key-partitioned
rows, with a per-batch last-writer-wins combiner.

This is the Ray-Data-native analog of the reference's record consumer
(MySqlRecordConsumer.java:115-225 / SqlServerRecordConsumer.java:88-222):
op mapping (M6), before/after image selection (M7), table filter (M8),
DML blacklist (M9), column projection (M4), type/rename normalization via
the schema registry, plus validation (no-PK rejection, M18 —
SqlServerRecordConsumer.java:129-133).

Everything is vectorized pyarrow.compute over zero-copy Arrow batches; the
only per-row Python is the optional sha256 of ``content`` (stdlib hashlib —
no vectorized sha256 exists in pyarrow; the cost is spread across all
map_batches workers).

The combiner is the key scale lever: within each batch only the max-lsn
event per primary key survives (LWW is associative, so per-batch reduction
before the shuffle is lossless — SURVEY.md §2.6), shrinking the all-to-all
exchange by the per-batch update ratio.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..model import OP_DDL, OP_DELETE, OP_INSERT, OP_UPDATE
from ..state.ddl import DeltaFailure, Registry

#: Debezium op codes -> engine ops (MySqlRecordConsumer.java:170-183:
#: c/r -> INSERT, u -> UPDATE, d -> DELETE; unknown ops are skipped with a
#: warning). Identity codes pass through.
_OP_ALIASES = {
    "c": OP_INSERT, "r": OP_INSERT, "u": OP_UPDATE, "d": OP_DELETE,
    OP_INSERT: OP_INSERT, OP_UPDATE: OP_UPDATE, OP_DELETE: OP_DELETE,
    OP_DDL: OP_DDL,
}


def map_ops(op: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Dictionary-style op normalization; unknown ops map to null (dropped)."""
    vocab = pa.array(list(_OP_ALIASES))
    repl = pa.array(list(_OP_ALIASES.values()))
    idx = pc.index_in(op, vocab)
    return pc.take(repl, idx)


def hash_key(*cols: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit combined hash of string key columns."""
    h = np.zeros(len(cols[0]), dtype=np.uint64)
    for i, c in enumerate(cols):
        hc = pd.util.hash_array(np.asarray(c), hash_key="cdc_part_hashkey")
        h = h * np.uint64(0x100000001B3) + hc + np.uint64(i)
    return h


def sha256_hex(values: list) -> np.ndarray:
    """Per-row sha256 hex (the BASELINE.json per-row invariant column)."""
    sha = hashlib.sha256
    return np.fromiter(
        (sha(v.encode()).hexdigest() for v in values), dtype="<U64", count=len(values)
    )


def _lww_keep_indices(khash: np.ndarray, lsn: np.ndarray,
                      key_arrays: tuple[np.ndarray, ...]) -> np.ndarray:
    """Indices of the max-lsn row per key (sorted by (hash, lsn), boundary
    rows kept; hash collisions verified on real key columns so collisions
    can only over-keep, never drop)."""
    n = len(khash)
    order = np.lexsort((lsn, khash))
    hs = khash[order]
    keep = np.ones(n, dtype=bool)
    same = hs[:-1] == hs[1:]
    if same.any():
        for col in key_arrays:
            c = col[order]
            same = same & (c[:-1] == c[1:])
        keep[:-1] = ~same
    idx = order[keep]
    idx.sort()
    return idx


def lww_combine(tbl: pa.Table, khash: np.ndarray) -> pa.Table:
    """Per-batch LWW pre-reduction: keep the max-lsn row per key.

    Sorts by (key hash, lsn) — numeric sort, much cheaper than sorting three
    string columns — and keeps run-boundary rows, verifying real key columns
    at the boundary so a hash collision can only OVER-keep (harmless: the
    merge stage reduces again, exactly), never drop a key's last event.
    """
    n = tbl.num_rows
    if n <= 1:
        return tbl
    order = np.lexsort((tbl["lsn"].to_numpy(zero_copy_only=False), khash))
    t = tbl.take(pa.array(order))
    keep = np.ones(n, dtype=bool)
    hs = khash[order]
    same_hash = hs[:-1] == hs[1:]
    if same_hash.any():
        same = same_hash
        for col in ("table", "repo", "path"):
            a = t[col]
            eq = pc.equal(a.slice(0, n - 1), a.slice(1, n)).combine_chunks()
            same = same & eq.to_numpy(zero_copy_only=False)
        keep[:-1] = ~same
    return t.filter(pa.array(keep))


#: apply-time column transforms (the public Debezium SMT idea — single
#: message transforms applied between source and sink): name -> factory
#: of a vectorized Arrow kernel. All pure pyarrow.compute, null-preserving.
def _compile_transform(spec: str):
    if spec == "upper":
        return lambda a: pc.utf8_upper(a)
    if spec == "lower":
        return lambda a: pc.utf8_lower(a)
    if spec == "mask":
        return lambda a: pc.if_else(
            pc.is_valid(a), pa.scalar("***"), pa.scalar(None, pa.string()))
    if spec == "mask_email":
        return lambda a: pc.replace_substring_regex(
            a, pattern=r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+",
            replacement="<email>")
    if spec == "sha256":
        def _sha(a: pa.ChunkedArray | pa.Array):
            vals = a.to_pylist()
            out = [None if v is None else
                   hashlib.sha256(str(v).encode()).hexdigest()
                   for v in vals]
            return pa.array(out, pa.string())
        return _sha
    if spec.startswith("truncate:"):
        # CONTRACT: truncate counts Unicode CODEPOINTS (pyarrow
        # utf8_slice_codeunits), not grapheme clusters — a combining
        # sequence may be split at the cut. SQL oracles written with
        # grapheme-cluster substr (e.g. DuckDB) agree on ASCII and
        # precomposed text but can differ on combining sequences.
        n = int(spec.split(":", 1)[1])
        if n < 0:
            raise ValueError(f"truncate length must be >= 0: {spec!r}")
        return lambda a: pc.utf8_slice_codeunits(a, 0, n)
    raise ValueError(
        f"unknown transform {spec!r} (upper, lower, mask, mask_email, "
        f"sha256, truncate:N)")


class Normalizer:
    """Callable batch transform (usable as a stateless fn via closure or as
    an actor-pool class). Holds the broadcast schema registry."""

    def __init__(
        self,
        registry: Registry,
        num_partitions: int,
        table_filter: set[str] | None = None,
        dml_blacklist: set[tuple[str, str]] | None = None,
        columns: set[str] | None = None,
        compute_sha: bool = True,
        combine: bool = True,
        partition_mode: str = "key_hash",
        repo_salt: dict[str, int] | None = None,
        primary_key: tuple[str, ...] = ("repo", "path"),
        incremental_snapshot: bool = False,
        on_error: str = "fail",
        dlq_dir: str | None = None,
        toast_fields: tuple[str, ...] = (),
        transforms: dict[str, str] | None = None,
    ) -> None:
        """``partition_mode`` controls the shuffle key (SURVEY.md §4 skew):

        - ``key_hash`` (default): hash(table, repo, path) — fully salted;
          per-key order preserved, hot repos spread across all partitions.
        - ``repo``: hash(table, repo) — repo-local partitions (cheap
          per-repo scans later) but zipf-hot repos skew a partition.
        - ``repo_salted``: hash(table, repo) + hash(path) % salt_k(repo) —
          per-repo salt factor from ``repo_salt`` (default 1, i.e. = repo
          mode; hot repos get k>1). Each (repo, path) still maps to exactly
          one partition, so per-key LWW order is preserved.
        """
        import ray

        if isinstance(registry, ray.ObjectRef):
            registry = ray.get(registry)
        self.registry = registry
        self.num_partitions = num_partitions
        self.table_filter = table_filter
        self.dml_blacklist = dml_blacklist or set()
        self.columns = columns
        self.compute_sha = compute_sha
        self.combine = combine
        #: after-image struct fields that may carry the Debezium TOAST
        #: placeholder (merge.py TOAST_SENTINEL). The per-batch LWW
        #: combiner then keeps, per key, the latest PROVIDER row (field
        #: non-null and non-sentinel) BESIDE the winner, so the merge
        #: stage's carry-forward always finds the predecessor value the
        #: plain combiner would have dropped.
        self.toast_fields = tuple(toast_fields)
        self.partition_mode = partition_mode
        self.repo_salt = repo_salt or {}
        self.primary_key = tuple(primary_key)
        self.incremental_snapshot = incremental_snapshot
        if on_error not in ("fail", "dlq"):
            raise ValueError(f"on_error must be 'fail' or 'dlq', got {on_error!r}")
        if on_error == "dlq" and not dlq_dir:
            raise ValueError("on_error='dlq' requires dlq_dir")
        self.on_error = on_error
        self.dlq_dir = dlq_dir
        #: SMT-analog apply-time transforms: payload column -> kernel.
        #: Applied to after-images BEFORE content_sha derives, so the
        #: lake (and its sha bookkeeping) stores transformed values —
        #: the Debezium SMT contract (transform between source and sink).
        self.transforms: dict[str, object] = {}
        if transforms:
            blocked = set(self.primary_key) | {
                "table", "op", "lsn", "tx_id", "ingest_ts", "part",
                "content_sha"}
            known = {name for ts in registry.tables.values()
                     for name, _typ in ts.columns}
            for col, spec in transforms.items():
                if col in blocked:
                    raise ValueError(
                        f"cannot transform key/bookkeeping column {col!r}")
                if col in self.toast_fields:
                    raise ValueError(
                        f"cannot transform TOAST carry-forward column "
                        f"{col!r} (the sentinel must pass through intact)")
                if known and col not in known:
                    # a typo'd masking transform that silently never
                    # fires is a PII incident, not a no-op. Deliberate
                    # consequence: a transform may only target a column
                    # that ALREADY exists in the schema — pre-configuring
                    # one for a future migration's column is rejected
                    # (start the transform when the ALTER has landed)
                    raise ValueError(
                        f"transform column {col!r} exists in no known "
                        f"table schema (known: {sorted(known)}); "
                        f"transforms must target existing columns")
                # transforms are string kernels: on a non-string column
                # 'mask'/'sha256' would silently rewrite the lake column
                # to string (schema drift vs the registry) and
                # 'upper'/'truncate:N' would fail deep inside the replay
                # task — fail fast at construction like the
                # unknown-column case
                declared = {typ for ts in registry.tables.values()
                            for name, typ in ts.columns if name == col}
                non_string = declared - {"string", "large_string"}
                if non_string:
                    raise ValueError(
                        f"transform column {col!r} is declared "
                        f"{sorted(non_string)} — transforms are string "
                        f"kernels and may only target string/large_string "
                        f"columns")
                self.transforms[col] = _compile_transform(spec)
        if partition_mode in ("repo", "repo_salted") and len(self.primary_key) < 2:
            raise ValueError(
                f"partition_mode {partition_mode!r} needs a composite primary "
                "key (coarse column + remainder); use key_hash for single-column PKs"
            )
        # final output schema is identical for all batches: the ordered
        # union of payload columns across all registry tables (a table
        # lacking a column emits nulls there)
        self.union_cols: list[tuple[str, pa.DataType]] = registry.union_columns(columns)
        self._plans: dict[str, list] = {}

    # -- helpers ---------------------------------------------------------

    def _plan(self, table: str):
        if table not in self._plans:
            self._plans[table] = self.registry.coalesce_plan(table)
        return self._plans[table]

    def _normalize_table_slice(self, batch: pa.Table, table: str) -> pa.Table:
        n = batch.num_rows
        op = batch["op"]
        is_del = pc.equal(op, OP_DELETE)

        # before/after image selection (M7): DELETE carries the before image
        def image(field_name: str) -> pa.ChunkedArray:
            a = pc.struct_field(batch["after"], field_name)
            b = pc.struct_field(batch["before"], field_name)
            return pc.if_else(is_del, b, a)

        plan = self._plan(table)
        convs = self.registry.final_table(table).converters
        cols: dict[str, pa.ChunkedArray] = {}
        for final_name, names, typ in plan:
            if self.columns is not None and final_name not in self.columns:
                continue  # column projection (M4, Records.java:123-148)
            arrs = [image(nm) for nm in names]
            arr = arrs[0] if len(arrs) == 1 else pc.coalesce(*arrs)
            if final_name in convs:
                # logical-value decode (V1-V13 kernels; Records.java:186-271):
                # the log carries the raw source encoding, the registry the
                # declared converter + target type
                from ..functions.values import apply_converter

                arr = apply_converter(arr, convs[final_name])
            if arr.type != typ:
                arr = pc.cast(arr, typ)
            cols[final_name] = arr

        ts = self.registry.final_table(table)
        for pk in ts.primary_key:
            if pk in cols and pc.any(pc.is_null(cols[pk])).as_py():
                # no-PK rejection (SqlServerRecordConsumer.java:129-133)
                raise DeltaFailure(f"null primary key value in table {table}")

        out = pa.table(
            {
                "table": pa.array(np.full(n, ts.name)),
                **{
                    name: (
                        pc.cast(cols[name], typ)
                        if name in cols and cols[name].type != typ
                        else cols.get(name, pa.nulls(n, type=typ))
                    )
                    for name, typ in self.union_cols
                },
                "op": op,
                "lsn": batch["lsn"],
                "tx_id": batch["tx_id"],
                "ingest_ts": batch["ingest_ts"],
            }
        )
        return out

    def _dlq_write(self, batch: pa.Table, mask, reason: str) -> None:
        """Route poisoned rows to the dead-letter directory instead of
        failing the job (Debezium errors.tolerance=all + DLQ analog).
        Filenames are unique per (task, write); a retried/replayed task
        may duplicate rows, so ``read_dlq`` dedups by lsn — the DLQ is
        at-least-once by construction, the lake stays exactly-once."""
        import os
        import uuid

        import pyarrow.parquet as _pq

        bad = batch.filter(mask)
        if bad.num_rows == 0:
            return
        tbl = pa.table({
            "lsn": bad["lsn"],
            "tx_id": bad["tx_id"],
            "op": bad["op"],
            "table": bad["table"],
            "reason": pa.array(np.full(bad.num_rows, reason)),
        })
        os.makedirs(self.dlq_dir, exist_ok=True)
        mn = pc.min(bad["lsn"]).as_py() or 0
        path = os.path.join(
            self.dlq_dir, f"dlq-{mn:020d}-{uuid.uuid4().hex[:12]}.parquet")
        tmp = path + ".tmp"
        _pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    # -- main ------------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.incremental_snapshot:
            # DBLog-style chunked snapshot (Andreakis & Papapanagiotou,
            # "DBLog: A Watermark Based Change-Data-Capture Framework",
            # 2019): chunk rows carry tx_id "chunk:<low_watermark_lsn>" and
            # take the chunk's LOW watermark as their EFFECTIVE sequence —
            # any stream event past the watermark beats the chunk row in
            # LWW (the watermark-window reconciliation), while chunk rows
            # beat nothing newer. NOTE: this rewrites THE lsn column that
            # the downstream merger fences on and records as the partition
            # watermark — manifests of an incremental-snapshot lake carry
            # effective lsns. Exactly-once therefore relies on chunk-block
            # ATOMICITY for bounded replay: replicate.py forces the tx
            # fence so no block is ever split across a resume boundary
            # (a split block's tail, eff < watermark, would be fenced out).
            # Only the parquet-level read filter sees arrival lsns.
            is_chunk = pc.starts_with(batch["tx_id"], "chunk:")
            if pc.any(is_chunk).as_py():
                eff = pc.cast(
                    pc.list_element(pc.split_pattern(batch["tx_id"], ":"), 1),
                    pa.int64())
                batch = batch.set_column(
                    batch.schema.get_field_index("lsn"), "lsn",
                    pc.if_else(is_chunk, eff, batch["lsn"]))
        # op normalization + drop DDL rows and unknown ops (M5/M6)
        ops = map_ops(batch["op"])
        if self.on_error == "dlq":
            bad_op = pc.is_null(ops)
            if pc.any(bad_op).as_py():
                self._dlq_write(batch, bad_op, "unknown_op")
        batch = batch.set_column(
            batch.schema.get_field_index("op"), "op", ops
        ).filter(pc.and_kleene(pc.is_valid(ops), pc.not_equal(ops, OP_DDL)))
        if batch.num_rows == 0:
            return self._empty()

        # table rename resolution + table filter (M8)
        tables = batch["table"]
        if self.registry.table_renames:
            uniq = pc.unique(tables).to_pylist()
            mapping = {t: self.registry.resolve_table(t) for t in uniq}
            if any(k != v for k, v in mapping.items()):
                tables = pc.take(
                    pa.array([mapping[t] for t in uniq]),
                    pc.index_in(tables, pa.array(uniq)),
                )
                i = batch.schema.get_field_index("table")
                batch = batch.set_column(i, "table", tables)
        if self.table_filter is not None:
            batch = batch.filter(
                pc.is_in(batch["table"], value_set=pa.array(sorted(self.table_filter)))
            )
            if batch.num_rows == 0:
                return self._empty()

        # DML blacklist (M9): drop (table, op) pairs
        if self.dml_blacklist:
            mask = np.ones(batch.num_rows, dtype=bool)
            for t, o in self.dml_blacklist:
                m = pc.and_(pc.equal(batch["table"], t), pc.equal(batch["op"], o))
                mask &= ~m.to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(mask))
            if batch.num_rows == 0:
                return self._empty()

        # --- key extraction FIRST (2 string columns only), then the LWW
        # pre-reduction, and only THEN the full payload materialization for
        # the ~surviving rows. Building all payload columns before reducing
        # would churn every content byte of every superseded event (the
        # dominant cost at high update ratios).
        is_del = pc.equal(batch["op"], OP_DELETE)
        pk_cols = [
            pc.if_else(is_del, pc.struct_field(batch["before"], pk_col),
                       pc.struct_field(batch["after"], pk_col))
            for pk_col in self.primary_key
        ]
        # arrow-level null check: numpy object-equality misses NaN from
        # nullable numeric PKs (SqlServerRecordConsumer.java:129-133)
        null_pk = None
        for arr in pk_cols:
            m = pc.is_null(arr)
            null_pk = m if null_pk is None else pc.or_(null_pk, m)
        if pc.any(null_pk).as_py():
            if self.on_error != "dlq":
                raise DeltaFailure("null primary key value in change stream")
            # a null needed-image (insert/update without after, delete
            # without before) or null PK field: dead-letter and continue
            self._dlq_write(batch, null_pk, "null_primary_key")
            keep_m = pc.invert(null_pk)
            batch = batch.filter(keep_m)
            if batch.num_rows == 0:
                return self._empty()
            is_del = pc.equal(batch["op"], OP_DELETE)
            pk_cols = [pc.filter(a, keep_m) for a in pk_cols]
        pk_arrays = [a.to_numpy(zero_copy_only=False) for a in pk_cols]
        tb = batch["table"].to_numpy(zero_copy_only=False)

        # partition hashing uses the rename-chain ROOT table id so a key's
        # partition never moves across RENAME_TABLE (display name stays
        # current; old lake state was hashed under the root too)
        hash_tb = tb
        if self.registry.table_roots:
            roots = {t: self.registry.root_table(t) for t in np.unique(tb)}
            if any(k != v for k, v in roots.items()):
                hash_tb = pd.Series(tb).map(roots).to_numpy()
        kh = hash_key(hash_tb, *pk_arrays)
        part = self._partition(hash_tb, pk_arrays, kh)

        if self.combine and batch.num_rows > 1:
            lsn = batch["lsn"].to_numpy(zero_copy_only=False)
            keep = _lww_keep_indices(kh, lsn, (tb, *pk_arrays))
            if self.toast_fields and len(keep) < batch.num_rows:
                # keep the latest PROVIDER row per key beside the winner:
                # a sentinel winner resolves from it at the merge stage
                # (dropping it here would lose the value forever)
                from .merge import TOAST_SENTINEL

                after = batch["after"]
                if isinstance(after, pa.ChunkedArray):
                    after = after.combine_chunks()
                a_names = {after.type.field(i).name
                           for i in range(after.type.num_fields)}
                sent = np.zeros(batch.num_rows, dtype=bool)
                provider = np.ones(batch.num_rows, dtype=bool)
                for f in self.toast_fields:
                    if f not in a_names:
                        continue
                    v = pc.struct_field(after, f)
                    fs = pc.equal(pc.fill_null(pc.cast(v, pa.string()), ""),
                                  TOAST_SENTINEL).to_numpy(
                                      zero_copy_only=False).astype(bool)
                    sent |= fs
                    provider &= (pc.is_valid(v).to_numpy(
                        zero_copy_only=False).astype(bool) & ~fs)
                # providers are kept even in sentinel-free batches: a
                # LATER batch/leg may resolve through this key's base
                # tombstone, which inherits its value from the provider
                pidx = np.flatnonzero(provider)
                if len(pidx):
                    keep_p = pidx[_lww_keep_indices(
                        kh[pidx], lsn[pidx],
                        tuple(a[pidx] for a in (tb, *pk_arrays)))]
                    keep = np.union1d(keep, keep_p)
            if len(keep) < batch.num_rows:
                batch = batch.take(pa.array(keep))
                part = part[keep]

        # per-table normalization (usually exactly one table per log)
        uniq_tables = pc.unique(batch["table"]).to_pylist()
        if len(uniq_tables) == 1:
            out = self._normalize_table_slice(batch, uniq_tables[0])
        else:
            # carry the PRE-computed partition through the per-table split
            # (re-deriving from normalized output would hash post-converter
            # PK values — a different partition than raw-keyed batches)
            parts = []
            part_chunks = []
            for t in uniq_tables:
                m = pc.equal(batch["table"], t).combine_chunks()
                mnp = m.to_numpy(zero_copy_only=False).astype(bool)
                parts.append(self._normalize_table_slice(batch.filter(m), t))
                part_chunks.append(part[mnp])
            out = pa.concat_tables(parts, promote_options="default")
            part = np.concatenate(part_chunks)

        for col, fn in self.transforms.items():
            if col in out.column_names:
                i = out.column_names.index(col)
                out = out.set_column(i, col, fn(out[col]))

        if self.compute_sha and "content" in out.column_names:
            content = pc.fill_null(out["content"], "").to_pylist()
            sha = pa.array(sha256_hex(content))
            if self.toast_fields:
                # Debezium's TOAST placeholder is reserved (merge.py
                # TOAST_SENTINEL): its sha is meaningless, so the
                # sentinel propagates — the merger's carry-forward then
                # resolves content and content_sha by the same
                # per-column rule. Null content (delete images) gets a
                # NULL sha (matching SQL sha256(NULL)) so the ffill
                # skips tombstones on BOTH columns consistently.
                from .merge import TOAST_SENTINEL

                is_sent = pc.equal(pc.fill_null(out["content"], ""),
                                   TOAST_SENTINEL)
                if pc.any(is_sent).as_py():
                    sha = pc.if_else(is_sent, pa.scalar(TOAST_SENTINEL),
                                     sha)
                sha = pc.if_else(pc.is_valid(out["content"]), sha,
                                 pa.scalar(None, pa.string()))
            out = out.append_column("content_sha", sha)

        out = out.append_column("part", pa.array(part.astype(np.int64)))
        return out

    def _partition(self, tb: np.ndarray, pk_arrays: list[np.ndarray] | tuple,
                   kh: np.ndarray) -> np.ndarray:
        """Shuffle partition per event. ``repo``/``repo_salted`` modes use the
        FIRST primary-key column as the coarse locality key and the remaining
        PK columns as the salt remainder (for the default (repo, path) PK
        that is exactly per-repo partitioning with path-hash salting)."""
        if self.partition_mode == "key_hash":
            return kh % np.uint64(self.num_partitions)
        coarse = pk_arrays[0]
        rh = hash_key(tb, coarse)
        if self.partition_mode == "repo":
            return rh % np.uint64(self.num_partitions)
        if self.partition_mode == "repo_salted":
            ph = hash_key(*pk_arrays[1:])
            salt_k = np.ones(len(coarse), dtype=np.uint64)
            if self.repo_salt:
                ks = pd.Series(coarse).map(self.repo_salt).fillna(1).to_numpy()
                salt_k = ks.astype(np.uint64)
            return (rh + ph % np.maximum(salt_k, 1)) % np.uint64(self.num_partitions)
        raise ValueError(f"unknown partition_mode {self.partition_mode!r}")

    def _empty(self) -> pa.Table:
        # constant empty table with the output schema
        fields = [pa.field("table", pa.string())]
        for name, typ in self.union_cols:
            fields.append(pa.field(name, typ))
        fields += [
            pa.field("op", pa.string()),
            pa.field("lsn", pa.int64()),
            pa.field("tx_id", pa.string()),
            pa.field("ingest_ts", pa.timestamp("ms")),
        ]
        if self.compute_sha and (self.columns is None or "content" in self.columns):
            fields.append(pa.field("content_sha", pa.string()))
        fields.append(pa.field("part", pa.int64()))
        return pa.table(
            {f.name: pa.array([], type=f.type) for f in fields}
        )
