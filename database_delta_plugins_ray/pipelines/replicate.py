"""End-to-end CDC replication pipeline (the engine's main path).

Ray-Data-native equivalent of the reference's replication runtime
(SURVEY.md §3.1; MySqlEventReader.java:85-174 + MySqlRecordConsumer +
the Delta app's ordered apply):

    read_parquet(log segments, lsn > resume watermark)      # streaming
      -> map_batches(Normalizer)                            # stateless, zero-copy Arrow,
                                                            #   per-batch LWW combiner
      -> groupby("part")                                    # THE one shuffle: salted PK hash
      -> map_groups(PartitionMerger, concurrency=A)         # stateful actor pool:
                                                            #   fence + LWW + fenced commit
      -> summary rows (P rows, tiny)

The schema registry (DDL history) is built on the driver from the log's DDL
subset, broadcast via ``ray.put``, and persisted to the lake's checkpoint
dir (DBSchemaHistory analog). Resume reads per-partition manifests and
filters ``lsn > min watermark`` at the Parquet read (row-group pushdown),
with the exact per-partition fence applied inside the merger.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import ray
import ray.data

from ..stages.merge import PartitionMerger
from ..stages.normalize import Normalizer
from ..state import checkpoint as ckpt
from ..state.ddl import Registry, build_registry


def log_max_lsn(log_dir: str) -> int:
    """Max lsn across segments from Parquet footer statistics (no data
    read). Fast path: trust the generator/ingest ``meta.json`` when its
    segment list still matches the directory — skips the driver-side
    footer loop on the replay critical path entirely."""
    import pyarrow.parquet as pq

    meta_path = os.path.join(log_dir, "meta.json")
    if os.path.exists(meta_path):
        try:
            import json as _json

            with open(meta_path) as fh:
                meta = _json.load(fh)
            segs = meta.get("segments")
            if meta.get("max_lsn") is not None and segs is not None and set(
                segs
            ) == {os.path.basename(f) for f in log_files(log_dir)}:
                return int(meta["max_lsn"])
        except (OSError, ValueError, KeyError):
            pass
    mx = 0
    for f in log_files(log_dir):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("lsn")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.max is not None:
                mx = max(mx, st.max)
    return mx


def log_files(log_dir: str) -> list[str]:
    return [
        os.path.join(log_dir, f)
        for f in sorted(os.listdir(log_dir))
        if f.startswith("seg-") and f.endswith(".parquet")
    ]


#: above this many continuing transactions the fence's semi-join stops
#: broadcasting the id set and folds the whole (lsn, tx_id) projection
#: through a groupby instead — tiny rows, exact at any size.
_FENCE_BROADCAST_CAP = 1_000_000


def tx_consistent_lsn(log_dir: str, upto_lsn: int) -> int:
    """Lower ``upto_lsn`` to the last COMPLETE-transaction commit boundary.

    A transaction is COMPLETE at the bound iff none of its events lie
    past it (the reference stamps the same transactionId on every
    DMLEvent of a tx, MySqlRecordConsumer.java:209-225). The fence
    assumes NOTHING about the token's shape — engine ``prefix:start``,
    MySQL GTID ``uuid:txno``, Mongo ``lsid:txnNumber``, Oracle's opaque
    txId all work — because transaction STARTS are measured from the
    log, never parsed out of the token:

    * pass 1 (pruned ``lsn > upto_lsn`` read, columns (lsn, tx_id)
      only): the distinct ids of transactions that CONTINUE past the
      bound, shrunk per batch before the exchange;
    * pass 2 (pruned ``lsn <= upto_lsn`` read): the earliest pre-bound
      event of any continuing transaction — the bound cuts that
      transaction, so the fence drops to ``min - 1``; if no transaction
      spans the bound, the bound already sits on a commit boundary.

    Scale: the common bound sits near the log tail, so pass 1 reads a
    few row groups and its id set broadcasts (``ray.put`` once) into
    pass 2's per-batch ``is_in`` + min partial — one int per batch to
    the driver. An early bound can make the continuing set huge; past
    ``_FENCE_BROADCAST_CAP`` ids the fence switches to one full
    (lsn, tx_id) scan folded through a per-batch combiner + groupby —
    no broadcast, rows are (tx_id, min_le, any_gt) triples. DDL events
    are auto-commit (their own single-event tx) and never lower the
    fence.
    """
    import numpy as np
    import pyarrow.compute as pc

    if upto_lsn >= log_max_lsn(log_dir):
        return upto_lsn  # nothing past the bound: every tx is complete
    after = ray.data.read_parquet(
        log_files(log_dir),
        columns=["tx_id"],
        filter=pads.field("lsn") > upto_lsn,
    )

    def ids_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"tx_id": pc.unique(batch["tx_id"])})

    ids = (after.map_batches(ids_partial, batch_format="pyarrow")
           .unique("tx_id"))
    if not ids:
        return upto_lsn

    if len(ids) <= _FENCE_BROADCAST_CAP:
        id_ref = ray.put(pa.array(ids, pa.string()))

        def min_partial(batch: pa.Table) -> pa.Table:
            sel = pc.is_in(batch["tx_id"], value_set=ray.get(id_ref))
            m = pc.min(pc.filter(batch["lsn"], sel)).as_py()
            return pa.table({"s": pa.array([m], pa.int64())})

        nxt = (ray.data.read_parquet(
            log_files(log_dir),
            columns=["lsn", "tx_id"],
            filter=pads.field("lsn") <= upto_lsn,
        ).map_batches(min_partial, batch_format="pyarrow").min("s"))
        if nxt is None:
            return upto_lsn
        return min(upto_lsn, int(nxt) - 1)

    # huge continuing set: exact groupby fold over the 2-column scan
    from ray.data.aggregate import Max, Min

    big = np.int64(1 << 62)

    def span_partial(df):
        lsn = df["lsn"].to_numpy()
        le = np.where(lsn <= upto_lsn, lsn, big)
        gt = (lsn > upto_lsn).astype(np.int64)
        g = (df.assign(le=le, gt=gt)
             .groupby("tx_id", sort=False)
             .agg(le=("le", "min"), gt=("gt", "max")).reset_index())
        return g

    agg = (ray.data.read_parquet(log_files(log_dir),
                                 columns=["lsn", "tx_id"])
           .map_batches(span_partial, batch_format="pandas")
           .groupby("tx_id")
           .aggregate(Min("le", alias_name="le"),
                      Max("gt", alias_name="gt")))
    nxt = (agg.filter(lambda r: r["gt"] == 1 and r["le"] < big)
           .min("le", ignore_nulls=True))
    if nxt is None:
        return upto_lsn
    return min(upto_lsn, int(nxt) - 1)


#: log columns the DML path needs (the ``ddl`` struct is only read by the
#: driver-side registry scan — prune it at the read).
_READ_COLUMNS = ["lsn", "tx_id", "op", "table", "before", "after", "ingest_ts"]


def run_replication(
    log_dir: str,
    lake_dir: str,
    *,
    num_partitions: int = 32,
    merge_concurrency: int | None = None,
    batch_size: int = 32768,
    upto_lsn: int | None = None,
    table_filter: set[str] | None = None,
    dml_blacklist: set[tuple[str, str]] | None = None,
    columns: set[str] | None = None,
    compute_sha: bool = True,
    registry: Registry | None = None,
    override_num_blocks: int | None = None,
    partition_mode: str = "key_hash",
    repo_salt: dict[str, int] | None = None,
    primary_key: tuple[str, ...] = ("repo", "path"),
    max_delta_files: int = 4,
    connector_args: dict[str, str] | None = None,
    exchange: str = "sort",
    scatter_batch_size: int | None = None,
    fragment_buckets: int | None = None,
    normalize_parallelism: int | None = None,
    snapshot_restart: str = "continue",
    tx_consistent: bool = False,
    incremental_snapshot: bool = False,
    on_error: str = "fail",
    history: bool = False,
    toast_columns: tuple[str, ...] = (),
    transforms: dict[str, str] | None = None,
) -> dict:
    """Replay the event log into the Parquet lake; returns a lineage summary.

    Idempotent and resumable: partitions already at/beyond the log's max lsn
    are skipped via their checkpoint manifests; re-running on the same log is
    a no-op (exactly-once effect via offset fencing).

    ``exchange`` selects how normalized events reach their partition merger:

    - ``sort`` (default): ``groupby("part").map_groups`` — Ray Data's
      sort-based all-to-all. One barrier; payload moves through the object
      store.
    - ``fragment``: hash-partitioned WRITE — each normalize task appends its
      rows for partition p as a Parquet fragment under
      ``lake/_fragments/part=p/``, then one Ray task per partition merges
      its fragments into the state file. No sort barrier, no object-store
      all-to-all; on a cluster the fragment store is the shared lake
      filesystem (the Delta/Hudi-style ingest shape). Duplicate fragments
      from a crashed/restarted run are harmless: per-key LWW collapses
      identical rows, and the per-partition watermark fences replays.

    Scale trade-off: fragments-per-partition grows with the number of
    normalize output batches, so the fragment mode is ideal for
    INCREMENTAL polls (small increments -> few fragments, no barrier);
    for one-shot bulk backfills of the full 10^10-event log either keep
    the sort exchange (one amortized all-to-all) or raise ``batch_size``
    so fragment count stays O(blocks). Measured on this box the fragment
    mode wins both regimes at sf0.1 (~2x), but the file-count asymptote
    is the documented constraint.
    """
    t0 = time.time()
    #: coarse stage-level wall timings (registry build / read+normalize+
    #: scatter / fold+commit) — reported in the summary so scaling runs can
    #: show a per-stage breakdown at each parallelism level
    phases: dict = {}
    os.makedirs(lake_dir, exist_ok=True)

    if (tx_consistent or incremental_snapshot) and upto_lsn is not None:
        # never half-apply a transaction: drop the bound to the last
        # complete-tx commit boundary (a bound-less replay consumes the
        # whole log, where every tx is complete by definition). Chunked
        # snapshots REQUIRE this fence: a chunk block is atomic for
        # bounded replay — its rows carry an effective lsn (the chunk's
        # low watermark) BELOW their arrival lsn, so rows of a split
        # block would land behind the resume watermark and be fenced out
        # on the next run. Chunk tx_ids ("chunk:<low_wm>") encode their
        # block start exactly like binlog tx_ids encode the tx start, so
        # the same one-aggregate fence covers both.
        upto_lsn = tx_consistent_lsn(log_dir, upto_lsn)

    # pin the partitioning config per lake: per-partition watermarks are
    # only valid under the SAME key->partition mapping; silently changing
    # num_partitions or partition_mode between runs would mis-fence events
    import json as _json

    cfg_path = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR, "lake_config.json")
    if partition_mode == "repo_salted" and repo_salt is None and os.path.exists(cfg_path):
        with open(cfg_path) as fh:
            repo_salt = _json.load(fh).get("repo_salt")
    if partition_mode == "repo_salted" and repo_salt is None:
        # salt factors are part of the key->partition mapping: compute once
        # per lake and pin them (recomputing on a grown log would remap keys)
        repo_salt = compute_repo_salt(log_dir, num_partitions)
    lake_cfg = {"num_partitions": num_partitions, "partition_mode": partition_mode}
    if partition_mode == "repo_salted":
        lake_cfg["repo_salt"] = repo_salt
    if os.path.exists(cfg_path):
        with open(cfg_path) as fh:
            stored = _json.load(fh)
        if stored != lake_cfg:
            raise ValueError(
                f"lake at {lake_dir} was written with partitioning config "
                f"{stored}, got {lake_cfg}; use the stored config or a new "
                "lake directory (re-partitioning requires a full rebuild)"
            )
    else:
        os.makedirs(os.path.dirname(cfg_path), exist_ok=True)
        tmp = cfg_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            _json.dump(lake_cfg, fh)
        os.replace(tmp, cfg_path)

    snapshot_restarted = False
    if snapshot_restart == "wipe":
        # mid-snapshot restart semantics (MySqlEventReader.java:144-155 /
        # SqlServerEventReader.java:142-154): a lake with partition commits
        # but NO completed run (the global watermark is written only after
        # a successful run) is a crash inside the initial snapshot — all
        # snapshot events share one offset, so a resume cannot position
        # inside the snapshot; wipe the DDL history and partition state
        # and restart the snapshot from scratch.
        if (ckpt.all_manifests(lake_dir)
                and ckpt.read_global_watermark(lake_dir) == 0):
            _wipe_lake_state(lake_dir)
            snapshot_restarted = True
    elif snapshot_restart != "continue":
        raise ValueError(f"unknown snapshot_restart mode {snapshot_restart!r}")

    watermark = ckpt.min_watermark(lake_dir, num_partitions)
    t_reg = time.time()
    if registry is None:
        # incremental registry on resume: replay the persisted DDL history
        # (DBSchemaHistory.java:91-95 analog) and scan only segments newer
        # than the watermark for further DDLs — no full-log rescan
        hist = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR, "schema_history.jsonl")
        if watermark and os.path.exists(hist):
            base = Registry.load(hist)
            hist_lsn = max((r["lsn"] for r in base.history), default=0)
            registry = build_registry(
                log_dir, upto_lsn, base=base, after_lsn=max(watermark, hist_lsn)
            )
        else:
            registry = build_registry(log_dir, upto_lsn)
    if connector_args:
        # pass-through connector knobs (binary.handling.mode etc.) rewrite
        # column types/converters before broadcast (MySqlEventReader.java:135-138)
        from ..sources.source import apply_connector_args

        apply_connector_args(registry, connector_args)
    phases["registry_build_s"] = round(time.time() - t_reg, 3)
    reg_ref = ray.put(registry)
    if watermark:
        # fully caught up? footer-stats check — skips the whole job when an
        # incremental poll finds no new events past every partition watermark
        mx = log_max_lsn(log_dir)
        if (upto_lsn is not None and watermark >= upto_lsn) or watermark >= mx:
            ms = ckpt.all_manifests(lake_dir)
            return {
                "partitions": len(ms),
                "events_in": 0,
                "events_applied": 0,
                "rows": sum(m["rows"] for m in ms.values()),
                "live_rows": sum(m["live_rows"] for m in ms.values()),
                "last_lsn": max((m["last_lsn"] for m in ms.values()), default=watermark),
                "wall_s": time.time() - t0,
                "events_per_s": 0.0,
                "resume_watermark": watermark,
            }
    flt = None
    if watermark:
        flt = pads.field("lsn") > watermark
    if upto_lsn is not None:
        c = pads.field("lsn") <= upto_lsn
        flt = c if flt is None else (flt & c)

    files = log_files(log_dir)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    if override_num_blocks is None:
        # Ray's default targets ~200 read output blocks regardless of size;
        # hundreds of tiny blocks make the sort shuffle latency-bound
        # (observed 4x slowdown). Aim for ~2 blocks per CPU instead; large
        # logs still split via target_max_block_size downstream.
        override_num_blocks = max(2 * cpus, min(len(files), 4 * cpus))
    ds = ray.data.read_parquet(
        files,
        columns=_READ_COLUMNS,
        filter=flt,
        override_num_blocks=override_num_blocks,
    )
    # Normalize runs as STATELESS tasks (elastic, no reserved slots): the
    # callable instance (registry included — it is tiny) is serialized once
    # with the transform and cached per worker. An actor pool here would
    # compete with the merger pool for CPU slots and can starve the read
    # stage on small nodes.
    if columns is not None:
        # force-include every table's primary-key columns: a projection that
        # dropped a PK column would break the LWW key downstream (the
        # reference always retains PK columns under projection,
        # Records.java:123-148)
        pks = {pk for ts in registry.tables.values() for pk in ts.primary_key}
        columns = set(columns) | pks
    norm = Normalizer(
        registry,
        num_partitions,
        table_filter=table_filter,
        dml_blacklist=dml_blacklist,
        columns=columns,
        compute_sha=compute_sha,
        partition_mode=partition_mode,
        repo_salt=repo_salt,
        primary_key=primary_key,
        incremental_snapshot=incremental_snapshot,
        on_error=on_error,
        dlq_dir=(os.path.join(lake_dir, "_dlq") if on_error == "dlq" else None),
        toast_fields=tuple(toast_columns),
        transforms=transforms,
    )
    # Bandwidth-wall cap: this string-heavy normalize saturates a node's
    # memory bus near ~16 concurrent tasks (BASELINE.md: 8-16 CPUs beat 32
    # wall-clock on one box). Cap concurrent normalize tasks at 16 PER NODE
    # by raising per-task num_cpus — surplus cores go to the read stage and
    # the merger pool instead of thrashing the bus. A real multi-node
    # cluster adds a bus per node, so the cap scales with node count.
    if normalize_parallelism is None:
        nodes = len([n for n in ray.nodes() if n.get("Alive", True)]) or 1
        normalize_parallelism = 16 * nodes
    norm_task_cpus = max(1, round(cpus / normalize_parallelism))
    ds = ds.map_batches(
        norm,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        num_cpus=norm_task_cpus,
    )

    payload_columns = _payload_columns(registry, columns, compute_sha)
    if (toast_columns and "content" in toast_columns and compute_sha
            and "content_sha" not in toast_columns):
        # the derived sha column rides the sentinel with content
        # (normalize propagates TOAST_SENTINEL into content_sha), so it
        # carries forward by the same per-column rule
        toast_columns = (*toast_columns, "content_sha")
    if merge_concurrency is None:
        # leave headroom for read/normalize/shuffle tasks next to the pool
        merge_concurrency = max(1, min(num_partitions, cpus - 1))
    if exchange == "fragment":
        rows = _fragment_exchange(
            ds, lake_dir, reg_ref, payload_columns,
            key_columns=("table", *primary_key),
            max_delta_files=max_delta_files,
            upto_lsn=upto_lsn,
            phases=phases,
            num_partitions=num_partitions,
            scatter_batch_size=scatter_batch_size or max(4 * batch_size, 131072),
            fragment_buckets=fragment_buckets,
            keep_history=history,
            toast_columns=toast_columns,
        )
    else:
        # autoscaling pool (1, N): a fixed pool would pre-start N actors that
        # RESERVE N CPUs while idling behind the Sort barrier, starving the
        # read/normalize stages (observed: 31 idle actors pinning 31/32 CPUs)
        summary_ds = ds.groupby("part").map_groups(
            PartitionMerger,
            fn_constructor_args=(lake_dir, reg_ref, payload_columns),
            fn_constructor_kwargs=dict(
                key_columns=("table", *primary_key),
                max_delta_files=max_delta_files, keep_history=history,
                toast_columns=toast_columns,
            ),
            batch_format="pyarrow",
            concurrency=(1, merge_concurrency),
        )
        rows = summary_ds.take_all()

    registry.save(os.path.join(lake_dir, ckpt.CHECKPOINT_DIR, "schema_history.jsonl"))
    # lake-level consumed-log watermark: every event <= this is now applied,
    # including in partitions that received no events (no manifest). Lets
    # the next poll's read pushdown skip the whole consumed prefix.
    consumed = upto_lsn if upto_lsn is not None else log_max_lsn(log_dir)
    ckpt.write_global_watermark(lake_dir, max(watermark, consumed))

    # partitions with no new events this run emit no group: fold their
    # manifest totals in so rows/live_rows report the whole lake
    seen_parts = {r["part"] for r in rows}
    absent = [m for p, m in ckpt.all_manifests(lake_dir).items() if p not in seen_parts]
    wall = time.time() - t0
    applied = sum(r["events_applied"] for r in rows)
    return {
        "partitions": len(rows) + len(absent),
        "events_in": sum(r["events_in"] for r in rows),
        "events_applied": applied,
        "rows": sum(r["rows"] for r in rows) + sum(m["rows"] for m in absent),
        "live_rows": sum(r["live_rows"] for r in rows) + sum(m["live_rows"] for m in absent),
        "last_lsn": max(
            max((r["last_lsn"] for r in rows), default=watermark),
            max((m["last_lsn"] for m in absent), default=0),
        ),
        "wall_s": wall,
        "events_per_s": applied / wall if wall > 0 else 0.0,
        "resume_watermark": watermark,
        "snapshot_restarted": snapshot_restarted,
        "phases": phases,
    }


def _wipe_lake_state(lake_dir: str) -> None:
    """Wipe-and-restart support (the DBSchemaHistory wipe analog,
    MySqlEventReader.java:149-155): delete partition state files +
    manifests, the persisted schema history, the stray fragments of the
    crashed run — keep the pinned partitioning config (lake_config)."""
    import glob as _glob
    import shutil as _shutil

    for m in ckpt.all_manifests(lake_dir).values():
        for f in (m.get("files") or [m["file"]]):
            try:
                os.remove(f)
            except OSError:
                pass
    # history mode retains superseded versions outside any manifest
    for f in _glob.glob(os.path.join(lake_dir, "part=*", "data-*.parquet")):
        try:
            os.remove(f)
        except OSError:
            pass
    cdir = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR)
    for p in _glob.glob(os.path.join(cdir, "part-*.json")):
        os.remove(p)
    for p in _glob.glob(os.path.join(cdir, "part-*.log.jsonl")):
        os.remove(p)  # retained-version history restarts with the snapshot
    hpath = os.path.join(cdir, "history_horizon.json")
    if os.path.exists(hpath):
        os.remove(hpath)
    hist = os.path.join(cdir, "schema_history.jsonl")
    if os.path.exists(hist):
        os.remove(hist)
    _shutil.rmtree(os.path.join(lake_dir, "_fragments"), ignore_errors=True)


def _fragment_exchange(ds, lake_dir: str, reg_ref, payload_columns,
                       key_columns: tuple[str, ...],
                       max_delta_files: int,
                       upto_lsn: int | None = None,
                       phases: dict | None = None,
                       num_partitions: int = 32,
                       scatter_batch_size: int = 131072,
                       fragment_buckets: int | None = None,
                       keep_history: bool = False,
                       toast_columns: tuple[str, ...] = ()) -> list[dict]:
    """Hash-partitioned-write exchange: normalized batches append
    partition-bucketed Parquet fragments (parallel, barrier-free), then one
    Ray task per partition folds its rows into the fenced partition state.

    File-count control (the bulk-backfill asymptote): fragments are written
    per (scatter batch, BUCKET), not per (normalize batch, partition) —

    * scatter batches are COARSENED (``scatter_batch_size`` rows, default
      4x the normalize batch) so Ray Data buffers several normalize outputs
      into one write call;
    * when num_partitions is large, partitions share range buckets
      (``fragment_buckets``, default min(P, 64)): one file per batch per
      bucket instead of per partition. Each batch is sorted by ``part``
      once and sliced; every partition's rows are written as their own
      parquet ROW GROUPS, so a fold task reading ``part == p`` prunes to
      its row groups from footer statistics without scanning neighbors.

    Total files: O(rows / scatter_batch x buckets) — at P=1024 that is
    ~64x fewer than the per-(batch, partition) layout. When P <= 64 the
    bucket layout is byte-identical to one-dir-per-partition.

    Fragment names are derived from the batch's lsn range, so a replayed
    batch overwrites rather than duplicates; duplicates that DO survive a
    crash are collapsed by the merger's exact per-key LWW (identical rows),
    and rows at-or-below the partition watermark are fenced — the
    effectively-once contract is unchanged."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    frag_root = os.path.join(lake_dir, "_fragments")
    n_buckets = fragment_buckets or min(num_partitions, 64)

    def bucket_of(p: int) -> int:
        # range bucketing keeps sorted-by-part slices contiguous per file
        return p * n_buckets // num_partitions

    _COUNT_SCHEMA = pa.schema([("part", pa.int64()), ("rows", pa.int64())])

    def write_frags(batch: "pa.Table") -> "pa.Table":
        if batch.num_rows == 0:
            return pa.table({"part": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())},
                            schema=_COUNT_SCHEMA)
        # ONE sort by part, then contiguous slices — no O(P) filter scans
        batch = batch.take(pc.sort_indices(batch["part"]))
        parts_np = batch["part"].to_numpy()
        bounds = np.flatnonzero(np.diff(parts_np)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(parts_np)]])
        lsn_lo = int(pc.min(batch["lsn"]).as_py())
        lsn_hi = int(pc.max(batch["lsn"]).as_py())

        parts, rows = [], []
        writer = None
        cur_bucket = -1
        tmp = final = None
        pending: list[tuple[str, str]] = []
        n_files = 0
        for s, e in zip(starts, ends):
            p = int(parts_np[s])
            b = bucket_of(p)
            if b != cur_bucket:
                if writer is not None:
                    writer.close()
                    pending.append((tmp, final))
                d = os.path.join(frag_root, f"part={b:05d}")
                os.makedirs(d, exist_ok=True)
                name = (f"frag-{lsn_lo:020d}-{lsn_hi:020d}-"
                        f"{batch.num_rows}.parquet")
                final = os.path.join(d, name)
                tmp = final + f".tmp.{os.getpid()}"
                writer = pq.ParquetWriter(tmp, batch.schema)
                cur_bucket = b
                n_files += 1
            # one write_table call per partition slice = its own row
            # group(s): footer part-stats make per-partition fold reads
            # prune exactly
            writer.write_table(batch.slice(s, e - s))
            parts.append(p)
            rows.append(e - s)
        if writer is not None:
            writer.close()
            pending.append((tmp, final))
        for t, f in pending:
            os.replace(t, f)
        return pa.table({"part": pa.array(parts + [-1], pa.int64()),
                         "rows": pa.array(rows + [n_files], pa.int64())},
                        schema=_COUNT_SCHEMA)

    # leftover fragments from a crashed run must be folded in too (their
    # rows are fence-filtered or re-applied idempotently); bucket dirs may
    # hold rows of several partitions — the part column says which
    import glob as _glob0

    leftovers: set[int] = set()
    for d in _glob0.glob(os.path.join(frag_root, "part=*")):
        # half-written tmp files from a killed run are dead by definition
        for t in _glob0.glob(os.path.join(d, "*.tmp.*")):
            try:
                os.remove(t)
            except OSError:
                pass
        lf = _glob0.glob(os.path.join(d, "frag-*.parquet"))
        if lf:
            pcol = pads.dataset(lf, format="parquet").to_table(
                columns=["part"])["part"]
            leftovers.update(pc.unique(pcol).to_pylist())

    t_scatter = time.time()
    frag_counts = ds.map_batches(
        write_frags, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=scatter_batch_size,
    ).take_all()
    touched = sorted({r["part"] for r in frag_counts if r["part"] >= 0}
                     | leftovers)
    if phases is not None:
        phases["read_normalize_scatter_s"] = round(time.time() - t_scatter, 3)
        phases["fragment_files"] = sum(
            r["rows"] for r in frag_counts if r["part"] == -1)

    # snapshot the files each fold reads; the driver deletes exactly this
    # snapshot after ALL folds complete (buckets are shared between
    # partitions, so per-fold deletion would race)
    files_by_bucket = {
        b: sorted(_glob0.glob(os.path.join(
            frag_root, f"part={b:05d}", "frag-*.parquet")))
        for b in sorted({bucket_of(p) for p in touched})
    }

    @ray.remote(num_cpus=1)
    def merge_part(part: int, files: list[str]) -> dict | None:
        merger = PartitionMerger(
            lake_dir, reg_ref, payload_columns,
            key_columns=key_columns, max_delta_files=max_delta_files,
            keep_history=keep_history, toast_columns=toast_columns,
        )
        # row-group pruned read: only this partition's row groups leave
        # storage (slices were written part-aligned; leftover files from
        # older layouts still filter correctly, just without pruning)
        tables = [
            pq.read_table(f, filters=[("part", "=", part)]) for f in files
        ]
        # promote: leftover fragments from a crashed run may carry a
        # different column order / schema vintage
        group = pa.concat_tables(tables, promote_options="default")
        if upto_lsn is not None:
            # leftover fragments from a crashed FULLER run may carry events
            # past this run's requested horizon — honor upto_lsn strictly
            # (dropped rows re-enter via the log read once the horizon moves)
            group = group.filter(pc.less_equal(group["lsn"], upto_lsn))
        return merger(group).to_pylist()[0] if group.num_rows else None

    t_fold = time.time()
    rows = [r for r in ray.get([
        merge_part.remote(p, files_by_bucket[bucket_of(p)]) for p in touched
    ]) if r is not None]
    if phases is not None:
        phases["fold_commit_s"] = round(time.time() - t_fold, 3)
    # fragments are consumed: delete the snapshot, drop empty dirs (files
    # landed by a concurrent writer — not a supported mode — would survive)
    for files in files_by_bucket.values():
        for f in files:
            try:
                os.remove(f)
            except OSError:
                pass
    for b in files_by_bucket:
        try:
            os.rmdir(os.path.join(frag_root, f"part={b:05d}"))
        except OSError:
            pass
    return rows


# ---------------------------------------------------------------------------
# continuous tail (follow mode)
# ---------------------------------------------------------------------------

#: graceful-stop request marker inside the lake checkpoint dir — the
#: cross-process analog of the reference's StopContext signal
#: (EventReader.stop, MySqlEventReader.java:176-185)
_STOP_FILE = "STOP"


def request_stop(lake_dir: str) -> None:
    """Ask a running follow loop on this lake to stop gracefully. The loop
    finishes its current poll, runs one final drain (flush-on-stop), then
    exits and consumes the marker — the StopContext analog."""
    d = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, _STOP_FILE + f".tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        fh.write(str(time.time()))
    os.replace(tmp, os.path.join(d, _STOP_FILE))


def _stop_file(lake_dir: str) -> str:
    return os.path.join(lake_dir, ckpt.CHECKPOINT_DIR, _STOP_FILE)


def follow_replication(
    log_dir: str,
    lake_dir: str,
    *,
    poll_interval_s: float = 1.0,
    max_polls: int | None = None,
    idle_polls_to_stop: int | None = None,
    stop_event=None,
    on_poll=None,
    pre_poll=None,
    post_commit=None,
    **repl_kwargs,
) -> dict:
    """Continuous-tail mode: poll the log directory until stopped — the
    long-lived replication job the reference runs (EventReader.start/stop
    lifecycle, MySqlEventReader.java:85-185; offset flush interval analog
    is ``poll_interval_s``, :106).

    Each poll is a full incremental ``run_replication``: new segments (or
    new events in existing segments past the watermark) are drained; a
    caught-up poll is a footer-stats no-op (~tens of ms). Stop paths:

    * ``stop_event`` (``threading.Event``) — in-process graceful stop
      (the CLI wires SIGINT/SIGTERM to it);
    * ``request_stop(lake_dir)`` — cross-process graceful stop marker;
    * ``max_polls`` / ``idle_polls_to_stop`` — bounded runs for tests
      and batch drains.

    Graceful stop FLUSHES: when a stop is observed, one final poll drains
    everything that appeared since the previous poll before returning
    (the reference's shutdownNow + 2-minute-await drain,
    MySqlEventReader.java:176-185). A SIGKILL instead is the crash case:
    the next follow/replication run resumes exactly-once off the
    watermark fences — no flush needed for correctness, only latency.

    ``pre_poll`` — callable ``fn() -> Any`` invoked before EVERY poll's
    ``run_replication`` (including the final flush poll): the ingest
    hook that brings the log directory itself current first — e.g.
    ``tail_jsonl_segments`` converting a growing Debezium JSONL feed.
    Runs on the driver, so it never races the poll's readers.

    ``post_commit`` — list of callables ``fn(lake_dir) -> Any`` invoked
    after every poll that APPLIED events (and after the final flush
    poll): the hook point that keeps DERIVED artifacts following the
    lake — IVM views (``ivm.maintain_view``), the full-text index
    (``LakeTextIndex.refresh``), incremental exports. Hooks run on the
    driver between polls; each is itself incremental and exactly-once
    off its own fences, so a crash between the lake commit and a hook
    re-runs the hook idempotently on the next poll.

    Returns a summary: polls run, events applied, last lsn, stop reason.
    """
    import threading

    if stop_event is None:
        stop_event = threading.Event()
    polls = 0
    applied = 0
    idle = 0
    last: dict = {}
    stopped_by = "max_polls"
    while True:
        stopping = stop_event.is_set() or os.path.exists(_stop_file(lake_dir))
        if pre_poll is not None:
            pre_poll()
        s = run_replication(log_dir, lake_dir, **repl_kwargs)
        polls += 1
        applied += s["events_applied"]
        idle = idle + 1 if s["events_applied"] == 0 else 0
        last = s
        if on_poll is not None:
            on_poll(s)
        if post_commit and s["events_applied"]:
            for hook in post_commit:
                hook(lake_dir)
        if stopping:
            # this poll WAS the flush: everything visible at stop time
            # is applied and fenced
            stopped_by = ("stop_event" if stop_event.is_set()
                          else "stop_file")
            break
        if max_polls is not None and polls >= max_polls:
            stopped_by = "max_polls"
            break
        if idle_polls_to_stop is not None and idle >= idle_polls_to_stop:
            stopped_by = "idle"
            break
        stop_event.wait(poll_interval_s)
    try:
        os.remove(_stop_file(lake_dir))  # consume the request, if any
    except OSError:
        pass
    return {
        "polls": polls,
        "events_applied": applied,
        "rows": last.get("rows", 0),
        "live_rows": last.get("live_rows", 0),
        "last_lsn": last.get("last_lsn", 0),
        "stopped_by": stopped_by,
    }


def _payload_columns(registry: Registry, columns, compute_sha: bool) -> list[str]:
    out = [c for c, _t in registry.union_columns(columns)]
    if compute_sha and "content" in out:
        out.append("content_sha")
    return out


def compute_repo_salt(log_dir: str, num_partitions: int,
                      sample_rows: int = 200_000) -> dict[str, int]:
    """Per-repo salt factor from event-count stats (SURVEY.md §4 skew rule):
    a repo that would overflow its fair share of a partition is split across
    ``k = ceil(share / fair_share)`` sub-partitions by path hash. A small
    Ray pre-pass: per-batch partial counts -> tiny groupby.

    The pre-pass SAMPLES ``sample_rows`` events rather than scanning the
    whole log — hot-key detection only needs approximate shares, and repo
    popularity is assumed stationary across the log (documented
    assumption; pass ``sample_rows=0`` for an exact full scan). The salt
    is computed once per lake and pinned in lake_config."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    files = log_files(log_dir)
    per_file_cap = max(1, sample_rows // max(1, len(files))) if sample_rows else 0

    def per_file(batch: pa.Table) -> pa.Table:
        # nested-column pruned read: only op + the repo struct fields leave
        # storage (dotted projection; content is never read)
        import pyarrow.dataset as pads

        parts = []
        for f in batch["file"].to_pylist():
            scanner = pads.dataset(f, format="parquet").scanner(
                columns={"op": pads.field("op"),
                         "b_repo": pads.field("before", "repo"),
                         "a_repo": pads.field("after", "repo")}
            )
            t = scanner.head(per_file_cap) if per_file_cap else scanner.to_table()
            t = t.filter(pc.not_equal(t["op"], "DDL"))
            repo = pc.if_else(pc.equal(t["op"], "D"), t["b_repo"], t["a_repo"])
            g = pa.table({"repo": repo}).group_by("repo").aggregate(
                [("repo", "count")]
            )
            parts.append(pa.table({"repo": g["repo"], "n": g["repo_count"]}))
        return pa.concat_tables(parts)

    agg = (
        ray.data.from_items([{"file": f} for f in files])
        .map_batches(per_file, batch_format="pyarrow", batch_size=1)
        .groupby("repo")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    total = sum(r["n"] for r in agg) or 1
    fair = total / num_partitions
    return {r["repo"]: int(np.ceil(r["n"] / fair)) for r in agg if r["n"] > fair}


# ---------------------------------------------------------------------------
# lake readers
# ---------------------------------------------------------------------------


def lake_files(lake_dir: str) -> list[str]:
    return [f for m in ckpt.all_manifests(lake_dir).values()
            for f in (m.get("files") or [m["file"]])]


def read_lake(lake_dir: str, columns: list[str] | None = None,
              as_of_lsn: int | None = None,
              predicate=None, _manifests: dict | None = None
              ) -> "ray.data.Dataset":
    """The lake as a Ray Dataset (includes soft-deleted rows, like the
    reference target table — filter ``_is_deleted`` for final state).

    Partitions carrying delta commits (manifest lists base + delta files)
    are reduced at read time: one task per partition reads its files and
    keeps the max-``_sequence_num`` row per key — no shuffle, the commit
    layout already co-locates each key's files.

    ``as_of_lsn`` (time travel, requires a lake replicated with
    ``history=True``): each partition resolves to its latest RETAINED
    version with ``last_lsn <= as_of_lsn`` — commit-granularity
    reconstruction of an earlier state, Delta-Lake-style. A partition
    with no commit at/below the position simply contributes no rows
    (it did not exist yet).

    ``predicate`` (a ``pyarrow.dataset`` expression): pushed into the
    parquet scan — row-group footer statistics prune the read, which is
    what OPTIMIZE's clustered rewrite exists for. Pushdown is only
    legal where a key appears ONCE per file: single-file partitions
    push down fully; partitions carrying delta commits must LWW-reduce
    FIRST and filter after (an old version of a key may match the
    predicate while the current one does not — pushing down would
    resurrect it), which this function handles per partition."""
    if _manifests is not None:
        # caller pre-pruned the partition set (e.g. the Bloom skipping
        # index); an empty dict legitimately means "nothing can match"
        manifests = _manifests
        if not manifests:
            return ray.data.from_items([]).map_batches(lambda t: t)
    elif as_of_lsn is not None:
        horizon = ckpt.history_horizon(lake_dir)
        if as_of_lsn < horizon:
            raise ValueError(
                f"as_of_lsn {as_of_lsn} predates the history retention "
                f"horizon {horizon} (vacuum_history pruned those versions)")
        manifests = ckpt.all_manifests_as_of(lake_dir, as_of_lsn)
        if not manifests:
            raise FileNotFoundError(
                f"no retained version at/below lsn {as_of_lsn} under "
                f"{lake_dir} (was the lake replicated with history=True, "
                "or did vacuum_history prune past this position?)")
    else:
        manifests = ckpt.all_manifests(lake_dir)
    if not manifests:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")
    multi = [m for m in manifests.values() if len(m.get("files") or ()) > 1]
    if not multi:
        return ray.data.read_parquet(
            [m["file"] for m in manifests.values()], columns=columns,
            filter=predicate,
        )

    from ..model import SEQUENCE_NUM
    from ..stages.merge import exact_lww_indices

    items = [
        {
            "files": m.get("files") or [m["file"]],
            "key_columns": m.get("key_columns") or ["table", "repo", "path"],
        }
        for m in manifests.values()
    ]

    def load(batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        out = []
        for row in batch.to_pylist():
            keys = tuple(row["key_columns"])
            read_cols = None
            if columns is not None:
                read_cols = list(dict.fromkeys([*columns, *keys, SEQUENCE_NUM]))
            single = len(row["files"]) <= 1
            if not single and predicate is not None:
                # the in-memory post-reduce filter needs the predicate's
                # columns present, and expressions don't expose their
                # field names — read the delta partition whole (OPTIMIZE
                # folds it to the pushdown-eligible single-file layout)
                read_cols = None
            if single and predicate is not None:
                # each key appears once: pushdown is exact and prunes
                # row groups via footer stats
                t = pa.concat_tables(
                    [pads.dataset(f, format="parquet").to_table(
                        columns=read_cols, filter=predicate)
                     for f in row["files"]],
                    promote_options="default",
                )
            else:
                t = pa.concat_tables(
                    [pq.read_table(f, columns=read_cols)
                     for f in row["files"]],
                    promote_options="default",
                )
            if not single:
                idx = exact_lww_indices(t, keys, SEQUENCE_NUM)
                if len(idx) < t.num_rows:
                    t = t.take(pa.array(idx))
                if predicate is not None:
                    # filter AFTER the reduce: an old version matching
                    # the predicate must never resurrect a key whose
                    # current version does not
                    t = pads.dataset(t).to_table(filter=predicate)
            if columns is not None:
                t = t.select(columns)
            out.append(t)
        return pa.concat_tables(out, promote_options="default")

    return ray.data.from_items(items).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )


def route_parts(cfg: dict, tb: np.ndarray, pk: list[np.ndarray]) -> np.ndarray:
    """Vectorized key->partition routing from a pinned lake config
    (the Normalizer's exact math). ``tb`` must already be root-resolved
    table names; ``pk`` is the remaining key columns in key order."""
    from ..stages.normalize import hash_key

    nparts = np.uint64(cfg["num_partitions"])
    mode = cfg.get("partition_mode", "key_hash")
    if mode == "key_hash":
        return (hash_key(tb, *pk) % nparts).astype(np.int64)
    rh = hash_key(tb, pk[0])
    if mode == "repo":
        return (rh % nparts).astype(np.int64)
    if mode == "repo_salted":
        ph = hash_key(*pk[1:])
        salt = cfg.get("repo_salt") or {}
        ks = np.array([max(1, int(salt.get(r, 1))) for r in pk[0]], np.uint64)
        return ((rh + ph % ks) % nparts).astype(np.int64)
    raise ValueError(f"unknown partition_mode {mode!r}")


def partition_of_keys(lake_dir: str, keys: list[tuple]) -> np.ndarray:
    """Exact shuffle-partition id for each key tuple (in the lake's
    key_columns order, default ``(table, repo, path)``), reproducing the
    Normalizer's routing from the lake's pinned partitioning config:
    mode + num_partitions (+ per-repo salt factors) come from
    ``lake_config.json``; table names resolve to their ROOT (rename
    history) exactly as events were hashed."""
    import json as _json

    cfg_path = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR, "lake_config.json")
    with open(cfg_path) as fh:
        cfg = _json.load(fh)
    hist = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR, "schema_history.jsonl")
    roots = Registry.load(hist).table_roots if os.path.exists(hist) else {}
    tb = np.array([roots.get(k[0], k[0]) for k in keys])
    pk = [np.array([k[i] for k in keys]) for i in range(1, len(keys[0]))]
    return route_parts(cfg, tb, pk)


def lookup_keys(lake_dir: str, keys: list[tuple],
                columns: list[str] | None = None) -> pa.Table:
    """Point lookup: the current live row for each key, reading ONLY the
    partitions the keys route to — O(touched partitions), independent of
    lake size (the key-hash layout is the lake's primary index). Keys are
    tuples in the lake's key_columns order (default (table, repo, path));
    absent keys and soft-deleted rows return no row.

    One Ray task per touched partition reads that partition's manifest
    files with key-column predicate pushdown (dictionary/row-group
    pruning), LWW-reduces delta commits, then exact-filters to the
    requested tuples."""
    from ..model import IS_DELETED, SEQUENCE_NUM
    from ..stages.merge import exact_lww_indices

    if not keys:
        raise ValueError("no keys given")
    manifests = ckpt.all_manifests(lake_dir)
    if not manifests:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")
    any_m = next(iter(manifests.values()))
    key_cols = list(any_m.get("key_columns") or ["table", "repo", "path"])
    if any(len(k) != len(key_cols) for k in keys):
        raise ValueError(f"keys must be {tuple(key_cols)} tuples")
    parts = partition_of_keys(lake_dir, keys)
    by_part: dict[int, list[tuple]] = {}
    for k, p in zip(keys, parts):
        by_part.setdefault(int(p), []).append(k)

    @ray.remote(num_cpus=1)
    def fetch(m: dict, want: list[tuple]) -> "pa.Table":
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        files = m.get("files") or [m["file"]]
        # pushdown: per-column IN-set conjunction (a superset of the
        # requested tuples; exact tuple filter follows)
        flt = [(c, "in", sorted({k[i] for k in want}))
               for i, c in enumerate(key_cols)]
        t = pa.concat_tables(
            [pq.read_table(f, filters=flt) for f in files],
            promote_options="default",
        )
        if len(files) > 1 and t.num_rows:
            idx = exact_lww_indices(t, tuple(key_cols), SEQUENCE_NUM)
            if len(idx) < t.num_rows:
                t = t.take(pa.array(idx))
        if t.num_rows:
            rows = set(want)
            mask = [tuple(t[c][i].as_py() for c in key_cols) in rows
                    for i in range(t.num_rows)]
            t = t.filter(pa.array(mask))
            t = t.filter(pc.invert(t[IS_DELETED]))
        return t

    futs = [fetch.remote(manifests[p], want)
            for p, want in by_part.items() if p in manifests]
    tables = [t for t in ray.get(futs) if t.num_rows]
    if not tables:
        empty = pa.table({})
        return empty
    out = pa.concat_tables(tables, promote_options="default")
    return out.select(columns) if columns is not None else out


def read_lake_snapshot(lake_dir: str,
                       columns: list[str] | None = None) -> "ray.data.Dataset":
    """Snapshot-isolated read of a ``history=True`` lake: pin the global
    watermark ONCE, then resolve every partition to its retained version
    at/below it. A plain ``read_lake`` lists current manifests while a
    concurrent run may be committing partition by partition — mixing
    pre- and post-commit partitions in one result; this read is
    transactionally consistent at the pinned position (and repeatable:
    two snapshot reads during the same concurrent commit see the same
    state)."""
    wm = ckpt.read_global_watermark(lake_dir)
    if wm == 0:
        raise FileNotFoundError(
            f"no completed run recorded under {lake_dir} (global "
            "watermark absent) — nothing to snapshot")
    return read_lake(lake_dir, columns=columns, as_of_lsn=wm)


def lake_diff(lake_dir: str, from_lsn: int,
              to_lsn: int | None = None) -> "ray.data.Dataset":
    """Change data feed between two retained lake versions (the Delta
    Lake CDF shape, enabled by ``history=True``): one row per key whose
    LIVE state differs between the version at ``from_lsn`` and the
    version at ``to_lsn`` (current state when None) —
    ``change`` = 'c' (created), 'u' (updated: different winning
    ``_sequence_num``), 'd' (deleted); new-side payload columns are null
    on 'd'.

    No shuffle: both versions of a key live in the SAME partition
    directory (pinned partitioning config), so one task per partition
    outer-merges its two file sets vectorized. A partition with no
    retained version at/below ``from_lsn`` did not exist yet — all its
    current keys surface as 'c'."""
    from ..model import IS_DELETED, SEQUENCE_NUM
    from ..stages.merge import exact_lww_indices

    horizon = ckpt.history_horizon(lake_dir)
    if from_lsn < horizon:
        raise ValueError(
            f"from_lsn {from_lsn} predates the history retention horizon "
            f"{horizon} (vacuum_history pruned those versions)")
    new_manifests = (ckpt.all_manifests(lake_dir) if to_lsn is None
                     else ckpt.all_manifests_as_of(lake_dir, to_lsn))
    if not new_manifests:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")
    items = []
    for part, nm in new_manifests.items():
        om = ckpt.manifest_as_of(lake_dir, part, from_lsn)
        items.append({
            "new_files": nm.get("files") or [nm["file"]],
            "old_files": (om.get("files") or [om["file"]]) if om else [],
            "key_columns": list(nm.get("key_columns")
                                or ["table", "repo", "path"]),
        })

    def diff(batch: pa.Table) -> pa.Table:
        import pandas as _pd
        import pyarrow.compute as _pc
        import pyarrow.parquet as pq

        out = []
        for row in batch.to_pylist():
            keys = tuple(row["key_columns"])

            def live(files):
                if not files:
                    return None
                t = pa.concat_tables([pq.read_table(f) for f in files],
                                     promote_options="default")
                if len(files) > 1 and t.num_rows:
                    idx = exact_lww_indices(t, keys, SEQUENCE_NUM)
                    if len(idx) < t.num_rows:
                        t = t.take(pa.array(idx))
                return t.filter(_pc.invert(t[IS_DELETED])).to_pandas()

            new = live(row["new_files"])
            old = live(row["old_files"])
            if old is None:
                old = new.iloc[0:0]
            m = new.merge(old[[*keys, SEQUENCE_NUM]], on=list(keys),
                          how="outer", suffixes=("", "__old"),
                          indicator=True)
            oldseq = m[SEQUENCE_NUM + "__old"]
            change = np.where(
                m["_merge"] == "left_only", "c",
                np.where(m["_merge"] == "right_only", "d", "u"))
            keep = (m["_merge"] != "both") | (m[SEQUENCE_NUM] != oldseq)
            m = m.assign(change=change)[keep]
            cols = [*keys, "change",
                    *[c for c in new.columns if c not in keys]]
            out.append(pa.Table.from_pandas(m[cols],
                                            preserve_index=False))
        return pa.concat_tables(out, promote_options="default")

    return ray.data.from_items(items).map_batches(
        diff, batch_format="pyarrow", batch_size=1)


def read_dlq(lake_dir: str) -> "ray.data.Dataset":
    """Dead-letter queue as a Ray Dataset, deduped by lsn (the DLQ write
    is at-least-once: a retried normalize task or a crash-replayed
    increment may re-route the same poisoned event)."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(lake_dir, "_dlq", "dlq-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no dead-letter files under {lake_dir}/_dlq")
    ds = ray.data.read_parquet(files)

    # coarse-partition dedup (the join/LSH co-location trick): one small
    # shuffle on hash(lsn) % nparts, then ONE vectorized drop_duplicates
    # per partition — never a per-lsn map_groups dispatch
    def coarse(t: pa.Table) -> pa.Table:
        import pandas as _pd

        h = _pd.util.hash_array(t["lsn"].to_numpy(zero_copy_only=False))
        return t.append_column(
            "__dpart", pa.array((h % np.uint64(64)).astype(np.int32)))

    def drop_dupes(g):
        return g.drop_duplicates("lsn").drop(columns="__dpart")

    return (ds.map_batches(coarse, batch_format="pyarrow")
            .groupby("__dpart")
            .map_groups(drop_dupes, batch_format="pandas"))


def final_state(lake_dir: str, columns: list[str] | None = None,
                as_of_lsn: int | None = None,
                predicate=None) -> "ray.data.Dataset":
    """Live rows only (the reference e2e comparison filters _is_deleted,
    BQValidation.java:86-90). ``as_of_lsn`` time-travels; ``predicate``
    pushes a pads expression into the scan (see read_lake)."""
    ds = read_lake(lake_dir,
                   columns=None if columns is None else columns + ["_is_deleted"],
                   as_of_lsn=as_of_lsn, predicate=predicate)
    ds = ds.filter(expr="_is_deleted == False")
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
