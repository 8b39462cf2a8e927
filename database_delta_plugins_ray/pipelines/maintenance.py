"""Lake maintenance: tombstone pruning ("vacuum") and lake statistics.

Tombstones (soft-deleted rows, the reference target's ``_is_deleted``
contract) accumulate forever without maintenance. Pruning a tombstone is
safe once every partition's watermark has passed its ``_sequence_num``:
any replay of the delete is fenced by the watermark, and any NEWER event
for the key applies regardless of the tombstone's presence.

Each partition compacts independently (one Ray task per partition, no
shuffle); the rewrite keeps the offset-fenced filename so resume semantics
are untouched.
"""

from __future__ import annotations

import glob
import os

import ray

from ..model import IS_DELETED, SEQUENCE_NUM
from ..state import checkpoint as ckpt


def _lake_rel(f: str) -> str:
    """Lake-relative identity of a data file (``part=NNNNN/<name>``) —
    stable across lake moves and per-node mountpoints."""
    return os.path.join(os.path.basename(os.path.dirname(f)),
                        os.path.basename(f))


@ray.remote
def _compact_partition(lake_dir: str, part: int, prune_below: int) -> dict:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.merge import exact_lww_indices

    manifest = ckpt.read_manifest(lake_dir, part)
    if manifest is None:
        return {"part": part, "pruned": 0, "rows": 0}
    files = manifest.get("files") or [manifest["file"]]
    tbl = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )
    if len(files) > 1:
        # fold delta commits into the base while we're rewriting anyway
        keys = tuple(manifest.get("key_columns") or ("table", "repo", "path"))
        idx = exact_lww_indices(tbl, keys, SEQUENCE_NUM)
        if len(idx) < tbl.num_rows:
            tbl = tbl.take(pa.array(idx))
    dead = pc.and_(
        tbl[IS_DELETED], pc.less_equal(tbl[SEQUENCE_NUM], prune_below)
    )
    n_dead = int(pc.sum(pc.cast(dead, "int64")).as_py() or 0)
    if n_dead == 0 and len(files) == 1:
        return {"part": part, "pruned": 0, "rows": tbl.num_rows}
    kept = tbl.filter(pc.invert(dead))

    def write_fn(t, path):
        pq.write_table(t, path)

    ckpt.commit_partition(
        lake_dir, part, kept, manifest["last_lsn"], write_fn,
        dict(manifest, rows=kept.num_rows,
             live_rows=manifest["live_rows"]),
        # a time-travel lake keeps its retained versions through a
        # tombstone vacuum (vacuum_history prunes those separately)
        keep_history=bool(ckpt.version_log(lake_dir, part)),
    )
    return {"part": part, "pruned": n_dead, "rows": kept.num_rows}


def vacuum_lake(lake_dir: str, prune_below: int | None = None) -> dict:
    """Prune tombstones with ``_sequence_num <= prune_below`` (default: the
    global min watermark — always safe). Returns totals."""
    manifests = ckpt.all_manifests(lake_dir)
    if not manifests:
        return {"partitions": 0, "pruned": 0}
    if prune_below is None:
        prune_below = min(m["last_lsn"] for m in manifests.values())
    results = ray.get(
        [_compact_partition.remote(lake_dir, p, prune_below) for p in manifests]
    )
    return {
        "partitions": len(results),
        "pruned": sum(r["pruned"] for r in results),
        "rows": sum(r["rows"] for r in results),
        "prune_below": prune_below,
    }


def _zorder_key(tbl, cols: list[str]):
    """64-bit Z-value per row: each column is dense-ranked to a 16-bit
    code (rank-normalized, so skewed distributions still spread across
    the code space; nulls sort last), then the codes' bits are
    interleaved round-robin. Sorting by the result bounds EVERY
    clustered column's range within a row group — footer min/max stats
    prune predicates on ANY of the dims, where a lexicographic sort
    only prunes the leading one. Fully vectorized numpy."""
    import numpy as np
    import pandas as pd

    k = len(cols)
    bits = min(16, 63 // k)
    codes = []
    for c in cols:
        s = pd.Series(tbl[c].to_pandas())
        r = s.rank(method="dense")
        n = np.nanmax(r.to_numpy(dtype="float64")) if len(r) else 1.0
        code = ((r - 1.0) * ((1 << bits) - 1) / max(n - 1.0, 1.0))
        code = code.fillna(float((1 << bits) - 1))
        codes.append(code.to_numpy(dtype="float64").astype(np.uint64))
    z = np.zeros(len(tbl), dtype=np.uint64)
    for bit in range(bits):
        for j, code in enumerate(codes):
            z |= ((code >> np.uint64(bit)) & np.uint64(1)) << np.uint64(
                bit * k + (k - 1 - j))
    return z


@ray.remote
def _optimize_partition(lake_dir: str, part: int, cluster_by,
                        row_group_size: int | None,
                        zorder: bool = False) -> dict:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.merge import exact_lww_indices

    manifest = ckpt.read_manifest(lake_dir, part)
    if manifest is None:
        return {"part": part, "rows": 0, "files_before": 0}
    files = manifest.get("files") or [manifest["file"]]
    tbl = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )
    keys = tuple(manifest.get("key_columns") or ("table", "repo", "path"))
    if len(files) > 1:
        idx = exact_lww_indices(tbl, keys, SEQUENCE_NUM)
        if len(idx) < tbl.num_rows:
            tbl = tbl.take(pa.array(idx))
    cols = [c for c in (cluster_by or list(keys)) if c in tbl.column_names]
    if zorder and len(cols) >= 2:
        import numpy as np

        z = _zorder_key(tbl, cols)
        tbl = tbl.take(pa.array(np.argsort(z, kind="stable")))
    elif cols:
        order = pc.sort_indices(
            tbl, sort_keys=[(c, "ascending") for c in cols])
        tbl = tbl.take(order)

    def write_fn(t, path):
        pq.write_table(t, path, row_group_size=row_group_size or 131_072)

    ckpt.commit_partition(
        lake_dir, part, tbl, manifest["last_lsn"], write_fn,
        dict(manifest, rows=tbl.num_rows, clustered_by=cols),
        keep_history=bool(ckpt.version_log(lake_dir, part)),
    )
    return {"part": part, "rows": tbl.num_rows, "files_before": len(files)}


def optimize_lake(lake_dir: str, cluster_by: list[str] | None = None,
                  row_group_size: int | None = None,
                  zorder: bool = False) -> dict:
    """OPTIMIZE (Delta-Lake-style clustered rewrite): fold each
    partition's base+delta files into ONE file whose rows are sorted by
    ``cluster_by`` (default: the lake's key columns), written in bounded
    row groups so parquet min/max footer statistics prune selective
    reads. One Ray task per partition, no shuffle — partitions are
    independent and the rewrite reuses the fenced atomic commit
    (manifest-before-delete), so a crash mid-OPTIMIZE never dangles and
    resume/watermark semantics are untouched (``last_lsn`` is
    preserved; incremental replication continues on the optimized
    lake). Tombstones are retained — pruning them is ``vacuum_lake``'s
    job, gated on the watermark."""
    manifests = ckpt.all_manifests(lake_dir)
    if not manifests:
        return {"partitions": 0}
    results = ray.get([
        _optimize_partition.remote(lake_dir, p, cluster_by, row_group_size,
                                   zorder)
        for p in manifests
    ])
    return {
        "partitions": len(results),
        "rows": sum(r["rows"] for r in results),
        "files_before": sum(r["files_before"] for r in results),
        "files_after": len(results),
        "clustered_by": cluster_by or None,
    }


def lake_stats(lake_dir: str) -> dict:
    """Lineage/metrics rollup from the checkpoint manifests (the engine's
    health surface, M19 analog: events applied, watermarks, row counts)."""
    manifests = ckpt.all_manifests(lake_dir)
    if not manifests:
        return {"partitions": 0}
    return {
        "partitions": len(manifests),
        "rows": sum(m["rows"] for m in manifests.values()),
        "live_rows": sum(m["live_rows"] for m in manifests.values()),
        "events_applied": sum(m["events_applied"] for m in manifests.values()),
        "min_watermark": min(m["last_lsn"] for m in manifests.values()),
        "max_watermark": max(m["last_lsn"] for m in manifests.values()),
        "tables": sorted({t for m in manifests.values() for t in m.get("tables", [])}),
    }


def vacuum_history(lake_dir: str, keep_from_lsn: int) -> dict:
    """Prune retained time-travel versions (``history=True`` lakes):
    drop version-log entries with ``last_lsn < keep_from_lsn`` and delete
    data files referenced ONLY by dropped versions. The current manifest's
    files always survive (they serve live reads), so after this call
    ``read_lake(as_of_lsn=...)`` works for positions >= the horizon and
    raises for older ones — the Delta-Lake retention contract.

    Metadata-sized driver work: version logs hold O(commits) small JSON
    rows per partition; only ``os.remove`` touches data."""
    import glob as _glob
    import json as _json

    # persist the retention horizon FIRST: a reader asking for a position
    # below it must error rather than silently reconstruct a partial /
    # everything-looks-created state (a crash after this write and before
    # any pruning merely over-declares the horizon — safe direction)
    hpath = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR, "history_horizon.json")
    prev = 0
    if os.path.exists(hpath):
        with open(hpath) as fh:
            prev = _json.load(fh).get("keep_from_lsn", 0)
    if keep_from_lsn > prev:
        tmp = hpath + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            _json.dump({"keep_from_lsn": keep_from_lsn}, fh)
        os.replace(tmp, hpath)

    total_dropped = 0
    total_files = 0
    parts = 0
    for logp in _glob.glob(os.path.join(
            lake_dir, ckpt.CHECKPOINT_DIR, "part-*.log.jsonl")):
        part = int(os.path.basename(logp)[len("part-"):-len(".log.jsonl")])
        versions = ckpt.version_log(lake_dir, part)
        if not versions:
            continue
        parts += 1
        keep = [m for m in versions if int(m["last_lsn"]) >= keep_from_lsn]
        drop = [m for m in versions if int(m["last_lsn"]) < keep_from_lsn]
        if not drop:
            continue
        current = ckpt.read_manifest(lake_dir, part) or {}
        live = {f for m in keep for f in (m.get("files") or [m["file"]])}
        live |= set(current.get("files") or
                    ([current["file"]] if current.get("file") else []))
        for m in drop:
            for f in (m.get("files") or [m["file"]]):
                if f not in live and os.path.exists(f):
                    os.remove(f)
                    total_files += 1
        total_dropped += len(drop)
        tmp = logp + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            for m in keep:
                fh.write(_json.dumps(m) + "\n")
        os.replace(tmp, logp)
    return {"partitions": parts, "versions_dropped": total_dropped,
            "files_deleted": total_files, "keep_from_lsn": keep_from_lsn}


def reshard_lake(lake_dir: str, dest_dir: str, new_partitions: int,
                 repo_salt: dict[str, int] | None = None) -> dict:
    """Re-shard a committed lake from P to P' partitions — the cluster
    resize operation (BASELINE north rule: the engine runs at N and 4N
    nodes; the key->partition layout should grow with the cluster).

    The partition count is pinned in ``lake_config.json`` because it IS
    the key->partition mapping: changing it in place would mis-fence
    events. Resharding therefore builds a NEW lake at ``dest_dir``:

    * one Ray task per SOURCE partition loads its committed state
      (base + deltas LWW-reduced, rows migrated to the CURRENT registry
      schema, TRUNCATE/DROP fences applied), routes every row to its new
      partition with the same Normalizer hash under the new config;
    * ONE ``groupby("part")`` shuffle co-locates each new partition's
      rows; a writer task commits them with the lake's fenced atomic
      manifest contract.

    Exactly-once continuation: every new partition's watermark is the
    source lake's GLOBAL watermark G (every event with lsn <= G is
    already reflected in the carried state), so ``run_replication(log,
    dest_dir, num_partitions=P')`` resumes from G and applies only newer
    events. Resharding a lake whose per-partition manifests run PAST the
    global watermark (a crashed run) is refused — complete a replication
    run first, otherwise the G fence would skip the crash window.

    Lineage: ``events_applied`` restarts at the carried row count;
    ``_checkpoints/reshard.json`` records (source, cut lsn, P -> P').
    Time-travel history does NOT span a reshard — the new lake's history
    horizon is set to G so as-of reads below the cut raise instead of
    reconstructing a partial state.
    """
    import json as _json
    import shutil

    import pyarrow as pa

    from ..state.ddl import Registry
    from ..stages.merge import PartitionMerger, exact_lww_indices, schema_sig
    from ..model import SEQUENCE_NUM, IS_DELETED
    from .replicate import route_parts, _payload_columns

    manifests = ckpt.all_manifests(lake_dir)
    if not manifests:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")
    g = ckpt.read_global_watermark(lake_dir)
    hi = max(m["last_lsn"] for m in manifests.values())
    if g < hi:
        raise ValueError(
            f"lake has partition commits (lsn {hi}) past the global "
            f"watermark ({g}) — an interrupted run; complete a "
            "replication run before resharding")
    cfg_path = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR, "lake_config.json")
    with open(cfg_path) as fh:
        cfg = _json.load(fh)
    if int(new_partitions) < 1:
        raise ValueError("new_partitions must be >= 1")
    new_cfg = dict(cfg, num_partitions=int(new_partitions))
    if repo_salt is not None:
        new_cfg["repo_salt"] = repo_salt
    any_m = next(iter(manifests.values()))
    key_cols = tuple(any_m.get("key_columns") or ("table", "repo", "path"))
    hist = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR, "schema_history.jsonl")
    registry = Registry.load(hist) if os.path.exists(hist) else Registry()
    compute_sha = any("content_sha:" in s
                      for m in manifests.values()
                      for s in (m.get("schema_sig") or ()))
    payload_cols = _payload_columns(registry, None, compute_sha)

    dest_ckpt = os.path.join(dest_dir, ckpt.CHECKPOINT_DIR)
    if os.path.isdir(dest_ckpt) and os.listdir(dest_ckpt):
        raise FileExistsError(f"{dest_dir} already holds a lake")
    # the WHOLE dest builds under a tmp dir and publishes with one
    # rename: a crashed reshard leaves only a .building.* orphan (swept
    # here), never a half-lake that blocks or confuses a retry
    for stale in glob.glob(dest_dir + ".building.*"):
        shutil.rmtree(stale, ignore_errors=True)
    build_dir = dest_dir + f".building.{os.getpid()}"
    build_ckpt = os.path.join(build_dir, ckpt.CHECKPOINT_DIR)
    os.makedirs(build_ckpt, exist_ok=True)
    with open(os.path.join(build_ckpt, "lake_config.json"), "w") as fh:
        _json.dump(new_cfg, fh)
    if os.path.exists(hist):
        shutil.copyfile(hist,
                        os.path.join(build_ckpt, "schema_history.jsonl"))
    reg_ref = ray.put(registry)
    fmax = max(registry.fences().values(), default=0)
    roots = registry.table_roots

    def load_route(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.parquet as pq

        out = []
        helper = PartitionMerger(build_dir, reg_ref, payload_cols, key_cols)
        for row in batch.to_pylist():
            m = ckpt.read_manifest(lake_dir, int(row["part"]))
            files = m.get("files") or [m["file"]]
            t = pa.concat_tables(
                [helper._migrate_state(pq.read_table(f)) for f in files],
                promote_options="default")
            idx = exact_lww_indices(t, key_cols, SEQUENCE_NUM)
            if len(idx) < t.num_rows:
                t = t.take(pa.array(idx))
            t = helper._apply_fences(t)
            tb = t[key_cols[0]].to_numpy(zero_copy_only=False)
            if roots:
                tb = np.array([roots.get(x, x) for x in tb])
            pk = [t[c].to_numpy(zero_copy_only=False) for c in key_cols[1:]]
            parts = route_parts(new_cfg, tb, pk)
            i = t.schema.get_field_index("part")
            col = pa.array(parts, pa.int64())
            t = (t.set_column(i, "part", col) if i >= 0
                 else t.append_column("part", col))
            out.append(t)
        return pa.concat_tables(out, promote_options="default")

    def write_part(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        part = int(group["part"][0].as_py())
        live = group.num_rows - int(
            pc.sum(pc.cast(group[IS_DELETED], pa.int64())).as_py() or 0)
        ckpt.commit_partition(
            build_dir, part, group, g, lambda t, p: pq.write_table(t, p),
            manifest={
                "events_applied": group.num_rows,
                "rows": group.num_rows,
                "live_rows": live,
                "tables": sorted(set(pc.unique(group["table"]).to_pylist())),
                "schema_sig": schema_sig(group),
                "key_columns": list(key_cols),
                "fence_max_applied": fmax,
            })
        return pa.table({"part": pa.array([part], pa.int64()),
                         "rows": pa.array([group.num_rows], pa.int64()),
                         "live_rows": pa.array([live], pa.int64())})

    items = [{"part": m["part"]} for m in manifests.values()]
    summaries = (
        ray.data.from_items(items)
        .map_batches(load_route, batch_format="pyarrow", batch_size=1)
        .groupby("part")
        .map_groups(write_part, batch_format="pyarrow")
        .take_all())

    ckpt.write_global_watermark(build_dir, g)
    # history never spans a reshard: pin the horizon at the cut
    with open(os.path.join(build_ckpt, "history_horizon.json"), "w") as fh:
        _json.dump({"keep_from_lsn": int(g)}, fh)
    with open(os.path.join(build_ckpt, "reshard.json"), "w") as fh:
        _json.dump({"source": os.path.abspath(lake_dir), "at_lsn": int(g),
                    "old_partitions": int(cfg["num_partitions"]),
                    "new_partitions": int(new_partitions)}, fh)
    # manifests store absolute data-file paths: re-point them at the
    # PUBLISHED location while still inside the build dir (they dangle
    # for a moment, but nothing reads a .building.* dir), so the final
    # rename publishes a fully consistent lake in one atomic step
    bprefix = os.path.abspath(build_dir)
    dprefix = os.path.abspath(dest_dir)

    def _repoint(f: str) -> str:
        af = os.path.abspath(f)
        return dprefix + af[len(bprefix):] if af.startswith(bprefix) else f

    for part, m in ckpt.all_manifests(build_dir).items():
        m["file"] = _repoint(m["file"])
        m["files"] = [_repoint(f) for f in (m.get("files") or [m["file"]])]
        ckpt.write_manifest(build_dir, part, m)
    os.rename(build_dir, dest_dir)  # the atomic publish
    return {
        "partitions": len(summaries),
        "rows": int(sum(s["rows"] for s in summaries)),
        "live_rows": int(sum(s["live_rows"] for s in summaries)),
        "watermark": int(g),
        "old_partitions": int(cfg["num_partitions"]),
        "new_partitions": int(new_partitions),
    }


_BLOOM_HASH_KEY = "bloomskip_hashkv"  # 16 bytes (pandas hash_array)


def _bloom_hash(values) -> "np.ndarray":
    import numpy as np
    import pandas as pd

    return pd.util.hash_array(
        np.asarray(values, dtype=object), hash_key=_BLOOM_HASH_KEY)


def _skip_index_path(lake_dir: str, column: str) -> str:
    return os.path.join(lake_dir, ckpt.CHECKPOINT_DIR,
                        f"skipindex-{column}.json")


def build_skip_index(lake_dir: str, column: str,
                     bits_per_row: int = 10, nhash: int = 4) -> dict:
    """Per-FILE Bloom filters over ``column`` — the lakehouse
    file-skipping index for point-equality on columns the clustered
    sort does NOT lead with (footer min/max stats are useless for a
    high-cardinality unclustered column like ``commit``; a Bloom bit
    array prunes those reads with zero false negatives).

    One Ray task per data file reads ONLY ``column`` and ORs its hashed
    values into a bits-per-row-sized filter (functions/sketch.py
    kernels). The index is a manifest-keyed JSON sidecar written
    atomically; files committed AFTER the build are simply absent from
    it, and absent means "must read" — staleness degrades pruning,
    never correctness. Rebuild after replication or OPTIMIZE to restore
    pruning."""
    import base64

    import numpy as np
    import pyarrow as pa

    from ..functions.sketch import bloom_set

    manifests = ckpt.all_manifests(lake_dir)
    if not manifests:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")
    files = sorted({f for m in manifests.values()
                    for f in (m.get("files") or [m["file"]])})

    def per_file(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out_f, out_b, out_n = [], [], []
        import pandas as pd

        for f in batch["file"].to_pylist():
            col = pq.read_table(f, columns=[column])[column]
            vals = col.to_numpy(zero_copy_only=False)
            # occupancy depends on DISTINCT values, not rows — a
            # duplicate-heavy column (e.g. language) gets a tiny filter
            nd = len(pd.unique(vals)) if len(vals) else 0
            nbits = max(1024, int(nd * bits_per_row))
            nbits = 1 << (nbits - 1).bit_length()  # power of two
            bits = np.zeros(nbits // 8, dtype=np.uint8)
            if len(vals):
                bloom_set(bits, _bloom_hash(vals), nhash)
            out_f.append(f)
            out_b.append(base64.b64encode(bits.tobytes()).decode())
            out_n.append(len(vals))
        return pa.table({"file": pa.array(out_f),
                         "bloom": pa.array(out_b),
                         "rows": pa.array(out_n, pa.int64())})

    res = (ray.data.from_items([{"file": f} for f in files])
           .map_batches(per_file, batch_format="pyarrow", batch_size=1)
           .take_all())
    # keys are LAKE-RELATIVE (part=NNNNN/name): the index must survive
    # the lake moving / being mounted at another path, exactly like the
    # manifests it derives from (checkpoint._rebase)
    idx = {"column": column, "nhash": nhash,
           "files": {_lake_rel(r["file"]): r["bloom"] for r in res}}
    p = _skip_index_path(lake_dir, column)
    import json as _json
    tmp = p + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        _json.dump(idx, fh)
    os.replace(tmp, p)
    return {"column": column, "files": len(files),
            "bytes": sum(len(r["bloom"]) * 3 // 4 for r in res)}


def skip_scan_eq(lake_dir: str, column: str, value,
                 columns: list[str] | None = None) -> "ray.data.Dataset":
    """Live rows with ``column == value``, reading only partitions the
    Bloom index cannot rule out.

    Pruning discipline mirrors ``read_lake(predicate=...)``'s
    delta-resurrection rule: a partition is skipped only when EVERY one
    of its files rules the value out (an old version of a key may match
    while the current one does not — so the partition reads whole and
    LWW-reduces first whenever ANY file might match). Files missing
    from the index never prune. Returns row-equality via the same
    predicate pushdown as read_lake on the surviving partitions."""
    import base64

    import json as _json
    import numpy as np
    import pyarrow.dataset as pads

    from ..functions.sketch import bloom_contains
    from .replicate import read_lake

    p = _skip_index_path(lake_dir, column)
    blooms = {}
    nhash = 4
    if os.path.exists(p):
        with open(p) as fh:
            idx = _json.load(fh)
        if idx.get("column") == column:
            nhash = idx["nhash"]
            blooms = idx["files"]
    h = _bloom_hash([value])
    manifests = ckpt.all_manifests(lake_dir)
    keep = {}
    pruned = 0
    for part, m in manifests.items():
        files = m.get("files") or [m["file"]]
        may = False
        for f in files:
            # lake-relative key; absolute fallback reads pre-move
            # indexes built before the relative-key convention
            b64 = blooms.get(_lake_rel(f), blooms.get(f))
            if b64 is None:
                may = True  # not indexed -> must read
                break
            bits = np.frombuffer(base64.b64decode(b64), dtype=np.uint8)
            if bool(bloom_contains(bits, h, nhash)[0]):
                may = True
                break
        if may:
            keep[part] = m
        else:
            pruned += 1
    read_cols = (None if columns is None
                 else list(dict.fromkeys([*columns, "_is_deleted"])))
    ds = read_lake(lake_dir, columns=read_cols,
                   predicate=(pads.field(column) == value),
                   _manifests=keep)
    if not keep:
        return ds
    ds = ds.filter(expr="_is_deleted == False")
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def analyze_lake(lake_dir: str, columns: list[str],
                 hll_p: int = 12) -> dict:
    """ANALYZE: collect per-column table statistics over the lake's LIVE
    rows — row count, null count, exact min/max, and an HLL
    distinct-count estimate (Flajolet et al.; the engine's own
    sketch kernels) — persisted atomically to
    ``_checkpoints/table_stats.json`` with the watermark they describe.

    One column-pruned Ray task per partition emits fixed-size partials
    (2^p HLL registers + four scalars per column); the driver folds
    them — O(partitions x columns x 4 KB), never row-scaled. The stats
    file is what a cost-based planner (or a human) reads before picking
    join sides / sample rates; ``lookup-``/skip-index builds can size
    themselves from ndv."""
    import base64
    import json as _json

    import numpy as np
    import pyarrow as pa

    from ..functions.sketch import hll_estimate, hll_merge, hll_registers

    manifests = ckpt.all_manifests(lake_dir)
    if not manifests:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")

    def per_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..stages.merge import exact_lww_indices

        out = []
        for row in batch.to_pylist():
            files = row["files"]
            keys = tuple(row["key_columns"])
            t = pa.concat_tables(
                [pq.read_table(f, columns=list(dict.fromkeys(
                    [*columns, *keys, "_sequence_num", "_is_deleted"])))
                 for f in files], promote_options="default")
            if len(files) > 1:
                idx = exact_lww_indices(t, keys, "_sequence_num")
                if len(idx) < t.num_rows:
                    t = t.take(pa.array(idx))
            t = t.filter(pc.invert(t["_is_deleted"]))
            rec = {"rows": t.num_rows}
            for c in columns:
                col = t[c]
                nulls = col.null_count
                valid = col.drop_null()
                vals = valid.to_numpy(zero_copy_only=False)
                regs = hll_registers(vals, p=hll_p) if len(vals) else \
                    np.zeros(1 << hll_p, np.uint8)
                mn = pc.min(valid).as_py() if len(vals) else None
                mx = pc.max(valid).as_py() if len(vals) else None
                rec[c] = {
                    "nulls": nulls,
                    "min": mn, "max": mx,
                    "hll": base64.b64encode(regs.tobytes()).decode(),
                }
            out.append({"payload": _json.dumps(rec, default=str)})
        return pa.table({"payload": pa.array(
            [o["payload"] for o in out])})

    items = [{
        "files": m.get("files") or [m["file"]],
        "key_columns": list(m.get("key_columns")
                            or ["table", "repo", "path"]),
    } for m in manifests.values()]
    partials = (ray.data.from_items(items)
                .map_batches(per_part, batch_format="pyarrow",
                             batch_size=1)
                .take_all())

    total = 0
    agg: dict = {c: {"nulls": 0, "min": None, "max": None,
                     "regs": np.zeros(1 << hll_p, np.uint8)}
                 for c in columns}
    for p_ in partials:
        rec = _json.loads(p_["payload"])
        total += rec["rows"]
        for c in columns:
            r = rec[c]
            a = agg[c]
            a["nulls"] += r["nulls"]
            for k, pick in (("min", min), ("max", max)):
                if r[k] is not None:
                    a[k] = r[k] if a[k] is None else pick(a[k], r[k])
            regs = np.frombuffer(base64.b64decode(r["hll"]), np.uint8)
            a["regs"] = hll_merge(a["regs"], regs)
    stats = {
        "watermark": int(ckpt.read_global_watermark(lake_dir)),
        "rows": total,
        "columns": {
            c: {
                "nulls": int(a["nulls"]),
                "min": a["min"], "max": a["max"],
                "ndv_estimate": int(round(hll_estimate(a["regs"]))),
            } for c, a in agg.items()
        },
    }
    sp = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR, "table_stats.json")
    import json
    tmp = sp + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(stats, fh, default=str)
    os.replace(tmp, sp)
    return stats


def auto_optimize_hook(max_files_per_partition: int = 8,
                       cluster_by: list[str] | None = None,
                       row_group_size: int | None = None):
    """Post-commit hook for ``follow_replication``: OPTIMIZE the lake
    whenever any partition's live file count (base + deltas) exceeds
    the threshold — the operational closure of the delta-commit
    write-amplification bound: a long-tailing job keeps its read
    amplification flat instead of documenting compaction as a manual
    step. Checking is manifest-metadata only (no data reads); the
    rewrite itself is the fenced per-partition OPTIMIZE, safe to crash
    through and invisible to resume semantics."""
    def hook(lake_dir: str):
        manifests = ckpt.all_manifests(lake_dir)
        worst = max((len(m.get("files") or [m["file"]])
                     for m in manifests.values()), default=0)
        if worst > max_files_per_partition:
            return optimize_lake(lake_dir, cluster_by=cluster_by,
                                 row_group_size=row_group_size)
        return None

    return hook


def check_lake(lake_dir: str, sample_keys: int = 50) -> dict:
    """fsck for the lake: structural integrity checks a long-lived
    deployment runs after crashes, resizes, or manual surgery. Verifies

    * every manifest's files EXIST and parse (footer read);
    * per-partition ``last_lsn`` does not exceed the global watermark
      (the reshard/crash-window invariant);
    * the pinned ``lake_config`` matches the manifest population
      (no partition id >= num_partitions);
    * ROUTING: a sample of each partition's keys re-hashes to that
      partition under the pinned config (detects a lake whose config
      was edited in place — the mis-fence reshard_lake exists to
      prevent);
    * delta-commit schema sigs are internally consistent.

    Metadata + footer reads only (plus ``sample_keys`` rows per
    partition for the routing probe); returns ``{ok, errors: [...]}``
    and never mutates."""
    import json as _json

    import pyarrow.parquet as pq

    from .replicate import partition_of_keys

    errors: list[str] = []
    manifests = ckpt.all_manifests(lake_dir)
    if not manifests:
        return {"ok": False, "errors": ["no committed partitions"]}
    g = ckpt.read_global_watermark(lake_dir)
    cfg_path = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR,
                            "lake_config.json")
    cfg = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as fh:
            cfg = _json.load(fh)
    else:
        errors.append("lake_config.json missing")

    for part, m in sorted(manifests.items()):
        files = m.get("files") or [m["file"]]
        for f in files:
            if not os.path.exists(f):
                errors.append(f"part {part}: missing data file {f}")
                continue
            try:
                pq.read_metadata(f)
            except Exception as e:  # noqa: BLE001 — report, don't raise
                errors.append(f"part {part}: unreadable footer {f}: {e}")
        if g and m["last_lsn"] > g:
            errors.append(
                f"part {part}: last_lsn {m['last_lsn']} past the global "
                f"watermark {g} (interrupted run?)")
        if cfg and part >= int(cfg["num_partitions"]):
            errors.append(
                f"part {part}: id >= pinned num_partitions "
                f"{cfg['num_partitions']}")

    # routing probe: each partition's stored keys must re-hash home
    if cfg and not errors:
        key_cols = list(next(iter(manifests.values())).get("key_columns")
                        or ["table", "repo", "path"])
        for part, m in sorted(manifests.items()):
            f = (m.get("files") or [m["file"]])[0]
            t = pq.read_table(f, columns=key_cols)
            n = min(sample_keys, t.num_rows)
            if n == 0:
                continue
            keys = [tuple(t[c][i].as_py() for c in key_cols)
                    for i in range(n)]
            routed = partition_of_keys(lake_dir, keys)
            bad = int((routed != part).sum())
            if bad:
                errors.append(
                    f"part {part}: {bad}/{n} sampled keys route "
                    "elsewhere under the pinned config (config edited "
                    "in place? use reshard_lake)")
    return {"ok": not errors, "partitions": len(manifests),
            "watermark": int(g), "errors": errors}


def lake_signature(lake_dir: str) -> str:
    """Order- and LAYOUT-independent content checksum of the lake's
    live rows: the wrapping uint64 sum of ``md5_u64(table || repo ||
    path || content_sha || _sequence_num)`` over every live row. Two
    lakes holding the same logical state — e.g. before and after
    ``reshard_lake``, or two independently replicated replicas — have
    equal signatures whatever their partition counts or file layouts;
    any single-row difference flips it (mod collisions). One
    column-pruned task per partition (never reads content; the per-row
    invariant column content_sha stands in), one uint64 per partition
    to the driver — the anti-entropy check replica pairs run."""
    import numpy as np
    import pyarrow as pa

    from ..stages.sample import md5_u64

    manifests = ckpt.all_manifests(lake_dir)
    if not manifests:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")

    def per_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..stages.merge import exact_lww_indices

        sig = np.uint64(0)
        for row in batch.to_pylist():
            keys = tuple(row["key_columns"])
            cols = [*keys, "content_sha", "_sequence_num", "_is_deleted"]
            t = pa.concat_tables(
                [pq.read_table(f, columns=cols) for f in row["files"]],
                promote_options="default")
            if len(row["files"]) > 1:
                idx = exact_lww_indices(t, keys, "_sequence_num")
                if len(idx) < t.num_rows:
                    t = t.take(pa.array(idx))
            t = t.filter(pc.invert(t["_is_deleted"]))
            if t.num_rows:
                parts = [t[c].to_pandas().astype(str) for c in keys]
                parts.append(t["content_sha"].to_pandas().astype(str))
                parts.append(t["_sequence_num"].to_pandas().astype(str))
                joined = parts[0]
                for p_ in parts[1:]:
                    joined = joined + "\x1f" + p_
                with np.errstate(over="ignore"):
                    sig = sig + md5_u64(joined.to_numpy()).sum(
                        dtype=np.uint64)
        return pa.table({"sig": pa.array([int(sig)], pa.uint64())})

    items = [{
        "files": m.get("files") or [m["file"]],
        "key_columns": list(m.get("key_columns")
                            or ["table", "repo", "path"]),
    } for m in manifests.values()]
    parts = (ray.data.from_items(items)
             .map_batches(per_part, batch_format="pyarrow", batch_size=1)
             .take_all())
    import numpy as np
    total = np.uint64(0)
    with np.errstate(over="ignore"):
        for r in parts:
            total = total + np.uint64(r["sig"])
    return f"{int(total):016x}"


def lake_drift_report(lake_dir: str, from_lsn: int, *,
                      cat_cols=("language",),
                      bin_cols=(("stars", 64, 16),)) -> "pd.DataFrame":
    """Distribution drift between two lake versions — the population
    stability index (PSI — a standard, public industry drift metric)
    per monitored column between the state AS OF ``from_lsn`` and the
    current state. The continuous-ingestion monitoring op: a follow
    pipeline alerts when the incoming distribution shifts.

    ``cat_cols`` monitor categorical columns directly; ``bin_cols`` are
    ``(col, width, nbins)`` — integers bin by ``min(floor(v/width),
    nbins-1)``. Nulls are their own ``<null>`` category.

    Distributed shape: BOTH versions stream through ONE tagged pipeline
    of per-batch ``value_counts`` partials folded by a (version, col,
    category) groupby — the exchange is bounded by categories, never
    rows; the driver computes PSI over the bounded category set.
    Laplace(+1) smoothing over the union category set keeps ln finite;
    per-category contributions quantize to integer micros so the report
    is engine-exact (the lm_surprise discipline). Returns one row per
    (col, category): ``count_v0, count_v1, contrib_micros`` sorted by
    ``(col, category)``."""
    import math

    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    from .replicate import final_state

    cols = list(cat_cols) + [c for c, _, _ in bin_cols]
    bin_spec = {c: (w, nb) for c, w, nb in bin_cols}

    def cats(df: pd.DataFrame, version: int) -> pd.DataFrame:
        out = []
        for c in cols:
            if c in bin_spec:
                w, nb = bin_spec[c]
                v = df[c]
                b = np.minimum(np.floor(
                    v.fillna(-1).to_numpy(np.float64) / float(w)),
                    nb - 1)
                cat = pd.Series(b.astype(np.int64).astype(str),
                                dtype=object)
                cat[v.isna().to_numpy()] = "<null>"
            else:
                # categories are ALWAYS strings (int/float-valued
                # categorical columns stringify), so the driver fold's
                # index arithmetic and the SQL VARCHAR cast agree
                cat = pd.Series(df[c].astype(object)).where(
                    df[c].notna().to_numpy(), "<null>").astype(str)
            vc = pd.Series(cat).value_counts()
            out.append(pd.DataFrame({
                "col": c, "category": vc.index.to_numpy(dtype=object),
                "version": np.int8(version),
                "n": vc.to_numpy(np.int64)}))
        if not out:
            return pd.DataFrame({"col": pd.Series([], dtype=object),
                                 "category": pd.Series([], dtype=object),
                                 "version": pd.Series([], dtype=np.int8),
                                 "n": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    v0 = (final_state(lake_dir, columns=cols, as_of_lsn=from_lsn)
          .map_batches(lambda df: cats(df, 0), batch_format="pandas"))
    v1 = (final_state(lake_dir, columns=cols)
          .map_batches(lambda df: cats(df, 1), batch_format="pandas"))
    folded = (v0.union(v1)
              .groupby(["col", "category", "version"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())

    rows = []
    for c in cols:
        sub = folded[folded["col"] == c]
        piv = (sub.pivot_table(index="category", columns="version",
                               values="n", aggfunc="sum", fill_value=0)
               .reindex(columns=[0, 1], fill_value=0))
        n0 = int(piv[0].sum())
        n1 = int(piv[1].sum())
        k = len(piv)
        for cat in sorted(piv.index.astype(str)):
            c0 = int(piv.loc[cat, 0])
            c1 = int(piv.loc[cat, 1])
            p = float(c0 + 1) / float(n0 + k)
            q = float(c1 + 1) / float(n1 + k)
            contrib = int(math.floor((p - q) * math.log(p / q) * 1e6
                                     + 0.5))
            rows.append({"col": c, "category": cat,
                         "count_v0": c0, "count_v1": c1,
                         "contrib_micros": contrib})
    out = pd.DataFrame(rows)
    for c in ("count_v0", "count_v1", "contrib_micros"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["col", "category"]).reset_index(drop=True)
