"""Resumable training-corpus export: hash-sharded Parquet + manifest.

The corpus-side counterpart of the CDC lake's offset-fenced commits
(state/checkpoint.py): output lands as ``shard=<s>/`` directories
(deterministic ``md5_u64(id) % nshards`` routing — stable across runs,
resumes and parallelism levels), with a ``manifest.json`` recording the
source fingerprint and per-shard row counts. A re-export against an
unchanged source is a no-op (manifest hit, zero reads); a crashed
export leaves no half-manifest (tmp dir + atomic rename), so a retry
redoes only the failed run's work, never corrupts a finished one.
One streaming pass, one partitioned write — the corpus never
materializes.
"""
from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd

__all__ = ["export_corpus_shards", "export_corpus_jsonl"]


def export_corpus_shards(docs, out_dir: str, *, nshards: int = 16,
                         id_col: str = "doc_id",
                         source_tag: str = "") -> dict:
    """Export ``docs`` to ``out_dir/shard=<s>/*.parquet``; returns the
    manifest ``{source_tag, nshards, shards: {s: rows}, total_rows}``.
    Skips entirely when a manifest for the same ``source_tag`` and
    ``nshards`` already exists."""
    import shutil

    import pyarrow.parquet as pq

    from .sample import md5_u64

    mpath = os.path.join(out_dir, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as fh:
            m = json.load(fh)
        if (m.get("source_tag") == source_tag
                and m.get("nshards") == nshards):
            m["skipped"] = True
            return m

    def sharded(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["shard"] = (md5_u64(out[id_col].to_numpy())
                        % np.uint64(nshards)).astype(np.int32)
        return out

    tmp = out_dir + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    docs.map_batches(sharded, batch_format="pandas").write_parquet(
        tmp, partition_cols=["shard"])
    shards: dict[str, int] = {}
    for d in sorted(glob.glob(os.path.join(tmp, "shard=*"))):
        s = d.rsplit("=", 1)[1]
        rows = sum(pq.read_metadata(f).num_rows
                   for f in glob.glob(os.path.join(d, "*.parquet")))
        shards[s] = rows
    manifest = {
        "source_tag": source_tag,
        "nshards": nshards,
        "shards": shards,
        "total_rows": sum(shards.values()),
        "skipped": False,
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return manifest


def export_corpus_jsonl(docs, out_dir: str, *, nshards: int = 16,
                        id_col: str = "doc_id",
                        source_tag: str = "") -> dict:
    """JSONL variant of ``export_corpus_shards`` — the wire format most
    training loaders consume. Same contract: deterministic md5 shard
    routing, manifest with per-shard row counts + source fingerprint,
    manifest-hit no-op on unchanged source, tmp+atomic-rename crash
    safety. Each write task serializes its rows with pandas' C json
    encoder (one call per batch, not per row); a shard may hold several
    ``part-*.jsonl`` files (one per task that touched it) — loaders
    glob ``shard=<s>/*.jsonl``."""
    import shutil
    import uuid

    from .sample import md5_u64

    mpath = os.path.join(out_dir, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as fh:
            m = json.load(fh)
        if (m.get("source_tag") == source_tag
                and m.get("nshards") == nshards):
            m["skipped"] = True
            return m

    tmp = out_dir + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def write_shards(df: pd.DataFrame) -> pd.DataFrame:
        s = (md5_u64(df[id_col].to_numpy())
             % np.uint64(nshards)).astype(np.int32)
        counts = []
        for shard, g in df.groupby(s, sort=True):
            d = os.path.join(tmp, f"shard={int(shard)}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"part-{uuid.uuid4().hex}.jsonl")
            g.to_json(path, orient="records", lines=True,
                      force_ascii=False)
            counts.append((int(shard), len(g)))
        return pd.DataFrame(counts, columns=["shard", "rows"])

    partials = (docs.map_batches(write_shards, batch_format="pandas")
                .to_pandas())
    agg = partials.groupby("shard")["rows"].sum()
    shards = {str(k): int(v) for k, v in agg.items()}
    manifest = {
        "source_tag": source_tag,
        "nshards": nshards,
        "shards": shards,
        "total_rows": int(agg.sum()),
        "skipped": False,
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return manifest


def _key_strings(tbl, key_cols, sep: str = "\x1f") -> np.ndarray:
    """One string per row joining the key columns — vectorized via
    pyarrow (cast to utf8 + binary_join_element_wise), no Python loop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = [pc.cast(tbl[c], pa.string()) for c in key_cols]
    joined = pc.binary_join_element_wise(*parts, sep)
    return joined.to_numpy(zero_copy_only=False)


def export_lake_incremental(lake_dir: str, out_dir: str, *,
                            nshards: int = 16,
                            columns: list[str] | None = None) -> dict:
    """INCREMENTALLY-MAINTAINED lake export: hash-sharded Parquet of the
    lake's live rows that a later call brings current by rewriting ONLY
    the shards the change data feed touched — the materialized-export
    counterpart of the IVM views.

    First call: one streaming pass of ``final_state`` routed by
    ``md5_u64(table\\x1frepo\\x1fpath) % nshards`` (the corpus export
    contract); the manifest records the lake's global watermark AND the
    export's Arrow schema (IPC-serialized) — every later rewrite casts
    to that pinned schema, so type drift (e.g. a nullable int64 turning
    float64 through a pandas hop) can never poison a shard file.

    Later calls: ``lake_diff(manifest watermark)`` (partition-local,
    history lakes) runs DISTRIBUTED — a map_batches stage routes each
    changed key to its md5 shard and stages the delta rows as
    per-shard Parquet under ``_delta/``; the driver sees only per-shard
    row counts. One Ray task per touched shard then reads its old file,
    anti-joins out the changed keys (vectorized isin on joined key
    strings), appends the delta's live rows cast to the pinned schema,
    and commits tmp+rename. Cost is O(touched shards + changes), never
    O(lake). The rewrite is IDEMPOTENT (drop-then-re-add of the same
    key set), so a crash between shard commits and the manifest write
    re-runs safely; the manifest commits last, atomically.

    Schema evolution: the pinned schema holds as long as every increment
    casts losslessly into it (the normal case — adds/in-range widens).
    The first increment that CANNOT (an ALTER-widened column outgrowing
    the pinned type, a rename dropping a pinned column) self-heals with
    ONE full rebuild that re-pins at the lake's current schema."""
    import base64
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..pipelines.replicate import final_state, lake_diff
    from ..state import checkpoint as ckpt
    from .sample import md5_u64

    key_cols = ("table", "repo", "path")
    sep = "\x1f"
    g1 = int(ckpt.read_global_watermark(lake_dir))
    want_cols = columns or ["table", "repo", "path", "commit",
                            "language", "stars", "content_sha",
                            "_sequence_num"]

    def shard_ids(tbl: pa.Table, n: int) -> np.ndarray:
        return (md5_u64(_key_strings(tbl, key_cols, sep))
                % np.uint64(n)).astype(np.int32)

    mpath = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(mpath):
        def sharded(t: pa.Table) -> pa.Table:
            return t.append_column("shard", pa.array(shard_ids(t, nshards)))

        tmp = out_dir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        (final_state(lake_dir, columns=want_cols)
         .map_batches(sharded, batch_format="pyarrow")
         .write_parquet(tmp, partition_cols=["shard"]))
        first = sorted(glob.glob(os.path.join(tmp, "shard=*", "*.parquet")))
        schema = pq.read_schema(first[0]) if first else None
        if schema is None:  # empty lake: pin from the read path
            schema = final_state(lake_dir, columns=want_cols).schema().base_schema
        schema = pa.schema([schema.field(c) for c in want_cols])
        manifest = {"watermark": g1, "nshards": nshards,
                    "columns": want_cols, "rewritten_shards": nshards,
                    "schema_ipc": base64.b64encode(
                        schema.serialize().to_pybytes()).decode(),
                    "skipped": False}
        with open(os.path.join(tmp, "manifest.json"), "w") as fh:
            json.dump(manifest, fh)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.rename(tmp, out_dir)
        return manifest

    with open(mpath) as fh:
        manifest = json.load(fh)
    g0 = int(manifest["watermark"])
    nshards = int(manifest["nshards"])
    want_cols = manifest["columns"]
    schema = pa.ipc.read_schema(pa.BufferReader(
        base64.b64decode(manifest["schema_ipc"])))
    if g1 <= g0:
        return dict(manifest, skipped=True, rewritten_shards=0)

    # stage the diff per shard — distributed, driver holds only counts.
    # staging dir is keyed by the target watermark: a crashed attempt's
    # leftovers for a DIFFERENT watermark are swept, a re-run at the
    # same watermark restages from scratch (uuid part names can't
    # collide; the whole dir is replaced below).
    stage = os.path.join(out_dir, "_delta")
    shutil.rmtree(stage, ignore_errors=True)
    stage_tmp = stage + f".tmp.{os.getpid()}"
    shutil.rmtree(stage_tmp, ignore_errors=True)
    os.makedirs(stage_tmp, exist_ok=True)
    delta_cols = ["__key", "change", *want_cols]

    def stage_delta(t: pa.Table) -> pa.Table:
        kstr = _key_strings(t, key_cols, sep)
        s = (md5_u64(kstr) % np.uint64(nshards)).astype(np.int32)
        t = (t.append_column("__key", pa.array(kstr))
             .select(delta_cols))
        counts = []
        for sh in np.unique(s):
            sub = t.filter(pa.array(s == sh))
            d = os.path.join(stage_tmp, f"shard={int(sh)}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(sub,
                           os.path.join(d, f"part-{uuid.uuid4().hex}.parquet"))
            counts.append((int(sh), sub.num_rows))
        return pa.table({"shard": pa.array([c[0] for c in counts],
                                           pa.int32()),
                         "rows": pa.array([c[1] for c in counts],
                                          pa.int64())})

    def _repin_rebuild():
        # an exported column was retyped/renamed since the schema was
        # pinned (e.g. an ALTER widen whose values no longer fit the
        # pinned type, or a column rename): the incremental rewrite
        # cannot express that in the old schema. Self-heal with ONE
        # full rebuild that re-pins at the lake's current schema —
        # correct at any point, and DDL is rare enough that the full
        # pass amortizes to nothing. Only the MANIFEST is removed here —
        # the fresh path stages into out_dir+'.tmp.<pid>' and swaps at
        # the end, so the old export stays readable (and survives a
        # crash) until the rebuilt one is complete.
        shutil.rmtree(stage_tmp, ignore_errors=True)
        os.remove(mpath)
        return export_lake_incremental(lake_dir, out_dir,
                                       nshards=nshards,
                                       columns=columns or want_cols)

    def _is_schema_drift(err) -> bool:
        # Arrow cast failures are drift by definition; a KeyError is
        # drift only when the missing key IS a pinned column (a rename/
        # drop in the lake) — any other KeyError is a real bug that must
        # surface, not trigger a destructive O(lake) rebuild.
        cause = getattr(err, "cause", err)
        if isinstance(cause, (pa.lib.ArrowInvalid, pa.lib.ArrowTypeError)):
            return True
        if isinstance(cause, KeyError):
            msg = str(cause.args[0]) if cause.args else ""
            return any(c in msg for c in delta_cols)
        return False

    try:
        counts = (lake_diff(lake_dir, g0)
                  .map_batches(stage_delta, batch_format="pyarrow")
                  .take_all())  # one tiny row per (task, shard)
    except (ray.exceptions.RayTaskError, KeyError) as e:
        if _is_schema_drift(e):
            return _repin_rebuild()
        raise
    touched = sorted({int(r["shard"]) for r in counts})
    os.rename(stage_tmp, stage)

    @ray.remote(num_cpus=1)
    def rewrite(shard: int) -> int:
        import glob as _g

        ddir = os.path.join(stage, f"shard={shard}")
        delta = pa.concat_tables(
            [pq.read_table(f)
             for f in _g.glob(os.path.join(ddir, "*.parquet"))],
            promote_options="permissive")
        # a retried staging task may have written a shard's delta twice;
        # the diff is deterministic, so dedup by key keeps the same row
        dkeys = delta["__key"].to_numpy(zero_copy_only=False)
        keep = ~pd.Series(dkeys).duplicated().to_numpy()
        if not keep.all():
            delta = delta.filter(pa.array(keep))
            dkeys = dkeys[keep]
        adds = delta.filter(
            pa.compute.not_equal(delta["change"], "d")).select(want_cols)
        adds = adds.cast(schema)

        d = os.path.join(out_dir, f"shard={shard}")
        files = _g.glob(os.path.join(d, "*.parquet"))
        parts = [adds] if adds.num_rows else []
        if files:
            old = pa.concat_tables(
                [pq.read_table(f).select(want_cols).cast(schema)
                 for f in files])
            if old.num_rows:
                mask = ~np.isin(_key_strings(old, key_cols, sep), dkeys)
                parts.append(old.filter(pa.array(mask)))
        new = (pa.concat_tables(parts) if parts
               else schema.empty_table())
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, "data.parquet")
        tmpf = final + f".tmp.{os.getpid()}"
        pq.write_table(new, tmpf)
        os.replace(tmpf, final)
        for f in files:
            if f != final and os.path.exists(f):
                os.remove(f)
        return new.num_rows

    try:
        ray.get([rewrite.remote(s) for s in touched])
    except ray.exceptions.RayTaskError as e:
        if _is_schema_drift(e):
            return _repin_rebuild()
        raise
    new_manifest = dict(manifest, watermark=g1, skipped=False,
                        rewritten_shards=len(touched))
    tmpm = mpath + f".tmp.{os.getpid()}"
    with open(tmpm, "w") as fh:
        json.dump(new_manifest, fh)
    os.replace(tmpm, mpath)
    shutil.rmtree(stage, ignore_errors=True)
    return new_manifest


def export_sorted(ds, out_dir: str, *, order_col: str,
                  nbuckets: int = 64) -> dict:
    """Globally-SORTED export: files ``part-00000.parquet ...`` whose
    ``order_col`` ranges are disjoint and ascending in file order —
    concatenating the files in name order yields the full ORDER BY,
    and a consumer can binary-search the manifest's per-file (min, max)
    to open exactly one file for a point/range probe.

    No global sort barrier: one min/max aggregate fixes uniform range
    buckets, one bucket shuffle co-locates each range, each bucket task
    sorts locally and writes its file + (min, max, rows) stats.
    Skewed distributions imbalance bucket sizes, never order (the
    ordered_cumsum trade-off, stages/scan.py)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from .scan import _key_ints

    # fail fast on unsupported order dtypes (strings/binary have no
    # order-preserving u64 map here) instead of a deep ValueError from
    # the bucket kernel; the schema may surface as Arrow or pandas
    # depending on the upstream block format
    sch = ds.schema()
    ftype = dict(zip(sch.names, sch.types))[order_col]
    if ftype is None:
        # pandas extension dtypes (e.g. nullable Int64) surface as None
        # through the Arrow conversion — read the raw block schema
        base = getattr(sch, "base_schema", None)
        raw = dict(zip(base.names, base.types)) if base is not None else {}
        ftype = raw.get(order_col)
    if ftype is None:
        ok = True  # unknown: let the bucket kernel decide
    elif isinstance(ftype, pa.DataType):
        ok = (pa.types.is_integer(ftype) or pa.types.is_floating(ftype)
              or pa.types.is_timestamp(ftype) or pa.types.is_date(ftype))
    else:
        ok = (pd.api.types.is_integer_dtype(ftype)
              or pd.api.types.is_float_dtype(ftype)
              or pd.api.types.is_datetime64_any_dtype(ftype))
    if not ok:
        raise TypeError(
            f"export_sorted: unsupported order column dtype {ftype} "
            f"for {order_col!r} — numeric, timestamp or date required")

    # null-aware range stats: Ray's Min/Max propagate NaN for float
    # keys, which would poison the bucket width — fold non-null
    # per-batch extrema instead. Null/NaN keys get their own LAST
    # bucket (nulls-last, the SQL default). lo/hi are EXPLICIT uint64
    # in both branches: a float64/int64-inferred empty or mixed-sign
    # block would otherwise promote the concat and round u64 keys
    # above 2^53, mis-bucketing extreme keys.
    def mm(df: pd.DataFrame) -> pd.DataFrame:
        s = df[order_col].dropna()
        if s.empty:
            return pd.DataFrame({"lo": pd.Series([], dtype=np.uint64),
                                 "hi": pd.Series([], dtype=np.uint64)})
        ki = _key_ints(s.to_frame(order_col), order_col)
        return pd.DataFrame({"lo": np.array([ki.min()], np.uint64),
                             "hi": np.array([ki.max()], np.uint64)})

    ext = ds.map_batches(mm, batch_format="pandas").to_pandas()
    if ext.empty:
        raise ValueError("export_sorted: order column is entirely null")
    lo_u = np.uint64(ext["lo"].min())
    hi_u = np.uint64(ext["hi"].max())
    span = max(int(hi_u - lo_u) + 1, 1)
    width = np.uint64(max(span // nbuckets + 1, 1))
    null_bucket = nbuckets  # nulls-last

    tmp = out_dir + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        isnull = df[order_col].isna().to_numpy()
        b = np.minimum(
            (_key_ints(df, order_col) - lo_u) // width,
            np.uint64(nbuckets - 1)).astype(np.int32)
        b[isnull] = null_bucket
        out["__b"] = b
        return out

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__b"].iloc[0])
        body = (g.drop(columns="__b")
                 .sort_values(order_col, kind="stable",
                              na_position="last")
                 .reset_index(drop=True))
        path = os.path.join(tmp, f"part-{b:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False),
                       path)
        nn = body[order_col].dropna()
        return pd.DataFrame({
            "bucket": [b], "rows": [len(body)],
            "min": [nn.iloc[0] if len(nn) else None],
            "max": [nn.iloc[-1] if len(nn) else None]})

    parts = (ds.map_batches(bucketed, batch_format="pandas")
             .groupby("__b").map_groups(write_bucket,
                                        batch_format="pandas")
             .take_all())

    # manifest min/max as NATIVE JSON numbers for numeric keys (string
    # comparison misorders numbers: '10' < '9'); timestamps and other
    # non-JSON types stringify, with the dtype recorded so a consumer
    # can parse before comparing
    def jval(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        if isinstance(v, (bool, np.bool_)):
            return bool(v)
        if isinstance(v, (int, np.integer)):
            return int(v)
        if isinstance(v, (float, np.floating)):
            return float(v)
        return str(v)

    files = sorted(
        ({"file": f"part-{int(r['bucket']):05d}.parquet",
          "rows": int(r["rows"]),
          "min": jval(r["min"]), "max": jval(r["max"])}
         for r in parts), key=lambda r: r["file"])
    manifest = {"order_col": order_col, "order_dtype": str(ftype),
                "files": files,
                "total_rows": sum(f["rows"] for f in files)}
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return manifest
