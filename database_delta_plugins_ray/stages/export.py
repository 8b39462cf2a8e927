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
