"""Driver-facing query catalog.

Each query is a callable ``(sf_dir) -> Dataset | pandas.DataFrame |
pyarrow.Table`` paired (where SQL-expressible) with an ANSI-SQL oracle that
DuckDB runs over the same inputs. CDC queries run over a deterministic
synthetic event log derived from the scale factor (cached under /tmp), so
the SQL oracle can replay the very same Parquet segments with window
functions — the LWW replay is exactly ``row_number() OVER (PARTITION BY pk
ORDER BY lsn DESC) = 1`` (reference contract BQValidation.java:86-90).

Column names in the Ray results match the oracle SQL exactly (driver
hashes values with columns sorted by name).
"""

from __future__ import annotations

import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.gen import GenConfig, generate_log
from .replicate import final_state, log_max_lsn, run_replication

CACHE_ROOT = "/tmp/ddpr_cache"

#: per-scale-factor log sizes (events scale ~linearly with sf)
_SF_SIZES = {
    "0.001": dict(n_keys=1_000, n_events=5_000, n_repos=16, n_segments=4),
    "0.01": dict(n_keys=8_000, n_events=50_000, n_repos=32, n_segments=8),
    "0.1": dict(n_keys=200_000, n_events=2_000_000, n_repos=128, n_segments=32),
}

#: all-datatypes log sizes (narrow rows; fewer events needed to exercise
#: every type through normalize -> merge -> lake)
_SF_TYPED_SIZES = {
    "0.001": dict(n_keys=300, n_events=1_500, n_segments=4),
    "0.01": dict(n_keys=2_000, n_events=12_000, n_segments=6),
    "0.1": dict(n_keys=20_000, n_events=120_000, n_segments=12),
}


def sf_tag(sf_dir: str) -> str:
    m = re.search(r"sf([\d.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return m.group(1) if m else "0.01"


def log_dir_for(sf_dir: str) -> str:
    return os.path.join(CACHE_ROOT, f"sf{sf_tag(sf_dir)}", "log")


def ensure_log(sf_dir: str) -> str:
    """Generate (once, deterministic) the CDC log for this scale factor."""
    tag = sf_tag(sf_dir)
    sizes = _SF_SIZES.get(tag, _SF_SIZES["0.01"])
    d = log_dir_for(sf_dir)
    generate_log(d, GenConfig(seed=42, **sizes))
    return d


def ensure_typed_log(sf_dir: str) -> str:
    """Generate (once) the all-datatypes CDC log for this scale factor."""
    from ..sources.gen_typed import TypedGenConfig, generate_typed_log

    tag = sf_tag(sf_dir)
    sizes = _SF_TYPED_SIZES.get(tag, _SF_TYPED_SIZES["0.01"])
    d = os.path.join(CACHE_ROOT, f"sf{tag}", "typed_log")
    generate_typed_log(d, TypedGenConfig(seed=77, **sizes))
    return d


def fresh_lake(sf_dir: str, name: str) -> str:
    lake = os.path.join(CACHE_ROOT, f"sf{sf_tag(sf_dir)}", name)
    shutil.rmtree(lake, ignore_errors=True)
    return lake


FINAL_COLS = ["repo", "path", "commit", "language", "stars", "content_sha",
              "_sequence_num"]


# ---------------------------------------------------------------------------
# CDC queries
# ---------------------------------------------------------------------------


def cdc_final_state(sf_dir: str):
    """Full replay -> final lake table (the flagship pipeline)."""
    log = ensure_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_final")
    run_replication(log, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def cdc_transformed_apply(sf_dir: str):
    """Apply-time column transforms (the public Debezium SMT idea —
    single-message transforms between source and sink): replay with
    ``language`` uppercased and ``content`` truncated to its first 100
    codepoints BEFORE ``content_sha`` derives, so the lake's stored
    values and its sha bookkeeping both reflect the transformed
    payload. Vectorized pyarrow.compute kernels inside the normalize
    stage — no extra pass (stages/normalize.py:_compile_transform);
    key and bookkeeping columns are transform-blocked."""
    log = ensure_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_smt")
    run_replication(log, lake, num_partitions=16,
                    transforms={"language": "upper",
                                "content": "truncate:100"})
    return final_state(lake, columns=FINAL_COLS)


def cdc_packed_tokens_refresh(sf_dir: str):
    """CDC-maintained packed-token corpus (the training-corpus analog of
    the incremental lake export): replicate half the log, pack the lake
    into token shards (distributed BPE, frozen thereafter), replicate
    the rest, then ``refresh_packed_tokens`` re-encodes ONLY the buckets
    the change feed touched — and must byte-equal a full re-pack of the
    final lake under the same frozen tokenizer. Returns the per-shard
    manifest summary plus a parity bit per bucket. Rows-only (trained
    tokenizer has no SQL shape); tests/test_tokexport_refresh.py gates
    byte parity, idempotence, deletes, and the follow hook."""
    import json as _json

    import pandas as pd

    from ..stages.bpe import train_bpe, word_histogram
    from ..stages.tokexport import (build_token_vocab,
                                    export_packed_tokens,
                                    refresh_packed_tokens)
    from ..state import checkpoint as ckpt

    log = ensure_log(sf_dir)
    with open(os.path.join(log, "meta.json")) as fh:
        half = _json.load(fh)["max_lsn"] // 2
    lake = fresh_lake(sf_dir, "lake_tokrefresh")
    pack = os.path.join(CACHE_ROOT, f"sf{sf_tag(sf_dir)}",
                        "pack_tokrefresh")
    shutil.rmtree(pack, ignore_errors=True)
    run_replication(log, lake, num_partitions=8, upto_lsn=half,
                    history=True)
    ds = final_state(lake, columns=["repo", "path", "content"]).materialize()
    hist = word_histogram(ds, text_col="content")
    merges = train_bpe(hist, 40)
    vocab = build_token_vocab(hist, merges)
    export_packed_tokens(
        ds, pack, merges, vocab, seq_tokens=64, nbuckets=16,
        key_cols=("repo", "path"), text_col="content",
        source_tag=f"lake@{ckpt.read_global_watermark(lake)}")
    run_replication(log, lake, num_partitions=8, history=True)
    m = refresh_packed_tokens(lake, pack, key_cols=("repo", "path"),
                              text_col="content")
    # parity: full re-pack of the final lake under the SAME tokenizer
    ref = pack + "_ref"
    shutil.rmtree(ref, ignore_errors=True)
    ds2 = final_state(lake, columns=["repo", "path", "content"]).materialize()
    export_packed_tokens(
        ds2, ref, merges, vocab, seq_tokens=64, nbuckets=16,
        key_cols=("repo", "path"), text_col="content",
        source_tag=m["source_tag"])
    rows = []
    for s in m["shards"]:
        b = int(s["bucket"])
        fa = os.path.join(pack, f"shard-{b:05d}.bin")
        fb = os.path.join(ref, f"shard-{b:05d}.bin")
        with open(fa, "rb") as f1, open(fb, "rb") as f2:
            eq = f1.read() == f2.read()
        rows.append({"bucket": b, "start_token": int(s["start_token"]),
                     "n_tokens": int(s["n_tokens"]),
                     "n_docs": int(s["n_docs"]),
                     "matches_full_repack": bool(eq)})
    out = pd.DataFrame(rows)
    assert out["matches_full_repack"].all(), "refresh != full re-pack"
    return out


def cdc_drift_report(sf_dir: str):
    """Distribution-drift monitoring between two lake versions (PSI —
    population stability index, the standard public drift metric): two
    bounded replication legs with history, then
    ``maintenance.lake_drift_report`` compares the AS-OF-boundary state
    against the final state per monitored column (categorical
    ``language``; ``stars`` binned by ``min(floor(v/64), 15)``). Both
    versions stream through ONE tagged value_counts fold bounded by
    categories; Laplace(+1) smoothing over the union category set;
    per-category contributions quantize to integer micros — hash-exact
    vs the DuckDB oracle computing the same expression over the two
    LWW-replayed versions."""
    log = ensure_log(sf_dir)
    boundary = _time_travel_boundary(log)
    lake = fresh_lake(sf_dir, "lake_drift")
    run_replication(log, lake, num_partitions=16, upto_lsn=boundary,
                    history=True)
    run_replication(log, lake, num_partitions=16, history=True)
    from .maintenance import lake_drift_report

    return lake_drift_report(lake, boundary)


def cdc_resume_equivalence(sf_dir: str):
    """Replay first half, checkpoint, resume rest -> must equal one-shot
    replay (same oracle SQL as cdc_final_state; F6.1)."""
    import json

    log = ensure_log(sf_dir)
    with open(os.path.join(log, "meta.json")) as fh:
        half = json.load(fh)["max_lsn"] // 2
    lake = fresh_lake(sf_dir, "lake_resume")
    run_replication(log, lake, num_partitions=16, upto_lsn=half)
    run_replication(log, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def cdc_reshard_continuation(sf_dir: str):
    """Cluster resize mid-stream: replicate half at P=8, reshard the lake
    to P=16 (``maintenance.reshard_lake`` — one task per source partition,
    one groupby shuffle, fenced atomic commits at the global watermark),
    continue replication on the new layout — must equal one-shot replay
    (same oracle SQL as cdc_final_state)."""
    import json

    from .maintenance import reshard_lake

    log = ensure_log(sf_dir)
    with open(os.path.join(log, "meta.json")) as fh:
        half = json.load(fh)["max_lsn"] // 2
    lake = fresh_lake(sf_dir, "lake_reshard_src")
    dest = fresh_lake(sf_dir, "lake_reshard_dst")
    run_replication(log, lake, num_partitions=8, upto_lsn=half)
    reshard_lake(lake, dest, new_partitions=16)
    run_replication(log, dest, num_partitions=16)
    return final_state(dest, columns=FINAL_COLS)


def cdc_search_lake_content(sf_dir: str):
    """CDC-maintained full-text search: replicate HALF the log
    (history=True), build the lake text index at that watermark, finish
    replication, REFRESH the index from the change data feed (never
    re-tokenizing the corpus), then answer a term query — the result
    must equal tokenizing the final replayed state in SQL, which only
    holds if the refresh fenced superseded generations and deletions
    correctly (the second half of the log updates and deletes keys,
    and the 'v2' term only exists in post-update content)."""
    import json

    from ..stages.invindex import _SEP, LakeTextIndex

    log = ensure_log(sf_dir)
    with open(os.path.join(log, "meta.json")) as fh:
        half = json.load(fh)["max_lsn"] // 2
    lake = fresh_lake(sf_dir, "lake_search")
    idx_dir = fresh_lake(sf_dir, "lake_search_index")
    run_replication(log, lake, num_partitions=16, history=True,
                    upto_lsn=half)
    idx = LakeTextIndex.build(lake, idx_dir)
    run_replication(log, lake, num_partitions=16, history=True)
    idx = LakeTextIndex(idx_dir)
    idx.refresh(lake)

    def split_key(df):
        import pandas as pd

        parts = df["doc_key"].str.split(_SEP, expand=True)
        return pd.DataFrame({"repo": parts[1], "path": parts[2],
                             "score": df["score"]})

    return (idx.lookup(["def", "v2"], mode="and")
               .map_batches(split_key, batch_format="pandas"))


def cdc_search_lake_compacted(sf_dir: str):
    """Index COMPACTION mid-lifecycle (``LakeTextIndex.compact`` — the
    Lucene segment-merge analog): build at half, refresh from the change
    feed, COMPACT (fold the refresh generations and the live-docs
    overlay into a fresh base, one pass over the index's own files,
    never the corpus), then answer the same term query as
    cdc_search_lake_content — identical oracle, which only holds if the
    compaction physically dropped exactly the superseded generations and
    deleted docs the overlay was fencing at read time."""
    import json

    from ..stages.invindex import _SEP, LakeTextIndex

    log = ensure_log(sf_dir)
    with open(os.path.join(log, "meta.json")) as fh:
        half = json.load(fh)["max_lsn"] // 2
    lake = fresh_lake(sf_dir, "lake_search_cpt")
    idx_dir = fresh_lake(sf_dir, "lake_search_cpt_index")
    run_replication(log, lake, num_partitions=16, history=True,
                    upto_lsn=half)
    LakeTextIndex.build(lake, idx_dir)
    run_replication(log, lake, num_partitions=16, history=True)
    idx = LakeTextIndex(idx_dir)
    idx.refresh(lake)
    stats = idx.compact()
    assert not idx.overlay and not stats["counters_drifted"]

    def split_key(df):
        import pandas as pd

        parts = df["doc_key"].str.split(_SEP, expand=True)
        return pd.DataFrame({"repo": parts[1], "path": parts[2],
                             "score": df["score"]})

    return (idx.lookup(["def", "v2"], mode="and")
               .map_batches(split_key, batch_format="pandas"))


def cdc_wire_relay_roundtrip(sf_dir: str):
    """Lake → Debezium-wire RELAY round trip (the CDC outbox /
    downstream-feed direction — the engine reads five public Debezium
    wire shapes; ``stages/relay.py`` writes one): replicate the log into
    a source lake in two history legs, publish snapshot-at-half +
    changes half→end as Debezium JSONL envelopes, then ingest that feed
    back through the engine's OWN wire reader into a FRESH lake — whose
    final state must equal the source's (same oracle as
    cdc_final_state). Passing requires the relay's registry-derived DDL
    prefix, the shared snapshot offset, true winning positions on
    c/u envelopes and horizon-positioned deletes to compose exactly
    under the consumer's replay fences."""
    import json
    from glob import glob

    from ..sources.debezium_json import jsonl_to_segments
    from ..stages.relay import relay_changes_jsonl, relay_snapshot_jsonl

    log = ensure_log(sf_dir)
    with open(os.path.join(log, "meta.json")) as fh:
        half = json.load(fh)["max_lsn"] // 2
    src = fresh_lake(sf_dir, "lake_relay_src")
    run_replication(log, src, num_partitions=16, upto_lsn=half,
                    history=True)
    run_replication(log, src, num_partitions=16, history=True)
    wire = fresh_lake(sf_dir, "lake_relay_wire")
    relay_snapshot_jsonl(src, wire, as_of_lsn=half)
    relay_changes_jsonl(src, wire, half)
    seg = fresh_lake(sf_dir, "lake_relay_seg")
    jsonl_to_segments(sorted(glob(os.path.join(wire, "*.jsonl"))), seg)
    dst = fresh_lake(sf_dir, "lake_relay_dst")
    run_replication(seg, dst, num_partitions=8)
    return final_state(dst, columns=FINAL_COLS)


def _content_vecs(contents) -> "np.ndarray":
    """Deterministic 16-dim unit embedding of a content string (md5
    bytes, centered, normalized) — the stand-in for a real embedding
    model (not in this container); the Ray-side plumbing (schema, index
    build/refresh, search) is the real artifact."""
    import hashlib

    out = np.empty((len(contents), 16), np.float32)
    for i, c in enumerate(contents):
        d = hashlib.md5((c or "").encode()).digest()
        out[i] = np.frombuffer(d, np.uint8).astype(np.float32) - 127.5
    n = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(n, 1e-9)


VEC_KEY_SEP = "\x1f"


def _vec_rows(t: "pa.Table") -> "pd.DataFrame":
    import pandas as pd

    keys = [VEC_KEY_SEP.join(map(str, k)) for k in zip(
        t["table"].to_pylist(), t["repo"].to_pylist(),
        t["path"].to_pylist())]
    vecs = _content_vecs(t["content"].to_pylist())
    return pd.DataFrame({"vec_id": keys, "embedding": list(vecs)})


def lake_vector_index_build(lake_dir: str, index_dir: str,
                            n_clusters: int = 16) -> dict:
    """Build the lake's content-embedding IVF index at the current
    watermark; the watermark is stamped beside the index so refresh
    knows where the change feed starts."""
    import json

    from ..stages.similarity import IVFDiskIndex
    from ..state import checkpoint as ckpt

    g = int(ckpt.read_global_watermark(lake_dir))
    base = final_state(lake_dir,
                       columns=["table", "repo", "path", "content"])
    IVFDiskIndex.build(
        base.map_batches(_vec_rows, batch_format="pyarrow"),
        index_dir, n_clusters=n_clusters)
    with open(os.path.join(index_dir, "lake_watermark.json"), "w") as fh:
        json.dump({"watermark": g}, fh)
    return {"watermark": g, "n_clusters": n_clusters}


def lake_vector_index_refresh(lake_dir: str, index_dir: str) -> dict:
    """Advance the index from its stamped watermark to the lake's
    current one using the change data feed: upserts for created/updated
    keys (re-embedded, one pass over the CHANGE SET), tombstones for
    deletes — never re-embedding the corpus. The change set stays in
    the object store (materialized, spillable); the driver receives
    only (key, change) rows — the churn bound the tombstone list needs
    anyway, never the content column (same shape as the text-index
    refresh)."""
    import json

    from ..stages.similarity import IVFDiskIndex
    from ..state import checkpoint as ckpt
    from .replicate import lake_diff

    wm_p = os.path.join(index_dir, "lake_watermark.json")
    with open(wm_p) as fh:
        g0 = int(json.load(fh)["watermark"])
    g1 = int(ckpt.read_global_watermark(lake_dir))
    if g1 <= g0:
        return {"changed": 0, "watermark": g0}
    diff_ds = (lake_diff(lake_dir, g0, to_lsn=g1)
               .select_columns(["table", "repo", "path", "change",
                                "content"])
               .materialize())
    meta_rows = diff_ds.drop_columns(["content"]).take_all()
    dels = [VEC_KEY_SEP.join(map(str, (r["table"], r["repo"], r["path"])))
            for r in meta_rows if r["change"] == "d"]
    n_ups = sum(r["change"] in ("c", "u") for r in meta_rows)
    idx = IVFDiskIndex(index_dir)
    add_ds = None
    if n_ups:
        add_ds = (diff_ds.filter(expr="change != 'd'")
                  .drop_columns(["change"])
                  .map_batches(_vec_rows, batch_format="pyarrow"))
    out = {"changed": len(meta_rows), "watermark": g1}
    if add_ds is not None or dels:
        out.update(idx.refresh(add_ds, delete_ids=dels))
    with open(wm_p, "w") as fh:
        json.dump({"watermark": g1}, fh)
    return out


def cdc_vector_search_lake(sf_dir: str):
    """CDC-MAINTAINED VECTOR INDEX: replicate HALF the log
    (history=True), build a persisted IVF index over per-row content
    embeddings, finish replication, REFRESH the index from the change
    data feed (upserts for created/updated keys, tombstones for
    deletes — ``IVFDiskIndex.refresh``, never re-embedding the corpus),
    then answer a top-10 cosine probe with nprobe == n_clusters (an
    exhaustive, hence exact and deterministic, read). Pytest pins the
    result against brute force over the FINAL state's embeddings —
    which only holds if the refresh upserted and tombstoned exactly.
    Rows-only here (cosine has no SQL shape)."""
    import json

    from ..stages.similarity import IVFDiskIndex

    log = ensure_log(sf_dir)
    with open(os.path.join(log, "meta.json")) as fh:
        half = json.load(fh)["max_lsn"] // 2
    lake = fresh_lake(sf_dir, "lake_vecidx")
    idx_dir = fresh_lake(sf_dir, "lake_vec_index")
    run_replication(log, lake, num_partitions=16, history=True,
                    upto_lsn=half)
    lake_vector_index_build(lake, idx_dir, n_clusters=8)
    run_replication(log, lake, num_partitions=16, history=True)
    lake_vector_index_refresh(lake, idx_dir)

    q = _content_vecs(["vector probe"])[0]
    got = IVFDiskIndex(idx_dir).search(q, k=10, nprobe=8)
    got["score"] = got["score"].round(6)
    return got.reset_index(drop=True)


def cdc_commit_lookup(sf_dir: str):
    """Point-equality on a high-cardinality UNCLUSTERED column via the
    Bloom file-skipping index: replicate, OPTIMIZE (one file per
    partition), index the ``commit`` column, then fetch the rows whose
    commit equals the corpus-min commit — the index prunes every file
    whose Bloom rules the value out (no false negatives; footer min/max
    stats can't prune a column the sort doesn't lead with)."""
    from .maintenance import build_skip_index, optimize_lake, skip_scan_eq

    log = ensure_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_commitidx")
    run_replication(log, lake, num_partitions=16)
    optimize_lake(lake)
    build_skip_index(lake, "commit")
    target = final_state(lake, columns=["commit"]).min("commit")
    return skip_scan_eq(lake, "commit", target,
                        columns=["repo", "path", "commit", "content_sha"])


def cdc_export_incremental(sf_dir: str):
    """Incrementally-maintained training export: full export at the
    half-replay watermark, then finish replication and bring the export
    current by rewriting ONLY the change-feed-touched shards
    (stages/export.py:export_lake_incremental). Result must equal the
    full final state — which only holds if the shard rewrites dropped
    superseded versions and deletions and added creations exactly."""
    import glob as _glob
    import json

    from ..stages.export import export_lake_incremental

    log = ensure_log(sf_dir)
    # first export happens past ALL schema evolution (the export schema
    # is pinned in its manifest; the incremental path maintains rows,
    # not DDL — re-export from scratch on schema change)
    boundary = _time_travel_boundary(log)
    lake = fresh_lake(sf_dir, "lake_export_inc")
    out = fresh_lake(sf_dir, "lake_export_inc_out")
    run_replication(log, lake, num_partitions=16, history=True,
                    upto_lsn=boundary)
    export_lake_incremental(lake, out, nshards=16)
    run_replication(log, lake, num_partitions=16, history=True)
    m = export_lake_incremental(lake, out, nshards=16)
    assert 0 < m["rewritten_shards"], m
    import ray.data

    files = _glob.glob(os.path.join(out, "shard=*", "*.parquet"))
    return (ray.data.read_parquet(files)
            .select_columns(FINAL_COLS))


def cdc_repo_skew_report(sf_dir: str, nparts: int = 32):
    """Hot-key skew report (SURVEY §4): per-repo DML share and the salt
    factor the §4 rule assigns (``k = ceil(n_events / fair_share)`` for
    repos past their fair share, else 1 — compute_repo_salt's rule with
    the ceil done in INTEGER arithmetic so the SQL oracle is
    hash-exact). One dotted-projection scan, per-batch partial counts,
    one repo-sized groupby."""
    import pyarrow.dataset as pads

    log = ensure_log(sf_dir)
    files = sorted(__import__("glob").glob(
        os.path.join(log, "seg-*.parquet")))

    def per_file(batch: pa.Table) -> pa.Table:
        out = []
        for f in batch["file"].to_pylist():
            t = pads.dataset(f, format="parquet").to_table(
                columns={"op": pads.field("op"),
                         "b_repo": pads.field("before", "repo"),
                         "a_repo": pads.field("after", "repo")})
            t = t.filter(pc.not_equal(t["op"], "DDL"))
            repo = pc.coalesce(t["a_repo"], t["b_repo"])
            g = pa.table({"repo": repo}).group_by("repo").aggregate(
                [("repo", "count")])
            out.append(pa.table({"repo": g["repo"],
                                 "n": pc.cast(g["repo_count"],
                                              pa.int64())}))
        return pa.concat_tables(out)

    import ray.data
    from ray.data.aggregate import Sum as _Sum

    agg = (ray.data.from_items([{"file": f} for f in files])
           .map_batches(per_file, batch_format="pyarrow", batch_size=1)
           .groupby("repo")
           .aggregate(_Sum("n", alias_name="n_events"))).take_all()
    total = sum(r["n_events"] for r in agg)
    import pandas as pd

    rows = [{"repo": r["repo"], "n_events": int(r["n_events"]),
             "salt_k": ((int(r["n_events"]) * nparts + total - 1) // total
                        if int(r["n_events"]) * nparts > total else 1)}
            for r in agg]
    return pd.DataFrame(rows).sort_values("repo").reset_index(drop=True)


def cdc_full_lifecycle(sf_dir: str):
    """The operational runbook as ONE correctness gate: replicate half
    → reshard to a bigger layout (cluster resize) → continue
    replication → OPTIMIZE (clustered rewrite) → vacuum tombstones at
    the log head → final state. Every step composes on the fenced
    commit/watermark contract; the result must equal a plain one-shot
    replay (same oracle as cdc_final_state — vacuum only removes
    soft-deleted rows the final-state filter drops anyway)."""
    import json

    from .maintenance import optimize_lake, reshard_lake, vacuum_lake

    log = ensure_log(sf_dir)
    with open(os.path.join(log, "meta.json")) as fh:
        meta = json.load(fh)
    half = meta["max_lsn"] // 2
    lake = fresh_lake(sf_dir, "lake_lifecycle_src")
    dest = fresh_lake(sf_dir, "lake_lifecycle")
    run_replication(log, lake, num_partitions=8, upto_lsn=half)
    reshard_lake(lake, dest, new_partitions=16)
    run_replication(log, dest, num_partitions=16)
    optimize_lake(dest, cluster_by=["repo", "path"])
    vacuum_lake(dest, prune_below=meta["max_lsn"])
    return final_state(dest, columns=FINAL_COLS)


def _time_travel_boundary(log: str) -> int:
    """Midpoint between the last DDL and the end of the log — past all
    schema evolution (so the historical state has the final column set)
    yet strictly before ~15% of the stream. Computed from the log's own
    (lsn, op) columns so the SQL oracle can derive the identical constant
    with one aggregate subquery."""
    import pyarrow.dataset as pads

    dset = pads.dataset(sorted(
        __import__("glob").glob(os.path.join(log, "seg-*.parquet"))))
    t = dset.to_table(columns=["lsn", "op"])
    max_lsn = int(pc.max(t["lsn"]).as_py())
    ddl = t.filter(pc.equal(t["op"], "DDL"))
    last_ddl = int(pc.max(ddl["lsn"]).as_py()) if ddl.num_rows else 0
    return (max_lsn + last_ddl) // 2


def cdc_time_travel(sf_dir: str):
    """Time travel (Delta-Lake-style retained versions): replay in two
    bounded legs with ``history=True``, then read the lake AS OF the
    first leg's boundary — each partition resolves to its retained
    version at/below the position (``state/checkpoint.py:manifest_as_of``).
    The oracle replays LWW over only the events ``lsn <= boundary``,
    proving the reconstructed historical state is exactly the state the
    engine had committed at that position."""
    log = ensure_log(sf_dir)
    boundary = _time_travel_boundary(log)
    lake = fresh_lake(sf_dir, "lake_ttravel")
    run_replication(log, lake, num_partitions=16, upto_lsn=boundary,
                    history=True)
    run_replication(log, lake, num_partitions=16, history=True)
    return final_state(lake, columns=FINAL_COLS, as_of_lsn=boundary)


def cdc_changefeed(sf_dir: str):
    """Change data feed between two retained lake versions (the Delta
    Lake CDF shape): replay with history in two legs, then diff the
    boundary version against the final one — one 'c'/'u'/'d' row per key
    whose live state changed, computed partition-locally with no shuffle
    (``replicate.py:lake_diff``). The oracle full-outer-joins the two
    SQL LWW replays."""
    from .replicate import lake_diff

    log = ensure_log(sf_dir)
    boundary = _time_travel_boundary(log)
    lake = fresh_lake(sf_dir, "lake_cdf")
    run_replication(log, lake, num_partitions=16, upto_lsn=boundary,
                    history=True)
    run_replication(log, lake, num_partitions=16, history=True)
    return lake_diff(lake, boundary).select_columns(
        ["repo", "path", "change", "commit", "content_sha"])


def cdc_point_lookup(sf_dir: str):
    """Point lookups on the lake's primary index (the key-hash partition
    layout): a deterministic md5-selected probe set of live keys is
    fetched via ``lookup_keys`` — each key routes to EXACTLY its
    partition (``partition_of_keys`` reproduces the Normalizer hash from
    the pinned lake config) and only the touched partitions' files are
    read, with key-column predicate pushdown. The probe-set SELECTION
    scans the lake once (it's the query's setup); the lookup itself is
    O(keys)."""
    import hashlib as _hashlib

    from .replicate import lookup_keys

    log = ensure_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_lookup")
    run_replication(log, lake, num_partitions=16)

    def probe_select(df):
        # md5 selection runs INSIDE the scan tasks: the driver receives
        # only the ~1/29 probe keys, never every live key
        sel = np.fromiter(
            (int.from_bytes(_hashlib.md5(k.encode()).digest()[8:],
                            "little") % 29 == 0
             for k in (df["repo"].astype(str) + "|"
                       + df["path"].astype(str))),
            dtype=bool, count=len(df))
        return df[sel]

    probes = (final_state(lake, columns=["table", "repo", "path"])
              .map_batches(probe_select, batch_format="pandas")
              .take_all())
    keys = [(r["table"], r["repo"], r["path"]) for r in probes]
    return lookup_keys(lake, keys, columns=FINAL_COLS)


def cdc_from_debezium_jsonl(sf_dir: str):
    """Flagship replay driven from a Debezium-envelope JSONL feed (the
    reference's native wire format) instead of the Parquet log: envelopes
    are converted + materialized as segments once (cached), then the
    standard replication path replays them. Oracled by the SAME final-state
    SQL over the original log — the wire format must be value-transparent."""
    import json as _json

    from ..sources.debezium_json import jsonl_to_segments, write_debezium_jsonl

    log = ensure_log(sf_dir)
    tag = sf_tag(sf_dir)
    jdir = os.path.join(CACHE_ROOT, f"sf{tag}", "dbz_jsonl")
    sdir = os.path.join(CACHE_ROOT, f"sf{tag}", "dbz_segs")
    with open(os.path.join(log, "meta.json")) as fh:
        src_meta = _json.load(fh)
    stamp = os.path.join(sdir, "meta.json")
    fresh = False
    if os.path.exists(stamp):
        with open(stamp) as fh:
            m = _json.load(fh)
        fresh = (m.get("total_events") == src_meta["total_events"]
                 and m.get("max_lsn") == src_meta["max_lsn"])
    if not fresh:
        shutil.rmtree(jdir, ignore_errors=True)
        shutil.rmtree(sdir, ignore_errors=True)
        write_debezium_jsonl(log, jdir)
        jsonl_to_segments(jdir, sdir)
    lake = fresh_lake(sf_dir, "lake_dbz")
    run_replication(sdir, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def _ensure_jsonl_feed(sf_dir: str) -> str:
    """Debezium-envelope JSONL export of the standard log, cached per sf
    with its own stamp (the segment caches key off their OWN metas, so
    this dir must self-describe freshness)."""
    import json as _json

    from ..sources.debezium_json import write_debezium_jsonl

    log = ensure_log(sf_dir)
    tag = sf_tag(sf_dir)
    jdir = os.path.join(CACHE_ROOT, f"sf{tag}", "dbz_jsonl")
    with open(os.path.join(log, "meta.json")) as fh:
        src_meta = _json.load(fh)
    stamp = os.path.join(jdir, "_src_meta.json")
    if os.path.exists(stamp):
        with open(stamp) as fh:
            if _json.load(fh) == src_meta:
                return jdir
    shutil.rmtree(jdir, ignore_errors=True)
    write_debezium_jsonl(log, jdir)
    tmp = stamp + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        _json.dump(src_meta, fh)
    os.replace(tmp, stamp)
    return jdir


def cdc_jsonl_tail_follow(sf_dir: str):
    """Continuous-tail ingestion off the Debezium JSONL wire: the feed
    directory is drip-fed in three chunks, each brought current by the
    follow loop's pre-poll converter (``tail_jsonl_segments`` — only
    new/grown files convert, per-file idempotent tagged segments) and
    drained by the standard incremental replication poll. Same
    final-state oracle as the batch wire path: the incremental tail
    must be value- and fence-transparent."""
    from ..sources.debezium_json import tail_jsonl_segments

    jdir = _ensure_jsonl_feed(sf_dir)
    files = sorted(f for f in os.listdir(jdir) if f.endswith(".jsonl"))
    tag = sf_tag(sf_dir)
    feed = os.path.join(CACHE_ROOT, f"sf{tag}", "dbz_tail_feed")
    sdir = os.path.join(CACHE_ROOT, f"sf{tag}", "dbz_tail_segs")
    shutil.rmtree(feed, ignore_errors=True)
    shutil.rmtree(sdir, ignore_errors=True)
    os.makedirs(feed)
    lake = fresh_lake(sf_dir, "lake_dbz_tail")
    per = (len(files) + 2) // 3 or 1
    for i in range(0, len(files), per):
        for f in files[i:i + per]:
            os.link(os.path.join(jdir, f), os.path.join(feed, f))
        tail_jsonl_segments(feed, sdir)
        run_replication(sdir, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def _ensure_wire_segments(sf_dir: str, shape: str) -> tuple[str, int]:
    """Build (or reuse) a wire-shaped segment dir for this sf; ``shape``
    is ``mysql`` (binlog file+pos, gtid tx ids) or ``composite``
    (SQL-Server hex change_lsn/commit_lsn). Returns (segment_dir,
    source max_lsn) — both bridges are value-transparent, so the
    source watermark domain applies."""
    import json as _json

    from ..sources.debezium_json import jsonl_to_segments, write_debezium_jsonl

    log = ensure_log(sf_dir)
    tag = sf_tag(sf_dir)
    jdir = os.path.join(CACHE_ROOT, f"sf{tag}", f"dbz_{shape}_jsonl")
    sdir = os.path.join(CACHE_ROOT, f"sf{tag}", f"dbz_{shape}_segs")
    with open(os.path.join(log, "meta.json")) as fh:
        src_meta = _json.load(fh)
    stamp = os.path.join(sdir, "meta.json")
    fresh = False
    if os.path.exists(stamp):
        with open(stamp) as fh:
            m = _json.load(fh)
        fresh = (m.get("total_events") == src_meta["total_events"]
                 and m.get("max_lsn") == src_meta["max_lsn"])
    if not fresh:
        shutil.rmtree(jdir, ignore_errors=True)
        shutil.rmtree(sdir, ignore_errors=True)
        write_debezium_jsonl(log, jdir, mysql=(shape == "mysql"),
                             composite=(shape == "composite"),
                             postgres=(shape == "postgres"),
                             mongo=(shape == "mongo"),
                             oracle=(shape == "oracle"))
        jsonl_to_segments(jdir, sdir)
    return sdir, int(src_meta["max_lsn"])


def _ensure_mysql_segments(sf_dir: str) -> tuple[str, int]:
    return _ensure_wire_segments(sf_dir, "mysql")


def cdc_from_debezium_mysql(sf_dir: str):
    """Replay driven from a MYSQL-shaped Debezium JSONL feed: binlog
    ``file``+``pos`` positions (no integer engine lsn on the wire) and
    per-event ``gtid`` with NO txId — the reader must rebuild the lsn
    through the (file seq << 32 | pos) bridge and synthesize tx ids
    GTID-first (MySqlConstantOffsetBackingStore.java:39-45,
    MySqlRecordConsumer.java:190-195). Oracled by the same final-state
    SQL over the original log — the MySQL wire shape must be
    value-transparent."""
    sdir, _max_lsn = _ensure_mysql_segments(sf_dir)
    lake = fresh_lake(sf_dir, "lake_dbz_mysql")
    run_replication(sdir, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def cdc_from_debezium_sqlserver(sf_dir: str):
    """Replay driven from a SQL-SERVER-shaped Debezium JSONL feed: hex
    ``change_lsn``/``commit_lsn`` positions (SqlServerOffset.java:33-123)
    with no integer engine lsn on the wire — the reader rebuilds the
    engine lsn via the byte-order-preserving Lsn bridge. Same
    final-state oracle: the composite wire shape must be
    value-transparent."""
    sdir, _max_lsn = _ensure_wire_segments(sf_dir, "composite")
    lake = fresh_lake(sf_dir, "lake_dbz_sqlserver")
    run_replication(sdir, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def cdc_from_debezium_postgres(sf_dir: str):
    """Replay driven from a POSTGRES-shaped Debezium JSONL feed: no
    integer position on the wire — only ``source.sequence`` JSON
    arrays of textual ``X/Y`` pg_lsn strings (the public Debezium
    postgres envelope) — with the table namespaced by pg ``schema``
    (``db`` is the database name, not the identity namespace) and
    numeric ``txId``. The reader rebuilds the engine lsn through the
    PgLsn bridge and must prefer ``schema`` over ``db`` for table
    identity. Same final-state oracle: the pg wire shape must be
    value-transparent."""
    sdir, _max_lsn = _ensure_wire_segments(sf_dir, "postgres")
    lake = fresh_lake(sf_dir, "lake_dbz_postgres")
    run_replication(sdir, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def cdc_from_debezium_mongo(sf_dir: str):
    """Replay driven from a MONGODB-shaped Debezium JSONL feed: no
    integer position and NO ``table`` key on the wire — only
    BSON-timestamp ``sec``+``ord`` offset fields (the public Debezium
    mongodb SourceInfo shape) with ``db``+``collection`` identity and
    transaction identity from the multi-document-transaction fields
    ``lsid``+``txnNumber``. The reader rebuilds the engine lsn through
    the packed 64-bit MongoTs bridge and joins lsid:txnNumber as the
    tx token. Same final-state oracle: the mongo wire shape must be
    value-transparent."""
    sdir, _max_lsn = _ensure_wire_segments(sf_dir, "mongo")
    lake = fresh_lake(sf_dir, "lake_dbz_mongo")
    run_replication(sdir, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def cdc_bootstrap_from_parquet(sf_dir: str):
    """Snapshot bootstrap from an EXISTING Parquet table — the
    reference's ``replicateExistingData=true`` path
    (MySqlEventReader.java:126 snapshot mode ``initial``) over real user
    data: a source table of the governed input shape (derived
    deterministically from the ``documents`` fixture) converts into
    snapshot segments (one shared offset for the whole data phase, the
    reference's snapshot-offset semantics) + a CREATE DDL prefix, then
    the standard replication path replays it. Oracle: the same
    projection in SQL — the bootstrap must be value-transparent."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from ..sources.bootstrap import bootstrap_snapshot_segments

    tag = sf_tag(sf_dir)
    src = os.path.join(CACHE_ROOT, f"sf{tag}", "bootstrap_src.parquet")
    segs = os.path.join(CACHE_ROOT, f"sf{tag}", "bootstrap_segs")
    if not os.path.exists(src):
        # fixture builder (driver-side, one pass over the small fixture)
        t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "lang"])
        did = _pc.cast(t["doc_id"], pa.string())
        out = pa.table({
            "repo": _pc.binary_join_element_wise(
                "src", _pc.cast(_pc.subtract(t["doc_id"], _pc.multiply(_pc.divide(t["doc_id"], 7), 7)), pa.string()), ""),
            "path": _pc.binary_join_element_wise("d", did, ""),
            "commit": _pc.binary_join_element_wise("c", did, ""),
            "lang": t["lang"],
            "content": _pc.cast(t["text"], pa.large_string()),
        })
        tmp = src + f".tmp.{os.getpid()}"
        _pq.write_table(out, tmp)
        os.replace(tmp, src)
    shutil.rmtree(segs, ignore_errors=True)
    bootstrap_snapshot_segments(src, segs)
    lake = fresh_lake(sf_dir, "lake_bootstrap")
    run_replication(segs, lake, num_partitions=16)
    return final_state(
        lake, columns=["repo", "path", "commit", "lang", "content"])


def cdc_from_debezium_oracle(sf_dir: str):
    """Replay driven from an ORACLE-shaped Debezium JSONL feed: no
    integer position on the wire — only decimal-string ``scn`` +
    ``commit_scn`` fields (the public Debezium oracle connector's
    SourceInfo offset shape), table identity namespaced by the Oracle
    ``schema`` (owning user; ``db`` is the PDB name, NOT identity), and
    the connector's opaque string ``txId``. The reader rebuilds the
    engine lsn through the identity ``OracleScn`` bridge. Same
    final-state oracle: the oracle wire shape must be
    value-transparent."""
    sdir, _max_lsn = _ensure_wire_segments(sf_dir, "oracle")
    lake = fresh_lake(sf_dir, "lake_dbz_oracle")
    run_replication(sdir, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def cdc_from_debezium_mongo_resume(sf_dir: str):
    """Resume equivalence THROUGH the MongoDB wire shape: replay the
    mongo-shaped segments to half the watermark, checkpoint, resume to
    the end — must equal one-shot replay (same final-state oracle).
    Passing requires the BSON-timestamp ``sec``+``ord`` positions to
    round-trip the checkpoint exactly (the packed MongoTs bridge is the
    identity on the 64-bit domain) and the duplicate-replay fence to
    hold for events whose position is only a (sec, ord) pair on the
    wire."""
    sdir, max_lsn = _ensure_wire_segments(sf_dir, "mongo")
    lake = fresh_lake(sf_dir, "lake_dbz_mongo_resume")
    run_replication(sdir, lake, num_partitions=16, upto_lsn=max_lsn // 2)
    run_replication(sdir, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def cdc_from_debezium_postgres_resume(sf_dir: str):
    """Resume equivalence THROUGH the Postgres wire shape: replay the
    pg-shaped segments to half the watermark, checkpoint, resume to
    the end — must equal one-shot replay (same final-state oracle).
    Passing requires the sequence-array pg_lsn positions to round-trip
    the checkpoint exactly (the PgLsn bridge is the identity on the
    64-bit WAL domain) and the duplicate-replay fence to hold."""
    sdir, max_lsn = _ensure_wire_segments(sf_dir, "postgres")
    lake = fresh_lake(sf_dir, "lake_dbz_postgres_resume")
    run_replication(sdir, lake, num_partitions=16, upto_lsn=max_lsn // 2)
    run_replication(sdir, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def ensure_toast_log(sf_dir: str) -> str:
    """Variant log whose UPDATE events carry Debezium's reserved TOAST
    placeholder in ``after.content`` on a deterministic subset
    (``lsn % 3 == 0`` — the public postgres contract: a TOASTed column
    unchanged by the update is NOT shipped). Built once per sf by
    post-processing a fresh variant log; idempotent via a stamp tied to
    the base log's meta."""
    import json as _json

    import pyarrow.parquet as pq

    from ..stages.merge import TOAST_SENTINEL

    base = ensure_variant_log(sf_dir, "toast_base")
    tag = sf_tag(sf_dir)
    d = os.path.join(CACHE_ROOT, f"sf{tag}", "toast_log")
    with open(os.path.join(base, "meta.json")) as fh:
        base_meta = _json.load(fh)
    stamp = os.path.join(d, "meta.json")
    if os.path.exists(stamp):
        with open(stamp) as fh:
            if _json.load(fh) == base_meta:
                return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    for fname in sorted(os.listdir(base)):
        if not (fname.startswith("seg-") and fname.endswith(".parquet")):
            continue
        tbl = pq.read_table(os.path.join(base, fname))
        rows = tbl.to_pylist()
        for r in rows:
            if (r["op"] == "U" and r["lsn"] % 3 == 0
                    and r["after"] is not None):
                r["after"] = {**r["after"], "content": TOAST_SENTINEL}
        out = pa.Table.from_pylist(rows, schema=tbl.schema)
        tmp = os.path.join(d, fname + f".tmp.{os.getpid()}")
        pq.write_table(out, tmp)
        os.replace(tmp, os.path.join(d, fname))
    tmp = stamp + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        _json.dump(base_meta, fh)
    os.replace(tmp, stamp)
    return d


def cdc_toast_carry_forward(sf_dir: str):
    """Postgres TOAST carry-forward (public Debezium contract: an
    UPDATE that doesn't modify a TOASTed column ships the reserved
    ``__debezium_unavailable_value`` placeholder; the sink must keep
    the previous value). Replays a log whose update events carry the
    placeholder in ``content`` on a deterministic subset with
    ``toast_columns=("content",)`` — the merger resolves each sentinel
    to the key's most recent earlier value (within the batch, or
    forcing a base merge when it predates the batch), and the derived
    ``content_sha`` rides along. Oracled by a sentinel-aware LWW SQL:
    ``last_value(nullif(content, sentinel) IGNORE NULLS)`` per key in
    lsn order."""
    log = ensure_toast_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_toast")
    run_replication(log, lake, num_partitions=8,
                    toast_columns=("content",))
    return final_state(lake, columns=FINAL_COLS)


def cdc_from_debezium_mysql_resume(sf_dir: str):
    """Resume equivalence THROUGH the MySQL wire shape: replay the
    mysql-shaped segments to half the watermark, checkpoint, resume to
    the end — must equal one-shot replay (same final-state oracle).
    Passing requires the (file, pos) offsets to round-trip the
    checkpoint exactly and the duplicate-replay fence to hold in the
    bridged lsn domain (the MySQL analog of F6.1)."""
    sdir, max_lsn = _ensure_mysql_segments(sf_dir)
    lake = fresh_lake(sf_dir, "lake_dbz_mysql_resume")
    run_replication(sdir, lake, num_partitions=16, upto_lsn=max_lsn // 2)
    run_replication(sdir, lake, num_partitions=16)
    return final_state(lake, columns=FINAL_COLS)


def cdc_op_counts(sf_dir: str):
    """Event counts by op over the raw log (M5/M6 routing sanity)."""
    import ray.data

    from .replicate import log_files

    ds = ray.data.read_parquet(log_files(ensure_log(sf_dir)), columns=["op"])
    return ds.groupby("op").count().rename_columns(["op", "n"])


def cdc_events_per_repo(sf_dir: str):
    """DML events per repo (shuffle-light: per-FILE partial count then a
    tiny groupby over partials — the pre-aggregation pattern).

    The read is NESTED-column pruned: each task scans only ``op`` and the
    two ``repo`` struct fields via pyarrow's dotted projection — the
    content payload never leaves storage (ray.data.read_parquet can't
    express nested projection, so tasks over file items do the read)."""
    import ray.data

    from .replicate import log_files

    files = log_files(ensure_log(sf_dir))

    def per_file(batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        parts = []
        for f in batch["file"].to_pylist():
            t = pads.dataset(f, format="parquet").to_table(
                columns={"op": pads.field("op"),
                         "b_repo": pads.field("before", "repo"),
                         "a_repo": pads.field("after", "repo")}
            )
            t = t.filter(pc.not_equal(t["op"], "DDL"))
            repo = pc.if_else(pc.equal(t["op"], "D"), t["b_repo"], t["a_repo"])
            g = pa.table({"repo": repo}).group_by("repo").aggregate(
                [("repo", "count")]
            )
            parts.append(pa.table({"repo": g["repo"], "partial_n": g["repo_count"]}))
        return pa.concat_tables(parts)

    partials = ray.data.from_items([{"file": f} for f in files]).map_batches(
        per_file, batch_format="pyarrow", batch_size=1
    )
    from ray.data.aggregate import Sum

    return partials.groupby("repo").aggregate(Sum("partial_n", alias_name="n"))


def cdc_snapshot_ddl_sequence(sf_dir: str):
    """The golden snapshot DDL prefix in log order
    (MySqlEventReaderIntegrationTest.java:182-245)."""
    import ray.data

    from .replicate import log_files

    ds = ray.data.read_parquet(log_files(ensure_log(sf_dir)), columns=["lsn", "op", "ddl"])
    ds = ds.filter(expr="op == 'DDL'")

    def flat(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lsn": batch["lsn"],
                "ddl_op": pc.struct_field(batch["ddl"], "op"),
                "ddl_table": pc.struct_field(batch["ddl"], "table"),
            }
        )

    return ds.map_batches(flat, batch_format="pyarrow").sort("lsn")


def cdc_tombstones(sf_dir: str):
    """Soft-deleted keys in the lake (deleted and never re-inserted):
    target bookkeeping contract (_is_deleted, BQValidation.java:86-87)."""
    from .replicate import read_lake

    log = ensure_log(sf_dir)
    lake = os.path.join(CACHE_ROOT, f"sf{sf_tag(sf_dir)}", "lake_final")
    if not os.path.isdir(os.path.join(lake, "_checkpoints")):
        run_replication(log, lake, num_partitions=16)
    ds = read_lake(lake, columns=["repo", "path", "_is_deleted", "_sequence_num"])
    return ds.filter(expr="_is_deleted == True").select_columns(
        ["repo", "path", "_sequence_num"]
    )


def ensure_variant_log(sf_dir: str, name: str, **overrides) -> str:
    """Generate (once) a variant CDC log (multi-table / truncate / ...) at
    ~1/4 the main log's size, cached per scale factor."""
    tag = sf_tag(sf_dir)
    base = dict(_SF_SIZES.get(tag, _SF_SIZES["0.01"]))
    base["n_keys"] = max(200, base["n_keys"] // 4)
    base["n_events"] = max(1_000, base["n_events"] // 4)
    base["n_segments"] = max(2, base["n_segments"] // 2)
    d = os.path.join(CACHE_ROOT, f"sf{tag}", name)
    generate_log(d, GenConfig(seed=52, **{**base, **overrides}))
    return d


def cdc_projection(sf_dir: str):
    """Column projection (M4, Records.java:123-148): replicate only
    (repo, path, commit) — unselected columns never reach the lake."""
    log = ensure_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_proj")
    run_replication(log, lake, num_partitions=8,
                    columns={"repo", "path", "commit"}, compute_sha=False)
    return final_state(lake, columns=["repo", "path", "commit", "_sequence_num"])


def cdc_dml_blacklist(sf_dir: str):
    """DML blacklist (M9, MySqlRecordConsumer.java:352-356): DELETE events
    of the table are dropped at normalize — a deleted key keeps its last
    insert/update image."""
    from ..model import DEFAULT_TABLE

    log = ensure_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_dmlblk")
    run_replication(log, lake, num_partitions=8,
                    dml_blacklist={(DEFAULT_TABLE, "D")})
    return final_state(lake, columns=FINAL_COLS)


def cdc_table_filter(sf_dir: str):
    """Table filter (M8, SourceTable selection): a 2-table log replicated
    with only the first table selected."""
    from ..model import DEFAULT_TABLE

    log = ensure_variant_log(sf_dir, "mt_log", n_tables=2, ddl_plan=False)
    lake = fresh_lake(sf_dir, "lake_tfilter")
    run_replication(log, lake, num_partitions=8, table_filter={DEFAULT_TABLE})
    return final_state(
        lake, columns=["repo", "path", "commit", "lang", "content_sha",
                       "_sequence_num"]
    )


def cdc_multi_table_final(sf_dir: str):
    """Full multi-table replication (no filter): both tables of the
    2-table log land in ONE lake, LWW keyed by (table, repo, path) — the
    reference's multiple-SourceTable shape. The output carries the table
    column so the oracle's per-table LWW gates the key-space isolation
    (same (repo, path) under different tables must not collide)."""
    log = ensure_variant_log(sf_dir, "mt_log", n_tables=2, ddl_plan=False)
    lake = fresh_lake(sf_dir, "lake_mtall")
    run_replication(log, lake, num_partitions=8)
    return final_state(
        lake, columns=["table", "repo", "path", "commit", "lang",
                       "content_sha", "_sequence_num"]
    )


def cdc_truncate_fence(sf_dir: str):
    """TRUNCATE fence (M13 / §2.6): rows whose winning event predates the
    mid-stream TRUNCATE are dead in the final state."""
    log = ensure_variant_log(sf_dir, "trunc_log", truncate_frac=0.5,
                             ddl_plan=False)
    lake = fresh_lake(sf_dir, "lake_trunc")
    run_replication(log, lake, num_partitions=8)
    return final_state(
        lake, columns=["repo", "path", "commit", "lang", "content_sha",
                       "_sequence_num"]
    )


def cdc_ddl_blacklist(sf_dir: str):
    """DDL blacklist (M10, MySqlRecordConsumer.java:347-356): ALTER_TABLE
    events of the table are suppressed when building the registry — the
    engine never learns the added ``stars`` column or the lang->language
    rename, so the lake keeps the CREATE-time schema; post-rename events
    carry ``language``, which no longer maps to the frozen ``lang``
    column (null), exactly like a reference target that never saw the
    DDL."""
    from ..model import DEFAULT_TABLE
    from ..state.ddl import build_registry

    log = ensure_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_ddlblk")
    reg = build_registry(log, ddl_blacklist={(DEFAULT_TABLE, "ALTER_TABLE")})
    run_replication(log, lake, num_partitions=8, registry=reg)
    return final_state(
        lake, columns=["repo", "path", "commit", "lang", "content_sha",
                       "_sequence_num"])


def cdc_first_seen_synthesis(sf_dir: str):
    """First-seen DDL synthesis (M17, SqlServerRecordConsumer.java:154-202):
    a log with NO DDL events at all (no snapshot prefix, no ALTER plan) —
    the registry synthesizes CREATE_TABLE from the first DML's payload
    struct + primary key. The synthesized schema carries every payload
    field; fields only ever populated by ALTERed versions (stars,
    language) stay null throughout."""
    log = ensure_variant_log(sf_dir, "noddl_log", ddl_plan=False,
                             snapshot=False)
    lake = fresh_lake(sf_dir, "lake_noddl")
    run_replication(log, lake, num_partitions=8)
    return final_state(
        lake, columns=["repo", "path", "commit", "lang", "stars", "language",
                       "content_sha", "_sequence_num"])


def cdc_tx_consistent(sf_dir: str):
    """Transactionally-consistent point-in-time replay: the log carries
    multi-event transactions (contiguous lsn runs sharing a tx_id that
    encodes the tx's first lsn — the MySQL binlog shape; the reference
    stamps the same transactionId on every DMLEvent of a tx,
    MySqlRecordConsumer.java:209-225). The replay is bounded at an
    arbitrary lsn 3/5 through the log — almost surely mid-transaction —
    and ``tx_consistent=True`` lowers the fence to the last complete-tx
    commit boundary, so no transaction is ever half-applied to the lake
    (Debezium's embedded engine likewise only emits committed txs)."""
    log = ensure_variant_log(sf_dir, "tx_log", tx_size=6)
    lake = fresh_lake(sf_dir, "lake_txc")
    bound = log_max_lsn(log) * 3 // 5
    run_replication(log, lake, num_partitions=8, upto_lsn=bound,
                    tx_consistent=True)
    return final_state(lake, columns=FINAL_COLS)


def cdc_incremental_snapshot(sf_dir: str):
    """DBLog-style incremental snapshot (Andreakis & Papapanagiotou 2019;
    Debezium's incremental-snapshot feature): no blocking base dump — the
    base table is read in PK-range CHUNKS interleaved with the live
    stream, each chunk reflecting table state at its low-watermark
    position. The engine orders chunk rows at the low watermark
    (tx_id "chunk:<lsn>" -> effective sequence), so stream events past
    the watermark win reconciliation and the final lake equals the
    effective-lsn LWW the oracle computes. The interesting property:
    ARRIVAL order != commit order here, which plain replay never
    exercises."""
    log = ensure_variant_log(sf_dir, "dblog_log", incremental_snapshot=True,
                             ddl_plan=False, snapshot_chunks=8)
    lake = fresh_lake(sf_dir, "lake_dblog")
    run_replication(log, lake, num_partitions=8, incremental_snapshot=True)
    return final_state(
        lake, columns=["repo", "path", "commit", "content_sha",
                       "_sequence_num"])


def cdc_changelog_prev_commit(sf_dir: str):
    """Changelog audit: every DML event annotated with the PREVIOUS commit
    sha of its key (per-key LAG over lsn order) — the lineage view a
    downstream auditor joins against. One key-hash coarse shuffle, then a
    vectorized per-partition sort + grouped shift; keys never span
    partitions so the window needs no carry. The read uses dotted nested
    projection (six leaf columns; content never leaves storage)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from .replicate import log_files

    files = log_files(ensure_log(sf_dir))
    nparts = 32

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        out = []
        for f in batch["file"].to_pylist():
            t = pads.dataset(f, format="parquet").to_table(
                columns={"lsn": pads.field("lsn"),
                         "op": pads.field("op"),
                         "a_repo": pads.field("after", "repo"),
                         "b_repo": pads.field("before", "repo"),
                         "a_path": pads.field("after", "path"),
                         "b_path": pads.field("before", "path"),
                         "a_commit": pads.field("after", "commit")})
            t = t.filter(pc.not_equal(t["op"], "DDL"))
            repo = pc.coalesce(t["a_repo"], t["b_repo"])
            path = pc.coalesce(t["a_path"], t["b_path"])
            kdf = pa.table({"r": repo, "p": path}).to_pandas()
            import pandas as _pd

            h = _pd.util.hash_pandas_object(kdf, index=False).to_numpy()
            out.append(pa.table({
                "part": pa.array((h % np.uint64(nparts)).astype(np.int32)),
                "repo": repo, "path": path,
                "lsn": t["lsn"], "op": t["op"],
                "commit": t["a_commit"]}))
        return pa.concat_tables(out)

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["repo", "path", "lsn"])
        prev = g.groupby(["repo", "path"], sort=False)["commit"].shift(1)
        # pandas shift yields float NaN for missing strings; emit real
        # nulls so the Arrow block (and the driver's hash) sees None
        g["prev_commit"] = prev.astype(object).where(prev.notna(), None)
        return g[["repo", "path", "lsn", "op", "commit", "prev_commit"]]

    return (ray.data.from_items([{"file": f} for f in files])
            .map_batches(prep, batch_format="pyarrow", batch_size=1)
            .groupby("part")
            .map_groups(window, batch_format="pandas"))


def cdc_final_state_optimized(sf_dir: str):
    """Replay, then OPTIMIZE (clustered rewrite: one sorted file per
    partition, bounded row groups) — the final state must be IDENTICAL
    to the unoptimized replay (same oracle as cdc_final_state); tests
    additionally assert the file-count collapse and footer-stat
    prunability."""
    from .maintenance import optimize_lake

    log = ensure_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_optimized")
    run_replication(log, lake, num_partitions=16)
    optimize_lake(lake, cluster_by=["language", "stars"],
                  row_group_size=4096)
    return final_state(lake, columns=FINAL_COLS)


def cdc_language_slice(sf_dir: str):
    """Predicate-pushdown read off the OPTIMIZED lake: replicate, cluster
    by language, then read only the ``language='py'`` slice — the filter
    is a pads expression pushed into the parquet scan, so the clustered
    row-group footer stats prune everything else (the read path OPTIMIZE
    exists to serve)."""
    import pyarrow.dataset as pads

    from .maintenance import optimize_lake

    log = ensure_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_lang_slice")
    run_replication(log, lake, num_partitions=16)
    optimize_lake(lake, cluster_by=["language", "stars"],
                  row_group_size=4096)
    return final_state(lake, columns=FINAL_COLS,
                       predicate=(pads.field("language") == "py"))


def cdc_scd2_history(sf_dir: str):
    """SCD Type 2 dimension history derived from the change stream: one
    row per UPSERT VERSION of a key, carrying ``valid_from`` (its lsn)
    and ``valid_to`` (the lsn of the key's NEXT event — update or delete
    — NULL while still current). The standard slowly-changing-dimension
    build a warehouse runs off CDC (reference contract: the
    before/after image pairing of DMLEvent, SURVEY §2 M7, re-expressed
    as interval versioning). Same distributed shape as
    cdc_changelog_prev_commit: one key-hash coarse shuffle (no content —
    six leaf columns via dotted nested projection), per-partition sort +
    grouped shift(-1); keys never span partitions so the LEAD window
    needs no carry."""
    import numpy as np
    import pandas as pd
    import ray.data

    from .replicate import log_files

    files = log_files(ensure_log(sf_dir))
    nparts = 32

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        out = []
        for f in batch["file"].to_pylist():
            t = pads.dataset(f, format="parquet").to_table(
                columns={"lsn": pads.field("lsn"),
                         "op": pads.field("op"),
                         "a_repo": pads.field("after", "repo"),
                         "b_repo": pads.field("before", "repo"),
                         "a_path": pads.field("after", "path"),
                         "b_path": pads.field("before", "path"),
                         "a_commit": pads.field("after", "commit")})
            t = t.filter(pc.not_equal(t["op"], "DDL"))
            repo = pc.coalesce(t["a_repo"], t["b_repo"])
            path = pc.coalesce(t["a_path"], t["b_path"])
            kdf = pa.table({"r": repo, "p": path}).to_pandas()
            h = pd.util.hash_pandas_object(kdf, index=False).to_numpy()
            out.append(pa.table({
                "part": pa.array((h % np.uint64(nparts)).astype(np.int32)),
                "repo": repo, "path": path,
                "lsn": t["lsn"], "op": t["op"],
                "commit": t["a_commit"]}))
        return pa.concat_tables(out)

    def versions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["repo", "path", "lsn"])
        # LEAD(lsn): the next event of the SAME key closes this version
        nxt = g.groupby(["repo", "path"], sort=False)["lsn"].shift(-1)
        g["valid_from"] = g["lsn"]
        # float64, not nullable Int64: DuckDB's .df() coerces BIGINT-with-
        # NULL to float64, and the driver hashes the string form — keep
        # both sides in the identical representation (NaN == open interval)
        g["valid_to"] = nxt
        g["is_current"] = (nxt.isna()).astype("int64")
        g = g[g["op"] != "D"]  # deletes close intervals, never open one
        return g[["repo", "path", "commit", "valid_from", "valid_to",
                  "is_current"]]

    return (ray.data.from_items([{"file": f} for f in files])
            .map_batches(prep, batch_format="pyarrow", batch_size=1)
            .groupby("part")
            .map_groups(versions, batch_format="pandas"))


def cdc_dead_letter_queue(sf_dir: str):
    """errors.tolerance=all + dead-letter queue (Debezium/Kafka-Connect
    operational contract): a log carrying ~3% poisoned events (unknown op
    codes, missing row images) replays with ``on_error='dlq'`` — poison
    routes to ``lake/_dlq`` and the job COMPLETES; the lake equals the
    LWW over the clean events only (which is what the oracle computes)."""
    log = ensure_variant_log(sf_dir, "poison_log", poison_frac=0.03)
    lake = fresh_lake(sf_dir, "lake_dlq")
    run_replication(log, lake, num_partitions=8, on_error="dlq")
    return final_state(lake, columns=FINAL_COLS)


def cdc_dlq_contents(sf_dir: str):
    """The dead-letter queue itself: exactly the poisoned events, with
    machine-readable reasons, deduped by lsn (the DLQ write is
    at-least-once; the queue read is exact)."""
    from .replicate import read_dlq

    log = ensure_variant_log(sf_dir, "poison_log", poison_frac=0.03)
    lake = fresh_lake(sf_dir, "lake_dlq2")
    run_replication(log, lake, num_partitions=8, on_error="dlq")
    return read_dlq(lake).select_columns(["lsn", "op", "reason"])


def cdc_view_repo_stats(sf_dir: str):
    """Incremental view maintenance (pipelines/ivm.py): a per-repo
    aggregate (live path count + total content chars) kept in sync by
    applying signed DELTAS from the change stream — never recomputed from
    the lake. Maintained in TWO increments (2/3 of the log, then the
    rest) so the gate proves incrementality; the oracle recomputes the
    same aggregate from scratch over the LWW final state."""
    from .ivm import maintain_view, read_view

    log = ensure_log(sf_dir)
    view = fresh_lake(sf_dir, "view_repo")
    mx = log_max_lsn(log)
    maintain_view(log, view, num_partitions=8, upto_lsn=mx * 2 // 3)
    maintain_view(log, view, num_partitions=8)
    return read_view(view)


def cdc_view_repo_join(sf_dir: str):
    """Incrementally-maintained JOIN view over the TWO-table log
    (pipelines/ivm.py:maintain_join_view): per-repo live-key counts of
    both SourceTables, co-partitioned by the JOIN key and merged
    partition-locally — the streaming join-of-aggregates a warehouse
    keeps over multi-table CDC. Two increments prove incrementality;
    the oracle joins full per-table recomputes of the LWW final state."""
    from .ivm import maintain_join_view, read_join_view

    log = ensure_variant_log(sf_dir, "mt_log", n_tables=2, ddl_plan=False)
    view = fresh_lake(sf_dir, "view_repo_join")
    mx = log_max_lsn(log)
    kw = dict(table_a="inventory.code_files",
              table_b="inventory.code_files_1", num_partitions=8)
    maintain_join_view(log, view, upto_lsn=mx * 2 // 3, **kw)
    maintain_join_view(log, view, **kw)
    return read_join_view(view)


def cdc_all_datatypes(sf_dir: str):
    """End-to-end replication of the ALL-DATATYPES table: the reference's
    type-conformance core (33-column e2e fixture, pluginParameters.
    properties:28-58 / BQValidation.java:104-213). The log carries RAW
    source encodings; the V1-V13 converter kernels run inside normalize;
    the lake stores the real Arrow types (decimal/date/time/timestamp tz+
    naive/fixed-binary/enum/set/...); the result is projected to canonical
    comparison columns matching the DuckDB oracle's decode expressions."""
    from ..sources.gen_typed import canonical_batch, typed_columns

    log = ensure_typed_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_typed")
    run_replication(log, lake, num_partitions=8, primary_key=("id",),
                    compute_sha=False)
    names = [c.name for c in typed_columns()] + ["_sequence_num"]
    ds = final_state(lake, columns=names)
    return ds.map_batches(canonical_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — parameterized on the sf0.01 cache path, which the
# driver uses for side-by-side correctness runs
# ---------------------------------------------------------------------------


def _log_glob(sf: str = "0.01") -> str:
    return os.path.join(CACHE_ROOT, f"sf{sf}", "log", "seg-*.parquet")


_LWW_CTE = """
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after."commit" AS "commit",
         coalesce(after.language, after.lang) AS language,
         after.stars AS stars,
         sha256(after.content) AS content_sha
  FROM read_parquet('{glob}')
  WHERE op <> 'DDL'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k_repo, k_path ORDER BY lsn DESC) AS rn
  FROM ev
)
"""


def _typed_log_glob(sf: str = "0.01") -> str:
    return os.path.join(CACHE_ROOT, f"sf{sf}", "typed_log", "seg-*.parquet")


def _variant_glob(sf: str, name: str) -> str:
    return os.path.join(CACHE_ROOT, f"sf{sf}", name, "seg-*.parquet")


def cdc_oracle_sql(sf: str = "0.01") -> dict[str, str]:
    from ..sources.gen_typed import typed_oracle_sql

    glob = _log_glob(sf)
    lww = _LWW_CTE.format(glob=glob)
    final_sql = (
        lww
        + """
SELECT k_repo AS repo, k_path AS path, "commit", language, stars, content_sha,
       lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
"""
    )
    # lake text search: tokenize the final replayed state's content the
    # same way the index does (lower + [a-z0-9_]+, RE2 both sides) and
    # score the AND query — equals the engine only when the refresh
    # fenced superseded generations and deletions correctly
    search_sql = f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after.content AS content
  FROM read_parquet('{glob}')
  WHERE op <> 'DDL'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k_repo, k_path
                               ORDER BY lsn DESC) AS rn
  FROM ev
),
live AS (
  SELECT k_repo AS repo, k_path AS path, content
  FROM ranked WHERE rn = 1 AND op <> 'D'
),
flat AS (
  SELECT repo, path,
         unnest(regexp_extract_all(lower(content), '[a-z0-9_]+')) AS tok
  FROM live
),
m AS (
  SELECT repo, path, tok, CAST(count(*) AS BIGINT) AS tf
  FROM flat WHERE tok IN ('def', 'v2') GROUP BY 1, 2, 3
)
SELECT repo, path, CAST(sum(tf) AS BIGINT) AS score
FROM m GROUP BY 1, 2 HAVING count(*) = 2
"""
    skew_sql = f"""
WITH ev AS (
  SELECT coalesce(after.repo, before.repo) AS repo
  FROM read_parquet('{glob}') WHERE op <> 'DDL'
), c AS (
  SELECT repo, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1
), t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM ev)
SELECT repo, n AS n_events,
       CAST(CASE WHEN n * 32 > t.tot
                 THEN (n * 32 + t.tot - 1) // t.tot
                 ELSE 1 END AS BIGINT) AS salt_k
FROM c, t
"""
    # commit lookup: the engine's skip-scan result equals a plain filter
    # on the replayed final state for the corpus-min commit
    commit_sql = (
        lww
        + """
, live AS (
  SELECT k_repo AS repo, k_path AS path, "commit", content_sha
  FROM ranked WHERE rn = 1 AND op <> 'D'
)
SELECT repo, path, "commit", content_sha FROM live
WHERE "commit" = (SELECT min("commit") FROM live)
"""
    )
    # time travel: the same LWW replay restricted to events at/below the
    # boundary the engine computed — (last DDL lsn + max lsn) // 2
    bound = (f"(SELECT (max(lsn) + max(CASE WHEN op = 'DDL' THEN lsn "
             f"ELSE 0 END)) // 2 FROM read_parquet('{glob}'))")
    ttravel_sql = final_sql.replace(
        "WHERE op <> 'DDL'", f"WHERE op <> 'DDL' AND lsn <= {bound}")
    assert ttravel_sql != final_sql
    cdf_sql = f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after."commit" AS "commit",
         sha256(after.content) AS content_sha
  FROM read_parquet('{glob}')
  WHERE op <> 'DDL'
),
old AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY k_repo, k_path
                                 ORDER BY lsn DESC) AS rn
    FROM ev WHERE lsn <= {bound})
  WHERE rn = 1 AND op <> 'D'
),
new AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY k_repo, k_path
                                 ORDER BY lsn DESC) AS rn
    FROM ev)
  WHERE rn = 1 AND op <> 'D'
)
SELECT coalesce(n.k_repo, o.k_repo) AS repo,
       coalesce(n.k_path, o.k_path) AS path,
       CASE WHEN o.k_repo IS NULL THEN 'c'
            WHEN n.k_repo IS NULL THEN 'd' ELSE 'u' END AS change,
       n."commit" AS "commit", n.content_sha AS content_sha
FROM new n FULL OUTER JOIN old o
  ON n.k_repo = o.k_repo AND n.k_path = o.k_path
WHERE o.k_repo IS NULL OR n.k_repo IS NULL OR n.lsn <> o.lsn
"""
    # lake → training corpus: LWW live rows → quality gate → md5 sample
    # → exact dedup by content hash (keep min (repo, path)) → md5 shards
    corpus_sql = f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         coalesce(after.language, after.lang) AS language,
         after.content AS content,
         sha256(after.content) AS content_sha
  FROM read_parquet('{glob}')
  WHERE op <> 'DDL'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k_repo, k_path
                               ORDER BY lsn DESC) AS rn
  FROM ev
),
live AS (
  SELECT k_repo AS repo, k_path AS path, language, content, content_sha
  FROM ranked WHERE rn = 1 AND op <> 'D'
),
gated AS (
  SELECT * FROM live
  WHERE length(content) >= 64
    AND md5_number_lower(repo || '|' || path) % 10 < 8
),
dd AS (
  SELECT *, row_number() OVER (PARTITION BY content_sha
                               ORDER BY repo, path) AS rn2
  FROM gated
)
SELECT content_sha, repo, path, language,
       CAST(md5_number_lower(content_sha) % 16 AS BIGINT) AS shard
FROM dd WHERE rn2 = 1
"""
    return {
        "cdc_final_state": final_sql,
        "cdc_apply_duckdb_validate": final_sql,
        "cdc_drift_report": f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         coalesce(after.language, after.lang) AS language,
         after.stars AS stars
  FROM read_parquet('{glob}') WHERE op <> 'DDL'
),
v0 AS (SELECT * FROM (
         SELECT *, row_number() OVER (PARTITION BY k_repo, k_path
                                      ORDER BY lsn DESC) AS rn
         FROM ev WHERE lsn <= {bound})
       WHERE rn = 1 AND op <> 'D'),
v1 AS (SELECT * FROM (
         SELECT *, row_number() OVER (PARTITION BY k_repo, k_path
                                      ORDER BY lsn DESC) AS rn
         FROM ev)
       WHERE rn = 1 AND op <> 'D'),
cats AS (
  SELECT 'language' AS col, coalesce(language, '<null>') AS category,
         0 AS version FROM v0
  UNION ALL
  SELECT 'language', coalesce(language, '<null>'), 1 FROM v1
  UNION ALL
  SELECT 'stars',
         CASE WHEN stars IS NULL THEN '<null>'
              ELSE CAST(CAST(least(floor(CAST(stars AS DOUBLE) / 64.0),
                                   15) AS BIGINT) AS VARCHAR) END,
         0 FROM v0
  UNION ALL
  SELECT 'stars',
         CASE WHEN stars IS NULL THEN '<null>'
              ELSE CAST(CAST(least(floor(CAST(stars AS DOUBLE) / 64.0),
                                   15) AS BIGINT) AS VARCHAR) END,
         1 FROM v1
),
counts AS (
  SELECT col, category, version, CAST(count(*) AS BIGINT) AS n
  FROM cats GROUP BY 1, 2, 3
),
cp AS (
  SELECT col, category,
         CAST(coalesce(sum(CASE WHEN version = 0 THEN n END), 0)
              AS BIGINT) AS c0,
         CAST(coalesce(sum(CASE WHEN version = 1 THEN n END), 0)
              AS BIGINT) AS c1
  FROM counts GROUP BY 1, 2
),
tot AS (
  SELECT col, CAST(sum(c0) AS BIGINT) AS n0,
         CAST(sum(c1) AS BIGINT) AS n1,
         CAST(count(*) AS BIGINT) AS k
  FROM cp GROUP BY 1
)
SELECT cp.col, cp.category, cp.c0 AS count_v0, cp.c1 AS count_v1,
       CAST(floor((CAST(cp.c0 + 1 AS DOUBLE) / CAST(tot.n0 + tot.k AS DOUBLE)
                   - CAST(cp.c1 + 1 AS DOUBLE) / CAST(tot.n1 + tot.k AS DOUBLE))
                  * ln((CAST(cp.c0 + 1 AS DOUBLE) / CAST(tot.n0 + tot.k AS DOUBLE))
                       / (CAST(cp.c1 + 1 AS DOUBLE) / CAST(tot.n1 + tot.k AS DOUBLE)))
                  * 1e6 + 0.5) AS BIGINT) AS contrib_micros
FROM cp JOIN tot USING (col)
""",
        "cdc_transformed_apply": (
            lww
            .replace("coalesce(after.language, after.lang) AS language",
                     "upper(coalesce(after.language, after.lang)) "
                     "AS language")
            .replace("sha256(after.content) AS content_sha",
                     "sha256(substr(after.content, 1, 100)) "
                     "AS content_sha")
            + """
SELECT k_repo AS repo, k_path AS path, "commit", language, stars, content_sha,
       lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
"""
        ),
        "cdc_to_training_corpus": corpus_sql,
        "cdc_resume_equivalence": final_sql,
        "cdc_reshard_continuation": final_sql,
        "cdc_full_lifecycle": final_sql,
        "cdc_search_lake_content": search_sql,
        "cdc_search_lake_compacted": search_sql,
        "cdc_wire_relay_roundtrip": final_sql,
        "cdc_commit_lookup": commit_sql,
        "cdc_export_incremental": final_sql,
        "cdc_repo_skew_report": skew_sql,
        "cdc_final_state_optimized": final_sql,
        "cdc_language_slice": final_sql.replace(
            "WHERE rn = 1 AND op <> 'D'",
            "WHERE rn = 1 AND op <> 'D' AND language = 'py'"),
        "cdc_time_travel": ttravel_sql,
        "cdc_changefeed": cdf_sql,
        "cdc_point_lookup": final_sql.replace(
            "WHERE rn = 1 AND op <> 'D'",
            "WHERE rn = 1 AND op <> 'D' AND "
            "md5_number_lower(k_repo || '|' || k_path) % 29 = 0"),
        "cdc_from_debezium_jsonl": final_sql,
        "cdc_from_debezium_mysql": final_sql,
        "cdc_from_debezium_mysql_resume": final_sql,
        "cdc_from_debezium_sqlserver": final_sql,
        "cdc_from_debezium_postgres": final_sql,
        "cdc_from_debezium_postgres_resume": final_sql,
        "cdc_from_debezium_mongo": final_sql,
        "cdc_from_debezium_mongo_resume": final_sql,
        "cdc_jsonl_tail_follow": final_sql,
        "cdc_from_debezium_oracle": final_sql,
        "cdc_bootstrap_from_parquet": """
SELECT 'src' || CAST(doc_id % 7 AS VARCHAR) AS repo,
       'd' || CAST(doc_id AS VARCHAR) AS path,
       'c' || CAST(doc_id AS VARCHAR) AS "commit",
       lang,
       text AS content
FROM documents
""",
        "cdc_toast_carry_forward": f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after."commit" AS "commit",
         coalesce(after.language, after.lang) AS language,
         after.stars AS stars,
         after.content AS content_raw,
         nullif(after.content, '__debezium_unavailable_value') AS content_nn
  FROM read_parquet('{_variant_glob(sf, "toast_log")}')
  WHERE op <> 'DDL'
),
res AS (
  -- carry forward ONLY at placeholder rows: a genuine NULL written by
  -- an update is a real value and keeps NULL (Debezium contract)
  SELECT *, CASE WHEN content_raw = '__debezium_unavailable_value'
      THEN coalesce(last_value(content_nn IGNORE NULLS) OVER (
          PARTITION BY k_repo, k_path ORDER BY lsn
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), content_raw)
      ELSE content_raw END AS content_res
  FROM ev
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k_repo, k_path
                               ORDER BY lsn DESC) AS rn
  FROM res
)
SELECT k_repo AS repo, k_path AS path, "commit", language, stars,
       sha256(content_res) AS content_sha, lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
        "cdc_op_counts": f"""
SELECT op, count(*) AS n FROM read_parquet('{glob}') GROUP BY op
""",
        "cdc_events_per_repo": f"""
SELECT coalesce(after.repo, before.repo) AS repo, count(*) AS n
FROM read_parquet('{glob}') WHERE op <> 'DDL' GROUP BY 1
""",
        "cdc_snapshot_ddl_sequence": f"""
SELECT lsn, ddl.op AS ddl_op, ddl."table" AS ddl_table
FROM read_parquet('{glob}') WHERE op = 'DDL' ORDER BY lsn
""",
        "cdc_tombstones": lww
        + """
SELECT k_repo AS repo, k_path AS path, lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op = 'D'
""",
        "cdc_all_datatypes": typed_oracle_sql(_typed_log_glob(sf)),
        "cdc_projection": lww
        + """
SELECT k_repo AS repo, k_path AS path, "commit", lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
        # blacklisted DELETEs are dropped BEFORE ranking: the key keeps its
        # last insert/update image
        "cdc_dml_blacklist": lww.replace("WHERE op <> 'DDL'",
                                         "WHERE op NOT IN ('DDL', 'D')")
        + """
SELECT k_repo AS repo, k_path AS path, "commit", language, stars, content_sha,
       lsn AS _sequence_num
FROM ranked WHERE rn = 1
""",
        "cdc_multi_table_final": f"""
WITH ev AS (
  SELECT lsn, op, "table",
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after."commit" AS "commit",
         after.lang AS lang,
         sha256(after.content) AS content_sha
  FROM read_parquet('{_variant_glob(sf, "mt_log")}')
  WHERE op <> 'DDL'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY "table", k_repo, k_path
                               ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT "table", k_repo AS repo, k_path AS path, "commit", lang,
       content_sha, lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
        "cdc_view_repo_join": f"""
WITH ev AS (
  SELECT lsn, op, "table",
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path
  FROM read_parquet('{_variant_glob(sf, "mt_log")}')
  WHERE op <> 'DDL'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY "table", k_repo, k_path
                               ORDER BY lsn DESC) AS rn
  FROM ev
),
fin AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'D'),
a AS (SELECT k_repo AS repo, CAST(count(*) AS BIGINT) AS n_paths_a
      FROM fin WHERE "table" = 'inventory.code_files' GROUP BY 1),
b AS (SELECT k_repo AS repo, CAST(count(*) AS BIGINT) AS n_paths_b
      FROM fin WHERE "table" = 'inventory.code_files_1' GROUP BY 1)
SELECT repo, n_paths_a, n_paths_b FROM a JOIN b USING (repo)
""",
        "cdc_table_filter": f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after."commit" AS "commit",
         after.lang AS lang,
         sha256(after.content) AS content_sha
  FROM read_parquet('{_variant_glob(sf, "mt_log")}')
  WHERE op <> 'DDL' AND "table" = 'inventory.code_files'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k_repo, k_path ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT k_repo AS repo, k_path AS path, "commit", lang, content_sha,
       lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
        # ALTERs never applied: lang is frozen at CREATE shape — post-rename
        # events' values live in `language` and do NOT reach the lang column
        "cdc_ddl_blacklist": f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after."commit" AS "commit",
         after.lang AS lang,
         sha256(after.content) AS content_sha
  FROM read_parquet('{glob}')
  WHERE op <> 'DDL'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k_repo, k_path ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT k_repo AS repo, k_path AS path, "commit", lang, content_sha,
       lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
        "cdc_first_seen_synthesis": f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after."commit" AS "commit",
         after.lang AS lang,
         after.stars AS stars,
         after.language AS language,
         sha256(after.content) AS content_sha
  FROM read_parquet('{_variant_glob(sf, "noddl_log")}')
  WHERE op <> 'DDL'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k_repo, k_path ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT k_repo AS repo, k_path AS path, "commit", lang, stars, language,
       content_sha, lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
        "cdc_changelog_prev_commit": f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS repo,
         coalesce(after.path, before.path)  AS path,
         after."commit" AS "commit"
  FROM read_parquet('{glob}') WHERE op <> 'DDL'
)
SELECT repo, path, lsn, op, "commit",
       lag("commit") OVER (PARTITION BY repo, path ORDER BY lsn) AS prev_commit
FROM ev
""",
        "cdc_scd2_history": f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS repo,
         coalesce(after.path, before.path)  AS path,
         after."commit" AS "commit"
  FROM read_parquet('{glob}') WHERE op <> 'DDL'
), v AS (
  SELECT *, lead(lsn) OVER (PARTITION BY repo, path ORDER BY lsn)
              AS valid_to
  FROM ev
)
SELECT repo, path, "commit", lsn AS valid_from, valid_to,
       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS is_current
FROM v WHERE op <> 'D'
""",
        "cdc_dead_letter_queue": f"""
WITH ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after."commit" AS "commit",
         coalesce(after.language, after.lang) AS language,
         after.stars AS stars,
         sha256(after.content) AS content_sha
  FROM read_parquet('{_variant_glob(sf, "poison_log")}')
  WHERE op IN ('I', 'U', 'D')
    AND ((op = 'D' AND before IS NOT NULL)
         OR (op <> 'D' AND after IS NOT NULL))
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k_repo, k_path ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT k_repo AS repo, k_path AS path, "commit", language, stars, content_sha,
       lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
        "cdc_dlq_contents": f"""
SELECT lsn, op,
       CASE WHEN op = 'X' THEN 'unknown_op'
            ELSE 'null_primary_key' END AS reason
FROM read_parquet('{_variant_glob(sf, "poison_log")}')
WHERE op = 'X'
   OR (op IN ('I', 'U') AND after IS NULL)
   OR (op = 'D' AND before IS NULL)
""",
        "cdc_incremental_snapshot": f"""
WITH ev AS (
  SELECT CASE WHEN tx_id LIKE 'chunk:%'
              THEN CAST(string_split(tx_id, ':')[2] AS BIGINT)
              ELSE lsn END AS eff,
         op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after."commit" AS "commit",
         sha256(after.content) AS content_sha
  FROM read_parquet('{_variant_glob(sf, "dblog_log")}')
  WHERE op <> 'DDL'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k_repo, k_path ORDER BY eff DESC) AS rn
  FROM ev
)
SELECT k_repo AS repo, k_path AS path, "commit", content_sha,
       eff AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
        "cdc_view_repo_stats": lww.replace(
            "sha256(after.content) AS content_sha",
            "length(after.content) AS n_chars")
        + """
SELECT k_repo AS repo, CAST(count(*) AS BIGINT) AS n_paths,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM ranked WHERE rn = 1 AND op <> 'D' GROUP BY 1
""",
        "cdc_tx_consistent": f"""
WITH mx AS (
  SELECT 3 * max(lsn) // 5 AS l FROM read_parquet('{_variant_glob(sf, "tx_log")}')
),
-- a tx is complete at the bound iff none of its events lie past it;
-- the fence drops below the earliest pre-bound event of any tx that
-- continues past the bound (starts are MEASURED, never parsed out of
-- the token — matches tx_consistent_lsn's semi-join)
bound AS (
  SELECT least(
           (SELECT l FROM mx),
           coalesce(
             (SELECT min(lsn) - 1
              FROM read_parquet('{_variant_glob(sf, "tx_log")}')
              WHERE lsn <= (SELECT l FROM mx)
                AND tx_id IN (
                  SELECT DISTINCT tx_id
                  FROM read_parquet('{_variant_glob(sf, "tx_log")}')
                  WHERE lsn > (SELECT l FROM mx))),
             (SELECT l FROM mx))) AS b
),
ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after."commit" AS "commit",
         coalesce(after.language, after.lang) AS language,
         after.stars AS stars,
         sha256(after.content) AS content_sha
  FROM read_parquet('{_variant_glob(sf, "tx_log")}')
  WHERE op <> 'DDL' AND lsn <= (SELECT b FROM bound)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k_repo, k_path ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT k_repo AS repo, k_path AS path, "commit", language, stars, content_sha,
       lsn AS _sequence_num
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
        "cdc_truncate_fence": f"""
WITH fence AS (
  SELECT coalesce(max(lsn), 0) AS f
  FROM read_parquet('{_variant_glob(sf, "trunc_log")}')
  WHERE op = 'DDL' AND ddl.op = 'TRUNCATE_TABLE'
),
ev AS (
  SELECT lsn, op,
         coalesce(after.repo, before.repo)  AS k_repo,
         coalesce(after.path, before.path)  AS k_path,
         after."commit" AS "commit",
         after.lang AS lang,
         sha256(after.content) AS content_sha
  FROM read_parquet('{_variant_glob(sf, "trunc_log")}')
  WHERE op <> 'DDL'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k_repo, k_path ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT k_repo AS repo, k_path AS path, "commit", lang, content_sha,
       lsn AS _sequence_num
FROM ranked
WHERE rn = 1 AND op <> 'D' AND lsn > (SELECT f FROM fence)
""",
    }


def cdc_to_training_corpus(sf_dir: str):
    """THE TIER FUSION, fully SQL-oracled: replicate the source-code
    change log into the lake, then run the training-corpus prep
    directly over the lake's live rows — exact dedup by content hash
    (keeping the lexicographically-least (repo, path) owner), a quality
    gate (content length ≥ 64 chars), a deterministic md5 80% sample,
    and md5 shard routing — the "CDC lake in, training shards out" path
    this engine exists for. Every step is distributed and
    parallelism-invariant: the gate + sample + shard assignment are one
    vectorized map_batches pass (content never leaves the scan task —
    only key/sha/shard columns ride on), the dedup is per-batch
    pre-dedup + ONE groupby(content_sha) keep-min fold."""
    import pandas as pd

    from ..stages.sample import md5_u64

    log = ensure_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_corpus")
    run_replication(log, lake, num_partitions=16)
    ds = final_state(lake, columns=["repo", "path", "language",
                                    "content", "content_sha"])

    def prep(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(pc.utf8_length(t["content"]),
                                      pa.scalar(64)))
        key = pc.binary_join_element_wise(
            t["repo"], t["path"], "|").to_numpy(zero_copy_only=False)
        keep = (md5_u64(key) % np.uint64(10)) < np.uint64(8)
        t = t.filter(pa.array(keep))
        sha = t["content_sha"].to_numpy(zero_copy_only=False)
        shard = (md5_u64(sha) % np.uint64(16)).astype(np.int64)
        df = pd.DataFrame({
            "content_sha": sha,
            "repo": t["repo"].to_numpy(zero_copy_only=False),
            "path": t["path"].to_numpy(zero_copy_only=False),
            "language": t["language"].to_numpy(zero_copy_only=False),
            "shard": shard,
        }).sort_values(["content_sha", "repo", "path"],
                       kind="stable").drop_duplicates("content_sha")
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["repo", "path"], kind="stable")
                .head(1))

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("content_sha")
            .map_groups(keep_min, batch_format="pandas"))


def cdc_to_packed_corpus(sf_dir: str, seq_tokens: int = 256):
    """The full lake → TRAINING-READY corpus path fused end-to-end:
    replicate the change log, quality-gate the live rows (length ≥ 64),
    exact-dedup by content hash, TRAIN a BPE tokenizer on the surviving
    corpus (persisted as ``tokenizer.json`` beside the lake), count
    subword tokens under it, and pack documents into fixed
    ``seq_tokens`` training sequences with the distributed prefix scan.

    Scale shape: the dedup fold ships ONLY (sha, repo, path) keys; the
    LOSERS (duplicate-group members that lost — the exception, not the
    corpus) broadcast back via ``ray.put`` so content never rides a
    shuffle; BPE training folds the distinct-word histogram (bounded by
    vocabulary); packing's only exchange is the prefix scan's bucket
    partials. Deterministic at any parallelism (integer histogram +
    total-order merges + md5 layout order). Returns the per-sequence
    summary ``(seq_id, n_docs, n_tokens)``; rows-only (the tokenizer
    has no SQL shape) — pytest gates parity vs a single-process
    reference build (tests/test_packed_corpus.py)."""
    import pandas as pd
    import pyarrow.compute as _pc

    from ..stages.bpe import save_merges, train_bpe, word_histogram
    from ..stages.sample import md5_u64
    from ..stages.scan import ordered_cumsum

    log = ensure_log(sf_dir)
    lake = fresh_lake(sf_dir, "lake_packed")
    run_replication(log, lake, num_partitions=16)
    ds = final_state(lake, columns=["repo", "path", "content",
                                    "content_sha"])

    def keyrows(t: "pa.Table") -> "pa.Table":
        t = t.filter(_pc.greater_equal(_pc.utf8_length(t["content"]),
                                       pa.scalar(64)))
        df = pd.DataFrame({
            "content_sha": t["content_sha"].to_numpy(zero_copy_only=False),
            "repo": t["repo"].to_numpy(zero_copy_only=False),
            "path": t["path"].to_numpy(zero_copy_only=False),
        })
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def losers_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["repo", "path"], kind="stable")
        return g.iloc[1:][["repo", "path"]]  # everyone but the winner

    losers = (ds.map_batches(keyrows, batch_format="pyarrow")
              .groupby("content_sha")
              .map_groups(losers_of, batch_format="pandas")
              .to_pandas())
    loser_keys = set(zip(losers.get("repo", ()), losers.get("path", ())))
    import ray

    losers_ref = ray.put(loser_keys)

    def survivors(t: "pa.Table") -> "pa.Table":
        t = t.filter(_pc.greater_equal(_pc.utf8_length(t["content"]),
                                       pa.scalar(64)))
        lk = ray.get(losers_ref)
        if lk:
            rp = t["repo"].to_pylist()
            pp = t["path"].to_pylist()
            keep = pa.array([(a, b) not in lk for a, b in zip(rp, pp)])
            t = t.filter(keep)
        return t

    surv = ds.map_batches(survivors, batch_format="pyarrow")
    merges = train_bpe(word_histogram(surv, text_col="content"),
                       num_merges=40)
    save_merges(merges, os.path.join(lake, "tokenizer.json"))
    merges_ref = ray.put(merges)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.bpe import encode_stats

        st = encode_stats(df["content"].reset_index(drop=True),
                          ray.get(merges_ref))
        key = (df["repo"] + "|" + df["path"]).to_numpy(dtype=object)
        h = (md5_u64(key) + np.uint64(1 << 63)).view(np.int64)
        return pd.DataFrame({
            "doc": key, "h": h,
            "n_tokens": st["n_subword_tokens"].to_numpy()})

    scanned = ordered_cumsum(
        surv.map_batches(counts, batch_format="pandas"),
        order_col="h", tiebreak_col="doc", value_col="n_tokens")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        excl = (df["running_total"] - df["n_tokens"]).to_numpy()
        return pd.DataFrame({
            "seq_id": (excl // seq_tokens).astype("int64"),
            "n_docs": np.ones(len(df), dtype=np.int64),
            "n_tokens": df["n_tokens"].astype("int64"),
        })

    from ray.data.aggregate import Sum as _Sum

    out = (scanned.map_batches(project, batch_format="pandas")
           .groupby("seq_id")
           .aggregate(_Sum("n_docs", alias_name="n_docs"),
                      _Sum("n_tokens", alias_name="n_tokens"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("seq_id").reset_index(drop=True)


def cdc_apply_duckdb_validate(sf_dir: str):
    """FOREIGN-SINK end-to-end (the reference's e2e contract against a
    live external target — BQValidation.java:55-90): replicate HALF the
    log (history=True), FULL-LOAD the live state into a DuckDB database
    file, finish replication, apply the remainder INCREMENTALLY to the
    DuckDB target from the change data feed (set-based delete+insert
    per changed-key batch, one transaction, watermark stamped inside
    the target database), then run the two-sided row validation
    (counts + symmetric EXCEPT) and RETURN THE TARGET'S ROWS — oracled
    against the same LWW SQL as cdc_final_state, so the hash gate
    certifies the FOREIGN store's content, not the lake's."""
    import json as _json

    import duckdb

    from ..stages.sink_duckdb import (duckdb_apply_changes,
                                      duckdb_full_load, duckdb_validate)

    log = ensure_log(sf_dir)
    with open(os.path.join(log, "meta.json")) as fh:
        half = _json.load(fh)["max_lsn"] // 2
    lake = fresh_lake(sf_dir, "lake_ducksink")
    db = os.path.join(CACHE_ROOT, f"sf{sf_tag(sf_dir)}",
                      "ducksink.duckdb")
    if os.path.exists(db):
        os.remove(db)
    run_replication(log, lake, num_partitions=16, history=True,
                    upto_lsn=half)
    duckdb_full_load(lake, db)
    run_replication(log, lake, num_partitions=16, history=True)
    duckdb_apply_changes(lake, db)
    v = duckdb_validate(lake, db)
    if not v["parity"]:
        raise AssertionError(f"foreign-sink validation failed: {v}")
    con = duckdb.connect(db)
    try:
        df = con.execute(
            "SELECT " + ", ".join(f'"{c}"' for c in FINAL_COLS)
            + ' FROM "lake_target"').df()
    finally:
        con.close()
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


CDC_QUERIES = {
    "cdc_final_state": cdc_final_state,
    "cdc_apply_duckdb_validate": cdc_apply_duckdb_validate,
    "cdc_transformed_apply": cdc_transformed_apply,
    "cdc_packed_tokens_refresh": cdc_packed_tokens_refresh,
    "cdc_drift_report": cdc_drift_report,
    "cdc_to_packed_corpus": cdc_to_packed_corpus,
    "cdc_to_training_corpus": cdc_to_training_corpus,
    "cdc_resume_equivalence": cdc_resume_equivalence,
    "cdc_reshard_continuation": cdc_reshard_continuation,
    "cdc_full_lifecycle": cdc_full_lifecycle,
    "cdc_search_lake_content": cdc_search_lake_content,
    "cdc_search_lake_compacted": cdc_search_lake_compacted,
    "cdc_wire_relay_roundtrip": cdc_wire_relay_roundtrip,
    "cdc_vector_search_lake": cdc_vector_search_lake,
    "cdc_commit_lookup": cdc_commit_lookup,
    "cdc_export_incremental": cdc_export_incremental,
    "cdc_repo_skew_report": cdc_repo_skew_report,
    "cdc_time_travel": cdc_time_travel,
    "cdc_point_lookup": cdc_point_lookup,
    "cdc_changefeed": cdc_changefeed,
    "cdc_from_debezium_jsonl": cdc_from_debezium_jsonl,
    "cdc_from_debezium_mysql": cdc_from_debezium_mysql,
    "cdc_from_debezium_mysql_resume": cdc_from_debezium_mysql_resume,
    "cdc_from_debezium_sqlserver": cdc_from_debezium_sqlserver,
    "cdc_from_debezium_postgres": cdc_from_debezium_postgres,
    "cdc_from_debezium_postgres_resume": cdc_from_debezium_postgres_resume,
    "cdc_from_debezium_mongo": cdc_from_debezium_mongo,
    "cdc_from_debezium_mongo_resume": cdc_from_debezium_mongo_resume,
    "cdc_jsonl_tail_follow": cdc_jsonl_tail_follow,
    "cdc_from_debezium_oracle": cdc_from_debezium_oracle,
    "cdc_bootstrap_from_parquet": cdc_bootstrap_from_parquet,
    "cdc_toast_carry_forward": cdc_toast_carry_forward,
    "cdc_op_counts": cdc_op_counts,
    "cdc_events_per_repo": cdc_events_per_repo,
    "cdc_snapshot_ddl_sequence": cdc_snapshot_ddl_sequence,
    "cdc_tombstones": cdc_tombstones,
    "cdc_all_datatypes": cdc_all_datatypes,
    "cdc_projection": cdc_projection,
    "cdc_dml_blacklist": cdc_dml_blacklist,
    "cdc_ddl_blacklist": cdc_ddl_blacklist,
    "cdc_first_seen_synthesis": cdc_first_seen_synthesis,
    "cdc_tx_consistent": cdc_tx_consistent,
    "cdc_view_repo_stats": cdc_view_repo_stats,
    "cdc_view_repo_join": cdc_view_repo_join,
    "cdc_incremental_snapshot": cdc_incremental_snapshot,
    "cdc_changelog_prev_commit": cdc_changelog_prev_commit,
    "cdc_scd2_history": cdc_scd2_history,
    "cdc_final_state_optimized": cdc_final_state_optimized,
    "cdc_language_slice": cdc_language_slice,
    "cdc_dead_letter_queue": cdc_dead_letter_queue,
    "cdc_dlq_contents": cdc_dlq_contents,
    "cdc_table_filter": cdc_table_filter,
    "cdc_multi_table_final": cdc_multi_table_final,
    "cdc_truncate_fence": cdc_truncate_fence,
}
