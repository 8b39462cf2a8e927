"""Persisted inverted index (token -> postings) over a document corpus.

The keyword-search counterpart of the vector indexes in
``stages/similarity.py``: where those answer "nearest by cosine", this
answers "which documents contain these terms" in O(query terms), never
O(corpus).

Build is ONE streaming corpus scan: each batch tokenizes its documents
(lower + ``[a-z0-9_]+`` — the same RE2 convention every oracled text
query in this repo shares, so DuckDB reproduces postings exactly),
reduces to (doc_id, tok, tf) rows — a document lives wholly in one
batch, so per-batch term frequencies are exact, not partial — stamps
``bucket = hash64(tok) % n_buckets``, and writes Parquet partitioned by
bucket (shuffle-free partitioned write, the LSH/IVF build pattern).
Atomic tmp+rename publish with ``source_tag`` invalidation.

Lookup hashes the query terms to their buckets and reads ONLY those
bucket directories with a ``tok IN terms`` pushdown — the posting lists
of a handful of terms, however large the corpus. AND/OR semantics
aggregate per doc_id distributively: (doc, tok) rows are unique by
construction, so ``n_terms`` is a plain Sum and AND is
``n_terms == len(terms)``.

At 10^9 docs the bucket count bounds file fan-out (n_buckets dirs of
size-based files) and a single term's postings stream through
map_batches tasks; only the requested top-k reaches the driver.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

_HASH_KEY = "invindex_hashkey"  # 16 bytes, pandas hash_array requirement
_FORMAT = 2  # 2: postings carry dl; meta carries total_tokens (BM25)


def _tok_bucket(toks: np.ndarray, n_buckets: int) -> np.ndarray:
    h = pd.util.hash_array(np.asarray(toks, dtype=object), hash_key=_HASH_KEY)
    return (h % np.uint64(n_buckets)).astype(np.int64)


class InvertedIndex:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as fh:
            self.meta = json.load(fh)

    # -- build ------------------------------------------------------------

    @classmethod
    def build(
        cls,
        ds: "ray.data.Dataset",
        index_dir: str,
        *,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
        source_tag: str = "",
    ) -> "InvertedIndex":
        def scatter(df: pd.DataFrame) -> pd.DataFrame:
            from ..functions.text import _flat_lower_tokens

            flat, doc_idx, lens = _flat_lower_tokens(
                df[text_col].reset_index(drop=True))
            ids = df[id_col].to_numpy()
            if len(flat) == 0:
                return pd.DataFrame({
                    id_col: pd.Series([], dtype=ids.dtype),
                    "tok": pd.Series([], dtype=object),
                    "tf": pd.Series([], dtype=np.int64),
                    "dl": pd.Series([], dtype=np.int64),
                    "bucket": pd.Series([], dtype=np.int64)})
            g = (pd.DataFrame({id_col: ids[doc_idx], "tok": flat,
                               # denormalized doc length: BM25 lookup
                               # needs dl without a corpus-side join
                               "dl": np.asarray(lens)[doc_idx].astype(np.int64)})
                   .groupby([id_col, "tok", "dl"], sort=False)
                   .size().reset_index(name="tf"))
            g["tf"] = g["tf"].astype(np.int64)
            g["bucket"] = _tok_bucket(g["tok"].to_numpy(), n_buckets)
            return g

        tmp_dir = index_dir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        n_docs = ds.count()
        ds.map_batches(scatter, batch_format="pandas").write_parquet(
            os.path.join(tmp_dir, "data"), partition_cols=["bucket"])
        # corpus token total (for BM25 avgdl) from the postings' own tf
        # column — a two-int-column Parquet scan, NOT a re-tokenization.
        # An all-empty corpus writes no postings files at all.
        has_posts = bool(_glob.glob(
            os.path.join(tmp_dir, "data", "**", "*.parquet"),
            recursive=True))
        os.makedirs(os.path.join(tmp_dir, "data"), exist_ok=True)
        total_tokens = int(ray.data.read_parquet(
            os.path.join(tmp_dir, "data"), columns=["tf"]).sum("tf")
            or 0) if has_posts else 0
        with open(os.path.join(tmp_dir, "meta.json"), "w") as fh:
            json.dump({"format": _FORMAT, "n_buckets": n_buckets,
                       "n_docs": int(n_docs),
                       "total_tokens": total_tokens,
                       "id_col": id_col, "source_tag": source_tag}, fh)
        shutil.rmtree(index_dir, ignore_errors=True)
        os.rename(tmp_dir, index_dir)
        return cls(index_dir)

    @classmethod
    def ensure(cls, ds_fn, index_dir: str, source_tag: str,
               **kw) -> "InvertedIndex":
        """Open if present AND built from the same source; else rebuild.
        ``ds_fn`` is a zero-arg callable returning the corpus Dataset so a
        cache hit never touches the corpus."""
        meta_p = os.path.join(index_dir, "meta.json")
        if os.path.exists(meta_p):
            with open(meta_p) as fh:
                meta = json.load(fh)
            if (meta.get("source_tag") == source_tag
                    and meta.get("format") == _FORMAT):
                return cls(index_dir)
        return cls.build(ds_fn(), index_dir, source_tag=source_tag, **kw)

    # -- lookup -----------------------------------------------------------

    def postings_files(self, terms: list[str]) -> list[str]:
        buckets = sorted(set(
            _tok_bucket(np.array([t.lower() for t in terms], dtype=object),
                        self.meta["n_buckets"]).tolist()))
        return [f for b in buckets for f in _glob.glob(
            os.path.join(self.index_dir, "data", f"bucket={b}", "*.parquet"))]

    def lookup(self, terms: list[str], *, mode: str = "and",
               k: int | None = None) -> "ray.data.Dataset":
        """Documents containing the terms: ``(doc_id, score, n_terms)``
        with ``score = sum tf``; ``mode='and'`` keeps docs matching every
        term. Reads only the terms' bucket files; one small groupby over
        the matched postings, never the corpus."""
        if mode not in ("and", "or"):
            raise ValueError("mode must be 'and' or 'or'")
        terms = sorted({t.lower() for t in terms})
        if not terms:
            raise ValueError("no terms")
        id_col = self.meta["id_col"]
        files = self.postings_files(terms)
        if not files:
            return ray.data.from_items([]).map_batches(lambda b: b)
        import pyarrow.dataset as pads

        sub = ray.data.read_parquet(
            files, columns=[id_col, "tok", "tf"],
            filter=pads.field("tok").isin(terms))
        # (doc, tok) rows are unique by construction, so summing a ones
        # column counts DISTINCT matched terms per doc
        agg = (sub.map_batches(lambda df: df.assign(_hit=np.int64(1)),
                               batch_format="pandas")
                  .groupby(id_col)
                  .aggregate(Sum("tf", alias_name="score"),
                             Sum("_hit", alias_name="n_terms")))
        if mode == "and":
            need = len(terms)
            agg = agg.filter(lambda r: r["n_terms"] == need)
        if k is not None:
            agg = agg.sort(["score", id_col], descending=[True, False]).limit(k)
        return agg

    def lookup_bm25(self, terms: list[str], *, mode: str = "and",
                    k1: float = 1.2, b: float = 0.75,
                    k: int | None = None) -> "ray.data.Dataset":
        """BM25-ranked term search (Robertson et al.; the Lucene
        ``k1/b`` variant with the non-negative idf
        ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

        Same pruned-bucket read as ``lookup``; ranking needs two extra
        scalars per posting — ``dl`` is denormalized into the postings
        at build time and ``df`` per term comes from ONE tiny aggregate
        over the matched postings (bounded by the query's terms), so
        the whole query stays O(query terms' postings).

        Scores are integer micros — ``floor(x * 1e6 + 0.5)`` per
        (doc, term), summed as int64 — so a SQL oracle computing the
        identical double expression is hash-exact."""
        if mode not in ("and", "or"):
            raise ValueError("mode must be 'and' or 'or'")
        terms = sorted({t.lower() for t in terms})
        if not terms:
            raise ValueError("no terms")
        id_col = self.meta["id_col"]
        n_docs = self.meta["n_docs"]
        avgdl = self.meta["total_tokens"] / n_docs
        files = self.postings_files(terms)
        if not files:
            return ray.data.from_items([]).map_batches(lambda t: t)
        import pyarrow.dataset as pads

        sub = ray.data.read_parquet(
            files, columns=[id_col, "tok", "tf", "dl"],
            filter=pads.field("tok").isin(terms))
        # pass 1: document frequency per query term (tiny: <= len(terms)
        # rows reach the driver; postings rows are unique per (doc, tok))
        dfs = {r["tok"]: r["count()"]
               for r in sub.groupby("tok").count().take_all()}
        # log(1.0 + x), NOT log1p: the SQL oracle writes ln(1 + x) and
        # the two differ in the last ulp for small x — keep the float
        # evaluation order identical on both sides
        idf = {t: float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
               for t, df in dfs.items()}
        idf_ref = ray.put(idf)

        def score(df: pd.DataFrame) -> pd.DataFrame:
            w = df["tok"].map(ray.get(idf_ref)).to_numpy(np.float64)
            tf = df["tf"].to_numpy(np.float64)
            dl = df["dl"].to_numpy(np.float64)
            s = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            return pd.DataFrame({
                id_col: df[id_col],
                "score_micros": np.floor(s * 1e6 + 0.5).astype(np.int64),
                "_hit": np.int64(1)})

        agg = (sub.map_batches(score, batch_format="pandas")
                  .groupby(id_col)
                  .aggregate(Sum("score_micros", alias_name="score_micros"),
                             Sum("_hit", alias_name="n_terms")))
        if mode == "and":
            need = len(terms)
            agg = agg.filter(lambda r: r["n_terms"] == need)
        if k is not None:
            agg = agg.sort(["score_micros", id_col],
                           descending=[True, False]).limit(k)
        return agg


_SEP = "\x1f"
_DOC_FORMAT = 1


class LakeTextIndex:
    """CDC-MAINTAINED full-text index over the replicated lake: built
    once at a lake watermark, then kept current by REFRESHING from the
    change data feed instead of re-tokenizing the corpus — the search
    engine a CDC pipeline exists to feed.

    Layout (all under ``index_dir``):

    * ``data/bucket=N/`` — postings (doc_key, tok, tf, dl, seq) where
      ``doc_key = table\\x1frepo\\x1fpath`` and ``seq`` is the row's
      winning ``_sequence_num`` when indexed (the posting GENERATION);
    * ``docs/shard=M/`` — per-doc sidecar (doc_key, dl, seq, alive):
      APPEND-ONLY, LWW-reduced by ``seq`` at read (the lake's own delta
      pattern) — gives refresh the superseded generation's exact doc
      length without touching token-partitioned postings;
    * ``overlay.json`` — live ``seq`` per doc CHANGED since build (the
      Lucene live-docs analog): lookups keep a matched posting iff its
      ``seq`` equals the doc's live generation (absent -> build
      generation, -1 -> deleted). Bounded by churn since the last
      compaction; a compaction (rebuild) resets it.

    ``refresh`` cost is O(changed keys), never O(corpus), and the change
    set never rides the driver: one ``lake_diff`` (partition-local,
    history lakes) materialized as object-store blocks carries the new
    content straight into the distributed tokenize/scatter pass; the
    driver receives only (key, change, seq) and per-doc (doc_key, dl)
    rows — the same O(churn) bound as the overlay they feed — plus
    exact integer maintenance of (n_docs, total_tokens) so BM25 after a
    refresh is bit-identical to BM25 after a full rebuild — proven by
    the parity tests.
    """

    KEY_COLS = ("table", "repo", "path")

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as fh:
            self.meta = json.load(fh)
        op = os.path.join(index_dir, "overlay.json")
        with open(op) as fh:
            self.overlay = json.load(fh)

    # -- shared kernels ----------------------------------------------------

    @staticmethod
    def _scatter_fn(n_buckets: int):
        def scatter(df: pd.DataFrame) -> pd.DataFrame:
            from ..functions.text import _flat_lower_tokens

            key = (df["table"].astype(str) + _SEP + df["repo"].astype(str)
                   + _SEP + df["path"].astype(str)).to_numpy(dtype=object)
            seq = df["_sequence_num"].to_numpy(np.int64)
            flat, doc_idx, lens = _flat_lower_tokens(
                df["content"].reset_index(drop=True))
            if len(flat) == 0:
                return pd.DataFrame({
                    "doc_key": pd.Series([], dtype=object),
                    "tok": pd.Series([], dtype=object),
                    "tf": pd.Series([], dtype=np.int64),
                    "dl": pd.Series([], dtype=np.int64),
                    "seq": pd.Series([], dtype=np.int64),
                    "bucket": pd.Series([], dtype=np.int64)})
            lens = np.asarray(lens)
            g = (pd.DataFrame({
                    "doc_key": key[doc_idx], "tok": flat,
                    "dl": lens[doc_idx].astype(np.int64),
                    "seq": seq[doc_idx]})
                   .groupby(["doc_key", "tok", "dl", "seq"], sort=False)
                   .size().reset_index(name="tf"))
            g["tf"] = g["tf"].astype(np.int64)
            g["bucket"] = _tok_bucket(g["tok"].to_numpy(), n_buckets)
            return g[["doc_key", "tok", "tf", "dl", "seq", "bucket"]]

        return scatter

    @staticmethod
    def _doc_rows(posts: "ray.data.Dataset", n_shards: int):
        """Distinct (doc_key, dl, seq, alive) rows derived from postings
        (column-pruned, per-batch dedup only — the per-SHARD dedup at
        read time is exact because a doc hashes to one shard)."""
        def dd(df: pd.DataFrame) -> pd.DataFrame:
            d = df[["doc_key", "dl", "seq"]].drop_duplicates()
            d = d.assign(alive=True)
            d["shard"] = _tok_bucket(d["doc_key"].to_numpy(), n_shards)
            return d

        return posts.map_batches(dd, batch_format="pandas")

    def _sidecar_live(self, doc_keys: list[str],
                      max_seq: int | None = None) -> pd.DataFrame:
        """Latest sidecar row per requested doc (LWW by seq), pruned to
        the docs' shards with a doc_key IN pushdown. ``max_seq`` bounds
        the LWW pick to rows at/below a committed watermark: a crashed
        refresh attempt's already-fenced rows (seq past the watermark
        meta still records) must NOT count as the superseded state when
        the attempt re-runs, or the n_docs/total_tokens deltas would be
        computed against the half-applied NEW state and drift."""
        import pyarrow.dataset as pads

        n_shards = self.meta["n_shards"]
        shards = sorted(set(_tok_bucket(
            np.array(doc_keys, dtype=object), n_shards).tolist()))
        files = [f for s in shards for f in _glob.glob(os.path.join(
            self.index_dir, "docs", f"shard={s}", "*.parquet"))]
        if not files:
            return pd.DataFrame(
                {"doc_key": [], "dl": [], "seq": [], "alive": []})
        flt = pads.field("doc_key").isin(doc_keys)
        if max_seq is not None:
            flt = flt & (pads.field("seq") <= max_seq)
        t = (pads.dataset(files, format="parquet")
             .to_table(columns=["doc_key", "dl", "seq", "alive"],
                       filter=flt))
        df = t.to_pandas()
        df = (df.sort_values("seq", kind="stable")
                .drop_duplicates("doc_key", keep="last"))
        return df

    # -- build ---------------------------------------------------------

    @classmethod
    def build(cls, lake_dir: str, index_dir: str, *, n_buckets: int = 64,
              n_shards: int = 32) -> "LakeTextIndex":
        from ..pipelines.replicate import final_state
        from ..state import checkpoint as ckpt

        g = ckpt.read_global_watermark(lake_dir)
        ds = final_state(lake_dir, columns=[*cls.KEY_COLS, "content",
                                            "_sequence_num"])
        tmp = index_dir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        ds.map_batches(cls._scatter_fn(n_buckets),
                       batch_format="pandas").write_parquet(
            os.path.join(tmp, "data"), partition_cols=["bucket"])
        posts = ray.data.read_parquet(
            os.path.join(tmp, "data"), columns=["doc_key", "dl", "seq"])
        cls._doc_rows(posts, n_shards).write_parquet(
            os.path.join(tmp, "docs"), partition_cols=["shard"])
        n_docs, total = cls._exact_totals(os.path.join(tmp, "docs"))
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump({"doc_format": _DOC_FORMAT, "n_buckets": n_buckets,
                       "n_shards": n_shards, "n_docs": n_docs,
                       "total_tokens": total, "watermark": int(g),
                       "lake": os.path.abspath(lake_dir)}, fh)
        with open(os.path.join(tmp, "overlay.json"), "w") as fh:
            json.dump({}, fh)
        shutil.rmtree(index_dir, ignore_errors=True)
        os.rename(tmp, index_dir)
        return cls(index_dir)

    @staticmethod
    def _exact_totals(docs_dir: str) -> tuple[int, int]:
        """(n_docs, total_tokens) with per-shard exact dedup — one task
        per shard, each doc wholly inside one shard."""
        def per_shard(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            t = pa.concat_tables(
                [pq.read_table(f, columns=["doc_key", "dl", "seq", "alive"])
                 for f in batch["file"].to_pylist()])
            df = (t.to_pandas().sort_values("seq", kind="stable")
                   .drop_duplicates("doc_key", keep="last"))
            df = df[df["alive"]]
            return pa.table({"n": pa.array([len(df)], pa.int64()),
                             "tok": pa.array([int(df["dl"].sum())],
                                             pa.int64())})

        shards = {}
        for f in _glob.glob(os.path.join(docs_dir, "shard=*", "*.parquet")):
            shards.setdefault(os.path.dirname(f), []).append(f)
        res = (ray.data.from_items([{"file": fs} for fs in shards.values()])
               .map_batches(per_shard, batch_format="pyarrow", batch_size=1)
               .take_all())
        return (int(sum(r["n"] for r in res)),
                int(sum(r["tok"] for r in res)))

    # -- refresh ---------------------------------------------------------

    def refresh(self, lake_dir: str) -> dict:
        """Advance the index from its build/last-refresh watermark to the
        lake's current one using the change data feed (requires a
        ``history=True`` lake whose horizon still covers the index
        watermark; a vacuumed horizon means compact —
        ``LakeTextIndex.build`` again). O(changed keys) end to end."""
        from ..pipelines.replicate import lake_diff
        from ..state import checkpoint as ckpt

        g0 = int(self.meta["watermark"])
        g1 = int(ckpt.read_global_watermark(lake_dir))
        if g1 <= g0:
            return {"changed": 0, "watermark": g0}
        # the change set stays DISTRIBUTED (materialized blocks in the
        # object store, spillable); the driver receives only
        # (key, change, seq) rows — the same O(churn) bound as the
        # overlay those rows feed, never the content column
        diff_ds = (lake_diff(lake_dir, g0, to_lsn=g1)
                   .select_columns([*self.KEY_COLS, "change", "content",
                                    "_sequence_num"])
                   .materialize())
        meta_rows = diff_ds.drop_columns(["content"]).take_all()
        if not meta_rows:
            self._commit_meta(watermark=g1)
            return {"changed": 0, "watermark": g1}
        doc_keys = [_SEP.join(str(r[c]) for c in self.KEY_COLS)
                    for r in meta_rows]

        # superseded generations' exact doc lengths from the sidecar,
        # bounded to the COMMITTED watermark g0 so a crashed attempt's
        # already-written g1 rows can't masquerade as the old state
        old = self._sidecar_live(doc_keys, max_seq=g0)
        old = old[old["alive"]]
        old_alive, old_tokens = len(old), int(old["dl"].sum())

        # live generation per created/updated doc comes straight from the
        # diff's new-side seq — the postings pass below never has to
        # round-trip it through the driver
        live_seq: dict[str, int] = {
            dk: int(r["_sequence_num"])
            for dk, r in zip(doc_keys, meta_rows) if r["change"] != "d"}
        n_buckets = self.meta["n_buckets"]
        n_shards = self.meta["n_shards"]
        new_alive = len(live_seq)
        new_tokens = 0
        # all refresh files carry the TARGET watermark in a deterministic
        # name and are written tmp+rename: a crashed refresh re-run (meta
        # still at g0) overwrites the same files byte-identically instead
        # of appending duplicates — the lake's own fence pattern
        index_dir = self.index_dir

        def fenced_writer(root: str, part_col: str, stem: str):
            def write(group: pa.Table) -> pa.Table:
                import pyarrow.parquet as pq

                pid = int(group[part_col][0].as_py())
                d = os.path.join(index_dir, root, f"{part_col}={pid}")
                os.makedirs(d, exist_ok=True)
                final = os.path.join(d, f"{stem}.parquet")
                tmp = final + f".tmp.{os.getpid()}"
                pq.write_table(group.drop_columns([part_col]), tmp)
                os.replace(tmp, final)
                return pa.table({part_col: pa.array([pid], pa.int64())})

            return write

        per_doc: dict[str, int] = {}
        if live_seq:
            posts = (diff_ds.filter(expr="change != 'd'")
                     .drop_columns(["change"])
                     .map_batches(self._scatter_fn(n_buckets),
                                  batch_format="pandas")
                     .materialize())
            (posts.groupby("bucket")
                  .map_groups(fenced_writer("data", "bucket",
                                            f"refresh-{g1:020d}"),
                              batch_format="pyarrow")
                  .take_all())
            (self._doc_rows(posts.drop_columns(["tok", "tf"]), n_shards)
                 .groupby("shard")
                 .map_groups(fenced_writer("docs", "shard",
                                           f"refresh-{g1:020d}"),
                             batch_format="pyarrow")
                 .take_all())
            seen = (posts.map_batches(
                        lambda df: df[["doc_key", "dl"]]
                        .drop_duplicates("doc_key"),
                        batch_format="pandas")
                    .take_all())  # ~one (doc_key, dl) row per changed doc
            per_doc = {r["doc_key"]: int(r["dl"]) for r in seen}
            new_tokens = sum(per_doc.values())

        # deleted docs: tombstone sidecar rows at a seq past every
        # retained generation (the new watermark is monotone); tiny,
        # written driver-side under the same fenced names. Alive docs
        # whose new content tokenizes to NOTHING also get a (dl=0,
        # alive) row here — they produce no postings to derive one from
        dead = [dk for dk in doc_keys if dk not in live_seq]
        empty_alive = [dk for dk in live_seq if dk not in per_doc]
        if dead or empty_alive:
            import pyarrow.parquet as pq

            side_keys = dead + empty_alive
            rows = pd.DataFrame({
                "doc_key": side_keys,
                "dl": np.int64(0),
                "seq": ([np.int64(g1)] * len(dead)
                        + [np.int64(live_seq[dk]) for dk in empty_alive]),
                "alive": [False] * len(dead) + [True] * len(empty_alive),
                "shard": _tok_bucket(np.array(side_keys, dtype=object),
                                     n_shards)})
            for s, grp in rows.groupby("shard"):
                d = os.path.join(index_dir, "docs", f"shard={int(s)}")
                os.makedirs(d, exist_ok=True)
                final = os.path.join(d, f"refresh-{g1:020d}-dead.parquet")
                tmp = final + f".tmp.{os.getpid()}"
                pq.write_table(
                    pa.Table.from_pandas(grp.drop(columns=["shard"]),
                                         preserve_index=False), tmp)
                os.replace(tmp, final)

        overlay = dict(self.overlay)
        for dk in dead:
            overlay[dk] = -1
        overlay.update(live_seq)
        self._commit_meta(
            watermark=g1,
            n_docs=self.meta["n_docs"] + new_alive - old_alive,
            total_tokens=(self.meta["total_tokens"]
                          + new_tokens - old_tokens),
            overlay=overlay)
        return {"changed": len(doc_keys), "created_or_updated": new_alive,
                "deleted": len(dead), "watermark": g1}

    # -- compact ---------------------------------------------------------

    def compact(self) -> dict:
        """Fold every refresh generation and the live-docs overlay into
        a fresh base WITHOUT touching the lake — the Lucene segment-merge
        analog for this index, and the OPTIMIZE the refresh docstring
        points at when the change-feed horizon is gone.

        One pass over the INDEX's own files (never the corpus, no
        re-tokenization): postings of superseded generations and deleted
        docs are physically dropped, the per-doc sidecar reduces to one
        live row per doc, and the overlay resets to ``{}`` — lookups and
        BM25 scores are unchanged (parity-tested vs a rebuild), but
        lookup batches stop paying the overlay fence and later refreshes
        stop re-reading superseded sidecar rows. Cost is O(index bytes).

        Everything with ``seq`` past the COMMITTED watermark is fenced
        out and swept by the staged swap, so rows a crashed refresh
        attempt already wrote disappear — compact doubles as the
        recovery path. (n_docs, total_tokens) are recomputed exactly
        from the compacted sidecar; ``counters_drifted`` in the return
        value flags any disagreement with the maintained meta (there
        should never be one — the refresh deltas are exact).

        Staged into ``index_dir + '.compact.<pid>'`` and swapped with
        the shared ``_idx_swap_in`` (single writer assumed; stranger
        sidecar files in the index dir are carried across the swap).
        """
        import pyarrow.parquet as pq

        from .similarity import _idx_swap_in

        g = int(self.meta["watermark"])
        n_buckets = int(self.meta["n_buckets"])
        n_shards = int(self.meta["n_shards"])
        ov_ref = ray.put(self.overlay)
        tmp = self.index_dir + f".compact.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        os.makedirs(os.path.join(tmp, "docs"), exist_ok=True)

        def live_postings(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["seq"].to_numpy(np.int64) <= g]
            ov = ray.get(ov_ref)
            if ov and len(df):
                live = df["doc_key"].map(ov)
                df = df[(live.isna() | (df["seq"] == live)).to_numpy(bool)]
            out = df[["doc_key", "tok", "tf", "dl", "seq"]].reset_index(
                drop=True)
            out["bucket"] = _tok_bucket(
                out["tok"].to_numpy(dtype=object), n_buckets)
            return out

        post_files = _glob.glob(os.path.join(
            self.index_dir, "data", "bucket=*", "*.parquet"))
        if post_files:
            (ray.data.read_parquet(
                post_files,
                columns=["doc_key", "tok", "tf", "dl", "seq"])
                .map_batches(live_postings, batch_format="pandas")
                .write_parquet(os.path.join(tmp, "data"),
                               partition_cols=["bucket"]))

        # sidecar: per-shard exact LWW at the committed watermark — a doc
        # lives wholly in one shard, so one task per shard, no shuffle
        tmp_docs = os.path.join(tmp, "docs")

        def per_shard(batch: pa.Table) -> pa.Table:
            fs = batch["file"].to_pylist()[0]
            shard = int(batch["shard"][0].as_py())
            t = pa.concat_tables(
                [pq.read_table(f, columns=["doc_key", "dl", "seq", "alive"])
                 for f in fs])
            df = t.to_pandas()
            df = df[df["seq"].to_numpy(np.int64) <= g]
            df = (df.sort_values("seq", kind="stable")
                    .drop_duplicates("doc_key", keep="last"))
            df = df[df["alive"]].reset_index(drop=True)
            if len(df):
                d = os.path.join(tmp_docs, f"shard={shard}")
                os.makedirs(d, exist_ok=True)
                final = os.path.join(d, "base.parquet")
                ftmp = final + f".tmp.{os.getpid()}"
                pq.write_table(
                    pa.Table.from_pandas(df, preserve_index=False), ftmp)
                os.replace(ftmp, final)
            return pa.table({
                "n": pa.array([len(df)], pa.int64()),
                "tok": pa.array([int(df["dl"].sum())], pa.int64())})

        shard_files: dict[str, list[str]] = {}
        for f in _glob.glob(os.path.join(
                self.index_dir, "docs", "shard=*", "*.parquet")):
            shard_files.setdefault(os.path.dirname(f), []).append(f)
        n_docs = total_tokens = 0
        if shard_files:
            res = (ray.data.from_items(
                       [{"file": fs,
                         "shard": int(d.rsplit("=", 1)[1])}
                        for d, fs in shard_files.items()])
                   .map_batches(per_shard, batch_format="pyarrow",
                                batch_size=1)
                   .take_all())
            n_docs = int(sum(r["n"] for r in res))
            total_tokens = int(sum(r["tok"] for r in res))

        drifted = (n_docs != int(self.meta["n_docs"])
                   or total_tokens != int(self.meta["total_tokens"]))
        meta = dict(self.meta, n_docs=n_docs, total_tokens=total_tokens)
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump(meta, fh)
        with open(os.path.join(tmp, "overlay.json"), "w") as fh:
            json.dump({}, fh)
        cleared = len(self.overlay)
        _idx_swap_in(self.index_dir, tmp)
        self.meta = meta
        self.overlay = {}
        return {"n_docs": n_docs, "total_tokens": total_tokens,
                "watermark": g, "overlay_cleared": cleared,
                "counters_drifted": drifted}

    def _commit_meta(self, overlay: dict | None = None, **updates) -> None:
        meta = dict(self.meta, **{k: int(v) for k, v in updates.items()})
        mp = os.path.join(self.index_dir, "meta.json")
        tmp = mp + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        if overlay is not None:
            op = os.path.join(self.index_dir, "overlay.json")
            otmp = op + f".tmp.{os.getpid()}"
            with open(otmp, "w") as fh:
                json.dump(overlay, fh)
            os.replace(otmp, op)
            self.overlay = overlay
        os.replace(tmp, mp)
        self.meta = meta

    # -- lookup ----------------------------------------------------------

    def _matched(self, terms: list[str]) -> "ray.data.Dataset":
        import pyarrow.dataset as pads

        buckets = sorted(set(_tok_bucket(
            np.array(terms, dtype=object), self.meta["n_buckets"]).tolist()))
        files = [f for b in buckets for f in _glob.glob(os.path.join(
            self.index_dir, "data", f"bucket={b}", "*.parquet"))]
        if not files:
            return None
        sub = ray.data.read_parquet(
            files, columns=["doc_key", "tok", "tf", "dl", "seq"],
            filter=pads.field("tok").isin(terms))
        overlay = self.overlay
        if not overlay:
            return sub

        def gen_filter(df: pd.DataFrame) -> pd.DataFrame:
            live = df["doc_key"].map(overlay)
            keep = live.isna() | (df["seq"] == live)
            return df[keep.to_numpy(bool)]

        return sub.map_batches(gen_filter, batch_format="pandas")

    def lookup(self, terms: list[str], *, mode: str = "and",
               k: int | None = None) -> "ray.data.Dataset":
        """(doc_key, score, n_terms) over the CURRENT index state —
        postings of superseded generations and deleted docs are fenced
        by the overlay. Same AND/OR contract as InvertedIndex.lookup."""
        if mode not in ("and", "or"):
            raise ValueError("mode must be 'and' or 'or'")
        terms = sorted({t.lower() for t in terms})
        if not terms:
            raise ValueError("no terms")
        sub = self._matched(terms)
        if sub is None:
            return ray.data.from_items([])
        agg = (sub.map_batches(lambda df: df.assign(_hit=np.int64(1)),
                               batch_format="pandas")
                  .groupby("doc_key")
                  .aggregate(Sum("tf", alias_name="score"),
                             Sum("_hit", alias_name="n_terms")))
        if mode == "and":
            need = len(terms)
            agg = agg.filter(lambda r: r["n_terms"] == need)
        if k is not None:
            agg = agg.sort(["score", "doc_key"],
                           descending=[True, False]).limit(k)
        return agg

    def lookup_bm25(self, terms: list[str], *, mode: str = "and",
                    k1: float = 1.2, b: float = 0.75,
                    k: int | None = None) -> "ray.data.Dataset":
        """BM25 over the maintained index: n_docs/total_tokens are kept
        exact through refreshes, so scores equal a full rebuild's."""
        if mode not in ("and", "or"):
            raise ValueError("mode must be 'and' or 'or'")
        terms = sorted({t.lower() for t in terms})
        if not terms:
            raise ValueError("no terms")
        n_docs = self.meta["n_docs"]
        avgdl = self.meta["total_tokens"] / n_docs
        sub = self._matched(terms)
        if sub is None:
            return ray.data.from_items([])
        dfs = {r["tok"]: r["count()"]
               for r in sub.groupby("tok").count().take_all()}
        idf = {t: float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
               for t, df in dfs.items()}
        idf_ref = ray.put(idf)

        def score(df: pd.DataFrame) -> pd.DataFrame:
            w = df["tok"].map(ray.get(idf_ref)).to_numpy(np.float64)
            tf = df["tf"].to_numpy(np.float64)
            dl = df["dl"].to_numpy(np.float64)
            s = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            return pd.DataFrame({
                "doc_key": df["doc_key"],
                "score_micros": np.floor(s * 1e6 + 0.5).astype(np.int64),
                "_hit": np.int64(1)})

        agg = (sub.map_batches(score, batch_format="pandas")
                  .groupby("doc_key")
                  .aggregate(Sum("score_micros", alias_name="score_micros"),
                             Sum("_hit", alias_name="n_terms")))
        if mode == "and":
            need = len(terms)
            agg = agg.filter(lambda r: r["n_terms"] == need)
        if k is not None:
            agg = agg.sort(["score_micros", "doc_key"],
                           descending=[True, False]).limit(k)
        return agg


def refresh_lake_index(index_dir: str, lake_dir: str, *,
                       compact_overlay_limit: int | None = 100_000) -> dict:
    """Follow-mode maintenance step: refresh the lake text index from
    the change feed, then COMPACT when the live-docs overlay has grown
    past ``compact_overlay_limit`` changed docs — the Lucene
    auto-segment-merge analog. The overlay is a per-lookup fence cost
    and a per-refresh superseded-sidecar re-read cost; compaction
    resets both and is itself O(index bytes), never O(corpus). ``None``
    disables the trigger (manual ``compact()`` only)."""
    idx = LakeTextIndex(index_dir)
    out = idx.refresh(lake_dir)
    if (compact_overlay_limit is not None
            and len(idx.overlay) >= compact_overlay_limit):
        c = idx.compact()
        out = dict(out, compacted=True,
                   compacted_docs=c.get("n_docs"),
                   overlay_before=c.get("overlay_cleared"))
    return out
