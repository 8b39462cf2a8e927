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
        # column — a two-int-column Parquet scan, NOT a re-tokenization
        total_tokens = int(ray.data.read_parquet(
            os.path.join(tmp_dir, "data"), columns=["tf"]).sum("tf") or 0)
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
