"""Passage-level exact deduplication with document reassembly (the
C4 / CCNet "remove duplicated lines across the corpus" pass, public
method: Raffel et al. 2020 §2.2 three-sentence dedup; here the passage
unit is a fixed ``chunk``-token window because the synthetic corpus has
no line breaks).

Semantics: the FIRST occurrence of each distinct passage — ordered by
``(doc_id, pos)`` — survives; every other occurrence (including repeats
inside the same document) is cut, and each document's text is rebuilt
from its surviving passages in order.

Scale design (100 TB):

1. ``map_batches`` emits one 24-byte row per passage: ``(hash uint64,
   doc_id, pos)`` — never the passage text (vectorized position-weighted
   hash, ``functions/text.py:chunk_hashes``).
2. ONE hash-coarse shuffle (``groupby(hash % nparts)``) finds, per
   distinct hash, every occurrence AFTER the ``(doc_id, pos)``-minimum:
   the loser set. Output volume = duplicate occurrences only (a few
   percent of passages in a web corpus).
3. Losers co-locate with their documents in a second doc-coarse shuffle
   (tagged union — the same co-location pattern as the LSH verifies and
   the shuffle hash join), and each task rebuilds its documents with a
   vectorized anti-join over the token layout. The document payload
   moves through exactly one exchange — the unavoidable cost of
   rewriting the corpus — and the dispatch unit is the coarse
   partition, never the single document.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["passage_dedup"]

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _doc_part(doc_id: np.ndarray, nparts: int) -> np.ndarray:
    return ((doc_id.astype(np.uint64) * _MIX) % np.uint64(nparts)).astype(
        np.int32)


def passage_dedup(docs, chunk: int = 10, nparts: int = 64):
    """Cross-corpus passage dedup over ``docs`` (``doc_id``/``text``).
    Returns ``(doc_id, dedup_text, n_chunks, n_kept)``."""
    from ..functions.text import chunk_hashes, chunk_layout

    def chunk_rows(df: pd.DataFrame) -> pd.DataFrame:
        h, di, pos = chunk_hashes(df["text"].reset_index(drop=True), chunk)
        return pd.DataFrame({
            "h": h,
            "doc_id": df["doc_id"].to_numpy()[di],
            "pos": pos,
            "hpart": (h % np.uint64(nparts)).astype(np.int32),
        })

    rows = docs.map_batches(chunk_rows, batch_format="pandas")

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id", "pos"], kind="mergesort")
        dup = g["h"].duplicated().to_numpy()
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy()[dup],
            "pos": g["pos"].to_numpy()[dup],
        })

    loser_ds = rows.groupby("hpart").map_groups(
        losers, batch_format="pandas")

    # tagged union: documents carry pos = -1, loser rows carry text = None
    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "text": df["text"],
            "pos": np.full(len(df), -1, dtype=np.int64),
            "dpart": _doc_part(df["doc_id"].to_numpy(), nparts),
        })

    def tag_losers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "text": pd.Series([None] * len(df), dtype=object),
            "pos": df["pos"].astype(np.int64),
            "dpart": _doc_part(df["doc_id"].to_numpy(), nparts),
        })

    both = docs.map_batches(tag_docs, batch_format="pandas").union(
        loser_ds.map_batches(tag_losers, batch_format="pandas"))

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        dmask = (g["pos"] < 0).to_numpy()
        dg = g.loc[dmask]
        cut = g.loc[~dmask, ["doc_id", "pos"]]
        texts = dg["text"].astype(str).reset_index(drop=True)
        doc_ids = dg["doc_id"].to_numpy()
        flat, di, off, lens = chunk_layout(texts, chunk)
        n_chunks = -(-lens // chunk)  # ceil
        kept_text = np.full(len(dg), "", dtype=object)
        n_cut = np.zeros(len(dg), dtype=np.int64)
        if len(flat):
            tok = pd.DataFrame({
                "doc_id": doc_ids[di],
                "pos": off // chunk,
                "_i": np.arange(len(flat)),
            })
            hit = tok.merge(cut.drop_duplicates(), on=["doc_id", "pos"],
                            how="left", indicator=True)
            keep = (hit["_merge"] == "left_only").to_numpy()
            kd = di[keep]
            joined = (pd.Series(flat[keep])
                      .groupby(kd, sort=False).agg(" ".join))
            kept_text[joined.index.to_numpy()] = joined.to_numpy()
            if len(cut):
                cuts_per_doc = (cut.drop_duplicates()
                                .groupby("doc_id").size())
                idx_of = pd.Series(np.arange(len(dg)), index=doc_ids)
                rows_ = idx_of.loc[cuts_per_doc.index].to_numpy()
                n_cut[rows_] = cuts_per_doc.to_numpy()
        return pd.DataFrame({
            "doc_id": doc_ids,
            "dedup_text": kept_text,
            "n_chunks": n_chunks,
            "n_kept": n_chunks - n_cut,
        })

    return both.groupby("dpart").map_groups(rebuild, batch_format="pandas")
