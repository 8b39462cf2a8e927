"""Persistent MinHash-LSH index + incremental dedup of NEW documents
against an indexed corpus — the production "dedupe the incoming crawl
against everything already ingested" shape. The corpus is processed
ONCE at index build; a probe batch only ever touches the index
partitions its own band hashes land in, so probe cost scales with the
batch, not the corpus.

Index layout (two tables, both hash-partitioned to ``nparts`` dirs):

  meta.json                      {num_perm, bands, ngram, nparts, source_tag}
  bands/part=<p>/*.parquet       (band, band_hash, doc_id)          24 B/row
  sigs/spart=<s>/*.parquet       (doc_id, sig list<uint64>)         1 sig/doc

Signatures are stored ONCE per document in their own table — NOT inline
on the 16-per-doc band rows (round 1 flagged exactly that 16x
signature copy as the LSH scale killer). A probe:

  1. computes the new batch's band rows + signatures in ONE
     materialized hashing pass (bands/sigs are projections of it);
  2. prunes the bands/ read to the <= nparts partitions the new band
     hashes touch, and joins new x old band rows on (band, band_hash)
     with the general shuffle hash join -> candidate (new, old) pairs;
  3. prunes the sigs/ read to the partitions holding candidate old ids,
     attaches both signatures with two candidate-scale shuffle joins,
     and keeps pairs with signature-estimated Jaccard >= threshold
     (unbiased, std ~ sqrt(j(1-j)/num_perm) — the same estimator the
     streaming MinHash route uses).

Build is atomic (tmp dir + rename, source_tag invalidation) like the
IVF index (stages/similarity.py:IVFDiskIndex.build).
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

__all__ = ["MinHashDiskIndex"]

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _spart(doc_id: np.ndarray, nparts: int) -> np.ndarray:
    return ((doc_id.astype(np.uint64) * _MIX) % np.uint64(nparts)).astype(
        np.int32)


def _empty_result():
    """Typed empty probe result — the documented (doc_id, dup_of,
    est_jaccard) schema must hold even when nothing matches."""
    import pyarrow as pa
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "dup_of": pa.array([], pa.int64()),
        "est_jaccard": pa.array([], pa.float64())}))


class MinHashDiskIndex:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        if not os.path.exists(os.path.join(index_dir, "meta.json")):
            # a compact() crashed between its two renames: the committed
            # index sits aside under '.compact.old' — restore it (the
            # half-staged replacement dir, if any, is swept by the next
            # compact's rmtree of its tmp path)
            aside = index_dir + ".compact.old"
            if os.path.exists(os.path.join(aside, "meta.json")):
                if os.path.isdir(index_dir):
                    os.rmdir(index_dir)  # rename target was never created
                os.rename(aside, index_dir)
        with open(os.path.join(index_dir, "meta.json")) as fh:
            self.meta = json.load(fh)

    @staticmethod
    def _combined_frame(df: pd.DataFrame, *, num_perm, bands, ngram,
                        nparts, text_col, id_col) -> pd.DataFrame:
        """ONE shingle+OPH pass per batch; one row per doc carrying the
        signature (raw bytes — plain Arrow binary survives parquet
        round-trips and shuffle-join unions without tensor-vs-list type
        drift) AND its band-hash row (bytes). Band rows / sig rows are
        cheap projections of this frame, so neither the build nor the
        probe hashes a document twice."""
        from ..functions.text import (
            band_hashes_matrix,
            oph_signatures_concat,
            shingle_hashes_concat,
        )

        texts = df[text_col].reset_index(drop=True)
        ids = df[id_col].to_numpy()
        gh, gd, n = shingle_hashes_concat(texts, ngram)
        sigs = oph_signatures_concat(gh, gd, n, num_perm)
        bh = band_hashes_matrix(sigs, bands)  # (n, bands) uint64
        return pd.DataFrame({
            "doc_id": ids,
            "sig": [s.tobytes() for s in sigs.astype(np.uint64)],
            "spart": _spart(ids, nparts),
            "bands_blob": [b.tobytes() for b in
                           np.ascontiguousarray(bh, dtype=np.uint64)],
        })

    @staticmethod
    def _explode_bands(df: pd.DataFrame, *, bands, nparts,
                       id_out: str = "doc_id") -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame({
                "band": pd.Series([], dtype=np.int32),
                "band_hash": pd.Series([], dtype=np.uint64),
                id_out: pd.Series([], dtype=np.int64),
                "part": pd.Series([], dtype=np.int32)})
        bh = np.frombuffer(b"".join(df["bands_blob"]),
                           dtype=np.uint64).reshape(n, bands)
        out = pd.DataFrame({
            "band": np.tile(np.arange(bands, dtype=np.int32), n),
            "band_hash": bh.reshape(-1),
            id_out: np.repeat(df["doc_id"].to_numpy(), bands),
        })
        out["part"] = (out["band_hash"].to_numpy()
                       % np.uint64(nparts)).astype(np.int32)
        return out

    @classmethod
    def build(cls, docs, index_dir: str, *, num_perm: int = 64,
              bands: int = 16, ngram: int = 3, nparts: int = 64,
              text_col: str = "text", id_col: str = "doc_id",
              source_tag: str = "") -> "MinHashDiskIndex":
        import shutil

        meta = dict(num_perm=num_perm, bands=bands, ngram=ngram,
                    nparts=nparts, source_tag=source_tag)
        kw = dict(num_perm=num_perm, bands=bands, ngram=ngram,
                  nparts=nparts, text_col=text_col, id_col=id_col)

        # ONE hashing pass over the corpus, materialized (~700 B/doc of
        # sig+band blobs in the object store, spilling as needed); both
        # tables are cheap projections of it — the expensive
        # shingle+OPH work never runs twice
        inter = docs.map_batches(
            lambda df: cls._combined_frame(df, **kw),
            batch_format="pandas").materialize()

        tmp = index_dir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        inter.map_batches(
            lambda df: cls._explode_bands(df, bands=bands, nparts=nparts),
            batch_format="pandas").write_parquet(
            os.path.join(tmp, "bands"), partition_cols=["part"])
        inter.map_batches(
            lambda df: df[["doc_id", "sig", "spart"]],
            batch_format="pandas").write_parquet(
            os.path.join(tmp, "sigs"), partition_cols=["spart"])
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump(meta, fh)
        shutil.rmtree(index_dir, ignore_errors=True)
        os.rename(tmp, index_dir)
        return cls(index_dir)

    def _pruned_dirs(self, table: str, key: str, values) -> list[str]:
        import glob

        committed = int(self.meta.get("generation", 0))
        files = []
        for v in sorted(set(int(x) for x in values)):
            d = os.path.join(self.index_dir, table, f"{key}={v}")
            if os.path.isdir(d):
                files.extend(
                    f for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
                    # an uncommitted extend's files (gen > meta) are
                    # invisible until their meta commit lands
                    if _file_gen(f) <= committed)
        return files

    def extend(self, new_docs, *, text_col: str = "text",
               id_col: str = "doc_id") -> dict:
        """APPEND new documents to the index — the ingestion half of the
        probe→extend crawl loop (probe dedupes the incoming batch
        against everything indexed; extend makes its survivors part of
        "everything" for the next batch). One hashing pass (the same
        ``_combined_frame`` the build uses); band/sig rows append as
        generation-named files inside the existing hash partitions, so
        probe pruning is unchanged and nothing rewrites.

        Crash contract (same shape as the ANN family's refresh): the new
        generation's files go LIVE only when ``meta.json`` commits last;
        a crashed attempt's files are invisible to probes (generation
        fence in ``_pruned_dirs``) and swept by the next extend. Growth
        is append-only — a corpus-scale rebuild IS the compaction."""
        import glob
        import hashlib

        import pyarrow as pa

        gen = int(self.meta.get("generation", 0)) + 1
        for f in glob.glob(os.path.join(self.index_dir, "*", "*",
                                        "g*.parquet")):
            if _file_gen(f) > gen - 1:
                os.remove(f)  # uncommitted leftovers of a crashed extend

        m = self.meta
        kw = dict(num_perm=m["num_perm"], bands=m["bands"],
                  ngram=m["ngram"], nparts=m["nparts"],
                  text_col=text_col, id_col=id_col)
        bands, nparts = m["bands"], m["nparts"]
        root = self.index_dir

        def append_parts(df: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            comb = MinHashDiskIndex._combined_frame(df, **kw)
            rows = MinHashDiskIndex._explode_bands(
                comb, bands=bands, nparts=nparts)
            def _name(ids: np.ndarray) -> str:
                # content-deterministic: a RETRIED task rewrites the same
                # file instead of appending a duplicate copy
                h = hashlib.md5(
                    np.ascontiguousarray(ids, np.int64).tobytes()
                ).hexdigest()[:12]
                return f"g{gen:06d}-{h}.parquet"

            # the FINAL name is content-deterministic (retry-idempotent)
            # but the staging path must be writer-private: a zombie task
            # racing its retry on one '.tmp' path would interleave bytes
            tsuf = f".tmp.{os.getpid()}"
            for part, sub in rows.groupby("part"):
                d = os.path.join(root, "bands", f"part={int(part)}")
                os.makedirs(d, exist_ok=True)
                out = os.path.join(d, _name(sub["doc_id"].to_numpy()))
                pq.write_table(pa.Table.from_pandas(
                    sub[["band", "band_hash", "doc_id"]],
                    preserve_index=False), out + tsuf)
                os.replace(out + tsuf, out)
            for sp, sub in comb.groupby("spart"):
                d = os.path.join(root, "sigs", f"spart={int(sp)}")
                os.makedirs(d, exist_ok=True)
                out = os.path.join(d, _name(sub["doc_id"].to_numpy()))
                pq.write_table(pa.Table.from_pandas(
                    sub[["doc_id", "sig"]], preserve_index=False),
                    out + tsuf)
                os.replace(out + tsuf, out)
            return pd.DataFrame({"docs": [len(comb)]})

        stats = new_docs.map_batches(
            append_parts, batch_format="pandas").take_all()
        n = int(sum(r["docs"] for r in stats))
        new_meta = dict(m, generation=gen)
        mp = os.path.join(root, "meta.json")
        tmp = mp + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(new_meta, fh)
        os.replace(tmp, mp)
        self.meta = new_meta
        return {"generation": gen, "docs_added": n}

    def probe_df(self, new_docs, **kw) -> pd.DataFrame:
        """``probe`` folded to a pandas frame with the (doc_id, dup_of,
        est_jaccard) schema GUARANTEED — Ray's ``to_pandas`` drops
        column names from zero-row datasets, so the no-match case is
        re-typed here."""
        out = self.probe(new_docs, **kw).to_pandas()
        if out.empty:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "dup_of": pd.Series(dtype="int64"),
                "est_jaccard": pd.Series(dtype="float64")})
        return out

    def probe(self, new_docs, *, threshold: float = 0.5,
              text_col: str = "text", id_col: str = "doc_id"):
        """Near-dup matches of ``new_docs`` against the index: returns
        ``(doc_id, dup_of, est_jaccard)`` rows (one per matching pair,
        deduplicated across bands)."""
        import ray

        from .join import shuffle_hash_join

        m = self.meta
        kw = dict(num_perm=m["num_perm"], bands=m["bands"],
                  ngram=m["ngram"], nparts=m["nparts"],
                  text_col=text_col, id_col=id_col)

        # ONE hashing pass over the probe batch, materialized; bands and
        # sigs project from it (the batch is the small side by design)
        inter = new_docs.map_batches(
            lambda df: self._combined_frame(df, **kw),
            batch_format="pandas").materialize()

        new_bands = inter.map_batches(
            lambda df: self._explode_bands(
                df, bands=m["bands"], nparts=m["nparts"],
                id_out="new_id"),
            batch_format="pandas")

        def ns_rows(df: pd.DataFrame):
            # arrow table with explicit binary type: a pandas block would
            # type the bytes column as raw `object`, which the shuffle
            # join's schema introspection cannot null-fill
            import pyarrow as pa

            return pa.table({
                "new_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "new_sig": pa.array(list(df["sig"]), pa.binary()),
            })

        # partition prune: which bands/ dirs can contain a matching hash
        def part_partial(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"part": np.unique(df["part"])})

        parts = (new_bands.map_batches(part_partial, batch_format="pandas")
                 .to_pandas()["part"].unique())
        band_dirs = self._pruned_dirs("bands", "part", parts)
        if not band_dirs:
            return _empty_result()
        old_bands = ray.data.read_parquet(band_dirs).map_batches(
            lambda t: t.select(["band", "band_hash", "doc_id"])
            .rename_columns(["band", "band_hash", "old_id"]),
            batch_format="pyarrow")

        def pair_dedup(j: pd.DataFrame) -> pd.DataFrame:
            return j[["new_id", "old_id"]].drop_duplicates()

        pairs = shuffle_hash_join(
            new_bands.map_batches(
                lambda df: df[["band", "band_hash", "new_id"]],
                batch_format="pandas"),
            old_bands, on=["band", "band_hash"], post=pair_dedup)

        # sigs/ prune from the candidate old ids (partial-unique sparts)
        def spart_partial(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "spart": np.unique(_spart(df["old_id"].to_numpy(),
                                          m["nparts"]))})

        sp_df = (pairs.map_batches(spart_partial, batch_format="pandas")
                 .to_pandas())
        # a fully-empty pairs dataset yields a columnless frame
        sparts = (sp_df["spart"].unique()
                  if "spart" in sp_df.columns else [])
        sig_dirs = self._pruned_dirs("sigs", "spart", sparts)
        if not sig_dirs:
            return _empty_result()
        old_sigs = ray.data.read_parquet(sig_dirs).map_batches(
            lambda t: t.select(["doc_id", "sig"])
            .rename_columns(["old_id", "old_sig"]),
            batch_format="pyarrow")
        new_sigs = inter.map_batches(ns_rows, batch_format="pandas")

        def _arrowize(df: pd.DataFrame):
            import pyarrow as pa

            return pa.table({
                "new_id": pa.array(df["new_id"].to_numpy(), pa.int64()),
                "old_id": pa.array(df["old_id"].to_numpy(), pa.int64()),
                "new_sig": pa.array(list(df["new_sig"]), pa.binary()),
            })

        j1 = shuffle_hash_join(pairs, new_sigs, on="new_id").map_batches(
            _arrowize, batch_format="pandas")

        def verify(j: pd.DataFrame) -> pd.DataFrame:
            j = j.drop_duplicates(subset=["new_id", "old_id"])
            if j.empty:
                return pd.DataFrame({
                    "doc_id": pd.Series([], dtype=np.int64),
                    "dup_of": pd.Series([], dtype=np.int64),
                    "est_jaccard": pd.Series([], dtype=np.float64)})
            a = np.stack([np.frombuffer(x, np.uint64)
                          for x in j["new_sig"]])
            b = np.stack([np.frombuffer(x, np.uint64)
                          for x in j["old_sig"]])
            est = (a == b).mean(axis=1)
            keep = est >= threshold
            # explicit int64: a pandas merge that touched an empty proto
            # frame can upcast ids to float64
            return pd.DataFrame({
                "doc_id": j["new_id"].to_numpy()[keep].astype(np.int64),
                "dup_of": j["old_id"].to_numpy()[keep].astype(np.int64),
                "est_jaccard": est[keep]})

        return shuffle_hash_join(j1, old_sigs, on="old_id", post=verify)


    def compact(self) -> "MinHashDiskIndex":
        """Fold every extend generation into a fresh atomic base layout
        (one file set per partition, no generation suffixes) WITHOUT
        re-reading or re-hashing any document: band hashes are a pure
        projection of the stored signatures, so compaction is one
        distributed pass over the sigs table. The generation counter is
        preserved (monotone across compactions, mirroring the ANN
        family's contract); duplicate doc_ids from repeated extends
        collapse within each batch (a re-extended doc carries an
        IDENTICAL signature, so any residual cross-batch duplicate is
        harmless — probe dedups pairs — and only costs bytes). Staged dir + rename — a crash leaves the
        old index intact."""
        import glob
        import shutil

        import ray.data

        m = self.meta
        committed = int(m.get("generation", 0))
        files = []
        for d in sorted(glob.glob(os.path.join(self.index_dir,
                                               "sigs", "spart=*"))):
            files.extend(
                f for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
                if _file_gen(f) <= committed)
        kw = dict(num_perm=m["num_perm"], bands=m["bands"],
                  nparts=m["nparts"])
        inter = (ray.data.read_parquet(files, columns=["doc_id", "sig"])
                 .map_batches(lambda df: _compact_frame(df, **kw),
                              batch_format="pandas")
                 .materialize())
        tmp = self.index_dir + f".compact.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        bands, nparts = m["bands"], m["nparts"]
        inter.map_batches(
            lambda df: MinHashDiskIndex._explode_bands(
                df, bands=bands, nparts=nparts),
            batch_format="pandas").write_parquet(
            os.path.join(tmp, "bands"), partition_cols=["part"])
        inter.map_batches(
            lambda df: df[["doc_id", "sig", "spart"]],
            batch_format="pandas").write_parquet(
            os.path.join(tmp, "sigs"), partition_cols=["spart"])
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump(m, fh)
        # swap via rename-aside, never rmtree-then-rename: a crash
        # between the two renames leaves the committed index under
        # '.compact.old', which __init__ restores on the next open
        aside = self.index_dir + ".compact.old"
        shutil.rmtree(aside, ignore_errors=True)
        os.rename(self.index_dir, aside)
        os.rename(tmp, self.index_dir)
        shutil.rmtree(aside, ignore_errors=True)
        return MinHashDiskIndex(self.index_dir)

def _file_gen(path: str) -> int:
    """Generation encoded in an appended file's name (``g000002-...``);
    the atomic build's own files carry no prefix and are generation 0."""
    b = os.path.basename(path)
    if (len(b) > 8 and b[0] == "g" and b[1:7].isdigit() and b[7] == "-"):
        return int(b[1:7])
    return 0


def _compact_frame(df: pd.DataFrame, *, num_perm: int, bands: int,
                   nparts: int) -> pd.DataFrame:
    """Rebuild the combined (sig + band blob) frame from STORED
    signatures — band hashes are a pure projection of a signature, so
    compaction never re-reads or re-hashes a document."""
    from ..functions.text import band_hashes_matrix

    df = df.drop_duplicates("doc_id", keep="last").reset_index(drop=True)
    n = len(df)
    if n == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "sig": pd.Series([], dtype=object),
                             "spart": pd.Series([], dtype=np.int32),
                             "bands_blob": pd.Series([], dtype=object)})
    sigs = np.frombuffer(b"".join(df["sig"]),
                         dtype=np.uint64).reshape(n, num_perm)
    bh = band_hashes_matrix(sigs, bands)
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(),
        "sig": df["sig"].to_numpy(),
        "spart": _spart(df["doc_id"].to_numpy(), nparts),
        "bands_blob": [b.tobytes() for b in
                       np.ascontiguousarray(bh, dtype=np.uint64)],
    })
