"""Deduplication operators over a documents Dataset.

Five families, each expressed Ray-Data-first (SURVEY.md mandate for
training-data pipelines):

* exact           — content-hash groupby, keep min id (hash-partition + first)
* minhash_lsh     — shingle -> minhash -> band buckets (ids only) ->
                    signature semi-join -> estimated-Jaccard verify
* simhash         — 64-bit simhash, banded buckets, hamming verify
* ngram_jaccard   — exact n-gram Jaccard verification of LSH candidates
* embedding_cosine— random-hyperplane LSH buckets (ids only) -> exact
                    cosine verify in the pair semi-join

Scale shape (documented partitioning assumptions):
- the band/bucket exchange ships (coarse_part, band, band_hash, id)
  rows ONLY — per-doc payloads (signatures, shingles, vectors) never
  ride the wide shuffle, and bucket keys bound hot buckets by collision
  rate, not data size;
- buckets co-locate under ONE small-int key (``nparts`` coarse parts,
  local vectorized groupby inside each part) so map_groups never pays
  per-tiny-bucket overhead; size nparts so a part fits a task's heap;
- candidate pairs verify inside ``_colocate_pairs``: a distributed
  tagged-union semi-join that attaches each candidate doc's payload
  (crossing the shuffle exactly once) and evaluates pairs with local
  dedup — nothing materializes on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

from ..functions.text import (
    jaccard,
    minhash_params,
    shingle_hashes,
)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Exact duplicate groups: md5(text) -> (keep = min id, n_dups).

    hash-partition + per-group first, the canonical exact-dedup shape: the
    shuffle moves (hash, id) pairs only — never the documents."""

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[text_col].to_numpy()
        md5 = hashlib.md5
        return pd.DataFrame(
            {
                "text_md5": np.fromiter(
                    (md5(s.encode()).hexdigest() for s in vals),
                    dtype="<U32", count=len(vals),
                ),
                id_col: df[id_col].to_numpy(),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    return hashed.groupby("text_md5").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_dups")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


class MinHasher:
    """Per-batch stage: shingles + minhash signature per document; emits
    exploded (part, band, band_hash, id[, sig]) rows for the bucket
    shuffle. Runs as a STATELESS task pool by default — the only state
    (two ``num_perm``-long permutation arrays) rebuilds in microseconds,
    so an actor pool would cost more in spin-up latency than the state
    saves; pass ``concurrency=N`` upstream to pin an actor pool anyway
    (e.g. under a tight memory budget).

    Scale note: with ``emit_sigs=False`` (the candidate-route default)
    the exchange ships 24-byte id rows only; signatures are recomputed
    once per CANDIDATE doc in the verify semi-join, so neither shingles
    (would be 16x-replicated per band) nor signatures ride the wide
    all-to-all. Verification uses the signature-estimated Jaccard
    (unbiased; std ~= sqrt(j(1-j)/num_perm), ~0.06 at num_perm=64), the
    standard large-scale MinHash-LSH shape."""

    def __init__(self, num_perm: int = 64, bands: int = 16, ngram: int = 3,
                 text_col: str = "text", id_col: str = "doc_id",
                 emit_sigs: bool = True, nparts: int = 64) -> None:
        self.a, self.b = minhash_params(num_perm)
        self.bands = bands
        self.ngram = ngram
        self.text_col = text_col
        self.id_col = id_col
        self.emit_sigs = emit_sigs
        self.nparts = nparts

    # coarse co-location parts for the bucket shuffle: buckets hash into
    # `nparts` groups so the exchange sorts ONE small-int key and the
    # verify stage runs per-part (vectorized local groupby) instead of
    # per-bucket (ray-level map_groups overhead x 100k tiny buckets).
    # Size nparts so exploded-rows/nparts fits one task's heap.

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import (
            band_hashes_matrix,
            oph_signatures_concat,
            shingle_hashes_concat,
        )

        n = len(batch)
        gh, gd, _ = shingle_hashes_concat(batch[self.text_col], self.ngram)
        sigs = oph_signatures_concat(gh, gd, n, len(self.a))
        bh = band_hashes_matrix(sigs, self.bands)  # (n, bands)

        ids = np.repeat(batch[self.id_col].to_numpy(), self.bands)
        bands_col = np.tile(np.arange(self.bands, dtype=np.int32), n)
        bh_flat = bh.reshape(-1).astype(np.int64)
        part = ((bh_flat * np.int64(0x9E3779B1) + bands_col)
                % np.int64(self.nparts)).astype(np.int32)
        out = {
            "part": part,
            "band": bands_col,
            "band_hash": bh_flat,
            self.id_col: ids,
        }
        if self.emit_sigs:
            sig_bytes = [sigs[i].tobytes() for i in range(n)]
            out["sig"] = np.repeat(np.array(sig_bytes, dtype=object),
                                   self.bands)
        return pd.DataFrame(out)


def _verify_bucket(g: pd.DataFrame, id_col: str, threshold: float) -> pd.DataFrame:
    """Within one LSH bucket: signature-estimated Jaccard over all pairs,
    fully vectorized (bucket sizes are small by construction; quadratic
    locally, never globally)."""
    if len(g) < 2:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    g = g.drop_duplicates(id_col).sort_values(id_col)
    ids = g[id_col].to_numpy()
    sigs = np.stack([np.frombuffer(b, dtype=np.uint64) for b in g["sig"]])
    n = len(ids)
    a_out, b_out, j_out = [], [], []
    blk = 256  # bound the (blk, n, num_perm) comparison temporary
    for i0 in range(0, n, blk):
        i1 = min(i0 + blk, n)
        est = (sigs[i0:i1, None, :] == sigs[None, :, :]).mean(axis=-1)
        ii, kk = np.nonzero(est >= threshold)
        keep = (ii + i0) < kk  # upper triangle only
        a_out.append(ids[ii[keep] + i0])
        b_out.append(ids[kk[keep]])
        j_out.append(np.round(est[ii[keep], kk[keep]], 6))
    return pd.DataFrame(
        {
            "id_a": np.concatenate(a_out) if a_out else [],
            "id_b": np.concatenate(b_out) if b_out else [],
            "jaccard": np.concatenate(j_out) if j_out else [],
        }
    )


def _hash_mod(series: pd.Series, nparts: int) -> np.ndarray:
    """Deterministic uint64 hash of any id dtype -> int32 part."""
    h = pd.util.hash_pandas_object(series, index=False).to_numpy()
    return (h % np.uint64(nparts)).astype(np.int32)


def _id_hash(values) -> np.ndarray:
    """Width-canonical uint64 hash of an id array for the candidate
    Bloom filter: every integer dtype hashes as int64 so the build side
    (candidate pair columns) and the probe side (corpus id column)
    agree bit-for-bit even when Parquet narrows one of them."""
    v = np.asarray(values)
    if np.issubdtype(v.dtype, np.integer):
        v = v.astype(np.int64, copy=False)
    return pd.util.hash_array(v)


def _candidate_bloom(cand, nbits: int = 1 << 22, nhash: int = 4) -> np.ndarray:
    """Bloom filter over the union of a pair dataset's id_a/id_b.

    Fixed-size OR-mergeable partials (same fold shape as
    ``stages/join.py:bloom_of_keys``): the driver folds O(nbits) bytes,
    never ids."""
    from ..functions.sketch import bloom_set

    nbytes = nbits // 8

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = np.zeros(nbytes, np.uint8)
        for col in ("id_a", "id_b"):
            bloom_set(b, _id_hash(df[col].to_numpy()), nhash)
        return pd.DataFrame({"b": [b.tobytes()]})

    def orfold(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nbytes, np.uint8)
        for buf in df["b"]:
            acc |= np.frombuffer(buf, np.uint8)
        return pd.DataFrame({"b": [acc.tobytes()]})

    folded = (cand.map_batches(partial, batch_format="pandas")
              .map_batches(orfold, batch_format="pandas", batch_size=64))
    acc = np.zeros(nbytes, np.uint8)
    for row in folded.take_all():
        acc |= np.frombuffer(row["b"], np.uint8)
    return acc


def _colocate_pairs(ds, cand, make_doc_rows, pair_fn, id_col: str,
                    out_cols: list[str], nparts: int = 64,
                    prefilter: bool = True):
    """Shuffle hash semi-join: co-locate per-document payloads with the
    candidate pairs that reference them, then evaluate ``pair_fn`` on each
    pair group. Fully distributed — nothing touches the driver — and both
    groupbys use ONE coarse int key (``nparts`` parts, local pandas joins
    inside each part) so map_groups never sees per-doc/per-pair tiny
    groups. Size ``nparts`` so a part (~corpus payload / nparts) fits a
    task's heap.

    1. Each candidate pair explodes into two MEMBERSHIP rows
       (doc_id, id_a, id_b).
    2. ``make_doc_rows`` maps the corpus to (doc_id, payload bytes,
       partition value) rows.
    3. The tagged union of (1)+(2) groups by hash(doc_id) % nparts; a
       local pandas merge attaches each doc's payload to the membership
       rows referencing it; unreferenced docs emit nothing.
    4. Group by hash(pair) % nparts; a local groupby evaluates
       ``pair_fn`` per (id_a, id_b) with both payloads co-located.

    A Bloom filter over the candidate ids (fixed-size OR-fold, built
    once from the materialized pair set) prunes the corpus BEFORE
    payload computation: non-candidate docs neither compute their
    payload (signature/shingles/vector prep) nor ride the union
    shuffle. False positives just ship a payload that the attach merge
    drops — exactness is untouched (the Bloom has no false negatives).
    At 10^9 docs with ~1% candidates this cuts the verify exchange and
    its payload compute ~100x; the extra cost is one materialization of
    the id-pair set (24-byte rows) and an O(nbits) driver fold.

    Each CANDIDATE doc's payload crosses the shuffle exactly once; pair
    rows are O(candidates)."""
    import ray as _ray

    from ..functions.sketch import bloom_contains

    bloom_ref = None
    _BLOOM_NHASH = 4
    if prefilter:
        # consumed twice (bloom build + membership explode): materialize
        # the tiny id-pair set so the candidate pipeline doesn't run twice
        cand = cand.materialize()
        bloom_ref = _ray.put(_candidate_bloom(cand, nhash=_BLOOM_NHASH))

    def explode_membership(df: pd.DataFrame) -> pd.DataFrame:
        ids_a = df["id_a"].to_numpy()
        ids_b = df["id_b"].to_numpy()
        out = pd.DataFrame(
            {
                id_col: np.concatenate([ids_a, ids_b]),
                "id_a": np.tile(ids_a, 2),
                "id_b": np.tile(ids_b, 2),
                "payload": [b""] * (2 * len(df)),
                "pcol": [""] * (2 * len(df)),
                "kind": ["m"] * (2 * len(df)),
            }
        )
        out["part"] = _hash_mod(out[id_col], nparts)
        return out

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        if bloom_ref is not None:
            keep = bloom_contains(
                _ray.get(bloom_ref),
                _id_hash(df[id_col].to_numpy()), _BLOOM_NHASH)
            if not keep.all():
                df = df[keep]
        if len(df) == 0:
            e = df[id_col].iloc[:0]
            return pd.DataFrame(
                {id_col: e, "id_a": e, "id_b": e,
                 "payload": pd.Series([], dtype=object),
                 "pcol": pd.Series([], dtype=object),
                 "kind": pd.Series([], dtype=object),
                 "part": pd.Series([], dtype=np.int32)})
        out = make_doc_rows(df)
        out["part"] = _hash_mod(out[id_col], nparts)
        return out

    members = cand.map_batches(explode_membership, batch_format="pandas")
    docs = ds.map_batches(doc_rows, batch_format="pandas")

    def attach_part(g: pd.DataFrame) -> pd.DataFrame:
        doc = g[g["kind"] == "d"]
        mem = g[g["kind"] == "m"]
        if doc.empty or mem.empty:
            return pd.DataFrame(
                {"did": [], "id_a": [], "id_b": [], "payload": [],
                 "pcol": [], "ppart": pd.Series([], dtype=np.int32)})
        merged = mem[[id_col, "id_a", "id_b"]].merge(
            doc[[id_col, "payload", "pcol"]], on=id_col, how="inner")
        out = merged[[id_col, "id_a", "id_b", "payload", "pcol"]].copy()
        out = out.rename(columns={id_col: "did"})
        out["ppart"] = _hash_mod(
            out["id_a"].astype(str) + "\x1f" + out["id_b"].astype(str),
            nparts)
        return out

    attached = docs.union(members).groupby("part").map_groups(
        attach_part, batch_format="pandas")

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _k, sub in g.groupby(["id_a", "id_b"], sort=False):
            # a pair surfacing from several buckets repeats its membership
            # rows — dedup by doc id locally (cheaper than a global
            # pair-dedup barrier between candidate and verify stages)
            sub = sub.drop_duplicates(subset="did")
            if len(sub) < 2:
                continue
            r = pair_fn(sub)
            if r is not None:
                outs.append(r)
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame({c: [] for c in out_cols}))

    return attached.groupby("ppart").map_groups(
        pairs_part, batch_format="pandas")


def minhash_candidate_pairs(
    ds: "ray.data.Dataset",
    *,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
    nparts: int = 64,
    dedup: bool = True,
) -> "ray.data.Dataset":
    """LSH bucket co-membership pairs, UNVERIFIED: the band shuffle moves
    (part, band, band_hash, id) rows ONLY — no signatures, no shingles
    (24 bytes/row; at 10^9 docs x 16 bands that is ~0.4 TB vs ~8 TB with
    per-band signature copies). Verification composes downstream
    (signature-estimated via minhash_lsh_pairs, or exact via the ngram
    route's shingle semi-join)."""
    mh_kwargs = dict(num_perm=num_perm, bands=bands, ngram=ngram,
                     text_col=text_col, id_col=id_col, emit_sigs=False,
                     nparts=nparts)
    if concurrency is None:
        # stateless task pool: params rebuild per batch in microseconds,
        # every CPU slot participates, no actor spin-up on cold runs
        def _mh(batch: pd.DataFrame) -> pd.DataFrame:
            return MinHasher(**mh_kwargs)(batch)

        exploded = ds.map_batches(_mh, batch_format="pandas")
    else:
        exploded = ds.map_batches(
            MinHasher,
            fn_constructor_kwargs=mh_kwargs,
            batch_format="pandas",
            concurrency=concurrency,
        )

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        # singleton buckets (the vast majority) exit via one vectorized
        # duplicated() pass; real buckets emit their co-member pairs
        g = g[g.duplicated(["band", "band_hash"], keep=False)]
        if g.empty:
            return pd.DataFrame({"id_a": [], "id_b": []})
        a_out, b_out = [], []
        for _k, sub in g.groupby(["band", "band_hash"], sort=False):
            ids = np.unique(sub[id_col].to_numpy())
            if len(ids) < 2:
                continue
            ii, kk = np.triu_indices(len(ids), k=1)
            a_out.append(ids[ii])
            b_out.append(ids[kk])
        if not a_out:
            return pd.DataFrame({"id_a": [], "id_b": []})
        return pd.DataFrame({"id_a": np.concatenate(a_out),
                             "id_b": np.concatenate(b_out)})

    # ONE coarse co-location key through the exchange (see MinHasher)
    pairs = exploded.groupby("part").map_groups(
        pairs_part, batch_format="pandas")
    if not dedup:
        # a pair can surface from several bands; callers that group by
        # pair downstream (the verify semi-join) dedup locally and skip
        # this extra all-to-all barrier
        return pairs
    return pairs.groupby(["id_a", "id_b"]).count().drop_columns(["count()"])


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    *,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
    nparts: int = 64,
) -> "ray.data.Dataset":
    """Near-duplicate pairs via MinHash-LSH: shingle -> minhash -> band ->
    bucket co-membership (ids only through the shuffle) -> signature
    semi-join -> estimated-Jaccard verify.

    The signature of each CANDIDATE document is recomputed once in the
    verify semi-join rather than shipped once-per-band through the bucket
    exchange — compute is O(candidate docs), shuffle payload drops ~20x
    (sig bytes never ride the wide exchange)."""
    cand = minhash_candidate_pairs(
        ds, num_perm=num_perm, bands=bands, ngram=ngram,
        text_col=text_col, id_col=id_col, concurrency=concurrency,
        nparts=nparts, dedup=False)

    a, b = minhash_params(num_perm)

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import (
            oph_signatures_concat,
            shingle_hashes_concat,
        )

        n = len(df)
        gh, gd, _ = shingle_hashes_concat(df[text_col], ngram)
        sigs = oph_signatures_concat(gh, gd, n, len(a))
        ids = df[id_col].to_numpy()
        return pd.DataFrame(
            {
                id_col: ids,
                "id_a": ids,  # dummies keep the union schema uniform
                "id_b": ids,
                "payload": [sigs[i].tobytes() for i in range(n)],
                "pcol": [""] * n,
                "kind": ["d"] * n,
            }
        )

    def estimate_pair(g: pd.DataFrame) -> pd.DataFrame | None:
        sa = np.frombuffer(g["payload"].iloc[0], dtype=np.uint64)
        sb = np.frombuffer(g["payload"].iloc[1], dtype=np.uint64)
        j = float((sa == sb).mean())
        if j < threshold:
            return None
        return pd.DataFrame(
            {
                "id_a": [g["id_a"].iloc[0]],
                "id_b": [g["id_b"].iloc[0]],
                "jaccard": [round(j, 6)],
            }
        )

    return _colocate_pairs(ds, cand, sig_rows, estimate_pair, id_col,
                           ["id_a", "id_b", "jaccard"], nparts=nparts)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def _sim_chunk_bounds(n_chunks: int) -> list[int]:
    return [round(64 * i / n_chunks) for i in range(n_chunks + 1)]


def _sim_chunks(h: np.ndarray, n_chunks: int) -> np.ndarray:
    """(n, n_chunks) uint64 chunk values of a uint64 simhash array."""
    bounds = _sim_chunk_bounds(n_chunks)
    out = np.empty((len(h), n_chunks), dtype=np.uint64)
    for j in range(n_chunks):
        lo, hi = bounds[j], bounds[j + 1]
        out[:, j] = (h >> np.uint64(lo)) & np.uint64((1 << (hi - lo)) - 1)
    return out


def _sim_band_keys(hs: np.ndarray, max_hamming: int) -> np.ndarray:
    """(n, n_bands) int64 LSH keys for the given hamming radius.

    max_hamming <= 3: 5 chunks, C(5,2)=10 chunk-PAIR keys (~26 bits) — any
    pair within the radius leaves >= 2 chunks intact, so some pair-key
    matches; wide keys keep bucket sizes bounded at 10^9 docs.
    Larger radii: classic single-chunk banding with max_hamming+1 chunks
    (pigeonhole), with correspondingly narrower keys — inherent to loose
    radii; documented partitioning assumption."""
    if max_hamming <= 3:
        chunks = _sim_chunks(hs, 5)
        pairs = [(i, k) for i in range(5) for k in range(i + 1, 5)]
        keys = np.empty((len(hs), len(pairs)), dtype=np.int64)
        for b, (i, k) in enumerate(pairs):
            keys[:, b] = (chunks[:, i] | (chunks[:, k] << np.uint64(14))).astype(np.int64)
        return keys
    c = max_hamming + 1
    return _sim_chunks(hs, c).astype(np.int64)


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (numpy<2 has no bitwise_count)."""
    return np.unpackbits(v.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_pairs(
    ds: "ray.data.Dataset",
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Near-dup pairs by 64-bit SimHash: chunk-PAIR LSH buckets (wide keys,
    bounded buckets — see _SIM_CHUNK_PAIRS), exact vectorized hamming
    verification inside each bucket. SimHash itself is batch-vectorized
    (functions/text.py simhash64_many)."""

    NPARTS = 64  # coarse co-location (see MinHasher docstring)

    def add_sim(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import simhash64_many

        n = len(df)
        hs = simhash64_many(df[text_col])
        keys = _sim_band_keys(hs, max_hamming)
        n_bands = keys.shape[1]
        bands_col = np.tile(np.arange(n_bands, dtype=np.int32), n)
        chunks = keys.reshape(-1)
        part = ((chunks * np.int64(0x9E3779B1) + bands_col)
                % np.int64(NPARTS)).astype(np.int32)
        return pd.DataFrame(
            {
                "part": part,
                "band": bands_col,
                "chunk": chunks,
                id_col: np.repeat(df[id_col].to_numpy(), n_bands),
                "simhash": np.repeat(hs.astype(np.int64), n_bands),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        a_out, b_out, d_out = [], [], []
        blk = 512
        for i0 in range(0, n, blk):
            i1 = min(i0 + blk, n)
            x = hs[i0:i1, None] ^ hs[None, :]
            dist = _popcount64(x.ravel()).reshape(i1 - i0, n)
            ii, kk = np.nonzero(dist <= max_hamming)
            keep = (ii + i0) < kk
            a_out.append(ids[ii[keep] + i0])
            b_out.append(ids[kk[keep]])
            d_out.append(dist[ii[keep], kk[keep]])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(a_out) if a_out else [],
                "id_b": np.concatenate(b_out) if b_out else [],
                "hamming": np.concatenate(d_out) if d_out else [],
            }
        )

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(["band", "chunk"], keep=False)]
        if g.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        out = [verify(sub)
               for _k, sub in g.groupby(["band", "chunk"], sort=False)]
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"id_a": [], "id_b": [], "hamming": []})

    exploded = ds.map_batches(add_sim, batch_format="pandas")
    pairs = exploded.groupby("part").map_groups(
        verify_part, batch_format="pandas"
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (all-pairs within a partition key)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    *,
    ngram: int = 3,
    threshold: float = 0.5,
    partition_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "allpairs",
) -> "ray.data.Dataset":
    """Exact n-gram-Jaccard duplicate pairs.

    ``method="allpairs"`` (default, exact and SQL-oracled): all pairs
    WITHIN a partition column (e.g. language). Documented tractability
    assumption — O(n^2) per partition, fine for modest partitions, a
    scale-killer when one partition holds half the corpus.

    ``method="lsh"`` (the 100-TB path): MinHash-LSH proposes candidate
    pairs (signatures only through the shuffle), then a SECOND narrow
    stage fetches just the candidate documents' shingle sets and verifies
    EXACT Jaccard. Cost is O(corpus) + O(candidates); recall is the LSH
    band recall at the chosen threshold (>=1-(1-t^r)^b). Candidate pairs
    are assumed small relative to the corpus (near-dup fraction), the
    standard production assumption."""
    if method == "lsh":
        return _ngram_jaccard_lsh(ds, ngram=ngram, threshold=threshold,
                                  partition_col=partition_col,
                                  text_col=text_col, id_col=id_col)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        shs = [shingle_hashes(t, ngram) for t in g[text_col]]
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        # exact all-pairs intersection counts via ONE doc x gram incidence
        # matmul (BLAS) instead of n^2 per-pair set intersections; counts
        # <= |grams| per doc are exact in float32
        sizes = np.array([len(s) for s in shs], dtype=np.int64)
        cat = (np.concatenate([s for s in shs if len(s)])
               if sizes.sum() else np.empty(0, np.uint64))
        uniq, inv = np.unique(cat, return_inverse=True)
        M = np.zeros((n, max(1, len(uniq))), dtype=np.float32)
        M[np.repeat(np.arange(n), sizes), inv] = 1.0
        inter = (M @ M.T).astype(np.int64)
        union = sizes[:, None] + sizes[None, :] - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            j = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        ii, kk = np.nonzero(j >= threshold)
        keep = ii < kk
        rows = [
            (ids[a], ids[b], round(float(j[a, b]), 6))
            for a, b in zip(ii[keep], kk[keep])
        ]
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    return ds.select_columns([partition_col, id_col, text_col]).groupby(
        partition_col
    ).map_groups(verify, batch_format="pandas")


def _ngram_jaccard_lsh(ds, *, ngram: int, threshold: float,
                       partition_col: str | None, text_col: str, id_col: str):
    """LSH-candidates -> DISTRIBUTED exact-Jaccard verify (see
    ngram_jaccard_pairs). Honors ``partition_col``: cross-partition
    candidate pairs are dropped, matching the exact route's
    within-partition semantics.

    Fully distributed — nothing is materialized on the driver:

    1. MinHash-LSH proposes candidate pairs (ids only through the bucket
       shuffle — minhash_candidate_pairs).
    2. _colocate_pairs semi-joins each candidate doc's shingle set to its
       pairs (each shingle set crosses the shuffle exactly once) and
       verifies exact Jaccard + threshold + partition check per pair.

    Cost is O(corpus shingles) + O(candidates), all task/actor parallel."""

    # stage 1: bucket co-membership candidates (permissive: exact verify
    # prunes everything below the threshold downstream)
    cand = minhash_candidate_pairs(
        ds, num_perm=128, bands=32, ngram=ngram,
        text_col=text_col, id_col=id_col, dedup=False,
    )

    def shingled(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        pv = (df[partition_col].astype(str).to_numpy()
              if partition_col is not None else np.repeat("", len(df)))
        return pd.DataFrame(
            {
                id_col: ids,
                "id_a": ids,  # dummy, keeps the union schema/dtypes uniform
                "id_b": ids,
                "payload": [shingle_hashes(t, ngram).tobytes()
                            for t in df[text_col]],
                "pcol": pv,
                "kind": ["d"] * len(df),
            }
        )

    def verify_pair(g: pd.DataFrame) -> pd.DataFrame | None:
        if partition_col is not None and g["pcol"].nunique() > 1:
            return None  # cross-partition pair: out of scope by contract
        a = np.frombuffer(g["payload"].iloc[0], dtype=np.uint64)
        b = np.frombuffer(g["payload"].iloc[1], dtype=np.uint64)
        j = jaccard(a, b)
        if j < threshold:
            return None
        return pd.DataFrame(
            {
                "id_a": [g["id_a"].iloc[0]],
                "id_b": [g["id_b"].iloc[0]],
                "jaccard": [round(j, 6)],
            }
        )

    cols = [id_col, text_col] + ([partition_col] if partition_col else [])
    return _colocate_pairs(ds.select_columns(cols), cand, shingled,
                           verify_pair, id_col,
                           ["id_a", "id_b", "jaccard"])


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (random hyperplane LSH)
# ---------------------------------------------------------------------------


def embedding_cosine_pairs(
    ds: "ray.data.Dataset",
    *,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 12,
    n_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 99,
) -> "ray.data.Dataset":
    """Near-dup vector pairs: sign-LSH (random hyperplanes) buckets, then
    EXACT cosine verification of the candidate pairs.

    Scale shape (same as the MinHash route): the bucket exchange moves
    (part, tbl, bucket, id) rows ONLY — vectors never ride the wide
    shuffle (previously one float16 unit-vector copy per hash table, 4x
    blowup). Candidate pairs come from bucket co-membership; the verify
    stage re-normalizes just the candidate documents' vectors inside the
    distributed _colocate_pairs semi-join and computes exact cosine per
    pair. ``n_tables`` independent hash tables bound the miss rate."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, dim, n_planes)).astype(np.float32)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df[vec_col].to_numpy())
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        rows_id, rows_tbl, rows_bkt = [], [], []
        for t in range(n_tables):
            bits = (unit @ planes[t]) > 0
            codes = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            rows_id.extend(df[id_col].tolist())
            rows_tbl.extend([t] * len(df))
            rows_bkt.extend(codes.tolist())
        bkt = np.asarray(rows_bkt, dtype=np.int64)
        tblc = np.asarray(rows_tbl, dtype=np.int64)
        part = ((bkt * np.int64(0x9E3779B1) + tblc) % np.int64(64)) \
            .astype(np.int32)  # coarse co-location (see MinHasher)
        return pd.DataFrame(
            {"part": part, "tbl": rows_tbl, "bucket": rows_bkt,
             id_col: rows_id}
        )

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(["tbl", "bucket"], keep=False)]
        if g.empty:
            return pd.DataFrame({"id_a": [], "id_b": []})
        a_out, b_out = [], []
        for _k, sub in g.groupby(["tbl", "bucket"], sort=False):
            ids = np.unique(sub[id_col].to_numpy())
            if len(ids) < 2:
                continue
            ii, kk = np.triu_indices(len(ids), k=1)
            a_out.append(ids[ii])
            b_out.append(ids[kk])
        if not a_out:
            return pd.DataFrame({"id_a": [], "id_b": []})
        return pd.DataFrame({"id_a": np.concatenate(a_out),
                             "id_b": np.concatenate(b_out)})

    exploded = ds.map_batches(bucketize, batch_format="pandas")
    cand = exploded.groupby("part").map_groups(
        pairs_part, batch_format="pandas")

    def unit_rows(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df[vec_col].to_numpy()).astype(np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = (vecs / np.maximum(norms, 1e-12)).astype(np.float32)
        ids = df[id_col].to_numpy()
        return pd.DataFrame(
            {
                id_col: ids,
                "id_a": ids,  # dummies keep the union schema uniform
                "id_b": ids,
                "payload": [unit[i].tobytes() for i in range(len(df))],
                "pcol": [""] * len(df),
                "kind": ["d"] * len(df),
            }
        )

    def cosine_pair(g: pd.DataFrame) -> pd.DataFrame | None:
        va = np.frombuffer(g["payload"].iloc[0], dtype=np.float32)
        vb = np.frombuffer(g["payload"].iloc[1], dtype=np.float32)
        cos = float(va @ vb)
        if cos < threshold:
            return None
        return pd.DataFrame(
            {
                "id_a": [g["id_a"].iloc[0]],
                "id_b": [g["id_b"].iloc[0]],
                "cosine": [round(cos, 6)],
            }
        )

    return _colocate_pairs(ds.select_columns([id_col, vec_col]), cand,
                           unit_rows, cosine_pair, id_col,
                           ["id_a", "id_b", "cosine"])


# ---------------------------------------------------------------------------
# near-dup clusters: connected components over the pair edge list
# ---------------------------------------------------------------------------


def connected_components(
    pairs: "ray.data.Dataset",
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nparts: int = 64,
    max_rounds: int = 50,
) -> "ray.data.Dataset":
    """Label every document that appears in a near-dup pair with its
    component's minimum id: ``(doc_id, cluster_id)`` rows.

    Real dedup pipelines need clusters, not pairs — A~B and B~C must
    collapse to ONE survivor even when A~C was never emitted. This is the
    alternating **large-star / small-star** algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — the public
    MapReduce-era formulation), expressed as Ray Data groupbys:

    - large-star: for each node, hook every strictly-larger neighbour to
      the minimum of its neighbourhood (incl. itself);
    - small-star: orient edges large->small, hook the node and its smaller
      neighbours to the neighbourhood minimum;
    - converged when the edge set reaches a fixed point: a star forest
      with every member pointing at its component minimum. O(log^2 n)
      rounds proven, 2-5 in practice for near-dup-sized components.

    Scale shape: the only shuffled payload is two int64s per edge; each
    per-node neighbourhood reduction co-locates under ONE coarse
    ``hash(node) % nparts`` key with a local vectorized pandas groupby
    (same pattern as ``_colocate_pairs``); per-round edge sets are
    materialized (bounded by the pair count, i.e. tiny relative to the
    corpus) so the driver loop holds only a per-round signature scalar.
    Hot components bound group size by component size, which near-dup
    clustering keeps small by construction.
    """

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        a = df[id_a].to_numpy()
        b = df[id_b].to_numpy()
        u = np.maximum(a, b)
        v = np.minimum(a, b)
        keep = u != v
        return pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()

    def large_sym(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy()
        v = df["v"].to_numpy()
        out = pd.DataFrame(
            {"a": np.concatenate([u, v]), "b": np.concatenate([v, u])}
        )
        out["part"] = _hash_mod(out["a"], nparts)
        return out

    def large_part(g: pd.DataFrame) -> pd.DataFrame:
        # m(a) = min(neighbourhood(a) + {a}); hook larger neighbours to it
        m = g.groupby("a")["b"].min()
        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        ma = np.minimum(m.reindex(a).to_numpy(), a)
        mask = b > a
        out = pd.DataFrame({"u": b[mask], "v": ma[mask]})
        return out[out["u"] != out["v"]].drop_duplicates()

    def small_prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = _hash_mod(df["u"], nparts)
        return df

    def small_part(g: pd.DataFrame) -> pd.DataFrame:
        # edges arrive oriented u > v; m(u) = min of u's small neighbours
        m = g.groupby("u")["v"].min()
        mu = m.reindex(g["u"]).to_numpy()
        v = g["v"].to_numpy()
        mask = v != mu
        hooked = pd.DataFrame({"u": v[mask], "v": mu[mask]})
        centers = m.reset_index().rename(columns={"v": "m"})
        own = pd.DataFrame({"u": centers["u"], "v": centers["m"]})
        out = pd.concat([hooked, own], ignore_index=True)
        return out[out["u"] != out["v"]].drop_duplicates()

    def signature(edges: "ray.data.Dataset") -> tuple[int, int]:
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            u = df["u"].to_numpy(dtype=np.uint64)
            v = df["v"].to_numpy(dtype=np.uint64)
            mix = (u * np.uint64(0x9E3779B97F4A7C15)) ^ (
                v * np.uint64(0xC2B2AE3D27D4EB4F))
            return pd.DataFrame({"n": [len(df)],
                                 "h": [int(mix.sum(dtype=np.uint64))]})

        parts = edges.map_batches(partial, batch_format="pandas").take_all()
        n = sum(p["n"] for p in parts)
        h = 0
        for p in parts:
            h = (h + p["h"]) & 0xFFFFFFFFFFFFFFFF
        return n, h

    edges = pairs.map_batches(to_edges, batch_format="pandas").materialize()
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                          "cluster_id": pd.Series([], dtype=np.int64)})
    if edges.count() == 0:
        return ray.data.from_pandas(empty)

    prev = None
    for _ in range(max_rounds):
        edges = (
            edges.map_batches(large_sym, batch_format="pandas")
            .groupby("part")
            .map_groups(large_part, batch_format="pandas")
            .map_batches(small_prep, batch_format="pandas")
            .groupby("part")
            .map_groups(small_part, batch_format="pandas")
            .groupby(["u", "v"])
            .count()
            .drop_columns(["count()"])
            .materialize()
        )
        sig = signature(edges)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")

    def labels(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy()
        v = df["v"].to_numpy()
        return pd.DataFrame(
            {"doc_id": np.concatenate([u, v]),
             "cluster_id": np.concatenate([v, v])}
        ).drop_duplicates()

    return (
        edges.map_batches(labels, batch_format="pandas")
        .groupby(["doc_id", "cluster_id"])
        .count()
        .drop_columns(["count()"])
    )


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup: cluster-pruned embedding dedup)
# ---------------------------------------------------------------------------


def semantic_dedup(
    ds: "ray.data.Dataset",
    *,
    k: int = 16,
    threshold: float = 0.9,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk: int = 4096,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means partition
    the embedding space, then prune near-duplicates WITHIN each cluster
    only — the scale path for embedding dedup. Candidate generation
    costs one clustering pass instead of all-pairs or LSH bucket
    explosion, and the quadratic pairwise work is bounded per cluster
    (size k with the corpus: k ∝ n / target_cluster_size keeps
    per-cluster cost flat).

    Keep rule (the paper's, made fully deterministic): rows rank within
    their cluster by cosine similarity to the centroid ASCENDING (id
    tiebreak) — the least-centroid-like representative of every
    duplicate set survives; scanning in rank order, a row is dropped
    iff an already-KEPT row of its cluster has cosine ≥ ``threshold``
    with it (greedy leader clustering — no RNG anywhere: the k-means
    init is the hash-order farthest-point pick of ``clustering.py``,
    so the result is reproducible at any parallelism).

    Distribution shape: ONE streaming assign pass (centroids broadcast
    via ``ray.put``, unit vectors serialized per row), ONE
    groupby(cluster) shuffle co-locating each cluster, then the greedy
    scan runs vectorized inside ``map_groups`` — chunked (``chunk``
    rows at a time against the survivor matrix) so peak memory is
    O(chunk × cluster_size) floats, never cluster_size².

    Returns the DROPPED rows ``(id_col, cluster, kept_id)`` — kept_id
    is the survivor that shadowed the row; survivors = anti-join on
    ``id_col``.
    """
    import ray

    from .clustering import kmeans

    _, centroids, _ = kmeans(ds, k=k, iters=iters, vec_col=vec_col,
                             id_col=id_col)
    cunit = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    c_ref = ray.put((centroids, cunit))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        craw, cu = ray.get(c_ref)
        x = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        # same assignment rule as clustering.py: euclidean argmin on raw
        d2 = -2.0 * (x @ craw.T) + (craw * craw).sum(axis=1)[None, :]
        a = np.argmin(d2, axis=1)
        unit = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                              1e-12)
        ccos = (unit * cu[a]).sum(axis=1)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": a.astype(np.int64),
            "ccos": ccos,
            "u": [unit[i].astype(np.float32).tobytes()
                  for i in range(len(df))],
        })

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g[id_col].to_numpy(), g["ccos"].to_numpy()))
        g = g.iloc[order]
        ids = g[id_col].to_numpy()
        x = np.stack([np.frombuffer(b, dtype=np.float32)
                      for b in g["u"]]).astype(np.float64)
        m = len(g)
        kept: list[int] = []
        drop_i: list[int] = []
        drop_by: list[int] = []
        for lo in range(0, m, chunk):
            hi = min(lo + chunk, m)
            block = x[lo:hi]
            if kept:
                sims = block @ x[kept].T          # (b, n_kept)
                best = sims.max(axis=1)
                arg = sims.argmax(axis=1)
            else:
                best = np.full(hi - lo, -2.0)
                arg = np.zeros(hi - lo, dtype=np.int64)
            new_in_block: list[int] = []
            for j in range(hi - lo):
                i = lo + j
                bb, aa = best[j], arg[j]
                if new_in_block:
                    s2 = x[new_in_block] @ x[i]
                    j2 = int(np.argmax(s2))
                    if s2[j2] > bb:
                        bb, aa = s2[j2], -(j2 + 1)  # index into new_in_block
                if bb >= threshold:
                    drop_i.append(i)
                    drop_by.append(new_in_block[-aa - 1] if aa < 0
                                   else kept[aa])
                else:
                    new_in_block.append(i)
            kept.extend(new_in_block)
        return pd.DataFrame({
            id_col: ids[drop_i] if drop_i else np.array([], ids.dtype),
            "cluster": np.asarray(
                [g["cluster"].iloc[0]] * len(drop_i), np.int64),
            "kept_id": (ids[drop_by] if drop_by
                        else np.array([], ids.dtype)),
        })

    return (ds.select_columns([id_col, vec_col])
            .map_batches(assign, batch_format="pandas")
            .groupby("cluster")
            .map_groups(prune, batch_format="pandas"))
