"""Deterministic sampling / corpus-mix operators for training-data
pipelines.

Two web-scale-shaped primitives:

- ``hash_sample``: stratified Bernoulli sampling by a DETERMINISTIC
  per-row hash — embarrassingly parallel (a pure ``map_batches`` filter,
  no shuffle, no RNG state), reproducible across reruns/resumes, and
  exactly expressible in SQL (DuckDB ``md5_number_lower``) so the driver
  oracle gates it value-for-value. This is the canonical way to cut a
  10^9-document corpus to a target mix: every worker decides membership
  locally from (id, stratum rate) alone.

- ``token_budget_mix``: select documents per stratum (language/domain)
  in deterministic ``id`` order until a token budget is exhausted — the
  "fill each language's share of the training mix" step. The naive
  formulation is a per-stratum running cumulative sum (inherently
  sequential over billions of rows); this implementation is the
  two-pass threshold form that scales:

    pass 1: partial token sums per (stratum, id-bucket) inside
            ``map_batches`` -> tiny ``groupby`` -> the driver sees only
            O(strata x buckets) rows, sorts each stratum's buckets and
            locates the boundary bucket where the budget is crossed;
    pass 2: only the boundary buckets (bounded by strata x bucket_width
            rows) are re-read to find the exact cutoff id within them;
    final:  a pure broadcast filter — include a row iff its bucket is
            before the stratum's boundary, or it is in the boundary
            bucket at-or-before the cutoff id.

  No all-to-all shuffle touches the corpus; the only data that reaches
  the driver is the bucket summary and the boundary buckets.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Mapping

import numpy as np
import pandas as pd

import ray.data
from ray.data.aggregate import Sum


def md5_u64(ids: np.ndarray) -> np.ndarray:
    """uint64 per id: little-endian of the LAST 8 bytes of
    md5(str(id)) — bit-identical to DuckDB's ``md5_number_lower``
    (verified against duckdb 1.0). Hashing is per-item by nature;
    ``fromiter`` keeps Python overhead to the md5 call itself (same
    pattern as the oracled exact-dedup / fingerprint kernels)."""
    return np.fromiter(
        (
            struct.unpack("<Q", hashlib.md5(str(i).encode()).digest()[8:])[0]
            for i in ids
        ),
        dtype=np.uint64,
        count=len(ids),
    )


def hash_sample(
    ds: "ray.data.Dataset",
    *,
    id_col: str,
    stratum_col: str,
    rates: Mapping[str, int],
    default_rate: int,
    denom: int = 1000,
) -> "ray.data.Dataset":
    """Keep a row iff ``md5_u64(id) % denom < rates[stratum]``.

    ``rates`` maps stratum value -> per-mille (when ``denom=1000``)
    keep rate. The rate table is a small broadcast constant captured in
    the task closure (shipped once per task spec, not per batch).

    Arrow-native: the mask is computed from the two key columns only and
    applied with ``Table.filter`` — payload columns (document text
    riding along to later stages) never convert to Python object
    cells."""
    import pyarrow as pa

    rate_map = dict(rates)

    def keep(t: "pa.Table") -> "pa.Table":
        h = md5_u64(t[id_col].to_numpy(zero_copy_only=False)) \
            % np.uint64(denom)
        strat = t[stratum_col].to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(strat)
        lim = np.array([rate_map.get(u, default_rate) for u in uniques],
                       dtype=np.uint64)
        return t.filter(pa.array(h < lim[codes]))

    return ds.map_batches(keep, batch_format="pyarrow")


def token_budget_mix(
    ds: "ray.data.Dataset",
    *,
    id_col: str,
    stratum_col: str,
    weight_fn,
    budget: int,
    bucket_width: int = 64,
) -> "ray.data.Dataset":
    """Per-stratum prefix selection in ``id_col`` order: include a row
    iff the running sum of ``weight_fn`` (ordered by id within the
    stratum) is still ``<= budget`` after adding it.

    ``weight_fn(df) -> int64 ndarray`` computes the per-row weight
    (e.g. token count) and is evaluated VECTORIZED in every pass.
    See module docstring for the two-pass threshold design; driver
    memory is O(strata x n_buckets) + O(strata x bucket_width)."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        w = weight_fn(df)
        g = pd.DataFrame(
            {
                "stratum": df[stratum_col].to_numpy(),
                "bucket": df[id_col].to_numpy() // bucket_width,
                "w": w,
            }
        )
        return g.groupby(["stratum", "bucket"], as_index=False)["w"].sum()

    summary = (
        ds.map_batches(partials, batch_format="pandas")
        .groupby(["stratum", "bucket"])
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()  # O(strata x buckets) rows — tiny by construction
    )

    # Driver: per stratum, cumulative bucket sums -> boundary bucket
    # (first bucket whose inclusion overshoots the budget) + the budget
    # remaining when entering it.
    full_before = {}  # stratum -> bucket strictly-below which all rows keep
    boundary = {}  # stratum -> (boundary_bucket, remaining_budget)
    for stratum, g in summary.groupby("stratum"):
        g = g.sort_values("bucket")
        cum = g["w"].cumsum()
        over = cum > budget
        if not over.any():
            full_before[stratum] = int(g["bucket"].max()) + 1
            continue
        i = int(np.argmax(over.to_numpy()))
        full_before[stratum] = int(g["bucket"].iloc[i])
        prior = int(cum.iloc[i - 1]) if i > 0 else 0
        boundary[stratum] = (int(g["bucket"].iloc[i]), budget - prior)

    # Pass 2: exact cutoff id inside each boundary bucket. The filter
    # touches only strata-count buckets of <= bucket_width rows each.
    cutoff = {}  # stratum -> max id included within the boundary bucket
    if boundary:
        bset = {(s, b) for s, (b, _) in boundary.items()}

        def only_boundary(df: pd.DataFrame) -> pd.DataFrame:
            key = list(
                zip(df[stratum_col], df[id_col].to_numpy() // bucket_width)
            )
            mask = np.fromiter(
                (k in bset for k in key), dtype=bool, count=len(df)
            )
            out = df[mask]
            w = weight_fn(out)
            return pd.DataFrame(
                {
                    "stratum": out[stratum_col].to_numpy(),
                    "id": out[id_col].to_numpy(),
                    "w": w,
                }
            )

        rows = (
            ds.map_batches(only_boundary, batch_format="pandas")
            .to_pandas()  # <= strata x bucket_width rows
        )
        for stratum, g in rows.groupby("stratum"):
            g = g.sort_values("id")
            cum = g["w"].cumsum().to_numpy()
            _, rem = boundary[stratum]
            ok = cum <= rem
            if ok.any():
                cutoff[stratum] = int(g["id"].to_numpy()[ok.argmin() - 1] if not ok.all() else g["id"].to_numpy()[-1])
            # else: no row of the boundary bucket fits — cutoff absent

    def final_filter(df: pd.DataFrame) -> pd.DataFrame:
        strata = df[stratum_col].to_numpy()
        ids = df[id_col].to_numpy()
        buckets = ids // bucket_width
        fb = np.fromiter(
            (full_before.get(s, 0) for s in strata),
            dtype=np.int64,
            count=len(df),
        )
        keep = buckets < fb
        if cutoff:
            co = np.fromiter(
                (cutoff.get(s, -1) for s in strata),
                dtype=np.int64,
                count=len(df),
            )
            keep |= (buckets == fb) & (ids <= co)
        return df[keep]

    return ds.map_batches(final_filter, batch_format="pandas")


def hash_rank(ds, id_col: str = "doc_id", nbuckets: int = 1024):
    """Deterministic pseudo-random GLOBAL rank (the "shuffled training
    export" order) without a global sort barrier.

    Rank of a row = its position in ascending ``(md5_u64(id), id)``
    order — i.e. a seeded full-corpus shuffle expressible in SQL as
    ``row_number() OVER (ORDER BY md5_number_lower(id), id) - 1``.

    Scale plan (the histogram-rank trick, same family as the exact
    percentiles): the hash is uniform, so its top ``log2(nbuckets)``
    bits range-partition it evenly.

      pass 1: per-bucket row counts as map_batches PARTIALS (<= nbuckets
              (b, n) rows leave each batch — no row-level shuffle) ->
              tiny groupby -> the driver prefix-sums nbuckets integers
              and broadcasts an 8 KB base-offset table in the task
              closure;
      pass 2: ONE bucket shuffle; each task sorts only its bucket
              locally and adds the bucket's base offset.

    No stage ever holds more than |corpus| / nbuckets rows, and the only
    all-to-all moves (id, hash) pairs — at 10^10 rows and nbuckets=2^14
    that is ~160 MB per task. The md5 hash is computed once per pass
    (twice total): recomputing 8 bytes/row beats materializing the
    hashed corpus between passes.
    """
    from ray.data.aggregate import Sum

    if nbuckets & (nbuckets - 1):
        raise ValueError("nbuckets must be a power of two")
    shift = np.uint64(64 - int(np.log2(nbuckets)))

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_u64(df[id_col].to_numpy())
        n = np.bincount((h >> shift).astype(np.int64), minlength=nbuckets)
        present = np.flatnonzero(n)
        return pd.DataFrame({"b": present, "n": n[present]})

    counts = (ds.map_batches(bucket_counts, batch_format="pandas")
              .groupby("b").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    base = np.zeros(nbuckets, dtype=np.int64)
    bs = counts["b"].to_numpy()
    ns = counts["n"].to_numpy()
    order = np.argsort(bs)
    base[bs[order]] = np.cumsum(ns[order]) - ns[order]

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_u64(df[id_col].to_numpy())
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "h": h,
            "b": (h >> shift).astype(np.int64),
        })

    rows = ds.map_batches(bucketed, batch_format="pandas")

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((g[id_col].to_numpy(), g["h"].to_numpy()))
        r = np.empty(len(g), dtype=np.int64)
        r[o] = base[int(g["b"].iloc[0])] + np.arange(len(g), dtype=np.int64)
        return pd.DataFrame({id_col: g[id_col].to_numpy(), "rank": r})

    return rows.groupby("b").map_groups(rank_bucket, batch_format="pandas")


def weighted_hash_sample(
    ds: "ray.data.Dataset",
    *,
    id_col: str,
    weight_fn,
    num: int = 1,
    den: int = 1,
    denom: int = 1000,
) -> "ray.data.Dataset":
    """Weight-proportional deterministic Bernoulli sample: keep a row
    iff ``(md5_u64(id) % denom) * den < weight * num`` — inclusion
    probability ``min(1, weight*num/(den*denom))``, proportional to the
    per-row weight (capped at 1). The comparison cross-multiplies in
    integer space, so there is no float rounding to drift from the SQL
    oracle. Same scale properties as ``hash_sample``: a pure
    ``map_batches`` filter — no shuffle, no RNG state, identical at any
    parallelism and across resume; this is the "sample by token/byte
    mass" shape used to build mixture corpora where long documents
    should carry proportionally more selection weight.

    ``weight_fn(batch) -> int64 ndarray`` computes the per-row weight
    vectorized from the PYARROW batch (e.g. ``pc.utf8_length`` for a
    character count) — the stage is Arrow-native end to end, so payload
    columns pass through ``Table.filter`` without a pandas object
    copy."""
    import pyarrow as pa

    def keep(t: "pa.Table") -> "pa.Table":
        h = md5_u64(t[id_col].to_numpy(zero_copy_only=False)) \
            % np.uint64(denom)
        w = np.asarray(weight_fn(t), dtype=np.int64)
        return t.filter(pa.array(h.astype(np.int64) * den < w * num))

    return ds.map_batches(keep, batch_format="pyarrow")


def temperature_quota_sample(ds, *, budget: int, group_col: str,
                             id_col: str):
    """Temperature-based domain mixing at τ=2 (p_group ∝ count^0.5 —
    the mT5/XLM-R rebalancing rule): small groups are upweighted
    relative to their raw share; the total draw hits ``budget`` (minus
    floor losses). Quotas derive EXACTLY in both engines: weight =
    floor(sqrt(n)·2^20) — IEEE sqrt is correctly rounded and the 2^20
    scale is a power of two, so the floor lands identically in numpy /
    Python and DuckDB — then quota = (budget·weight) // Σweights in
    pure integer math. Selection is the fixed-count stratified rule:
    each group keeps its quota smallest (md5(id), id) rows. One tiny
    count groupby + one partial-top-N exchange (≤ batches × groups ×
    max-quota rows), never the corpus."""
    import math

    counts = ds.groupby(group_col).count().to_pandas()
    counts = counts.rename(columns={"count()": "n"})
    wgt = {s: int(math.floor(math.sqrt(float(n)) * (1 << 20)))
           for s, n in zip(counts[group_col], counts["n"])}
    tw = sum(wgt.values())
    quota = {s: (budget * w) // tw for s, w in wgt.items()}
    qmax = max(quota.values(), default=0)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_u64(df[id_col].to_numpy())
        return (pd.DataFrame({id_col: df[id_col],
                              group_col: df[group_col], "h": h})
                .sort_values(["h", id_col])
                .groupby(group_col, sort=False).head(qmax))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        q = quota.get(g[group_col].iloc[0], 0)
        g = g.sort_values(["h", id_col]).head(q)
        return g[[id_col, group_col]]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(group_col)
            .map_groups(finish, batch_format="pandas"))


# ---------------------------------------------------------------------------
# DSIR: Data Selection with Importance Resampling (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling",
# arXiv:2302.03169) — hashed-n-gram importance weights toward a target
# domain, then Gumbel-top-k resampling (= sampling without replacement
# proportional to the importance weight).
#
# Everything cross-batch is INTEGER: feature counts fold as int64
# bincounts; the log-ratio vector is quantized to 2^20 fixed point
# before it touches a document, so per-document scores are exact int64
# segment sums — bit-identical at any parallelism (the same fixed-point
# discipline as the temperature-mixing and classifier ops).
# ---------------------------------------------------------------------------

#: fixed-point scale for DSIR log-ratio quantization (2^20, as in
#: temperature_quota_sample — powers of two round identically everywhere)
DSIR_FP = 1 << 20


def dsir_token_buckets(texts: pd.Series, d: int):
    """Hashed unigram+bigram feature stream of a batch: ``(bucket
    int64 array, doc_idx int64 array)`` — the DSIR paper's hashed
    n-gram featurization (§3.1, they use d=10^4). One hash pass over
    the shared lowercase tokenization; bigrams combine with the gram
    multiplier and never cross documents."""
    from ..functions.text import _GRAM_HASH_KEY, _GRAM_P, _flat_lower_tokens

    flat, di, _ = _flat_lower_tokens(texts)
    if not len(flat):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    th = pd.util.hash_array(flat, hash_key=_GRAM_HASH_KEY)
    b1 = (th % np.uint64(d)).astype(np.int64)
    parts = [b1]
    idxs = [di]
    if len(flat) > 1:
        m = len(flat) - 1
        valid = di[:m] == di[1:]
        h2 = (th[:m] * _GRAM_P + th[1:]) % np.uint64(d)
        parts.append(h2[valid].astype(np.int64))
        idxs.append(di[:m][valid])
    return np.concatenate(parts), np.concatenate(idxs)


def dsir_fold_counts(ds, *, text_col: str, target_expr, d: int):
    """ONE pass over the corpus producing two d-bucket int64 count
    vectors: the TARGET domain's hashed-feature counts and the full
    corpus (raw) counts. Per batch the partial is two d-long bincounts
    (O(d) ints, independent of rows — the histogram-fold pattern);
    the driver sums batches × 2 vectors. ``target_expr(df) -> bool
    mask`` defines the target domain."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].reset_index(drop=True)
        b, di = dsir_token_buckets(texts, d)
        raw = np.bincount(b, minlength=d).astype(np.int64)
        mask = np.asarray(target_expr(df), dtype=bool)
        tgt = (np.bincount(b[mask[di]], minlength=d).astype(np.int64)
               if mask.any() else np.zeros(d, np.int64))
        return pd.DataFrame({"tgt": [tgt.tobytes()],
                             "raw": [raw.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    tgt = np.zeros(d, np.int64)
    raw = np.zeros(d, np.int64)
    for tb, rb in zip(parts["tgt"], parts["raw"]):
        tgt += np.frombuffer(tb, dtype=np.int64)
        raw += np.frombuffer(rb, dtype=np.int64)
    return tgt, raw


def dsir_logratio_fp(tgt: np.ndarray, raw: np.ndarray) -> np.ndarray:
    """Quantized per-bucket importance log-ratio: ``round(2^20 ·
    (log p̂_tgt[k] − log p̂_raw[k]))`` with add-one smoothing on both
    estimates. int64; every downstream use is integer arithmetic."""
    d = len(tgt)
    lp_t = np.log(tgt + 1.0) - np.log(float(tgt.sum() + d))
    lp_r = np.log(raw + 1.0) - np.log(float(raw.sum() + d))
    return np.rint((lp_t - lp_r) * DSIR_FP).astype(np.int64)


def dsir_gumbel_fp(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-document Gumbel noise in 2^20 fixed point:
    ``u = (md5_u64(id) + 0.5) / 2^64`` → ``round(2^20·(−log(−log u)))``.
    A pure function of the id — reproducible across reruns, resumes
    and parallelism, like every sampler in this module."""
    u = (md5_u64(ids).astype(np.float64) + 0.5) / float(1 << 64)
    return np.rint(-np.log(-np.log(u)) * DSIR_FP).astype(np.int64)


def dsir_select(ds, *, text_col: str, id_col: str, target_expr,
                k: int, d: int = 4096, keep_cols: tuple = ()):
    """DSIR end to end: fold target/raw hashed-feature counts, quantize
    the log-ratio, broadcast it once via ``ray.put``, score every
    document with one exact int64 segment-sum pass (``logweight_fp``),
    add deterministic Gumbel noise and keep the global top-k by the
    perturbed score (= sample-without-replacement ∝ importance weight).
    A per-batch top-k partial bounds the exchange to k rows per batch;
    the driver folds batches × k candidate rows, never the corpus.

    Returns a pandas frame ``(id_col, *keep_cols, logweight_fp,
    gumbel_score_fp)`` sorted by ``(-gumbel_score_fp, id_col)``."""
    import ray

    tgt, raw = dsir_fold_counts(ds, text_col=text_col,
                                target_expr=target_expr, d=d)
    r_ref = ray.put(dsir_logratio_fp(tgt, raw))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        rfp = ray.get(r_ref)
        texts = df[text_col].reset_index(drop=True)
        b, di = dsir_token_buckets(texts, d)
        lw = np.zeros(len(df), np.int64)
        np.add.at(lw, di, rfp[b])
        ids = df[id_col].to_numpy()
        out = pd.DataFrame({id_col: ids})
        for c in keep_cols:
            out[c] = df[c].to_numpy()
        out["logweight_fp"] = lw
        out["gumbel_score_fp"] = lw + dsir_gumbel_fp(ids)
        return (out.sort_values(["gumbel_score_fp", id_col],
                                ascending=[False, True]).head(k))

    cand = ds.map_batches(score, batch_format="pandas").to_pandas()
    return (cand.sort_values(["gumbel_score_fp", id_col],
                             ascending=[False, True])
            .head(k).reset_index(drop=True))
