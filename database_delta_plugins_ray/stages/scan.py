"""Ordered-scan primitives: global window functions (running aggregates
over a total order) without a global sort barrier.

The classic distributed prefix-scan shape:

  pass 1: range-bucket each row by its sort key (bucket order == key
          order, unlike a hash bucket) and reduce per-bucket partial
          aggregates inside ``map_batches`` — <= nbuckets rows leave
          each batch;
  driver: prefix-combine nbuckets partials into per-bucket base values
          (an 8 KB table, broadcast in the task closure);
  pass 2: ONE bucket shuffle; each task sorts only its own bucket,
          scans it locally, and offsets by the bucket's base.

``SUM(x) OVER (ORDER BY k)`` over 10^10 rows thus costs one small
partial pass + one bucket-local sort — no global sort, no sequential
driver scan. Same family as ``stages/sample.py:hash_rank`` (rank is the
COUNT(*) instance of this scan) and the exact percentile histogram.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["ordered_cumsum"]


def ordered_cumsum(ds, *, order_col: str, tiebreak_col: str,
                   value_col: str, nbuckets: int = 64):
    """Exact running sum of ``value_col`` (int64) over the total order
    ``(order_col, tiebreak_col)``. Returns the input rows plus
    ``running_total``. ``order_col`` may be numeric or timestamp;
    values are bucketed by uniform range between the global min/max
    (rank correctness does not depend on uniformity — skewed buckets
    only cost balance, and pass 2's per-bucket load is bounded by the
    densest value range)."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    stats = ds.aggregate(Min(order_col), Max(order_col))

    def _scalar_int(x) -> np.int64:
        if isinstance(x, (int, float, np.integer, np.floating)):
            return np.int64(x)
        if isinstance(x, np.datetime64):
            return x.astype("datetime64[us]").astype(np.int64)
        # pd.Timestamp / datetime.datetime — ns value to us
        return np.int64(pd.Timestamp(x).value // 1000)

    lo_i = _scalar_int(stats[f"min({order_col})"])
    hi_i = _scalar_int(stats[f"max({order_col})"])
    span = max(int(hi_i - lo_i) + 1, 1)
    width = max(span // nbuckets + 1, 1)

    def _key_ints(df: pd.DataFrame) -> np.ndarray:
        k = df[order_col]
        if np.issubdtype(k.dtype, np.datetime64):
            return (k.to_numpy().astype("datetime64[us]")
                    .astype(np.int64))
        return k.to_numpy().astype(np.int64)

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        ki = _key_ints(df)
        out = df.copy()
        out["__b"] = np.clip((ki - lo_i) // width, 0,
                             nbuckets - 1).astype(np.int32)
        return out

    def bucket_sums(df: pd.DataFrame) -> pd.DataFrame:
        ki = _key_ints(df)
        b = np.clip((ki - lo_i) // width, 0, nbuckets - 1).astype(np.int64)
        s = np.zeros(nbuckets, dtype=np.int64)
        np.add.at(s, b, df[value_col].to_numpy().astype(np.int64))
        present = np.flatnonzero(s != 0)
        # zero-sum buckets carry no offset information; dropping them
        # keeps partials sparse without affecting the prefix
        return pd.DataFrame({"__b": present, "s": s[present]})

    partials = (ds.map_batches(bucket_sums, batch_format="pandas")
                .groupby("__b").aggregate(Sum("s", alias_name="s"))
                .to_pandas())
    base = np.zeros(nbuckets, dtype=np.int64)
    if len(partials):
        bs = partials["__b"].to_numpy()
        ss = partials["s"].to_numpy()
        order = np.argsort(bs)
        sums_by_bucket = np.zeros(nbuckets, dtype=np.int64)
        sums_by_bucket[bs[order]] = ss[order]
        base = np.cumsum(sums_by_bucket) - sums_by_bucket

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ki = _key_ints(g)
        o = np.lexsort((g[tiebreak_col].to_numpy(), ki))
        vals = g[value_col].to_numpy().astype(np.int64)[o]
        run = np.cumsum(vals) + base[int(g["__b"].iloc[0])]
        out = g.iloc[o].drop(columns="__b").reset_index(drop=True)
        out["running_total"] = run
        return out

    return (ds.map_batches(bucketed, batch_format="pandas")
            .groupby("__b").map_groups(scan_bucket, batch_format="pandas"))
