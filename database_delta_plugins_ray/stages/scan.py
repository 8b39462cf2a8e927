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

__all__ = ["ordered_cumsum", "ordered_moving_sum"]


_SIGN = np.uint64(1) << np.uint64(63)


def _order_u64(a: np.ndarray) -> np.ndarray:
    """Map a sort-key array to uint64 PRESERVING ORDER exactly: ints and
    datetimes wrap-shift by 2^63; finite floats use the IEEE-754
    monotone bit transform (flip all bits of negatives, set the sign
    bit of non-negatives). uint64 keys make all downstream bucket
    arithmetic overflow-free (u >= global min always), which int64
    keys spanning the full range cannot guarantee."""
    if np.issubdtype(a.dtype, np.datetime64):
        i64 = a.astype("datetime64[us]").astype(np.int64)
        return i64.view(np.uint64) + _SIGN  # wrapping, monotone
    if np.issubdtype(a.dtype, np.floating):
        bits = np.ascontiguousarray(a, dtype=np.float64).view(np.uint64)
        return np.where(bits & _SIGN != 0, ~bits, bits | _SIGN)
    if np.issubdtype(a.dtype, np.unsignedinteger):
        # the scalar path (driver-side Min/Max) cannot distinguish a
        # uint64 value from an int64 one, so unsigned keys would map
        # inconsistently between passes — callers wrap-shift instead:
        # (u + 2^63).view(int64) is order-isomorphic
        raise TypeError(
            "unsigned order_col unsupported: wrap-shift to int64 first "
            "((x + 2**63).view(int64) preserves order)")
    return a.astype(np.int64).view(np.uint64) + _SIGN


def _scalar_order_u64(x) -> np.uint64:
    if isinstance(x, np.datetime64):
        return _order_u64(np.array([x], dtype="datetime64[us]"))[0]
    if isinstance(x, (float, np.floating)):
        return _order_u64(np.array([x], dtype=np.float64))[0]
    if isinstance(x, (int, np.integer)):
        return np.int64(x).view(np.uint64) + _SIGN
    # pd.Timestamp / datetime.datetime — ns value to us
    return (np.int64(pd.Timestamp(x).value // 1000).view(np.uint64)
            + _SIGN)


def _key_ints(df: pd.DataFrame, order_col: str) -> np.ndarray:
    return _order_u64(df[order_col].to_numpy())


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
    lo_u = _scalar_order_u64(stats[f"min({order_col})"])
    hi_u = _scalar_order_u64(stats[f"max({order_col})"])
    span = max(int(hi_u - lo_u) + 1, 1)
    width = np.uint64(max(span // nbuckets + 1, 1))

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        ki = _key_ints(df, order_col)
        out = df.copy()
        out["__b"] = np.minimum((ki - lo_u) // width,
                                np.uint64(nbuckets - 1)).astype(np.int32)
        return out

    def bucket_sums(df: pd.DataFrame) -> pd.DataFrame:
        ki = _key_ints(df, order_col)
        b = np.minimum((ki - lo_u) // width,
                       np.uint64(nbuckets - 1)).astype(np.int64)
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
        ki = _key_ints(g, order_col)
        o = np.lexsort((g[tiebreak_col].to_numpy(), ki))
        vals = g[value_col].to_numpy().astype(np.int64)[o]
        run = np.cumsum(vals) + base[int(g["__b"].iloc[0])]
        out = g.iloc[o].drop(columns="__b").reset_index(drop=True)
        out["running_total"] = run
        return out

    return (ds.map_batches(bucketed, batch_format="pandas")
            .groupby("__b").map_groups(scan_bucket, batch_format="pandas"))


def ordered_moving_sum(ds, *, order_col: str, tiebreak_col: str,
                       value_col: str, window: int, nbuckets: int = 64):
    """Exact sliding-window sum (``SUM(v) OVER (ORDER BY ... ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW)``) with ONE bucket
    shuffle. The cross-bucket dependency — each bucket needs the last
    ``window-1`` rows of everything before it — is resolved by a
    driver-sized side channel, not a second all-to-all:

      carry pass: per-batch partial top-``window-1`` rows PER BUCKET by
          sort key (a valid partial: the global bucket tail is the
          top-k of the per-batch top-k candidates) -> the driver keeps
          nbuckets x window rows and assembles each bucket's carry by
          walking earlier buckets' tails backwards;
      scan pass:  the one bucket shuffle; each task prepends its
          broadcast carry, computes the sliding sum vectorized
          (cumsum minus shifted cumsum), and emits only its own rows.
    """
    import ray
    from ray.data.aggregate import Max, Min

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    stats_cols = [order_col, tiebreak_col, value_col]
    k = window - 1  # rows carried from the past

    stats = ds.aggregate(Min(order_col), Max(order_col))
    lo_u = _scalar_order_u64(stats[f"min({order_col})"])
    hi_u = _scalar_order_u64(stats[f"max({order_col})"])
    span = max(int(hi_u - lo_u) + 1, 1)
    width = np.uint64(max(span // nbuckets + 1, 1))

    def _bucket(df: pd.DataFrame) -> np.ndarray:
        return np.minimum((_key_ints(df, order_col) - lo_u) // width,
                          np.uint64(nbuckets - 1)).astype(np.int32)

    def tail_partial(df: pd.DataFrame) -> pd.DataFrame:
        if k <= 0 or df.empty:
            return df.iloc[0:0][stats_cols].assign(
                __b=np.empty(0, np.int32))
        b = _bucket(df)
        out = df[stats_cols].copy()
        out["__b"] = b
        out["__k"] = _key_ints(df, order_col)
        # per-batch candidates: top-k rows of each bucket by sort key
        out = (out.sort_values(["__b", "__k", tiebreak_col])
               .groupby("__b", sort=False).tail(k))
        return out.drop(columns="__k")

    carry_map: dict[int, pd.DataFrame] = {}
    if k > 0:
        cand = (ds.map_batches(tail_partial, batch_format="pandas")
                .to_pandas())
        if len(cand):
            cand = cand.assign(
                __k=_key_ints(cand, order_col)).sort_values(
                ["__b", "__k", tiebreak_col])
            tails = {int(b): g.tail(k) for b, g in
                     cand.groupby("__b", sort=True)}
            for b in range(nbuckets):
                rows = []
                need = k
                for prev in range(b - 1, -1, -1):
                    t = tails.get(prev)
                    if t is None or t.empty:
                        continue
                    take = t.tail(need)
                    rows.append(take)
                    need -= len(take)
                    if need <= 0:
                        break
                if rows:
                    carry_map[b] = (pd.concat(rows[::-1])
                                    .drop(columns=["__b", "__k"]))

    carry_ref = ray.put(carry_map)

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = df[stats_cols].copy()
        out["__b"] = _bucket(df)
        return out

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__b"].iloc[0])
        carry = ray.get(carry_ref).get(b)
        body = g.drop(columns="__b")
        n_carry = 0 if carry is None else len(carry)
        full = body if n_carry == 0 else pd.concat(
            [carry, body], ignore_index=True)
        o = np.lexsort((full[tiebreak_col].to_numpy(),
                        _key_ints(full, order_col)))
        # carry rows all sort before body rows (strictly earlier keys),
        # except key ties across the bucket boundary — lexsort handles
        # both since the carry carries its real keys
        vals = full[value_col].to_numpy().astype(np.int64)[o]
        cs = np.cumsum(vals)
        shifted = np.concatenate((np.zeros(min(window, len(cs)),
                                           np.int64),
                                  cs[:-window] if len(cs) > window
                                  else np.empty(0, np.int64)))
        ms = cs - shifted
        out = full.iloc[o].reset_index(drop=True)
        out["moving_sum"] = ms
        return out.iloc[n_carry:].reset_index(drop=True)

    return (ds.map_batches(bucketed, batch_format="pandas")
            .groupby("__b").map_groups(scan_bucket, batch_format="pandas"))


def ordered_lag(ds, *, order_col: str, tiebreak_col: str,
                value_col: str, nbuckets: int = 64, sentinel: int = -1):
    """``LAG(v) OVER (ORDER BY ...)`` — previous row's value in the
    total order; the global first row gets ``sentinel``. Same one-
    shuffle shape as ``ordered_moving_sum`` with a single-row carry:
    each bucket receives the last row of everything before it through
    the driver-sized side channel (per-batch top-1-per-bucket partials,
    <= nbuckets rows each)."""
    import ray
    from ray.data.aggregate import Max, Min

    stats_cols = [order_col, tiebreak_col, value_col]
    stats = ds.aggregate(Min(order_col), Max(order_col))
    lo_u = _scalar_order_u64(stats[f"min({order_col})"])
    hi_u = _scalar_order_u64(stats[f"max({order_col})"])
    span = max(int(hi_u - lo_u) + 1, 1)
    width = np.uint64(max(span // nbuckets + 1, 1))

    def _bucket(df: pd.DataFrame) -> np.ndarray:
        return np.minimum((_key_ints(df, order_col) - lo_u) // width,
                          np.uint64(nbuckets - 1)).astype(np.int32)

    def tail1(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.iloc[0:0][stats_cols].assign(
                __b=np.empty(0, np.int32))
        out = df[stats_cols].copy()
        out["__b"] = _bucket(df)
        out["__k"] = _key_ints(df, order_col)
        out = (out.sort_values(["__b", "__k", tiebreak_col])
               .groupby("__b", sort=False).tail(1))
        return out.drop(columns="__k")

    cand = ds.map_batches(tail1, batch_format="pandas").to_pandas()
    carry_map: dict[int, tuple] = {}
    if len(cand):
        cand = cand.assign(
            __k=_key_ints(cand, order_col)).sort_values(
            ["__b", "__k", tiebreak_col])
        last_per_bucket = cand.groupby("__b", sort=True).tail(1)
        prev_val = None
        by_b = {int(r["__b"]): r for _, r in last_per_bucket.iterrows()}
        for b in range(nbuckets):
            if prev_val is not None:
                carry_map[b] = prev_val
            if b in by_b:
                r = by_b[b]
                prev_val = (r[order_col], r[tiebreak_col], r[value_col])

    carry_ref = ray.put(carry_map)

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = df[stats_cols].copy()
        out["__b"] = _bucket(df)
        return out

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__b"].iloc[0])
        carry = ray.get(carry_ref).get(b)
        body = g.drop(columns="__b")
        if carry is not None:
            body = pd.concat([pd.DataFrame(
                [dict(zip(stats_cols, carry))]), body],
                ignore_index=True)
        o = np.lexsort((body[tiebreak_col].to_numpy(),
                        _key_ints(body, order_col)))
        vals = body[value_col].to_numpy().astype(np.int64)[o]
        lag = np.concatenate(([np.int64(sentinel)], vals[:-1]))
        out = body.iloc[o].reset_index(drop=True)
        out["lag_value"] = lag
        return out.iloc[(1 if carry is not None else 0):].reset_index(
            drop=True)

    return (ds.map_batches(bucketed, batch_format="pandas")
            .groupby("__b").map_groups(scan_bucket, batch_format="pandas"))


def ordered_cummax(ds, *, order_col: str, tiebreak_col: str,
                   value_col: str, nbuckets: int = 64):
    """Running MAX over a total order (``MAX(v) OVER (ORDER BY ...)``),
    same one-shuffle range-bucket shape as ``ordered_cumsum``: bucket
    partial maxes -> driver prefix-max base table -> bucket-local
    cummax offset by the base. The streaming-watermark primitive:
    cummax of event-time over ARRIVAL order is the watermark at each
    event. ``value_col`` must be int64-representable (ints or
    timestamps)."""
    import ray
    from ray.data.aggregate import Max, Min

    stats = ds.aggregate(Min(order_col), Max(order_col))
    lo_u = _scalar_order_u64(stats[f"min({order_col})"])
    hi_u = _scalar_order_u64(stats[f"max({order_col})"])
    span = max(int(hi_u - lo_u) + 1, 1)
    width = np.uint64(max(span // nbuckets + 1, 1))
    int64_min = np.int64(np.iinfo(np.int64).min)

    def _vals(df: pd.DataFrame) -> np.ndarray:
        v = df[value_col]
        if np.issubdtype(v.dtype, np.datetime64):
            return v.to_numpy().astype("datetime64[us]").astype(np.int64)
        return v.to_numpy().astype(np.int64)

    def _bucket(df: pd.DataFrame) -> np.ndarray:
        return np.minimum((_key_ints(df, order_col) - lo_u) // width,
                          np.uint64(nbuckets - 1)).astype(np.int32)

    def bucket_maxes(df: pd.DataFrame) -> pd.DataFrame:
        b = _bucket(df).astype(np.int64)
        m = np.full(nbuckets, int64_min, dtype=np.int64)
        np.maximum.at(m, b, _vals(df))
        present = np.flatnonzero(m != int64_min)
        return pd.DataFrame({"__b": present, "m": m[present]})

    partials = (ds.map_batches(bucket_maxes, batch_format="pandas")
                .groupby("__b").aggregate(Max("m", alias_name="m"))
                .to_pandas())
    base = np.full(nbuckets, int64_min, dtype=np.int64)
    if len(partials):
        maxes = np.full(nbuckets, int64_min, dtype=np.int64)
        maxes[partials["__b"].to_numpy()] = partials["m"].to_numpy()
        # base[b] = max over buckets < b
        base[1:] = np.maximum.accumulate(maxes)[:-1]

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__b"] = _bucket(df)
        return out

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((g[tiebreak_col].to_numpy(),
                        _key_ints(g, order_col)))
        vals = _vals(g)[o]
        run = np.maximum(np.maximum.accumulate(vals),
                         base[int(g["__b"].iloc[0])])
        out = g.iloc[o].drop(columns="__b").reset_index(drop=True)
        out["running_max"] = run
        return out

    return (ds.map_batches(bucketed, batch_format="pandas")
            .groupby("__b").map_groups(scan_bucket, batch_format="pandas"))


def ordered_range_sum(ds, *, order_col: str, value_col: str,
                      span_units: int, nbuckets: int = 64):
    """Exact time-RANGE trailing-window sum — ``SUM(v) OVER (ORDER BY
    key RANGE BETWEEN span PRECEDING AND CURRENT ROW)`` — with ONE
    bucket shuffle and NO driver-side carry.

    RANGE frames differ from ROWS frames two ways: the window is a KEY
    interval ``[key - span, key]`` (variable row count), and peers
    (equal keys) are always in-frame together, so no tiebreak is
    needed. The cross-bucket dependency is solved by BOUNDARY
    REPLICATION instead of a carry side channel: bucket width is
    clamped to >= span, so a row's frame crosses at most ONE bucket
    boundary — rows within ``span`` of their bucket's end are emitted
    twice (once as their own bucket's member, once as the next
    bucket's context), each bucket sorts locally and answers every own
    row with two searchsorteds over its cumsum. Replication factor is
    bounded by span/width <= 1 extra copy — a constant, at any scale.

    ``span_units`` is in the key's native integer units (microseconds
    for timestamp columns — the order-isomorphic u64 mapping preserves
    differences)."""
    import ray
    from ray.data.aggregate import Max, Min

    if span_units < 0:
        raise ValueError("span_units must be >= 0")
    stats = ds.aggregate(Min(order_col), Max(order_col))
    lo_u = _scalar_order_u64(stats[f"min({order_col})"])
    hi_u = _scalar_order_u64(stats[f"max({order_col})"])
    total = max(int(hi_u - lo_u) + 1, 1)
    width = np.uint64(max(total // nbuckets + 1, int(span_units), 1))
    nb = int(np.uint64(total - 1) // width) + 1
    span = np.uint64(span_units)

    def scatter(df: pd.DataFrame) -> pd.DataFrame:
        ki = _key_ints(df, order_col)
        b = np.minimum((ki - lo_u) // width, np.uint64(nb - 1)).astype(
            np.int32)
        own = df.copy()
        own["__b"] = b
        own["__own"] = True
        # rows within span of their bucket's end also serve as the NEXT
        # bucket's context (their key may fall inside its rows' frames)
        nxt_start = lo_u + (b.astype(np.uint64) + np.uint64(1)) * width
        rep = (b < nb - 1) & (nxt_start - ki <= span)
        if rep.any():
            ctx = df.loc[rep].copy()
            ctx["__b"] = (b[rep] + 1).astype(np.int32)
            ctx["__own"] = False
            own = pd.concat([own, ctx], ignore_index=True)
        return own

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ki = _key_ints(g, order_col)
        o = np.argsort(ki, kind="stable")
        keys = ki[o]
        vals = g[value_col].to_numpy().astype(np.int64)[o]
        ownm = g["__own"].to_numpy()[o]
        cs = np.cumsum(vals)
        own_pos = np.flatnonzero(ownm)
        own_keys = keys[own_pos]
        right = np.searchsorted(keys, own_keys, side="right")
        left = np.searchsorted(keys, own_keys - span, side="left")
        sums = cs[right - 1] - np.where(left > 0, cs[left - 1], 0)
        out = (g.iloc[o[own_pos]]
               .drop(columns=["__b", "__own"])
               .reset_index(drop=True))
        out["range_sum"] = sums
        return out

    return (ds.map_batches(scatter, batch_format="pandas")
            .groupby("__b")
            .map_groups(scan_bucket, batch_format="pandas"))
