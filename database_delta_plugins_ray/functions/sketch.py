"""Mergeable distributed sketches (public algorithms).

HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007; bias/small-range
corrections per Heule et al. 2013's published constants for the classic
estimator): fixed 2^p uint8 register arrays, built vectorized per batch,
merged by element-wise max — the canonical mergeable-state pattern for
approximate COUNT(DISTINCT) over a shuffle-free pipeline: partials are
m bytes per (group, batch) regardless of cardinality.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

_HLL_HASH_KEY = "hllsketch_hshky0"


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _floor_log2(w: np.ndarray) -> np.ndarray:
    """Vectorized floor(log2(w)) for uint64 w > 0 (exact bit ops — no
    float64 precision cliff at 2^53)."""
    n = np.zeros(len(w), dtype=np.int64)
    cur = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        t = cur >> np.uint64(s)
        has = t != 0
        n[has] += s
        cur[has] = t[has]
    return n


def hll_registers(values, p: int = 12) -> np.ndarray:
    """Build one HLL register array (uint8, length 2^p) from a vector of
    values. Fully vectorized: one hash pass, exact-integer rank, one
    np.maximum.at scatter."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    vals = np.asarray(values)
    if len(vals) == 0:
        return regs
    h = pd.util.hash_array(vals, hash_key=_HLL_HASH_KEY)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # remaining 64-p bits, left-aligned (wraps)
    rank = np.empty(len(h), dtype=np.int64)
    nz = w != 0
    # leading zeros of the left-aligned window + 1
    rank[nz] = 63 - _floor_log2(w[nz]) + 1
    rank[~nz] = (64 - p) + 1
    np.maximum.at(regs, idx, np.minimum(rank, 255).astype(np.uint8))
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Classic HLL estimate with the published small-range (linear
    counting) and large-range corrections."""
    m = len(regs)
    e = _alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if e <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    if e > (1 << 32) / 30.0:
        return -(1 << 32) * np.log(1.0 - e / (1 << 32))
    return float(e)


# ---------------------------------------------------------------------------
# Misra-Gries / Space-Saving heavy hitters (mergeable summaries,
# Agarwal et al. 2013 "Mergeable Summaries" — public algorithm)
# ---------------------------------------------------------------------------


def mg_truncate(items: np.ndarray, counts: np.ndarray, errs: np.ndarray,
                capacity: int):
    """Truncate an exact-or-summary count table to ``capacity`` entries,
    Misra-Gries style: subtract the (capacity+1)-th largest count from
    everyone, drop the non-positive, and fold the subtraction into each
    survivor's error bound. Returns ``(items, counts, errs, d)`` where
    ``d`` is the subtracted amount (0 when nothing was truncated).
    Invariants: a SURVIVOR's true count is within ``[count, count +
    err]``; an item absent from the summary has true count <= the sum
    of ``d`` over the summaries it was dropped from — so merged
    reporting carries the global sum of d as the bound for everyone."""
    if len(items) <= capacity:
        return items, counts, errs, 0
    order = np.argsort(counts)[::-1]
    d = int(counts[order[capacity]])
    keep = counts > d
    return (items[keep], counts[keep] - d, errs[keep] + d, d)


def mg_partial(values, capacity: int):
    """Build one MG summary (exact per-batch counts, then truncate).
    Returns ``(items, counts, errs, d)``; when the batch's distinct
    count fits ``capacity``, the summary is exact (errs zero, d=0)."""
    s = pd.Series(values)
    vc = s.value_counts()
    items = vc.index.to_numpy()
    counts = vc.to_numpy(dtype=np.int64)
    return mg_truncate(items, counts, np.zeros(len(items), np.int64),
                       capacity)


# ---------------------------------------------------------------------------
# Mergeable rank-spaced quantile summary (GK/KLL-family simplification:
# uniform-rank compaction of weighted point sets — public technique)
# ---------------------------------------------------------------------------


def quantile_summary(vals: np.ndarray, s: int):
    """Compress a value vector to ``s`` rank-spaced weighted points:
    point i sits at rank (i+0.5)*n/s of the sorted input and carries
    weight n/s. Rank error of any quantile query on one summary is
    <= n/(2s); merging and re-compressing adds <= total/(2s) per
    compaction, so a two-level pipeline (batch partials -> one merge)
    answers within ~total/s ranks. Returns ``(points, weights)``."""
    v = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(v)
    if n == 0:
        return np.empty(0), np.empty(0)
    if n <= s:
        return v, np.ones(n)
    ranks = ((np.arange(s) + 0.5) * n / s).astype(np.int64)
    return v[ranks], np.full(s, n / s)


def quantile_merge(summaries, s: int):
    """Merge ``(points, weights)`` summaries: weighted sort-union, then
    re-compress back to ``s`` points at uniform weight spacing."""
    pts = np.concatenate([p for p, _ in summaries])
    wts = np.concatenate([w for _, w in summaries])
    if len(pts) == 0:
        return np.empty(0), np.empty(0)
    o = np.argsort(pts, kind="mergesort")
    pts, wts = pts[o], wts[o]
    total = wts.sum()
    if len(pts) <= s:
        return pts, wts
    cum = np.cumsum(wts) - wts / 2.0  # center-of-mass rank of each point
    targets = (np.arange(s) + 0.5) * total / s
    idx = np.searchsorted(cum, targets)
    idx = np.minimum(idx, len(pts) - 1)
    return pts[idx], np.full(s, total / s)


def quantile_query(points: np.ndarray, weights: np.ndarray, q: float):
    """Value at quantile ``q`` of a summary (lower weighted rank)."""
    if len(points) == 0:
        return float("nan")
    cum = np.cumsum(weights)
    target = q * cum[-1]
    return float(points[min(np.searchsorted(cum, target),
                            len(points) - 1)])


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970): fixed-size OR-mergeable membership sketch.
# Used as a join prefilter (stages/join.py) — build on one side's keys,
# broadcast once, drop the other side's definite non-matches BEFORE the
# all-to-all. No false negatives, so the join result is exact; false
# positives only waste shuffle bytes. Double hashing (Kirsch & Mitzenmacher
# 2006): k probe positions from two 64-bit halves of one hash pass.
# ---------------------------------------------------------------------------


def bloom_set(bits: np.ndarray, h: np.ndarray, nhash: int) -> None:
    """OR the ``nhash`` probe bits of each uint64 hash into ``bits``
    (a uint8 byte array; nbits = len(bits) * 8)."""
    nbits = np.uint64(len(bits) * 8)
    h = h.astype(np.uint64, copy=False)
    h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd: full-period stride
    for i in range(nhash):
        idx = (h + np.uint64(i) * h2) % nbits
        np.bitwise_or.at(
            bits,
            (idx >> np.uint64(3)).astype(np.int64),
            np.left_shift(1, (idx & np.uint64(7)).astype(np.int64)).astype(np.uint8),
        )


def bloom_contains(bits: np.ndarray, h: np.ndarray, nhash: int) -> np.ndarray:
    """Vectorized membership probe: True where ALL probe bits are set
    (definite non-members come back False — never a false negative)."""
    nbits = np.uint64(len(bits) * 8)
    h = h.astype(np.uint64, copy=False)
    h2 = (h >> np.uint64(33)) | np.uint64(1)
    ok = np.ones(len(h), bool)
    for i in range(nhash):
        idx = (h + np.uint64(i) * h2) % nbits
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        bit = np.left_shift(1, (idx & np.uint64(7)).astype(np.int64)).astype(np.uint8)
        ok &= (byte & bit) != 0
    return ok


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data stream
# summary: the count-min sketch and its applications" — public algorithm)
# ---------------------------------------------------------------------------

_CMS_HASH_KEYS = [f"cms_hashkey_{i:04d}" for i in range(16)]


def cms_build(values, counts: np.ndarray | None = None,
              depth: int = 4, width: int = 1024) -> np.ndarray:
    """(depth, width) int64 counter matrix for a batch of values (with
    optional per-value counts). Each row uses an independent seeded
    ``pd.util.hash_array`` pass; updates are one ``np.add.at`` scatter
    per row — fully vectorized, O(n * depth). Sketches SUM-merge, so
    partials are depth*width*8 bytes per batch regardless of
    cardinality; estimates overcount only (min over rows), with the
    standard guarantee err <= e/width * total at prob 1 - e^-depth."""
    v = np.asarray(values)
    if counts is None:
        counts = np.ones(len(v), np.int64)
    m = np.zeros((depth, width), np.int64)
    for d in range(depth):
        h = pd.util.hash_array(v, hash_key=_CMS_HASH_KEYS[d]) % np.uint64(width)
        np.add.at(m[d], h.astype(np.int64), counts)
    return m


def cms_query(m: np.ndarray, values) -> np.ndarray:
    """Point frequency estimates (never under the true count)."""
    v = np.asarray(values)
    depth, width = m.shape
    est = np.full(len(v), np.iinfo(np.int64).max, np.int64)
    for d in range(depth):
        h = pd.util.hash_array(v, hash_key=_CMS_HASH_KEYS[d]) % np.uint64(width)
        est = np.minimum(est, m[d, h.astype(np.int64)])
    return est
