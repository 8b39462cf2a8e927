"""Distributed PageRank over a Ray Data edge list (Page, Brin,
Motwani & Winograd 1999, "The PageRank citation ranking" — public
algorithm).

Beside the large-star/small-star connected components in
``stages/dedup.py``, this is the repo's second iterative graph
operator. An iterative loop is where Ray Data's generic join/groupby
operators are the WRONG primitive — each carries 1-2 all-to-alls of
fixed latency, paid ``iters`` times (measured ~12-16 s per iteration
at fixture scale before this design). Instead the loop uses the repo's
histogram-fold discipline:

1. **Static structure, one pass each**: distinct node ids fold to the
   driver (per-block unique partials), compact to a dense index; the
   edge list rewrites ONCE into materialized blocks of ``(src_idx,
   dst_idx)`` int32/int64 arrays; out-degrees fold as per-block
   bincount partials. The driver holds O(N) ints — the documented
   capacity assumption (8-12 bytes per node; ~10^8 nodes per driver
   GBs; beyond that shard the fold, see ``fold="shuffle"``).
2. **Per iteration, ONE corpus pass and NO shuffle** (default
   ``fold="driver"``): the current rank vector broadcasts via
   ``ray.put`` (zero-copy shared memory per node); each edge block
   computes its sparse contribution partial ``(dst_idx, Σ floor(
   r[src]/deg[src]))`` — bounded by distinct dst per block, the same
   bound as every bincount partial in this repo — and the driver folds
   the ≤ blocks partials into the next vector. ``fold="shuffle"``
   routes the partials through one ``groupby(dst).sum`` all-to-all
   instead, for node counts past driver memory.
3. **Exact at any parallelism**: ranks are fixed-point int64
   (``scale`` units of total mass); contributions are
   ``floor(r/deg)`` and the damped update ``base +
   floor(c·p/100)`` — all integer, order-immune, bit-identical at any
   partitioning (the DSIR / unigram fixed-point discipline). The
   deterministic per-edge rounding loss (< 1 unit of 2^40) is part of
   the spec, mirrored by the test reference. Dangling nodes simply
   don't emit mass (the standard teleport-leak simplification).

No counterpart in the reference (row replication, not graph
analytics); cited to the public paper only.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["pagerank"]

#: fixed-point total-mass scale (2^40: room for 10^12 nodes before a
#: single node's rank rounds to zero)
PR_SCALE = 1 << 40


def pagerank(edges, *, iters: int = 10, damping_pct: int = 85,
             scale: int = PR_SCALE, fold: str = "driver"):
    """PageRank over a Dataset of directed ``(src int64, dst int64)``
    edges; returns a Dataset ``(node int64, rank_fp int64)`` with ranks
    in fixed-point ``scale`` units (summing to ≈ 1 minus deterministic
    rounding loss). Nodes are everything appearing as ``src`` or
    ``dst``."""
    import pyarrow as pa
    import ray

    if fold not in ("driver", "shuffle"):
        raise ValueError(f"fold must be 'driver' or 'shuffle': {fold!r}")

    # ---- static pass 1: distinct nodes -> dense index ----------------
    def nodes_partial(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t["src"].to_numpy(zero_copy_only=False),
            t["dst"].to_numpy(zero_copy_only=False)]).astype(np.int64))
        return pa.table({"node": pa.array(u, pa.int64())})

    parts = edges.map_batches(nodes_partial, batch_format="pyarrow")
    node_ids = np.unique(np.concatenate(
        [b["node"].to_numpy(zero_copy_only=False)
         for b in parts.iter_batches(batch_format="pyarrow")]
        or [np.empty(0, np.int64)]))
    n = len(node_ids)
    if n == 0:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "rank_fp": pa.array([], pa.int64())}))
    ids_ref = ray.put(node_ids)

    # ---- static pass 2: compacted edge blocks + degree fold ----------
    def compact(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        s = np.searchsorted(ids, t["src"].to_numpy(zero_copy_only=False)
                            .astype(np.int64))
        d = np.searchsorted(ids, t["dst"].to_numpy(zero_copy_only=False)
                            .astype(np.int64))
        return pa.table({"s": pa.array(s, pa.int64()),
                         "d": pa.array(d, pa.int64())})

    eidx = edges.map_batches(compact, batch_format="pyarrow").materialize()

    deg = np.zeros(n, dtype=np.int64)
    for b in eidx.iter_batches(batch_format="pyarrow"):
        deg += np.bincount(b["s"].to_numpy(zero_copy_only=False),
                           minlength=n).astype(np.int64)
    deg_ref = ray.put(np.maximum(deg, 1))  # dangling: never divided into

    base = ((scale * (100 - damping_pct)) // 100) // n
    rank = np.full(n, scale // n, dtype=np.int64)

    # ---- iterations: one edge pass each -------------------------------
    sparse_schema = pa.schema([("d", pa.int64()), ("c", pa.int64())])

    for _ in range(iters):
        rank_ref = ray.put(rank)

        def contrib(t: pa.Table) -> pa.Table:
            r = ray.get(rank_ref)
            dg = ray.get(deg_ref)
            s = t["s"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False)
            ci = r[s] // dg[s]
            g = (pd.DataFrame({"d": d, "c": ci})
                 .groupby("d", sort=False)["c"].sum())
            return pa.table({"d": pa.array(g.index.to_numpy(np.int64)),
                             "c": pa.array(g.to_numpy(np.int64))},
                            schema=sparse_schema)

        partials = eidx.map_batches(contrib, batch_format="pyarrow")
        acc = np.zeros(n, dtype=np.int64)
        if fold == "driver":
            for b in partials.iter_batches(batch_format="pyarrow"):
                np.add.at(acc, b["d"].to_numpy(zero_copy_only=False),
                          b["c"].to_numpy(zero_copy_only=False))
        else:
            from ray.data.aggregate import Sum

            folded = (partials.groupby("d")
                      .aggregate(Sum("c", alias_name="c")).to_pandas())
            if len(folded):
                acc[folded["d"].to_numpy(np.int64)] = \
                    folded["c"].to_numpy(np.int64)
        rank = base + (acc * np.int64(damping_pct)) // np.int64(100)

    out = pa.table({"node": pa.array(node_ids, pa.int64()),
                    "rank_fp": pa.array(rank, pa.int64())})
    return ray.data.from_arrow(out)
