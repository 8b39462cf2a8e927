"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The classic iterative fan-out/fold pattern on Ray Data — and the
full-corpus upgrade of the sample-trained centroids the IVF index uses
(``stages/similarity.py:_KMeansIndex.train``):

- init: k-means||-flavoured and deterministic — the 8k vectors with the
  smallest ``md5_u64(vec_id)`` are collected as candidates (a
  distributed hash-order top-(8k): per-batch partials, driver keeps 8k
  rows), then the driver picks k of them by greedy farthest-point
  traversal (Gonzalez 1985). Reproducible at any parallelism, no RNG
  state, and — unlike k naked hash-order picks — two seeds landing in
  one tight cluster is impossible while another cluster holds any
  candidate;
- each Lloyd iteration is ONE streaming pass: ``map_batches`` computes
  per-batch (cluster, count, vector-sum, inertia) partials via a
  vectorized argmin over the broadcast centroid matrix, and the driver
  folds k x d numbers — the corpus never leaves the object store, the
  driver never sees a vector row;
- vectors are materialized once up front (column-pruned) so the iters
  passes read Arrow blocks from the object store (spilling if needed)
  instead of re-decoding Parquet every pass.

Scale note (100 TB): per-iteration driver traffic is
O(num_batches x k x d) floats from the partials — independent of row
count; with k=256, d=1024, 4 KB blocks that is MBs. For billions of
rows the standard refinement (mini-batch k-means on a hash-sampled
subset, then one full assignment pass) drops in by replacing ``ds``
with ``hash_sample(ds, ...)`` for the training loop.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["kmeans"]


def _stack(col) -> np.ndarray:
    return np.stack(col.to_list()).astype(np.float64)


def kmeans(ds, k: int = 10, iters: int = 10, vec_col: str = "embedding",
           id_col: str = "vec_id"):
    """Run Lloyd's algorithm; returns ``(assignments_dataset, centroids,
    inertia_history)`` where assignments are ``(id_col, cluster)`` rows
    and ``centroids`` is a ``(k, d)`` array."""
    import ray

    from .sample import md5_u64

    vecs = ds.select_columns([id_col, vec_col]).materialize()

    n_cand = 8 * k

    def init_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_u64(df[id_col].to_numpy())
        o = np.argsort(h)[:n_cand]
        return pd.DataFrame({
            "h": h[o],
            "vec": list(_stack(df[vec_col].reset_index(drop=True))[o]),
        })

    cand = vecs.map_batches(init_partial, batch_format="pandas").to_pandas()
    top = cand.sort_values("h").head(n_cand)
    pool = np.stack(top["vec"].to_list())
    if len(pool) < k:
        raise ValueError(f"need >= {k} rows to seed {k} clusters")
    # greedy farthest-point: deterministic, spreads seeds across modes
    chosen = [0]
    mind = ((pool - pool[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(mind))
        chosen.append(nxt)
        mind = np.minimum(mind, ((pool - pool[nxt]) ** 2).sum(axis=1))
    centroids = pool[chosen]

    history = []
    for _ in range(iters):
        c_ref = ray.put(centroids)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(c_ref)  # (k, d)
            x = _stack(df[vec_col].reset_index(drop=True))
            # ||x-c||^2 argmin via the dot-product expansion (no (n,k,d)
            # intermediate): d2 = ||x||^2 - 2 x.c + ||c||^2
            d2 = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
            a = np.argmin(d2, axis=1)
            best = d2[np.arange(len(x)), a] + (x * x).sum(axis=1)
            sums = np.zeros((k, x.shape[1]))
            np.add.at(sums, a, x)
            n = np.bincount(a, minlength=k)
            present = np.flatnonzero(n)
            inertia = np.zeros(len(present))
            if len(present):
                inertia[0] = best.sum()  # batch total, carried on one row
            return pd.DataFrame({
                "c": present,
                "n": n[present],
                "s": list(sums[present]),
                "inertia": inertia,
            })

        parts = vecs.map_batches(partial, batch_format="pandas").to_pandas()
        history.append(float(parts["inertia"].sum()))
        n = np.zeros(k)
        sums = np.zeros_like(centroids)
        for c_, n_, s_ in zip(parts["c"], parts["n"], parts["s"]):
            n[c_] += n_
            sums[c_] += np.asarray(s_)
        nonempty = n > 0
        centroids = np.where(nonempty[:, None], sums / np.maximum(n, 1)[:, None],
                             centroids)

    c_ref = ray.put(centroids)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(c_ref)
        x = _stack(df[vec_col].reset_index(drop=True))
        d2 = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": np.argmin(d2, axis=1).astype(np.int64),
        })

    return (vecs.map_batches(assign, batch_format="pandas"),
            centroids, history)
