"""Similarity search over an embedding column (``list<float>``).

* ``ann_topk_bruteforce`` — the correctness baseline: per-batch numpy
  matmul against a broadcast query matrix (``ray.put`` once, read per
  actor/task), per-batch partial top-k, tiny final reduce. The dataset
  streams; only k rows per batch reach the driver.
* ``ann_topk_ivf`` — the scale path: IVF — k-means centroids trained once
  on a sample (driver-side numpy, seeded), assignment inside map_batches,
  probe only the ``nprobe`` closest clusters. Same output contract.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _as_matrix(col) -> np.ndarray:
    return np.stack(col.to_numpy()) if hasattr(col, "to_numpy") else np.stack(col)


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def ann_topk_bruteforce(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact top-k cosine neighbours of ``query``; returns a small DataFrame
    (id, score) sorted by (-score, id)."""
    q = _unit(query.reshape(1, -1).astype(np.float32))[0]
    q_ref = ray.put(q)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qq = ray.get(q_ref)
        m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
        scores = m @ qq
        if len(scores) > k:
            idx = np.argpartition(-scores, k)[:k]
        else:
            idx = np.arange(len(scores))
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy()[idx], "score": scores[idx].astype(np.float64)}
        )

    partials = ds.map_batches(partial, batch_format="pandas").take_all()
    rows = [(r[id_col], r["score"]) for r in partials]
    top = heapq.nsmallest(k, rows, key=lambda t: (-t[1], t[0]))
    return pd.DataFrame(top, columns=[id_col, "score"])


class IVFIndex:
    """Tiny deterministic IVF: seeded k-means (few Lloyd iterations) on a
    driver-side sample; centroids broadcast to assignment/search stages."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = centroids  # (C, d), unit-normalized

    @classmethod
    def train(cls, sample: np.ndarray, n_clusters: int = 16, iters: int = 8,
              seed: int = 1) -> "IVFIndex":
        rng = np.random.default_rng(seed)
        x = _unit(sample.astype(np.float32))
        idx = rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)
        c = x[idx]
        for _ in range(iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                mask = assign == j
                if mask.any():
                    c[j] = x[mask].mean(axis=0)
            c = _unit(c)
        return cls(c)

    def probe_clusters(self, q: np.ndarray, nprobe: int) -> np.ndarray:
        scores = self.centroids @ _unit(q.reshape(1, -1))[0]
        return np.argsort(-scores)[:nprobe]


def ann_topk_ivf(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    *,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 1,
) -> pd.DataFrame:
    """IVF-accelerated top-k: assign batches to centroids, search only the
    ``nprobe`` clusters closest to the query. Approximate by construction —
    recall governed by nprobe/n_clusters."""
    sample = _as_matrix(
        pd.DataFrame(ds.limit(sample_size).take_all())[vec_col]
    )
    index = IVFIndex.train(sample, n_clusters=n_clusters, seed=seed)
    probe = set(index.probe_clusters(query, nprobe).tolist())
    c_ref = ray.put(index.centroids)
    q = _unit(query.reshape(1, -1).astype(np.float32))[0]
    q_ref = ray.put(q)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(c_ref)
        qq = ray.get(q_ref)
        m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
        assign = np.argmax(m @ c.T, axis=1)
        mask = np.isin(assign, list(probe))
        if not mask.any():
            return pd.DataFrame({id_col: [], "score": []})
        sub = m[mask]
        scores = sub @ qq
        ids = df[id_col].to_numpy()[mask]
        if len(scores) > k:
            sel = np.argpartition(-scores, k)[:k]
        else:
            sel = np.arange(len(scores))
        return pd.DataFrame({id_col: ids[sel], "score": scores[sel].astype(np.float64)})

    partials = ds.map_batches(partial, batch_format="pandas").take_all()
    rows = [(r[id_col], r["score"]) for r in partials]
    top = heapq.nsmallest(k, rows, key=lambda t: (-t[1], t[0]))
    return pd.DataFrame(top, columns=[id_col, "score"])
