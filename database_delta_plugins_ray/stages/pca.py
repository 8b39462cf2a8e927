"""Distributed PCA over an embedding column (the moment-matrix pattern).

Embedding dimensionality ``d`` is bounded (64-4096) while row count is
not, so PCA at 100 TB is the textbook two-phase plan:

- **fit**: ONE streaming pass of per-batch moment partials — count,
  coordinate sum (d,), and Gram matrix X^T X (d x d) — folded 32-at-a-time
  by a map_batches reduce pass so the driver receives O(d^2) floats
  regardless of corpus size; the driver forms the covariance and runs a
  d x d ``eigh`` (microseconds at these d). Component SIGNS are fixed
  deterministically (largest-|coordinate| entry made positive) since an
  eigenvector's sign is arbitrary.
- **transform**: broadcast the (mean, components) model via the task
  closure and project each batch with one matmul — stateless, zero
  shuffle.

The corpus never leaves the object store and the driver never sees a
vector row. Mini-batch note: for iterative refits, fit on a
``hash_sample`` of the corpus and transform everything — the fit cost is
already one pass, so sampling only matters when many fits are scripted.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["pca_fit", "pca_transform"]


def _stack(col) -> np.ndarray:
    return np.stack(col.to_list()).astype(np.float64)


def pca_fit(ds, n_components: int, vec_col: str = "embedding") -> dict:
    """Fit PCA; returns {mean, components (k,d), explained_variance (k,),
    total_variance, n}."""

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = _stack(df[vec_col])
        return pd.DataFrame({
            "n": [np.int64(len(x))],
            "s": [x.sum(axis=0)],
            "g": [(x.T @ x).ravel()],
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n": [np.int64(df["n"].sum())],
            "s": [np.sum(np.stack(df["s"].to_list()), axis=0)],
            "g": [np.sum(np.stack(df["g"].to_list()), axis=0)],
        })

    parts = (ds.map_batches(moments, batch_format="pandas")
             .map_batches(fold, batch_format="pandas", batch_size=32)
             .to_pandas())
    n = int(parts["n"].sum())
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    s = np.sum(np.stack(parts["s"].to_list()), axis=0)
    g = np.sum(np.stack(parts["g"].to_list()), axis=0)
    d = len(s)
    mean = s / n
    cov = (g.reshape(d, d) - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T                   # (k, d)
    # deterministic sign: the largest-|coordinate| entry is positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": evals[order],
        "total_variance": float(evals.sum()),
        "n": n,
    }


def pca_transform(ds, model: dict, vec_col: str = "embedding",
                  keep: list[str] | None = None, out_col: str = "pc"):
    """Project each vector onto the fitted components: one matmul per
    batch against the closure-shipped (k, d) model, no shuffle."""
    mean = np.asarray(model["mean"], np.float64)
    comps = np.asarray(model["components"], np.float64)
    keep = keep or []

    def project(df: pd.DataFrame) -> pd.DataFrame:
        x = _stack(df[vec_col])
        pcs = (x - mean) @ comps.T
        out = {c: df[c].to_numpy() for c in keep}
        out[out_col] = list(pcs.astype(np.float32))
        return pd.DataFrame(out)

    return ds.map_batches(project, batch_format="pandas")
