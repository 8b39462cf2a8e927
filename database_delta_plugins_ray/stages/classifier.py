"""Distributed trained quality classifier: ridge regression over hashed
token-count features (the CCNet / GPT-3-style "train a linear filter,
score the corpus" pipeline op, here with closed-form training).

Training is EXACT integer sufficient statistics: each batch emits
``X^T X`` and ``X^T y`` partials accumulated in int64 from integer
feature counts and integer labels; the driver folds them (integer sums
are order-independent, so the learned weights are BIT-IDENTICAL at any
parallelism — the same trick as the grouped-OLS trend query) and runs
one dense O(d³) ridge solve. Scoring broadcasts the weight vector via
``ray.put`` and streams one ``map_batches`` pass.

Scale shape (100 TB): a partial is O(d²) ints per batch — independent
of row count (d=256 → 512 KB). Driver fan-in is batches × d²; if that
ever matters, pre-fold partials through one tiny ``groupby(part)``
before the driver (the histogram-fold pattern) — the math is the same
integer sum. Overflow bound: an ``X^T X`` entry sums count_i·count_j
per doc — ≤ (tokens/doc)² per row, ~1e10 per 100k-row batch, leaving
>8 orders of magnitude of int64 headroom for the global fold.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["hashed_counts", "train_ridge_hashed", "score_hashed"]

_FEATURE_HASH_KEY = "0123456789abcdef"


def hashed_counts(texts: pd.Series, d: int) -> np.ndarray:
    """(len(texts), d) int64 matrix of hashed-token counts — the
    feature-hashing trick (Weinberger et al. 2009) over the shared
    lowercase word tokenization. Column d-1 is a constant intercept."""
    from ..functions.text import _flat_lower_tokens

    X = np.zeros((len(texts), d), dtype=np.int64)
    flat, di, _ = _flat_lower_tokens(texts)
    if len(flat):
        h = (pd.util.hash_array(flat, hash_key=_FEATURE_HASH_KEY)
             % np.uint64(d - 1)).astype(np.int64)
        np.add.at(X, (di, h), 1)
    X[:, d - 1] = 1  # intercept
    return X


def train_ridge_hashed(ds, label_fn, *, d: int = 256, l2: float = 1.0,
                       text_col: str = "text") -> np.ndarray:
    """Closed-form ridge over hashed token counts.

    ``label_fn(df) -> int64 array`` supplies INTEGER labels per batch
    (e.g. a heuristic quality score in ten-thousandths — training then
    distills the heuristic into a model that scores unseen text).
    Returns the (d,) float64 weight vector; deterministic at any
    parallelism because every cross-batch accumulation is an int64 sum.
    The intercept is NOT regularized (standard ridge practice)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        X = hashed_counts(df[text_col].reset_index(drop=True), d)
        y = np.asarray(label_fn(df), dtype=np.int64)
        return pd.DataFrame({
            "xtx": [(X.T @ X).tobytes()],
            "xty": [(X.T @ y).tobytes()],
            "n": [np.int64(len(df))],
        })

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    xtx = np.zeros((d, d), dtype=np.int64)
    xty = np.zeros(d, dtype=np.int64)
    for bx, by in zip(parts["xtx"], parts["xty"]):
        xtx += np.frombuffer(bx, dtype=np.int64).reshape(d, d)
        xty += np.frombuffer(by, dtype=np.int64)
    reg = l2 * np.eye(d)
    reg[d - 1, d - 1] = 0.0
    return np.linalg.solve(xtx.astype(np.float64) + reg,
                           xty.astype(np.float64))


def score_hashed(ds, w: np.ndarray, *, text_col: str = "text",
                 id_col: str = "doc_id", out_col: str = "pred"):
    """Stream one scoring pass: ``pred = X @ w`` per batch with the
    weight vector broadcast once. Output rounds half-up to 4 decimals
    (deterministic: w is bit-identical at any parallelism, so the
    rounding edge falls the same way everywhere)."""
    import ray

    d = len(w)
    w_ref = ray.put(np.asarray(w, dtype=np.float64))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ww = ray.get(w_ref)
        X = hashed_counts(df[text_col].reset_index(drop=True), d)
        pred = X.astype(np.float64) @ ww
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            out_col: np.floor(pred * 10000.0 + 0.5) / 10000.0,
        })

    return ds.map_batches(score, batch_format="pandas")
