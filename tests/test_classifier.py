"""Trained quality classifier (stages/classifier.py): exact recovery on
planted linear labels, bit-identical weights at any parallelism, and
distillation quality on the fixture corpus."""

import numpy as np
import pandas as pd
import ray.data


def _docs(n: int = 200, seed: int = 3) -> pd.DataFrame:
    """Synthetic docs over a tiny closed vocabulary so the hashed
    feature matrix is exactly reconstructable in the test."""
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = []
    for _ in range(n):
        k = rng.integers(3, 30)
        texts.append(" ".join(rng.choice(vocab, size=k)))
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def test_exact_recovery_on_linear_labels(ray_session):
    """Labels ARE an integer linear function of the hashed counts —
    ridge with tiny l2 must reproduce them to rounding exactness."""
    from database_delta_plugins_ray.stages.classifier import (
        hashed_counts, score_hashed, train_ridge_hashed,
    )

    df = _docs()
    d = 32
    w_true = np.zeros(d)
    X = hashed_counts(df["text"], d)
    active = np.flatnonzero(X[:, : d - 1].sum(axis=0))  # hashed vocab cols
    w_true[active] = np.arange(1, len(active) + 1, dtype=np.float64)
    w_true[d - 1] = 7.0  # intercept
    y = (X @ w_true).astype(np.int64)
    df = df.assign(label=y)

    ds = ray.data.from_pandas(df).repartition(4)
    w = train_ridge_hashed(ds, lambda b: b["label"].to_numpy(),
                           d=d, l2=1e-9)
    got = score_hashed(ds, w).to_pandas().sort_values("doc_id")
    np.testing.assert_allclose(got["pred"].to_numpy(),
                               y.astype(np.float64), atol=1e-3)


def test_weights_bit_identical_across_parallelism(ray_session):
    from database_delta_plugins_ray.stages.classifier import (
        train_ridge_hashed,
    )

    df = _docs(n=300, seed=9)
    df["label"] = (df["text"].str.len() * 10).astype(np.int64)

    def lbl(b):
        return b["label"].to_numpy()

    w1 = train_ridge_hashed(ray.data.from_pandas(df).repartition(1),
                            lbl, d=64)
    w7 = train_ridge_hashed(ray.data.from_pandas(df).repartition(7),
                            lbl, d=64)
    assert (w1 == w7).all(), "int64 partial fold must be order-exact"


def test_distills_heuristic_on_fixture(ray_session):
    """The gate query: predictions must explain most of the heuristic
    quality score's variance on its own training corpus (R² > 0.5)."""
    from database_delta_plugins_ray.functions.text import quality_scores
    from database_delta_plugins_ray.pipelines.analytics import (
        quality_classifier_documents,
    )
    import pyarrow.parquet as pq

    out = quality_classifier_documents("/root/testdata/sf0.001")
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    y = quality_scores(t["text"]).loc[:, "quality_score"].to_numpy() * 10000
    m = t[["doc_id"]].assign(y=y).merge(out, on="doc_id")
    resid = m["y"] - m["pred"]
    r2 = 1 - (resid ** 2).sum() / ((m["y"] - m["y"].mean()) ** 2).sum()
    assert r2 > 0.5, f"distillation R² too low: {r2:.3f}"
    # deterministic across runs
    out2 = quality_classifier_documents("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(out, out2)
