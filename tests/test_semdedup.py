"""SemDeDup-style semantic dedup (stages/dedup.py:semantic_dedup):
planted duplicate groups, the deterministic keep rule, parallelism
invariance, and the survivor property (no within-cluster pair at/above
the threshold survives)."""

import numpy as np
import pandas as pd
import pytest
import ray.data


def _planted(d: int = 16):
    """Three well-separated modes; modes 0 and 1 each carry an exact
    duplicate group (identical unit vectors), mode 2 only singletons.
    Cross-mode cosines are ~0 (orthogonal axes), within-mode non-dup
    cosines stay below 0.9."""
    rng = np.random.default_rng(11)
    rows = []

    def unit(v):
        return v / np.linalg.norm(v)

    base0 = np.zeros(d)
    base0[0] = 1.0
    base1 = np.zeros(d)
    base1[5] = 1.0
    base2 = np.zeros(d)
    base2[10] = 1.0
    # dup group A: ids 100, 101, 102 identical
    for i in (100, 101, 102):
        rows.append((i, base0.copy()))
    # mode-0 distinct: orthogonal-ish jitter keeps cosine < 0.9
    for i in (103, 104):
        v = base0 + 0.8 * rng.standard_normal(d)
        rows.append((i, unit(v)))
    # dup group B: ids 200, 201 identical
    for i in (200, 201):
        rows.append((i, base1.copy()))
    # mode-2 singletons
    for i in (300, 301, 302):
        v = base2 + 0.8 * rng.standard_normal(d)
        rows.append((i, unit(v)))
    df = pd.DataFrame({"vec_id": [r[0] for r in rows],
                       "embedding": [r[1].tolist() for r in rows]})
    return df


def _run(df, **kw):
    from database_delta_plugins_ray.stages.dedup import semantic_dedup

    ds = ray.data.from_pandas(df).repartition(kw.pop("nblocks", 4))
    out = semantic_dedup(ds, **kw).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def test_planted_duplicate_groups(ray_session):
    df = _planted()
    out = _run(df, k=3, threshold=0.95, iters=4)
    # each exact-duplicate group keeps exactly one member
    dropped = set(out["vec_id"].tolist())
    assert len(dropped & {100, 101, 102}) == 2
    assert len(dropped & {200, 201}) == 1
    # non-duplicates all survive
    assert dropped.isdisjoint({103, 104, 300, 301, 302})
    # kept_id points at the surviving member of the same group
    for _, r in out.iterrows():
        grp = {100, 101, 102} if r["vec_id"] in (100, 101, 102) \
            else {200, 201}
        assert r["kept_id"] in grp and r["kept_id"] not in dropped


def test_parallelism_invariance(ray_session):
    df = _planted()
    a = _run(df, k=3, threshold=0.95, iters=4, nblocks=1)
    b = _run(df, k=3, threshold=0.95, iters=4, nblocks=7)
    pd.testing.assert_frame_equal(a, b)


def test_survivor_property_and_chunking(ray_session):
    """Random blob corpus: no two survivors of one cluster may have
    cosine >= threshold; chunk=8 forces the blockwise path."""
    from database_delta_plugins_ray.stages.dedup import semantic_dedup

    rng = np.random.default_rng(5)
    d, n = 8, 120
    centers = rng.standard_normal((4, d)) * 4
    vecs = centers[rng.integers(0, 4, n)] + 0.3 * rng.standard_normal((n, d))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [v.tolist() for v in vecs]})
    ds = ray.data.from_pandas(df).repartition(3)
    thr = 0.98
    out = semantic_dedup(ds, k=4, threshold=thr, iters=4,
                         chunk=8).to_pandas()
    dropped = set(out["vec_id"].tolist())
    # recompute assignments the same way to check the survivor property
    from database_delta_plugins_ray.stages.clustering import kmeans

    _, cent, _ = kmeans(ds, k=4, iters=4)
    x = vecs
    d2 = -2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)[None, :]
    a = np.argmin(d2, axis=1)
    unit = x / np.linalg.norm(x, axis=1, keepdims=True)
    for c in range(4):
        ids = [i for i in range(n) if a[i] == c and i not in dropped]
        if len(ids) < 2:
            continue
        sims = unit[ids] @ unit[ids].T
        np.fill_diagonal(sims, -1)
        assert sims.max() < thr, f"cluster {c} kept a near-dup pair"
    # every dropped row is shadowed by a same-cluster survivor at >= thr
    for _, r in out.iterrows():
        i, j = int(r["vec_id"]), int(r["kept_id"])
        assert a[i] == a[j] and j not in dropped
        assert float(unit[i] @ unit[j]) >= thr - 1e-9


def test_gate_query_runs(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        dedup_semantic_embeddings,
    )

    out = dedup_semantic_embeddings("/root/testdata/sf0.001")
    assert list(out.columns) == ["vec_id", "cluster", "kept_id"]
    # deterministic across runs
    out2 = dedup_semantic_embeddings("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(out, out2)
