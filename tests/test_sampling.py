"""Deterministic sampling / token-budget mix / PII redaction."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from database_delta_plugins_ray.functions.text import pii_redact
from database_delta_plugins_ray.stages.sample import (
    hash_sample,
    md5_u64,
    token_budget_mix,
)


def test_pii_redact_planted():
    out = pii_redact(
        pd.Series(
            [
                "mail bob.smith+x@corp.example.com or call 555-123-4567",
                "two mails a@b.io c.d@e-f.org and 111-222-3333 999.888.7777",
                "no pii here 12-34 a@b (not an email TLD-less)",
                "",
            ]
        )
    )
    assert list(out["n_redactions"]) == [2, 4, 0, 0]
    assert out["redacted"][0] == "mail <EMAIL> or call <PHONE>"
    assert out["redacted"][1] == "two mails <EMAIL> <EMAIL> and <PHONE> <PHONE>"
    assert out["redacted"][2] == "no pii here 12-34 a@b (not an email TLD-less)"


def test_md5_u64_matches_duckdb():
    import duckdb

    ids = np.array([0, 1, 42, 123456789, 2**40], dtype=np.int64)
    got = md5_u64(ids)
    want = [
        duckdb.sql(
            f"SELECT md5_number_lower(CAST({int(i)} AS VARCHAR))"
        ).fetchone()[0]
        for i in ids
    ]
    assert list(got) == want


def test_hash_sample_deterministic_across_parallelism(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(2000, dtype=np.int64),
            "lang": np.where(np.arange(2000) % 3 == 0, "en", "de"),
        }
    )
    kw = dict(id_col="doc_id", stratum_col="lang",
              rates={"en": 250}, default_rate=500)
    a = hash_sample(
        ray.data.from_pandas(df, override_num_blocks=1), **kw
    ).take_all()
    b = hash_sample(
        ray.data.from_pandas(df, override_num_blocks=13), **kw
    ).take_all()
    ka = sorted(r["doc_id"] for r in a)
    kb = sorted(r["doc_id"] for r in b)
    assert ka == kb and 0 < len(ka) < 2000
    # stratified rates actually differ: en ~25%, de ~50%
    en = sum(1 for r in a if r["lang"] == "en") / (2000 / 3)
    de = sum(1 for r in a if r["lang"] == "de") / (2000 * 2 / 3)
    assert 0.18 < en < 0.33 < 0.42 < de < 0.58


def _naive_budget(df, budget):
    keep = []
    for lang, g in df.groupby("lang"):
        g = g.sort_values("doc_id")
        cum = g["w"].cumsum()
        keep.extend(g["doc_id"][cum <= budget])
    return sorted(keep)


@pytest.mark.parametrize("budget", [0, 7, 100, 10_000, 10**9])
def test_token_budget_mix_matches_naive(ray_session, budget):
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(n).astype(np.int64),
            "lang": rng.choice(["en", "de", "zh"], size=n),
            "w": rng.integers(0, 40, size=n).astype(np.int64),
        }
    )
    got = token_budget_mix(
        ray.data.from_pandas(df, override_num_blocks=9),
        id_col="doc_id", stratum_col="lang",
        weight_fn=lambda d: d["w"].to_numpy(dtype=np.int64),
        budget=budget, bucket_width=64,
    ).take_all()
    assert sorted(r["doc_id"] for r in got) == _naive_budget(df, budget)


def test_token_budget_exact_boundary(ray_session):
    # budget lands EXACTLY on a prefix sum, and exactly on a bucket edge
    df = pd.DataFrame(
        {
            "doc_id": np.arange(128, dtype=np.int64),
            "lang": ["en"] * 128,
            "w": np.ones(128, dtype=np.int64),
        }
    )
    for budget in (63, 64, 65, 128):
        got = token_budget_mix(
            ray.data.from_pandas(df, override_num_blocks=4),
            id_col="doc_id", stratum_col="lang",
            weight_fn=lambda d: d["w"].to_numpy(dtype=np.int64),
            budget=budget, bucket_width=64,
        ).take_all()
        assert sorted(r["doc_id"] for r in got) == list(range(budget))


def test_weighted_hash_sample_proportional_and_invariant(ray_session):
    """Inclusion rate tracks the weight; output is identical at any
    parallelism; cap at probability 1 works."""
    import pandas as pd

    from database_delta_plugins_ray.stages.sample import (
        md5_u64,
        weighted_hash_sample,
    )

    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n),
        # three weight classes: 100 (10%), 500 (50%), 2000 (capped 100%)
        "w": np.where(np.arange(n) % 3 == 0, 100,
                      np.where(np.arange(n) % 3 == 1, 500, 2000)),
    })

    def wfn(t):
        # pyarrow batch contract
        return t["w"].to_numpy(zero_copy_only=False).astype(np.int64)

    got = {}
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        out = pd.DataFrame(weighted_hash_sample(
            ds, id_col="id", weight_fn=wfn, denom=1000).take_all())
        got[nblocks] = set(out["id"])
    assert got[1] == got[7]  # parallelism-invariant

    picked = got[1]
    # capped class: every row kept
    assert all(i in picked for i in range(n) if i % 3 == 2)
    # rates within binomial noise of w/1000
    r100 = sum(1 for i in picked if i % 3 == 0) / (n / 3)
    r500 = sum(1 for i in picked if i % 3 == 1) / (n / 3)
    assert 0.06 < r100 < 0.14
    assert 0.44 < r500 < 0.56
    # membership equals the integer rule exactly
    h = md5_u64(df["id"].to_numpy()) % np.uint64(1000)
    want = set(df["id"][h.astype(np.int64) < df["w"].to_numpy()])
    assert picked == want


def test_temperature_quota_sample(ray_session):
    """τ=2 quotas: sqrt-weighted integer quotas, smallest-hash picks,
    parallelism-invariant, matches a naive reference computation."""
    import math

    from database_delta_plugins_ray.stages.sample import (
        md5_u64,
        temperature_quota_sample,
    )

    rng = np.random.default_rng(5)
    # very skewed source sizes: 'big' should be downweighted vs share
    sizes = {"big": 3000, "mid": 300, "tiny": 30}
    rows = []
    nid = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((nid, s))
            nid += 1
    df = pd.DataFrame(rows, columns=["doc_id", "source"])
    df = df.sample(frac=1, random_state=3).reset_index(drop=True)
    budget = 120

    # naive reference
    wgt = {s: math.floor(math.sqrt(n) * (1 << 20)) for s, n in sizes.items()}
    tw = sum(wgt.values())
    quota = {s: (budget * w) // tw for s, w in wgt.items()}
    h = md5_u64(df["doc_id"].to_numpy())
    ref = (pd.DataFrame({"doc_id": df["doc_id"], "source": df["source"],
                         "h": h})
           .sort_values(["h", "doc_id"])
           .groupby("source", sort=False)
           .apply(lambda g: g.head(quota[g.name]), include_groups=False))
    want = sorted(ref["doc_id"])

    got = {}
    for nblocks in (1, 11):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        out = temperature_quota_sample(
            ds, budget=budget, group_col="source", id_col="doc_id"
        ).take_all()
        got[nblocks] = sorted(r["doc_id"] for r in out)
    assert got[1] == got[11] == want
    # temperature upweights small sources: tiny's share of the draw
    # exceeds its corpus share (30/3330 < 1%), big's is below its 90%
    out = pd.DataFrame([{"doc_id": d} for d in got[1]])
    n_tiny = sum(1 for d in got[1] if d >= 3300)
    n_big = sum(1 for d in got[1] if d < 3000)
    assert n_tiny / len(got[1]) > 0.02
    assert n_big / len(got[1]) < 0.85
