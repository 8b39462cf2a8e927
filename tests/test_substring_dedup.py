"""ExactSubstr-style substring dedup gates (dedup_substring_documents).

Rows-only at the driver, so these tests carry correctness: a planted
shared span, an independent brute-force n-gram-counter reference over
the real fixture, and parallelism invariance."""
import collections
import re

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TOKEN = re.compile(r"[A-Za-z0-9_]+")


def brute(docs: dict, n: int) -> pd.DataFrame:
    """Independent reference: Counter over token n-gram tuples, then
    per-doc span coverage of grams with global count >= 2."""
    toks = {i: TOKEN.findall((t or "").lower()) for i, t in docs.items()}
    cnt = collections.Counter()
    for ts in toks.values():
        for i in range(len(ts) - n + 1):
            cnt[tuple(ts[i:i + n])] += 1
    dup = {g for g, c in cnt.items() if c >= 2}
    rows = []
    for i in sorted(docs):
        ts = toks[i]
        starts = [j for j in range(len(ts) - n + 1)
                  if tuple(ts[j:j + n]) in dup]
        if not starts:
            continue
        covered = set()
        for j in starts:
            covered.update(range(j, j + n))
        rows.append({"doc_id": i, "n_tokens": len(ts),
                     "dup_grams": len(starts), "dup_tokens": len(covered)})
    return pd.DataFrame(rows, columns=[
        "doc_id", "n_tokens", "dup_grams", "dup_tokens"]).astype("int64")


def write_docs(tmp_path, docs: dict) -> str:
    pd.DataFrame({
        "doc_id": list(docs), "text": list(docs.values()),
    }).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_planted_shared_span(ray_session, tmp_path):
    from database_delta_plugins_ray.pipelines.analytics import (
        dedup_substring_documents)

    span = " ".join(f"tok{i}" for i in range(30))
    docs = {
        1: "alpha beta " + span + " gamma delta",
        2: span + " epsilon",
        3: "entirely unique words " + " ".join(
            f"only{i}" for i in range(40)),
        # within-doc repeat: the same 25-token run twice
        4: " ".join(f"rep{i % 25}" for i in range(50)),
    }
    res = dedup_substring_documents(write_docs(tmp_path, docs), n=20)
    exp = brute(docs, 20)
    pd.testing.assert_frame_equal(res, exp)
    assert set(res["doc_id"]) == {1, 2, 4}  # 3 stays clean
    # doc 2's 30 span tokens are covered; "epsilon" is not
    assert int(res.loc[res["doc_id"] == 2, "dup_tokens"].iloc[0]) == 30


def test_matches_brute_force_on_fixture(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        SUBSTR_N, dedup_substring_documents)

    df = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    exp = brute(dict(zip(df["doc_id"], df["text"])), SUBSTR_N)
    got = dedup_substring_documents(SF_DIR)
    pd.testing.assert_frame_equal(got, exp)


def test_parallelism_invariance(ray_session, tmp_path):
    from database_delta_plugins_ray.pipelines.analytics import (
        dedup_substring_documents)

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(30)]
    shared = " ".join(f"s{i}" for i in range(12))
    docs = {}
    for i in range(60):
        body = " ".join(rng.choice(vocab, 60))
        # a third of the docs carry a shared 12-token span mid-body
        docs[i] = (body[:len(body) // 2] + " " + shared + " "
                   + body[len(body) // 2:]) if i % 3 == 0 else body
    d = write_docs(tmp_path, docs)
    r1 = dedup_substring_documents(d, n=8)
    exp = brute(docs, 8)
    pd.testing.assert_frame_equal(r1, exp)
    # same result when the read splits into many blocks
    import ray

    from database_delta_plugins_ray.pipelines import analytics as A
    ds8 = ray.data.read_parquet(
        f"{d}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=8)
    orig = A._t
    try:
        A._t = lambda sf, name, columns=None: ds8
        r8 = dedup_substring_documents(d, n=8)
    finally:
        A._t = orig
    pd.testing.assert_frame_equal(r8, r1)


def test_short_and_null_docs(ray_session, tmp_path):
    from database_delta_plugins_ray.pipelines.analytics import (
        dedup_substring_documents)

    docs = {1: "too short", 2: "too short", 3: None}
    res = dedup_substring_documents(write_docs(tmp_path, docs), n=20)
    assert res.empty
    assert list(res.columns) == ["doc_id", "n_tokens", "dup_grams",
                                 "dup_tokens"]


def test_rewrite_removes_planted_span_everywhere(ray_session, tmp_path):
    """ExactSubstr removal: a span shared by two documents is cut from
    BOTH occurrences; clean documents pass through byte-identical; the
    rewrite's removal counts agree with the flag pipeline's coverage."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.pipelines.analytics import (
        SUBSTR_N, dedup_substring_documents,
        dedup_substring_rewrite_documents)

    span = " ".join(f"planted{i}" for i in range(SUBSTR_N + 5))
    uniq = lambda tag, m: " ".join(f"{tag}tok{j}" for j in range(m))
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [uniq("a", 30) + " " + span + " " + uniq("b", 30),
                 uniq("c", 25) + " " + span,
                 uniq("clean", 40)],
    })
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(sf, "documents.parquet"))

    out = (dedup_substring_rewrite_documents(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 3
    # every planted token is gone from both covered docs
    for i in (0, 1):
        for w in span.split():
            assert w not in out.loc[i, "text"].split(), (i, w)
        # the docs' unique tokens survive
    assert out.loc[0, "text"].split()[:30] == uniq("a", 30).split()
    assert out.loc[1, "text"].split() == uniq("c", 25).split()
    # clean doc is BYTE-identical (not re-joined)
    assert out.loc[2, "text"] == docs.loc[2, "text"]
    assert out.loc[2, "removed_tokens"] == 0
    # agreement with the flag pipeline's coverage counts
    flags = dedup_substring_documents(sf).set_index("doc_id")
    for did in (1, 2):
        assert (out.set_index("doc_id").loc[did, "removed_tokens"]
                == flags.loc[did, "dup_tokens"])

    # parallelism invariance
    out2 = (dedup_substring_rewrite_documents(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)
