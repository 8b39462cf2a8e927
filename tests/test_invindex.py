"""Inverted index: build, pruned-bucket lookup, AND/OR semantics,
source-tag invalidation."""

import glob
import os

import pandas as pd
import pytest
import ray.data

from database_delta_plugins_ray.stages.invindex import InvertedIndex, _tok_bucket

DOCS = [
    {"doc_id": "a", "text": "alpha beta beta gamma"},
    {"doc_id": "b", "text": "alpha gamma gamma"},
    {"doc_id": "c", "text": "beta delta"},
    {"doc_id": "d", "text": "Alpha BETA"},          # case folds
    {"doc_id": "e", "text": ""},                    # empty doc
]


@pytest.fixture()
def index(ray_session, tmp_path):
    ds = ray.data.from_items(DOCS)
    return InvertedIndex.build(ds, str(tmp_path / "idx"), n_buckets=8,
                               source_tag="v1")


def _rows(ds):
    return {r["doc_id"]: (r["score"], r["n_terms"]) for r in ds.take_all()}


def test_and_or_semantics(index):
    got = _rows(index.lookup(["alpha", "beta"], mode="and"))
    # docs containing BOTH: a (1+2), d (1+1)
    assert got == {"a": (3, 2), "d": (2, 2)}

    got = _rows(index.lookup(["alpha", "beta"], mode="or"))
    assert got == {"a": (3, 2), "b": (1, 1), "c": (1, 1), "d": (2, 2)}

    # case-insensitive query terms
    assert _rows(index.lookup(["ALPHA", "Beta"], mode="and")) == \
        {"a": (3, 2), "d": (2, 2)}


def test_lookup_reads_only_term_buckets(index):
    all_files = glob.glob(os.path.join(index.index_dir, "data",
                                       "bucket=*", "*.parquet"))
    want = index.postings_files(["delta"])
    b = _tok_bucket(pd.array(["delta"], dtype=object).to_numpy(), 8)[0]
    assert all(f"bucket={b}" in f for f in want)
    assert len(want) < len(all_files)
    got = _rows(index.lookup(["delta"]))
    assert got == {"c": (1, 1)}


def test_topk_and_absent_terms(index):
    top = index.lookup(["gamma"], k=1).take_all()
    assert len(top) == 1 and top[0]["doc_id"] == "b"  # tf 2 beats tf 1
    assert index.lookup(["nosuchtoken"]).take_all() == []


def test_ensure_rebuilds_on_new_source_tag(ray_session, tmp_path):
    d = str(tmp_path / "idx2")
    calls = []

    def mk():
        calls.append(1)
        return ray.data.from_items(DOCS)

    i1 = InvertedIndex.ensure(mk, d, "tag1", n_buckets=8)
    i2 = InvertedIndex.ensure(mk, d, "tag1", n_buckets=8)  # cache hit
    assert len(calls) == 1
    assert i2.meta["source_tag"] == "tag1"
    InvertedIndex.ensure(mk, d, "tag2", n_buckets=8)       # invalidated
    assert len(calls) == 2
    assert _rows(InvertedIndex(d).lookup(["beta"]))["c"] == (1, 1)


def test_bm25_brute_parity(index):
    import numpy as np

    got = {r["doc_id"]: r["score_micros"]
           for r in index.lookup_bm25(["alpha", "gamma"],
                                      mode="or").take_all()}
    # brute force over the planted corpus
    toks = {d["doc_id"]: d["text"].lower().split() for d in DOCS}
    n_docs = len(DOCS)
    total = sum(len(t) for t in toks.values())
    avgdl = total / n_docs
    want = {}
    for term in ("alpha", "gamma"):
        df = sum(1 for t in toks.values() if term in t)
        idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for did, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            s = idf * tf * (1.2 + 1.0) / (
                tf + 1.2 * (1.0 - 0.75 + 0.75 * len(t) / avgdl))
            want[did] = want.get(did, 0) + int(np.floor(s * 1e6 + 0.5))
    assert got == want
    # AND narrows to docs holding both terms
    both = {r["doc_id"] for r in
            index.lookup_bm25(["alpha", "gamma"], mode="and").take_all()}
    assert both == {"a", "b"}
