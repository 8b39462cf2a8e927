"""Kneser–Ney bigram LM surprise gates (analytics.py
kn_bigram_surprise_documents). The driver gate is hash-exact vs a
DuckDB oracle; these tests add an independent single-process reference,
parallelism invariance of the integer fold, and a planted
common-vs-rare sanity check."""
import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TOKEN = re.compile(r"[A-Za-z0-9_]+")


def ref_kn(texts, vocab_cap=1000, d=0.75):
    """Plain dict/loop implementation of the same spec."""
    tok_docs = [TOKEN.findall((t or "").lower()) for t in texts]
    df_counter = Counter()
    for toks in tok_docs:
        df_counter.update(set(toks))
    vocab = set(t for t, _ in sorted(
        df_counter.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap])

    def mapped(toks):
        return [t if t in vocab else "<unk>" for t in toks]

    big = Counter()
    for toks in tok_docs:
        m = mapped(toks)
        for a, b in zip(m, m[1:]):
            big[(a, b)] += 1
    c1 = Counter()
    n1p = Counter()
    nc = Counter()
    for (a, b), c in big.items():
        c1[a] += c
        n1p[a] += 1
        nc[b] += 1
    T = float(len(big))
    s = {}
    for (a, b), c in big.items():
        p = (max(float(c) - d, 0.0)
             + (d * float(n1p[a])) * (float(nc[b]) / T)) / float(c1[a])
        s[(a, b)] = int(math.floor(math.log(p) * 1e6 + 0.5))
    out = []
    for i, toks in enumerate(tok_docs):
        m = mapped(toks)
        pairs = list(zip(m, m[1:]))
        out.append((i, len(pairs), -sum(s[p] for p in pairs)))
    return out


def test_parity_vs_reference(ray_session):
    import pyarrow.parquet as pq
    import ray

    from database_delta_plugins_ray.pipelines.analytics import (
        kn_bigram_surprise_documents)

    texts = pq.read_table(f"{SF_DIR}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    got = (kn_bigram_surprise_documents(SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = ref_kn(texts)
    assert len(got) == len(want)
    for (i, nb, ss), (_, row) in zip(want, got.iterrows()):
        assert row["n_bigrams"] == nb
        assert row["kn_surprise_sum_micros"] == ss


def test_parallelism_invariance(ray_session, tmp_path, monkeypatch):
    import pyarrow.parquet as pq
    import ray

    from database_delta_plugins_ray.pipelines import analytics as an

    runs = []
    orig = an._t

    for parts in (1, 7):
        def t_patched(sf_dir, name, columns=None, _p=parts):
            return orig(sf_dir, name, columns).repartition(_p)

        monkeypatch.setattr(an, "_t", t_patched)
        runs.append(an.kn_bigram_surprise_documents(SF_DIR).to_pandas()
                    .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setattr(an, "_t", orig)
    pd.testing.assert_frame_equal(runs[0], runs[1])


def test_common_bigrams_less_surprising(ray_session):
    import ray

    from database_delta_plugins_ray.pipelines import analytics as an

    # doc 0 repeats one dominant bigram; doc 1 is all distinct pairs —
    # per-bigram surprise must rank the dominant doc lower
    texts = (["alpha beta"] * 30
             + ["alpha beta alpha beta alpha beta alpha beta",
                "gamma delta epsilon zeta eta theta iota kappa"])
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    p = "/tmp/knlm_fixture"
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(p, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df), f"{p}/documents.parquet")
    out = (an.kn_bigram_surprise_documents(p).to_pandas()
           .set_index("doc_id"))
    common = out.loc[30]
    rare = out.loc[31]
    per_c = common["kn_surprise_sum_micros"] / common["n_bigrams"]
    per_r = rare["kn_surprise_sum_micros"] / rare["n_bigrams"]
    assert per_c < per_r


def test_vocab_fold_tree_equals_shuffle(ray_session):
    """_vocab_tf_df's AggregateFn tree fold (default) must be
    row-identical to the distributed groupby shuffle path, including
    the (df desc, tok) cap tie-break."""
    from database_delta_plugins_ray.pipelines import analytics as A

    ds = A._t(SF_DIR, "documents", ["doc_id", "text"])
    tree = A._vocab_tf_df(ds, 500).reset_index(drop=True)
    shuf = A._vocab_tf_df(ds, 500, fold="shuffle").reset_index(drop=True)
    pd.testing.assert_frame_equal(tree, shuf, check_dtype=True)
