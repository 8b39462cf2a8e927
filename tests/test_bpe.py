"""Distributed BPE training/encoding gates (stages/bpe.py).

The driver gate for ``bpe_train_documents`` / ``bpe_corpus_compression``
is rows-only (iterative training has no SQL shape), so these tests ARE
the correctness story: a hand-computed planted merge sequence, an
INDEPENDENT naive single-process reference over the real fixture, and
parallelism invariance of the distributed histogram."""
import collections
import re

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TOKEN = re.compile(r"[A-Za-z0-9_]+")


def naive_bpe(word_counts: dict, num_merges: int):
    """Independent reference: textbook dict-based BPE (Sennrich 2016,
    fig. 1 shape), same tiebreak contract (count DESC, pair ASC)."""
    vocab = {tuple(w) + ("</w>",): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        merges.append((l, r, freq))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges, vocab


def corpus_word_counts(texts) -> dict:
    c = collections.Counter()
    for t in texts:
        if isinstance(t, str):
            c.update(TOKEN.findall(t.lower()))
    return dict(c)


def test_planted_merge_sequence():
    from database_delta_plugins_ray.stages.bpe import train_bpe

    # {aa:2, ab:1}: pairs (a,a):2 (a,</w>):2 (a,b):1 (b,</w>):1 —
    # tie at 2 breaks to ("a","</w>") (lex: "<" sorts before "a"),
    # then (a,a</w>):2 merges, then everything is singleton freq.
    m = train_bpe({"aa": 2, "ab": 1}, 10)
    assert list(zip(m["left"], m["right"], m["freq"])) == [
        ("a", "</w>", 2), ("a", "a</w>", 2)]
    assert m["rank"].tolist() == [0, 1]


def test_train_matches_independent_reference_on_fixture():
    from database_delta_plugins_ray.stages.bpe import train_bpe

    texts = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                            columns=["text"])["text"]
    wc = corpus_word_counts(texts)
    ref, _ = naive_bpe(wc, 40)
    got = train_bpe(wc, 40)
    assert [tuple(r) for r in
            got[["left", "right", "freq"]].itertuples(index=False)] == ref
    assert len(got) > 0  # the fixture corpus actually trains something


def test_distributed_train_equals_local(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        BPE_MERGES, bpe_train_documents)
    from database_delta_plugins_ray.stages.bpe import train_bpe

    texts = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                            columns=["text"])["text"]
    local = train_bpe(corpus_word_counts(texts), BPE_MERGES)
    dist = bpe_train_documents(SF_DIR)
    pd.testing.assert_frame_equal(dist, local)


def test_histogram_parallelism_invariance_and_cap(ray_session):
    import ray

    from database_delta_plugins_ray.stages.bpe import word_histogram

    df = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["text"]).head(200)
    h1 = word_histogram(ray.data.from_pandas(df))
    h8 = word_histogram(ray.data.from_pandas(df).repartition(8))
    pd.testing.assert_frame_equal(h1, h8)
    # counts match an exact Counter and the cap is the sorted head
    wc = corpus_word_counts(df["text"])
    assert dict(zip(h1["word"], h1["cnt"])) == wc
    capped = word_histogram(ray.data.from_pandas(df), max_words=5)
    pd.testing.assert_frame_equal(capped, h1.head(5))


def test_encode_reproduces_training_segmentation():
    from database_delta_plugins_ray.stages.bpe import (
        encode_words, train_bpe)

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(wc, 30)
    _, final_vocab = naive_bpe(wc, 30)
    expect = {"".join(s).replace("</w>", ""): s for s in final_vocab}
    got = encode_words(list(wc), merges)
    for w, toks in zip(list(wc), got):
        assert toks == expect[w], (w, toks, expect[w])


def test_corpus_compression_matches_single_process(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        BPE_MERGES, bpe_corpus_compression)
    from database_delta_plugins_ray.stages.bpe import (
        encode_stats, train_bpe)

    res = bpe_corpus_compression(SF_DIR)
    df = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["lang", "text"])
    merges = train_bpe(corpus_word_counts(df["text"]), BPE_MERGES)
    st = encode_stats(df["text"], merges)
    st["lang"] = df["lang"].to_numpy()
    exp = (st.groupby("lang", as_index=False)
           .agg(n_docs=("n_words", "size"),
                total_words=("n_words", "sum"),
                total_subword_tokens=("n_subword_tokens", "sum"),
                total_chars=("n_chars", "sum"))
           .sort_values("lang").reset_index(drop=True))
    for c in exp.columns[1:]:
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(res, exp)
    # subword tokens strictly compress vs characters, and every word
    # yields at least one token
    assert (res["total_subword_tokens"] < res["total_chars"]).all()
    assert (res["total_subword_tokens"] >= res["total_words"]).all()


def test_encode_stats_null_and_empty():
    from database_delta_plugins_ray.stages.bpe import (
        encode_stats, train_bpe)

    merges = train_bpe({"aa": 3}, 5)
    st = encode_stats(pd.Series([None, "", "aa aa"]), merges)
    assert st["n_words"].tolist() == [0, 0, 2]
    assert st["n_subword_tokens"].tolist() == [0, 0, 2]
    assert st["n_chars"].tolist() == [0, 0, 5]
