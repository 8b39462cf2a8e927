"""Packed-token export with the unigram-LM tokenizer
(stages/tokexport.py tokenizer=("unigram", vocab)).

Gates: byte parity vs a single-process reference that segments with
the module's own Viterbi (the export machinery under test is the
distributed count/shuffle/write path), tokenizer-switch re-pack on the
same directory, and manifest arithmetic through read_sequences."""
import json
import os

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(ray_session):
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"]).slice(0, 150)
    return ray.data.from_arrow(t).repartition(5), t.to_pandas()


@pytest.fixture(scope="module")
def uni_model(ray_session, corpus):
    from database_delta_plugins_ray.stages.unigram import train_unigram

    ds, _ = corpus
    return train_unigram(ds, vocab_size=64, max_piece_len=5)


def _reference_stream(df, uni, vocab, nbuckets, key_cols=("doc_id",)):
    """Single-process byte stream per bucket via the module's own
    Viterbi + the export's documented md5 ordering."""
    import re

    from database_delta_plugins_ray.stages.sample import md5_u64
    from database_delta_plugins_ray.stages.tokexport import (
        EOD_ID, UNK_ID, _make_segmenter)

    seg = _make_segmenter(("unigram", uni))
    tok2id = dict(zip(vocab["token"], vocab["id"].astype(int)))
    token = re.compile(r"[A-Za-z0-9_]+")
    keys = df["doc_id"].astype(str).to_numpy(dtype=object)
    from database_delta_plugins_ray.stages.tokexport import _buckets_of

    b = _buckets_of(keys, nbuckets)
    out = {}
    for bucket in range(nbuckets):
        sub = df[b == bucket]
        kk = sub["doc_id"].astype(str).to_numpy(dtype=object)
        o = np.lexsort((kk, md5_u64(kk)))
        ids = []
        for t in sub["text"].iloc[o]:
            for w in token.findall((t or "").lower()):
                ids.extend(tok2id.get(s, UNK_ID) for s in seg(w))
            ids.append(EOD_ID)
        out[bucket] = np.array(ids, dtype="<u4").tobytes()
    return out


def test_unigram_export_byte_parity(ray_session, corpus, uni_model, tmp_path):
    from database_delta_plugins_ray.stages.tokexport import (
        build_token_vocab_spec, export_packed_tokens)
    from database_delta_plugins_ray.stages.bpe import word_histogram

    ds, df = corpus
    hist = word_histogram(ds)
    vocab = build_token_vocab_spec(hist, ("unigram", uni_model))
    out = str(tmp_path / "packed_uni")
    m = export_packed_tokens(ds, out, None, vocab, seq_tokens=32,
                             nbuckets=4, tokenizer=("unigram", uni_model),
                             source_tag="t1")
    assert m["tokenizer"] == "unigram"
    want = _reference_stream(df, uni_model, vocab, 4)
    for s in m["shards"]:
        with open(os.path.join(out, f"shard-{s['bucket']:05d}.bin"),
                  "rb") as fh:
            assert fh.read() == want[s["bucket"]]
    # tokenizer artifact is the unigram format
    with open(os.path.join(out, "tokenizer.json")) as fh:
        assert json.load(fh)["format"] == "unigram-vocab-v1"


def test_tokenizer_switch_sweeps_and_repacks(ray_session, corpus,
                                             uni_model, tmp_path):
    from database_delta_plugins_ray.stages.bpe import (
        train_bpe, word_histogram)
    from database_delta_plugins_ray.stages.tokexport import (
        build_token_vocab, build_token_vocab_spec, export_packed_tokens)

    ds, df = corpus
    hist = word_histogram(ds)
    merges = train_bpe(hist, 30)
    bvocab = build_token_vocab(hist, merges)
    out = str(tmp_path / "packed_switch")
    m1 = export_packed_tokens(ds, out, merges, bvocab, seq_tokens=32,
                              nbuckets=4, source_tag="t1")
    # same dir, same source_tag, different tokenizer family: the stale
    # manifest/shards must NOT fast-path — everything re-packs
    uvocab = build_token_vocab_spec(hist, ("unigram", uni_model))
    m2 = export_packed_tokens(ds, out, None, uvocab, seq_tokens=32,
                              nbuckets=4,
                              tokenizer=("unigram", uni_model),
                              source_tag="t1")
    assert m1["tokenizer"] == "bpe" and m2["tokenizer"] == "unigram"
    assert m2["total_tokens"] != 0
    want = _reference_stream(df, uni_model, uvocab, 4)
    for s in m2["shards"]:
        with open(os.path.join(out, f"shard-{s['bucket']:05d}.bin"),
                  "rb") as fh:
            assert fh.read() == want[s["bucket"]]
    # and the re-run at the same identity is a manifest no-op
    m3 = export_packed_tokens(ds, out, None, uvocab, seq_tokens=32,
                              nbuckets=4,
                              tokenizer=("unigram", uni_model),
                              source_tag="t1")
    assert m3 == m2


def test_read_sequences_on_unigram_pack(ray_session, corpus, uni_model,
                                        tmp_path):
    from database_delta_plugins_ray.stages.bpe import word_histogram
    from database_delta_plugins_ray.stages.tokexport import (
        build_token_vocab_spec, export_packed_tokens, num_sequences,
        read_sequences)

    ds, df = corpus
    hist = word_histogram(ds)
    vocab = build_token_vocab_spec(hist, ("unigram", uni_model))
    out = str(tmp_path / "packed_read")
    m = export_packed_tokens(ds, out, None, vocab, seq_tokens=16,
                             nbuckets=4, tokenizer=("unigram", uni_model),
                             source_tag="t1")
    n = num_sequences(out)
    assert n == m["total_tokens"] // 16
    # full flat stream == concatenated shard bytes
    full = np.concatenate([
        np.frombuffer(open(os.path.join(out,
                                        f"shard-{s['bucket']:05d}.bin"),
                           "rb").read(), dtype="<u4")
        for s in sorted(m["shards"], key=lambda s: s["start_token"])])
    seqs = read_sequences(out, list(range(n)))
    assert np.array_equal(seqs.ravel(), full[:n * 16])


def test_model_change_repacks(ray_session, corpus, tmp_path):
    from database_delta_plugins_ray.stages.bpe import word_histogram
    from database_delta_plugins_ray.stages.tokexport import (
        build_token_vocab_spec, export_packed_tokens)
    from database_delta_plugins_ray.stages.unigram import train_unigram

    ds, _ = corpus
    hist = word_histogram(ds)
    out = str(tmp_path / "packed_model_change")
    u1 = train_unigram(ds, vocab_size=48, max_piece_len=4)
    v1 = build_token_vocab_spec(hist, ("unigram", u1))
    m1 = export_packed_tokens(ds, out, None, v1, seq_tokens=32,
                              nbuckets=4, tokenizer=("unigram", u1),
                              source_tag="t1")
    # same source_tag + params, BIGGER trained model: must re-pack,
    # not fast-path the stale manifest
    u2 = train_unigram(ds, vocab_size=96, max_piece_len=5)
    v2 = build_token_vocab_spec(hist, ("unigram", u2))
    m2 = export_packed_tokens(ds, out, None, v2, seq_tokens=32,
                              nbuckets=4, tokenizer=("unigram", u2),
                              source_tag="t1")
    assert m2["model_tag"] != m1["model_tag"]
    assert m2["total_tokens"] != m1["total_tokens"] or \
        m2["model_tag"] != m1["model_tag"]
    # re-run with the same model is the manifest no-op
    m3 = export_packed_tokens(ds, out, None, v2, seq_tokens=32,
                              nbuckets=4, tokenizer=("unigram", u2),
                              source_tag="t1")
    assert m3 == m2
