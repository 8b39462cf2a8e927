"""Unigram-LM tokenizer gates (stages/unigram.py).

Rows-only at the driver; these tests carry correctness: an independent
single-process reference implementing the same spec (histogram EM with
fixed-point expected counts and the expected-count prune), a planted
corpus, parallelism invariance of the integer fold, chars-never-pruned,
and Viterbi encode properties."""
import math
import re
from collections import Counter

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TOKEN = re.compile(r"[A-Za-z0-9_]+")
SCALE = 1 << 20


# ---------------------------------------------------------------------------
# independent single-process reference (plain dict/loop implementation)
# ---------------------------------------------------------------------------


def ref_train(texts, vocab_size, max_piece_len, seed_size, em_iters=2,
              shrink=0.75):
    words = Counter()
    for t in texts:
        for w in TOKEN.findall((t or "").lower()):
            words[w] += 1

    # substring seeding
    sub = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                sub[w[i:i + ln]] += c
    ordered = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))
    pieces = [p for p, _ in ordered[:seed_size]]
    for p, _ in ordered:
        if len(p) == 1 and p not in pieces:
            pieces.append(p)
    score = {p: sub[p] for p in pieces}
    tot = sum(score.values()) or 1.0
    logp = {p: (math.log(score[p] / tot) if score[p] > 0 else -1e9)
            for p in pieces}

    def word_expected(w):
        n = len(w)
        edges = [[] for _ in range(n)]
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                p = w[i:i + ln]
                if p in logp:
                    edges[i].append((i + ln, p))

        def logadd(a, b):
            if a is None:
                return b
            if b is None:
                return a
            if a < b:
                a, b = b, a
            return a + math.log1p(math.exp(b - a))

        alpha = [None] * (n + 1)
        alpha[0] = 0.0
        for i in range(n):
            if alpha[i] is None:
                continue
            for j, p in edges[i]:
                alpha[j] = logadd(alpha[j], alpha[i] + logp[p])
        z = alpha[n]
        if z is None:
            return {}, None
        beta = [None] * (n + 1)
        beta[n] = 0.0
        for i in range(n - 1, -1, -1):
            acc = None
            for j, p in edges[i]:
                if beta[j] is not None:
                    acc = logadd(acc, logp[p] + beta[j])
            beta[i] = acc
        ec = {}
        for i in range(n):
            if alpha[i] is None:
                continue
            for j, p in edges[i]:
                if beta[j] is None:
                    continue
                ec[p] = ec.get(p, 0.0) + math.exp(
                    alpha[i] + logp[p] + beta[j] - z)
        return ec, z

    def e_step():
        q = {p: 0 for p in pieces}
        for w, c in words.items():
            ec, _ = word_expected(w)
            for p, e in ec.items():
                qq = int(math.floor(e * c * SCALE + 0.5))
                if qq:
                    q[p] += qq
        return q

    q = {p: 0 for p in pieces}
    while True:
        for _ in range(em_iters):
            q = e_step()
            tq = sum(q.values()) or 1
            logp = {p: (math.log(q[p] / tq) if q[p] > 0 else -1e9)
                    for p in pieces}
        n = len(pieces)
        if n <= vocab_size:
            break
        ordered = sorted(pieces, key=lambda p: (-q[p], p))
        chars = [p for p in ordered if len(p) == 1]
        multi = [p for p in ordered if len(p) > 1]
        target = max(vocab_size, int(n * shrink))
        keep_multi = max(0, target - len(chars))
        kept = set(chars) | set(multi[:keep_multi])
        pieces = [p for p in ordered if p in kept]
        tq = sum(q[p] for p in pieces) or 1
        logp = {p: (math.log(q[p] / tq) if q[p] > 0 else -1e9)
                for p in pieces}
    return sorted(((p, q[p]) for p in pieces), key=lambda kv: (-kv[1], kv[0]))


@pytest.fixture(scope="module")
def fixture_docs():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    return t.column("text").to_pylist()[:120]


def test_parity_vs_reference(ray_session, fixture_docs):
    import ray

    from database_delta_plugins_ray.stages.unigram import train_unigram

    ds = ray.data.from_pandas(pd.DataFrame({"text": fixture_docs}))
    got = train_unigram(ds, vocab_size=48, max_piece_len=5, seed_size=160)
    want = ref_train(fixture_docs, vocab_size=48, max_piece_len=5,
                     seed_size=160)
    assert list(zip(got["piece"], got["q_count"])) == want


def test_parallelism_invariance(ray_session, fixture_docs):
    import ray

    from database_delta_plugins_ray.stages.unigram import train_unigram

    df = pd.DataFrame({"text": fixture_docs})
    a = train_unigram(ray.data.from_pandas(df).repartition(1),
                      vocab_size=48, max_piece_len=5, seed_size=160)
    b = train_unigram(ray.data.from_pandas(df).repartition(7),
                      vocab_size=48, max_piece_len=5, seed_size=160)
    assert a["piece"].tolist() == b["piece"].tolist()
    assert a["q_count"].tolist() == b["q_count"].tolist()
    assert a["logprob"].tolist() == b["logprob"].tolist()


def test_planted_pieces_and_chars_kept(ray_session):
    import ray

    from database_delta_plugins_ray.stages.unigram import train_unigram

    docs = pd.DataFrame({"text": ["abab abab cdcd abab",
                                  "cdcd abab xyz",
                                  "abab cdcd cdcd"] * 8})
    v = train_unigram(ray.data.from_pandas(docs), vocab_size=12,
                      max_piece_len=4)
    pieces = v["piece"].tolist()
    # EM concentrates mass on the planted whole words
    top3 = pieces[:3]
    assert set(top3) == {"abab", "cdcd", "xyz"}
    # every corpus character survives pruning
    for ch in "abcdxyz":
        assert ch in pieces
    # q is the final E-step's exact integer fold: whole words win all
    # the mass, chars end at zero
    q = dict(zip(v["piece"], v["q_count"]))
    assert q["abab"] > q["cdcd"] > q["xyz"] > 0
    assert q["a"] == 0


def test_viterbi_encode_roundtrip_and_unk(ray_session):
    import ray

    from database_delta_plugins_ray.stages.unigram import (
        UNK, train_unigram, unigram_encode_words)

    docs = pd.DataFrame({"text": ["hello hell low low hello"] * 6})
    v = train_unigram(ray.data.from_pandas(docs), vocab_size=16,
                      max_piece_len=5)
    enc = unigram_encode_words(["hello", "hell", "low", "qqq"], v)
    vocab = set(v["piece"])
    for w, toks in zip(["hello", "hell", "low"], enc[:3]):
        assert "".join(toks) == w
        assert all(t in vocab for t in toks)
    # 'q' never appears in the corpus: every char maps to <unk>
    assert enc[3] == (UNK, UNK, UNK)


def test_encode_stats_totals(ray_session, fixture_docs):
    import ray

    from database_delta_plugins_ray.stages.unigram import (
        train_unigram, unigram_encode_stats, unigram_encode_words)

    ds = ray.data.from_pandas(pd.DataFrame({"text": fixture_docs}))
    v = train_unigram(ds, vocab_size=48, max_piece_len=5, seed_size=160)
    st = unigram_encode_stats(pd.Series(fixture_docs), v)
    # single-process recount over the same Viterbi
    for i, t in enumerate(fixture_docs[:20]):
        words = TOKEN.findall((t or "").lower())
        toks = unigram_encode_words(words, v)
        assert st["n_words"].iloc[i] == len(words)
        assert st["n_pieces"].iloc[i] == sum(len(x) for x in toks)
        assert st["n_chars"].iloc[i] == len(t or "")


def test_vocab_size_below_char_count_terminates(ray_session):
    import ray

    from database_delta_plugins_ray.stages.unigram import train_unigram

    docs = pd.DataFrame({"text": ["abcdefgh ijklmnop qrstuvwx yz012345"] * 4})
    # 30+ distinct chars, vocab_size 8: chars are never pruned, so the
    # result bottoms out at the char set instead of looping forever
    v = train_unigram(ray.data.from_pandas(docs), vocab_size=8,
                      max_piece_len=4)
    assert (v["piece"].str.len() == 1).all()
    assert len(v) >= 28


def test_local_fast_path_bit_equals_distributed(ray_session, monkeypatch):
    """The small-histogram driver-local EM path must produce the
    bit-identical vocabulary as the distributed fold (int64 sums are
    order-free; the kernels are shared)."""
    import ray.data

    from database_delta_plugins_ray.stages.unigram import train_unigram

    df = pd.DataFrame({"text": [
        "the cat sat on the mat", "the bat and the cat",
        "mats and bats and cats", "a cat a mat a bat"] * 5})
    ds = ray.data.from_pandas(df).repartition(3)
    local = train_unigram(ds, vocab_size=32, max_piece_len=4)
    monkeypatch.setenv("RAY_GRAFT_UNIGRAM_LOCAL_WORDS", "0")
    dist = train_unigram(ds, vocab_size=32, max_piece_len=4)
    pd.testing.assert_frame_equal(local, dist)
