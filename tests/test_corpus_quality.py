"""Decontamination (n-gram overlap vs eval set), Gopher-style repetition
stats, and the Q5 join-chain pipeline."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from database_delta_plugins_ray.functions.text import (
    ngram_hashes,
    repetition_stats,
)


def _brute_grams(text: str, n: int) -> set:
    import re

    toks = re.findall(r"[a-z0-9_]+", text.lower())
    return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_ngram_hashes_match_string_grams():
    texts = pd.Series([
        "the quick brown fox jumps over the lazy dog",
        "the quick brown cat",
        "short",
        "",
        "a b a b a b",  # repeated grams collapse to few uniques
    ])
    h, di = ngram_hashes(texts, 3)
    # per-doc unique hash count == per-doc unique string-gram count
    for d in range(len(texts)):
        want = _brute_grams(texts[d], 3)
        got = np.unique(h[di == d])
        assert len(got) == len(want), texts[d]
    # identical gram in two docs -> identical hash ("the quick brown")
    h0 = set(h[di == 0])
    h1 = set(h[di == 1])
    assert h0 & h1


def test_ngram_hashes_never_cross_documents():
    # docs of 2 tokens each produce NO 3-grams even though the flat
    # token stream is long
    texts = pd.Series(["a b", "c d", "e f"])
    h, di = ngram_hashes(texts, 3)
    assert len(h) == 0


def test_repetition_stats_brute_parity():
    texts = pd.Series([
        "a a a a b",           # top=4/5 tokens, dup bigrams: "a a" x3
        "w1 w2 w3 w4 w5",      # no repetition
        "x",                   # single token: no bigrams
        "",                    # empty
        "go go go go go go",   # fully repeated
    ])
    out = repetition_stats(texts)
    assert list(out["n_tokens"]) == [5, 5, 1, 0, 6]
    assert list(out["top_token_n"]) == [4, 1, 1, 0, 6]
    assert list(out["n_bigrams"]) == [4, 4, 0, 0, 5]
    # "a a a a b": bigrams [aa,aa,aa,ab] -> 2 distinct -> dup 2
    assert list(out["dup_bigram_n"]) == [2, 0, 0, 0, 4]
    # flagged: 5*4>5 yes; no; 5*1>1 yes; no (0>0 false); yes
    assert list(out["flagged"]) == [1, 0, 1, 0, 1]


def test_decontamination_planted(ray_session):
    from database_delta_plugins_ray.stages.decontaminate import (
        EVAL_MOD,
        decontaminate,
        eval_gram_hashes,
    )

    # doc 0 (eval: 0 % 97 == 0) shares the 3-gram "alpha beta gamma"
    # with doc 5; doc 7 shares nothing; doc 97 is eval too
    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},
        {"doc_id": 5, "text": "zz yy alpha beta gamma xx"},
        {"doc_id": 7, "text": "unrelated words entirely here"},
        {"doc_id": 97, "text": "held out benchmark row"},
        {"doc_id": 12, "text": "held out benchmark"},  # 3-gram of doc 97
    ]
    ds = ray.data.from_items(rows)
    ev = eval_gram_hashes(ds, n=3)
    out = decontaminate(ds, ray.put(ev), n=3).to_pandas()
    got = dict(zip(out["doc_id"], out["contaminated"]))
    # eval docs excluded from the output
    assert set(got) == {5, 7, 12}
    assert got == {5: 1, 7: 0, 12: 1}
    # invariant under batch size (broadcast membership has no cross-batch
    # state)
    out2 = (decontaminate(ds.repartition(5), ray.put(ev), n=3)
            .to_pandas().sort_values("doc_id"))
    assert list(out2["contaminated"]) == [
        got[d] for d in sorted(got)]


def test_passage_dedup_planted(ray_session):
    from database_delta_plugins_ray.stages.linededup import passage_dedup

    c1 = "a b c d e"          # 5-token passage (chunk=5)
    c2 = "f g h i j"
    c3 = "k l m n o"
    rows = [
        # doc 3 holds the first occurrence of c1 (lowest doc_id)
        {"doc_id": 3, "text": f"{c1} {c2}"},
        # doc 8 repeats c1 (cut) and introduces c3 (kept)
        {"doc_id": 8, "text": f"{c1} {c3}"},
        # c3's first occurrence is doc 8, so BOTH doc-9 copies are cut
        {"doc_id": 9, "text": f"{c3} {c3}"},
        {"doc_id": 11, "text": "p q"},   # short tail chunk, unique
        {"doc_id": 12, "text": ""},      # empty doc
    ]
    ds = ray.data.from_items(rows)
    out = (passage_dedup(ds, chunk=5, nparts=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    got = {r.doc_id: (r.dedup_text, r.n_chunks, r.n_kept)
           for r in out.itertuples()}
    assert got[3] == (f"{c1} {c2}", 2, 2)
    assert got[8] == (c3, 2, 1)
    assert got[9] == ("", 2, 0)
    assert got[11] == ("p q", 1, 1)
    assert got[12] == ("", 0, 0)
    # invariant under input partitioning (winner rule is (doc_id, pos),
    # not arrival order)
    out2 = (passage_dedup(ds.repartition(5), chunk=5, nparts=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


def test_hll_accuracy_and_merge():
    from database_delta_plugins_ray.functions.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    vals = np.arange(200_000, dtype=np.int64)  # past linear-counting range
    regs = hll_registers(vals, p=12)
    est = hll_estimate(regs)
    assert abs(est - 200_000) / 200_000 < 0.05
    # mergeability: sketch(all) == merge(sketch(half1), sketch(half2)),
    # including overlapping halves (idempotent union)
    a = hll_registers(vals[:120_000], p=12)
    b = hll_registers(vals[80_000:], p=12)
    assert np.array_equal(hll_merge(a, b), regs)
    # deterministic across calls
    assert np.array_equal(hll_registers(vals, p=12), regs)
    # small range falls back to exact-ish linear counting
    small = hll_registers(np.arange(100), p=12)
    assert abs(hll_estimate(small) - 100) < 3


def test_flat_tokens_null_safe():
    from database_delta_plugins_ray.functions.text import (
        _flat_lower_tokens,
        ngram_hashes,
        repetition_stats,
        simhash64_many,
    )

    texts = pd.Series(["a b c", None, "d e"])
    flat, di, lens = _flat_lower_tokens(texts)
    assert list(lens) == [3, 0, 2] and len(flat) == 5
    assert list(repetition_stats(texts)["n_tokens"]) == [3, 0, 2]
    h, _ = ngram_hashes(texts, 2)
    assert len(h) == 3  # "a b","b c","d e"
    assert simhash64_many(texts)[1] == 0


def test_heavy_hitter_bound_truncating_regime():
    # capacity 2 over counts [10, 8, 5, 3]: d = 5 -> survivors a(5), b(3)
    # with per-item err 5; dropped mass from partials is 0 here, so the
    # reported bound must be exactly errs (no double-count of the final
    # truncation)
    from database_delta_plugins_ray.functions.sketch import mg_truncate

    items = np.array(["a", "b", "c", "d"], dtype=object)
    counts = np.array([10, 8, 5, 3], dtype=np.int64)
    errs = np.zeros(4, dtype=np.int64)
    it, c, e, d = mg_truncate(items, counts, errs, 2)
    assert list(it) == ["a", "b"] and list(c) == [5, 3]
    assert list(e) == [5, 5] and d == 5
    # true counts lie inside [c, c+e] with no extra slack needed
    assert c[0] <= 10 <= c[0] + e[0]
    assert c[1] <= 8 <= c[1] + e[1]


def test_mg_truncation_bound():
    from database_delta_plugins_ray.functions.sketch import (
        mg_partial,
        mg_truncate,
    )

    rng = np.random.default_rng(7)
    # skewed stream: heavy item "h" 5000x, 500 distinct light items
    stream = np.array(
        ["h"] * 5000 + [f"t{i}" for i in rng.integers(0, 500, 8000)],
        dtype=object)
    rng.shuffle(stream)
    truth = pd.Series(stream).value_counts()
    # split into 8 "batches", capacity far below distinct count
    caps = 32
    merged = {}
    errs = {}
    dropped = 0
    for part in np.array_split(stream, 8):
        items, counts, es, d = mg_partial(part, caps)
        assert len(items) <= caps and d >= 0
        for it, c, e in zip(items, counts, es):
            merged[it] = merged.get(it, 0) + c
            errs[it] = errs.get(it, 0) + e
        dropped += d
    items = np.array(list(merged), dtype=object)
    counts = np.array([merged[i] for i in items], dtype=np.int64)
    es = np.array([errs[i] for i in items], dtype=np.int64)
    items, counts, es, d2 = mg_truncate(items, counts, es, caps)
    dropped += d2
    # every survivor's true count within [count, count + err + dropped]
    for it, c, e in zip(items, counts, es):
        t = int(truth[it])
        assert c <= t <= c + e + dropped, (it, c, t, e, dropped)
    # the heavy hitter survives truncation and is ranked first
    assert items[np.argmax(counts)] == "h"


def test_quantile_summary_rank_bound():
    from database_delta_plugins_ray.functions.sketch import (
        quantile_merge,
        quantile_query,
        quantile_summary,
    )

    rng = np.random.default_rng(11)
    vals = rng.lognormal(3.0, 1.2, size=100_000)
    s = 512
    # batch partials -> one merge (the pipeline's two-level shape)
    summaries = [quantile_summary(chunk, s)
                 for chunk in np.array_split(vals, 16)]
    p, w = quantile_merge(summaries, s)
    assert len(p) <= s
    v_sorted = np.sort(vals)
    n = len(vals)
    for q in (0.5, 0.9, 0.99):
        est = quantile_query(p, w, q)
        # rank of the estimate in the TRUE data within ~2n/s of target
        rank = np.searchsorted(v_sorted, est)
        assert abs(rank - q * n) <= 2 * n / s, (q, rank, q * n)
    # deterministic
    p2, w2 = quantile_merge(summaries, s)
    assert np.array_equal(p, p2) and np.array_equal(w, w2)
    # exact regime: fewer than s values pass through untouched
    pe, we = quantile_summary(np.array([5.0, 1.0, 3.0]), s)
    assert list(pe) == [1.0, 3.0, 5.0] and list(we) == [1.0] * 3
    assert quantile_query(pe, we, 0.5) == 3.0


def test_approx_quantiles_pipeline(ray_session):
    import duckdb

    from database_delta_plugins_ray.pipelines.analytics import (
        approx_quantiles_event_value,
    )

    sf = "/root/testdata/sf0.01"
    got = (approx_quantiles_event_value(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    want = duckdb.sql(f"""
        SELECT event_type,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99
        FROM read_parquet('{sf}/events.parquet')
        GROUP BY event_type ORDER BY event_type""").df()
    assert list(got["event_type"]) == list(want["event_type"])
    for c in ("p50", "p90", "p99"):
        rel = (abs(got[c] - want[c]) /
               np.maximum(abs(want[c]), 1e-9)).max()
        assert rel < 0.10, (c, rel)


def test_kmeans_recovers_planted_blobs(ray_session):
    from database_delta_plugins_ray.stages.clustering import kmeans

    rng = np.random.default_rng(3)
    k, d, per = 5, 16, 80
    centers = rng.normal(size=(k, d)) * 10.0
    vecs, labels = [], []
    for j in range(k):
        vecs.append(centers[j] + rng.normal(size=(per, d)) * 0.1)
        labels += [j] * per
    x = np.concatenate(vecs).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(len(x)),
                       "embedding": list(x), "label": labels})
    ds = ray.data.from_pandas(df).repartition(4)
    assigns, cents, hist = kmeans(ds, k=k, iters=6)
    a = assigns.to_pandas().sort_values("vec_id")
    # inertia monotonically non-increasing
    assert all(hist[i + 1] <= hist[i] + 1e-6 for i in range(len(hist) - 1))
    # each planted blob maps to exactly one cluster and vice versa
    got = a["cluster"].to_numpy()
    mapping = {}
    for j in range(k):
        cl = np.unique(got[np.array(labels) == j])
        assert len(cl) == 1, f"blob {j} split across clusters {cl}"
        mapping[j] = cl[0]
    assert len(set(mapping.values())) == k
    # deterministic: second run identical
    assigns2, _, hist2 = kmeans(ds, k=k, iters=6)
    assert np.array_equal(
        assigns2.to_pandas().sort_values("vec_id")["cluster"].to_numpy(),
        got)
    assert hist2 == hist


def test_hash_rank_matches_brute(ray_session):
    from database_delta_plugins_ray.stages.sample import hash_rank, md5_u64

    ids = np.array([3, 17, 42, 999, 12345, 7, 0, 88], dtype=np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids}))
    out = hash_rank(ds, nbuckets=8).to_pandas().sort_values("doc_id")
    h = md5_u64(ids)
    order = np.lexsort((ids, h))
    want = np.empty(len(ids), dtype=np.int64)
    want[order] = np.arange(len(ids))
    brute = dict(zip(ids, want))
    got = dict(zip(out["doc_id"], out["rank"]))
    assert got == brute
    # a rank permutation: every position 0..n-1 exactly once
    assert sorted(out["rank"]) == list(range(len(ids)))
    # partitioning-invariant
    out2 = hash_rank(ds.repartition(4), nbuckets=8).to_pandas()
    assert dict(zip(out2["doc_id"], out2["rank"])) == brute


def test_ordered_cumsum_brute(ray_session):
    from database_delta_plugins_ray.stages.scan import ordered_cumsum

    rng = np.random.default_rng(13)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 1000, n),          # many ties
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(-50, 50, n),          # negatives included
    })
    ds = ray.data.from_pandas(df).repartition(8)
    out = (ordered_cumsum(ds, order_col="k", tiebreak_col="id",
                          value_col="v", nbuckets=16)
           .to_pandas().sort_values("id").reset_index(drop=True))
    o = np.lexsort((df["id"].to_numpy(), df["k"].to_numpy()))
    brute = np.empty(n, dtype=np.int64)
    brute[o] = np.cumsum(df["v"].to_numpy()[o])
    assert np.array_equal(out["running_total"].to_numpy(), brute)
    # partitioning invariance
    out2 = (ordered_cumsum(ds.repartition(3), order_col="k",
                           tiebreak_col="id", value_col="v", nbuckets=4)
            .to_pandas().sort_values("id").reset_index(drop=True))
    assert np.array_equal(out2["running_total"].to_numpy(), brute)


def test_ordered_cumsum_float_keys(ray_session):
    # regression: float order keys were truncated to int64, collapsing
    # 0.9 and 0.1 into one key; the IEEE-754 monotone transform must
    # order them exactly
    from database_delta_plugins_ray.stages.scan import (
        ordered_cumsum,
        ordered_moving_sum,
    )

    df = pd.DataFrame({
        "k": [0.9, 0.1, 1.8, 1.2, -3.5, 0.0],
        "id": np.arange(6, dtype=np.int64),
        "v": np.array([10, 20, 300, 4000, 7, 1], dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(3)
    out = (ordered_cumsum(ds, order_col="k", tiebreak_col="id",
                          value_col="v", nbuckets=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    o = np.argsort(df["k"].to_numpy(), kind="stable")
    brute = np.empty(6, dtype=np.int64)
    brute[o] = np.cumsum(df["v"].to_numpy()[o])
    assert list(out["running_total"]) == list(brute)
    # window=0 now fails fast instead of a deep broadcast error
    with pytest.raises(ValueError):
        ordered_moving_sum(ds, order_col="k", tiebreak_col="id",
                           value_col="v", window=0)


def test_probe_empty_batch_keeps_schema(ray_session, tmp_path):
    # regression: a probe with no candidates returned a schema-less
    # dataset, crashing callers that select est_jaccard
    from database_delta_plugins_ray.stages.dedup_index import (
        MinHashDiskIndex,
    )

    corpus = ray.data.from_items(
        [{"doc_id": i, "text": f"alpha beta gamma delta{i} ep{i}"}
         for i in range(10)])
    idx = MinHashDiskIndex.build(corpus, str(tmp_path / "idx"), nparts=4)
    fresh = ray.data.from_items(
        [{"doc_id": 100, "text": "totally different words here now"}])
    out = idx.probe_df(fresh, threshold=0.5)
    assert list(out.columns) == ["doc_id", "dup_of", "est_jaccard"]
    assert len(out) == 0


def test_ordered_cummax_brute(ray_session):
    from database_delta_plugins_ray.stages.scan import ordered_cummax

    rng = np.random.default_rng(29)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 500, n),
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(-10**6, 10**6, n),
    })
    ds = ray.data.from_pandas(df).repartition(7)
    out = (ordered_cummax(ds, order_col="k", tiebreak_col="id",
                          value_col="v", nbuckets=16)
           .to_pandas().sort_values("id").reset_index(drop=True))
    o = np.lexsort((df["id"].to_numpy(), df["k"].to_numpy()))
    brute = np.empty(n, dtype=np.int64)
    brute[o] = np.maximum.accumulate(df["v"].to_numpy()[o])
    assert np.array_equal(out["running_max"].to_numpy(), brute)


def test_ordered_lag_brute(ray_session):
    from database_delta_plugins_ray.stages.scan import ordered_lag

    rng = np.random.default_rng(23)
    n = 1500
    df = pd.DataFrame({
        "k": rng.integers(0, 80, n),
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(-100, 100, n),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    out = (ordered_lag(ds, order_col="k", tiebreak_col="id",
                       value_col="v", nbuckets=16)
           .to_pandas().sort_values("id").reset_index(drop=True))
    o = np.lexsort((df["id"].to_numpy(), df["k"].to_numpy()))
    sv = df["v"].to_numpy()[o]
    brute_sorted = np.concatenate(([np.int64(-1)], sv[:-1]))
    brute = np.empty(n, dtype=np.int64)
    brute[o] = brute_sorted
    assert np.array_equal(out["lag_value"].to_numpy(), brute)


def test_export_shards_resumable(ray_session, tmp_path):
    import os

    from database_delta_plugins_ray.stages.export import (
        export_corpus_shards,
    )
    from database_delta_plugins_ray.stages.sample import md5_u64

    rows = [{"doc_id": i, "text": f"doc {i}"} for i in range(200)]
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "shards")
    m1 = export_corpus_shards(ds, out, nshards=8, source_tag="v1")
    assert not m1["skipped"] and m1["total_rows"] == 200
    # routing matches the deterministic hash rule
    want = np.bincount(
        (md5_u64(np.arange(200, dtype=np.int64)) % np.uint64(8))
        .astype(int), minlength=8)
    assert [m1["shards"].get(str(s), 0) for s in range(8)] == list(want)
    # unchanged source: manifest hit, nothing rewritten
    mt = {f: os.path.getmtime(os.path.join(out, f))
          for f in os.listdir(out)}
    m2 = export_corpus_shards(ds, out, nshards=8, source_tag="v1")
    assert m2["skipped"] and m2["shards"] == m1["shards"]
    assert {f: os.path.getmtime(os.path.join(out, f))
            for f in os.listdir(out)} == mt
    # changed source fingerprint: full atomic rebuild
    m3 = export_corpus_shards(ds, out, nshards=8, source_tag="v2")
    assert not m3["skipped"] and m3["shards"] == m1["shards"]
    # exported rows round-trip (read the shard dirs; manifest.json sits
    # alongside them)
    import glob

    back = ray.data.read_parquet(
        sorted(glob.glob(os.path.join(out, "shard=*", "*.parquet")))
    ).to_pandas()
    assert sorted(back["doc_id"]) == list(range(200))


def test_ordered_moving_sum_brute(ray_session):
    from database_delta_plugins_ray.stages.scan import ordered_moving_sum

    rng = np.random.default_rng(17)
    n, w = 2000, 7
    df = pd.DataFrame({
        "k": rng.integers(0, 100, n),   # dense ties; sparse buckets
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(-9, 9, n),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    # nbuckets=32 over a 0..99 domain: several near-empty buckets force
    # the carry assembly to walk more than one bucket backwards
    out = (ordered_moving_sum(ds, order_col="k", tiebreak_col="id",
                              value_col="v", window=w, nbuckets=32)
           .to_pandas().sort_values("id").reset_index(drop=True))
    o = np.lexsort((df["id"].to_numpy(), df["k"].to_numpy()))
    sv = df["v"].to_numpy()[o]
    cs = np.cumsum(sv)
    brute_sorted = np.array(
        [cs[i] - (cs[i - w] if i >= w else 0) for i in range(n)],
        dtype=np.int64)
    brute = np.empty(n, dtype=np.int64)
    brute[o] = brute_sorted
    assert np.array_equal(out["moving_sum"].to_numpy(), brute)
    # window=1 degenerates to the value itself (no carry pass at all)
    out1 = (ordered_moving_sum(ds, order_col="k", tiebreak_col="id",
                               value_col="v", window=1, nbuckets=8)
            .to_pandas().sort_values("id").reset_index(drop=True))
    assert np.array_equal(out1["moving_sum"].to_numpy(),
                          df["v"].to_numpy())


def test_incremental_minhash_index(ray_session, tmp_path):
    from database_delta_plugins_ray.stages.dedup_index import MinHashDiskIndex

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]

    def doc(n):
        return " ".join(rng.choice(vocab, size=n))

    base = [doc(60) for _ in range(40)]
    corpus_rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    # new batch: 3 near-dups of corpus docs (small edits), 5 fresh docs
    near = []
    for j, src in enumerate((3, 17, 29)):
        words = base[src].split()
        words[5] = "edited"
        near.append({"doc_id": 100 + j, "text": " ".join(words)})
    fresh = [{"doc_id": 200 + j, "text": doc(60)} for j in range(5)]

    idx_dir = str(tmp_path / "mh_index")
    corpus = ray.data.from_items(corpus_rows)
    idx = MinHashDiskIndex.build(corpus, idx_dir, nparts=8,
                                 source_tag="v1")
    assert MinHashDiskIndex(idx_dir).meta["source_tag"] == "v1"

    new = ray.data.from_items(near + fresh)
    out = idx.probe_df(new, threshold=0.5)
    got = set(zip(out["doc_id"], out["dup_of"]))
    # recall: every planted near-dup found against its source
    for j, src in enumerate((3, 17, 29)):
        assert (100 + j, src) in got, (j, src, got)
    # precision: no fresh doc matches anything
    assert not any(d >= 200 for d in out["doc_id"])
    assert (out["est_jaccard"] >= 0.5).all()
    assert out["doc_id"].dtype == np.int64
    # atomic rebuild replaces, not appends
    idx2 = MinHashDiskIndex.build(corpus, idx_dir, nparts=8,
                                  source_tag="v2")
    assert MinHashDiskIndex(idx_dir).meta["source_tag"] == "v2"
    out2 = idx2.probe_df(new, threshold=0.5)
    assert set(zip(out2["doc_id"], out2["dup_of"])) == got


def test_q5_matches_duckdb(ray_session):
    import duckdb

    from database_delta_plugins_ray.pipelines.analytics import (
        ANALYTICS_ORACLE_SQL,
        q5_local_supplier_volume,
    )

    sf = "/root/testdata/sf0.001"
    got = q5_local_supplier_volume(sf)
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "supplier", "nation",
              "region"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(ANALYTICS_ORACLE_SQL["q5_local_supplier_volume"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


def test_tfidf_top_terms_brute_parity(ray_session):
    """tfidf_top_terms_documents == a single-process brute force over the
    same corpus (tokenize -> tf/df -> tf*ln(N/df) micros -> per-doc top-3
    by (micros desc, tok))."""
    import re

    from database_delta_plugins_ray.pipelines.analytics import (
        tfidf_top_terms_documents,
    )

    sf = "/root/testdata/sf0.001"
    got = (tfidf_top_terms_documents(sf).to_pandas()
           .sort_values(["doc_id", "tok"]).reset_index(drop=True))

    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    n = float(len(docs))
    tok_re = re.compile(r"[a-z0-9_]+")
    rows = []
    df_count: dict = {}
    per_doc = []
    for _, r in docs.iterrows():
        toks = tok_re.findall((r["text"] or "").lower())
        tf: dict = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t in tf:
            df_count[t] = df_count.get(t, 0) + 1
        per_doc.append((r["doc_id"], tf))
    for doc_id, tf in per_doc:
        scored = sorted(
            ((-int(np.floor(c * np.log(n / df_count[t]) * 1e6 + 0.5)), t, c)
             for t, c in tf.items()))
        for neg, t, c in scored[:3]:
            rows.append((doc_id, t, c, df_count[t], -neg))
    want = (pd.DataFrame(rows, columns=["doc_id", "tok", "tf", "df",
                                        "score_micros"])
            .sort_values(["doc_id", "tok"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pca_planted_subspace(ray_session):
    """pca_fit recovers a planted low-rank subspace: variance concentrates
    in the planted directions, projections are decorrelated with variance
    == eigenvalues, and the fit is invariant to block partitioning."""
    from database_delta_plugins_ray.stages.pca import pca_fit, pca_transform

    rng = np.random.default_rng(5)
    n, d, k = 4000, 24, 3
    basis, _ = np.linalg.qr(rng.normal(size=(d, k)))
    scales = np.array([9.0, 5.0, 2.0])
    z = rng.normal(size=(n, k)) * scales
    x = 0.7 + z @ basis.T + rng.normal(scale=0.05, size=(n, d))
    rows = [{"vec_id": i, "embedding": x[i].astype(np.float32).tolist()}
            for i in range(n)]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(8)

    m = pca_fit(ds, n_components=k)
    # planted directions recovered: each component lies in the planted span
    proj = m["components"] @ basis            # (k, k)
    assert np.allclose(np.linalg.norm(proj, axis=1), 1.0, atol=0.02)
    # eigenvalues match the planted scales^2 (sample noise tolerance)
    assert np.allclose(np.sqrt(m["explained_variance"]), scales, rtol=0.1)
    # top-3 explain ~all variance
    assert m["explained_variance"].sum() / m["total_variance"] > 0.95

    # projections: mean ~0, covariance ~diag(eigenvalues)
    out = pca_transform(ds, m, keep=["vec_id"]).to_pandas()
    pcs = np.stack(out["pc"].to_list()).astype(np.float64)
    assert np.allclose(pcs.mean(axis=0), 0, atol=0.05)
    cov = np.cov(pcs.T)
    assert np.allclose(np.diag(cov), m["explained_variance"], rtol=0.05)
    assert np.abs(cov - np.diag(np.diag(cov))).max() < 0.15

    # partitioning invariance (moment sums reorder, eigh unchanged within fp)
    m2 = pca_fit(ray.data.from_pandas(pd.DataFrame(rows)).repartition(2),
                 n_components=k)
    assert np.allclose(np.abs(np.sum(m["components"] * m2["components"],
                                     axis=1)), 1.0, atol=1e-6)


def test_compression_stats_parity_and_flags(ray_session):
    """compression_stats matches direct zlib byte counts; the flag rule
    catches repetitive (highly compressible) and random-like text."""
    import zlib

    import pandas as pd

    from database_delta_plugins_ray.functions.text import compression_stats

    rng = np.random.default_rng(5)
    randomish = "".join(chr(0x21 + int(c)) for c in rng.integers(0, 94, 4000))
    texts = pd.Series([
        "the quick brown fox jumps over the lazy dog. " * 3,  # normal prose
        "spam spam spam " * 400,                              # repetitive
        randomish,                                            # high-entropy
        "",                                                   # empty
    ])
    out = compression_stats(texts)
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        assert out["n_bytes"][i] == len(b)
        assert out["n_zbytes"][i] == len(zlib.compress(b, 6))
    assert out["flagged"].tolist() == [0, 1, 1, 0]  # empty never flagged


def test_compression_ratio_query_runs(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        compression_ratio_documents,
    )

    df = pd.DataFrame(
        compression_ratio_documents("/root/testdata/sf0.001").take_all())
    assert set(df.columns) == {"doc_id", "n_bytes", "n_zbytes", "flagged"}
    assert len(df) > 0
    assert (df["n_zbytes"] > 0).all()


def test_cms_query_exact_in_wide_regime(ray_session):
    """approx_token_freq_cms: with width >> vocabulary, CMS estimates for
    the heavy hitters equal the exact counts (and never undercount by
    construction)."""
    import duckdb

    from database_delta_plugins_ray.pipelines.analytics import (
        approx_token_freq_cms,
    )

    sf = "/root/testdata/sf0.001"
    got = approx_token_freq_cms(sf)
    exact = duckdb.sql(f"""
        SELECT tok, count(*) AS n FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
          FROM '{sf}/documents.parquet') GROUP BY tok
    """).df().set_index("tok")["n"]
    for tok, est in zip(got["tok"], got["est"]):
        assert est >= exact.get(tok, 0)
    # wide regime: the top tokens' estimates should be exact
    assert all(int(est) == int(exact[tok])
               for tok, est in zip(got["tok"], got["est"]) if tok in exact.index)


def test_hybrid_search_matches_duckdb(ray_session):
    """search_documents_hybrid == the DuckDB RRF oracle, hash-exact:
    BM25 leg (integer micros) + cosine leg (float64 both sides, micros
    rounding with a verified >=3e-10 boundary margin) fused with
    integer reciprocal-rank arithmetic."""
    import duckdb

    from database_delta_plugins_ray.pipelines.analytics import (
        ANALYTICS_ORACLE_SQL,
        search_documents_hybrid,
    )

    sf = "/root/testdata/sf0.001"
    got = search_documents_hybrid(sf)
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(
        ANALYTICS_ORACLE_SQL["search_documents_hybrid"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


def test_hybrid_search_rrf_semantics(ray_session):
    """RRF arithmetic on a planted case: a doc ranked by BOTH legs must
    out-score a doc ranked #1 by only one leg when its two ranks are
    good enough — 1/(60+2)+1/(60+2) > 1/(60+1) — and every returned
    fused score equals the sum of its legs' floor(1e9/(60+rank))."""
    from database_delta_plugins_ray.pipelines.analytics import (
        search_documents_hybrid,
        search_documents_bm25,
        _query_vec,
    )
    import numpy as np
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = search_documents_hybrid(sf, k=10_000, k_each=50)
    # recompute both legs' rank maps brute-force
    bm = search_documents_bm25(sf).to_pandas()
    bm = bm.sort_values(["score_micros", "doc_id"],
                        ascending=[False, True]).head(50)
    bm_rank = {int(d): i + 1 for i, d in enumerate(bm["doc_id"])}
    t = pq.read_table(f"{sf}/embeddings.parquet")
    X = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)
                  ).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    q = _query_vec(sf)
    cos = (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    mic = np.floor(cos * 1e6 + 0.5).astype(np.int64)
    order = np.lexsort((ids, -mic))[:50]
    vec_rank = {int(ids[i]): r + 1 for r, i in enumerate(order)}
    want = {}
    for leg in (bm_rank, vec_rank):
        for d, r in leg.items():
            want[d] = want.get(d, 0) + 10**9 // (60 + r)
    got = dict(zip(out["doc_id"].astype(int), out["rrf_fp"].astype(int)))
    assert got == want
