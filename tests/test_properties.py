"""Property-based tests (hypothesis) for the pure kernels: the LWW
reduction's associativity (the correctness backbone of both the per-batch
combiner and the delta-commit/fragment designs), the division-free Mersenne
fold, and the value-conversion kernels' reference semantics."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from database_delta_plugins_ray.stages.merge import exact_lww_indices
from database_delta_plugins_ray.stages.normalize import _lww_keep_indices, hash_key


# ---------------------------------------------------------------------------
# LWW associativity: reducing per batch then reducing the concatenation is
# identical to one global reduction — the invariant that makes the per-batch
# combiner, delta commits, and duplicate fragments all safe
# ---------------------------------------------------------------------------

events = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)),  # (key_a, key_b) ids
    min_size=1, max_size=60,
)


def _mk_table(pairs, lsn_start=1):
    n = len(pairs)
    return pa.table(
        {
            "table": pa.array(["t"] * n),
            "repo": pa.array([f"r{a}" for a, _ in pairs]),
            "path": pa.array([f"p{b}" for _, b in pairs]),
            "_sequence_num": pa.array(
                list(range(lsn_start, lsn_start + n)), pa.int64()
            ),
        }
    )


def _winners(tbl):
    idx = exact_lww_indices(tbl, ("table", "repo", "path"), "_sequence_num")
    t = tbl.take(pa.array(idx))
    return {
        (r["repo"], r["path"]): r["_sequence_num"] for r in t.to_pylist()
    }


@settings(max_examples=50, deadline=None)
@given(events, st.integers(1, 5))
def test_lww_reduce_is_associative(pairs, n_splits):
    tbl = _mk_table(pairs)
    direct = _winners(tbl)

    # arbitrary contiguous splits, reduce each, reduce the concat
    bounds = np.linspace(0, tbl.num_rows, n_splits + 1).astype(int)
    parts = []
    for i in range(n_splits):
        sl = tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        if sl.num_rows == 0:
            continue
        idx = exact_lww_indices(sl, ("table", "repo", "path"), "_sequence_num")
        parts.append(sl.take(pa.array(idx)))
    merged = _winners(pa.concat_tables(parts))
    assert merged == direct


@settings(max_examples=50, deadline=None)
@given(events)
def test_combiner_never_drops_winner(pairs):
    """The hash-based per-batch combiner may over-keep on collisions but
    must NEVER drop a key's max-lsn row."""
    tbl = _mk_table(pairs)
    tb = tbl["table"].to_numpy(zero_copy_only=False)
    repo = tbl["repo"].to_numpy(zero_copy_only=False)
    path = tbl["path"].to_numpy(zero_copy_only=False)
    lsn = tbl["_sequence_num"].to_numpy(zero_copy_only=False)
    kh = hash_key(tb, repo, path)
    keep = _lww_keep_indices(kh, lsn, (tb, repo, path))
    kept = tbl.take(pa.array(keep))
    assert _winners(kept) == _winners(tbl)


# ---------------------------------------------------------------------------
# Mersenne fold == true modulo
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=64))
def test_mersenne_fold_equals_modulo(vals):
    from database_delta_plugins_ray.functions.text import _MERSENNE, _mersenne_fold

    x = np.array(vals, dtype=np.uint64)
    got = _mersenne_fold(x.copy())
    want = np.array([v % int(_MERSENNE) for v in vals], dtype=np.uint64)
    assert (got == want).all()


# ---------------------------------------------------------------------------
# value kernels vs direct reference semantics
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, (1 << 4) - 1), min_size=1, max_size=32))
def test_set_decode_matches_reference(masks):
    from database_delta_plugins_ray.functions.values import set_decode

    opts = ["a", "bb", "ccc", "dddd"]
    got = set_decode(masks, opts).to_pylist()
    want = [
        ",".join(o for i, o in enumerate(opts) if (m >> i) & 1) for m in masks
    ]
    assert got == want


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=8), min_size=1, max_size=32))
def test_binary_pad_and_hex_roundtrip(vals):
    from database_delta_plugins_ray.functions.values import (
        binary_zero_pad,
        hex_string,
    )

    padded = binary_zero_pad(vals, 8)
    assert all(len(v) == 8 for v in padded.to_pylist())
    assert [v[: len(o)] for v, o in zip(padded.to_pylist(), vals)] == vals
    hx = hex_string(padded).to_pylist()
    assert hx == [v.hex() for v in padded.to_pylist()]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 200), min_size=1, max_size=32))
def test_year_adjust_reference(years):
    from database_delta_plugins_ray.functions.values import year_adjust

    got = year_adjust(years).to_pylist()
    want = [y + 2000 if 0 <= y < 70 else y + 1900 if y < 100 else y
            for y in years]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-(4 * 10**12), 4 * 10**12), min_size=1, max_size=16))
def test_time_duration_bounds(vals):
    from database_delta_plugins_ray.functions.values import time_duration_micros

    lim = (838 * 3600 + 59 * 60 + 59) * 1_000_000
    got = time_duration_micros(vals).to_pylist()
    for v, g in zip(vals, got):
        assert g == (v if -lim <= v <= lim else None)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet="abcdefg h", min_size=0, max_size=40),
                min_size=1, max_size=16))
def test_simhash_batch_matches_single(texts):
    from database_delta_plugins_ray.functions.text import (
        simhash64,
        simhash64_many,
    )

    many = simhash64_many(pd.Series(texts))
    for t, h in zip(texts, many):
        assert simhash64(t) == int(h)


# ---------------------------------------------------------------------------
# mergeable-sketch invariants (functions/sketch.py)
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(0, 10**6), min_size=0, max_size=400),
       st.integers(1, 4))
@settings(max_examples=40, deadline=None)
def test_hll_merge_equals_whole(vals, n_splits):
    import numpy as np

    from database_delta_plugins_ray.functions.sketch import (
        hll_merge,
        hll_registers,
    )

    arr = np.array(vals, dtype=np.int64)
    whole = hll_registers(arr, p=8)
    parts = np.array_split(arr, n_splits)
    merged = np.zeros_like(whole)
    for p_ in parts:
        merged = hll_merge(merged, hll_registers(p_, p=8))
    assert np.array_equal(whole, merged)


@given(st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=300),
       st.integers(2, 6), st.integers(1, 4))
@settings(max_examples=40, deadline=None)
def test_mg_bound_always_holds(stream, capacity, n_splits):
    import numpy as np
    import pandas as pd

    from database_delta_plugins_ray.functions.sketch import (
        mg_partial,
        mg_truncate,
    )

    arr = np.array(stream, dtype=object)
    truth = pd.Series(arr).value_counts() if len(arr) else {}
    merged, errs, dropped = {}, {}, 0
    for part in np.array_split(arr, n_splits):
        items, counts, es, d = mg_partial(part, capacity)
        assert len(items) <= capacity
        for it, c, e in zip(items, counts, es):
            merged[it] = merged.get(it, 0) + c
            errs[it] = errs.get(it, 0) + e
        dropped += d
    if merged:
        items = np.array(list(merged), dtype=object)
        counts = np.array([merged[i] for i in items], dtype=np.int64)
        es = np.array([errs[i] for i in items], dtype=np.int64)
        items, counts, es, d2 = mg_truncate(items, counts, es, capacity)
        dropped += d2
        for it, c, e in zip(items, counts, es):
            t = int(truth[it])
            assert c <= t <= c + e + dropped
    # items absent from the merged summary are bounded by the global drop
    absent = set(truth.keys() if len(arr) else []) - set(
        items if merged else [])
    for it in absent:
        assert int(truth[it]) <= dropped


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=0,
                max_size=500),
       st.integers(4, 64), st.integers(1, 5))
@settings(max_examples=40, deadline=None)
def test_quantile_summary_rank_invariant(vals, s, n_splits):
    import numpy as np

    from database_delta_plugins_ray.functions.sketch import (
        quantile_merge,
        quantile_query,
        quantile_summary,
    )

    arr = np.array(vals, dtype=np.float64)
    parts = [quantile_summary(c, s) for c in np.array_split(arr, n_splits)]
    p, w = quantile_merge(parts, s)
    assert len(p) <= max(s, len(arr))
    if len(arr) == 0:
        return
    # total weight is conserved through partials and merge
    assert abs(w.sum() - len(arr)) < 1e-6
    # a queried quantile is always a real data value, and its true rank
    # is within 2n/s + 2 of the target (the two-level compaction bound)
    v_sorted = np.sort(arr)
    for q in (0.0, 0.5, 1.0):
        est = quantile_query(p, w, q)
        assert est in arr
        lo = np.searchsorted(v_sorted, est, side="left")
        hi = np.searchsorted(v_sorted, est, side="right")
        target = q * len(arr)
        slack = 2 * len(arr) / s + 2
        assert lo - slack <= target <= hi + slack


@given(st.lists(st.integers(0, 50), min_size=1, max_size=400),
       st.integers(1, 7))
@settings(max_examples=40, deadline=None)
def test_cms_merge_equals_whole_and_never_undercounts(xs, nsplit):
    """CMS partials SUM-merge exactly; estimates never undercount."""
    import numpy as np

    from database_delta_plugins_ray.functions.sketch import cms_build, cms_query

    xs = np.array(xs, np.int64)
    whole = cms_build(xs, width=64, depth=3)
    parts = np.array_split(xs, nsplit)
    merged = sum(cms_build(p, width=64, depth=3) for p in parts if len(p))
    assert np.array_equal(whole, merged)
    uniq, true = np.unique(xs, return_counts=True)
    est = cms_query(whole, uniq)
    assert (est >= true).all()
    # error bound: overcount <= total for every item (loose sanity) and
    # exact when the domain is far smaller than the width
    if len(uniq) <= 8:
        small = cms_build(xs, width=1024, depth=4)
        assert np.array_equal(cms_query(small, uniq), true)


@given(st.lists(st.lists(st.sampled_from("abcdefg"), max_size=12),
                min_size=1, max_size=25),
       st.sets(st.sampled_from("abcdefg"), min_size=1, max_size=3),
       st.integers(1, 8))
@settings(max_examples=12, deadline=None)
def test_inverted_index_lookup_matches_brute(docs_toks, terms, nbuckets):
    """InvertedIndex AND/OR lookup == brute-force token counting for any
    corpus, term set, and bucket count (ray_session is module-ambient
    via the session fixture; index build/lookup are real Ray runs)."""
    import tempfile

    import ray.data

    from database_delta_plugins_ray.stages.invindex import InvertedIndex

    docs = [{"doc_id": f"d{i}", "text": " ".join(ts)}
            for i, ts in enumerate(docs_toks)]
    terms = sorted(terms)
    with tempfile.TemporaryDirectory() as td:
        idx = InvertedIndex.build(ray.data.from_items(docs),
                                  os.path.join(td, "idx"),
                                  n_buckets=nbuckets)
        for mode in ("and", "or"):
            got = {r["doc_id"]: r["score"]
                   for r in idx.lookup(terms, mode=mode).take_all()}
            want = {}
            for d in docs:
                toks = d["text"].split()
                hits = {t: toks.count(t) for t in terms if t in toks}
                if not hits:
                    continue
                if mode == "and" and len(hits) < len(terms):
                    continue
                want[d["doc_id"]] = sum(hits.values())
            assert got == want


@given(st.integers(min_value=0, max_value=5000),
       st.integers(min_value=2, max_value=128),
       st.integers(min_value=1, max_value=128))
@settings(max_examples=200, deadline=None)
def test_chunk_windows_invariants(n, w, s):
    """RAG chunk boundaries: full coverage (every token index in some
    window), chunk k starts exactly at k*s, widths bounded by w, only
    the last window may be short, and no start lies past the end."""
    from database_delta_plugins_ray.pipelines.analytics import chunk_windows

    s = min(s, w)  # stride > width would skip tokens by construction
    wins = chunk_windows(n, w, s)
    if n == 0:
        assert wins == []
        return
    assert wins[0][0] == 0
    covered = set()
    for k, (lo, hi) in enumerate(wins):
        assert lo == k * s
        assert lo < n
        assert 0 < hi - lo <= w
        covered.update(range(lo, hi))
    assert covered == set(range(n))
    # all but the last window are full-width
    for lo, hi in wins[:-1]:
        assert hi - lo == w


@given(st.integers(min_value=0, max_value=(1 << 63) - 1))
@settings(max_examples=200, deadline=None)
def test_mongots_bridge_is_identity_and_monotone(v):
    from database_delta_plugins_ray.state.offsets import MongoTs

    ts = MongoTs.from_int(v)
    assert ts.to_int() == v
    # wire round-trip: (sec, ord) fields -> parse -> same position
    assert MongoTs.parse(ts.sec, ts.ord).to_int() == v
    # BSON comparison rule == integer order
    if v > 0:
        assert MongoTs.from_int(v - 1) < ts


@given(st.integers(min_value=0, max_value=(1 << 63) - 1))
@settings(max_examples=200, deadline=None)
def test_oraclescn_bridge_is_identity_and_monotone(v):
    from database_delta_plugins_ray.state.offsets import OracleScn

    scn = OracleScn.from_int(v)
    assert scn.to_int() == v
    # wire round-trip: decimal-string SCN -> parse -> same position
    assert OracleScn.parse(str(scn)).to_int() == v
    if v > 0:
        assert OracleScn.from_int(v - 1) < scn


@given(st.one_of(st.none(), st.text(max_size=8),
                 st.integers(max_value=-1)))
@settings(max_examples=100, deadline=None)
def test_new_bridges_null_rule(bad):
    """Whatever garbage arrives on the wire, NULL sorts below every
    valid position (the shared bridge contract)."""
    from database_delta_plugins_ray.state.offsets import MongoTs, OracleScn

    o = OracleScn.parse(bad)
    assert o.is_available or o < OracleScn(0)
    m = MongoTs.parse(bad, bad)
    assert m.is_available or m < MongoTs(0, 0)


# ---------------------------------------------------------------------------
# Bloom filter (stages/bloom.py + functions/sketch.py): membership NEVER
# produces a false negative at any sizing — the invariant the cross-corpus
# dedup's "clean" fast path rests on
# ---------------------------------------------------------------------------


@given(st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=40),
       st.integers(64, 1024).map(lambda v: v - v % 8),
       st.integers(1, 8))
@settings(max_examples=60, deadline=None)
def test_bloom_never_false_negative(vals, m_bits, k):
    from database_delta_plugins_ray.functions.sketch import (
        bloom_contains, bloom_set)
    from database_delta_plugins_ray.stages.bloom import (
        _md5_hex, _probe_hash)

    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    h = _probe_hash(_md5_hex(vals))
    bloom_set(bits, h, k)
    assert bool(bloom_contains(bits, h, k).all())


# ---------------------------------------------------------------------------
# Unigram Viterbi (stages/unigram.py): segmentation always reconstructs the
# word over a char-complete vocabulary, and unknown chars map to <unk>
# ---------------------------------------------------------------------------


@given(st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=10),
                min_size=1, max_size=15))
@settings(max_examples=60, deadline=None)
def test_unigram_viterbi_roundtrip(words):
    import math

    from database_delta_plugins_ray.stages.unigram import (
        UNK, _viterbi_word)

    # vocabulary: all chars of the corpus + a few planted multi-grams
    chars = sorted({c for w in words for c in w})
    pieces = chars + [w for w in set(words) if len(w) > 1][:5]
    logp = [math.log(1.0 / len(pieces))] * len(pieces)
    vocab = {p: i for i, p in enumerate(pieces)}
    max_len = max(len(p) for p in pieces)
    for w in words:
        toks = _viterbi_word(w, vocab, logp, pieces, max_len)
        assert "".join(toks) == w
        assert all(t in vocab for t in toks)
    # a word of chars outside the vocab: every char -> <unk>
    toks = _viterbi_word("QQ", vocab, logp, pieces, max_len)
    assert toks == (UNK, UNK)


# ---------------------------------------------------------------------------
# PageRank fixed-point update (stages/graph.py): total mass is bounded by
# scale and never negative, for arbitrary edge multisets
# ---------------------------------------------------------------------------


@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                min_size=1, max_size=60),
       st.integers(1, 6))
@settings(max_examples=40, deadline=None)
def test_pagerank_reference_mass_bounds(edges, iters):
    from tests.test_pagerank import ref_pagerank

    scale = 1 << 40
    r = ref_pagerank(edges, iters=iters, scale=scale)
    total = sum(r.values())
    assert 0 <= total <= scale
    assert all(v >= 0 for v in r.values())
