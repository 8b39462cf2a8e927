"""Cross-corpus Bloom dedup gates (stages/bloom.py).

The driver gate (dedup_cross_corpus_documents) is hash-exact vs a
DuckDB NOT EXISTS oracle; these tests carry the adversarial cases: a
planted duplicate set, forced false positives (tiny filter) with the
exact-verify path, the no-false-negative Bloom property, build
order-independence, and parallelism invariance."""
import numpy as np
import pandas as pd
import pytest


def _mk(ray, df, parts):
    return ray.data.from_pandas(df).repartition(parts)


@pytest.fixture(scope="module")
def corpora():
    rng = np.random.RandomState(7)
    a_txt = [f"kept document {i} " + " ".join(
        rng.choice(list("abcdefg"), 5)) for i in range(40)]
    # B: 10 exact copies of A docs, 30 fresh, plus an internal B dup
    b_txt = ([a_txt[i] for i in range(0, 20, 2)]
             + [f"new document {i}" for i in range(29)]
             + ["new document 0"])
    A = pd.DataFrame({"doc_id": np.arange(40), "text": a_txt})
    B = pd.DataFrame({"doc_id": np.arange(100, 100 + len(b_txt)),
                      "text": b_txt})
    dup_ids = set(B["doc_id"][:10])
    return A, B, dup_ids


def test_exact_planted_dups(ray_session, corpora):
    import ray

    from database_delta_plugins_ray.stages.bloom import cross_corpus_dedup

    A, B, dup_ids = corpora
    out = cross_corpus_dedup(_mk(ray, B, 4), _mk(ray, A, 3)).to_pandas()
    got = set(out["doc_id"])
    assert got == set(B["doc_id"]) - dup_ids
    # B's internal duplicate is NOT removed (cross-corpus only)
    assert B["doc_id"].iloc[-1] in got
    # dtype survives the verify union (no float64 nullable drift)
    assert out["doc_id"].dtype == np.int64


def test_forced_false_positives_stay_exact(ray_session, corpora):
    import ray

    from database_delta_plugins_ray.stages.bloom import cross_corpus_dedup

    A, B, dup_ids = corpora
    # 256-bit filter over 40 keys with k=3: heavy false-positive rate,
    # so many clean B rows route through the verify exchange — the
    # result must be identical to the well-sized run
    out = cross_corpus_dedup(_mk(ray, B, 4), _mk(ray, A, 3),
                             m_bits=256, k=3).to_pandas()
    assert set(out["doc_id"]) == set(B["doc_id"]) - dup_ids


def test_no_false_negatives_without_verify(ray_session, corpora):
    import ray

    from database_delta_plugins_ray.stages.bloom import cross_corpus_dedup

    A, B, dup_ids = corpora
    # verify=False may over-drop (false positives) but NEVER keeps a
    # true duplicate, at any filter size
    for m_bits in (256, 1 << 14):
        out = cross_corpus_dedup(_mk(ray, B, 4), _mk(ray, A, 3),
                                 m_bits=m_bits, k=3,
                                 verify=False).to_pandas()
        assert set(out["doc_id"]) & dup_ids == set()
        assert set(out["doc_id"]) <= set(B["doc_id"]) - dup_ids


def test_bloom_build_block_order_invariant(ray_session, corpora):
    import ray

    from database_delta_plugins_ray.stages.bloom import build_content_bloom

    A, _, _ = corpora
    b1 = build_content_bloom(_mk(ray, A, 1))
    b8 = build_content_bloom(_mk(ray, A, 8))
    shuf = A.sample(frac=1.0, random_state=3).reset_index(drop=True)
    b8s = build_content_bloom(_mk(ray, shuf, 5))
    assert np.array_equal(b1, b8)
    assert np.array_equal(b1, b8s)


def test_parallelism_invariance(ray_session, corpora):
    import ray

    from database_delta_plugins_ray.stages.bloom import cross_corpus_dedup

    A, B, _ = corpora
    o1 = cross_corpus_dedup(_mk(ray, B, 1), _mk(ray, A, 1)).to_pandas()
    o2 = cross_corpus_dedup(_mk(ray, B, 7), _mk(ray, A, 5)).to_pandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(o1)[["doc_id", "text"]],
                                  key(o2)[["doc_id", "text"]])


def test_null_text_never_a_duplicate(ray_session):
    import ray

    from database_delta_plugins_ray.stages.bloom import cross_corpus_dedup

    A = pd.DataFrame({"doc_id": [1, 2], "text": [None, "None"]})
    B = pd.DataFrame({"doc_id": [10, 11, 12],
                      "text": [None, "None", "fresh"]})
    out = cross_corpus_dedup(_mk(ray, B, 2), _mk(ray, A, 2)).to_pandas()
    # SQL semantics: md5(NULL) matches nothing -> the null B row stays;
    # the literal string 'None' IS a real duplicate of A's 'None'
    assert set(out["doc_id"]) == {10, 12}


def test_int64_above_2p53_survives_verify_exchange(ray_session):
    """Snowflake-style ids (> 2^53) must come back bit-exact: a pandas
    group frame would float64-ify the null-padded int64 column in the
    verify fold and round these ids before the cast back."""
    import ray

    from database_delta_plugins_ray.stages.bloom import cross_corpus_dedup

    big = 2**62 + 1  # not representable in float64 (rounds to 2^62)
    A = pd.DataFrame({"doc_id": np.array([1, 2], dtype=np.int64),
                      "text": ["shared one", "shared two"]})
    B = pd.DataFrame({
        "doc_id": np.array([big, big + 2, big + 4], dtype=np.int64),
        "text": ["shared one", "fresh b", "shared two"]})
    # tiny filter: force every B row through the verify exchange
    out = cross_corpus_dedup(_mk(ray, B, 2), _mk(ray, A, 2),
                             m_bits=256, k=3).to_pandas()
    assert out["doc_id"].dtype == np.int64
    assert set(out["doc_id"]) == {big + 2}
    assert int(out["doc_id"].iloc[0]) == big + 2  # exact, not rounded
