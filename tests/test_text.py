"""Text-analysis kernel unit tests (no Ray session)."""

import numpy as np
import pandas as pd

from database_delta_plugins_ray.functions.text import (
    band_hashes,
    bpe_ish_token_counts,
    fingerprint,
    hamming64,
    jaccard,
    lang_id,
    minhash_params,
    minhash_signature,
    quality_scores,
    shingle_hashes,
    simhash64,
    token_counts,
)


def test_token_counts():
    s = pd.Series(["hello world", "a_b c-d", ""])
    assert token_counts(s).tolist() == [2, 3, 0]
    assert bpe_ish_token_counts(s).tolist() == [2, 4, 0]


def test_fingerprint_normalizes_whitespace_case():
    s = pd.Series(["Hello   World", "hello world", "hello  world "])
    fps = fingerprint(s)
    assert fps[0] == fps[1] == fps[2]
    assert len(fps[0]) == 32


def test_lang_id_obvious():
    s = pd.Series([
        "the cat sat on the mat and it was the best of days",
        "der hund und die katze ist nicht in dem haus von der stadt",
        "el perro y la casa de los amigos es una de las mejores",
        "qwx zzz kkk",
    ])
    got = lang_id(s).tolist()
    assert got[:3] == ["en", "de", "es"]
    assert got[3] == "und"


def test_quality_scores_shape():
    df = quality_scores(pd.Series(["the quick brown fox jumps over the lazy dog", ""]))
    assert set(df.columns) >= {"n_chars", "n_tokens", "quality_score"}
    assert 0 <= df["quality_score"][0] <= 1
    assert df["n_tokens"][1] == 0


def test_minhash_jaccard_estimate():
    a_txt = "the quick brown fox jumps over the lazy dog near the river bank today"
    b_txt = "the quick brown fox jumps over the lazy cat near the river bank today"
    sa, sb = shingle_hashes(a_txt), shingle_hashes(b_txt)
    true_j = jaccard(sa, sb)
    a, b = minhash_params(256)
    est = (minhash_signature(sa, a, b) == minhash_signature(sb, a, b)).mean()
    assert abs(est - true_j) < 0.15
    # identical docs -> identical signatures and bands
    assert (minhash_signature(sa, a, b) == minhash_signature(sa, a, b)).all()
    assert (band_hashes(minhash_signature(sa, a, b), 16)
            == band_hashes(minhash_signature(sa, a, b), 16)).all()


def test_simhash_similarity():
    a = simhash64("the quick brown fox jumps over the lazy dog " * 3)
    b = simhash64("the quick brown fox jumps over the lazy cat " * 3)
    c = simhash64("completely unrelated words about databases and shuffles galore")
    assert hamming64(a, a) == 0
    assert hamming64(a, b) < hamming64(a, c)


def test_shingle_edgecases():
    assert shingle_hashes("").size == 0
    assert shingle_hashes("one two").size == 1  # shorter than n -> single gram
    assert jaccard(np.array([], dtype=np.uint64), np.array([], dtype=np.uint64)) == 1.0
