"""Generic shuffle hash join (stages/join.py) semantics."""

import numpy as np
import pandas as pd
import pytest

import ray.data


def _ds(rows):
    import pyarrow as pa

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_inner_join_multiplicity(ray_session):
    """m x n rows per key -> m*n joined rows; keys missing on either
    side are dropped."""
    from database_delta_plugins_ray.stages.join import shuffle_hash_join

    left = _ds([
        {"k": 1, "a": "l1"},
        {"k": 1, "a": "l2"},
        {"k": 2, "a": "l3"},
        {"k": 4, "a": "l4"},  # no right match
    ])
    right = _ds([
        {"k": 1, "b": 10.0},
        {"k": 1, "b": 20.0},
        {"k": 1, "b": 30.0},
        {"k": 2, "b": 40.0},
        {"k": 9, "b": 50.0},  # no left match
    ])
    out = pd.DataFrame(shuffle_hash_join(left, right, on="k").take_all())
    got = set(map(tuple, out[["k", "a", "b"]].itertuples(index=False)))
    want = {(1, a, b) for a in ("l1", "l2") for b in (10.0, 20.0, 30.0)}
    want.add((2, "l3", 40.0))
    assert got == want  # 7 rows: 2*3 for k=1 + 1 for k=2


def test_left_join_keeps_unmatched(ray_session):
    from database_delta_plugins_ray.stages.join import shuffle_hash_join

    left = _ds([{"k": 1, "a": "x"}, {"k": 2, "a": "y"}])
    right = _ds([{"k": 1, "b": 7.0}])
    out = pd.DataFrame(
        shuffle_hash_join(left, right, on="k", how="left").take_all())
    by_k = out.set_index("k")
    assert by_k.loc[1, "b"] == 7.0
    assert pd.isna(by_k.loc[2, "b"])


def test_join_matches_pandas_merge(ray_session):
    """Randomized parity vs pandas.merge on a composite-free int key."""
    from database_delta_plugins_ray.stages.join import shuffle_hash_join

    rng = np.random.default_rng(11)
    l = pd.DataFrame({"k": rng.integers(0, 40, 300),
                      "a": rng.integers(0, 1000, 300)})
    r = pd.DataFrame({"k": rng.integers(0, 40, 200),
                      "b": rng.integers(0, 1000, 200)})
    out = pd.DataFrame(
        shuffle_hash_join(
            ray.data.from_pandas(l), ray.data.from_pandas(r), on="k"
        ).take_all()
    )
    want = l.merge(r, on="k")
    key = ["k", "a", "b"]
    assert sorted(map(tuple, out[key].itertuples(index=False))) == \
        sorted(map(tuple, want[key].itertuples(index=False)))


def test_salted_join_matches_unsalted(ray_session):
    """salt=k spreads hot-key left rows over k groups and replicates the
    right side per salt — the joined multiset must be unchanged, for
    inner AND left joins."""
    from database_delta_plugins_ray.stages.join import shuffle_hash_join

    rng = np.random.default_rng(3)
    # one very hot key (0) plus a tail, and keys missing on each side
    l = pd.DataFrame({"k": np.concatenate([np.zeros(80, int),
                                           rng.integers(1, 10, 40)]),
                      "a": np.arange(120)})
    r = pd.DataFrame({"k": np.concatenate([np.zeros(5, int),
                                           rng.integers(1, 12, 20)]),
                      "b": np.arange(200, 225)})
    for how in ("inner", "left"):
        want = sorted(map(tuple, pd.DataFrame(shuffle_hash_join(
            ray.data.from_pandas(l), ray.data.from_pandas(r),
            on="k", how=how).take_all()).fillna(-1)
            [["k", "a", "b"]].itertuples(index=False)))
        got = sorted(map(tuple, pd.DataFrame(shuffle_hash_join(
            ray.data.from_pandas(l), ray.data.from_pandas(r),
            on="k", how=how, salt=4).take_all()).fillna(-1)
            [["k", "a", "b"]].itertuples(index=False)))
        assert got == want


def test_join_rejects_overlap_and_bad_how(ray_session):
    from database_delta_plugins_ray.stages.join import shuffle_hash_join

    l = _ds([{"k": 1, "x": 1}])
    r = _ds([{"k": 1, "x": 2}])
    with pytest.raises(ValueError, match="overlap"):
        shuffle_hash_join(l, r, on="k")
    with pytest.raises(ValueError, match="join type"):
        shuffle_hash_join(l, _ds([{"k": 1, "y": 2}]), on="k", how="cross")


def test_percentile_rule_matches_duckdb(ray_session, tmp_path):
    """doc_length_percentiles' ceil-rule == DuckDB percentile_disc on a
    tiny corpus with skewed strata sizes."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.pipelines.analytics import (
        doc_length_percentiles,
    )

    rng = np.random.default_rng(5)
    langs = ["en"] * 37 + ["fr"] * 9 + ["zh"] * 1
    rows = [{"doc_id": i, "text": "", "lang": lang,
             "source": "s", "n_chars": int(rng.integers(1, 500))}
            for i, lang in enumerate(langs)]
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(sf / "documents.parquet"))

    got = doc_length_percentiles(str(sf))
    want = duckdb.sql(f"""
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY n_chars) AS p50,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY n_chars) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars) AS p99
        FROM read_parquet('{sf}/documents.parquet')
        GROUP BY lang ORDER BY lang
    """).df()
    pd.testing.assert_frame_equal(
        got.astype({"n_docs": "int64"}),
        want.astype({"n_docs": "int64", "p50": "int64",
                     "p90": "int64", "p99": "int64"}),
    )


def test_bloom_prefilter_parity_inner_and_left(ray_session):
    """prefilter=True must change nothing about the result (no false
    negatives) while actually pruning definite non-matches before the
    shuffle."""
    from database_delta_plugins_ray.stages.join import (
        bloom_of_keys,
        shuffle_hash_join,
    )

    rng = np.random.default_rng(11)
    left = _ds([{"k": int(k), "a": f"a{i}"}
                for i, k in enumerate(rng.integers(0, 5000, 4000))])
    right = _ds([{"k": int(k), "b": float(i)}
                 for i, k in enumerate(rng.integers(4000, 9000, 3000))])

    for how in ("inner", "left"):
        plain = pd.DataFrame(
            shuffle_hash_join(left, right, on="k", how=how).take_all())
        fast = pd.DataFrame(
            shuffle_hash_join(left, right, on="k", how=how,
                              prefilter=True).take_all())
        cols = ["k", "a", "b"]
        ps = sorted(map(tuple, plain[cols].astype(str).itertuples(index=False)))
        fs = sorted(map(tuple, fast[cols].astype(str).itertuples(index=False)))
        assert ps == fs, how

    # the filter demonstrably prunes: disjoint-key left side shrinks to ~0
    bits = bloom_of_keys(right, ["k"])
    from database_delta_plugins_ray.functions.sketch import bloom_contains

    lk = pd.DataFrame({"k": rng.integers(20000, 30000, 5000)})
    h = pd.util.hash_pandas_object(lk, index=False).to_numpy()
    assert bloom_contains(bits, h, 4).mean() < 0.01


def test_semi_and_anti_join(ray_session):
    from database_delta_plugins_ray.stages.join import shuffle_hash_join

    left = _ds([
        {"k": 1, "a": "x"}, {"k": 1, "a": "x2"},
        {"k": 2, "a": "y"}, {"k": 3, "a": "z"},
    ])
    right = _ds([{"k": 1, "b": 1.0}, {"k": 1, "b": 2.0}, {"k": 9, "b": 3.0}])

    semi = pd.DataFrame(
        shuffle_hash_join(left, right, on="k", how="semi").take_all())
    # duplicate right keys must NOT multiply left rows; right payload absent
    assert sorted(semi.columns) == ["a", "k"]
    assert sorted(map(tuple, semi[["k", "a"]].itertuples(index=False))) == [
        (1, "x"), (1, "x2")]

    anti = pd.DataFrame(
        shuffle_hash_join(left, right, on="k", how="anti").take_all())
    assert sorted(map(tuple, anti[["k", "a"]].itertuples(index=False))) == [
        (2, "y"), (3, "z")]

    # prefilter parity for both existence joins + salted semi
    for how in ("semi", "anti"):
        fast = pd.DataFrame(shuffle_hash_join(
            left, right, on="k", how=how, prefilter=True).take_all())
        base = semi if how == "semi" else anti
        assert (sorted(map(tuple, fast[["k", "a"]].itertuples(index=False)))
                == sorted(map(tuple, base[["k", "a"]].itertuples(index=False))))
    salted = pd.DataFrame(shuffle_hash_join(
        left, right, on="k", how="semi", salt=3).take_all())
    assert (sorted(map(tuple, salted[["k", "a"]].itertuples(index=False)))
            == [(1, "x"), (1, "x2")])


def test_outer_join(ray_session):
    from database_delta_plugins_ray.stages.join import shuffle_hash_join

    left = _ds([{"k": 1, "a": "x"}, {"k": 2, "a": "y"}])
    right = _ds([{"k": 1, "b": 7.0}, {"k": 9, "b": 8.0}])
    out = pd.DataFrame(
        shuffle_hash_join(left, right, on="k", how="outer").take_all())
    got = sorted(map(tuple, out[["k", "a", "b"]].astype(str)
                     .itertuples(index=False)))
    want = sorted([("1", "x", "7.0"), ("2", "y", "nan"), ("9", "nan", "8.0")])
    assert got == want
    with pytest.raises(ValueError):
        shuffle_hash_join(left, right, on="k", how="outer", prefilter=True)


def test_outer_join_salt_rejected(ray_session):
    from database_delta_plugins_ray.stages.join import shuffle_hash_join

    left = _ds([{"k": 1, "a": "x"}])
    right = _ds([{"k": 1, "b": 1.0}])
    with pytest.raises(ValueError):
        shuffle_hash_join(left, right, on="k", how="outer", salt=2)


def test_right_join(ray_session):
    from database_delta_plugins_ray.stages.join import shuffle_hash_join

    left = _ds([{"k": 1, "a": "x"}, {"k": 1, "a": "z"}, {"k": 2, "a": "y"}])
    right = _ds([{"k": 1, "b": 7.0}, {"k": 9, "b": 8.0}])
    out = pd.DataFrame(
        shuffle_hash_join(left, right, on="k", how="right").take_all())
    got = sorted(map(tuple, out[["k", "a", "b"]].astype(str)
                     .itertuples(index=False)))
    # both left rows of k=1 match; k=2 (left-only) is dropped; k=9
    # (right-only) survives with null left payload
    want = sorted([("1", "x", "7.0"), ("1", "z", "7.0"), ("9", "nan", "8.0")])
    assert got == want
    with pytest.raises(ValueError):
        shuffle_hash_join(left, right, on="k", how="right", salt=2)


def test_right_join_matches_pandas_and_prefilter(ray_session):
    from database_delta_plugins_ray.stages.join import shuffle_hash_join

    rng = np.random.default_rng(13)
    l = pd.DataFrame({"k": rng.integers(0, 40, 250),
                      "a": rng.integers(0, 1000, 250)})
    r = pd.DataFrame({"k": rng.integers(20, 60, 150),
                      "b": rng.integers(0, 1000, 150)})
    want = l.merge(r, on="k", how="right")
    for pf in (False, True):
        out = pd.DataFrame(
            shuffle_hash_join(
                ray.data.from_pandas(l), ray.data.from_pandas(r),
                on="k", how="right", prefilter=pf,
            ).take_all()
        )
        got = sorted(map(tuple, out[["k", "a", "b"]].astype(float).fillna(-1)
                         .itertuples(index=False)))
        exp = sorted(map(tuple, want[["k", "a", "b"]].astype(float).fillna(-1)
                         .itertuples(index=False)))
        assert got == exp
