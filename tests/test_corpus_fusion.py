"""cdc_to_training_corpus: the lake → training-corpus fusion query must
match its DuckDB oracle (LWW replay → quality gate → md5 sample →
content-hash dedup → shard routing) at sf0.001."""

import duckdb
import pandas as pd


def test_fusion_matches_oracle(ray_session):
    from database_delta_plugins_ray.pipelines import queries as Q

    got = (Q.cdc_to_training_corpus("/root/testdata/sf0.001")
           .to_pandas().sort_values("content_sha").reset_index(drop=True))
    sql = Q.cdc_oracle_sql("0.001")["cdc_to_training_corpus"]
    want = (duckdb.connect().execute(sql).df()[got.columns.tolist()]
            .sort_values("content_sha").reset_index(drop=True))
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # dedup really deduped: content hashes unique, every shard in range
    assert got["content_sha"].is_unique
    assert got["shard"].between(0, 15).all()
