"""Round-4 TPC-H shapes (Q4 semi, Q6 scan-agg, Q12 conditional-agg join,
Q19 disjunctive broadcast join, Q22 anti + broadcast scalar, Q7 two-sided
dim resolution) and the RAG chunker — each checked against its DuckDB
oracle over the sf0.001 driver testdata, plus semantic unit tests."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("orders", "lineitem", "part", "customer", "supplier",
          "nation", "documents")


def _oracle(sql: str, sf: str = SF):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    return con.execute(sql).df()


def _assert_parity(got: pd.DataFrame, want: pd.DataFrame, sort_cols):
    got = got.sort_values(sort_cols).reset_index(drop=True)
    want = want[got.columns].sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("name,sort_cols", [
    ("q6_forecast_revenue", ["revenue"]),
    ("q4_order_priority", ["o_orderpriority"]),
    ("q12_priority_by_linestatus", ["l_linestatus"]),
    ("q19_disjunctive_revenue", ["revenue"]),
    ("q22_sales_opportunity", ["c_nationkey"]),
    ("q7_volume_shipping", ["supp_nation", "cust_nation", "l_year"]),
    ("q2_min_cost_supplier", ["p_partkey", "s_suppkey"]),
    ("q9_product_type_profit", ["n_name", "o_year"]),
    ("q11_important_parts", ["p_partkey"]),
    ("q16_supplier_part_counts", ["p_brand", "p_type", "p_size"]),
    ("q20_prefix_part_shippers", ["s_suppkey"]),
])
def test_tpch_shape_matches_duckdb(ray_session, name, sort_cols):
    from database_delta_plugins_ray.pipelines import analytics as A

    got = A.ANALYTICS_QUERIES[name](SF)
    want = _oracle(A.ANALYTICS_ORACLE_SQL[name])
    assert len(got) == len(want) and len(got) > 0
    _assert_parity(got, want, sort_cols)


def test_chunker_matches_duckdb(ray_session):
    from database_delta_plugins_ray.pipelines import analytics as A

    got = A.chunk_documents_overlap(SF).to_pandas()
    want = _oracle(A.ANALYTICS_ORACLE_SQL["chunk_documents_overlap"])
    assert len(got) == len(want) and len(got) > 0
    _assert_parity(got, want, ["doc_id", "chunk_id"])


def test_chunker_semantics(ray_session, tmp_path):
    """Planted docs: empty text emits nothing; a short doc emits one
    full-coverage chunk; a 100-token doc emits ceil((100-64)/48)+1 = 2
    chunks whose windows overlap by 64-48=16 tokens; every token index
    is covered by at least one chunk."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.pipelines import analytics as A

    toks = [f"t{i}" for i in range(100)]
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "a b  c", " ".join(toks)]),
    })
    d = tmp_path / "sf0.x"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    out = A.chunk_documents_overlap(str(d)).to_pandas()
    assert 1 not in set(out["doc_id"])
    one = out[out.doc_id == 2]
    assert len(one) == 1 and int(one.n_tokens.iloc[0]) == 3
    big = out[out.doc_id == 3].sort_values("chunk_id")
    assert list(big.chunk_id) == [0, 1]
    assert list(big.n_tokens) == [64, 100 - A.CHUNK_S]
    # coverage: chunk 1 starts at token 48 < 64 = end of chunk 0
    assert A.CHUNK_S < A.CHUNK_W


def test_q22_threshold_is_exact_integer_cents(ray_session, tmp_path):
    """A customer whose balance equals the average to the cent is NOT
    above-average; one cent more is. Float sum-order can never flip
    this because both sides compare cents*count > sum_cents."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.pipelines import analytics as A

    # balances: 10.00, 20.00, 30.00 -> avg 20.00; 20.01 is above
    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([7, 7, 7, 7], pa.int64()),
        "c_acctbal": pa.array([10.0, 20.0, 30.0, 20.01]),
    })
    # recompute avg including customer 4: (1000+2000+3000+2001)/4 cents
    # = 2000.25 -> strictly above: 30.00 and 20.01? 2001*4=8004 > 8001 yes
    orders = pa.table({
        "o_custkey": pa.array([1], pa.int64()),
        "o_orderdate": pa.array([np.datetime64("2000-06-01", "us")]),
    })
    d = tmp_path / "sfq22"
    d.mkdir()
    pq.write_table(cust, str(d / "customer.parquet"))
    pq.write_table(orders, str(d / "orders.parquet"))
    got = A.q22_sales_opportunity(str(d))
    # customers 3 (30.00) and 4 (20.01) are above the 20.0025 average
    # and have no orders past the cutoff; customer 2 (20.00) is below
    assert int(got.numcust.iloc[0]) == 2
    assert float(got.totacctbal.iloc[0]) == 50.01


def test_keep_best_dedup_matches_duckdb(ray_session):
    from database_delta_plugins_ray.pipelines import analytics as A

    got = A.dedup_exact_keep_best(SF).to_pandas()
    want = _oracle(A.ANALYTICS_ORACLE_SQL["dedup_exact_keep_best"])
    assert len(got) == len(want) and len(got) > 0
    _assert_parity(got, want, ["text_md5"])


def test_group_median_matches_duckdb(ray_session):
    from database_delta_plugins_ray.pipelines import analytics as A

    got = A.orders_median_price_by_status(SF)
    want = _oracle(
        A.ANALYTICS_ORACLE_SQL["orders_median_price_by_status"])
    assert len(got) == len(want) and len(got) > 0
    # bitwise-equal medians: the result must be a stored data value
    _assert_parity(got, want, ["o_orderstatus"])


def test_keep_best_prefers_quality_over_id(ray_session, tmp_path):
    """Exact dedup groups have identical text, hence identical scores —
    the winner must come from the min-doc_id tiebreak, and singletons
    pass through with n_dups=1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.pipelines import analytics as A

    docs = pa.table({
        "doc_id": pa.array([5, 2, 9], pa.int64()),
        "text": pa.array(["the quick brown fox jumps over the lazy dog",
                          "the quick brown fox jumps over the lazy dog",
                          "zzz"]),
    })
    d = tmp_path / "kb"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    out = A.dedup_exact_keep_best(str(d)).to_pandas()
    assert len(out) == 2
    dup = out[out.n_dups == 2]
    # identical text -> identical score -> tiebreak min doc_id
    assert int(dup.doc_id.iloc[0]) == 2


@pytest.mark.parametrize("name,sort_cols", [
    ("q15_top_supplier", ["s_suppkey"]),
    ("q17_small_quantity_revenue", ["avg_yearly"]),
    ("q8_market_share", ["o_year"]),
    ("q21_sole_supplier_orders", ["s_suppkey"]),
])
def test_tpch_q15_q17_match_duckdb(ray_session, name, sort_cols):
    from database_delta_plugins_ray.pipelines import analytics as A

    got = A.ANALYTICS_QUERIES[name](SF)
    want = _oracle(A.ANALYTICS_ORACLE_SQL[name])
    assert len(got) == len(want) and len(got) > 0
    _assert_parity(got, want, sort_cols)


def test_q15_empty_window_returns_empty(ray_session, tmp_path, monkeypatch):
    """An sf whose lineitems all fall outside the quarter yields an
    empty (but correctly-typed) result instead of crashing on the
    max-over-empty aggregate."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.pipelines import analytics as A

    d = tmp_path / "sfq15"
    d.mkdir()
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1], pa.int64()),
        "l_shipdate": pa.array([np.datetime64("1990-01-01", "us")]),
        "l_extendedprice": pa.array([10.0]),
        "l_discount": pa.array([0.0]),
    }), str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": pa.array(["s1"]),
    }), str(d / "supplier.parquet"))
    out = A.q15_top_supplier(str(d))
    assert len(out) == 0
    assert list(out.columns) == ["s_suppkey", "s_name", "total_revenue"]


def test_q17_no_brand_parts_returns_zero(ray_session, tmp_path):
    """A fixture with no parts of the target brand yields avg_yearly 0.0
    (empty aggregate, no crash in the broadcast threshold path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.pipelines import analytics as A

    d = tmp_path / "sfq17"
    d.mkdir()
    pq.write_table(pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_brand": pa.array(["Brand#99"]),
    }), str(d / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1], pa.int64()),
        "l_quantity": pa.array([5.0]),
        "l_extendedprice": pa.array([100.0]),
    }), str(d / "lineitem.parquet"))
    out = A.q17_small_quantity_revenue(str(d))
    assert float(out["avg_yearly"].iloc[0]) == 0.0


def test_events_user_setops_matches_duckdb(ray_session):
    import duckdb

    from database_delta_plugins_ray.pipelines import analytics as A

    got = A.events_user_setops(SF)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(A.ANALYTICS_ORACLE_SQL["events_user_setops"]).df()
    _assert_parity(got, want, ["bucket"])
