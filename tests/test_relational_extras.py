"""Round-3 relational extras: ROLLUP grouping sets, conditional-aggregate
broadcast join (TPC-H Q14 shape), vectorized unicode canonicalization, and
the data-quality expectation report — each checked against its DuckDB
oracle over the sf0.001 driver testdata, plus semantic unit tests on
planted inputs."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str, sf: str = SF, tables=("orders", "lineitem", "part",
                                            "events", "documents")):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    return con.execute(sql).df()


def _assert_parity(got: pd.DataFrame, want: pd.DataFrame, sort_cols):
    got = got.sort_values(sort_cols).reset_index(drop=True)
    want = want[got.columns].sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rollup_matches_duckdb(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        ANALYTICS_ORACLE_SQL,
        orders_rollup_status_priority,
    )

    got = orders_rollup_status_priority(SF)
    want = _oracle(ANALYTICS_ORACLE_SQL["orders_rollup_status_priority"])
    _assert_parity(got, want, ["o_orderstatus", "o_orderpriority"])
    # internal consistency: the subtotal level reproduces the grand total
    fine = got[got.o_orderpriority.notna()]
    sub = got[got.o_orderpriority.isna() & got.o_orderstatus.notna()]
    grand = got[got.o_orderstatus.isna()]
    assert len(grand) == 1
    assert int(fine.n_orders.sum()) == int(grand.n_orders.iloc[0])
    assert int(sub.n_orders.sum()) == int(grand.n_orders.iloc[0])


def test_promo_revenue_matches_duckdb(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        ANALYTICS_ORACLE_SQL,
        promo_revenue_monthly,
    )

    got = promo_revenue_monthly(SF)
    want = _oracle(ANALYTICS_ORACLE_SQL["promo_revenue_monthly"])
    _assert_parity(got, want, ["ship_month"])
    assert ((got.promo_share >= 0) & (got.promo_share <= 100)).all()


def test_normalize_text_matches_duckdb(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        ANALYTICS_ORACLE_SQL,
        normalize_text_documents,
    )

    got = normalize_text_documents(SF).to_pandas()
    want = _oracle(ANALYTICS_ORACLE_SQL["normalize_text_documents"])
    _assert_parity(got, want, ["doc_id"])


def test_normalize_text_semantics(ray_session, tmp_path):
    """NFD input folds to the NFC fingerprint; case and whitespace runs
    collapse; two spellings of the same text share one hash."""
    import hashlib

    from database_delta_plugins_ray.pipelines.analytics import (
        normalize_text_documents,
    )

    d = str(tmp_path)
    rows = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "Café  du   Monde",      # NFD e + combining acute
            "café du monde",          # NFC, lowercase, single spaces
            "  Tabs\tand\nnewlines  ",
        ]),
    })
    pq.write_table(rows, os.path.join(d, "documents.parquet"))
    out = normalize_text_documents(d).to_pandas().set_index("doc_id")
    assert out.loc[1, "norm_md5"] == out.loc[2, "norm_md5"]
    assert out.loc[1, "n_chars_norm"] == len("café du monde")
    want = hashlib.md5("tabs and newlines".encode()).hexdigest()
    assert out.loc[3, "norm_md5"] == want


def test_dq_expectations_matches_duckdb(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        ANALYTICS_ORACLE_SQL,
        dq_expectations,
    )

    got = dq_expectations(SF)
    want = _oracle(ANALYTICS_ORACLE_SQL["dq_expectations"])
    _assert_parity(got, want, ["rule"])
    # the clean driver data violates nothing structural
    z = got.set_index("rule")["n_violations"]
    assert z["orders_null_custkey"] == 0
    assert z["lineitem_orphan_orderkey"] == 0
    assert z["orders_duplicate_orderkey"] == 0


def test_dq_expectations_detects_planted_violations(ray_session, tmp_path):
    """Planted nulls, dup PKs, orphans and out-of-range values are each
    counted exactly."""
    from database_delta_plugins_ray.pipelines.analytics import (
        dq_expectations,
    )

    d = str(tmp_path)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 2, 3], pa.int64()),   # dup PK 2
        "o_custkey": pa.array([10, None, 12, 13], pa.int64()),  # 1 null
        "o_totalprice": pa.array([-5.0, 100.0, 500_000.0, 1.0]),
        # 1 nonpositive, 1 above 490k
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 99, 98], pa.int64()),  # 2 orphans
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "value": pa.array([1.0, -2.0, -3.0]),                # 2 negative
    }), os.path.join(d, "events.parquet"))

    z = dq_expectations(d).set_index("rule")["n_violations"]
    assert z["orders_null_custkey"] == 1
    assert z["orders_duplicate_orderkey"] == 1
    assert z["orders_nonpositive_total"] == 1
    assert z["orders_total_above_490k"] == 1
    assert z["lineitem_orphan_orderkey"] == 2
    assert z["events_negative_value"] == 2


def test_scd2_history_invariants(ray_session):
    """SCD2 intervals chain correctly and the open (is_current) versions
    are EXACTLY the oracle replay's final state, commit for commit."""
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.queries import (
        cdc_scd2_history,
        ensure_log,
    )

    log = ensure_log(SF)
    hist = cdc_scd2_history(SF).to_pandas()

    assert (hist.loc[hist.valid_to.notna(), "valid_to"]
            > hist.loc[hist.valid_to.notna(), "valid_from"]).all()
    cur = hist[hist.is_current == 1]
    assert cur.valid_to.isna().all()
    # at most one open version per key
    assert not cur.duplicated(["repo", "path"]).any()
    # versions of one key never overlap: each valid_to <= next valid_from
    h = hist.sort_values(["repo", "path", "valid_from"])
    nxt_from = h.groupby(["repo", "path"], sort=False)["valid_from"].shift(-1)
    closed = h.valid_to.notna() & nxt_from.notna()
    assert (h.loc[closed, "valid_to"] <= nxt_from[closed]).all()

    want = replay(log)
    want_keys = {(k[1], k[2]) if len(k) == 3 else k: v["commit"]
                 for k, v in want.items()}
    got_keys = dict(zip(zip(cur.repo, cur.path), cur["commit"]))
    assert got_keys == want_keys


def test_pack_sequences_matches_duckdb_and_invariants(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        ANALYTICS_ORACLE_SQL,
        pack_sequences_documents,
    )

    got = pack_sequences_documents(SF).to_pandas()
    want = _oracle(ANALYTICS_ORACLE_SQL["pack_sequences_documents"])
    _assert_parity(got, want, ["doc_id"])
    # a document starts in the bin its exclusive prefix falls into:
    # bin token-starts are therefore < budget apart and bins are dense
    per_seq = got.groupby("seq_id")["n_tokens"].sum()
    assert per_seq.index.min() == 0
    assert set(per_seq.index) == set(range(per_seq.index.max() + 1))
    # bins cover the stream: no bin past the exclusive-prefix bound,
    # and every non-final bin is non-empty
    total = int(got["n_tokens"].sum())
    assert per_seq.index.max() <= (total - 1) // 512
    assert per_seq.iloc[:-1].ge(1).all()


def test_events_value_trend_matches_duckdb(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        ANALYTICS_ORACLE_SQL,
        events_value_trend,
    )

    got = events_value_trend(SF)
    want = _oracle(ANALYTICS_ORACLE_SQL["events_value_trend"])
    _assert_parity(got, want, ["event_type"])
    # brute-force check of one group against numpy's lstsq
    import duckdb as _d

    raw = _d.connect().execute(
        f"SELECT datediff('day', DATE '1995-01-01', ts) x, "
        f"CAST(floor(value*100.0+0.5) AS BIGINT) y "
        f"FROM read_parquet('{SF}/events.parquet') "
        f"WHERE event_type = 'click'").df()
    slope = np.polyfit(raw.x.to_numpy(float), raw.y.to_numpy(float), 1)[0]
    ours = float(got.set_index("event_type").loc["click",
                                                 "slope_cents_per_day"])
    assert abs(slope - ours) < 1e-4


def test_doc_length_deciles_matches_duckdb(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        ANALYTICS_ORACLE_SQL,
        doc_length_deciles,
    )

    got = doc_length_deciles(SF).to_pandas()
    want = _oracle(ANALYTICS_ORACLE_SQL["doc_length_deciles"])
    _assert_parity(got, want, ["doc_id"])
    # deciles are balanced (sizes differ by at most 1) and ordered by
    # length: every doc in decile d is <= every doc in decile d+1
    sizes = got.groupby("decile").size()
    assert set(sizes.index) == set(range(10))
    assert sizes.max() - sizes.min() <= 1
    bounds = got.groupby("decile")["n_chars"].agg(["min", "max"]).sort_index()
    assert (bounds["max"].to_numpy()[:-1]
            <= bounds["min"].to_numpy()[1:]).all()


def test_funnel_semantics_planted(ray_session, tmp_path):
    """Window edges: converts only when a purchase lands strictly after
    the view and within the hour; earlier purchases don't count."""
    from database_delta_plugins_ray.pipelines.analytics import (
        funnel_view_purchase,
    )

    t0 = pd.Timestamp("2024-01-01 12:00:00")

    def ev(uid, et, minutes):
        return {"user_id": uid, "event_type": et,
                "ts": t0 + pd.Timedelta(minutes=minutes), "event_id": 0,
                "value": 0.0, "props": "{}"}

    rows = [
        ev(1, "view", 0), ev(1, "purchase", 30),    # converts
        ev(2, "view", 0), ev(2, "purchase", 120),   # too late
        ev(3, "purchase", 0), ev(3, "view", 30),    # purchase BEFORE view
        ev(4, "click", 0),                          # never viewed
        ev(5, "view", 0), ev(5, "purchase", 60),    # exactly at the edge
    ]
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows), os.path.join(
        d, "events.parquet"))
    got = funnel_view_purchase(d).set_index("stage")["n_users"]
    assert got["viewed"] == 4
    assert got["converted"] == 2  # users 1 and 5 (inclusive edge)


def test_cohort_retention_planted(ray_session, tmp_path):
    """Cohort = first-activity week; a user counts once per distinct
    offset week; users never leak across cohorts."""
    from database_delta_plugins_ray.pipelines.analytics import (
        cohort_retention_weekly,
    )

    t0 = pd.Timestamp("1995-01-02")  # week 0 since the 1995-01-01 epoch

    def ev(uid, days):
        return {"user_id": uid, "event_type": "view",
                "ts": t0 + pd.Timedelta(days=days), "event_id": 0,
                "value": 0.0, "props": "{}"}

    rows = [
        # user 1: cohort week 0, active weeks 0, 1, 3 (twice in week 1)
        ev(1, 0), ev(1, 7), ev(1, 9), ev(1, 21),
        # user 2: cohort week 0, active week 0 only
        ev(2, 1),
        # user 3: cohort week 2, active weeks 2 and 3
        ev(3, 14), ev(3, 22),
    ]
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(d, "events.parquet"))
    got = cohort_retention_weekly(d).to_pandas()
    m = {(r.cohort_week, r.week_offset): r.n_users
         for r in got.itertuples()}
    assert m == {
        (0, 0): 2,   # users 1 and 2
        (0, 1): 1,   # user 1 (deduped within the week)
        (0, 3): 1,   # user 1
        (2, 0): 1,   # user 3
        (2, 1): 1,   # user 3
    }


def test_value_outliers_exact_integer_rule(ray_session, tmp_path):
    """(n*v - S)^2 > 9*(n*Svv - S^2) decided exactly, including the
    |d| > 3e9 escalation path (a square that overflows int64)."""
    from database_delta_plugins_ray.pipelines.analytics import (
        events_value_outliers,
    )

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # huge-magnitude group: d for the big value is ~1.2e10 (> 3e9)
    for val in (0.01, 0.01, 0.01, 40_000_000.00):
        rows.append({"event_id": 0, "ts": t0, "user_id": 1,
                     "event_type": "huge", "value": val, "props": "{}"})
    # zero-variance group: no outliers by definition
    for _ in range(5):
        rows.append({"event_id": 0, "ts": t0, "user_id": 1,
                     "event_type": "flat", "value": 2.50, "props": "{}"})
    # normal group with one clear outlier
    for val in ([1.00] * 20) + [1000.00]:
        rows.append({"event_id": 0, "ts": t0, "user_id": 1,
                     "event_type": "norm", "value": val, "props": "{}"})
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(d, "events.parquet"))
    got = {r["event_type"]: (r["n_outliers"], r["n_events"])
           for r in events_value_outliers(d).take_all()}

    # brute force with Python bigints
    def brute(vals):
        v = [int(np.floor(x * 100 + 0.5)) for x in vals]
        n, s = len(v), sum(v)
        rhs = 9 * (n * sum(x * x for x in v) - s * s)
        return sum(1 for x in v if (n * x - s) ** 2 > rhs)

    assert got == {
        "huge": (brute([0.01, 0.01, 0.01, 40_000_000.0]), 4),
        "flat": (0, 5),
        "norm": (brute([1.0] * 20 + [1000.0]), 21),
    }
    # max attainable |z| in a group of n is (n-1)/sqrt(n): ~1.5 for n=4,
    # so the huge group flags nothing (the extreme point owns the mean) —
    # what matters is that its 1.6e19 square went through the limb path
    # without overflow; the 21-row group isolates its single outlier
    assert got["huge"][0] == 0 and got["norm"][0] == 1


def test_token_pmi_semantics(ray_session, tmp_path):
    """A pair that always co-occurs scores positive PMI; a pair that
    never co-occurs is absent; counts are doc-level (dedup within doc)."""
    from database_delta_plugins_ray.pipelines.analytics import (
        token_pmi_pairs,
    )

    docs = (["alpha beta alpha beta"] * 10        # alpha & beta together
            + ["gamma common"] * 10               # gamma never w/ alpha
            + ["alpha common"] * 10)
    rows = [{"doc_id": f"d{i}", "text": t, "lang": "en"}
            for i, t in enumerate(docs)]
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(d, "documents.parquet"))
    out = token_pmi_pairs(d, vocab_cap=10)
    m = {(r.tok_a, r.tok_b): (r.n_co, r.pmi_micros)
         for r in out.itertuples()}
    assert ("alpha", "gamma") not in m            # never co-occur
    n_co, pmi = m[("alpha", "beta")]
    assert n_co == 10                              # deduped per doc
    # PMI(alpha, beta) = ln(30 * 10 / (20 * 10)) = ln(1.5) > 0
    assert pmi == int(np.floor(np.log(30.0 * 10 / (20 * 10)) * 1e6 + 0.5))
    n_co2, pmi2 = m[("alpha", "common")]
    assert n_co2 == 10 and pmi2 < 0               # ln(30*10/(20*20)) < 0


def test_lm_surprise_semantics(ray_session, tmp_path):
    """Rare-token docs score higher surprise than common-token docs;
    OOV tokens pool into one <unk> probability; empty docs score 0."""
    from database_delta_plugins_ray.pipelines.analytics import (
        lm_surprise_documents,
    )

    docs = (["common common common common"] * 8
            + ["rare1 rare2", ""])
    rows = [{"doc_id": f"d{i}", "text": t, "lang": "en"}
            for i, t in enumerate(docs)]
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(d, "documents.parquet"))
    out = (lm_surprise_documents(d, vocab_cap=2).to_pandas()
           .set_index("doc_id"))
    # vocab (top-2 by df) = {common, rare1|rare2 tie->rare1}; rare2 OOV
    total = 34
    s_common = int(np.floor(np.log(32 / total) * 1e6 + 0.5))
    s_rare1 = int(np.floor(np.log(1 / total) * 1e6 + 0.5))
    s_unk = int(np.floor(np.log(1 / total) * 1e6 + 0.5))
    assert out.loc["d0", "surprise_sum_micros"] == -4 * s_common
    assert out.loc["d8", "surprise_sum_micros"] == -(s_rare1 + s_unk)
    assert out.loc["d9", "surprise_sum_micros"] == 0
    assert out.loc["d9", "n_tokens"] == 0
    # per-token average surprise: the rare doc is the quality outlier
    avg8 = out.loc["d8", "surprise_sum_micros"] / out.loc["d8", "n_tokens"]
    avg0 = out.loc["d0", "surprise_sum_micros"] / out.loc["d0", "n_tokens"]
    assert avg8 > avg0 > 0


def test_range_sum_brute_parity_and_bucket_invariance(ray_session):
    """ordered_range_sum == brute-force interval sums, for several
    bucket counts (boundary replication must be seam-free) and with
    duplicate keys (RANGE peers always share a frame)."""
    import ray.data

    from database_delta_plugins_ray.stages.scan import ordered_range_sum

    rng = np.random.default_rng(11)
    n = 400
    keys = rng.integers(0, 1000, n)       # many duplicate keys
    keys[:5] = [0, 0, 999, 999, 500]
    vals = rng.integers(-50, 100, n)
    df = pd.DataFrame({"k": keys.astype(np.int64),
                       "id": np.arange(n, dtype=np.int64),
                       "v": vals.astype(np.int64)})
    span = 37

    def brute():
        out = {}
        for _, r in df.iterrows():
            m = (df.k >= r.k - span) & (df.k <= r.k)
            out[int(r.id)] = int(df.loc[m, "v"].sum())
        return out

    want = brute()
    for nb in (1, 3, 64, 500):
        ds = ray.data.from_pandas(df).repartition(7)
        got = {int(r["id"]): int(r["range_sum"])
               for r in ordered_range_sum(
                   ds, order_col="k", value_col="v",
                   span_units=span, nbuckets=nb).take_all()}
        assert got == want, nb
    # span wider than the whole key range: every frame is a prefix-by-key
    got = {int(r["id"]): int(r["range_sum"])
           for r in ordered_range_sum(
               ray.data.from_pandas(df), order_col="k", value_col="v",
               span_units=10_000, nbuckets=16).take_all()}
    pref = {int(r.id): int(df.loc[df.k <= r.k, "v"].sum())
            for _, r in df.iterrows()}
    assert got == pref
