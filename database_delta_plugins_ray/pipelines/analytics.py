"""Analytics / training-data query catalog over the driver testdata tables
(lineitem, orders, events, documents, embeddings).

Each SQL-expressible query has a DuckDB oracle with IDENTICAL column names;
float aggregates are rounded identically on both sides. Non-SQL-expressible
operators (LSH dedup, simhash, IVF-ANN, multimodal stubs, heuristic lang-id)
are exposed rows-only.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _t(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    import ray

    # cap read blocks near the CPU count: Ray's default ~200-block target
    # makes every downstream sort/groupby latency-bound on small inputs
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns,
        override_num_blocks=cpus,
    )


def _cache_dir(sf_dir: str, name: str) -> str:
    import re as _re

    tag = _re.search(r"sf([\d.]+)", sf_dir)
    return f"/tmp/ddpr_cache/sf{tag.group(1) if tag else 'x'}/{name}"


def _source_fingerprint(path: str) -> str:
    """Cache-invalidation tag: path + mtime + size, so regenerated data
    at the same path rebuilds instead of silently reusing stale
    artifacts."""
    st = os.stat(path)
    return f"{path}:{st.st_mtime_ns}:{st.st_size}"


def _to_cents(df: pd.DataFrame, cols: list) -> pd.DataFrame:
    """Project + integer-cents conversion shared by the window queries;
    the literal floor(v*100+0.5) mirrors the SQL oracles exactly."""
    out = df[cols].copy()
    out["cents"] = np.floor(
        df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# relational / aggregate queries (SQL-oracled)
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style pricing summary with per-batch PARTIAL aggregation
    before the (tiny) groupby — the canonical combine-then-shuffle shape."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        t = t.append_column("disc_price", disc_price)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "p_qty": g["l_quantity_sum"],
                "p_base": g["l_extendedprice_sum"],
                "p_disc": g["disc_price_sum"],
                "p_n": g["l_quantity_count"],
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("p_qty", alias_name="sum_qty"),
        Sum("p_base", alias_name="sum_base_price"),
        Sum("p_disc", alias_name="sum_disc_price"),
        Sum("p_n", alias_name="count_order"),
    )
    df = agg.to_pandas()  # a handful of groups — driver-side finish is fine
    df["avg_qty"] = (df["sum_qty"] / df["count_order"]).round(4)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        df[c] = df[c].round(2)
    return df[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
               "sum_disc_price", "avg_qty", "count_order"]]


def events_latest_per_user(sf_dir: str):
    """Last event per user by (ts, event_id) — the LWW primitive applied to
    the events stream (same semantics as the CDC merge, different key).

    Per-batch combiner BEFORE the shuffle: argmax per user is associative,
    so each batch keeps at most one row per user — the all-to-all exchange
    moves ~#users rows instead of every event (the same pre-reduction the
    CDC normalize stage applies)."""
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type", "value"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["ts", "event_id"])
                  .drop_duplicates("user_id", keep="last"))

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["ts", "event_id"]).tail(1)

    reduced = ds.map_batches(combine, batch_format="pandas")
    return reduced.groupby("user_id").map_groups(latest, batch_format="pandas")


def purchases_asof_last_view(sf_dir: str):
    """AS-OF join — a custom operator Ray Data lacks (SURVEY charter:
    "as-of join ... as a composition of map_batches + groupby().map_groups
    + sort if semantics allow"): each purchase event joins the same user's
    most recent STRICTLY-EARLIER view event.

    Shape: filter both sides at the read (only two event types survive) ->
    ONE shuffle by the join key (user_id) -> vectorized merge inside
    map_groups (both streams sorted by ts; np.searchsorted finds each
    purchase's predecessor view in O(log n)). Ties at identical (user, ts)
    on the view side are deduplicated deterministically (max event_id),
    matching the SQL oracle's max_by.

    Documented partitioning assumption: one user's event history fits one
    task (the natural CDC-style key); a pathological hot user would salt
    by time range with a boundary handoff row per salt."""
    ds = _t(sf_dir, "events",
            ["event_id", "ts", "user_id", "event_type", "value"])
    ds = ds.filter(expr="event_type == 'purchase' or event_type == 'view'")

    empty = pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
        "value": pd.Series([], dtype="float64"),
        "view_ts": pd.Series([], dtype="datetime64[us]"),
        "view_value": pd.Series([], dtype="float64"),
    })

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        x = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        if x.empty:
            return empty
        y = (g[g["event_type"] == "view"]
             .sort_values(["ts", "event_id"])
             .drop_duplicates("ts", keep="last"))
        if y.empty:
            idx = np.full(len(x), -1)
        else:
            idx = np.searchsorted(y["ts"].to_numpy(), x["ts"].to_numpy(),
                                  side="left") - 1
        has = idx >= 0
        safe = np.clip(idx, 0, None)
        y_ts = (y["ts"].to_numpy()[safe] if len(y)
                else np.full(len(x), np.datetime64("NaT", "us")))
        y_val = (y["value"].to_numpy()[safe] if len(y)
                 else np.full(len(x), np.nan))
        return pd.DataFrame({
            "event_id": x["event_id"].to_numpy(),
            "user_id": x["user_id"].to_numpy(),
            "ts": x["ts"].to_numpy(),
            "value": np.round(x["value"].to_numpy(), 2),
            "view_ts": pd.Series(y_ts).where(has, pd.NaT),
            "view_value": np.where(has, np.round(y_val, 2), np.nan),
        })

    return ds.groupby("user_id").map_groups(asof, batch_format="pandas")


def top_docs_per_lang(sf_dir: str, k: int = 5):
    """Grouped top-k (longest documents per language): per-batch PARTIAL
    top-k combiner before the shuffle — each batch forwards at most k rows
    per group, so the exchange moves O(groups x k x batches) rows, never
    the corpus — then an exact per-group finish. Deterministic tie-break
    (n_chars desc, doc_id asc) mirrors the SQL window oracle."""
    docs = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["n_chars", "doc_id"],
                               ascending=[False, True])
                  .groupby("lang", sort=False).head(k))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(["n_chars", "doc_id"],
                            ascending=[False, True]).head(k).copy()
        out["rank"] = np.arange(1, len(out) + 1)
        return out

    reduced = docs.map_batches(partial_topk, batch_format="pandas")
    return reduced.groupby("lang").map_groups(finish, batch_format="pandas")


def events_hopping_window(sf_dir: str):
    """Hopping (sliding) window aggregate — size 2 h, hop 1 h: every event
    belongs to TWO windows. Ray-Data-first shape: the window assignment
    explodes inside ``map_batches`` (vectorized, 2 rows out per event)
    with a per-batch PARTIAL aggregate, then a tiny groupby over partials
    — the same combine-then-shuffle shape as the tumbling window, so the
    exchange moves O(windows x types x batches) rows, never the events."""
    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        anchor = pc.floor_temporal(t["ts"], unit="hour")
        parts = []
        for off_h in (0, 1):  # window starts at floor(ts) and floor(ts)-1h
            ws = pc.subtract(
                anchor, pa.scalar(off_h * 3_600_000_000, pa.duration("us")))
            g = pa.table({
                "window_start": ws,
                "event_type": t["event_type"],
                "value": t["value"],
            }).group_by(["window_start", "event_type"]).aggregate(
                [("value", "sum"), ("value", "count")])
            parts.append(pa.table({
                "window_start": g["window_start"],
                "event_type": g["event_type"],
                "p_sum": g["value_sum"],
                "p_n": g["value_count"],
            }))
        return pa.concat_tables(parts)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("p_sum", alias_name="total_value"),
        Sum("p_n", alias_name="n_events"),
    )

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df["total_value"] = df["total_value"].round(2)
        return df

    return agg.map_batches(canon, batch_format="pandas")


def orders_with_events_in_week(sf_dir: str, nparts: int = 64):
    """RANGE join — the second custom join the charter lists: count each
    order's events (customer id = user id) whose timestamp falls in the
    7 days FROM the order date. One COARSE shuffle (``key % nparts`` —
    nparts map_groups calls, never n_keys: per-key dispatch cost was
    the bulk of this query's wall time) and inside each partition ONE
    searchsorted over a composite (key, ts-ms) encoding answers every
    order at once:

      enc = key * span_ms + clip(ts_ms - tmin_ms)

    is order-isomorphic to (key, ts), so the per-key event segments
    concatenate into one sorted array; order windows clamp into their
    key's segment. Quantizing to MILLISECONDS is exact here because the
    window boundaries are day-aligned (documented assumption — keeps
    key * span inside int64 out to ~10^7 keys x multi-year spans).
    Never the O(n x m) cross product a naive inequality join would do."""
    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_orderdate"])
    events = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def o_rows(t: pa.Table) -> pa.Table:
        key = t["o_custkey"]
        return pa.table({
            "key": key,
            "part": pc.cast(pc.bit_wise_and(key, nparts - 1)
                            if (nparts & (nparts - 1)) == 0
                            else pc.subtract(
                                key, pc.multiply(
                                    pc.divide(key, nparts), nparts)),
                            pa.int32()),
            "o_orderkey": t["o_orderkey"],
            "o_orderdate": t["o_orderdate"],
            "ts": pa.nulls(t.num_rows, pa.timestamp("us")),
            "value": pa.nulls(t.num_rows, pa.float64()),
            "kind": pa.array(["o"] * t.num_rows),
        })

    def e_rows(t: pa.Table) -> pa.Table:
        key = t["user_id"]
        return pa.table({
            "key": key,
            "part": pc.cast(pc.bit_wise_and(key, nparts - 1)
                            if (nparts & (nparts - 1)) == 0
                            else pc.subtract(
                                key, pc.multiply(
                                    pc.divide(key, nparts), nparts)),
                            pa.int32()),
            "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
            "o_orderdate": pa.nulls(t.num_rows, pa.timestamp("us")),
            "ts": t["ts"],
            "value": t["value"],
            "kind": pa.array(["e"] * t.num_rows),
        })

    both = orders.map_batches(o_rows, batch_format="pyarrow").union(
        events.map_batches(e_rows, batch_format="pyarrow"))

    week_ms = 7 * 86_400_000

    def range_count(g: pd.DataFrame) -> pd.DataFrame:
        om = (g["kind"] == "o").to_numpy()
        empty = pd.DataFrame({
            "o_orderkey": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "sum_value": pd.Series([], dtype="float64"),
        })
        if not om.any():
            return empty
        okey = g["key"].to_numpy()[om].astype(np.int64)
        oid = g["o_orderkey"].to_numpy()[om].astype(np.int64)
        s_ms = (g["o_orderdate"].to_numpy()[om]
                .astype("datetime64[ms]").astype(np.int64))
        em = ~om
        if not em.any():
            return pd.DataFrame({
                "o_orderkey": oid,
                "n_events": np.zeros(len(oid), np.int64),
                "sum_value": np.zeros(len(oid), np.float64),
            })
        ekey = g["key"].to_numpy()[em].astype(np.int64)
        e_ms = (g["ts"].to_numpy()[em]
                .astype("datetime64[ms]").astype(np.int64))
        vals = g["value"].to_numpy()[em].astype(np.float64)
        tmin = int(e_ms.min())
        span = int(e_ms.max()) - tmin + 2  # room for the end clamp
        enc = ekey * span + (e_ms - tmin)
        order = np.argsort(enc, kind="stable")
        enc = enc[order]
        csum = np.concatenate([[0.0], np.cumsum(vals[order])])
        lo = okey * span + np.clip(s_ms - tmin, 0, span - 1)
        hi = okey * span + np.clip(s_ms + week_ms - tmin, 0, span - 1)
        i_lo = np.searchsorted(enc, lo, side="left")
        i_hi = np.searchsorted(enc, hi, side="left")
        return pd.DataFrame({
            "o_orderkey": oid,
            "n_events": (i_hi - i_lo).astype(np.int64),
            "sum_value": np.round(csum[i_hi] - csum[i_lo], 2),
        })

    return both.groupby("part").map_groups(range_count,
                                           batch_format="pandas")


def top_users_by_value(sf_dir: str):
    """Top-20 users by total event value (groupby-sum -> sort -> limit)."""
    ds = _t(sf_dir, "events", ["user_id", "value"])
    agg = ds.groupby("user_id").aggregate(Sum("value", alias_name="total_value"))
    df = agg.to_pandas()
    df["total_value"] = df["total_value"].round(2)
    df = df.sort_values(["total_value", "user_id"], ascending=[False, True]).head(20)
    return df.reset_index(drop=True)


def filter_orders_high(sf_dir: str):
    """Filter + projection with predicate pushdown at the read."""
    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"],
        filter=(pads.field("o_totalprice") > 200000.0),
    )
    ds = ds.filter(expr="o_orderstatus == 'O'")
    return ds.select_columns(["o_orderkey", "o_custkey", "o_totalprice"])


def revenue_by_segment(sf_dir: str):
    """Broadcast hash join: the small customer dimension is ``ray.put`` once
    and looked up per batch inside map_batches — no shuffle (the canonical
    small-side join; shuffle joins are reserved for two large sides)."""
    import pyarrow.parquet as pq

    import ray

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    lookup = dict(zip(cust["c_custkey"].to_pylist(),
                      cust["c_mktsegment"].to_pylist()))
    ref = ray.put(lookup)

    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def enrich(df: pd.DataFrame) -> pd.DataFrame:
        seg = df["o_custkey"].map(ray.get(ref))
        g = (
            pd.DataFrame({"c_mktsegment": seg, "p": df["o_totalprice"]})
            .groupby("c_mktsegment", as_index=False)
            .agg(p_sum=("p", "sum"), p_n=("p", "count"))
        )
        return g

    partials = ds.map_batches(enrich, batch_format="pandas")
    agg = partials.groupby("c_mktsegment").aggregate(
        Sum("p_sum", alias_name="total_revenue"),
        Sum("p_n", alias_name="n_orders"),
    )
    df = agg.to_pandas()
    df["total_revenue"] = df["total_revenue"].round(2)
    return df


def events_tumbling_window(sf_dir: str):
    """Tumbling 1-hour window aggregate per event_type (streaming-shaped
    workload, SURVEY.md §2.7: event-time windows as bucketed groupby).
    Partial aggregation inside map_batches, tiny groupby over partials."""
    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit="hour")
        g = (
            pa.table({"window_start": w, "event_type": t["event_type"],
                      "value": t["value"]})
            .group_by(["window_start", "event_type"])
            .aggregate([("value", "sum"), ("value", "count")])
        )
        return pa.table({
            "window_start": g["window_start"],
            "event_type": g["event_type"],
            "p_sum": g["value_sum"],
            "p_n": g["value_count"],
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("p_sum", alias_name="total_value"), Sum("p_n", alias_name="n_events")
    )
    df = agg.to_pandas()
    df["total_value"] = df["total_value"].round(2)
    return df


def events_session_windows(sf_dir: str):
    """Session windows per user (gap > 2h starts a new session) — sorted
    per-group pandas inside map_groups; ordering assumption: all events of
    one user fit one group (keyed shuffle co-locates them)."""
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    gap = pd.Timedelta(hours=2)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        new = (g["ts"].diff() > gap).cumsum()
        out = g.groupby(new).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "count"),
            total_value=("value", "sum"),
        )
        out["total_value"] = out["total_value"].round(2)
        return out.reset_index(drop=True)

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


# ---------------------------------------------------------------------------
# text / dedup queries
# ---------------------------------------------------------------------------


def dedup_exact_documents(sf_dir: str):
    from ..stages.dedup import exact_dedup

    return exact_dedup(_t(sf_dir, "documents", ["doc_id", "text"]))


def dedup_exact_keep_best(sf_dir: str):
    """Exact dedup keeping the BEST group member (highest quality score,
    tiebreak min doc_id) instead of the min id — the argmax-reduce shape
    real corpus dedup wants (drop the low-quality copy). Per-batch
    combiner keeps one (md5, best_doc, best_q, cnt) partial per group
    per batch, so the shuffle moves one row per (batch, group); the
    coarse-part final fold resolves argmax + sums counts vectorized.
    Scores compare as integer ten-thousandths on BOTH sides so float
    ties can't flip the winner."""
    import hashlib as _hl

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    nparts = 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import quality_scores

        q = quality_scores(df["text"])
        vals = df["text"].to_numpy()
        md5s = np.fromiter(
            (_hl.md5(s.encode()).hexdigest() for s in vals),
            dtype="<U32", count=len(vals))
        out = pd.DataFrame({
            "text_md5": md5s,
            "doc_id": df["doc_id"].to_numpy(),
            "score_q": np.floor(
                q["quality_score"].to_numpy() * 10000.0 + 0.5
            ).astype(np.int64),
        })
        out = out.sort_values(["score_q", "doc_id"],
                              ascending=[False, True])
        g = out.groupby("text_md5", sort=False)
        best = g.head(1).copy()
        best["n_dups"] = best["text_md5"].map(g.size()).astype(np.int64)
        h = pd.util.hash_array(best["text_md5"].to_numpy())
        best["part"] = (h % np.uint64(nparts)).astype(np.int32)
        return best

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_q", "doc_id"], ascending=[False, True])
        gb = g.groupby("text_md5", sort=False)
        best = gb.head(1).copy()
        best["n_dups"] = best["text_md5"].map(
            gb["n_dups"].sum()).astype(np.int64)
        return best[["text_md5", "doc_id", "score_q", "n_dups"]]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("part")
            .map_groups(fold, batch_format="pandas"))


def doc_token_stats(sf_dir: str):
    """Per-document char/token counts (vectorized regex)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import token_counts

        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": df["text"].str.len().astype("int64"),
                "n_tokens": token_counts(df["text"]),
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


def doc_fingerprints(sf_dir: str):
    """Rolling-hash-style document fingerprint (md5 of normalized text)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import fingerprint

        return pd.DataFrame({"doc_id": df["doc_id"], "fp": fingerprint(df["text"])})

    return ds.map_batches(fp, batch_format="pandas")


def docs_per_lang_source(sf_dir: str):
    ds = _t(sf_dir, "documents", ["lang", "source"])
    return ds.groupby(["lang", "source"]).aggregate(Count(alias_name="n"))


def lang_id_documents(sf_dir: str):
    """Heuristic language ID (stopword/han-script n-gram heuristic) +
    agreement with the labeled lang column. Rows-only (heuristic)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import lang_id

        pred = lang_id(df["text"])
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "lang": df["lang"], "lang_pred": pred,
             "match": (pred == df["lang"]).astype("int64")}
        )

    return ds.map_batches(ident, batch_format="pandas")


def quality_scores_documents(sf_dir: str):
    """Per-document quality features + composite score. Rows-only."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        # stateless task: regexes compile at module import, once per
        # worker PROCESS (sys.modules caches it) — an actor pool would
        # only cap parallelism
        from ..functions import text as textmod

        out = textmod.quality_scores(df["text"])
        out.insert(0, "doc_id", df["doc_id"].to_numpy())
        return out

    return ds.map_batches(score, batch_format="pandas")


def compression_ratio_documents(sf_dir: str):
    """Per-document zlib compression-ratio quality signal
    (``functions/text.py:compression_stats``). Rows-only: DuckDB has no
    zlib, so the gate checks rows/schema; determinism + flag-rule parity
    are pinned by ``tests/test_corpus_quality.py`` against direct zlib."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions import text as textmod

        out = textmod.compression_stats(df["text"])
        out.insert(0, "doc_id", df["doc_id"].to_numpy())
        return out

    return ds.map_batches(score, batch_format="pandas")


def dedup_minhash_documents(sf_dir: str):
    from ..stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5
    )


def dedup_simhash_documents(sf_dir: str):
    from ..stages.dedup import simhash_pairs

    return simhash_pairs(
        _t(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3
    )


def dedup_ngram_documents(sf_dir: str):
    from ..stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(sf_dir, "documents", ["doc_id", "text", "lang"]), threshold=0.5
    )


def dedup_cluster_documents(sf_dir: str):
    """Near-dup CLUSTERS: exact n-gram pairs -> distributed connected
    components -> (doc_id, cluster_id, keep) with one survivor (the min
    doc_id) per component. A~B and B~C collapse into one cluster even
    when A~C was never a pair."""
    from ..stages.dedup import connected_components, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _t(sf_dir, "documents", ["doc_id", "text", "lang"]), threshold=0.5
    )
    cc = connected_components(pairs)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["keep"] = df["doc_id"] == df["cluster_id"]
        return df

    return cc.map_batches(flag, batch_format="pandas").sort("doc_id")


def quality_classifier_documents(sf_dir: str):
    """TRAINED quality filter (CCNet/GPT-3 style, distillation flavor):
    ridge regression over hashed token-count features learns to
    reproduce the heuristic quality score, then one streaming pass
    scores the corpus with the broadcast weights. Training folds EXACT
    int64 X^T X / X^T y partials (labels are the heuristic score in
    ten-thousandths), so the weights — and therefore every prediction —
    are bit-identical at any parallelism. Rows-only gate (a matrix
    solve has no SQL shape); pytest pins exact-recovery on planted
    linear labels, parallelism invariance, and distillation quality
    (R² vs the heuristic) on the fixture corpus."""
    from ..functions.text import quality_scores
    from ..stages.classifier import score_hashed, train_ridge_hashed

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def labels(df: pd.DataFrame) -> np.ndarray:
        q = quality_scores(df["text"].reset_index(drop=True))
        return np.floor(q["quality_score"].to_numpy() * 10000.0
                        + 0.5).astype(np.int64)

    w = train_ridge_hashed(ds, labels, d=256, l2=1.0)
    out = score_hashed(ds, w).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def dedup_semantic_embeddings(sf_dir: str):
    """SemDeDup-style cluster-pruned embedding dedup (Abbas et al. 2023):
    k-means partitions the embedding space, near-duplicates are pruned
    WITHIN each cluster only — one clustering pass + one
    groupby(cluster) shuffle replaces all-pairs / LSH bucket candidate
    generation, which is what survives at 10^10 vectors (per-cluster
    quadratic work stays flat when k grows with the corpus). Returns the
    dropped rows (vec_id, cluster, kept_id); deterministic at any
    parallelism (hash-order farthest-point k-means init, greedy
    rank-order keep rule — no RNG). Rows-only gate: k-means assignment
    has no SQL shape; pytest plants exact duplicate groups and checks
    the keep rule, parallelism invariance and the survivor property."""
    from ..stages.dedup import semantic_dedup

    # synthetic embeddings are isotropic (max pairwise cosine ~0.48), so
    # the threshold sits where near-dup pairs exist, as for the LSH route
    out = semantic_dedup(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=8, threshold=0.40, iters=4).to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    out["cluster"] = out["cluster"].astype("int64")
    out["kept_id"] = out["kept_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def dedup_embedding_vectors(sf_dir: str):
    from ..stages.dedup import embedding_cosine_pairs

    # the synthetic embeddings are isotropic (max pairwise cosine ~0.48), so
    # the near-dup threshold is set where pairs exist; few/wide hyperplane
    # tables keep LSH recall reasonable at this low similarity
    return embedding_cosine_pairs(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]), dim=64,
        threshold=0.40, n_planes=4, n_tables=8,
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def _query_vec(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    idx = pc.index(t["vec_id"], 0).as_py()
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)


def ann_topk_cosine(sf_dir: str):
    """Exact brute-force top-10 cosine neighbours of vec_id=0."""
    from ..stages.similarity import ann_topk_bruteforce

    df = ann_topk_bruteforce(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]), _query_vec(sf_dir), k=10
    )
    df["score"] = df["score"].round(5)
    return df


def ann_topk_ivf_q(sf_dir: str):
    """IVF top-10 over the persisted bucketed index (built once per sf,
    reused across queries; reads only nprobe bucket dirs)."""
    from ..stages.similarity import ann_topk_ivf

    idx_dir = _cache_dir(sf_dir, "ivf_index")
    df = ann_topk_ivf(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]), _query_vec(sf_dir),
        # the synthetic embeddings are isotropic (no real cluster structure),
        # so a high nprobe/n_clusters ratio is needed for recall>=0.9; the
        # pruned-read design is unchanged — real embedding corpora cluster
        k=10, index_dir=idx_dir, n_clusters=16, nprobe=12,
        source_tag=_source_fingerprint(
            os.path.join(sf_dir, "embeddings.parquet")),
    )
    df["score"] = df["score"].round(5)
    return df


def ann_topk_pq_q(sf_dir: str):
    """Product-quantization + exact-rerank top-10 over the persisted
    8-byte-codes index — the bandwidth scale path (32x lighter
    exhaustive scan than float32; see stages/similarity.py:PQDiskIndex).
    Rows-only; recall vs brute gated in pytest."""
    from ..stages.similarity import ann_topk_pq

    idx_dir = _cache_dir(sf_dir, "pq_index")
    df = ann_topk_pq(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]),
        _query_vec(sf_dir), k=10, index_dir=idx_dir,
        source_tag=_source_fingerprint(
            os.path.join(sf_dir, "embeddings.parquet")),
    )
    df["score"] = df["score"].round(5)
    return df


def ann_topk_ivf_incremental_q(sf_dir: str):
    """CDC-maintained IVF: build the bucketed index on the ~80% of
    vectors with ``vec_id % 5 != 0``, REFRESH it with the remaining 20%
    (one delta assignment pass + tombstone upserts, no rebuild —
    ``IVFDiskIndex.refresh``), then answer the standard top-10 probe.
    Rows-only; refresh==rebuild parity is pinned in pytest."""
    from ..stages.similarity import IVFDiskIndex

    idx_dir = _cache_dir(sf_dir, "ivf_incr_index")
    tag = _source_fingerprint(
        os.path.join(sf_dir, "embeddings.parquet")) + ":incr"

    def part_filter(keep_incr: bool):
        def f(t: pa.Table) -> pa.Table:
            mod = t["vec_id"].to_numpy(zero_copy_only=False) % 5
            keep = (mod == 0) if keep_incr else (mod != 0)
            return t.filter(pa.array(keep))

        return f

    stamp = os.path.join(idx_dir, "source.txt")
    valid = os.path.exists(os.path.join(idx_dir, "meta.json"))
    if valid:
        stored = open(stamp).read() if os.path.exists(stamp) else None
        valid = stored == tag
    if not valid:
        base = (_t(sf_dir, "embeddings", ["vec_id", "embedding"])
                .map_batches(part_filter(False), batch_format="pyarrow"))
        idx = IVFDiskIndex.build(base, idx_dir, n_clusters=16,
                                 source_tag=tag)
        incr = (_t(sf_dir, "embeddings", ["vec_id", "embedding"])
                .map_batches(part_filter(True), batch_format="pyarrow"))
        idx.refresh(incr)
    df = IVFDiskIndex(idx_dir).search(_query_vec(sf_dir), k=10, nprobe=12)
    df["score"] = df["score"].round(5)
    return df


def ann_topk_int8_q(sf_dir: str):
    """Quantized (int8) brute-force top-10 — the 4x-bandwidth exhaustive
    scan; rows-only, overlap vs exact gated in pytest."""
    from ..stages.similarity import ann_topk_int8

    df = ann_topk_int8(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]),
        _query_vec(sf_dir), k=10)
    df["score"] = df["score"].round(5)
    return df


def ann_topk_lsh_q(sf_dir: str):
    """Random-hyperplane LSH top-10 over the persisted bucketed index
    (data-independent alternative to IVF; reads only the multiprobe
    bucket set per table)."""
    from ..stages.similarity import ann_topk_lsh

    idx_dir = _cache_dir(sf_dir, "lsh_index")
    df = ann_topk_lsh(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]), _query_vec(sf_dir),
        # isotropic synthetic embeddings need wide probing for recall,
        # same caveat as the IVF query's nprobe — real corpora cluster
        k=10, index_dir=idx_dir, n_planes=6, n_tables=12, multiprobe=3,
        source_tag=_source_fingerprint(
            os.path.join(sf_dir, "embeddings.parquet")),
    )
    df["score"] = df["score"].round(5)
    return df


def token_pmi_pairs(sf_dir: str, vocab_cap: int = 50):
    """Pointwise mutual information for token PAIRS within the top-df
    vocabulary (the collocation-mining shape): which vocabulary words
    co-occur in documents more than independence predicts.

    One corpus scan after the vocabulary build: each batch converts its
    documents to a docs x V boolean incidence matrix and computes ALL
    pairwise co-occurrence counts with ONE integer matmul (M^T @ M) —
    O(docs x V^2) bit-ops per batch instead of a per-doc pair explosion
    through a shuffle. Partials are V x V count matrices (flattened to
    <= V^2 rows/batch); the final groupby is vocabulary-sized. PMI =
    ln(n_docs * c_ab / (c_a * c_b)) in integer micros, the float
    expression mirrored in SQL (counts are exact ints on both sides)."""
    import ray

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    vocab = _vocab_tf_df(ds, vocab_cap)["tok"].tolist()
    n_docs = ds.count()
    v_ref = ray.put({t: i for i, t in enumerate(vocab)})
    v = len(vocab)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import _flat_lower_tokens

        vid = ray.get(v_ref)
        flat, di, _ = _flat_lower_tokens(df["text"].reset_index(drop=True))
        m = np.zeros((len(df), v), dtype=np.int64)
        if len(flat):
            sel = pd.Series(flat).map(vid)
            ok = sel.notna().to_numpy()
            m[di[ok], sel.to_numpy(dtype=float)[ok].astype(np.int64)] = 1
        co = m.T @ m  # V x V: pair counts on/above diag, singles on diag
        ia, ib = np.triu_indices(v)
        c = co[ia, ib]
        nz = c > 0
        return pd.DataFrame({"ia": ia[nz].astype(np.int64),
                             "ib": ib[nz].astype(np.int64),
                             "n": c[nz]})

    agg = (ds.map_batches(partial, batch_format="pandas")
             .groupby(["ia", "ib"])
             .aggregate(Sum("n", alias_name="n"))).take_all()
    singles = {r["ia"]: r["n"] for r in agg if r["ia"] == r["ib"]}
    rows = []
    for r in agg:
        a, b_, n = int(r["ia"]), int(r["ib"]), int(r["n"])
        if a == b_:
            continue
        pmi = np.log(float(n_docs) * n / (singles[a] * singles[b_]))
        rows.append((vocab[a], vocab[b_], n,
                     int(np.floor(pmi * 1e6 + 0.5))))
    out = pd.DataFrame(rows, columns=["tok_a", "tok_b", "n_co",
                                      "pmi_micros"])
    # canonical order: tok_a < tok_b lexicographically (matches SQL)
    swap = out["tok_a"] > out["tok_b"]
    out.loc[swap, ["tok_a", "tok_b"]] = \
        out.loc[swap, ["tok_b", "tok_a"]].to_numpy()
    return out.sort_values(["tok_a", "tok_b"]).reset_index(drop=True)


def lm_surprise_documents(sf_dir: str, vocab_cap: int = 1000):
    """Unigram language-model surprise per document — the shape of
    KenLM-style perplexity quality filtering, with an exactly
    computable model: p(tok) = corpus count / corpus total over a
    capped vocabulary, all out-of-vocabulary tokens pooled into one
    <unk> bucket.

    Exactness under distribution: per-TOKEN log-probs quantize to
    integer micros FIRST (both engines evaluate ln on the identical
    double c/total), so the per-document sum Σ tf·s_micros is integer
    arithmetic — immune to summation order, hence hash-exact vs SQL.
    Two streaming passes: vocabulary + totals (tiny groupby), then one
    corpus scan scoring each doc vectorized against the broadcast
    score table."""
    import ray

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    vocab = _vocab_tf_df(ds, vocab_cap)

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import _flat_lower_tokens

        flat, _, _ = _flat_lower_tokens(df["text"].reset_index(drop=True))
        return pd.DataFrame({"n": [np.int64(len(flat))]})

    total = int(ds.map_batches(count_partial,
                               batch_format="pandas").sum("n") or 0)
    c_unk = total - int(vocab["tf"].sum())
    scores = {
        t: int(np.floor(np.log(c / total) * 1e6 + 0.5))
        for t, c in zip(vocab["tok"], vocab["tf"].astype(int))
    }
    # every OOV token shares the pooled <unk> mass (if no OOV exists,
    # the score is never used; guard the ln domain anyway)
    s_unk = (int(np.floor(np.log(c_unk / total) * 1e6 + 0.5))
             if c_unk > 0 else 0)
    s_ref = ray.put(scores)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import _flat_lower_tokens

        sc = ray.get(s_ref)
        flat, di, lens = _flat_lower_tokens(df["text"].reset_index(drop=True))
        out = np.zeros(len(df), dtype=np.int64)
        if len(flat):
            s = pd.Series(flat).map(sc).fillna(s_unk).to_numpy(np.int64)
            np.add.at(out, di, s)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": np.asarray(lens, dtype=np.int64),
            "surprise_sum_micros": -out,
        })

    return ds.map_batches(score, batch_format="pandas")


def events_value_outliers(sf_dir: str):
    """Per-type 3-sigma outlier counts with the comparison decided in
    EXACT integer space: flag v iff (n*v - S)^2 > 9*(n*Svv - S^2) — the
    |z| > 3 rule cleared of divisions and square roots, so no float ever
    decides membership and the DuckDB HUGEINT oracle is hash-exact.

    Two streaming passes, zero corpus shuffles: pass 1 sums the integer
    sufficient statistics (n, S, Svv) per type inside map_batches (tiny
    groupby of partials); the per-type right-hand sides broadcast as
    PYTHON ints (arbitrary precision); pass 2 evaluates d = n*v - S
    vectorized in int64 and escalates only |d| > 3e9 rows (whose square
    would overflow int64) to exact Python-int comparison — at any scale
    the math stays exact, at every tested scale it stays vectorized."""
    import ray

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # Svv exceeds int64 long before any realistic corpus ends, so the
        # squared sums travel as base-2^32 LIMBS: vv splits element-wise
        # into (hi, lo) int64 columns that sum safely through the shuffle
        # (lo < 2^32 per element; hi < 2^31 for |v| <= 3e9), and the
        # driver reassembles (sum_hi << 32) + sum_lo as a Python bigint.
        # Rows with |v| > 3e9 (whose square overflows int64 even once)
        # escalate element-wise to exact Python ints.
        v = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        big = np.abs(v) > 3_000_000_000
        vsafe = np.where(big, 0, v)
        vv = vsafe * vsafe
        g = pd.DataFrame({
            "event_type": df["event_type"],
            "v": v,
            "hi": vv >> np.int64(32),
            "lo": vv & np.int64(0xFFFFFFFF),
        })
        out = g.groupby("event_type", sort=False).agg(
            n=("v", "size"), s=("v", "sum"),
            svv_hi=("hi", "sum"), svv_lo=("lo", "sum")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        if big.any():
            et = df["event_type"].to_numpy()
            out = out.set_index("event_type")
            for i in np.flatnonzero(big):
                sq = int(v[i]) * int(v[i])
                out.loc[et[i], "svv_hi"] += sq >> 32
                out.loc[et[i], "svv_lo"] += sq & 0xFFFFFFFF
            out = out.reset_index()
        return out

    stats = (ds.map_batches(partial, batch_format="pandas")
               .groupby("event_type")
               .aggregate(Sum("n", alias_name="n"),
                          Sum("s", alias_name="s"),
                          Sum("svv_hi", alias_name="svv_hi"),
                          Sum("svv_lo", alias_name="svv_lo"))).take_all()
    # exact bigint RHS per type (n*Svv - S^2 can exceed int64 at scale)
    side = {}
    for r in stats:
        n, s = int(r["n"]), int(r["s"])
        svv = (int(r["svv_hi"]) << 32) + int(r["svv_lo"])
        side[r["event_type"]] = (n, s, 9 * (n * svv - s * s))
    side_ref = ray.put(side)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        sd = ray.get(side_ref)
        v = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        et = df["event_type"].to_numpy()
        out = []
        for t in pd.unique(et):
            n, s, rhs = sd[t]
            m = et == t
            vm = v[m]
            # the PRODUCT n*v wraps int64 before d even exists once
            # n*|v|+|s| >= 2^63 — escalate those rows alongside the
            # big-square rows (same exact Python-int path)
            v_cap = (2**63 - 1 - abs(s)) // max(n, 1)
            prod_big = np.abs(vm) > v_cap
            d = n * np.where(prod_big, 0, vm) - s
            big = (np.abs(d) > 3_000_000_000) | prod_big
            hits = np.zeros(len(d), dtype=bool)
            small = ~big
            # |d| <= 3e9 squares within int64; a rhs past int64 max can
            # never be exceeded by such a square, so clamping is exact
            hits[small] = d[small] * d[small] > min(rhs, 2**63 - 1)
            for i in np.flatnonzero(big):
                di = n * int(vm[i]) - s
                hits[i] = di * di > rhs
            out.append(pd.DataFrame({
                "event_type": [t],
                "n_outliers": [np.int64(hits.sum())],
                "n_events": [np.int64(m.sum())]}))
        return pd.concat(out, ignore_index=True)

    return (ds.map_batches(flag, batch_format="pandas")
              .groupby("event_type")
              .aggregate(Sum("n_outliers", alias_name="n_outliers"),
                         Sum("n_events", alias_name="n_events")))


def search_documents_terms(sf_dir: str, terms=("query", "window"),
                           mode: str = "and"):
    """Keyword search over the PERSISTED inverted index
    (stages/invindex.py): build once per corpus fingerprint (one
    streaming scan, bucket-partitioned postings), then answer term
    queries by reading ONLY the terms' bucket files with a ``tok IN``
    pushdown — O(query), never O(corpus). AND semantics: a doc must
    match every term; score = sum of the terms' tfs (integer, so the
    DuckDB oracle — same lower + [a-z0-9_]+ RE2 tokenizer — is
    hash-exact)."""
    from ..stages.invindex import InvertedIndex

    idx = InvertedIndex.ensure(
        lambda: _t(sf_dir, "documents", ["doc_id", "text"]),
        _cache_dir(sf_dir, "inverted_index"),
        _source_fingerprint(os.path.join(sf_dir, "documents.parquet")))
    out = idx.lookup(list(terms), mode=mode)
    return out.select_columns(["doc_id", "score"])


def search_documents_bm25(sf_dir: str, terms=("query", "window")):
    """BM25-ranked keyword search over the same persisted inverted index
    as ``search_documents_terms`` (postings carry the denormalized doc
    length, so ranking never joins back to the corpus). Integer-micros
    scores with the float expression mirrored operation-for-operation in
    the DuckDB oracle."""
    from ..stages.invindex import InvertedIndex

    idx = InvertedIndex.ensure(
        lambda: _t(sf_dir, "documents", ["doc_id", "text"]),
        _cache_dir(sf_dir, "inverted_index"),
        _source_fingerprint(os.path.join(sf_dir, "documents.parquet")))
    out = idx.lookup_bm25(list(terms), mode="and")
    return out.select_columns(["doc_id", "score_micros"])


def search_documents_hybrid(sf_dir: str, terms=("query", "window"),
                            k: int = 20, k_each: int = 50,
                            rrf_k: int = 60):
    """HYBRID retrieval: BM25 keyword ranking fused with embedding-cosine
    ranking by Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
    SIGIR 2009): ``rrf(d) = Σ_legs 1/(rrf_k + rank_leg(d))`` over the
    union of each leg's top-``k_each`` candidates; a doc absent from a
    leg contributes nothing for that leg. The standard first-stage
    fusion where a corpus indexes both keywords and embeddings (RAG
    retrieval, near-dup candidate generation).

    Scale plan — each leg is already sublinear/streaming:

    - text leg: ``InvertedIndex.lookup_bm25`` (pruned bucket reads,
      O(query-term postings)), sort-limited to ``k_each`` INSIDE the
      Dataset, so the driver receives k_each rows;
    - vector leg: one streaming pass over the embeddings, per-batch
      float64 cosine vs the broadcast query + per-batch top-``k_each``
      partial ordered by the total (-score, id) order — the driver
      merges O(k_each × batches) candidate rows, never the corpus.

    The fusion itself touches ≤ 2·k_each rows. Everything past the raw
    cosine is integer arithmetic in BOTH systems — cosine rounds to
    int64 micros first (float64 on both sides agrees to ~2e-16 while
    the fixture's closest value sits ≥3e-10 from every rounding
    boundary, verified at every sf), ranks are row_number over
    (score desc, id), and the fused score is
    ``Σ floor(1e9 / (rrf_k + rank))`` — so the DuckDB oracle is
    hash-exact."""
    import heapq

    from ..stages.invindex import InvertedIndex

    idx = InvertedIndex.ensure(
        lambda: _t(sf_dir, "documents", ["doc_id", "text"]),
        _cache_dir(sf_dir, "inverted_index"),
        _source_fingerprint(os.path.join(sf_dir, "documents.parquet")))
    bm = idx.lookup_bm25(list(terms), mode="and", k=k_each).take_all()
    bm_rank = {int(r["doc_id"]): i + 1 for i, r in enumerate(bm)}

    q = _query_vec(sf_dir)  # raw (un-normalized) float64, as in the SQL
    q_ref = ray.put(q)

    def vec_partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        X = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)
                      ).astype(np.float64)
        qv = ray.get(q_ref)
        # mirror list_cosine_similarity's form exactly: dot / (|x| |q|)
        cos = (X @ qv) / (np.linalg.norm(X, axis=1) * np.linalg.norm(qv))
        mic = np.floor(cos * 1e6 + 0.5).astype(np.int64)
        # keep the batch's top-k_each BY THE TOTAL ORDER (-mic, id): a
        # plain argpartition could drop a boundary-tied row that the
        # id tiebreak ranks ahead, corrupting the global merge
        order = np.lexsort((ids, -mic))[:k_each]
        return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                         "mic": pa.array(mic[order], pa.int64())})

    parts = (_t(sf_dir, "embeddings", ["vec_id", "embedding"])
             .map_batches(vec_partial, batch_format="pyarrow")
             .take_all())
    vec_top = heapq.nsmallest(
        k_each, ((-int(r["mic"]), int(r["vec_id"])) for r in parts))
    vec_rank = {vid: i + 1 for i, (_, vid) in enumerate(vec_top)}

    fused: dict[int, int] = {}
    for leg in (bm_rank, vec_rank):
        for d, r in leg.items():
            fused[d] = fused.get(d, 0) + 10**9 // (rrf_k + r)
    rows = heapq.nsmallest(k, fused.items(), key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame(rows, columns=["doc_id", "rrf_fp"]).astype(
        {"doc_id": "int64", "rrf_fp": "int64"})


def events_running_revenue(sf_dir: str):
    """Global window function SUM(cents) OVER (ORDER BY ts, event_id)
    via the distributed range-bucket prefix scan (stages/scan.py) — no
    global sort barrier. Value is integer cents (floor(value*100+0.5))
    so the running sums are exact and the SQL window oracle matches
    hash-for-hash (float accumulation order would drift)."""
    from ..stages.scan import ordered_cumsum

    ds = _t(sf_dir, "events", ["event_id", "ts", "value"])
    res = ordered_cumsum(
        ds.map_batches(lambda df: _to_cents(df, ["event_id", "ts"]),
                       batch_format="pandas"),
        order_col="ts", tiebreak_col="event_id", value_col="cents")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "running_total"]]

    return res.map_batches(project, batch_format="pandas")


def events_moving_revenue(sf_dir: str, window: int = 10):
    """Sliding-window SUM(cents) OVER (ORDER BY ts, event_id ROWS
    BETWEEN 9 PRECEDING AND CURRENT ROW) via the one-shuffle carry-pass
    scan (stages/scan.py:ordered_moving_sum)."""
    from ..stages.scan import ordered_moving_sum

    ds = _t(sf_dir, "events", ["event_id", "ts", "value"])
    res = ordered_moving_sum(
        ds.map_batches(lambda df: _to_cents(df, ["event_id", "ts"]),
                       batch_format="pandas"),
        order_col="ts", tiebreak_col="event_id", value_col="cents",
        window=window)
    return res.map_batches(
        lambda df: df[["event_id", "moving_sum"]], batch_format="pandas")


def events_trailing_hour_revenue(sf_dir: str):
    """Time-RANGE trailing window — SUM(cents) OVER (ORDER BY ts RANGE
    BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) — via the
    boundary-replication scan (stages/scan.py:ordered_range_sum): one
    bucket shuffle, no driver carry, at most one replica per row.
    RANGE peers (equal ts) are in-frame together on both sides, so no
    tiebreak enters the math."""
    from ..stages.scan import ordered_range_sum

    ds = _t(sf_dir, "events", ["event_id", "ts", "value"])
    res = ordered_range_sum(
        ds.map_batches(lambda df: _to_cents(df, ["event_id", "ts"]),
                       batch_format="pandas"),
        order_col="ts", value_col="cents",
        span_units=3_600_000_000)  # 1 hour in microseconds
    return res.map_batches(
        lambda df: df[["event_id", "range_sum"]], batch_format="pandas")


def events_debounce_per_user(sf_dir: str, min_gap_minutes: int = 30,
                             nparts: int = 32):
    """Per-key event THROTTLING (the stream-dedup/debounce shape): keep
    an event iff it is the user's first, or at least ``min_gap`` after
    the user's PREVIOUS event — the LAG rule, which is vectorizable and
    SQL-expressible (chained keep-dependent suppression is neither).
    One coarse user-hash shuffle, per-partition sort + grouped shift —
    users never span partitions, no carry."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap = np.timedelta64(min_gap_minutes * 60, "s")

    def scatter(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["part"] = (out["user_id"] % nparts).astype(np.int64)
        return out

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev = df.groupby("user_id", sort=False)["ts"].shift(1)
        keep = prev.isna() | ((df["ts"] - prev) >= gap)
        out = df.loc[keep.to_numpy(bool), ["event_id", "user_id", "ts"]]
        return out.reset_index(drop=True)

    return (ds.map_batches(scatter, batch_format="pandas")
              .groupby("part").map_groups(per_part,
                                          batch_format="pandas"))


def events_running_value_per_user(sf_dir: str, nparts: int = 32):
    """Partitioned window function SUM(cents) OVER (PARTITION BY
    user_id ORDER BY ts, event_id): one hash shuffle over COARSE user
    partitions (never per-user dispatch), then a vectorized pandas
    groupby-cumsum inside each partition task — keys never span
    partitions, so the scan is exact with no carry."""
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.dedup_index import _spart

        out = _to_cents(df, ["event_id", "ts", "user_id"])
        out["__p"] = _spart(out["user_id"].to_numpy(), nparts)
        return out

    def scan_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        run = g.groupby("user_id", sort=False)["cents"].cumsum()
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "running_user_total": run.to_numpy().astype(np.int64)})

    return (ds.map_batches(prep, batch_format="pandas")
            .groupby("__p").map_groups(scan_part, batch_format="pandas"))


def export_documents_shards(sf_dir: str, nshards: int = 16):
    """Resumable hash-sharded corpus export (stages/export.py): write
    once, verify via the manifest's per-shard row counts — which the
    DuckDB oracle recomputes from md5_number_lower % nshards."""
    from ..stages.export import export_corpus_shards

    m = export_corpus_shards(
        _t(sf_dir, "documents", ["doc_id", "text", "lang"]),
        _cache_dir(sf_dir, "corpus_shards"), nshards=nshards,
        source_tag=_source_fingerprint(
            os.path.join(sf_dir, "documents.parquet")))
    return (pd.DataFrame(
        {"shard": [int(s) for s in m["shards"]],
         "n_rows": [np.int64(v) for v in m["shards"].values()]})
        .sort_values("shard").reset_index(drop=True))


def export_documents_jsonl(sf_dir: str, nshards: int = 16):
    """JSONL export (stages/export.py:export_corpus_jsonl) — same
    deterministic md5 shard routing and manifest contract as the parquet
    export, gated by the same per-shard-count oracle."""
    from ..stages.export import export_corpus_jsonl

    m = export_corpus_jsonl(
        _t(sf_dir, "documents", ["doc_id", "text", "lang"]),
        _cache_dir(sf_dir, "corpus_jsonl"), nshards=nshards,
        source_tag=_source_fingerprint(
            os.path.join(sf_dir, "documents.parquet")))
    return (pd.DataFrame(
        {"shard": [int(s) for s in m["shards"]],
         "n_rows": [np.int64(v) for v in m["shards"].values()]})
        .sort_values("shard").reset_index(drop=True))


def export_documents_sorted(sf_dir: str, nbuckets: int = 64):
    """Globally-SORTED export (stages/export.py:export_sorted): range
    buckets from one min/max pass, ONE bucket shuffle, per-bucket local
    sort — no global sort barrier. Gated on the manifest's per-file
    (rows, min, max): the oracle recomputes the deterministic bucket
    boundaries (width = span // nbuckets + 1, capped at nbuckets-1)
    from the same doc_id extrema, so a mis-bucketed or mis-ordered key
    shows up as a count/extrema mismatch."""
    from ..stages.export import export_sorted

    m = export_sorted(
        _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        _cache_dir(sf_dir, "corpus_sorted"), order_col="doc_id",
        nbuckets=nbuckets)
    return (pd.DataFrame(
        {"bucket": [int(f["file"][5:10]) for f in m["files"]],
         "n_rows": [np.int64(f["rows"]) for f in m["files"]],
         "min_id": [np.int64(f["min"]) for f in m["files"]],
         "max_id": [np.int64(f["max"]) for f in m["files"]]})
        .sort_values("bucket").reset_index(drop=True))


def events_late_data_windows(sf_dir: str,
                             lateness_min: int = 30):
    """Streaming late-data semantics: the watermark at each event is
    the running MAX of event-time over ARRIVAL order (the
    ordered_cummax primitive); an event is LATE when the watermark
    minus the allowed lateness has passed its 1-hour tumbling window's
    end. The synthetic events arrive perfectly time-ordered, so a
    deterministic md5 jitter (+0..19 positions, identical in the SQL
    oracle) simulates network reorder — ~12% of events land late at a
    30-minute allowance. Returns per-window on-time/late counts — what
    a streaming engine would emit vs drop."""
    from ..stages.sample import md5_u64
    from ..stages.scan import ordered_cummax

    HOUR = 3_600_000_000  # us
    late_us = lateness_min * 60_000_000

    ds = _t(sf_dir, "events", ["event_id", "ts"])

    def jitter(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["event_id"].to_numpy()
        out = df[["event_id", "ts"]].copy()
        out["arrival"] = ids + (md5_u64(ids)
                                % np.uint64(20)).astype(np.int64)
        return out

    wm = ordered_cummax(ds.map_batches(jitter, batch_format="pandas"),
                        order_col="arrival",
                        tiebreak_col="event_id", value_col="ts")

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        ts = (df["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        win = (ts // HOUR) * HOUR
        late = (df["running_max"].to_numpy() - late_us
                > win + HOUR).astype(np.int64)
        g = (pd.DataFrame({"window_start": win, "late": late})
             .groupby(["window_start", "late"], as_index=False)
             .agg(n=("late", "size")))
        return g

    return (wm.map_batches(flag, batch_format="pandas")
            .groupby(["window_start", "late"])
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(lambda df: pd.DataFrame({
                "window_start": pd.to_datetime(df["window_start"],
                                               unit="us"),
                "late": df["late"].astype(np.int64),
                "n": df["n"].astype(np.int64)}),
                batch_format="pandas"))


def events_row_number(sf_dir: str):
    """row_number() OVER (ORDER BY ts, event_id) - 1: the ordered-rank
    instance of the prefix scan (ordered_cumsum over a ones column) —
    zero new machinery."""
    from ..stages.scan import ordered_cumsum

    ds = _t(sf_dir, "events", ["event_id", "ts"])

    def ones(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["event_id", "ts"]].copy()
        out["one"] = np.int64(1)
        return out

    res = ordered_cumsum(
        ds.map_batches(ones, batch_format="pandas"),
        order_col="ts", tiebreak_col="event_id", value_col="one")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "rn": df["running_total"].to_numpy() - 1})

    return res.map_batches(finish, batch_format="pandas")


def events_lag_revenue(sf_dir: str):
    """LAG(cents) OVER (ORDER BY ts, event_id) via the one-row-carry
    ordered scan; the global first row carries the -1 sentinel
    (COALESCE(-1) in the oracle keeps both sides int64)."""
    from ..stages.scan import ordered_lag

    ds = _t(sf_dir, "events", ["event_id", "ts", "value"])
    res = ordered_lag(
        ds.map_batches(lambda df: _to_cents(df, ["event_id", "ts"]),
                       batch_format="pandas"),
        order_col="ts", tiebreak_col="event_id", value_col="cents")
    return res.map_batches(
        lambda df: df[["event_id", "lag_value"]], batch_format="pandas")


def dedup_incremental_documents(sf_dir: str):
    """Incremental near-dup: probe the NEW slice (doc_id % 10 == 0) of
    the corpus against a persisted MinHash-LSH index of the REST — the
    "dedupe the incoming crawl against everything already ingested"
    shape. Index built once per sf and reused (atomic build, source-tag
    invalidation); the probe reads only the band/sig partitions the new
    batch touches. Rows-only (signature-estimated Jaccard); planted
    recall/precision tests in tests/test_corpus_quality.py."""
    from ..stages.dedup_index import MinHashDiskIndex

    idx_dir = _cache_dir(sf_dir, "minhash_index")
    source_tag = _source_fingerprint(
        os.path.join(sf_dir, "documents.parquet"))
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    corpus = docs.map_batches(
        lambda df: df[df["doc_id"] % 10 != 0], batch_format="pandas")
    new = docs.map_batches(
        lambda df: df[df["doc_id"] % 10 == 0], batch_format="pandas")
    try:
        idx = MinHashDiskIndex(idx_dir)
        if idx.meta.get("source_tag") != source_tag:
            raise FileNotFoundError
    except FileNotFoundError:
        idx = MinHashDiskIndex.build(corpus, idx_dir,
                                     source_tag=source_tag)
    out = idx.probe_df(new, threshold=0.5)
    out["est_jaccard"] = out["est_jaccard"].round(5)
    return out.sort_values(["doc_id", "dup_of"]).reset_index(drop=True)


def dedup_crawl_loop_documents(sf_dir: str):
    """The FULL crawl-ingestion loop: three md5-deterministic "crawl
    batches" arrive in order; each probes the persisted MinHash index
    (dedupe against everything ingested so far), then its documents
    EXTEND the index (generation-fenced appends — stages/dedup_index.py
    ``extend``) before the next batch. Returns every dup pair found
    across the loop with the batch it arrived in. Rows-only (signature
    estimation); the extend crash/fence contract is gated in
    tests/test_dedup_index_extend.py. Scale shape: probe cost is
    O(batch) partition-pruned reads; extend appends into the existing
    hash partitions, nothing rewrites."""
    import shutil

    from ..stages.dedup_index import MinHashDiskIndex
    from ..stages.sample import md5_u64

    idx_dir = _cache_dir(sf_dir, "minhash_crawl_index")
    shutil.rmtree(idx_dir, ignore_errors=True)  # the loop OWNS the index
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def batch_of(df: pd.DataFrame) -> np.ndarray:
        return (md5_u64(df["doc_id"].to_numpy().astype("U")) % 3).astype(int)

    def slice_fn(k):
        return lambda df: df[batch_of(df) == k]

    idx = MinHashDiskIndex.build(
        docs.map_batches(slice_fn(0), batch_format="pandas"), idx_dir,
        source_tag="crawl-0")
    outs = []
    for k in (1, 2):
        new = docs.map_batches(slice_fn(k), batch_format="pandas")
        out = idx.probe_df(new, threshold=0.5)
        out["batch"] = k
        outs.append(out)
        idx.extend(new)
    res = pd.concat(outs, ignore_index=True)
    res["est_jaccard"] = res["est_jaccard"].round(5)
    return res.sort_values(["batch", "doc_id", "dup_of"]).reset_index(
        drop=True)


# ---------------------------------------------------------------------------
# multimodal (stubbed decode; real plumbing)
# ---------------------------------------------------------------------------


def multimodal_features(sf_dir: str):
    """Multimodal decode+feature pipeline over fake media payloads. The stub
    decode derives every value from md5(payload||salt), so the DuckDB
    oracle recomputes the identical values in SQL — the actor-pool
    plumbing (schema, small batches, per-actor state) is correctness-gated
    end-to-end. Features flattened to f0..f7 for the value-hash compare."""
    from ..stages.multimodal import decode_pipeline, media_from_documents

    media = media_from_documents(_t(sf_dir, "documents", ["doc_id", "text"]))
    out = decode_pipeline(media, batch_size=256, concurrency=2)

    def flatten(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in ("media_id", "width", "height", "channels")}
        feats = t["features"].combine_chunks()
        flat = feats.flatten().to_numpy(zero_copy_only=False).reshape(-1, 8)
        for j in range(8):
            cols[f"f{j}"] = pa.array(np.round(flat[:, j].astype(np.float64), 4))
        return pa.table(cols)

    return out.map_batches(flatten, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus sampling / mixing / redaction (training-data prep)
# ---------------------------------------------------------------------------

#: per-mille keep rates per language for the deterministic sampler —
#: downsample the dominant language, keep the tail denser (the standard
#: training-mix rebalance). Unlisted langs fall back to 300.
SAMPLE_RATES = {"en": 400, "zh": 800, "fr": 700}
SAMPLE_DEFAULT_RATE = 300

#: per-language token budget for the mix query
MIX_TOKEN_BUDGET = 2000


def sample_documents_deterministic(sf_dir: str):
    """Stratified deterministic hash sample: keep a document iff
    md5_u64(doc_id) % 1000 < rate(lang). Pure map_batches filter — no
    shuffle, no RNG state, identical output on rerun/resume at any
    parallelism; the rate table is a tiny broadcast constant."""
    from ..stages.sample import hash_sample

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "source"])
    return hash_sample(
        ds, id_col="doc_id", stratum_col="lang",
        rates=SAMPLE_RATES, default_rate=SAMPLE_DEFAULT_RATE,
    )


def sample_documents_weighted(sf_dir: str):
    """Length-proportional deterministic sample: keep a document with
    probability min(1, n_chars/1000) via the integer cross-multiplied
    hash rule (``stages/sample.py:weighted_hash_sample``) — the "sample
    by mass" shape for mixture corpora, long documents proportionally
    likelier. No shuffle, no RNG; DuckDB oracle is hash-exact."""
    from ..stages.sample import weighted_hash_sample

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text"])

    def n_chars(t: pa.Table) -> np.ndarray:
        # code-point length, matching both pandas str.len and DuckDB
        # length() — Arrow-native so the text column never objectifies
        return (pc.utf8_length(t["text"])
                .to_numpy(zero_copy_only=False).astype(np.int64))

    picked = weighted_hash_sample(
        ds, id_col="doc_id", weight_fn=n_chars, num=1, den=1, denom=1000)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "n_chars": pa.array(n_chars(t))})

    return picked.map_batches(project, batch_format="pyarrow")


def split_documents_train_val_test(sf_dir: str):
    """Deterministic train/val/test assignment: bucket = md5_u64(doc_id)
    % 100 -> test (<5) / val (<10) / train. A pure map_batches projection
    — no RNG, no shuffle; the split is stable across reruns, resumes and
    parallelism, and ADDING documents never reassigns existing ones (the
    property a random split lacks: eval contamination on re-splits)."""
    from ..stages.sample import md5_u64

    ds = _t(sf_dir, "documents", ["doc_id", "lang"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        b = (md5_u64(df["doc_id"].to_numpy()) % np.uint64(100)).astype(np.int64)
        split = np.where(b < 5, "test", np.where(b < 10, "val", "train"))
        return pd.DataFrame({"doc_id": df["doc_id"], "lang": df["lang"],
                             "split": split})

    return ds.map_batches(assign, batch_format="pandas")


def sample_fixed_per_lang(sf_dir: str, n_per_lang: int = 30):
    """Exactly-N-per-stratum deterministic sample: within each language,
    keep the N smallest (md5_u64(doc_id), doc_id) — a fixed-COUNT quota
    (the rate-based hash_sample can't hit an exact count). Per-batch
    partial top-N per language (<= N x langs rows leave each batch, so
    the shuffle moves O(batches x langs x N), never the corpus), then a
    per-language exact finish in map_groups. Ordering is the md5 rule
    DuckDB reproduces, so the oracle is hash-exact."""
    from ..stages.sample import md5_u64

    ds = _t(sf_dir, "documents", ["doc_id", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_u64(df["doc_id"].to_numpy())
        out = (pd.DataFrame({"doc_id": df["doc_id"], "lang": df["lang"],
                             "h": h})
               .sort_values(["h", "doc_id"])
               .groupby("lang", sort=False).head(n_per_lang))
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"]).head(n_per_lang)
        return g[["doc_id", "lang"]]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("lang")
            .map_groups(finish, batch_format="pandas"))


def sample_temperature_by_source(sf_dir: str, budget: int = 200):
    """Temperature-based domain mixing (the mT5/XLM-R rebalancing rule,
    here at temperature τ=2, i.e. p_s ∝ count_s^0.5): small sources are
    upweighted relative to their raw share, the total draw hits a fixed
    budget. Per-source quotas derive EXACTLY in both engines — weight =
    floor(sqrt(n)·2^20) (IEEE sqrt is correctly rounded and the 2^20
    scale is a power of two, so the floor lands identically in numpy
    and DuckDB), quota = (budget·weight) // Σweights in integer math —
    then each source keeps its quota smallest (md5(doc_id), doc_id)
    rows: the fixed-count stratified machinery with computed quotas.
    One tiny count groupby + one partial-top-N exchange (≤ batches ×
    sources × max-quota rows), never the corpus. A τ≠2 temperature
    needs pow(), whose last-ulp rounding is not guaranteed to agree
    across engines — sqrt keeps the oracle hash-exact."""
    from ..stages.sample import temperature_quota_sample

    return temperature_quota_sample(
        _t(sf_dir, "documents", ["doc_id", "source"]),
        budget=budget, group_col="source", id_col="doc_id")


def redact_pii_documents(sf_dir: str):
    """Email/phone scrub over the corpus: four vectorized RE2 kernels
    per batch (count+replace x2), embarrassingly parallel."""
    from ..functions.text import pii_redact

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        out = pii_redact(df["text"])
        out.insert(0, "doc_id", df["doc_id"].to_numpy())
        return out

    return ds.map_batches(scrub, batch_format="pandas")


def mix_token_budget_documents(sf_dir: str):
    """Per-language token-budget prefix selection (fill each language's
    share of the training mix in doc_id order) via the two-pass
    threshold design in stages/sample.py — no per-stratum sequential
    scan, no corpus shuffle."""
    from ..functions.text import token_counts
    from ..stages.sample import token_budget_mix

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text"])
    picked = token_budget_mix(
        ds, id_col="doc_id", stratum_col="lang",
        weight_fn=lambda df: token_counts(df["text"]),
        budget=MIX_TOKEN_BUDGET,
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import token_counts as tc

        return pd.DataFrame(
            {"doc_id": df["doc_id"], "lang": df["lang"],
             "n_tokens": tc(df["text"])}
        )

    return picked.map_batches(project, batch_format="pandas")


# ---------------------------------------------------------------------------
# shuffle hash join / distributed exact statistics
# ---------------------------------------------------------------------------

#: TPC-H Q3 parameters (shipping-priority query shape)
Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-01-01"


def customers_without_events(sf_dir: str):
    """Distributed ANTI join (NOT EXISTS): customers with no activity in
    the events stream. Exercises the existence-join path of the shuffle
    hash join — the right side ships only its (deduped-per-partition) key
    column, and prefilter=True prunes event user_ids absent from the
    customer side with a broadcast Bloom filter before the all-to-all
    (stages/join.py)."""
    from ..stages.join import shuffle_hash_join

    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    ev = _t(sf_dir, "events", ["user_id"]).map_batches(
        lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow")
    return shuffle_hash_join(cust, ev, on="c_custkey", how="anti",
                             nparts=32, prefilter=True)


def customer_order_stats_right(sf_dir: str):
    """Per-customer order rollup INCLUDING zero-order customers, via the
    RIGHT-join path of the shuffle hash join (``stages/join.py``): order
    partials (left — one row per (batch, custkey) after a per-batch
    combiner) RIGHT JOIN customer (right — every customer survives;
    unmatched ones carry null partials that fold to 0). ``post=`` sums
    the partials per custkey INSIDE the join task — hash partitioning
    means a key never spans partitions, so the rollup is exact with no
    second all-to-all. prefilter=True Bloom-prunes order rows whose
    custkey is absent from the customer table before the shuffle (for
    a right join the build side is the right/customer side). Integer
    cents keep the DuckDB oracle hash-exact."""
    from ..stages.join import shuffle_hash_join

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cents = np.floor(
            df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        g = (pd.DataFrame({"c_custkey": df["o_custkey"].to_numpy(),
                           "n_part": np.int64(1), "cents_part": cents})
             .groupby("c_custkey", sort=False, as_index=False).sum())
        return pa.table({
            "c_custkey": pa.array(g["c_custkey"], pa.int64()),
            "n_part": pa.array(g["n_part"], pa.int64()),
            "cents_part": pa.array(g["cents_part"], pa.int64()),
        })

    partials = orders.map_batches(combine, batch_format="pyarrow")
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["c_custkey", "c_name"], sort=False,
                       as_index=False).agg(n_orders=("n_part", "sum"),
                                           total_cents=("cents_part", "sum"))
        # all-NaN groups (zero-order customers) sum to 0.0 float
        g["n_orders"] = g["n_orders"].astype("int64")
        g["total_cents"] = g["total_cents"].astype("int64")
        return g

    return shuffle_hash_join(partials, cust, on="c_custkey", how="right",
                             nparts=32, prefilter=True, post=fold)


def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: top-10 unshipped orders by revenue. Exercises the
    general LARGE x LARGE shuffle hash join (``stages/join.py``) that
    broadcast/as-of/range joins don't cover:

    - customer is filtered to one segment and broadcast (``ray.put``
      once) as a semi-join key set into the orders scan — small side
      never shuffles;
    - lineitem revenue is PARTIALLY aggregated per batch by orderkey
      before the join (combiner), so the shuffle moves one row per
      (batch, orderkey), not one per lineitem;
    - orders ⋈ lineitem-partials co-locate in ONE hash shuffle
      (tagged-union groupby), then a tiny second aggregate folds the
      partials and sort-limit picks the top 10.
    """
    import ray

    from ..stages.join import shuffle_hash_join

    cust = pq_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = cust.filter(
        pc.equal(cust["c_mktsegment"], Q3_SEGMENT))["c_custkey"]
    key_ref = ray.put(keys.combine_chunks())
    cutoff = np.datetime64(Q3_CUTOFF, "us")

    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(t["o_custkey"], value_set=ray.get(key_ref)),
            pc.less(t["o_orderdate"], pa.scalar(cutoff.item())),
        )
        return t.filter(m).select(["o_orderkey", "o_orderdate"])

    line = _t(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def l_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff.item())))
        rev = pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"]),
        )
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "rev": rev.to_numpy(zero_copy_only=False),
        }).groupby("o_orderkey", as_index=False)["rev"].sum()
        # no pandas schema metadata: Ray's shuffle schema-unify fast path
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def agg_topk(j: pd.DataFrame) -> pd.DataFrame:
        # runs inside the join task on one co-located partition: every
        # row of an orderkey is here, so the sum is exact and a local
        # top-10 is a valid candidate set for the global top-10 — the
        # second all-to-all a naive plan would need disappears.
        g = (j.groupby(["o_orderkey", "o_orderdate"], as_index=False)
             ["rev"].sum())
        g["revenue"] = g["rev"].round(2)
        return (g.drop(columns=["rev"])
                .sort_values(["revenue", "o_orderkey"],
                             ascending=[False, True]).head(10))

    cand = shuffle_hash_join(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        line.map_batches(l_partial, batch_format="pyarrow"),
        on="o_orderkey",
        post=agg_topk,
    )
    df = cand.to_pandas()  # <= 10 rows per partition
    df = df.sort_values(["revenue", "o_orderkey"],
                        ascending=[False, True]).head(10)
    return df.reset_index(drop=True)


Q10_START = "1995-01-01"
Q10_END = "1995-07-01"


def q10_returned_items(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape: top customers by revenue lost to RETURNED items
    in a date window. Composes the join family's pieces: windowed
    orders ⋈ per-batch lineitem-revenue partials in ONE hash shuffle
    (post= folds to per-customer partials inside the join task), a
    customer-sized aggregate + sort-limit picks the top k, and the
    20-row result enriches from customer/nation with a pruned driver
    read — the big tables never shuffle twice."""
    import ray

    from ..stages.join import shuffle_hash_join

    lo = np.datetime64(Q10_START, "us")
    hi = np.datetime64(Q10_END, "us")

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                   "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"],
                                     pa.scalar(lo.item())),
                    pc.less(t["o_orderdate"], pa.scalar(hi.item())))
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    line = _t(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount",
               "l_returnflag"])

    def l_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "rev": rev.to_numpy(zero_copy_only=False),
        }).groupby("o_orderkey", as_index=False)["rev"].sum()
        # no pandas schema metadata: Ray's shuffle schema-unify fast path
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def to_cust(j: pd.DataFrame) -> pd.DataFrame:
        # inside the join task: fold this partition's rows to customer
        # partials (customers span partitions; the tiny groupby after
        # the join finishes them)
        return j.groupby("o_custkey", as_index=False)["rev"].sum()

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch top-k combiner over the per-customer aggregate: the
        # driver receives O(k x batches) rows, never O(customers) — the
        # top_docs_per_lang pattern, with the oracle's exact ordering
        # (rounded revenue desc, custkey asc)
        df = df.assign(revenue=df["rev"].round(2))
        return (df.sort_values(["revenue", "o_custkey"],
                               ascending=[False, True])
                  .head(k)[["o_custkey", "revenue"]])

    top = (shuffle_hash_join(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        line.map_batches(l_partial, batch_format="pyarrow"),
        on="o_orderkey", post=to_cust)
        .groupby("o_custkey")
        .aggregate(Sum("rev", alias_name="rev"))
        .map_batches(partial_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["revenue", "o_custkey"], ascending=[False, True])
        .head(k))

    import pyarrow.parquet as _pq

    # enrich the k winners with a keys-IN pushdown read of the customer
    # dim (row-group/dictionary pruning) — never the whole table
    keys = sorted(int(x) for x in top["o_custkey"])
    cust = _pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=[("c_custkey", "in", keys)]).to_pandas()
    nation = pq_read(sf_dir, "nation",
                     ["n_nationkey", "n_name"]).to_pandas()
    out = (top.merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(nation, left_on="c_nationkey", right_on="n_nationkey"))
    return (out[["c_custkey", "c_name", "n_name", "revenue"]]
            .sort_values(["revenue", "c_custkey"],
                         ascending=[False, True])
            .reset_index(drop=True))


Q18_MIN_QTY = 150


def q18_large_volume_customers(sf_dir: str):
    """TPC-H Q18 shape: orders whose TOTAL line quantity exceeds a
    threshold — HAVING over a join-side aggregate. The heavy side
    reduces FIRST: per-batch quantity partials by orderkey, one
    orderkey groupby, the HAVING filter — and only the few surviving
    orderkeys (a tiny in-memory set) probe orders/customer with pruned
    driver reads. The big tables never join before the aggregate
    filter (a naive plan joins first and aggregates 100x the rows)."""
    line = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "qty": t["l_quantity"].to_numpy(zero_copy_only=False),
        }).groupby("o_orderkey", as_index=False)["qty"].sum()
        # no pandas schema metadata: Ray's shuffle schema-unify fast path
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    from ..stages.join import shuffle_hash_join

    big = (line.map_batches(partial, batch_format="pyarrow")
           .groupby("o_orderkey")
           .aggregate(Sum("qty", alias_name="total_qty"))
           .filter(expr=f"total_qty > {Q18_MIN_QTY}"))
    # the surviving set scales WITH the data (constant HAVING
    # selectivity), so both enrichment joins are shuffle joins with a
    # Bloom prefilter dropping the non-surviving 99% of each big dim
    # before its all-to-all — never a driver-side probe
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                   "o_orderdate", "o_totalprice"])
    j1 = shuffle_hash_join(big, orders, on="o_orderkey",
                           prefilter=True)

    def fix_key(t: pa.Table) -> pa.Table:
        # the join's pandas merge nullable-ifies the carried int key to
        # double; an inner join guarantees non-null — cast back so the
        # second join's key types agree
        i = t.schema.get_field_index("o_custkey")
        return t.set_column(i, "o_custkey",
                            pc.cast(t["o_custkey"], pa.int64()))

    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])

    def tag_cust(t: pa.Table) -> pa.Table:
        return t.rename_columns(["o_custkey", "c_name"])

    j2 = shuffle_hash_join(
        j1.map_batches(fix_key, batch_format="pyarrow"),
        cust.map_batches(tag_cust, batch_format="pyarrow"),
        on="o_custkey", prefilter=True)
    out = j2.to_pandas()
    out["total_qty"] = out["total_qty"].round(2)
    out["c_custkey"] = out["o_custkey"].astype("int64")
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return (out[["c_custkey", "c_name", "o_orderkey", "o_orderdate",
                 "o_totalprice", "total_qty"]]
            .sort_values(["o_totalprice", "o_orderkey"],
                         ascending=[False, True])
            .reset_index(drop=True))


Q5_REGION = "AMERICA"
Q5_START = "1995-01-01"
Q5_END = "1996-01-01"


def q5_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape: revenue by supplier nation for one region/year,
    where supplier and customer share a nation. Exercises a CHAIN of two
    LARGE x LARGE shuffle hash joins plus the broadcast-dim pattern:

    - nation ⨝ region (tiny dims) fold on the driver to a nation-key
      set + name map;
    - supplier (s_suppkey → s_nationkey) broadcasts ONCE via ``ray.put``
      as two sorted int arrays — the only broadcast that grows with SF
      (~1.2 GB at 10^8 suppliers; beyond that swap in a third
      shuffle_hash_join on l_suppkey, same machinery);
    - orders (one-year filter) ⨝ customer (region semi-join filter at
      the read) co-locate in shuffle join #1 on custkey;
    - lineitem maps suppkey → s_nationkey against the broadcast, keeps
      region suppliers only, and PARTIALLY aggregates revenue per batch
      by (orderkey, s_nationkey) before shuffle join #2 on orderkey;
      the c_nation == s_nation filter and a per-nation rollup run
      INSIDE the join task (post=), so only nparts × |nations| partial
      rows ever reach the driver.
    """
    import ray

    from ..stages.join import shuffle_hash_join

    nation = pq_read(sf_dir, "nation")
    region = pq_read(sf_dir, "region")
    rkey = region.filter(
        pc.equal(region["r_name"], Q5_REGION))["r_regionkey"][0].as_py()
    nat = nation.filter(pc.equal(nation["n_regionkey"], rkey))
    nkeys = nat["n_nationkey"].to_pylist()
    nname = dict(zip(nkeys, nat["n_name"].to_pylist()))
    nkeys_arr = pa.array(nkeys, type=nation.schema.field("n_nationkey").type)
    nkeys_np = np.sort(np.asarray(nkeys, dtype=np.int64))

    supp = pq_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy()
    order_ = np.argsort(sk)
    supp_ref = ray.put(
        (sk[order_], supp["s_nationkey"].to_numpy()[order_]))

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def c_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["c_nationkey"], value_set=nkeys_arr))

    lo = np.datetime64(Q5_START, "us")
    hi = np.datetime64(Q5_END, "us")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo.item())),
            pc.less(t["o_orderdate"], pa.scalar(hi.item())),
        )
        t = t.filter(m)
        return pa.table(
            {"c_custkey": t["o_custkey"], "o_orderkey": t["o_orderkey"]})

    j1 = shuffle_hash_join(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        cust.map_batches(c_filter, batch_format="pyarrow"),
        on="c_custkey",
    )

    def drop_key(t: pa.Table) -> pa.Table:
        return t.select(["o_orderkey", "c_nationkey"])

    line = _t(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def l_partial(t: pa.Table) -> pa.Table:
        sk_s, sn_s = ray.get(supp_ref)
        suppkey = t["l_suppkey"].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(sk_s, suppkey), len(sk_s) - 1)
        snat = sn_s[idx]
        # inner-join semantics: a suppkey absent from supplier is DROPPED,
        # not clamped onto a neighbour's nation
        keep = (sk_s[idx] == suppkey) & np.isin(snat, nkeys_np)
        rev = (t["l_extendedprice"].to_numpy(zero_copy_only=False)
               * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)))
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
            "s_nationkey": snat[keep],
            "rev": rev[keep],
        }).groupby(["o_orderkey", "s_nationkey"], as_index=False)["rev"].sum()
        # no pandas schema metadata: Ray's shuffle schema-unify fast path
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def partial_nation(j: pd.DataFrame) -> pd.DataFrame:
        j = j[j["c_nationkey"] == j["s_nationkey"]]
        return j.groupby("s_nationkey", as_index=False)["rev"].sum()

    j2 = shuffle_hash_join(
        j1.map_batches(drop_key, batch_format="pyarrow"),
        line.map_batches(l_partial, batch_format="pyarrow"),
        on="o_orderkey",
        post=partial_nation,
    )
    df = j2.to_pandas()  # <= nparts x |nations| partial rows
    g = df.groupby("s_nationkey", as_index=False)["rev"].sum()
    g["n_name"] = g["s_nationkey"].map(nname)
    g["revenue"] = g["rev"].round(2)
    return (g[["n_name", "revenue"]]
            .sort_values(["revenue", "n_name"], ascending=[False, True])
            .reset_index(drop=True))


def decontaminate_documents(sf_dir: str):
    """Benchmark decontamination: flag non-eval documents sharing any
    3-gram with the eval slice (doc_id % 97 == 0). Broadcast-set
    membership — no shuffle; see stages/decontaminate.py."""
    import ray

    from ..stages.decontaminate import decontaminate, eval_gram_hashes

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    ev = eval_gram_hashes(docs, n=3)
    return decontaminate(docs, ray.put(ev), n=3)


def decontaminate_semantic_embeddings(sf_dir: str):
    """SEMANTIC decontamination — the embedding-space analog of the
    n-gram route above: drop every corpus vector whose max cosine
    similarity to ANY eval/benchmark vector reaches the threshold
    (used to purge eval-set lookalikes that share no literal n-gram,
    e.g. translations/paraphrases). Eval slice = ``vec_id % 20 == 0``
    (fixture rule, same spirit as the n-gram route's ``% 97``);
    τ = 0.35 sits inside the synthetic fixture's similarity geometry
    (isotropic vectors — no ≥0.9 pairs exist; the closest value is
    ≥7e-5 from τ at every sf, so the float64 compare can never flip a
    boundary row vs DuckDB's ``list_cosine_similarity``).

    Scale plan: the eval matrix is tiny (k×d) — L2-normalized float64,
    ``ray.put`` ONCE; one corpus scan does a per-batch matmul against
    it and keeps survivors. No shuffle, no pairwise corpus work;
    O(corpus × eval) flops streaming at any corpus size."""
    import numpy as np
    import pyarrow as pa
    import ray

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def eval_part(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        keep = ids % 20 == 0
        return t.filter(pa.array(keep))

    ev_rows = emb.map_batches(eval_part, batch_format="pyarrow").take_all()
    E = np.vstack([r["embedding"] for r in ev_rows]).astype(np.float64)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    ev_ref = ray.put(E)

    def survivors(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        corp = ids % 20 != 0
        if not corp.any():
            return pa.table({"vec_id": pa.array([], pa.int64())})
        t = t.filter(pa.array(corp))
        X = np.vstack(
            t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        ev = ray.get(ev_ref)
        mx = (X @ ev.T).max(axis=1)
        return pa.table({"vec_id": t["vec_id"].filter(pa.array(mx < 0.35))})

    return emb.map_batches(survivors, batch_format="pyarrow").sort("vec_id")


def dedup_passages_documents(sf_dir: str):
    """C4-style cross-corpus passage dedup (10-token windows): first
    occurrence survives, documents rebuilt from surviving passages.
    See stages/linededup.py for the two-shuffle scale plan."""
    from ..stages.linededup import passage_dedup

    return passage_dedup(_t(sf_dir, "documents", ["doc_id", "text"]),
                         chunk=10)


def _vocab_tf_df(ds, cap: int, fold: str = "tree"):
    """Shared vocabulary build (tokenizer-vocab convention): per-batch
    partial (tok, tf, df) counts — a document lives wholly inside one
    batch, so per-batch distinct-doc counts SUM to the exact global df —
    then the (df desc, tok) sort-limit on the one-row-per-DISTINCT-token
    aggregate, never the corpus. Both vocab_document_frequency and the
    tf-idf idf table build through HERE, so tokenization and the cap
    tie-break can never drift apart.

    ``fold="tree"`` (default) folds the partials through Ray's
    ``AggregateFn`` tree merge — the accumulator is one (tf, df) pair
    per distinct token (vocabulary-bounded, never corpus positions) and
    no sort shuffle runs (measured ~2x the end-to-end groupby shape at
    bench scale); ``fold="shuffle"`` keeps the distributed token
    groupby for corpora whose distinct-token count exceeds a single
    accumulator's memory."""
    from ..functions.text import _flat_lower_tokens

    if fold == "tree":
        from ray.data.aggregate import AggregateFn

        def acc_block(state: dict, block) -> dict:
            vals = (block["text"].to_pylist()
                    if hasattr(block, "to_pylist") else list(block["text"]))
            flat, di, _ = _flat_lower_tokens(pd.Series(vals))
            if not len(flat):
                return state
            g = (pd.DataFrame({"tok": flat, "d": di})
                 .groupby("tok", sort=False)["d"].agg(["size", "nunique"]))
            for t, tf, dfc in zip(g.index.to_numpy(dtype=object),
                                  g["size"].to_numpy(),
                                  g["nunique"].to_numpy()):
                cur = state.get(t)
                if cur is None:
                    state[t] = [int(tf), int(dfc)]
                else:
                    cur[0] += int(tf)
                    cur[1] += int(dfc)
            return state

        def merge(a: dict, b: dict) -> dict:
            if len(b) > len(a):
                a, b = b, a
            for t, v in b.items():
                cur = a.get(t)
                if cur is None:
                    a[t] = v
                else:
                    cur[0] += v[0]
                    cur[1] += v[1]
            return a

        fn = AggregateFn(init=lambda _k: {}, merge=merge,
                         accumulate_block=acc_block, name="vocab")
        out = ds.aggregate(fn)
        st = out["vocab"] if isinstance(out, dict) else out
        res = pd.DataFrame({
            "tok": np.array(list(st.keys()), dtype=object),
            "tf": np.fromiter((v[0] for v in st.values()), np.int64,
                              len(st)),
            "df": np.fromiter((v[1] for v in st.values()), np.int64,
                              len(st))})
        return (res.sort_values(["df", "tok"], ascending=[False, True],
                                kind="stable")
                .head(cap).reset_index(drop=True))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, di, _ = _flat_lower_tokens(df["text"].reset_index(drop=True))
        if len(flat) == 0:
            return pd.DataFrame({
                "tok": pd.Series([], dtype=str),
                "tf": pd.Series([], dtype=np.int64),
                "df": pd.Series([], dtype=np.int64)})
        g = (pd.DataFrame({"tok": flat, "d": di})
             .groupby("tok", sort=False)["d"].agg(["size", "nunique"])
             .reset_index())
        g.columns = ["tok", "tf", "df"]
        return g

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("tok")
           .aggregate(Sum("tf", alias_name="tf"),
                      Sum("df", alias_name="df")))
    return (agg.sort(["df", "tok"], descending=[True, False]).limit(cap)
            .to_pandas())


def vocab_document_frequency(sf_dir: str, k: int = 100):
    """Tokenizer-vocabulary build: corpus-wide term and document
    frequency, top-k by (df desc, tok) — see ``_vocab_tf_df``."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return _vocab_tf_df(ds, k)[["tok", "df", "tf"]]


def tfidf_top_terms_documents(sf_dir: str, k: int = 3, vocab_cap: int = 50_000):
    """Per-document top-k tf-idf terms WITHIN the built vocabulary.

    The idf table is capped at ``vocab_cap`` terms by (df desc, tok) —
    exactly how tokenizer vocabularies are built (vocab_document_frequency
    shape) — so the idf side is a BOUNDED broadcast, never a corpus-scale
    token join: pass 1 aggregates document frequency over the vocabulary
    (per-batch partials -> vocabulary-sized groupby); the (tok -> df) map
    and the corpus doc count broadcast via ``ray.put``; pass 2 is ONE
    corpus scan computing per-doc tf and tf*ln(N/df) top-k inside
    map_batches — a document lives wholly in one batch, so per-doc top-k
    is exact locally. Integer-micros scores keep the DuckDB oracle
    hash-exact, and BOTH sides rank by (score_micros desc, tok) so the
    float never decides an ordering. Scale: two corpus scans, zero corpus
    shuffles, O(vocab_cap) broadcast."""
    import ray

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    vocab = _vocab_tf_df(ds, vocab_cap)
    n_docs = float(ds.count())
    idf_ref = ray.put(pd.Series(vocab["df"].to_numpy(np.int64),
                                index=vocab["tok"].to_numpy()))

    def top_terms(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import _flat_lower_tokens

        dfs = ray.get(idf_ref)
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype=str),
            "tok": pd.Series([], dtype=str),
            "tf": pd.Series([], dtype=np.int64),
            "df": pd.Series([], dtype=np.int64),
            "score_micros": pd.Series([], dtype=np.int64)})
        flat, di, _ = _flat_lower_tokens(df["text"].reset_index(drop=True))
        if len(flat) == 0:
            return empty
        g = (pd.DataFrame({"d": di, "tok": flat})
             .groupby(["d", "tok"], sort=False).size()
             .rename("tf").reset_index())
        dfv = g["tok"].map(dfs)
        g = g[dfv.notna()].reset_index(drop=True)
        if not len(g):
            return empty
        dfi = dfv.dropna().to_numpy(np.int64)
        # identical double expression to the SQL oracle: tf * ln(N / df)
        score = g["tf"].to_numpy(np.float64) * np.log(
            n_docs / dfi.astype(np.float64))
        g["df"] = dfi
        g["score_micros"] = np.floor(score * 1e6 + 0.5).astype(np.int64)
        g = g.sort_values(["d", "score_micros", "tok"],
                          ascending=[True, False, True])
        top = g.groupby("d", sort=False).head(k)
        doc_ids = df["doc_id"].reset_index(drop=True).to_numpy()
        return pd.DataFrame({
            "doc_id": doc_ids[top["d"].to_numpy()],
            "tok": top["tok"].to_numpy(),
            "tf": top["tf"].to_numpy(np.int64),
            "df": top["df"].to_numpy(np.int64),
            "score_micros": top["score_micros"].to_numpy(np.int64)})

    return ds.map_batches(top_terms, batch_format="pandas")


def shuffle_rank_documents(sf_dir: str):
    """Deterministic full-corpus shuffle rank (training-export order):
    rank = position in (md5_u64(doc_id), doc_id) order, via the
    histogram-rank two-pass — no global sort barrier
    (stages/sample.py:hash_rank)."""
    from ..stages.sample import hash_rank

    return hash_rank(_t(sf_dir, "documents", ["doc_id"]),
                     id_col="doc_id", nbuckets=256)


def approx_distinct_users_hll(sf_dir: str):
    """Approximate COUNT(DISTINCT user_id) per event type via mergeable
    HyperLogLog registers (functions/sketch.py): m bytes per (group,
    batch) partial regardless of cardinality — the shuffle moves
    sketches, never user ids. Rows-only (approximate by design);
    planted tolerance test in tests/test_corpus_quality.py."""
    from ..functions.sketch import hll_estimate, hll_registers

    P = 12
    ds = _t(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, g in df.groupby("event_type", sort=False):
            out.append({"event_type": et,
                        "regs": hll_registers(g["user_id"].to_numpy(), P)})
        return pd.DataFrame(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.maximum.reduce(np.stack(g["regs"].to_list()))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "approx_users": [int(round(hll_estimate(regs)))]})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type").map_groups(merge, batch_format="pandas"))


def corpus_report_documents(sf_dir: str):
    """Fused single-pass per-document feature report: language ID,
    quality scores, and repetition stats computed by ONE map_batches
    over ONE read — at 100 TB this is the difference between one corpus
    scan and three. The SQL oracle joins the three individual oracles,
    proving the fusion changes nothing."""
    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def fused(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions import text as textmod

        texts = df["text"].reset_index(drop=True)
        q = textmod.quality_scores(texts)
        r = textmod.repetition_stats(texts)
        pred = textmod.lang_id(texts)
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "lang": df["lang"].to_numpy(),
            "lang_pred": pred.to_numpy(),
        })
        out["quality_score"] = q["quality_score"].to_numpy()
        for c in ("n_tokens", "top_token_n", "n_bigrams",
                  "dup_bigram_n", "flagged"):
            out[c] = r[c].to_numpy()
        return out

    return ds.map_batches(fused, batch_format="pandas")


def heavy_hitters_tokens(sf_dir: str, capacity: int = 64, topn: int = 10):
    """Top-n most frequent tokens via mergeable Misra-Gries summaries
    (functions/sketch.py): each batch ships at most ``capacity``
    (token, count, err) rows regardless of batch size; a vocabulary
    groupby merges them and a final truncate bounds the driver set.
    With the synthetic vocabulary < capacity nothing truncates, so the
    result is EXACT (max_err 0) and the DuckDB oracle gates it; the
    truncating regime's error bound is exercised in
    tests/test_corpus_quality.py."""
    from ..functions.sketch import mg_partial, mg_truncate

    _DROP = "\x00dropped"
    ds = _t(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import _flat_lower_tokens

        flat, _, _ = _flat_lower_tokens(df["text"].reset_index(drop=True))
        items, counts, errs, d = mg_partial(flat, capacity)
        out = pd.DataFrame({"tok": items.astype(str), "c": counts,
                            "e": errs})
        if d:  # sentinel row carries this batch's truncation mass
            out = pd.concat([out, pd.DataFrame(
                {"tok": [_DROP], "c": [d], "e": [d]})], ignore_index=True)
        return out

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("tok")
           .aggregate(Sum("c", alias_name="c"), Sum("e", alias_name="e"))
           .to_pandas())
    dropped = int(agg.loc[agg["tok"] == _DROP, "c"].sum())
    cand = agg[agg["tok"] != _DROP]
    items, counts, errs, _ = mg_truncate(
        cand["tok"].to_numpy(), cand["c"].to_numpy(dtype=np.int64),
        cand["e"].to_numpy(dtype=np.int64), capacity)
    # errs already folds the final truncation's subtraction in; adding
    # `dropped` covers batches where the item was cut from the partial
    res = pd.DataFrame({
        "tok": items, "cnt": counts,
        "max_err": errs + dropped,
    })
    return (res.sort_values(["cnt", "tok"], ascending=[False, True])
            .head(topn).reset_index(drop=True))


def approx_token_freq_cms(sf_dir: str, depth: int = 4, width: int = 4096,
                          topn: int = 10):
    """Count-Min frequency estimates for the MG-selected heavy hitters —
    the two sketches composed: MG finds WHICH tokens are hot, CMS
    estimates HOW hot with a fixed-size mergeable counter matrix. Each
    batch ships one (depth x width) int64 partial (sum-merged 32 at a
    time in a fold pass, then on the driver — O(depth*width), never the
    vocabulary). CMS never undercounts; with width >> vocabulary the
    estimate is exact, which the pytest gate asserts against the exact
    groupby. Rows-only (approximate by design)."""
    from ..functions.sketch import cms_build, cms_query

    hh = heavy_hitters_tokens(sf_dir, topn=topn)
    ds = _t(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import _flat_lower_tokens

        flat, _, _ = _flat_lower_tokens(df["text"].reset_index(drop=True))
        m = cms_build(flat.astype(str), depth=depth, width=width)
        return pd.DataFrame({"m": [m.tobytes()]})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(depth * width, np.int64)
        for buf in df["m"]:
            acc += np.frombuffer(buf, np.int64)
        return pd.DataFrame({"m": [acc.tobytes()]})

    folded = (ds.map_batches(partial, batch_format="pandas")
              .map_batches(fold, batch_format="pandas", batch_size=32)
              .take_all())
    acc = np.zeros(depth * width, np.int64)
    for r in folded:
        acc += np.frombuffer(r["m"], np.int64)
    m = acc.reshape(depth, width)
    toks = hh["tok"].to_numpy()
    return pd.DataFrame({"tok": toks,
                         "est": cms_query(m, toks.astype(str))})


def approx_quantiles_event_value(sf_dir: str, s: int = 512):
    """Approximate p50/p90/p99 of event value per type via mergeable
    rank-spaced quantile summaries (functions/sketch.py): each batch
    ships <= s weighted points per group regardless of batch size —
    the unbounded-domain companion to the exact bounded-domain
    histogram percentiles (doc_length_percentiles). Rows-only
    (approximate); rank-error-bound test gates it."""
    from ..functions.sketch import (
        quantile_merge,
        quantile_query,
        quantile_summary,
    )

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, g in df.groupby("event_type", sort=False):
            p, w = quantile_summary(g["value"].to_numpy(), s)
            out.append({"event_type": et, "p": p, "w": w})
        return pd.DataFrame(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        p, w = quantile_merge(list(zip(g["p"], g["w"])), s)
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "p50": [quantile_query(p, w, 0.5)],
            "p90": [quantile_query(p, w, 0.9)],
            "p99": [quantile_query(p, w, 0.99)],
        })

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type").map_groups(merge, batch_format="pandas"))


def kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table (k=10,
    deterministic hash-order init). Rows-only (iterative, no SQL
    shape); blob-recovery/determinism/inertia tests gate it."""
    from ..stages.clustering import kmeans

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    assigns, _, _ = kmeans(ds, k=10, iters=8)
    return assigns


def corpus_prep_pipeline(sf_dir: str, min_quality: float = 0.5,
                         sample_permille: int = 500):
    """End-to-end corpus-prep COMPOSITION — the pipeline a training-data
    user actually runs: quality filter -> exact dedup (min-doc-id
    survivor keeps its payload) -> deterministic 50% hash sample. One
    corpus scan computes quality + md5 and drops low-quality docs BEFORE
    the shuffle; the one shuffle moves only (md5, id, lang, n_chars,
    score) survivor candidates coarse-partitioned by hash(md5), never
    text; the sample is a stateless hash filter. The oracle chains the
    same three stages in SQL, so composition itself is correctness-gated
    (ordering note: dedup picks the MIN doc id, and the sample keys on
    the survivor's id, so sample-after-dedup is the specified and tested
    order)."""
    import hashlib as _hl

    from ..stages.sample import md5_u64

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text"])
    nparts = 64

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions import text as textmod

        q = textmod.quality_scores(df["text"])
        vals = df["text"].to_numpy()
        md5s = np.fromiter(
            (_hl.md5(s.encode()).hexdigest() for s in vals),
            dtype="<U32", count=len(vals))
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "lang": df["lang"].to_numpy(),
            "n_chars": q["n_chars"].to_numpy(),
            "quality_score": q["quality_score"].to_numpy(),
            "text_md5": md5s,
        })
        out = out[out["quality_score"] >= min_quality]
        h = pd.util.hash_array(out["text_md5"].to_numpy())
        out["part"] = (h % np.uint64(nparts)).astype(np.int32)
        return out

    def dedup_and_sample(g: pd.DataFrame) -> pd.DataFrame:
        surv = (g.sort_values("doc_id")
                .groupby("text_md5", sort=False).head(1))
        keep = md5_u64(surv["doc_id"].to_numpy()) % np.uint64(1000) \
            < np.uint64(sample_permille)
        return surv.loc[keep, ["doc_id", "lang", "n_chars",
                               "quality_score"]]

    return (ds.map_batches(prep, batch_format="pandas")
            .groupby("part")
            .map_groups(dedup_and_sample, batch_format="pandas"))


def pca_embeddings(sf_dir: str):
    """Distributed PCA (stages/pca.py): one moment-partials pass fits the
    model on the driver's O(d^2) fold, one stateless matmul pass projects.
    Returns the top-4 principal coordinates per vector. Rows-only (eigh
    has no SQL shape); planted-subspace recovery / variance-accounting /
    batch-invariance tests gate it."""
    from ..stages.pca import pca_fit, pca_transform

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    model = pca_fit(ds, n_components=4)
    proj = pca_transform(ds, model, keep=["vec_id"])

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        pcs = np.stack(df["pc"].to_list())
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(),
            **{f"pc{i + 1}": pcs[:, i] for i in range(pcs.shape[1])}})

    return proj.map_batches(widen, batch_format="pandas")


def repetition_stats_documents(sf_dir: str):
    """Gopher-style repetition filter features per document (integer
    counts only, so the SQL oracle matches hash-exactly)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import repetition_stats

        out = repetition_stats(df["text"].reset_index(drop=True))
        out.insert(0, "doc_id", df["doc_id"].to_numpy())
        return out

    return ds.map_batches(stats, batch_format="pandas")


def pq_read(sf_dir: str, name: str, columns=None) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"),
                         columns=columns)


def filter_docs_above_median_length(sf_dir: str):
    """Dynamic-threshold filter: keep documents at/above their
    language's MEDIAN length — the "drop the bottom half by a quality
    signal" corpus op where the threshold is corpus-derived, not fixed.
    Two passes: the exact value-count histogram computes each language's
    percentile_disc(0.5) (O(langs x distinct lengths) shuffle payload,
    same machinery as doc_length_percentiles), the tiny threshold map
    broadcasts in the task closure, and ONE map_batches filter streams
    the corpus."""
    ds = _t(sf_dir, "documents", ["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_chars"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    med = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_chars")
        cum = g["cnt"].to_numpy().cumsum()
        k = max(int(np.ceil(0.5 * cum[-1])), 1)
        med[lang] = int(g["n_chars"].to_numpy()[
            np.searchsorted(cum, k, side="left")])

    full = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_chars"] >= df["lang"].map(med).to_numpy()]

    return full.map_batches(keep, batch_format="pandas")


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_type_counts(sf_dir: str):
    """PIVOT: one row per user, one count column per event type —
    per-batch crosstab partials (a vectorized pandas crosstab, emitting
    <= users-in-batch rows with 5 int columns) then ONE small groupby
    sum; the shuffle moves partial count rows, never events. Column set
    is the fixed event-type domain, so the conditional-aggregation
    oracle is hash-exact."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df["user_id"], df["event_type"])
        ct = ct.reindex(columns=list(EVENT_TYPES), fill_value=0)
        out = ct.reset_index()
        out.columns = ["user_id"] + [f"n_{t}" for t in EVENT_TYPES]
        return out.astype({f"n_{t}": "int64" for t in EVENT_TYPES})

    cols = [f"n_{t}" for t in EVENT_TYPES]
    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("user_id")
            .aggregate(*[Sum(c, alias_name=c) for c in cols]))


def events_unpivot_type_counts(sf_dir: str):
    """UNPIVOT/melt — the wide pivot result back to long
    (user_id, event_type, n) rows INCLUDING explicit zeros (the melt
    contract; a plain groupby would drop absent combinations). Pure
    per-batch ``DataFrame.melt``, no extra shuffle beyond the pivot's."""
    wide = events_pivot_type_counts(sf_dir)

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(id_vars="user_id", var_name="event_type",
                      value_name="n")
        out["event_type"] = out["event_type"].str[2:]
        return out

    return wide.map_batches(melt, batch_format="pandas")


def doc_length_percentiles(sf_dir: str):
    """Exact per-language length percentiles (p50/p90/p99) at corpus
    scale WITHOUT a sort: per-batch (lang, n_chars) value-count partials
    -> one small groupby over the bounded value domain -> driver walks
    each language's cumulative histogram. Shuffle payload is
    O(langs x distinct lengths), never O(docs); the index rule
    (smallest value with cumcount >= ceil(p*n)) is percentile_disc's."""
    ds = _t(sf_dir, "documents", ["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_chars"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )

    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_chars")
        vals = g["n_chars"].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])

        def disc(p: float) -> int:
            k = max(int(np.ceil(p * n)), 1)
            return int(vals[np.searchsorted(cum, k, side="left")])

        rows.append({"lang": lang, "n_docs": n, "p50": disc(0.5),
                     "p90": disc(0.9), "p99": disc(0.99)})
    return pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)


MEDIAN_BUCKET_W = 1024.0  # pass-1 histogram bucket width (price units)


def orders_median_price_by_status(sf_dir: str):
    """EXACT per-group median over a CONTINUOUS domain (o_totalprice)
    without sorting the groups — the two-pass histogram-prune shape:

    1. per-batch (status, floor(price/W)) bucket-count partials -> one
       small groupby (payload O(groups x buckets), never O(rows)); the
       driver walks each group's cumulative histogram to find the bucket
       holding rank k = ceil(n/2) (quantile_disc 0.5's rank rule) and
       the residual rank within it;
    2. a second scan keeps ONLY rows in each group's target bucket
       (~n/nbuckets rows, broadcast tiny (group -> bucket) map) and a
       per-group map_groups picks the residual-rank element — the exact
       stored double, so equality with the SQL oracle is bitwise.

    Partitioning assumption: one group's single-bucket row set fits a
    task's heap (value-skewed data wants a narrower W or a second prune
    level — same machinery, recursively)."""
    ds = _t(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(
            df["o_totalprice"].to_numpy() / MEDIAN_BUCKET_W
        ).astype(np.int64)
        g = (pd.DataFrame({"o_orderstatus": df["o_orderstatus"], "b": b})
             .groupby(["o_orderstatus", "b"], as_index=False).size())
        return g.rename(columns={"size": "cnt"})

    # fold the bounded partials on the driver: each batch contributes
    # <= |statuses| x |buckets| rows (row-count independent), so a
    # groupby all-to-all here would cost more in shuffle latency than
    # the whole histogram is worth
    hist = (ds.map_batches(hist_partial, batch_format="pandas")
            .to_pandas()
            .groupby(["o_orderstatus", "b"], as_index=False)["cnt"].sum())

    targets: dict[str, tuple[int, int, int]] = {}
    for status, g in hist.groupby("o_orderstatus"):
        g = g.sort_values("b")
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        k = max(int(np.ceil(0.5 * n)), 1)
        i = int(np.searchsorted(cum, k, side="left"))
        before = int(cum[i - 1]) if i else 0
        targets[status] = (int(g["b"].iloc[i]), k - before, n)

    import ray as _ray

    t_ref = _ray.put({s: t[0] for s, t in targets.items()})

    def keep_bucket(df: pd.DataFrame) -> pd.DataFrame:
        tm = _ray.get(t_ref)
        b = np.floor(
            df["o_totalprice"].to_numpy() / MEDIAN_BUCKET_W
        ).astype(np.int64)
        tb = df["o_orderstatus"].map(tm).to_numpy()
        return df[b == tb]

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        status = g["o_orderstatus"].iloc[0]
        _b, resid, n = targets[status]
        v = np.sort(g["o_totalprice"].to_numpy())
        return pd.DataFrame({"o_orderstatus": [status],
                             "n_orders": [np.int64(n)],
                             "median_price": [v[resid - 1]]})

    out = (ds.map_batches(keep_bucket, batch_format="pandas")
           .groupby("o_orderstatus")
           .map_groups(pick, batch_format="pandas")
           .to_pandas())
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def doc_length_trimmed_mean(sf_dir: str, trim_pct: int = 10):
    """Exact 10%-trimmed mean of doc length per language from the SAME
    histogram pass the percentiles use — robust statistics without a
    sort: the driver drops each side's ``k = n // 10`` rows by walking
    cumulative counts (partial buckets contribute only the needed
    multiplicity, exact integer arithmetic), and the only float is the
    final division, performed on identical integers in both engines."""
    ds = _t(sf_dir, "documents", ["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_chars"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )

    def side_sum(vals, cnts, k):
        """Sum of the k smallest values in the histogram (exact)."""
        s = 0
        left = k
        for v, c in zip(vals, cnts):
            take = min(int(c), left)
            s += int(v) * take
            left -= take
            if left == 0:
                break
        return s

    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_chars")
        vals = g["n_chars"].to_numpy()
        cnts = g["cnt"].to_numpy()
        n = int(cnts.sum())
        total = int((vals.astype(object) * cnts.astype(object)).sum())
        k = n * trim_pct // 100  # integer trim rule, mirrored in SQL
        lo = side_sum(vals, cnts, k)
        hi = side_sum(vals[::-1], cnts[::-1], k)
        kept_n = n - 2 * k
        kept_sum = total - lo - hi
        rows.append({"lang": lang, "n_kept": kept_n,
                     "sum_kept": kept_sum,
                     "trimmed_mean": float(kept_sum) / kept_n})
    return pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)


def distinct_users_per_type(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): local drop_duplicates combiner per
    batch (the shuffle moves unique pairs, not raw events) -> one hash
    groupby to global-distinct the pairs -> tiny per-type count."""
    ds = _t(sf_dir, "events", ["event_type", "user_id"])

    pairs = (
        ds.map_batches(lambda df: df.drop_duplicates(),
                       batch_format="pandas")
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
    )
    out = pairs.groupby("event_type").aggregate(
        Count(alias_name="n_users"))
    df = out.to_pandas()[["event_type", "n_users"]]
    return df.sort_values("event_type").reset_index(drop=True)


def events_json_props_stats(sf_dir: str):
    """Semi-structured extraction: pull the scalar ``k`` out of the JSON
    ``props`` column with ONE vectorized RE2 ``extract_regex`` pass (no
    per-row json.loads loop — the reference's V7 JSON-column contract
    treats JSON as opaque strings, and a schema-on-read scalar probe is
    the standard lakehouse pattern), then per-batch partial aggregation
    by event_type."""
    ds = _t(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        g = (pa.table({"event_type": t["event_type"], "k": k})
             .group_by("event_type")
             .aggregate([("k", "sum"), ("k", "count"), ("k", "min"),
                         ("k", "max")]))
        return pa.table({
            "event_type": g["event_type"], "p_sum": g["k_sum"],
            "p_n": g["k_count"], "p_min": g["k_min"], "p_max": g["k_max"]})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type")
           .aggregate(Sum("p_sum", alias_name="sum_k"),
                      Sum("p_n", alias_name="n"),
                      Min("p_min", alias_name="min_k"),
                      Max("p_max", alias_name="max_k")))
    df = agg.to_pandas()[["event_type", "sum_k", "n", "min_k", "max_k"]]
    return df.sort_values("event_type").reset_index(drop=True)


def pack_sequences_documents(sf_dir: str, seq_tokens: int = 512):
    """Sequence packing for LLM training: lay the corpus out in the
    deterministic shuffle order (md5 rank — same order as
    shuffle_rank_documents) and pack documents contiguously into fixed
    token-budget sequences; a document's sequence id is
    ``exclusive_prefix_tokens // budget``. Every stage is distributed —
    vectorized regex token counts, then the range-bucket prefix scan
    (stages/scan.py) for the global cumulative sum with NO global sort
    barrier; at 100 TB the only exchange is the nbuckets-sized partial
    table."""
    from ..functions.text import token_counts
    from ..stages.sample import md5_u64
    from ..stages.scan import ordered_cumsum

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        # wrap-shift u64 -> i64 (x + 2^63 mod 2^64): order-isomorphic to
        # the oracle's unsigned md5_number_lower, in the int64 domain the
        # prefix scan's key mapping supports
        h = (md5_u64(ids) + np.uint64(1 << 63)).view(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "h": h,
            "n_tokens": token_counts(df["text"]).astype("int64"),
        })

    res = ordered_cumsum(ds.map_batches(prep, batch_format="pandas"),
                         order_col="h", tiebreak_col="doc_id",
                         value_col="n_tokens")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        excl = (df["running_total"] - df["n_tokens"]).to_numpy()
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": df["n_tokens"],
            "seq_id": (excl // seq_tokens).astype("int64"),
        })

    return res.map_batches(project, batch_format="pandas")


def funnel_view_purchase(sf_dir: str, within_hours: int = 1):
    """Funnel conversion: users who VIEWED, and users whose view was
    followed by a PURCHASE within the window — the classic behavioral
    funnel. One user-keyed shuffle co-locates each user's events; inside
    the group a sorted searchsorted checks every view against the
    purchase timeline vectorized (no pairwise join blowup — at 100 TB
    the self-join the SQL oracle writes would be quadratic per user)."""
    ds = _t(sf_dir, "events", ["user_id", "event_type", "ts"])
    win = np.timedelta64(within_hours * 3600, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy(dtype="datetime64[us]")
        views = np.sort(ts[et == "view"])
        if len(views) == 0:
            return pd.DataFrame({"viewed": [0], "converted": [0]})
        buys = np.sort(ts[et == "purchase"])
        # a view converts iff some purchase lands in (view, view + win]
        lo = np.searchsorted(buys, views, side="right")
        hi = np.searchsorted(buys, views + win, side="right")
        return pd.DataFrame({"viewed": [1],
                             "converted": [int((hi > lo).any())]})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pandas")
    agg = per.aggregate(Sum("viewed", alias_name="viewed"),
                        Sum("converted", alias_name="converted"))
    return pd.DataFrame({
        "stage": ["converted", "viewed"],
        "n_users": [int(agg["converted"]), int(agg["viewed"])],
    })


def cohort_retention_weekly(sf_dir: str, nparts: int = 64):
    """Cohort retention: users grouped by first-activity week, counted
    distinctly in each later week offset — the classic product-analytics
    retention triangle.

    Shape: one user-keyed COARSE shuffle. ``scatter`` reduces each batch
    to distinct (user, week) pairs first (bounded by users x weeks, far
    below raw events), stamps ``part = user_id % nparts``; the per-part
    task derives each user's cohort (min week) and distinct offsets with
    vectorized pandas groupbys. Users never span partitions, so the
    per-part distinct counts SUM exactly in the final tiny aggregate —
    COUNT(DISTINCT) without shipping user ids through a global shuffle."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    epoch = pd.Timestamp("1995-01-01")

    def scatter(df: pd.DataFrame) -> pd.DataFrame:
        wk = ((df["ts"] - epoch).dt.days // 7).astype("int64")
        out = pd.DataFrame({"user_id": df["user_id"], "wk": wk})
        out = out.drop_duplicates()
        out["part"] = (out["user_id"] % nparts).astype("int64")
        return out

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "wk"])
        cohort = df.groupby("user_id")["wk"].transform("min")
        d = pd.DataFrame({
            "cohort_week": cohort,
            "week_offset": df["wk"] - cohort,
            "user_id": df["user_id"],
        }).drop_duplicates()
        return (d.groupby(["cohort_week", "week_offset"], sort=False)
                 .size().reset_index(name="n_users"))

    part = (ds.map_batches(scatter, batch_format="pandas")
              .groupby("part").map_groups(per_part, batch_format="pandas"))
    return (part.groupby(["cohort_week", "week_offset"])
                .aggregate(Sum("n_users", alias_name="n_users")))


def events_value_trend(sf_dir: str):
    """Grouped closed-form linear regression: per event_type, the OLS
    slope of value (integer cents) against time (integer days since
    1995-01-01). The five sufficient statistics (n, Sx, Sy, Sxx, Sxy)
    are INTEGER partials summed inside map_batches — exact regardless of
    summation order, so the only float op is the final division, which
    both engines perform on identical big integers. One tiny groupby
    moves |event_type| x |blocks| rows however large events is."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])
    epoch = pd.Timestamp("1995-01-01")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = ((df["ts"] - epoch).dt.days).to_numpy(dtype="int64")
        y = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "event_type": df["event_type"], "n": 1, "sx": x, "sy": y,
            "sxx": x * x, "sxy": x * y,
        }).groupby("event_type", as_index=False).sum()
        return g

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("sxy", alias_name="sxy")))
    df = agg.to_pandas()
    out = []
    for r in df.itertuples(index=False):
        num = int(r.n) * int(r.sxy) - int(r.sx) * int(r.sy)
        den = int(r.n) * int(r.sxx) - int(r.sx) * int(r.sx)
        # float(big)/float(big) mirrors the oracle's HUGEINT->DOUBLE cast
        slope = float(num) / float(den) if den else None
        out.append((r.event_type, round(slope, 6), int(r.n)))
    res = pd.DataFrame(out, columns=["event_type", "slope_cents_per_day",
                                     "n"])
    return res.sort_values("event_type").reset_index(drop=True)


def doc_length_deciles(sf_dir: str):
    """Global decile bucketing by document length: exact global rank over
    (n_chars, doc_id) from the range-bucket prefix scan (COUNT instance
    of the ordered cumsum — no global sort), then the NTILE-free decile
    formula ``(rank-1)*10 // N`` computed identically in the oracle."""
    from ..stages.scan import ordered_cumsum

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars": df["text"].str.len().astype("int64"),
            "one": np.ones(len(df), dtype="int64"),
        })

    prepped = ds.map_batches(prep, batch_format="pandas")
    n_total = prepped.count()
    ranked = ordered_cumsum(prepped, order_col="n_chars",
                            tiebreak_col="doc_id", value_col="one")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        rank = df["running_total"].to_numpy()
        return pd.DataFrame({
            "doc_id": df["doc_id"], "n_chars": df["n_chars"],
            "decile": ((rank - 1) * 10 // n_total).astype("int64"),
        })

    return ranked.map_batches(project, batch_format="pandas")


def orders_rollup_status_priority(sf_dir: str):
    """GROUPING SETS / ROLLUP over (o_orderstatus, o_orderpriority): ONE
    distributed aggregate at the finest grain — the only pass over the
    data — then the coarser levels (per-status subtotal, grand total)
    re-aggregated from that tiny result. At 100 TB the re-aggregation
    input is |status| x |priority| rows regardless of input size, so
    ROLLUP costs exactly one shuffle, same as a plain GROUP BY."""
    ds = _t(sf_dir, "orders",
            ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")])
        return pa.table({
            "o_orderstatus": g["o_orderstatus"],
            "o_orderpriority": g["o_orderpriority"],
            "p_sum": g["o_totalprice_sum"], "p_n": g["o_totalprice_count"]})

    fine = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["o_orderstatus", "o_orderpriority"])
            .aggregate(Sum("p_sum", alias_name="s"),
                       Sum("p_n", alias_name="n"))
            .to_pandas())
    lvl1 = fine.groupby("o_orderstatus", as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    lvl1["o_orderpriority"] = None
    total = pd.DataFrame({
        "o_orderstatus": [None], "o_orderpriority": [None],
        "s": [fine["s"].sum()], "n": [fine["n"].sum()]})
    out = pd.concat([fine, lvl1, total], ignore_index=True)
    out["total_price"] = out["s"].round(2)
    out["n_orders"] = out["n"].astype("int64")
    return (out[["o_orderstatus", "o_orderpriority", "total_price",
                 "n_orders"]]
            .sort_values(["o_orderstatus", "o_orderpriority"],
                         na_position="last")
            .reset_index(drop=True))


def events_cube_type_hour(sf_dir: str):
    """GROUP BY CUBE (event_type, hour-of-day): all 2^2 grouping sets
    from ONE distributed aggregate at the finest grain (the rollup
    machinery generalized) — the re-aggregation input is
    |types| x 24 rows regardless of input size, so CUBE costs exactly
    one shuffle. Integer-cents sums keep the oracle hash-exact."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(
            np.int64)
        g = pd.DataFrame({
            "event_type": df["event_type"],
            "hour": df["ts"].dt.hour.astype(np.int64),
            "cents": cents,
        }).groupby(["event_type", "hour"], as_index=False).agg(
            s=("cents", "sum"), n=("cents", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    fine = (ds.map_batches(partial, batch_format="pandas")
            .groupby(["event_type", "hour"])
            .aggregate(Sum("s", alias_name="s"),
                       Sum("n", alias_name="n"))
            .to_pandas())
    by_type = fine.groupby("event_type", as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    by_type["hour"] = None
    by_hour = fine.groupby("hour", as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    by_hour["event_type"] = None
    total = pd.DataFrame({"event_type": [None], "hour": [None],
                          "s": [fine["s"].sum()], "n": [fine["n"].sum()]})
    out = pd.concat([fine, by_type, by_hour, total], ignore_index=True)
    out["sum_cents"] = out["s"].astype("int64")
    out["n_events"] = out["n"].astype("int64")
    # a nullable BIGINT comes back float64 from the SQL side; mirror it
    # so the driver's value hash sees identical representations
    out["hour"] = out["hour"].astype("float64")
    return out[["event_type", "hour", "sum_cents", "n_events"]] \
        .reset_index(drop=True)


def order_count_distribution(sf_dir: str):
    """Degree distribution (count-of-counts): how many customers placed
    exactly k orders. Two-level aggregation where the SECOND level's
    input is already aggregate-sized: per-batch partial counts ->
    exact per-customer totals (one shuffle over distinct customers) ->
    per-batch partials over the bounded degree domain -> a tiny final
    groupby. The classic shape for graph degree / fanout audits."""
    ds = _t(sf_dir, "orders", ["o_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).size()
        g.columns = ["o_custkey", "n"]
        g["n"] = g["n"].astype(np.int64)
        return g

    per_cust = (ds.map_batches(partial, batch_format="pandas")
                .groupby("o_custkey")
                .aggregate(Sum("n", alias_name="n_orders")))

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby("n_orders", as_index=False).size()
        h.columns = ["n_orders", "n_customers"]
        h["n_customers"] = h["n_customers"].astype(np.int64)
        return h

    return (per_cust.map_batches(hist, batch_format="pandas")
            .groupby("n_orders")
            .aggregate(Sum("n_customers", alias_name="n_customers")))


def promo_revenue_monthly(sf_dir: str):
    """TPC-H-Q14-shape conditional aggregate over a broadcast dimension
    join: part's (p_partkey -> is-promo) map is ``ray.put`` once and read
    inside every batch; each lineitem batch reduces to one row per ship
    month (promo + total discounted revenue), so the final groupby is
    over ~#months x #blocks rows however large lineitem is."""
    import pyarrow.parquet as _pq

    import ray

    part = _pq.read_table(os.path.join(sf_dir, "part.parquet"),
                          columns=["p_partkey", "p_type"])
    promo = {k: (t == "PROMO") for k, t in
             zip(part["p_partkey"].to_pylist(), part["p_type"].to_pylist())}
    ref = ray.put(promo)

    ds = _t(sf_dir, "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(ref)
        # per-row integer-cents conversion (floor(v*100+0.5), the repo's
        # exact-money convention) so sums are order-insensitive integers
        rev = (df["l_extendedprice"].to_numpy()
               * (1.0 - df["l_discount"].to_numpy()))
        cents = np.floor(rev * 100.0 + 0.5).astype(np.int64)
        is_promo = df["l_partkey"].map(lut).to_numpy(dtype=bool)
        return (pd.DataFrame({
            "ship_month": df["l_shipdate"].dt.strftime("%Y-%m"),
            "cents": cents,
            "promo_cents": np.where(is_promo, cents, 0),
        }).groupby("ship_month", as_index=False).sum())

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("ship_month")
           .aggregate(Sum("cents", alias_name="cents"),
                      Sum("promo_cents", alias_name="promo_cents")))
    df = agg.to_pandas()
    share = 100.0 * df["promo_cents"].to_numpy() / df["cents"].to_numpy()
    df["promo_share"] = np.floor(share * 10_000.0 + 0.5) / 10_000.0
    df["total_revenue"] = df["cents"].to_numpy() / 100.0
    return (df[["ship_month", "promo_share", "total_revenue"]]
            .sort_values("ship_month").reset_index(drop=True))


def normalize_text_documents(sf_dir: str):
    """Unicode canonicalization entirely in Arrow kernels — NFC normalize
    -> lowercase -> collapse whitespace runs -> trim spaces — the standard
    pre-tokenization cleanup pass of an LLM corpus pipeline. Output is
    fingerprinted (md5) so the oracle compares arbitrarily long cleaned
    texts by hash; both engines run the SAME RE2 ``\\s+`` semantics
    (pyarrow and DuckDB both bind RE2). NFC runs through unicodedata with
    an ASCII fast path — pyarrow 16's pc.utf8_normalize silently returns
    its input unchanged (verified on NFD bytes), so it cannot be used."""
    import hashlib
    import unicodedata

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def _nfc(col: "pa.ChunkedArray") -> pa.Array:
        ascii_mask = pc.string_is_ascii(col)
        if pc.all(ascii_mask).as_py():
            return col.combine_chunks() if hasattr(col, "combine_chunks") \
                else col
        norm_one = unicodedata.normalize
        return pa.array(
            [x if a else (x if x is None else norm_one("NFC", x))
             for x, a in zip(col.to_pylist(), ascii_mask.to_pylist())],
            type=pa.string())

    def norm(t: pa.Table) -> pa.Table:
        s = _nfc(t["text"])
        s = pc.utf8_lower(s)
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim(s, characters=" ")
        vals = s.to_pandas().to_numpy()
        md5 = hashlib.md5
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_md5": pa.array(np.fromiter(
                (md5(x.encode()).hexdigest() for x in vals),
                dtype="<U32", count=len(vals))),
            "n_chars_norm": pc.utf8_length(s).cast(pa.int64()),
        })

    return ds.map_batches(norm, batch_format="pyarrow",
                          zero_copy_batch=True)


def dq_expectations(sf_dir: str):
    """Data-quality expectation report (Great-Expectations/Deequ-shape):
    each rule is evaluated DISTRIBUTED and reduces to one count row —
    null / range / domain rules as per-batch filter-count partials,
    primary-key uniqueness via the count-distinct combiner, and
    referential integrity (orphan lineitems) via the shuffle ANTI join
    (both sides large; only keys ride the exchange). Zero-violation
    rules still emit their row — the report shape is the contract."""
    from ..stages.join import shuffle_hash_join

    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_totalprice"])
    events = _t(sf_dir, "events", ["value"])

    def order_partials(t: pa.Table) -> pa.Table:
        return pa.table({
            "rule": pa.array(["orders_null_custkey",
                              "orders_nonpositive_total",
                              "orders_total_above_490k"]),
            "n": pa.array([
                t["o_custkey"].null_count,
                pc.sum(pc.less_equal(t["o_totalprice"], 0.0)).as_py() or 0,
                pc.sum(pc.greater(t["o_totalprice"], 490_000.0)).as_py() or 0,
            ], type=pa.int64()),
        })

    def event_partials(t: pa.Table) -> pa.Table:
        return pa.table({
            "rule": pa.array(["events_negative_value"]),
            "n": pa.array(
                [pc.sum(pc.less(t["value"], 0.0)).as_py() or 0],
                type=pa.int64()),
        })

    filt = (orders.map_batches(order_partials, batch_format="pyarrow",
                               zero_copy_batch=True)
            .union(events.map_batches(event_partials,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True))
            .groupby("rule").aggregate(Sum("n", alias_name="n_violations"))
            .to_pandas())

    # PK uniqueness: distinct-count combiner (batch-local dedup, then a
    # keyed groupby whose group count is the distinct count)
    keys = orders.select_columns(["o_orderkey"])
    n_rows = keys.count()
    n_distinct = (keys.map_batches(lambda df: df.drop_duplicates(),
                                   batch_format="pandas")
                  .groupby("o_orderkey").aggregate(Count(alias_name="_c"))
                  .count())
    # referential integrity: lineitem.l_orderkey ⊆ orders.o_orderkey
    li = (_t(sf_dir, "lineitem", ["l_orderkey"])
          .map_batches(lambda t: t.rename_columns(["o_orderkey"]),
                       batch_format="pyarrow"))
    orphans = shuffle_hash_join(li, keys, on="o_orderkey", how="anti",
                                nparts=16).count()

    extra = pd.DataFrame({
        "rule": ["orders_duplicate_orderkey", "lineitem_orphan_orderkey"],
        "n_violations": [n_rows - n_distinct, orphans]})
    out = pd.concat([filt, extra], ignore_index=True)
    out["n_violations"] = out["n_violations"].astype("int64")
    return out.sort_values("rule").reset_index(drop=True)


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

#: shared CTE chain computing the exact n-gram-Jaccard near-dup pairs in
#: SQL — used verbatim by dedup_ngram_documents and as the edge source of
#: the dedup_cluster_documents recursive-closure oracle
_NGRAM_PAIRS_CTE = """t AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents
), g AS (
  SELECT doc_id, lang,
         list_distinct(CASE
           WHEN len(toks) = 0 THEN []
           WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
           ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN generate_series(1, len(toks)-2)]
         END) AS grams
  FROM t
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round_even(CASE WHEN len(a.grams)+len(b.grams) = 0 THEN 1.0
               ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / (len(a.grams)+len(b.grams)-len(list_intersect(a.grams,b.grams)))
               END, 6) AS jaccard
  FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
)"""

ANALYTICS_ORACLE_SQL = {
    "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_quantity) / count(*), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
    "events_latest_per_user": """
SELECT user_id, event_id, ts, event_type, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
""",
    "events_tumbling_window": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       round(sum(value), 2) AS total_value, count(*) AS n_events
FROM events GROUP BY 1, 2
""",
    "events_session_windows": """
WITH gaps AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 2 HOUR THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM sess GROUP BY user_id, sid
""",
    "top_users_by_value": """
SELECT user_id, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 20
""",
    # ties at identical (user, ts) on the view side resolve to max
    # event_id (max_by), matching the Ray route's deterministic dedup;
    # the join is strict (view strictly earlier than the purchase)
    "purchases_asof_last_view": """
WITH v AS (
  SELECT user_id, ts, max_by(value, event_id) AS vval
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
p AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, round(p.value, 2) AS value,
       v.ts AS view_ts, round(v.vval, 2) AS view_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts > v.ts
""",
    # every event lies inside both of its hop windows by construction
    # (ws = floor(ts) and floor(ts)-1h; window size 2h, hop 1h)
    "events_hopping_window": """
SELECT ws AS window_start, event_type,
       round(sum(value), 2) AS total_value, count(*) AS n_events
FROM events, LATERAL (VALUES (date_trunc('hour', ts)),
                             (date_trunc('hour', ts) - INTERVAL 1 HOUR))
     AS w(ws)
GROUP BY ws, event_type
""",
    "orders_with_events_in_week": """
SELECT o.o_orderkey,
       count(e.ts) AS n_events,
       round(coalesce(sum(e.value), 0), 2) AS sum_value
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)
 AND e.ts <  CAST(o.o_orderdate AS TIMESTAMP) + INTERVAL 7 DAY
GROUP BY o.o_orderkey
""",
    "top_docs_per_lang": """
SELECT doc_id, lang, n_chars, rank FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents
) WHERE rank <= 5
""",
    "filter_orders_high": """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_totalprice > 200000.0 AND o_orderstatus = 'O'
""",
    "revenue_by_segment": """
SELECT c.c_mktsegment, round(sum(o.o_totalprice), 2) AS total_revenue,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    "dedup_exact_documents": """
SELECT md5(text) AS text_md5, min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
""",
    "doc_token_stats": """
SELECT doc_id, length(text) AS n_chars,
       len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens
FROM documents
""",
    "doc_fingerprints": """
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
""",
    "docs_per_lang_source": """
SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source
""",
    "ann_topk_cosine": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(list_cosine_similarity(embedding, (SELECT qv FROM q)), 5) AS score
FROM embeddings ORDER BY list_cosine_similarity(embedding, (SELECT qv FROM q)) DESC,
                         vec_id LIMIT 10
""",
    # exact n-gram Jaccard recomputed in SQL over the raw gram strings
    # (the Ray side hashes grams to 64 bits first — intersection counts are
    # identical barring negligible 64-bit collisions)
    "dedup_ngram_documents": f"""
WITH {_NGRAM_PAIRS_CTE}
SELECT * FROM pairs WHERE jaccard >= 0.5
""",
    # transitive closure of the same near-dup pairs: every doc in a pair
    # labelled with its component's min doc_id (the Ray side runs the
    # distributed large-star/small-star algorithm; components here are
    # tiny so a recursive CTE reaches the same fixed point)
    "dedup_cluster_documents": f"""
WITH RECURSIVE {_NGRAM_PAIRS_CTE},
qp AS (SELECT id_a, id_b FROM pairs WHERE jaccard >= 0.5),
edges AS (
  SELECT id_a AS u, id_b AS v FROM qp
  UNION
  SELECT id_b, id_a FROM qp
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, least(u, min(v)) AS cluster_id,
       (least(u, min(v)) = u) AS keep
FROM reach GROUP BY u ORDER BY doc_id
""",
    # md5-derived stub decode recomputed in SQL (stages/multimodal.py)
    "multimodal_features": """
SELECT doc_id AS media_id,
       (('0x' || substr(md5(text || 'w'), 1, 8))::BIGINT % 1920) + 1 AS width,
       (('0x' || substr(md5(text || 'h'), 1, 8))::BIGINT % 1080) + 1 AS height,
       3 AS channels,
"""
    + ",\n".join(
        f"       round(((('0x' || substr(md5(text || '{j}'), 1, 8))::BIGINT "
        f"% 10000) / 10000.0), 4) AS f{j}"
        for j in range(8)
    )
    + "\nFROM documents\n",
}

def _stopword_alt(lang: str) -> str:
    from ..functions.text import STOPWORDS

    return "|".join(sorted(STOPWORDS[lang]))


# lang-id heuristic recomputed in SQL: per-language stopword hit rates via
# alternation regexes, argmax with the same first-max-wins tie order, han
# override, 0.05 threshold (functions/text.py lang_id)
ANALYTICS_ORACLE_SQL["lang_id_documents"] = r"""
WITH b AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(lower(text), '[a-zA-Z0-9_]+')) AS n_tokens,
         len(regexp_extract_all(text, '[一-鿿]')) AS han,
         len(regexp_extract_all(lower(text), '\b(?:@EN@)\b')) AS c_en,
         len(regexp_extract_all(lower(text), '\b(?:@DE@)\b')) AS c_de,
         len(regexp_extract_all(lower(text), '\b(?:@ES@)\b')) AS c_es,
         len(regexp_extract_all(lower(text), '\b(?:@FR@)\b')) AS c_fr
  FROM documents
), r AS (
  SELECT doc_id, lang, han, n_tokens,
         CAST(c_en AS DOUBLE)/greatest(1,n_tokens) AS r_en,
         CAST(c_de AS DOUBLE)/greatest(1,n_tokens) AS r_de,
         CAST(c_es AS DOUBLE)/greatest(1,n_tokens) AS r_es,
         CAST(c_fr AS DOUBLE)/greatest(1,n_tokens) AS r_fr
  FROM b
)
SELECT doc_id, lang,
       CASE WHEN han > 0 AND han >= greatest(1, n_tokens) THEN 'zh'
            WHEN r_en >= r_de AND r_en >= r_es AND r_en >= r_fr AND r_en >= 0.05 THEN 'en'
            WHEN r_de >= r_es AND r_de >= r_fr AND r_de >= 0.05 THEN 'de'
            WHEN r_es >= r_fr AND r_es >= 0.05 THEN 'es'
            WHEN r_fr >= 0.05 THEN 'fr'
            ELSE 'und' END AS lang_pred,
       CASE WHEN lang_pred = lang THEN 1 ELSE 0 END AS "match"
FROM r
""".replace("@EN@", _stopword_alt("en")).replace("@DE@", _stopword_alt("de")) \
   .replace("@ES@", _stopword_alt("es")).replace("@FR@", _stopword_alt("fr"))

# quality features recomputed in SQL; rounding is the LITERAL half-up
# expression floor(x*1e4+0.5)/1e4 on both sides (np.round / round_even
# make different representability-edge decisions, e.g. at 0.65975)
ANALYTICS_ORACLE_SQL["quality_scores_documents"] = r"""
WITH b AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
         len(regexp_extract_all(text, '[^\p{L}\p{N}_\s]')) AS n_punct,
         len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
         len(regexp_extract_all(lower(text), '\b(?:@EN@)\b')) AS n_stop,
         len(regexp_extract_all(text, '[A-Za-z0-9_]')) AS word_chars
  FROM documents
), c AS (
  SELECT doc_id, n_chars, n_tokens,
         CASE WHEN n_tokens > 0 THEN CAST(word_chars AS DOUBLE)/greatest(1, n_tokens) ELSE 0.0 END AS mwl,
         CAST(n_punct AS DOUBLE)/greatest(1, n_chars) AS pr,
         CAST(n_stop AS DOUBLE)/greatest(1, n_tokens) AS sr,
         CAST(n_alpha AS DOUBLE)/greatest(1, n_chars) AS ar
  FROM b
)
SELECT doc_id, n_chars, n_tokens,
       floor(mwl*10000.0 + 0.5)/10000.0 AS mean_word_len,
       floor(pr*10000.0 + 0.5)/10000.0 AS punct_ratio,
       floor(sr*10000.0 + 0.5)/10000.0 AS stop_ratio,
       floor(ar*10000.0 + 0.5)/10000.0 AS alpha_ratio,
       floor((least(n_tokens/50.0, 1.0)*0.3
             + least(greatest((mwl-2)/6.0, 0.0), 1.0)*0.2
             + (1 - least(pr*4, 1.0))*0.2
             + least(ar*1.2, 1.0)*0.2
             + least(sr*5, 1.0)*0.1)*10000.0 + 0.5)/10000.0 AS quality_score
FROM c
""".replace("@EN@", _stopword_alt("en"))

# same scoring CTE as quality_scores_documents, argmax'd per md5 group in
# integer ten-thousandths (matches the Ray side's score_q exactly)
ANALYTICS_ORACLE_SQL["dedup_exact_keep_best"] = r"""
WITH b AS (
  SELECT doc_id, md5(text) AS text_md5,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
         len(regexp_extract_all(text, '[^\p{L}\p{N}_\s]')) AS n_punct,
         len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
         len(regexp_extract_all(lower(text), '\b(?:@EN@)\b')) AS n_stop,
         len(regexp_extract_all(text, '[A-Za-z0-9_]')) AS word_chars
  FROM documents
), c AS (
  SELECT doc_id, text_md5, n_tokens,
         CASE WHEN n_tokens > 0 THEN CAST(word_chars AS DOUBLE)/greatest(1, n_tokens) ELSE 0.0 END AS mwl,
         CAST(n_punct AS DOUBLE)/greatest(1, n_chars) AS pr,
         CAST(n_stop AS DOUBLE)/greatest(1, n_tokens) AS sr,
         CAST(n_alpha AS DOUBLE)/greatest(1, n_chars) AS ar
  FROM b
), scored AS (
  SELECT doc_id, text_md5,
         CAST(floor((least(n_tokens/50.0, 1.0)*0.3
               + least(greatest((mwl-2)/6.0, 0.0), 1.0)*0.2
               + (1 - least(pr*4, 1.0))*0.2
               + least(ar*1.2, 1.0)*0.2
               + least(sr*5, 1.0)*0.1)*10000.0 + 0.5) AS BIGINT) AS score_q
  FROM c
)
SELECT text_md5, doc_id, score_q, n_dups FROM (
  SELECT text_md5, doc_id, score_q,
         count(*) OVER (PARTITION BY text_md5) AS n_dups,
         row_number() OVER (PARTITION BY text_md5
                            ORDER BY score_q DESC, doc_id) AS rn
  FROM scored) WHERE rn = 1
""".replace("@EN@", _stopword_alt("en"))


def _rate_case() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES.items()
    )
    return f"CASE lang {whens} ELSE {SAMPLE_DEFAULT_RATE} END"


# md5_number_lower == little-endian uint64 of md5-digest bytes 8..16 —
# bit-identical to stages/sample.py:md5_u64 (verified vs duckdb 1.0)
ANALYTICS_ORACLE_SQL["corpus_prep_pipeline"] = """
WITH q AS ({Q}),
j AS (
  SELECT d.doc_id, d.lang, q.n_chars, q.quality_score, md5(d.text) AS text_md5
  FROM documents d JOIN q USING (doc_id)
  WHERE q.quality_score >= 0.5
),
s AS (
  SELECT * FROM j
  QUALIFY row_number() OVER (PARTITION BY text_md5 ORDER BY doc_id) = 1
)
SELECT doc_id, lang, n_chars, quality_score FROM s
WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 < 500
""".replace("{Q}", ANALYTICS_ORACLE_SQL["quality_scores_documents"])

ANALYTICS_ORACLE_SQL["sample_documents_deterministic"] = f"""
SELECT doc_id, lang, source FROM documents
WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 < {_rate_case()}
"""

ANALYTICS_ORACLE_SQL["events_pivot_type_counts"] = r"""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""

ANALYTICS_ORACLE_SQL["events_unpivot_type_counts"] = (
    "WITH w AS (" + ANALYTICS_ORACLE_SQL["events_pivot_type_counts"] + ")\n"
    + "\nUNION ALL\n".join(
        f"SELECT user_id, '{t}' AS event_type, n_{t} AS n FROM w"
        for t in EVENT_TYPES)
)

ANALYTICS_ORACLE_SQL["filter_docs_above_median_length"] = r"""
SELECT doc_id, lang, n_chars FROM documents
JOIN (SELECT lang,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS med
      FROM documents GROUP BY lang) USING (lang)
WHERE n_chars >= med
"""

ANALYTICS_ORACLE_SQL["split_documents_train_val_test"] = r"""
SELECT doc_id, lang,
       CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 5
            THEN 'test'
            WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 10
            THEN 'val'
            ELSE 'train' END AS split
FROM documents
"""

ANALYTICS_ORACLE_SQL["sample_fixed_per_lang"] = r"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang, row_number() OVER (
    PARTITION BY lang
    ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents) WHERE rn <= 30
"""

ANALYTICS_ORACLE_SQL["sample_documents_weighted"] = r"""
SELECT doc_id, lang, length(text) AS n_chars FROM documents
WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 < length(text)
"""

# temperature mixing: weight = floor(sqrt(n)*2^20) — IEEE sqrt is
# correctly rounded and 2^20 is a power of two, so the floor lands
# identically in numpy and DuckDB; quotas are then pure integer math
ANALYTICS_ORACLE_SQL["sample_temperature_by_source"] = """
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
  GROUP BY source),
w AS (
  SELECT source,
         CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576) AS BIGINT) AS wgt
  FROM c),
t AS (SELECT sum(wgt) AS tw FROM w),
q AS (SELECT source, CAST((200 * wgt) // t.tw AS BIGINT) AS quota
      FROM w, t),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents)
SELECT r.doc_id, r.source FROM r JOIN q USING (source)
WHERE rn <= q.quota
"""


def _pii_sql() -> str:
    from ..functions.text import EMAIL_RE, PHONE_RE

    no_email = f"regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g')"
    return f"""
SELECT doc_id,
       regexp_replace({no_email}, '{PHONE_RE}', '<PHONE>', 'g') AS redacted,
       len(regexp_extract_all(text, '{EMAIL_RE}'))
       + len(regexp_extract_all({no_email}, '{PHONE_RE}')) AS n_redactions
FROM documents
"""


ANALYTICS_ORACLE_SQL["redact_pii_documents"] = _pii_sql()

ANALYTICS_ORACLE_SQL["mix_token_budget_documents"] = f"""
WITH t AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
  FROM t
)
SELECT doc_id, lang, n_tokens FROM c WHERE cum <= {MIX_TOKEN_BUDGET}
"""


ANALYTICS_ORACLE_SQL["customers_without_events"] = r"""
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
"""

ANALYTICS_ORACLE_SQL["customer_order_stats_right"] = r"""
SELECT c_custkey, c_name,
       COUNT(o_custkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(floor(o_totalprice*100.0 + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS total_cents
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
"""

ANALYTICS_ORACLE_SQL["q3_shipping_priority"] = f"""
SELECT o_orderkey, o_orderdate,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

ANALYTICS_ORACLE_SQL["doc_length_percentiles"] = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       percentile_disc(0.5)  WITHIN GROUP (ORDER BY n_chars) AS p50,
       percentile_disc(0.9)  WITHIN GROUP (ORDER BY n_chars) AS p90,
       percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars) AS p99
FROM documents GROUP BY lang ORDER BY lang
"""

ANALYTICS_ORACLE_SQL["distinct_users_per_type"] = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""

ANALYTICS_ORACLE_SQL["q5_local_supplier_volume"] = f"""
SELECT n_name, round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_START}'
  AND o_orderdate <  TIMESTAMP '{Q5_END}'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""

# 3-gram overlap vs the doc_id%97==0 eval slice; tokenization identical to
# functions/text.py (_flat_lower_tokens): lower(text) word tokens
ANALYTICS_ORACLE_SQL["decontaminate_documents"] = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
  FROM documents
), grams AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
  FROM toks, unnest(generate_series(1, len(t)-2)) AS u(i)
  WHERE len(t) >= 3
), eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
)
SELECT d.doc_id,
       CASE WHEN EXISTS (SELECT 1 FROM grams g JOIN eval_grams e ON g.g = e.g
                         WHERE g.doc_id = d.doc_id) THEN 1 ELSE 0 END
         AS contaminated
FROM documents d WHERE d.doc_id % 97 <> 0
"""

# embedding-space decontamination: max cosine vs the vec_id%20==0 eval
# slice under τ=0.35 (fixture geometry; see the query docstring for the
# boundary-margin argument)
ANALYTICS_ORACLE_SQL["decontaminate_semantic_embeddings"] = r"""
WITH ev AS (
  SELECT embedding FROM embeddings WHERE vec_id % 20 = 0
)
SELECT c.vec_id
FROM embeddings c
WHERE c.vec_id % 20 <> 0
  AND NOT EXISTS (
    SELECT 1 FROM ev e
    WHERE list_cosine_similarity(c.embedding, e.embedding) >= 0.35)
ORDER BY c.vec_id
"""

ANALYTICS_ORACLE_SQL["vocab_document_frequency"] = r"""
WITH flat AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), d AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         CAST(count(*) AS BIGINT) AS tf
  FROM flat GROUP BY tok
)
SELECT tok, df, tf FROM d ORDER BY df DESC, tok LIMIT 100
"""

ANALYTICS_ORACLE_SQL["tfidf_top_terms_documents"] = r"""
WITH flat AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), tfd AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM flat GROUP BY 1, 2
), dfd AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM flat GROUP BY 1
), v AS (
  SELECT tok, df FROM dfd
  QUALIFY row_number() OVER (ORDER BY df DESC, tok) <= 50000
), scored AS (
  SELECT tfd.doc_id, tfd.tok, tf, v.df,
         CAST(floor(tf * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents)
                            / v.df) * 1e6 + 0.5) AS BIGINT) AS score_micros
  FROM tfd JOIN v USING (tok)
)
SELECT doc_id, tok, tf, df, score_micros FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY score_micros DESC, tok) <= 3
"""

# global window: exact integer-cents running sum over (ts, event_id)
ANALYTICS_ORACLE_SQL["events_running_revenue"] = r"""
SELECT event_id,
       CAST(SUM(CAST(floor(value*100.0 + 0.5) AS BIGINT))
         OVER (ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS running_total
FROM events
"""

ANALYTICS_ORACLE_SQL["events_running_value_per_user"] = r"""
SELECT event_id,
       CAST(SUM(CAST(floor(value*100.0 + 0.5) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS running_user_total
FROM events
"""

# watermark = inclusive running max of ts over arrival (event_id) order;
# late iff watermark - lateness passed the event's tumbling-window end
ANALYTICS_ORACLE_SQL["events_late_data_windows"] = r"""
WITH a AS (
  SELECT event_id, ts,
         event_id + md5_number_lower(CAST(event_id AS VARCHAR)) % 20
           AS arrival
  FROM events
), w AS (
  SELECT event_id, ts,
         MAX(ts) OVER (ORDER BY arrival, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS wm,
         time_bucket(INTERVAL 1 HOUR, ts) AS window_start
  FROM a
)
SELECT window_start,
       CASE WHEN wm - INTERVAL 30 MINUTE
                 > window_start + INTERVAL 1 HOUR
            THEN 1 ELSE 0 END AS late,
       CAST(count(*) AS BIGINT) AS n
FROM w GROUP BY window_start, late
"""

ANALYTICS_ORACLE_SQL["events_row_number"] = r"""
SELECT event_id,
       CAST(row_number() OVER (ORDER BY ts, event_id) - 1 AS BIGINT)
         AS rn
FROM events
"""

ANALYTICS_ORACLE_SQL["events_lag_revenue"] = r"""
SELECT event_id,
       CAST(COALESCE(LAG(CAST(floor(value*100.0 + 0.5) AS BIGINT))
         OVER (ORDER BY ts, event_id), -1) AS BIGINT) AS lag_value
FROM events
"""

ANALYTICS_ORACLE_SQL["export_documents_shards"] = r"""
SELECT CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 16 AS INTEGER)
         AS shard,
       CAST(count(*) AS BIGINT) AS n_rows
FROM documents GROUP BY shard ORDER BY shard
"""

ANALYTICS_ORACLE_SQL["export_documents_jsonl"] = \
    ANALYTICS_ORACLE_SQL["export_documents_shards"]

# recomputes export_sorted's deterministic bucket rule (width =
# span // nbuckets + 1, bucket capped at nbuckets-1, integer math on
# doc_id extrema) and the per-bucket count/min/max the manifest records
ANALYTICS_ORACLE_SQL["export_documents_sorted"] = r"""
WITH ext AS (
  SELECT min(doc_id) AS lo,
         (max(doc_id) - min(doc_id) + 1) // 64 + 1 AS width
  FROM documents
),
b AS (
  SELECT LEAST(CAST((doc_id - lo) // width AS INTEGER), 63) AS bucket,
         doc_id
  FROM documents, ext
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id
FROM b GROUP BY bucket ORDER BY bucket
"""

ANALYTICS_ORACLE_SQL["events_moving_revenue"] = r"""
SELECT event_id,
       CAST(SUM(CAST(floor(value*100.0 + 0.5) AS BIGINT))
         OVER (ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
         AS BIGINT) AS moving_sum
FROM events
"""

ANALYTICS_ORACLE_SQL["events_trailing_hour_revenue"] = r"""
SELECT event_id,
       CAST(SUM(CAST(floor(value*100.0 + 0.5) AS BIGINT))
         OVER (ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS BIGINT) AS range_sum
FROM events
"""

# MG heavy hitters: exact at this vocabulary (< capacity, so max_err 0)
ANALYTICS_ORACLE_SQL["heavy_hitters_tokens"] = r"""
WITH flat AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), d AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM flat GROUP BY tok
)
SELECT tok, cnt, CAST(0 AS BIGINT) AS max_err
FROM d ORDER BY cnt DESC, tok LIMIT 10
"""

# rank = seeded deterministic corpus shuffle; md5_number_lower matches
# stages/sample.py:md5_u64 bit-for-bit (verified vs duckdb 1.0)
ANALYTICS_ORACLE_SQL["shuffle_rank_documents"] = r"""
SELECT doc_id,
       CAST(row_number() OVER (
            ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id) - 1
         AS BIGINT) AS "rank"
FROM documents
"""

# C4-style passage dedup: first (doc_id, pos) occurrence of each distinct
# 10-token passage survives; docs rebuilt from surviving passages in order
ANALYTICS_ORACLE_SQL["dedup_passages_documents"] = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents
), chunks AS (
  SELECT doc_id, c AS pos,
         array_to_string(toks[c*10+1:c*10+10], ' ') AS chunk
  FROM t, unnest(generate_series(0, CAST(ceil(len(toks)/10.0) AS BIGINT) - 1))
       AS u(c)
  WHERE len(toks) >= 1
), ranked AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
  FROM chunks
), kept AS (
  SELECT doc_id,
         string_agg(chunk, ' ' ORDER BY pos) AS dedup_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM ranked WHERE rn = 1 GROUP BY doc_id
), totals AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
  FROM chunks GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(k.dedup_text, '') AS dedup_text,
       COALESCE(t2.n_chunks, 0) AS n_chunks,
       COALESCE(k.n_kept, 0) AS n_kept
FROM documents d
LEFT JOIN kept k USING (doc_id)
LEFT JOIN totals t2 USING (doc_id)
"""

# Gopher-style repetition features; integer counts only (hash-stable)
ANALYTICS_ORACLE_SQL["repetition_stats_documents"] = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents
), flat AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
), per_tok AS (
  SELECT doc_id, tok, count(*) AS c FROM flat GROUP BY doc_id, tok
), tok_stats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(max(c) AS BIGINT) AS top_token_n
  FROM per_tok GROUP BY doc_id
), big AS (
  SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS bg
  FROM t, unnest(generate_series(1, len(toks)-1)) AS u(i)
  WHERE len(toks) >= 2
), per_big AS (
  SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg
), big_stats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         CAST(sum(c) - count(*) AS BIGINT) AS dup_bigram_n
  FROM per_big GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.top_token_n, 0) AS top_token_n,
       COALESCE(b.n_bigrams, 0) AS n_bigrams,
       COALESCE(b.dup_bigram_n, 0) AS dup_bigram_n,
       CASE WHEN 5*COALESCE(s.top_token_n,0) > COALESCE(s.n_tokens,0)
              OR 4*COALESCE(b.dup_bigram_n,0) > COALESCE(b.n_bigrams,0)
            THEN 1 ELSE 0 END AS flagged
FROM documents d
LEFT JOIN tok_stats s USING (doc_id)
LEFT JOIN big_stats b USING (doc_id)
"""


# fused one-pass report == the join of the three single-feature oracles
ANALYTICS_ORACLE_SQL["corpus_report_documents"] = f"""
WITH l AS ({ANALYTICS_ORACLE_SQL["lang_id_documents"]}),
     q AS ({ANALYTICS_ORACLE_SQL["quality_scores_documents"]}),
     r AS ({ANALYTICS_ORACLE_SQL["repetition_stats_documents"]})
SELECT l.doc_id, l.lang, l.lang_pred, q.quality_score,
       r.n_tokens, r.top_token_n, r.n_bigrams, r.dup_bigram_n, r.flagged
FROM l JOIN q USING (doc_id) JOIN r USING (doc_id)
"""


ANALYTICS_ORACLE_SQL["funnel_view_purchase"] = r"""
WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
c AS (
  SELECT DISTINCT e1.user_id
  FROM events e1 JOIN events e2
    ON e1.user_id = e2.user_id
   AND e1.event_type = 'view' AND e2.event_type = 'purchase'
   AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
)
SELECT 'viewed' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT 'converted', CAST(count(*) AS BIGINT) FROM c
"""

ANALYTICS_ORACLE_SQL["search_documents_terms"] = r"""
WITH flat AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), m AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM flat WHERE tok IN ('query', 'window') GROUP BY 1, 2
), a AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score,
         count(DISTINCT tok) AS nt
  FROM m GROUP BY 1
)
SELECT doc_id, score FROM a WHERE nt = 2
"""

ANALYTICS_ORACLE_SQL["q18_large_volume_customers"] = r"""
WITH big AS (
  SELECT l_orderkey AS o_orderkey,
         round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
)
SELECT c.c_custkey, c.c_name, b.o_orderkey, o.o_orderdate,
       o.o_totalprice, b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""

ANALYTICS_ORACLE_SQL["q10_returned_items"] = r"""
WITH rev AS (
  SELECT o.o_custkey,
         round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2)
           AS revenue
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate <  TIMESTAMP '1995-07-01'
    AND l.l_returnflag = 'R'
  GROUP BY 1
), top AS (
  SELECT * FROM rev ORDER BY revenue DESC, o_custkey LIMIT 20
)
SELECT c.c_custkey, c.c_name, n.n_name, t.revenue
FROM top t
JOIN customer c ON c.c_custkey = t.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
"""

ANALYTICS_ORACLE_SQL["order_count_distribution"] = r"""
WITH c AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM c GROUP BY 1
"""

ANALYTICS_ORACLE_SQL["events_cube_type_hour"] = r"""
SELECT event_type,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY CUBE (event_type, hour(ts))
"""

ANALYTICS_ORACLE_SQL["events_debounce_per_user"] = r"""
WITH l AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT event_id, user_id, ts FROM l
WHERE prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
"""

ANALYTICS_ORACLE_SQL["doc_length_trimmed_mean"] = r"""
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY lang) AS cnt
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_chars) AS BIGINT) AS sum_kept,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS trimmed_mean
FROM r
WHERE rn > cnt * 10 // 100 AND rn <= cnt - cnt * 10 // 100
GROUP BY lang
"""

ANALYTICS_ORACLE_SQL["lm_surprise_documents"] = r"""
WITH flat AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), total AS (SELECT CAST(count(*) AS BIGINT) AS t FROM flat),
counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM flat GROUP BY tok
), vocab AS (
  SELECT tok, c FROM counts
  QUALIFY row_number() OVER (ORDER BY df DESC, tok) <= 1000
), unk AS (
  SELECT total.t - coalesce(sum(vocab.c), 0) AS cu FROM vocab, total
  GROUP BY total.t
), stab AS (
  SELECT tok,
         CAST(floor(ln(CAST(c AS DOUBLE) / total.t) * 1e6 + 0.5)
              AS BIGINT) AS s
  FROM vocab, total
), tfd AS (
  SELECT f.doc_id, f.tok, CAST(count(*) AS BIGINT) AS tf
  FROM flat f GROUP BY 1, 2
), sunk AS (
  -- ln is guarded: with full coverage (cu = 0) the <unk> score is never
  -- used, but SQL evaluates eagerly — mirror the engine's guard
  SELECT CASE WHEN unk.cu > 0
              THEN CAST(floor(ln(CAST(unk.cu AS DOUBLE) / total.t)
                              * 1e6 + 0.5) AS BIGINT)
              ELSE 0 END AS s
  FROM unk, total
), scored AS (
  SELECT tfd.doc_id,
         tfd.tf * coalesce(stab.s, sunk.s) AS part
  FROM tfd LEFT JOIN stab USING (tok), sunk
)
SELECT d.doc_id,
       CAST(coalesce(lens.n, 0) AS BIGINT) AS n_tokens,
       CAST(-coalesce(s.total_part, 0) AS BIGINT) AS surprise_sum_micros
FROM documents d
LEFT JOIN (SELECT doc_id, sum(part) AS total_part
           FROM scored GROUP BY 1) s USING (doc_id)
LEFT JOIN (SELECT doc_id, count(*) AS n FROM flat GROUP BY 1) lens
  USING (doc_id)
"""

ANALYTICS_ORACLE_SQL["token_pmi_pairs"] = r"""
WITH flat AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
    FROM documents)
), vocab AS (
  SELECT tok FROM (
    SELECT tok, count(DISTINCT doc_id) AS df FROM flat GROUP BY tok)
  QUALIFY row_number() OVER (ORDER BY df DESC, tok) <= 50
), fv AS (
  SELECT f.doc_id, f.tok FROM flat f JOIN vocab USING (tok)
), singles AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM fv GROUP BY tok
), pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(count(*) AS BIGINT) AS n_co
  FROM fv a JOIN fv b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2
), nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
SELECT p.tok_a, p.tok_b, p.n_co,
       CAST(floor(ln(CAST(nn.nd AS DOUBLE) * p.n_co / (sa.c * sb.c))
                  * 1e6 + 0.5) AS BIGINT) AS pmi_micros
FROM pairs p
JOIN singles sa ON p.tok_a = sa.tok
JOIN singles sb ON p.tok_b = sb.tok, nn
"""

ANALYTICS_ORACLE_SQL["events_value_outliers"] = r"""
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
), st AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(v) AS HUGEINT) AS s,
         sum(CAST(v AS HUGEINT) * v) AS svv
  FROM c GROUP BY 1
)
SELECT c.event_type,
       CAST(sum(CASE WHEN (st.n * c.v - st.s) * (st.n * c.v - st.s)
                          > 9 * (st.n * st.svv - st.s * st.s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(count(*) AS BIGINT) AS n_events
FROM c JOIN st USING (event_type) GROUP BY 1
"""

ANALYTICS_ORACLE_SQL["search_documents_bm25"] = r"""
WITH flat AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), post AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM flat GROUP BY 1, 2
), dls AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM flat GROUP BY 1
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM flat),
m AS (
  SELECT p.doc_id, p.tok, p.tf, d.dl
  FROM post p JOIN dls d USING (doc_id)
  WHERE p.tok IN ('query', 'window')
), dfs AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM m GROUP BY 1
), scored AS (
  SELECT m.doc_id,
         CAST(floor(
           ln(1.0 + (n.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * m.tf * (1.2 + 1.0)
           / (m.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dl
                / (CAST(tot.total_tokens AS DOUBLE) / n.n_docs)))
           * 1e6 + 0.5) AS BIGINT) AS s
  FROM m JOIN dfs USING (tok), n, tot
)
SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_micros
FROM scored GROUP BY doc_id HAVING count(*) = 2
"""

ANALYTICS_ORACLE_SQL["search_documents_hybrid"] = r"""
WITH flat AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), post AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM flat GROUP BY 1, 2
), dls AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM flat GROUP BY 1
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM flat),
m AS (
  SELECT p.doc_id, p.tok, p.tf, d.dl
  FROM post p JOIN dls d USING (doc_id)
  WHERE p.tok IN ('query', 'window')
), dfs AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM m GROUP BY 1
), scored AS (
  SELECT m.doc_id,
         CAST(floor(
           ln(1.0 + (n.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * m.tf * (1.2 + 1.0)
           / (m.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dl
                / (CAST(tot.total_tokens AS DOUBLE) / n.n_docs)))
           * 1e6 + 0.5) AS BIGINT) AS s
  FROM m JOIN dfs USING (tok), n, tot
), bm AS (
  SELECT doc_id, CAST(sum(s) AS BIGINT) AS sc
  FROM scored GROUP BY doc_id HAVING count(*) = 2
), bmr AS (
  SELECT doc_id, row_number() OVER (ORDER BY sc DESC, doc_id) AS r
  FROM bm QUALIFY r <= 50
), vec AS (
  SELECT vec_id AS doc_id,
         CAST(floor(list_cosine_similarity(
             CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
              WHERE vec_id = 0)) * 1e6 + 0.5) AS BIGINT) AS sc
  FROM embeddings
), vecr AS (
  SELECT doc_id, row_number() OVER (ORDER BY sc DESC, doc_id) AS r
  FROM vec QUALIFY r <= 50
), fused AS (
  SELECT doc_id, CAST(sum(1000000000 // (60 + r)) AS BIGINT) AS rrf_fp
  FROM (SELECT * FROM bmr UNION ALL SELECT * FROM vecr)
  GROUP BY doc_id
)
SELECT doc_id, rrf_fp FROM fused ORDER BY rrf_fp DESC, doc_id LIMIT 20
"""

ANALYTICS_ORACLE_SQL["cohort_retention_weekly"] = r"""
WITH w AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) // 7 AS wk
  FROM events
), f AS (
  SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY user_id
), a AS (
  SELECT DISTINCT w.user_id, f.cohort, w.wk - f.cohort AS off
  FROM w JOIN f USING (user_id)
)
SELECT CAST(cohort AS BIGINT) AS cohort_week,
       CAST(off AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY 1, 2
"""

ANALYTICS_ORACLE_SQL["events_value_trend"] = r"""
WITH p AS (
  SELECT event_type,
         CAST(datediff('day', DATE '1995-01-01', ts) AS BIGINT) AS x,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
  FROM events
), s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x*x) AS HUGEINT) AS sxx,
         CAST(sum(x*y) AS HUGEINT) AS sxy
  FROM p GROUP BY event_type
)
SELECT event_type,
       round(CAST(n*sxy - sx*sy AS DOUBLE)
             / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope_cents_per_day,
       n
FROM s
"""

ANALYTICS_ORACLE_SQL["doc_length_deciles"] = r"""
WITH r AS (
  SELECT doc_id, length(text) AS n_chars,
         row_number() OVER (ORDER BY length(text), doc_id) AS rank,
         count(*) OVER () AS n
  FROM documents
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST((rank - 1) * 10 // n AS BIGINT) AS decile
FROM r
"""

ANALYTICS_ORACLE_SQL["pack_sequences_documents"] = r"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
         md5_number_lower(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), w AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS excl
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(excl // 512 AS BIGINT) AS seq_id
FROM w
"""

ANALYTICS_ORACLE_SQL["events_json_props_stats"] = r"""
WITH j AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(count(k) AS BIGINT) AS n,
       min(k) AS min_k, max(k) AS max_k
FROM j GROUP BY event_type
"""

ANALYTICS_ORACLE_SQL["orders_rollup_status_priority"] = r"""
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS total_price,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""

ANALYTICS_ORACLE_SQL["promo_revenue_monthly"] = r"""
WITH c AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5)
              AS BIGINT) AS cents,
         (p_type = 'PROMO') AS ispromo
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT ship_month,
       floor(100.0 * sum(CASE WHEN ispromo THEN cents ELSE 0 END)
             / sum(cents) * 10000.0 + 0.5) / 10000.0 AS promo_share,
       sum(cents) / 100.0 AS total_revenue
FROM c GROUP BY ship_month
"""

# both engines bind RE2, so '\s+' means the same ASCII whitespace class;
# nfc_normalize/lower are unicode-full on both sides
ANALYTICS_ORACLE_SQL["normalize_text_documents"] = r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'),
              ' ') AS norm
  FROM documents
)
SELECT doc_id, md5(norm) AS norm_md5,
       CAST(length(norm) AS BIGINT) AS n_chars_norm
FROM n
"""

ANALYTICS_ORACLE_SQL["dq_expectations"] = r"""
WITH r AS (
  SELECT 'orders_null_custkey' AS "rule",
         count(*) FILTER (WHERE o_custkey IS NULL) AS n FROM orders
  UNION ALL SELECT 'orders_nonpositive_total',
         count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
  UNION ALL SELECT 'orders_total_above_490k',
         count(*) FILTER (WHERE o_totalprice > 490000.0) FROM orders
  UNION ALL SELECT 'events_negative_value',
         count(*) FILTER (WHERE value < 0) FROM events
  UNION ALL SELECT 'orders_duplicate_orderkey',
         count(*) - count(DISTINCT o_orderkey) FROM orders
  UNION ALL SELECT 'lineitem_orphan_orderkey',
         (SELECT count(*) FROM lineitem l
          LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderkey IS NULL)
)
SELECT "rule", CAST(n AS BIGINT) AS n_violations FROM r
"""


# ---------------------------------------------------------------------------
# round-4 TPC-H shapes: semi / anti / disjunctive / two-sided-dim joins
# ---------------------------------------------------------------------------

Q6_START = "1996-01-01"
Q6_END = "1997-01-01"


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: revenue delta from a discount-policy change — a
    pure scan-aggregate. The whole query is ONE projected read (3
    columns of lineitem leave storage) + a vectorized filter + a
    per-batch partial sum; the driver folds one float per block."""
    lo = np.datetime64(Q6_START, "us")
    hi = np.datetime64(Q6_END, "us")
    line = _t(sf_dir, "lineitem",
              ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo.item())),
                pc.less(t["l_shipdate"], pa.scalar(hi.item())),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(m)
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        v = rev.as_py() or 0.0
        return pa.table({"rev": pa.array([v], pa.float64())})

    parts = line.map_batches(partial, batch_format="pyarrow").take_all()
    return pd.DataFrame(
        {"revenue": [round(sum(r["rev"] for r in parts), 2)]})


Q4_START = "1996-04-01"
Q4_END = "1996-07-01"


def q4_order_priority(sf_dir: str):
    """TPC-H Q4 shape: order count per priority where EXISTS a matching
    lineitem (returned flag stands in for the missing commit/receipt
    dates in this fixture). Exercises the distributed SEMI join: the
    EXISTS side collapses to per-batch-unique keys BEFORE the shuffle
    (the semi path ships key columns only), and the per-priority count
    runs as a ``post=`` partial inside each join partition — the driver
    folds ≤ nparts × 5 rows."""
    from ..stages.join import shuffle_hash_join

    lo = np.datetime64(Q4_START, "us")
    hi = np.datetime64(Q4_END, "us")
    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo.item())),
            pc.less(t["o_orderdate"], pa.scalar(hi.item())),
        )
        return t.filter(m).select(["o_orderkey", "o_orderpriority"])

    line = _t(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def l_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        k = pc.unique(t["l_orderkey"])
        return pa.table({"o_orderkey": k})

    def count_partial(j: pd.DataFrame) -> pd.DataFrame:
        g = (j.groupby("o_orderpriority").size()
             .rename("order_count").reset_index())
        return g

    j = shuffle_hash_join(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        line.map_batches(l_keys, batch_format="pyarrow"),
        on="o_orderkey", how="semi", post=count_partial)
    df = j.to_pandas()  # <= nparts x |priorities| partial rows
    out = (df.groupby("o_orderpriority", as_index=False)["order_count"]
           .sum())
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q12_START = "1996-01-01"
Q12_END = "1997-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority_by_linestatus(sf_dir: str):
    """TPC-H Q12 shape: conditional counts after a LARGE x LARGE join
    (linestatus stands in for the missing shipmode column). lineitem
    pre-aggregates per (orderkey, linestatus) inside map_batches, the
    high/low CASE split and the per-linestatus rollup run as ``post=``
    inside the join partitions — only ≤ nparts × 2 partial rows reach
    the driver."""
    from ..stages.join import shuffle_hash_join

    lo = np.datetime64(Q12_START, "us")
    hi = np.datetime64(Q12_END, "us")
    line = _t(sf_dir, "lineitem",
              ["l_orderkey", "l_linestatus", "l_shipdate"])

    def l_partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo.item())),
            pc.less(t["l_shipdate"], pa.scalar(hi.item())),
        )
        t = t.filter(m)
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "l_linestatus": t["l_linestatus"].to_pandas(),
        }).groupby(["o_orderkey", "l_linestatus"], as_index=False).size()
        return pa.Table.from_pandas(
            df.rename(columns={"size": "n"}),
            preserve_index=False).replace_schema_metadata(None)

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def split_partial(j: pd.DataFrame) -> pd.DataFrame:
        high = j["o_orderpriority"].isin(Q12_HIGH).to_numpy()
        n = j["n"].to_numpy()
        j = j.assign(high_line_count=np.where(high, n, 0),
                     low_line_count=np.where(high, 0, n))
        return (j.groupby("l_linestatus", as_index=False)
                [["high_line_count", "low_line_count"]].sum())

    j = shuffle_hash_join(
        line.map_batches(l_partial, batch_format="pyarrow"),
        orders, on="o_orderkey", post=split_partial)
    df = j.to_pandas()
    out = (df.groupby("l_linestatus", as_index=False)
           [["high_line_count", "low_line_count"]].sum())
    out["high_line_count"] = out["high_line_count"].astype("int64")
    out["low_line_count"] = out["low_line_count"].astype("int64")
    return out.sort_values("l_linestatus").reset_index(drop=True)


Q19_RULES = (
    ("Brand#3", 1, 5, 1.0, 11.0),
    ("Brand#15", 1, 10, 10.0, 20.0),
    ("Brand#24", 1, 15, 20.0, 30.0),
)


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue under a DISJUNCTION of brand/size/qty
    rules — the classic case where predicate pushdown can't prune and
    the join must evaluate OR-of-ANDs. part is broadcast ONCE via
    ``ray.put`` as three sorted-by-partkey arrays; each lineitem batch
    resolves brand/size by binary search and evaluates all three rules
    vectorized. One float partial per batch reaches the driver."""
    import ray

    part = pq_read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy()
    order_ = np.argsort(pk)
    part_ref = ray.put((
        pk[order_],
        part["p_brand"].to_numpy(zero_copy_only=False)[order_],
        part["p_size"].to_numpy()[order_],
    ))

    line = _t(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        pks, pb, ps = ray.get(part_ref)
        lpk = t["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(pks, lpk), len(pks) - 1)
        valid = pks[idx] == lpk
        b, s = pb[idx], ps[idx]
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(lpk), dtype=bool)
        for brand, slo, shi, qlo, qhi in Q19_RULES:
            keep |= ((b == brand) & (s >= slo) & (s <= shi)
                     & (q >= qlo) & (q <= qhi))
        keep &= valid
        rev = (t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
               * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)[keep]))
        return pa.table({"rev": pa.array([float(rev.sum())], pa.float64())})

    parts = line.map_batches(partial, batch_format="pyarrow").take_all()
    return pd.DataFrame(
        {"revenue": [round(sum(r["rev"] for r in parts), 2)]})


Q22_CUTOFF = "1999-01-01"


def q22_sales_opportunity(sf_dir: str):
    """TPC-H Q22 shape: rich LAPSED customers — above-average balance
    with NO orders since a cutoff — grouped by nation (the fixture has
    no phone column, and every customer has *some* order, so the
    existence test is windowed to stay non-trivial). Exercises the
    distributed ANTI join plus a broadcast scalar subquery. The balance
    threshold is computed in EXACT integer cents (per-batch (sum, count)
    partials; the compare is ``cents * n > sum_cents`` so no float
    sum-order can flip a boundary row — the DuckDB oracle uses the
    identical integer rule). The orders side collapses to
    per-batch-unique custkeys before the shuffle; the per-nation rollup
    runs inside the join partitions."""
    from ..stages.join import shuffle_hash_join

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        pos = cents > 0
        return pa.table({
            "s": pa.array([int(cents[pos].sum())], pa.int64()),
            "n": pa.array([int(pos.sum())], pa.int64()),
        })

    parts = cust.map_batches(bal_partial, batch_format="pyarrow").take_all()
    sum_cents = sum(r["s"] for r in parts)
    n_pos = sum(r["n"] for r in parts)

    def c_filter(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        keep = cents * n_pos > sum_cents  # c_acctbal > avg, exactly
        return t.filter(pa.array(keep))

    cutoff = np.datetime64(Q22_CUTOFF, "us")
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def o_keys(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.greater_equal(t["o_orderdate"], pa.scalar(cutoff.item())))
        return pa.table({"c_custkey": pc.unique(t["o_custkey"])})

    def nation_partial(j: pd.DataFrame) -> pd.DataFrame:
        if j.empty:
            return pd.DataFrame({
                "c_nationkey": pd.Series([], dtype="int64"),
                "numcust": pd.Series([], dtype="int64"),
                "bal_cents": pd.Series([], dtype="int64"),
            })
        cents = np.floor(j["c_acctbal"].to_numpy() * 100.0 + 0.5)
        j = j.assign(bal_cents=cents.astype(np.int64),
                     c_nationkey=j["c_nationkey"].astype("int64"))
        g = (j.groupby("c_nationkey", as_index=False)
             .agg(numcust=("c_custkey", "size"),
                  bal_cents=("bal_cents", "sum")))
        return g

    j = shuffle_hash_join(
        cust.map_batches(c_filter, batch_format="pyarrow"),
        orders.map_batches(o_keys, batch_format="pyarrow"),
        on="c_custkey", how="anti", post=nation_partial)
    df = j.to_pandas()
    if df.empty:
        return pd.DataFrame({"c_nationkey": pd.Series([], dtype="int64"),
                             "numcust": pd.Series([], dtype="int64"),
                             "totacctbal": pd.Series([], dtype="float64")})
    out = (df.groupby("c_nationkey", as_index=False)
           .agg(numcust=("numcust", "sum"), bal_cents=("bal_cents", "sum")))
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = (out["bal_cents"] / 100.0).round(2)
    return (out[["c_nationkey", "numcust", "totacctbal"]]
            .sort_values("c_nationkey").reset_index(drop=True))


Q7_NATIONS = (11, 20)


def q7_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape: yearly trade volume between two nations, where
    the nation is resolved on BOTH sides of the fact table (supplier's
    via a broadcast lookup inside the lineitem scan, customer's via a
    shuffle join through orders). Two chained shuffle joins total; the
    (supp_nation, cust_nation, year) rollup runs inside join #2's
    partitions so the driver folds ≤ nparts × 2 × years rows."""
    import ray

    from ..stages.join import shuffle_hash_join

    nation = pq_read(sf_dir, "nation")
    nname = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))
    n1, n2 = Q7_NATIONS

    supp = pq_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy()
    order_ = np.argsort(sk)
    supp_ref = ray.put((sk[order_], supp["s_nationkey"].to_numpy()[order_]))

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def c_filter(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["c_nationkey"],
                     value_set=pa.array([n1, n2], pa.int64()))
        return t.filter(m)

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def o_project(t: pa.Table) -> pa.Table:
        return pa.table(
            {"c_custkey": t["o_custkey"], "o_orderkey": t["o_orderkey"]})

    j1 = shuffle_hash_join(
        orders.map_batches(o_project, batch_format="pyarrow"),
        cust.map_batches(c_filter, batch_format="pyarrow"),
        on="c_custkey", prefilter=True)

    def drop_key(t: pa.Table) -> pa.Table:
        return t.select(["o_orderkey", "c_nationkey"])

    line = _t(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_shipdate",
               "l_extendedprice", "l_discount"])

    def l_partial(t: pa.Table) -> pa.Table:
        sk_s, sn_s = ray.get(supp_ref)
        suppkey = t["l_suppkey"].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(sk_s, suppkey), len(sk_s) - 1)
        snat = sn_s[idx]
        keep = (sk_s[idx] == suppkey) & ((snat == n1) | (snat == n2))
        rev = (t["l_extendedprice"].to_numpy(zero_copy_only=False)
               * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)))
        years = (t["l_shipdate"].to_pandas().dt.year.to_numpy()
                 .astype(np.int64))
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
            "s_nationkey": snat[keep],
            "l_year": years[keep],
            "rev": rev[keep],
        }).groupby(["o_orderkey", "s_nationkey", "l_year"],
                   as_index=False)["rev"].sum()
        # no pandas schema metadata: Ray's shuffle schema-unify fast path
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def volume_partial(j: pd.DataFrame) -> pd.DataFrame:
        j = j[((j["s_nationkey"] == n1) & (j["c_nationkey"] == n2))
              | ((j["s_nationkey"] == n2) & (j["c_nationkey"] == n1))]
        return (j.groupby(["s_nationkey", "c_nationkey", "l_year"],
                          as_index=False)["rev"].sum())

    j2 = shuffle_hash_join(
        j1.map_batches(drop_key, batch_format="pyarrow"),
        line.map_batches(l_partial, batch_format="pyarrow"),
        on="o_orderkey", post=volume_partial)
    df = j2.to_pandas()
    g = (df.groupby(["s_nationkey", "c_nationkey", "l_year"],
                    as_index=False)["rev"].sum())
    g["supp_nation"] = g["s_nationkey"].map(nname)
    g["cust_nation"] = g["c_nationkey"].map(nname)
    g["revenue"] = g["rev"].round(2)
    # the join's empty-partition prototype nullable-ifies carried ints
    g["l_year"] = g["l_year"].astype("int64")
    return (g[["supp_nation", "cust_nation", "l_year", "revenue"]]
            .sort_values(["supp_nation", "cust_nation", "l_year"])
            .reset_index(drop=True))


Q8_TYPE = "STANDARD"
Q8_NATION = 20          # supplier nation whose market share is measured
Q8_REGION_NATIONS = (10, 11, 12, 13, 14)  # customer nations (region proxy)
Q8_START = "1995-01-01"
Q8_END = "1997-01-01"


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape: one supplier nation's yearly market share of a
    part type sold to one region's customers — the CASE-ratio over a
    two-join chain. lineitem filters to the part-type set (broadcast)
    and resolves supplier nation (broadcast lookup), pre-aggregating
    (orderkey, is_target_nation) cents partials; join #1 hangs
    o_orderdate/custkey on, join #2 the customer-nation region filter;
    the per-year (target_cents, total_cents) fold runs inside join #2's
    partitions. Cents arithmetic keeps both engines' ratios identical
    before the final 4-decimal round."""
    import ray

    from ..stages.join import shuffle_hash_join

    part = pq_read(sf_dir, "part", ["p_partkey", "p_type"])
    pk_arr = part.filter(
        pc.equal(part["p_type"], Q8_TYPE))["p_partkey"].combine_chunks()

    supp = pq_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy()
    order_ = np.argsort(sk)
    supp_ref = ray.put((sk[order_], supp["s_nationkey"].to_numpy()[order_]))

    line = _t(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey",
               "l_extendedprice", "l_discount"])

    def l_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"], value_set=pk_arr))
        sk_s, sn_s = ray.get(supp_ref)
        suppkey = t["l_suppkey"].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(sk_s, suppkey), len(sk_s) - 1)
        valid = sk_s[idx] == suppkey
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(
                zero_copy_only=False)[valid],
            "is_nat": (sn_s[idx] == Q8_NATION)[valid],
            "c": cents[valid],
        }).groupby(["o_orderkey", "is_nat"], as_index=False)["c"].sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    lo = np.datetime64(Q8_START, "us")
    hi = np.datetime64(Q8_END, "us")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo.item())),
            pc.less(t["o_orderdate"], pa.scalar(hi.item())),
        )
        return t.filter(m)

    j1 = shuffle_hash_join(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        line.map_batches(l_partial, batch_format="pyarrow"),
        on="o_orderkey", prefilter=True)

    def reshape(t: pa.Table) -> pa.Table:
        years = (t["o_orderdate"].to_pandas().dt.year.to_numpy()
                 .astype(np.int64))
        return pa.table({
            "c_custkey": t["o_custkey"],
            "o_year": pa.array(years),
            "is_nat": t["is_nat"],
            "c": t["c"],
        })

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def c_filter(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["c_nationkey"],
                     value_set=pa.array(list(Q8_REGION_NATIONS),
                                        pa.int64()))
        return t.filter(m).select(["c_custkey"])

    def year_partial(j: pd.DataFrame) -> pd.DataFrame:
        j = j.assign(nat_c=np.where(j["is_nat"].to_numpy(dtype=bool),
                                    j["c"].to_numpy(), 0))
        return (j.groupby("o_year", as_index=False)
                .agg(nat_c=("nat_c", "sum"), all_c=("c", "sum")))

    j2 = shuffle_hash_join(
        j1.map_batches(reshape, batch_format="pyarrow"),
        cust.map_batches(c_filter, batch_format="pyarrow"),
        on="c_custkey", how="semi", post=year_partial)
    df = j2.to_pandas()
    g = (df.groupby("o_year", as_index=False)
         .agg(nat_c=("nat_c", "sum"), all_c=("all_c", "sum")))
    g["o_year"] = g["o_year"].astype("int64")
    g["mkt_share"] = (g["nat_c"] / g["all_c"]).round(4)
    return (g[["o_year", "mkt_share"]]
            .sort_values("o_year").reset_index(drop=True))


def events_user_setops(sf_dir: str):
    """Distinct-set INTERSECT / EXCEPT summary: how many users viewed
    only, purchased only, or both (set semantics — event order and
    multiplicity don't matter, unlike the funnel query). Per-batch
    unique (user, membership-bit) partials OR-fold per user under one
    coarse part; each part emits a 3-bucket histogram partial, the
    driver folds |parts| x 3 rows — never a per-user row."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])
    nparts = 64

    def bits_partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "view") | (et == "purchase")
        df = pd.DataFrame({
            "u": t["user_id"].to_numpy(zero_copy_only=False)[keep],
            "b": np.where(et[keep] == "view", 1, 2).astype(np.int64),
        })
        g = df.groupby("u", as_index=False)["b"].agg(
            lambda x: int(np.bitwise_or.reduce(x.to_numpy())))
        h = pd.util.hash_array(g["u"].to_numpy())
        g["part"] = (h % np.uint64(nparts)).astype(np.int32)
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.groupby("u")["b"]
             .agg(lambda x: int(np.bitwise_or.reduce(x.to_numpy()))))
        vals = m.to_numpy()
        return pd.DataFrame({
            "bucket": ["view_only", "purchase_only", "both"],
            "n_users": np.array([(vals == 1).sum(), (vals == 2).sum(),
                                 (vals == 3).sum()], np.int64),
        })

    df = (ds.map_batches(bits_partial, batch_format="pyarrow")
          .groupby("part")
          .map_groups(fold, batch_format="pandas")
          .to_pandas())
    out = df.groupby("bucket", as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def q21_sole_supplier_orders(sf_dir: str):
    """TPC-H Q21 shape (adapted: the fixture lacks commit/receipt
    dates): orders served by exactly ONE supplier, counted per that
    supplier — a HAVING COUNT(DISTINCT)=1 filter feeding a second
    aggregate. Per-batch (orderkey, suppkey) pair dedup bounds the
    shuffle to distinct pairs; one coarse-part co-location resolves the
    per-order distinct count and emits per-supplier partials; the
    driver folds one row per supplier (bounded by |suppliers|; swap the
    fold for a tiny groupby at 10^8 suppliers)."""
    line = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    nparts = 64

    def pair_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "s": t["l_suppkey"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        h = pd.util.hash_array(df["o"].to_numpy())
        df["part"] = (h % np.uint64(nparts)).astype(np.int32)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def sole_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["o", "s"])
        agg = g.groupby("o", as_index=False).agg(nsupp=("s", "nunique"),
                                                 the_supp=("s", "min"))
        sole = agg[agg["nsupp"] == 1]
        out = (sole.groupby("the_supp", as_index=False)
               .size().rename(columns={"the_supp": "s_suppkey",
                                       "size": "n_sole_orders"}))
        return out

    df = (line.map_batches(pair_partial, batch_format="pyarrow")
          .groupby("part")
          .map_groups(sole_partial, batch_format="pandas")
          .to_pandas())
    out = (df.groupby("s_suppkey", as_index=False)["n_sole_orders"].sum())
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["n_sole_orders"] = out["n_sole_orders"].astype("int64")
    return out.sort_values("s_suppkey").reset_index(drop=True)


Q15_START = "1996-01-01"
Q15_END = "1996-04-01"


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: the max-revenue supplier(s) for a quarter —
    aggregate, then a scalar-max subquery, then an equality filter.
    Revenue accumulates in EXACT integer cents on both sides
    (``floor(px*(1-d)*100+0.5)`` per line), so the max-equality can
    never split on float sum-order. Per-batch combiner -> one small
    groupby -> Ray-side max + filter; only the winner rows reach the
    driver, which enriches names from a pruned supplier read."""
    lo = np.datetime64(Q15_START, "us")
    hi = np.datetime64(Q15_END, "us")
    line = _t(sf_dir, "lineitem",
              ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo.item())),
            pc.less(t["l_shipdate"], pa.scalar(hi.item())),
        )
        t = t.filter(m)
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "s_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
            "c": cents,
        }).groupby("s_suppkey", as_index=False)["c"].sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    rev = (line.map_batches(partial, batch_format="pyarrow")
           .groupby("s_suppkey").aggregate(Sum("c", alias_name="c")))
    try:
        best = rev.max("c")
    except Exception:
        best = None
    if best is None:  # empty window: no revenue rows at all
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype=object),
                             "total_revenue": pd.Series([],
                                                        dtype="float64")})
    winners = rev.filter(expr=f"c == {int(best)}").to_pandas()

    supp = pq_read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    supp = supp.filter(pc.is_in(
        supp["s_suppkey"],
        value_set=pa.array(winners["s_suppkey"].tolist(),
                           supp.schema.field("s_suppkey").type)))
    out = winners.merge(supp.to_pandas(), on="s_suppkey")
    out["total_revenue"] = (out["c"] / 100.0).round(2)
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return (out[["s_suppkey", "s_name", "total_revenue"]]
            .sort_values("s_suppkey").reset_index(drop=True))


Q17_BRAND = "Brand#7"


def q17_small_quantity_revenue(sf_dir: str):
    """TPC-H Q17 shape: yearly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) stopped — the
    aggregate-join-aggregate with a correlated AVG subquery. Pass 1
    folds per-part (sum_qty, n) over the brand's parts; the threshold
    compare is exact integer math (quantities are integral:
    ``qty*5*n < sum_qty`` <=> ``qty < 0.2*avg``), broadcast once; pass 2
    sums matching rows' extendedprice in integer cents. The driver
    holds one (sum, n) pair per brand part — at 10^9 parts swap the
    broadcast for a shuffle join on partkey, same machinery."""
    import ray

    part = pq_read(sf_dir, "part", ["p_partkey", "p_brand"])
    pkeys = part.filter(
        pc.equal(part["p_brand"], Q17_BRAND))["p_partkey"]
    pk_arr = pkeys.combine_chunks()
    pk_np = np.sort(pkeys.to_numpy(zero_copy_only=False))

    line = _t(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"], value_set=pk_arr))
        df = pd.DataFrame({
            "p": t["l_partkey"].to_numpy(zero_copy_only=False),
            "q": t["l_quantity"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        g = df.groupby("p", as_index=False).agg(sq=("q", "sum"),
                                                n=("q", "size"))
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    agg = (line.map_batches(qty_partial, batch_format="pyarrow")
           .groupby("p").aggregate(Sum("sq", alias_name="sq"),
                                   Sum("n", alias_name="n"))
           .to_pandas())
    if len(pk_np) == 0 or agg.empty:  # no brand parts / no matching rows
        return pd.DataFrame({"avg_yearly": [0.0]})
    sq = np.zeros(len(pk_np), np.int64)
    nn = np.zeros(len(pk_np), np.int64)
    pos = np.searchsorted(pk_np, agg["p"].to_numpy())
    sq[pos] = agg["sq"].to_numpy()
    nn[pos] = agg["n"].to_numpy()
    thr_ref = ray.put((pk_np, sq, nn))

    def rev_partial(t: pa.Table) -> pa.Table:
        pks, sqs, ns = ray.get(thr_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(pks, lp), len(pks) - 1)
        valid = (len(pks) > 0) & (pks[idx] == lp)
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = valid & (q * 5 * ns[idx] < sqs[idx])
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * 100.0 + 0.5).astype(np.int64)
        return pa.table({"c": pa.array([int(cents.sum())], pa.int64())})

    parts_sum = line.map_batches(
        rev_partial, batch_format="pyarrow").take_all()
    total = sum(r["c"] for r in parts_sum)
    return pd.DataFrame(
        {"avg_yearly": [round(total / 100.0 / 7.0, 2)]})


# ---------------------------------------------------------------------------
# RAG-style document chunking (fixed token window + overlap)
# ---------------------------------------------------------------------------

CHUNK_W = 64   # tokens per chunk
CHUNK_S = 48   # stride (overlap = CHUNK_W - CHUNK_S)


def chunk_windows(n: int, w: int = CHUNK_W, s: int = CHUNK_S):
    """Deterministic chunk boundaries for an n-token doc: [start, end)
    token windows at stride ``s``, width ``w``; the last window may be
    short, n=0 yields none. Every token index is covered and chunk k
    always starts at k*s — the invariants the property tests pin."""
    if n <= 0:
        return []
    nck = 1 if n <= w else 1 + -(-(n - w) // s)
    return [(k * s, min(k * s + w, n)) for k in range(nck)]


def chunk_documents_overlap(sf_dir: str):
    """Chunk every document into fixed-size whitespace-token windows
    with overlap (the RAG indexing prep step): window=64 tokens,
    stride=48 (16-token overlap), last chunk may be short, empty docs
    emit nothing. Chunk ids and md5s are position-deterministic, so the
    output is stable across parallelism/resume. Pure map_batches — one
    pass, no shuffle; each output row carries only the chunk's hash +
    counters (the chunk text itself would be re-derivable and is left
    out to keep the exchange payload-light)."""
    import hashlib
    import re

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    ws = re.compile(r"[ \t\n\f\r]+")

    def chunk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_id, out_ck, out_n, out_md5 = [], [], [], []
        for d, tx in zip(ids, texts):
            toks = [w for w in ws.split(tx or "") if w]
            for k, (lo, hi) in enumerate(chunk_windows(len(toks))):
                seg = toks[lo:hi]
                out_id.append(d)
                out_ck.append(k)
                out_n.append(len(seg))
                out_md5.append(
                    hashlib.md5(" ".join(seg).encode()).hexdigest())
        return pa.table({
            "doc_id": pa.array(out_id, t.schema.field("doc_id").type),
            "chunk_id": pa.array(out_ck, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "chunk_md5": pa.array(out_md5, pa.string()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")


ANALYTICS_ORACLE_SQL["orders_median_price_by_status"] = """
SELECT o_orderstatus, count(*) AS n_orders,
       quantile_disc(o_totalprice, 0.5) AS median_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

ANALYTICS_ORACLE_SQL["q8_market_share"] = f"""
WITH rows_ AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CASE WHEN s_nationkey = {Q8_NATION}
              THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100
                              + 0.5) AS BIGINT) ELSE 0 END AS nat_c,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS all_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{Q8_TYPE}'
    AND c_nationkey IN {Q8_REGION_NATIONS}
    AND o_orderdate >= '{Q8_START}' AND o_orderdate < '{Q8_END}'
)
SELECT o_year, round(sum(nat_c) / CAST(sum(all_c) AS DOUBLE), 4)
         AS mkt_share
FROM rows_ GROUP BY o_year ORDER BY o_year
"""

ANALYTICS_ORACLE_SQL["events_user_setops"] = """
WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
b AS (
  SELECT 'view_only' AS bucket,
         (SELECT count(*) FROM (SELECT user_id FROM v EXCEPT
                                SELECT user_id FROM p)) AS n_users
  UNION ALL
  SELECT 'purchase_only',
         (SELECT count(*) FROM (SELECT user_id FROM p EXCEPT
                                SELECT user_id FROM v))
  UNION ALL
  SELECT 'both',
         (SELECT count(*) FROM (SELECT user_id FROM v INTERSECT
                                SELECT user_id FROM p))
)
SELECT bucket, CAST(n_users AS BIGINT) AS n_users FROM b ORDER BY bucket
"""

ANALYTICS_ORACLE_SQL["q21_sole_supplier_orders"] = """
WITH per_order AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS nsupp,
         min(l_suppkey) AS the_supp
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(the_supp AS BIGINT) AS s_suppkey,
       count(*) AS n_sole_orders
FROM per_order WHERE nsupp = 1
GROUP BY the_supp ORDER BY s_suppkey
"""

ANALYTICS_ORACLE_SQL["q15_top_supplier"] = f"""
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT)) AS c
  FROM lineitem
  WHERE l_shipdate >= '{Q15_START}' AND l_shipdate < '{Q15_END}'
  GROUP BY l_suppkey
)
SELECT CAST(r.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       round(c / 100.0, 2) AS total_revenue
FROM r JOIN supplier s ON r.s_suppkey = s.s_suppkey
WHERE c = (SELECT max(c) FROM r)
ORDER BY s_suppkey
"""

# quantities are integral, so qty < 0.2*avg <=> qty*5*n < sum_qty exactly
ANALYTICS_ORACLE_SQL["q17_small_quantity_revenue"] = f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = '{Q17_BRAND}'),
a AS (
  SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS sq,
         count(*) AS n
  FROM lineitem JOIN bp ON l_partkey = p_partkey
  GROUP BY l_partkey
)
SELECT round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             / 100.0 / 7.0, 2) AS avg_yearly
FROM lineitem JOIN a ON lineitem.l_partkey = a.l_partkey
WHERE CAST(l_quantity AS BIGINT) * 5 * a.n < a.sq
"""

ANALYTICS_ORACLE_SQL["q6_forecast_revenue"] = f"""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= '{Q6_START}' AND l_shipdate < '{Q6_END}'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""

ANALYTICS_ORACLE_SQL["q4_order_priority"] = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= '{Q4_START}' AND o_orderdate < '{Q4_END}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ANALYTICS_ORACLE_SQL["q12_priority_by_linestatus"] = f"""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= '{Q12_START}' AND l_shipdate < '{Q12_END}'
GROUP BY l_linestatus ORDER BY l_linestatus
"""

ANALYTICS_ORACLE_SQL["q19_disjunctive_revenue"] = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

# the threshold compare is in exact integer cents on BOTH sides:
# cents(c_acctbal) * n_pos > sum_cents  <=>  c_acctbal > avg(positive)
ANALYTICS_ORACLE_SQL["q22_sales_opportunity"] = f"""
WITH a AS (
  SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS sc,
         count(*) AS n
  FROM customer WHERE floor(c_acctbal * 100 + 0.5) > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       count(*) AS numcust,
       round(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0, 2)
         AS totacctbal
FROM customer, a
WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * a.n > a.sc
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= '{Q22_CUTOFF}')
GROUP BY c_nationkey ORDER BY c_nationkey
"""

ANALYTICS_ORACLE_SQL["q7_volume_shipping"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (s_nationkey = {Q7_NATIONS[0]} AND c_nationkey = {Q7_NATIONS[1]})
   OR (s_nationkey = {Q7_NATIONS[1]} AND c_nationkey = {Q7_NATIONS[0]})
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

# tokenization rule shared with the Ray side: split on ASCII whitespace,
# drop empties; chunk k covers tokens [k*48+1, k*48+64] (1-based)
ANALYTICS_ORACLE_SQL["chunk_documents_overlap"] = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'),
                     x -> x <> '') AS t
  FROM documents
), nn AS (
  SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
), ck AS (
  SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
         t[k * {CHUNK_S} + 1 : least(k * {CHUNK_S} + {CHUNK_W}, n)] AS seg
  FROM nn, LATERAL (
    SELECT unnest(range(CASE WHEN n <= {CHUNK_W} THEN 1
                             ELSE 1 + ((n - {CHUNK_W} + {CHUNK_S} - 1)
                                       // {CHUNK_S}) END)) AS k)
)
SELECT doc_id, chunk_id, CAST(len(seg) AS BIGINT) AS n_tokens,
       md5(array_to_string(seg, ' ')) AS chunk_md5
FROM ck
"""

# ---------------------------------------------------------------------------
# TPC-H completion set (adapted: the fixture lacks partsupp, so the
# part-supplier relation derives from lineitem's (l_partkey, l_suppkey)
# pairs and supply cost from observed line prices / p_retailprice — the
# QUERY SHAPES (correlated min, profit rollup, group-vs-global HAVING,
# distinct-count with exclusions, semi-join on a HAVING aggregate) are
# the reference points, per SURVEY §11 fourth batch's schema note)

Q2_TYPE = "PROMO"
Q2_REGION = 2


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape (adapted): for every part of one type, the
    region's supplier(s) offering it at the MINIMUM observed line price
    — the correlated-min subquery over a part×supplier relation (here
    derived from lineitem, the fixture's partsupp stand-in). Part keys
    and the region's supplier set broadcast into the scan; per-batch
    (part, supp, min-cents) partials bound the shuffle to distinct
    pairs; the per-part min + equality filter runs inside one
    map_groups per part. Only winner rows reach the driver, which
    enriches names from keys-IN pruned dim reads. Cents min is exact,
    so the equality can never split on float noise."""
    import ray

    part = pq_read(sf_dir, "part", ["p_partkey", "p_type"])
    pk_arr = part.filter(
        pc.equal(part["p_type"], Q2_TYPE))["p_partkey"].combine_chunks()

    nation = pq_read(sf_dir, "nation")
    region_nations = pa.array(
        nation.filter(pc.equal(nation["n_regionkey"], Q2_REGION))
        ["n_nationkey"].to_pylist(), pa.int32())
    supp = pq_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    rs = supp.filter(pc.is_in(supp["s_nationkey"],
                              value_set=region_nations))
    rs_arr = rs["s_suppkey"].combine_chunks()

    line = _t(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice"])

    def pair_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.is_in(t["l_partkey"], value_set=pk_arr),
            pc.is_in(t["l_suppkey"], value_set=rs_arr)))
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "p_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
            "s_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
            "cost_c": cents,
        }).groupby(["p_partkey", "s_suppkey"], as_index=False)["cost_c"].min()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    pairs = (line.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["p_partkey", "s_suppkey"])
             .aggregate(Min("cost_c", alias_name="cost_c")))

    def per_part_min(g: pd.DataFrame) -> pd.DataFrame:
        return g[g["cost_c"] == g["cost_c"].min()]

    winners = (pairs.groupby("p_partkey")
               .map_groups(per_part_min, batch_format="pandas")
               .to_pandas())
    if winners.empty:
        return pd.DataFrame({
            "p_partkey": pd.Series([], dtype="int64"),
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype=object),
            "n_name": pd.Series([], dtype=object),
            "min_cost": pd.Series([], dtype="float64")})

    sd = pq_read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    sd = sd.filter(pc.is_in(
        sd["s_suppkey"],
        value_set=pa.array(sorted(set(winners["s_suppkey"].tolist())),
                           sd.schema.field("s_suppkey").type))).to_pandas()
    nname = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))
    out = winners.merge(sd, on="s_suppkey")
    out["n_name"] = out["s_nationkey"].map(nname)
    out["min_cost"] = (out["cost_c"] / 100.0).round(2)
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return (out[["p_partkey", "s_suppkey", "s_name", "n_name", "min_cost"]]
            .sort_values(["p_partkey", "s_suppkey"]).reset_index(drop=True))


ANALYTICS_ORACLE_SQL["q2_min_cost_supplier"] = f"""
WITH pl AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cost_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_type = '{Q2_TYPE}' AND n_regionkey = {Q2_REGION}
  GROUP BY l_partkey, l_suppkey),
m AS (SELECT l_partkey AS pk, min(cost_c) AS mc FROM pl GROUP BY 1)
SELECT CAST(pl.l_partkey AS BIGINT) AS p_partkey,
       CAST(pl.l_suppkey AS BIGINT) AS s_suppkey,
       s_name, n_name, round(cost_c / 100.0, 2) AS min_cost
FROM pl JOIN m ON pl.l_partkey = m.pk AND pl.cost_c = m.mc
JOIN supplier ON pl.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY p_partkey, s_suppkey
"""


Q9_TOKEN = "widget"


def q9_product_type_profit(sf_dir: str):
    """TPC-H Q9 shape (adapted): profit per (supplier nation, order
    year) over parts whose name contains a token — the four-join profit
    rollup. Supply cost (no partsupp in the fixture) is 10% of
    p_retailprice, carried as exact integer cents-per-unit, so
    ``profit_c = rev_c - qty * cost10`` is integer on both engines.
    Part (key → cost) and supplier (key → nation) broadcast once into
    the lineitem scan, which folds (orderkey, nation) partials; ONE
    shuffle join hangs the order year on, with the (nation, year) fold
    running inside the join partitions."""
    import ray

    from ..stages.join import shuffle_hash_join

    part = pq_read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    keep = pc.match_substring(part["p_name"], Q9_TOKEN)
    part = part.filter(keep)
    pk = part["p_partkey"].to_numpy()
    cost10 = np.floor(part["p_retailprice"].to_numpy() * 10.0
                      + 0.5).astype(np.int64)
    order_p = np.argsort(pk)
    part_ref = ray.put((pk[order_p], cost10[order_p]))

    supp = pq_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy()
    order_s = np.argsort(sk)
    supp_ref = ray.put((sk[order_s], supp["s_nationkey"].to_numpy()[order_s]))

    line = _t(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
               "l_extendedprice", "l_discount"])

    def l_partial(t: pa.Table) -> pa.Table:
        pk_s, cost_s = ray.get(part_ref)
        partkey = t["l_partkey"].to_numpy(zero_copy_only=False)
        pidx = (np.minimum(np.searchsorted(pk_s, partkey), len(pk_s) - 1)
                if len(pk_s) else np.zeros(len(partkey), np.int64))
        pvalid = (pk_s[pidx] == partkey) if len(pk_s) else \
            np.zeros(len(partkey), bool)
        sk_s, sn_s = ray.get(supp_ref)
        suppkey = t["l_suppkey"].to_numpy(zero_copy_only=False)
        sidx = np.minimum(np.searchsorted(sk_s, suppkey), len(sk_s) - 1)
        valid = pvalid & (sk_s[sidx] == suppkey)
        rev_c = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0 + 0.5).astype(np.int64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        profit_c = rev_c - qty * cost_s[pidx] if len(pk_s) else rev_c
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(
                zero_copy_only=False)[valid],
            "s_nationkey": sn_s[sidx][valid],
            "pc": profit_c[valid],
        }).groupby(["o_orderkey", "s_nationkey"], as_index=False)["pc"].sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def year_partial(j: pd.DataFrame) -> pd.DataFrame:
        j = j.assign(o_year=pd.to_datetime(j["o_orderdate"])
                     .dt.year.astype("int64"))
        return (j.groupby(["s_nationkey", "o_year"], as_index=False)
                ["pc"].sum())

    j = shuffle_hash_join(
        orders,
        line.map_batches(l_partial, batch_format="pyarrow"),
        on="o_orderkey", prefilter=True, post=year_partial)
    df = j.to_pandas()
    if df.empty:
        return pd.DataFrame({"n_name": pd.Series([], dtype=object),
                             "o_year": pd.Series([], dtype="int64"),
                             "profit": pd.Series([], dtype="float64")})
    g = (df.groupby(["s_nationkey", "o_year"], as_index=False)["pc"].sum())
    nation = pq_read(sf_dir, "nation")
    nname = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))
    g["n_name"] = g["s_nationkey"].map(nname)
    g["profit"] = (g["pc"] / 100.0).round(2)
    g["o_year"] = g["o_year"].astype("int64")
    return (g[["n_name", "o_year", "profit"]]
            .sort_values(["n_name", "o_year"]).reset_index(drop=True))


ANALYTICS_ORACLE_SQL["q9_product_type_profit"] = f"""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                            + 0.5) AS BIGINT)
                 - CAST(l_quantity AS BIGINT)
                   * CAST(floor(p_retailprice * 10 + 0.5) AS BIGINT))
             / 100.0, 2) AS profit
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_TOKEN}%'
GROUP BY n_name, o_year ORDER BY n_name, o_year
"""


def q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape (adapted): parts whose total traded value
    exceeds 1.2× the average part's — the group-sum vs global-scalar
    HAVING. Per-batch (partkey, cents·qty) partials → ONE groupby sum;
    the global (total, n_parts) folds from the same dataset as two tiny
    aggregates; the threshold comparison is exact — the driver derives
    the integer cutoff ``q = (12·total) // (10·n)`` in Python bigints
    (keep iff value_c > q ⇔ value_c·10·n > 12·total for integers) and
    pushes it into a distributed filter, so no floating division ever
    decides membership and nothing larger than two scalars leaves the
    cluster before the final result."""
    line = _t(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * 100.0 + 0.5).astype(np.int64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "p_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
            "value_c": cents * qty,
        }).groupby("p_partkey", as_index=False)["value_c"].sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    pv = (line.map_batches(partial, batch_format="pyarrow")
          .groupby("p_partkey")
          .aggregate(Sum("value_c", alias_name="value_c")))
    stats = pv.aggregate(Sum("value_c", alias_name="total"),
                         Count(alias_name="n"))
    total, n = int(stats["total"]), int(stats["n"])
    if n == 0:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "part_value": pd.Series([], dtype="float64")})
    cutoff = (12 * total) // (10 * n)
    df = pv.filter(expr=f"value_c > {cutoff}").to_pandas()
    df["part_value"] = (df["value_c"] / 100.0).round(2)
    df["p_partkey"] = df["p_partkey"].astype("int64")
    return (df[["p_partkey", "part_value"]]
            .sort_values("p_partkey").reset_index(drop=True))


ANALYTICS_ORACLE_SQL["q11_important_parts"] = """
WITH pv AS (
  SELECT l_partkey, sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS value_c
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
       round(value_c / 100.0, 2) AS part_value
FROM pv
WHERE value_c * (SELECT count(*) FROM pv) * 10
      > 12 * (SELECT sum(value_c) FROM pv)
ORDER BY p_partkey
"""


Q16_EXCL_BRAND = "Brand#13"
Q16_EXCL_TYPE_PREFIX = "PROMO"
Q16_SIZES = (1, 4, 7, 10, 13, 16, 19, 22)


def q16_supplier_part_counts(sf_dir: str):
    """TPC-H Q16 shape (adapted): distinct suppliers per (brand, type,
    size) with brand/type/size predicates and a supplier exclusion list
    (complaint-list proxy: ``s_suppkey % 7 == 0``). Part attributes
    broadcast into the scan (at 10^9 parts swap for a shuffle join on
    partkey — same machinery); per-batch pair dedup bounds the exchange
    to distinct (brand, type, size, suppkey) rows; one coarse-part
    groupby co-locates each (b, t, s) so its distinct count folds
    exactly in a single pass, |groups| rows to the driver."""
    import ray

    part = pq_read(sf_dir, "part",
                   ["p_partkey", "p_brand", "p_type", "p_size"])
    m = pc.and_(
        pc.and_(pc.invert(pc.equal(part["p_brand"], Q16_EXCL_BRAND)),
                pc.invert(pc.starts_with(part["p_type"],
                                         Q16_EXCL_TYPE_PREFIX))),
        pc.is_in(part["p_size"], value_set=pa.array(list(Q16_SIZES),
                                                    pa.int32())))
    part = part.filter(m)
    pk = part["p_partkey"].to_numpy()
    order_p = np.argsort(pk)
    attr_ref = ray.put((
        pk[order_p],
        part["p_brand"].to_numpy(zero_copy_only=False)[order_p],
        part["p_type"].to_numpy(zero_copy_only=False)[order_p],
        part["p_size"].to_numpy(zero_copy_only=False)[order_p]))
    nparts = 64

    line = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pair_partial(t: pa.Table) -> pa.Table:
        pk_s, brand_s, type_s, size_s = ray.get(attr_ref)
        partkey = t["l_partkey"].to_numpy(zero_copy_only=False)
        suppkey = t["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(pk_s):
            idx = np.minimum(np.searchsorted(pk_s, partkey), len(pk_s) - 1)
            keep = (pk_s[idx] == partkey) & (suppkey % 7 != 0)
        else:
            idx = np.zeros(len(partkey), np.int64)
            keep = np.zeros(len(partkey), bool)
        df = pd.DataFrame({
            "p_brand": brand_s[idx][keep] if len(pk_s) else [],
            "p_type": type_s[idx][keep] if len(pk_s) else [],
            "p_size": (size_s[idx][keep].astype(np.int64)
                       if len(pk_s) else []),
            "s": suppkey[keep],
        }).drop_duplicates()
        h = pd.util.hash_pandas_object(
            df[["p_brand", "p_type", "p_size"]], index=False).to_numpy()
        df["part"] = (h % np.uint64(nparts)).astype(np.int32)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def count_partial(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.drop_duplicates(["p_brand", "p_type", "p_size", "s"])
               .groupby(["p_brand", "p_type", "p_size"], as_index=False)
               .agg(supplier_cnt=("s", "nunique")))
        return out

    df = (line.map_batches(pair_partial, batch_format="pyarrow")
          .groupby("part")
          .map_groups(count_partial, batch_format="pandas")
          .to_pandas())
    if df.empty:
        return pd.DataFrame({
            "p_brand": pd.Series([], dtype=object),
            "p_type": pd.Series([], dtype=object),
            "p_size": pd.Series([], dtype="int64"),
            "supplier_cnt": pd.Series([], dtype="int64")})
    df["p_size"] = df["p_size"].astype("int64")
    df["supplier_cnt"] = df["supplier_cnt"].astype("int64")
    return (df.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                           ascending=[False, True, True, True])
            .reset_index(drop=True))


ANALYTICS_ORACLE_SQL["q16_supplier_part_counts"] = f"""
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_type NOT LIKE '{Q16_EXCL_TYPE_PREFIX}%'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey % 7 <> 0
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


Q20_PREFIX = "blue"
Q20_START = "1996-01-01"
Q20_END = "1997-01-01"
Q20_MIN_QTY = 50


def q20_prefix_part_shippers(sf_dir: str):
    """TPC-H Q20 shape (adapted): suppliers who shipped more than a
    threshold quantity of prefix-named parts in one year — the
    semi-join against a HAVING aggregate. Prefix part keys broadcast
    into the scan; per-batch (suppkey, qty) integer partials → one
    small groupby → threshold filter Ray-side; only winners reach the
    driver, which enriches names from keys-IN pruned dim reads."""
    part = pq_read(sf_dir, "part", ["p_partkey", "p_name"])
    pk_arr = part.filter(
        pc.starts_with(part["p_name"], Q20_PREFIX))["p_partkey"]\
        .combine_chunks()
    lo = np.datetime64(Q20_START, "us")
    hi = np.datetime64(Q20_END, "us")

    line = _t(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(t["l_partkey"], value_set=pk_arr),
            pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo.item())),
                    pc.less(t["l_shipdate"], pa.scalar(hi.item()))))
        t = t.filter(m)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "s_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
            "qty": qty,
        }).groupby("s_suppkey", as_index=False)["qty"].sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    agg = (line.map_batches(partial, batch_format="pyarrow")
           .groupby("s_suppkey").aggregate(Sum("qty", alias_name="qty")))
    winners = agg.filter(expr=f"qty > {Q20_MIN_QTY}").to_pandas()
    if winners.empty:
        return pd.DataFrame({
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype=object),
            "n_name": pd.Series([], dtype=object),
            "qty_shipped": pd.Series([], dtype="int64")})

    supp = pq_read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    supp = supp.filter(pc.is_in(
        supp["s_suppkey"],
        value_set=pa.array(winners["s_suppkey"].tolist(),
                           supp.schema.field("s_suppkey").type))).to_pandas()
    nation = pq_read(sf_dir, "nation")
    nname = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))
    out = winners.merge(supp, on="s_suppkey")
    out["n_name"] = out["s_nationkey"].map(nname)
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["qty_shipped"] = out["qty"].astype("int64")
    return (out[["s_suppkey", "s_name", "n_name", "qty_shipped"]]
            .sort_values("s_suppkey").reset_index(drop=True))


ANALYTICS_ORACLE_SQL["q20_prefix_part_shippers"] = f"""
WITH sq AS (
  SELECT l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{Q20_PREFIX}%'
    AND l_shipdate >= '{Q20_START}' AND l_shipdate < '{Q20_END}'
  GROUP BY l_suppkey HAVING sum(CAST(l_quantity AS BIGINT)) > {Q20_MIN_QTY})
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name,
       CAST(sq.qty AS BIGINT) AS qty_shipped
FROM supplier s JOIN sq ON s.s_suppkey = sq.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY s_suppkey
"""

ANALYTICS_ORACLE_SQL["dedup_cross_corpus_documents"] = """
SELECT b.doc_id, b.lang, b.source
FROM documents b
WHERE b.source NOT IN ('src0','src1','src2','src3','src4')
  AND NOT EXISTS (
    SELECT 1 FROM documents a
    WHERE a.source IN ('src0','src1','src2','src3','src4')
      AND md5(a.text) = md5(b.text))
"""

ANALYTICS_ORACLE_SQL["kn_bigram_surprise_documents"] = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents
), flat AS (
  SELECT doc_id, unnest(ts) AS tok FROM toks
), counts AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM flat GROUP BY tok
), vocab AS (
  SELECT tok FROM counts
  QUALIFY row_number() OVER (ORDER BY df DESC, tok) <= 1000
), pairs_raw AS (
  SELECT t.doc_id, t.ts[g.i] AS r1, t.ts[g.i + 1] AS r2
  FROM toks t,
       LATERAL (SELECT unnest(generate_series(
                  1, greatest(len(t.ts) - 1, 0))) AS i) g
), pairs AS (
  SELECT p.doc_id,
         coalesce(v1.tok, '<unk>') AS w1,
         coalesce(v2.tok, '<unk>') AS w2
  FROM pairs_raw p
  LEFT JOIN vocab v1 ON v1.tok = p.r1
  LEFT JOIN vocab v2 ON v2.tok = p.r2
), big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY w1, w2
), lefts AS (
  SELECT w1, CAST(sum(c) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n1p
  FROM big GROUP BY w1
), rights AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS nc FROM big GROUP BY w2
), tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM big),
stab AS (
  -- term-for-term the engine's numpy expression over identical doubles
  SELECT b.w1, b.w2,
         CAST(floor(ln((greatest(CAST(b.c AS DOUBLE) - 0.75, 0)
                        + (0.75 * l.n1p)
                          * (CAST(r.nc AS DOUBLE) / CAST(tt.t AS DOUBLE)))
                       / CAST(l.c1 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS s
  FROM big b JOIN lefts l USING (w1) JOIN rights r USING (w2), tt
), perdoc AS (
  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(-sum(st.s) AS BIGINT) AS kn_surprise_sum_micros
  FROM pairs p JOIN stab st USING (w1, w2) GROUP BY p.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(pd.kn_surprise_sum_micros, 0) AS BIGINT)
         AS kn_surprise_sum_micros
FROM documents d LEFT JOIN perdoc pd USING (doc_id)
"""


BPE_MERGES = 40


def bpe_train_documents(sf_dir: str):
    """Distributed BPE tokenizer training (Sennrich et al. 2016) over
    the documents corpus: ONE map_batches pass folds the exact
    distinct-word histogram (per-batch ``value_counts`` partials → one
    vocabulary groupby — the exchange is bounded by distinct words,
    never rows), then the driver runs the standard merge loop over
    that bounded histogram (O(vocab × merges), independent of corpus
    size — the same split the public HuggingFace word-level trainers
    use). Returns the ``(rank, left, right, freq)`` merge table.
    Deterministic at any parallelism (integer histogram + total-order
    tiebreak), but iterative — no SQL shape, so rows-only for the
    driver; pytest gates bit-parity vs a single-process brute-force
    train and a planted-corpus merge sequence
    (tests/test_bpe.py)."""
    from ..stages.bpe import train_bpe, word_histogram

    ds = _t(sf_dir, "documents", ["text"])
    hist = word_histogram(ds)
    return train_bpe(hist, BPE_MERGES)


def bpe_corpus_compression(sf_dir: str):
    """Corpus compression under the trained BPE tokenizer: train the
    merge table (see bpe_train_documents), broadcast the merges once
    via ``ray.put``, then one map_batches pass encodes each batch
    (memoized per DISTINCT word — Zipf makes that far smaller than
    the token count) and folds per-language integer partials:
    ``(lang, n_docs, total_words, total_subword_tokens,
    total_chars)``. All-int aggregates of a deterministic encode →
    bit-stable at any parallelism; rows-only (depends on the trained
    merge table, which has no SQL shape); pytest gates the encode
    against a pure-Python reference and the totals against a
    single-process pass."""
    import ray

    from ..stages.bpe import train_bpe, word_histogram

    ds = _t(sf_dir, "documents", ["lang", "text"])
    merges = train_bpe(word_histogram(ds), BPE_MERGES)
    merges_ref = ray.put(merges)

    bc_schema = pa.schema([
        ("lang", pa.string()), ("n_docs", pa.int64()),
        ("total_words", pa.int64()), ("total_subword_tokens", pa.int64()),
        ("total_chars", pa.int64())])

    def partial(df: pd.DataFrame) -> pa.Table:
        from ..stages.bpe import encode_stats

        if df.empty:  # one pinned Arrow schema for every block
            return bc_schema.empty_table()
        m = ray.get(merges_ref)
        st = encode_stats(df["text"].reset_index(drop=True), m)
        st["lang"] = df["lang"].to_numpy()
        g = st.groupby("lang", as_index=False).agg(
            n_docs=("n_words", "size"),
            total_words=("n_words", "sum"),
            total_subword_tokens=("n_subword_tokens", "sum"),
            total_chars=("n_chars", "sum"))
        return pa.Table.from_pandas(
            g, preserve_index=False).cast(bc_schema)

    # partials are ≤ n_langs rows per batch — fold them on the driver
    # (the histogram-fold pattern; a lang-count groupby shuffle would
    # move less data than its own setup). Fan-in is batches × langs; if
    # that ever matters, pre-fold through one tiny groupby(part).
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = (parts.groupby("lang", as_index=False)
           [["n_docs", "total_words", "total_subword_tokens",
             "total_chars"]].sum())
    for c in agg.columns[1:]:
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("lang").reset_index(drop=True)


def export_documents_tokens(sf_dir: str, seq_tokens: int = 256,
                            nbuckets: int = 32):
    """TRAINING-READY packed-token export (stages/tokexport.py): train
    BPE over the corpus, build the deterministic subword vocabulary,
    then tokenize + pack the documents into fixed-``seq_tokens``
    uint32 sequences laid out as per-bucket ``.bin`` shards in md5
    document order — the Megatron-LM-style indexed binary a trainer
    mmaps, produced with one count pass + ONE bucket shuffle and no
    global sort. Returns the manifest's per-shard summary ``(bucket,
    start_token, n_tokens, n_docs)``. Rows-only for the driver (the
    trained tokenizer has no SQL shape); pytest gates byte-parity of
    the shard stream and ``read_sequences`` slices against a
    single-process reference, parallelism invariance, and shard-level
    resume (tests/test_tokexport.py)."""
    from ..stages.bpe import train_bpe, word_histogram
    from ..stages.tokexport import build_token_vocab, export_packed_tokens

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    hist = word_histogram(ds)
    merges = train_bpe(hist, BPE_MERGES)
    vocab = build_token_vocab(hist, merges)
    m = export_packed_tokens(
        ds, _cache_dir(sf_dir, "packed_tokens"), merges, vocab,
        seq_tokens=seq_tokens, nbuckets=nbuckets,
        key_cols=("doc_id",), text_col="text",
        source_tag=_source_fingerprint(
            os.path.join(sf_dir, "documents.parquet")))
    out = pd.DataFrame(m["shards"])[
        ["bucket", "start_token", "n_tokens", "n_docs"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def export_documents_tokens_unigram(sf_dir: str, seq_tokens: int = 256,
                                    nbuckets: int = 32):
    """The packed-token export driven by the OTHER tokenizer family:
    train the unigram-LM piece vocabulary (stages/unigram.py), segment
    with its Viterbi, pack the same Megatron-style uint32 shard layout
    (stages/tokexport.py, ``tokenizer=("unigram", vocab)``). Returns
    the manifest's per-shard summary. Rows-only (trained tokenizer has
    no SQL shape); pytest gates byte parity vs a single-process
    Viterbi reference and the tokenizer-switch sweep
    (tests/test_tokexport_unigram.py)."""
    from ..stages.bpe import word_histogram
    from ..stages.tokexport import (build_token_vocab_spec,
                                    export_packed_tokens)
    from ..stages.unigram import train_unigram

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    uni = train_unigram(ds, vocab_size=UNIGRAM_VOCAB, max_piece_len=6)
    hist = word_histogram(ds)
    vocab = build_token_vocab_spec(hist, ("unigram", uni))
    m = export_packed_tokens(
        ds, _cache_dir(sf_dir, "packed_tokens_uni"), None, vocab,
        seq_tokens=seq_tokens, nbuckets=nbuckets,
        key_cols=("doc_id",), text_col="text",
        tokenizer=("unigram", uni),
        source_tag=_source_fingerprint(
            os.path.join(sf_dir, "documents.parquet")))
    out = pd.DataFrame(m["shards"])[
        ["bucket", "start_token", "n_tokens", "n_docs"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def pagerank_customer_supplier(sf_dir: str, iters: int = 8, topk: int = 50):
    """PageRank over the customer↔supplier trade graph (stages/graph.py
    — fixed-point BSP message passing, bit-identical at any
    parallelism): edges from orders ⋈ lineitem (who traded with whom),
    deduplicated per pair, both directions so the bipartite graph is
    strongly connected along trades. Node ids pack as
    ``custkey·2 / suppkey·2+1`` (disjoint int64 namespaces). Returns
    the top-``topk`` nodes by ``(rank_fp desc, node)`` with the packed
    id split back into ``(kind, key, rank_fp)``. Rows-only (fixed-point
    iterative algorithm, no SQL shape); pytest gates an independent
    single-process reference, a planted star graph, parallelism
    invariance, and mass conservation (tests/test_pagerank.py)."""
    from ..stages.graph import pagerank
    from ..stages.join import shuffle_hash_join

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas")

    def pairs(j: pd.DataFrame) -> pd.DataFrame:
        # per-ORDER distinct pairs: every orderkey lives wholly in one
        # join partition, so this dedup is deterministic at any
        # partitioning; pairs repeat per order they share — a
        # MULTIGRAPH whose edge multiplicity weights trade intensity
        # (no extra pair-dedup shuffle needed)
        u = j[["o_orderkey", "o_custkey", "l_suppkey"]].drop_duplicates()
        return pd.DataFrame({
            "src": u["o_custkey"].to_numpy(np.int64) * 2,
            "dst": u["l_suppkey"].to_numpy(np.int64) * 2 + 1,
        })

    # materialize BEFORE the union: Ray has no common-subplan cache, so
    # a lazy fwd would execute the orders⋈lineitem shuffle once per branch
    fwd = shuffle_hash_join(orders, li, on="o_orderkey",
                            post=pairs).materialize()
    edges = fwd.union(fwd.map_batches(
        lambda df: df.rename(columns={"src": "dst", "dst": "src"})
        [["src", "dst"]], batch_format="pandas")).materialize()
    ranks = pagerank(edges, iters=iters)
    top = (ranks.sort(["rank_fp", "node"], descending=[True, False])
           .limit(topk).to_pandas())
    n = top["node"].to_numpy(np.int64)
    return pd.DataFrame({
        "kind": np.where(n % 2 == 0, "customer", "supplier"),
        "key": n >> np.int64(1),
        "rank_fp": top["rank_fp"].to_numpy(np.int64),
    })


UNIGRAM_VOCAB = 96


def unigram_train_documents(sf_dir: str):
    """Distributed unigram-LM tokenizer training (Kudo 2018,
    arXiv:1804.10959; SentencePiece, Kudo & Richardson 2018 — the
    other major subword family beside BPE): distinct-word histogram
    fold → distributed substring seeding → EM rounds whose E-step runs
    as map_batches over the vocabulary-bounded histogram with
    fixed-point int64 expected counts (exact fold — bit-identical at
    any parallelism) → driver M-step + deterministic prune toward the
    target vocabulary (stages/unigram.py). Returns the final
    ``(piece, q_count)`` vocabulary. Iterative EM has no SQL shape, so
    rows-only for the driver; pytest gates bit-parity vs an
    independent single-process reference, a planted corpus, chars-
    never-pruned, and parallelism invariance (tests/test_unigram.py)."""
    from ..stages.unigram import train_unigram

    ds = _t(sf_dir, "documents", ["text"])
    v = train_unigram(ds, vocab_size=UNIGRAM_VOCAB, max_piece_len=6)
    return pa.table({"piece": pa.array(v["piece"].tolist(), pa.string()),
                     "q_count": pa.array(v["q_count"].tolist(), pa.int64())})


def unigram_corpus_compression(sf_dir: str):
    """Corpus compression under the trained unigram-LM tokenizer:
    train the piece vocabulary (see unigram_train_documents),
    broadcast it once via ``ray.put``, then one map_batches pass
    Viterbi-encodes each batch (memoized per DISTINCT word) and folds
    per-language integer partials ``(lang, n_docs, total_words,
    total_pieces, total_chars)``. All-int aggregates of a
    deterministic encode → bit-stable at any parallelism; rows-only
    (depends on the trained vocabulary, no SQL shape); pytest gates
    the encode against the module's own Viterbi on the driver and the
    totals against a single-process pass (tests/test_unigram.py)."""
    import ray

    from ..stages.unigram import train_unigram

    ds = _t(sf_dir, "documents", ["lang", "text"])
    vocab = train_unigram(_t(sf_dir, "documents", ["text"]),
                          vocab_size=UNIGRAM_VOCAB, max_piece_len=6)
    vocab_ref = ray.put(vocab)

    uc_schema = pa.schema([
        ("lang", pa.string()), ("n_docs", pa.int64()),
        ("total_words", pa.int64()), ("total_pieces", pa.int64()),
        ("total_chars", pa.int64())])

    def partial(df: pd.DataFrame) -> pa.Table:
        from ..stages.unigram import unigram_encode_stats

        if df.empty:  # one pinned Arrow schema for every block
            return uc_schema.empty_table()
        v = ray.get(vocab_ref)
        st = unigram_encode_stats(df["text"].reset_index(drop=True), v)
        st["lang"] = df["lang"].to_numpy()
        g = st.groupby("lang", as_index=False).agg(
            n_docs=("n_words", "size"),
            total_words=("n_words", "sum"),
            total_pieces=("n_pieces", "sum"),
            total_chars=("n_chars", "sum"))
        return pa.Table.from_pandas(
            g, preserve_index=False).cast(uc_schema)

    # tiny fan-in (batches × langs rows): driver fold, like the BPE one
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = (parts.groupby("lang", as_index=False)
           [["n_docs", "total_words", "total_pieces", "total_chars"]]
           .sum())
    for c in agg.columns[1:]:
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("lang").reset_index(drop=True)




def kn_bigram_surprise_documents(sf_dir: str, vocab_cap: int = 1000):
    """Kneser–Ney-smoothed bigram LM surprise per document (Kneser &
    Ney 1995; Chen & Goodman 1999 "An empirical study of smoothing
    techniques for language modeling") — the perplexity-quality-filter
    shape CCNet runs with KenLM (Wenzek et al. 2020, arXiv:1911.00359),
    here with an exactly computable model so the gate is hash-exact.

    Model: tokens outside the top-``vocab_cap`` vocabulary (df-desc,
    tok tiebreak — the shared ``_vocab_tf_df`` rule) pool into
    ``<unk>``; absolute discount d = 0.75 with the continuation-count
    backoff  p(w2|w1) = (max(c12−d,0) + d·N1+(w1·)·(N1+(·w2)/T)) / c1.
    Trained and scored on the same corpus, so every scored bigram has a
    trained probability (no unseen-pair backoff needed).

    Exactness under distribution: bigram counts fold EXACTLY (per-batch
    ``value_counts`` partials over within-doc adjacent pairs → one
    bigram groupby, bounded by distinct mapped bigram types ≤
    (V+1)², never corpus positions); the KN expression is evaluated on
    both engines term-for-term over identical doubles-from-ints, and
    each bigram's log-prob quantizes to integer micros BEFORE the
    per-document sum — which is then pure int64 arithmetic, immune to
    summation order. Two corpus scans + vocabulary-bounded state on
    the driver; the score table broadcasts once via ``ray.put``."""
    import ray

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    vocab = _vocab_tf_df(ds, vocab_cap)
    # tokens ride the pipeline as SMALL INTEGER ids (vocab rank, OOV
    # pools to id V) and a bigram is the single int64 w1*(V+1)+w2 — a
    # bijection, since both ids are < V+1, so counts are identical to
    # the string-pair formulation the oracle computes while the
    # exchange and the score lookups stay integer-vectorized (no
    # O(corpus-tokens) Python string objects). ``<unk>`` can never
    # collide with a real token: the tokenizer's alphabet is
    # [a-z0-9_], which excludes the angle brackets.
    v = len(vocab)
    base = v + 1  # ids in [0, V]: V = <unk>
    tok2id_ref = ray.put(
        {t: np.int64(i) for i, t in enumerate(vocab["tok"])})

    def _doc_bigrams(texts: pd.Series):
        from ..functions.text import _flat_lower_tokens

        flat, di, _ = _flat_lower_tokens(texts)
        if len(flat) < 2:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        t2i = ray.get(tok2id_ref)
        ids = (pd.Series(flat).map(t2i).fillna(v)
               .to_numpy(dtype=np.int64))
        same = di[:-1] == di[1:]
        bg = ids[:-1][same] * base + ids[1:][same]
        return bg, di[:-1][same]

    # bigram histogram, tree-merged: the accumulator IS the dense
    # (V+1)^2 int64 count table (8 MB at the default cap, merged
    # associatively by +) so no sort shuffle runs and the driver
    # receives one array; a cap too large for the dense table falls
    # back to the distributed bigram groupby
    if base * base <= (1 << 24):
        from ray.data.aggregate import AggregateFn

        def acc_block(state: np.ndarray, block) -> np.ndarray:
            vals = (block["text"].to_pylist()
                    if hasattr(block, "to_pylist") else list(block["text"]))
            bg, _ = _doc_bigrams(pd.Series(vals))
            if len(bg):
                np.add.at(state, bg, 1)
            return state

        fn = AggregateFn(init=lambda _k: np.zeros(base * base, np.int64),
                         merge=lambda a, b: a + b,
                         accumulate_block=acc_block, name="bgc")
        out = ds.aggregate(fn)
        hist = np.asarray(out["bgc"] if isinstance(out, dict) else out)
        nz = np.flatnonzero(hist)
        big = pd.DataFrame({"bg": nz.astype(np.int64), "c": hist[nz]})
    else:
        def bigram_partial(df: pd.DataFrame) -> pd.DataFrame:
            bg, _ = _doc_bigrams(df["text"].reset_index(drop=True))
            u, c = np.unique(bg, return_counts=True)
            return pd.DataFrame({"bg": u.astype(np.int64),
                                 "c": c.astype(np.int64)})

        big = (ds.map_batches(bigram_partial, batch_format="pandas")
               .groupby("bg").aggregate(Sum("c", alias_name="c"))
               .to_pandas())
    bg_ids = big["bg"].to_numpy(np.int64)
    big["w1"], big["w2"] = bg_ids // base, bg_ids % base
    lefts = big.groupby("w1")["c"].agg(["sum", "size"])
    rights = big.groupby("w2").size()
    t_types = float(len(big))
    c12 = big["c"].to_numpy(np.float64)
    c1 = lefts["sum"].reindex(big["w1"]).to_numpy(np.float64)
    n1p = lefts["size"].reindex(big["w1"]).to_numpy(np.float64)
    nc = rights.reindex(big["w2"]).to_numpy(np.float64)
    # term-for-term the SQL oracle's expression (left-assoc products)
    p = (np.maximum(c12 - 0.75, 0.0)
         + (0.75 * n1p) * (nc / t_types)) / c1
    s = np.floor(np.log(p) * 1e6 + 0.5).astype(np.int64)
    # dense (V+1)^2 int64 score table (8 MB at the default cap,
    # broadcast once) -> the per-batch lookup is one fancy-index; a
    # cap large enough to make the dense table silly falls back to the
    # dict the bigram count is actually bounded by
    if base * base <= (1 << 24):
        table = np.zeros(base * base, dtype=np.int64)
        table[bg_ids] = s
        sc_ref = ray.put(table)
    else:
        sc_ref = ray.put(dict(zip(bg_ids.tolist(), s.tolist())))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        sc = ray.get(sc_ref)
        bg, owner = _doc_bigrams(df["text"].reset_index(drop=True))
        n = len(df)
        acc = np.zeros(n, dtype=np.int64)
        cnt = np.zeros(n, dtype=np.int64)
        if len(bg):
            if isinstance(sc, np.ndarray):
                vals = sc[bg]
            else:
                vals = pd.Series(bg).map(sc).to_numpy(np.int64)
            np.add.at(acc, owner, vals)
            np.add.at(cnt, owner, 1)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_bigrams": cnt,
            "kn_surprise_sum_micros": -acc,
        })

    return ds.map_batches(score, batch_format="pandas")


#: the KEPT corpus for the cross-corpus dedup demo: sources src0..src4
_BLOOM_KEPT_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def dedup_cross_corpus_documents(sf_dir: str):
    """Cross-corpus Bloom dedup (stages/bloom.py — the CCNet /
    RefinedWeb crawl-vs-kept pattern): documents from sources
    src0..src4 are the KEPT corpus A, the rest the NEW corpus B; drop
    every B row whose exact text content appears in A. Neither corpus
    rides a shuffle: A folds into one broadcast Bloom filter, B rows
    with any unset probe bit pass inside their own scan task, and only
    Bloom-positive candidates enter the (candidate-bounded) exact
    verify exchange — so the result is EXACT and SQL-oracled."""
    from ..stages.bloom import cross_corpus_dedup

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    kept = list(_BLOOM_KEPT_SOURCES)

    def split(t: pa.Table, want_kept: bool) -> pa.Table:
        m = pc.is_in(t["source"], value_set=pa.array(kept))
        return t.filter(m if want_kept else pc.invert(m))

    ds_a = ds.map_batches(lambda t: split(t, True), batch_format="pyarrow")
    ds_b = ds.map_batches(lambda t: split(t, False), batch_format="pyarrow")
    out = cross_corpus_dedup(ds_b, ds_a, col="text")
    return out.select_columns(["doc_id", "lang", "source"])


SUBSTR_N = 20


def dedup_substring_documents(sf_dir: str, n: int = SUBSTR_N,
                              fold: str = "driver"):
    """ExactSubstr-style duplicated-span detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): every repeated token span of length ≥ n contains
    a repeated n-gram, so sliding-window n-gram hashes detect repeated
    substrings EXACTLY (at hash fidelity, collision w.p. ~2^-64) — the
    distributed stand-in for the paper's suffix array. Two passes:

    1. per-batch n-gram OCCURRENCE counts (``value_counts`` partials —
       bounded by distinct grams per batch, never positions) → hashes
       with total count ≥ 2 (within-doc repeats count, as in the
       paper). The partials fold on the DRIVER by default (the
       histogram-fold pattern — measured 9× faster than the sort
       shuffle at this cardinality); ``fold="shuffle"`` keeps the
       distributed gram groupby for corpora whose distinct-gram count
       exceeds driver memory.
    2. the duplicated-hash set broadcasts once via ``ray.put`` (sized
       by REPEATED grams only; if a corpus ever makes that large, the
       route is the id-only semi-join used by the LSH verify stage),
       and a second scan marks covered token positions with one
       diff+cumsum sweep per batch — no Python loop over grams.

    Returns per-document ``(doc_id, n_tokens, dup_grams, dup_tokens)``
    for documents with at least one duplicated span (the drop/trim
    decision is policy; dup_tokens/n_tokens is the paper's removal
    fraction). Rows-only (sliding-window hashing has no SQL shape);
    pytest gates a planted shared span, a brute-force n-gram-counter
    reference over the real fixture, and parallelism invariance
    (tests/test_substring_dedup.py)."""
    import ray

    from ..functions.text import (_GRAM_P, _GRAM_HASH_KEY,
                                  _flat_lower_tokens)

    def gram_hashes_pos(texts: pd.Series, nn: int):
        """(hashes, flat_start_idx, doc_idx, lens): stride-1 n-gram
        hashes with their flat token start positions."""
        flat, doc_idx, lens = _flat_lower_tokens(texts)
        m = len(flat) - nn + 1
        if len(flat) == 0 or m <= 0:
            return (np.empty(0, np.uint64), np.empty(0, np.int64),
                    doc_idx, lens)
        th = pd.util.hash_array(flat, hash_key=_GRAM_HASH_KEY)
        valid = doc_idx[:m] == doc_idx[nn - 1:]
        h = th[:m].copy()
        for k in range(1, nn):
            h = h * _GRAM_P + th[k:k + m]
        idx = np.arange(m, dtype=np.int64)
        return h[valid], idx[valid], doc_idx, lens

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    # gram hashes ride the exchange as int64 BIT REINTERPRETATIONS of
    # the uint64 values (only equality matters): raw uint64 > 2^63
    # breaks the groupby's pandas block conversion and silently
    # promotes to lossy float64
    cnt_schema = pa.schema([("h", pa.int64()), ("c", pa.int64())])

    def count_partial(df: pd.DataFrame) -> pa.Table:
        h, _, _, _ = gram_hashes_pos(df["text"].reset_index(drop=True), n)
        if not len(h):
            return cnt_schema.empty_table()
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": u.view(np.int64), "c": c.astype(np.int64)},
                        schema=cnt_schema)

    parts_ds = ds.map_batches(count_partial, batch_format="pandas")
    if fold == "shuffle":
        tot = parts_ds.groupby("h").aggregate(Sum("c", alias_name="c"))
        dup = tot.filter(expr="c >= 2").to_pandas()
        dup_arr = (dup["h"].to_numpy(dtype=np.int64)
                   if "h" in dup.columns else np.empty(0, np.int64))
    else:
        parts = parts_ds.to_pandas()
        if parts.empty:
            dup_arr = np.empty(0, np.int64)
        else:
            g = parts.groupby("h", sort=False)["c"].sum()
            dup_arr = g.index.to_numpy(dtype=np.int64)[
                g.to_numpy() >= 2]
    dup_sorted = np.sort(dup_arr)
    dup_ref = ray.put(dup_sorted)

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
        ("dup_grams", pa.int64()), ("dup_tokens", pa.int64())])

    def mark(df: pd.DataFrame) -> pa.Table:
        texts = df["text"].reset_index(drop=True)
        h, starts, doc_idx, lens = gram_hashes_pos(texts, n)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        total = int(lens.sum())
        dupset = ray.get(dup_ref)
        if not len(h) or not len(dupset):
            return out_schema.empty_table()
        hv = h.view(np.int64)  # same bit reinterpretation as pass 1
        pos = np.searchsorted(dupset, hv)
        isdup = (pos < len(dupset)) & (dupset[np.minimum(
            pos, len(dupset) - 1)] == hv)
        dstarts = starts[isdup]
        if not len(dstarts):
            return out_schema.empty_table()
        # diff+cumsum span cover: +1 at each dup-gram start, -1 past
        # its end (grams never cross docs, so spans don't either)
        delta = np.zeros(total + 1, dtype=np.int64)
        np.add.at(delta, dstarts, 1)
        np.add.at(delta, dstarts + n, -1)
        covered = (np.cumsum(delta[:total]) > 0)
        dup_tok = np.zeros(len(df), dtype=np.int64)
        np.add.at(dup_tok, doc_idx, covered.astype(np.int64))
        dup_gr = np.zeros(len(df), dtype=np.int64)
        np.add.at(dup_gr, doc_idx[dstarts], 1)
        keep = dup_gr > 0
        return pa.table({
            "doc_id": ids[keep],
            "n_tokens": lens[keep].astype(np.int64),
            "dup_grams": dup_gr[keep],
            "dup_tokens": dup_tok[keep]}, schema=out_schema)

    res = (ds.map_batches(mark, batch_format="pandas")
           .to_pandas())
    if res.empty:  # all-empty blocks lose their column names
        return pd.DataFrame({f.name: pd.Series([], dtype="int64")
                             for f in out_schema})
    return res.sort_values("doc_id").reset_index(drop=True)


def dedup_substring_rewrite_documents(sf_dir: str, n: int = SUBSTR_N):
    """ExactSubstr REMOVAL (the second half of Lee et al. 2021,
    arXiv:2107.06499 — their tool cuts every duplicated span out of the
    corpus, all occurrences): same two passes as
    ``dedup_substring_documents`` (duplicated-gram set broadcast once,
    diff+cumsum cover sweep per batch), but the second pass REWRITES
    each covered document — covered tokens drop, the text rebuilds from
    the surviving ORIGINAL-CASE tokens (single-space joined; the
    rewrite is token-level by contract — duplicated spans are detected
    case-folded, exactly like the flag pipeline). Untouched documents
    pass through byte-identical. Returns
    ``(doc_id, text, n_tokens, removed_tokens)`` for every document.
    Rows-only (sliding-window hashing has no SQL shape); pytest gates a
    planted shared span removed from all its occurrences, byte identity
    for clean docs, agreement with the flag pipeline's coverage counts,
    and parallelism invariance."""
    import re as _re

    import ray

    from ..functions.text import _GRAM_HASH_KEY, _GRAM_P  # noqa: F401
    from ..functions.text import _flat_lower_tokens  # noqa: F401

    # reuse the flag pipeline's pass 1 verbatim (same gram convention)
    def gram_hashes_pos(texts: pd.Series, nn: int):
        flat, doc_idx, lens = _flat_lower_tokens(texts)
        m = len(flat) - nn + 1
        if len(flat) == 0 or m <= 0:
            return (np.empty(0, np.uint64), np.empty(0, np.int64),
                    doc_idx, lens)
        th = pd.util.hash_array(flat, hash_key=_GRAM_HASH_KEY)
        valid = doc_idx[:m] == doc_idx[nn - 1:]
        h = th[:m].copy()
        for k in range(1, nn):
            h = h * _GRAM_P + th[k:k + m]
        idx = np.arange(m, dtype=np.int64)
        return h[valid], idx[valid], doc_idx, lens

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    cnt_schema = pa.schema([("h", pa.int64()), ("c", pa.int64())])

    def count_partial(df: pd.DataFrame) -> pa.Table:
        h, _, _, _ = gram_hashes_pos(df["text"].reset_index(drop=True), n)
        if not len(h):
            return cnt_schema.empty_table()
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": u.view(np.int64), "c": c.astype(np.int64)},
                        schema=cnt_schema)

    parts = ds.map_batches(count_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        dup_arr = np.empty(0, np.int64)
    else:
        g = parts.groupby("h", sort=False)["c"].sum()
        dup_arr = g.index.to_numpy(dtype=np.int64)[g.to_numpy() >= 2]
    dup_ref = ray.put(np.sort(dup_arr))
    tok_re = _re.compile(r"[A-Za-z0-9_]+")

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.large_string()),
        ("n_tokens", pa.int64()), ("removed_tokens", pa.int64())])

    def rewrite(df: pd.DataFrame) -> pa.Table:
        texts = df["text"].reset_index(drop=True)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        h, starts, doc_idx, lens = gram_hashes_pos(texts, n)
        lens = np.asarray(lens, dtype=np.int64)
        total = int(lens.sum())
        dupset = ray.get(dup_ref)
        covered = np.zeros(total, dtype=bool)
        if len(h) and len(dupset):
            hv = h.view(np.int64)
            pos = np.searchsorted(dupset, hv)
            isdup = (pos < len(dupset)) & (dupset[np.minimum(
                pos, len(dupset) - 1)] == hv)
            dstarts = starts[isdup]
            if len(dstarts):
                delta = np.zeros(total + 1, dtype=np.int64)
                np.add.at(delta, dstarts, 1)
                np.add.at(delta, dstarts + n, -1)
                covered = np.cumsum(delta[:total]) > 0
        removed = np.zeros(len(df), dtype=np.int64)
        if covered.any():
            np.add.at(removed, doc_idx, covered.astype(np.int64))
        offs = np.concatenate(([0], np.cumsum(lens)))
        out_text = []
        for i, t in enumerate(texts):
            if removed[i] == 0:
                out_text.append(t if t is not None else None)
                continue
            cov = covered[offs[i]:offs[i + 1]]
            toks = tok_re.findall(t)
            out_text.append(" ".join(
                tok for tok, c in zip(toks, cov) if not c))
        return pa.table({
            "doc_id": ids,
            "text": pa.array(out_text, pa.large_string()),
            "n_tokens": lens,
            "removed_tokens": removed}, schema=out_schema)

    return ds.map_batches(rewrite, batch_format="pandas")


def dsir_sample_documents(sf_dir: str, k: int = 50):
    """DSIR importance resampling toward a target domain (Xie et al.
    2023, arXiv:2302.03169): target = the corpus's English documents,
    candidates = the whole corpus. One histogram-fold pass learns the
    hashed unigram+bigram log-ratio (d=4096 buckets, add-one
    smoothing, quantized to 2^20 fixed point); one broadcast scoring
    pass computes exact int64 per-document log-weights and
    deterministic md5-seeded Gumbel noise; per-batch top-k partials
    bound the exchange to k rows per batch. Fully deterministic at
    any parallelism (all cross-batch state is integer). Rows-only
    (hashed-feature training has no SQL shape); pytest gates an
    independent reference implementation, a planted target-lookalike
    corpus, and parallelism invariance (tests/test_dsir.py)."""
    from ..stages.sample import dsir_select

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text"])
    res = dsir_select(
        ds, text_col="text", id_col="doc_id",
        target_expr=lambda df: (df["lang"] == "en").to_numpy(),
        k=k, keep_cols=("lang",))
    res["doc_id"] = res["doc_id"].astype("int64")
    return res


ANALYTICS_QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "events_latest_per_user": events_latest_per_user,
    "events_tumbling_window": events_tumbling_window,
    "events_session_windows": events_session_windows,
    "top_users_by_value": top_users_by_value,
    "purchases_asof_last_view": purchases_asof_last_view,
    "top_docs_per_lang": top_docs_per_lang,
    "events_hopping_window": events_hopping_window,
    "orders_with_events_in_week": orders_with_events_in_week,
    "filter_orders_high": filter_orders_high,
    "revenue_by_segment": revenue_by_segment,
    "dedup_exact_documents": dedup_exact_documents,
    "dedup_exact_keep_best": dedup_exact_keep_best,
    "doc_token_stats": doc_token_stats,
    "doc_fingerprints": doc_fingerprints,
    "docs_per_lang_source": docs_per_lang_source,
    "lang_id_documents": lang_id_documents,
    "quality_scores_documents": quality_scores_documents,
    "compression_ratio_documents": compression_ratio_documents,
    "dedup_minhash_documents": dedup_minhash_documents,
    "dedup_simhash_documents": dedup_simhash_documents,
    "dedup_ngram_documents": dedup_ngram_documents,
    "dedup_cluster_documents": dedup_cluster_documents,
    "dedup_embedding_vectors": dedup_embedding_vectors,
    "dedup_semantic_embeddings": dedup_semantic_embeddings,
    "quality_classifier_documents": quality_classifier_documents,
    "ann_topk_cosine": ann_topk_cosine,
    "ann_topk_ivf": ann_topk_ivf_q,
    "ann_topk_lsh": ann_topk_lsh_q,
    "ann_topk_int8": ann_topk_int8_q,
    "ann_topk_pq": ann_topk_pq_q,
    "ann_topk_ivf_incremental": ann_topk_ivf_incremental_q,
    "multimodal_features": multimodal_features,
    "sample_documents_deterministic": sample_documents_deterministic,
    "sample_documents_weighted": sample_documents_weighted,
    "split_documents_train_val_test": split_documents_train_val_test,
    "sample_fixed_per_lang": sample_fixed_per_lang,
    "sample_temperature_by_source": sample_temperature_by_source,
    "redact_pii_documents": redact_pii_documents,
    "mix_token_budget_documents": mix_token_budget_documents,
    "q3_shipping_priority": q3_shipping_priority,
    "customers_without_events": customers_without_events,
    "customer_order_stats_right": customer_order_stats_right,
    "doc_length_percentiles": doc_length_percentiles,
    "filter_docs_above_median_length": filter_docs_above_median_length,
    "distinct_users_per_type": distinct_users_per_type,
    "events_pivot_type_counts": events_pivot_type_counts,
    "events_unpivot_type_counts": events_unpivot_type_counts,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "decontaminate_documents": decontaminate_documents,
    "decontaminate_semantic_embeddings": decontaminate_semantic_embeddings,
    "repetition_stats_documents": repetition_stats_documents,
    "dedup_passages_documents": dedup_passages_documents,
    "vocab_document_frequency": vocab_document_frequency,
    "tfidf_top_terms_documents": tfidf_top_terms_documents,
    "shuffle_rank_documents": shuffle_rank_documents,
    "approx_distinct_users_hll": approx_distinct_users_hll,
    "heavy_hitters_tokens": heavy_hitters_tokens,
    "approx_token_freq_cms": approx_token_freq_cms,
    "kmeans_embeddings": kmeans_embeddings,
    "pca_embeddings": pca_embeddings,
    "corpus_prep_pipeline": corpus_prep_pipeline,
    "approx_quantiles_event_value": approx_quantiles_event_value,
    "corpus_report_documents": corpus_report_documents,
    "dedup_incremental_documents": dedup_incremental_documents,
    "dedup_crawl_loop_documents": dedup_crawl_loop_documents,
    "events_running_revenue": events_running_revenue,
    "events_moving_revenue": events_moving_revenue,
    "export_documents_shards": export_documents_shards,
    "export_documents_jsonl": export_documents_jsonl,
    "export_documents_sorted": export_documents_sorted,
    "events_running_value_per_user": events_running_value_per_user,
    "events_row_number": events_row_number,
    "events_lag_revenue": events_lag_revenue,
    "events_late_data_windows": events_late_data_windows,
    "events_json_props_stats": events_json_props_stats,
    "pack_sequences_documents": pack_sequences_documents,
    "events_value_trend": events_value_trend,
    "doc_length_deciles": doc_length_deciles,
    "orders_median_price_by_status": orders_median_price_by_status,
    "funnel_view_purchase": funnel_view_purchase,
    "cohort_retention_weekly": cohort_retention_weekly,
    "search_documents_terms": search_documents_terms,
    "search_documents_bm25": search_documents_bm25,
    "search_documents_hybrid": search_documents_hybrid,
    "events_value_outliers": events_value_outliers,
    "token_pmi_pairs": token_pmi_pairs,
    "lm_surprise_documents": lm_surprise_documents,
    "events_trailing_hour_revenue": events_trailing_hour_revenue,
    "doc_length_trimmed_mean": doc_length_trimmed_mean,
    "events_debounce_per_user": events_debounce_per_user,
    "events_cube_type_hour": events_cube_type_hour,
    "order_count_distribution": order_count_distribution,
    "q10_returned_items": q10_returned_items,
    "q18_large_volume_customers": q18_large_volume_customers,
    "orders_rollup_status_priority": orders_rollup_status_priority,
    "promo_revenue_monthly": promo_revenue_monthly,
    "normalize_text_documents": normalize_text_documents,
    "dq_expectations": dq_expectations,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q4_order_priority": q4_order_priority,
    "q12_priority_by_linestatus": q12_priority_by_linestatus,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_sales_opportunity": q22_sales_opportunity,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q21_sole_supplier_orders": q21_sole_supplier_orders,
    "events_user_setops": events_user_setops,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "chunk_documents_overlap": chunk_documents_overlap,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_prefix_part_shippers": q20_prefix_part_shippers,
    "bpe_train_documents": bpe_train_documents,
    "bpe_corpus_compression": bpe_corpus_compression,
    "export_documents_tokens": export_documents_tokens,
    "dedup_substring_documents": dedup_substring_documents,
    "dedup_substring_rewrite_documents": dedup_substring_rewrite_documents,
    "dsir_sample_documents": dsir_sample_documents,
    "unigram_train_documents": unigram_train_documents,
    "unigram_corpus_compression": unigram_corpus_compression,
    "dedup_cross_corpus_documents": dedup_cross_corpus_documents,
    "kn_bigram_surprise_documents": kn_bigram_surprise_documents,
    "export_documents_tokens_unigram": export_documents_tokens_unigram,
    "pagerank_customer_supplier": pagerank_customer_supplier,
}

#: subset timed by bench.py at sf0.1
BENCH_QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "events_latest_per_user": events_latest_per_user,
    "dedup_minhash_documents": dedup_minhash_documents,
    "ann_topk_cosine": ann_topk_cosine,
    "purchases_asof_last_view": purchases_asof_last_view,
    "orders_with_events_in_week": orders_with_events_in_week,
    "q3_shipping_priority": q3_shipping_priority,
    "dedup_passages_documents": dedup_passages_documents,
    "decontaminate_documents": decontaminate_documents,
    "decontaminate_semantic_embeddings": decontaminate_semantic_embeddings,
    "events_trailing_hour_revenue": events_trailing_hour_revenue,
    "cohort_retention_weekly": cohort_retention_weekly,
    "dedup_substring_documents": dedup_substring_documents,
    "bpe_train_documents": bpe_train_documents,
    "dsir_sample_documents": dsir_sample_documents,
    "unigram_train_documents": unigram_train_documents,
    "kn_bigram_surprise_documents": kn_bigram_surprise_documents,
    "dedup_cross_corpus_documents": dedup_cross_corpus_documents,
}
