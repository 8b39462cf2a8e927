"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC replication pipeline at sf0.001 scale;
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2); ``oracle_sql()`` gives the DuckDB-equivalent SQL for the
SQL-expressible ones. Ray is initialised by the driver before this module
is imported — nothing here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full CDC replay -> final lake state (sf0.001)."""
    from database_delta_plugins_ray.pipelines.queries import cdc_final_state

    return cdc_final_state("/root/testdata/sf0.001")


#: gated-prefix order: the driver checks a PREFIX of this catalog. Round 5
#: ROTATES the gate (round-4 verdict #2): the paths changed THIS round
#: lead, then ~70 queries the round-4 driver gate never sampled (spanning
#: every operator family), and the 50 rows already driver-green in r04
#: follow behind — so r05 produces driver rows for the families that so
#: far were only builder-claimed green
_GATE_PREFIX = [
    # paths changed this round — re-gate first
    "cdc_apply_duckdb_validate",
    "cdc_search_lake_content", "cdc_search_lake_compacted",
    "cdc_vector_search_lake", "dedup_cross_corpus_documents",
    "kn_bigram_surprise_documents", "decontaminate_documents",
    "vocab_document_frequency", "tfidf_top_terms_documents",
    "token_pmi_pairs", "lm_surprise_documents",
    # CDC rows r04 never sampled
    "cdc_reshard_continuation", "cdc_commit_lookup",
    "cdc_repo_skew_report", "cdc_from_debezium_jsonl",
    "cdc_tx_consistent", "cdc_multi_table_final", "cdc_table_filter",
    "cdc_ddl_blacklist", "cdc_dml_blacklist", "cdc_first_seen_synthesis",
    "cdc_projection", "cdc_tombstones", "cdc_changelog_prev_commit",
    "cdc_final_state_optimized", "cdc_dlq_contents", "cdc_view_repo_join",
    "cdc_view_repo_stats", "cdc_op_counts", "cdc_events_per_repo",
    "cdc_language_slice",
    # search / dedup / decontamination (never driver-seen)
    "search_documents_bm25", "search_documents_hybrid",
    "search_documents_terms",
    "dedup_exact_documents", "dedup_exact_keep_best",
    "dedup_minhash_documents", "dedup_ngram_documents",
    "dedup_cluster_documents", "dedup_passages_documents",
    "dedup_crawl_loop_documents", "dedup_incremental_documents",
    "dedup_substring_documents", "decontaminate_semantic_embeddings",
    # tokenizer training / graph / clustering (never driver-seen)
    "bpe_train_documents", "unigram_train_documents",
    "pagerank_customer_supplier", "kmeans_embeddings", "pca_embeddings",
    # windows / sessions / late data (never driver-seen)
    "events_latest_per_user", "events_tumbling_window",
    "events_session_windows", "events_running_revenue",
    "events_trailing_hour_revenue", "events_hopping_window",
    "events_late_data_windows", "cohort_retention_weekly",
    "events_value_outliers", "funnel_view_purchase",
    # joins + set ops (never driver-seen)
    "purchases_asof_last_view", "orders_with_events_in_week",
    "customers_without_events", "customer_order_stats_right",
    "events_user_setops",
    # TPC-H rows r04 skipped
    "q20_prefix_part_shippers", "q6_forecast_revenue",
    "q19_disjunctive_revenue",
    # ANN / sampling / sketches (never driver-seen)
    "ann_topk_cosine", "ann_topk_ivf", "ann_topk_pq",
    "ann_topk_ivf_incremental",
    "sample_documents_deterministic", "split_documents_train_val_test",
    "dsir_sample_documents", "mix_token_budget_documents",
    "pack_sequences_documents",
    "approx_distinct_users_hll", "heavy_hitters_tokens",
    "approx_quantiles_event_value", "orders_median_price_by_status",
    # text analysis / multimodal / exports / pivots / DQ (never seen)
    "lang_id_documents", "quality_scores_documents",
    "quality_classifier_documents", "corpus_report_documents",
    "multimodal_features", "redact_pii_documents",
    "normalize_text_documents", "repetition_stats_documents",
    "export_documents_shards", "export_documents_jsonl",
    "export_documents_sorted", "export_documents_tokens",
    "events_pivot_type_counts", "events_cube_type_hour",
    "dq_expectations", "chunk_documents_overlap",
    # r04 driver-green rows, behind the rotation
    "cdc_final_state", "cdc_export_incremental", "cdc_from_debezium_mysql",
    "cdc_from_debezium_mysql_resume", "cdc_from_debezium_sqlserver",
    "cdc_from_debezium_postgres", "cdc_from_debezium_postgres_resume",
    "cdc_from_debezium_mongo", "cdc_from_debezium_mongo_resume",
    "cdc_jsonl_tail_follow", "cdc_from_debezium_oracle",
    "cdc_wire_relay_roundtrip",
    "cdc_bootstrap_from_parquet", "cdc_toast_carry_forward",
    "cdc_transformed_apply",
    "cdc_resume_equivalence", "cdc_full_lifecycle", "cdc_all_datatypes",
    "cdc_snapshot_ddl_sequence", "cdc_time_travel", "cdc_changefeed",
    "cdc_point_lookup", "cdc_scd2_history",
    "cdc_truncate_fence", "cdc_dead_letter_queue", "cdc_incremental_snapshot",
    "cdc_to_training_corpus", "cdc_to_packed_corpus",
    "cdc_packed_tokens_refresh", "cdc_drift_report",
    "q1_pricing_summary", "q3_shipping_priority", "q10_returned_items",
    "q18_large_volume_customers", "q5_local_supplier_volume",
    "q4_order_priority", "q12_priority_by_linestatus",
    "q22_sales_opportunity", "q7_volume_shipping",
    "q15_top_supplier", "q17_small_quantity_revenue", "q8_market_share",
    "q21_sole_supplier_orders", "q2_min_cost_supplier",
    "q9_product_type_profit", "q11_important_parts",
    "q16_supplier_part_counts",
]


def queries() -> dict[str, Callable[[str], Any]]:
    from database_delta_plugins_ray.pipelines.queries import CDC_QUERIES

    full: dict[str, Callable[[str], Any]] = {}
    full.update(CDC_QUERIES)
    try:
        from database_delta_plugins_ray.pipelines.analytics import ANALYTICS_QUERIES

        full.update(ANALYTICS_QUERIES)
    except ImportError:
        pass
    out = {n: full[n] for n in _GATE_PREFIX if n in full}
    out.update(full)  # the rest, original order (dicts keep insertion)
    return out


def oracle_sql() -> dict[str, str]:
    from database_delta_plugins_ray.pipelines.queries import (
        cdc_oracle_sql,
        ensure_log,
        ensure_typed_log,
        ensure_variant_log,
    )

    # the driver compares at sf=0.01; make sure the logs the SQL reads exist
    ensure_log("/root/testdata/sf0.01")
    ensure_typed_log("/root/testdata/sf0.01")
    ensure_variant_log("/root/testdata/sf0.01", "mt_log", n_tables=2,
                       ddl_plan=False)
    ensure_variant_log("/root/testdata/sf0.01", "trunc_log",
                       truncate_frac=0.5, ddl_plan=False)
    ensure_variant_log("/root/testdata/sf0.01", "noddl_log",
                       ddl_plan=False, snapshot=False)
    out = dict(cdc_oracle_sql("0.01"))
    try:
        from database_delta_plugins_ray.pipelines.analytics import ANALYTICS_ORACLE_SQL

        out.update(ANALYTICS_ORACLE_SQL)
    except ImportError:
        pass
    return out
