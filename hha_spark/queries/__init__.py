"""Registry of driver-facing queries and their DuckDB oracles.

Each module contributes (name -> callable(spark, sf_dir) -> DataFrame)
and (name -> ANSI SQL string). The driver runs both at sf0.01 and
hash-compares row values, so every computed column is aliased to the
same name on both sides and all arithmetic is cross-engine
deterministic (see functions/exact.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hha_spark.queries import (
    corpus,
    curation,
    llm_ops,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    scoring,
    sketches,
    spike_events,
    streaming_gate,
    temporal,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    llm_ops,
    streaming_gate,
    temporal,
    corpus,
    relational6,
    relational7,
    spike_events,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    # round-4 additions sit LAST: the driver's round-4 window is
    # reserved for the never-checked 50; these (plus dq_orders_report,
    # position 51) rotate to the front in round 5
    curation,
    sketches,
    scoring,
)

# Order is the driver's verification window: it oracle-checks the FIRST
# 50 names yielded. Rounds 1-3 checked 71 of the registry
# (CORRECTNESS_r01-03); this list front-loads every query that has
# NEVER had a driver correctness row (union of those files, registry
# order — flagship llm_ops first, then temporal/corpus/relational6-7)
# so round 4 converts them to driver-verified. Names here that fall
# out of the registry are ignored defensively; queries not listed
# follow in module order. Policy: COVERAGE.md "Registry rotation".
_NEVER_CHECKED_FIRST = (
    "dedup_incremental", "dedup_simhash_pairs", "dedup_graph_pagerank",
    "dedup_quality_survivors", "dedup_clusters", "dedup_clusters_star",
    "dedup_graph_triangles", "doc_token_count_map", "text_normalize",
    "doc_chunking", "doc_packing_bins", "ann_topk_ivf_trained",
    "ann_ivf_recall", "dedup_embedding_lsh", "embedding_hof_features",
    "benchmark_contamination", "text_repetition", "stream_dedup_incremental",
    "events_decayed_activity", "events_resample_daily", "events_funnel",
    "scd2_user_event_history", "hll_daily_users_merge",
    "events_hourly_to_daily", "events_sliding_7day", "user_retention_cohorts",
    "weekly_revenue_growth", "user_activity_streaks", "corpus_dup_spans",
    "corpus_source_overlap", "corpus_pii_scrub", "corpus_mixture_weights",
    "q6_forecast_revenue", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q13_order_distribution", "q15_top_supplier",
    "q19_disjunctive_revenue", "copurchase_part_pairs",
    "nation_revenue_share", "null_semantics_suite", "top_status_per_flag",
    "q2_min_cost_supplier", "q11_important_stock",
    "q16_supplier_relationship", "q20_promotion_suppliers",
    "region_pair_matrix", "part_name_fuzzy_pairs", "lineitem_price_deciles",
    "dq_orders_report",
)


def _ordered(full: dict) -> dict:
    first = {n: full[n] for n in _NEVER_CHECKED_FIRST if n in full}
    first.update(full)  # remaining names keep module order
    return first


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _ordered(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return _ordered(out)
