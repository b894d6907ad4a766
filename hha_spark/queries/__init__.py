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
    embedding_ops,
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
    embedding_ops,
)

# Order is the driver's verification window: it oracle-checks the FIRST
# 50 names yielded. Round-8 rotation — after the green r7 window the
# stalest driver rows registry-wide are the 47 r4-vintage greens (the
# dedup/ANN/text/temporal/relational-q vintage; r7 verdict "Next
# round" #1 demanded rotating onto them). This round's window:
# positions 1-2 are the round-8 NEVER-CHECKED new gates (the composed
# end-to-end curation pipeline; the bounded-disorder stream-stream
# attribution join), positions 3-4 are the round-8 code-touched
# re-gates (BOTH sessionize processors were rewritten to the unified
# one-write store with the single-pass interval merge — plan and
# state layout changed, each needs a fresh row), and positions 5-50
# are 46 of the 47 r4-vintage greens in registry order. The 47th
# (lineitem_price_deciles) plus the r5 vintage rotate in round 9 —
# two new gates + two genuine re-gates outrank one slot of
# same-vintage freshness. After a green r8 window, max driver-row
# staleness is 4 rounds for exactly one query and <= 3 for the rest.
# Names here that fall out of the registry are ignored defensively;
# queries not listed follow in module order.
# Policy: COVERAGE.md "Registry rotation".
_NEVER_CHECKED_FIRST = (
    # -- 2 round-8 new gates, never driver-checked --
    "corpus_curation_pipeline", "stream_attribution_disorder",
    # -- 2 round-8 code-touched re-gates (sessionize store rewrite) --
    "stream_sessionize_disorder", "stream_sessionize_incremental",
    # -- 46 r4-vintage greens (of 47; see note above) --
    "dedup_incremental", "dedup_simhash_pairs", "dedup_graph_pagerank",
    "dedup_quality_survivors", "dedup_clusters", "dedup_clusters_star",
    "dedup_graph_triangles", "doc_token_count_map", "text_normalize",
    "doc_chunking", "ann_topk_ivf_trained", "ann_ivf_recall",
    "dedup_embedding_lsh", "benchmark_contamination", "text_repetition",
    "stream_dedup_incremental", "events_resample_daily", "events_funnel",
    "scd2_user_event_history", "hll_daily_users_merge",
    "events_hourly_to_daily", "events_sliding_7day",
    "user_retention_cohorts", "weekly_revenue_growth",
    "user_activity_streaks", "corpus_dup_spans", "corpus_source_overlap",
    "corpus_pii_scrub", "corpus_mixture_weights", "q6_forecast_revenue",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q13_order_distribution", "q15_top_supplier",
    "q19_disjunctive_revenue", "copurchase_part_pairs",
    "nation_revenue_share", "null_semantics_suite", "top_status_per_flag",
    "q2_min_cost_supplier", "q11_important_stock",
    "q16_supplier_relationship", "q20_promotion_suppliers",
    "region_pair_matrix", "part_name_fuzzy_pairs",
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
