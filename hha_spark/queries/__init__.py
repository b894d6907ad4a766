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
# 50 names yielded. Round-7 rotation — after r6 every one of the 189
# registry queries has a driver-verified green row, but 47 of those
# rows are r1-r3 vintage (r6 VERDICT "Next round" #1). This round's
# window finishes the freshness cycle: positions 1-2 are round-7
# NEVER-CHECKED new gates (bounded-disorder sessionization; graph-
# cluster mixture completing the mutual-kNN family), position 3 is the
# one round-7 code-touched re-gate (corpus_dsir_weights: ratio lifted
# to DECIMAL(38,0)/HUGEINT per r6 ADVICE — arithmetic changed on both
# engines, needs a fresh row), and positions 4-50 are ALL 47 stale
# greens in staleness order (1 r1, 1 r2, 45 r3). After a green r7
# window, max driver-row staleness is <= 3 rounds registry-wide.
# Names here that fall out of the registry are ignored defensively;
# queries not listed follow in module order.
# Policy: COVERAGE.md "Registry rotation".
_NEVER_CHECKED_FIRST = (
    # -- 2 round-7 new gates, never driver-checked --
    "stream_sessionize_disorder", "corpus_graph_cluster_mixture",
    # -- 1 round-7 code-touched re-gate (DECIMAL lift, r6 ADVICE) --
    "corpus_dsir_weights",
    # -- 1 r1-vintage green (stalest row registry-wide) --
    "events_pairs_within_30min",
    # -- 1 r2-vintage --
    "customer_window_suite",
    # -- 45 r3-vintage greens --
    "top_revenue_orders", "customer_order_stats", "nation_region_rollup",
    "distinct_parts_per_flag", "top3_customers_per_nation",
    "customers_without_orders", "suppliers_in_rich_nations",
    "part_size_classes", "orders_by_month", "nations_with_both",
    "events_json_extract", "events_sessionize", "avg_qty_per_part",
    "lineitem_status_pivot", "orders_cube", "median_qty_per_flag",
    "approx_stats", "orders_with_big_lineitem", "customer_name_features",
    "nations_customers_only", "customer_running_spend", "order_gap_days",
    "customer_balance_quartiles", "events_value_histogram",
    "event_value_stats", "sql_nation_revenue", "q3_shipping_priority",
    "q5_local_supplier_volume", "stratified_sample_docs",
    "corpus_train_val_test", "corpus_select_training", "dedup_survivors",
    "events_session_window", "q4_priority_returns", "q7_volume_shipping",
    "q12_priority_lines", "q14_promo_revenue", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q21_exclusive_returns",
    "q22_inactive_rich_customers", "daily_activity_fulljoin",
    "orders_grouping_sets", "lineitem_measures_unpivot",
    "lineitem_price_qty_corr",
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
