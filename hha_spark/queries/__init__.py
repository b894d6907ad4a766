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
# 50 names yielded. Round-6 rotation — with every query driver-verified
# green after r5 (cumulative 161/161), the policy shifts from COVERAGE
# to FRESHNESS (r5 VERDICT "Next round" #2): positions 1-31 are this
# round's NEVER-CHECKED new gates (sessions 6a-6d: trained quality
# classifier, incremental strip-spans, Gopher rules, decontamination,
# bigram LM, streaming sessionizer/hopping/native-dedup/CMS/mixture,
# mutual-kNN, blocklist scrub, stratified sample, winnowing, SQ8
# family, semantic decontaminate, cluster mixture, health report,
# n-gram novelty, DSIR, gate agreement, temperature mixture, CCNet
# buckets, canonical pick, budget fill, IVF ingest, frame-sample
# fan-out); next 5 are round-5 greens whose operator code changed this
# round (containment set-ifies tokens, BM25 dl fused, attribution
# watermark raised to max_delay, bpe pair explode de-quadraticized)
# and so need fresh rows; the remaining slots are the STALEST greens
# (r1 vintage first). The r2 window suite and all r3-vintage greens
# fell past position 50 this round and rotate in next round, with the
# round-4 curation/sketches/scoring rows after them — keeping max
# staleness bounded. Names here that fall out of the registry are
# ignored defensively; queries not listed follow in module order.
# Policy: COVERAGE.md "Registry rotation".
_NEVER_CHECKED_FIRST = (
    # -- 9 round-6 new gates, never driver-checked --
    "quality_classifier_trained", "corpus_strip_spans_incremental",
    "text_gopher_quality", "corpus_decontaminate", "text_bigram_lm_score",
    "stream_sessionize_incremental", "knn_graph_mutual",
    "corpus_blocklist_scrub", "corpus_stratified_sample",
    "stream_events_hopping", "corpus_winnowing_fps",
    "stream_native_dedup",
    # -- session-6c embedding-ops gates, never driver-checked --
    "ann_topk_sq8", "ann_sq8_recall", "corpus_semantic_decontaminate",
    "corpus_cluster_mixture", "embedding_health_report",
    "corpus_ngram_novelty", "stream_cms_heavy", "corpus_dsir_weights",
    "quality_gate_agreement", "corpus_temperature_mixture",
    "corpus_ccnet_buckets", "dedup_canonical_pick",
    "corpus_token_budget_fill", "stream_temperature_mixture",
    "ann_ivf_assign_incremental", "multimodal_frame_sample",
    # -- 5 round-6 code-touched re-gates --
    "dedup_containment", "dedup_containment_incremental",
    "text_bm25_topk", "stream_attribution_join", "bpe_merge_candidates",
    # -- 18 r1-vintage greens (stalest) --
    "dedup_ngram_jaccard", "dedup_trigram_jaccard", "dedup_minhash_recall",
    "dedup_simhash", "ann_topk_cosine", "ann_topk_ivf",
    "embedding_cosine_pairs", "doc_array_features", "corpus_vocabulary",
    "doc_top_terms", "text_stats_docs", "text_langid", "text_quality",
    "doc_fingerprint", "text_token_count", "multimodal_blob_stats",
    "events_asof_last_purchase", "events_pairs_within_30min",
    # -- 1 r2-vintage --
    "customer_window_suite",
    # -- 23 oldest r3-vintage --
    "top_revenue_orders", "customer_order_stats", "nation_region_rollup",
    "distinct_parts_per_flag", "top3_customers_per_nation",
    "customers_without_orders", "suppliers_in_rich_nations",
    "part_size_classes", "orders_by_month", "nations_with_both",
    "events_json_extract", "events_sessionize", "avg_qty_per_part",
    "lineitem_status_pivot", "orders_cube", "median_qty_per_flag",
    "approx_stats", "orders_with_big_lineitem", "customer_name_features",
    "nations_customers_only", "customer_running_spend", "order_gap_days",
    "customer_balance_quartiles",
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
