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
# 50 names yielded. Round-9 rotation — after the green r8 window the
# stalest driver rows registry-wide are lineitem_price_deciles (the
# one r4-vintage row round 8 could not fit) and the 45 r5-vintage
# greens; the r8 verdict "Next round" #1 demanded rotating onto
# exactly those. This round's window: position 1 is the round-9
# NEVER-CHECKED new gate (the incremental streaming curation funnel),
# positions 2-4 are the round-9 code-touched re-gates —
# corpus_curation_pipeline and corpus_token_budget_fill (both rebuilt
# on the shared token_budget_fill_per_doc / funnel_rollup helpers the
# streaming funnel reuses) and stream_sessionize_disorder (disorder_us
# validation + the pinned static partition overwrite on its store
# write; also the perf-target gate of the round). The other gates
# whose WRITER CONFIG or execution knobs changed this round
# (stream_sessionize_incremental, stream_attribution_disorder, the
# _gate_shuffle AQE/width scope) carry r8-fresh rows and their
# changes are plan-semantics-neutral — selfcheck covers them and they
# rotate next. Positions 5-50: lineitem_price_deciles (r4) then the
# 45 r5-vintage greens in name order. After a green r9 window every
# registry row is r6-vintage or fresher (max staleness 3 rounds).
# Names here that fall out of the registry are ignored defensively;
# queries not listed follow in module order.
# Policy: COVERAGE.md "Registry rotation".
_NEVER_CHECKED_FIRST = (
    # -- 1 round-9 new gate, never driver-checked --
    "stream_curation_funnel",
    # -- 3 round-9 code-touched re-gates --
    "corpus_curation_pipeline", "corpus_token_budget_fill",
    "stream_sessionize_disorder",
    # -- the r4-vintage straggler --
    "lineitem_price_deciles",
    # -- 45 r5-vintage greens, name order --
    "ann_hard_negatives", "ann_ndcg_eval", "ann_pq_recall",
    "ann_topk_ivfpq", "ann_topk_ivfpq_residual", "ann_topk_pq",
    "ann_two_stage_rerank", "bloom_join_prune",
    "bpe_tokenize_compression", "bpe_train_merges", "cms_heavy_tokens",
    "corpus_boilerplate", "corpus_dedup_rate_by_source",
    "corpus_global_shuffle", "corpus_importance_resample",
    "corpus_snapshot_diff", "corpus_source_token_divergence",
    "corpus_split_leakage", "corpus_strip_dup_spans", "dedup_exact_docs",
    "dedup_minhash_lsh", "dedup_text_embedding_drift",
    "doc_length_histogram", "doc_packing_bins", "dq_events_key_skew",
    "dq_orders_report", "embedding_hof_features", "events_day_over_day",
    "events_decayed_activity", "events_salted_join",
    "events_value_mad_outliers", "events_zorder_keys",
    "pretraining_corpus_selection", "q1_pricing_summary",
    "quality_classifier_keep", "quality_percentile_by_source",
    "retrieval_rrf_fusion", "semantic_prune_cells",
    "spike_events_alerts", "spike_events_compare", "spike_events_gated",
    "spike_events_net_rollup", "stream_events_windowed",
    "stream_spike_alerts", "text_unigram_lm_score",
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
