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
# 50 names yielded. Round-5 rotation (cumulative after r1-r4: 121/149
# checked, 118 green): positions 1-28 are the 28 queries that have
# NEVER earned a driver correctness row; 29-31 are the three round-4
# reds whose oracles were HUGEINT-typed (fixed this round — CAST AS
# BIGINT, see VERDICT r4 "What's wrong #1"); 32-43 are this round's
# TWELVE new gates (stream-stream attribution join, salted skew join,
# BM25, RRF fusion, containment self + incremental, key-skew report,
# strip-dup-spans, nDCG retrieval eval, BPE trainer + tokenize
# round-trip, split-leakage audit); 44-50 are high-value re-confirmations last verified in
# r1-r3 (reference spike core + flagship dedup/text). A green round
# makes cumulative driver verification 161/161. Names here that fall
# out of the registry are ignored defensively; queries not listed
# follow in module order.
# Policy: COVERAGE.md "Registry rotation".
_NEVER_CHECKED_FIRST = (
    # -- 28 never driver-checked --
    "stream_spike_alerts", "stream_events_windowed", "dq_orders_report",
    "semantic_prune_cells", "corpus_boilerplate", "ann_topk_pq",
    "ann_topk_ivfpq", "ann_pq_recall", "corpus_importance_resample",
    "ann_hard_negatives", "dedup_text_embedding_drift",
    "pretraining_corpus_selection", "corpus_global_shuffle",
    "corpus_snapshot_diff", "ann_topk_ivfpq_residual", "ann_two_stage_rerank",
    "cms_heavy_tokens", "bloom_join_prune", "quality_classifier_keep",
    "events_zorder_keys", "text_unigram_lm_score",
    "corpus_source_token_divergence", "events_value_mad_outliers",
    "bpe_merge_candidates", "quality_percentile_by_source",
    "corpus_dedup_rate_by_source", "events_day_over_day",
    "doc_length_histogram",
    # -- 3 round-4 reds, oracle CASTs fixed this round --
    "doc_packing_bins", "embedding_hof_features", "events_decayed_activity",
    # -- round-5 new gates --
    "stream_attribution_join", "events_salted_join", "text_bm25_topk",
    "retrieval_rrf_fusion", "dedup_containment", "dq_events_key_skew",
    "corpus_strip_dup_spans", "dedup_containment_incremental",
    "ann_ndcg_eval", "bpe_train_merges", "bpe_tokenize_compression",
    "corpus_split_leakage",
    # -- 7 re-confirmations (r1-r3 greens worth a fresh row;
    # dedup_ngram_jaccard's kernel is re-exercised by
    # corpus_split_leakage above) --
    "spike_events_compare", "spike_events_alerts", "spike_events_net_rollup",
    "spike_events_gated", "q1_pricing_summary", "dedup_exact_docs",
    "dedup_minhash_lsh",
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
