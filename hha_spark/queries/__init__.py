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
# 50 names yielded. Round-10 rotation (the r9 verdict's "Next round"
# #1, COVERAGE.md "Registry rotation"): position 1 is the round-10
# NEW gate stream_curation_compacted (live mid-stream minor fold
# under the unchanged batch oracle — driver-verifies the compaction
# reader-equivalence contract that was pytest-only). Positions 2-6
# are the round-10 CODE-TOUCHED re-gates — the streaming funnel (rebuilt on
# the tagged-union mega-probe + driver union-find + exchange-free
# write), its batch twin and the two other consumers of the gopher
# narrow-map rewrite (corpus_curation_pipeline, text_gopher_quality,
# quality_gate_agreement), and stream_sessionize_disorder (its store
# readers now pass explicit schemas and self-heal staged folds).
# Positions 7-12: the six closure-family gates whose kernel changed
# in the r9 second session AND again this round (raw-edge probe +
# Arrow-table labels in operators/cluster.py) — dedup_clusters,
# dedup_clusters_star, dedup_graph_pagerank, dedup_graph_triangles,
# corpus_graph_cluster_mixture, dedup_canonical_pick. Positions
# 13-15: the execution-knob-touched streaming gates carrying
# r8-vintage rows (stream_sessionize_incremental,
# stream_attribution_disorder, stream_dedup_incremental). Positions
# 16-50: the r6-vintage tail (all remaining rows are r6; 47 total,
# of which 3 already sit in the front) — the five streaming r6 rows
# first (same store-reader change surface), then name order. Nine
# r6 rows (multimodal_blob_stats, multimodal_frame_sample,
# quality_classifier_trained, the six text_* rows) do not fit and
# rotate in round 11; after a green r10 window max driver-row
# staleness is 4 rounds for exactly those nine, <= 2 for everything
# else.
# Names here that fall out of the registry are ignored defensively;
# queries not listed follow in module order.
_NEVER_CHECKED_FIRST = (
    # -- position 1: the round-10 NEW gate, never driver-checked
    #    (live mid-stream store compaction under the funnel oracle) --
    "stream_curation_compacted",
    # -- round-10 code-touched re-gates --
    "stream_curation_funnel", "corpus_curation_pipeline",
    "text_gopher_quality", "quality_gate_agreement",
    "stream_sessionize_disorder",
    # -- 6 closure-kernel re-gates (r8-vintage rows, kernel changed
    #    after the r9 window froze and again this round) --
    "dedup_clusters", "dedup_clusters_star", "dedup_graph_pagerank",
    "dedup_graph_triangles", "corpus_graph_cluster_mixture",
    "dedup_canonical_pick",
    # -- 3 knob-touched streaming gates (r8-vintage rows) --
    "stream_sessionize_incremental", "stream_attribution_disorder",
    "stream_dedup_incremental",
    # -- r6-vintage tail: streaming rows first, then name order --
    "stream_attribution_join", "stream_cms_heavy",
    "stream_events_hopping", "stream_native_dedup",
    "stream_temperature_mixture",
    "ann_ivf_assign_incremental", "ann_sq8_recall", "ann_topk_cosine",
    "ann_topk_ivf", "ann_topk_sq8", "bpe_merge_candidates",
    "corpus_blocklist_scrub", "corpus_ccnet_buckets",
    "corpus_cluster_mixture", "corpus_decontaminate",
    "corpus_ngram_novelty", "corpus_semantic_decontaminate",
    "corpus_stratified_sample", "corpus_strip_spans_incremental",
    "corpus_temperature_mixture", "corpus_vocabulary",
    "corpus_winnowing_fps", "dedup_containment",
    "dedup_containment_incremental", "dedup_minhash_recall",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_trigram_jaccard",
    "doc_array_features", "doc_fingerprint", "doc_top_terms",
    "embedding_cosine_pairs", "embedding_health_report",
    "events_asof_last_purchase", "knn_graph_mutual",
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
