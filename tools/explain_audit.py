"""Plan-snapshot artifact: `.explain("formatted")` for the headline
queries, committed under .benchmarks/plans/ so pushdown, broadcast
choices, and codegen spans are reviewable without re-running anything.

    python tools/explain_audit.py [sf_dir]

Also prints a one-line summary per query (exchanges, joins, scans,
python-eval nodes) — the numbers the scale story rests on.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")

from hha_spark.caching import release_tracked  # noqa: E402
from hha_spark.queries import all_queries  # noqa: E402
from hha_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

HEADLINE = [
    "spike_events_compare",      # the reference-parity flagship
    "spike_events_gated",        # + zones gating & alert dedup
    "q1_pricing_summary",        # TPC-H scan+agg
    "q9_product_profit",         # TPC-H multi-join
    "dedup_minhash_lsh",         # LSH banding (single-shuffle form)
    "dedup_simhash_pairs",       # pigeonhole pairing
    "dedup_ngram_jaccard",       # prefix-filtered AllPairs
    "ann_topk_cosine",           # Arrow pair kernel
    "ann_topk_ivfpq",            # IVF x PQ composition
    "cms_heavy_tokens",          # sketch build + broadcast probe
    "bloom_join_prune",          # bitmap probe join pruning
    "events_zorder_keys",        # clustering key arithmetic
    "corpus_pii_scrub",          # shuffle-free narrow map
    "events_asof_last_purchase", # as-of join composition
    "dedup_text_embedding_drift",    # cross-modal composition
    "pretraining_corpus_selection",  # the capstone keep/drop decision
    "text_unigram_lm_score",         # head/tail skew-split vocab join
    "events_value_mad_outliers",     # median/MAD broadcast-stats joins
    "ann_topk_ivfpq_residual",       # IVFADC: centroid dot + residual ADC
    "text_bm25_topk",                # term-pruned tf agg + broadcast consts
    "retrieval_rrf_fusion",          # hybrid cosine + token-overlap fusion
    "dedup_containment",             # one-sided prefix filter, hashed keys
    "dedup_containment_incremental", # cross-side admission gate
    "corpus_strip_dup_spans",        # occurrence-linear span removal
    "dq_events_key_skew",            # TakeOrdered top-k + broadcast totals
    "events_salted_join",            # explicit salted hot-key join
]


def main() -> None:
    spark = get_spark("explain_audit")
    out_dir = os.path.join(".benchmarks", "plans")
    os.makedirs(out_dir, exist_ok=True)
    qs = all_queries()
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        qe = df._jdf.queryExecution()
        formatted = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        plan = qe.executedPlan().toString()
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(formatted)
        counts = {
            "exchanges": len(re.findall(r"Exchange", plan)),
            "reused": len(re.findall(r"ReusedExchange", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "scans": len(re.findall(r"FileScan", plan)),
            "arrow": len(re.findall(r"MapInPandas|ArrowEvalPython", plan)),
            "row_py": len(re.findall(r"BatchEvalPython", plan)),
        }
        print(name, counts)
        release_tracked()
    spark.stop()


if __name__ == "__main__":
    main()
