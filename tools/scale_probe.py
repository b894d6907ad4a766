"""Weak-scaling probe: do the headline operators grow ~linearly?

The driver fixtures stop at sf0.1, but the 100 TB question is the
GROWTH RATE, not the absolute time. This tool manufactures K-times
larger inputs from the sf0.1 tables — each copy disjoint in ids AND
content (tokens are suffixed per copy, vector ids shifted), so
near-dup/pair structure per copy is preserved while nothing pairs
ACROSS copies — and times a representative operator set at each K.
An operator whose time grows much faster than K has a superlinear
stage (pair blowup, driver collect, expression inflation) that a
1000-executor run would hit at full force.

    python tools/scale_probe.py [K ...]        # default 1 4 16

Emits one JSON line per K and a final summary with time ratios
normalized to K=1; the artifact lands in .benchmarks/.

NOTE: the K=16 battery needs HHA_DRIVER_MEM=16g. The epoch-axis leg
runs 96 funnel epochs over a 480k-doc localCheckpointed fixture with
the driver, all 32 executor threads, and ~3300 stages of session
bookkeeping sharing ONE local-mode heap; at the 8g default it dies
~60 epochs in with a broadcast-build OOM even though every data-path
quantity is bounded (label literals are spilled past
LABEL_SPILL_ROWS, task binaries stay <1 MB, per-epoch write cost is
flat). Probe-harness heap sharing, not stream-age growth — a cluster
driver hosts none of those.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from hha_spark.session import get_spark  # noqa: E402
from hha_spark.sources.tables import US_PER_DAY, events_ts_us, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# side-channel metrics a probe wants recorded beyond out_rows (e.g.
# the disorder attribution join's final STATE row count — the
# boundedness claim is about state, which the output can't show);
# cleared per K, merged into each K's JSON line and the artifact
EXTRA: dict[str, dict] = {}


def scaled_events(spark, k: int) -> DataFrame:
    ev = load_table(spark, SF_DIR, "events").select(
        events_ts_us(load_table(spark, SF_DIR, "events")).alias("ts_us"),
        "user_id", "event_type", "value",
    )
    copies = spark.range(k).select(F.col("id").alias("copy"))
    # disjoint key space per copy: weak scaling grows keys WITH data
    return ev.crossJoin(F.broadcast(copies)).select(
        "ts_us",
        (F.col("user_id") + F.col("copy") * 10_000).alias("user_id"),
        "event_type",
        "value",
    )


def scaled_docs(spark, k: int) -> DataFrame:
    docs = load_table(spark, SF_DIR, "documents")
    copies = spark.range(k).select(F.col("id").alias("copy"))
    return docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        # per-copy token suffix: content disjoint across copies, so
        # pair structure scales linearly by construction
        F.array_join(
            F.transform(
                F.split("text", " "),
                lambda t: F.concat(t, F.lit("_"), F.col("copy").cast("string")),
            ),
            " ",
        ).alias("text"),
        "lang", "source",
    )


def scaled_embeddings(spark, k: int) -> DataFrame:
    emb = load_table(spark, SF_DIR, "embeddings")
    copies = spark.range(k).select(F.col("id").alias("copy"))
    return emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
        "embedding",
    )


def _attribution_disorder_probe(spark, ev: DataFrame) -> DataFrame:
    """Replay the K-scaled click/purchase stream through the disorder
    attribution processor as 3 epochs with bounded-late delivery
    (the gate's slicing, in-memory), then flush. Returns the
    attributed pairs DETACHED (collected) so the scratch store can
    go; records the final store's state rows in EXTRA."""
    import shutil
    import tempfile

    from hha_spark.queries.streaming_gate import (
        ATTR_DISORDER_SEC,
        ATTR_MAX_DELAY_SEC,
        disorder_slice_col,
    )
    from hha_spark.streaming.joins import (
        _ATTR_STORE_SCHEMA,
        final_attributions,
        make_disorder_attribution_processor,
    )
    from hha_spark.streaming.sessionize import _read_versioned

    two = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        (F.col("ts_us") / F.lit(1_000_000)).cast("long").alias("ts_s"),
        F.col("event_type").alias("etype"),
    )
    # the gate's OWN slice/delay definition — only the file emission
    # is skipped (batches stay in-memory frames here)
    n = 3
    sliced = two.withColumn(
        "_sl", disorder_slice_col(two, n, ATTR_DISORDER_SEC, ts_col="ts_s")
    ).persist()
    tmp = tempfile.mkdtemp(prefix="hha_probe_attr_")
    try:
        proc = make_disorder_attribution_processor(
            spark,
            store_root=f"{tmp}/store",
            max_delay_sec=ATTR_MAX_DELAY_SEC,
            disorder_sec=ATTR_DISORDER_SEC,
        )
        for i in range(n):
            proc(sliced.where(F.col("_sl") == i).drop("_sl"), i)
        pairs = final_attributions(
            spark,
            store_root=f"{tmp}/store",
            max_delay_sec=ATTR_MAX_DELAY_SEC,
        )
        detached = spark.createDataFrame(
            pairs.collect(), "user_id long, ts_s long, ts2_s long"
        )
        state_rows = (
            _read_versioned(spark, f"{tmp}/store", _ATTR_STORE_SCHEMA)
            .where(F.col("kind").isin("click", "buf"))
            .count()
        )
        EXTRA["attribution_disorder"] = {"state_rows": state_rows}
        return detached
    finally:
        sliced.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def _store_compaction_probe(spark, k: int) -> DataFrame:
    """K scales the EPOCH COUNT (the axis compaction is about —
    version-dir growth), not the data volume: 6*k tiny sessionize
    epochs build a store with 6*k version dirs, then compact_store
    folds the history stubs. EXTRA records dir counts and the
    closed-history read wall before/after: rows are identical either
    way (the reader-equivalence contract), dirs drop from O(epochs)
    to 3, and the post-compact read no longer pays one listing +
    footer pass per epoch."""
    import shutil
    import tempfile

    from hha_spark.streaming.sessionize import (
        _state_versions,
        make_sessionize_processor,
        read_closed_sessions,
    )
    from hha_spark.streaming.store import SESSIONIZE_HISTORY, compact_store

    epochs = 6 * k
    tmp = tempfile.mkdtemp(prefix="hha_probe_compact_")
    try:
        proc = make_sessionize_processor(
            spark, store_root=f"{tmp}/store", gap_us=10
        )
        for e in range(epochs):
            # each epoch's events sit far past the previous epoch's,
            # so every open session closes next epoch: history grows
            # one closed batch per epoch, state stays bounded
            rows = [(u, e * 1000 + 7 * u) for u in range(4)]
            proc(spark.createDataFrame(rows, "user_id long, ts_us long"), e)
        t0 = time.perf_counter()
        n_before = read_closed_sessions(spark, f"{tmp}/store").count()
        read_before = time.perf_counter() - t0
        dirs_before = len(_state_versions(spark, f"{tmp}/store"))
        compact_store(
            spark, f"{tmp}/store", history_kinds=SESSIONIZE_HISTORY
        )
        t0 = time.perf_counter()
        closed = read_closed_sessions(spark, f"{tmp}/store")
        n_after = closed.count()
        read_after = time.perf_counter() - t0
        assert n_after == n_before, (n_after, n_before)
        EXTRA["store_compaction"] = {
            "epochs": epochs,
            "dirs_before": dirs_before,
            "dirs_after": len(_state_versions(spark, f"{tmp}/store")),
            "read_sec_before": round(read_before, 3),
            "read_sec_after": round(read_after, 3),
        }
        # detached so the scratch dir can go
        return spark.createDataFrame(
            closed.collect(),
            "user_id long, start_us long, end_us long, n_events long",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stream_funnel_probe(spark, docs: DataFrame, k: int) -> DataFrame:
    """The INCREMENTAL streaming curation funnel processor
    (streaming/curation_stream.py) under K-scaled data with a FIXED
    epoch count — the r9 verdict's missing number: does each epoch's
    phase (probe / closure / write) stay epoch-bounded as the batch
    and carried state grow K-fold? Two md5-interleaved batches (the
    gate's delivery shape); EXTRA records the processor's own
    per-phase wall timers, whether the driver union-find path held
    (no fallback), and the final store's state row counts — labels
    and bucket counts must scale ~K (state IS the curated corpus),
    never faster."""
    import shutil
    import tempfile

    from hha_spark.operators.sketch import md5_mod
    from hha_spark.streaming.curation_stream import (
        final_curation_funnel,
        make_curation_funnel_processor,
    )
    from hha_spark.streaming.sessionize import _read_versioned
    from hha_spark.streaming.curation_stream import _CUR_STORE_SCHEMA

    batches = [
        docs.select("doc_id", "source", "text")
        .where(
            md5_mod("funnelprobe|", F.col("doc_id").cast("string"), 2) == i
        )
        .localCheckpoint(eager=True)  # detach: timers must not
        # include recomputing the K-scaled cross join per action
        for i in range(2)
    ]
    stats: dict = {}
    tmp = tempfile.mkdtemp(prefix="hha_probe_funnel_")
    try:
        proc = make_curation_funnel_processor(
            spark, store_root=f"{tmp}/store", stats=stats
        )
        t0 = time.perf_counter()
        for e, b in enumerate(batches):
            proc(b, e)
        stream_wall = time.perf_counter() - t0
        cur = _read_versioned(spark, f"{tmp}/store", _CUR_STORE_SCHEMA)
        state_rows = {
            r["kind"]: r["n"]
            for r in cur.groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        out = final_curation_funnel(spark, store_root=f"{tmp}/store")
        detached = spark.createDataFrame(
            out.collect(), out.schema
        )
        EXTRA["stream_funnel"] = {
            "stream_wall_sec": round(stream_wall, 3),
            "phases": {
                n: round(v, 3)
                for n, v in stats.items()
                if isinstance(v, float)
            },
            "epochs": stats.get("epochs"),
            "recomputes": stats.get("recomputes", 0),
            # >0 means the mega-probe's envelope overflowed and the
            # epoch took the DISTRIBUTED closure — expected once the
            # per-epoch edge volume passes SMALL_GRAPH_EDGES (K>=128
            # on this fixture); correctness is unchanged (pytest pins
            # the fallback ≡ batch) and this counter documents the
            # crossover in the artifact
            "closure_fallbacks": stats.get("closure_fallbacks", 0),
            "state_rows": state_rows,
        }
        return detached
    finally:
        for b in batches:
            b.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def _stream_funnel_compacted_probe(spark, docs: DataFrame, k: int) -> DataFrame:
    """Live store compaction under K-scaled DATA (r10 verdict "Next
    round" #5): the epoch-axis probe fixes data size and scales
    epochs; the deep-K funnel probe scales data with compaction off.
    This one closes the matrix — 6 md5-sliced batches of the
    K-scaled corpus with compact_every=1, so real minor folds fire
    mid-stream (after epochs 3 and 5: a fold needs >= 2 unmarked
    stubs below the newest two) while per-epoch data grows with K.
    EXTRA records each fold's wall clock and the version-dir count
    before/after — the LSM amortization claim is that fold wall
    tracks the folded HISTORY volume (~K) and dirs stay bounded,
    with the flush still reading the folded store correctly (the
    returned rollup is the probe's row-count check)."""
    import shutil
    import tempfile

    from hha_spark.operators.sketch import md5_mod
    from hha_spark.sources import fs
    from hha_spark.streaming.curation_stream import (
        final_curation_funnel,
        make_curation_funnel_processor,
    )

    batches = [
        docs.select("doc_id", "source", "text")
        .where(
            md5_mod("funnelcprobe|", F.col("doc_id").cast("string"), 6)
            == i
        )
        .localCheckpoint(eager=True)
        for i in range(6)
    ]
    stats: dict = {}
    tmp = tempfile.mkdtemp(prefix="hha_probe_funnelc_")

    def _dirs() -> int:
        try:
            return len(
                [
                    d
                    for d in fs.listdir(spark, f"{tmp}/store")
                    if d.startswith("v")
                ]
            )
        except Exception:  # noqa: BLE001 — store not created yet
            return 0

    try:
        proc = make_curation_funnel_processor(
            spark,
            store_root=f"{tmp}/store",
            stats=stats,
            compact_every=1,
        )
        folds: list[dict] = []
        t0 = time.perf_counter()
        for e, b in enumerate(batches):
            before_wall = stats.get("t_compact", 0.0)
            before_folds = stats.get("compactions", 0)
            dirs_before = _dirs()
            proc(b, e)
            if stats.get("compactions", 0) > before_folds:
                folds.append(
                    {
                        "epoch": e,
                        "fold_wall_sec": round(
                            stats.get("t_compact", 0.0) - before_wall, 3
                        ),
                        "dirs_before": dirs_before + 1,  # incl. v{e}
                        "dirs_after": _dirs(),
                    }
                )
        stream_wall = time.perf_counter() - t0
        out = final_curation_funnel(spark, store_root=f"{tmp}/store")
        detached = spark.createDataFrame(out.collect(), out.schema)
        EXTRA["stream_funnel_compacted"] = {
            "stream_wall_sec": round(stream_wall, 3),
            "folds": folds,
            "phases": {
                n: round(v, 3)
                for n, v in stats.items()
                if isinstance(v, float)
            },
            "epochs": stats.get("epochs"),
            "compactions": stats.get("compactions", 0),
            "closure_fallbacks": stats.get("closure_fallbacks", 0),
        }
        return detached
    finally:
        for b in batches:
            b.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def _funnel_epoch_axis_probe(spark, k: int) -> DataFrame:
    """Rewrite-cost growth of the funnel's two REWRITTEN store kinds
    (bcnt, label) on the EPOCH axis — r9 verdict "Next round" #6.

    6*k epochs ingest fixed-size, content-DISJOINT batches (one
    scaled-docs copy per epoch), so carried state (bucket counts,
    labels) grows linearly with epoch count while per-epoch ingest
    stays constant. EXTRA records the mean write wall of the first
    vs last third of epochs and the final state rows: the expected
    (and acceptable) shape is per-epoch write cost growing LINEARLY
    with state — the incremental closure fold itself consumes every
    carried label each epoch, so per-epoch cost is Ω(state) for the
    PIPELINE regardless of storage format; the probe shows the
    rewrite tracks (not exceeds) that inherent bound. What would be
    a red flag is superlinear growth or the write dominating the
    probe phase."""
    import shutil
    import tempfile

    from hha_spark.streaming.curation_stream import (
        _CUR_STORE_SCHEMA,
        final_curation_funnel,
        make_curation_funnel_processor,
    )
    from hha_spark.streaming.sessionize import _read_versioned

    epochs = 6 * k
    all_docs = scaled_docs(spark, epochs).select(
        "doc_id", "source", "text"
    ).localCheckpoint(eager=True)
    tmp = tempfile.mkdtemp(prefix="hha_probe_epochaxis_")
    try:
        per_epoch_write: list[float] = []
        stats: dict = {}
        proc = make_curation_funnel_processor(
            spark,
            store_root=f"{tmp}/store",
            stats=stats,
            compact_every=6,  # keep the HISTORY listing axis bounded,
            # isolating the rewrite cost under measurement
        )
        lo, hi = 0.0, 0.0
        for e in range(epochs):
            batch = all_docs.where(
                (F.col("doc_id") >= e * 1_000_000)
                & (F.col("doc_id") < (e + 1) * 1_000_000)
            )
            before = stats.get("t_write", 0.0)
            proc(batch, e)
            per_epoch_write.append(stats.get("t_write", 0.0) - before)
        cur = _read_versioned(spark, f"{tmp}/store", _CUR_STORE_SCHEMA)
        state_rows = {
            r["kind"]: r["n"]
            for r in cur.groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        third = max(1, epochs // 3)
        lo = sum(per_epoch_write[:third]) / third
        hi = sum(per_epoch_write[-third:]) / third
        EXTRA["funnel_epoch_axis"] = {
            "epochs": epochs,
            "write_sec_first_third": round(lo, 3),
            "write_sec_last_third": round(hi, 3),
            "write_growth": round(hi / max(lo, 1e-9), 2),
            "state_rows": state_rows,
            "phases": {
                n: round(v, 3)
                for n, v in stats.items()
                if isinstance(v, float)
            },
        }
        out = final_curation_funnel(spark, store_root=f"{tmp}/store")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        all_docs.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def probes(spark, k: int):
    """(name, build) pairs; build() returns a DataFrame to force."""
    from hha_spark.operators.corpus import (
        benchmark_decontaminate,
        blocklist_scrub,
        boilerplate_coverage,
        stratified_sample,
        strip_duplicate_spans,
        strip_duplicate_spans_incremental,
        temperature_mixture,
        token_budget_fill,
        winnowing_fingerprints,
    )
    from hha_spark.queries.corpus import curation_funnel
    from hha_spark.streaming.sessionize import sessionize_batch
    from hha_spark.operators.quality import (
        doc_features,
        logreg_scores,
        train_logreg_fixedpoint,
    )
    from hha_spark.operators.text import gopher_repetition_rules
    from hha_spark.operators.dedup import (
        containment_pairs,
        exact_dedup_groups,
        with_shingle_set,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        with_token_set,
    )
    from hha_spark.operators.retrieval import bm25_topk
    from hha_spark.operators.pq import (
        pq_topk,
        pq_topk_in_cells,
        pq_topk_in_cells_residual,
    )
    from hha_spark.operators.semantic import semantic_prune
    from hha_spark.operators.sketch import (
        bloom_bits,
        bloom_probe,
        classifier_scores,
        cms_counters,
        cms_estimates,
    )
    from hha_spark.operators.dq import (
        join_key_skew_report,
        robust_outlier_report,
    )
    from hha_spark.operators.similarity import cosine_pairs_arrow
    from hha_spark.operators.spike import fused_window_compare
    from hha_spark.operators.text import (
        perplexity_buckets,
        quality_score,
        source_token_divergence,
        unigram_lm_scores,
    )
    from hha_spark.streaming.windowed import windowed_counts

    ev = scaled_events(spark, k).persist()
    docs = scaled_docs(spark, k).persist()
    emb = scaled_embeddings(spark, k).persist()
    ev.count(), docs.count(), emb.count()

    bounds = ev.agg(F.max("ts_us").alias("now_us"))

    def spike():
        return fused_window_compare(
            ev.join(F.broadcast(bounds)),
            key_cols=["user_id", "event_type"], value_col="value",
            time_col="ts_us",
            cur_lower=F.col("now_us") - F.lit(2 * US_PER_DAY),
            prev_upper=F.col("now_us") - F.lit(7 * US_PER_DAY),
            q=1.5, limit_new=40, clamp_guard=True,
        )

    return {
        "spike_fused": spike,
        "dedup_exact": lambda: exact_dedup_groups(docs),
        "dedup_ngram_jaccard": lambda: jaccard_pairs(
            with_token_set(docs), with_token_set(docs),
            block_cols=["source"], threshold_num=7, threshold_den=10,
        ),
        "minhash_lsh": lambda: lsh_candidate_pairs(
            minhash_signatures(with_token_set(docs))
        ),
        "text_quality": lambda: quality_score(docs),
        "boilerplate": lambda: boilerplate_coverage(docs, k=3, min_docs_pct=1),
        "semantic_prune": lambda: semantic_prune(emb),
        # FIXED query set (copy 0 only): pair scoring is inherently
        # |Q|x|C|, so scaling the query side too would measure the
        # data shape (k^2), not the operator. With |Q| fixed both
        # should track candidate volume linearly.
        "pq_adc_topk": lambda: pq_topk(
            emb.where((F.col("vec_id") % 16 == 0)
                      & (F.col("vec_id") < 1_000_000)), emb, k=5
        ),
        "ivfpq_topk": lambda: pq_topk_in_cells(
            emb.where((F.col("vec_id") % 16 == 0)
                      & (F.col("vec_id") < 1_000_000)), emb, k=3
        ),
        "ivfpq_residual": lambda: pq_topk_in_cells_residual(
            emb.where((F.col("vec_id") % 16 == 0)
                      & (F.col("vec_id") < 1_000_000)), emb, k=3
        ),
        # fixed 125-query side (copy 0), scaled candidate side: the
        # Arrow pair kernel should track candidate volume linearly
        "cosine_arrow": lambda: cosine_pairs_arrow(
            emb.where((F.col("vec_id") % 16 == 0)
                      & (F.col("vec_id") < 1_000_000)), emb
        ),
        "cms_heavy": lambda: (
            lambda toks: cms_estimates(
                toks.distinct(), cms_counters(toks)
            )
        )(docs.select(F.explode(F.split("text", " ")).alias("token"))),
        "bloom_probe": lambda: bloom_probe(
            docs.select("doc_id"),
            bloom_bits(
                docs.where(F.col("doc_id") % 7 == 0).select("doc_id"),
                key_col="doc_id",
            ),
            key_col="doc_id",
        ),
        "classifier": lambda: classifier_scores(
            docs.select(
                "doc_id", F.explode(F.split("text", " ")).alias("token")
            )
        ),
        # vocab grows with K (per-copy token suffixes), so this
        # exercises the head/tail split with a k-times vocabulary AND
        # k-times rows — the true weak-scaling shape for the LM join
        "unigram_lm": lambda: unigram_lm_scores(docs),
        "source_divergence": lambda: source_token_divergence(docs),
        "mad_outliers": lambda: robust_outlier_report(
            ev.select("event_type", "value"),
            group_col="event_type", value_col="value",
        ),
        # fixed probe queries (the serving shape), scaled corpus: the
        # token-level semi-join prune runs below the tf aggregate, so
        # only dl (a narrow map) touches every posting
        "bm25_topk": lambda: bm25_topk(
            docs,
            [(1, ("spark_0", "join_0")), (2, ("stream_0", "window_0"))],
            k=10,
        ),
        # one-sided prefix-filtered containment over trigram shingles
        # (the gate's shape — unigram sets over the small synthetic
        # vocab qualify most pairs and measure output volume, not the
        # operator); candidate volume per copy is constant since
        # content is disjoint across copies
        "containment": lambda: containment_pairs(
            with_shingle_set(docs, n=3), tokens_col="shingles"
        ),
        # candidate volume BEFORE exact verification: out_rows for
        # this probe vs the one above separates candidate growth from
        # verified-pair growth, so "output-bound" is measured, not
        # argued (round-5 VERDICT ask)
        "containment_cands": lambda: containment_pairs(
            with_shingle_set(docs, n=3),
            tokens_col="shingles",
            candidates_only=True,
        ),
        # occurrence-linear exact-substring removal: per-copy dup
        # structure repeats, cross-copy grams are disjoint
        "strip_dup_spans": lambda: strip_duplicate_spans(docs, k=5),
        # batch fixed at copy 0, corpus scales: the admission-gate
        # cost should track the corpus's ONE index pass
        "strip_incremental": lambda: strip_duplicate_spans_incremental(
            docs.where(F.col("doc_id") < 1_000_000),
            docs,
            k=5,
        ),
        # benchmark side fixed (eval sets don't scale with the
        # corpus); train side scales — expect linear in train windows
        "decontaminate": lambda: benchmark_decontaminate(
            docs,
            docs.where(
                (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 1_000_000)
            ),
            k=5,
        ),
        "gopher_rules": lambda: gopher_repetition_rules(docs),
        # full train + serve: QC_STEPS gradient aggregates (each one
        # combinable pass over the feature frame) then a narrow map
        "logreg_trained": lambda: (
            lambda feat: logreg_scores(feat, train_logreg_fixedpoint(feat))
        )(doc_features(docs)),
        "key_skew_report": lambda: join_key_skew_report(
            ev.select("user_id"), "user_id"
        ),
        "windowed_counts": lambda: windowed_counts(
            ev.select(
                (F.col("ts_us") / 1_000_000).cast("long").alias("ts_s"),
                "event_type",
                F.floor("value").cast("long").alias("val"),
            ),
            time_col="ts_s", key_cols=("event_type",), value_col="val",
            window_sec=86_400, watermark_sec=86_400,
        ),
        # hopping variant: 4x state multiplicity, still linear in rows
        "hopping_counts": lambda: windowed_counts(
            ev.select(
                (F.col("ts_us") / 1_000_000).cast("long").alias("ts_s"),
                "event_type",
                F.floor("value").cast("long").alias("val"),
            ),
            time_col="ts_s", key_cols=("event_type",), value_col="val",
            window_sec=86_400, watermark_sec=86_400, slide_sec=21_600,
        ),
        # user-keyed gap sessionization (the streaming sessionizer's
        # per-batch kernel): one window shuffle on user_id, linear
        "sessionize": lambda: sessionize_batch(
            ev.select("user_id", "ts_us"), gap_us=12 * 3600 * 1_000_000
        ),
        # pure narrow map — the flat-line control
        "blocklist_scrub": lambda: blocklist_scrub(
            docs, ("customer_0", "vector_0", "stream_0")
        ),
        # per-stratum hash-rank window; strata count fixed, rows scale
        "stratified_sample": lambda: stratified_sample(docs, frac_pct=30),
        # one combinable groupBy(source) + broadcast totals — flat-ish
        "temperature_mixture": lambda: temperature_mixture(docs),
        # per-source rank + running-sum window; sources fixed, rows
        # scale — the same single-shuffle family as stratified_sample
        "budget_fill": lambda: token_budget_fill(docs),
        # per-language rank window over the unigram-LM scores: lang
        # count fixed, per-lang partitions grow K-fold — measures the
        # window stage on top of the skew-split vocabulary join
        "ccnet_buckets": lambda: perplexity_buckets(docs),
        # gram map + per-doc frame MIN + fingerprint-df aggregate —
        # expect linear in grams (cross-copy grams are disjoint)
        "winnowing": lambda: winnowing_fingerprints(docs, k=4, w=4),
        # the composed round-8 gate chain (gopher -> LSH dedup of the
        # survivors -> mixture -> fill): output is one row per source
        # (sources fixed across copies), so time ratio vs K measures
        # the full funnel's scaling — dominated by the banded LSH
        # pair stage, which is copy-disjoint by construction
        "curation_pipeline": lambda: curation_funnel(docs),
        # the bounded-disorder stream-stream attribution PROCESSOR
        # (streaming/joins.py) replayed over 3 disorder-delivered
        # slices of the K-scaled event stream: keys scale with K, the
        # time axis does not, so state (clicks within max_delay +
        # disorder buffer) and pairs should both scale ~K while the
        # watermark math stays fixed. EXTRA records the final state
        # rows (the boundedness claim; r8 verdict "Next round" #6).
        "attribution_disorder": lambda: _attribution_disorder_probe(
            spark, ev
        ),
        # store maintenance: K scales the EPOCH COUNT; EXTRA records
        # version-dir counts and history-read wall before/after
        # compaction (streaming/store.py) — dirs must be bounded at 3
        # after, rows identical
        "store_compaction": lambda: _store_compaction_probe(spark, k),
        # the streaming funnel PROCESSOR at fixed epoch count under
        # K-scaled batches: per-phase timers + state rows in EXTRA
        # (r9 verdict "Next round" #5)
        "stream_funnel": lambda: _stream_funnel_probe(spark, docs, k),
        # live minor folds (compact_every=1) under K-scaled data —
        # per-fold wall + dirs before/after in EXTRA (r10 verdict #5)
        "stream_funnel_compacted": lambda: _stream_funnel_compacted_probe(
            spark, docs, k
        ),
        # rewrite-cost growth of the bcnt/label state kinds on the
        # EPOCH axis (fixed batch, growing corpus) — r9 verdict #6
        "funnel_epoch_axis": lambda: _funnel_epoch_axis_probe(spark, k),
        # NOTE mutual_knn_graph is deliberately absent: its exact
        # kernel is quadratic in the NODE SET by documented contract
        # (nodes = a bounded selection; scale path = LSH/IVF candidate
        # generation), and scaled_embeddings duplicates vectors across
        # copies, which would cross-pair copies and measure the data
        # shape rather than the operator.
    }, (ev, docs, emb)


def main() -> None:
    # numeric args are K values; non-numeric args select a probe
    # subset by name (deep-K runs on the heavy ops only, without
    # paying a full 35-probe sweep at K=64)
    ks = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 4, 16]
    only = {a for a in sys.argv[1:] if not a.isdigit()}
    spark = get_spark("scale_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    results: dict[int, dict[str, float]] = {}
    rows: dict[int, dict[str, int]] = {}
    extras: dict[int, dict] = {}
    for k in ks:
        from hha_spark.caching import release_tracked

        fns, frames = probes(spark, k)
        if only:
            unknown = only - fns.keys()
            if unknown:
                raise SystemExit(f"unknown probe names: {sorted(unknown)}")
            fns = {n: f for n, f in fns.items() if n in only}
        results[k], rows[k] = {}, {}
        EXTRA.clear()
        for name, build in fns.items():
            t0 = time.perf_counter()
            df = build()
            n = df.count()
            results[k][name] = round(time.perf_counter() - t0, 3)
            rows[k][name] = n
            release_tracked()
        for f in frames:
            f.unpersist()
        extras[k] = dict(EXTRA)
        print(
            json.dumps(
                {
                    "k": k,
                    "secs": results[k],
                    "out_rows": rows[k],
                    "extra": extras[k],
                }
            )
        )

    base = ks[0]
    summary = {
        "ks": ks,
        "ratios_vs_k1": {
            name: {
                k: round(results[k][name] / max(results[base][name], 1e-9), 2)
                for k in ks
            }
            for name in results[base]
        },
        "out_rows": rows,
        "extra": extras,
    }
    os.makedirs(".benchmarks", exist_ok=True)
    with open(".benchmarks/scale_probe_last.json", "w") as f:
        json.dump({"results_sec": results, **summary}, f, indent=1)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
