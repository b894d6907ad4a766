"""Distributed lexical retrieval (BM25-family) over the corpus.

A training-data pipeline needs search over its own corpus: finding
documents matching curation probes, mining retrieval training pairs,
benchmark-decontamination by query. This module scores documents
against small keyword queries with the BM25 shape — tf saturation
(k1), length normalization (b), rarity weighting (idf) — entirely in
DataFrame operators:

    tf  = per-(doc, term) counts        one keyed aggregate (doc
                                        length rides along in the key,
                                        so no separate dl join)
    df  = per-term doc frequencies      aggregate over the (tiny)
                                        query-term subset only
    N, avgdl                            one global aggregate row,
                                        broadcast
    score terms                         broadcast joins + narrow math
    top-k                               per-query rank window

Cross-engine determinism (the oracle-gate contract): the classic
ln-based idf is replaced by its argument, the RAW ODDS RATIO
(N - df + 0.5)/(df + 0.5), quantized to micro-units. ln is monotone,
so PER-TERM orderings are identical to classic BM25 — but monotone is
not linear: once per-term contributions are SUMMED, a multi-term
query's top-k can deviate from classic ln-idf BM25 (a very rare term
is weighted relatively heavier here than under ln). This is a
documented scoring-variant deviation, chosen because floor(1e6*ln(x))
is not cross-engine hash-stable near quantization boundaries (JVM
Math.log vs libm log may differ in the last ulp), while the odds
ratio is a single correctly-rounded IEEE division on both engines —
same spirit as the repo-wide no-raw-float-SUM rule. Every division/multiply is a single
correctly-rounded IEEE double op with the same literal structure on
both engines, and the only SUM over per-term contributions happens
AFTER floor-quantization to BIGINT micro-units, so partition order
can never change a score.

Scale: the broadcast semi-join on query terms runs BELOW the tf
aggregate, so the only full-corpus work is the narrow dl map — the
(doc_id, term) aggregate sees matching postings only, map-side
combinable, keyed by doc — and the final rank window partitions by
query id. No all-pairs anything; memory per task is O(terms per doc).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75
_QI = 1_000_000  # micro-unit quantization for idf and contributions


def bm25_topk(
    docs: DataFrame,
    queries: Sequence[tuple[int, Sequence[str]]],
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents per keyword query by quantized-BM25.

    `queries` is [(query_id, [term, ...]), ...] — driver-side constant
    probe sets (the serving shape: queries are user input, never
    data-sized). Returns (query_id, doc_id, score_q, rank) with
    score_q the exact BIGINT micro-unit sum of per-term
    odds-ratio-idf x tf-saturation contributions.
    """
    spark = docs.sparkSession
    # Arrow table, not a Python RDD: the query-term list is a bounded
    # model input on the BROADCAST side of every BM25 join, and a
    # broadcast build re-evaluates its source per consumer job — a
    # Python-RDD frame pays one Python worker task (~0.2 s protocol
    # latency here) per such re-evaluation; the Arrow frame is a
    # pure-JVM scan
    from hha_spark.functions.local import arrow_rows_frame

    qterms = arrow_rows_frame(
        spark,
        [(int(qid), t) for qid, terms in queries for t in set(terms)],
        "query_id long, tok string",
    )

    # carry the doc length WITH each posting: dl is functionally
    # dependent on doc_id, so adding it to the tf grouping key keeps
    # cardinality identical while eliminating the full-corpus
    # dl-join the contribution step would otherwise need (round-5
    # ADVICE: the score-side dl lookup is now explicitly bounded by
    # matched postings, not AQE-dependent)
    # split ONCE into a named array column and derive dl BEFORE the
    # explode: expressions in the same projection as a Generate are
    # re-evaluated per generated row, so size(split(text)) inlined
    # next to explode(split(text)) costs O(len^2) per doc (measured:
    # 2.3x on the sf0.1 gate)
    with_toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("toks"),
    ).withColumn("dl", F.size("toks").cast("long"))
    toks = with_toks.select("doc_id", "dl", F.explode("toks").alias("tok"))
    consts = with_toks.select("dl").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )

    # prune postings to query terms BEFORE the tf aggregate (broadcast
    # semi-join below the groupBy — Catalyst won't reorder an
    # aggregate past a join on its own): tf and df are only ever
    # needed for the handful of probe terms, so the wide (doc, term)
    # aggregate sees matching postings only; the sole remaining
    # full-scan work is the one-row (n_docs, total_dl) aggregate
    # tfq feeds BOTH the df aggregate and the contribution join;
    # without a persist each consumer re-runs the full-corpus explode
    # + semi-join (measured: 3 FileScans of docs in the plan). The
    # frame is tiny — matched postings only — so it registers with
    # the session cache registry (hha_spark/caching.py contract).
    # Measured tradeoff (interleaved A/B at sf0.1): the persist's
    # materialization barrier costs ~0.2 s locally vs letting both
    # consumers recompute, because at 600k docs the second explode
    # pipelines cheaply — but at 100 TB the no-persist plan is two
    # full corpus scans+explodes vs one, so the cache is the
    # scale-correct choice and the local cost is accepted.
    from hha_spark.caching import tracked_persist

    tfq = tracked_persist(
        toks.join(
            F.broadcast(qterms.select("tok").distinct()),
            on="tok",
            how="left_semi",
        )
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tfq.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    # identical literal structure to the oracle SQL: each op is one
    # correctly-rounded IEEE double step, so the floor() below sees
    # bit-identical inputs on both engines
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf_q = F.floor(
        F.lit(float(_QI))
        * (
            (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
        )
    ).cast("long")
    tfnorm = (F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(BM25_K1)
        * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl)
        )
    )

    contrib = (
        tfq.join(F.broadcast(qterms), on="tok")
        .join(F.broadcast(df_), on="tok")
        .crossJoin(F.broadcast(consts))
        .select(
            "query_id",
            "doc_id",
            F.floor(idf_q.cast("double") * tfnorm).cast("long").alias("term_q"),
        )
    )
    scores = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("term_q").cast("long").alias("score_q")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_q"), F.asc("doc_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


RRF_K0 = 60  # standard reciprocal-rank-fusion damping constant
_RRF_Q = 1_000_000  # integer micro-units: points = 1e6 DIV (k0 + rank)


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    k0: int = RRF_K0,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N per-query
    rankings into one: each system contributes 1/(k0 + rank) points to
    every (query, candidate) it ranked; candidates missing from a
    system simply contribute nothing (the union-then-sum IS the outer
    join). Hybrid lexical+semantic retrieval is the canonical caller.

    Cross-engine determinism: points are quantized FIRST —
    `1_000_000 DIV (k0 + rank)` is exact BIGINT integer division on
    both engines — and only then summed, so the fused score is an
    exact integer no matter the partition order.

    Inputs are (qid, cid, rank) frames (extra columns ignored). Output
    (qid, cid, rrf_q, n_systems, fused_rank), top-k per query, ties by
    candidate id. Shuffle shape: one union (no shuffle), one keyed
    aggregate, one per-query rank window over <= N*k_in rows per query
    — the fused table is bounded by the input rankings, never by the
    corpus.
    """
    from functools import reduce

    pts = F.expr(f"{_RRF_Q} DIV ({k0} + rank)").cast("long")
    scored = [
        r.select("qid", "cid", pts.alias("pts")) for r in rankings
    ]
    fused = (
        reduce(DataFrame.unionByName, scored)
        .groupBy("qid", "cid")
        .agg(
            F.sum("pts").cast("long").alias("rrf_q"),
            F.count(F.lit(1)).cast("long").alias("n_systems"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf_q"), F.asc("cid"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .where(F.col("fused_rank") <= k)
    )


def bm25_oracle_sql(
    queries: Sequence[tuple[int, Sequence[str]]], *, k: int = 5
) -> str:
    """DuckDB twin of bm25_topk over the `documents` view — same
    literal arithmetic structure, same quantization points."""
    qvals = ", ".join(
        f"({int(qid)}, '{t}')"
        for qid, terms in queries
        for t in sorted(set(terms))
    )
    return f"""
    WITH qterms(query_id, tok) AS (VALUES {qvals}),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, tok),
    dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents),
    consts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_dl FROM dl),
    tfq AS (
      SELECT tf.* FROM tf
      WHERE tok IN (SELECT DISTINCT tok FROM qterms)),
    dfreq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tfq GROUP BY tok),
    contrib AS (
      SELECT q.query_id, t.doc_id,
             CAST(FLOOR(
               CAST(CAST(FLOOR({float(_QI)} *
                 ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5))) AS BIGINT) AS DOUBLE)
               * ((CAST(tf AS DOUBLE) * {BM25_K1 + 1.0})
                  / (CAST(tf AS DOUBLE) + {BM25_K1}
                     * ({1.0 - BM25_B} + {BM25_B}
                        * (CAST(dl AS DOUBLE)
                           / (CAST(total_dl AS DOUBLE)
                              / CAST(n_docs AS DOUBLE))))))
             ) AS BIGINT) AS term_q
      FROM tfq t
      JOIN qterms q USING (tok)
      JOIN dfreq USING (tok)
      JOIN dl USING (doc_id)
      CROSS JOIN consts),
    scores AS (
      SELECT query_id, doc_id, CAST(SUM(term_q) AS BIGINT) AS score_q
      FROM contrib GROUP BY query_id, doc_id),
    ranked AS (
      SELECT query_id, doc_id, score_q,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY score_q DESC, doc_id) AS BIGINT) AS rank
      FROM scores)
    SELECT query_id, doc_id, score_q, rank FROM ranked WHERE rank <= {k}
    """
