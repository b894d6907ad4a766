"""Driver-gate queries for the round-4 curation operators:
semantic deduplication (operators/semantic.py), boilerplate coverage
(operators/corpus.py::boilerplate_coverage), PQ/ADC and IVF x PQ
similarity (operators/pq.py), mixture-weighted resampling, and
hard-negative mining.

Same determinism contract as queries/corpus.py: integer/md5 keys,
exact integer accumulation, at most one IEEE-double division (or
sqrt-division chain over exact integers) per output value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hha_spark.operators.corpus import boilerplate_coverage
from hha_spark.operators.semantic import Q_COMP, semantic_prune
from hha_spark.sources.tables import load_table

EMB_DIM = 64  # fixture embedding width (FIXTURES.md §B)
BITS = 4
DROP_NUM, DROP_DEN = 1, 4
BOILER_K = 3
BOILER_MIN_DOCS_PCT = 1  # boilerplate = gram present in >= 1% of docs


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def semantic_prune_cells(spark, sf_dir):
    """SemDeDup keep/drop over the embeddings table: sign-bit coarse
    cells -> distributed centroid sums -> exact cosine-to-centroid ->
    per-cell redundancy ranking, dropping the closest quarter."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_prune(
        emb, bits=BITS, drop_num=DROP_NUM, drop_den=DROP_DEN
    )


_CELL_SQL = " + ".join(
    f"(CASE WHEN embedding[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
    for j in range(BITS)
)

ORACLE_SEMANTIC_PRUNE = f"""
    WITH el AS (
      SELECT vec_id, i AS idx,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {Q_COMP}) AS BIGINT) AS q
      FROM embeddings, range(1, {EMB_DIM} + 1) t(i)),
    cells AS (
      SELECT vec_id, CAST({_CELL_SQL} AS BIGINT) AS cell FROM embeddings),
    cent AS (
      SELECT cell, idx, CAST(SUM(q) AS BIGINT) AS s
      FROM el JOIN cells USING (vec_id)
      GROUP BY cell, idx),
    ncell AS (SELECT cell, COUNT(*) AS n_cell FROM cells GROUP BY cell),
    cnorm AS (
      SELECT cell,
             CAST(CAST(SUM(CAST(s AS HUGEINT) * s) AS VARCHAR) AS DOUBLE)
                 AS cent_norm
      FROM cent GROUP BY cell),
    dots AS (
      SELECT c.vec_id, c.cell,
             CAST(SUM(e.q * ct.s) AS DOUBLE) AS dot,
             CAST(SUM(e.q * e.q) AS DOUBLE) AS vnorm
      FROM cells c
      JOIN el e USING (vec_id)
      JOIN cent ct ON ct.cell = c.cell AND ct.idx = e.idx
      GROUP BY c.vec_id, c.cell),
    scored AS (
      SELECT d.vec_id, d.cell,
             d.dot / NULLIF(sqrt(d.vnorm) * sqrt(cn.cent_norm), 0)
                 AS cos_centroid,
             n.n_cell
      FROM dots d
      JOIN cnorm cn USING (cell)
      JOIN ncell n USING (cell)),
    ranked AS (
      SELECT vec_id, cell, cos_centroid,
             CAST(ROW_NUMBER() OVER (PARTITION BY cell
                                     ORDER BY cos_centroid DESC, vec_id)
                  AS BIGINT) AS cell_rank,
             CAST(n_cell AS BIGINT) AS n_cell
      FROM scored)
    SELECT vec_id, cell, cos_centroid, cell_rank, n_cell,
           CASE WHEN cell_rank >
                  CAST(FLOOR(n_cell * {DROP_NUM} / {DROP_DEN}) AS BIGINT)
                THEN 1 ELSE 0 END AS kept
    FROM ranked
"""


def corpus_boilerplate(spark, sf_dir):
    """Per-doc boilerplate token coverage (C4-style scrub signal)."""
    return boilerplate_coverage(
        _docs(spark, sf_dir), k=BOILER_K, min_docs_pct=BOILER_MIN_DOCS_PCT
    )


ORACLE_BOILERPLATE = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    occ AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+{BOILER_K - 1}], ' ')) AS gram_key
      FROM t, LATERAL (
        SELECT unnest(generate_series(1, len(toks) - {BOILER_K - 1})) AS i
      ) s),
    doc_gram AS (
      SELECT doc_id, gram_key FROM occ GROUP BY doc_id, gram_key),
    tot AS (SELECT COUNT(*) AS n_total FROM documents),
    boiler AS (
      SELECT gram_key FROM doc_gram CROSS JOIN tot
      GROUP BY gram_key, n_total
      HAVING COUNT(*) * 100 >= n_total * {BOILER_MIN_DOCS_PCT}),
    covered AS (
      SELECT o.doc_id, COUNT(DISTINCT p) AS covered_tokens
      FROM occ o
      JOIN boiler USING (gram_key),
      LATERAL (
        SELECT unnest(generate_series(o.pos, o.pos + {BOILER_K - 1})) AS p
      ) q
      GROUP BY o.doc_id),
    nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
    SELECT nt.doc_id, nt.n_tokens,
           CAST(coalesce(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
           CAST(nt.n_tokens - coalesce(c.covered_tokens, 0) AS BIGINT)
               AS clean_tokens,
           coalesce(c.covered_tokens, 0) / nt.n_tokens AS boiler_ratio
    FROM nt LEFT JOIN covered c USING (doc_id)
"""


def ann_topk_pq(spark, sf_dir):
    """PQ/ADC approximate top-k (operators/pq.py): candidates reduced
    to 8 sign-bit subspace codes, queries score them via a broadcast
    exact-integer lookup table. Same query set as the other ANN
    variants (vec_id % 16)."""
    from hha_spark.operators.pq import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk(
        emb.where(F.col("vec_id") % 16 == 0), emb, k=5, train_key=sf_dir,
        query_key="vec_id%16==0",
    )


# mirrors operators/pq.py: micro-unit quantization, (m, cell, idx)
# component sums, exact floor-div LUT terms, M-term ADC sum. The
# divisibility trick ((dot - pymod) // n) makes DuckDB's flooring //
# and Spark's truncating div agree for negative dots.
_PQ_M, _PQ_D = 8, 8
_PQ_CELL_SQL = " + ".join(
    f"{1 << j} * (CASE WHEN embedding[mm.m * {_PQ_D} + {j + 1}] >= 0"
    f" THEN 1 ELSE 0 END)"
    for j in range(_PQ_D)
)

ORACLE_ANN_PQ = f"""
    WITH el AS (
      SELECT vec_id, i - 1 AS idx, (i - 1) // {_PQ_D} AS m,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {Q_COMP}) AS BIGINT) AS q
      FROM embeddings, range(1, {EMB_DIM} + 1) t(i)),
    codes AS (
      SELECT vec_id, mm.m, ({_PQ_CELL_SQL}) AS cell
      FROM embeddings, (
        SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m) mm),
    cb AS (
      SELECT e.m, c.cell, e.idx, SUM(e.q) AS s, COUNT(*) AS n
      FROM el e JOIN codes c ON c.vec_id = e.vec_id AND c.m = e.m
      GROUP BY e.m, c.cell, e.idx),
    lut AS (
      SELECT e.vec_id AS qid, cb.m, cb.cell,
             SUM(e.q * cb.s) AS dot, MAX(cb.n) AS n
      FROM el e JOIN cb ON cb.m = e.m AND cb.idx = e.idx
      WHERE e.vec_id % 16 = 0
      GROUP BY e.vec_id, cb.m, cb.cell),
    term AS (
      SELECT qid, m, cell,
             (dot - ((dot % n + n) % n)) // n AS term
      FROM lut),
    scored AS (
      SELECT t.qid, c.vec_id AS cid, CAST(SUM(t.term) AS BIGINT) AS score
      FROM codes c JOIN term t ON t.m = c.m AND t.cell = c.cell
      WHERE t.qid <> c.vec_id
      GROUP BY t.qid, c.vec_id),
    ranked AS (
      SELECT qid, cid, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY score DESC, cid) AS BIGINT)
                 AS rank
      FROM scored)
    SELECT qid, cid, score, rank FROM ranked WHERE rank <= 5
"""


BUDGET_PCT = 50  # mixture_weights' budget (queries/corpus.py uses 50)


def ann_topk_ivfpq(spark, sf_dir):
    """IVF coarse cells x PQ compressed scoring (pq_topk_in_cells):
    each query scores only its own cell's candidates, via the ADC
    lookup table — the composition a billion-vector index runs."""
    from hha_spark.operators.pq import pq_topk_in_cells

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk_in_cells(
        emb.where(F.col("vec_id") % 16 == 0), emb, k=3, coarse_bits=BITS,
        train_key=sf_dir, query_key="vec_id%16==0",
    )


ORACLE_ANN_IVFPQ = f"""
    WITH el AS (
      SELECT vec_id, i - 1 AS idx, (i - 1) // {{pq_d}} AS m,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {{q_comp}}) AS BIGINT) AS q
      FROM embeddings, range(1, {{emb_dim}} + 1) t(i)),
    codes AS (
      SELECT vec_id, mm.m, ({{pq_cell}}) AS cell
      FROM embeddings, (
        SELECT unnest(generate_series(0, {{pq_m}} - 1)) AS m) mm),
    coarse AS (
      SELECT vec_id, CAST({{coarse_cell}} AS BIGINT) AS ccell FROM embeddings),
    -- multi-probe: own cell + every hamming-1 neighbor (bit flips)
    qprobe AS (
      SELECT vec_id, unnest([ccell, xor(ccell, 1), xor(ccell, 2),
                             xor(ccell, 4), xor(ccell, 8)]) AS pcell
      FROM coarse),
    cb AS (
      SELECT e.m, c.cell, e.idx, SUM(e.q) AS s, COUNT(*) AS n
      FROM el e JOIN codes c ON c.vec_id = e.vec_id AND c.m = e.m
      GROUP BY e.m, c.cell, e.idx),
    lut AS (
      SELECT e.vec_id AS qid, cb.m, cb.cell,
             SUM(e.q * cb.s) AS dot, MAX(cb.n) AS n
      FROM el e JOIN cb ON cb.m = e.m AND cb.idx = e.idx
      WHERE e.vec_id % 16 = 0
      GROUP BY e.vec_id, cb.m, cb.cell),
    term AS (
      SELECT qid, m, cell,
             (dot - ((dot % n + n) % n)) // n AS term
      FROM lut),
    scored AS (
      SELECT t.qid, c.vec_id AS cid, CAST(SUM(t.term) AS BIGINT) AS score
      FROM codes c
      JOIN term t ON t.m = c.m AND t.cell = c.cell
      JOIN qprobe cq ON cq.vec_id = t.qid
      JOIN coarse cc ON cc.vec_id = c.vec_id AND cc.ccell = cq.pcell
      WHERE t.qid <> c.vec_id
      GROUP BY t.qid, c.vec_id),
    ranked AS (
      SELECT qid, cid, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY score DESC, cid) AS BIGINT)
                 AS rank
      FROM scored)
    SELECT qid, cid, score, rank FROM ranked WHERE rank <= 3
""".format(
    pq_d=_PQ_D, pq_m=_PQ_M, q_comp=Q_COMP, emb_dim=EMB_DIM,
    pq_cell=_PQ_CELL_SQL, coarse_cell=_CELL_SQL,
)


def ann_pq_recall(spark, sf_dir):
    """Measured PQ quality: of the exact brute-force top-5 pairs, how
    many does ADC scoring recover? Same 'measure, don't guess'
    contract as ann_ivf_recall / dedup_minhash_recall — the
    probabilistic path is gated by a NUMBER the oracle reproduces
    exactly, not by a hand-waved claim. One persisted embeddings
    frame feeds both arms."""
    from hha_spark.caching import tracked_persist
    from hha_spark.operators.pq import pq_topk
    from hha_spark.operators.similarity import cosine_topk

    emb = tracked_persist(load_table(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") % 16 == 0)
    exact = cosine_topk(queries, emb, k=5).select("qid", "cid")
    pq = pq_topk(
        queries, emb, k=5, train_key=sf_dir, query_key="vec_id%16==0"
    ).select(
        "qid", "cid", F.lit(1).alias("found")
    )
    joined = exact.join(pq, on=["qid", "cid"], how="left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("found").alias("n_found"),
        (F.count("found") / F.count(F.lit(1))).alias("recall"),
    )


# brute-force oracle fragment (same as llm_ops ORACLE_ANN, top-5)
_ORACLE_EXACT5 = f"""
    WITH el AS (
      SELECT vec_id, i AS idx, embedding[i] AS v
      FROM embeddings, range(1, {EMB_DIM} + 1) t(i)),
    q_el AS (SELECT * FROM el WHERE vec_id % 16 = 0),
    dots AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid, {{dot}} AS dot
      FROM q_el a JOIN el b USING (idx) GROUP BY a.vec_id, b.vec_id),
    norms AS (SELECT vec_id, {{norm}} AS norm_sq FROM el GROUP BY vec_id),
    sims AS (
      SELECT qid, cid,
             dot / NULLIF(sqrt(qn.norm_sq) * sqrt(cn.norm_sq), 0) AS cosine
      FROM dots JOIN norms qn ON qn.vec_id = qid
                JOIN norms cn ON cn.vec_id = cid
      WHERE qid <> cid),
    ranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, cid) AS rank
      FROM sims)
    SELECT qid, cid FROM ranked WHERE rank <= 5
"""


def corpus_importance_resample(spark, sf_dir):
    """The downsampling ACT that `corpus_mixture_weights` only plans:
    every document of an over-budget source is kept with its source's
    computed probability, via the salted-md5 uniform (reproducible on
    any cluster/partitioning — seeded RNG is not). The keep test is
    pure integer cross-multiplication (bucket * n_tokens <
    target * 1000, or source under budget), so the boundary is exact
    in both engines — the per-source float `weight` is never compared.

    Plan: mixture_weights is one groupBy over sources + a broadcast
    1-row total; its per-source frame broadcasts back onto the narrow
    doc scan. No data-sized shuffle at all — the decision for 100 TB
    of docs is a map against a dimension table.
    """
    from hha_spark.operators.corpus import mixture_weights

    docs = _docs(spark, sf_dir)
    w = mixture_weights(docs, budget_frac_pct=BUDGET_PCT).select(
        "source", "n_tokens", "target_tokens"
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("resample|"), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % 1000
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("bucket", bucket)
        .join(F.broadcast(w), on="source")
        .where(
            (F.col("n_tokens") <= F.col("target_tokens"))
            | (F.col("bucket") * F.col("n_tokens")
               < F.col("target_tokens") * 1000)
        )
        .select("doc_id", "source", F.col("bucket").cast("long").alias("bucket"))
    )


ORACLE_IMPORTANCE_RESAMPLE = f"""
    WITH per_source AS (
      SELECT source, SUM(len(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY source),
    tot AS (
      SELECT SUM(n_tokens) AS total_tokens, COUNT(*) AS n_sources
      FROM per_source),
    w AS (
      SELECT source, n_tokens,
             (total_tokens * {BUDGET_PCT}) // (100 * n_sources)
                 AS target_tokens
      FROM per_source, tot),
    b AS (
      SELECT doc_id, source,
             CAST(CAST('0x' || substr(
                 md5('resample|' || CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 1000 AS BIGINT) AS bucket
      FROM documents)
    SELECT b.doc_id, b.source, b.bucket
    FROM b JOIN w USING (source)
    WHERE w.n_tokens <= w.target_tokens
       OR b.bucket * w.n_tokens < w.target_tokens * 1000
"""


def ann_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each query
    vector, the top-3 most cosine-similar candidates with a DIFFERENT
    label — the near-misses that make the best negatives (in-batch
    random negatives are too easy). Exact quantized kernel over the
    broadcast query side; the label inequality filters BEFORE ranking
    so the window sees only eligible pairs.

    Scale: the bounded query set closes over an Arrow kernel
    (cosine_pairs_arrow — the MLlib broadcast-model shape, one narrow
    mapInPandas over the candidate side, candidate label carried
    through the kernel so only the tiny query-label join remains); at
    100 TB swap the candidate set for the IVF/PQ-pruned one — the
    label filter and ranking are unchanged.
    """
    from hha_spark.operators.similarity import cosine_pairs_arrow
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 16 == 0)
    sims = cosine_pairs_arrow(
        queries, emb, passthrough=("label",)
    ).withColumnRenamed("label", "label_c")
    qlabels = queries.select(
        F.col("vec_id").alias("qid"), F.col("label").alias("label_q")
    )
    labeled = sims.join(F.broadcast(qlabels), on="qid").where(
        F.col("label_q") != F.col("label_c")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        labeled.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("qid", "cid", "label_q", "label_c", "cosine", "rank")
    )


# same quantized-dot fragments as ORACLE_ANN (queries/llm_ops.py)
_Q_PAIR = 1_000_000_000_000
_DOT_SQL = (
    f"CAST(SUM(CAST(FLOOR(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)"
    f" * {_Q_PAIR}) AS BIGINT)) AS DOUBLE)"
)
_NORM_SQL = (
    f"CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)"
    f" * {_Q_PAIR}) AS BIGINT)) AS DOUBLE)"
)

ORACLE_HARD_NEGATIVES = f"""
    WITH el AS (
      SELECT vec_id, i AS idx, embedding[i] AS v
      FROM embeddings, range(1, {EMB_DIM} + 1) t(i)),
    q_el AS (SELECT * FROM el WHERE vec_id % 16 = 0),
    dots AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid, {_DOT_SQL} AS dot
      FROM q_el a JOIN el b USING (idx) GROUP BY a.vec_id, b.vec_id),
    norms AS (SELECT vec_id, {_NORM_SQL} AS norm_sq FROM el GROUP BY vec_id),
    sims AS (
      SELECT qid, cid, dot / NULLIF(sqrt(qn.norm_sq) * sqrt(cn.norm_sq), 0)
                 AS cosine
      FROM dots JOIN norms qn ON qn.vec_id = qid
                JOIN norms cn ON cn.vec_id = cid),
    labeled AS (
      SELECT s.qid, s.cid, lq.label AS label_q, lc.label AS label_c, s.cosine
      FROM sims s
      JOIN embeddings lq ON lq.vec_id = s.qid
      JOIN embeddings lc ON lc.vec_id = s.cid
      WHERE lq.label <> lc.label),
    ranked AS (
      SELECT qid, cid, label_q, label_c, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY cosine DESC, cid) AS BIGINT)
                 AS rank
      FROM labeled)
    SELECT * FROM ranked WHERE rank <= 3
"""


ORACLE_PQ_RECALL = f"""
    WITH exact5 AS (
      SELECT qid, cid FROM (
        {_ORACLE_EXACT5.format(dot=_DOT_SQL, norm=_NORM_SQL)})),
    pq5 AS (SELECT qid, cid FROM ({ORACLE_ANN_PQ}))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(p.cid) AS BIGINT) AS n_found,
           COUNT(p.cid) / COUNT(*) AS recall
    FROM exact5 e LEFT JOIN pq5 p ON e.qid = p.qid AND e.cid = p.cid
"""


QUERIES = {
    "semantic_prune_cells": semantic_prune_cells,
    "corpus_boilerplate": corpus_boilerplate,
    "ann_topk_pq": ann_topk_pq,
    "ann_topk_ivfpq": ann_topk_ivfpq,
    "ann_pq_recall": ann_pq_recall,
    "corpus_importance_resample": corpus_importance_resample,
    "ann_hard_negatives": ann_hard_negatives,
}

ORACLES = {
    "semantic_prune_cells": ORACLE_SEMANTIC_PRUNE,
    "corpus_boilerplate": ORACLE_BOILERPLATE,
    "ann_topk_pq": ORACLE_ANN_PQ,
    "ann_topk_ivfpq": ORACLE_ANN_IVFPQ,
    "ann_pq_recall": ORACLE_PQ_RECALL,
    "corpus_importance_resample": ORACLE_IMPORTANCE_RESAMPLE,
    "ann_hard_negatives": ORACLE_HARD_NEGATIVES,
}


DRIFT_COS_T = "0.5"  # SQL literal; also used as the Python float below


def dedup_text_embedding_drift(spark, sf_dir):
    """Cross-modal consistency diagnostic: verified MinHash near-dup
    TEXT pairs (Jaccard >= 0.7) scored with their embedding cosine —
    pairs whose embeddings DISAGREE (cosine < 0.5) are flagged as
    drift. In a real pipeline this catches a broken embedding run or
    a stale index: text-identical docs with dissimilar vectors mean
    one modality is lying, and downstream semantic dedup / ANN built
    on those vectors silently diverges from the text-level truth.

    Composes two verified stacks end-to-end: the LSH pair generator
    (operators/dedup.py, candidate count linear via the bucket cap)
    and the exact pair kernel (cosine_pairs_for — two equi-joins
    attach vectors to the bounded pair set, cost tracks candidates).
    The fixture's doc_id and vec_id share the 0..N id space
    (TESTDATA.md), the same linkage a production corpus keeps between
    a document store and its embedding table. On this synthetic
    fixture the diagnostic fires on EVERY near-dup pair (cosines all
    in [-0.42, 0.44] at sf0.01): the fixture's embeddings genuinely
    do not encode text similarity, which is exactly the condition the
    check exists to expose.
    """
    from hha_spark.operators.dedup import with_token_set
    from hha_spark.operators.similarity import cosine_pairs_for
    from hha_spark.queries.llm_ops import _minhash_lsh_from

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = _minhash_lsh_from(with_token_set(docs))
    sims = cosine_pairs_for(
        pairs, emb, a_col="doc_id_a", b_col="doc_id_b"
    )
    return sims.select(
        "doc_id_a",
        "doc_id_b",
        "inter_size",
        "union_size",
        "cosine",
        (F.col("cosine") < float(DRIFT_COS_T)).alias("drift"),
    )


def _oracle_drift() -> str:
    from hha_spark.queries.llm_ops import ORACLE_MINHASH

    return f"""
    WITH p AS ({ORACLE_MINHASH}),
    el AS (
      SELECT vec_id, i AS idx, embedding[i] AS v
      FROM embeddings, range(1, {EMB_DIM} + 1) t(i)),
    norms AS (SELECT vec_id, {_NORM_SQL} AS norm_sq FROM el GROUP BY vec_id),
    dots AS (
      SELECT p.doc_id_a, p.doc_id_b, p.inter_size, p.union_size,
             {_DOT_SQL} AS dot
      FROM p
      JOIN el a ON a.vec_id = p.doc_id_a
      JOIN el b ON b.vec_id = p.doc_id_b AND b.idx = a.idx
      GROUP BY 1, 2, 3, 4),
    scored AS (
      SELECT d.doc_id_a, d.doc_id_b, d.inter_size, d.union_size,
             d.dot / NULLIF(sqrt(na.norm_sq) * sqrt(nb.norm_sq), 0)
                 AS cosine
      FROM dots d
      JOIN norms na ON na.vec_id = d.doc_id_a
      JOIN norms nb ON nb.vec_id = d.doc_id_b)
    SELECT doc_id_a, doc_id_b, inter_size, union_size, cosine,
           cosine < {DRIFT_COS_T} AS drift
    FROM scored
"""


QUERIES["dedup_text_embedding_drift"] = dedup_text_embedding_drift
ORACLES["dedup_text_embedding_drift"] = _oracle_drift()


def pretraining_corpus_selection(spark, sf_dir):
    """The capstone keep/drop decision: one row per document with the
    verdict of each curation stage and the final selection —

      nd_keep  : exact/near-dup survivorship (MinHash-LSH pairs ->
                 connected components; survivor = the cluster's
                 min-id member, singletons keep themselves)
      clf_keep : hashed linear quality classifier score > 0
      rs_keep  : mixture-weighted importance resampling membership
      selected : all three

    This is the query a user runs to materialize a pretraining corpus
    and to audit WHY any document was dropped. Every stage is the
    already-verified operator (dedup_clusters, quality_classifier_keep,
    corpus_importance_resample); the composition is three doc-keyed
    left joins onto the document scan — no new shuffle shapes, so the
    100 TB cost is the sum of the parts.
    """
    from hha_spark.operators.cluster import cluster_members
    from hha_spark.operators.dedup import with_token_set
    from hha_spark.operators.sketch import classifier_scores
    from hha_spark.queries.llm_ops import _minhash_lsh_from

    docs = _docs(spark, sf_dir)
    pairs = _minhash_lsh_from(with_token_set(docs)).select(
        "doc_id_a", "doc_id_b"
    )
    members = cluster_members(pairs).select("doc_id", "cluster_id")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    clf = classifier_scores(toks).select("doc_id", "keep")
    rs = corpus_importance_resample(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("__rs")
    )
    out = (
        docs.select("doc_id", "source")
        .join(members, on="doc_id", how="left")
        .join(clf, on="doc_id", how="left")
        .join(rs, on="doc_id", how="left")
        .select(
            "doc_id",
            "source",
            (
                F.col("cluster_id").isNull()
                | (F.col("cluster_id") == F.col("doc_id"))
            ).alias("nd_keep"),
            F.coalesce("keep", F.lit(False)).alias("clf_keep"),
            F.coalesce("__rs", F.lit(False)).alias("rs_keep"),
        )
    )
    return out.withColumn(
        "selected",
        F.col("nd_keep") & F.col("clf_keep") & F.col("rs_keep"),
    )


def _oracle_selection() -> str:
    from hha_spark.queries.llm_ops import ORACLE_CLUSTERS
    from hha_spark.queries.sketches import ORACLE_CLASSIFIER

    return f"""
    WITH clustered AS ({ORACLE_CLUSTERS}),
    clf AS ({ORACLE_CLASSIFIER}),
    rs AS ({ORACLE_IMPORTANCE_RESAMPLE})
    SELECT d.doc_id, d.source,
           (c.doc_id IS NULL OR c.cluster_id = d.doc_id) AS nd_keep,
           COALESCE(clf.keep, FALSE) AS clf_keep,
           (r.doc_id IS NOT NULL) AS rs_keep,
           ((c.doc_id IS NULL OR c.cluster_id = d.doc_id)
            AND COALESCE(clf.keep, FALSE)
            AND r.doc_id IS NOT NULL) AS selected
    FROM documents d
    LEFT JOIN clustered c ON c.doc_id = d.doc_id
    LEFT JOIN clf ON clf.doc_id = d.doc_id
    LEFT JOIN rs r ON r.doc_id = d.doc_id
"""


QUERIES["pretraining_corpus_selection"] = pretraining_corpus_selection
ORACLES["pretraining_corpus_selection"] = _oracle_selection()


# --- corpus lifecycle: deterministic shuffle-shard and snapshot diff -----

N_SHARDS = 16


def corpus_global_shuffle(spark, sf_dir):
    """Deterministic training-order shuffle + shard assignment — the
    last step before a corpus ships to the trainer. Order must be (a)
    uniformly random w.r.t. any curation key and (b) REPRODUCIBLE
    across reruns/partitionings, so the shuffle key is a salted md5 of
    doc_id (the same uniform used by `corpus_importance_resample`),
    never an RNG. shard = key mod N_SHARDS balances output files;
    pos_in_shard is a row_number per shard ordered by (key, doc_id).

    100 TB shape: one hash-partition on shard (bounded fan-in: shards
    >= output files, each a single writer's worth) with a WITHIN-SHARD
    sort — there is no global total order anywhere, so no
    rangepartition/global sort bottleneck; this is exactly how
    training shards are materialized in practice.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shuffle|"), F.col("doc_id").cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    keyed = docs.select(
        "doc_id", "source", key.alias("shuffle_key")
    ).withColumn("shard", F.col("shuffle_key") % N_SHARDS)
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return keyed.withColumn(
        "pos_in_shard", F.row_number().over(w).cast("long")
    )


ORACLE_GLOBAL_SHUFFLE = f"""
    WITH keyed AS (
      SELECT doc_id, source,
             CAST(CAST('0x' || substr(
                 md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) AS BIGINT) AS shuffle_key
      FROM documents)
    SELECT doc_id, source, shuffle_key,
           shuffle_key % {N_SHARDS} AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY shuffle_key % {N_SHARDS}
               ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos_in_shard
    FROM keyed
"""


def corpus_snapshot_diff(spark, sf_dir):
    """Incremental-recrawl ingest diff: classify every document as
    added / removed / changed / unchanged between two corpus
    snapshots by comparing content fingerprints (md5 of text) under a
    full outer join on doc_id. This is the op that decides how much
    of a re-crawl actually needs re-processing — at 100 TB you dedup/
    score only `added` + `changed`, never the unchanged bulk.

    The two snapshots derive deterministically from the fixture (no
    second table exists): `prev` drops every 20th doc (docs that will
    appear "added") and `cur` revises every 7th doc's text (docs that
    read "changed"). The derivation is synthetic; the join/compare
    shape is the production one — one full outer equi-join on the id,
    fingerprint comparison in-row, no data-sized state anywhere else.
    """
    docs = _docs(spark, sf_dir)
    prev = docs.where(F.col("doc_id") % 20 != 0).select(
        "doc_id", F.md5("text").alias("fp_prev")
    )
    cur = docs.select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            ).otherwise(F.col("text"))
        ).alias("fp_cur"),
    )
    joined = prev.join(cur, on="doc_id", how="full_outer")
    status = (
        F.when(F.col("fp_prev").isNull(), "added")
        .when(F.col("fp_cur").isNull(), "removed")
        .when(F.col("fp_prev") != F.col("fp_cur"), "changed")
        .otherwise("unchanged")
    )
    return joined.select("doc_id", status.alias("status"))


ORACLE_SNAPSHOT_DIFF = """
    WITH prev AS (
      SELECT doc_id, md5(text) AS fp_prev FROM documents
      WHERE doc_id % 20 <> 0),
    cur AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
                      ELSE text END) AS fp_cur
      FROM documents)
    SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
           CASE WHEN p.fp_prev IS NULL THEN 'added'
                WHEN c.fp_cur IS NULL THEN 'removed'
                WHEN p.fp_prev <> c.fp_cur THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
"""


QUERIES["corpus_global_shuffle"] = corpus_global_shuffle
ORACLES["corpus_global_shuffle"] = ORACLE_GLOBAL_SHUFFLE
QUERIES["corpus_snapshot_diff"] = corpus_snapshot_diff
ORACLES["corpus_snapshot_diff"] = ORACLE_SNAPSHOT_DIFF


def ann_topk_ivfpq_residual(spark, sf_dir):
    """IVF x PQ with residual encoding (IVFADC, Jégou et al. §V):
    candidates store codes of v - centroid(cell); pair score = exact
    centroid dot + residual ADC. See
    operators/pq.py::pq_topk_in_cells_residual for the decomposition
    and the broadcast-only join topology."""
    from hha_spark.operators.pq import pq_topk_in_cells_residual

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk_in_cells_residual(
        emb.where(F.col("vec_id") % 16 == 0), emb, k=3, coarse_bits=BITS
    )


ORACLE_ANN_IVFPQ_RESIDUAL = f"""
    WITH el AS (
      SELECT vec_id, i - 1 AS idx, (i - 1) // {_PQ_D} AS m,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {Q_COMP}) AS BIGINT)
                 AS q
      FROM embeddings, range(1, {EMB_DIM} + 1) t(i)),
    coarse AS (
      SELECT vec_id, CAST({_CELL_SQL} AS BIGINT) AS ccell FROM embeddings),
    centsum AS (
      SELECT c.ccell, e.idx, SUM(e.q) AS s, COUNT(*) AS n
      FROM el e JOIN coarse c USING (vec_id)
      GROUP BY c.ccell, e.idx),
    -- exact floor-div centroid means (pymod trick: same value under
    -- truncating and flooring division)
    cent AS (
      SELECT ccell, idx, (s - ((s % n + n) % n)) // n AS cm FROM centsum),
    rel AS (
      SELECT e.vec_id, e.idx, e.m, e.q - ct.cm AS r, c.ccell
      FROM el e
      JOIN coarse c USING (vec_id)
      JOIN cent ct ON ct.ccell = c.ccell AND ct.idx = e.idx),
    rcodes AS (
      SELECT vec_id, m,
             CAST(SUM((CASE WHEN r >= 0 THEN 1 ELSE 0 END)
                      * (1 << (idx % {_PQ_D}))) AS BIGINT) AS rcell
      FROM rel GROUP BY vec_id, m),
    rcb AS (
      SELECT rl.m, rc.rcell AS cell, rl.idx,
             SUM(rl.r) AS s, COUNT(*) AS n
      FROM rel rl
      JOIN rcodes rc ON rc.vec_id = rl.vec_id AND rc.m = rl.m
      GROUP BY rl.m, rc.rcell, rl.idx),
    lut AS (
      SELECT e.vec_id AS qid, cb.m, cb.cell,
             SUM(e.q * cb.s) AS dot, MAX(cb.n) AS n
      FROM el e JOIN rcb cb ON cb.m = e.m AND cb.idx = e.idx
      WHERE e.vec_id % 16 = 0
      GROUP BY e.vec_id, cb.m, cb.cell),
    term AS (
      SELECT qid, m, cell,
             (dot - ((dot % n + n) % n)) // n AS term
      FROM lut),
    qcent AS (
      SELECT e.vec_id AS qid, ct.ccell AS cell, SUM(e.q * ct.cm) AS qc
      FROM el e JOIN cent ct ON ct.idx = e.idx
      WHERE e.vec_id % 16 = 0
      GROUP BY e.vec_id, ct.ccell),
    qprobe AS (
      SELECT vec_id, unnest([ccell, xor(ccell, 1), xor(ccell, 2),
                             xor(ccell, 4), xor(ccell, 8)]) AS pcell
      FROM coarse WHERE vec_id % 16 = 0),
    scored AS (
      SELECT t.qid, rc.vec_id AS cid,
             CAST(SUM(t.term) + MIN(qc.qc) AS BIGINT) AS score
      FROM rcodes rc
      JOIN coarse cc ON cc.vec_id = rc.vec_id
      JOIN qprobe qp ON qp.pcell = cc.ccell
      JOIN term t ON t.qid = qp.vec_id AND t.m = rc.m AND t.cell = rc.rcell
      JOIN qcent qc ON qc.qid = qp.vec_id AND qc.cell = cc.ccell
      WHERE qp.vec_id <> rc.vec_id
      GROUP BY t.qid, rc.vec_id),
    ranked AS (
      SELECT qid, cid, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY score DESC, cid) AS BIGINT)
                 AS rank
      FROM scored)
    SELECT qid, cid, score, rank FROM ranked WHERE rank <= 3
"""


QUERIES["ann_topk_ivfpq_residual"] = ann_topk_ivfpq_residual
ORACLES["ann_topk_ivfpq_residual"] = ORACLE_ANN_IVFPQ_RESIDUAL


RERANK_SHORTLIST = 8


def ann_two_stage_rerank(spark, sf_dir):
    """Two-stage retrieval — THE production ANN serving shape: the
    compressed index (residual IVFADC) proposes a cheap shortlist of
    8 candidates per query, then ONLY those pairs are re-scored with
    the exact cosine kernel and cut to the final top-3. The expensive
    exact math runs on |Q| x 8 pairs instead of |Q| x |corpus| — the
    rerank cost is independent of corpus size, which is what makes
    exact-quality results affordable behind a billion-vector index.

    Plan: the shortlist plumbing is pq_topk_in_cells_residual
    unchanged; rerank is two equi-joins attaching vectors to the
    bounded pair set (cosine_pairs_for) + one per-query window.
    """
    from pyspark.sql import Window

    from hha_spark.operators.pq import pq_topk_in_cells_residual
    from hha_spark.operators.similarity import cosine_pairs_for

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 16 == 0)
    shortlist = pq_topk_in_cells_residual(
        q, emb, k=RERANK_SHORTLIST, coarse_bits=BITS
    ).select("qid", "cid")
    scored = cosine_pairs_for(shortlist, emb, a_col="qid", b_col="cid")
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("qid", "cid", "cosine", "rank")
    )


# the shortlist oracle is the residual-IVFADC oracle with its final
# cut widened from 3 to the shortlist size (single final WHERE)
_SHORTLIST_SQL = ORACLE_ANN_IVFPQ_RESIDUAL.replace(
    "WHERE rank <= 3", f"WHERE rank <= {RERANK_SHORTLIST}"
)

ORACLE_TWO_STAGE = f"""
    WITH short AS (SELECT qid, cid FROM ({_SHORTLIST_SQL})),
    el AS (
      SELECT vec_id, i AS idx, embedding[i] AS v
      FROM embeddings, range(1, {EMB_DIM} + 1) t(i)),
    dots AS (
      SELECT s.qid, s.cid, {{dot}} AS dot
      FROM short s
      JOIN el a ON a.vec_id = s.qid
      JOIN el b ON b.vec_id = s.cid AND b.idx = a.idx
      GROUP BY s.qid, s.cid),
    norms AS (SELECT vec_id, {{norm}} AS norm_sq FROM el GROUP BY vec_id),
    sims AS (
      SELECT qid, cid,
             dot / NULLIF(sqrt(qn.norm_sq) * sqrt(cn.norm_sq), 0) AS cosine
      FROM dots JOIN norms qn ON qn.vec_id = qid
                JOIN norms cn ON cn.vec_id = cid),
    ranked AS (
      SELECT qid, cid, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY cosine DESC, cid) AS BIGINT)
                 AS rank
      FROM sims)
    SELECT qid, cid, cosine, rank FROM ranked WHERE rank <= 3
"""


QUERIES["ann_two_stage_rerank"] = ann_two_stage_rerank
ORACLES["ann_two_stage_rerank"] = ORACLE_TWO_STAGE.format(
    dot=_DOT_SQL, norm=_NORM_SQL
)
