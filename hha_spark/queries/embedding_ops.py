"""Driver-gate queries for the embedding-lifecycle operators: SQ8
scalar quantization (operators/sq.py), semantic decontamination,
cluster-mixture curation reporting, and corpus embedding health
diagnostics.

Same determinism contract as the rest of the registry: bounds are
arithmetic-free MIN/MAX, codes are fixed-order IEEE double chains +
FLOOR, scores are BIGINT sums, ratios are single divisions of exact
integers, and the one DECIMAL(38,0) value crosses to DOUBLE through a
string cast (see functions/exact.py's 2^53 note).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hha_spark.caching import tracked_persist
from hha_spark.operators.semantic import signbit_cell
from hha_spark.operators.similarity import (
    cosine_pairs,
    cosine_topk,
    norm_sq_scaled,
)
from hha_spark.operators.sq import sq_bounds, sq_topk
from hha_spark.sources.tables import load_table

EMB_DIM = 64
SQ_K = 5
# eval split: every 10th vector plays the held-out benchmark
EVAL_MOD = 10
# semantic contamination flag threshold (max observed cross-split
# cosine in the fixture is ~0.49; 0.40 exercises both branches)
DECON_T = 0.40
MIX_BITS = 4
# center quantization for the health report (micro-units)
_CQ = 1_000_000

_EMB_EL = f"""
      SELECT vec_id, i AS idx, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, range(1, {EMB_DIM} + 1) t(i)
"""
# mirrors operators/similarity.py picounit kernel
_Q = 1_000_000_000_000
_DOT_SQL = (
    f"CAST(SUM(CAST(FLOOR(a.v * b.v * {_Q}) AS BIGINT)) AS DOUBLE)"
)
_NORM_SQL = f"CAST(SUM(CAST(FLOOR(v * v * {_Q}) AS BIGINT)) AS DOUBLE)"

# mirrors operators/sq.py::sq_encode: fixed-order (v - mn) * 255 /
# (mx - mn), floored then clamped; degenerate dims -> midpoint
_SQ_CODES = """
    stats AS (SELECT idx, MIN(v) AS mn, MAX(v) AS mx FROM el GROUP BY idx),
    codes AS (
      SELECT vec_id, idx,
             CASE WHEN mx = mn THEN 128
                  ELSE LEAST(255, GREATEST(0,
                         CAST(FLOOR((v - mn) * 255 / (mx - mn)) AS BIGINT)))
             END AS code
      FROM el JOIN stats USING (idx))
"""


def _emb(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # fixture is one row group; fan the scan out (same rationale as
    # queries/llm_ops.py::_emb)
    return emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")


def ann_topk_sq8(spark, sf_dir):
    """Top-5 neighbours by centered SQ8 (int8) dot product — the
    4x-compressed middle rung between the exact picounit kernel and
    PQ's 8-byte codes. Bounds are a 64-row model artifact; encoding
    is a narrow map; the query side broadcasts (operators/sq.py)."""
    emb = tracked_persist(_emb(spark, sf_dir))
    bounds = sq_bounds(emb)
    queries = emb.where(F.col("vec_id") % 16 == 0)
    return sq_topk(queries, emb, bounds, k=SQ_K)


ORACLE_SQ8 = f"""
    WITH el AS ({_EMB_EL}),
    {_SQ_CODES},
    q AS (SELECT * FROM codes WHERE vec_id % 16 = 0),
    dots AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid,
             CAST(SUM((a.code - 128) * (b.code - 128)) AS BIGINT)
               AS sq_score
      FROM q a JOIN codes b USING (idx)
      WHERE a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id),
    ranked AS (
      SELECT qid, cid, sq_score,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY sq_score DESC, cid)
                  AS BIGINT) AS rank
      FROM dots)
    SELECT * FROM ranked WHERE rank <= {SQ_K}
"""


def ann_sq8_recall(spark, sf_dir):
    """Measured SQ8 quality: how much of the exact brute-force top-5
    does the int8 path recover? Same 'measure, don't guess' contract
    as ann_pq_recall / ann_ivf_recall; one persisted embeddings frame
    feeds both arms."""
    emb = tracked_persist(_emb(spark, sf_dir))
    bounds = sq_bounds(emb)
    queries = emb.where(F.col("vec_id") % 16 == 0)
    exact = cosine_topk(queries, emb, k=SQ_K).select("qid", "cid")
    sq = sq_topk(queries, emb, bounds, k=SQ_K).select(
        "qid", "cid", F.lit(1).alias("found")
    )
    joined = exact.join(sq, on=["qid", "cid"], how="left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("found").alias("n_found"),
        (F.count("found") / F.count(F.lit(1))).alias("recall"),
    )


ORACLE_SQ8_RECALL = f"""
    WITH el AS ({_EMB_EL}),
    q_el AS (SELECT * FROM el WHERE vec_id % 16 = 0),
    dots AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid, {_DOT_SQL} AS dot
      FROM q_el a JOIN el b USING (idx) GROUP BY a.vec_id, b.vec_id),
    norms AS (SELECT vec_id, {_NORM_SQL} AS norm_sq FROM el GROUP BY vec_id),
    sims AS (
      SELECT qid, cid,
             dot / NULLIF(sqrt(qn.norm_sq) * sqrt(cn.norm_sq), 0) AS cosine
      FROM dots JOIN norms qn ON qn.vec_id = qid
                JOIN norms cn ON cn.vec_id = cid
      WHERE qid <> cid),
    exact AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, cid) AS rank
        FROM sims) WHERE rank <= {SQ_K}),
    {_SQ_CODES},
    qc AS (SELECT * FROM codes WHERE vec_id % 16 = 0),
    sq_dots AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid,
             SUM((a.code - 128) * (b.code - 128)) AS sq_score
      FROM qc a JOIN codes b USING (idx)
      WHERE a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id),
    sq AS (
      SELECT qid, cid, 1 AS found FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sq_score DESC, cid) AS rank
        FROM sq_dots) WHERE rank <= {SQ_K})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(sq.found) AS BIGINT) AS n_found,
           CAST(COUNT(sq.found) AS DOUBLE) / COUNT(*) AS recall
    FROM exact LEFT JOIN sq USING (qid, cid)
"""


def corpus_semantic_decontaminate(spark, sf_dir):
    """Embedding-space benchmark decontamination: flag TRAINING docs
    whose embedding sits too close to any held-out eval doc — the
    paraphrase-contamination layer that n-gram overlap
    (corpus_decontaminate) structurally misses.

    Scale shape: the eval split is tiny next to a 100 TB corpus, so
    the eval side BROADCASTS (cosine_pairs streams candidate
    partitions against it, no corpus shuffle) and the per-train-doc
    max is a combinable struct-max aggregate — map-side partials
    reduce |train| x |eval| score rows to |train| before the only
    shuffle. Output: every train doc with its nearest eval doc, the
    cosine, and the drop verdict.
    """
    emb = tracked_persist(_emb(spark, sf_dir))
    evals = emb.where(F.col("vec_id") % EVAL_MOD == 0)
    train = emb.where(F.col("vec_id") % EVAL_MOD != 0)
    pairs = cosine_pairs(evals, train)  # (qid=eval, cid=train, cosine)
    best = (
        pairs.groupBy(F.col("cid").alias("vec_id"))
        .agg(F.max(F.struct("cosine", "qid")).alias("m"))
        .select(
            "vec_id",
            F.col("m.qid").alias("nearest_eval"),
            F.col("m.cosine").alias("max_eval_cosine"),
        )
    )
    return best.withColumn(
        "contaminated", F.col("max_eval_cosine") >= F.lit(DECON_T)
    )


ORACLE_SEMANTIC_DECON = f"""
    WITH el AS ({_EMB_EL}),
    e_el AS (SELECT * FROM el WHERE vec_id % {EVAL_MOD} = 0),
    t_el AS (SELECT * FROM el WHERE vec_id % {EVAL_MOD} <> 0),
    dots AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid, {_DOT_SQL} AS dot
      FROM e_el a JOIN t_el b USING (idx) GROUP BY a.vec_id, b.vec_id),
    norms AS (SELECT vec_id, {_NORM_SQL} AS norm_sq FROM el GROUP BY vec_id),
    sims AS (
      SELECT qid, cid,
             dot / NULLIF(sqrt(qn.norm_sq) * sqrt(cn.norm_sq), 0) AS cosine
      FROM dots JOIN norms qn ON qn.vec_id = qid
                JOIN norms cn ON cn.vec_id = cid),
    best AS (
      SELECT cid AS vec_id, qid AS nearest_eval, cosine AS max_eval_cosine
      FROM (
        SELECT qid, cid, cosine,
               ROW_NUMBER() OVER (PARTITION BY cid
                                  ORDER BY cosine DESC, qid DESC) AS rk
        FROM sims) WHERE rk = 1)
    SELECT vec_id, nearest_eval, max_eval_cosine,
           max_eval_cosine >= {DECON_T} AS contaminated
    FROM best
"""

_MIX_CELL_SQL = " + ".join(
    f"(CASE WHEN embedding[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
    for j in range(MIX_BITS)
)


def corpus_cluster_mixture(spark, sf_dir):
    """Cluster x source mixture report: how each embedding-space
    cluster is populated across corpus sources — the pre-flight for
    cluster-balanced sampling (does one source dominate a semantic
    region?).

    Docs join embeddings on the shared id (co-partitioned equi-join
    at scale), the coarse quantizer is the deterministic sign-bit
    cell (a trained codebook slots in unchanged, see
    operators/ivf.py), and the per-cell totals frame is |cells| rows
    — broadcast back onto the rollup for exact ppm shares.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        signbit_cell("embedding", bits=MIX_BITS).alias("cell"),
    )
    per = (
        docs.join(emb, on="doc_id")
        .groupBy("cell", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        )
        .withColumn(
            "mean_chars", F.expr("sum_chars DIV n_docs").cast("long")
        )
    )
    totals = per.groupBy("cell").agg(
        F.sum("n_docs").alias("cell_docs")
    )
    return (
        per.join(F.broadcast(totals), on="cell")
        .withColumn(
            "src_share_ppm",
            F.expr("n_docs * 1000000 DIV cell_docs").cast("long"),
        )
        .select(
            "cell", "source", "n_docs", "sum_chars", "mean_chars",
            "src_share_ppm",
        )
    )


ORACLE_CLUSTER_MIX = f"""
    WITH cells AS (
      SELECT vec_id AS doc_id, CAST({_MIX_CELL_SQL} AS BIGINT) AS cell
      FROM embeddings),
    per AS (
      SELECT cell, source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
      FROM documents JOIN cells USING (doc_id)
      GROUP BY cell, source),
    tot AS (SELECT cell, SUM(n_docs) AS cell_docs FROM per GROUP BY cell)
    SELECT cell, source, n_docs, sum_chars,
           CAST(sum_chars // n_docs AS BIGINT) AS mean_chars,
           CAST(n_docs * 1000000 // cell_docs AS BIGINT) AS src_share_ppm
    FROM per JOIN tot USING (cell)
"""


def embedding_health_report(spark, sf_dir):
    """One-row corpus embedding diagnostics — the broken-run detector
    you look at BEFORE trusting any similarity stage: vector count,
    zero vectors (dead encoder), mean squared norm (scale drift), and
    the squared norm of the mean vector (anisotropy / collapsed
    embedding space: healthy corpora have a center near the origin;
    a collapsed run's center norm approaches the per-vector norms).

    All exact: per-vector norms in picounit BIGINTs (the kernel
    currency), the center via per-dimension micro-unit sums, its
    squared norm folded in DECIMAL(38,0) and crossing to DOUBLE
    through a string cast (functions/exact.py 2^53 note). Two
    combinable aggregates over one element scan; the dim-sized
    center frame reduces to one row.
    """
    emb = _emb(spark, sf_dir)
    norms = emb.select(
        norm_sq_scaled(F.col("embedding")).cast("long").alias("ns")
    )
    vec_stats = norms.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(F.when(F.col("ns") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_vecs"),
        F.expr("SUM(ns) DIV COUNT(*)").cast("long").alias("mean_norm_sq_pico"),
    )
    el = emb.select(F.posexplode("embedding").alias("idx", "v")).select(
        "idx",
        F.floor(F.col("v").cast("double") * F.lit(_CQ)).cast("long").alias("q"),
    )
    center = (
        el.groupBy("idx")
        .agg(F.sum("q").alias("s"))
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(s AS DECIMAL(19,0)) * s) AS STRING)"
                " AS DOUBLE)"
            ).alias("center_norm_sq_micro2")
        )
    )
    return vec_stats.join(F.broadcast(center))


ORACLE_EMB_HEALTH = f"""
    WITH el AS ({_EMB_EL}),
    q_el AS (SELECT vec_id, idx,
                    CAST(FLOOR(v * {_CQ}) AS BIGINT) AS q,
                    CAST(FLOOR(v * v * {_Q}) AS BIGINT) AS p
             FROM el),
    norms AS (SELECT vec_id, CAST(SUM(p) AS BIGINT) AS ns
              FROM q_el GROUP BY vec_id),
    vstats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(SUM(CASE WHEN ns = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_vecs,
             CAST(SUM(ns) // COUNT(*) AS BIGINT) AS mean_norm_sq_pico
      FROM norms),
    dims AS (SELECT idx, CAST(SUM(q) AS BIGINT) AS s FROM q_el GROUP BY idx),
    center AS (
      SELECT CAST(CAST(SUM(CAST(s AS HUGEINT) * s) AS VARCHAR) AS DOUBLE)
               AS center_norm_sq_micro2
      FROM dims)
    SELECT * FROM vstats, center
"""


QUERIES = {
    "ann_topk_sq8": ann_topk_sq8,
    "ann_sq8_recall": ann_sq8_recall,
    "corpus_semantic_decontaminate": corpus_semantic_decontaminate,
    "corpus_cluster_mixture": corpus_cluster_mixture,
    "embedding_health_report": embedding_health_report,
}

ORACLES = {
    "ann_topk_sq8": ORACLE_SQ8,
    "ann_sq8_recall": ORACLE_SQ8_RECALL,
    "corpus_semantic_decontaminate": ORACLE_SEMANTIC_DECON,
    "corpus_cluster_mixture": ORACLE_CLUSTER_MIX,
    "embedding_health_report": ORACLE_EMB_HEALTH,
}


# minimum mutual-edge cosine for the graph-cluster mixture: below it
# the fixture's mutual-kNN graph is one giant component (sweep: 0.1 ->
# 1 comp, 0.25 -> 6 comps + 15 singletons at sf0.01)
GRAPH_MIX_MIN_COS = 0.25


def corpus_graph_cluster_mixture(spark, sf_dir):
    """Graph-clustering mixture: the mutual-kNN similarity graph
    (operators/similarity.py::mutual_knn_graph, same node slice and k
    as the knn_graph_mutual gate) collapses into connected components
    (operators/cluster.py — the dedup clustering kernel, reused
    verbatim with graph column names), and each component becomes a
    mixture "source" fed through the UniMax temperature readout
    (operators/corpus.py::mixture_readout). This completes the
    similarity-graph family end-to-end: graph -> clusters ->
    cluster-balanced token budget, the SemDeDup/cluster-curation
    shape, with zero new operator surface.

    Edges additionally pass a minimum-cosine cut (GRAPH_MIX_MIN_COS,
    the SemDeDup-style similarity threshold): bare mutual-kNN at k=4
    over the fixture slice is one giant component — thresholding is
    what makes the partition a MIXTURE rather than a blob, exactly as
    in production semantic curation. Cosines are the fixed-order IEEE
    chains the knn_graph_mutual gate already hash-matches across
    engines, so the cut is cross-engine deterministic. Singleton
    nodes (no surviving edge) are their own cluster
    (coalesce(label, node)) so the mixture covers the whole node set.

    Scale: edges are k-bounded (<= k x |nodes|), components run the
    published O(log n) kernels, per-cluster stats are one combinable
    aggregate, and the readout is cluster-count-sized with broadcast
    totals. The oracle re-derives the entire chain: top-k both ways,
    mutuality, a recursive-CTE reachability closure, and the shared
    `mix` CTE (queries/corpus.py::_mixture_ctes) — a green row proves
    graph, closure, and mixture COMPOSED, not just each stage.
    """
    from hha_spark.operators.cluster import connected_components
    from hha_spark.operators.corpus import mixture_readout
    from hha_spark.operators.similarity import mutual_knn_graph
    from hha_spark.queries.corpus import BUDGET_PCT
    from hha_spark.queries.llm_ops import KNN_K, KNN_NODE_MOD, _emb

    emb = _emb(spark, sf_dir)
    nodes = emb.where(F.col("vec_id") % KNN_NODE_MOD == 0)
    edges = (
        mutual_knn_graph(nodes, k=KNN_K)
        .where(F.col("cosine") >= GRAPH_MIX_MIN_COS)
        .select("vec_id_a", "vec_id_b")
    )
    labels = connected_components(edges, src="vec_id_a", dst="vec_id_b")
    lab = (
        nodes.select("vec_id")
        .join(labels, nodes["vec_id"] == labels["node"], "left")
        .select(
            F.col("vec_id").alias("doc_id"),
            F.coalesce("label", "vec_id").alias("cluster_id"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    per = (
        lab.join(docs, on="doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split("text", " ")))
            .cast("long")
            .alias("n_tokens"),
        )
    )
    out = mixture_readout(
        per.select(F.col("cluster_id").alias("source"), "n_docs", "n_tokens"),
        budget_frac_pct=BUDGET_PCT,
    )
    return out.withColumnRenamed("source", "cluster_id")


def _graph_cluster_mixture_oracle() -> str:
    from hha_spark.queries.corpus import _mixture_ctes
    from hha_spark.queries.llm_ops import KNN_NODE_MOD, ORACLE_KNN_MUTUAL

    per_sql = """
      SELECT lab.cluster_id AS source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(d.text, ' '))) AS BIGINT)
               AS n_tokens
      FROM lab JOIN documents d USING (doc_id)
      GROUP BY lab.cluster_id"""
    return f"""
    WITH RECURSIVE
    mut AS (SELECT * FROM ({ORACLE_KNN_MUTUAL})
            WHERE cosine >= {GRAPH_MIX_MIN_COS}),
    e AS (SELECT vec_id_a AS u, vec_id_b AS v FROM mut
          UNION SELECT vec_id_b, vec_id_a FROM mut),
    reach(node, r) AS (
      SELECT u, u FROM e
      UNION
      SELECT e2.u, reach.r FROM e e2 JOIN reach ON e2.v = reach.node),
    lbl AS (SELECT node, MIN(r) AS cid FROM reach GROUP BY node),
    gnodes AS (SELECT vec_id FROM embeddings
               WHERE vec_id % {KNN_NODE_MOD} = 0),
    lab AS (
      SELECT n.vec_id AS doc_id, COALESCE(l.cid, n.vec_id) AS cluster_id
      FROM gnodes n LEFT JOIN lbl l ON l.node = n.vec_id),
    {_mixture_ctes(per_sql)}
    SELECT source AS cluster_id, n_docs, n_tokens, w_sqrt, share_ppm,
           target_tokens, sampled_tokens, oversample_ppm
    FROM mix
"""


QUERIES["corpus_graph_cluster_mixture"] = corpus_graph_cluster_mixture
ORACLES["corpus_graph_cluster_mixture"] = _graph_cluster_mixture_oracle()
