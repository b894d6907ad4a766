"""IVF (inverted-file) vector index with a trained k-means codebook.

The scale path for similarity search: instead of comparing a query
against every vector (brute force, O(N·dim) per query), vectors are
assigned to the nearest of k centroids ("cells") and a query probes
only its `nprobe` nearest cells — the candidate join is keyed on the
cell id, so the element join's size tracks cell occupancy, not corpus
size. At 100 TB the final assignment is a partition/bucket key for
the stored index.

Training is deterministic Lloyd's k-means, built entirely from the
exact quantized kernel (operators/similarity.py contract):

  * init: sign-bit cells of the first two components (the round-1
    stand-in quantizer — now only the seed);
  * centroid component = (SUM(floor(v·1e12) as bigint) / n) / 1e12 —
    an order-independent exact mean, identical across engines;
  * assignment = argmin over cells of SUM(floor((v-c)²·1e12)), ties
    broken by cell id;
  * `iters` Lloyd rounds (default 2 — enough to demonstrate a real
    trained codebook while keeping the oracle SQL finite).

No randomness anywhere: same data -> same codebook in Spark and in
the DuckDB oracle, which unrolls the same iterations as CTEs.

Shuffle shape per iteration: one (cell, idx) aggregation (map-side
combinable) + one broadcast join of the k·dim centroid table against
the element frame + one per-vector window. All linear in N·dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Q = 1_000_000_000_000  # picounit quantization, shared with similarity.py

_MEAN_NUM = (
    f"CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * {Q}) AS BIGINT)) AS DOUBLE)"
)
_DIST_Q = (
    f"SUM(CAST(FLOOR((CAST(v AS DOUBLE) - c) * (CAST(v AS DOUBLE) - c) * {Q}) "
    "AS BIGINT))"
)


def elements(emb: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, idx, v) element frame — 0-based idx, narrow map."""
    return emb.select(F.col(id_col), F.posexplode(F.col(vec_col)).alias("idx", "v"))


def signbit_cells(emb: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic 4-cell seed quantizer: sign bits of components 0,1."""
    return emb.select(
        F.col(id_col),
        (
            (F.col(vec_col)[0] >= 0).cast("int") * 2
            + (F.col(vec_col)[1] >= 0).cast("int")
        ).alias("cell"),
    )


def centroids_of(el: DataFrame, cells: DataFrame) -> DataFrame:
    """(cell, idx, c): exact per-component means of each cell's members."""
    return (
        el.join(cells, on="vec_id")
        .groupBy("cell", "idx")
        .agg(
            F.expr(_MEAN_NUM).alias("_sq"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "cell",
            "idx",
            ((F.col("_sq") / F.col("_n").cast("double")) / F.lit(float(Q))).alias("c"),
        )
    )


def cell_distances(el: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cell, dq): quantized squared distance to every centroid.

    The centroid table is k·dim rows — always broadcast; the element
    frame never shuffles here (distances aggregate on vec_id, the
    frame's natural key)."""
    return (
        el.join(F.broadcast(centroids), on="idx")
        .groupBy("vec_id", "cell")
        .agg(F.expr(_DIST_Q).alias("dq"))
    )


def nearest_cells(distances: DataFrame, *, nprobe: int = 1) -> DataFrame:
    """(vec_id, cell, rnk<=nprobe), deterministic ties by cell id."""
    w = Window.partitionBy("vec_id").orderBy("dq", "cell")
    return (
        distances.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= F.lit(nprobe))
        .select("vec_id", "cell", "rnk")
    )


def train_ivf(
    emb: DataFrame,
    *,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd-iterate from the sign-bit seed; returns (assignment,
    centroids) where assignment is argmin w.r.t. the returned
    centroids (the invariant a probe-list query needs)."""
    el = elements(emb, id_col=id_col, vec_col=vec_col)
    cells = signbit_cells(emb, id_col=id_col, vec_col=vec_col)
    cent = None
    for _ in range(iters):
        cent = centroids_of(el, cells)
        cells = nearest_cells(cell_distances(el, cent), nprobe=1).select(
            "vec_id", "cell"
        )
    return cells, cent


def ivf_topk(
    emb: DataFrame,
    *,
    query_pred,
    k: int = 5,
    nprobe: int = 2,
    iters: int = 2,
) -> DataFrame:
    """Approximate top-k cosine neighbors via the trained IVF index.

    query_pred: Column predicate selecting the query vectors.
    Each query probes its `nprobe` nearest cells; candidates are the
    vectors assigned (rank-1) to those cells. Output
    (qid, cid, cosine, rank) with deterministic tie-breaks.
    """
    from hha_spark.operators.similarity import cosine_pairs_for

    emb = emb.persist()
    el = elements(emb)
    cells = signbit_cells(emb)
    cent = None
    for _ in range(iters):
        cent = centroids_of(el, cells)
        cells = nearest_cells(cell_distances(el, cent), nprobe=1).select(
            "vec_id", "cell"
        )
    # final distances serve both the index assignment (rank 1) and the
    # query probe lists (rank <= nprobe): compute once, persist
    dist = cell_distances(el, cent).persist()
    assignment = nearest_cells(dist, nprobe=1).select("vec_id", "cell")
    probes = (
        nearest_cells(dist, nprobe=nprobe)
        .join(emb.where(query_pred).select("vec_id"), on="vec_id")
        .select(F.col("vec_id").alias("vec_id_a"), "cell")
    )
    pairs = (
        probes.join(
            assignment.select(F.col("vec_id").alias("vec_id_b"), "cell"),
            on="cell",
        )
        .where(F.col("vec_id_a") != F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .distinct()
    )
    sims = cosine_pairs_for(pairs, emb)
    w = Window.partitionBy("vec_id_a").orderBy(F.desc("cosine"), F.asc("vec_id_b"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("vec_id_a").alias("qid"),
            F.col("vec_id_b").alias("cid"),
            "cosine",
            "rank",
        )
    )
