"""IVF (inverted-file) vector index with a trained k-means codebook.

The scale path for similarity search: instead of comparing a query
against every vector (brute force, O(N·dim) per query), vectors are
assigned to the nearest of k centroids ("cells") and a query probes
only its `nprobe` nearest cells — the candidate join is keyed on the
cell id, so the element join's size tracks cell occupancy, not corpus
size. At 100 TB the final assignment is a partition/bucket key for
the stored index.

Training is deterministic Lloyd's k-means, built entirely from the
exact quantized arithmetic of operators/similarity.py:

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

Physical strategy (the part that matters at 100 TB): centroids are
k·dim values — driver-collected each round exactly like MLlib's
KMeans, then re-embedded as literal arrays. Distance + argmin are
then a NARROW map over the vector column (`zip_with` element
subtraction folded by `aggregate`, `array_sort` over per-cell
(dq, cell) structs for the probe order) — no element explode, no
(vec_id, cell) shuffle, no row_number window. The only shuffle per
Lloyd round is the k·dim-group centroid aggregation, which is
map-side combinable. For codebooks too large to inline as a literal
(k·dim in the millions), the same expressions apply against a
broadcast-joined centroid array instead; the quantized math is
unchanged.

Exactness contract: bigint sums are order-independent, double ops are
IEEE-identical across engines, and Python round-trips collected
doubles losslessly, so the literal-array path produces bit-identical
cells/distances to the exploded-join formulation the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Q = 1_000_000_000_000  # picounit quantization, shared with similarity.py

_MEAN_NUM = (
    f"CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * {Q}) AS BIGINT)) AS BIGINT)"
)


def signbit_cell_col(vec_col: str = "embedding"):
    """Deterministic 4-cell seed quantizer: sign bits of components 0,1."""
    return (F.col(vec_col)[0] >= 0).cast("int") * 2 + (
        F.col(vec_col)[1] >= 0
    ).cast("int")


def _collect_centroids(
    emb: DataFrame, cell_col, *, vec_col: str = "embedding"
) -> dict[int, list[float]]:
    """{cell: [c_0..c_{dim-1}]} — exact quantized per-component means.

    One narrow posexplode + one map-side-combinable (cell, idx)
    aggregation; the result is k·dim values, collected driver-side
    the way MLlib's KMeans collects its codebook every round.
    """
    rows = (
        emb.select(cell_col.alias("cell"), F.posexplode(F.col(vec_col)).alias("idx", "v"))
        .groupBy("cell", "idx")
        .agg(F.expr(_MEAN_NUM).alias("_sq"), F.count(F.lit(1)).alias("_n"))
        .select(
            "cell",
            "idx",
            ((F.col("_sq").cast("double") / F.col("_n").cast("double")) / F.lit(float(Q))).alias("c"),
        )
        .collect()
    )
    cents: dict[int, dict[int, float]] = {}
    for r in rows:
        cents.setdefault(r["cell"], {})[r["idx"]] = r["c"]
    return {
        cell: [comps[i] for i in sorted(comps)] for cell, comps in cents.items()
    }


def _dq_col(cvec: list[float], *, vec_col: str = "embedding"):
    """Quantized squared distance to one centroid: a pure narrow map.

    zip_with folds the element-wise floor((v-c)²·Q) terms, aggregate
    sums them as bigints — the same order-independent integer sum the
    oracle's GROUP BY computes, with zero shuffle.
    """
    cent_arr = F.array(*[F.lit(float(c)) for c in cvec])
    terms = F.zip_with(
        F.col(vec_col),
        cent_arr,
        lambda v, c: F.floor(
            (v.cast("double") - c) * (v.cast("double") - c) * F.lit(Q)
        ).cast("long"),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)


def sorted_cells_col(cents: dict[int, list[float]], *, vec_col: str = "embedding"):
    """array<struct<dq,cell>> sorted by (dq, cell) — struct field order
    gives the deterministic tie-break; element 1 is the assignment,
    the first nprobe elements are the probe list."""
    structs = [
        F.named_struct(
            F.lit("dq"), _dq_col(cvec, vec_col=vec_col),
            F.lit("cell"), F.lit(cell),
        )
        for cell, cvec in sorted(cents.items())
    ]
    return F.array_sort(F.array(*structs))


def _lloyd(
    emb: DataFrame,
    *,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Run `iters` Lloyd rounds from the sign-bit seed.

    Returns (assigned, cents): `assigned` is a PERSISTED
    (vec_id, <vec_col>, cell) frame whose cell is the argmin w.r.t.
    `cents`, the final collected codebook.

    Each round MATERIALIZES its assignment (persist + count) before
    the next centroid aggregation groups by it. Without this, round
    N's grouping column is round N-1's full argmin expression
    (k cells × dim-wide zip_with folds), so expression/codegen size
    grows multiplicatively with `iters` — measured 63 s on 2,000
    vectors. Materialized, each round is one narrow map + one tiny
    k·dim centroid agg, exactly MLlib KMeans' shape.
    """
    cur = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col)
    ).withColumn("cell", signbit_cell_col(vec_col)).persist()
    cents: dict[int, list[float]] = {}
    for _ in range(iters):
        cents = _collect_centroids(cur, F.col("cell"), vec_col=vec_col)
        nxt = cur.select(
            "vec_id",
            vec_col,
            F.element_at(sorted_cells_col(cents, vec_col=vec_col), 1)["cell"].alias("cell"),
        ).persist()
        nxt.count()
        cur.unpersist()
        cur = nxt
    return cur, cents


def train_ivf(
    emb: DataFrame,
    *,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd-iterate from the sign-bit seed; returns (assignment,
    centroids) where assignment is argmin w.r.t. the returned
    centroids (the invariant a probe-list query needs).

    assignment: (vec_id, cell) — a narrow map over emb.
    centroids: (cell, idx, c) — the collected final codebook.
    """
    assigned, cents = _lloyd(emb, iters=iters, id_col=id_col, vec_col=vec_col)
    cells = assigned.select("vec_id", "cell")
    cent_df = emb.sparkSession.createDataFrame(
        [(cell, idx, c) for cell, cvec in sorted(cents.items())
         for idx, c in enumerate(cvec)],
        schema="cell int, idx int, c double",
    )
    return cells, cent_df


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

    Shuffle census: iters tiny centroid aggs (training) + the
    cell-keyed candidate join + the exact-cosine kernel + the final
    per-query top-k window. Assignment and probe lists are narrow.
    """
    from hha_spark.operators.similarity import cosine_pairs_for

    assigned, cents = _lloyd(emb, iters=iters)
    ranked = sorted_cells_col(cents)
    # rank-1 cells were materialized by _lloyd; the full probe-order
    # expression is only evaluated over the (few) query vectors.
    assignment = assigned.select(F.col("vec_id").alias("vec_id_b"), "cell")
    probes = (
        emb.where(query_pred)
        .select(
            F.col("vec_id").alias("vec_id_a"),
            F.explode(F.slice(ranked, 1, nprobe)["cell"]).alias("cell"),
        )
    )
    pairs = (
        probes.join(assignment, on="cell")
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
