"""Vector similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline; the LSH/IVF
bucketed variants (operators/dedup.py banding, sign-bit buckets) are
the scale path. The dot product is computed EXACTLY:

    per-element product in double (bit-identical across engines)
      -> cast to DECIMAL(20,15) (exact sum, order-independent)
      -> one double division / sqrt at the end (correctly rounded).

This sidesteps float-summation order entirely — a requirement both
for the DuckDB oracle gate and for run-to-run stability once partial
aggregation reorders partitions on a real cluster.

Layout note: element explosion multiplies row count by the dimension
(64 here). At scale, keep the candidate set bounded (blocking /
LSH / IVF probe lists) before exploding; the explode itself is a
narrow map, and the (pair -> dot) aggregation shuffles on the pair
key with map-side partial sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Element products are floor-quantized to integer 1e-12 units and
# summed as BIGINT: float32 elements are promoted to double BEFORE
# multiplying (float*float loses ~1e-8), and FLOOR sidesteps the
# engines' differing double->decimal rounding modes entirely. The
# 1e12 scale cancels in the cosine (numerator 1e12 vs
# sqrt(1e12)*sqrt(1e12)); sums stay far below 2^53 so the final
# BIGINT->DOUBLE cast is exact and the sqrt/division chain is
# correctly rounded — bit-identical across engines and partition
# orders, at the cost of a deterministic <=1e-12/element truncation.
_Q = 1_000_000_000_000
_DOT = (
    f"CAST(SUM(CAST(FLOOR(CAST(av AS DOUBLE) * CAST(bv AS DOUBLE) * {_Q}) "
    "AS BIGINT)) AS DOUBLE)"
)
_NORM = (
    f"CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) * {_Q}) "
    "AS BIGINT)) AS DOUBLE)"
)


def _elements(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}id"),
        F.posexplode(F.col(vec_col)).alias("idx", f"{prefix}v"),
    )


def _norms_scaled(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, norm_sq) in picounits — the internal kernel currency; the
    1e12 scale cancels against the scaled dot inside the cosine."""
    el = df.select(F.col(id_col), F.explode(F.col(vec_col)).alias("v"))
    return el.groupBy(id_col).agg(F.expr(_NORM).alias("norm_sq"))


def vector_norms(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, norm_sq DOUBLE) — exact quantized sum of squares, in
    natural units."""
    return _norms_scaled(df, id_col=id_col, vec_col=vec_col).withColumn(
        "norm_sq", F.col("norm_sq") / F.lit(float(_Q))
    )


def cosine_pairs(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, candidate) cosine similarities via element join.

    Returns (qid, cid, cosine DOUBLE). Both inputs should already be
    blocked/bounded — this is the exact kernel, not the pruner.
    """
    q_el = _elements(queries, id_col, vec_col, "a")
    c_el = _elements(candidates, id_col, vec_col, "b")
    # broadcast the (small) query side: the element join then runs
    # without a shuffle on the 64-key idx column, which would
    # otherwise cap parallelism at the vector dimension
    dots = (
        F.broadcast(q_el)
        .join(c_el, on="idx")
        .groupBy("aid", "bid")
        .agg(F.expr(_DOT).alias("dot"))
    )
    qn = _norms_scaled(queries, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("aid"), F.col("norm_sq").alias("qn")
    )
    cn = _norms_scaled(candidates, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("bid"), F.col("norm_sq").alias("cn")
    )
    return (
        dots.join(F.broadcast(qn), on="aid")
        .join(F.broadcast(cn), on="bid")
        .select(
            F.col("aid").alias("qid"),
            F.col("bid").alias("cid"),
            (F.col("dot") / (F.sqrt("qn") * F.sqrt("cn"))).alias("cosine"),
        )
    )


def cosine_pairs_for(
    pairs: DataFrame,
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    a_col: str = "vec_id_a",
    b_col: str = "vec_id_b",
) -> DataFrame:
    """Cosine similarity for an explicit candidate-pair set.

    `pairs` is (a_col, b_col [, extra cols]); only those pairs are
    exploded (|pairs| × dim element rows), so the cost tracks the
    candidate count — the shape every blocked/LSH/IVF near-dup
    pipeline needs at scale. Returns pairs + cosine.
    """
    el = vectors.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("idx", "v")
    )
    a_el = el.select(
        F.col(id_col).alias(a_col), "idx", F.col("v").alias("av")
    )
    b_el = el.select(
        F.col(id_col).alias(b_col), "idx", F.col("v").alias("bv")
    )
    dots = (
        pairs.select(a_col, b_col)
        .join(a_el, on=a_col)
        .join(b_el, on=[b_col, "idx"])
        .groupBy(a_col, b_col)
        .agg(F.expr(_DOT).alias("dot"))
    )
    norms = vectors.select(
        F.col(id_col), F.explode(F.col(vec_col)).alias("v")
    ).groupBy(id_col).agg(F.expr(_NORM).alias("norm_sq"))
    an = norms.select(F.col(id_col).alias(a_col), F.col("norm_sq").alias("an"))
    bn = norms.select(F.col(id_col).alias(b_col), F.col("norm_sq").alias("bn"))
    return (
        pairs.join(dots, on=[a_col, b_col])
        .join(F.broadcast(an), on=a_col)
        .join(F.broadcast(bn), on=b_col)
        .withColumn("cosine", F.col("dot") / (F.sqrt("an") * F.sqrt("bn")))
        .drop("dot", "an", "bn")
    )


HYPERPLANE_BITS = 16
BITS_PER_BAND = 4
MAX_HYPERPLANE_BUCKET = 64


def hyperplane_planes(spark, *, bits: int = HYPERPLANE_BITS, dim: int = 64) -> DataFrame:
    """Deterministic pseudo-random hyperplanes: (j, i, s) with
    s = ±1 from the md5 high bit of 'h{j}|{i}'. No RNG state — the
    same matrix materializes in any engine, which is what lets the
    DuckDB oracle reproduce the signatures bit-for-bit."""
    high = "('8','9','a','b','c','d','e','f')"
    return (
        spark.range(bits).selectExpr("id AS j")
        .crossJoin(spark.range(dim).selectExpr("id AS i"))
        .selectExpr(
            "j", "i",
            f"CASE WHEN substr(md5(concat('h', j, '|', i)), 1, 1) IN {high} "
            "THEN 1 ELSE -1 END AS s",
        )
    )


def hyperplane_bands(
    emb: DataFrame,
    planes: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits_per_band: int = BITS_PER_BAND,
) -> DataFrame:
    """(vec_id, band, band_val): random-hyperplane (SRP) signature
    bits, banded for LSH. Bit j is the sign of Σ_i s_ji·v_i, computed
    over floor-quantized integers so partial-sum order can't flip a
    boundary sign. The planes frame is bits×dim rows — always
    broadcast; both aggregations key on the vector id."""
    el = emb.select(F.col(id_col), F.posexplode(F.col(vec_col)).alias("idx", "v"))
    bit_rows = (
        el.join(F.broadcast(planes), el.idx == planes.i)
        .groupBy(id_col, "j")
        .agg(
            F.expr(
                f"SUM(CAST(FLOOR(CAST(v AS DOUBLE) * {_Q}) AS BIGINT) * s)"
            ).alias("sb")
        )
        .select(
            id_col, "j",
            F.expr("CASE WHEN sb > 0 THEN 1 ELSE 0 END").alias("bit"),
        )
    )
    pw = (
        f"CAST(CASE CAST(j % {bits_per_band} AS INT) "
        "WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END AS BIGINT)"
    )
    return (
        bit_rows.groupBy(id_col, F.expr(f"j DIV {bits_per_band}").alias("band"))
        .agg(F.expr(f"SUM(bit * {pw})").alias("band_val"))
    )


def hyperplane_candidate_pairs(
    bands: DataFrame,
    *,
    id_col: str = "vec_id",
    max_bucket: int = MAX_HYPERPLANE_BUCKET,
) -> DataFrame:
    """LSH banding over SRP signatures: vectors sharing any
    (band, band_val) bucket become candidates; degenerate buckets
    above max_bucket are skipped (same rationale as dedup.MAX_LSH_BUCKET).
    Returns distinct (vec_id_a < vec_id_b) pairs."""
    ok = (
        bands.groupBy("band", "band_val")
        .count()
        .where(F.col("count") <= F.lit(max_bucket))
        .select("band", "band_val")
    )
    kept = bands.join(ok, on=["band", "band_val"])
    a = kept.select(F.col(id_col).alias("vec_id_a"), "band", "band_val")
    b = kept.select(F.col(id_col).alias("vec_id_b"), "band", "band_val")
    return (
        a.join(b, on=["band", "band_val"])
        .where(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .distinct()
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Brute-force top-k neighbors per query by cosine similarity.

    Deterministic ranking: ties broken by candidate id. Output
    (qid, cid, cosine, rank).
    """
    sims = cosine_pairs(queries, candidates, id_col=id_col, vec_col=vec_col)
    if not include_self:
        sims = sims.where(F.col("qid") != F.col("cid"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return sims.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
