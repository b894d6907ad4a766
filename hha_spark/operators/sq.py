"""Scalar quantization (SQ8) for embedding columns.

The third member of the compression family (exact kernel ->
IVF cells -> PQ codes): each float component is mapped to ONE byte
using global per-dimension [min, max] bounds, so a 64-dim float
vector becomes 64 bytes (4x smaller than float32, 16x smaller than
the picounit BIGINT kernel's working set) while keeping far more
geometry than PQ's 8-byte codes — the standard middle rung of a
billion-vector serving stack (FAISS `SQ8`, Lucene/HNSW int8).

Determinism contract (same discipline as operators/similarity.py):

  * the per-dimension bounds are MIN/MAX of double-cast floats — no
    arithmetic, so both engines agree exactly;
  * code_j = clamp(floor((v_j - min_j) * 255 / (max_j - min_j)), 0,
    255) is three IEEE double ops in a fixed order + one floor —
    bit-identical across engines (same trick as the picounit
    quantizer; DuckDB's rounding CAST never sees a fraction);
  * scores are BIGINT sums of (code_a - 128)(code_b - 128) — centered
    int8 dot products, associative integer addition, shuffle-order
    independent.

Scale shape: the bounds frame is 64 rows — a bounded model artifact
(collected once per corpus, like the IVF/PQ codebooks); encoding is
a narrow per-row map; scoring top-k broadcasts the (small) query
side so candidate partitions stream in place, exactly like
operators/similarity.py::cosine_pairs. At 100 TB the codes column is
what you'd persist (array<tinyint> ~ dim bytes/row) and the floats
are only read once at encode time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hha_spark.operators.similarity import _fold_long

SQ_LEVELS = 255
SQ_CENTER = 128


def sq_bounds(emb: DataFrame, *, vec_col: str = "embedding") -> list[tuple[float, float]]:
    """Per-dimension (min, max) of the double-cast components.

    One combinable aggregate over (idx, v) pairs; the result is a
    dim-sized model artifact (64 rows here) collected to the driver,
    the same bounded-collect contract as the IVF/PQ codebooks.
    """
    el = emb.select(
        F.posexplode(F.col(vec_col)).alias("idx", "v")
    ).select("idx", F.col("v").cast("double").alias("v"))
    rows = (
        el.groupBy("idx")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("idx")
        .collect()
    )
    return [(r["mn"], r["mx"]) for r in rows]


def sq_encode(
    emb: DataFrame,
    bounds: list[tuple[float, float]],
    *,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Add an array<bigint> column of 0..255 codes (one per dim).

    Pure narrow map: the bounds ride along as literal arrays, so the
    plan has no join and no shuffle. Degenerate dimensions
    (max == min) code to the midpoint so they contribute nothing to
    centered dots — mirrored literally in the oracle.
    """
    mins = F.array(*[F.lit(float(mn)) for mn, _ in bounds])
    rngs = F.array(*[F.lit(float(mx - mn)) for mn, mx in bounds])
    dim = len(bounds)

    def _code(x, i):
        raw = F.floor(
            (x.cast("double") - F.element_at(mins, i + 1))
            * F.lit(255.0)
            / F.element_at(rngs, i + 1)
        ).cast("long")
        clamped = F.least(
            F.lit(SQ_LEVELS).cast("long"),
            F.greatest(F.lit(0).cast("long"), raw),
        )
        return F.when(
            F.element_at(rngs, i + 1) == 0.0, F.lit(SQ_CENTER).cast("long")
        ).otherwise(clamped)

    codes = F.transform(
        F.slice(F.col(vec_col), 1, dim), lambda x, i: _code(x, i)
    )
    return emb.withColumn(out_col, codes)


def sq_dot(a, b):
    """Centered int8 dot: Σ (a_j - 128)(b_j - 128), BIGINT."""
    terms = F.zip_with(
        a,
        b,
        lambda x, y: (x - F.lit(SQ_CENTER)) * (y - F.lit(SQ_CENTER)),
    )
    return _fold_long(terms)


def sq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    bounds: list[tuple[float, float]],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k candidates per query by centered SQ8 dot product.

    Returns (qid, cid, sq_score BIGINT, rank BIGINT). The query side
    (codes only — dim bytes each) broadcasts; candidates are encoded
    in place and stream against it, so the only shuffle is the
    per-query top-k window over |Q| * |C| score rows — at scale
    replace with TakeOrdered per query or an IVF pre-prune, same as
    the other ANN family members.
    """
    q = sq_encode(queries, bounds, vec_col=vec_col).select(
        F.col(id_col).alias("qid"), F.col("codes").alias("__qc")
    )
    c = sq_encode(candidates, bounds, vec_col=vec_col).select(
        F.col(id_col).alias("cid"), F.col("codes").alias("__cc")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            sq_dot(F.col("__qc"), F.col("__cc")).alias("sq_score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("sq_score"), F.asc("cid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
