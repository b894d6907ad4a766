"""Semantic (embedding-space) corpus pruning — the SemDeDup pattern.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster the corpus in
embedding space, then inside each cluster drop the items most
redundant with the cluster's own direction (closest to the centroid).
Unlike pairwise near-dup (operators/dedup.py, similarity.py) this
removes *semantic* redundancy — many documents saying the same thing
in different words — and is the standard pre-training curation step
after exact/fuzzy dedup.

Spark-first decomposition (no reference analogue — the reference
engine, hha.py, has no embedding ops at all; this extends the corpus
toolkit the same way operators/dedup.py does):

  1. **Coarse quantizer**: sign bits of the first B components — the
     deterministic stand-in for a trained k-means codebook (the
     trained path exists in operators/ivf.py; sign-bit cells keep the
     oracle expressible and the result reproducible bit-for-bit).
  2. **Distributed centroids**: element-wise per-cell sums of
     micro-unit-quantized components. One skinny shuffle of
     (cell, idx, q) BIGINT rows, map-side combinable; the centroid
     table is |cells| rows and broadcasts.
  3. **Exact cosine-to-centroid**: cosine against the *sum* vector
     (== cosine against the mean — scale cancels), computed with the
     same integer-quantization discipline as operators/similarity.py
     so Spark and the DuckDB oracle agree bit-for-bit. The centroid
     norm accumulates in DECIMAL(38,0) because per-cell sums squared
     exceed BIGINT at large cell sizes.
  4. **Prune**: per cell, rank by cosine descending (most redundant
     first) and drop the top `drop_num/drop_den` fraction.

Scale: the only data-sized shuffles are the centroid aggregation
(narrow, fixed-width) and the per-cell ranking window. With a real
codebook the cell count grows with the corpus (so per-cell state
stays bounded); ranking within a cell is a single-key window —
at extreme cell sizes swap step 4 for the two-level top-k in
operators/rank.py. Arithmetic headroom: component quantum 1e6 and
BIGINT dots hold to ~1e5 vectors/cell at |v|<=1; past that, lower
the quantum (the oracle shares the constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Component quantum: micro-units. Coarser than similarity.py's 1e-12
# pair quantum because centroid SUMS get multiplied back against
# components — products must stay inside BIGINT (see module note).
Q_COMP = 1_000_000


def signbit_cell(vec_col, *, bits: int = 4):
    """Deterministic coarse-quantizer cell id from the sign bits of
    the first `bits` components (0-based idx j contributes 2**j)."""
    cell = F.lit(0)
    for j in range(bits):
        cell = cell + (F.col(vec_col)[j] >= 0).cast("int") * F.lit(1 << j)
    return cell.cast("long")


def quantized(vec_col):
    """array<bigint> of floor(component * 1e6) — the exact currency
    every downstream sum/dot uses (float -> double promotion first,
    same discipline as operators/similarity.py)."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(Q_COMP)).cast("long"),
    )


def cell_centroids(qframe: DataFrame) -> DataFrame:
    """Per-cell element-wise component sums: (cell, cent array<bigint>,
    n_cell, cent_norm DOUBLE).

    Input: (cell, vq array<bigint>). One posexplode -> groupBy(cell,
    idx) SUM (skinny BIGINT rows, partial aggregation) -> re-pack to
    an array ordered by idx. Cosine to this sum vector equals cosine
    to the mean, so no division ever happens and the result is exact.

    The centroid norm is folded in DECIMAL(38,0): cell sums reach
    ~n*1e6 and their squares overflow BIGINT long before the frame
    itself is large.
    """
    el = qframe.select(
        "cell", F.posexplode("vq").alias("idx", "q")
    )
    cent_el = el.groupBy("cell", "idx").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    packed = cent_el.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "s"))),
            lambda st: st["s"],
        ).alias("cent"),
        F.max("n").alias("n_cell"),
    )
    dec = "decimal(38,0)"
    cent_norm = (
        F.aggregate(
            "cent",
            F.lit(0).cast(dec),
            lambda acc, x: (
                acc + x.cast("decimal(19,0)") * x.cast("decimal(19,0)")
            ).cast(dec),
        )
        # through a STRING: the exact value exceeds 2^53, and a direct
        # decimal->double (Spark) vs hugeint->double (DuckDB oracle)
        # cast can double-round differently per engine (the 1-ulp bug
        # class caught in queries/relational5.py); decimal->string is
        # exact and string->double is one correctly-rounded step in
        # both engines
        .cast("string")
        .cast("double")
    )
    return packed.withColumn("cent_norm", cent_norm)


def semantic_prune(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
    drop_num: int = 1,
    drop_den: int = 4,
) -> DataFrame:
    """SemDeDup keep/drop decision per vector.

    Returns (vec_id, cell, cos_centroid DOUBLE, cell_rank, n_cell,
    kept) where rank 1 is the vector MOST aligned with its cell's
    centroid (ties broken by id) and the top floor(n*drop_num/drop_den)
    of each cell are dropped (kept=0) as semantically redundant.
    """
    qf = emb.select(
        F.col(id_col).alias("vec_id"),
        signbit_cell(vec_col, bits=bits).alias("cell"),
        quantized(vec_col).alias("vq"),
    )
    cents = cell_centroids(qf.select("cell", "vq"))

    dot = F.aggregate(
        F.zip_with("vq", "cent", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")
    vnorm = F.aggregate(
        F.transform("vq", lambda a: a * a),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")

    scored = (
        qf.join(F.broadcast(cents), on="cell")
        .withColumn(
            "cos_centroid",
            # nullif: a zero vector (or an all-zero centroid) yields
            # NULL, not an ANSI division-by-zero error — the driver
            # session runs ANSI ON
            dot
            / F.nullif(
                F.sqrt(vnorm) * F.sqrt(F.col("cent_norm")), F.lit(0.0)
            ),
        )
        .select("vec_id", "cell", "cos_centroid", "n_cell")
    )
    w = Window.partitionBy("cell").orderBy(
        F.desc("cos_centroid"), F.asc("vec_id")
    )
    ranked = scored.withColumn(
        "cell_rank", F.row_number().over(w).cast("long")
    )
    # explicit FLOOR: Spark's double->long cast truncates but DuckDB's
    # rounds, so the oracle-shared semantics must be spelled out
    drop_k = F.floor(F.col("n_cell") * drop_num / drop_den).cast("long")
    return ranked.select(
        "vec_id",
        "cell",
        "cos_centroid",
        "cell_rank",
        F.col("n_cell").cast("long").alias("n_cell"),
        (F.col("cell_rank") > drop_k).cast("int").alias("kept"),
    )
