"""Distributed global ranking — NTILE/rank over a total order WITHOUT
a single-partition window.

A bare `Window.orderBy(...)` (no partitionBy) funnels the whole table
through one task: correct on test data, a scale-killer at 100 TB.
This operator computes the same global rank with nothing
single-threaded:

  1. range-repartition on the ordering columns (distributed sort —
     partition i holds ranks strictly before partition i+1);
  2. row_number within each partition (parallel windows, keyed by
     spark_partition_id);
  3. per-partition counts -> prefix-sum offsets (P rows, a tiny
     inequality self-join — no driver collect, no global window);
  4. global rank = local rank + partition offset.

NTILE(k) then assigns the first n%k tiles ceil(n/k) rows and the
rest floor(n/k) — exact integer arithmetic (DIV), matching the SQL
NTILE contract bit-for-bit, which is what lets the DuckDB oracle
hash-match.

The ordering MUST be a total order (add a unique tiebreak column);
otherwise rank assignment within ties is partition-placement-
dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hha_spark.caching import tracked_persist

DEFAULT_RANGE_PARTS = 32


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    *,
    out: str = "r",
    total_out: str = "n",
    parts: int = DEFAULT_RANGE_PARTS,
) -> DataFrame:
    """df + (global rank 1..n, total count n) over a total order.

    Two data shuffles (range partition; pid-local window uses the
    same partitioning) plus two broadcast joins of metadata-sized
    frames (P partition counts, one total row).
    """
    ranged = df.repartitionByRange(parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    # persist: `local` feeds counts, total, and the final join — without
    # it the distributed range-sort runs three times (and _pid from
    # spark_partition_id could drift between recomputations).
    local = tracked_persist(
        ranged.withColumn("_lr", F.row_number().over(w).cast("long"))
    )

    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"), F.col("a._cnt").alias("_cnt"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    total = offsets.agg(F.sum("_cnt").cast("long").alias(total_out))

    return (
        local.join(F.broadcast(offsets.select("_pid", "_off")), on="_pid")
        .join(F.broadcast(total))
        .withColumn(out, F.col("_lr") + F.col("_off"))
        .drop("_pid", "_lr", "_off")
    )


def ntile_expr(k: int, *, rank: str = "r", total: str = "n") -> Column:
    """SQL NTILE(k) from (rank, total) via exact integer arithmetic.

    The else-branch's DIV (n DIV k) is only reachable when n >= k:
    for n < k the head branch covers all n rows, and CASE evaluates
    lazily, so no division by zero.
    """
    return F.expr(
        f"CASE WHEN {rank} <= ({total} % {k}) * ({total} DIV {k} + 1)"
        f"     THEN ({rank} - 1) DIV ({total} DIV {k} + 1) + 1"
        f"     ELSE {total} % {k}"
        f"          + ({rank} - 1 - ({total} % {k}) * ({total} DIV {k} + 1))"
        f"            DIV ({total} DIV {k}) + 1 "
        "END"
    ).cast("long")


def distributed_ntile(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    *,
    out: str = "tile",
    parts: int = DEFAULT_RANGE_PARTS,
) -> DataFrame:
    """df + NTILE(k) over the given total order, fully distributed."""
    ranked = with_global_rank(df, order_cols, parts=parts)
    return ranked.withColumn(out, ntile_expr(k)).drop("r", "n")
