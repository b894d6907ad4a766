"""Temporal join operators Spark lacks natively: as-of join and
bounded range join, built as compositions of built-in operators
(the brief's preference order: compose before dropping to Pandas).

As-of join (union + window): tag both sides, union on a common
schema, sort within each key by event time, and carry the last seen
right-side value forward with last(ignoreNulls) over an unbounded
preceding frame. One shuffle on the key — the same cost profile as a
plain aggregation, no per-row lookups, no Python. This is the
standard scalable formulation (pd.merge_asof per group via
applyInPandas would serialize every partition through Arrow instead).

Range join (bucketized): joining on |a.ts - b.ts| <= W is a
nested-loop disaster as a raw theta join; bucketizing ts to W-sized
cells turns it into an equi-join on (key, cell) over each cell and
its neighbor, then an exact filter. Shuffle volume tracks matching
cells, not the cross product.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    `right_ts` <= `left_ts` within the same `by` key.

    Ties on right_ts resolve by `tie_col` (greatest wins) so results
    are deterministic. Output: all left columns + value_cols (NULL
    when no earlier right row exists).
    """
    lt = left.withColumn("_src", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = right.withColumn("_src", F.lit(0)).withColumn("_ts", F.col(right_ts))
    # align schemas: left keeps its columns; right contributes only
    # key + ts + values
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    extra = list(value_cols) + ([tie_col] if tie_col else [])
    for c in extra:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    cols = list(left.columns) + extra + ["_src", "_ts"]
    order = [F.col("_ts"), F.col("_src")]
    if tie_col is not None:
        # right rows sort among themselves by the tiebreak; left rows
        # (_src=1) still come after right rows at the same _ts
        order = [F.col("_ts"), F.col("_src"), F.col(tie_col)]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = lt.select(*cols).unionByName(rt.select(*cols))
    carried = unioned.select(
        *[c for c in left.columns],
        "_src",
        *[
            F.last(F.when(F.col("_src") == 0, F.col(v)), ignorenulls=True)
            .over(w)
            .alias(v)
            for v in value_cols
        ],
    )
    return carried.where(F.col("_src") == 1).drop("_src")


def range_join_pairs(
    df: DataFrame,
    *,
    by: Sequence[str],
    ts_col: str,
    window: int,
    id_col: str,
) -> DataFrame:
    """All ordered pairs (a, b) within the same `by` key whose
    timestamps differ by at most `window` (a strictly before b by
    (ts, id) order).

    Bucketized self-join: cell = ts DIV window; b joins a's cell and
    the next one, then the exact |Δts| filter applies. Output:
    by + a_id, b_id, a_ts, b_ts.
    """
    cell = F.expr(f"{ts_col} DIV {window}")
    # each a row probes its own cell and the next one, so the join on
    # (by, cell) is a plain HASH join whose build side only meets rows
    # that can possibly satisfy the range predicate
    a = df.select(
        *by,
        F.col(id_col).alias("a_id"),
        F.col(ts_col).alias("a_ts"),
        F.explode(F.array(cell, cell + 1)).alias("_cell"),
    )
    b = df.select(
        *by,
        F.col(id_col).alias("b_id"),
        F.col(ts_col).alias("b_ts"),
        cell.alias("_cell"),
    )
    return (
        a.join(b, on=[*by, "_cell"])
        .where(
            (F.col("b_ts") - F.col("a_ts") <= window)
            & (
                (F.col("a_ts") < F.col("b_ts"))
                | ((F.col("a_ts") == F.col("b_ts")) & (F.col("a_id") < F.col("b_id")))
            )
        )
        .select(*by, "a_id", "b_id", "a_ts", "b_ts")
    )
