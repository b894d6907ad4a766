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


def resample_ffill(
    df: DataFrame,
    *,
    key: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    tie_col: str = "event_id",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Downsample to fixed time buckets, densify gaps, forward-fill.

    The time-series resample every monitoring/feature pipeline needs:

      1. bucket: bucket_idx = ts DIV bucket_us — pure integer
         arithmetic, timezone-free (calendar rendering is the
         caller's concern);
      2. last-in-bucket: row_number over (key, bucket) ordered by
         (ts DESC, tie DESC) — a deterministic pick, not an
         engine-defined arg_max tie-break;
      3. densify: per-key integer sequence(min_bucket, max_bucket)
         exploded into the full grid — grid size is bounded by
         keys x retention, never by raw event count;
      4. forward-fill: last(value, ignoreNulls) over an unbounded-
         preceding frame per key.

    Output: (key, bucket_idx, value_filled, is_observed).

    Scale shape: one (key, bucket) shuffle for the pick, one (key)
    shuffle shared by the span aggregation and the fill window; the
    grid-to-observation join arrives co-partitioned on the same key.
    No global window, no Python. Skewed keys are bounded by
    retention (a key emits at most span/bucket_us grid rows).
    """
    bucket = (F.col(ts_col) - F.col(ts_col) % F.lit(bucket_us)) / F.lit(bucket_us)
    w_pick = Window.partitionBy(key, "bucket_idx").orderBy(
        F.desc(ts_col), F.desc(tie_col)
    )
    obs = (
        df.withColumn("bucket_idx", bucket.cast("long"))
        .withColumn("_rn", F.row_number().over(w_pick))
        .where(F.col("_rn") == 1)
        .select(key, "bucket_idx", value_col)
    )
    span = obs.groupBy(key).agg(
        F.min("bucket_idx").alias("_lo"), F.max("bucket_idx").alias("_hi")
    )
    grid = span.select(
        key, F.explode(F.sequence("_lo", "_hi")).alias("bucket_idx")
    )
    w_fill = (
        Window.partitionBy(key)
        .orderBy("bucket_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, on=[key, "bucket_idx"], how="left")
        .select(
            key,
            "bucket_idx",
            F.last(value_col, ignorenulls=True).over(w_fill).alias("value_filled"),
            F.col(value_col).isNotNull().alias("is_observed"),
        )
    )
