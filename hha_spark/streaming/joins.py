"""Watermarked stream-stream interval join (click-to-purchase
attribution shape).

Joining two live streams is the one join topology the rest of the
engine doesn't cover: both sides are unbounded, so the join must hold
STATE for rows whose partner may still arrive, and a watermark plus a
time-bound join condition is what lets the state store evict — without
both, a stream-stream join grows without limit. With them, each side
buffers only `watermark + max_delay` worth of rows per key:

  left.ts  watermarked by W
  right.ts watermarked by W
  join on key AND right.ts in [left.ts, left.ts + max_delay]

which is exactly how Spark's symmetric hash join derives its state
eviction bound (the condition gives a closed time range for every
buffered row).

The builder works on batch frames too — same expression tree, the
watermark is a no-op in batch mode — so the batch≡stream equivalence
test drives the identical plan both ways.

Scale: state is partitioned by the join key; the shuffle is one
exchange per side. Skewed keys behave like any keyed stream state —
salt upstream if one user dominates. Emission in append mode waits for
the watermark to close the interval, so downstream sees each matched
pair exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "click_ts",
    right_ts: str = "purchase_ts",
    max_delay_sec: int = 3600,
    watermark_sec: int = 600,
) -> DataFrame:
    """Inner-join purchases to the clicks they follow within
    `max_delay_sec`, both sides watermarked by `watermark_sec`.

    Inputs carry integer-second event times in `left_ts`/`right_ts`.
    Returns (key, click columns..., purchase columns..., delay_sec).
    """
    lw = clicks.withColumn(
        "_lt", F.timestamp_seconds(F.col(left_ts))
    ).withWatermark("_lt", f"{watermark_sec} seconds")
    rw = (
        purchases.withColumnRenamed(key, "_rkey")
        .withColumn("_rt", F.timestamp_seconds(F.col(right_ts)))
        .withWatermark("_rt", f"{watermark_sec} seconds")
    )
    cond = (
        (F.col(key) == F.col("_rkey"))
        & (F.col("_rt") >= F.col("_lt"))
        & (F.col("_rt") <= F.col("_lt") + F.expr(f"INTERVAL {max_delay_sec} SECONDS"))
    )
    return (
        lw.join(rw, cond, "inner")
        .drop("_rkey", "_lt", "_rt")
        .withColumn(
            "delay_sec", (F.col(right_ts) - F.col(left_ts)).cast("long")
        )
    )
