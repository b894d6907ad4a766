"""Event-time windowed aggregation with watermarked late-data bounds.

The spike detector (spike_stream.py) recomputes windows per batch via
foreachBatch because the reference's windows are one-sided and
overlapping. This module covers the OTHER streaming shape an
analytics engine needs: tumbling event-time windows maintained
incrementally by Structured Streaming's own state store, with a
watermark bounding how late a row may arrive before it is dropped —
the standard ingest-aggregation topology (readStream -> window agg ->
append sink).

Scale: state is one row per (window, key); the watermark lets the
store evict finalized windows, so state size tracks the key
cardinality times the lateness horizon, not the stream's lifetime.
Emission in append mode happens only when the watermark passes the
window end — downstream sinks see each window exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    *,
    time_col: str = "timestamp",
    key_cols: tuple[str, ...] = ("num_protocol", "type_proto"),
    value_col: str = "CountPkt",
    window_sec: int = 60,
    watermark_sec: int = 60,
) -> DataFrame:
    """Tumbling-window count/sum per key over integer-second events.

    Returns (window_start: long unix sec, *key_cols, n, total). Works
    on a streaming OR batch frame (same expression tree — the
    batch≡stream equivalence tests rely on that); the watermark is a
    no-op in batch mode.
    """
    with_ts = stream.withColumn("_t", F.timestamp_seconds(F.col(time_col)))
    return (
        with_ts.withWatermark("_t", f"{watermark_sec} seconds")
        .groupBy(F.window("_t", f"{window_sec} seconds"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total"),
        )
        .select(
            F.col("window.start").cast("long").alias("window_start"),
            *key_cols,
            "n",
            "total",
        )
    )
