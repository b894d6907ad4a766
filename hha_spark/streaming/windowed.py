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
    slide_sec: int | None = None,
) -> DataFrame:
    """Tumbling- or hopping-window count/sum per key over
    integer-second events.

    `slide_sec` < window_sec makes the windows HOPPING: each event
    lands in window_sec/slide_sec overlapping windows (state holds
    that many rows per live (window, key) — the multiplicity is the
    price of overlap and is bounded by the ratio, not the stream).
    Windows are epoch-aligned (Spark's default origin), so
    window_start values are exactly `ts - ts % slide - k*slide`.

    Returns (window_start: long unix sec, *key_cols, n, total). Works
    on a streaming OR batch frame (same expression tree — the
    batch≡stream equivalence tests rely on that); the watermark is a
    no-op in batch mode.
    """
    win = F.window(
        "_t",
        f"{window_sec} seconds",
        f"{slide_sec} seconds" if slide_sec else f"{window_sec} seconds",
    )
    with_ts = stream.withColumn("_t", F.timestamp_seconds(F.col(time_col)))
    return (
        with_ts.withWatermark("_t", f"{watermark_sec} seconds")
        .groupBy(win, *key_cols)
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
