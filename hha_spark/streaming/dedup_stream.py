"""Streaming exact deduplication — the ingest-time counterpart of the
batch `operators/dedup.py::exact_dedup_groups`.

A training-data ingest stream must drop re-crawled/replayed documents
as they arrive, not in a nightly batch. Shape: readStream -> content
hash (md5, the same canonical key the batch op groups on) ->
`dropDuplicatesWithinWatermark` -> append sink. First arrival wins
and flows through immediately; later copies are absorbed by the
state store.

Why `dropDuplicatesWithinWatermark` and not plain `dropDuplicates`:
on an unbounded stream, plain dropDuplicates keeps every key ever
seen — state grows with corpus size forever. The watermarked variant
evicts a key once the event-time watermark passes its expiry, so
state tracks the dedup horizon (keys arriving within `watermark_sec`
of each other), which is the only guarantee a re-crawl dedup needs
and the only one that scales: state = keys/horizon, not keys/history.

Works on the same expression tree in batch mode (watermark is a
no-op; the within-watermark dedup falls back to plain dropDuplicates
semantics over the bounded input), which is what the batch≡stream
test pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_content_hash(
    df: DataFrame, *, text_col: str = "text", out_col: str = "text_hash"
) -> DataFrame:
    """md5 content key — identical to the batch exact-dedup key."""
    return df.withColumn(out_col, F.md5(F.col(text_col)))


def dedup_stream(
    stream: DataFrame,
    *,
    text_col: str = "text",
    time_col: str = "ts_sec",
    watermark_sec: int = 3600,
) -> DataFrame:
    """First-arrival-wins exact dedup with watermark-bounded state.

    `time_col` is integer epoch seconds (the fixtures' convention);
    the event-time watermark rides a derived timestamp column.
    """
    hashed = with_content_hash(stream, text_col=text_col).withColumn(
        "_event_ts", F.timestamp_seconds(F.col(time_col))
    )
    if hashed.isStreaming:
        deduped = hashed.withWatermark(
            "_event_ts", f"{watermark_sec} seconds"
        ).dropDuplicatesWithinWatermark(["text_hash"])
    else:
        # batch fallback: contractual first-wins (dropDuplicates after a
        # sort keeps an arbitrary row; a ranked window does not)
        w = Window.partitionBy("text_hash").orderBy("_event_ts", "doc_id")
        deduped = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    return deduped.drop("_event_ts")
