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


def corpus_band_table(
    corpus_docs: DataFrame,
    *,
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """(doc_id_corpus, band, key) — the static side of the stream-
    static LSH join, with over-cap template buckets already dropped.

    Build (and persist/store) this ONCE per corpus version; at 100 TB
    it is a stored (band, key)-bucketed table maintained by the batch
    pipeline. Computing it inside the per-micro-batch plan would
    re-tokenize and re-aggregate the whole corpus every trigger — and
    micro-batch plans don't get AQE, so it would also run with
    unoptimized shuffles.
    """
    from hha_spark.operators.dedup import (
        MAX_LSH_BUCKET,
        band_keys,
        minhash_signatures,
        with_token_set,
    )

    cap = MAX_LSH_BUCKET if max_bucket is None else max_bucket
    corp = band_keys(
        minhash_signatures(with_token_set(corpus_docs, text_col=text_col))
    )
    ok = (
        corp.groupBy("band", "key")
        .count()
        .where(F.col("count") <= F.lit(cap))
        .select("band", "key")
    )
    return corp.join(ok, on=["band", "key"]).select(
        F.col("doc_id").alias("doc_id_corpus"), "band", "key"
    )


def incremental_dedup_stream(
    new_stream: DataFrame,
    corpus_docs: DataFrame | None = None,
    *,
    text_col: str = "text",
    max_bucket: int | None = None,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-dup screening of an ingest STREAM against a static corpus —
    the streaming face of `operators/dedup.py::incremental_lsh_pairs`.

    The incoming stream computes MinHash signatures and band keys
    (narrow, per-row maps — legal in streaming), then STREAM-STATIC
    joins the precomputed corpus band table: Spark broadcasts/rescans
    the static side per micro-batch and keeps NO join state, so this
    scales with batch size exactly like the batch operator. Emits one
    row per (new doc, corpus doc, band) collision; exact-Jaccard
    verification and pair-distinct belong downstream (foreachBatch
    running the batch verifier), where the candidate volume is already
    LSH-pruned.

    Pass `corpus_bands` (a `corpus_band_table` result, ideally
    persisted or a stored table) to keep corpus-side work out of the
    micro-batch plan; passing raw `corpus_docs` instead computes the
    band table inline per trigger — correct, but it re-does corpus
    tokenization/aggregation every micro-batch, without AQE.

    At 100 TB the corpus band table is a stored, (band, key)-bucketed
    table maintained by the batch pipeline; `max_bucket` drops
    template buckets on the static side before the join ever sees
    them.
    """
    from hha_spark.operators.dedup import (
        band_keys,
        minhash_signatures,
        with_token_set,
    )

    if corpus_bands is None:
        if corpus_docs is None:
            raise ValueError("need corpus_docs or corpus_bands")
        corpus_bands = corpus_band_table(
            corpus_docs, text_col=text_col, max_bucket=max_bucket
        )
    corp = corpus_bands
    newb = band_keys(
        minhash_signatures(with_token_set(new_stream, text_col=text_col))
    ).select(F.col("doc_id").alias("doc_id_new"), "band", "key")
    return newb.join(corp, on=["band", "key"]).select(
        "doc_id_new", "doc_id_corpus", "band"
    )
