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


# --- bounded-disorder attribution (explicit watermark-buffer state) -------
#
# The foreachBatch twin of attribution_join for the delivery shape
# Spark's native stream-stream join cannot replay here (the gate's
# file fixture delivers boundary events one file LATE): the same
# watermark-buffer discipline streaming/sessionize.py built for
# sessionization, applied to the dual-input interval join. Contract:
# every arriving event's ts >= (max ts of all previously arrived
# events) - disorder_sec. Events at or above wm = max_seen -
# disorder_sec wait in the buffer — TIES INCLUDED: an event with
# ts == wm is still reachable by an admissible same-timestamp
# arrival (arrival bound ts' >= max_seen - disorder = wm allows
# ts' == wm), and unlike the sessionizer — whose sessions stay OPEN
# with gap slack, so a tie can still merge later — a purchase
# finalizes irreversibly at maturity, so maturing the tie would
# permanently lose the zero-delay pair (round-8 self-review finding).
# The strictly-below-wm mature slice is therefore replayed in global
# time order. A purchase matures exactly once and joins the click
# state at that moment, so every (click, purchase) pair with
# purchase_ts - click_ts in [0, max_delay_sec] is emitted exactly
# once:
#   * a matching click matured no later than the purchase
#     (click_ts <= purchase_ts < wm) and is still in state, because
#     eviction keeps click_ts + max_delay >= wm and every purchase
#     maturing after that eviction has ts >= that wm (arrival bound);
#   * clicks never re-join old purchases (purchases hold no state).
# State: clicks within max_delay of the watermark + the disorder
# buffer — exactly the eviction bound Spark's symmetric hash join
# derives from the same watermark + time-range condition.
#
# Storage reuses the sessionize unified-store pattern: ONE versioned
# kind-partitioned write per epoch (kind=click state, kind=buf
# immature events, kind=attr emitted pairs — append-only history),
# deterministic per epoch from the pre-state read via before_epoch,
# so retries rewrite the same bytes.

_ATTR_STORE_SCHEMA = (
    "user_id long, ts_s long, ts2_s long, etype string, kind string"
)
_ATTR_PAIR_SCHEMA = "user_id long, ts_s long, ts2_s long"
_K_CLICK = "click"
_K_BUF = "buf"
_K_ATTR = "attr"


def make_disorder_attribution_processor(
    spark,
    *,
    store_root: str,
    max_delay_sec: int,
    disorder_sec: int,
):
    """Per-micro-batch body (see block comment above for the
    exactly-once argument). Per-epoch actions: one tiny max aggregate
    (doubles as the empty probe and materializes the cached event
    union) and ONE kind-partitioned write."""
    from hha_spark.streaming.sessionize import (
        _prune_store_versions,
        _read_versioned,
    )

    def process(batch_df, epoch_id: int) -> None:
        epoch = int(epoch_id)
        store = _read_versioned(
            spark, store_root, _ATTR_STORE_SCHEMA, before_epoch=epoch
        )
        clicks_state = store.where(F.col("kind") == _K_CLICK).select(
            "user_id", "ts_s"
        )
        buf = store.where(F.col("kind") == _K_BUF).select(
            "user_id", "ts_s", "etype"
        )
        all_ev = (
            batch_df.select("user_id", "ts_s", "etype")
            .unionByName(buf)
            .persist()
        )
        try:
            (mx,) = all_ev.agg(F.max("ts_s")).first()
            if mx is None:  # empty batch AND empty buffer: no-op epoch
                return
            wm = int(mx) - disorder_sec
            # strict: ts == wm buffers (see module block comment)
            mature = all_ev.where(F.col("ts_s") < wm)
            immature = all_ev.where(F.col("ts_s") >= wm)
            m_clicks = mature.where(F.col("etype") == "click").select(
                "user_id", "ts_s"
            )
            m_purchases = mature.where(
                F.col("etype") == "purchase"
            ).select("user_id", F.col("ts_s").alias("p_ts"))
            clicks_all = clicks_state.unionByName(m_clicks)
            pairs = (
                m_purchases.join(
                    clicks_all.select(
                        "user_id", F.col("ts_s").alias("c_ts")
                    ),
                    "user_id",
                )
                .where(
                    (F.col("p_ts") >= F.col("c_ts"))
                    & (F.col("p_ts") <= F.col("c_ts") + max_delay_sec)
                )
                .select("user_id", "c_ts", "p_ts")
            )
            null_ts = F.lit(None).cast("long")
            null_et = F.lit(None).cast("string")
            unified = (
                pairs.select(
                    "user_id",
                    F.col("c_ts").alias("ts_s"),
                    F.col("p_ts").alias("ts2_s"),
                    null_et.alias("etype"),
                    F.lit(_K_ATTR).alias("kind"),
                )
                .unionByName(
                    # evict clicks no future purchase can reach
                    clicks_all.where(
                        F.col("ts_s") + max_delay_sec >= wm
                    ).select(
                        "user_id",
                        "ts_s",
                        null_ts.alias("ts2_s"),
                        null_et.alias("etype"),
                        F.lit(_K_CLICK).alias("kind"),
                    )
                )
                .unionByName(
                    immature.select(
                        "user_id",
                        "ts_s",
                        null_ts.alias("ts2_s"),
                        "etype",
                        F.lit(_K_BUF).alias("kind"),
                    )
                )
            )
            # non-empty by construction: the max event satisfies
            # ts = max >= max - disorder_sec = wm, so it is always
            # immature — kind=buf always exists, for ANY
            # disorder_sec >= 0 (the strict maturity bound is what
            # makes the zero-disorder configuration safe too)
            # static overwrite pinned for retry idempotence (see
            # sessionize.make_sessionize_processor's write)
            unified.write.option(
                "partitionOverwriteMode", "static"
            ).partitionBy("kind").mode("overwrite").parquet(
                f"{store_root}/v{epoch}"
            )
            _prune_store_versions(
                spark,
                store_root,
                current_epoch=epoch,
                prune_kinds=(_K_CLICK, _K_BUF),
            )
        finally:
            all_ev.unpersist()

    return process


def run_disorder_attribution(
    spark,
    *,
    data_root: str,
    schema,
    store_root: str,
    checkpoint: str,
    max_delay_sec: int,
    disorder_sec: int,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """File source -> foreachBatch(bounded-disorder attribution).
    Returns the StreamingQuery. Heals any crashed store compaction
    first (streaming/store.py recovery contract)."""
    from hha_spark.streaming.store import recover_compaction

    recover_compaction(spark, store_root)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(data_root)
    )
    writer = stream.writeStream.foreachBatch(
        make_disorder_attribution_processor(
            spark,
            store_root=store_root,
            max_delay_sec=max_delay_sec,
            disorder_sec=disorder_sec,
        )
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def final_attributions(
    spark, *, store_root: str, max_delay_sec: int
):
    """End-of-stream flush: the buffered purchases (everything still
    above the last watermark) join the click state plus the buffered
    clicks — the only clicks that can still reach them (an evicted
    click has click_ts + max_delay below the watermark, and every
    buffered purchase is above it). Returns every attributed pair:
    (user_id, ts_s=click_ts, ts2_s=purchase_ts)."""
    from hha_spark.streaming.sessionize import (
        _read_versioned,
        read_kind_history,
    )

    store = _read_versioned(spark, store_root, _ATTR_STORE_SCHEMA)
    clicks_state = store.where(F.col("kind") == _K_CLICK).select(
        "user_id", "ts_s"
    )
    buf = store.where(F.col("kind") == _K_BUF)
    b_clicks = buf.where(F.col("etype") == "click").select(
        "user_id", "ts_s"
    )
    b_purchases = buf.where(F.col("etype") == "purchase").select(
        "user_id", F.col("ts_s").alias("p_ts")
    )
    tail = (
        b_purchases.join(
            clicks_state.unionByName(b_clicks).select(
                "user_id", F.col("ts_s").alias("c_ts")
            ),
            "user_id",
        )
        .where(
            (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + max_delay_sec)
        )
        .select(
            "user_id",
            F.col("c_ts").alias("ts_s"),
            F.col("p_ts").alias("ts2_s"),
        )
    )
    emitted = read_kind_history(
        spark,
        store_root,
        _K_ATTR,
        _ATTR_PAIR_SCHEMA,
        ("user_id", "ts_s", "ts2_s"),
    )
    return emitted.unionByName(tail)
