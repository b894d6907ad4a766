"""applyInPandas grouped-map escape hatch, with its JVM-native twin.

The engine's rule is: built-in expressions first (whole-stage codegen,
no Python workers), Arrow-batched pandas only where per-group
imperative logic genuinely can't be expressed relationally. This
module documents the escape hatch ON a computation the built-ins CAN
express — per-group z-score outlier flagging — precisely so the two
paths can be pinned equal in tests: if you reach for applyInPandas,
this is the shape (schema contract, group batching, Arrow transfer),
and the native twin is what it must agree with.

Scale: applyInPandas shuffles the full fact table on the group key
and ships every group through a Python worker as Arrow batches — the
native path aggregates first (tiny frame) and broadcasts back. That
asymmetry is the whole argument for staying JVM-side; it's measured,
not asserted, by the operator's bench docstring readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "user_id long, event_id long, value double, is_outlier boolean"
)


def zscore_outliers_pandas(
    events: DataFrame, *, z: float = 2.0
) -> DataFrame:
    """Per-user |x - mean| > z * population-std flags via a grouped-map
    pandas UDF. Input needs (user_id, event_id, value)."""

    def flag(pdf):
        m = pdf["value"].mean()
        s = pdf["value"].std(ddof=0)
        out = pdf[["user_id", "event_id", "value"]].copy()
        out["is_outlier"] = (
            (pdf["value"] - m).abs() > z * s if s > 0 else False
        )
        return out

    return events.select("user_id", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandas(flag, schema=OUT_SCHEMA)


def zscore_outliers_native(events: DataFrame, *, z: float = 2.0) -> DataFrame:
    """The JVM-native twin: aggregate per-user moments once, broadcast
    them back, flag in codegen. Same output contract."""
    stats = events.groupBy("user_id").agg(
        F.avg("value").alias("_m"), F.stddev_pop("value").alias("_s")
    )
    return (
        events.select("user_id", "event_id", "value")
        .join(F.broadcast(stats), on="user_id")
        .select(
            "user_id",
            "event_id",
            "value",
            F.when(
                F.col("_s") > 0,
                F.abs(F.col("value") - F.col("_m")) > z * F.col("_s"),
            )
            .otherwise(F.lit(False))
            .alias("is_outlier"),
        )
    )
