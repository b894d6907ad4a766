"""Readers for the driver-provided parquet tables.

Replaces the reference's hand-rolled HDFS path construction +
existence probing (hha.py:278-313) with plain `spark.read.parquet`;
time-based file selection becomes Catalyst partition pruning when the
data is laid out as date=/hour= directories (see sources/histograms.py).

One real-world quirk handled here: `events.parquet` stores
TIMESTAMP(NANOS) which Spark refuses by default
([PARQUET_TYPE_ILLEGAL]); `spark.sql.legacy.parquet.nanosAsLong`
reads it as nanoseconds-since-epoch BIGINT, which is also the most
deterministic representation for window arithmetic (no timezone
ambiguity). All event-time math downstream uses integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

NS_PER_US = 1_000
US_PER_DAY = 86_400 * 1_000_000

# Fact tables that arrive as ONE single-row-group parquet file in the
# fixture layout. Spark cannot split inside a row group, so without
# intervention every scan — and the whole narrow pipeline above it
# (tokenize/explode/hash/partial-agg) — runs in ONE task regardless of
# cluster size. A round-robin repartition to the session's parallelism
# fixes that for the price of one tiny shuffle (the files are <11 MB).
# This is strictly a small-file artifact: a production 100 TB table has
# thousands of splits and the fan-out becomes a no-op cost that a
# caller can disable with fanout=False. Catalyst still pushes filters
# and column pruning through the Repartition node, so scan pushdown is
# unaffected (pinned by test_plans.test_q1_pushes_filter_and_prunes_columns).
# Dimension tables stay as-is: they broadcast, and an extra exchange
# under a BroadcastExchange is pure overhead.
FANOUT_TABLES = frozenset({"lineitem", "orders", "events", "documents", "embeddings"})


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, fanout: bool | None = None
) -> DataFrame:
    if name == "events":
        # TIMESTAMP(NANOS) -> BIGINT ns; runtime conf, safe to set per-read
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if fanout is None:
        fanout = name in FANOUT_TABLES
    if fanout:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Temp views named like the DuckDB oracle's, for the SQL surface."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
