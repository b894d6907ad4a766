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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # TIMESTAMP(NANOS) -> BIGINT ns; runtime conf, safe to set per-read
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Temp views named like the DuckDB oracle's, for the SQL surface."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
