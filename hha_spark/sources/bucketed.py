"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of the reference-style workloads is the
shuffle before big joins/aggregations. Writing both sides bucketed by
the join key (`bucketBy` + `saveAsTable`) lets Catalyst plan a
SortMergeJoin with NO Exchange on either side — the bucket files are
already hash-partitioned on disk. `tests/test_bucketed.py` asserts
the exchange-free plan.

Bucketing requires the session catalog (saveAsTable), so these
helpers take a table NAME; the warehouse dir is wherever
`spark.sql.warehouse.dir` points.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
