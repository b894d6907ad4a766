"""Training-corpus shard writer — the export stage of the pipeline.

The reference has no file sink at all (its output is logs + a rule
stub, hha.py:240-249); a corpus pipeline's terminal operator is the
opposite extreme: petabytes of cleaned/packed documents written as
shards that downstream trainers stream. The writer encodes the three
decisions that matter at 100 TB:

  * **Hive-partition by coarse dimensions** (source, language, ...):
    readers prune whole directories, and re-runs replace one
    partition, not the corpus (dynamic partition overwrite).
  * **Bound shard size with maxRecordsPerFile**, not repartition
    counts: executors roll to a new file at the cap, so shard size is
    stable no matter how many tasks write — the knob that keeps any
    single shard streamable.
  * **Deterministic layout**: rows are hash-distributed by the
    partition columns and sorted within each task by (partition cols,
    order cols), so the same input produces the same shard contents —
    re-runs are diffable and resumable downstream.

One shuffle total (the repartition); the sort is within-task. At
100 TB add a salt column to the repartition when one partition value
dominates (same skew treatment as operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_MAX_RECORDS_PER_FILE = 100_000


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    partition_cols: tuple[str, ...] = ("source",),
    order_cols: tuple[str, ...] = ("doc_id",),
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    fmt: str = "parquet",
    overwrite_partitions_only: bool = True,
) -> None:
    """Write `df` as a Hive-partitioned, size-bounded shard tree.

    overwrite_partitions_only=True sets dynamic partition overwrite
    as a per-write DataFrameWriter option (NOT the session conf, which
    would silently change every later overwrite+partitionBy write in
    the session): an incremental re-run touching one source replaces
    only that source's directory — the idempotent-backfill contract.
    """
    writer = (
        df.repartition(*partition_cols)
        .sortWithinPartitions(*partition_cols, *order_cols)
        .write.partitionBy(*partition_cols)
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if overwrite_partitions_only:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.mode("overwrite").format(fmt).save(path)


def read_training_shards(spark, path: str, fmt: str = "parquet") -> DataFrame:
    """Round-trip reader: partition columns come back from the
    directory names (Hive-style discovery) and partition-value filters
    prune directories before any file is opened."""
    return spark.read.format(fmt).load(path)
