"""Generic source/sink helpers beyond parquet.

The reference reads exactly one format (parquet over HDFS). A usable
engine needs the standard set; these wrappers pin explicit schemas
(never inferSchema in production paths) and centralize options.
Lakehouse table formats (Delta/Iceberg/Hudi) need their runtime jars,
which this environment doesn't ship — those entry points are explicit
stubs behind import probes, not silent fallbacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, *, header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    id_from_name: bool = True,
) -> DataFrame:
    """Raw media ingest via the built-in `binaryFile` source: one row
    per file with (path, modificationTime, length, content BINARY).

    This is the front door of the multimodal pipeline
    (operators/multimodal.py): blobs arrive as opaque binary plus
    provenance, downstream decode/resize run per Arrow batch. The
    source is splittable across executors per FILE (content is one
    cell), so at 100 TB the unit of parallelism is file count — shard
    media into many objects, not one giant archive. `pathGlobFilter`
    prunes by extension server-side before any bytes are read.

    With id_from_name, a BIGINT doc_id is parsed from the file stem
    (e.g. .../123.bin -> 123) to join blobs to their metadata table.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if id_from_name:
        df = df.withColumn(
            "doc_id",
            F.regexp_extract(F.col("path"), r"([0-9]+)\.[^/.]+$", 1).cast("long"),
        )
    return df.select(
        "doc_id" if id_from_name else F.lit(None).cast("long").alias("doc_id"),
        F.col("path").alias("blob_path"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("blob"),
    )


def write_table(
    df: DataFrame, path: str, *, fmt: str = "parquet", mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    *,
    key_cols: list[str],
    schema: T.StructType,
) -> int:
    """MERGE-style keyed upsert onto a plain parquet table.

    Without a lakehouse format there is no row-level MERGE, so the
    portable pattern is: existing rows whose key collides with an
    update are dropped (broadcast anti-join — updates are assumed
    batch-sized), the union is written to a sibling tmp dir, and the
    table is swapped via Hadoop-FS renames (same serial-compaction
    contract as sinks.alerts.compact_alerts). Returns the resulting
    row count.

    At 100 TB this full-table rewrite is the wrong tool — that is
    exactly what Delta/Iceberg row-level MERGE exists for (see the
    jar-gated readers below); this covers the gap for plain-parquet
    deployments where updates are rare and batch-shaped, and for
    partition-scoped rewrites.
    """
    from hha_spark.sources import fs

    cols = [f.name for f in schema.fields]
    updates = updates.select(
        [F.col(c).cast(schema[c].dataType) for c in cols]
    )
    if fs.exists(spark, path):
        existing = spark.read.schema(schema).parquet(path)
        keep = existing.join(
            F.broadcast(updates.select(*key_cols).distinct()),
            on=key_cols,
            how="left_anti",
        )
        merged = keep.unionByName(updates)
    else:
        merged = updates
    tmp = f"{path}__upsert_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    n = spark.read.schema(schema).parquet(tmp).count()
    old = f"{path}__old"
    fs.delete(spark, old)
    if fs.exists(spark, path):
        fs.rename(spark, path, old)
    fs.rename(spark, tmp, path)
    fs.delete(spark, old)
    return n


def _require(module: str, feature: str) -> None:
    import importlib

    try:
        importlib.import_module(module)
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            f"{feature} requires the '{module}' package and its runtime jars, "
            "which are not available in this environment"
        ) from exc


def _require_kafka(spark: SparkSession) -> None:
    """Kafka needs the spark-sql-kafka runtime jar on the session
    classpath; probe the JVM-side provider instead of a Python import."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as exc:  # noqa: BLE001 - jar absent
        raise NotImplementedError(
            "Kafka support requires the spark-sql-kafka-0-10 jar, which is "
            "not available in this environment"
        ) from exc


def read_kafka_stream(
    spark: SparkSession, *, bootstrap: str, topic: str, starting: str = "latest"
) -> DataFrame:
    """Streaming Kafka source (key/value binary columns) — jar-gated."""
    _require_kafka(spark)
    return (  # pragma: no cover - jar-dependent
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
        .load()
    )


def write_kafka_stream(
    df: DataFrame, *, bootstrap: str, topic: str, checkpoint: str
):
    """Streaming Kafka sink (expects key/value columns) — jar-gated."""
    _require_kafka(df.sparkSession)
    return (  # pragma: no cover - jar-dependent
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake table read — stub until delta-spark jars are present."""
    _require("delta", "Delta Lake support")
    return spark.read.format("delta").load(path)  # pragma: no cover


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg table read — stub until iceberg-spark-runtime is present."""
    _require("pyiceberg", "Apache Iceberg support")
    return spark.read.format("iceberg").load(table)  # pragma: no cover
