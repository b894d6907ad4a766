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


def write_table(
    df: DataFrame, path: str, *, fmt: str = "parquet", mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def _require(module: str, feature: str) -> None:
    import importlib

    try:
        importlib.import_module(module)
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            f"{feature} requires the '{module}' package and its runtime jars, "
            "which are not available in this environment"
        ) from exc


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake table read — stub until delta-spark jars are present."""
    _require("delta", "Delta Lake support")
    return spark.read.format("delta").load(path)  # pragma: no cover


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg table read — stub until iceberg-spark-runtime is present."""
    _require("pyiceberg", "Apache Iceberg support")
    return spark.read.format("iceberg").load(table)  # pragma: no cover
