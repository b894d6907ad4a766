"""Alerts sink: a persisted Parquet table.

The reference's sink is `collect()` + a driver loop that prints/logs
each rule and remembers raised alerts in an in-memory dict that dies
with the process (hha.py:223-249). Writing alerts to a table instead
(a) survives restarts, (b) turns the TTL dedup into a broadcast
anti-join against `recent_alerts`, and (c) gives downstream rule
generators a queryable log. `collect_rules` keeps a driver-side path
for parity tests and actual rule emission.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hha_spark.schemas import ALERTS_SCHEMA


def append_alerts(alerts: DataFrame, table_path: str, *, detected_at: int) -> None:
    """Stamp and append a cycle's alerts."""
    (
        alerts.withColumn("detected_at", F.lit(detected_at).cast("long"))
        # Cast every column to its declared type so the parquet footer
        # always matches ALERTS_SCHEMA regardless of whether the caller
        # built sum_val as int (tests) or long (detect_spikes).
        .select(
            [F.col(f.name).cast(f.dataType) for f in ALERTS_SCHEMA.fields]
        )
        .write.mode("append")
        .parquet(table_path)
    )


def recent_alerts(
    spark: SparkSession, table_path: str, *, now: int, ttl_sec: int
) -> DataFrame | None:
    """Alerts raised within the TTL — the dedup anti-join's right side.

    Returns None when the table doesn't exist yet (first cycle).
    """
    try:
        df = spark.read.schema(ALERTS_SCHEMA).parquet(table_path)
    except Exception:  # noqa: BLE001 — path-not-found on first run
        return None
    return df.where(F.col("detected_at") > F.lit(now - ttl_sec))


def compact_alerts(
    spark: SparkSession, table_path: str, *, now: int, keep_sec: int
) -> int:
    """Rewrite the alerts table keeping only the last `keep_sec`.

    The TTL anti-join only ever reads recent rows, but the append-only
    table grows forever; periodic compaction bounds it. Writes to a
    sibling tmp dir then swaps via two Hadoop-FS renames.

    Concurrency contract: the swap is NOT atomic — between the two
    renames the table path briefly does not exist, and a concurrent
    `recent_alerts` would see a missing table and run its cycle with
    TTL dedup disabled (duplicate alerts for that cycle). Run
    compaction from the same single-threaded scheduler as the
    detection cycles (the reference's loop is likewise serial,
    hha.py:315-327), between cycles. A crash between the renames
    leaves the data intact at `<table>__old`; the next compaction (or
    a manual rename) recovers it. Returns the retained row count.
    """
    from hha_spark.sources import fs

    try:
        df = spark.read.schema(ALERTS_SCHEMA).parquet(table_path)
    except Exception:  # noqa: BLE001 — nothing to compact yet
        return 0
    kept = df.where(F.col("detected_at") > F.lit(now - keep_sec))
    tmp = f"{table_path}__compact_tmp"
    kept.write.mode("overwrite").parquet(tmp)
    n = spark.read.schema(ALERTS_SCHEMA).parquet(tmp).count()
    old = f"{table_path}__old"
    fs.delete(spark, old)
    fs.rename(spark, table_path, old)
    fs.rename(spark, tmp, table_path)
    fs.delete(spark, old)
    return n


def collect_rules(alerts: DataFrame) -> list[dict]:
    """Driver-side rule materialization (the reference's observable
    output is a log line per alert, hha.py:240-241)."""
    out = []
    for row in alerts.collect():
        out.append(
            {
                "num_protocol": row.num_protocol,
                "type_proto": row.type_proto,
                "sum_val": row.sum_val,
                "dst_ip": str(ipaddress.IPv4Address(int(row.dst_ip))),
                "scope": row.scope,
            }
        )
    return out
