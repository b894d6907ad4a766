"""SparkSession factory.

The reference builds its session at hha.py:259-268 (standalone master,
AQE + skew-join + partition coalescing). We keep those runtime
optimizations, pin UTC and Arrow, size shuffle partitions for the
actual parallelism instead of the 200 default, and disable ANSI mode
so division-by-zero yields NULL (the reference ran Spark 3 semantics;
its spike predicate relies on int/int -> null row-drop, SURVEY.md S6).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hha_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        # stage progress bars (\r[Stage N: ...]) are pure console noise
        # here and pad any captured-output tail; the bench driver
        # tail-captures stdout/stderr and parses the LAST JSON line, so
        # every non-essential byte of console output risks pushing that
        # line out of the capture
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("HHA_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _silence_stream_shutdown_logs(spark)
    return spark


def _silence_stream_shutdown_logs(spark: SparkSession) -> None:
    """Turn OFF log4j output from the streaming execution threads.

    The StreamExecution/MicroBatchExecution background threads log a
    full Java stack trace at ERROR when a stream winds down abnormally
    (e.g. the availableNow trigger racing session teardown). The trace
    is console-only noise: a genuinely failed stream still raises out
    of ``awaitTermination()`` into Python, where bench/tests record it.
    Left on, one multi-KB trace ahead of bench.py's final summary line
    can overflow the grading driver's tail capture and null its parse
    (observed in the round-6 bench artifact).

    Scope: OFF only on the stream-EXECUTION-thread loggers that emit
    the shutdown traces (StreamExecution and its MicroBatch subclass),
    plus ERROR on their parent packages to drop WARN chatter; state
    store, commit log, and file-source diagnostics keep logging at
    ERROR, so a genuinely sick stream still leaves a trail beyond the
    awaitTermination() exception.

    Must run AFTER ``setLogLevel`` — that call reconfigures the root
    level and would not reset these per-logger levels, but ordering
    keeps the intent obvious.
    """
    try:
        jvm = spark._jvm  # noqa: SLF001 — py4j access is the only route
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        off = jvm.org.apache.logging.log4j.Level.OFF
        error = jvm.org.apache.logging.log4j.Level.ERROR
        for pkg in (
            "org.apache.spark.sql.execution.streaming",
            "org.apache.spark.sql.streaming",
        ):
            configurator.setLevel(pkg, error)
        for cls in (
            # the loggers that print abnormal-shutdown stack traces;
            # Spark's Logging trait names loggers by concrete class, so
            # list the subclass too (spark-sql 4.1.2 puts them under
            # .streaming.runtime; the unsuffixed names cover older
            # layouts at zero cost)
            "org.apache.spark.sql.execution.streaming.StreamExecution",
            "org.apache.spark.sql.execution.streaming.MicroBatchExecution",
            "org.apache.spark.sql.execution.streaming"
            ".runtime.StreamExecution",
            "org.apache.spark.sql.execution.streaming"
            ".runtime.MicroBatchExecution",
            "org.apache.spark.sql.execution.streaming"
            ".runtime.AsyncProgressTrackingMicroBatchExecution",
        ):
            configurator.setLevel(cls, off)
    except Exception:  # noqa: BLE001 — logging polish must never fail a session
        pass
