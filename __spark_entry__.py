"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship spike-detection query on sf0.001.
queries()      -- every implemented operator (SURVEY.md §2 + M3).
oracle_sql()   -- DuckDB-equivalent SQL per query for the t2 gate.

Implementation lives in the hha_spark package; this module is a thin
adapter so the driver sees a stable surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hha_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: two-window spike comparison (S1+S3+S4) over events."""
    from hha_spark.queries.spike_events import spike_events_compare

    return spike_events_compare(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
