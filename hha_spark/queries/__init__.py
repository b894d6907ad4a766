"""Registry of driver-facing queries and their DuckDB oracles.

Each module contributes (name -> callable(spark, sf_dir) -> DataFrame)
and (name -> ANSI SQL string). The driver runs both at sf0.01 and
hash-compares row values, so every computed column is aliased to the
same name on both sides and all arithmetic is cross-engine
deterministic (see functions/exact.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hha_spark.queries import (
    corpus,
    llm_ops,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    spike_events,
    streaming_gate,
    temporal,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# Order is the driver's verification window: it oracle-checks the FIRST
# 50 names yielded here. Rounds 1-3 verified the spike/relational1-5
# suites (50/50 green in CORRECTNESS_r03); round 4 rotates the
# never-checked modules (llm_ops, temporal, corpus, relational6/7) to
# the front so they earn driver-verified rows. Rotate again next round
# if any remainder is still unchecked. See COVERAGE.md for the policy.
_MODULES = (
    llm_ops,
    streaming_gate,
    temporal,
    corpus,
    relational6,
    relational7,
    spike_events,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
)


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
