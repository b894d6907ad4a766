"""Global physical-plan audit: invariants every registered query must
hold at any scale. A CartesianProduct is quadratic work the moment a
broadcast bound is exceeded, and BatchEvalPython is a row-at-a-time
Python UDF (the hot-path poison the repo bans — Arrow batch kernels
show up as ArrowEvalPython / MapInPandas instead). One test sweeps
the whole registry so new queries can't quietly regress."""

from __future__ import annotations

from hha_spark.caching import release_tracked
from hha_spark.queries import all_queries

SF = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def test_no_cartesian_or_row_python_udf_in_any_query(spark):
    bad: dict[str, object] = {}
    for name, fn in all_queries().items():
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # plan construction must not error
            bad[name] = f"{type(ex).__name__}: {ex}"
            continue
        finally:
            release_tracked()
        hits = [n for n in FORBIDDEN if n in plan]
        if hits:
            bad[name] = hits
    assert not bad, f"plan-invariant violations: {bad}"


def test_audit_flags_planted_row_udf(spark):
    """The audit's violation detector must fire on a genuine
    row-at-a-time Python UDF plan (and the registry sweep above
    proves no registered query has one)."""
    import sys

    sys.path.insert(0, "tools")
    from explain_audit import violations

    from pyspark.sql.functions import col, udf

    slow = udf(lambda x: x + 1, "long")
    df = spark.range(10).select(slow(col("id")).alias("y"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert violations(plan) == ["BatchEvalPython"]
    clean = spark.range(10).selectExpr("id + 1 AS y")
    assert violations(
        clean._jdf.queryExecution().executedPlan().toString()
    ) == []
