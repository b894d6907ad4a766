"""Data-quality expectations — the Deequ/Great-Expectations shape as
one aggregation pass.

A pipeline gate needs "how many rows violate each rule" for a table
of rules WITHOUT one scan per rule: every row-local check compiles to
a conditional sum in a single aggregation (one scan, map-side
combinable, whole-stage codegen). Referential checks (key exists in a
dimension) are the one shape that genuinely needs a join — a
broadcast anti-join against the (small) key side, counted, and glued
onto the one-row report via a broadcast of two 1-row frames.

Scale: the fact table is scanned once for all row-local rules plus
once per referential rule (each a narrow two-column projection); no
collect, no per-rule jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    checks: list[tuple[str, Column]],
    *,
    ref_checks: list[tuple[str, str, DataFrame, str]] | None = None,
) -> DataFrame:
    """One-row report: n_rows plus viol_<name> per rule.

    checks: (name, boolean Column) — rows where the column is FALSE
    or NULL count as violations (a null check result is a violation,
    not a pass — the conservative reading).
    ref_checks: (name, fact_key_col, dim_df, dim_key_col) — counts
    fact rows whose key has no match in the dimension.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, cond in checks:
        aggs.append(
            F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1))
            .cast("long")
            .alias(f"viol_{name}")
        )
    report = df.agg(*aggs)
    for name, fact_key, dim, dim_key in ref_checks or []:
        orphans = (
            df.select(F.col(fact_key).alias("_k"))
            .join(
                F.broadcast(dim.select(F.col(dim_key).alias("_k")).distinct()),
                on="_k",
                how="left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias(f"viol_{name}"))
        )
        report = report.join(F.broadcast(orphans))
    return report
