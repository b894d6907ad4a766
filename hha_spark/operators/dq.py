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


def robust_outlier_report(
    df: DataFrame, *, group_col: str, value_col: str, k: int = 3,
) -> DataFrame:
    """Per-group robust outlier accounting via median / MAD — the
    monitoring gate that survives the outliers it is hunting (mean /
    stddev do not: one corrupt 1e12 reading drags the mean past every
    legitimate row).

    Per group: med = median(value), mad = median(|value - med|), and
    n_outliers counts rows with |value - med| > k * mad (the robust
    z-score at the conventional cutoff). Output is one row per group
    (group, n, med_value, mad_value, n_outliers).

    Cross-engine determinism: exact-percentile interpolation is the
    IDENTICAL double expression lo + (hi-lo)*0.5 in Spark's
    `percentile` and DuckDB's `quantile_cont`, and every derived value
    (abs diff, k*mad compare) is the same double op on the same
    inputs — the precedent `median_qty_per_flag` has held green since
    round 1.

    Scale shape: two grouped exact percentiles (each one shuffle of
    (group, value) pairs — percentile is holistic, the unavoidable
    cost of EXACT medians; swap in approx_percentile for sketch-
    mergeable one-pass at 100 TB) with the tiny per-group stats
    broadcast back onto the fact scan both times. The fact table is
    never shuffled on a data-sized key.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    dev = df.join(F.broadcast(med), on=group_col).withColumn(
        "absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.expr("percentile(absdev, 0.5)").alias("mad"),
        F.min("med").alias("med"),
    )
    flagged = dev.drop("med").join(F.broadcast(mad), on=group_col)
    return flagged.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("med").alias("med_value"),
        F.min("mad").alias("mad_value"),
        F.sum(
            F.when(F.col("absdev") > F.lit(k) * F.col("mad"), 1).otherwise(0)
        ).cast("long").alias("n_outliers"),
    )


def join_key_skew_report(
    df: DataFrame,
    key_col: str,
    *,
    top_k: int = 10,
    factor_num: int = 3,
    factor_den: int = 1,
) -> DataFrame:
    """Join-key skew diagnostics: the report you run BEFORE deciding
    whether a 100 TB join needs salting (operators/skew.py), AQE skew
    splitting, or a broadcast. Emits the top_k hottest keys with
    their row counts and a `skewed` flag — key hotter than
    (factor_num/factor_den) x the per-key mean — via exact
    cross-multiplication in DECIMAL(38,0)
    (cnt * n_keys * den > num * total): exact AND overflow-free at
    precisely the trillion-row/billion-key scale the report is for,
    where the BIGINT product cnt*n_keys would wrap (ANSI-off) or
    throw (ANSI). The boundary is engine-independent.

    Shape: one map-side-combinable count per key, a one-row global
    summary broadcast onto the winners, and the global top-k via
    orderBy+limit (TakeOrdered — a per-partition heap then a k-row
    driver merge, never a full sort); the rank window runs on the
    <= top_k surviving rows. Nothing is ever data-sized on one node.
    """
    from pyspark.sql import Window

    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc(key_col)).limit(top_k)
    w = Window.orderBy(F.desc("cnt"), F.asc(key_col))
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(totals))
        .select(
            key_col, "cnt", "rnk", "total_rows", "n_keys",
            (
                F.col("cnt").cast("decimal(38,0)")
                * F.col("n_keys")
                * F.lit(factor_den)
                > F.lit(factor_num) * F.col("total_rows").cast("decimal(38,0)")
            ).alias("skewed"),
        )
    )
