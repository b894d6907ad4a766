"""Fifth coverage batch: full outer joins, explicit GROUPING SETS,
unpivot (wide->long melt), and exact second-moment statistics
(covariance / correlation) without float accumulation.

Determinism notes (see functions/exact.py): every SUM that feeds a
double is an exact DECIMAL sum cast once; covariance/correlation are
computed from those exact sums with textually identical final-double
expressions on both engines, so the IEEE operation sequence matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hha_spark.functions.exact import dec_sum
from hha_spark.sources.tables import load_table


def _t(spark, sf_dir, name) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- full outer join: two fact streams with disjoint time ranges -----------


def daily_activity_fulljoin(spark, sf_dir):
    """Per-day order counts FULL OUTER JOIN per-day event counts.

    The two streams live in different eras (orders in the 1990s,
    events in 2024), so both unmatched sides are genuinely exercised —
    the shape used to reconcile two pipelines' daily ledgers. Both
    sides pre-aggregate to one row per day BEFORE the join (the join
    input is days, not raw facts), then meet in a day-keyed shuffle
    join. Event days derive from integer days-since-epoch — timezone-
    free, identical in both engines.
    """
    orders_d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    events_d = (
        _t(spark, sf_dir, "events")
        .select(F.expr("ts DIV 1000 DIV 86400000000").alias("day_idx"))
        .groupBy("day_idx")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(
                F.date_add(
                    F.lit("1970-01-01").cast("date"), F.col("day_idx").cast("int")
                ),
                "yyyy-MM-dd",
            ).alias("day"),
            "n_events",
        )
    )
    return orders_d.join(events_d, on="day", how="full_outer")


ORACLE_FULLJOIN = """
    WITH o AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1),
    e AS (
      SELECT strftime(DATE '1970-01-01'
                      + CAST(epoch_us(ts) // 86400000000 AS INT),
                      '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1)
    SELECT COALESCE(o.day, e.day) AS day, n_orders, n_events
    FROM o FULL OUTER JOIN e ON o.day = e.day
"""


# --- explicit GROUPING SETS -------------------------------------------------


def orders_grouping_sets(spark, sf_dir):
    """GROUPING SETS ((priority, status), (priority), ()) — the
    general form rollup/cube are sugar for, with grouping_id
    distinguishing aggregate-NULL from data-NULL. One Expand + one
    aggregation shuffle; no repeated scans per set."""
    return (
        _t(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", out="sum_price"),
        )
    )


ORACLE_GROUPING_SETS = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
"""


# --- unpivot (wide -> long melt) -------------------------------------------

_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def lineitem_measures_unpivot(spark, sf_dir):
    """Melt the four lineitem measures into (measure, value) rows and
    aggregate per (returnflag, measure) — the wide-to-long reshape
    feeding generic per-metric pipelines. unpivot is a narrow 4x row
    expansion (no shuffle); the only shuffle is the final aggregation
    on a 12-key space. DECIMAL(18,4) covers both money (2dp) and
    rate (2-4dp) columns exactly."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", *_MEASURES)
    long = li.unpivot("l_returnflag", _MEASURES, "measure", "val")
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("val", scale=4, out="sum_val"),
    )


_UNPIVOT_ARMS = " UNION ALL ".join(
    f"SELECT l_returnflag, '{m}' AS measure, {m} AS val FROM lineitem"
    for m in _MEASURES
)

ORACLE_UNPIVOT = f"""
    SELECT l_returnflag, measure, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
    FROM ({_UNPIVOT_ARMS})
    GROUP BY l_returnflag, measure
"""


# --- exact covariance / correlation ----------------------------------------

# identical final-double arithmetic on both engines, over exact
# decimal sums: cov_n = n*Sxy - Sx*Sy (doubles), corr = cov_n /
# sqrt((n*Sxx - Sx*Sx) * (n*Syy - Sy*Sy))
_MOMENTS = {
    "n": "CAST(COUNT(*) AS BIGINT)",
    "sx": "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)",
    "sy": "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)",
    "sxx": "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))"
    " * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)",
    "syy": "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)",
    "sxy": "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))"
    " * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)",
}
_FINAL = {
    "covar_pop_qty_price": "(n * sxy - sx * sy) / (CAST(n AS DOUBLE) * n)",
    "corr_qty_price": "(n * sxy - sx * sy)"
    " / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))",
}


def lineitem_price_qty_corr(spark, sf_dir):
    """Population covariance and Pearson correlation of (quantity,
    extendedprice) per returnflag — WITHOUT covar_pop/corr float
    accumulators, whose partial-aggregation order differs between
    engines (and between Spark partitionings!). All five moments are
    exact decimal sums in one aggregation pass; the covariance and
    correlation are single deterministic double expressions over them.
    """
    moments = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(*(F.expr(e).alias(k) for k, e in _MOMENTS.items()))
    )
    return moments.select(
        "l_returnflag",
        "n",
        *(F.expr(e).alias(k) for k, e in _FINAL.items()),
    )


_MOM_SQL = ", ".join(f"{e} AS {k}" for k, e in _MOMENTS.items())
_FIN_SQL = ", ".join(f"{e} AS {k}" for k, e in _FINAL.items())

ORACLE_CORR = f"""
    WITH m AS (
      SELECT l_returnflag, {_MOM_SQL}
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n, {_FIN_SQL}
    FROM m
"""


QUERIES = {
    "daily_activity_fulljoin": daily_activity_fulljoin,
    "orders_grouping_sets": orders_grouping_sets,
    "lineitem_measures_unpivot": lineitem_measures_unpivot,
    "lineitem_price_qty_corr": lineitem_price_qty_corr,
}

ORACLES = {
    "daily_activity_fulljoin": ORACLE_FULLJOIN,
    "orders_grouping_sets": ORACLE_GROUPING_SETS,
    "lineitem_measures_unpivot": ORACLE_UNPIVOT,
    "lineitem_price_qty_corr": ORACLE_CORR,
}
