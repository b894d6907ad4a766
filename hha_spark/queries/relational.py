"""Relational operator coverage over the TPC-H-ish tables.

The reference's operator surface (SURVEY.md §2.2: filter, projection,
hash aggregation, left join, union, when/otherwise, coalesce,
semi-join-in-spirit) plus the standard OLAP repertoire Spark gives us
for free — each exercised by one query with a DuckDB oracle.

Determinism rules (see functions/exact.py): money sums go through
exact DECIMAL; top-k queries carry a unique tiebreak column; floats
emitted only when bit-identical across engines (raw column values or
exact-decimal -> double casts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hha_spark.functions.exact import dec_sum, dec_sum_mul, trunc_avg_exact
from hha_spark.sources.tables import events_ts_us, load_table


def _t(spark, sf_dir, name) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- O11 aggregation: TPC-H Q1 pricing summary ---------------------------

def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", out="sum_qty"),
            dec_sum("l_extendedprice", out="sum_base_price"),
            dec_sum_mul("l_extendedprice", "1 - l_discount", out="sum_disc_price"),
            # scale-10 decimal sums exceed 2^53 when rescaled, so a
            # direct decimal->double cast double-rounds in DuckDB;
            # floor to an exact BIGINT at scale 6 first, then one
            # correctly-rounded division (identical in both engines)
            F.expr(
                "CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
                "CAST(1 - l_discount AS DECIMAL(8,4)) * "
                "CAST(1 + l_tax AS DECIMAL(8,4))) * 1000000) AS BIGINT) "
                "/ CAST(1000000 AS DOUBLE)"
            ).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sum_disc_price,
           CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,4)) *
                    CAST(1 + l_tax AS DECIMAL(8,4))) * 1000000) AS BIGINT)
               / CAST(1000000 AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


# --- O12 join + top-k: revenue per order ----------------------------------

def top_revenue_orders(spark, sf_dir):
    li, orders = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    rev = li.groupBy("l_orderkey").agg(
        dec_sum_mul("l_extendedprice", "1 - l_discount", out="revenue")
    )
    return (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


ORACLE_TOP_REVENUE = """
    SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 20
"""


# --- O12 left join + O10 coalesce: per-customer order stats ---------------

def customer_order_stats(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.expr(
                "CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) "
                "AS DOUBLE)"
            ).alias("total_spent"),
        )
    )


ORACLE_CUSTOMER_ORDERS = """
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
               AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
"""


# --- grouping sets: region/nation rollup ----------------------------------

def nation_region_rollup(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(
        nation, cust.c_nationkey == nation.n_nationkey
    ).join(region, nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum("c_acctbal", out="total_acctbal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
    )


ORACLE_ROLLUP = """
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
"""


# --- count distinct -------------------------------------------------------

def distinct_parts_per_flag(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_DISTINCT = """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
"""


# --- window function: top-3 customers per nation --------------------------

def top3_customers_per_nation(spark, sf_dir):
    cust, nation = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
        .withColumn("rank_in_nation", F.row_number().over(w).cast("long"))
        .where(F.col("rank_in_nation") <= 3)
    )


ORACLE_TOP3 = """
    SELECT n_name, c_custkey, c_acctbal, rank_in_nation FROM (
        SELECT n_name, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY n_name
                                  ORDER BY c_acctbal DESC, c_custkey) AS rank_in_nation
        FROM customer JOIN nation ON c_nationkey = n_nationkey) t
    WHERE rank_in_nation <= 3
"""


# --- anti join: customers without orders ----------------------------------

def customers_without_orders(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


ORACLE_NO_ORDERS = """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- semi join: suppliers in nations with rich customers ------------------

def suppliers_in_rich_nations(spark, sf_dir):
    supp, cust = _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "customer")
    rich = cust.where(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("s_nationkey")
    )
    return supp.join(rich, on="s_nationkey", how="left_semi").select(
        "s_suppkey", "s_name"
    )


ORACLE_SEMI = """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)
"""


# --- when/otherwise + string functions ------------------------------------

def part_size_classes(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    size_class = (
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
    )
    return (
        part.withColumn("size_class", size_class)
        .withColumn("brand_upper", F.upper("p_brand"))
        .groupBy("size_class", "brand_upper")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dec_sum("p_retailprice", out="total_price"),
        )
    )


ORACLE_SIZE_CLASSES = """
    SELECT CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 30 THEN 'medium'
                ELSE 'large' END AS size_class,
           UPPER(p_brand) AS brand_upper,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part GROUP BY 1, 2
"""


# --- date functions: orders by month ---------------------------------------

def orders_by_month(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice", out="total"),
    )


ORACLE_BY_MONTH = """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1, 2
"""


# --- set op: nations having both customers and suppliers -------------------

def nations_with_both(spark, sf_dir):
    cust, supp = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
        .intersect(supp.select(F.col("s_nationkey").alias("nationkey")).distinct())
    )


ORACLE_INTERSECT = """
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
"""


# --- JSON extraction over events -------------------------------------------

def events_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_JSON = """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
"""


# --- sessionization: lag window over event times ---------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000


def events_sessionize(spark, sf_dir):
    ev_raw = _t(spark, sf_dir, "events")
    ev = ev_raw.select(
        events_ts_us(ev_raw).alias("ts_us"), "user_id", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE_SESSIONIZE = f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
    l AS (
      SELECT user_id, ts_us,
             LAG(ts_us) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id) AS prev_ts
      FROM e)
    SELECT user_id,
           CAST(SUM(CASE WHEN prev_ts IS NULL
                           OR ts_us - prev_ts > {SESSION_GAP_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM l GROUP BY user_id
"""


# --- truncated-average (reference S1 shape) over lineitem -------------------

def avg_qty_per_part(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(trunc_avg_exact("l_quantity", out="avg_qty"))


ORACLE_AVG_QTY = """
    SELECT l_partkey,
           CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(18,6))) / COUNT(*)) AS BIGINT)
               AS avg_qty
    FROM lineitem GROUP BY l_partkey
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "top_revenue_orders": top_revenue_orders,
    "customer_order_stats": customer_order_stats,
    "nation_region_rollup": nation_region_rollup,
    "distinct_parts_per_flag": distinct_parts_per_flag,
    "top3_customers_per_nation": top3_customers_per_nation,
    "customers_without_orders": customers_without_orders,
    "suppliers_in_rich_nations": suppliers_in_rich_nations,
    "part_size_classes": part_size_classes,
    "orders_by_month": orders_by_month,
    "nations_with_both": nations_with_both,
    "events_json_extract": events_json_extract,
    "events_sessionize": events_sessionize,
    "avg_qty_per_part": avg_qty_per_part,
}

ORACLES = {
    "q1_pricing_summary": ORACLE_Q1,
    "top_revenue_orders": ORACLE_TOP_REVENUE,
    "customer_order_stats": ORACLE_CUSTOMER_ORDERS,
    "nation_region_rollup": ORACLE_ROLLUP,
    "distinct_parts_per_flag": ORACLE_DISTINCT,
    "top3_customers_per_nation": ORACLE_TOP3,
    "customers_without_orders": ORACLE_NO_ORDERS,
    "suppliers_in_rich_nations": ORACLE_SEMI,
    "part_size_classes": ORACLE_SIZE_CLASSES,
    "orders_by_month": ORACLE_BY_MONTH,
    "nations_with_both": ORACLE_INTERSECT,
    "events_json_extract": ORACLE_JSON,
    "events_sessionize": ORACLE_SESSIONIZE,
    "avg_qty_per_part": ORACLE_AVG_QTY,
}
