"""Fourth coverage batch: the TPC-H correlated-subquery family.

The earlier relational batches cover scans, joins, windows, and
grouping sets; this one covers the decorrelation shapes — EXISTS /
NOT EXISTS semi- and anti-joins, scalar-aggregate subqueries, and
HAVING-driven semi-joins — each rewritten the way a Spark plan should
run them at 100 TB: aggregate-once-then-join instead of per-row
re-evaluation, broadcast for the scalar/small side, and a single
shuffle per fact aggregation.

The test tables carry no partsupp and no commit/receipt dates, so the
Q4/Q12/Q21 analogues keep the reference query's *structure* (the part
Catalyst has to plan) with `l_returnflag = 'R'` standing in for the
late-delivery predicate; Q2/Q11/Q16/Q20 (partsupp-dependent) are out
of scope for this dataset.

Determinism (see functions/exact.py): money sums via DECIMAL, integer
counts CAST AS BIGINT on the DuckDB side (SUM(int) is HUGEINT there),
quantity comparisons against averages via decimal cross-multiplication
(5*qty*cnt < sum) instead of a float division, and single final
double divisions only on exact-decimal inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hha_spark.functions.exact import dec_sum, dec_sum_mul
from hha_spark.sources.tables import load_table


def _t(spark, sf_dir, name) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


# --- Q4 analogue: order priority with EXISTS -------------------------------

Q4_LO, Q4_HI = "1996-01-01", "1996-04-01"


def q4_priority_returns(spark, sf_dir):
    """Order counts per priority for orders with >=1 returned lineitem.

    The EXISTS subquery is a LEFT SEMI join: lineitem is filtered to
    returnflag='R' on the scan (pushed filter), projected to the join
    key only, and semi-joined to the date-windowed orders — no
    duplicate-then-distinct, no row explosion. One aggregation shuffle
    on o_orderpriority.
    """
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts(Q4_LO)) & (F.col("o_orderdate") < _ts(Q4_HI))
    ).select("o_orderkey", "o_orderpriority")
    returned = _t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_Q4 = f"""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{Q4_LO}'
      AND o_orderdate < TIMESTAMP '{Q4_HI}'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
"""


# --- Q7 analogue: volume shipping between two nations ----------------------

Q7_N1, Q7_N2 = "NATION_1", "NATION_2"
Q7_LO, Q7_HI = "1996-01-01", "1998-01-01"


def q7_volume_shipping(spark, sf_dir):
    """Bilateral trade volume: revenue by (supplier nation, customer
    nation, ship year) for the two flow directions between two nations.

    Both nation-tagged dimensions (supplier, customer->orders) are
    broadcast; the asymmetric-pair predicate collapses to a
    nation-name inequality after the joins. The fact table shuffles
    once, for the final aggregation.
    """
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin(Q7_N1, Q7_N2)
    ).select("n_nationkey", "n_name")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts(Q7_LO)) & (F.col("l_shipdate") < _ts(Q7_HI))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dec_sum_mul("l_extendedprice", "1 - l_discount", out="revenue"))
    )


ORACLE_Q7 = f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('{Q7_N1}', '{Q7_N2}')
        AND n2.n_name IN ('{Q7_N1}', '{Q7_N2}')
        AND n1.n_name <> n2.n_name
        AND l_shipdate >= TIMESTAMP '{Q7_LO}'
        AND l_shipdate < TIMESTAMP '{Q7_HI}')
    GROUP BY supp_nation, cust_nation, l_year
"""


# --- Q12 analogue: line categories vs order priority -----------------------

Q12_LO, Q12_HI = "1996-01-01", "1997-01-01"


def q12_priority_lines(spark, sf_dir):
    """Conditional aggregation: per returnflag, how many lineitems
    belong to high- vs low-priority orders. One broadcast-joined
    priority lookup (orders projected to two columns), one aggregation
    shuffle; the CASE arithmetic is whole-stage-codegen integer work.
    """
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts(Q12_LO)) & (F.col("l_shipdate") < _ts(Q12_HI))
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


ORACLE_Q12 = f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '{Q12_LO}'
      AND l_shipdate < TIMESTAMP '{Q12_HI}'
    GROUP BY l_returnflag
"""


# --- Q14 analogue: promo revenue ratio -------------------------------------

Q14_LO, Q14_HI = "1996-09-01", "1996-10-01"


def q14_promo_revenue(spark, sf_dir):
    """Share of revenue from PROMO parts in one month: global
    conditional aggregation with an exact-decimal numerator and
    denominator, divided once at the very end (a single IEEE double
    division of two exactly-converted values — deterministic).

    The part side is projected to (key, is-promo flag) and broadcast.
    """
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts(Q14_LO)) & (F.col("l_shipdate") < _ts(Q14_HI))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        F.expr(
            "CAST(SUM(CASE WHEN is_promo THEN CAST(l_extendedprice AS DECIMAL(18,2)) *"
            " CAST(1 - l_discount AS DECIMAL(8,4)) ELSE CAST(0 AS DECIMAL(26,6)) END)"
            " AS DOUBLE)"
        ).alias("promo_revenue"),
        dec_sum_mul("l_extendedprice", "1 - l_discount", out="total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.nullif(F.col("total_revenue"), F.lit(0.0))).alias("promo_pct"),
    )


ORACLE_Q14 = f"""
    SELECT promo_revenue, total_revenue,
           100.0 * promo_revenue / NULLIF(total_revenue, 0.0) AS promo_pct
    FROM (
      SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                                CAST(1 - l_discount AS DECIMAL(8,4))
                           ELSE CAST(0 AS DECIMAL(26,6)) END) AS DOUBLE)
                 AS promo_revenue,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE)
                 AS total_revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '{Q14_LO}'
        AND l_shipdate < TIMESTAMP '{Q14_HI}')
"""


# --- Q17 analogue: small-quantity revenue ----------------------------------

Q17_BRAND = "Brand#7"


def q17_small_quantity_revenue(spark, sf_dir):
    """Revenue from lineitems whose quantity is under 20% of the
    per-part average — the classic correlated scalar-aggregate
    subquery, decorrelated: aggregate lineitem per part ONCE, then
    join the aggregate back and filter.

    Scale shape: lineitem is first semi-joined to the (broadcast)
    brand-filtered part list, so the per-part aggregation only
    shuffles the brand's rows, not the whole fact table. The
    avg-fraction comparison runs as decimal cross-multiplication
    (5*qty*cnt < sum_qty) — no float division anywhere.
    """
    part = _t(spark, sf_dir, "part").where(
        F.col("p_brand") == Q17_BRAND
    ).select("p_partkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.expr("SUM(CAST(l_quantity AS DECIMAL(18,2)))").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    ).withColumnRenamed("l_partkey", "agg_partkey")
    joined = li.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("agg_partkey")
    ).where(
        F.expr("5 * CAST(l_quantity AS DECIMAL(18,2)) * cnt < sum_qty")
    )
    return joined.agg(
        (dec_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly")
    )


ORACLE_Q17 = f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS agg_partkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                 COUNT(*) AS cnt
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_brand = '{Q17_BRAND}')
          GROUP BY l_partkey) a ON agg_partkey = l_partkey
    WHERE p_brand = '{Q17_BRAND}'
      AND 5 * CAST(l_quantity AS DECIMAL(18,2)) * cnt < sum_qty
"""


# --- Q18 analogue: large-volume customers ----------------------------------

Q18_MIN_QTY = 250


def q18_large_volume_customers(spark, sf_dir):
    """Customers whose single orders total >= 250 units: HAVING-driven
    semi-join. The per-order quantity aggregation is the only big
    shuffle; the surviving order keys (few) broadcast back into
    orders, then customer broadcasts in. Top-100 via
    TakeOrderedAndProject, not a global sort.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = li.groupBy("l_orderkey").agg(
        F.expr("SUM(CAST(l_quantity AS DECIMAL(18,2)))").alias("sum_qty_dec")
    ).where(F.col("sum_qty_dec") >= Q18_MIN_QTY)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


ORACLE_Q18 = f"""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_totalprice,
           CAST(sum_qty_dec AS DOUBLE) AS total_qty
    FROM orders
    JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >= {Q18_MIN_QTY}) b
      ON o_orderkey = b.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
"""


# --- Q21 analogue: exclusive-returner suppliers ----------------------------

Q21_NATION = "NATION_3"


def q21_exclusive_returns(spark, sf_dir):
    """Suppliers in one nation who were the ONLY supplier with returns
    in finished multi-supplier orders — Q21's EXISTS + NOT-EXISTS
    pair, decorrelated into one per-order aggregation:

      EXISTS   l2 (other supplier)            <=> #distinct suppliers >= 2
      NOT EXISTS l3 (other supplier returned) <=> #distinct returning
                                                  suppliers == 1
      (the probe row itself has returnflag 'R', so ==1 pins the set to
      exactly the probe's supplier)

    One lineitem aggregation shuffle builds the per-order stats; the
    'R' probe rows join those stats and the finished-order keys on
    l_orderkey (two co-partitioned shuffle joins that AQE can chain);
    supplier and nation broadcast at the end.
    """
    li = _t(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_rsupp"),
    ).where((F.col("n_supp") >= 2) & (F.col("n_rsupp") == 1))
    finished = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    probe = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("p_orderkey"), "l_suppkey"
    )
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == Q21_NATION)
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    joined = (
        probe.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(stats, F.col("p_orderkey") == F.col("l_orderkey"))
        .join(finished, F.col("p_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    return (
        joined.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


ORACLE_Q21 = f"""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE l1.l_returnflag = 'R'
      AND n_name = '{Q21_NATION}'
      AND EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l1.l_orderkey
                  AND o_orderstatus = 'F')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


# --- Q22 analogue: rich inactive customers ---------------------------------

Q22_SINCE = "2000-01-01"


def q22_inactive_rich_customers(spark, sf_dir):
    """Customer segments (last custkey digit standing in for Q22's
    phone country code) with above-average balances and no RECENT
    orders: a scalar-aggregate subquery plus an anti-join. (Q22's
    "no orders ever" is vacuous on this dataset — every rich customer
    has some order — so the anti-join predicate is date-windowed,
    which keeps the NOT-EXISTS shape selective AND non-empty.)

    The global positive-balance average rides a broadcast 1-row frame;
    the above-average test is decimal cross-multiplication
    (bal*cnt > sum), exact in both engines. The NOT EXISTS is a LEFT
    ANTI join against the recent-order custkeys.
    """
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") % 10).alias("cntrycode"),
        "c_acctbal",
    )
    pos_avg = cust.where(F.col("c_acctbal") > 0).agg(
        F.expr("SUM(CAST(c_acctbal AS DECIMAL(18,2)))").alias("sum_bal"),
        F.count(F.lit(1)).alias("cnt_bal"),
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ts(Q22_SINCE)
    ).select("o_custkey")
    rich = (
        cust.join(F.broadcast(pos_avg))
        .where(F.expr("CAST(c_acctbal AS DECIMAL(18,2)) * cnt_bal > sum_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        rich.groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum("c_acctbal", out="totacctbal"),
        )
    )


ORACLE_Q22 = f"""
    WITH avgbal AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal,
             COUNT(*) AS cnt_bal
      FROM customer WHERE c_acctbal > 0)
    SELECT CAST(c_custkey % 10 AS BIGINT) AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avgbal
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt_bal > sum_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '{Q22_SINCE}')
    GROUP BY cntrycode
"""


QUERIES = {
    "q4_priority_returns": q4_priority_returns,
    "q7_volume_shipping": q7_volume_shipping,
    "q12_priority_lines": q12_priority_lines,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q21_exclusive_returns": q21_exclusive_returns,
    "q22_inactive_rich_customers": q22_inactive_rich_customers,
}

ORACLES = {
    "q4_priority_returns": ORACLE_Q4,
    "q7_volume_shipping": ORACLE_Q7,
    "q12_priority_lines": ORACLE_Q12,
    "q14_promo_revenue": ORACLE_Q14,
    "q17_small_quantity_revenue": ORACLE_Q17,
    "q18_large_volume_customers": ORACLE_Q18,
    "q21_exclusive_returns": ORACLE_Q21,
    "q22_inactive_rich_customers": ORACLE_Q22,
}
