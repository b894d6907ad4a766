"""Sixth coverage batch: the rest of the TPC-H analogue suite.

relational4.py covered the correlated-subquery family (Q4/Q7/Q12/Q14/
Q17/Q18/Q21/Q22); this batch completes every TPC-H query shape the
test schema can express — Q6, Q8, Q9, Q10, Q13, Q15, Q19. Together
with Q1/Q3/Q5 in earlier batches that is 18 of 22; the remaining four
(Q2/Q11/Q16/Q20) are partsupp-dependent and the dataset has no
partsupp table. Q9's ps_supplycost is replaced by a retail-price cost
proxy (10% of p_retailprice per unit), keeping the query's *plan
shape* — a multi-way star join feeding a two-key aggregation — intact.

Scale notes mirror the suite's conventions: dimensions broadcast, the
fact table shuffles at most once per aggregation, scalar subqueries
ride 1-row broadcast frames, and top-k goes through orderBy+limit
(TakeOrderedAndProject), never a global sort.

Determinism (see functions/exact.py): all money math in DECIMAL; the
Q9 profit is emitted as exact integer cents (no doubles anywhere);
market-share and revenue ratios do a single final double division
guarded by NULLIF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hha_spark.functions.exact import dec_sum_mul
from hha_spark.sources.tables import load_table



def _t(spark, sf_dir, name) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


# --- Q6 analogue: forecasting revenue change --------------------------------

Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"


def q6_forecast_revenue(spark, sf_dir):
    """Revenue delta from discounted small-quantity lines in one year:
    a pure scan-filter-aggregate — the plan should be a single
    FileScan with every predicate pushed down, one partial+final
    aggregation, zero joins and zero shuffles beyond the 1-row
    exchange. The discount band and quantity cap are pushed filters.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts(Q6_LO))
        & (F.col("l_shipdate") < _ts(Q6_HI))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *"
            " CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE)"
        ).alias("revenue")
    )


ORACLE_Q6 = f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_LO}'
      AND l_shipdate < TIMESTAMP '{Q6_HI}'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
"""


# --- Q8 analogue: national market share --------------------------------------

Q8_NATION, Q8_REGION, Q8_TYPE = "NATION_12", "ASIA", "ECONOMY"
Q8_LO, Q8_HI = "1996-01-01", "1998-01-01"


def q8_market_share(spark, sf_dir):
    """One nation's share of a region's market for one part type, by
    order year. Every dimension chain (part-type filter; customer ->
    nation -> region; supplier -> nation) is broadcast; lineitem
    shuffles once for the year aggregation. The share is a CASE-summed
    numerator over the total, both exact decimals, divided once as
    doubles.
    """
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    nation = _t(spark, sf_dir, "nation")
    cust_nat = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key"), "left_semi"
    ).select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= _ts(Q8_LO)) & (F.col("o_orderdate") < _ts(Q8_HI))
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == Q8_TYPE).select("p_partkey")
    supp_nat = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    vol = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,4))"
    agg = joined.groupBy("o_year").agg(
        F.expr(
            f"CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN {vol}"
            f" ELSE CAST(0 AS DECIMAL(26,6)) END) AS DOUBLE)"
        ).alias("nation_volume"),
        F.expr(f"CAST(SUM({vol}) AS DOUBLE)").alias("total_volume"),
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (F.col("nation_volume") / F.nullif(F.col("total_volume"), F.lit(0.0))).alias(
            "mkt_share"
        ),
    )


ORACLE_Q8 = f"""
    SELECT o_year, nation_volume, total_volume,
           nation_volume / NULLIF(total_volume, 0.0) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(SUM(CASE WHEN n2.n_name = '{Q8_NATION}'
                           THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                                CAST(1 - l_discount AS DECIMAL(8,4))
                           ELSE CAST(0 AS DECIMAL(26,6)) END) AS DOUBLE)
                 AS nation_volume,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE)
                 AS total_volume
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n1.n_regionkey
      WHERE r_name = '{Q8_REGION}'
        AND p_type = '{Q8_TYPE}'
        AND o_orderdate >= TIMESTAMP '{Q8_LO}'
        AND o_orderdate < TIMESTAMP '{Q8_HI}'
      GROUP BY o_year)
"""


# --- Q9 analogue: product-type profit ----------------------------------------

Q9_WORD = "widget"


def q9_product_profit(spark, sf_dir):
    """Profit by supplier nation and order year for one product family.

    TPC-H Q9 prices cost from partsupp.ps_supplycost; this schema has
    no partsupp, so unit cost is a fixed 10% of p_retailprice — the
    join DAG (part ⋈ lineitem ⋈ supplier ⋈ nation ⋈ orders) and the
    two-key aggregation are the same shape Catalyst must plan for the
    real Q9. Profit is exact integer CENTS (decimal end-to-end, then
    one floor) so no float ever enters the aggregation.
    """
    part = _t(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q9_WORD)
    ).select("p_partkey", "p_retailprice")
    supp_nat = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    amount = (
        "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,4))"
        " - CAST(0.10 AS DECIMAL(3,2)) * CAST(p_retailprice AS DECIMAL(8,2))"
        " * CAST(l_quantity AS DECIMAL(4,1))"
    )
    return joined.groupBy("nation", "o_year").agg(
        F.expr(f"CAST(FLOOR(SUM({amount}) * 100) AS BIGINT)").alias("profit_cents")
    )


ORACLE_Q9 = f"""
    SELECT nation, o_year,
           CAST(FLOOR(SUM(amount) * 100) AS BIGINT) AS profit_cents
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2)) *
               CAST(1 - l_discount AS DECIMAL(8,4))
             - CAST(0.10 AS DECIMAL(3,2)) * CAST(p_retailprice AS DECIMAL(8,2))
               * CAST(l_quantity AS DECIMAL(4,1)) AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%{Q9_WORD}%')
    GROUP BY nation, o_year
"""


# --- Q10 analogue: returned-item reporting -----------------------------------

Q10_LO, Q10_HI = "1996-01-01", "1996-04-01"


def q10_returned_items(spark, sf_dir):
    """Top 20 customers by revenue lost to returns in one quarter.
    The order-window filter prunes the orders scan; returned lineitems
    join those orders on the shuffle, then customer and nation
    broadcast in for labeling. orderBy+limit compiles to
    TakeOrderedAndProject — only 20 rows ever leave the executors.
    """
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts(Q10_LO)) & (F.col("o_orderdate") < _ts(Q10_HI))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum_mul("l_extendedprice", "1 - l_discount", out="revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '{Q10_LO}'
      AND o_orderdate < TIMESTAMP '{Q10_HI}'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


# --- Q13 analogue: customer order-count distribution -------------------------

Q13_EXCLUDE = "4-NOT SPECIFIED"


def q13_order_distribution(spark, sf_dir):
    """Histogram of customers by order count (a filtered left outer
    join preserving order-less customers, then two aggregations). The
    first groupBy shuffles on c_custkey; the second input is at most
    |distinct counts| rows, so its shuffle is trivial. COUNT(col)
    null-skipping is what keeps zero-order customers in the c_count=0
    bucket.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != Q13_EXCLUDE
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_Q13 = f"""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '{Q13_EXCLUDE}'
      GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


# --- Q15 analogue: top supplier ----------------------------------------------

Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"


def q15_top_supplier(spark, sf_dir):
    """Supplier(s) with the maximum quarterly revenue — Q15's view +
    scalar-MAX subquery. The per-supplier revenue aggregate stays in
    DECIMAL so the equality against the (broadcast, 1-row) max is
    exact integer comparison, never float ==; the double conversion
    happens only in the projected output.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts(Q15_LO)) & (F.col("l_shipdate") < _ts(Q15_HI))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = li.groupBy("l_suppkey").agg(
        F.expr(
            "SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *"
            " CAST(1 - l_discount AS DECIMAL(8,4)))"
        ).alias("rev_dec")
    )
    best = rev.agg(F.max("rev_dec").alias("max_dec"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(best))
        .where(F.col("rev_dec") == F.col("max_dec"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


ORACLE_Q15 = f"""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 CAST(1 - l_discount AS DECIMAL(8,4))) AS rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
        AND l_shipdate < TIMESTAMP '{Q15_HI}'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
    FROM revenue JOIN supplier ON s_suppkey = l_suppkey
    WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
    ORDER BY s_suppkey
"""


# --- Q19 analogue: discounted revenue (disjunctive predicate) ----------------


def q19_disjunctive_revenue(spark, sf_dir):
    """Revenue from two brand/size/quantity bands OR-ed together —
    Q19's stress test for disjunctive join predicates. The part side
    is filtered to the union of both brand bands BEFORE the join (the
    common-conjunct pushdown Catalyst should find), broadcast, and the
    residual OR evaluates post-join inside codegen. One aggregation,
    no shuffle of lineitem beyond the 1-row exchange.
    """
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
        | (F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 40)
    ).select("p_partkey", "p_brand")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(1, 40)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    joined = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).where(
        (F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 25)
        | (F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 40)
    )
    return joined.agg(dec_sum_mul("l_extendedprice", "1 - l_discount", out="revenue"))


ORACLE_Q19 = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
           AND l_quantity BETWEEN 20 AND 40)
"""


# --- market-basket co-occurrence ---------------------------------------------

BASKET_CAP = 8  # orders above this many distinct parts are skipped
COPURCHASE_MIN = 3


def copurchase_part_pairs(spark, sf_dir):
    """Part pairs bought together in >= 3 orders — market-basket
    co-occurrence. The quadratic danger is basket size: a degenerate
    order with 10k parts emits 50M pairs, so baskets above BASKET_CAP
    distinct parts are dropped BEFORE pairing (the standard cap in
    co-occurrence mining; at 100 TB the cap is what turns a worst-case
    quadratic blowup into |orders| x cap²).

    Single-shuffle-per-stage shape (same restructure as the LSH band
    pairing): one bounded collect_set gathers each basket
    (operators/buckets.py dense_rank prune — the set buffer never
    holds more than BASKET_CAP + 1 distinct parts, so a degenerate
    mega-order spills sort I/O instead of materializing its part
    array), the cap filters the gathered array, and pairs generate
    IN-ROW with a sorted slice/transform — no distinct pre-shuffle,
    no self-join re-shuffle, no persisted intermediate. Two exchanges
    total (basket gather, pair aggregate), each on a bounded-width
    key.
    """
    from hha_spark.operators.buckets import capped_bucket_gather

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        capped_bucket_gather(
            li, keys=("l_orderkey",), order_col="l_partkey",
            payload="l_partkey", cap=BASKET_CAP, out_col="parts",
            distinct=True,
        )
        .select("l_orderkey", F.array_sort("parts").alias("parts"))
        .where(F.size("parts") <= BASKET_CAP)
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= COPURCHASE_MIN)
    )


ORACLE_COPURCHASE = f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    small AS (
      SELECT l_orderkey FROM li GROUP BY l_orderkey
      HAVING COUNT(*) <= {BASKET_CAP})
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM li a
    JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    JOIN small s ON a.l_orderkey = s.l_orderkey
    GROUP BY part_a, part_b
    HAVING COUNT(*) >= {COPURCHASE_MIN}
"""


# --- ratio-to-report ---------------------------------------------------------


def nation_revenue_share(spark, sf_dir):
    """Each nation's share of global order revenue — the
    percent-of-total report. The naive formulation is
    `SUM(x) OVER ()`, which funnels every row through ONE partition;
    here the total rides a broadcast 1-row frame joined back onto the
    25-row per-nation aggregate, so nothing is ever single-partition.
    Numerator and denominator stay exact decimals; one double
    division, NULLIF-guarded, at the edge.
    """
    cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    per_nation = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").alias("rev_dec"))
    )
    total = per_nation.agg(F.sum("rev_dec").alias("tot_dec"))
    return per_nation.join(F.broadcast(total)).select(
        "n_name",
        F.col("rev_dec").cast("double").alias("revenue"),
        (
            F.lit(100.0)
            * F.col("rev_dec").cast("double")
            / F.nullif(F.col("tot_dec").cast("double"), F.lit(0.0))
        ).alias("share_pct"),
    )


ORACLE_REVSHARE = """
    WITH per AS (
      SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY n_name),
    tot AS (SELECT SUM(rev_dec) AS tot_dec FROM per)
    SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue,
           100.0 * CAST(rev_dec AS DOUBLE) /
             NULLIF(CAST(tot_dec AS DOUBLE), 0.0) AS share_pct
    FROM per, tot
"""


# --- null semantics ----------------------------------------------------------


def null_semantics_suite(spark, sf_dir):
    """Pins the engine's null algebra against the oracle's: NULL forms
    its own GROUP BY group, COUNT(col) skips nulls while COUNT(*)
    doesn't, and the null-safe equality join (<=> here, IS NOT
    DISTINCT FROM there) matches the NULL group that a plain `=` join
    silently drops — n_matched == n_rows for every group only under
    null-safe semantics.
    """
    base = _t(spark, sf_dir, "orders").select(
        F.expr(
            "CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderkey % 3 END"
        ).alias("nk"),
        "o_totalprice",
    )
    agg = base.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("nk").cast("long").alias("n_nonnull_keys"),
    )
    dim = base.select(F.col("nk").alias("dk")).distinct()
    matched = (
        base.join(F.broadcast(dim), F.col("nk").eqNullSafe(F.col("dk")))
        .groupBy("dk")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return agg.join(
        matched, F.col("nk").eqNullSafe(F.col("dk"))
    ).select("nk", "n_rows", "n_nonnull_keys", "n_matched")


ORACLE_NULLS = """
    WITH base AS (
      SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE o_orderkey % 3 END AS nk
      FROM orders),
    agg AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(nk) AS BIGINT) AS n_nonnull_keys
      FROM base GROUP BY nk),
    dim AS (SELECT DISTINCT nk AS dk FROM base),
    m AS (
      SELECT dk, CAST(COUNT(*) AS BIGINT) AS n_matched
      FROM base JOIN dim ON base.nk IS NOT DISTINCT FROM dim.dk
      GROUP BY dk)
    SELECT nk, n_rows, n_nonnull_keys, n_matched
    FROM agg JOIN m ON agg.nk IS NOT DISTINCT FROM m.dk
"""


# --- deterministic argmax / mode ---------------------------------------------


def top_status_per_flag(spark, sf_dir):
    """Per returnflag, the most frequent linestatus (the MODE) with a
    deterministic tiebreak — engines disagree on bare mode()/max_by()
    ties, so the portable scalable form is count-aggregate then
    rank=1 with (count DESC, value ASC) ordering. The count aggregate
    shrinks the data to |groups x statuses| rows BEFORE the window,
    so the window sorts a frame of a few dozen rows, never the fact
    table; WindowGroupLimit prunes it further.
    """
    from pyspark.sql import Window

    counts = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.asc("l_linestatus")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("l_returnflag", F.col("l_linestatus").alias("mode_status"), "n")
    )


ORACLE_TOP_STATUS = """
    SELECT l_returnflag, l_linestatus AS mode_status,
           CAST(n AS BIGINT) AS n
    FROM (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_linestatus)
                 AS rk
      FROM lineitem GROUP BY l_returnflag, l_linestatus)
    WHERE rk = 1
"""


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q13_order_distribution": q13_order_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "copurchase_part_pairs": copurchase_part_pairs,
    "nation_revenue_share": nation_revenue_share,
    "null_semantics_suite": null_semantics_suite,
    "top_status_per_flag": top_status_per_flag,
}

ORACLES = {
    "q6_forecast_revenue": ORACLE_Q6,
    "q8_market_share": ORACLE_Q8,
    "q9_product_profit": ORACLE_Q9,
    "q10_returned_items": ORACLE_Q10,
    "q13_order_distribution": ORACLE_Q13,
    "q15_top_supplier": ORACLE_Q15,
    "q19_disjunctive_revenue": ORACLE_Q19,
    "copurchase_part_pairs": ORACLE_COPURCHASE,
    "nation_revenue_share": ORACLE_REVSHARE,
    "null_semantics_suite": ORACLE_NULLS,
    "top_status_per_flag": ORACLE_TOP_STATUS,
}
