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
from hha_spark.sources.tables import events_ts_us, load_table


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
    ev_raw = _t(spark, sf_dir, "events")
    events_d = (
        ev_raw
        .select(events_ts_us(ev_raw).alias("ts_us"))
        .select(F.expr("ts_us DIV 86400000000").alias("day_idx"))
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
# sqrt((n*Sxx - Sx*Sx) * (n*Syy - Sy*Sy)).
# The decimal -> double conversion goes THROUGH A STRING: when the
# scaled integer exceeds 2^53 (syy's cent^2 units hit ~7e16 even at
# sf0.001) a direct decimal->double cast double-rounds differently
# per engine (observed 1-ulp syy divergence); decimal->string is
# exact and string->double is a single correctly-rounded step in
# both Spark (parseDouble) and DuckDB (strtod).
_MOMENTS = {
    "n": "CAST(COUNT(*) AS BIGINT)",
    "sx": "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS STRING)"
    " AS DOUBLE)",
    "sy": "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING)"
    " AS DOUBLE)",
    "sxx": "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))"
    " * CAST(l_quantity AS DECIMAL(18,2))) AS STRING) AS DOUBLE)",
    "syy": "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE)",
    "sxy": "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))"
    " * CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE)",
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


# --- analytic-window suite --------------------------------------------------

_WIN = "PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey"
_RANGE_WIN = (
    "PARTITION BY c_nationkey ORDER BY c_acctbal "
    "RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING"
)


def customer_window_suite(spark, sf_dir):
    """The analytic-window functions not yet pinned elsewhere:
    percent_rank / cume_dist (tie-stable — they depend on key counts,
    not row order), nth_value over a fully-deterministic ordering, and
    a value-RANGE frame (peers within +-100.0 balance). The range-
    frame aggregate is COUNT (exact integer) and an exact decimal SUM
    — never a raw float sum whose within-frame order could differ.
    All windows are nation-partitioned; no global window."""
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.expr(f"percent_rank() OVER ({_WIN})").alias("bal_pct_rank"),
        F.expr(f"cume_dist() OVER ({_WIN})").alias("bal_cume_dist"),
        F.expr(f"nth_value(c_name, 2) OVER ({_WIN} "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
               ).alias("second_poorest_name"),
        F.expr(f"CAST(COUNT(*) OVER ({_RANGE_WIN}) AS BIGINT)").alias(
            "n_balance_peers"
        ),
        F.expr(
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) "
            f"OVER ({_RANGE_WIN}) AS DOUBLE)"
        ).alias("peer_balance_sum"),
    )


ORACLE_WINDOW_SUITE = f"""
    SELECT c_custkey, c_nationkey, c_acctbal,
           percent_rank() OVER ({_WIN}) AS bal_pct_rank,
           cume_dist() OVER ({_WIN}) AS bal_cume_dist,
           nth_value(c_name, 2) OVER ({_WIN}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_poorest_name,
           CAST(COUNT(*) OVER ({_RANGE_WIN}) AS BIGINT) AS n_balance_peers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER ({_RANGE_WIN})
                AS DOUBLE) AS peer_balance_sum
    FROM customer
"""


# --- explicit cross join ----------------------------------------------------


def region_pair_matrix(spark, sf_dir):
    """All ordered region pairs — the one legitimate cross join: both
    sides are tiny dimensions (|R|^2 rows), so the cartesian product
    is a deliberate, bounded matrix build, not an accident. Any fact
    table on either side would make this shape wrong."""
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    a = r.select(F.col("r_regionkey").alias("key_a"), F.col("r_name").alias("name_a"))
    b = r.select(F.col("r_regionkey").alias("key_b"), F.col("r_name").alias("name_b"))
    return a.crossJoin(b).select(
        "key_a", "key_b", F.concat_ws("->", "name_a", "name_b").alias("route")
    )


ORACLE_CROSS = """
    SELECT a.r_regionkey AS key_a, b.r_regionkey AS key_b,
           a.r_name || '->' || b.r_name AS route
    FROM region a CROSS JOIN region b
"""


# --- fuzzy matching (entity resolution) ------------------------------------

FUZZY_MAX_DIST = 1


def part_name_fuzzy_pairs(spark, sf_dir):
    """Near-identical part names (edit distance 1) within a brand,
    found by PIGEONHOLE BLOCKING, never brand-wide all-pairs: at edit
    distance <= d, at least one of d+1 segments of the string is
    untouched (PassJoin's partition principle). Part names are two
    words and d = 1, so every true pair shares its first word or its
    last word — two blocked self-joins on (brand, word), a distinct
    over the candidate union (multi-pass blocking, the standard ER
    shape), and Levenshtein only on candidates.

    A brand-wide all-pairs variant measured 15 s at sf0.1 (8M
    Levenshtein calls); this candidate set is ~8x smaller and the
    verification uses the bounded levenshtein(a, b, d) form that
    abandons a pair in O(d*len). At 100 TB the same query scales by
    adding blocking passes (d+1 segments), not by widening blocks.
    """
    p = _t(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("pk"),
        F.col("p_name").alias("name"),
        F.substring_index("p_name", " ", 1).alias("w1"),
        F.substring_index("p_name", " ", -1).alias("w2"),
    )

    def block(word_col: str):
        a = p.select(
            "brand",
            F.col("pk").alias("part_a"),
            F.col("name").alias("name_a"),
            F.col(word_col).alias("blk"),
        )
        b = p.select(
            "brand",
            F.col("pk").alias("part_b"),
            F.col("name").alias("name_b"),
            F.col(word_col).alias("blk"),
        )
        return (
            a.join(b, on=["brand", "blk"])
            .where(F.col("part_a") < F.col("part_b"))
            .drop("blk")
        )

    # verify BEFORE deduplicating: a distance-1 pair of two-word names
    # shares exactly one word, so survivors are near-duplicate-free and
    # the distinct shuffles 31k rows, not the 1.9M-row candidate union
    # (measured 6.5 s -> negligible); distinct stays as the guard for
    # >2-word names, where a pair can enter through both blocks
    cand = block("w1").unionByName(block("w2"))
    return (
        cand.withColumn(
            "edit_dist",
            F.levenshtein("name_a", "name_b", FUZZY_MAX_DIST).cast("long"),
        )
        .where(F.col("edit_dist") == FUZZY_MAX_DIST)
        .select("brand", "part_a", "part_b", "name_a", "name_b", "edit_dist")
        .distinct()
    )


ORACLE_FUZZY = f"""
    WITH p AS (
      SELECT p_brand AS brand, p_partkey AS pk, p_name AS name,
             string_split(p_name, ' ')[1] AS w1,
             string_split(p_name, ' ')[-1] AS w2
      FROM part),
    cand AS (
      SELECT a.brand, a.pk AS part_a, b.pk AS part_b,
             a.name AS name_a, b.name AS name_b
      FROM p a JOIN p b ON a.brand = b.brand AND a.w1 = b.w1
                        AND a.pk < b.pk
      UNION ALL
      SELECT a.brand, a.pk, b.pk, a.name, b.name
      FROM p a JOIN p b ON a.brand = b.brand AND a.w2 = b.w2
                        AND a.pk < b.pk)
    SELECT DISTINCT brand, part_a, part_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
    FROM cand
    WHERE levenshtein(name_a, name_b) = {FUZZY_MAX_DIST}
"""


# --- equi-depth histogram ---------------------------------------------------


def lineitem_price_deciles(spark, sf_dir):
    """Equi-depth (decile) histogram of extended price — the
    complement of the fixed-width `events_value_histogram`: bucket
    EDGES adapt so each holds n/10 rows. Built on the distributed
    NTILE operator (operators/rank.py — range-partitioned global rank,
    no single-partition window), then one 10-key aggregation for the
    per-bucket count/lo/hi/mass. The ordering carries (orderkey,
    linenumber) as the unique tiebreak that makes the tile assignment
    a total order, hash-identical to SQL NTILE."""
    from hha_spark.operators.rank import distributed_ntile

    li = _t(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    tiled = distributed_ntile(
        li,
        [F.asc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        10,
        out="decile",
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        dec_sum("l_extendedprice", out="bucket_mass"),
    )


ORACLE_DECILES = """
    WITH tiled AS (
      SELECT l_extendedprice,
             NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                             l_linenumber) AS decile
      FROM lineitem)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(l_extendedprice) AS lo,
           MAX(l_extendedprice) AS hi,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS bucket_mass
    FROM tiled GROUP BY decile
"""


# --- data-quality expectations ---------------------------------------------


def dq_orders_report(spark, sf_dir):
    """Expectation gate over orders (operators/dq.py): every row-local
    rule is a conditional sum in ONE scan; the referential rule
    (custkey resolves in customer) is a broadcast anti-join count.
    The one-row report is what a pipeline gate thresholds on."""
    from hha_spark.operators.dq import dq_report

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return dq_report(
        orders,
        [
            ("key_not_null", F.col("o_orderkey").isNotNull()),
            ("price_positive", F.col("o_totalprice") > 0),
            ("status_known", F.col("o_orderstatus").isin("O", "F", "P")),
            (
                "date_in_range",
                (F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp_ntz")),
            ),
        ],
        ref_checks=[("orphan_custkey", "o_custkey", cust, "c_custkey")],
    )


ORACLE_DQ = """
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
          AS viol_key_not_null,
      CAST(SUM(CASE WHEN COALESCE(o_totalprice > 0, FALSE) THEN 0 ELSE 1 END)
          AS BIGINT) AS viol_price_positive,
      CAST(SUM(CASE WHEN COALESCE(o_orderstatus IN ('O','F','P'), FALSE)
               THEN 0 ELSE 1 END) AS BIGINT) AS viol_status_known,
      CAST(SUM(CASE WHEN COALESCE(o_orderdate >= TIMESTAMP '1992-01-01'
                         AND o_orderdate < TIMESTAMP '2000-01-01', FALSE)
               THEN 0 ELSE 1 END) AS BIGINT) AS viol_date_in_range,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey))
          AS viol_orphan_custkey
    FROM orders
"""


SKEW_TOP_K = 10
SKEW_NUM, SKEW_DEN = 3, 1  # flag keys hotter than 3x the per-key mean


def dq_events_key_skew(spark, sf_dir):
    """Join-key skew diagnostics over the event stream's user_id —
    the pre-flight report for the 100 TB join-strategy decision
    (salt? AQE skew split? broadcast the other side?): top-10 hottest
    keys, their share context (total rows, key cardinality), and an
    exact integer-arithmetic skew flag at 3x the per-key mean
    (operators/dq.py::join_key_skew_report)."""
    from hha_spark.operators.dq import join_key_skew_report

    ev = _t(spark, sf_dir, "events")
    return join_key_skew_report(
        ev.select("user_id"), "user_id",
        top_k=SKEW_TOP_K, factor_num=SKEW_NUM, factor_den=SKEW_DEN,
    )


ORACLE_KEY_SKEW = f"""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM counts),
    top AS (
      SELECT user_id, cnt FROM counts
      ORDER BY cnt DESC, user_id LIMIT {SKEW_TOP_K}),
    ranked AS (
      SELECT user_id, cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS BIGINT)
                 AS rnk
      FROM top)
    SELECT r.user_id, r.cnt, r.rnk, t.total_rows, t.n_keys,
           CAST(r.cnt AS HUGEINT) * t.n_keys * {SKEW_DEN}
               > {SKEW_NUM} * CAST(t.total_rows AS HUGEINT) AS skewed
    FROM ranked r CROSS JOIN tot t
"""


QUERIES = {
    "daily_activity_fulljoin": daily_activity_fulljoin,
    "orders_grouping_sets": orders_grouping_sets,
    "lineitem_measures_unpivot": lineitem_measures_unpivot,
    "lineitem_price_qty_corr": lineitem_price_qty_corr,
    "customer_window_suite": customer_window_suite,
    "region_pair_matrix": region_pair_matrix,
    "part_name_fuzzy_pairs": part_name_fuzzy_pairs,
    "lineitem_price_deciles": lineitem_price_deciles,
    "dq_orders_report": dq_orders_report,
    "dq_events_key_skew": dq_events_key_skew,
}

ORACLES = {
    "daily_activity_fulljoin": ORACLE_FULLJOIN,
    "orders_grouping_sets": ORACLE_GROUPING_SETS,
    "lineitem_measures_unpivot": ORACLE_UNPIVOT,
    "lineitem_price_qty_corr": ORACLE_CORR,
    "customer_window_suite": ORACLE_WINDOW_SUITE,
    "region_pair_matrix": ORACLE_CROSS,
    "part_name_fuzzy_pairs": ORACLE_FUZZY,
    "lineitem_price_deciles": ORACLE_DECILES,
    "dq_orders_report": ORACLE_DQ,
    "dq_events_key_skew": ORACLE_KEY_SKEW,
}
