"""Third coverage batch: TPC-H-style multi-way join analytics and
training-pipeline selection queries.

Q3/Q5 analogues exercise the join-heavy OLAP shapes the earlier
batches don't: a 3-way fact join with a selective dimension filter and
top-k, and a 6-way snowflake join with a co-location condition
(customer and supplier in the same nation). Both are written
broadcast-first: every dimension side is broadcastable, so the only
shuffles are the fact-table aggregations.

The selection queries cover the "assemble a training corpus" shapes:
deterministic hash-based stratified sampling (reproducible splits
without RNG state) and a C4-style multi-predicate quality gate.

Determinism: money math through exact decimals (functions/exact.py),
sampling via md5-derived integers (identical hex -> int semantics in
both engines), no floats except bit-identical pass-throughs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hha_spark.functions.exact import dec_sum_mul
from hha_spark.sources.tables import events_ts_us, load_table


def _t(spark, sf_dir, name) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- TPC-H Q3 analogue: shipping priority ----------------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1996-03-15"


def q3_shipping_priority(spark, sf_dir):
    """Top-10 open orders of one market segment by discounted revenue.

    Plan shape: the customer dimension filters to one segment and
    BROADCASTS into orders; the filtered orders broadcast into
    lineitem; one aggregation shuffle on l_orderkey; top-10 via
    TakeOrderedAndProject (no global sort). Filters sit on the scan
    (PushedFilters) so the fact read is already pruned.
    """
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == Q3_SEGMENT
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp_ntz")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp_ntz")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    joined = li.join(
        F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(dec_sum_mul("l_extendedprice", "1 - l_discount", out="revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
    )


ORACLE_Q3 = f"""
    SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = '{Q3_SEGMENT}'
      AND o_orderdate < TIMESTAMP '{Q3_DATE}'
      AND l_shipdate > TIMESTAMP '{Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


# --- TPC-H Q5 analogue: local supplier volume ------------------------------

Q5_REGION = "ASIA"
Q5_LO = "1996-01-01"
Q5_HI = "1997-01-01"


def q5_local_supplier_volume(spark, sf_dir):
    """Revenue by nation where the supplying and ordering nations
    coincide — the classic 6-way snowflake join.

    region -> nation -> (customer, supplier) are all broadcast; the
    co-location condition (customer's nation == supplier's nation)
    rides the lineitem join keys, so the fact table shuffles once for
    the join to orders and aggregates by nation name.
    """
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == Q5_REGION)
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_nationkey").alias("cust_nk"), "n_name")
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("supp_nk")
    )
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q5_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(Q5_HI).cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("cust_nk") == F.col("supp_nk"))
    )
    return (
        joined.groupBy("n_name")
        .agg(dec_sum_mul("l_extendedprice", "1 - l_discount", out="revenue"))
    )


ORACLE_Q5 = f"""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = '{Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{Q5_LO}'
      AND o_orderdate < TIMESTAMP '{Q5_HI}'
    GROUP BY n_name
"""


# --- deterministic stratified sampling -------------------------------------

SAMPLE_PCT_BY_SOURCE = 20  # keep 20% of docs per source stratum


def stratified_sample_docs(spark, sf_dir):
    """Reproducible per-stratum sampling without RNG state: a doc is
    kept iff the first 8 hex digits of md5(doc_id) land under the
    stratum's rate. Deterministic, uniform (md5 avalanche), stable
    under repartitioning/restarts, and cheap (a narrow map + filter) —
    the sampling shape a 100 TB corpus job needs, where seeded RNG
    sampling is irreproducible the moment partitioning changes.
    """
    docs = _t(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
    return (
        docs.withColumn("_b", bucket.cast("long") % 100)
        .where(F.col("_b") < F.lit(SAMPLE_PCT_BY_SOURCE))
        .select("doc_id", "source", F.col("_b").cast("long").alias("sample_bucket"))
    )


ORACLE_STRATIFIED = f"""
    SELECT doc_id, source,
           CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                % 100 AS BIGINT) AS sample_bucket
    FROM documents
    WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               % 100 AS BIGINT) < {SAMPLE_PCT_BY_SOURCE}
"""


# --- deterministic train/val/test split ------------------------------------

TEST_PCT = 5
VAL_PCT = 5  # val occupies buckets [TEST_PCT, TEST_PCT + VAL_PCT)


def corpus_train_val_test(spark, sf_dir):
    """Deterministic 3-way split assignment: every doc lands in
    train/val/test by its md5 bucket — the split a training pipeline
    must be able to RECOMPUTE at any time, on any cluster, under any
    partitioning, and still agree with the original run (seeded RNG
    splits cannot promise that). Salting the hash input ('split|' +
    id) decorrelates this bucketing from `stratified_sample_docs`'s,
    so composing the two stays unbiased. Pure narrow map, no shuffle.
    """
    docs = _t(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long") % 100
    return docs.select(
        "doc_id",
        "source",
        F.when(bucket < TEST_PCT, F.lit("test"))
        .when(bucket < TEST_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


ORACLE_TVT = f"""
    WITH b AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 100 AS bucket
      FROM documents)
    SELECT doc_id, source,
           CASE WHEN bucket < {TEST_PCT} THEN 'test'
                WHEN bucket < {TEST_PCT + VAL_PCT} THEN 'val'
                ELSE 'train' END AS split
    FROM b
"""


# --- C4-style corpus selection gate ----------------------------------------

MIN_TOKENS = 10
MAX_TOKENS = 5000
MIN_DISTINCT_RATIO_PCT = 40  # distinct tokens / tokens, scaled to int %


def corpus_select_training(spark, sf_dir):
    """Multi-predicate quality gate over documents — the shape of a
    C4-style cleaning pass: length window, repetition bound (distinct
    token ratio), and an exact-duplicate gate (only the canonical doc
    of each hash group survives). Emits the surviving doc ids plus the
    features the gate used, so downstream stages can audit why a doc
    was kept.

    The duplicate gate is a window rank over the content hash — one
    shuffle on text_hash; everything else is a narrow map. The ratio
    test uses integer cross-multiplication (100*distinct >= r*total),
    not a float division, so the boundary is exact in both engines.
    """
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    feat = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.md5(F.col("text")).alias("text_hash"),
    )
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    return (
        feat.withColumn("_rk", F.row_number().over(w))
        .where(
            (F.col("_rk") == 1)
            & (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("n_tokens") <= MAX_TOKENS)
            & (F.lit(100) * F.col("n_distinct")
               >= F.lit(MIN_DISTINCT_RATIO_PCT) * F.col("n_tokens"))
        )
        .select("doc_id", "source", "n_tokens", "n_distinct")
    )


ORACLE_CORPUS_SELECT = f"""
    WITH feat AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                 AS n_distinct,
             md5(text) AS text_hash
      FROM documents),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rk
      FROM feat)
    SELECT doc_id, source, n_tokens, n_distinct
    FROM ranked
    WHERE rk = 1 AND n_tokens >= {MIN_TOKENS} AND n_tokens <= {MAX_TOKENS}
      AND 100 * n_distinct >= {MIN_DISTINCT_RATIO_PCT} * n_tokens
"""


# --- exact-dedup survivors -------------------------------------------------

def dedup_survivors(spark, sf_dir):
    """Materialize the deduplicated corpus itself (not just the group
    stats): the canonical (lowest-id) doc of every content-hash group,
    with the group size carried for provenance. Window rank over the
    hash — one shuffle, the direct 100 TB dedup-pass shape."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", "source", F.md5(F.col("text")).alias("text_hash")
    )
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    wc = Window.partitionBy("text_hash")
    return (
        hashed.withColumn("_rk", F.row_number().over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(wc).cast("long"))
        .where(F.col("_rk") == 1)
        .select("doc_id", "source", "text_hash", "group_size")
    )


ORACLE_SURVIVORS = """
    SELECT doc_id, source, text_hash, CAST(group_size AS BIGINT) AS group_size
    FROM (
      SELECT doc_id, source, md5(text) AS text_hash,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY md5(text)) AS group_size
      FROM documents)
    WHERE rk = 1
"""


# --- native session windows ------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000  # same gap as events_sessionize


def events_session_window(spark, sf_dir):
    """Per-user sessions via Spark's NATIVE session_window operator,
    oracle-checked against the classic lag/cumsum SQL sessionization —
    pinning that the native operator's merge semantics (window end =
    last event + gap) match the textbook definition exactly. Unlike
    the window-function formulation this shape also runs under
    Structured Streaming with a watermark.

    Timestamps stay exact: nanos -> integer micros -> timestamp_micros
    -> unix_micros round-trips without any double conversion.
    """
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        F.timestamp_micros(events_ts_us(ev_raw)).alias("t"), "user_id"
    )
    return (
        ev.groupBy(
            "user_id",
            F.session_window("t", f"{SESSION_GAP_US} microseconds"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )


ORACLE_SESSION_WINDOW = f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
    l AS (
      SELECT user_id, ts_us,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                    OR ts_us - LAG(ts_us) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
    s AS (
      SELECT user_id, ts_us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM l)
    SELECT user_id,
           CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
           CAST(MAX(ts_us) + {SESSION_GAP_US} AS BIGINT) AS session_end_us,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
"""


QUERIES = {
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "stratified_sample_docs": stratified_sample_docs,
    "corpus_train_val_test": corpus_train_val_test,
    "corpus_select_training": corpus_select_training,
    "dedup_survivors": dedup_survivors,
    "events_session_window": events_session_window,
}

ORACLES = {
    "q3_shipping_priority": ORACLE_Q3,
    "q5_local_supplier_volume": ORACLE_Q5,
    "stratified_sample_docs": ORACLE_STRATIFIED,
    "corpus_train_val_test": ORACLE_TVT,
    "corpus_select_training": ORACLE_CORPUS_SELECT,
    "dedup_survivors": ORACLE_SURVIVORS,
    "events_session_window": ORACLE_SESSION_WINDOW,
}
