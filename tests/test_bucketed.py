"""Bucketed co-located joins: both sides pre-hash-partitioned on disk
-> the join plans with no Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from hha_spark.sources.bucketed import read_table, write_bucketed


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf; the default ./spark-warehouse
    # (gitignored) is fine — tables are dropped in the finally block
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", bucket_cols=["l_orderkey"], num_buckets=4,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, "ord_b", bucket_cols=["o_orderkey"], num_buckets=4,
                   sort_cols=["o_orderkey"])

    # disable broadcast so the planner must consider a shuffle join,
    # then prove bucketing removed the shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "li_b").join(
            read_table(spark, "ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
