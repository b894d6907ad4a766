"""Bounded bucket gathering (operators/buckets.py) — the round-4
ADVICE fix: degenerate buckets must never materialize their full
membership inside one aggregation buffer row."""

import pytest
from pyspark.sql import functions as F

from hha_spark.operators.buckets import capped_bucket_gather


@pytest.fixture(scope="module")
def spark():
    from hha_spark.session import get_spark

    s = get_spark("test-buckets")
    yield s


def test_oversize_bucket_gathers_exactly_cap_plus_one(spark):
    """A bucket above the cap must yield cap + 1 gathered members —
    enough for the caller's size gate to drop it, no more."""
    rows = [("hot", i) for i in range(500)] + [("cold", i) for i in range(3)]
    df = spark.createDataFrame(rows, "k string, id long")
    out = {
        r["k"]: sorted(r["ids"])
        for r in capped_bucket_gather(
            df, keys=("k",), order_col="id", payload="id", cap=8
        ).collect()
    }
    assert out["hot"] == list(range(9))  # cap + 1, deterministic prefix
    assert out["cold"] == [0, 1, 2]  # small bucket untouched


def test_distinct_mode_bounds_set_buffer(spark):
    """dense_rank prune: duplicates of the first cap + 1 DISTINCT
    values survive, later distinct values never reach the buffer."""
    rows = [("o1", v) for v in [5, 5, 1, 1, 2, 3, 4, 9, 9, 7]]
    df = spark.createDataFrame(rows, "k string, v long")
    out = capped_bucket_gather(
        df, keys=("k",), order_col="v", payload="v", cap=3, distinct=True
    ).collect()
    assert sorted(out[0]["ids"]) == [1, 2, 3, 4]  # first cap+1 distinct


def test_lsh_pairs_unchanged_and_single_gather_exchange(spark):
    """The bounded gather is byte-identical to the unbounded form on
    real signatures and plans the same number of exchanges (the
    groupBy reuses the window's hash partitioning)."""
    from hha_spark.operators.dedup import (
        band_keys,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from hha_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tokens")
    )
    sigs = minhash_signatures(docs)
    new = lsh_candidate_pairs(sigs)

    banded = band_keys(sigs)
    buckets = banded.groupBy("band", "key").agg(
        F.collect_list("doc_id").alias("ids")
    )
    pair_gen = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), y -> "
        "struct(least(x, y) AS a, greatest(x, y) AS b))))"
    )
    old = (
        buckets.where(F.size("ids") <= F.lit(64))
        .select(F.explode(pair_gen).alias("p"))
        .select(F.col("p.a").alias("doc_id_a"), F.col("p.b").alias("doc_id_b"))
        .where(F.col("doc_id_a") != F.col("doc_id_b"))
        .distinct()
    )
    plan_new = new._jdf.queryExecution().executedPlan().toString()
    plan_old = old._jdf.queryExecution().executedPlan().toString()
    assert plan_new.count("Exchange") == plan_old.count("Exchange")
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )


def test_oversize_bucket_dropped_end_to_end(spark):
    """End-to-end through simhash_near_pairs: a synthetic block bucket
    larger than the cap contributes no pairs (and the pipeline doesn't
    blow up gathering it)."""
    from hha_spark.operators.dedup import simhash_near_pairs

    # 200 docs with IDENTICAL simhash -> every block bucket holds 200
    # members, far above the cap; plus two near twins under the cap.
    rows = [(i, 0xABCD) for i in range(200)] + [
        (1000, 0x0F0F),
    ]
    hashes = spark.createDataFrame(rows, "doc_id long, simhash long")
    pairs = simhash_near_pairs(hashes, max_bucket=64).collect()
    assert pairs == []  # degenerate bucket dropped, loner unpaired
