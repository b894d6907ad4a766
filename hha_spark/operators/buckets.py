"""Bounded bucket gathering for candidate-pair generation.

The single-shuffle LSH/SimHash/co-occurrence restructures gather each
bucket's members with collect_list/collect_set and generate pairs
in-row. The naive form applies the `size(ids) <= cap` gate AFTER the
aggregate, which means a degenerate bucket (boilerplate band key, a
template simhash, a synthetic mega-order) materializes its FULL member
array inside one aggregation buffer row before being discarded — an
OOM risk at 100 TB that the old count-then-semi-join plan avoided at
the price of two extra exchanges.

This helper keeps the single-shuffle plan AND bounds the buffer: a
rank over the bucket key prunes each bucket to its first `cap + 1`
members BEFORE the gather, so

  - a bucket with <= cap members passes through untouched;
  - a bucket with  > cap members yields exactly cap + 1 gathered
    members, which the caller's existing `size(ids) <= cap` filter
    drops — byte-identical output to the unbounded form;
  - no aggregation buffer ever holds more than cap + 1 elements. The
    rank itself is computed by WindowExec over a sort-based (and
    disk-spilling) partition iterator, so the degenerate bucket costs
    spilled sort I/O, never executor heap.

One shuffle total: the window requires hashpartitioning(keys) and the
downstream groupBy(keys) reuses that exchange (ClusteredDistribution
on the same keys), which test_plans.py pins by counting Exchange
nodes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def capped_bucket_gather(
    df: DataFrame,
    *,
    keys: Sequence[str],
    order_col: str | Column,
    payload: str | Column,
    cap: int,
    out_col: str = "ids",
    distinct: bool = False,
) -> DataFrame:
    """groupBy(keys).agg(collect_list/set(payload)) with the gathered
    array bounded at cap + 1 elements per bucket.

    `order_col` makes the kept prefix deterministic (callers' pair
    output is order-insensitive — least/greatest + distinct — but a
    deterministic prefix keeps reruns and engine comparisons stable).
    With distinct=True the prune uses dense_rank over `order_col`, so
    duplicates of the first cap + 1 DISTINCT payload values survive to
    a collect_set whose buffer still holds <= cap + 1 elements.
    """
    # Collision-proof working column: an input frame may legitimately
    # carry `_rk` (round-5 ADVICE), so derive a name that provably is
    # not present rather than silently clobbering/shadowing it.
    rk = "_rk"
    while rk in df.columns:
        rk += "_"
    w = Window.partitionBy(*keys).orderBy(order_col)
    rank = F.dense_rank() if distinct else F.row_number()
    pruned = (
        df.withColumn(rk, rank.over(w))
        .where(F.col(rk) <= F.lit(cap + 1))
        .drop(rk)
    )
    agg = F.collect_set(payload) if distinct else F.collect_list(payload)
    return pruned.groupBy(*keys).agg(agg.alias(out_col))
