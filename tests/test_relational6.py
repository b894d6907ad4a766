"""Invariants of the TPC-H completion batch that the sf-fixture oracle
gate can't exercise: the market-basket cap actually bounding a
pathological giant basket, and Q15 returning ALL tied maxima."""

from __future__ import annotations

import datetime


TS = datetime.datetime(1996, 2, 1)


def _write_lineitem(spark, path, rows):
    spark.createDataFrame(
        [
            (ok, pk, sk, 1, 1.0, price, disc, 0.0, "N", "O", TS)
            for ok, pk, sk, price, disc in rows
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def test_basket_cap_bounds_giant_order(spark, tmp_path):
    """A degenerate 100-part basket emits ZERO pairs; only the small
    baskets contribute — the quadratic blowup is capped at the source."""
    from hha_spark.queries.relational6 import copurchase_part_pairs

    rows = [(999, pk, 1, 10.0, 0.0) for pk in range(100)]  # giant basket
    # parts 1,2 co-occur in orders 1..3 (>= COPURCHASE_MIN)
    for ok in (1, 2, 3):
        rows += [(ok, 1, 1, 10.0, 0.0), (ok, 2, 1, 10.0, 0.0)]
    _write_lineitem(spark, str(tmp_path), rows)
    got = {
        (r.part_a, r.part_b, r.n_orders)
        for r in copurchase_part_pairs(spark, str(tmp_path)).collect()
    }
    assert got == {(1, 2, 3)}


def test_q15_returns_all_tied_maxima(spark, tmp_path):
    """Two suppliers with bit-identical quarterly revenue both appear —
    the exact-decimal comparison can't drop one of a tie the way a
    float != would."""
    from hha_spark.queries.relational6 import q15_top_supplier

    _write_lineitem(
        spark,
        str(tmp_path),
        [
            (1, 1, 11, 100.10, 0.05),
            (2, 1, 12, 100.10, 0.05),  # identical revenue to supplier 11
            (3, 1, 13, 50.00, 0.00),
        ],
    )
    spark.createDataFrame(
        [(11, "SUPP_A", 0, 0.0), (12, "SUPP_B", 0, 0.0), (13, "SUPP_C", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/supplier.parquet"
    )
    got = [(r.s_suppkey, r.s_name) for r in q15_top_supplier(spark, str(tmp_path)).collect()]
    assert got == [(11, "SUPP_A"), (12, "SUPP_B")]
