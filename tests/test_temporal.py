"""Unit tests for the as-of join and bucketized range join."""

from __future__ import annotations

from hha_spark.operators.temporal import asof_join, range_join_pairs


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (1, 250, 11), (1, 300, 12), (2, 100, 20)],
        "user_id long, ts long, event_id long",
    )
    right = spark.createDataFrame(
        [(1, 100, 1.0, 900), (1, 200, 2.0, 901), (1, 200, 3.0, 902)],
        "user_id long, r_ts long, val double, r_id long",
    )
    out = {
        r.event_id: r.val
        for r in asof_join(
            left, right, by=["user_id"], left_ts="ts", right_ts="r_ts",
            value_cols=["val"], tie_col="r_id",
        ).collect()
    }
    assert out[10] == 1.0          # equal ts counts (<=)
    assert out[11] == 3.0          # tie at r_ts=200 -> greatest r_id wins
    assert out[12] == 3.0          # carried forward
    assert out[20] is None         # no right rows for user 2


def test_range_join_pairs_bucketization_exact(spark):
    df = spark.createDataFrame(
        [(1, 0, 1), (1, 95, 2), (1, 100, 3), (1, 250, 4), (2, 0, 5)],
        "user_id long, ts long, event_id long",
    )
    pairs = {
        (r.a_id, r.b_id)
        for r in range_join_pairs(
            df, by=["user_id"], ts_col="ts", window=100, id_col="event_id"
        ).collect()
    }
    # 0->95 (Δ95), 0->100 (Δ100, inclusive), 95->100 (Δ5); 100->250 is
    # Δ150 (out), cross-user excluded
    assert pairs == {(1, 2), (1, 3), (2, 3)}
