"""resample_ffill: bucketed downsample + densify + forward fill."""

from __future__ import annotations

from hha_spark.operators.temporal import resample_ffill


def _run(spark, rows, bucket_us=10):
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_id long, value double"
    )
    out = resample_ffill(
        df, key="user_id", ts_col="ts_us", value_col="value",
        tie_col="event_id", bucket_us=bucket_us,
    )
    return sorted(
        (r.user_id, r.bucket_idx, r.value_filled, r.is_observed)
        for r in out.collect()
    )


def test_gaps_are_densified_and_forward_filled(spark):
    # buckets 5 and 8 observed; 6 and 7 are gaps carrying bucket 5's value
    rows = [(1, 51, 1, 10.0), (1, 83, 2, 20.0)]
    assert _run(spark, rows) == [
        (1, 5, 10.0, True),
        (1, 6, 10.0, False),
        (1, 7, 10.0, False),
        (1, 8, 20.0, True),
    ]


def test_last_in_bucket_wins_with_tie_break(spark):
    # same bucket: later ts wins; equal ts: higher event_id wins
    rows = [(1, 10, 1, 1.0), (1, 15, 2, 2.0), (1, 15, 3, 3.0)]
    assert _run(spark, rows) == [(1, 1, 3.0, True)]


def test_keys_are_independent(spark):
    rows = [(1, 10, 1, 1.0), (2, 30, 2, 5.0), (2, 50, 3, 6.0)]
    assert _run(spark, rows) == [
        (1, 1, 1.0, True),
        (2, 3, 5.0, True),
        (2, 4, 5.0, False),
        (2, 5, 6.0, True),
    ]
