"""applyInPandas grouped-map ≡ JVM-native path (operators/grouped_map)."""

from __future__ import annotations

from hha_spark.operators.grouped_map import (
    zscore_outliers_native,
    zscore_outliers_pandas,
)


def _events(spark):
    # user 1: clean integer series with one obvious outlier (100);
    # user 2: constant series (std == 0 -> nothing flags);
    # user 3: single event (std == 0 path again)
    rows = (
        [(1, i, float(v)) for i, v in enumerate([10, 12, 11, 9, 10, 100])]
        + [(2, 10 + i, 5.0) for i in range(4)]
        + [(3, 20, 7.0)]
    )
    return spark.createDataFrame(rows, "user_id long, event_id long, value double")


def _flags(df):
    return {(r.user_id, r.event_id): r.is_outlier for r in df.collect()}


def test_pandas_and_native_agree(spark):
    ev = _events(spark)
    got_p = _flags(zscore_outliers_pandas(ev, z=2.0))
    got_n = _flags(zscore_outliers_native(ev, z=2.0))
    assert got_p == got_n
    assert got_p[(1, 5)] is True          # the 100 outlier
    assert sum(got_p.values()) == 1       # and nothing else
    assert got_p[(2, 10)] is False        # zero-std group safe
    assert got_p[(3, 20)] is False        # singleton group safe
