"""The SQL front end must produce exactly the DataFrame path's alerts."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hha_spark.config import DetectorParams
from hha_spark.operators.spike import detect_spikes
from hha_spark.plans.sql_pipeline import detect_spikes_sql
from hha_spark.schemas import HISTOGRAM_SCHEMA

P = DetectorParams()
NOW = 1_700_000_000

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),        # num_protocol
        st.sampled_from([11, 41]),                    # type_proto
        st.integers(174327296, 174327296 + 511),      # dst_ip (2 /24s)
        st.sampled_from([NOW - 10, NOW - 400]),       # cur or prev window
        st.integers(min_value=0, max_value=20_000),   # CountPkt
    ),
    min_size=1,
    max_size=30,
)


def alerts_set(df):
    return {
        (r.num_protocol, r.type_proto, r.sum_val, r.dst_ip, r.scope)
        for r in df.collect()
    }


@given(rows=rows_strategy)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sql_pipeline_equals_dataframe_pipeline(spark, rows):
    data = [(ts, 1, np_, tp, cnt, ip) for (np_, tp, ip, ts, cnt) in rows]
    hist = spark.createDataFrame(data, HISTOGRAM_SCHEMA)
    df_path = detect_spikes(hist, params=P, now=NOW, persist=False)
    sql_path = detect_spikes_sql(spark, hist, params=P, now=NOW)
    assert alerts_set(df_path) == alerts_set(sql_path)
