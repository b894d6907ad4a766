"""Cross-implementation equivalence properties: every optimized
formulation must equal its straightforward counterpart on random
inputs (the optimized plan is only valid if it's invisible)."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hha_spark.operators.dedup import jaccard_pairs, with_token_set
from hha_spark.operators.spike import (
    compare_windows,
    fused_window_compare,
    window_averages,
)
from hha_spark.operators.temporal import asof_join

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

NOW = 1_000_000


# --- fused single-pass spike compare == two-frame formulation --------------

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),            # key
        st.integers(min_value=NOW - 3600, max_value=NOW),  # ts
        st.integers(min_value=0, max_value=10_000),        # value
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@SET
def test_fused_equals_two_frame_compare(spark, rows):
    df = spark.createDataFrame(rows, "k long, ts long, v long")
    q, limit = 3, 500
    cur = window_averages(
        df, key_cols=["k"], value_col="v", time_col="ts",
        lower=NOW - 90, exact=True,
    )
    prev = window_averages(
        df, key_cols=["k"], value_col="v", time_col="ts",
        upper=NOW - 300, exact=True,
    )
    two_frame = {
        (r.k): (r.sum_val, r.prev_sum_val, r.prev_sum_val2)
        for r in compare_windows(
            cur, prev, key_cols=["k"], q=q, limit_new=limit, clamp_guard=True
        ).collect()
    }
    fused = {
        r.k: (r.sum_val, r.prev_sum_val if r.prev_sum_val is not None else limit,
              r.prev_sum_val2)
        for r in fused_window_compare(
            df, key_cols=["k"], value_col="v", time_col="ts",
            cur_lower=NOW - 90, prev_upper=NOW - 300, q=q,
            limit_new=limit, clamp_guard=True,
        ).collect()
        if r.sum_val is not None  # two-frame output = cur keys only
    }
    assert fused == two_frame


# --- inverted-index jaccard == naive set arithmetic ------------------------

docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),
        min_size=1, max_size=8,
    ),
    min_size=2,
    max_size=8,
)


@given(token_lists=docs_strategy)
@SET
def test_inverted_index_jaccard_equals_naive(spark, token_lists):
    docs = [(i, " ".join(toks), "blk") for i, toks in enumerate(token_lists)]
    df = with_token_set(
        spark.createDataFrame(docs, "doc_id long, text string, source string")
    )
    got = {
        (r.doc_id_a, r.doc_id_b): (r.inter_size, r.union_size)
        for r in jaccard_pairs(
            df, df, block_cols=["source"], threshold_num=1, threshold_den=2
        ).collect()
    }
    expected = {}
    sets = {i: set(t) for i, t in enumerate(token_lists)}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if 2 * inter >= union:
            expected[(a, b)] = (inter, union)
    assert got == expected


# --- asof join == naive per-row scan ---------------------------------------

asof_strategy = st.tuples(
    st.lists(  # left: (key, ts)
        st.tuples(st.integers(1, 3), st.integers(0, 100)),
        min_size=1, max_size=10,
    ),
    st.lists(  # right: (key, ts, value)
        st.tuples(st.integers(1, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=0, max_size=10,
    ),
)


@given(data=asof_strategy)
@SET
def test_asof_join_equals_naive(spark, data):
    left_rows, right_rows = data
    left_rows = [(k, t, i) for i, (k, t) in enumerate(left_rows)]
    right_rows = [(k, t, v, 1000 + i) for i, (k, t, v) in enumerate(right_rows)]
    left = spark.createDataFrame(left_rows, "k long, ts long, lid long")
    right = spark.createDataFrame(right_rows, "k long, r_ts long, val long, rid long")
    got = {
        r.lid: r.val
        for r in asof_join(
            left, right, by=["k"], left_ts="ts", right_ts="r_ts",
            value_cols=["val"], tie_col="rid",
        ).collect()
    }
    expected = {}
    for k, t, lid in left_rows:
        cands = [(rt, rid, v) for (rk, rt, v, rid) in right_rows if rk == k and rt <= t]
        expected[lid] = max(cands)[2] if cands else None
    assert got == expected
