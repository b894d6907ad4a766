"""Unit tests for the corpus-LM scoring / divergence / MAD operators
(operators/text.py::unigram_lm_scores, source_token_divergence;
operators/dq.py::robust_outlier_report)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hha_spark.operators.dq import robust_outlier_report
from hha_spark.operators.text import source_token_divergence, unigram_lm_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_unigram_scores_hand_computed(spark):
    # corpus tf: a=3, b=2, z=1
    df = _docs(spark, [
        (1, "s1", "a a b"),
        (2, "s1", "a b z"),
    ])
    out = {
        r["doc_id"]: r
        for r in unigram_lm_scores(df).collect()
    }
    assert out[1]["n_tokens"] == 3
    assert out[1]["sum_tf"] == 3 + 3 + 2
    assert out[1]["min_tf"] == 2
    assert out[1]["avg_tf"] == 8 // 3
    # doc 2 carries the hapax z -> min_tf 1 (the garbage-token flag)
    assert out[2]["min_tf"] == 1
    assert out[2]["sum_tf"] == 3 + 2 + 1


def test_unigram_head_tail_split_is_invisible(spark):
    """head_k=0 (all tokens on the shuffle-join tail) and head_k=large
    (all broadcast) must produce identical rows — the skew split is a
    physical strategy, never a semantic one."""
    df = _docs(spark, [
        (i, f"s{i % 3}", f"tok{i % 7} tok{i % 5} tok{i % 7} filler")
        for i in range(40)
    ])
    all_tail = unigram_lm_scores(df, head_k=0).collect()
    all_head = unigram_lm_scores(df, head_k=10_000).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(all_tail, key=key) == sorted(all_head, key=key)


def test_divergence_single_source_is_zero(spark):
    df = _docs(spark, [(1, "only", "a b c"), (2, "only", "a a d")])
    row = source_token_divergence(df).collect()[0]
    assert row["l1_num"] == 0
    assert row["l1"] == 0.0


def test_divergence_disjoint_vocab_hand_computed(spark):
    # A: {x:2}, B: {y:2}; corpus T=4, x=2, y=2.
    # L1(A vs corpus) = |1-0.5| + |0-0.5| = 1.0
    df = _docs(spark, [(1, "A", "x x"), (2, "B", "y y")])
    out = {r["source"]: r for r in source_token_divergence(df).collect()}
    for grp in ("A", "B"):
        assert out[grp]["grp_tokens"] == 2
        assert out[grp]["l1_den"] == 2 * 4
        assert out[grp]["l1_num"] == 8
        assert out[grp]["l1"] == 1.0


def test_mad_outliers_hand_computed(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4, 100)]
        + [("h", float(v)) for v in (10, 10, 10)],
        "event_type string, value double",
    )
    out = {
        r["event_type"]: r
        for r in robust_outlier_report(
            df, group_col="event_type", value_col="value", k=3
        ).collect()
    }
    g = out["g"]
    assert (g["n"], g["med_value"], g["mad_value"]) == (5, 3.0, 1.0)
    assert g["n_outliers"] == 1  # only the 100 reading
    h = out["h"]
    # constant group: mad 0 -> nothing exceeds 3*0 strictly... except
    # nothing deviates at all
    assert (h["mad_value"], h["n_outliers"]) == (0.0, 0)


def test_mad_report_never_shuffles_fact_on_data_key(spark):
    """Both join sides of the fact scan are broadcast (the per-group
    stats frames); the only exchanges are the tiny grouped
    percentiles."""
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(50)],
        "event_type string, value double",
    )
    report = robust_outlier_report(
        df, group_col="event_type", value_col="value"
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
