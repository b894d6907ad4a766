"""UDTF API surface: lateral join consumption, and equivalence with
the JVM expression a hot path should use instead."""

from __future__ import annotations

import pytest

from hha_spark.functions.udtfs import register_udtfs, token_spans_jvm


@pytest.fixture(scope="module")
def with_udtfs(spark):
    register_udtfs(spark)
    return spark


def test_token_spans_lateral_join(with_udtfs):
    spark = with_udtfs
    spark.createDataFrame(
        [(1, "key agg row"), (2, "x")], "doc_id long, text string"
    ).createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        "SELECT doc_id, s.start, s.length, s.token "
        "FROM docs_udtf, LATERAL token_spans(text) s ORDER BY doc_id, s.start"
    ).collect()
    got = [(r.doc_id, r.start, r.length, r.token) for r in rows]
    assert got == [
        (1, 0, 3, "key"),
        (1, 4, 3, "agg"),
        (1, 8, 3, "row"),
        (2, 0, 1, "x"),
    ]


def test_jvm_equivalent_matches_udtf(with_udtfs):
    spark = with_udtfs
    df = spark.createDataFrame(
        [("key agg row scan",), ("one two",)], "text string"
    )
    jvm = sorted(
        (r.start, r.length, r.token) for r in token_spans_jvm(df).collect()
    )
    df.createOrReplaceTempView("docs_udtf2")
    py = sorted(
        (r.start, r.length, r.token)
        for r in spark.sql(
            "SELECT s.* FROM docs_udtf2, LATERAL token_spans(text) s"
        ).collect()
    )
    assert jvm == py
