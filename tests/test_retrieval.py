"""BM25-family retrieval (operators/retrieval.py)."""

import pytest
from pyspark.sql import functions as F

from hha_spark.operators.retrieval import bm25_topk


@pytest.fixture(scope="module")
def spark():
    from hha_spark.session import get_spark

    yield get_spark("test-retrieval")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_matching_docs_first(spark):
    docs = _docs(
        spark,
        [
            (1, "spark join hash spark join"),  # both probe terms, high tf
            (2, "spark filter scan"),  # one probe term
            (3, "window stream batch"),  # no probe terms
            (4, "spark join"),  # both terms, shorter doc
        ],
    )
    out = bm25_topk(docs, [(7, ("spark", "join"))], k=10).collect()
    by_rank = {r.rank: r.doc_id for r in out}
    assert set(r.doc_id for r in out) == {1, 2, 4}  # doc 3 never scores
    assert by_rank[3] == 2  # single-term match ranks last
    # both full matches outrank the partial match
    assert {by_rank[1], by_rank[2]} == {1, 4}
    assert all(r.query_id == 7 for r in out)


def test_bm25_k_bound_and_tie_determinism(spark):
    docs = _docs(spark, [(i, "alpha beta") for i in range(20)])
    out = bm25_topk(docs, [(1, ("alpha",))], k=5).collect()
    assert len(out) == 5
    # identical docs tie on score; ties break ascending doc_id
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] == [
        0, 1, 2, 3, 4,
    ]


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # same tf for the probe term; the longer doc is length-penalized
    docs = _docs(
        spark,
        [
            (1, "spark " + "pad " * 50),
            (2, "spark pad"),
        ],
    )
    out = {r.doc_id: r for r in bm25_topk(docs, [(1, ("spark",))]).collect()}
    assert out[2].rank == 1 and out[1].rank == 2
    assert out[2].score_q > out[1].score_q


def test_bm25_matches_duckdb_oracle_on_fixture(spark):
    """The oracle twin must hash-match at the micro-unit level — the
    arithmetic-structure contract the gate relies on."""
    import duckdb

    from hha_spark.operators.retrieval import bm25_oracle_sql
    from hha_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    queries = [(1, ("spark", "join", "hash")), (2, ("stream", "window"))]
    docs = load_table(spark, sf, "documents")
    got = sorted(
        map(tuple, bm25_topk(docs, queries, k=8).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(bm25_oracle_sql(queries, k=8)).fetchall())
    )
    assert got == want and len(got) == 16
