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


def test_rrf_fuse_hand_computed(spark):
    """Two 3-deep rankings over one query, hand-fused at k0=60.

    system A: c10 r1, c20 r2, c30 r3
    system B: c20 r1, c10 r3, c40 r2
    points (1e6 DIV (60+r)): r1=16393, r2=16129, r3=15873
    c10 = 16393 + 15873 = 32266 (2 systems)
    c20 = 16129 + 16393 = 32522 (2 systems)
    c30 = 15873 (1), c40 = 16129 (1)
    fused order: c20, c10, c40, c30
    """
    from hha_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)], "qid long, cid long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 20, 1), (1, 40, 2), (1, 10, 3)], "qid long, cid long, rank long"
    )
    out = {r.cid: r for r in rrf_fuse([a, b], k=10).collect()}
    assert [out[c].fused_rank for c in (20, 10, 40, 30)] == [1, 2, 3, 4]
    assert out[10].rrf_q == 32266 and out[20].rrf_q == 32522
    assert out[30].rrf_q == 15873 and out[40].rrf_q == 16129
    assert out[10].n_systems == 2 and out[30].n_systems == 1


def test_rrf_fuse_k_bound_and_tie_break(spark):
    from hha_spark.operators.retrieval import rrf_fuse

    # same single ranking twice: scores all doubled, order preserved;
    # equal-rrf ties (none here) would break ascending cid — probe the
    # k bound instead
    a = spark.createDataFrame(
        [(1, c, c) for c in range(1, 9)], "qid long, cid long, rank long"
    )
    out = rrf_fuse([a, a], k=3).collect()
    assert sorted(r.cid for r in out) == [1, 2, 3]
    assert all(r.n_systems == 2 for r in out)


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
