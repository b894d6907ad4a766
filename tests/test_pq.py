"""PQ/ADC similarity (operators/pq.py): shape, exactness, and a
measured recall floor against the exact brute-force kernel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hha_spark.operators.pq import (
    CELLS,
    M_SUB,
    pq_codebook,
    pq_query_lut,
    pq_topk,
    subspace_codes,
)
from hha_spark.operators.similarity import cosine_topk
from hha_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF_DIR, "embeddings").persist()
    df.count()
    yield df
    df.unpersist()


def test_codes_shape_and_range(spark, emb):
    codes = emb.select(subspace_codes().alias("c")).toPandas()["c"]
    assert all(len(c) == M_SUB for c in codes)
    assert all(0 <= v < CELLS for c in codes for v in c)


def test_codebook_partitions_corpus(spark, emb):
    """Per subspace, cell sizes sum to the corpus size (every vector
    lands in exactly one cell)."""
    n = emb.count()
    cb = pq_codebook(emb)
    per_m = (
        cb.where(F.col("idx") % 8 == 0)
        .groupBy("m")
        .agg(F.sum("n").alias("total"))
        .toPandas()
    )
    assert len(per_m) == M_SUB
    assert (per_m["total"] == n).all()


def test_lut_is_dense(spark, emb):
    q = emb.where(F.col("vec_id") % 16 == 0)
    lut = pq_query_lut(q, pq_codebook(emb)).toPandas()
    assert len(lut) == q.count()
    assert all(len(r) == M_SUB * CELLS for r in lut["lut"])


def test_topk_shape(spark, emb):
    q = emb.where(F.col("vec_id") % 16 == 0)
    pdf = pq_topk(q, emb, k=5).toPandas()
    per_q = pdf.groupby("qid").size()
    assert (per_q == 5).all()
    assert (pdf["qid"] != pdf["cid"]).all()
    # ranks are 1..5 and scores are non-increasing within each query
    for _, grp in pdf.groupby("qid"):
        g = grp.sort_values("rank")
        assert list(g["rank"]) == [1, 2, 3, 4, 5]
        assert (g["score"].diff().dropna() <= 0).all()


def test_recall_floor_vs_brute_force(spark, emb):
    """ADC with deterministic sign-bit codebooks is approximate;
    pin the measured quality floor (0.425 at this fixture) so a
    regression in the scoring path is caught, not just a crash."""
    q = emb.where(F.col("vec_id") % 16 == 0)
    pq = {(r.qid, r.cid) for r in pq_topk(q, emb, k=5).collect()}
    bf = {(r.qid, r.cid) for r in cosine_topk(q, emb, k=5).collect()}
    assert len(pq & bf) / len(bf) >= 0.3


def test_ivfpq_shape_and_recall(spark, emb):
    """IVF x PQ composition: k rows per query, and the measured
    recall floor for the double approximation (coarse cells cost
    ~half the PQ-alone recall at 5/16 probe volume)."""
    from hha_spark.operators.pq import pq_topk_in_cells

    q = emb.where(F.col("vec_id") % 16 == 0)
    pdf = pq_topk_in_cells(q, emb, k=3).toPandas()
    assert (pdf.groupby("qid").size() <= 3).all()
    assert (pdf["qid"] != pdf["cid"]).all()
    ivfpq = set(zip(pdf["qid"], pdf["cid"]))
    bf = {(r.qid, r.cid) for r in cosine_topk(q, emb, k=3).collect()}
    assert len(ivfpq & bf) / len(bf) >= 0.1


def test_trained_ivf_repeat_call_is_deterministic(spark):
    """A repeat call in one session must return the exact same frame
    as the cold call — with the cross-query codebook memo removed
    (round 11), this pins Lloyd-training determinism, matching the
    parallel PQ rename."""
    import hha_spark.queries.llm_ops as L
    from hha_spark.caching import release_tracked

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, L.ann_topk_ivf_trained(spark, sf).collect()))
    release_tracked()
    b = sorted(map(tuple, L.ann_topk_ivf_trained(spark, sf).collect()))
    release_tracked()
    assert a == b and len(a) > 0


def test_trained_lut_numpy_matches_pipeline(spark):
    """The driver-side numpy training path (the collected
    LocalTableScan shape selected by train_key+query_key) must be
    bit-identical to the distributed pq_query_lut pipeline — the
    JVM-twin equivalence pin for _train_lut_rows."""
    import hha_spark.operators.pq as pq
    from hha_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") % 16 == 0)
    pipeline = {
        r["qid"]: list(r["lut"])
        for r in pq.trained_query_lut(q, emb).collect()
    }
    trained = {
        r["qid"]: list(r["lut"])
        for r in pq.trained_query_lut(
            q, emb, train_key=sf, query_key="mod16"
        ).collect()
    }
    assert trained == pipeline and len(trained) > 0


def test_trained_lut_no_cross_query_memo(spark):
    """Round-11 bench-integrity pin: the former module-level
    _LUT_MEMO / _CENT_MEMO (trained results shared across queries in
    one process) are gone — every call must train fresh from its own
    inputs, and distinct query sets must get their own correct
    LUTs."""
    import hha_spark.operators.ivf as ivf
    import hha_spark.operators.pq as pq
    from hha_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    assert not hasattr(pq, "_LUT_MEMO")
    assert not hasattr(ivf, "_CENT_MEMO")
    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q16 = emb.where(F.col("vec_id") % 16 == 0)
    q7 = emb.where(F.col("vec_id") % 16 == 7)
    a = {r["qid"] for r in pq.trained_query_lut(
        q16, emb, train_key=sf, query_key="mod16=0").collect()}
    b = {r["qid"] for r in pq.trained_query_lut(
        q7, emb, train_key=sf, query_key="mod16=7").collect()}
    assert a and b and a.isdisjoint(b)


def test_trained_pq_repeat_call_is_deterministic(spark):
    """Two independent trainings over the same inputs must agree
    bit-for-bit (determinism is what makes fresh-per-call training a
    pure cost question, never a correctness one)."""
    import hha_spark.operators.pq as pq
    from hha_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") % 16 == 0)
    a = sorted(map(tuple, pq.pq_topk(
        q, emb, k=5, train_key=sf, query_key="mod16").collect()))
    b = sorted(map(tuple, pq.pq_topk(
        q, emb, k=5, train_key=sf, query_key="mod16").collect()))
    assert a == b and len(a) > 0


def test_residual_ivfpq_beats_plain_on_fixture(spark):
    """Residual encoding exists to claw back the resolution raw-vector
    PQ wastes on the shared coarse offset; measured on the fixture it
    must (a) at least match the non-residual variant's brute-force
    recall and (b) clear an absolute floor. (0.26 vs 0.312 at last
    measurement, sf0.01, k=3, same hamming-1 probes.)"""
    from hha_spark.operators.pq import (
        pq_topk_in_cells,
        pq_topk_in_cells_residual,
    )
    from hha_spark.operators.similarity import cosine_topk
    from hha_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") % 16 == 0)
    bf = {(r.qid, r.cid) for r in cosine_topk(q, emb, k=3).collect()}
    plain = {(r.qid, r.cid) for r in pq_topk_in_cells(q, emb, k=3).collect()}
    res = {
        (r.qid, r.cid)
        for r in pq_topk_in_cells_residual(q, emb, k=3).collect()
    }
    r_plain = len(plain & bf) / len(bf)
    r_res = len(res & bf) / len(bf)
    assert r_res >= r_plain
    assert r_res >= 0.25


def test_two_stage_rerank_beats_single_stage(spark):
    """Exact rerank of the IVFADC shortlist must dominate the raw
    IVFADC cut (it re-orders with exact math over a superset) —
    measured 0.469 vs 0.312 vs 0.26 (two-stage / residual / plain)
    at sf0.01, k=3."""
    import __spark_entry__ as e
    from hha_spark.operators.pq import pq_topk_in_cells_residual
    from hha_spark.operators.similarity import cosine_topk
    from hha_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") % 16 == 0)
    bf = {(r.qid, r.cid) for r in cosine_topk(q, emb, k=3).collect()}
    res = {
        (r.qid, r.cid)
        for r in pq_topk_in_cells_residual(q, emb, k=3).collect()
    }
    two = {
        (r.qid, r.cid)
        for r in e.queries()["ann_two_stage_rerank"](spark, sf).collect()
    }
    assert len(two & bf) / len(bf) >= len(res & bf) / len(bf)
    assert len(two & bf) / len(bf) >= 0.4
