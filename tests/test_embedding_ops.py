"""Embedding-lifecycle operators (operators/sq.py +
queries/embedding_ops.py): SQ8 code validity, a measured recall floor
above PQ's, decontamination flag consistency, mixture-share algebra,
and zero-vector detection in the health report."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hha_spark.operators.sq import SQ_CENTER, sq_bounds, sq_encode, sq_topk
from hha_spark.queries.embedding_ops import (
    DECON_T,
    ann_sq8_recall,
    corpus_cluster_mixture,
    corpus_semantic_decontaminate,
    embedding_health_report,
)
from hha_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF_DIR, "embeddings").persist()
    df.count()
    yield df
    df.unpersist()


def test_sq_codes_in_range(spark, emb):
    bounds = sq_bounds(emb)
    codes = sq_encode(emb, bounds).select("codes").toPandas()["codes"]
    assert all(len(c) == len(bounds) for c in codes)
    assert all(0 <= v <= 255 for c in codes for v in c)
    # bounds are attained, so every dimension uses the full range ends
    flat = [list(c) for c in codes]
    for j in range(len(bounds)):
        col = [c[j] for c in flat]
        assert min(col) == 0 and max(col) == 255


def test_sq_degenerate_dim_codes_midpoint(spark):
    rows = [Row(vec_id=i, embedding=[7.0, float(i)]) for i in range(4)]
    df = spark.createDataFrame(rows)
    bounds = sq_bounds(df)
    assert bounds[0][0] == bounds[0][1] == 7.0
    codes = (
        sq_encode(df, bounds).orderBy("vec_id").toPandas()["codes"].tolist()
    )
    assert all(c[0] == SQ_CENTER for c in codes)
    assert codes[0][1] == 0 and codes[-1][1] == 255


def test_sq_topk_excludes_self_and_ranks(spark, emb):
    bounds = sq_bounds(emb)
    q = emb.where(F.col("vec_id") % 16 == 0)
    out = sq_topk(q, emb, bounds, k=3).toPandas()
    assert (out["qid"] != out["cid"]).all()
    for _, grp in out.groupby("qid"):
        assert sorted(grp["rank"]) == [1, 2, 3]
        ordered = grp.sort_values("rank")
        scores = ordered["sq_score"].tolist()
        assert scores == sorted(scores, reverse=True)


def test_sq8_recall_beats_pq_floor(spark):
    """SQ8 keeps 64 bytes/vector vs PQ's 8, so its recall must sit
    clearly above the PQ floor (~0.3-0.56 pinned in test_pq.py)."""
    row = ann_sq8_recall(spark, SF_DIR).collect()[0]
    assert row["n_exact"] > 0
    assert row["recall"] >= 0.6


def test_decontaminate_covers_train_split(spark):
    out = corpus_semantic_decontaminate(spark, SF_DIR).toPandas()
    n_train = (
        load_table(spark, SF_DIR, "embeddings")
        .where(F.col("vec_id") % 10 != 0)
        .count()
    )
    assert len(out) == n_train
    assert (out["nearest_eval"] % 10 == 0).all()
    assert (
        (out["max_eval_cosine"] >= DECON_T) == out["contaminated"]
    ).all()


def test_cluster_mixture_shares_sum_per_cell(spark):
    out = corpus_cluster_mixture(spark, SF_DIR).toPandas()
    assert (out["n_docs"] > 0).all()
    assert (out["mean_chars"] * out["n_docs"] <= out["sum_chars"]).all()
    for _, grp in out.groupby("cell"):
        total = grp["src_share_ppm"].sum()
        # floors: sum <= 1e6, deficit < one unit per source
        assert 1_000_000 - len(grp) < total <= 1_000_000


def test_health_report_detects_zero_vectors(spark):
    base = embedding_health_report(spark, SF_DIR).collect()[0]
    assert base["n_zero_vecs"] == 0
    assert base["n_vecs"] > 0
    # unit-normalized fixture: mean squared norm ~ 1.0 in picounits
    assert abs(base["mean_norm_sq_pico"] - 1_000_000_000_000) < 10_000

    import hha_spark.queries.embedding_ops as eo

    dim = 64
    rows = [
        Row(vec_id=0, embedding=[0.0] * dim, label=0),
        Row(vec_id=1, embedding=[0.5] * dim, label=0),
        Row(vec_id=2, embedding=[-0.5] * dim, label=0),
    ]
    df = spark.createDataFrame(rows)
    orig = eo._emb
    eo._emb = lambda s, d: df
    try:
        r = embedding_health_report(spark, "unused").collect()[0]
    finally:
        eo._emb = orig
    assert r["n_vecs"] == 3 and r["n_zero_vecs"] == 1
    # opposed vectors cancel: the center is exactly zero
    assert r["center_norm_sq_micro2"] == 0.0


def test_graph_cluster_mixture_is_consistent(spark):
    """Clusters partition the node slice (doc counts sum to the node
    count), every cluster_id is the min member id, shares are exact
    floors summing to <= 1e6, and the threshold left a non-degenerate
    partition (more than 3 clusters — the pre-threshold graph was one
    giant component)."""
    from pyspark.sql import functions as F

    from hha_spark.queries.embedding_ops import corpus_graph_cluster_mixture
    from hha_spark.queries.llm_ops import KNN_NODE_MOD
    from hha_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = corpus_graph_cluster_mixture(spark, sf).toPandas()
    n_nodes = (
        load_table(spark, sf, "embeddings")
        .where(F.col("vec_id") % KNN_NODE_MOD == 0)
        .count()
    )
    assert out["n_docs"].sum() == n_nodes
    assert len(out) > 3
    assert out["share_ppm"].sum() <= 1_000_000
    assert (out["sampled_tokens"] <= out["n_tokens"]).all()
    assert (out["sampled_tokens"] <= out["target_tokens"]).all()
    # min-member labelling: every cluster id is itself a node id of
    # the slice (the component's minimum reachable id)
    assert (out["cluster_id"] % KNN_NODE_MOD == 0).all()
