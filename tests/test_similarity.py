"""Unit tests for vector-similarity operators."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hha_spark.operators.similarity import (
    cosine_pairs,
    cosine_pairs_for,
    cosine_topk,
    vector_norms,
)

VECS = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [1.0, 1.0, 0.0]),
    (4, [2.0, 0.0, 0.0]),   # colinear with 1
]


def vec_df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_vector_norms(spark):
    out = {r.vec_id: r.norm_sq for r in vector_norms(vec_df(spark)).collect()}
    assert out[1] == 1.0 and out[4] == 4.0
    assert abs(out[3] - 2.0) < 1e-9


def test_cosine_topk_ranks_colinear_first(spark):
    df = vec_df(spark)
    q = df.where(F.col("vec_id") == 1)
    out = cosine_topk(q, df, k=3).orderBy("rank").collect()
    assert [r.cid for r in out] == [4, 3, 2]
    assert abs(out[0].cosine - 1.0) < 1e-9          # colinear
    assert abs(out[1].cosine - 1 / math.sqrt(2)) < 1e-9
    assert abs(out[2].cosine - 0.0) < 1e-9          # orthogonal


def test_cosine_pairs_for_restricts_to_candidates(spark):
    df = vec_df(spark)
    pairs = spark.createDataFrame(
        [(1, 4), (2, 3)], "vec_id_a long, vec_id_b long"
    )
    out = {(r.vec_id_a, r.vec_id_b): r.cosine for r in
           cosine_pairs_for(pairs, df).collect()}
    assert set(out) == {(1, 4), (2, 3)}
    assert abs(out[(1, 4)] - 1.0) < 1e-9
