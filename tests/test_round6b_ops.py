"""Unit pins for the session-6b operators: blocklist scrub semantics,
stratified-sample exactness/determinism, mutual-kNN mutuality."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hha_spark.operators.corpus import blocklist_scrub, stratified_sample
from hha_spark.operators.similarity import mutual_knn_graph


def test_blocklist_scrub_counts_and_rewrite(spark):
    docs = spark.createDataFrame(
        [
            (1, "good bad good bad bad"),
            (2, "clean words only here now"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in blocklist_scrub(
            docs, ("bad",), max_hit_pct=50
        ).collect()
    }
    r1 = out[1]
    assert (r1.n_tokens, r1.n_hits, r1.n_hit_terms) == (5, 3, 1)
    assert not r1.keep  # 3*100 > 50*5
    expected = hashlib.md5(b"good <BAD> good <BAD> <BAD>").hexdigest()
    assert r1.scrubbed_md5 == expected
    r2 = out[2]
    assert (r2.n_hits, r2.keep) == (0, True)
    expected2 = hashlib.md5(b"clean words only here now").hexdigest()
    assert r2.scrubbed_md5 == expected2


def test_stratified_sample_exact_counts_and_determinism(spark):
    rows = [(i, "a" if i < 40 else "b") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(docs, frac_pct=25)
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert per == {"a": 10, "b": 2}  # floor(40*.25), floor(10*.25)
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id for r in stratified_sample(docs, frac_pct=25).collect()
    )
    assert ids1 == ids2  # pure function of (id, salt)
    # growing the corpus keeps rank-stable earlier picks a superset
    # property is NOT guaranteed in general (floor boundary), but the
    # hash order itself must be stable:
    top_a = (
        stratified_sample(docs, frac_pct=50)
        .where(F.col("source") == "a")
        .where(F.col("smp_rank") <= 10)
    )
    assert sorted(r.doc_id for r in top_a.collect()) == sorted(
        r.doc_id
        for r in out.collect()
        if r["source"] == "a"
    )


def test_mutual_knn_graph_is_mutual_and_symmetric(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    nodes = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    k = 3
    edges = mutual_knn_graph(nodes, k=k).collect()
    assert edges, "fixture should produce at least one mutual edge"
    from hha_spark.operators.similarity import cosine_topk

    topk = {
        (r.qid, r.cid): r.rank
        for r in cosine_topk(nodes, nodes, k=k).collect()
    }
    for e in edges:
        assert e.vec_id_a < e.vec_id_b
        assert topk[(e.vec_id_a, e.vec_id_b)] == e.rank_ab
        assert topk[(e.vec_id_b, e.vec_id_a)] == e.rank_ba
    # completeness: every mutually-ranked pair appears exactly once
    mutual = {
        (a, b)
        for (a, b) in topk
        if a < b and (b, a) in topk
    }
    assert {(e.vec_id_a, e.vec_id_b) for e in edges} == mutual


def test_winnowing_guarantee_and_density(spark):
    """The MOSS contract: two docs sharing a run of >= w+k-1 tokens
    MUST share a fingerprint hash; fingerprint counts respect the
    winnowing density bounds; disjoint docs share nothing."""
    from hha_spark.operators.corpus import winnowing_fingerprints

    k, w = 4, 4
    shared = "alpha beta gamma delta epsilon zeta eta"  # w+k-1 = 7 tokens
    docs = spark.createDataFrame(
        [
            (1, "one two three " + shared + " four five six seven"),
            (2, "red green blue " + shared + " cyan magenta yellow black"),
            (3, "p q r s t u v w x y z aa bb cc"),  # disjoint
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in winnowing_fingerprints(docs, k=k, w=w).collect()
    }
    assert out[1].n_shared_fps >= 1 and out[2].n_shared_fps >= 1
    assert out[3].n_shared_fps == 0
    for r in out.values():
        n_windows = r.n_grams - w + 1
        assert 1 <= r.n_fps <= n_windows
        # each selection can cover at most w windows
        assert r.n_fps * w >= n_windows
