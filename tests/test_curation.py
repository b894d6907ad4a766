"""Round-4 curation operators: semantic pruning (operators/semantic.py)
and boilerplate coverage (operators/corpus.py::boilerplate_coverage)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hha_spark.operators.corpus import boilerplate_coverage
from hha_spark.operators.semantic import semantic_prune
from hha_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pruned(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    return semantic_prune(emb).toPandas(), emb.count()


def test_semantic_prune_partitions_corpus(pruned):
    pdf, n = pruned
    assert len(pdf) == n
    assert pdf["vec_id"].is_unique


def test_semantic_prune_drop_fraction(pruned):
    """Exactly floor(n_cell/4) dropped per cell; dropped = the
    closest-to-centroid prefix of the ranking."""
    pdf, _ = pruned
    for _, grp in pdf.groupby("cell"):
        n = grp["n_cell"].iat[0]
        assert len(grp) == n
        dropped = grp[grp["kept"] == 0]
        assert len(dropped) == n // 4
        if len(dropped):
            # dropped ranks form the prefix 1..n//4
            assert sorted(dropped["cell_rank"]) == list(range(1, n // 4 + 1))
            # the dropped set is at least as centroid-aligned as survivors
            assert dropped["cos_centroid"].min() >= grp[grp["kept"] == 1][
                "cos_centroid"
            ].max() - 1e-12


def test_semantic_prune_cosine_bounds(pruned):
    pdf, _ = pruned
    assert pdf["cos_centroid"].between(-1.0, 1.0 + 1e-9).all()
    assert not pdf["cos_centroid"].map(math.isnan).any()


def test_semantic_prune_rank_ordering(pruned):
    """Rank 1 in every cell has the maximal cosine in that cell."""
    pdf, _ = pruned
    for _, grp in pdf.groupby("cell"):
        top = grp.loc[grp["cell_rank"].idxmin()]
        assert top["cos_centroid"] == grp["cos_centroid"].max()


def test_boilerplate_identities(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pdf = boilerplate_coverage(docs, k=3, min_docs_pct=1).toPandas()
    assert len(pdf) == docs.count()
    assert (pdf["covered_tokens"] <= pdf["n_tokens"]).all()
    assert (pdf["clean_tokens"] + pdf["covered_tokens"] == pdf["n_tokens"]).all()
    assert (pdf["covered_tokens"] >= 0).all()
    # the fixture vocabulary is tiny, so some boilerplate must exist
    assert (pdf["covered_tokens"] > 0).any()


def test_boilerplate_threshold_monotone(spark):
    """A stricter document-frequency threshold can only shrink
    coverage."""
    docs = load_table(spark, SF_DIR, "documents")
    loose = (
        boilerplate_coverage(docs, k=3, min_docs_pct=1)
        .agg(F.sum("covered_tokens"))
        .first()[0]
    )
    strict = (
        boilerplate_coverage(docs, k=3, min_docs_pct=5)
        .agg(F.sum("covered_tokens"))
        .first()[0]
    )
    assert strict <= loose


def test_boilerplate_full_doc_covered(spark):
    """A doc that IS one shared gram repeated is fully covered when
    the gram crosses the df threshold."""
    rows = [(i, "a b c") for i in range(10)] + [(99, "x y z")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = boilerplate_coverage(docs, k=3, min_docs_pct=50).toPandas()
    by_id = pdf.set_index("doc_id")
    assert by_id.loc[0, "covered_tokens"] == 3
    assert by_id.loc[0, "clean_tokens"] == 0
    assert by_id.loc[99, "covered_tokens"] == 0
    assert by_id.loc[99, "clean_tokens"] == 3


def test_importance_resample_respects_budget(spark):
    """Kept token mass per source lands near the computed target for
    over-budget sources, and under-budget sources keep everything."""
    from hha_spark.operators.corpus import mixture_weights
    from hha_spark.queries.curation import corpus_importance_resample

    docs = load_table(spark, SF_DIR, "documents")
    kept = corpus_importance_resample(spark, SF_DIR).toPandas()
    w = mixture_weights(docs, budget_frac_pct=50).toPandas().set_index("source")
    toks = (
        docs.select(
            "doc_id", "source", F.size(F.split("text", " ")).alias("t")
        )
        .toPandas()
    )
    kept_toks = (
        toks[toks["doc_id"].isin(set(kept["doc_id"]))]
        .groupby("source")["t"]
        .sum()
    )
    kept_total = target_total = 0
    for source, row in w.iterrows():
        if row["n_tokens"] <= row["target_tokens"]:
            assert kept_toks.get(source, 0) == row["n_tokens"]
        else:
            # under budget the source can only shrink
            assert kept_toks.get(source, 0) <= row["n_tokens"]
            kept_total += kept_toks.get(source, 0)
            target_total += row["target_tokens"]
    # per-source variance is high at ~25 docs/source; the md5-uniform
    # guarantee is in aggregate — total kept mass tracks total target
    assert abs(kept_total - target_total) <= 0.15 * target_total


def test_importance_resample_deterministic(spark):
    from hha_spark.queries.curation import corpus_importance_resample

    a = set(corpus_importance_resample(spark, SF_DIR).toPandas()["doc_id"])
    b = set(corpus_importance_resample(spark, SF_DIR).toPandas()["doc_id"])
    assert a == b


def test_drift_pairs_match_lsh_pairs_and_carry_exact_cosine(spark):
    """dedup_text_embedding_drift = verified LSH pair set, each with
    the exact-kernel cosine of its two embeddings."""
    from pyspark.sql import functions as F

    from hha_spark.queries.curation import dedup_text_embedding_drift
    from hha_spark.queries.llm_ops import _minhash_lsh_from
    from hha_spark.operators.dedup import with_token_set
    from hha_spark.operators.similarity import cosine_pairs
    from hha_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = dedup_text_embedding_drift(spark, sf)
    docs = load_table(spark, sf, "documents")
    want_pairs = {
        (r.doc_id_a, r.doc_id_b)
        for r in _minhash_lsh_from(with_token_set(docs)).collect()
    }
    rows = out.collect()
    assert {(r.doc_id_a, r.doc_id_b) for r in rows} == want_pairs
    assert len(rows) == len(want_pairs)
    # spot-verify one pair's cosine against the expression kernel
    emb = load_table(spark, sf, "embeddings")
    r0 = rows[0]
    q = emb.where(F.col("vec_id") == r0.doc_id_a)
    c = emb.where(F.col("vec_id") == r0.doc_id_b)
    want = cosine_pairs(q, c).collect()[0].cosine
    assert r0.cosine == want
    assert r0.drift == (r0.cosine < 0.5)
