"""Sketch operators (operators/sketch.py): count-min never
undercounts, Bloom never false-negatives, classifier scoring is a
join-free narrow aggregation — properties plus the physical shapes
the 100 TB story depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from hha_spark.operators.sketch import (
    bloom_bits,
    bloom_probe,
    classifier_scores,
    cms_counters,
    cms_estimates,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _tokens(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )


def test_cms_never_undercounts_and_counters_bounded(spark):
    toks = _tokens(spark).select("token")
    counters = cms_counters(toks, depth=4, width=64)
    assert counters.count() <= 4 * 64
    truth = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimates(truth.select("token"), counters, depth=4, width=64)
    joined = est.join(truth, on="token")
    under = joined.where(F.col("est") < F.col("true_cnt")).count()
    assert under == 0
    # row sums are each exactly the total occurrence count
    totals = counters.groupBy("row").agg(F.sum("counter").alias("s"))
    n = toks.count()
    assert set(r.s for r in totals.collect()) == {n}


def test_cms_probe_broadcasts_counters(spark):
    toks = _tokens(spark).select("token")
    counters = cms_counters(toks)
    est = cms_estimates(toks.distinct(), counters)
    assert "BroadcastHashJoin" in plan_of(est)


def test_bloom_no_false_negatives_and_probe_is_broadcast(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keys = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    bits = bloom_bits(keys, key_col="o_orderkey", m=4096, k=3)
    probed = bloom_probe(
        orders.select("o_orderkey").distinct(),
        bits,
        key_col="o_orderkey",
        m=4096,
        k=3,
    )
    assert "BroadcastHashJoin" in plan_of(probed)
    members = probed.join(
        keys.select(F.col("o_orderkey").alias("key")), on="key", how="inner"
    )
    assert members.where(~F.col("pass")).count() == 0  # no false negatives


def test_bloom_tiny_filter_rejects_most_nonmembers(spark):
    """A near-empty filter must *reject* non-members (sanity that pass
    isn't vacuously true)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    one = orders.limit(1).select("o_orderkey")
    bits = bloom_bits(one, key_col="o_orderkey", m=65536, k=3)
    probed = bloom_probe(
        orders.select("o_orderkey").distinct(),
        bits,
        key_col="o_orderkey",
        m=65536,
        k=3,
    )
    n = probed.count()
    n_pass = probed.where("pass").count()
    assert 1 <= n_pass < max(2, n // 100)  # the member + rare FPs only


def test_classifier_is_joinless_and_deterministic(spark):
    toks = _tokens(spark)
    scored = classifier_scores(toks)
    plan = plan_of(scored)
    assert "Join" not in plan  # pure map + partial/final agg
    a = {r.doc_id: (r.score, r.keep) for r in scored.collect()}
    b = {r.doc_id: (r.score, r.keep) for r in classifier_scores(
        toks.repartition(7)
    ).collect()}
    assert a == b  # partition layout cannot change integer sums


def test_cms_counters_are_streaming_maintainable(spark, tmp_path):
    """The CMS build is an incrementally-maintainable aggregation: a
    file stream of documents, token-exploded and hashed through the
    SAME cms hash projection, aggregated by Structured Streaming in
    complete mode, must reproduce the batch counters exactly — the
    sketch a live ingest keeps is the sketch a batch rebuild gets."""
    from pyspark.sql import functions as F

    from hha_spark.operators.sketch import cms_counters

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "docs_stream")
    docs.limit(40).write.mode("overwrite").parquet(src)

    toks = lambda df: df.select(  # noqa: E731
        F.explode(F.split("text", " ")).alias("token")
    )
    want = {
        (r.row, r.col): r.counter
        for r in cms_counters(
            toks(spark.read.parquet(src)), depth=4, width=64
        ).collect()
    }

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    agg = cms_counters(toks(stream), depth=4, width=64)
    q = (
        agg.writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r.row, r.col): r.counter
        for r in spark.sql("SELECT * FROM cms_stream").collect()
    }
    assert got == want and len(got) > 0


def test_stream_cms_merges_across_micro_batches(spark):
    """The streamed sketch must equal the batch sketch exactly (CMS
    linearity), and the replay must actually cross micro-batch
    boundaries — 4 input files at maxFilesPerTrigger=2, i.e. two
    micro-batches, the minimum the >=2 assertion accepts."""
    from hha_spark.queries.sketches import cms_heavy_tokens
    from hha_spark.queries.streaming_gate import stream_cms_heavy

    sf = "/root/testdata/sf0.001"
    seen: list = []
    streamed = stream_cms_heavy(spark, sf, batch_log=seen).toPandas()
    assert len(seen) >= 2, f"expected multi-batch replay, got {seen}"
    batch = cms_heavy_tokens(spark, sf).toPandas()
    key = ["token", "est", "true_cnt", "overcount"]
    a = streamed[key].sort_values("token").reset_index(drop=True)
    b = batch[key].sort_values("token").reset_index(drop=True)
    assert a.equals(b)
