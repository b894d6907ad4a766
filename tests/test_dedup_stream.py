"""Streaming exact dedup: first arrival wins, later copies absorbed,
batch path agrees on the surviving key set."""

from __future__ import annotations

import pytest

from hha_spark.streaming.dedup_stream import dedup_stream

SCHEMA = "doc_id long, ts_sec long, text string"
T0 = 1_700_000_000


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        path
    )


@pytest.fixture()
def stream_env(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, src, [(1, T0, "alpha"), (2, T0 + 1, "beta"), (3, T0 + 2, "alpha")])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        dedup_stream(stream, watermark_sec=3600)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    yield spark, src, q
    q.stop()


def test_first_wins_and_cross_batch_dup_suppressed(stream_env):
    spark, src, q = stream_env
    q.processAllAvailable()
    out1 = spark.sql("SELECT * FROM dedup_out").collect()
    # batch 1: 'alpha' kept once, 'beta' once
    assert sorted(r.text for r in out1) == ["alpha", "beta"]

    # batch 2: replayed 'alpha' within the watermark is absorbed; new
    # 'gamma' flows through
    _write(spark, src, [(4, T0 + 10, "alpha"), (5, T0 + 11, "gamma")])
    q.processAllAvailable()
    out2 = spark.sql("SELECT * FROM dedup_out").collect()
    assert sorted(r.text for r in out2) == ["alpha", "beta", "gamma"]
    assert {r.doc_id for r in out2 if r.text == "gamma"} == {5}


def test_batch_path_matches_stream_key_set(stream_env, spark):
    spark_, src, q = stream_env
    q.processAllAvailable()
    batch = dedup_stream(
        spark.read.schema(SCHEMA).parquet(src), watermark_sec=3600
    ).collect()
    stream_rows = spark.sql("SELECT * FROM dedup_out").collect()
    assert sorted(r.text_hash for r in batch) == sorted(
        r.text_hash for r in stream_rows
    )
    # batch first-wins is contractual: doc 1 (not 3) owns 'alpha'
    assert {r.doc_id for r in batch if r.text == "alpha"} == {1}


def test_incremental_stream_static_band_join(spark, tmp_path):
    """Ingest stream screened against a static corpus via a
    stream-static band join: a replayed corpus doc collides, a fresh
    doc does not, and collisions keep arriving across micro-batches
    with no stream-side state."""
    from hha_spark.streaming.dedup_stream import incremental_dedup_stream

    corpus = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "completely different corpus text content here")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "in2")
    ckpt = str(tmp_path / "ckpt2")
    _write(spark, src, [(1, T0, "the quick brown fox jumps over the lazy dog"),
                        (2, T0 + 1, "something never seen before at all")])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        incremental_dedup_stream(stream, corpus)
        .writeStream.format("memory")
        .queryName("inc_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        hits = {
            (r.doc_id_new, r.doc_id_corpus)
            for r in spark.sql("SELECT * FROM inc_out").collect()
        }
        assert (1, 100) in hits
        assert not any(n == 2 for n, _ in hits)

        # next micro-batch: another replay of corpus doc 101
        _write(spark, src, [(3, T0 + 5, "completely different corpus text content here")])
        q.processAllAvailable()
        hits2 = {
            (r.doc_id_new, r.doc_id_corpus)
            for r in spark.sql("SELECT * FROM inc_out").collect()
        }
        assert (3, 101) in hits2
    finally:
        q.stop()
