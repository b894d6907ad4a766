"""Driver-gate query that runs a REAL Structured Streaming job.

Rounds 1-3 verified streaming only via pytest (the driver's
oracle-gate contract is batch: (spark, sf_dir) -> DataFrame). This
module closes that gap with a query whose Spark side executes
`streaming/dedup_stream.py::incremental_dedup_stream` as an actual
streaming query — readStream file source over the documents table,
availableNow trigger, memory sink — then applies the SAME exact
Jaccard verification as the batch `dedup_incremental`. Because the
stream-static band join is stateless and the verification is
deterministic, the streamed result must equal the batch result
row-for-row, so the batch oracle doubles as the STREAM oracle: a
green row here is a driver-verified batch≡stream invariant, the
reference's actual deployment shape (hha.py:315-327) under the
correctness gate.

Scale: identical to the batch operator — the static corpus band
table is rescanned per micro-batch (at 100 TB: a stored bucketed
table), stream state is zero, and the memory sink holds only
LSH-pruned collisions.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hha_spark.queries.llm_ops import (
    NEW_BATCH_PRED,
    ORACLE_INCREMENTAL,
    _cast_longs,
    _docs,
)

_QUERY_SEQ = itertools.count()


def stream_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed twin of `dedup_incremental` (same output contract)."""
    from hha_spark.caching import tracked_persist
    from hha_spark.operators.dedup import with_token_set
    from hha_spark.streaming.dedup_stream import (
        corpus_band_table,
        incremental_dedup_stream,
    )

    docs_path = f"{sf_dir}/documents.parquet"
    batch_docs = _docs(spark, sf_dir)

    # the corpus band table is batch-built and MATERIALIZED before the
    # stream starts (the 100 TB shape: a stored table maintained by
    # the batch pipeline) — the micro-batch plan then only computes
    # the incoming batch's band keys and one equi-join against cache
    corpus = batch_docs.where(~F.expr(NEW_BATCH_PRED))
    bands = tracked_persist(corpus_band_table(corpus))
    bands.count()

    # the file stream source wants a DIRECTORY to monitor; the fixture
    # table is a single file inside sf_dir, so monitor sf_dir and
    # pathGlobFilter down to the one table's file
    stream = (
        spark.readStream.schema(batch_docs.schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
        .where(F.expr(NEW_BATCH_PRED))
    )
    collisions = incremental_dedup_stream(stream, corpus_bands=bands)

    # availableNow: process everything currently in the source, then
    # stop — one bounded run of the real streaming machinery. The
    # memory-sink table name is unique per invocation so repeated
    # gate runs in one session never collide.
    qname = f"_stream_dedup_inc_{next(_QUERY_SEQ)}"
    q = (
        collisions.writeStream.format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    cand = (
        spark.table(qname)
        .select("doc_id_new", "doc_id_corpus")
        .distinct()
    )
    toks = with_token_set(batch_docs).select("doc_id", "tokens")
    verified = (
        cand.join(
            toks.select(
                F.col("doc_id").alias("doc_id_new"),
                F.col("tokens").alias("tokens_n"),
            ),
            on="doc_id_new",
        )
        .join(
            toks.select(
                F.col("doc_id").alias("doc_id_corpus"),
                F.col("tokens").alias("tokens_c"),
            ),
            on="doc_id_corpus",
        )
        .select(
            "doc_id_new",
            "doc_id_corpus",
            F.size(F.array_intersect("tokens_n", "tokens_c")).alias("inter_size"),
            F.size(F.array_union("tokens_n", "tokens_c")).alias("union_size"),
        )
        .where(F.expr("10 * inter_size >= 7 * union_size"))
    )
    return _cast_longs(verified, ["inter_size", "union_size"])


QUERIES = {
    "stream_dedup_incremental": stream_dedup_incremental,
}

# the batch oracle IS the stream oracle — that equality is the point
ORACLES = {
    "stream_dedup_incremental": ORACLE_INCREMENTAL,
}
