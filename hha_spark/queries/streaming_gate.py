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
import os
import shutil
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hha_spark.queries.llm_ops import (
    NEW_BATCH_PRED,
    ORACLE_INCREMENTAL,
    _cast_longs,
    _docs,
)
from hha_spark.sources.tables import events_ts_us, load_table

_QUERY_SEQ = itertools.count()

# The driver session runs 200 shuffle partitions; a streaming query
# pins that as its state-store/shuffle width at START and every
# micro-batch then schedules 200 tasks per exchange — pure fixed cost
# on a gate-sized replay (and a real knob in production too: size
# state width to keys, not to the batch-analytics default). Scoped so
# batch queries running after the gate see the session default again.
# Width 2: a gate micro-batch moves <= 100k rows through each
# exchange, so task count and output-file count (each kind-partition
# write emits one file per task) are the cost, not parallelism —
# measured ~0.3 s/gate faster than 8 on the disorder gates with
# identical results. Production sizes this to keys/volume.
GATE_SHUFFLE_PARTITIONS = "2"


# The gate fixtures write ~tens of MB of input + checkpoint + state;
# default-Docker /dev/shm is 64 MB — require real headroom before
# moving scratch there, else an environment detail turns green
# streaming gates into 'No space left on device' reds.
_SHM_MIN_FREE_BYTES = 2 << 30


def _local_rows(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Gate-result frame from driver-local rows as an Arrow table —
    a pure-JVM scan with ZERO Python tasks.

    The round-11 shape (``parallelize(rows, 1)``) fixed the
    32-partition Python-RDD fanout but still paid one Python worker
    task (~0.2 s protocol latency on this sandbox) on every
    downstream scan — the bench's noop force, the oracle collect.
    The Arrow path ships the same rows as one Arrow batch the JVM
    reads directly. Gate results are bounded rollups by construction
    (collected before the gate's scratch dirs vanish), so a
    driver-local frame is the right layout at any scale factor."""
    from hha_spark.functions.local import arrow_rows_frame

    return arrow_rows_frame(spark, rows, schema)


def _scratch_dir(prefix: str) -> str:
    """Gate-scoped scratch, on tmpfs when the host has a ROOMY one.

    Streaming checkpoints/state are durability infrastructure; a
    bounded availableNow replay that deletes its scratch on exit gets
    nothing from fsync-ing them to disk, so prefer /dev/shm — the
    checkpoint fixed cost becomes memory writes. Falls back to the
    regular temp root when tmpfs is absent or smaller than
    _SHM_MIN_FREE_BYTES (e.g. Docker's 64 MB default)."""
    base = None
    if os.path.isdir("/dev/shm"):
        try:
            sv = os.statvfs("/dev/shm")
            if sv.f_bavail * sv.f_frsize >= _SHM_MIN_FREE_BYTES:
                base = "/dev/shm"
        except OSError:
            pass
    return tempfile.mkdtemp(prefix=prefix, dir=base)


@contextmanager
def _gate_scratch(prefix: str):
    tmp = _scratch_dir(prefix)
    try:
        yield tmp
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@contextmanager
def _gate_shuffle(
    spark: SparkSession,
    partitions: str | None = None,
    aqe: str = "false",
):
    """Gate-scoped execution knobs: few shuffle partitions (the gates
    move tiny per-batch volumes through many fixed-cost jobs) and AQE
    OFF. Spark itself keeps AQE disabled inside streaming plans;
    foreachBatch bodies are batch plans, so AQE re-engages there and
    each micro-batch pays one extra job + scheduler barrier per
    materialized query stage — measured 5-6 jobs/epoch with AQE vs
    3-4 without, ~0.25 s per gate at sf0.1, identical results (AQE's
    runtime re-planning has nothing to optimize at micro-batch
    volumes). A production deployment with large per-batch volumes
    would leave AQE on; both knobs are execution-only and scoped to
    the gate body. `partitions`/`aqe` override the defaults for the
    gates whose per-batch work is real compute, not state plumbing
    (the curation funnel's gopher/minhash/verify stages want width
    and AQE like any batch job; the state gates want neither)."""
    keys = {
        "spark.sql.shuffle.partitions": partitions
        or GATE_SHUFFLE_PARTITIONS,
        "spark.sql.adaptive.enabled": aqe,
    }
    prev = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


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
    with _gate_scratch("hha_stream_dedup_ckpt_") as ck, _gate_shuffle(spark):
        q = (
            collisions.writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", f"{ck}/ckpt")
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


SPIKE_Q = 1.5
SPIKE_LIMIT_NEW = 40
SPIKE_LIMIT_NEW_NET = 40
# The reference detector natively runs second-scale windows over
# HOURLY state files (hha.conf:29-31, hha.py:293-297); the events
# fixture spans 30 DAYS. Compress the time axis 24x (1 fixture day ->
# 1 detector hour) so the state table has ~30 hour partitions instead
# of 720 — the same cadence-to-state ratio the reference runs at.
# Windows scale with the axis: 2 days -> 7200 s, 7 days -> 25200 s.
TIME_COMPRESS = 24
SPIKE_CUR_SEC = 2 * 86_400 // TIME_COMPRESS
SPIKE_PREV_SEC = 7 * 86_400 // TIME_COMPRESS
# dst_ip = user_id * 16 so the /24 bitmask (clear low 8 bits) groups
# 16 users per network — a meaningful rollup over the 150-user fixture
IP_SCALE = 16


def stream_spike_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's deployment loop (hha.py:315-327) under the
    oracle gate: events mapped onto the histogram fact schema, written
    as plain parquet, then consumed by the REAL streaming detector —
    readStream file source -> foreachBatch -> partitioned state table
    -> full S1-S8 `detect_spikes` (with /24 rollup and zones gating)
    -> persisted alerts table — with an availableNow trigger and a
    data-derived clock so one bounded run equals the batch semantics
    the DuckDB oracle expresses.

    The result is materialized before the scratch dirs are removed;
    alert cardinality is tiny (it's the point of the detector), so
    the driver-side copy is bounded.
    """
    from hha_spark.config import DetectorParams
    from hha_spark.streaming.spike_stream import run_streaming_detector

    ev = load_table(spark, sf_dir, "events")
    ts_s = (
        (events_ts_us(ev) / F.lit(1_000_000)).cast("long")
        / F.lit(TIME_COMPRESS)
    ).cast("long")
    hist = ev.select(
        ts_s.alias("timestamp"),
        F.lit(None).cast("int").alias("subagent_id"),
        F.lit(0).cast("int").alias("num_protocol"),
        F.lit(0).cast("int").alias("type_proto"),
        F.floor("value").cast("long").alias("CountPkt"),
        (F.col("user_id") * IP_SCALE).cast("long").alias("dst_ip"),
    )
    now = hist.agg(F.max("timestamp")).first()[0]
    zones = (
        ev.where(F.expr("user_id % 7 = 0"))
        .select((F.col("user_id") * IP_SCALE).cast("long").alias("ip"))
        .distinct()
    )
    params = DetectorParams(
        quotient_amplification=SPIKE_Q,
        limit_new_data=SPIKE_LIMIT_NEW,
        limit_new_data_net=SPIKE_LIMIT_NEW_NET,
        cur_window_sec=SPIKE_CUR_SEC,
        prev_window_sec=SPIKE_PREV_SEC,
    )
    with _gate_scratch("hha_stream_spike_gate_") as tmp, _gate_shuffle(spark):
        return _spike_gate_body(spark, tmp, hist, now, zones, params)


def _spike_gate_body(spark, tmp, hist, now, zones, params):
    from hha_spark.streaming.spike_stream import run_streaming_detector

    hist.repartition(4).write.parquet(f"{tmp}/in")
    q = run_streaming_detector(
        spark,
        data_root=f"{tmp}/in",
        samples_root=f"{tmp}/state",
        alerts_path=f"{tmp}/alerts",
        checkpoint=f"{tmp}/ckpt",
        params=params,
        zones=zones,
        now_fn=lambda: now,
        # retention must cover the whole fixture span: the gate
        # replays history in one shot, so nothing may be evicted
        # and the unbounded-below prev window must see every row
        retention_sec=10 * 365 * 86_400,
        available_now=True,
    )
    q.awaitTermination()
    rows = (
        spark.read.parquet(f"{tmp}/alerts")
        .select("num_protocol", "type_proto", "dst_ip", "sum_val", "scope")
        .collect()
    )
    return _local_rows(
        spark,
        rows,
        "num_protocol int, type_proto int, dst_ip long, sum_val long, scope string",
    )


# Mirrors detect_spikes exactly, keyed by the synthetic dst_ip:
# floor-avg windows, clamp-guarded /32 comparison (S3), guardless /24
# comparison over user-16 network buckets (S5), spike ratio filter
# (S6), union (S7), zones semi-join (S8). Single batch + empty prior
# alerts table => no TTL suppression term.
ORACLE_STREAM_SPIKE = f"""
    WITH bounds AS (
      SELECT MAX(epoch_us(ts) // 1000000 // {TIME_COMPRESS}) AS now_s
      FROM events),
    ev AS (
      SELECT epoch_us(ts) // 1000000 // {TIME_COMPRESS} AS ts_s,
             user_id * {IP_SCALE} AS dst_ip,
             CAST(FLOOR(value) AS BIGINT) AS cnt
      FROM events),
    cur AS (
      SELECT dst_ip,
             CAST(FLOOR(SUM(CAST(cnt AS DECIMAL(18,6))) / COUNT(*)) AS BIGINT)
                 AS sum_val
      FROM ev, bounds WHERE ts_s > now_s - {SPIKE_CUR_SEC}
      GROUP BY dst_ip),
    prev AS (
      SELECT dst_ip,
             CAST(FLOOR(SUM(CAST(cnt AS DECIMAL(18,6))) / COUNT(*)) AS BIGINT)
                 AS sum_val
      FROM ev, bounds WHERE ts_s < now_s - {SPIKE_PREV_SEC}
      GROUP BY dst_ip),
    cmp AS (
      SELECT c.dst_ip, c.sum_val,
             COALESCE(CASE WHEN p.sum_val / NULLIF(c.sum_val, 0) > {SPIKE_Q}
                            AND p.sum_val > {SPIKE_LIMIT_NEW}
                           THEN {SPIKE_LIMIT_NEW} ELSE p.sum_val END,
                      {SPIKE_LIMIT_NEW}) AS prev_sum_val2
      FROM cur c LEFT JOIN prev p USING (dst_ip)),
    cur_net AS (
      SELECT dst_ip - dst_ip % 256 AS dst_net,
             CAST(SUM(sum_val) // COUNT(*) AS BIGINT) AS sum_val
      FROM cur GROUP BY 1),
    prev_net AS (
      SELECT dst_ip - dst_ip % 256 AS dst_net,
             CAST(SUM(sum_val) // COUNT(*) AS BIGINT) AS sum_val
      FROM prev GROUP BY 1),
    cmp_net AS (
      SELECT c.dst_net, c.sum_val,
             COALESCE(CASE WHEN p.sum_val / NULLIF(c.sum_val, 0) > {SPIKE_Q}
                           THEN {SPIKE_LIMIT_NEW_NET} ELSE p.sum_val END,
                      {SPIKE_LIMIT_NEW_NET}) AS prev_sum_val2
      FROM cur_net c LEFT JOIN prev_net p USING (dst_net)),
    alerts AS (
      SELECT 0 AS num_protocol, 0 AS type_proto, dst_ip,
             prev_sum_val2 AS sum_val, 'ip' AS scope
      FROM cmp WHERE sum_val / NULLIF(prev_sum_val2, 0) > {SPIKE_Q}
      UNION ALL
      SELECT 0, 0, dst_net AS dst_ip, prev_sum_val2, 'net'
      FROM cmp_net WHERE sum_val / NULLIF(prev_sum_val2, 0) > {SPIKE_Q}),
    zones AS (
      SELECT DISTINCT user_id * {IP_SCALE} AS ip FROM events
      WHERE user_id % 7 = 0)
    SELECT a.num_protocol, a.type_proto, a.dst_ip, a.sum_val, a.scope
    FROM alerts a
    WHERE EXISTS (SELECT 1 FROM zones z WHERE z.ip = a.dst_ip)
"""


WIN_SEC = 86_400  # tumbling day windows over the events fixture


def stream_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming's OWN state machinery under the oracle
    gate: a watermarked tumbling-window aggregation (streaming/
    windowed.py) maintained by the streaming state store — not
    foreachBatch — run availableNow in complete mode, whose final
    snapshot must equal the batch GROUP BY the DuckDB oracle runs.
    Covers the third streaming topology (ingest -> window agg ->
    sink) after the stream-static join (stream_dedup_incremental)
    and the foreachBatch detector (stream_spike_alerts).

    `value` is floored to BIGINT before summing so the windowed total
    is exact-integer on both engines (the no-raw-float-SUM rule).
    """
    from hha_spark.streaming.windowed import windowed_counts

    ev = load_table(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(ev.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    prepared = stream.select(
        (events_ts_us(stream) / F.lit(1_000_000)).cast("long").alias("ts_s"),
        "event_type",
        F.floor("value").cast("long").alias("val"),
    )
    counts = windowed_counts(
        prepared,
        time_col="ts_s",
        key_cols=("event_type",),
        value_col="val",
        window_sec=WIN_SEC,
        watermark_sec=WIN_SEC,
    )
    qname = f"_stream_windowed_{next(_QUERY_SEQ)}"
    with _gate_scratch("hha_stream_win_ckpt_") as ck, _gate_shuffle(spark):
        q = (
            counts.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", f"{ck}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(qname).select(
        F.col("window_start").cast("long").alias("window_start"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("total").cast("long").alias("total"),
    )


ORACLE_STREAM_WINDOWED = f"""
    WITH ev AS (
      SELECT epoch_us(ts) // 1000000 AS ts_s, event_type,
             CAST(FLOOR(value) AS BIGINT) AS val
      FROM events)
    SELECT ts_s - ts_s % {WIN_SEC} AS window_start, event_type,
           COUNT(*) AS n, CAST(SUM(val) AS BIGINT) AS total
    FROM ev GROUP BY 1, 2
"""


DEDUP_WM_SEC = 86_400


def stream_native_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE stateful dedup operator under the oracle gate:
    two independent file-stream sources read the same events table
    (every row therefore arrives twice), and
    `dropDuplicatesWithinWatermark(event_id)` must emit each exactly
    once — the at-least-once -> effectively-exactly-once ingest
    pattern, this time via the state store itself rather than the
    foreachBatch/anti-join design the detector uses
    (sinks/alerts.py) or the epoch-keyed sinks the sessionizer uses.
    The per-type rollup of the deduped append stream must equal plain
    DISTINCT events, which is the oracle.

    Scale: state holds one key per event id inside the watermark
    horizon (the documented state bound of the operator); the dedup
    is one exchange on the id. The duplicate pressure here is total
    (2x every row) and in-batch, the operator's hardest case.
    """
    ev = load_table(spark, sf_dir, "events")

    def src() -> DataFrame:
        s = (
            spark.readStream.schema(ev.schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
        )
        return s.select(
            "event_id",
            "event_type",
            (events_ts_us(s) / F.lit(1_000_000)).cast("long").alias("ts_s"),
        )

    doubled = src().unionByName(src())
    deduped = (
        doubled.withColumn("t", F.timestamp_seconds(F.col("ts_s")))
        .withWatermark("t", f"{DEDUP_WM_SEC} seconds")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )
    qname = f"_stream_native_dedup_{next(_QUERY_SEQ)}"
    with _gate_scratch("hha_stream_ddw_ckpt_") as ck, _gate_shuffle(spark):
        q = (
            deduped.writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", f"{ck}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(qname).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("event_id").cast("long").alias("sum_ids"),
    )


ORACLE_STREAM_NATIVE_DEDUP = """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM events GROUP BY event_type
"""


HOP_WIN_SEC = 86_400
HOP_SLIDE_SEC = 21_600  # 4 overlapping day-windows per event


def stream_events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) event-time windows in the streaming state
    store: window 1 day, slide 6 h, so every event updates FOUR
    overlapping windows — the state-multiplicity shape the tumbling
    gate (stream_events_windowed) never exercises. Same complete-mode
    availableNow replay; the final snapshot must equal the batch
    GROUP BY over the exploded window set, which is what the DuckDB
    oracle expresses (window_start = ts - ts%slide - k*slide,
    epoch-aligned exactly like Spark's default origin).
    """
    from hha_spark.streaming.windowed import windowed_counts

    ev = load_table(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(ev.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    prepared = stream.select(
        (events_ts_us(stream) / F.lit(1_000_000)).cast("long").alias("ts_s"),
        "event_type",
        F.floor("value").cast("long").alias("val"),
    )
    counts = windowed_counts(
        prepared,
        time_col="ts_s",
        key_cols=("event_type",),
        value_col="val",
        window_sec=HOP_WIN_SEC,
        watermark_sec=HOP_WIN_SEC,
        slide_sec=HOP_SLIDE_SEC,
    )
    qname = f"_stream_hopping_{next(_QUERY_SEQ)}"
    with _gate_scratch("hha_stream_hop_ckpt_") as ck, _gate_shuffle(spark):
        q = (
            counts.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", f"{ck}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(qname).select(
        F.col("window_start").cast("long").alias("window_start"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("total").cast("long").alias("total"),
    )


ORACLE_STREAM_HOPPING = f"""
    WITH ev AS (
      SELECT epoch_us(ts) // 1000000 AS ts_s, event_type,
             CAST(FLOOR(value) AS BIGINT) AS val
      FROM events),
    w AS (
      SELECT ts_s - ts_s % {HOP_SLIDE_SEC} - {HOP_SLIDE_SEC} * k
                 AS window_start,
             event_type, val
      FROM ev, range(0, {HOP_WIN_SEC // HOP_SLIDE_SEC}) t(k))
    SELECT window_start, event_type,
           COUNT(*) AS n, CAST(SUM(val) AS BIGINT) AS total
    FROM w GROUP BY 1, 2
"""


ATTR_MAX_DELAY_SEC = 14_400  # purchase within 4h of the click
# Watermark >= max_delay (round-5 ADVICE): with a shorter watermark the
# batch≡stream invariant silently leaned on the fixture arriving as ONE
# micro-batch (single parquet file) — a multi-file replay could evict
# click state before a late purchase arrives and drop matched pairs
# relative to the batch oracle. The state bound is watermark + max_delay
# either way, so equality here costs nothing and makes the gate's
# equivalence hold for ANY file/batch split of the input.
ATTR_WATERMARK_SEC = ATTR_MAX_DELAY_SEC


def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fourth streaming topology under the oracle gate: a
    watermarked STREAM-STREAM interval join (streaming/joins.py::
    attribution_join — symmetric hash join with state-store eviction
    bounds derived from the watermark + time-range condition). Clicks
    and purchases are two readStream sources over the events table;
    the inner interval join emits each matched (click, purchase) pair
    exactly once; the memory sink's append output is then aggregated
    per user. Inner stream-stream joins emit on match (the watermark
    only bounds state, it never holds back inner matches), so one
    availableNow replay equals the batch interval join the DuckDB
    oracle expresses — the same batch≡stream invariant the other
    three streaming gates pin, now for dual-unbounded-input state.

    Scale: state is keyed by user_id and bounded to watermark +
    max_delay per side; the join is one exchange per side. Output is
    an aggregate over attributed pairs, so the sink stays tiny.
    """
    from hha_spark.streaming.joins import attribution_join

    ev = load_table(spark, sf_dir, "events")

    def side(event_type: str, ts_name: str) -> DataFrame:
        s = (
            spark.readStream.schema(ev.schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
        )
        return s.where(F.col("event_type") == event_type).select(
            "user_id",
            (events_ts_us(s) / F.lit(1_000_000)).cast("long").alias(ts_name),
        )

    joined = attribution_join(
        side("click", "click_ts"),
        side("purchase", "purchase_ts"),
        max_delay_sec=ATTR_MAX_DELAY_SEC,
        watermark_sec=ATTR_WATERMARK_SEC,
    )
    qname = f"_stream_attr_{next(_QUERY_SEQ)}"
    with _gate_scratch("hha_stream_attr_ckpt_") as ck, _gate_shuffle(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", f"{ck}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(qname)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_attr"),
            F.sum("delay_sec").cast("long").alias("sum_delay"),
            F.min("delay_sec").cast("long").alias("min_delay"),
        )
    )


ORACLE_STREAM_ATTRIBUTION = f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // 1000000 AS ts_s, event_type
      FROM events),
    pairs AS (
      SELECT c.user_id, p.ts_s - c.ts_s AS delay_sec
      FROM ev c JOIN ev p
        ON c.user_id = p.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts_s >= c.ts_s AND p.ts_s <= c.ts_s + {ATTR_MAX_DELAY_SEC})
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_attr,
           CAST(SUM(delay_sec) AS BIGINT) AS sum_delay,
           CAST(MIN(delay_sec) AS BIGINT) AS min_delay
    FROM pairs GROUP BY user_id
"""


SESS_GAP_US = 12 * 3600 * 1_000_000  # 12h gap => sessions chain across slices
SESS_SLICES = 3


def _slice_bounds(ev: DataFrame, n_slices: int, ts_col: str = "ts_us"):
    """(lo, span, base-slice SQL) for equal-width time bands:
    slice(ts) = s  <=>  lo + ceil(s*span/n) <= ts < lo + ceil((s+1)*span/n).
    The slice expression is returned as SQL text so callers can
    compose it into larger expressions (the disorder writer inlines
    it twice). `ts_col` is any integer event-time column (micros for
    the sessionize gates, seconds for the attribution gate)."""
    lo, hi = ev.agg(F.min(ts_col), F.max(ts_col)).first()
    span = hi - lo + 1
    base_sql = (
        f"least({n_slices - 1} + 0L, ({ts_col} - {lo}) * {n_slices}"
        f" div {span})"
    )
    return lo, span, base_sql


def _write_file_slices(
    ev: DataFrame, file_col, tmp: str, n_slices: int
) -> str:
    """Shared writer behind both sessionize gates: route each event to
    the file index `file_col` yields, then emit n parquet files with
    strictly increasing mtimes so the file source (maxFilesPerTrigger)
    replays them as ordered micro-batches.

    One pass: repartition("_file") puts each file's rows in a single
    partition and the dynamic-partitioned write emits exactly one part
    per non-empty index — vs. n single-task filtered scans of the
    whole table. An index no event maps to (a quiet time band) gets a
    schema-only parquet file, so the band still replays as an empty
    micro-batch instead of crashing the glob — the behavior the
    per-slice coalesce(1) writer used to provide."""
    import glob
    import os
    import shutil
    import time

    (
        ev.withColumn("_file", file_col)
        .repartition("_file")
        .write.partitionBy("_file")
        .parquet(f"{tmp}/sliced")
    )
    in_dir = f"{tmp}/in"
    os.makedirs(in_dir)
    base = time.time() - 1000
    for i in range(n_slices):
        parts = glob.glob(f"{tmp}/sliced/_file={i}/part-*.parquet")
        dst = f"{in_dir}/slice{i}.parquet"
        if len(parts) > 1:
            # repartition("_file") guarantees one task per index, but a
            # session configured with spark.sql.files.maxRecordsPerFile
            # (or a future writer option) would split the task's output
            # into several part files; name the condition instead of
            # dying in an opaque unpacking ValueError
            raise RuntimeError(
                f"expected exactly one part file under "
                f"{tmp}/sliced/_file={i}, found {len(parts)}: {parts} "
                f"(is spark.sql.files.maxRecordsPerFile set?)"
            )
        if parts:
            (part,) = parts
            shutil.move(part, dst)
        else:  # empty band: schema-only file, empty micro-batch
            d = f"{tmp}/empty{i}"
            ev.limit(0).coalesce(1).write.parquet(d)
            (part,) = glob.glob(f"{d}/part-*.parquet")
            shutil.move(part, dst)
        os.utime(dst, (base + 10 * i, base + 10 * i))
    return in_dir


def _write_time_slices(ev: DataFrame, tmp: str, n_slices: int) -> str:
    """Write (user_id, ts_us) into n chronological parquet files —
    the per-user time-ordered ingest contract streaming/sessionize.py
    documents (each event goes to its own time band's file)."""
    _, _, base_sql = _slice_bounds(ev, n_slices)
    return _write_file_slices(ev, F.expr(base_sql), tmp, n_slices)


_SESS_ROLLUP_SCHEMA = (
    "user_id long, n_sessions long, n_events long, "
    "max_len_us long, sum_len_us long"
)


def _sessions_rollup(spark: SparkSession, sessions: DataFrame) -> DataFrame:
    """Per-user rollup both sessionize gates return (must stay in
    lockstep with ORACLE_STREAM_SESSIONIZE's output columns), collected
    before the gate's scratch directories vanish; one row per user."""
    out = sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.max(F.col("end_us") - F.col("start_us"))
        .cast("long")
        .alias("max_len_us"),
        F.sum(F.col("end_us") - F.col("start_us"))
        .cast("long")
        .alias("sum_len_us"),
    )
    return _local_rows(spark, out.collect(), _SESS_ROLLUP_SCHEMA)


def stream_sessionize_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fifth streaming topology under the oracle gate: stateful
    CROSS-MICRO-BATCH sessionization (streaming/sessionize.py). The
    events table is split into three chronological files replayed as
    TWO micro-batches (maxFilesPerTrigger=2 + availableNow — two
    files then one, so the source's multi-file batching and the
    cross-batch state boundary are both exercised); open sessions
    carry forward in a versioned state table and merge with the next
    batch, so a session spanning the batch boundary is reassembled
    across state — the thing the other four topologies never
    exercise. (Measured: each extra micro-batch costs ~1 s of fixed
    engine+commit overhead at any sf, so the gate uses the fewest
    batches that still cross state; the 3-batch replay stays covered
    by tests/test_sessionize_stream.py.) The final per-user rollup
    (closed sessions + end-of-stream flush) must equal one-shot batch
    sessionization, which is the DuckDB gaps-and-islands oracle.

    Scale: state is one open session per active user; each batch does
    one user-keyed window pass (state and events gap-merge together)
    and one kind-partitioned write. See the module docstring for the
    100 TB notes and the ordering contract.
    """
    from hha_spark.streaming.sessionize import (
        final_sessions,
        run_streaming_sessionizer,
    )

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select("user_id", events_ts_us(ev_raw).alias("ts_us"))
    with _gate_scratch("hha_stream_sess_") as tmp, _gate_shuffle(spark):
        in_dir = _write_time_slices(ev, tmp, SESS_SLICES)
        q = run_streaming_sessionizer(
            spark,
            data_root=in_dir,
            schema="user_id long, ts_us long",
            store_root=f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            gap_us=SESS_GAP_US,
            max_files_per_trigger=2,
            available_now=True,
        )
        q.awaitTermination()
        sessions = final_sessions(spark, store_root=f"{tmp}/store")
        return _sessions_rollup(spark, sessions)


ORACLE_STREAM_SESSIONIZE = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events),
    l AS (
      SELECT user_id, ts_us,
             CASE WHEN prev IS NULL OR ts_us - prev > {SESS_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM (SELECT user_id, ts_us,
                   LAG(ts_us) OVER (PARTITION BY user_id
                                    ORDER BY ts_us) AS prev
            FROM e)),
    g AS (
      SELECT user_id, ts_us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM l),
    s AS (
      SELECT user_id, sid, MIN(ts_us) AS s0, MAX(ts_us) AS s1,
             COUNT(*) AS n
      FROM g GROUP BY user_id, sid)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(MAX(s1 - s0) AS BIGINT) AS max_len_us,
           CAST(SUM(s1 - s0) AS BIGINT) AS sum_len_us
    FROM s GROUP BY user_id
"""


QUERIES = {
    "stream_dedup_incremental": stream_dedup_incremental,
    "stream_spike_alerts": stream_spike_alerts,
    "stream_events_windowed": stream_events_windowed,
    "stream_attribution_join": stream_attribution_join,
    "stream_sessionize_incremental": stream_sessionize_incremental,
    "stream_events_hopping": stream_events_hopping,
    "stream_native_dedup": stream_native_dedup,
}

# the batch oracle IS the stream oracle — that equality is the point
ORACLES = {
    "stream_dedup_incremental": ORACLE_INCREMENTAL,
    "stream_spike_alerts": ORACLE_STREAM_SPIKE,
    "stream_events_windowed": ORACLE_STREAM_WINDOWED,
    "stream_attribution_join": ORACLE_STREAM_ATTRIBUTION,
    "stream_sessionize_incremental": ORACLE_STREAM_SESSIONIZE,
    "stream_events_hopping": ORACLE_STREAM_HOPPING,
    "stream_native_dedup": ORACLE_STREAM_NATIVE_DEDUP,
}


def stream_cms_heavy(
    spark: SparkSession, sf_dir: str, *, batch_log: list | None = None
) -> DataFrame:
    """Streaming maintenance of a count-min sketch: the corpus
    arrives as a multi-file stream (4 files at maxFilesPerTrigger=2 —
    two micro-batches, the fewest that still exercise the cross-batch
    merge; each extra batch is ~1 s of fixed engine cost), each
    micro-batch builds its own bounded
    d x w counter grid DISTRIBUTED (map-side-combinable, exactly
    operators/sketch.py::cms_counters), and the driver merges grids
    by cell addition — legitimate precisely because a CMS is a
    bounded LINEAR sketch: merge(counters(A), counters(B)) ==
    counters(A ∪ B), cell by cell. The streamed sketch must therefore
    reproduce the batch gate (cms_heavy_tokens) EXACTLY — same heavy
    set, same estimates, same overcounts — which is what the shared
    oracle checks.

    This is the production shape for streaming vocabulary statistics:
    per-executor/per-batch partial sketches (each <= d*w longs, here
    2048) merge associatively anywhere — driver, downstream job, or
    another region — while the token stream itself is never
    re-shuffled. State is the sketch, not the history.
    """
    from hha_spark.operators.sketch import cms_counters, cms_estimates
    from hha_spark.queries.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        HEAVY_DEN,
        HEAVY_NUM,
    )

    docs = _docs(spark, sf_dir)
    state: dict[tuple[int, int], int] = {}
    applied: set[int] = set()

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent under foreachBatch REDELIVERY of an applied
        # batch: a repeated batch_id is a no-op. Marked applied after
        # the merge, so a failure inside collect() replays cleanly;
        # a crash mid-dict-loop would lose the whole in-memory state
        # with the driver anyway (a durable-state variant would stage
        # + rename per epoch, like the sessionizer's versioned state).
        if batch_id in applied:
            return
        toks = batch_df.select(
            F.explode(F.split("text", " ")).alias("token")
        )
        grid = cms_counters(toks, depth=CMS_DEPTH, width=CMS_WIDTH)
        for r in grid.collect():  # bounded: <= depth*width rows
            k = (int(r["row"]), int(r["col"]))
            state[k] = state.get(k, 0) + int(r["counter"])
        applied.add(batch_id)
        if batch_log is not None:
            batch_log.append(batch_id)

    with _gate_scratch("hha_stream_cms_") as tmp, _gate_shuffle(spark):
        docs.repartition(4).write.parquet(f"{tmp}/in")
        stream = (
            spark.readStream.schema(docs.schema)
            .format("parquet")
            .option("maxFilesPerTrigger", 2)
            .load(f"{tmp}/in")
        )
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    counters = _local_rows(
        spark,
        [(r, c, v) for (r, c), v in sorted(state.items())],
        "row long, col long, counter long",
    )
    # probe + heavy filter + audit: identical to the batch gate
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    truth = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    total = toks.select(
        F.count(F.lit(1)).cast("long").alias("total_toks")
    )
    est = cms_estimates(
        truth.select("token"), counters, depth=CMS_DEPTH, width=CMS_WIDTH
    )
    return (
        est.join(truth, on="token")
        .join(F.broadcast(total))
        .where(
            F.col("est") * F.lit(HEAVY_DEN)
            >= F.col("total_toks") * F.lit(HEAVY_NUM)
        )
        .select(
            "token",
            "est",
            "true_cnt",
            (F.col("est") - F.col("true_cnt")).alias("overcount"),
        )
    )


QUERIES["stream_cms_heavy"] = stream_cms_heavy

from hha_spark.queries.sketches import ORACLE_CMS_HEAVY as _ORACLE_CMS_BATCH

# the batch sketch oracle IS the stream oracle — CMS linearity makes
# the merged stream sketch bit-identical to the batch build
ORACLES["stream_cms_heavy"] = _ORACLE_CMS_BATCH


def stream_temperature_mixture(
    spark: SparkSession, sf_dir: str, *, batch_log: list | None = None
) -> DataFrame:
    """Streaming maintenance of mixture statistics: the corpus
    arrives as a multi-file stream (4 files at maxFilesPerTrigger=2 —
    two micro-batches, the fewest that still exercise the cross-batch
    merge); each micro-batch computes its per-source
    (n_docs, n_tokens) DISTRIBUTED (one map-side-combinable groupBy)
    and the driver merges by plain addition — sound because those are
    ADDITIVE sufficient statistics. The NONLINEAR readout (exact
    isqrt, shares, budget split — operators/corpus.py::
    mixture_readout) runs once over the merged state and must equal
    the batch gate corpus_temperature_mixture EXACTLY, which is what
    the shared oracle checks.

    This is the companion proof to stream_cms_heavy: that gate shows
    a bounded LINEAR sketch streams losslessly; this one shows the
    additive-statistic / nonlinear-readout SPLIT — the pattern for
    any ingest-time corpus accounting (mixture weights, dedup rates,
    source quotas) where the decision function itself is not linear
    and must NEVER be computed per-batch and averaged.

    State is bounded by the number of sources (thousands at most),
    never by corpus size.
    """
    from hha_spark.operators.corpus import mixture_readout
    from hha_spark.queries.corpus import BUDGET_PCT

    docs = load_table(spark, sf_dir, "documents")
    state: dict[str, list[int]] = {}
    applied: set[int] = set()

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent under foreachBatch REDELIVERY of an applied
        # batch (see stream_cms_heavy's merge for the exact contract)
        if batch_id in applied:
            return
        # the ONE shared statistics definition (operators/corpus.py::
        # per_source_stats) — stream==batch can't drift on a copy
        from hha_spark.operators.corpus import per_source_stats

        for r in per_source_stats(batch_df).collect():  # one row/source
            acc = state.setdefault(r["source"], [0, 0])
            acc[0] += int(r["n_docs"])
            acc[1] += int(r["n_tokens"])
        applied.add(batch_id)
        if batch_log is not None:
            batch_log.append(batch_id)

    with _gate_scratch("hha_stream_mix_") as tmp, _gate_shuffle(spark):
        docs.repartition(4).write.parquet(f"{tmp}/in")
        stream = (
            spark.readStream.schema(docs.schema)
            .format("parquet")
            .option("maxFilesPerTrigger", 2)
            .load(f"{tmp}/in")
        )
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    per_source = _local_rows(
        spark,
        [(s, v[0], v[1]) for s, v in sorted(state.items())],
        "source string, n_docs long, n_tokens long",
    )
    return mixture_readout(per_source, budget_frac_pct=BUDGET_PCT)


QUERIES["stream_temperature_mixture"] = stream_temperature_mixture

from hha_spark.queries.corpus import (  # noqa: E402
    ORACLES as _CORPUS_ORACLES,
)

# the batch mixture oracle IS the stream oracle — additive sufficient
# statistics merged across micro-batches feed the identical readout
ORACLES["stream_temperature_mixture"] = _CORPUS_ORACLES[
    "corpus_temperature_mixture"
]


# bounded-disorder delivery for the sessionize-disorder gate: events
# within this window below a slice boundary may arrive one file late
SESS_DISORDER_US = 6 * 3600 * 1_000_000  # 6h (gap is 12h)


def _write_disorder_slices(
    ev: DataFrame, tmp: str, n_slices: int, delay_us: int,
    ts_col: str = "ts_us",
) -> str:
    """Time-sliced files with bounded-LATE delivery: an event within
    delay_us below its slice's top boundary moves to the NEXT file
    when a deterministic md5 parity selects it. The arrival stream
    then violates per-user time order (the ordered processor's
    contract) while honoring the bounded-disorder contract with
    disorder_us = delay_us: files before f top out at T_{f-1}-1, and
    every late event in f has ts > T_{f-1} - delay_us > max_seen -
    delay_us. File emission (one pass, one file per slice,
    mtime-ordered replay, empty-band tolerance) is the shared
    _write_file_slices."""
    return _write_file_slices(
        ev, disorder_slice_col(ev, n_slices, delay_us, ts_col), tmp,
        n_slices,
    )


def disorder_slice_col(
    ev: DataFrame, n_slices: int, delay_us: int, ts_col: str = "ts_us"
):
    """The bounded-late slice index as a Column — the ONE definition
    of the disorder delivery shape, shared by the gate writers above
    and the scale probe's in-memory replay
    (tools/scale_probe.py::_attribution_disorder_probe), so the probe
    can never drift from what the gates replay."""
    from hha_spark.operators.sketch import md5_mod

    lo, span, base_sql = _slice_bounds(ev, n_slices, ts_col)
    # exclusive top boundary of the base slice (see _slice_bounds)
    top_sql = (
        f"({lo} + (({base_sql} + 1) * {span} + {n_slices - 1})"
        f" div {n_slices})"
    )
    delayed = (
        (F.col(ts_col) > F.expr(top_sql) - delay_us)
        & (F.expr(base_sql) < n_slices - 1)
        & (
            md5_mod(
                "sessdelay|",
                F.concat_ws(":", F.col("user_id"), F.col(ts_col)),
                2,
            )
            == 0
        )
    )
    return F.expr(base_sql) + delayed.cast("long")


def stream_sessionize_disorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-disorder sessionization under the oracle gate: the
    events table replays as three mtime-ordered files in which
    boundary events are delivered one file LATE (bounded by
    SESS_DISORDER_US), so per-user arrival order is genuinely
    violated across micro-batches — the contract the ordered
    sessionizer cannot handle. Like the ordered gate, the three
    files batch as TWO micro-batches (maxFilesPerTrigger=2 — each
    extra batch is ~1 s of fixed engine+commit cost): slice-1 tail
    events delayed into file 3 still arrive one BATCH after their
    time-peers, so cross-batch disorder is exercised for real, and
    grouping files only lowers the number of watermark advances —
    the arrival-bound contract is unchanged. The 3-batch
    one-file-per-trigger replay stays covered by
    tests/test_sessionize_stream.py. The watermark processor
    (streaming/sessionize.py::make_disorder_sessionize_processor)
    buffers immature events, sessionizes the mature stream in global
    time order, and closes sessions only once the watermark passes
    end + gap; closed epochs + the end-of-stream flush must equal
    one-shot batch sessionization — the SAME DuckDB gaps-and-islands
    oracle as the ordered gate, which is the point: delivery order
    changed, the answer may not.

    Scale: state adds an event buffer bounded by disorder window x
    event rate on top of the O(active users) open sessions — the
    same cost Spark's own watermarking pays; everything else is the
    ordered processor's per-batch shape (one user-keyed shuffle, one
    semi/anti state split).
    """
    from hha_spark.streaming.sessionize import (
        final_sessions_disorder,
        run_disorder_sessionizer,
    )

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select("user_id", events_ts_us(ev_raw).alias("ts_us"))
    with _gate_scratch("hha_stream_sessdis_") as tmp, _gate_shuffle(spark):
        in_dir = _write_disorder_slices(
            ev, tmp, SESS_SLICES, SESS_DISORDER_US
        )
        q = run_disorder_sessionizer(
            spark,
            data_root=in_dir,
            schema="user_id long, ts_us long",
            store_root=f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            gap_us=SESS_GAP_US,
            disorder_us=SESS_DISORDER_US,
            max_files_per_trigger=2,
            available_now=True,
        )
        q.awaitTermination()
        sessions = final_sessions_disorder(
            spark,
            store_root=f"{tmp}/store",
            gap_us=SESS_GAP_US,
        )
        return _sessions_rollup(spark, sessions)


QUERIES["stream_sessionize_disorder"] = stream_sessionize_disorder
# delivery order changed, the event SET did not: the ordered gate's
# batch oracle is verbatim the disorder gate's oracle
ORACLES["stream_sessionize_disorder"] = ORACLE_STREAM_SESSIONIZE


# bounded-disorder delivery for the attribution gate: events within
# this window below a slice boundary may arrive one file late — late
# CLICKS must still pair with purchases that matured a batch earlier
ATTR_DISORDER_SEC = 6 * 3600  # 6h (max_delay is 4h)

_ATTR_ROLLUP_SCHEMA = (
    "user_id long, n_attr long, sum_delay long, min_delay long"
)


def stream_attribution_disorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream interval join under bounded-DISORDER
    delivery — the eleventh streaming topology and the delivery shape
    the native watermarked join gate (stream_attribution_join) never
    exercises: clicks and purchases replay as three mtime-ordered
    files in which boundary events are delivered one file LATE
    (bounded by ATTR_DISORDER_SEC), so a click can arrive a
    micro-batch AFTER a purchase it must pair with. The watermark-
    buffer processor (streaming/joins.py::
    make_disorder_attribution_processor — the sessionize disorder
    discipline applied to dual-input join state) buffers immature
    events, joins each purchase exactly once at maturity against the
    bounded click state, and flushes the remaining buffer at end of
    stream; the result must equal the batch interval join — the SAME
    DuckDB oracle as the ordered attribution gate, which is the
    point: delivery order changed, the answer may not. Three files
    batch as TWO micro-batches (maxFilesPerTrigger=2), so late
    slice-1-tail events still arrive one BATCH after their
    time-peers.

    Scale: click state is bounded by max_delay + the disorder
    buffer per key — the same eviction bound Spark's symmetric hash
    join derives; per epoch one user-keyed join + one
    kind-partitioned write (emitted pairs are append-only history).
    """
    from hha_spark.streaming.joins import (
        final_attributions,
        run_disorder_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    two = ev.where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        (events_ts_us(ev) / F.lit(1_000_000)).cast("long").alias("ts_s"),
        F.col("event_type").alias("etype"),
    )
    with _gate_scratch("hha_stream_attrdis_") as tmp, _gate_shuffle(spark):
        in_dir = _write_disorder_slices(
            two, tmp, SESS_SLICES, ATTR_DISORDER_SEC, ts_col="ts_s"
        )
        q = run_disorder_attribution(
            spark,
            data_root=in_dir,
            schema="user_id long, ts_s long, etype string",
            store_root=f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            max_delay_sec=ATTR_MAX_DELAY_SEC,
            disorder_sec=ATTR_DISORDER_SEC,
            max_files_per_trigger=2,
            available_now=True,
        )
        q.awaitTermination()
        pairs = final_attributions(
            spark,
            store_root=f"{tmp}/store",
            max_delay_sec=ATTR_MAX_DELAY_SEC,
        )
        out = pairs.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_attr"),
            F.sum(F.col("ts2_s") - F.col("ts_s"))
            .cast("long")
            .alias("sum_delay"),
            F.min(F.col("ts2_s") - F.col("ts_s"))
            .cast("long")
            .alias("min_delay"),
        )
        # collected before the gate's scratch directories vanish
        return _local_rows(spark, out.collect(), _ATTR_ROLLUP_SCHEMA)


QUERIES["stream_attribution_disorder"] = stream_attribution_disorder
# delivery order changed, the event SET did not: the ordered
# attribution gate's batch oracle is verbatim the disorder oracle
ORACLES["stream_attribution_disorder"] = ORACLE_STREAM_ATTRIBUTION


_CUR_ROLLUP_SCHEMA = (
    "source string, n_docs_raw long, n_docs_quality long, "
    "n_docs_unique long, n_tokens_unique long, target_tokens long, "
    "kept_docs long, kept_tokens long"
)


def stream_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pipeline maintained INCREMENTALLY
    across micro-batches (streaming/curation_stream.py): Gopher
    quality -> survivor MinHash-LSH dedup -> temperature mixture ->
    token-budget fill, with quality verdicts, band keys, verified
    near-dup edges, and min-id cluster labels carried in the
    versioned kind-partitioned store, and the bucket-cap
    reconciliation that keeps incremental pairing exactly equal to
    the batch-capped pair set (the module docstring's monotonicity
    argument). The documents table replays as three
    md5(doc_id)-INTERLEAVED files batched as TWO micro-batches, so
    every batch holds docs from across the id space: cross-batch
    near-dup pairs and cross-batch cluster MERGES (a later doc
    bridging two earlier clusters, retroactively dropping one keeper)
    happen for real — no ordering contract exists to lean on, which
    is the point: the funnel's stages are stateless, additive, or
    order-independent closures, so ANY split must reproduce the batch
    answer. Oracle: verbatim the corpus_curation_pipeline oracle.

    Scale: per epoch the per-doc work is narrow and batch-sized; the
    candidate join is batch-bands x capped buckets; the closure folds
    one node->label row per clustered doc; state is the curated
    corpus store itself. See streaming/curation_stream.py.
    """
    from hha_spark.operators.sketch import md5_mod
    from hha_spark.queries.corpus import BUDGET_PCT, FILL_SALT
    from hha_spark.streaming.curation_stream import (
        final_curation_funnel,
        run_streaming_curation,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    # Width 4, AQE OFF. The r9-era shape wanted AQE (its heavy
    # gopher/repartition plan had stages worth re-planning); after
    # the round-10 rewrite — shuffle-free gopher map, single
    # mega-probe action, exchange-free write — each epoch's plan is
    # lean enough that runtime re-planning has nothing to optimize,
    # and AQE's per-materialized-stage barrier shows up as job count
    # (a trace measured 36 jobs for 2 epochs with AQE on). Measured
    # honestly: warm in-session sweeps favored off by ~1 s, but
    # fresh-process A/B (the driver's shape) shows parity within the
    # host's ±0.8 s noise — off is kept for the lower job count, not
    # a claimed wall win. At production batch volumes flip AQE back
    # on with the data.
    with _gate_scratch("hha_stream_cur_") as tmp, _gate_shuffle(
        spark, partitions="4", aqe="false"
    ):
        in_dir = _write_file_slices(
            docs,
            md5_mod("curslice|", F.col("doc_id").cast("string"), 3),
            tmp,
            3,
        )
        q = run_streaming_curation(
            spark,
            data_root=in_dir,
            schema="doc_id long, source string, text string",
            store_root=f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            max_files_per_trigger=2,
            available_now=True,
        )
        q.awaitTermination()
        out = final_curation_funnel(
            spark,
            store_root=f"{tmp}/store",
            budget_frac_pct=BUDGET_PCT,
            salt=FILL_SALT,
        )
        # collected before the gate's scratch directories vanish
        return _local_rows(spark, out.collect(), _CUR_ROLLUP_SCHEMA)


QUERIES["stream_curation_funnel"] = stream_curation_funnel
# delivery (micro-batch split) changed, the document SET did not: the
# batch curation pipeline's oracle is verbatim the streaming oracle
ORACLES["stream_curation_funnel"] = _CORPUS_ORACLES[
    "corpus_curation_pipeline"
]


def stream_curation_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming curation funnel with LIVE store compaction: the
    documents table replays as three md5-interleaved files delivered
    ONE PER MICRO-BATCH with `compact_every=1`, so a real minor fold
    (streaming/store.py) fires BETWEEN epochs — version stubs below
    the newest two merge into a base dir while the stream is still
    running — and later epochs' candidate verification plus the
    final flush read the folded history. Oracle: verbatim the batch
    corpus_curation_pipeline oracle. What this gate driver-verifies
    that stream_curation_funnel cannot: the compaction protocol's
    reader-equivalence argument (folding history stubs preserves
    every union a future epoch or final reader can issue) holds
    under the full funnel semantics, value-exact — previously that
    contract was pinned only by pytest (test_store_compaction.py).

    Scale: identical to stream_curation_funnel (compaction adds one
    bounded merge write per fold, amortized linear — the LSM minor
    shape); the stats assert makes a silent no-fold regression
    (e.g. a version-layout change that stops the fold from firing)
    fail the gate rather than quietly un-verify it.
    """
    from hha_spark.operators.sketch import md5_mod
    from hha_spark.queries.corpus import BUDGET_PCT, FILL_SALT
    from hha_spark.streaming.curation_stream import (
        final_curation_funnel,
        run_streaming_curation,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    stats: dict = {}
    # width 4, AQE off — same sweep-backed knobs as
    # stream_curation_funnel (see its comment)
    with _gate_scratch("hha_stream_curc_") as tmp, _gate_shuffle(
        spark, partitions="4", aqe="false"
    ):
        # FOUR slices, one per micro-batch: a minor fold needs >= 2
        # foldable stubs strictly below the newest two versions, so 4
        # epochs is the minimum stream on which compact_every=1 fires
        # a real fold (after epoch 3: olds = [v0, v1]). Sizes are
        # SKEWED (1/8, 1/8, 1/8, 5/8 via min(md5 mod 8, 3)): the
        # fold, the cross-batch merges, and the folded-history reads
        # are exercised identically, but three of the four epochs
        # carry an eighth of the corpus each, so the gate does not
        # pay the full per-epoch funnel cost four times (measured
        # ~12-14 s -> ~8 s; delivery stays md5-interleaved, so every
        # slice still spans the id space)
        in_dir = _write_file_slices(
            docs,
            F.least(
                md5_mod("curslice|", F.col("doc_id").cast("string"), 8),
                F.lit(3),
            ),
            tmp,
            4,
        )
        q = run_streaming_curation(
            spark,
            data_root=in_dir,
            schema="doc_id long, source string, text string",
            store_root=f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            max_files_per_trigger=1,
            available_now=True,
            stats=stats,
            compact_every=1,
        )
        q.awaitTermination()
        # explicit raise, not assert: the fold-fired invariant is the
        # reason this gate exists, and `python -O` strips asserts —
        # a bare assert would silently un-verify the compaction
        # coverage in optimized runs
        if stats.get("compactions", 0) < 1:
            raise RuntimeError(
                "gate fixture no longer exercises a live fold: "
                f"{stats}"
            )
        out = final_curation_funnel(
            spark,
            store_root=f"{tmp}/store",
            budget_frac_pct=BUDGET_PCT,
            salt=FILL_SALT,
        )
        # collected before the gate's scratch directories vanish
        return _local_rows(spark, out.collect(), _CUR_ROLLUP_SCHEMA)


QUERIES["stream_curation_compacted"] = stream_curation_compacted
# compaction changes the store LAYOUT, never any reader view: the
# batch curation pipeline's oracle is verbatim this gate's oracle
ORACLES["stream_curation_compacted"] = _CORPUS_ORACLES[
    "corpus_curation_pipeline"
]


def stream_curation_spilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming curation funnel with the LABEL SPILL forced on
    (`label_spill_rows=0`): every epoch's driver-computed cluster
    labels are serialized to parquet through the store's Hadoop
    FileSystem and read back as a normal scan instead of riding the
    write job's task binary as a LocalTableScan literal
    (streaming/curation_stream.py::_uf_labels). Oracle: verbatim the
    batch corpus_curation_pipeline oracle. What this gate
    driver-verifies that stream_curation_funnel cannot: the spilled
    label frame — a different PHYSICAL source feeding the store
    write and therefore everything the final flush reads — is
    value-identical to the literal path. The spill is the long-lived
    -deployment scale fix (label state is cumulative, so on a
    months-old stream the literal grows each epoch's task binary
    without bound; measured ~4 MB binaries and a driver
    broadcast-build OOM at 8g after ~4000 stages on the 96-epoch
    probe axis), so the gate pins production semantics, not a test
    convenience.

    Scale: identical to stream_curation_funnel plus one driver-side
    Arrow-parquet serialize + one small file round-trip per epoch —
    O(labels) bytes written once, never re-broadcast per stage.
    """
    from hha_spark.operators.sketch import md5_mod
    from hha_spark.queries.corpus import BUDGET_PCT, FILL_SALT
    from hha_spark.streaming.curation_stream import (
        final_curation_funnel,
        run_streaming_curation,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    stats: dict = {}
    # width 4, AQE off — same sweep-backed knobs as
    # stream_curation_funnel (see its comment)
    with _gate_scratch("hha_stream_curs_") as tmp, _gate_shuffle(
        spark, partitions="4", aqe="false"
    ):
        in_dir = _write_file_slices(
            docs,
            md5_mod("curslice|", F.col("doc_id").cast("string"), 3),
            tmp,
            3,
        )
        q = run_streaming_curation(
            spark,
            data_root=in_dir,
            schema="doc_id long, source string, text string",
            store_root=f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            max_files_per_trigger=2,
            available_now=True,
            stats=stats,
            label_spill_rows=0,
        )
        q.awaitTermination()
        # explicit raise, not assert: the spill-fired invariant is
        # the reason this gate exists (`python -O` strips asserts)
        if stats.get("label_spills", 0) < 1:
            raise RuntimeError(
                "gate fixture no longer exercises the label spill: "
                f"{stats}"
            )
        out = final_curation_funnel(
            spark,
            store_root=f"{tmp}/store",
            budget_frac_pct=BUDGET_PCT,
            salt=FILL_SALT,
        )
        # collected before the gate's scratch directories vanish
        return _local_rows(spark, out.collect(), _CUR_ROLLUP_SCHEMA)


QUERIES["stream_curation_spilled"] = stream_curation_spilled
# the spill changes the labels' physical SOURCE, never any value:
# the batch curation pipeline's oracle is verbatim this gate's oracle
ORACLES["stream_curation_spilled"] = _CORPUS_ORACLES[
    "corpus_curation_pipeline"
]
