"""Stateful cross-micro-batch sessionization via foreachBatch.

The fifth streaming topology in this engine (after the stream-static
join, the foreachBatch detector, the watermarked window aggregate,
and the stream-stream interval join): per-user session tracking where
a session may SPAN micro-batches, so the operator must carry OPEN
sessions forward as state and merge them with the next batch.

Why foreachBatch and not applyInPandasWithState: the same two reasons
as streaming/spike_stream.py — this environment's Spark build crashes
Python workers inside stateful pandas stages (verified repro), and
the foreachBatch design keeps every stage JVM-side in whole-stage
codegen. The state here is EXACTLY the shape flatMapGroupsWithState
would hold (one open session per active user), persisted as a
versioned parquet table instead of the state store.

Relation to F.session_window: Spark's native session windows (used
and tested in tests/test_streaming.py::test_streaming_session_windows)
cover the plain gap-merge aggregate. This module is the EXPLICIT-state
variant of the same semantics — the pattern you need once the
per-session state outgrows what session_window can hold (arbitrary
payloads, TTL suppression a la sinks/alerts.py, cross-table
enrichment before close) — and its correctness is pinned against the
batch oracle by the stream_sessionize_incremental driver gate, at
sf0.01 with ~95 sessions genuinely spanning micro-batch boundaries.

Ordering contract (make_sessionize_processor): micro-batches must be
per-user time-ordered — every user's events in batch N+1 are >= their
events in batch N (the Kafka-keyed-partition / file-per-time-slice
ingest shape; the reference's hourly state files satisfy it natively,
hha.py:293-297). Under that contract the streamed result equals batch
sessionization row-for-row, which is what the driver gate verifies.

Bounded disorder (make_disorder_sessionize_processor): the watermark
generalization for out-of-order delivery. Contract: every arriving
event's ts is >= (max ts of all PREVIOUSLY ARRIVED events) -
disorder_us. The processor buffers events younger than the watermark
wm = max_seen - disorder_us, sessionizes only the mature slice
(ts <= wm — no future arrival can land below wm, so the mature
stream is replayed in global time order), and closes a session only
once wm has moved more than gap_us past its end (end_us < wm -
gap_us), because a future event at ts' >= wm extends a session
ending at e iff ts' - e <= gap_us. State grows by the event buffer:
O(active users) open sessions + O(disorder window x event rate)
buffered events — the exact cost Spark's own watermarking pays.
Streamed result equals batch sessionization row-for-row, pinned by
the stream_sessionize_disorder driver gate replaying time-sliced
files with boundary events delivered one file late.

Scale: per batch, one shuffle keyed by user_id (the within-batch
sessionize window), one semi/anti split of the state table, one
merge window over (touched open sessions UNION batch sessions) whose
left side is <=1 row per active user — state volume is O(active
users), never O(events). Closed sessions append; the open-state
rewrite is a full copy of a bounded table (at 100 TB: a bucketed
table so the semi-join and the merge co-locate without a shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hha_spark.sources import fs

SESSION_COLS = ("user_id", "start_us", "end_us", "n_events")
_SESSION_SCHEMA = "user_id long, start_us long, end_us long, n_events long"
_EVENT_SCHEMA = "user_id long, ts_us long"


def sessionize_batch(events: DataFrame, *, gap_us: int) -> DataFrame:
    """Per-user gap sessionization of one (batch) event frame.

    events: (user_id, ts_us). Returns one row per session:
    (user_id, start_us, end_us, n_events). Boundary rule: a new
    session starts when the gap to the previous event exceeds
    gap_us. Tie timestamps are order-independent (gap 0 never
    splits), so the result is deterministic without a tiebreaker.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us")
    flagged = events.select("user_id", "ts_us").withColumn(
        "_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us),
            1,
        ).otherwise(0),
    )
    sid = F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("_sid", sid)
        .groupBy("user_id", "_sid")
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(*SESSION_COLS)
    )


def merge_adjacent_sessions(sessions: DataFrame, *, gap_us: int) -> DataFrame:
    """Coalesce session rows whose gap start-to-previous-end is within
    gap_us — the state-merge pass. Input/output shape = SESSION_COLS.

    Used on (open state sessions UNION new batch sessions) per user:
    within-batch sessions are already gap-separated, so at most the
    state row fuses with the batch's first session, but the pass is
    written generically (it would also fix up multi-source unions).
    """
    w = Window.partitionBy("user_id").orderBy("start_us", "end_us")
    flagged = sessions.withColumn(
        "_new",
        F.when(
            F.lag("end_us").over(w).isNull()
            | (F.col("start_us") - F.lag("end_us").over(w) > gap_us),
            1,
        ).otherwise(0),
    )
    gid = F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("_gid", gid)
        .groupBy("user_id", "_gid")
        .agg(
            F.min("start_us").alias("start_us"),
            F.max("end_us").alias("end_us"),
            F.sum("n_events").alias("n_events"),
        )
        .select(*SESSION_COLS)
    )


def _state_versions(spark: SparkSession, state_root: str) -> list[int]:
    return sorted(
        int(d[1:])
        for d in fs.listdir(spark, state_root)
        if d.startswith("v") and d[1:].isdigit()
    )


def read_open_state(
    spark: SparkSession, state_root: str, *, before_epoch: int | None = None
) -> DataFrame:
    """Open-session state (empty frame before the first write).

    Versions are EPOCH-KEYED (v<epoch_id>), which is what makes the
    processor idempotent under foreachBatch retries: a redelivered
    epoch N reads the newest version STRICTLY BELOW N (its true
    pre-state — any v<N> left by the failed attempt is ignored and
    overwritten), recomputes the identical merge, and re-commits.
    Without the epoch key, re-merging batch N into state that already
    contains it would double-count n_events. Final readers pass no
    bound and get the newest complete version.
    """
    return _read_versioned(
        spark, state_root, _SESSION_SCHEMA, before_epoch=before_epoch
    )


def _read_versioned(
    spark: SparkSession,
    root: str,
    schema: str,
    *,
    before_epoch: int | None = None,
) -> DataFrame:
    """Newest epoch-keyed version under `root` (same idempotency
    semantics as read_open_state); empty frame with `schema` before
    the first write."""
    versions = _state_versions(spark, root)
    if before_epoch is not None:
        versions = [v for v in versions if v < before_epoch]
    if not versions:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(f"{root}/v{versions[-1]}")


def make_sessionize_processor(
    spark: SparkSession,
    *,
    state_root: str,
    closed_path: str,
    gap_us: int,
):
    """Per-micro-batch body: sessionize the batch, merge with open
    state, append closed sessions, rewrite open state."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        epoch = int(epoch_id)
        batch_sessions = sessionize_batch(batch_df, gap_us=gap_us)
        # pre-state = newest version strictly below this epoch, so a
        # RETRIED epoch recomputes from its true inputs (idempotence;
        # see read_open_state)
        state = read_open_state(spark, state_root, before_epoch=epoch)
        users = batch_df.select("user_id").distinct()
        touched = state.join(users, "user_id", "left_semi")
        untouched = state.join(users, "user_id", "left_anti")

        merged = merge_adjacent_sessions(
            touched.unionByName(batch_sessions), gap_us=gap_us
        ).persist()
        try:
            # the LAST session per touched user stays open (later
            # batches may extend it); everything earlier closes now
            w = Window.partitionBy("user_id").orderBy(F.desc("start_us"))
            with_pos = merged.withColumn("_pos", F.row_number().over(w))
            closed = with_pos.where(F.col("_pos") > 1).select(*SESSION_COLS)
            still_open = with_pos.where(F.col("_pos") == 1).select(*SESSION_COLS)

            # per-epoch OVERWRITE (not append) + epoch-keyed state
            # version: both sinks are deterministic functions of the
            # epoch, so redelivery rewrites the same bytes instead of
            # duplicating rows — effectively-exactly-once on top of
            # the file source's at-least-once replay
            closed.write.mode("overwrite").parquet(
                f"{closed_path}/epoch={epoch}"
            )
            still_open.unionByName(untouched).write.mode("overwrite").parquet(
                f"{state_root}/v{epoch}"
            )
            # keep v(epoch-1) until the NEXT epoch commits (a retry of
            # this epoch still needs it); drop everything older
            for v in _state_versions(spark, state_root):
                if v < epoch - 1:
                    fs.delete(spark, f"{state_root}/v{v}")
        finally:
            merged.unpersist()

    return process


def run_streaming_sessionizer(
    spark: SparkSession,
    *,
    data_root: str,
    schema,
    state_root: str,
    closed_path: str,
    checkpoint: str,
    gap_us: int,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """File source -> foreachBatch(stateful sessionizer).

    maxFilesPerTrigger=1 makes each input file its own micro-batch
    (the gate writes time-sliced files, so the replay exercises the
    cross-batch state path for real). Returns the StreamingQuery.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(data_root)
    )
    writer = stream.writeStream.foreachBatch(
        make_sessionize_processor(
            spark,
            state_root=state_root,
            closed_path=closed_path,
            gap_us=gap_us,
        )
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def final_sessions(
    spark: SparkSession, *, state_root: str, closed_path: str
) -> DataFrame:
    """Closed sessions + end-of-stream flush of still-open state."""
    try:
        # epoch=N partition dirs surface as an `epoch` column; the
        # session identity is SESSION_COLS, so project it away
        closed = spark.read.parquet(closed_path).select(*SESSION_COLS)
    except Exception:  # no session ever closed
        closed = spark.createDataFrame([], _SESSION_SCHEMA)
    return closed.unionByName(read_open_state(spark, state_root))


def _keep_latest_versions(
    spark: SparkSession, root: str, *, current_epoch: int
) -> None:
    """Drop every state version except the current epoch's write and
    the newest one strictly below it (a retry of the NEXT epoch still
    reads that one). Pure housekeeping — readers always take the
    newest eligible version, so deleting lazily would also be correct.

    Unlike the `v < epoch - 1` arithmetic this is robust to epochs
    that wrote nothing (an empty micro-batch leaves no version, so
    "epoch - 1" may not exist while an older version is still the
    live pre-state)."""
    versions = _state_versions(spark, root)
    prev = [v for v in versions if v < current_epoch]
    keep = {current_epoch} | set(prev[-1:])
    for v in versions:
        if v not in keep:
            fs.delete(spark, f"{root}/v{v}")


def make_disorder_sessionize_processor(
    spark: SparkSession,
    *,
    state_root: str,
    buffer_root: str,
    closed_path: str,
    gap_us: int,
    disorder_us: int,
):
    """Bounded-disorder per-micro-batch body (see module docstring
    for the contract and the watermark argument).

    Per batch: (buffered ∪ batch) events split at the watermark
    wm = max_seen - disorder_us; the mature side (ts <= wm) is
    sessionized and merged into open-session state exactly like the
    ordered processor; the immature side becomes the next buffer
    version. max_seen never needs its own state table: the maximum
    event is by definition younger than wm, so it is always sitting
    in the buffer.

    Closure rule: a session closes once end_us < wm - gap_us (no
    admissible future event can be within gap of it); everything
    else stays open — watermark-driven, unlike the ordered
    processor's last-session-per-user rule.

    Idempotence: all three sinks (closed epoch dir, state version,
    buffer version) are deterministic functions of the epoch's true
    pre-state, which a retried epoch re-reads via before_epoch —
    same discipline as make_sessionize_processor."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        epoch = int(epoch_id)
        buf = _read_versioned(
            spark, buffer_root, _EVENT_SCHEMA, before_epoch=epoch
        )
        all_ev = (
            batch_df.select("user_id", "ts_us").unionByName(buf).persist()
        )
        try:
            (mx,) = all_ev.agg(F.max("ts_us")).first()
            if mx is None:  # empty batch AND empty buffer: no-op epoch
                return
            wm = int(mx) - disorder_us
            mature = all_ev.where(F.col("ts_us") <= wm)
            immature = all_ev.where(F.col("ts_us") > wm)

            state = read_open_state(spark, state_root, before_epoch=epoch)
            users = mature.select("user_id").distinct()
            touched = state.join(users, "user_id", "left_semi")
            untouched = state.join(users, "user_id", "left_anti")
            merged = merge_adjacent_sessions(
                touched.unionByName(
                    sessionize_batch(mature, gap_us=gap_us)
                ),
                gap_us=gap_us,
            ).persist()
            try:
                closed = merged.where(F.col("end_us") < wm - gap_us)
                still_open = merged.where(F.col("end_us") >= wm - gap_us)
                closed.select(*SESSION_COLS).write.mode("overwrite").parquet(
                    f"{closed_path}/epoch={epoch}"
                )
                still_open.select(*SESSION_COLS).unionByName(
                    untouched
                ).write.mode("overwrite").parquet(f"{state_root}/v{epoch}")
                immature.write.mode("overwrite").parquet(
                    f"{buffer_root}/v{epoch}"
                )
                _keep_latest_versions(spark, state_root, current_epoch=epoch)
                _keep_latest_versions(spark, buffer_root, current_epoch=epoch)
            finally:
                merged.unpersist()
        finally:
            all_ev.unpersist()

    return process


def run_disorder_sessionizer(
    spark: SparkSession,
    *,
    data_root: str,
    schema,
    state_root: str,
    buffer_root: str,
    closed_path: str,
    checkpoint: str,
    gap_us: int,
    disorder_us: int,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """File source -> foreachBatch(bounded-disorder sessionizer).
    Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(data_root)
    )
    writer = stream.writeStream.foreachBatch(
        make_disorder_sessionize_processor(
            spark,
            state_root=state_root,
            buffer_root=buffer_root,
            closed_path=closed_path,
            gap_us=gap_us,
            disorder_us=disorder_us,
        )
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def final_sessions_disorder(
    spark: SparkSession,
    *,
    state_root: str,
    buffer_root: str,
    closed_path: str,
    gap_us: int,
) -> DataFrame:
    """End-of-stream flush for the disorder variant: the remaining
    buffer (everything still above the last watermark) sessionizes,
    merges with the open-session state, and closes alongside the
    already-closed epochs."""
    buf = _read_versioned(spark, buffer_root, _EVENT_SCHEMA)
    opens = read_open_state(spark, state_root)
    tail = merge_adjacent_sessions(
        opens.unionByName(sessionize_batch(buf, gap_us=gap_us)),
        gap_us=gap_us,
    )
    try:
        closed = spark.read.parquet(closed_path).select(*SESSION_COLS)
    except Exception:  # no session ever closed mid-stream
        closed = spark.createDataFrame([], _SESSION_SCHEMA)
    return closed.unionByName(tail.select(*SESSION_COLS))
