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
ending at e iff ts' - e <= gap_us. Watermark TIES may mature here
(ts <= wm), unlike the disorder attribution join
(streaming/joins.py), which must buffer them: an admissible
same-timestamp arrival (ts' == wm) still finds every session it can
touch OPEN — such a session has end >= wm > wm - gap_us, so the
strict closure bound keeps it — whereas a purchase finalizes
irreversibly at maturity. The closure bound is boundary-exact the
other way too: end == wm - gap_us stays open because a future
arrival at exactly ts' == wm extends it (ts' - end == gap_us).
State grows by the event buffer:
O(active users) open sessions + O(disorder window x event rate)
buffered events — the exact cost Spark's own watermarking pays.
Streamed result equals batch sessionization row-for-row, pinned by
the stream_sessionize_disorder driver gate replaying time-sliced
files with boundary events delivered one file late.

Scale: per batch, ONE shuffle keyed by user_id — open state and new
events gap-merge together in a single window pass (events ride as
degenerate intervals, see _as_intervals; untouched users' sessions
pass through the window unchanged) — and ONE kind-partitioned write
carrying this epoch's closed sessions, the open state, and (disorder
variant) the event buffer. State volume is O(active users), never
O(events); the open-state rewrite is a full copy of a bounded table
(at 100 TB: a bucketed table so the merge co-locates without a
shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hha_spark.functions.local import sql_over_views
from hha_spark.sources import fs

SESSION_COLS = ("user_id", "start_us", "end_us", "n_events")
_SESSION_SCHEMA = "user_id long, start_us long, end_us long, n_events long"


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
    gap_us — the general-case interval merge. Input/output shape =
    SESSION_COLS.

    Since the round-8 store rewrite this is the REFERENCE
    implementation: the production processors and flushes all use
    _merge_intervals_nonested (one window pass, valid only under the
    no-nesting precondition their contracts guarantee), and this
    groupBy-based general form — correct for ANY interval set,
    nesting included — is what the specialized variant is
    differentially tested against
    (tests/test_sessionize_stream.py::
    test_nonested_merge_matches_general_merge).
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


def _merge_intervals_nonested(
    intervals: DataFrame, *, gap_us: int
) -> DataFrame:
    """merge_adjacent_sessions specialized to inputs with NO NESTED
    intervals (sorted by start within a user, ends monotone — the
    disorder processor's regime: every admissible new event's ts >=
    the previous watermark >= every open session's end, see
    _as_intervals).

    Same gap-chain grouping, but instead of a groupBy(user, chain)
    aggregation — whose (user_id, _gid) grouping key Spark cannot
    prove co-located with the window's hash(user_id) partitioning, so
    it pays a second exchange — this emits the CLOSING row of each
    chain directly from the window pass, carrying the chain's start
    and event count as running-window expressions. One exchange per
    merge instead of two; all window specs share one partitioning and
    sort. Monotonicity arguments: starts are the sort key; _rs is a
    running sum, so both max(when(_new=1, ...)) carries pick the
    CURRENT chain's opening row; the closing row's end_us is the
    chain max because ends are monotone (no nesting).
    """
    w = Window.partitionBy("user_id").orderBy("start_us", "end_us")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    x = (
        intervals.withColumn(
            "_new",
            F.when(
                F.lag("end_us").over(w).isNull()
                | (F.col("start_us") - F.lag("end_us").over(w) > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn("_rs", F.sum("n_events").over(run))
        .withColumn(
            "_gstart",
            F.max(F.when(F.col("_new") == 1, F.col("start_us"))).over(run),
        )
        .withColumn(
            "_gbase",
            F.max(
                F.when(F.col("_new") == 1, F.col("_rs") - F.col("n_events"))
            ).over(run),
        )
        .withColumn("_next_new", F.lead("_new").over(w))
    )
    return x.where(
        F.col("_next_new").isNull() | (F.col("_next_new") == 1)
    ).select(
        "user_id",
        F.col("_gstart").alias("start_us"),
        "end_us",
        (F.col("_rs") - F.col("_gbase")).alias("n_events"),
    )


# --- fused per-epoch SQL (round 12) ---------------------------------
# Each foreachBatch body used to build its epoch plan as ~15 chained
# DataFrame constructions; every construction is one py4j round-trip
# plus one eager JVM analysis pass over a growing tree, measured
# ~0.3-0.5 s per epoch of pure driver-side latency (the r11 census:
# gate wall ~3.9 s with only ~1.6 s inside Spark jobs). The chains
# below are now ONE spark.sql statement per epoch (guide §4.1 —
# control what crosses the Python/JVM boundary; here the PLAN was
# crossing it piecewise). The SQL is the literal transcription of the
# former Column chain: same expressions, same column order, same
# frame types — _merge_intervals_nonested stays as the kernel the
# statements embed (and tests differential-check against
# merge_adjacent_sessions).

# the _merge_intervals_nonested window chain as CTE layers over _iv
# (running-frame ROWS bounds are explicit: the ORDER BY carries ties
# — degenerate same-ts intervals — and SQL's default RANGE frame
# would group them)
_MERGE_CTES = """
  _x AS (
    SELECT user_id, start_us, end_us, n_events,
           CASE WHEN lag(end_us) OVER (PARTITION BY user_id
                                       ORDER BY start_us, end_us)
                     IS NULL
                 OR start_us - lag(end_us) OVER (PARTITION BY user_id
                                                 ORDER BY start_us,
                                                          end_us)
                    > {gap_us}
                THEN 1 ELSE 0 END AS _new
    FROM _iv),
  _y AS (
    SELECT user_id, start_us, end_us, n_events, _new,
           sum(n_events) OVER (PARTITION BY user_id
                               ORDER BY start_us, end_us
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS _rs
    FROM _x),
  _z AS (
    SELECT user_id, start_us, end_us, _rs,
           max(CASE WHEN _new = 1 THEN start_us END)
             OVER (PARTITION BY user_id ORDER BY start_us, end_us
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS _gstart,
           max(CASE WHEN _new = 1 THEN _rs - n_events END)
             OVER (PARTITION BY user_id ORDER BY start_us, end_us
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS _gbase,
           lead(_new) OVER (PARTITION BY user_id
                            ORDER BY start_us, end_us) AS _next_new
    FROM _y),
  _merged AS (
    SELECT user_id, _gstart AS start_us, end_us,
           _rs - _gbase AS n_events
    FROM _z WHERE _next_new IS NULL OR _next_new = 1)
"""

# ordered epoch: (open state ∪ batch-as-degenerate-intervals) merged,
# last session per user stays open — the make_sessionize_processor
# body in one statement
_ORDERED_EPOCH_SQL = (
    """
WITH _iv AS (
    SELECT user_id, start_us, end_us, n_events FROM {state}
    UNION ALL
    SELECT user_id, ts_us AS start_us, ts_us AS end_us,
           CAST(1 AS BIGINT) AS n_events
    FROM {batch}),
"""
    + _MERGE_CTES
    + """
SELECT user_id, start_us, end_us, n_events,
       CASE WHEN start_us = max(start_us)
                             OVER (PARTITION BY user_id)
            THEN 'open' ELSE 'closed' END AS kind
FROM _merged
"""
)

# disorder epoch: watermark split + merge + closure rule + buffer —
# the make_disorder_sessionize_processor body in one statement
_DISORDER_EPOCH_SQL = (
    """
WITH _iv AS (
    SELECT user_id, start_us, end_us, n_events
    FROM {store} WHERE kind = 'open'
    UNION ALL
    SELECT user_id, ts_us AS start_us, ts_us AS end_us,
           CAST(1 AS BIGINT) AS n_events
    FROM {ev} WHERE ts_us <= {wm}),
"""
    + _MERGE_CTES
    + """
SELECT user_id, start_us, end_us, n_events,
       CASE WHEN end_us < {wm} - {gap_us}
            THEN 'closed' ELSE 'open' END AS kind
FROM _merged
UNION ALL
SELECT user_id, ts_us AS start_us, ts_us AS end_us,
       CAST(1 AS BIGINT) AS n_events, 'buf' AS kind
FROM {ev} WHERE ts_us > {wm}
"""
)

# disorder end-of-stream flush tail: (open state ∪ buffer-as-
# degenerate-intervals) merged once — final_sessions_disorder's tail
_DISORDER_FLUSH_SQL = (
    """
WITH _iv AS (
    SELECT user_id, start_us, end_us, n_events
    FROM {store} WHERE kind = 'open'
    UNION ALL
    SELECT user_id, start_us, start_us AS end_us,
           CAST(1 AS BIGINT) AS n_events
    FROM {store} WHERE kind = 'buf'),
"""
    + _MERGE_CTES
    + """
SELECT user_id, start_us, end_us, n_events FROM _merged
"""
)


def _state_versions(spark: SparkSession, state_root: str) -> list[int]:
    return sorted(
        int(d[1:])
        for d in fs.listdir(spark, state_root)
        if d.startswith("v") and d[1:].isdigit()
    )


# schema DDL -> rendered typed-null projection, so repeated pre-first-
# write reads don't re-parse the (module-constant) schema per epoch
_EMPTY_SELECTS: dict[str, str] = {}


def _empty_frame(spark: SparkSession, schema: str) -> DataFrame:
    """Zero-row frame with `schema` as a pure-JVM LocalRelation
    (plans as `LocalTableScan <empty>`), replacing
    ``spark.createDataFrame([], schema)`` on the pre-first-write read
    paths. The createDataFrame route builds a defaultParallelism-
    partition PYTHON RDD: every job that scans it launches ~one
    zero-row Python worker task per core (measured ~0.5 s of pure
    worker wait per task, re-paid on every re-execution of the
    epoch-0 probe — 32-34-task stages with ~17 s of executor time
    and ~0.3 s of CPU), and, being opaque to Catalyst, it blocks
    PropagateEmptyRelation from pruning the empty prev-state
    branches out of the first epoch's plan. A LocalRelation costs
    zero tasks and folds away at optimize time. (Schema strings here
    are module constants, never user input.)"""
    sel = _EMPTY_SELECTS.get(schema)
    if sel is None:
        from pyspark.sql.types import StructType

        fields = StructType.fromDDL(schema).fields
        # invariant of the string-SQL rendering (ADVICE r11): a
        # backticked name would break the generated SELECT and a NOT
        # NULL field would silently come back nullable — all call
        # sites are module-constant schemas with neither feature
        for f in fields:
            if "`" in f.name or not f.nullable:
                raise ValueError(
                    "_empty_frame requires nullable, backtick-free "
                    f"fields; got {f.name!r} in {schema!r}"
                )
        sel = ", ".join(
            f"CAST(NULL AS {f.dataType.simpleString()}) AS `{f.name}`"
            for f in fields
        )
        _EMPTY_SELECTS[schema] = sel
    return spark.sql(f"SELECT {sel} WHERE false")


def read_open_state(
    spark: SparkSession, store_root: str, *, before_epoch: int | None = None
) -> DataFrame:
    """Open-session rows of the newest store version (empty frame
    before the first write).

    Versions are EPOCH-KEYED (v<epoch_id>), which is what makes the
    processor idempotent under foreachBatch retries: a redelivered
    epoch N reads the newest version STRICTLY BELOW N (its true
    pre-state — any v<N> left by the failed attempt is ignored and
    overwritten), recomputes the identical merge, and re-commits.
    Without the epoch key, re-merging batch N into state that already
    contains it would double-count n_events. Final readers pass no
    bound and get the newest complete version.
    """
    store = _read_versioned(
        spark, store_root, _STORE_SCHEMA, before_epoch=before_epoch
    )
    return store.where(F.col("kind") == _KIND_OPEN).select(*SESSION_COLS)


def _heal_staged_fold(spark: SparkSession, root: str) -> None:
    """Roll forward a compaction that crashed between staging
    completion and the directory swap, so EVERY store read — not just
    a restarting stream's startup recovery — sees the folded history.

    Without this, a consumer that goes straight to a final flush
    (final_curation_funnel / final_attributions /
    read_closed_sessions) after compact_store died between its
    delete and rename steps would silently read a store whose folded
    history exists only in _compact.staging (underscore dirs are
    invisible to _state_versions) — wrong results, no error.

    Only a COMPLETE staging (marker present) is acted on: marker
    presence proves the folded dirs' contents are fully merged in
    staging, so finishing the deletes+rename is idempotent and
    read-equivalent. Staging WITHOUT a marker is left alone — it is
    either junk from a crash mid-build (the next compact_store
    discards it; it is invisible to readers anyway) or a live
    maintenance writer mid-fold, which a reader must not race.
    Cost on the happy path: one fs.exists probe per read."""
    from hha_spark.streaming import store as _store  # lazy: store imports us

    marker = f"{root}/{_store._STAGING}/{_store._MARKER}"
    if fs.exists(spark, marker):
        _store.recover_compaction(spark, root)


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
    _heal_staged_fold(spark, root)
    versions = _state_versions(spark, root)
    if before_epoch is not None:
        versions = [v for v in versions if v < before_epoch]
    if not versions:
        return _empty_frame(spark, schema)
    # explicit schema (incl. the kind partition column, matched by
    # name) skips per-read footer inference — see read_kind_history
    return spark.read.schema(schema).parquet(f"{root}/v{versions[-1]}")


def make_sessionize_processor(
    spark: SparkSession,
    *,
    store_root: str,
    gap_us: int,
):
    """Per-micro-batch body (ordered contract): gap-merge the batch's
    events — as degenerate intervals — together with ALL open-session
    state in one _merge_intervals_nonested window pass (per-user
    ordering guarantees every new event >= its user's open-session
    end, so no nesting); the LAST session per user stays open (later
    batches may extend it), everything earlier closes now.

    Per-epoch actions: an isEmpty probe and ONE kind-partitioned
    write carrying both the closed sessions and the open state
    (kind=closed / kind=open) — the round-8 rewrite that replaced the
    original sessionize-then-merge double window, the semi/anti state
    split, and the two separate sink writes; the open/closed split
    rides the same window exchange as the merge (an unbounded
    max(start_us) per user).

    Idempotence: the store version is a deterministic function of the
    epoch's true pre-state (the newest version strictly below this
    epoch, see read_open_state), so a redelivered epoch rewrites the
    same bytes instead of duplicating rows — effectively-exactly-once
    on top of the file source's at-least-once replay."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        epoch = int(epoch_id)
        if batch_df.isEmpty():
            return  # no events: state is exact, versions need not move
        # foreachBatch hands a frame bound to a per-batch CLONE of the
        # stream's session; the fused statement's frame substitution
        # registers temp views in each frame's OWN session, so every
        # frame — and the .sql call — must live on that clone
        session = batch_df.sparkSession
        state = read_open_state(session, store_root, before_epoch=epoch)
        # one fused statement = one analysis pass (see _MERGE_CTES
        # block comment); literal transcription of the former
        # merge-then-tag Column chain
        tagged = sql_over_views(
            session,
            _ORDERED_EPOCH_SQL,
            frames={
                "state": state,
                "batch": batch_df.select("user_id", "ts_us"),
            },
            gap_us=gap_us,
        )
        # non-empty by construction: a non-empty batch leaves every
        # active user exactly one kind=open row.
        # partitionOverwriteMode pinned static: retry idempotence
        # needs the whole v{epoch} dir truncated, not just the
        # partitions the retry happens to produce (a session
        # configured dynamic would keep a failed attempt's stale
        # kind= dirs when the retry's partition set differs).
        tagged.write.option(
            "partitionOverwriteMode", "static"
        ).partitionBy("kind").mode("overwrite").parquet(
            f"{store_root}/v{epoch}"
        )
        _prune_store_versions(session, store_root, current_epoch=epoch)

    return process


def run_streaming_sessionizer(
    spark: SparkSession,
    *,
    data_root: str,
    schema,
    store_root: str,
    checkpoint: str,
    gap_us: int,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """File source -> foreachBatch(stateful sessionizer).

    maxFilesPerTrigger=1 makes each input file its own micro-batch
    (the gate writes time-sliced files, so the replay exercises the
    cross-batch state path for real). Returns the StreamingQuery.
    Heals any crashed store compaction first (streaming/store.py:
    recovery must precede the first store read after a restart).
    """
    from hha_spark.streaming.store import recover_compaction

    recover_compaction(spark, store_root)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(data_root)
    )
    writer = stream.writeStream.foreachBatch(
        make_sessionize_processor(
            spark,
            store_root=store_root,
            gap_us=gap_us,
        )
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def final_sessions(
    spark: SparkSession, *, store_root: str
) -> DataFrame:
    """Closed sessions + end-of-stream flush of still-open state."""
    return read_closed_sessions(spark, store_root).unionByName(
        read_open_state(spark, store_root)
    )


# Unified per-epoch store (BOTH processors): ONE versioned,
# kind-partitioned table per epoch carries this epoch's closed
# sessions (kind=closed), the open-session state (kind=open), and —
# disorder variant only — the immature event buffer (kind=buf, events
# as degenerate one-event intervals). One write job per epoch instead
# of the original two/three (closed append + state rewrite [+ buffer
# rewrite]) — write-job fixed cost was the gates' dominant term
# (r7 verdict "Next round" #3).
# Version pruning keeps each version's closed partition (append-only
# history the flush unions) and drops only stale open/buf partitions.
_STORE_SCHEMA = (
    "user_id long, start_us long, end_us long, n_events long, kind string"
)
_KIND_OPEN = "open"
_KIND_BUF = "buf"
_KIND_CLOSED = "closed"


def _split_store(store: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(open sessions, buffered events) from one unified store read."""
    opens = store.where(F.col("kind") == _KIND_OPEN).select(*SESSION_COLS)
    buf = store.where(F.col("kind") == _KIND_BUF).select(
        "user_id", F.col("start_us").alias("ts_us")
    )
    return opens, buf


def _as_intervals(events: DataFrame) -> DataFrame:
    """Events as degenerate one-event session intervals
    (start=end=ts, n_events=1). Gap-merging degenerate intervals IS
    sessionization, so merge_adjacent_sessions over
    (open state ∪ _as_intervals(mature)) replaces the two-pass
    sessionize_batch-then-merge — one window shuffle per epoch
    instead of two. (The fused epoch statements embed this projection
    literally — the `ts_us AS start_us, ts_us AS end_us, CAST(1 AS
    BIGINT)` branches of their _iv CTEs; this function remains the
    named definition of the argument and the tests' spelling.) Correct because no interval nesting can occur:
    every admissible new event's ts >= the previous watermark >= every
    open session's end (sessions only ever contain events at or below
    the watermark of their merge epoch), so sorted-by-start gap
    chaining with lag(end) sees monotone ends.
    """
    return events.select(
        "user_id",
        F.col("ts_us").alias("start_us"),
        F.col("ts_us").alias("end_us"),
        F.lit(1).cast("long").alias("n_events"),
    )


def read_kind_history(
    spark: SparkSession,
    store_root: str,
    kind: str,
    schema: str,
    cols: tuple[str, ...],
    *,
    before_epoch: int | None = None,
) -> DataFrame:
    """Union of one kind's partition across ALL store versions —
    the append-only-history read (pruning preserves these kinds).
    Shared by the sessionize stores (kind=closed), the disorder
    attribution store (kind=attr, streaming/joins.py), and the
    curation store (streaming/curation_stream.py). `before_epoch`
    bounds the read to versions strictly below an epoch — REQUIRED
    when a processor reads history mid-stream (retry idempotence: a
    redelivered epoch must not see its own failed attempt's rows);
    final readers pass no bound."""
    _heal_staged_fold(spark, store_root)
    versions = _state_versions(spark, store_root)
    if before_epoch is not None:
        versions = [v for v in versions if v < before_epoch]
    dirs = [
        d
        for d in (f"{store_root}/v{v}/kind={kind}" for v in versions)
        if fs.exists(spark, d)
    ]
    if not dirs:
        return _empty_frame(spark, schema)
    # explicit schema: every stub of a kind is written with one fixed
    # schema, so footer-sniffing schema inference across N version
    # dirs is pure latency (one footer read per dir per history read)
    return spark.read.schema(schema).parquet(*dirs).select(*cols)


def read_closed_sessions(spark: SparkSession, store_root: str) -> DataFrame:
    """Union of every epoch's closed partition (all store versions —
    pruning preserves kind=closed)."""
    return read_kind_history(
        spark, store_root, _KIND_CLOSED, _SESSION_SCHEMA, SESSION_COLS
    )


def _prune_store_versions(
    spark: SparkSession,
    store_root: str,
    *,
    current_epoch: int,
    prune_kinds: tuple[str, ...] = ("open", "buf"),
) -> None:
    """_keep_latest_versions, store flavor: stale versions lose only
    their carried-state partitions (`prune_kinds`); the remaining
    kinds are append-only history the final flush reads, so every
    version directory survives as a (possibly history-only) stub."""
    versions = _state_versions(spark, store_root)
    prev = [v for v in versions if v < current_epoch]
    keep = {current_epoch} | set(prev[-1:])
    for v in versions:
        if v not in keep:
            for kind in prune_kinds:
                fs.delete(spark, f"{store_root}/v{v}/kind={kind}")


def make_disorder_sessionize_processor(
    spark: SparkSession,
    *,
    store_root: str,
    gap_us: int,
    disorder_us: int,
):
    """Bounded-disorder per-micro-batch body (see module docstring
    for the contract and the watermark argument).

    Per batch: (buffered ∪ batch) events split at the watermark
    wm = max_seen - disorder_us; the mature side (ts <= wm) gap-merges
    as degenerate intervals together with ALL open-session state in a
    single merge_adjacent_sessions pass (see _as_intervals for why
    that equals sessionize-then-merge; untouched users' sessions pass
    through the window unchanged); the immature side becomes the
    buffer partition of the next store version. max_seen never needs
    its own state table: the maximum event is by definition younger
    than wm, so it is always sitting in the buffer.

    Closure rule: a session closes once end_us < wm - gap_us (no
    admissible future event can be within gap of it); everything
    else stays open — watermark-driven, unlike the ordered
    processor's last-session-per-user rule, and applied uniformly to
    every open session (a session whose user saw no new events still
    closes once the watermark passes it — same flushed result, less
    carried state).

    Per-epoch actions: ONE tiny max aggregate (which doubles as the
    empty-epoch probe and materializes the cached event union) and
    ONE write job — closed/open/buf leave in a single
    kind-partitioned write.

    Idempotence: the store version is a deterministic function of the
    epoch's true pre-state, which a retried epoch re-reads via
    before_epoch — same discipline as make_sessionize_processor, with
    the closed partition epoch-keyed inside the version directory.

    disorder_us must be > 0: at 0 the max event matures immediately,
    so max_seen tracking between epochs is lost (the buffer is the
    only carrier of max_seen) and the "kind=buf always exists"
    non-empty-write argument fails. Zero disorder is the ordered
    contract — use make_sessionize_processor. (The attribution join
    handles 0 via its strict maturity bound; this processor's bound
    is inclusive and does not.)
    """
    if disorder_us <= 0:
        raise ValueError(
            "disorder_us must be > 0; use make_sessionize_processor "
            "for ordered (zero-disorder) delivery"
        )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        epoch = int(epoch_id)
        # per-batch clone session: see make_sessionize_processor
        session = batch_df.sparkSession
        store = _read_versioned(
            session, store_root, _STORE_SCHEMA, before_epoch=epoch
        )
        _, buf = _split_store(store)
        all_ev = (
            batch_df.select("user_id", "ts_us").unionByName(buf).persist()
        )
        try:
            # one driver-side action doubles as the empty-epoch probe
            # AND materializes the persist the write job reuses; wm
            # then enters the write plan as a literal
            (mx,) = all_ev.agg(F.max("ts_us")).first()
            if mx is None:  # empty batch AND empty buffer: no-op epoch
                return
            wm = int(mx) - disorder_us
            # one fused statement = one analysis pass (see _MERGE_CTES
            # block comment); literal transcription of the former
            # split/merge/close/buffer Column chain
            unified = sql_over_views(
                session,
                _DISORDER_EPOCH_SQL,
                frames={"store": store, "ev": all_ev},
                wm=wm,
                gap_us=gap_us,
            )
            # non-empty by construction: the max event is always
            # immature (disorder_us > 0), so kind=buf always exists.
            # static overwrite pinned for retry idempotence (see
            # make_sessionize_processor's write).
            unified.write.option(
                "partitionOverwriteMode", "static"
            ).partitionBy("kind").mode("overwrite").parquet(
                f"{store_root}/v{epoch}"
            )
            _prune_store_versions(session, store_root, current_epoch=epoch)
        finally:
            all_ev.unpersist()

    return process


def run_disorder_sessionizer(
    spark: SparkSession,
    *,
    data_root: str,
    schema,
    store_root: str,
    checkpoint: str,
    gap_us: int,
    disorder_us: int,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """File source -> foreachBatch(bounded-disorder sessionizer).
    Returns the StreamingQuery. Heals any crashed store compaction
    first (streaming/store.py recovery contract)."""
    from hha_spark.streaming.store import recover_compaction

    recover_compaction(spark, store_root)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(data_root)
    )
    writer = stream.writeStream.foreachBatch(
        make_disorder_sessionize_processor(
            spark,
            store_root=store_root,
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
    store_root: str,
    gap_us: int,
) -> DataFrame:
    """End-of-stream flush for the disorder variant: the remaining
    buffer (everything still above the last watermark) gap-merges
    with the open-session state in one pass (see _as_intervals) and
    closes alongside the per-epoch closed partitions — one read of
    the unified store."""
    tail = sql_over_views(
        spark,
        _DISORDER_FLUSH_SQL,
        frames={"store": _read_versioned(spark, store_root, _STORE_SCHEMA)},
        gap_us=gap_us,
    )
    return read_closed_sessions(spark, store_root).unionByName(tail)
