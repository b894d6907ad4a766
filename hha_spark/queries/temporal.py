"""Driver-gate queries for the temporal join operators (as-of join,
bounded range join) over the events table."""

from __future__ import annotations

from pyspark.sql import functions as F

from hha_spark.operators.temporal import asof_join, range_join_pairs
from hha_spark.sources.tables import events_ts_us, load_table


def _events_us(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        events_ts_us(ev).alias("ts_us"),
        "event_id",
        "user_id",
        "event_type",
        "value",
    )


def events_asof_last_purchase(spark, sf_dir):
    """For every click, the value of the user's most recent purchase
    at or before the click time (NULL if none yet) — the as-of join."""
    ev = _events_us(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts_us"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts_us").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("last_purchase_value"),
    )
    return asof_join(
        clicks,
        purchases.withColumnRenamed("p_event_id", "event_id_r"),
        by=["user_id"],
        left_ts="ts_us",
        right_ts="p_ts",
        value_cols=["last_purchase_value"],
        tie_col="event_id_r",
    ).select("user_id", "event_id", "ts_us", "last_purchase_value")


ORACLE_ASOF = """
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
      FROM events),
    u AS (
      SELECT user_id, ts_us, event_id, 1 AS src,
             CAST(NULL AS DOUBLE) AS pval, CAST(NULL AS BIGINT) AS rtie
      FROM ev WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts_us, NULL, 0, value, event_id
      FROM ev WHERE event_type = 'purchase'),
    c AS (
      SELECT user_id, ts_us, event_id, src,
             last_value(pval IGNORE NULLS) OVER (
                 PARTITION BY user_id
                 ORDER BY ts_us, src, rtie NULLS LAST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_purchase_value
      FROM u)
    SELECT user_id, event_id, ts_us, last_purchase_value
    FROM c WHERE src = 1
"""

RANGE_WINDOW_US = 30 * 60 * 1_000_000


def events_pairs_within_30min(spark, sf_dir):
    """Per-user count of ordered event pairs within 30 minutes — the
    bucketized range self-join (count output keeps rows bounded)."""
    ev = _events_us(spark, sf_dir)
    pairs = range_join_pairs(
        ev, by=["user_id"], ts_col="ts_us", window=RANGE_WINDOW_US,
        id_col="event_id",
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


ORACLE_RANGE = f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events)
    SELECT a.user_id, COUNT(*) AS n_pairs
    FROM ev a JOIN ev b
      ON a.user_id = b.user_id
     AND b.ts_us - a.ts_us <= {RANGE_WINDOW_US}
     AND (a.ts_us < b.ts_us
          OR (a.ts_us = b.ts_us AND a.event_id < b.event_id))
    GROUP BY a.user_id
"""


DAY_US = 86_400_000_000


def events_resample_daily(spark, sf_dir):
    """Daily purchase-value series per user, gap-filled: downsample to
    the last purchase of each day (deterministic tie-break), densify
    the user's day span into a complete grid, forward-fill quiet days.
    Day arithmetic is integer days-since-epoch (timezone-free in both
    engines); the calendar string is rendered only at the edge."""
    from hha_spark.operators.temporal import resample_ffill

    ev = _events_us(spark, sf_dir).where(F.col("event_type") == "purchase")
    out = resample_ffill(
        ev, key="user_id", ts_col="ts_us", value_col="value",
        tie_col="event_id", bucket_us=DAY_US,
    )
    return out.select(
        "user_id",
        "bucket_idx",
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("bucket_idx").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        "value_filled",
        "is_observed",
    )


ORACLE_RESAMPLE = """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
      FROM events WHERE event_type = 'purchase'),
    b AS (
      SELECT user_id, ts_us // 86400000000 AS bucket_idx, value,
             row_number() OVER (PARTITION BY user_id, ts_us // 86400000000
                                ORDER BY ts_us DESC, event_id DESC) AS rn
      FROM ev),
    obs AS (SELECT user_id, bucket_idx, value FROM b WHERE rn = 1),
    span AS (SELECT user_id, MIN(bucket_idx) AS lo, MAX(bucket_idx) AS hi
             FROM obs GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS bucket_idx
             FROM span),
    j AS (SELECT g.user_id, g.bucket_idx, o.value,
                 o.value IS NOT NULL AS is_observed
          FROM grid g LEFT JOIN obs o USING (user_id, bucket_idx))
    SELECT user_id, CAST(bucket_idx AS BIGINT) AS bucket_idx,
           strftime(DATE '1970-01-01' + CAST(bucket_idx AS INT), '%Y-%m-%d')
               AS day,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
           is_observed
    FROM j
"""


def events_funnel(spark, sf_dir):
    """Ordered three-stage funnel (view -> click -> purchase): how
    many users reached each stage with STRICTLY increasing timestamps
    — a click only counts after the user's first view, a purchase
    only after that click.

    Sequential dependency = three chained min-aggregations, each
    shuffling on user_id; the per-stage user frames are tiny relative
    to events (one row per user), so each joins back broadcast.
    Co-partitioned on the same key throughout, so AQE chains the
    stages without re-exchanging events. The final three 1-row counts
    cross-join for a single output row — no collect.
    """
    ev = _events_us(spark, sf_dir).select("user_id", "ts_us", "event_type")
    t1 = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts_us").alias("t1")
    )
    t2 = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(t1), on="user_id")
        .where(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(t2), on="user_id")
        .where(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    return (
        t1.agg(F.count(F.lit(1)).alias("reached_view"))
        .join(t2.agg(F.count(F.lit(1)).alias("reached_click")))
        .join(t3.agg(F.count(F.lit(1)).alias("reached_purchase")))
    )


ORACLE_FUNNEL = """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
    t1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (SELECT e.user_id, MIN(ts_us) AS t2 FROM ev e
           JOIN t1 USING (user_id)
           WHERE event_type = 'click' AND ts_us > t1 GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, MIN(ts_us) AS t3 FROM ev e
           JOIN t2 USING (user_id)
           WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY e.user_id)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS reached_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS reached_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM t3) AS reached_purchase
"""


def scd2_user_event_history(spark, sf_dir):
    """Type-2 slowly-changing-dimension build from an event log: per
    user, one row per event_type CHANGE, with [valid_from, valid_to)
    microsecond bounds (valid_to NULL on the open current row) and a
    version counter — the standard CDC-to-dimension compaction.

    Two window passes over the same (user_id; ts, id) sort order —
    lag() to detect changes, then lead() over the surviving change
    rows — so the engine sorts each user's slice once and reuses it;
    nothing here is a global window. Ties break on event_id, making
    the labelling deterministic in both engines.
    """
    ev = _events_us(spark, sf_dir).select(
        "user_id", "ts_us", "event_id", "event_type"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(w)).where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    wc = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(wc).alias("valid_to_us"),
        F.row_number().over(wc).cast("long").alias("version"),
    )


ORACLE_SCD2 = """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
      FROM events),
    flagged AS (
      SELECT user_id, ts_us, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id) AS prev_type
      FROM ev),
    changes AS (
      SELECT user_id, ts_us, event_id, event_type FROM flagged
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, event_type, ts_us AS valid_from_us,
           lead(ts_us) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id) AS valid_to_us,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id) AS BIGINT)
               AS version
    FROM changes
"""


HLL_EPS = 0.15  # ~9x the 1.6% rsd of the default lgConfigK=12 sketch

DAY_DIV = 86_400_000_000  # microseconds per day


def hll_daily_users_merge(spark, sf_dir):
    """Re-aggregatable distinct counts: one Datasketches HLL sketch of
    user_ids PER DAY, union-merged into a total estimate — the
    pattern that makes distinct-count dashboards feasible at 100 TB
    (persist small per-partition sketches; merging is cheap and
    exact-on-registers, unlike re-scanning raw data; COUNT(DISTINCT)
    cannot merge). Sketch bytes are engine-specific, so the gated
    output is the exact count plus a within-epsilon boolean on the
    merged estimate, same contract as approx_stats.
    """
    ev = _events_us(spark, sf_dir).select(
        (F.col("ts_us") / DAY_DIV).cast("long").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
    )
    exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    return merged.join(exact).select(
        "n_days",
        "exact_users",
        (
            F.abs(F.col("_est") - F.col("exact_users"))
            <= F.lit(HLL_EPS) * F.col("exact_users")
        ).alias("union_within_eps"),
    )


ORACLE_HLL = """
    WITH ev AS (
      SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events)
    SELECT (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) FROM ev) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS union_within_eps
    FROM ev
"""


def events_hourly_to_daily(spark, sf_dir):
    """Partial-reaggregation proof: per-(day, hour) sums/counts first,
    then merged to daily totals — and the oracle aggregates the raw
    rows directly, so the gate certifies that the two-level rollup is
    LOSSLESS. This is the contract behind every incremental pipeline
    (hourly materializations merged into daily marts) and it holds
    here only because the partials are exact decimals; float partials
    would drift under re-ordering.
    """
    ev = _events_us(spark, sf_dir).select(
        (F.col("ts_us") / DAY_DIV).cast("long").alias("day"),
        (F.col("ts_us") % DAY_DIV / 3_600_000_000).cast("long").alias("hour"),
        "value",
    )
    hourly = ev.groupBy("day", "hour").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("SUM(CAST(value AS DECIMAL(18,6)))").alias("s_dec"),
    )
    return (
        hourly.groupBy("day")
        .agg(
            F.sum("n").alias("n_events"),
            F.expr("CAST(SUM(s_dec) AS DOUBLE)").alias("sum_value"),
        )
        .select("day", F.col("n_events").cast("long").alias("n_events"), "sum_value")
    )


ORACLE_HOURLY_DAILY = """
    SELECT epoch_us(ts) // 86400000000 AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY day
"""


def events_sliding_7day(spark, sf_dir):
    """Per-user trailing-7-day purchase total for every active day — a
    time-RANGE window frame (RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
    over integer day), the rolling-metric shape every activity
    dashboard needs. Frames are keyed per user, so no global window;
    one shuffle on user_id, and the frame aggregate is an exact
    decimal SUM cast once at the edge (float frame-sums would drift
    with evaluation order).
    """
    from pyspark.sql import Window

    ev = _events_us(spark, sf_dir).where(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        "user_id", (F.col("ts_us") / DAY_DIV).cast("long").alias("day")
    ).agg(F.expr("SUM(CAST(value AS DECIMAL(18,6)))").alias("day_dec"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        F.expr("CAST(day_dec AS DOUBLE)").alias("day_value"),
        F.sum("day_dec").over(w).cast("double").alias("trailing_7d"),
    )


ORACLE_SLIDING = """
    WITH daily AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS day_dec
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, day)
    SELECT user_id, day,
           CAST(day_dec AS DOUBLE) AS day_value,
           CAST(SUM(day_dec) OVER (
             PARTITION BY user_id ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS trailing_7d
    FROM daily
"""

WEEK_DIV = 7 * DAY_DIV


def user_retention_cohorts(spark, sf_dir):
    """Weekly retention triangle: users grouped by first-seen week
    (cohort), counted distinct per weeks-since-cohort offset. Two
    aggregations — first-seen per user (shuffle on user_id), then the
    cohort matrix (shuffle on the tiny (cohort, offset) key) with the
    per-user cohort broadcast back onto the event stream. The classic
    growth-analytics query, all JVM expressions.
    """
    ev = _events_us(spark, sf_dir).select(
        "user_id", (F.col("ts_us") / WEEK_DIV).cast("long").alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(F.broadcast(first), on="user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


ORACLE_RETENTION = """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
    first AS (
      SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id)
    SELECT cohort_week, week - cohort_week AS week_offset,
           CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users
    FROM ev JOIN first USING (user_id)
    GROUP BY cohort_week, week_offset
"""


def weekly_revenue_growth(spark, sf_dir):
    """Week-over-week purchase revenue with lag() percent change — the
    default BI trend query. One aggregation shuffles events down to
    |weeks| rows; the lag window then orders that tiny frame (a global
    window over WEEKS is fine — the frame is already aggregate-sized,
    never the fact table; contrast customer_balance_quartiles where
    the global window was the bug). Revenue is exact decimal; the
    growth ratio is one double division, NULLIF-guarded.
    """
    from pyspark.sql import Window

    ev = _events_us(spark, sf_dir).where(F.col("event_type") == "purchase")
    weekly = ev.groupBy(
        (F.col("ts_us") / WEEK_DIV).cast("long").alias("week")
    ).agg(F.expr("SUM(CAST(value AS DECIMAL(18,6)))").alias("rev_dec"))
    w = Window.orderBy("week")
    return weekly.select(
        "week",
        F.expr("CAST(rev_dec AS DOUBLE)").alias("revenue"),
        (
            F.lit(100.0)
            * (F.col("rev_dec") - F.lag("rev_dec").over(w)).cast("double")
            / F.nullif(F.lag("rev_dec").over(w).cast("double"), F.lit(0.0))
        ).alias("growth_pct"),
    )


ORACLE_WOW = """
    WITH weekly AS (
      SELECT epoch_us(ts) // 604800000000 AS week,
             SUM(CAST(value AS DECIMAL(18,6))) AS rev_dec
      FROM events WHERE event_type = 'purchase'
      GROUP BY week)
    SELECT week, CAST(rev_dec AS DOUBLE) AS revenue,
           100.0 * CAST(rev_dec - lag(rev_dec) OVER (ORDER BY week) AS DOUBLE)
             / NULLIF(CAST(lag(rev_dec) OVER (ORDER BY week) AS DOUBLE), 0.0)
               AS growth_pct
    FROM weekly
"""


def user_activity_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands idiom: distinct active days, then `day -
    row_number()` is constant within a consecutive run, so grouping on
    that anchor splits islands without any self-join. Two shuffles on
    user_id-rooted keys (distinct, then island aggregation); windows
    are per-user, never global.
    """
    from pyspark.sql import Window

    days = (
        _events_us(spark, sf_dir)
        .select("user_id", (F.col("ts_us") / DAY_DIV).cast("long").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "anchor", F.col("day") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len"), F.min("day").alias("start_day")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


ORACLE_STREAKS = """
    WITH days AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events),
    islands AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                 AS anchor
      FROM days),
    streaks AS (
      SELECT user_id, anchor, COUNT(*) AS len
      FROM islands GROUP BY user_id, anchor)
    SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
"""


DECAY_HORIZON_DAYS = 7   # contributions older than this are zero
DECAY_NUM, DECAY_DEN = 1, 2   # a = 0.5 per day, exact in binary
DECAY_Q = 1_000_000           # term quantization (micro-units)
US_PER_DAY_TEMPORAL = 86_400_000_000


def events_decayed_activity(spark, sf_dir):
    """Exponentially-decayed per-user activity signal — the
    feature-engineering staple (recency-weighted engagement) computed
    WITHOUT an ordered recursion: each source day SCATTERS its
    contribution floor(x·a^k·Q) to the next `horizon` days (one
    narrow sequence-explode), and one (user, day) aggregation sums
    the integer terms. No window recursion, no row-dependent pow
    inside a float SUM — every term is floor-quantized to an exact
    BIGINT before summing, so partial-aggregation order (and the
    DuckDB oracle) agree bit-for-bit. a = 1/2 and day offsets are
    exact doubles, so a^k is exact too.

    Scale shape: explode is a bounded ×horizon row expansion of the
    already-aggregated daily frame (|users|·|days| rows, not raw
    events); the only shuffles are the two keyed aggregations.
    """
    ev = _events_us(spark, sf_dir).where(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        "user_id",
        F.expr(f"ts_us DIV {US_PER_DAY_TEMPORAL}").alias("day_idx"),
    ).agg(F.expr("SUM(CAST(value AS DECIMAL(18,6)))").alias("x_dec"))
    scattered = daily.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(DECAY_HORIZON_DAYS - 1))
        ).alias("k"),
        F.col("day_idx"),
        F.col("x_dec"),
    ).select(
        "user_id",
        (F.col("day_idx") + F.col("k")).alias("day_idx"),
        F.floor(
            F.col("x_dec").cast("double")
            * F.pow(
                F.lit(DECAY_NUM / DECAY_DEN), F.col("k").cast("double")
            )
            * F.lit(DECAY_Q)
        ).cast("long").alias("term_q"),
    )
    return scattered.groupBy("user_id", "day_idx").agg(
        F.sum("term_q").alias("decayed_q")
    )


ORACLE_DECAYED = f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // {US_PER_DAY_TEMPORAL} AS day_idx,
             value
      FROM events WHERE event_type = 'purchase'),
    daily AS (
      SELECT user_id, day_idx,
             SUM(CAST(value AS DECIMAL(18,6))) AS x_dec
      FROM ev GROUP BY user_id, day_idx),
    scattered AS (
      SELECT user_id, day_idx + k.k AS day_idx,
             CAST(FLOOR(CAST(x_dec AS DOUBLE)
                        * POW({DECAY_NUM / DECAY_DEN}, k.k)
                        * {DECAY_Q}) AS BIGINT) AS term_q
      FROM daily, (SELECT unnest(range({DECAY_HORIZON_DAYS})) AS k) k)
    SELECT user_id, day_idx, CAST(SUM(term_q) AS BIGINT) AS decayed_q
    FROM scattered GROUP BY user_id, day_idx
"""


def events_salted_join(spark, sf_dir):
    """Skew-proof equi-join under the oracle gate: events joined to a
    tiny per-event_type dimension on a GENUINELY hot key — event_type
    has 5 distinct values, so every key holds ~20% of the fact table
    and a plain shuffled join would send each key's full volume to one
    reducer. operators/skew.py::salted_join spreads each key over 16
    salt buckets (big side salted per-row, dimension replicated
    per-bucket, join on key+salt), bounding per-reducer load at ~1/16
    of the hot key; the aggregate then combines the buckets. Result is
    row-identical to the plain join (each fact row meets its dimension
    row exactly once), which is exactly what the DuckDB oracle
    expresses as a plain join — the gate pins that equivalence.
    test_plans.py pins the salted shape itself (explode + key,salt
    join) so this can't silently regress to a plain join.
    """
    from hha_spark.operators.skew import salted_join
    from hha_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor("value").cast("long").alias("val")
    )
    dim = (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .select(
            "event_type", F.length("event_type").cast("long").alias("weight")
        )
    )
    joined = salted_join(ev, dim, on=("event_type",), salt_buckets=16)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val") * F.col("weight")).cast("long").alias("weighted_total"),
    )


ORACLE_SALTED_JOIN = """
    WITH ev AS (
      SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS val FROM events),
    dim AS (
      SELECT event_type, CAST(length(event_type) AS BIGINT) AS weight
      FROM (SELECT DISTINCT event_type FROM events))
    SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(e.val * d.weight) AS BIGINT) AS weighted_total
    FROM ev e JOIN dim d USING (event_type)
    GROUP BY e.event_type
"""


QUERIES = {
    "events_asof_last_purchase": events_asof_last_purchase,
    "events_salted_join": events_salted_join,
    "events_decayed_activity": events_decayed_activity,
    "events_pairs_within_30min": events_pairs_within_30min,
    "events_resample_daily": events_resample_daily,
    "events_funnel": events_funnel,
    "scd2_user_event_history": scd2_user_event_history,
    "hll_daily_users_merge": hll_daily_users_merge,
    "events_hourly_to_daily": events_hourly_to_daily,
    "events_sliding_7day": events_sliding_7day,
    "user_retention_cohorts": user_retention_cohorts,
    "weekly_revenue_growth": weekly_revenue_growth,
    "user_activity_streaks": user_activity_streaks,
}

ORACLES = {
    "events_asof_last_purchase": ORACLE_ASOF,
    "events_salted_join": ORACLE_SALTED_JOIN,
    "events_decayed_activity": ORACLE_DECAYED,
    "events_pairs_within_30min": ORACLE_RANGE,
    "events_resample_daily": ORACLE_RESAMPLE,
    "events_funnel": ORACLE_FUNNEL,
    "scd2_user_event_history": ORACLE_SCD2,
    "hll_daily_users_merge": ORACLE_HLL,
    "events_hourly_to_daily": ORACLE_HOURLY_DAILY,
    "events_sliding_7day": ORACLE_SLIDING,
    "user_retention_cohorts": ORACLE_RETENTION,
    "weekly_revenue_growth": ORACLE_WOW,
    "user_activity_streaks": ORACLE_STREAKS,
}
