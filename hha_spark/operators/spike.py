"""Two-window amplification-spike detection (the reference's core query).

Re-expresses reference hha.py:132-219 (`FiltrDataByInterval`) +
hha.py:223-244 (`attackAction`) as composable, key-generic DataFrame
transformations. Normative semantics S1-S8 are documented in
SURVEY.md §2.1; every quirk preserved here is cited.

Spark-first design decisions (vs the reference):
  * /24 derivation is a native bitmask expression (functions/ip.py),
    not a Python UDF (hha.py:20) — keeps whole-stage codegen intact.
  * cur/prev frames are persist()ed, replacing the RDD round-trip
    materialization hack (`recreateDF`, hha.py:119-128); each frame is
    consumed twice (the /32 join and the /24 rollup), so one shuffle's
    output is reused instead of recomputed.
  * joins use a column-name list (no alias dance, hha.py:150,165-176).
  * watchlist gating is a broadcast left-semi join BEFORE any collect,
    replacing the driver-side `in zones` loop (hha.py:233-242).
  * TTL alert dedup is a left-anti join against a persisted alerts
    table, replacing the in-memory GlobalRowList dict (hha.py:234-244).
  * division guards: ratio denominators are wrapped in nullif(x, 0) so
    the query behaves identically under ANSI and legacy modes (the
    reference relied on legacy int/0 -> NULL row-drop, SURVEY.md S6).

Scale notes (100 TB design): the aggregations are partial-aggregated
map-side by Catalyst before the shuffle; both joins are post-aggregate
(cardinality = distinct keys, not raw rows) and AQE picks broadcast
when the previous-window side is small. The /24 rollup consumes the
already-aggregated /32 frame (avg-of-avg, hha.py:160-168 semantics),
so raw data is scanned exactly twice (cur + prev windows) and shuffled
once per window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hha_spark.config import DetectorParams
from hha_spark.functions.ip import ip_to_net24

from hha_spark.caching import tracked_persist


def _safe_ratio(num: Column, den: Column) -> Column:
    """num/den with NULL (not error, not inf) on den == 0.

    Matches the reference's legacy-mode division semantics
    (SURVEY.md S6) while staying correct under ANSI mode.
    """
    return num / F.nullif(den, F.lit(0))


def window_averages(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    value_col: str,
    time_col: str = "timestamp",
    lower: int | None = None,
    upper: int | None = None,
    out_col: str = "sum_val",
    exact: bool = False,
) -> DataFrame:
    """S1 — per-key truncated average over a one-sided time window.

    Reference: filter at hha.py:141/148, aggregate at hha.py:143/149.
    `int(avg(x))` truncates toward zero (IntegerType cast) — preserved
    via floor on non-negative counters; `sum_val` is an AVERAGE
    despite its name (README.md:79).

    Both reference windows are one-sided (`endTime` computed but never
    applied, hha.py:321-323): pass only `lower` or only `upper` for
    parity; both for a bounded window.

    exact=True computes the average via exact decimal SUM / COUNT
    (functions/exact.py) so the floored value is identical across
    engines and partition orders — use for fractional value columns.
    """
    from hha_spark.functions.exact import trunc_avg_exact

    cond = F.lit(True)
    if lower is not None:
        cond = cond & (F.col(time_col) > F.lit(lower))
    if upper is not None:
        cond = cond & (F.col(time_col) < F.lit(upper))
    agg = (
        trunc_avg_exact(value_col, out=out_col)
        if exact
        else F.floor(F.avg(value_col)).cast("long").alias(out_col)
    )
    return df.where(cond).groupBy(*key_cols).agg(agg)


def rollup_averages(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    bucket_expr: Column,
    bucket_name: str,
    value_col: str = "sum_val",
) -> DataFrame:
    """S2 — re-average already-averaged per-key values into buckets.

    Reference hha.py:160-168: the /24 value is avg(per-/32 avg), NOT a
    recomputation from raw rows — an intentional quirk we preserve.
    `bucket_expr` generalizes the /24 network derivation.
    """
    return (
        df.withColumn(bucket_name, bucket_expr)
        .groupBy(*[c for c in group_cols], bucket_name)
        # floor(avg(int)) == integer floor division for the
        # non-negative counters handled here; DIV is exact at any
        # scale (no double rounding past 2^53)
        .agg(F.expr(f"CAST(SUM({value_col}) DIV COUNT(*) AS BIGINT)").alias(value_col))
    )


def fused_window_compare(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    value_col: str,
    time_col: str,
    cur_lower: Column | int,
    prev_upper: Column | int,
    q: float,
    limit_new: int,
    clamp_guard: bool,
) -> DataFrame:
    """Single-pass S1+S3+S4: both window averages from ONE conditional
    aggregation, compare on the same row.

    The two-frame formulation (window_averages ×2 + left join) mirrors
    the reference's two-file reads, but when both windows come from
    the same source the whole comparison collapses: per key, aggregate
    CASE-filtered sums/counts for each window in one shuffle, then
    derive cur/prev/clamp by projection. At scale this replaces
    2 scans + 2 shuffles + 1 join with 1 scan + 1 shuffle + 0 joins,
    with identical results (keys missing from the previous window
    surface as prev_n = 0 -> the S4 default, exactly like a left-join
    miss).

    Bounds may be Columns (e.g. data-derived `now` broadcast via a
    1-row cross join) or int literals. Averages use the exact decimal
    path (functions/exact.py semantics). Output: all keys seen in
    EITHER window, with
        sum_val       cur avg (NULL when the key has no current rows)
        prev_sum_val  raw prev avg (NULL when absent)
        prev_sum_val2 clamped/defaulted baseline (S3/S4)
    Callers filter `sum_val IS NOT NULL` for the alert path and reuse
    prev columns for rollups.
    """
    lo = cur_lower if isinstance(cur_lower, Column) else F.lit(cur_lower)
    hi = prev_upper if isinstance(prev_upper, Column) else F.lit(prev_upper)
    in_cur = F.col(time_col) > lo
    in_prev = F.col(time_col) < hi
    dec = F.col(value_col).cast("decimal(18,6)")
    agg = df.groupBy(*key_cols).agg(
        F.sum(F.when(in_cur, dec)).alias("_cur_sum"),
        F.sum(F.when(in_cur, 1).otherwise(0)).alias("_cur_n"),
        F.sum(F.when(in_prev, dec)).alias("_prev_sum"),
        F.sum(F.when(in_prev, 1).otherwise(0)).alias("_prev_n"),
    )
    cur_avg = F.when(
        F.col("_cur_n") > 0,
        F.floor(F.col("_cur_sum") / F.col("_cur_n")).cast("long"),
    )
    prev_avg = F.when(
        F.col("_prev_n") > 0,
        F.floor(F.col("_prev_sum") / F.col("_prev_n")).cast("long"),
    )
    with_avgs = agg.select(*key_cols, cur_avg.alias("sum_val"), prev_avg.alias("prev_sum_val"))
    clamp_cond = _safe_ratio(F.col("prev_sum_val"), F.col("sum_val")) > F.lit(q)
    if clamp_guard:
        clamp_cond = clamp_cond & (F.col("prev_sum_val") > F.lit(limit_new))
    return with_avgs.select(
        *key_cols,
        "sum_val",
        "prev_sum_val",
        F.when(
            F.col("sum_val").isNotNull(),
            F.coalesce(
                F.when(clamp_cond, F.lit(limit_new)).otherwise(F.col("prev_sum_val")),
                F.lit(limit_new),
            ),
        ).alias("prev_sum_val2"),
    ).where((F.col("sum_val").isNotNull()) | (F.col("prev_sum_val").isNotNull()))


def compare_windows(
    cur: DataFrame,
    prev: DataFrame,
    *,
    key_cols: Sequence[str],
    q: float,
    limit_new: int,
    clamp_guard: bool,
    value_col: str = "sum_val",
) -> DataFrame:
    """S3/S4/S5 — left-join current against previous, clamp drops,
    default new keys.

    Output columns: key_cols + [value_col, prev_sum_val, prev_sum_val2].

    * left join on the full key (hha.py:170,184).
    * drop-clamp: if prev/cur > q the baseline is clamped down to
      `limit_new` so recovery-to-normal still triggers. The /32 branch
      additionally requires prev > limit_new (hha.py:191-192); the /24
      branch does NOT (hha.py:177-178) — `clamp_guard` selects which.
    * new keys (join miss) get prev = prev2 = limit_new
      (na.fill, hha.py:179,194).
    """
    prev_renamed = prev.withColumnRenamed(value_col, "prev_sum_val")
    joined = cur.join(prev_renamed, on=list(key_cols), how="left")
    clamp_cond = _safe_ratio(F.col("prev_sum_val"), F.col(value_col)) > F.lit(q)
    if clamp_guard:
        clamp_cond = clamp_cond & (F.col("prev_sum_val") > F.lit(limit_new))
    return joined.select(
        *key_cols,
        F.col(value_col),
        F.coalesce(F.col("prev_sum_val"), F.lit(limit_new)).alias("prev_sum_val"),
        F.coalesce(
            F.when(clamp_cond, F.lit(limit_new)).otherwise(F.col("prev_sum_val")),
            F.lit(limit_new),
        ).alias("prev_sum_val2"),
    )


def spike_filter(
    compared: DataFrame,
    *,
    q: float,
    value_col: str = "sum_val",
) -> DataFrame:
    """S6 — keep rows whose cur/baseline ratio exceeds q.

    Reference hha.py:198,209. A zero baseline yields a NULL ratio and
    the row silently drops (legacy division semantics) — reproduced
    explicitly with nullif so ANSI mode agrees.
    """
    return compared.where(
        _safe_ratio(F.col(value_col), F.col("prev_sum_val2")) > F.lit(q)
    )


def detect_spikes(
    histograms: DataFrame,
    *,
    params: DetectorParams,
    now: int,
    zones: DataFrame | None = None,
    prior_alerts: DataFrame | None = None,
    persist: bool = True,
    fused: bool = True,
) -> DataFrame:
    """Full S1-S8 detection cycle over the histogram fact table.

    Returns alerts with columns
        (num_protocol, type_proto, sum_val, dst_ip, scope)
    where — preserving the reference's (surprising) output shape at
    hha.py:199,210 — `sum_val` carries the BASELINE (prev_sum_val2),
    not the current value, and `dst_ip` holds the /24 network base
    address for scope='net' rows (the reference smuggles it through
    the same positional slot, hha.py:213-214; we keep it LongType and
    add `scope` instead of mixing string/int in one column).

    zones: optional watchlist DataFrame(ip: long) — exact-match
    broadcast semi-join gating (hha.py:237: a /24 alert passes only if
    the network *base address* itself is watchlisted).
    prior_alerts: optional DataFrame with (num_protocol, type_proto,
    dst_ip, detected_at) — alerts already raised within
    `limit_detect_time_sec` are suppressed (hha.py:234-244).
    """
    p = params
    keys = ["num_protocol", "type_proto", "dst_ip"]
    net_keys = ["num_protocol", "type_proto", "dst_net"]

    if fused:
        # scale path: ONE scan + ONE shuffle produces both window
        # averages and the /32 comparison; the /24 rollups derive
        # from the same persisted frame (fused == two-frame proven by
        # tests/test_equivalence.py). floor(avg(int)) via the exact
        # decimal path is identical for integral counters and immune
        # to double-precision loss on huge partial sums.
        base = fused_window_compare(
            histograms, key_cols=keys, value_col="CountPkt",
            time_col="timestamp", cur_lower=now - p.cur_window_sec,
            prev_upper=now - p.prev_window_sec,
            q=p.quotient_amplification, limit_new=p.limit_new_data,
            clamp_guard=True,
        )
        if persist:
            base = tracked_persist(base)
        cur = base.where(F.col("sum_val").isNotNull()).select(*keys, "sum_val")
        prev = base.where(F.col("prev_sum_val").isNotNull()).select(
            *keys, F.col("prev_sum_val").alias("sum_val")
        )
        ip_cmp = base.where(F.col("sum_val").isNotNull())
    else:
        # reference-shape two-frame path (mirrors the two ReadData
        # calls, hha.py:137,147); kept for parity documentation and
        # for callers whose windows come from different sources
        # exact=True so this branch is bit-identical to the fused path
        # (which always sums exactly): a double avg landing on an
        # integer boundary could otherwise floor differently
        cur = window_averages(
            histograms, key_cols=keys, value_col="CountPkt",
            lower=now - p.cur_window_sec, exact=True,
        )
        prev = window_averages(
            histograms, key_cols=keys, value_col="CountPkt",
            upper=now - p.prev_window_sec, exact=True,
        )
        if persist:
            # each frame feeds both the /32 comparison and the /24
            # rollup (replaces recreateDF, hha.py:119-128,155-156)
            cur = tracked_persist(cur)
            prev = tracked_persist(prev)
        ip_cmp = compare_windows(
            cur, prev, key_cols=keys, q=p.quotient_amplification,
            limit_new=p.limit_new_data, clamp_guard=True,
        )

    cur_net = rollup_averages(
        cur, group_cols=keys[:2], bucket_expr=ip_to_net24("dst_ip"), bucket_name="dst_net"
    )
    prev_net = rollup_averages(
        prev, group_cols=keys[:2], bucket_expr=ip_to_net24("dst_ip"), bucket_name="dst_net"
    )
    net_cmp = compare_windows(
        cur_net, prev_net, key_cols=net_keys, q=p.quotient_amplification,
        limit_new=p.limit_new_data_net, clamp_guard=False,
    )

    ip_alerts = spike_filter(ip_cmp, q=p.quotient_amplification).select(
        "num_protocol", "type_proto",
        F.col("prev_sum_val2").alias("sum_val"),  # hha.py:210 aliases baseline as sum_val
        "dst_ip", F.lit("ip").alias("scope"),
    )
    net_alerts = spike_filter(net_cmp, q=p.quotient_amplification).select(
        "num_protocol", "type_proto",
        F.col("prev_sum_val2").alias("sum_val"),  # hha.py:199
        F.col("dst_net").alias("dst_ip"), F.lit("net").alias("scope"),
    )
    alerts = ip_alerts.unionByName(net_alerts)  # S7 (hha.py:213-214), schema-aligned

    if zones is not None:
        # S8 gating — exact membership, pushed below any collect
        alerts = alerts.join(
            F.broadcast(zones.select(F.col("ip").alias("dst_ip"))),
            on="dst_ip", how="left_semi",
        )
    if prior_alerts is not None:
        recent = prior_alerts.where(
            F.col("detected_at") > F.lit(now - p.limit_detect_time_sec)
        ).select("num_protocol", "type_proto", "dst_ip")
        alerts = alerts.join(
            F.broadcast(recent),
            on=["num_protocol", "type_proto", "dst_ip"], how="left_anti",
        )
    return alerts
