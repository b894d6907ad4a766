"""The complete S1-S8 detection pipeline as ONE SQL statement.

SURVEY.md §2.3 notes the reference has zero SQL surface — no
spark.sql, no views, no catalog. This module is the M4 front end:
the same normative semantics as operators/spike.py, expressed as a
CTE chain over a temp view. Catalyst compiles both to equivalent
plans; tests/test_sql_pipeline.py pins DataFrame-path == SQL-path on
the golden fixtures.

Useful operationally (analysts can tweak thresholds in SQL without
touching the operator library) and as an executable specification of
S1-S8 in one readable page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hha_spark.config import DetectorParams


def spike_sql(params: DetectorParams, now: int, view: str = "histograms") -> str:
    """Render the S1-S8 pipeline for the given thresholds.

    Mirrors operators/spike.py exactly: one-sided windows (S1),
    avg-of-avg /24 rollup via integer floor-division (S2), guarded
    /32 clamp vs unguarded /24 clamp (S3/S5), new-key defaults (S4),
    nullif-guarded ratio filter (S6), union with scope marker (S7).
    Gating/dedup (S8) stay joins in the caller — they need the zones
    and alert-log relations.
    """
    p = params
    q = p.quotient_amplification
    l32, l24 = p.limit_new_data, p.limit_new_data_net
    cur_lo = now - p.cur_window_sec
    prev_hi = now - p.prev_window_sec
    return f"""
WITH cur AS (
  SELECT num_protocol, type_proto, dst_ip,
         CAST(FLOOR(AVG(CountPkt)) AS BIGINT) AS sum_val
  FROM {view} WHERE timestamp > {cur_lo}
  GROUP BY num_protocol, type_proto, dst_ip),
prev AS (
  SELECT num_protocol, type_proto, dst_ip,
         CAST(FLOOR(AVG(CountPkt)) AS BIGINT) AS sum_val
  FROM {view} WHERE timestamp < {prev_hi}
  GROUP BY num_protocol, type_proto, dst_ip),
cur_net AS (
  SELECT num_protocol, type_proto, dst_ip & 4294967040 AS dst_net,
         CAST(SUM(sum_val) DIV COUNT(*) AS BIGINT) AS sum_val
  FROM cur GROUP BY num_protocol, type_proto, dst_ip & 4294967040),
prev_net AS (
  SELECT num_protocol, type_proto, dst_ip & 4294967040 AS dst_net,
         CAST(SUM(sum_val) DIV COUNT(*) AS BIGINT) AS sum_val
  FROM prev GROUP BY num_protocol, type_proto, dst_ip & 4294967040),
cmp_ip AS (
  SELECT c.num_protocol, c.type_proto, c.dst_ip, c.sum_val,
         COALESCE(CASE WHEN p.sum_val / NULLIF(c.sum_val, 0) > {q}
                        AND p.sum_val > {l32}
                       THEN {l32} ELSE p.sum_val END, {l32}) AS prev_sum_val2
  FROM cur c LEFT JOIN prev p
    ON c.num_protocol = p.num_protocol AND c.type_proto = p.type_proto
   AND c.dst_ip = p.dst_ip),
cmp_net AS (
  SELECT c.num_protocol, c.type_proto, c.dst_net, c.sum_val,
         COALESCE(CASE WHEN p.sum_val / NULLIF(c.sum_val, 0) > {q}
                       THEN {l24} ELSE p.sum_val END, {l24}) AS prev_sum_val2
  FROM cur_net c LEFT JOIN prev_net p
    ON c.num_protocol = p.num_protocol AND c.type_proto = p.type_proto
   AND c.dst_net = p.dst_net)
SELECT num_protocol, type_proto, prev_sum_val2 AS sum_val, dst_ip,
       'ip' AS scope
FROM cmp_ip WHERE sum_val / NULLIF(prev_sum_val2, 0) > {q}
UNION ALL
SELECT num_protocol, type_proto, prev_sum_val2 AS sum_val, dst_net AS dst_ip,
       'net' AS scope
FROM cmp_net WHERE sum_val / NULLIF(prev_sum_val2, 0) > {q}
"""


def detect_spikes_sql(
    spark: SparkSession,
    histograms: DataFrame,
    *,
    params: DetectorParams,
    now: int,
) -> DataFrame:
    histograms.createOrReplaceTempView("histograms")
    return spark.sql(spike_sql(params, now))
