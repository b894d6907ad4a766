"""Driver-gate queries for the sketch operators (operators/sketch.py):
count-min heavy hitters, Bloom-filter join pruning with measured
false-positive accounting, and hashed-linear-classifier quality
filtering.

Same determinism contract as the rest of the registry: md5-derived
integer hashes, BIGINT accumulation, integer cross-multiplied
thresholds — every value replays bit-for-bit in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hha_spark.operators.sketch import (
    bloom_bits,
    bloom_probe,
    classifier_scores,
    cms_counters,
    cms_estimates,
    md5_mod_sql,
)
from hha_spark.sources.tables import load_table

CMS_DEPTH = 4
CMS_WIDTH = 512
# heavy hitter: sketch estimate >= 0.5% of total token mass
HEAVY_NUM, HEAVY_DEN = 1, 200

BLOOM_M = 131072
BLOOM_K = 3

N_BUCKETS = 1024
W_MOD = 17
W_SHIFT = 8


def cms_heavy_tokens(spark, sf_dir):
    """Heavy-hitter tokens via a count-min sketch, with the exact
    count and the sketch's overcount alongside — the bounded-memory
    vocabulary-statistics shape (4x512 counters regardless of corpus
    size) plus a built-in accuracy audit, like dedup_minhash_recall
    does for LSH.

    A token is reported when its CMS estimate covers >= 0.5% of total
    token mass (integer cross-multiplication, scale-relative so the
    output is stable across sf). est >= true_cnt always; overcount is
    the collision error the d*w budget buys.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    counters = cms_counters(
        toks, depth=CMS_DEPTH, width=CMS_WIDTH
    )
    truth = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    total = toks.select(F.count(F.lit(1)).cast("long").alias("total_toks"))
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


def _cms_hash_sql(j: int, expr: str) -> str:
    return md5_mod_sql(f"cms{j}|", expr, CMS_WIDTH)


ORACLE_CMS_HEAVY = f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    hashed AS (
      SELECT CAST(j AS BIGINT) AS row,
             CASE j WHEN 0 THEN {_cms_hash_sql(0, "token")}
                    WHEN 1 THEN {_cms_hash_sql(1, "token")}
                    WHEN 2 THEN {_cms_hash_sql(2, "token")}
                    ELSE {_cms_hash_sql(3, "token")} END AS col
      FROM toks, range(0, {CMS_DEPTH}) t(j)),
    counters AS (
      SELECT row, col, COUNT(*) AS counter FROM hashed GROUP BY row, col),
    truth AS (
      SELECT token, COUNT(*) AS true_cnt FROM toks GROUP BY token),
    total AS (SELECT COUNT(*) AS total_toks FROM toks),
    probes AS (
      SELECT token, CAST(j AS BIGINT) AS row,
             CASE j WHEN 0 THEN {_cms_hash_sql(0, "token")}
                    WHEN 1 THEN {_cms_hash_sql(1, "token")}
                    WHEN 2 THEN {_cms_hash_sql(2, "token")}
                    ELSE {_cms_hash_sql(3, "token")} END AS col
      FROM truth, range(0, {CMS_DEPTH}) t(j)),
    est AS (
      SELECT p.token, MIN(COALESCE(c.counter, 0)) AS est
      FROM probes p LEFT JOIN counters c USING (row, col)
      GROUP BY p.token)
    SELECT e.token, e.est, t.true_cnt, e.est - t.true_cnt AS overcount
    FROM est e JOIN truth t USING (token), total
    WHERE e.est * {HEAVY_DEN} >= total.total_toks * {HEAVY_NUM}
"""


def bloom_join_prune(spark, sf_dir):
    """Bloom-pruned semi-join of lineitem order keys against urgent
    orders, with exact false-positive accounting: build a 128 Ki-bit
    / 3-hash Bloom over the urgent keys, probe every distinct
    lineitem order key, and reconcile against the exact semi-join.

    Output is one row (n_probed, n_pass, n_true, n_false_pos,
    n_false_neg). n_false_neg is structurally 0 — the query IS the
    no-false-negatives proof — and n_false_pos is the price of
    turning a shuffle join into a broadcast bitmap probe at 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    urgent = orders.where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    bits = bloom_bits(urgent, key_col="o_orderkey", m=BLOOM_M, k=BLOOM_K)
    probed = bloom_probe(
        lineitem.select("l_orderkey").distinct(),
        bits,
        key_col="l_orderkey",
        m=BLOOM_M,
        k=BLOOM_K,
    )
    truth = urgent.select(
        F.col("o_orderkey").alias("key"), F.lit(True).alias("is_true")
    )
    recon = probed.join(F.broadcast(truth), on="key", how="left").select(
        "key", "pass", F.coalesce("is_true", F.lit(False)).alias("is_true")
    )
    return recon.agg(
        F.count(F.lit(1)).cast("long").alias("n_probed"),
        F.sum(F.col("pass").cast("long")).cast("long").alias("n_pass"),
        F.sum(F.col("is_true").cast("long")).cast("long").alias("n_true"),
        F.sum(
            (F.col("pass") & ~F.col("is_true")).cast("long")
        ).cast("long").alias("n_false_pos"),
        F.sum(
            (~F.col("pass") & F.col("is_true")).cast("long")
        ).cast("long").alias("n_false_neg"),
    )


def _bloom_hash_sql(j: int, expr: str) -> str:
    return md5_mod_sql(f"bloom{j}|", expr, BLOOM_M)


_BLOOM_POS_CASE = f"""
      CASE j WHEN 0 THEN {_bloom_hash_sql(0, "CAST(key AS VARCHAR)")}
             WHEN 1 THEN {_bloom_hash_sql(1, "CAST(key AS VARCHAR)")}
             ELSE {_bloom_hash_sql(2, "CAST(key AS VARCHAR)")} END
"""

ORACLE_BLOOM = f"""
    WITH urgent AS (
      SELECT o_orderkey AS key FROM orders
      WHERE o_orderpriority = '1-URGENT'),
    bits AS (
      SELECT DISTINCT {_BLOOM_POS_CASE} AS pos
      FROM urgent, range(0, {BLOOM_K}) t(j)),
    cand AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
    probes AS (
      SELECT DISTINCT key, {_BLOOM_POS_CASE} AS pos
      FROM cand, range(0, {BLOOM_K}) t(j)),
    probed AS (
      SELECT p.key,
             COUNT(*) = SUM(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END)
                 AS pass
      FROM probes p LEFT JOIN bits b USING (pos)
      GROUP BY p.key),
    recon AS (
      SELECT pr.key, pr.pass, u.key IS NOT NULL AS is_true
      FROM probed pr LEFT JOIN urgent u USING (key))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
           CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true,
           CAST(SUM(CASE WHEN pass AND NOT is_true THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN NOT pass AND is_true THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_neg
    FROM recon
"""


def quality_classifier_keep(spark, sf_dir):
    """Model-based quality filtering (the fastText / DCLM-classifier
    serving shape): hashed bag-of-words into 1024 buckets, integer
    weight per bucket, keep documents with positive score. The
    weights here are md5-derived stand-ins; a trained model swaps in
    as a <= 1024-row broadcast without changing the plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    return classifier_scores(toks, n_buckets=N_BUCKETS)


_BUCKET_SQL = md5_mod_sql("qb|", "token", N_BUCKETS)
_W_SQL = (
    f"({md5_mod_sql('w|', f'CAST({_BUCKET_SQL} AS VARCHAR)', W_MOD)}"
    f" - {W_SHIFT})"
)

ORACLE_CLASSIFIER = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    weighted AS (SELECT doc_id, {_W_SQL} AS w FROM toks)
    SELECT doc_id, CAST(SUM(w) AS BIGINT) AS score, SUM(w) > 0 AS keep
    FROM weighted GROUP BY doc_id
"""


QUERIES = {
    "cms_heavy_tokens": cms_heavy_tokens,
    "bloom_join_prune": bloom_join_prune,
    "quality_classifier_keep": quality_classifier_keep,
}

ORACLES = {
    "cms_heavy_tokens": ORACLE_CMS_HEAVY,
    "bloom_join_prune": ORACLE_BLOOM,
    "quality_classifier_keep": ORACLE_CLASSIFIER,
}


def events_zorder_keys(spark, sf_dir):
    """The z-order clustering key (sinks/layout.py) as an oracle-
    checked computation: every event's (user_id, event-time) pair
    normalized to 16-bit cells against the global bounds and bit-
    interleaved into the Morton key the clustered writer sorts by.
    Gates the exact shift/mask cascade cross-engine, so the layout
    produced at 100 TB is reproducible from the SQL definition.

    Narrow plan: one 1-row bounds aggregate broadcast into a pure
    bit-arithmetic projection — no shuffle of the fact table.
    """
    from hha_spark.sinks.layout import _normalize, zorder_key
    from hha_spark.sources.tables import events_ts_us

    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_id", "user_id", events_ts_us(ev).alias("ts_us"))
    bounds = base.agg(
        F.min("user_id").alias("__ulo"), F.max("user_id").alias("__uhi"),
        F.min("ts_us").alias("__tlo"), F.max("ts_us").alias("__thi"),
    )
    keyed = base.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        _normalize(F.col("user_id"), F.col("__ulo"), F.col("__uhi"))
        .alias("cell_user"),
        _normalize(F.col("ts_us"), F.col("__tlo"), F.col("__thi"))
        .alias("cell_ts"),
    )
    return keyed.select(
        "event_id",
        "cell_user",
        "cell_ts",
        zorder_key(F.col("cell_user"), F.col("cell_ts")).alias("zkey"),
    )


def _spread_sql(col: str) -> str:
    """DuckDB twin of sinks/layout.py::_spread_bits."""
    a = f"({col} & 65535)"
    a = f"(({a} | ({a} << 8)) & 16711935)"
    a = f"(({a} | ({a} << 4)) & 252645135)"
    a = f"(({a} | ({a} << 2)) & 858993459)"
    a = f"(({a} | ({a} << 1)) & 1431655765)"
    return a


ORACLE_ZORDER = f"""
    WITH base AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
    bounds AS (
      SELECT MIN(user_id) AS ulo, MAX(user_id) AS uhi,
             MIN(ts_us) AS tlo, MAX(ts_us) AS thi
      FROM base),
    cells AS (
      SELECT event_id,
             CAST(FLOOR((user_id - ulo) * 65535
                        / GREATEST(uhi - ulo, 1)) AS BIGINT) AS cell_user,
             CAST(FLOOR((ts_us - tlo) * 65535
                        / GREATEST(thi - tlo, 1)) AS BIGINT) AS cell_ts
      FROM base, bounds)
    SELECT event_id, cell_user, cell_ts,
           ({_spread_sql("cell_user")}
            | ({_spread_sql("cell_ts")} << 1)) AS zkey
    FROM cells
"""


QUERIES["events_zorder_keys"] = events_zorder_keys
ORACLES["events_zorder_keys"] = ORACLE_ZORDER
