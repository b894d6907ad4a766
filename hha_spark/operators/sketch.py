"""Probabilistic sketch operators: count-min heavy hitters, Bloom
membership pruning, and a hashed linear quality classifier.

These are the structures a 100 TB curation pipeline reaches for when
exact state no longer fits: a count-min sketch bounds heavy-hitter
memory at d*w counters regardless of vocabulary size, a Bloom filter
turns an expensive shuffle join into a broadcast bitmap probe with a
quantified false-positive rate, and a hashed linear model scores
document quality with a fixed-width weight table (the fastText /
DCLM-classifier serving shape) instead of an unbounded vocabulary.

Everything here is integer-exact and md5-derived, so a DuckDB oracle
can replay it bit-for-bit (the repo-wide determinism contract): hash
h_j(x) = bigint(hex(md5(prefix_j || x))[:8]) mod width, counters and
scores are BIGINT sums, and comparisons are integer cross-
multiplications. No floats accumulate anywhere.

Reference parity: the reference engine (hha.py) keeps exact
driver-side dicts for all state (GlobalRowList, hha.py:74-98); these
operators are the bounded-memory replacements that survive when the
key space is 10^11, plus the quality-scoring stage its pipeline lacks.

Physical shapes (asserted in tests/test_sketches.py):
- CMS build: explode(tokens) x d rows -> hash -> groupBy(row, col)
  COUNT. Map-side combine collapses each partition to <= d*w partial
  counters before the shuffle, so shuffle volume is O(d*w*partitions)
  — independent of corpus size.
- CMS probe: the counter table (d*w rows) broadcasts; per-token
  estimates are a broadcast join + min, never a shuffle of counters.
- Bloom build: distinct bit positions (<= m rows) via one combine-
  heavy shuffle; probe is a broadcast join against the bit table.
- Classifier: pure narrow map per token (weights are a function of
  the bucket hash, not a lookup table) + one map-side-combinable
  groupBy(doc). Zero joins, zero broadcast state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def md5_mod(prefix: str, col: Column, mod: int) -> Column:
    """bigint(first 8 hex chars of md5(prefix || col)) % mod.

    The cross-engine deterministic hash used across the repo (DuckDB
    twin: CAST('0x' || substr(md5(prefix || x), 1, 8) AS BIGINT) %
    mod). Result is in [0, mod): the 8-hex value is non-negative so
    both engines' % agree.
    """
    hex8 = F.substring(F.md5(F.concat(F.lit(prefix), col)), 1, 8)
    return (F.conv(hex8, 16, 10).cast("long") % F.lit(mod)).cast("long")


def md5_mod_sql(prefix: str, expr: str, mod: int) -> str:
    """DuckDB twin of :func:`md5_mod` as a SQL fragment."""
    return (
        f"CAST(CAST('0x' || substr(md5('{prefix}' || {expr}), 1, 8)"
        f" AS BIGINT) % {mod} AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def _cms_hashes(col: Column, depth: int, width: int) -> list[Column]:
    """The d independent hash positions for one token (per-row salt)."""
    return [md5_mod(f"cms{j}|", col, width) for j in range(depth)]


def cms_counters(
    tokens: DataFrame,
    *,
    token_col: str = "token",
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Build count-min counters over a token-occurrence frame.

    Returns (row, col, counter) with at most depth*width rows. Each
    occurrence increments one counter per hash row; partial
    aggregation collapses a partition's millions of occurrences into
    <= depth*width partials before the shuffle, so the build costs one
    bounded-width shuffle no matter the corpus size.
    """
    hashed = tokens.select(
        F.posexplode(
            F.array(*_cms_hashes(F.col(token_col), depth, width))
        ).alias("row", "col")
    )
    return hashed.select(
        F.col("row").cast("long").alias("row"), "col"
    ).groupBy("row", "col").agg(
        F.count(F.lit(1)).cast("long").alias("counter")
    )


def cms_estimates(
    distinct_tokens: DataFrame,
    counters: DataFrame,
    *,
    token_col: str = "token",
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query the sketch for each distinct token.

    Returns (token, est). Zero shuffles on the probe side: each of
    the depth hash rows is its own (<= width)-row broadcast join —
    counters are unique per (row, col), so no row multiplication —
    and est = least() across the depth matches, computed in-row. The
    token frame streams straight through; nothing explodes, nothing
    re-aggregates. est >= true count always (CMS never undercounts).
    """
    est = distinct_tokens.select(F.col(token_col).alias("token"))
    hashes = _cms_hashes(F.col("token"), depth, width)
    for j in range(depth):
        cj = counters.where(F.col("row") == j).select(
            F.col("col").alias(f"__c{j}"),
            F.col("counter").alias(f"__n{j}"),
        )
        est = est.join(
            F.broadcast(cj), hashes[j] == F.col(f"__c{j}"), "left"
        ).drop(f"__c{j}")
    return est.select(
        "token",
        F.least(
            *[F.coalesce(f"__n{j}", F.lit(0)) for j in range(depth)]
        ).alias("est"),
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def bloom_bits(
    keys: DataFrame,
    *,
    key_col: str,
    m: int = 16384,
    k: int = 3,
) -> DataFrame:
    """Set bit positions of a Bloom filter over a key column.

    Returns a single-column frame (pos) of distinct set bits
    (<= min(m, k * |keys|) rows). All k hash rows share one bitmap —
    the classic construction — so membership depends only on the
    position, not which hash set it.
    """
    pos = F.explode(
        F.array(
            *[
                md5_mod(f"bloom{j}|", F.col(key_col).cast("string"), m)
                for j in range(k)
            ]
        )
    ).alias("pos")
    return keys.select(pos).distinct()


def bloom_probe(
    candidates: DataFrame,
    bits: DataFrame,
    *,
    key_col: str,
    m: int = 16384,
    k: int = 3,
) -> DataFrame:
    """Probe candidate keys against the bit table.

    Returns (key, pass) where pass means every one of the key's k
    (deduplicated) probe positions is set. No false negatives by
    construction; false positives are quantified by the caller
    against an exact semi-join. The bit table broadcasts — this is
    the join-pruning shape: at 100 TB the big probe side streams
    against an in-memory bitmap instead of shuffling into a join.
    """
    probes = candidates.select(F.col(key_col).alias("key")).select(
        "key",
        # two hashes may collide on one position; array_distinct
        # counts it once IN-ROW — no dedup shuffle before the probe
        F.explode(
            F.array_distinct(
                F.array(
                    *[
                        md5_mod(f"bloom{j}|", F.col("key").cast("string"), m)
                        for j in range(k)
                    ]
                )
            )
        ).alias("pos"),
    )
    marked = probes.join(
        F.broadcast(bits.withColumn("__set", F.lit(1))), on="pos", how="left"
    )
    return marked.groupBy("key").agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce("__set", F.lit(0))))
        .alias("pass")
    )


# ---------------------------------------------------------------------------
# Hashed linear quality classifier
# ---------------------------------------------------------------------------

N_BUCKETS = 1024
W_MOD = 17  # weights in [-8, 8]
W_SHIFT = 8


def classifier_weight(bucket: Column) -> Column:
    """Deterministic integer weight for a feature bucket, in [-8, 8].

    A stand-in for trained fastText/logreg weights with the identical
    serving shape: weight is a pure function of the bucket id, so
    scoring is a narrow map — no weight-table join, no broadcast
    state, nothing to keep in sync across executors. Swapping in real
    trained weights turns this into a <= N_BUCKETS-row broadcast join
    without touching the aggregation shape.
    """
    return md5_mod("w|", bucket.cast("string"), W_MOD) - F.lit(W_SHIFT)


def classifier_scores(
    tokens: DataFrame,
    *,
    doc_col: str = "doc_id",
    token_col: str = "token",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Score each document with the hashed linear model.

    score(doc) = sum over token occurrences of weight(bucket(token));
    keep = score > 0. One narrow map (two md5s per token) + one
    map-side-combinable groupBy(doc) — the cheapest possible
    distributed shape for model-based quality filtering.
    """
    bucket = md5_mod("qb|", F.col(token_col), n_buckets)
    scored = tokens.select(
        F.col(doc_col).alias("doc_id"),
        classifier_weight(bucket).alias("w"),
    )
    return scored.groupBy("doc_id").agg(
        F.sum("w").cast("long").alias("score")
    ).select(
        "doc_id", "score", (F.col("score") > 0).alias("keep")
    )
