"""Document deduplication operators (exact, n-gram Jaccard, MinHash+LSH,
SimHash).

Extends the engine beyond the reference's surface with the operators a
large-scale training-data pipeline needs (BASELINE.json north star).
All are partition-parallel and shuffle-aware:

  * exact dedup: one hash-shuffle on md5(text) — the canonical
    map-side-combinable groupBy.
  * n-gram Jaccard: pairwise verification is quadratic, so it must be
    blocked; the block column (e.g. `source`, a length band, or an
    LSH bucket) bounds each join partition. At 100 TB the blocked
    self-join shuffles on the block key only.
  * MinHash+LSH: the scale path — signatures are computed per-row
    (no shuffle), candidates come from an equi-join on (band, key)
    so only genuinely-colliding docs meet; expected cost is
    O(docs + candidate pairs), not O(docs²).
  * SimHash: per-row 16-bit signature via md5 nibbles; exact-collision
    grouping is one shuffle.

Determinism contract (for the DuckDB oracle gate): token sets use
literal-space splitting, hashes are md5 hex strings (identical across
engines), Jaccard thresholds compare scaled INTEGERS
(10*|∩| >= 7*|∪|), and MinHash minima are lexicographic string minima
— no engine-specific numeric hashing anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hha_spark.caching import tracked_persist


def with_token_set(
    df: DataFrame, text_col: str = "text", out_col: str = "tokens"
) -> DataFrame:
    """Distinct whitespace tokens (the unigram shingle set)."""
    return df.withColumn(
        out_col, F.expr(f"array_distinct(split({text_col}, ' '))")
    )


def with_shingle_set(
    df: DataFrame,
    *,
    n: int = 3,
    text_col: str = "text",
    out_col: str = "shingles",
) -> DataFrame:
    """Distinct word n-gram shingles (default trigrams).

    element_at is 1-based in both Spark and DuckDB list indexing, so
    the oracle mirrors this expression verbatim. Documents shorter
    than n tokens produce an empty shingle set.
    """
    parts = ", ".join(f"element_at(_toks, i + {k})" for k in range(n))
    # NB: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty —
    # short documents need the explicit size guard
    shingles = (
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE array() END"
    )
    return (
        df.withColumn("_toks", F.split(F.col(text_col), " "))
        .withColumn(out_col, F.expr(shingles))
        .drop("_toks")
    )


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by content hash.

    Returns (text_hash, n_docs, canonical_doc_id) — canonical = lowest
    id, the usual keep-first policy. One hash aggregation; Catalyst
    partial-aggregates map-side so the shuffle carries one row per
    distinct hash.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_doc_id"),
        )
    )


def _postings(
    df: DataFrame,
    suffix: str,
    *,
    block_cols: list[str],
    id_col: str,
    tokens_col: str,
) -> DataFrame:
    return df.select(
        *block_cols,
        F.col(id_col).alias(f"doc_id_{suffix}"),
        F.size(F.col(tokens_col)).alias(f"n_{suffix}"),
        F.explode(F.col(tokens_col)).alias("tok"),
    )


def prefix_candidate_pairs(
    docs: DataFrame,
    right: DataFrame | None = None,
    *,
    block_cols: list[str],
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    threshold_num: int = 7,
    threshold_den: int = 10,
) -> DataFrame:
    """Candidate pairs via prefix filtering (AllPairs/PPJoin family,
    Bayardo et al. WWW'07; Xiao et al. PPJoin) — the EXACT answer's
    candidate superset, with hot tokens structurally excluded.

    Every doc's token set is ordered by ascending document frequency
    (ties by token text — any shared total order preserves the lemma);
    only the first |x| - ceil(t*|x|) + 1 tokens (the RAREST ones) emit
    postings. The lemma: two sets with Jaccard >= t must share at
    least one token inside both prefixes, so joining prefix postings
    loses no qualifying pair. A token present in most docs of a block
    has maximal df, sorts last, and never enters a prefix unless a doc
    is too small to exclude it — the quadratic hot-token candidate
    blowup of a full inverted index cannot happen, without any
    df-cap correction to the counts.

    Self-similarity is the intended shape (`right` is accepted for API
    symmetry but must be the same frame); the prefix postings are
    computed ONCE and persisted, and both sides of the candidate join
    read the cache.

    Shuffle shape: one (block, tok) aggregation for df, one doc_id
    window for the per-doc rank, one equi-join on (block, tok) over
    prefix postings only. All linear in postings except the join,
    whose output is bounded by genuinely-similar-looking pairs.
    """
    from pyspark.sql import Window

    post = docs.select(
        *block_cols,
        F.col(id_col).alias("doc_id"),
        F.size(F.col(tokens_col)).alias("n"),
        F.explode(F.col(tokens_col)).alias("tok"),
    )
    df_tok = post.groupBy(*block_cols, "tok").agg(F.count(F.lit(1)).alias("df"))
    # ceil(t*n) = (num*n + den - 1) DIV den, exact over ints
    plen = F.col("n") - F.expr(
        f"({threshold_num} * n + {threshold_den - 1}) DIV {threshold_den}"
    ) + F.lit(1)
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    pref = (
        post.join(df_tok, on=[*block_cols, "tok"])
        .withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= plen)
        .select(*block_cols, "doc_id", "tok")
    )
    pref = tracked_persist(pref)
    a = pref.select(*block_cols, F.col("doc_id").alias("doc_id_a"), "tok")
    b = pref.select(*block_cols, F.col("doc_id").alias("doc_id_b"), "tok")
    return (
        a.join(b, on=[*block_cols, "tok"])
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )


def containment_pairs(
    docs: DataFrame,
    corpus: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    threshold_num: int = 8,
    threshold_den: int = 10,
    candidates_only: bool = False,
) -> DataFrame:
    """ASYMMETRIC containment near-dup join: ordered pairs (a, b) with
    |tokens(a) ∩ tokens(b)| >= t·|tokens(a)| — "a is mostly inside b".

    Jaccard misses subset duplicates by construction (a quote, a
    boilerplate block, or a doc wholly embedded in a longer one has
    low |∩|/|∪| but containment ~1), and containment is the standard
    complement in crawl dedup. EXACT, via ONE-SIDED prefix filtering:
    only the contained side prunes to its |a| - ceil(t·|a|) + 1
    globally-rarest tokens (if c(a→b) >= t then a has at most
    |a| - ceil(t·|a|) tokens outside b, so any larger subset of a's
    tokens intersects b — no qualifying pair is lost), while the
    container side posts ALL tokens (b's rare tokens prove nothing
    about a's coverage, so no symmetric prefix exists — the
    asymmetry is inherent to the predicate, cf. Bayardo et al.'s
    one-sided bounds). A hot token therefore enters the candidate
    join only when it lands in some contained-side prefix, i.e. only
    for docs so small the prefix covers them — the quadratic
    hot-token blowup needs BOTH sides hot and cannot happen.

    Shuffle shape: one global token-df aggregate, one per-doc rank
    window, one (tok) equi-join of prefixes against postings, then
    exact verification by array_intersect over candidates only.
    Output: (doc_id_a, doc_id_b, inter_size, n_a, containment) with
    the threshold test in exact integer cross-multiplication;
    `containment` is one correctly-rounded double division.

    With `corpus` given, the join is CROSS-SIDE ONLY — contained side
    = `docs` (the incoming batch), container side = `corpus` — the
    ingest admission gate ("is this new doc mostly inside something we
    already have?"): cost tracks the batch, the corpus contributes one
    postings pass, and the corpus is never self-paired. The prefix
    rarity order then comes from CORPUS document frequencies (the
    side a real index has statistics for); correctness never depends
    on the order, only candidate volume does.
    """
    from pyspark.sql import Window

    # Containment is a SET predicate: set-ify the tokens column up
    # front so duplicated tokens can neither deflate |∩|/|A| (size()
    # counts duplicates, array_intersect() counts distinct) nor
    # weaken the prefix bound derived from the duplicate-inclusive
    # |A| (round-5 ADVICE). For the already-distinct shingle-set
    # callers array_distinct is a narrow no-op map.
    docs = docs.withColumn(tokens_col, F.array_distinct(F.col(tokens_col)))
    if corpus is not None:
        corpus = corpus.withColumn(
            tokens_col, F.array_distinct(F.col(tokens_col))
        )

    # candidate generation runs entirely on 8-byte xxhash64 keys, never
    # the shingle strings — smaller shuffles and cheaper join probes. A
    # hash collision can only MERGE df counts (changing which tokens the
    # prefix picks — any plen-subset satisfies the lemma) or ADD a false
    # candidate (removed by exact verification); no qualifying pair can
    # be lost.
    def _post(frame: DataFrame) -> DataFrame:
        return frame.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.col(tokens_col)).alias("n"),
            F.explode(F.col(tokens_col)).alias("tok"),
        ).select("doc_id", "n", F.xxhash64("tok").alias("tok"))

    container = corpus if corpus is not None else docs
    post = _post(docs)
    post_b = _post(container) if corpus is not None else post
    df_tok = post_b.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    plen = F.col("n") - F.expr(
        f"({threshold_num} * n + {threshold_den - 1}) DIV {threshold_den}"
    ) + F.lit(1)
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    # inner join on df: in cross mode, batch tokens ABSENT from the
    # corpus vocabulary drop out of prefix selection — sound, because
    # such tokens cannot be in any A∩B; any <=plen subset of the
    # surviving (corpus-known) tokens still witnesses a qualifying
    # pair, and when fewer than plen survive they are ALL kept
    pref = (
        post.join(df_tok, on="tok")
        .withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= plen)
        .select(
            F.col("doc_id").alias("doc_id_a"), F.col("n").alias("n_a"), "tok"
        )
    )
    # size bound: |A∩B| <= |B|, so containment needs den·|B| >= num·|A| —
    # prunes candidates whose container is smaller than the threshold
    # allows (on heavy-tailed real corpora this removes most of the
    # short-container false candidates; exactness unaffected)
    cand = (
        pref.join(
            post_b.select(
                F.col("doc_id").alias("doc_id_b"), F.col("n").alias("n_b"),
                "tok",
            ),
            on="tok",
        )
        .where(
            (F.col("doc_id_a") != F.col("doc_id_b"))
            & (F.col("n_b") * threshold_den >= F.col("n_a") * threshold_num)
        )
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )
    if candidates_only:
        # instrumentation hook (tools/scale_probe.py): the distinct
        # candidate set BEFORE exact verification, so probes can
        # attribute growth to candidate volume vs verified output
        return cand
    ta = docs.select(
        F.col(id_col).alias("doc_id_a"), F.col(tokens_col).alias("_ta")
    )
    tb = container.select(
        F.col(id_col).alias("doc_id_b"), F.col(tokens_col).alias("_tb")
    )
    verified = (
        cand.join(ta, on="doc_id_a")
        .join(tb, on="doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.size(F.array_intersect("_ta", "_tb"))
            .cast("long")
            .alias("inter_size"),
            F.size("_ta").cast("long").alias("n_a"),
        )
    )
    return verified.where(
        F.lit(threshold_den) * F.col("inter_size")
        >= F.lit(threshold_num) * F.col("n_a")
    ).withColumn("containment", F.col("inter_size") / F.col("n_a"))


def jaccard_pairs(
    left: DataFrame,
    right: DataFrame,
    *,
    block_cols: list[str],
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    threshold_num: int = 7,
    threshold_den: int = 10,
    prefix_filter: bool = True,
) -> DataFrame:
    """Blocked pairwise Jaccard-similar pairs over token SETS.

    Emits (doc_id_a, doc_id_b, inter_size, union_size, jaccard) for
    pairs in the same block with |∩|/|∪| >= threshold. The threshold
    test is pure integer arithmetic (den*|∩| >= num*|∪|) so engines
    agree at the boundary; `jaccard` itself is a single double
    division of exact ints (correctly rounded, hence identical).

    Default path: prefix-filtered candidates (see
    prefix_candidate_pairs — exact, hot-token-robust), then per-pair
    verification with array_intersect over the candidate set only.
    The prefix path is a SELF-similarity join over `left` (all in-repo
    call sites pass the same frame twice); pass the frame persisted so
    tokenization runs once across postings and verification.
    prefix_filter=False keeps the full inverted-index kernel (every
    posting joins; a block-ubiquitous token costs O(block²) intersect
    rows) — retained for equivalence testing and for small blocked
    inputs where the two extra linear shuffles outweigh the pruning.
    """
    if not prefix_filter:
        a = _postings(
            left, "a", block_cols=block_cols, id_col=id_col, tokens_col=tokens_col
        )
        b = _postings(
            right, "b", block_cols=block_cols, id_col=id_col, tokens_col=tokens_col
        )
        inter = (
            a.join(b, on=[*block_cols, "tok"])
            .where(F.col("doc_id_a") < F.col("doc_id_b"))
            .groupBy("doc_id_a", "doc_id_b", "n_a", "n_b")
            .agg(F.count(F.lit(1)).alias("inter_size"))
        )
        verified = inter.select(
            "doc_id_a",
            "doc_id_b",
            F.col("inter_size").cast("int").alias("inter_size"),
            (F.col("n_a") + F.col("n_b") - F.col("inter_size"))
            .cast("int")
            .alias("union_size"),
        )
    else:
        cand = prefix_candidate_pairs(
            left, block_cols=block_cols, id_col=id_col,
            tokens_col=tokens_col, threshold_num=threshold_num,
            threshold_den=threshold_den,
        )
        ta = left.select(
            F.col(id_col).alias("doc_id_a"), F.col(tokens_col).alias("_ta")
        )
        tb = left.select(
            F.col(id_col).alias("doc_id_b"), F.col(tokens_col).alias("_tb")
        )
        verified = (
            cand.join(ta, on="doc_id_a")
            .join(tb, on="doc_id_b")
            .select(
                "doc_id_a",
                "doc_id_b",
                F.size(F.array_intersect("_ta", "_tb")).alias("inter_size"),
                (
                    F.size("_ta") + F.size("_tb")
                    - F.size(F.array_intersect("_ta", "_tb"))
                ).alias("union_size"),
            )
        )
    return (
        verified.where(
            F.lit(threshold_den) * F.col("inter_size")
            >= F.lit(threshold_num) * F.col("union_size")
        )
        .withColumn("jaccard", F.col("inter_size") / F.col("union_size"))
    )


def minhash_signatures(
    df: DataFrame,
    *,
    num_hashes: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """MinHash signature columns mh0..mh{k-1}.

    Each hash family is min over an 8-hex-char (32-bit) SLICE of
    md5("s{d}|" + token) — a lexicographic minimum of hex strings,
    which both Spark and DuckDB order identically (ASCII). One md5
    digest yields FOUR independent lanes (128 bits = 4 x 32), so 8
    families cost 2 md5 invocations per token instead of 8 — the md5
    kernel is the dominant per-doc cost of every LSH consumer (batch
    dedup, the streaming curation funnel's mega-probe, the K=64/128
    scale probes), and slicing is a ~4x cut of it. 32-bit lanes keep
    cross-token min ties negligible (~n_tokens^2 / 2^32), and the
    lanes of one digest are independent under the random-oracle
    model, so LSH collision behavior is unchanged. Computed per-row
    with no shuffle; at 100 TB this is a narrow map stage.

    The salted digest arrays are materialized as their own projection
    (_d{d}) so each md5 runs once per token; Catalyst's
    CollapseProject keeps non-cheap multi-referenced expressions in
    their own project, so the lane transforms read the materialized
    arrays instead of re-expanding the md5 (plan-asserted in
    test_dedup.py::test_minhash_digest_not_reexpanded).
    """
    lanes_per_digest = 4  # md5 hex = 32 chars = 4 x 8-char lanes
    n_digests = -(-num_hashes // lanes_per_digest)

    # selectExpr with SQL-text lambdas, not F.transform with Python
    # lambdas: this runs per STREAMING EPOCH inside the curation
    # funnel's processor, and constructing 10 Python-lambda
    # higher-order expressions costs ~0.2 s of py4j chatter per call
    # (measured; the whole epoch's driver-side build was ~0.9 s) —
    # two string expressions build in ~1 py4j call each and parse
    # JVM-side. Same logical plan either way.
    digests = df.selectExpr(
        id_col,
        tokens_col,
        *[
            f"transform({tokens_col}, t -> md5(concat('s{d}|', t)))"
            f" AS _d{d}"
            for d in range(n_digests)
        ],
    )
    return digests.selectExpr(
        id_col,
        tokens_col,
        *[
            f"array_min(transform(_d{i // lanes_per_digest},"
            f" d -> substring(d, {1 + 8 * (i % lanes_per_digest)}, 8)))"
            f" AS mh{i}"
            for i in range(num_hashes)
        ],
    )


# Buckets larger than this are degenerate (boilerplate/templated
# content, or adversarially self-similar corpora): a bucket of n docs
# contributes n(n-1)/2 candidate pairs, so one 3000-doc bucket costs
# ~4.5M verifications while signalling nothing about any specific
# pair. Production LSH dedup pipelines cap or divert such buckets;
# the cap keeps worst-case candidate count linear in corpus size.
MAX_LSH_BUCKET = 64


def band_keys(
    sigs: DataFrame,
    *,
    bands: int = 4,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, key): each doc's LSH band keys — concatenations of
    `rows_per_band` adjacent signature columns, exploded one row per
    band. Narrow (no shuffle); the join on (band, key) downstream is
    what turns signatures into candidates."""
    # string expressions for the same per-epoch construction-cost
    # reason as minhash_signatures (this pair runs inside the
    # streaming funnel's processor every micro-batch)
    band_structs = ", ".join(
        "named_struct('band', {b}, 'key', concat({parts}))".format(
            b=b,
            parts=", ".join(
                f"mh{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return sigs.selectExpr(
        id_col, f"explode(array({band_structs})) AS bk"
    ).selectExpr(id_col, "bk.band AS band", "bk.key AS key")


def lsh_candidate_pairs(
    sigs: DataFrame,
    *,
    bands: int = 4,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
    max_bucket: int = MAX_LSH_BUCKET,
) -> DataFrame:
    """LSH banding: docs sharing any band key become candidate pairs.

    Shape: ONE shuffle. Each (band, key) bucket's member ids are
    gathered BOUNDED (operators/buckets.py: a pre-gather row_number
    prune caps every aggregation buffer at max_bucket + 1 elements, so
    a degenerate boilerplate bucket spills sort I/O instead of
    materializing a multi-million-id array in one buffer row) and the
    bucket's pairs are generated IN-ROW by a nested array transform —
    no ok-bucket count+join, no self-join, no second exchange of the
    banded frame (the groupBy reuses the window's hash partitioning).
    Earlier form (count → semi-join → self-equi-join) planned 6
    exchanges with no reuse. Buckets larger than `max_bucket` gather
    exactly max_bucket + 1 ids and are skipped by the size gate
    (see MAX_LSH_BUCKET), so the wide row never exceeds
    cap*(cap-1)/2 id pairs (~2k structs at 64).
    """
    from hha_spark.operators.buckets import capped_bucket_gather

    banded = band_keys(
        sigs, bands=bands, rows_per_band=rows_per_band, id_col=id_col
    )
    buckets = capped_bucket_gather(
        banded, keys=("band", "key"), order_col=id_col, payload=id_col,
        cap=max_bucket,
    )
    pair_gen = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), y -> "
        "struct(least(x, y) AS a, greatest(x, y) AS b))))"
    )
    return (
        buckets.where(F.size("ids") <= F.lit(max_bucket))
        .select(F.explode(pair_gen).alias("p"))
        .select(
            F.col("p.a").alias("doc_id_a"), F.col("p.b").alias("doc_id_b")
        )
        .where(F.col("doc_id_a") != F.col("doc_id_b"))
        .distinct()
    )


def incremental_lsh_pairs(
    new_sigs: DataFrame,
    corpus_sigs: DataFrame,
    *,
    bands: int = 4,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
    max_bucket: int = MAX_LSH_BUCKET,
) -> DataFrame:
    """Cross-side LSH: candidates pair a NEW doc with a CORPUS doc
    sharing any band key — the ingest-time dedup shape. The corpus is
    never self-paired (its internal duplicates were settled when it
    was built), so cost tracks |new| × bucket occupancy, not |corpus|².

    At 100 TB the corpus band table is a precomputed, (band, key)-
    bucketed stored table — here materialized as one ROW PER BUCKET
    with the member ids gathered bounded (operators/buckets.py caps
    the aggregation buffer itself at max_bucket + 1 ids, not just the
    emitted row): the batch's band keys equi-join against it and
    the matches explode in-row, so the corpus pays exactly one
    aggregation and the join never re-shuffles bucket members. The
    bucket cap is computed over CORPUS buckets — a boilerplate bucket
    with thousands of corpus members signals template text, not a
    meaningful duplicate of any specific new doc.

    Returns distinct (doc_id_new, doc_id_corpus).
    """
    newb = band_keys(
        new_sigs, bands=bands, rows_per_band=rows_per_band, id_col=id_col
    ).select(F.col(id_col).alias("doc_id_new"), "band", "key")
    from hha_spark.operators.buckets import capped_bucket_gather

    corp_buckets = capped_bucket_gather(
        band_keys(
            corpus_sigs, bands=bands, rows_per_band=rows_per_band,
            id_col=id_col,
        ),
        keys=("band", "key"), order_col=id_col, payload=id_col,
        cap=max_bucket,
    ).where(F.size("ids") <= F.lit(max_bucket))
    return (
        newb.join(corp_buckets, on=["band", "key"])
        .select("doc_id_new", F.explode("ids").alias("doc_id_corpus"))
        .distinct()
    )


def nibble_sum_sql(i: int) -> str:
    """±1 weight sum for bit i: +1 when the i-th md5 nibble of the
    token has its high bit set (hex digit in 8..f), else -1.
    Engine-portable SQL (no strpos/instr argument-order traps)."""
    high = "'8','9','a','b','c','d','e','f'"
    return (
        f"SUM(CASE WHEN substr(md5(tok), {i + 1}, 1) IN ({high}) "
        f"THEN 1 ELSE -1 END)"
    )


def simhash16_sql_sums() -> list[str]:
    """16 aliased per-bit weight sums (aggregate fragments over
    exploded tokens); identical text in Spark SQL and DuckDB."""
    return [f"{nibble_sum_sql(i)} AS w{i}" for i in range(16)]


def simhash16_pack_sql() -> str:
    """Pack the 16 weight signs into a BIGINT simhash."""
    terms = " + ".join(
        f"(CASE WHEN w{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16)
    )
    return f"CAST({terms} AS BIGINT)"


def simhash16(
    df: DataFrame, *, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """16-bit SimHash over the distinct-token set.

    Bit i is the sign of the sum over tokens of ±1 by the high bit of
    the i-th md5 nibble. Explode + two-level aggregate; the shuffle
    key is the doc id so this scales linearly. Exact hash collisions
    are near-duplicate candidates.
    """
    toks = df.select(F.col(id_col), F.explode(tokens_col).alias("tok"))
    sums = toks.groupBy(id_col).agg(
        *[F.expr(nibble_sum_sql(i)).alias(f"w{i}") for i in range(16)]
    )
    return sums.select(F.col(id_col), F.expr(simhash16_pack_sql()).alias("simhash"))


SIMHASH_MAX_HAMMING = 3


def simhash_near_pairs(
    hashes: DataFrame,
    *,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    bits: int = 16,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    max_bucket: int = MAX_LSH_BUCKET,
) -> DataFrame:
    """SimHash near-dup PAIRS via pigeonhole block join — never
    all-pairs: at hamming distance <= d, at least one of d+1 equal-
    width bit blocks is untouched, so candidates come from an exact
    equi-join on (block index, block value) and only candidates pay
    the popcount verification (bit_count(a XOR b) <= d).

    Scale shape at 100 TB: one narrow block explode (d+1 rows/doc),
    ONE shuffle gathering each capped (block, value) bucket's
    (id, simhash) members, and the pair generation + popcount verify
    run IN-ROW over the gathered list (same single-shuffle
    restructure as lsh_candidate_pairs; template-heavy buckets are
    dropped by the cap, and the gather itself is buffer-bounded at
    max_bucket + 1 members via operators/buckets.py). Returns
    (doc_id_a, doc_id_b, hamming), a < b, distinct.
    """
    from hha_spark.operators.buckets import capped_bucket_gather

    blocks = max_hamming + 1
    width = bits // blocks
    mask = (1 << width) - 1
    block_structs = [
        F.struct(
            F.lit(b).alias("blk"),
            F.shiftright(F.col(sim_col), b * width).bitwiseAND(F.lit(mask)).alias("val"),
        )
        for b in range(blocks)
    ]
    exploded = hashes.select(
        F.col(id_col), F.col(sim_col), F.explode(F.array(*block_structs)).alias("bk")
    ).select(id_col, sim_col, F.col("bk.blk").alias("blk"), F.col("bk.val").alias("val"))
    buckets = capped_bucket_gather(
        exploded, keys=("blk", "val"), order_col=id_col,
        payload=F.struct(F.col(id_col).alias("id"), F.col(sim_col).alias("sim")),
        cap=max_bucket, out_col="ms",
    )
    pair_gen = F.expr(
        "flatten(transform(ms, (x, i) -> "
        "transform(slice(ms, i + 2, size(ms) - i - 1), y -> struct("
        "least(x.id, y.id) AS a, greatest(x.id, y.id) AS b, "
        "CAST(bit_count(x.sim ^ y.sim) AS BIGINT) AS hamming))))"
    )
    return (
        buckets.where(F.size("ms") <= F.lit(max_bucket))
        .select(F.explode(pair_gen).alias("p"))
        .where(F.col("p.hamming") <= F.lit(max_hamming))
        .select(
            F.col("p.a").alias("doc_id_a"),
            F.col("p.b").alias("doc_id_b"),
            F.col("p.hamming").alias("hamming"),
        )
        .distinct()
    )
