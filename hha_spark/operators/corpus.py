"""Corpus-level training-data operators: exact duplicated-span
analysis, cross-source n-gram leakage, PII and blocklist scrubbing,
source mixture balancing, deterministic stratified sampling, and
winnowing fingerprints.

These extend the per-document text ops (operators/text.py) to
corpus-scale questions a 100 TB pre-training pipeline asks:

  * which exact k-token spans repeat across documents (the
    "Deduplicating Training Data Makes Language Models Better"
    exact-substring signal, computed at gram granularity);
  * how much n-gram mass two sources share (leakage / overlap audit,
    the corpus-internal analogue of benchmark contamination in
    queries/llm_ops.py);
  * regex PII redaction (emails / IPv4 / long digit runs) as a
    JVM-side narrow map;
  * per-source sampling weights that fit a token budget (mixture
    balancing).

Scale notes (the design constraint for every op here):
  * Gram frames are keyed by md5(gram), not the gram text, so the
    shuffle carries a fixed-width key; at 100 TB the gram payload
    column is dropped before any wide stage (only doc_id/source ride
    along).
  * Document-frequency aggregation is map-side combinable
    (count-distinct rewritten as two-level agg by Catalyst); the
    join back to per-doc grams is an equi-join on the hash key —
    no broadcast of corpus-sized state anywhere.
  * Source-overlap pairs are generated from per-gram source sets
    with an explicit document-frequency cap (`max_sources`):
    grams present in more than `max_sources` sources are
    boilerplate and are EXCLUDED (and reported), so the pair
    fan-out per gram is bounded — the same bounding idea as
    MAX_LSH_BUCKET in operators/dedup.py.
  * PII scrubbing is a pure narrow map of regexp_replace chains —
    no shuffle, stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hha_spark.caching import tracked_persist

# Canonical mixture/fill parameters. Every default below, the batch
# gates (queries/corpus.py re-exports these as BUDGET_PCT/FILL_SALT),
# and the streaming flush (streaming/curation_stream.py) derive from
# these two values — stream==batch differential tests depend on the
# sides never diverging, so the literals live in exactly one place.
DEFAULT_BUDGET_PCT = 50
DEFAULT_FILL_SALT = "budget-v1"

# Redaction patterns — valid and identical under Java regex (Spark)
# and RE2 (DuckDB oracle): no backreferences, no lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_DIGITS_RE = r"\d{6,}"


def grams_expr(k: int) -> str:
    """Sliding k-token gram array over a pre-split `toks` column —
    the ONE definition every gram consumer shares (kgram_frame,
    boilerplate_coverage, strip_duplicate_spans).

    `toks` must be a named column on the frame: referencing split()
    inside the transform lambda would re-split the text once PER
    WINDOW (common-subexpression elimination does not reach inside
    higher-order-function lambdas), turning a linear map quadratic —
    and as a non-cheap alias referenced multiple times `toks` also
    survives CollapseProject, so the split really runs once per row.
    CASE guard: sequence(1, n) with n < 1 would generate a DESCENDING
    sequence in Spark, so short docs get an empty array.
    """
    return (
        f"CASE WHEN size(toks) >= {k} THEN "
        f"transform(sequence(1, size(toks) - {k - 1}),"
        f" i -> array_join(slice(toks, i, {k}), ' '))"
        f" ELSE array() END"
    )


def kgram_frame(
    df: DataFrame, *, k: int, text_col: str = "text", extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, *extra_cols, gram_key, gram) — one row per k-token
    window.

    Narrow map: tokenize, slide a k-window via sequence+transform
    (same shape as the training-sequence chunker in
    queries/relational7), explode. gram_key = md5 of the joined gram
    keeps every downstream shuffle fixed-width; the gram text column
    is only selected where a human-readable sample is wanted.
    """
    with_toks = df.select(
        "doc_id", *extra_cols, F.split(F.col(text_col), " ").alias("toks")
    )
    grams = F.expr(grams_expr(k))
    return (
        with_toks.select("doc_id", *extra_cols, F.explode(grams).alias("gram"))
        .select(
            "doc_id", *extra_cols, F.md5("gram").alias("gram_key"), "gram"
        )
    )


def duplicated_span_stats(docs: DataFrame, *, k: int = 5) -> DataFrame:
    """Per-document exact duplicated-span profile.

    A gram is *duplicated* when it appears in >= 2 distinct
    documents. Returns per doc: total gram windows, windows whose
    gram is corpus-duplicated, and distinct duplicated grams.

    Plan: narrow gram explode -> (doc, gram) window-count aggregate
    (dedups within-doc repeats BEFORE anything wide, so the join
    carries one row per doc-gram) -> document-frequency aggregate as
    a plain map-side-combinable count (each input row is already one
    distinct doc) -> equi-join back -> per-doc rollup. No
    count_distinct anywhere, so no Expand node doubles the gram
    frame; every aggregate is partial+final.
    """
    grams = kgram_frame(docs, k=k).select("doc_id", "gram_key")
    doc_gram = grams.groupBy("doc_id", "gram_key").agg(
        F.count(F.lit(1)).alias("w")
    )
    dup_keys = (
        doc_gram.groupBy("gram_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("gram_key", F.lit(1).alias("is_dup"))
    )
    flagged = doc_gram.join(dup_keys, "gram_key", "left")
    return flagged.groupBy("doc_id").agg(
        F.sum("w").cast("long").alias("n_grams"),
        F.coalesce(F.sum(F.col("w") * F.col("is_dup")), F.lit(0))
        .cast("long")
        .alias("n_dup_windows"),
        F.coalesce(F.sum("is_dup"), F.lit(0)).cast("long").alias("n_dup_grams"),
    )


def boilerplate_coverage(
    docs: DataFrame, *, k: int = 3, min_docs_pct: int = 1
) -> DataFrame:
    """Per-document boilerplate footprint — the C4/RefinedWeb scrub
    signal (Raffel et al. 2020 §2.2 drop repeated boilerplate lines;
    here at token-window granularity, the corpus-wide complement of
    `duplicated_span_stats`).

    A k-gram is *boilerplate* when it occurs in >= `min_docs_pct`
    percent of all documents (navigation chrome, legal footers,
    template headers — document frequency far beyond organic reuse).
    The threshold is RELATIVE so the operator means the same thing at
    sf0.001 and at 100 TB; the comparison is pure-integer
    (n_docs * 100 >= total * pct), no float ratio.
    For each document: total tokens, how many token positions fall
    under at least one boilerplate window (overlaps counted ONCE via
    a distinct on covered positions), and the clean remainder.
    Downstream, `clean_tokens` is the real training-token count and
    high `boiler_ratio` docs get dropped.

    Plan shape (all map-side-combinable aggregates, no count_distinct
    Expand):
      positional gram explode (narrow)
        -> per (doc, gram) window-count reduce   [shuffle 1]
        -> document-frequency reduce             [shuffle 2, skinny]
        -> semi-join flags boilerplate grams back onto occurrences
           [shuffle 3 on gram_key — fixed-width md5]
        -> position expand (x k, narrow) -> distinct covered
           positions -> per-doc count            [shuffle 4]
    At 100 TB the df table is Zipf-headed: the >= min_docs survivors
    are few and hot, but they flow through an equi-join keyed by
    gram_key whose per-key fan-out is each doc's own occurrence list
    — no cross-doc pair blowup anywhere (contrast: pairing ops cap
    buckets; coverage needs no cap at all).
    """
    with_toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    # pos is 0-based window start; covered token positions are
    # [pos, pos + k - 1]
    occ = with_toks.select(
        "doc_id", F.posexplode(F.expr(grams_expr(k))).alias("pos", "gram")
    ).select("doc_id", "pos", F.md5("gram").alias("gram_key"))

    doc_gram = occ.groupBy("doc_id", "gram_key").agg(
        F.count(F.lit(1)).alias("w")
    )
    total = docs.select(F.count(F.lit(1)).alias("n_total"))
    boiler = (
        doc_gram.groupBy("gram_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(F.broadcast(total))
        .where(F.col("n_docs") * 100 >= F.col("n_total") * min_docs_pct)
        .select("gram_key")
    )
    covered = (
        occ.join(boiler, "gram_key", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("tokpos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("covered_tokens"))
    )
    n_tokens = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return n_tokens.join(covered, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("covered_tokens"), F.lit(0))
        .cast("long")
        .alias("covered_tokens"),
        (
            F.col("n_tokens")
            - F.coalesce(F.col("covered_tokens"), F.lit(0))
        ).cast("long").alias("clean_tokens"),
        (
            F.coalesce(F.col("covered_tokens"), F.lit(0)) / F.col("n_tokens")
        ).alias("boiler_ratio"),
    )


def strip_duplicate_spans(
    docs: DataFrame, *, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """Surgical exact-substring dedup — the REMOVAL step of Lee et
    al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), at k-token gram granularity: every window whose gram
    occurs more than once in the corpus is cut from the text EXCEPT
    at its canonical occurrence (the globally-first (doc_id, pos)),
    and each document's surviving tokens are re-joined in order. The
    duplicated passage survives exactly once corpus-wide; partial
    window overlaps are handled by position-set union.

    Returns (doc_id, clean_text, n_tokens, n_removed) — the
    training-ready corpus plus the audit counts.

    Scale shape — LINEAR in occurrences, never pairwise (this is the
    structural advantage exact-substring dedup has over similarity
    dedup): positional gram explode (narrow) -> per-gram aggregate
    carrying count + argmin occurrence [1 shuffle, md5-key] ->
    equi-join back to occurrences [shuffle on the same key] ->
    covered-position explode (x k, narrow) -> per-doc distinct
    position set [1 shuffle, bounded by doc length] -> narrow
    array_except rebuild. A gram repeated a million times is a
    million occurrence rows flowing through keyed aggregates — real
    output-bound work, no cross-occurrence pairing anywhere.
    """
    with_toks = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("toks")
    )
    occ = _gram_occurrences(with_toks, k)

    # min(struct) = lexicographic argmin: the canonical occurrence is
    # the lowest (doc_id, pos) — deterministic and engine-independent
    dup = (
        occ.groupBy("gram_key")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("canon"),
        )
        .where(F.col("n_occ") >= 2)
    )
    cut_windows = (
        occ.join(dup, "gram_key")
        .where(
            (F.col("doc_id") != F.col("canon.doc_id"))
            | (F.col("pos") != F.col("canon.pos"))
        )
        .select("doc_id", "pos")
    )
    return _rebuild_without_windows(with_toks, cut_windows, k)


def _gram_occurrences(with_toks: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, gram_key) — one row per k-token window, md5-keyed
    (fixed-width shuffle keys; `with_toks` carries a split `toks`)."""
    return with_toks.select(
        "doc_id", F.posexplode(F.expr(grams_expr(k))).alias("pos", "gram")
    ).select("doc_id", "pos", F.md5("gram").alias("gram_key"))


def _rebuild_without_windows(
    with_toks: DataFrame, cut_windows: DataFrame, k: int
) -> DataFrame:
    """Shared removal tail of the span strippers: expand each cut
    window to its k token positions, union per doc, rebuild the text
    from surviving positions in order. Narrow after one bounded
    per-doc aggregate."""
    cut_set = (
        cut_windows.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("tokpos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("tokpos").alias("cut"))
    )
    # array_except(sequence, cut) keeps surviving positions IN ORDER;
    # element_at rebuilds the token run — all narrow, post-join
    keep = (
        "transform(array_except(sequence(0, size(toks) - 1), "
        "coalesce(cut, array())), i -> element_at(toks, i + 1))"
    )
    return (
        with_toks.join(cut_set, "doc_id", "left")
        .select(
            "doc_id",
            F.array_join(F.expr(keep), " ").alias("clean_text"),
            F.size("toks").cast("long").alias("n_tokens"),
            # size() on the coalesced array, not coalesce(size(...)):
            # legacy sizeOfNull yields -1, not NULL, in non-ANSI sessions
            F.size(F.coalesce(F.col("cut"), F.array()))
            .cast("long")
            .alias("n_removed"),
        )
    )


def strip_duplicate_spans_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """The INGEST-TIME shape of exact-substring dedup: strip from the
    incoming `batch` every k-gram window that already occurs in the
    persisted `corpus` (any corpus occurrence is canonical — corpus
    text is never rewritten at admission time), plus batch-internal
    duplicates among corpus-unseen grams (first batch occurrence
    survives). Mirrors dedup_containment_pairs' admission-gate
    design: all corpus-touching joins are CROSS-SIDE ONLY.

    Equivalence contract (pinned in tests/test_corpus.py): when every
    corpus doc_id precedes every batch doc_id, the output equals
    `strip_duplicate_spans(corpus UNION batch)` restricted to batch
    docs — the whole-corpus canonical (globally-first occurrence)
    coincides with "corpus first, then batch order" under that id
    ordering, so incremental maintenance loses nothing.

    Scale shape: the corpus contributes ONE distinct-gram index pass
    (in production a persisted/bucketed gram index maintained across
    admissions — this function accepts the corpus frame and derives
    it, same contract as containment's cross mode); the batch side is
    one narrow gram explode, one broadcast-or-shuffle semi-join and
    one anti-join against the index, and a batch-internal keyed
    aggregate bounded by batch size. Nothing pairs corpus-with-corpus
    and nothing is quadratic in occurrences.
    """
    bt = batch.select("doc_id", F.split(F.col(text_col), " ").alias("toks"))
    ct = corpus.select("doc_id", F.split(F.col(text_col), " ").alias("toks"))
    occ_b = _gram_occurrences(bt, k)
    idx = _gram_occurrences(ct, k).select("gram_key").distinct()

    # windows whose gram the corpus already has: cut unconditionally
    seen = occ_b.join(idx, "gram_key", "left_semi").select("doc_id", "pos")
    # corpus-unseen grams: batch-internal dedup, first occurrence wins
    fresh = occ_b.join(idx, "gram_key", "left_anti")
    dup_b = (
        fresh.groupBy("gram_key")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("canon"),
        )
        .where(F.col("n_occ") >= 2)
    )
    cut_b = (
        fresh.join(dup_b, "gram_key")
        .where(
            (F.col("doc_id") != F.col("canon.doc_id"))
            | (F.col("pos") != F.col("canon.pos"))
        )
        .select("doc_id", "pos")
    )
    return _rebuild_without_windows(bt, seen.unionByName(cut_b), k)


def source_overlap(
    docs: DataFrame, *, k: int = 5, max_sources: int = 10
) -> DataFrame:
    """Pairwise source n-gram overlap (leakage audit).

    For each unordered source pair (a < b): the number of distinct
    grams both emit, each side's distinct gram count, and Jaccard as
    one exact-integer division. Grams present in more than
    `max_sources` sources are boilerplate: excluded from pairing
    (bounding per-gram pair fan-out at max_sources^2) — the cap that
    keeps this linear when "sources" means thousands of web domains.
    """
    # persist: consumed by the per-gram source sets AND the per-source
    # totals — without it the k-gram explode + distinct runs twice
    grams = tracked_persist(
        kgram_frame(docs, k=k, extra_cols=("source",))
        .select("source", "gram_key")
        .distinct()
    )
    per_gram = grams.groupBy("gram_key").agg(
        F.collect_set("source").alias("sources")
    )
    bounded = per_gram.where(F.size("sources") <= max_sources)
    pairs = bounded.select(
        F.explode(
            F.expr(
                "flatten(transform(sources, a ->"
                " transform(filter(sources, b -> b > a), b -> struct(a, b))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
    shared = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("shared_grams")
    )
    totals = grams.groupBy("source").agg(F.count(F.lit(1)).alias("total_grams"))
    return (
        shared.join(
            F.broadcast(totals.withColumnRenamed("source", "source_a")
                        .withColumnRenamed("total_grams", "grams_a")),
            "source_a",
        )
        .join(
            F.broadcast(totals.withColumnRenamed("source", "source_b")
                        .withColumnRenamed("total_grams", "grams_b")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            "grams_a",
            "grams_b",
            (
                F.col("shared_grams")
                / (F.col("grams_a") + F.col("grams_b") - F.col("shared_grams"))
            ).alias("jaccard"),
        )
    )


def pii_scrub(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails, IPv4 literals, and >=6-digit runs.

    Order matters and is fixed: emails first (their local parts may
    contain digit runs), then IPv4 (dotted quads would otherwise be
    partially eaten by the digit rule), then bare digit runs over the
    already-redacted text. Pure narrow map — regexp_replace chains
    stay in whole-stage codegen; nothing shuffles.
    """
    text = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0))
    n_ip = F.size(F.regexp_extract_all(text, F.lit(PII_IPV4_RE), 0))
    step1 = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    step2 = F.regexp_replace(step1, PII_IPV4_RE, "<IP>")
    n_digits = F.size(F.regexp_extract_all(step2, F.lit(PII_DIGITS_RE), 0))
    scrubbed = F.regexp_replace(step2, PII_DIGITS_RE, "<NUM>")
    return df.select(
        F.col(id_col),
        n_email.alias("n_emails"),
        n_ip.alias("n_ipv4"),
        n_digits.alias("n_digit_runs"),
        scrubbed.alias("scrubbed_text"),
    )


WINNOW_POS_BITS = 20  # gram position packs into the low 20 bits


def winnowing_fingerprints(
    docs: DataFrame,
    *,
    k: int = 4,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-token gram, slide a
    w-hash window over the sequence, select each window's minimal
    (hash, pos) pair — packing `hash * 2^20 + pos` into one BIGINT
    makes the lexicographic (min-hash, leftmost) tie-break a plain
    MIN — and keep the distinct selections as the document's
    fingerprint set. Guarantee: any shared run of >= w+k-1 tokens
    yields a shared fingerprint hash; expected density 2/(w+1), so
    the fingerprint table is ~2/(w+1) of the gram table.

    Output per document: (doc_id, n_grams, n_fps, n_shared_fps),
    n_shared_fps counting fingerprints whose hash occurs in >= 2
    documents — the plagiarism/duplication signal. Documents shorter
    than one full window keep a zero row (left join).

    Distinct from text.py::fingerprint (a per-doc rolling-hash
    minimum — ONE value per doc): winnowing yields a position-dense
    SET with the guaranteed-detection property, the shape real
    clone-detection pipelines index.

    Scale: one narrow gram map, one per-doc window pass (frame MIN —
    no self-join), a distinct, and a fingerprint-keyed df aggregate;
    everything shuffles on doc_id or the fixed-width fingerprint
    hash. Positions must fit 20 bits (docs up to ~1M grams; the
    contract of the pack).
    """
    from pyspark.sql import Window

    with_toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("toks"),
    )
    occ = _gram_occurrences(with_toks, k)
    h = F.conv(F.substring("gram_key", 1, 10), 16, 10).cast("long")
    packed = occ.select(
        "doc_id",
        "pos",
        (h * F.lit(1 << WINNOW_POS_BITS) + F.col("pos")).alias("hp"),
    )
    frame = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    per_doc = Window.partitionBy("doc_id")
    sel = (
        packed.withColumn("wmin", F.min("hp").over(frame))
        .withColumn("n_grams", F.count(F.lit(1)).over(per_doc))
        # full windows only: start pos <= n_grams - w (0-based)
        .where(F.col("pos") <= F.col("n_grams") - w)
        .select("doc_id", "n_grams", "wmin")
        .distinct()
    )
    fps = sel.select(
        "doc_id",
        "n_grams",
        F.expr(f"wmin DIV {1 << WINNOW_POS_BITS}").alias("fp_hash"),
    )
    df_ = (
        fps.select("fp_hash", "doc_id")
        .distinct()
        .groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    per = fps.join(df_, "fp_hash").groupBy("doc_id", "n_grams").agg(
        F.count(F.lit(1)).cast("long").alias("n_fps"),
        F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_shared_fps"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_fps"), F.lit(0)).cast("long").alias("n_fps"),
            F.coalesce(F.col("n_shared_fps"), F.lit(0))
            .cast("long")
            .alias("n_shared_fps"),
        )
    )


def blocklist_scrub(
    df: DataFrame,
    terms: tuple[str, ...],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hit_pct: int = 5,
) -> DataFrame:
    """Deny-list term redaction + keep/drop audit (the C4 bad-words
    filter shape, split into its two real halves: REDACT for
    pipelines that keep the document, DROP-DECISION for pipelines
    that discard it).

    Token-wise, not regex: the corpus contract here is
    space-tokenized text, so membership in the broadcast-literal
    deny set is tested per token (`IN` over a literal list compiles
    to a JVM hash probe) — no regex-dialect risk, and multi-token
    hit counting is exact. Returns per document:

      n_tokens, n_hits (deny-list token occurrences),
      n_hit_terms (distinct deny terms present),
      keep (hits <= max_hit_pct% of tokens, integer-exact),
      scrubbed_md5 (md5 of the text with every hit replaced by
      '<BAD>' — the rewrite is verified by hash, not by eyeballing).

    Scale: pure narrow map (split + filter + transform + md5), no
    shuffle; the deny list is a query literal, the 100 TB analogue
    of broadcasting a bad-words file. Complements pii_scrub (regex
    family) — this is the curated-term family.
    """
    toks = F.split(F.col(text_col), " ")
    is_bad = lambda t: t.isin(*terms)  # noqa: E731 — shared lambda
    hits = F.filter(toks, is_bad)
    scrubbed = F.array_join(
        F.transform(
            toks, lambda t: F.when(is_bad(t), F.lit("<BAD>")).otherwise(t)
        ),
        " ",
    )
    n_tokens = F.size(toks)
    n_hits = F.size(hits)
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        n_hits.cast("long").alias("n_hits"),
        F.size(F.array_distinct(hits)).cast("long").alias("n_hit_terms"),
        (n_hits * 100 <= F.lit(max_hit_pct) * n_tokens).alias("keep"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def stratified_sample(
    df: DataFrame,
    *,
    frac_pct: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "s6",
) -> DataFrame:
    """Deterministic exact-count stratified sampling: per stratum,
    keep exactly floor(frac_pct% * |stratum|) rows, chosen by
    md5(id || '|' || salt) hash order — the train/val-split
    primitive. Unlike df.sample(), the result is (a) exactly sized
    per stratum and (b) a pure function of (id, salt): re-running on
    a grown corpus keeps previously-sampled rows sampled as long as
    their hash rank still clears the floor, and the same split is
    reproducible on any engine (the DuckDB oracle re-derives it).

    Returns (id, stratum, smp_rank, n_stratum) for the KEPT rows.

    Scale: one shuffle on the stratum key, two window passes (rank
    by hash, stratum count). A pathologically hot stratum serializes
    into one task under plain row_number; the scale fix is the usual
    two-phase rank — approximate hash-threshold per stratum from a
    sample, then exact rank only inside the boundary band — same
    refinement family as operators/rank.py. At the fixture's
    20-source/balanced layout the direct window is the right plan.
    """
    from pyspark.sql import Window

    h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
    )
    w_rank = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col))
    w_all = Window.partitionBy(strata_col)
    ranked = df.select(
        F.col(id_col),
        F.col(strata_col),
        F.row_number().over(w_rank).cast("long").alias("smp_rank"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_stratum"),
    )
    # rank <= floor(n*frac/100)  <=>  100*rank <= n*frac  (positive ints)
    return ranked.where(
        F.col("smp_rank") * 100 <= F.col("n_stratum") * frac_pct
    )


def mixture_weights(docs: DataFrame, *, budget_frac_pct: int = DEFAULT_BUDGET_PCT) -> DataFrame:
    """Per-source sampling weights hitting a corpus token budget.

    Budget = budget_frac_pct% of total tokens, split evenly across
    sources (the uniform-mixture target). A source smaller than its
    share keeps everything (weight 1.0); larger sources downsample.
    All quantities except the final weight are exact integers;
    weight is one division of two integers (deterministic double).

    One groupBy(source) + a broadcast 1-row total — no other
    shuffles; sources are assumed to number in the thousands at
    most, so the per-source frame itself broadcasts.
    """
    toks = F.size(F.split(F.col("text"), " "))
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
    )
    totals = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    # one integer division, exactly mirrored by DuckDB's `//`
    with_target = per_source.join(F.broadcast(totals)).withColumn(
        "target_tokens",
        F.expr(f"(total_tokens * {budget_frac_pct}) div (100 * n_sources)"),
    )
    return with_target.select(
        "source",
        "n_docs",
        "n_tokens",
        "target_tokens",
        F.least(F.col("n_tokens"), F.col("target_tokens")).alias("sampled_tokens"),
        F.least(
            F.lit(1.0), F.col("target_tokens") / F.col("n_tokens")
        ).alias("weight"),
    )


def _exact_isqrt(n: Column) -> Column:
    """floor(sqrt(n)) as an exact BIGINT for n >= 0, n < 2^53.

    Double sqrt of an integer below 2^53 is within one ulp, so the
    float estimate's floor is off by at most 1; two integer-compare
    corrections (bump up, then clamp down) make the result exact and
    therefore identical across engines — no raw float ever reaches
    the output. The DuckDB mirror is _ISQRT_SQL below.
    """
    s0 = F.floor(F.sqrt(n.cast("double"))).cast("long")
    s1 = F.when((s0 + 1) * (s0 + 1) <= n, s0 + 1).otherwise(s0)
    return F.when(s1 * s1 > n, s1 - 1).otherwise(s1)


def _isqrt_sql(expr: str) -> str:
    """DuckDB mirror of _exact_isqrt over an integer SQL expression."""
    s0 = f"CAST(floor(sqrt(CAST({expr} AS DOUBLE))) AS BIGINT)"
    s1 = f"(CASE WHEN ({s0}+1)*({s0}+1) <= {expr} THEN {s0}+1 ELSE {s0} END)"
    return f"(CASE WHEN {s1}*{s1} > {expr} THEN {s1}-1 ELSE {s1} END)"


def temperature_mixture(docs: DataFrame, *, budget_frac_pct: int = DEFAULT_BUDGET_PCT) -> DataFrame:
    """UniMax / T5-style temperature-scaled mixture weights: each
    source's sampling share is proportional to n_tokens^(1/2)
    (temperature tau = 2), flattening the head sources' dominance
    without ignoring size the way the uniform split
    (mixture_weights) does — the standard multilingual / multi-source
    pretraining compromise between proportional (tau=1) and uniform
    (tau=inf) sampling.

    Returns per source: n_docs, n_tokens, w_sqrt (the exact integer
    isqrt weight), share_ppm (this source's share of the budget in
    parts-per-million), target_tokens (its slice of the
    budget_frac_pct% token budget), sampled_tokens
    (min(n_tokens, target)), and oversample_ppm (target/n_tokens in
    ppm — above 1_000_000 means the source must repeat epochs, the
    signal UniMax caps). Every column is an exact integer: the sqrt
    itself is floor-exact via two integer corrections
    (_exact_isqrt), so no float crosses the engine boundary.

    Scale shape: identical to mixture_weights — one map-side
    combinable groupBy(source) over the corpus, then a broadcast
    1-row total; the per-source frame is thousands of rows at most.
    """
    return mixture_readout(
        per_source_stats(docs), budget_frac_pct=budget_frac_pct
    )


def per_source_stats(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(source, n_docs, n_tokens) — the ADDITIVE sufficient statistics
    every mixture consumer shares. ONE definition on purpose: the
    batch mixture, the streaming per-micro-batch merge, and the fill
    all read this, so the stream==batch equality the gates prove can
    never drift on a tokenizer change applied to one copy."""
    toks = F.size(F.split(F.col(text_col), " "))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
    )


def mixture_readout(
    per_source: DataFrame, *, budget_frac_pct: int = DEFAULT_BUDGET_PCT
) -> DataFrame:
    """The nonlinear readout of temperature_mixture over its ADDITIVE
    sufficient statistics (source, n_docs, n_tokens). Factored out so
    the statistics can be maintained incrementally — per micro-batch,
    per shard, per region — and merged by plain addition before the
    isqrt/share arithmetic runs once at the end (the streaming gate
    stream_temperature_mixture is exactly this shape).

    Overflow contract: budget_tokens * w_sqrt is ~ total_tokens^1.5/2,
    which exceeds int64 around 7e12 corpus tokens — inside this
    module's 100 TB design envelope — so the two big products run in
    DECIMAL(38,0) (mirrored as HUGEINT in the oracle) and only the
    final quotients are cast back to BIGINT. Values are identical to
    the int64 formulation wherever that one doesn't wrap."""
    weighted = per_source.withColumn(
        "w_sqrt", _exact_isqrt(F.col("n_tokens"))
    )
    totals = weighted.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("w_sqrt").alias("total_w"),
    )
    # budget fits int64 for any total_tokens < 2^53 (the isqrt bound);
    # the DANGEROUS product is budget * w_sqrt, lifted to DECIMAL.
    # NOTE Spark's `div` returns BIGINT, so the decimal cast must wrap
    # the product DIRECTLY — `(DEC div 100) * w` would collapse back
    # to int64 mid-chain and wrap silently (caught by
    # test_mixture_readout_exact_past_int64_wrap).
    return (
        weighted.join(F.broadcast(totals))
        .withColumn(
            "budget_tokens",
            F.expr(f"total_tokens * {budget_frac_pct} div 100"),
        )
        .withColumn(
            "target_tokens",
            F.expr(
                "CAST(CAST(budget_tokens AS DECIMAL(38,0)) * w_sqrt"
                " div total_w AS BIGINT)"
            ),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "w_sqrt",
            F.expr(
                "CAST(CAST(w_sqrt AS DECIMAL(38,0)) * 1000000"
                " div total_w AS BIGINT)"
            ).alias("share_ppm"),
            "target_tokens",
            F.least(F.col("n_tokens"), F.col("target_tokens")).alias(
                "sampled_tokens"
            ),
            F.expr(
                "CAST(CAST(target_tokens AS DECIMAL(38,0)) * 1000000"
                " div n_tokens AS BIGINT)"
            ).alias("oversample_ppm"),
        )
    )


def token_budget_fill(
    docs: DataFrame, *, budget_frac_pct: int = DEFAULT_BUDGET_PCT, salt: str = DEFAULT_FILL_SALT
) -> DataFrame:
    """Execute a mixture: deterministic greedy per-source document
    selection hitting the temperature_mixture token targets. Docs are
    ordered inside each source by a salted md5 of doc_id (a seeded
    shuffle — reproducible, uncorrelated with content) and kept while
    the running token total BEFORE the doc is under the source's
    target, so each source overshoots by at most one document. This
    is the step that turns per-source weights into an actual
    training-set keep-list.

    Output per doc: source, n_tokens, pick_rank, cum_tokens
    (inclusive running sum in pick order), target_tokens, kept.

    Scale shape: targets are the already-bounded per-source frame
    (broadcast); the fill is one window (per-source rank + running
    sum) over a 4-column projection — the same one-shuffle shape as
    stratified_sample, with the same two-phase-rank refinement
    available if one source dominates the corpus.
    """
    # ONE tokenize pass: the per-source sufficient statistics are
    # derived from this narrow frame, not from a second full-corpus
    # split of the text column
    return token_budget_fill_per_doc(
        docs.select(
            "doc_id",
            "source",
            F.size(F.split(F.col("text"), " "))
            .cast("long")
            .alias("n_tokens"),
        ),
        budget_frac_pct=budget_frac_pct,
        salt=salt,
    )


def token_budget_fill_per_doc(
    per_doc: DataFrame, *, budget_frac_pct: int = DEFAULT_BUDGET_PCT, salt: str = DEFAULT_FILL_SALT
) -> DataFrame:
    """token_budget_fill over an already-tokenized narrow frame
    (doc_id, source, n_tokens) — the shape a pipeline that stored
    per-doc token counts at ingest reads back (the streaming curation
    store, streaming/curation_stream.py). Same math, same output; the
    pick hash is derived from doc_id + salt so no text is needed."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|" + salt)))
    per_doc = tracked_persist(
        per_doc.select("doc_id", "source", "n_tokens", h.alias("h"))
    )
    stats = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    targets = mixture_readout(stats, budget_frac_pct=budget_frac_pct).select(
        "source", "target_tokens"
    )
    w = Window.partitionBy("source").orderBy(F.col("h"), F.col("doc_id"))
    ranked = per_doc.select(
        "doc_id",
        "source",
        "n_tokens",
        F.row_number().over(w).cast("long").alias("pick_rank"),
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
    )
    return ranked.join(F.broadcast(targets), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        "pick_rank",
        "cum_tokens",
        "target_tokens",
        ((F.col("cum_tokens") - F.col("n_tokens")) < F.col("target_tokens"))
        .alias("kept"),
    )


def funnel_rollup(
    raw_stats: DataFrame, q_stats: DataFrame, fill: DataFrame
) -> DataFrame:
    """Per-source curation-funnel report shared by the batch funnel
    (queries/corpus.py::curation_funnel) and the streaming store
    flush (streaming/curation_stream.py::final_curation_funnel):
    raw_stats (source, n_docs_raw), q_stats (source, n_docs_quality),
    fill (a token_budget_fill frame over the unique docs). LEFT joins
    from the raw side so a source filtered away entirely reports
    zeros; the per-source aggregates are broadcast-sized."""
    fill_stats = fill.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_unique"),
        F.sum("n_tokens").cast("long").alias("n_tokens_unique"),
        F.min("target_tokens").cast("long").alias("target_tokens"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0))
        .cast("long")
        .alias("kept_docs"),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
    )
    out = raw_stats.join(F.broadcast(q_stats), "source", "left").join(
        F.broadcast(fill_stats), "source", "left"
    )
    zero = F.lit(0).cast("long")
    return out.select(
        "source",
        "n_docs_raw",
        F.coalesce("n_docs_quality", zero).alias("n_docs_quality"),
        F.coalesce("n_docs_unique", zero).alias("n_docs_unique"),
        F.coalesce("n_tokens_unique", zero).alias("n_tokens_unique"),
        F.coalesce("target_tokens", zero).alias("target_tokens"),
        F.coalesce("kept_docs", zero).alias("kept_docs"),
        F.coalesce("kept_tokens", zero).alias("kept_tokens"),
    )


def benchmark_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    *,
    k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination report (the GPT-3 appendix-C /
    PaLM-style eval-leakage gate): for every training document, count
    k-gram windows that collide with ANY benchmark document's grams,
    and flag the document for removal on any hit.

    Returns (doc_id, n_windows, n_contaminated, n_bench_docs_hit,
    drop): n_bench_docs_hit is how many distinct benchmark documents
    share at least one gram — the audit column reviewers ask for
    before dropping data.

    Scale shape: the benchmark side is tiny by construction (eval
    sets are thousands of rows, the corpus is billions) — its
    distinct (gram_key, bench_doc) set broadcasts; the train side is
    one narrow gram explode + a broadcast join + one per-doc
    aggregate. Train never pairs with train; cost is linear in
    corpus windows, the same cross-side-only contract as
    strip_duplicate_spans_incremental.
    """
    tt = train.select("doc_id", F.split(F.col(text_col), " ").alias("toks"))
    bt = bench.select("doc_id", F.split(F.col(text_col), " ").alias("toks"))
    occ_t = _gram_occurrences(tt, k)
    bench_grams = (
        _gram_occurrences(bt, k)
        .select(F.col("gram_key"), F.col("doc_id").alias("bench_doc"))
        .distinct()
    )
    hits = (
        occ_t.join(F.broadcast(bench_grams), "gram_key")
        .groupBy("doc_id")
        .agg(
            F.countDistinct(F.struct("pos")).cast("long")
            .alias("n_contaminated"),
            F.countDistinct("bench_doc").cast("long")
            .alias("n_bench_docs_hit"),
        )
    )
    totals = occ_t.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows")
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        F.coalesce(F.col("n_contaminated"), F.lit(0))
        .cast("long")
        .alias("n_contaminated"),
        F.coalesce(F.col("n_bench_docs_hit"), F.lit(0))
        .cast("long")
        .alias("n_bench_docs_hit"),
        (F.coalesce(F.col("n_contaminated"), F.lit(0)) > 0).alias("drop"),
    )
