"""Driver-gate queries for corpus-level training-data operators
(operators/corpus.py): exact duplicated spans, cross-source n-gram
leakage, PII scrubbing, mixture balancing.

Determinism contract: every join/group key is an md5 hex string or an
integer; ratios are single divisions of exact integers (IEEE double,
identical across engines); no floats accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hha_spark.operators.corpus import (
    PII_DIGITS_RE,
    PII_EMAIL_RE,
    PII_IPV4_RE,
    blocklist_scrub,
    duplicated_span_stats,
    mixture_weights,
    pii_scrub,
    source_overlap,
    stratified_sample,
    strip_duplicate_spans,
)
from hha_spark.sources.tables import load_table

K = 5
MAX_SOURCES = 10
# canonical value lives with the operators (operators/corpus.py);
# the oracle SQL f-strings below embed this same re-exported value
from hha_spark.operators.corpus import (  # noqa: E402
    DEFAULT_BUDGET_PCT as BUDGET_PCT,
    DEFAULT_FILL_SALT as FILL_SALT,
)

# DuckDB-side k-gram extraction (1-based inclusive list slicing; the
# LATERAL unnest enumerates window starts). Mirrors
# operators/corpus.py::kgram_frame exactly, including the md5 key.
_ORACLE_GRAMS = f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
               FROM documents),
    g AS (
      SELECT doc_id, source,
             md5(array_to_string(toks[i:i+{K - 1}], ' ')) AS gram_key
      FROM t, LATERAL (
        SELECT unnest(generate_series(1, len(toks) - {K - 1})) AS i
      ) s
    )
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def corpus_dup_spans(spark, sf_dir):
    """Exact duplicated k-gram spans per document (Lee et al.-style
    exact-substring dedup signal at gram granularity)."""
    return duplicated_span_stats(_docs(spark, sf_dir), k=K)


ORACLE_DUP_SPANS = f"""
    {_ORACLE_GRAMS},
    dfreq AS (
      SELECT gram_key, count(DISTINCT doc_id) AS n_docs
      FROM g GROUP BY gram_key
    ),
    flagged AS (
      SELECT g.doc_id, g.gram_key,
             CASE WHEN d.n_docs >= 2 THEN 1 END AS is_dup
      FROM g JOIN dfreq d USING (gram_key)
    )
    SELECT doc_id,
           count(*) AS n_grams,
           CAST(coalesce(sum(is_dup), 0) AS BIGINT) AS n_dup_windows,
           count(DISTINCT CASE WHEN is_dup = 1 THEN gram_key END)
             AS n_dup_grams
    FROM flagged GROUP BY doc_id
"""


def corpus_strip_dup_spans(spark, sf_dir):
    """Surgical exact-substring dedup (the removal step of Lee et
    al. 2022): cut every duplicated k-gram window except its
    globally-first occurrence and rebuild the text
    (operators/corpus.py::strip_duplicate_spans). The oracle ranks
    occurrences per gram and cuts rank >= 2 — an independent
    formulation of the same canonical-survivor rule."""
    return strip_duplicate_spans(_docs(spark, sf_dir), k=K)


ORACLE_STRIP_SPANS = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    occ AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+{K - 1}], ' ')) AS gram_key
      FROM t, LATERAL (
        SELECT unnest(generate_series(1, len(toks) - {K - 1})) AS i
      ) s
    ),
    ranked AS (
      SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY gram_key
                                ORDER BY doc_id, pos) AS rn
      FROM occ),
    cutpos AS (
      SELECT DISTINCT doc_id, pos + j AS tokpos
      FROM ranked, LATERAL (
        SELECT unnest(generate_series(0, {K - 1})) AS j
      ) u
      WHERE rn >= 2),
    cuts AS (SELECT doc_id, list(tokpos) AS cut FROM cutpos
             GROUP BY doc_id)
    SELECT t.doc_id,
           -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
           coalesce(array_to_string(
             list_transform(
               list_filter(generate_series(0, len(toks) - 1),
                           i -> NOT list_contains(coalesce(cut, []), i)),
               i -> toks[i + 1]),
             ' '), '') AS clean_text,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(coalesce(len(cut), 0) AS BIGINT) AS n_removed
    FROM t LEFT JOIN cuts USING (doc_id)
"""


def corpus_source_overlap(spark, sf_dir):
    """Pairwise source gram-overlap matrix with a boilerplate
    document-frequency cap."""
    return source_overlap(_docs(spark, sf_dir), k=K, max_sources=MAX_SOURCES)


ORACLE_SOURCE_OVERLAP = f"""
    {_ORACLE_GRAMS},
    sg AS (SELECT DISTINCT source, gram_key FROM g),
    pg AS (SELECT gram_key, count(*) AS ns FROM sg GROUP BY gram_key),
    keep AS (SELECT gram_key FROM pg WHERE ns <= {MAX_SOURCES}),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS shared_grams
      FROM sg a
      JOIN keep USING (gram_key)
      JOIN sg b USING (gram_key)
      WHERE a.source < b.source
      GROUP BY 1, 2
    ),
    tot AS (SELECT source, count(*) AS total_grams FROM sg GROUP BY source)
    SELECT source_a, source_b, shared_grams,
           ta.total_grams AS grams_a, tb.total_grams AS grams_b,
           shared_grams / (ta.total_grams + tb.total_grams - shared_grams)
             AS jaccard
    FROM pairs
    JOIN tot ta ON ta.source = pairs.source_a
    JOIN tot tb ON tb.source = pairs.source_b
"""


def corpus_pii_scrub(spark, sf_dir):
    """Regex PII redaction: per-doc match counts + scrubbed text.

    The fixture corpus contains no PII (counts are 0 and the text
    passes through), which the oracle verifies end-to-end; the
    redaction semantics themselves are pinned on crafted strings in
    tests/test_corpus.py.
    """
    out = pii_scrub(_docs(spark, sf_dir))
    for c in ("n_emails", "n_ipv4", "n_digit_runs"):
        out = out.withColumn(c, F.col(c).cast("long"))
    return out


ORACLE_PII_SCRUB = f"""
    SELECT doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{PII_IPV4_RE}')) AS n_ipv4,
       len(regexp_extract_all(
             regexp_replace(regexp_replace(text,
               '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
               '{PII_IPV4_RE}', '<IP>', 'g'),
             '{PII_DIGITS_RE}')) AS n_digit_runs,
       regexp_replace(
         regexp_replace(regexp_replace(text,
           '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
           '{PII_IPV4_RE}', '<IP>', 'g'),
         '{PII_DIGITS_RE}', '<NUM>', 'g') AS scrubbed_text
    FROM documents
"""


def corpus_mixture_weights(spark, sf_dir):
    """Per-source sampling weights for a 50%-of-corpus token budget
    split uniformly across sources."""
    return mixture_weights(_docs(spark, sf_dir), budget_frac_pct=BUDGET_PCT)


ORACLE_MIXTURE_WEIGHTS = f"""
    WITH per AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             count(*) AS n_sources
      FROM per
    )
    SELECT source, n_docs, n_tokens,
           CAST((total_tokens * {BUDGET_PCT}) // (100 * n_sources) AS BIGINT)
             AS target_tokens,
           CAST(least(n_tokens,
                (total_tokens * {BUDGET_PCT}) // (100 * n_sources)) AS BIGINT)
             AS sampled_tokens,
           least(1.0,
                CAST((total_tokens * {BUDGET_PCT}) // (100 * n_sources)
                     AS BIGINT) / n_tokens) AS weight
    FROM per, tot
"""


# Deny-list for the blocklist scrub — stands in for a curated
# bad-words file (the C4 filter ships one); terms are query literals,
# the broadcast-a-tiny-file shape at 100 TB.
BLOCK_TERMS = ("customer", "vector", "stream")
BLOCK_MAX_HIT_PCT = 5


def corpus_blocklist_scrub(spark, sf_dir):
    """C4-style bad-words step, split into redact + drop-decision
    halves (operators/corpus.py::blocklist_scrub): token-wise deny-set
    membership, '<BAD>' rewrite verified by md5, and an integer-exact
    <=5%-of-tokens keep rule. Complements corpus_pii_scrub (regex
    family) — this is the curated-term family over the same text."""
    return blocklist_scrub(
        _docs(spark, sf_dir), BLOCK_TERMS, max_hit_pct=BLOCK_MAX_HIT_PCT
    )


_BLOCK_IN = ", ".join(f"'{t}'" for t in BLOCK_TERMS)
ORACLE_BLOCKLIST_SCRUB = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    s AS (
      SELECT doc_id, toks,
             list_filter(toks, x -> x IN ({_BLOCK_IN})) AS hits,
             list_transform(
               toks,
               x -> CASE WHEN x IN ({_BLOCK_IN}) THEN '<BAD>' ELSE x END
             ) AS scr
      FROM t)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(hits) AS BIGINT) AS n_hits,
           CAST(len(list_distinct(hits)) AS BIGINT) AS n_hit_terms,
           len(hits) * 100 <= {BLOCK_MAX_HIT_PCT} * len(toks) AS keep,
           md5(array_to_string(scr, ' ')) AS scrubbed_md5
    FROM s
"""


SAMPLE_FRAC_PCT = 30
SAMPLE_SALT = "s6"


def corpus_stratified_sample(spark, sf_dir):
    """Deterministic exact-count per-source sampling
    (operators/corpus.py::stratified_sample): keep exactly
    floor(30% * |source|) docs per source by md5(doc_id||salt) hash
    order — the reproducible train/val-split primitive. The oracle
    re-derives the identical split from the identical hash, so a
    green row proves WHICH rows were sampled, not just how many."""
    return stratified_sample(
        _docs(spark, sf_dir),
        frac_pct=SAMPLE_FRAC_PCT,
        salt=SAMPLE_SALT,
    )


ORACLE_STRATIFIED_SAMPLE = f"""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '|{SAMPLE_SALT}'),
                        doc_id) AS smp_rank,
             COUNT(*) OVER (PARTITION BY source) AS n_stratum
      FROM documents)
    SELECT doc_id, source,
           CAST(smp_rank AS BIGINT) AS smp_rank,
           CAST(n_stratum AS BIGINT) AS n_stratum
    FROM r
    WHERE smp_rank * 100 <= n_stratum * {SAMPLE_FRAC_PCT}
"""


WINNOW_K = 4
WINNOW_W = 4


def corpus_winnowing_fps(spark, sf_dir):
    """MOSS winnowing fingerprints (operators/corpus.py::
    winnowing_fingerprints): per-window minimal (hash, pos) selection
    packed into one BIGINT so the leftmost-min tie-break is a plain
    frame MIN; per-doc fingerprint counts + how many fingerprints are
    shared with other docs. The oracle re-derives the identical
    selection, so a green row proves the window-min choices, not just
    the counts."""
    from hha_spark.operators.corpus import winnowing_fingerprints

    return winnowing_fingerprints(
        _docs(spark, sf_dir), k=WINNOW_K, w=WINNOW_W
    )


_WPACK = 1 << 20
ORACLE_WINNOWING = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    occ AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+{WINNOW_K - 1}], ' ')) AS gram_key
      FROM t, LATERAL (
        SELECT unnest(generate_series(1, len(toks) - {WINNOW_K - 1})) AS i
      ) s),
    packed AS (
      SELECT doc_id, pos,
             CAST('0x' || substr(gram_key, 1, 10) AS BIGINT) * {_WPACK}
               + pos AS hp
      FROM occ),
    win AS (
      SELECT doc_id, pos,
             MIN(hp) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW
                           AND {WINNOW_W - 1} FOLLOWING) AS wmin,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
      FROM packed),
    sel AS (
      SELECT DISTINCT doc_id, n_grams, wmin
      FROM win WHERE pos <= n_grams - {WINNOW_W}),
    fps AS (
      SELECT doc_id, n_grams, wmin // {_WPACK} AS fp_hash FROM sel),
    dfreq AS (
      SELECT fp_hash, COUNT(DISTINCT doc_id) AS n_docs
      FROM fps GROUP BY fp_hash),
    per AS (
      SELECT f.doc_id, f.n_grams,
             COUNT(*) AS n_fps,
             SUM(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END)
               AS n_shared_fps
      FROM fps f JOIN dfreq d USING (fp_hash)
      GROUP BY f.doc_id, f.n_grams)
    SELECT t.doc_id,
           CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(p.n_fps, 0) AS BIGINT) AS n_fps,
           CAST(coalesce(p.n_shared_fps, 0) AS BIGINT) AS n_shared_fps
    FROM t LEFT JOIN per p USING (doc_id)
"""


QUERIES = {
    "corpus_dup_spans": corpus_dup_spans,
    "corpus_strip_dup_spans": corpus_strip_dup_spans,
    "corpus_source_overlap": corpus_source_overlap,
    "corpus_pii_scrub": corpus_pii_scrub,
    "corpus_mixture_weights": corpus_mixture_weights,
    "corpus_blocklist_scrub": corpus_blocklist_scrub,
    "corpus_stratified_sample": corpus_stratified_sample,
    "corpus_winnowing_fps": corpus_winnowing_fps,
}

ORACLES = {
    "corpus_dup_spans": ORACLE_DUP_SPANS,
    "corpus_strip_dup_spans": ORACLE_STRIP_SPANS,
    "corpus_source_overlap": ORACLE_SOURCE_OVERLAP,
    "corpus_pii_scrub": ORACLE_PII_SCRUB,
    "corpus_mixture_weights": ORACLE_MIXTURE_WEIGHTS,
    "corpus_blocklist_scrub": ORACLE_BLOCKLIST_SCRUB,
    "corpus_stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "corpus_winnowing_fps": ORACLE_WINNOWING,
}


# Batch/corpus split for the incremental admission gate: every 5th doc
# is "arriving", the rest are the persisted corpus.
INCR_MOD = 5
INCR_REM = 4


def corpus_strip_spans_incremental(spark, sf_dir):
    """Ingest-time exact-substring dedup: the arriving batch is
    stripped against the persisted corpus's gram index (corpus
    occurrences are canonical; corpus text never rewritten) plus
    batch-internal first-occurrence dedup among corpus-unseen grams
    (operators/corpus.py::strip_duplicate_spans_incremental). All
    corpus-touching joins are cross-side only — the admission-gate
    shape dedup_containment_incremental established. The oracle
    expresses the same semantics in set logic: semi/anti membership
    against the corpus gram set, then rank->=2 cuts within the batch.
    """
    docs = _docs(spark, sf_dir)
    batch = docs.where(F.col("doc_id") % INCR_MOD == INCR_REM)
    corpus = docs.where(F.col("doc_id") % INCR_MOD != INCR_REM)
    from hha_spark.operators.corpus import strip_duplicate_spans_incremental

    return strip_duplicate_spans_incremental(batch, corpus, k=K)


ORACLE_STRIP_SPANS_INCR = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    occ AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+{K - 1}], ' ')) AS gram_key
      FROM t, LATERAL (
        SELECT unnest(generate_series(1, len(toks) - {K - 1})) AS i
      ) s
    ),
    occb AS (SELECT * FROM occ WHERE doc_id % {INCR_MOD} = {INCR_REM}),
    idx AS (SELECT DISTINCT gram_key FROM occ
            WHERE doc_id % {INCR_MOD} <> {INCR_REM}),
    seen AS (
      SELECT doc_id, pos FROM occb
      WHERE gram_key IN (SELECT gram_key FROM idx)),
    fresh AS (
      SELECT * FROM occb
      WHERE gram_key NOT IN (SELECT gram_key FROM idx)),
    ranked AS (
      SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY gram_key
                                ORDER BY doc_id, pos) AS rn
      FROM fresh),
    cutw AS (
      SELECT doc_id, pos FROM seen
      UNION ALL
      SELECT doc_id, pos FROM ranked WHERE rn >= 2),
    cutpos AS (
      SELECT DISTINCT doc_id, pos + j AS tokpos
      FROM cutw, LATERAL (
        SELECT unnest(generate_series(0, {K - 1})) AS j
      ) u),
    cuts AS (SELECT doc_id, list(tokpos) AS cut FROM cutpos
             GROUP BY doc_id)
    SELECT t.doc_id,
           coalesce(array_to_string(
             list_transform(
               list_filter(generate_series(0, len(toks) - 1),
                           i -> NOT list_contains(coalesce(cut, []), i)),
               i -> toks[i + 1]),
             ' '), '') AS clean_text,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(coalesce(len(cut), 0) AS BIGINT) AS n_removed
    FROM t LEFT JOIN cuts USING (doc_id)
    WHERE t.doc_id % {INCR_MOD} = {INCR_REM}
"""


QUERIES["corpus_strip_spans_incremental"] = corpus_strip_spans_incremental
ORACLES["corpus_strip_spans_incremental"] = ORACLE_STRIP_SPANS_INCR


# Benchmark split for the decontamination gate: every 50th doc plays
# the eval set; the rest are the training corpus.
DECON_MOD = 50


def corpus_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix-C / PaLM eval-leakage
    gate): per training doc, k-gram collisions against the benchmark
    gram set with a drop-on-any-hit verdict and the distinct-benchmark
    -docs-hit audit column (operators/corpus.py::
    benchmark_decontaminate). Benchmark side broadcasts; train never
    pairs with train.

    Relationship to `benchmark_contamination` (queries/llm_ops.py),
    which scans distinct shared shingles per doc: this gate is the
    DECISION layer on top of that signal — positional window counts
    (how much text is implicated, not just how many distinct grams),
    per-benchmark-doc attribution (which eval docs leaked), the total
    window denominator, and the removal verdict itself, at the longer
    k=5 gram the removal policy uses."""
    from hha_spark.operators.corpus import benchmark_decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % DECON_MOD == 0)
    train = docs.where(F.col("doc_id") % DECON_MOD != 0)
    return benchmark_decontaminate(train, bench, k=K)


ORACLE_DECONTAMINATE = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    occ AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+{K - 1}], ' ')) AS gram_key
      FROM t, LATERAL (
        SELECT unnest(generate_series(1, len(toks) - {K - 1})) AS i
      ) s
    ),
    trainocc AS (SELECT * FROM occ WHERE doc_id % {DECON_MOD} <> 0),
    bg AS (SELECT DISTINCT gram_key, doc_id AS bench_doc FROM occ
           WHERE doc_id % {DECON_MOD} = 0),
    hits AS (
      SELECT o.doc_id,
             CAST(COUNT(DISTINCT o.pos) AS BIGINT) AS n_contaminated,
             CAST(COUNT(DISTINCT b.bench_doc) AS BIGINT)
                 AS n_bench_docs_hit
      FROM trainocc o JOIN bg b USING (gram_key)
      GROUP BY o.doc_id),
    tot AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows
      FROM trainocc GROUP BY doc_id)
    SELECT t.doc_id, t.n_windows,
           CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CAST(coalesce(h.n_bench_docs_hit, 0) AS BIGINT)
               AS n_bench_docs_hit,
           coalesce(h.n_contaminated, 0) > 0 AS drop
    FROM tot t LEFT JOIN hits h USING (doc_id)
"""


QUERIES["corpus_decontaminate"] = corpus_decontaminate
ORACLES["corpus_decontaminate"] = ORACLE_DECONTAMINATE


def corpus_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty: of a doc's DISTINCT k-grams, the
    fraction whose globally-first occurrence (min doc_id, the stable
    ingestion-order surrogate) is THIS doc — the curriculum /
    marginal-information signal (a doc full of already-seen grams adds
    little; RHO-style selection and dedup-aware mixing both start
    here).

    Scale shape: distinct (doc, gram) pairs -> per-gram MIN(doc_id)
    (combinable, one gram-keyed shuffle) -> join back on gram_key
    (co-partitioned with the agg, no extra exchange) -> per-doc
    counts (doc-keyed shuffle). Nothing pairwise, no position data
    carried; novelty_ppm is a single integer division.
    """
    from hha_spark.operators.corpus import kgram_frame

    docs = _docs(spark, sf_dir)
    dg = (
        kgram_frame(docs, k=K)
        .select("doc_id", "gram_key")
        .distinct()
    )
    first = dg.groupBy("gram_key").agg(F.min("doc_id").alias("first_doc"))
    return (
        dg.join(first, on="gram_key")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel_grams"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("n_novel_grams * 1000000 DIV n_distinct_grams").cast(
                "long"
            ),
        )
    )


ORACLE_NGRAM_NOVELTY = f"""
    {_ORACLE_GRAMS},
    dg AS (SELECT DISTINCT doc_id, gram_key FROM g),
    fst AS (SELECT gram_key, MIN(doc_id) AS first_doc
            FROM dg GROUP BY gram_key)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel_grams,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM dg JOIN fst USING (gram_key)
    GROUP BY doc_id
"""


QUERIES["corpus_ngram_novelty"] = corpus_ngram_novelty
ORACLES["corpus_ngram_novelty"] = ORACLE_NGRAM_NOVELTY


def corpus_temperature_mixture(spark, sf_dir):
    """UniMax / T5 temperature-scaled (tau=2) per-source sampling
    weights for the same 50% token budget as corpus_mixture_weights —
    share proportional to sqrt(n_tokens) instead of uniform, the
    standard multilingual compromise between proportional and uniform
    sampling. Exact-integer isqrt on both engines (see
    operators/corpus.py::temperature_mixture)."""
    from hha_spark.operators.corpus import temperature_mixture

    return temperature_mixture(_docs(spark, sf_dir), budget_frac_pct=BUDGET_PCT)


def _mixture_ctes(per_sql: str | None = None) -> str:
    """Shared oracle fragment: the full temperature-mixture readout as
    a `mix` relation — ONE definition consumed by the mixture gate,
    the budget-fill gate, and (with `per_sql`) the graph-cluster
    mixture gate, so they can never check diverging semantics.
    `per_sql` overrides the default per-SOURCE statistics query; it
    must yield (source, n_docs BIGINT, n_tokens BIGINT) — `source`
    being whatever grouping the caller mixes over (corpus source,
    cluster id, ...). HUGEINT intermediates mirror the Spark side's
    DECIMAL(38,0) products (overflow-free past the ~7e12-token int64
    wrap point); every exported column is CAST BIGINT."""
    from hha_spark.operators.corpus import _isqrt_sql

    w = _isqrt_sql("n_tokens")
    tgt = (
        f"(CAST(total_tokens AS HUGEINT) * {BUDGET_PCT} // 100)"
        " * w_sqrt // total_w"
    )
    if per_sql is None:
        per_sql = """
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source"""
    return f"""per AS ({per_sql}
    ),
    weighted AS (SELECT *, {w} AS w_sqrt FROM per),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(w_sqrt) AS BIGINT) AS total_w
      FROM weighted
    ),
    mix AS (
      SELECT source, n_docs, n_tokens, w_sqrt,
             CAST(CAST(w_sqrt AS HUGEINT) * 1000000 // total_w AS BIGINT)
               AS share_ppm,
             CAST({tgt} AS BIGINT) AS target_tokens,
             CAST(least(CAST(n_tokens AS HUGEINT), {tgt}) AS BIGINT)
               AS sampled_tokens,
             CAST(({tgt}) * 1000000 // n_tokens AS BIGINT)
               AS oversample_ppm
      FROM weighted, tot
    )"""


def _temperature_oracle() -> str:
    return f"""
    WITH {_mixture_ctes()}
    SELECT * FROM mix
"""


QUERIES["corpus_temperature_mixture"] = corpus_temperature_mixture
ORACLES["corpus_temperature_mixture"] = _temperature_oracle()



def corpus_token_budget_fill(spark, sf_dir):
    """Greedy deterministic keep-list hitting the temperature-mixture
    token targets: salted-md5 order inside each source, keep while the
    running total before the doc is under target (overshoot <= 1 doc).
    See operators/corpus.py::token_budget_fill. A green row proves the
    mixture computation AND its execution composed."""
    from hha_spark.operators.corpus import token_budget_fill

    return token_budget_fill(
        _docs(spark, sf_dir), budget_frac_pct=BUDGET_PCT, salt=FILL_SALT
    )


def _budget_fill_oracle() -> str:
    return f"""
    WITH {_mixture_ctes()},
    targets AS (SELECT source, target_tokens FROM mix),
    d AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR) || '|{FILL_SALT}') AS h
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, n_tokens,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY h, doc_id) AS BIGINT)
               AS pick_rank,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY h, doc_id) AS BIGINT)
               AS cum_tokens
      FROM d
    )
    SELECT r.doc_id, r.source, r.n_tokens, r.pick_rank, r.cum_tokens,
           t.target_tokens,
           (r.cum_tokens - r.n_tokens) < t.target_tokens AS kept
    FROM r JOIN targets t USING (source)
"""


QUERIES["corpus_token_budget_fill"] = corpus_token_budget_fill
ORACLES["corpus_token_budget_fill"] = _budget_fill_oracle()


def curation_funnel(docs: DataFrame) -> DataFrame:
    """The reusable docs-frame chain behind corpus_curation_pipeline
    (and the weak-scaling probe): Gopher rules -> near-dup dedup of
    the survivors -> temperature mixture -> budget fill -> per-source
    funnel rollup. See corpus_curation_pipeline for semantics and the
    scale argument."""
    from hha_spark.caching import tracked_persist
    from hha_spark.operators.cluster import cluster_members
    from hha_spark.operators.corpus import funnel_rollup, token_budget_fill
    from hha_spark.operators.dedup import with_token_set
    from hha_spark.operators.text import gopher_repetition_rules
    from hha_spark.queries.llm_ops import _minhash_lsh_from

    # narrow gopher map with source/text carried through — the keep
    # filter needs no semi-join back to the docs frame
    quality = tracked_persist(
        gopher_repetition_rules(docs, carry_cols=("source", "text"))
        .where("keep")
        .select("doc_id", "source", "text")
    )
    pairs = _minhash_lsh_from(with_token_set(quality)).select(
        "doc_id_a", "doc_id_b"
    )
    # min-label components: cluster_id IS the minimum member doc_id,
    # so the keep-min-id dedup policy is a doc_id != cluster_id drop
    drops = (
        cluster_members(pairs)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    unique = quality.join(drops, "doc_id", "left_anti")
    fill = token_budget_fill(
        unique, budget_frac_pct=BUDGET_PCT, salt=FILL_SALT
    )
    raw_stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_raw")
    )
    q_stats = quality.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_quality")
    )
    return funnel_rollup(raw_stats, q_stats, fill)


def corpus_curation_pipeline(spark, sf_dir):
    """END-TO-END curation pipeline as ONE gate: Gopher quality rules
    -> MinHash-LSH near-dup clustering OF THE SURVIVORS (keep the
    minimum doc_id per transitive cluster) -> temperature mixture
    over the deduped set -> token-budget fill, rolled up per source.
    Every stage is an already-verified operator (text_gopher_quality;
    the dedup_minhash_lsh/dedup_clusters pair machinery;
    temperature_mixture; token_budget_fill); what this gate adds —
    and what no per-stage green row proves — is that they COMPOSE:
    the near-dup pairs and their transitive closure are computed
    within the quality survivors (815 pairs among 191 docs at
    sf0.01, vs 3538 corpus-wide — a different graph), the mixture
    statistics come from the deduped set (not the raw corpus), and
    the fill executes those recomputed targets. The oracle rebuilds
    the entire chain from `documents` in one SQL statement
    (gopher CTE -> parameterized minhash-pairs CTE -> recursive-CTE
    closure -> min-id survivors -> shared mixture CTEs -> fill).

    Output: one row per raw source with exact-integer funnel counts —
    n_docs_raw -> n_docs_quality -> n_docs_unique (+ token mass,
    mixture target, kept docs/tokens). A source filtered away
    entirely reports zeros (LEFT joins from the raw side).

    Scale shape: the quality verdict is a doc-keyed semi-join; pairs
    are banded LSH (never all-pairs) with bucket caps; the closure is
    the O(log n) label-propagation kernel; mixture targets are a
    source-count-sized broadcast inside token_budget_fill; the final
    rollup joins are over source-count-sized aggregates (broadcast).
    No stage materializes more than the surviving docs. Weak-scaling
    measured in the round-8 deep probe (tools/scale_probe.py
    curation_pipeline).
    """
    return curation_funnel(_docs(spark, sf_dir))


def _curation_pipeline_oracle() -> str:
    from hha_spark.queries.llm_ops import ORACLE_GOPHER, _minhash_pairs_sql

    uniq_stats = """
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM uniq GROUP BY source"""
    return f"""
    WITH RECURSIVE
    gop AS (SELECT doc_id FROM ({ORACLE_GOPHER}) g WHERE g.keep),
    qd AS (
      SELECT d.doc_id, d.source, d.text
      FROM documents d JOIN gop USING (doc_id)
    ),
    pairs AS (
      SELECT doc_id_a, doc_id_b FROM ({_minhash_pairs_sql("qd")}) p
    ),
    e AS (SELECT doc_id_a AS u, doc_id_b AS v FROM pairs
          UNION SELECT doc_id_b, doc_id_a FROM pairs),
    reach(node, r) AS (
      SELECT u, u FROM e
      UNION
      SELECT e2.u, reach.r FROM e e2 JOIN reach ON e2.v = reach.node),
    labels AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
    uniq AS (
      SELECT qd.doc_id, qd.source, qd.text
      FROM qd LEFT JOIN labels ON qd.doc_id = labels.node
      WHERE labels.node IS NULL OR qd.doc_id = labels.cluster_id
    ),
    {_mixture_ctes(per_sql=uniq_stats)},
    d2 AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR) || '|{FILL_SALT}') AS h
      FROM uniq
    ),
    r AS (
      SELECT source, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS cum
      FROM d2
    ),
    fill AS (
      SELECT r.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs_unique,
             CAST(SUM(r.n_tokens) AS BIGINT) AS n_tokens_unique,
             CAST(MIN(m.target_tokens) AS BIGINT) AS target_tokens,
             CAST(SUM(CASE WHEN r.cum - r.n_tokens < m.target_tokens
                           THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
             CAST(SUM(CASE WHEN r.cum - r.n_tokens < m.target_tokens
                           THEN r.n_tokens ELSE 0 END) AS BIGINT)
               AS kept_tokens
      FROM r JOIN mix m USING (source) GROUP BY r.source
    ),
    raw AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_raw
      FROM documents GROUP BY source
    ),
    qc AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_quality
      FROM qd GROUP BY source
    )
    SELECT raw.source, raw.n_docs_raw,
           CAST(COALESCE(qc.n_docs_quality, 0) AS BIGINT) AS n_docs_quality,
           CAST(COALESCE(f.n_docs_unique, 0) AS BIGINT) AS n_docs_unique,
           CAST(COALESCE(f.n_tokens_unique, 0) AS BIGINT) AS n_tokens_unique,
           CAST(COALESCE(f.target_tokens, 0) AS BIGINT) AS target_tokens,
           CAST(COALESCE(f.kept_docs, 0) AS BIGINT) AS kept_docs,
           CAST(COALESCE(f.kept_tokens, 0) AS BIGINT) AS kept_tokens
    FROM raw LEFT JOIN qc USING (source) LEFT JOIN fill f USING (source)
"""


QUERIES["corpus_curation_pipeline"] = corpus_curation_pipeline
ORACLES["corpus_curation_pipeline"] = _curation_pipeline_oracle()
