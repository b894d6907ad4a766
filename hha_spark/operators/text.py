"""Text-analysis operators: statistics, language ID, quality scoring,
fingerprinting, token counting.

All JVM-side (built-in functions only — no Python UDFs in any hot
path), so every operator stays inside whole-stage codegen and scales
as a narrow map + optional aggregate.

Cross-engine determinism: counts and lengths are integers; ratios are
single divisions of exact integers (correctly rounded doubles,
identical everywhere); classifications are CASE over integer
comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in"],
    "es": ["el", "la", "de", "los", "las", "y"],
    "de": ["der", "die", "das", "und", "ein"],
    "fr": ["le", "les", "des", "et", "un"],
}

WORD_RE = "[a-z0-9]+"


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def text_stats(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token/char statistics.

    mean_token_len relies on single-space separation:
    chars_in_tokens = len(text) - (n_tokens - 1).
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        n_chars.alias("n_chars"),
        ((n_chars - (n_tokens - F.lit(1))) / n_tokens).alias("mean_token_len"),
    )


def language_id(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language guess (deterministic argmax, fixed
    precedence en > es > de > fr > unknown)."""
    hits = {}
    for lang, words in STOPWORDS.items():
        in_list = ", ".join(f"'{w}'" for w in words)
        hits[lang] = F.expr(
            f"size(filter(split({text_col}, ' '), t -> t IN ({in_list})))"
        )
    guess = (
        F.when(
            (hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"])
            & (hits["en"] >= hits["fr"]) & (hits["en"] > 0), "en")
        .when((hits["es"] >= hits["de"]) & (hits["es"] >= hits["fr"])
              & (hits["es"] > 0), "es")
        .when((hits["de"] >= hits["fr"]) & (hits["de"] > 0), "de")
        .when(hits["fr"] > 0, "fr")
        .otherwise("unknown")
    )
    return df.select(
        F.col(id_col),
        *[hits[lang].alias(f"hits_{lang}") for lang in STOPWORDS],
        guess.alias("lang_guess"),
    )


def quality_score(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Integer quality score + class.

    +1 length in a sane band, +1 lexical diversity (distinct/total
    >= 0.3, tested as 10*distinct >= 3*total), +1 contains a common
    function word. Class: 3 -> high, 2 -> medium, else low.
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    score = (
        F.when((n_tokens >= 20) & (n_tokens <= 400), 1).otherwise(0)
        + F.when(F.lit(10) * n_distinct >= F.lit(3) * n_tokens, 1).otherwise(0)
        + F.when(F.array_contains(toks, "the"), 1).otherwise(0)
    )
    return (
        df.select(F.col(id_col), score.alias("quality_score"))
        .withColumn(
            "quality_class",
            F.when(F.col("quality_score") >= 3, "high")
            .when(F.col("quality_score") == 2, "medium")
            .otherwise("low"),
        )
    )


def gopher_repetition_rules(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style repetition/composition quality rules (Rae et al.
    2021, "Scaling Language Models", Table A1), adapted to token
    granularity (the fixture corpus is single-line, so the paper's
    line/paragraph duplicate rules map to token/bigram repetition):

      keep <=>  30 <= n_tokens <= 90
            AND top_tok_n    < 12% of n_tokens   (mode-token cap)
            AND n_distinct  >= 40% of n_tokens   (diversity floor)
            AND dup_bigram_n <= 20% of n_bigrams (repeated-2gram cap)

    All four tests are exact integer cross-multiplications — no
    ratios cross the engine boundary. Output carries the raw counts
    so downstream thresholds can be re-tuned without recomputing;
    `carry_cols` passes input columns through (e.g. source/text) so
    a keep-filter consumer needs no join back to the input.

    Scale shape: an ARROW-VECTORIZED PURE MAP — one pandas UDF
    computes all five counts per document batch (no explode, no
    groupBy, no join), so the operator is shuffle-free and immune to
    doc_id skew; Catalyst extracts the UDF into a single
    ArrowEvalPython node, so a downstream `.where("keep")` reads
    struct fields of the materialized result instead of inlining the
    computation into the filter. This is the measured-fastest of
    four shapes at 80k docs / 32 threads: 2.5 s here vs ~7.2 s for
    the best Catalyst lambda-HOF expression (higher-order lambdas
    are CodegenFallback — interpreted, ~3 ms CPU per doc), ~14 s for
    the pre-r11 layered-projection shape (the keep filter inlined 4
    aggregate() + 13 split() copies), and ~2.5 s (plus two
    exchanges) for the explode/groupBy shape this replaced in r10.
    Python-side cost is ~30 us per doc (two Counters over the token
    list); the Arrow batch transfer ships text once. Counts are
    plain integers, so the DuckDB oracle (which mirrors the
    sorted-run SQL formulation) stays value-exact. Rows with NULL
    text drop from the output, matching the explode shape this
    replaced (explode of a null array emits nothing).

    Tokenization parity: Python str.split(" ") == Spark
    split(text, ' ', -1) == DuckDB string_split for the
    single-space pattern, including empty strings from consecutive
    or trailing spaces (tokens cannot contain spaces, so bigram
    (t1, t2) pair counts equal the "t1 t2" joined-string counts the
    oracle computes).

    At sf0.01 the rule set keeps 191/500 docs (measured), so the
    gate exercises both branches.
    """
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    # NB: annotations are set as real objects below, not inline —
    # this module has `from __future__ import annotations`, which
    # stringifies inline hints and breaks pandas_udf's type-hint
    # inference ("Unsupported signature: (text: 'pd.Series')")
    def _gopher_counts(text):
        from collections import Counter

        rows = {
            "n_tokens": [], "n_distinct": [], "top_tok_n": [],
            "n_bigrams": [], "dup_bigram_n": [], "keep": [],
        }
        for t in text:
            toks = t.split(" ")
            n = len(toks)
            cnt = Counter(toks)
            top = max(cnt.values())
            bg = Counter(zip(toks, toks[1:]))
            dup = sum(v for v in bg.values() if v >= 2)
            nb = n - 1 if n >= 2 else 0
            rows["n_tokens"].append(n)
            rows["n_distinct"].append(len(cnt))
            rows["top_tok_n"].append(top)
            rows["n_bigrams"].append(nb)
            rows["dup_bigram_n"].append(dup)
            rows["keep"].append(
                30 <= n <= 90
                and top * 100 < n * 12
                and len(cnt) * 100 >= n * 40
                and dup * 100 <= nb * 20
            )
        return pd.DataFrame(rows)

    _gopher_counts.__annotations__ = {
        "text": pd.Series, "return": pd.DataFrame,
    }
    _gopher_counts = pandas_udf(
        "struct<n_tokens: long, n_distinct: long, top_tok_n: long,"
        " n_bigrams: long, dup_bigram_n: long, keep: boolean>"
    )(_gopher_counts)

    return df.where(f"{text_col} IS NOT NULL").select(
        *carry_cols,
        F.col(id_col).alias("doc_id"),
        _gopher_counts(F.col(text_col)).alias("_g"),
    ).selectExpr(
        *carry_cols,
        "doc_id",
        "_g.n_tokens AS n_tokens",
        "_g.n_distinct AS n_distinct",
        "_g.top_tok_n AS top_tok_n",
        "_g.n_bigrams AS n_bigrams",
        "_g.dup_bigram_n AS dup_bigram_n",
        "_g.keep AS keep",
    )


def fingerprint(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase
    text, plus the 16-hex-char short form used for sharded lookup."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp"),
        F.substring(F.md5(norm), 1, 16).alias("fp16"),
    )


def unigram_lm_scores(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    head_k: int = 1024, carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Corpus-unigram-LM document scoring — the KenLM-perplexity-filter
    shape (CCNet / Gopher pipelines) with an integer-exact surrogate:
    each document is scored by the corpus-wide frequency of its own
    tokens (sum / floor-mean / min). Rare-token documents (low avg_tf,
    min_tf) are the high-perplexity tail a quality filter drops;
    min_tf=1 flags docs containing corpus-hapax garbage.

    Integer counts stand in for log-probabilities so the score is
    bit-identical cross-engine (ln() is not); the ORDERING of docs is
    what the filter consumes, and tf-order equals (-log p)-reverse-
    order exactly.

    int64 envelope (sum_tf): bounded by doc length x top-token corpus
    count. At ~1e13 corpus tokens the Zipf head tops out around 1e12,
    so wrap needs a single document past ~9e6 tokens made ENTIRELY of
    that one token — outside this operator's intended input (chunked
    docs; doc_chunking upstream). This is a declared-schema bound,
    not an intermediate-arithmetic one (contrast bigram_q_col, whose
    product wraps while its OUTPUT always fits and therefore runs in
    DECIMAL): a sum_tf past int64 cannot be emitted as BIGINT at all,
    so the contract documents the envelope instead of widening the
    column.

    `carry_cols` are doc-constant columns (e.g. lang) carried through
    the token frame into the per-doc groupBy keys, so callers needing
    them avoid re-joining the scores back to the doc table on id —
    that join is a second full exchange of a doc-level projection,
    while carrying a short doc-constant column costs only its bytes
    inside the one token shuffle that already happens (the vocabulary
    branch prunes it entirely).

    Scale shape: the token->count join is the classic skew trap — a
    stopword head token can carry 5%+ of ALL rows. Mitigation here is
    the standard head/tail split: the top `head_k` vocabulary entries
    (which cover most row mass) broadcast and join map-side with no
    shuffle of their rows; only the long tail — whose per-key
    cardinality is by construction below the head cutoff — takes the
    shuffle join, so no reducer sees a hot key. The vocab aggregate
    itself is map-side combinable (partial counts per token per
    partition), never skewed.
    """
    toks = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    from hha_spark.caching import tracked_persist

    # the DAG references vocab from THREE branches (head top-k, the
    # broadcast tag, the tail join); Spark's exchange reuse does not
    # unify them across the union, so without a persist the
    # vocabulary aggregate's shuffle runs three times (plan-verified:
    # exchanges at each branch). vocab is vocabulary-sized — the
    # aggregate output, never the token stream — so pinning it is the
    # bounded-artifact persist the caching contract exists for.
    vocab = tracked_persist(
        toks.groupBy("token").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
    )
    # TakeOrdered top-k — vocab-sized sort, never data-sized
    head = vocab.orderBy(F.desc("tf"), F.asc("token")).limit(head_k)
    tagged = toks.join(F.broadcast(head), on="token", how="left")
    tail_scored = (
        tagged.where(F.col("tf").isNull())
        .drop("tf")
        .join(vocab, on="token")  # head keys removed -> no hot reducer
    )
    scored = tagged.where(F.col("tf").isNotNull()).unionByName(tail_scored)
    return scored.groupBy(id_col, *carry_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("tf").cast("long").alias("sum_tf"),
        F.min("tf").cast("long").alias("min_tf"),
        F.expr("sum(tf) div count(1)").alias("avg_tf"),
    )


def perplexity_buckets(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    lang_col: str = "lang", n_buckets: int = 3, head_k: int = 1024,
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing: rank every
    document within its language by the unigram-LM score
    (:func:`unigram_lm_scores` avg_tf — high = common tokens = low
    perplexity) and split each language into `n_buckets` equal-count
    buckets (head / middle / tail for the default 3). CCNet trains on
    head+middle and drops the tail, so `keep` is bucket < last.

    Ties are broken by doc_id, making the ranking a total order and
    the bucket assignment exactly reproducible on both engines; the
    bucket boundary is the integer expression (rank-1)*k DIV n, which
    matches NTILE's first-buckets-get-the-remainder split without
    depending on either engine's NTILE tie semantics.

    Scale shape: scoring inherits unigram_lm_scores' skew-split
    vocabulary join, with lang CARRIED through the scoring aggregate
    (carry_cols) rather than re-joined on doc_id — the join was a
    second full exchange of a doc-level projection on top of the
    aggregate's own; the per-language rank is then a window over the
    (doc_id, lang, avg_tf) projection — three narrow columns, one
    shuffle keyed by language. A single language dominating the
    corpus makes that window one giant partition; the scale fix is
    the two-phase rank refinement (operators/rank.py): approximate
    per-language avg_tf cut points from a sample, exact rank only
    inside the boundary bands. At fixture scale the direct window is
    the right plan.
    """
    from pyspark.sql import Window

    labeled = unigram_lm_scores(
        df, text_col=text_col, id_col=id_col, head_k=head_k,
        carry_cols=(lang_col,),
    )
    w_rank = Window.partitionBy(lang_col).orderBy(
        F.col("avg_tf").desc(), F.col(id_col).asc()
    )
    w_lang = Window.partitionBy(lang_col)
    ranked = labeled.select(
        F.col(id_col),
        F.col(lang_col),
        F.col("avg_tf"),
        F.row_number().over(w_rank).cast("long").alias("ppl_rank"),
        F.count(F.lit(1)).over(w_lang).cast("long").alias("n_lang"),
    )
    bucket_id = F.expr(f"(ppl_rank - 1) * {n_buckets} div n_lang")
    return ranked.select(
        id_col,
        lang_col,
        "avg_tf",
        "ppl_rank",
        "n_lang",
        F.when(bucket_id == 0, "head")
        .when(bucket_id == n_buckets - 1, "tail")
        .otherwise("middle")
        .alias("bucket"),
        (bucket_id < n_buckets - 1).alias("keep"),
    )


def bigram_q_col():
    """The bigram conditional-probability surrogate as a Column over
    (c1, c2) stats: CAST(c2 AS DECIMAL(38,0)) * 1e6 DIV c1, cast back
    to BIGINT.

    Overflow contract (the dsir_bucket_ratios discipline): c2 * 1e6
    wraps int64 once a single bigram passes ~9.2e12 occurrences —
    inside the 100 TB envelope for a boilerplate-heavy crawl (a 10%
    boilerplate bigram over ~1e13 tokens is within an order of it),
    and Spark (non-ANSI) wraps silently where DuckDB raises, so the
    product runs in DECIMAL(38,0) (HUGEINT in the oracle). The
    quotient always fits BIGINT: c2 <= c1, so q <= 1e6. Unit-tested
    past the wrap in test_scoring.py."""
    return F.expr(
        "CAST(CAST(c2 AS DECIMAL(38,0)) * 1000000 DIV c1 AS BIGINT)"
    ).alias("q")


def bigram_lm_scores(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document order-2 LM score: how typical are this doc's token
    TRANSITIONS under the corpus bigram statistics? The order-2
    complement of :func:`unigram_lm_scores` — a doc of individually
    common tokens in a nonsense order scores low here while passing
    the unigram gate (the classic perplexity-filter blind spot).

    For each bigram occurrence (w1, w2): the conditional-probability
    surrogate q = (c(w1,w2) * 1e6) DIV c(w1) — exact non-negative
    integer division on both engines; c(w1,w2) <= c(w1) always (every
    bigram occurrence is a w1 occurrence), so q is in [0, 1e6]. Per
    doc: n_bigrams, sum_q, min_q (the rare-transition flag — one
    never-seen-elsewhere transition drives it to the floor), and
    avg_q = sum_q DIV n_bigrams. The q product runs past int64 (see
    :func:`bigram_q_col`); sum_q is int64-safe by a wide margin
    (q <= 1e6 times doc length).

    Scale shape: one pair explode (narrow; pairs built from the
    pre-split `toks` array, never by re-splitting per window), two
    map-side-combinable keyed aggregates (bigram counts, unigram
    counts), ONE aggregate-level join (bigram stats to prefix counts
    — vocabulary-sized, not corpus-sized), then one equi-join of
    occurrences to the stats table on (w1, w2) and a per-doc rollup.
    Same skew profile as the unigram scorer; the Zipf head is flatter
    at order 2, so no head/tail split is needed.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("toks"),
    )
    pair_expr = (
        "CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks) - 1), i -> "
        "named_struct('w1', element_at(toks, i),"
        " 'w2', element_at(toks, i + 1)))"
        " ELSE array() END"
    )
    occ = toks.select(
        "doc_id", F.explode(F.expr(pair_expr)).alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c1 = (
        toks.select(F.explode("toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    c2 = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    stats = c2.join(c1, "w1").select("w1", "w2", bigram_q_col())
    scored = (
        occ.join(stats, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("q").cast("long").alias("sum_q"),
            F.min("q").cast("long").alias("min_q"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("sum_q", F.lit(0)).cast("long").alias("sum_q"),
        F.coalesce("min_q", F.lit(0)).cast("long").alias("min_q"),
        F.when(
            F.coalesce("n_bigrams", F.lit(0)) > 0,
            F.expr("sum_q DIV n_bigrams"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("avg_q"),
    )


def source_token_divergence(
    df: DataFrame, *, text_col: str = "text", group_col: str = "source",
) -> DataFrame:
    """Exact L1 divergence between each group's token distribution and
    the whole corpus's — the domain-mixing QA check ("is src7 even the
    same kind of text?") behind mixture-weight decisions.

    true L1 = sum_t |P_grp(t) - P_corpus(t)|
            = sum_t |obs*T - s*t| / (s*T)

    with obs = group's count of token t, s = group total, t = corpus
    count, T = corpus total. Tokens ABSENT from the group contribute
    s*t/(s*T); rather than materializing the group x vocab cross
    product, that absent mass folds in algebraically:

        sum_absent s*t = s*T - sum_present s*t

    so only OBSERVED (group, token) pairs are ever shuffled. Numerator
    and denominator are exact BIGINTs; the single final division is a
    correctly-rounded double (house determinism rule). Overflow
    envelope: |obs*T| <= s*T <= T^2 — safe through ~3e9 total tokens;
    beyond that, pre-scale counts to per-million before the cross
    multiply (same ordering, documented loss of exactness).
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    obs = toks.groupBy("grp", "token").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    s_tot = obs.groupBy("grp").agg(F.sum("obs").cast("long").alias("s_cnt"))
    t_tot = obs.groupBy("token").agg(
        F.sum("obs").cast("long").alias("t_cnt")
    )
    total = t_tot.agg(F.sum("t_cnt").cast("long").alias("tot_cnt"))
    joined = (
        obs.join(F.broadcast(t_tot), on="token")
        .join(F.broadcast(s_tot), on="grp")
        .join(F.broadcast(total))
    )
    per = joined.groupBy("grp").agg(
        F.min("s_cnt").alias("grp_tokens"),
        F.min("tot_cnt").alias("corpus_tokens"),
        F.sum(
            F.abs(
                F.col("obs") * F.col("tot_cnt")
                - F.col("s_cnt") * F.col("t_cnt")
            )
        ).cast("long").alias("present_num"),
        F.sum(F.col("s_cnt") * F.col("t_cnt")).cast("long")
        .alias("present_st"),
    )
    l1_num = (
        F.col("present_num")
        + (F.col("grp_tokens") * F.col("corpus_tokens") - F.col("present_st"))
    )
    l1_den = F.col("grp_tokens") * F.col("corpus_tokens")
    return per.select(
        F.col("grp").alias(group_col),
        F.col("grp_tokens"),
        l1_num.cast("long").alias("l1_num"),
        l1_den.cast("long").alias("l1_den"),
        (l1_num / l1_den).alias("l1"),
    )


def token_count_regex(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """BPE-ish token counting: alnum runs extracted by regex (a
    portable stand-in for a real tokenizer's pre-tokenization)."""
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(WORD_RE), 0)).alias(
            "n_word_tokens"
        ),
    )


BPE_MERGE_SEP = "@@"


def bpe_train_merges(
    docs: DataFrame, *, n_merges: int = 3, text_col: str = "text"
) -> DataFrame:
    """The actual BPE training LOOP at corpus scale: n_merges rounds
    of (distributed adjacent-pair count) -> (argmax merge, ties by
    pair text) -> (apply the merge corpus-wide), returning one row
    per learned merge (step, a, b, cnt). `bpe_merge_candidates` is
    one round's counting stage; this is the iterative trainer built
    on it — the same driver-loop discipline as IVF's Lloyd rounds:
    per round ONE map-side-combinable aggregate, a 1-ROW TakeOrdered
    collect (the model artifact), and a narrow string map.

    The merge application is a PLAIN substring replace, identical on
    any engine: the text is kept DOUBLE-SPACED (' a  b  c ') so every
    adjacent pair occurrence ' a  b ' is delimiter-bounded and
    non-overlapping, and greedy left-to-right replace() implements
    exactly BPE's merge semantics (in 'a a a', merging (a,a) merges
    the first two, leaving the third — the scan resumes after the
    replacement). Merged tokens join with '@@'. No regex, no
    lookbehind — DuckDB's RE2 oracle applies the very same replace.

    Each round's frame is the previous round's narrow map over one
    persisted base — lineage grows by one Project per round, no
    checkpointing needed for small n_merges.
    """
    spark = docs.sparkSession
    from hha_spark.caching import tracked_persist

    # persist the double-spaced base: every merge round re-derives its
    # working text from this frame (narrow replace chain), so without
    # the cache round k re-scans the corpus parquet and re-pads it —
    # n_merges full input scans for one pass worth of data (guide
    # §1.2, fewer passes). Session-scoped release via the registry.
    padded = tracked_persist(
        docs.select(
            F.expr(
                f"' ' || replace({text_col}, ' ', '  ') || ' '"
            ).alias("t")
        )
    )
    out_rows = []
    for step in range(1, n_merges + 1):
        toks = padded.select(
            F.split(F.expr("trim(t)"), "  ").alias("ts")
        )
        pairs = toks.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(ts) >= 2 THEN "
                    "transform(slice(ts, 1, size(ts) - 1), "
                    "(x, i) -> struct(x AS a, ts[i + 1] AS b)) "
                    "ELSE array() END"
                )
            ).alias("p")
        ).groupBy("p.a", "p.b").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        top = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        out_rows.append((step, a, b, cnt))
        pat, rep = f" {a}  {b} ", f" {a}{BPE_MERGE_SEP}{b} "
        padded = padded.select(
            F.replace(F.col("t"), F.lit(pat), F.lit(rep)).alias("t")
        )
    # Arrow table, not a Python RDD: the 3-row model artifact is
    # rescanned by every consumer (bpe_tokenize_compression collects
    # it; the oracle re-collects) — a Python-RDD frame pays one
    # Python worker task (~0.2 s protocol latency here) per scan;
    # the Arrow frame is a pure-JVM scan
    from hha_spark.functions.local import arrow_rows_frame

    return arrow_rows_frame(
        spark, out_rows, "step long, a string, b string, cnt long"
    )


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list as a tokenizer: fold each merge (in
    training order) over the corpus as the same double-spaced greedy
    replace the trainer used, and report per-doc token counts before
    and after — the compression the vocabulary actually buys, which
    is the metric that decides how many merges to train.

    Pure narrow map: one chained replace expression per merge, no
    shuffle at all; the merge list is a driver-side model artifact
    (the trainer's output), never data-sized.
    """
    t = F.expr(f"' ' || replace({text_col}, ' ', '  ') || ' '")
    for a, b in merges:
        t = F.replace(
            t, F.lit(f" {a}  {b} "), F.lit(f" {a}{BPE_MERGE_SEP}{b} ")
        )
    return docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_base"),
        F.size(F.split(F.trim(t), "  ")).cast("long").alias("n_merged"),
    )
