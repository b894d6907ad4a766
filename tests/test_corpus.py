"""Corpus operators: PII redaction semantics on crafted strings,
duplicated-span accounting, boilerplate capping, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from hha_spark.operators.corpus import (
    duplicated_span_stats,
    kgram_frame,
    mixture_weights,
    pii_scrub,
    source_overlap,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_pii_scrub_redacts_all_three_classes(spark):
    df = _docs(
        spark,
        [
            (1, "s", "mail me at alice.smith+x@example.co.uk today"),
            (2, "s", "server 10.0.255.3 answered then 192.168.1.1 dropped"),
            (3, "s", "card 1234567890123456 pin 9999 ok"),
            (4, "s", "bob@corp.io from 127.0.0.1 ref 20240813120000"),
            (5, "s", "nothing sensitive here"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["scrubbed_text"] == "mail me at <EMAIL> today"
    assert out[1]["n_emails"] == 1
    assert out[2]["scrubbed_text"] == "server <IP> answered then <IP> dropped"
    assert out[2]["n_ipv4"] == 2
    # 4-digit pin survives; 16-digit PAN is redacted
    assert out[3]["scrubbed_text"] == "card <NUM> pin 9999 ok"
    assert out[3]["n_digit_runs"] == 1
    # email local part consumed BEFORE digit-run pass; IP before digits
    assert out[4]["scrubbed_text"] == "<EMAIL> from <IP> ref <NUM>"
    assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_digit_runs"]) == (1, 1, 1)
    assert out[5]["scrubbed_text"] == "nothing sensitive here"


def test_kgram_frame_short_doc_yields_no_windows(spark):
    df = _docs(spark, [(1, "s", "a b c"), (2, "s", "a b c d e f")])
    grams = kgram_frame(df, k=5).collect()
    # doc 1 has 3 tokens < k -> zero windows (NOT a descending-sequence
    # artifact); doc 2 has 6 tokens -> 2 windows
    by_doc = {}
    for r in grams:
        by_doc.setdefault(r["doc_id"], []).append(r["gram"])
    assert 1 not in by_doc
    assert sorted(by_doc[2]) == ["a b c d e", "b c d e f"]


def test_duplicated_span_stats_counts_cross_doc_windows(spark):
    # docs 1 and 2 share the exact 5-gram "q w e r t"; doc 3 is unique;
    # doc 1 repeats the shared gram twice (two windows, one gram)
    df = _docs(
        spark,
        [
            (1, "s", "q w e r t q w e r t"),
            (2, "s", "x q w e r t y"),
            (3, "s", "k l m n o p"),
        ],
    )
    out = {r["doc_id"]: r for r in duplicated_span_stats(df, k=5).collect()}
    assert out[1]["n_grams"] == 6
    # windows at positions 1 and 6 are "q w e r t"
    assert out[1]["n_dup_windows"] == 2
    assert out[1]["n_dup_grams"] == 1
    assert out[2]["n_dup_windows"] == 1
    assert out[3]["n_dup_windows"] == 0
    assert out[3]["n_dup_grams"] == 0


def test_source_overlap_cap_excludes_boilerplate(spark):
    # gram "a b c d e" appears in ALL three sources; "p q r s t" in two.
    # With max_sources=2 the ubiquitous gram is dropped from pairing, so
    # (s1,s3) and (s2,s3) share nothing and don't appear at all.
    df = _docs(
        spark,
        [
            (1, "s1", "a b c d e p q r s t"),
            (2, "s2", "a b c d e p q r s t"),
            (3, "s3", "z a b c d e y"),
        ],
    )
    rows = source_overlap(df, k=5, max_sources=2).collect()
    pairs = {(r["source_a"], r["source_b"]): r for r in rows}
    assert set(pairs) == {("s1", "s2")}
    r = pairs[("s1", "s2")]
    # s1/s2 share all 6 of their grams minus the capped one -> 5 shared
    assert r["shared_grams"] == 5
    assert r["grams_a"] == 6 and r["grams_b"] == 6
    assert r["jaccard"] == 5 / 7


def test_mixture_weights_budget_split(spark):
    # two sources, 10 vs 30 tokens; 50% budget = 20, split 10 per source:
    # small source keeps everything (weight 1.0), big one downsamples
    df = _docs(
        spark,
        [
            (1, "small", " ".join(["a"] * 10)),
            (2, "big", " ".join(["b"] * 30)),
        ],
    )
    out = {r["source"]: r for r in mixture_weights(df, budget_frac_pct=50).collect()}
    assert out["small"]["target_tokens"] == 10
    assert out["small"]["sampled_tokens"] == 10
    assert out["small"]["weight"] == 1.0
    assert out["big"]["sampled_tokens"] == 10
    assert out["big"]["weight"] == 10 / 30


def test_temperature_mixture_sqrt_weighting(spark):
    # 100 vs 400 tokens: sqrt weights 10 vs 20, so the big source gets
    # 2x the share (not 4x as proportional would, not 1x as uniform
    # would); 50% budget = 250 tokens split 1:2.
    from hha_spark.operators.corpus import temperature_mixture

    df = _docs(
        spark,
        [
            (1, "small", " ".join(["a"] * 100)),
            (2, "big", " ".join(["b"] * 400)),
        ],
    )
    out = {
        r["source"]: r
        for r in temperature_mixture(df, budget_frac_pct=50).collect()
    }
    assert out["small"]["w_sqrt"] == 10 and out["big"]["w_sqrt"] == 20
    assert out["small"]["share_ppm"] == 1_000_000 * 10 // 30
    assert out["small"]["target_tokens"] == 250 * 10 // 30  # 83
    assert out["big"]["target_tokens"] == 250 * 20 // 30  # 166
    # small source is under-sized relative to its share -> never
    # oversampled beyond what it has? here 83 < 100 so both downsample
    assert out["small"]["sampled_tokens"] == 83
    assert out["big"]["oversample_ppm"] == 166 * 1_000_000 // 400


def test_exact_isqrt_boundary_values(spark):
    """isqrt is exact at perfect squares and their neighbours."""
    from hha_spark.operators.corpus import _exact_isqrt

    vals = [0, 1, 2, 3, 4, 8, 9, 10, 2**40 - 1, 2**40, 2**40 + 1,
            (2**26 - 1) ** 2, (2**26 - 1) ** 2 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    out = {r["n"]: r["s"] for r in df.select(
        "n", _exact_isqrt(F.col("n")).alias("s")).collect()}
    import math

    for v in vals:
        assert out[v] == math.isqrt(v), v


def test_token_budget_fill_greedy_invariants(spark):
    """Kept docs per source: prefix of the salted order, total within
    one doc of target, and dropping any kept doc stays under target."""
    from hha_spark.operators.corpus import token_budget_fill
    from hha_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = token_budget_fill(docs, budget_frac_pct=50).toPandas()
    for src, grp in out.groupby("source"):
        grp = grp.sort_values("pick_rank")
        kept = grp[grp["kept"]]
        target = grp["target_tokens"].iloc[0]
        # kept set is a rank prefix
        assert list(kept["pick_rank"]) == list(range(1, len(kept) + 1))
        if len(kept):
            total = kept["n_tokens"].sum()
            assert total - kept["n_tokens"].iloc[-1] < target
            # first dropped doc would NOT have fit
            assert total >= target or len(kept) == len(grp)


def test_pii_scrub_plan_is_narrow(spark):
    """The scrub is a pure map: no Exchange anywhere in the plan."""
    df = _docs(spark, [(1, "s", "x")])
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_kgram_explode_plan_has_no_shuffle(spark):
    df = _docs(spark, [(1, "s", "a b c d e f")])
    plan = kgram_frame(df, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_strip_duplicate_spans_hand_computed(spark):
    """k=3. Doc 2 shares windows 'a b c' (pos 0) and 'b c d' (pos 1)
    with doc 1 — both canonical in doc 1, so doc 2 loses positions
    {0,1,2} | {1,2,3} = {0..3} and keeps 'x y'. Doc 4 repeats its own
    prefix: the second 'p q r'/'q r s' occurrences are cut, keeping
    exactly one copy of the passage."""
    from hha_spark.operators.corpus import strip_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d x y"),
            (3, "z z z"),
            (4, "p q r s p q r s"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in strip_duplicate_spans(docs, k=3).collect()}
    assert out[1].clean_text == "a b c d e f" and out[1].n_removed == 0
    assert out[2].clean_text == "x y" and out[2].n_removed == 4
    assert out[3].clean_text == "z z z" and out[3].n_removed == 0
    assert out[4].clean_text == "p q r s" and out[4].n_removed == 4
    assert out[4].n_tokens == 8


def test_strip_duplicate_spans_full_doc_removal(spark):
    """An exact duplicate doc is cut to empty text (every window is
    non-canonical); the canonical doc survives untouched."""
    from hha_spark.operators.corpus import strip_duplicate_spans

    docs = spark.createDataFrame(
        [(1, "m n o p q"), (2, "m n o p q")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in strip_duplicate_spans(docs, k=3).collect()}
    assert out[1].clean_text == "m n o p q" and out[1].n_removed == 0
    assert out[2].clean_text == "" and out[2].n_removed == 5


# ---------------------------------------------------------------------------
# Incremental strip-spans (admission gate)
# ---------------------------------------------------------------------------


def _strip_frames(spark):
    corpus = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),
            (1, "x y z w v u t s"),
            (2, "a b c d e q r s t"),  # corpus-internal dup of doc 0's head
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "a b c d e n1 n2 n3"),          # head already in corpus
            (11, "p q r s t p2 q2 r2 s2 t2"),    # fresh, self-unique
            (12, "p2 q2 r2 s2 t2 k m"),          # dups doc 11's fresh tail
            (13, "m1 m2 m3 m4 m5 m6"),           # untouched
        ],
        "doc_id long, text string",
    )
    return corpus, batch


def test_strip_spans_incremental_equals_full_run_on_batch(spark):
    """With every corpus doc_id below every batch doc_id, the
    incremental admission strip must equal the whole-corpus strip of
    corpus UNION batch, restricted to batch docs."""
    from hha_spark.operators.corpus import (
        strip_duplicate_spans,
        strip_duplicate_spans_incremental,
    )

    corpus, batch = _strip_frames(spark)
    k = 5
    full = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in strip_duplicate_spans(corpus.unionByName(batch), k=k)
        .collect()
        if r["doc_id"] >= 10
    }
    incr = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in strip_duplicate_spans_incremental(batch, corpus, k=k)
        .collect()
    }
    assert incr == full
    # sanity on the fixture's intent
    assert incr[10][2] == 5  # corpus-known head window cut
    assert incr[11][2] == 0  # first occurrence of the fresh gram wins
    assert incr[12][2] == 5  # second occurrence cut
    assert incr[13][2] == 0


def test_strip_spans_incremental_plan_is_cross_side_only(spark):
    """The corpus side must appear only under semi/anti joins feeding
    the gram index — never self-paired. Assert no corpus-side
    equi-join produces corpus x corpus pairs: the physical plan
    contains exactly one LeftSemi and one LeftAnti against the index,
    and the only inner join keys are gram_key (batch-internal) and
    doc_id (rebuild)."""
    from hha_spark.operators.corpus import strip_duplicate_spans_incremental

    corpus, batch = _strip_frames(spark)
    plan = strip_duplicate_spans_incremental(batch, corpus, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_benchmark_decontaminate_hand_computed(spark):
    from hha_spark.operators.corpus import benchmark_decontaminate

    bench = spark.createDataFrame(
        [(100, "q1 q2 q3 q4 q5 x y"), (101, "r1 r2 r3 r4 r5")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains bench 100's gram q1..q5 AND bench 101's r1..r5
            (0, "q1 q2 q3 q4 q5 z r1 r2 r3 r4 r5"),
            # clean
            (1, "a b c d e f g"),
            # overlaps bench 100 with 2 windows (q1..q6 shares q1-5,q2-6? no:
            # q2 q3 q4 q5 x is a bench window too)
            (2, "q1 q2 q3 q4 q5 x n7"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in benchmark_decontaminate(train, bench, k=5).collect()
    }
    assert out[0]["n_windows"] == 7
    assert out[0]["n_contaminated"] == 2  # one window per bench doc
    assert out[0]["n_bench_docs_hit"] == 2
    assert out[0]["drop"] is True
    assert out[1]["n_contaminated"] == 0 and out[1]["drop"] is False
    assert out[2]["n_contaminated"] == 2  # q1-q5 and q2-x windows
    assert out[2]["n_bench_docs_hit"] == 1


def test_ngram_novelty_hand_computed(spark, monkeypatch):
    """Three docs sharing grams: the earliest doc owns every shared
    gram; later docs are novel only where they introduce new text."""
    import hha_spark.queries.corpus as qc
    from pyspark.sql import Row

    rows = [
        # doc 0: grams (a b c d e), (b c d e f) -- both first here
        Row(doc_id=0, text="a b c d e f", source="s"),
        # doc 1 repeats doc 0's text exactly: zero novel grams
        Row(doc_id=1, text="a b c d e f", source="s"),
        # doc 2: one repeated gram + one new gram
        Row(doc_id=2, text="a b c d e z", source="s"),
        # doc 3: too short for a 5-gram -> absent from output
        Row(doc_id=3, text="a b", source="s"),
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(qc, "_docs", lambda s, d: df)
    out = {
        r["doc_id"]: r
        for r in qc.corpus_ngram_novelty(spark, "unused").collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[0]["n_novel_grams"] == 2 and out[0]["novelty_ppm"] == 1_000_000
    assert out[1]["n_novel_grams"] == 0 and out[1]["novelty_ppm"] == 0
    assert out[2]["n_distinct_grams"] == 2
    assert out[2]["n_novel_grams"] == 1 and out[2]["novelty_ppm"] == 500_000


def test_mixture_readout_exact_past_int64_wrap(spark):
    """Sufficient statistics at ~5e15 tokens/source (a 100 TB-scale
    corpus): budget*w_sqrt exceeds int64, so the DECIMAL(38,0) path
    must still produce the exact Python-bigint values — the int64
    formulation would wrap negative here."""
    import math

    from hha_spark.operators.corpus import mixture_readout

    stats = [("a", 10**6, 5_000_000_000_000_000),
             ("b", 10**6, 1_250_000_000_000_000),
             ("c", 10**6, 9_000_000_000_000)]
    df = spark.createDataFrame(
        stats, "source string, n_docs long, n_tokens long"
    )
    out = {
        r["source"]: r
        for r in mixture_readout(df, budget_frac_pct=50).collect()
    }
    total = sum(n for _, _, n in stats)
    ws = {s: math.isqrt(n) for s, _, n in stats}
    total_w = sum(ws.values())
    budget = total * 50 // 100
    for s, _, n in stats:
        target = budget * ws[s] // total_w
        assert budget * ws[s] > 2**63, "fixture must actually wrap int64"
        assert out[s]["w_sqrt"] == ws[s]
        assert out[s]["share_ppm"] == ws[s] * 1_000_000 // total_w
        assert out[s]["target_tokens"] == target
        assert out[s]["sampled_tokens"] == min(n, target)
        assert out[s]["oversample_ppm"] == target * 1_000_000 // n
