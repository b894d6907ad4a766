"""Unit tests for dedup operators (exact, Jaccard, MinHash+LSH, SimHash)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hha_spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    prefix_candidate_pairs,
    simhash16,
    with_token_set,
)

DOCS = [
    (1, "the quick brown fox", "a"),
    (2, "the quick brown fox", "a"),      # exact dup of 1
    (3, "the quick brown wolf", "a"),     # near dup of 1 (3/5 jaccard)
    (4, "completely different text here", "a"),
    (5, "the quick brown fox", "b"),      # exact dup, other block
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_exact_dedup_groups(spark):
    out = exact_dedup_groups(docs_df(spark)).collect()
    groups = {r.text_hash: (r.n_docs, r.canonical_doc_id) for r in out}
    assert len(groups) == 3
    assert (3, 1) in groups.values()  # docs 1,2,5 share a hash, keep id 1


def test_jaccard_pairs_blocked(spark):
    docs = with_token_set(docs_df(spark))
    out = jaccard_pairs(
        docs, docs, block_cols=["source"], threshold_num=7, threshold_den=10
    ).collect()
    pairs = {(r.doc_id_a, r.doc_id_b): r.jaccard for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0   # identical
    assert (1, 5) not in pairs                        # blocked apart
    # fox/wolf: |∩|=3, |∪|=5 -> 0.6 < 0.7 threshold
    assert (1, 3) not in pairs


def _hot_token_corpus(spark, n_docs: int):
    """Pathological block: every doc shares one ubiquitous token but is
    otherwise unique — the worst case for a full inverted index, which
    emits O(n_docs^2) intersect rows through the hot posting list."""
    rows = [(i, f"common u{i}a u{i}b u{i}c", "blk") for i in range(n_docs)]
    return with_token_set(
        spark.createDataFrame(rows, "doc_id long, text string, source string")
    )


def test_prefix_filter_bounds_hot_token_candidates(spark):
    """The prefix filter must keep candidate growth flat as the block
    grows 10x: 'common' has maximal df, sorts last in every doc's
    frequency order, and never enters a prefix."""
    for n in (20, 200):
        docs = _hot_token_corpus(spark, n)
        cand = prefix_candidate_pairs(
            docs, docs, block_cols=["source"], threshold_num=7, threshold_den=10
        ).count()
        assert cand == 0, f"hot token leaked {cand} candidates at n={n}"
        # and the final answer is (correctly) empty: J = 1/7 < 0.7
        assert (
            jaccard_pairs(
                docs, docs, block_cols=["source"], threshold_num=7,
                threshold_den=10,
            ).count()
            == 0
        )


def test_prefix_and_naive_kernels_agree(spark):
    docs = with_token_set(docs_df(spark))
    kw = dict(block_cols=["source"], threshold_num=7, threshold_den=10)
    fast = {
        (r.doc_id_a, r.doc_id_b, r.inter_size, r.union_size)
        for r in jaccard_pairs(docs, docs, **kw).collect()
    }
    naive = {
        (r.doc_id_a, r.doc_id_b, r.inter_size, r.union_size)
        for r in jaccard_pairs(docs, docs, prefix_filter=False, **kw).collect()
    }
    assert fast == naive and fast


def test_minhash_identical_docs_share_all_bands(spark):
    docs = with_token_set(docs_df(spark))
    sigs = minhash_signatures(docs, num_hashes=8)
    rows = {r.doc_id: [r[f"mh{i}"] for i in range(8)] for r in sigs.collect()}
    assert rows[1] == rows[2] == rows[5]   # same token set -> same signature
    assert rows[1] != rows[4]


def test_minhash_digest_not_reexpanded(spark):
    """The 2 salted md5 digest arrays must stay a materialized
    projection: if CollapseProject ever inlines them into the 8 lane
    consumers, the optimized plan re-expands to 8 md5 transforms per
    token and the 4x hash-cost cut silently evaporates (values stay
    right, so only a plan assert catches it)."""
    docs = with_token_set(docs_df(spark))
    sigs = minhash_signatures(docs, num_hashes=8)
    plan = sigs._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5") == 2, plan


def test_minhash_lanes_are_digest_slices(spark):
    """mh{i} == min over substring(md5('s{i//4}|'||t), 1+8*(i%4), 8)
    — the exact expression the DuckDB oracle inlines per lane."""
    import hashlib

    docs = with_token_set(docs_df(spark))
    row = minhash_signatures(docs, num_hashes=8).where("doc_id = 1").first()
    toks = row["tokens"]
    for i in range(8):
        expect = min(
            hashlib.md5(f"s{i // 4}|{t}".encode()).hexdigest()[
                8 * (i % 4): 8 * (i % 4) + 8
            ]
            for t in toks
        )
        assert row[f"mh{i}"] == expect, (i, row[f"mh{i}"], expect)


def test_lsh_candidates_catch_exact_dups(spark):
    docs = with_token_set(docs_df(spark))
    sigs = minhash_signatures(docs, num_hashes=8)
    cand = {
        (r.doc_id_a, r.doc_id_b)
        for r in lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).collect()
    }
    assert {(1, 2), (1, 5), (2, 5)} <= cand
    assert not any(4 in p for p in cand)   # nothing collides with doc 4


def test_simhash_stability_and_collision(spark):
    docs = with_token_set(docs_df(spark))
    out = {r.doc_id: r.simhash for r in simhash16(docs).collect()}
    assert out[1] == out[2] == out[5]
    assert 0 <= out[1] < (1 << 16)
    # one-token difference moves few bits: hamming distance small
    ham = bin(out[1] ^ out[3]).count("1")
    assert ham <= 8


def test_incremental_lsh_cross_side_only(spark):
    """Cross-side banding: identical docs across the batch/corpus
    split pair up; two identical NEW docs never pair with each other
    (the corpus settles its own duplicates elsewhere); an over-cap
    corpus bucket is skipped."""
    from hha_spark.operators.dedup import (
        incremental_lsh_pairs,
        minhash_signatures,
        with_token_set,
    )

    text = "alpha beta gamma delta epsilon zeta"
    boiler = "common template words here now"
    new = with_token_set(
        spark.createDataFrame(
            [(0, text), (4, text), (8, boiler)], "doc_id long, text string"
        )
    )
    corpus_rows = [(1, text)] + [(100 + i, boiler) for i in range(5)]
    corpus = with_token_set(
        spark.createDataFrame(corpus_rows, "doc_id long, text string")
    )
    pairs = {
        (r.doc_id_new, r.doc_id_corpus)
        for r in incremental_lsh_pairs(
            minhash_signatures(new), minhash_signatures(corpus), max_bucket=4
        ).collect()
    }
    assert (0, 1) in pairs and (4, 1) in pairs     # batch ~ corpus
    assert not any(a in (0, 4, 8) and b in (0, 4, 8) for a, b in pairs)
    # boilerplate bucket (5 corpus members > cap 4) skipped entirely
    assert not any(a == 8 for a, _ in pairs)


def test_simhash_near_pairs_pigeonhole(spark):
    """Hamming <= 3 pairs are found via block collision; hamming > 3
    pairs are rejected even when a block collides; over-cap buckets
    are skipped."""
    from hha_spark.operators.dedup import simhash_near_pairs

    rows = [
        (1, 0b1010_1010_1010_1010),
        (2, 0b1010_1010_1010_1011),   # hamming 1 from doc 1
        (3, 0b1010_1010_1010_0101),   # hamming 4 from doc 1 (blocks 1-3 equal)
        (4, 0b0101_0101_0101_0101),   # far from 1/2
    ]
    hashes = spark.createDataFrame(rows, "doc_id long, simhash long")
    pairs = {
        (r.doc_id_a, r.doc_id_b): r.hamming
        for r in simhash_near_pairs(hashes).collect()
    }
    assert pairs[(1, 2)] == 1
    assert (1, 3) not in pairs          # verified out despite collision
    assert pairs[(2, 3)] == 3           # exactly at the threshold
    assert all(h <= 3 for h in pairs.values())

    # cap: 5 identical signatures > max_bucket=4 -> no pairs at all
    same = spark.createDataFrame(
        [(i, 7) for i in range(5)], "doc_id long, simhash long"
    )
    assert simhash_near_pairs(same, max_bucket=4).count() == 0


# --- properties: blocked kernels == brute force ----------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_sig_strategy = st.lists(
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    min_size=2,
    max_size=12,
    unique=True,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sigs=_sig_strategy)
def test_simhash_pairs_match_bruteforce(spark, sigs):
    """Pigeonhole block join finds EXACTLY the hamming<=3 pairs a
    brute-force scan finds (buckets stay under the cap at this size,
    so blocking must be lossless)."""
    from hha_spark.operators.dedup import simhash_near_pairs

    hashes = spark.createDataFrame(
        list(enumerate(sigs)), "doc_id long, simhash long"
    )
    got = {
        (r.doc_id_a, r.doc_id_b, r.hamming)
        for r in simhash_near_pairs(hashes).collect()
    }
    want = {
        (i, j, bin(a ^ b).count("1"))
        for i, a in enumerate(sigs)
        for j, b in enumerate(sigs)
        if i < j and bin(a ^ b).count("1") <= 3
    }
    assert got == want


_docs_strategy = st.lists(
    st.sampled_from(
        ["aa bb cc dd", "aa bb cc ee", "xx yy zz ww", "aa bb cc dd", "pp qq rr ss"]
    ),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_docs_strategy)
def test_incremental_pairs_match_full_lsh_cross_side(spark, texts):
    """incremental_lsh_pairs(new, corpus) == the full self-join LSH
    candidates restricted to cross-side pairs (bucket caps never bind
    at this size, where the two cap definitions coincide)."""
    from hha_spark.operators.dedup import (
        incremental_lsh_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        with_token_set,
    )

    docs = with_token_set(
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
    )
    new = docs.where("doc_id % 2 = 0")
    corpus = docs.where("doc_id % 2 != 0")
    inc = {
        (r.doc_id_new, r.doc_id_corpus)
        for r in incremental_lsh_pairs(
            minhash_signatures(new), minhash_signatures(corpus)
        ).collect()
    }
    full = {
        (r.doc_id_a, r.doc_id_b)
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    want = set()
    for a, b in full:
        if a % 2 == 0 and b % 2 != 0:
            want.add((a, b))
        elif b % 2 == 0 and a % 2 != 0:
            want.add((b, a))
    assert inc == want


def test_containment_pairs_asymmetric(spark):
    """Doc 1's tokens are a strict subset of doc 2's: containment
    holds 1->2 (4/4) but not 2->1 (4/7 < 0.8). Unrelated doc 3
    pairs with nobody. Threshold 8/10."""
    from hha_spark.operators.dedup import containment_pairs

    docs = with_token_set(
        spark.createDataFrame(
            [
                (1, "alpha beta gamma delta"),
                (2, "alpha beta gamma delta epsilon zeta eta"),
                (3, "totally unrelated words here"),
            ],
            "doc_id long, text string",
        )
    )
    out = {
        (r.doc_id_a, r.doc_id_b): r
        for r in containment_pairs(docs).collect()
    }
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert r.inter_size == 4 and r.n_a == 4 and r.containment == 1.0


def test_containment_pairs_match_naive_all_pairs(spark):
    """The one-sided prefix filter is LOSSLESS: compare against the
    naive all-ordered-pairs predicate on a fixture with partial
    overlaps around the 0.8 boundary."""
    from hha_spark.operators.dedup import containment_pairs

    rows = [
        (1, "a b c d e"),
        (2, "a b c d e f g h i j"),   # contains 1 fully
        (3, "a b c d x"),             # 4/5 of 1 -> qualifies at 0.8
        (4, "a b x y z"),             # 2/5 of 1 -> no
        (5, "f g h i j k l m n o p q r s t"),
        (6, "a b c d e"),             # exact dup of 1, both directions
    ]
    docs = with_token_set(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in containment_pairs(docs).collect()
    }
    toks = {i: set(t.split()) for i, t in rows}
    want = {
        (a, b)
        for a in toks for b in toks if a != b
        and 10 * len(toks[a] & toks[b]) >= 8 * len(toks[a])
    }
    assert got == want and (1, 2) in got and (6, 1) in got


def test_containment_incremental_cross_side_only(spark):
    """Cross mode: only (batch, corpus) ordered pairs emerge — never
    corpus-corpus or batch-batch — and the result matches the naive
    cross predicate even when batch docs carry tokens absent from the
    corpus vocabulary (those can never witness containment)."""
    from hha_spark.operators.dedup import containment_pairs

    batch_rows = [
        (10, "a b c d e"),            # fully inside corpus doc 1
        (12, "a b c zz1 zz2"),        # 3/5 known -> below 0.8
        (14, "q r s t u"),            # 4/5 in corpus doc 3
    ]
    corpus_rows = [
        (1, "a b c d e f g"),
        (3, "q r s t x"),
        (5, "a b c d e"),             # also contains batch doc 10
    ]
    mk = lambda rows: with_token_set(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in containment_pairs(mk(batch_rows), mk(corpus_rows)).collect()
    }
    toks_b = {i: set(t.split()) for i, t in batch_rows}
    toks_c = {i: set(t.split()) for i, t in corpus_rows}
    want = {
        (a, b)
        for a in toks_b for b in toks_c
        if 10 * len(toks_b[a] & toks_c[b]) >= 8 * len(toks_b[a])
    }
    assert got == want
    assert (10, 1) in got and (10, 5) in got and (14, 3) in got
    assert all(a in toks_b and b in toks_c for a, b in got)


def test_split_leakage_rollup_hand_computed(spark, monkeypatch, tmp_path):
    """Two exact-dup docs whose salted md5 buckets land in different
    splits must surface as one leaky pair; same-split dups stay
    non-leaky. Uses the real gate against a tiny parquet fixture."""
    import hha_spark.queries.llm_ops as L

    # find doc ids whose split-hash lands train vs test (same logic
    # as the gate: md5('split|'+id) first 8 hex % 100)
    import hashlib

    from hha_spark.queries.relational3 import TEST_PCT, VAL_PCT

    def split_of(i):
        b = int(hashlib.md5(f"split|{i}".encode()).hexdigest()[:8], 16) % 100
        return "test" if b < TEST_PCT else (
            "val" if b < TEST_PCT + VAL_PCT else "train"
        )

    train_ids = [i for i in range(1000) if split_of(i) == "train"]
    test_ids = [i for i in range(1000) if split_of(i) == "test"]
    a, b = train_ids[0], test_ids[0]
    c, d = train_ids[1], train_ids[2]
    rows = [
        (a, "the quick brown fox jumped", "s1"),
        (b, "the quick brown fox jumped", "s1"),   # leaks train<->test
        (c, "completely different words here now", "s1"),
        (d, "completely different words here now", "s1"),  # train-train
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        (r.split_a, r.split_b): (r.n_pairs, r.leaky)
        for r in L.corpus_split_leakage(spark, str(tmp_path)).collect()
    }
    assert out == {
        ("test", "train"): (1, True),
        ("train", "train"): (1, False),
    }
