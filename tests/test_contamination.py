"""Benchmark decontamination (operators/contamination.py): hand-computed
overlap counts and the broadcast-probe plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from cqaduplicatefind_spark.operators.contamination import contaminated_docs

BENCH_SENT = "the quick brown fox jumps over the lazy dog near the old mill"
# 13 tokens exactly -> the benchmark contributes ONE 13-gram


def test_hand_computed_overlap(spark):
    docs = spark.createDataFrame(
        [
            # contains the benchmark sentence verbatim inside padding: the
            # sentence is 13 tokens, so exactly one 13-gram position matches
            ("hit1", f"intro words here {BENCH_SENT} trailing text"),
            # contains it twice -> two matching positions
            ("hit2", f"{BENCH_SENT} and again {BENCH_SENT}"),
            # long but clean
            ("clean", "totally different words " * 10),
            # too short to form a 13-gram
            ("short", "a b c"),
        ],
        "url string, text string",
    )
    bench = spark.createDataFrame(
        [("b1", BENCH_SENT)], "url string, text string"
    )
    got = {
        r.url: r.n_contaminated_grams
        for r in contaminated_docs(docs, bench, n=13).collect()
    }
    assert got == {"hit1": 1, "hit2": 2}


def test_self_contamination_counts_positions(spark):
    # a doc checked against itself: every 13-gram position hits -> nt - 12
    text = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame([("d", text)], "url string, text string")
    (row,) = contaminated_docs(docs, docs, n=13).collect()
    assert row.n_contaminated_grams == 20 - 12


def test_probe_is_broadcast_and_python_free(spark):
    """The corpus side must probe a BroadcastHashJoin (no corpus shuffle for
    the join) and the whole operator stays JVM-side; the only Exchange is the
    final per-document hit count."""
    docs = spark.range(300).select(
        F.col("id").cast("string").alias("url"),
        F.concat(F.lit("x y z " * 6), F.col("id").cast("string")).alias("text"),
    )
    bench = docs.limit(5)
    plan = (
        contaminated_docs(docs, bench, n=13)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_prefilter_is_exact(spark):
    """Bloom gate on vs off: identical results (every positive re-confirmed)."""
    docs = spark.createDataFrame(
        [
            ("hit1", f"intro words here {BENCH_SENT} trailing text"),
            ("hit2", f"{BENCH_SENT} and again {BENCH_SENT}"),
            ("clean", "totally different words " * 10),
        ],
        "url string, text string",
    )
    bench = spark.createDataFrame([("b1", BENCH_SENT)], "url string, text string")
    plain = {
        r.url: r.n_contaminated_grams
        for r in contaminated_docs(docs, bench, n=13).collect()
    }
    bloom = {
        r.url: r.n_contaminated_grams
        for r in contaminated_docs(
            docs, bench, n=13, bloom_prefilter=True
        ).collect()
    }
    assert bloom == plain == {"hit1": 1, "hit2": 2}


def test_bloom_bitmap_matches_python_reference(spark):
    """The distributed OR-fold builds the same bitmap a single-pass reference
    build produces, and membership probes behave: zero false negatives, FP
    rate in the ballpark of the 10-bits/elem design point."""
    import numpy as np

    from cqaduplicatefind_spark.operators.contamination import (
        _bloom_positions,
        build_gram_bloom,
    )

    rng = np.random.default_rng(3)
    members = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
    df = spark.createDataFrame(
        [(int(v),) for v in members], "_gh long"
    ).repartition(7)
    bitmap, m, k = build_gram_bloom(df, len(members))

    ref = np.zeros(m // 64, dtype=np.uint64)
    w, b = _bloom_positions(members, m, k)
    np.bitwise_or.at(ref, w.ravel(), b.ravel())
    assert (bitmap == ref).all()

    def contains(vals):
        w, b = _bloom_positions(vals, m, k)
        return ((bitmap[w] & b) != 0).all(axis=1)

    assert contains(members).all()  # no false negatives, ever
    probes = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    fresh = probes[~np.isin(probes, members)]
    assert contains(fresh).mean() < 0.03  # design FPR ~0.008 at 10 bits, k=7


def test_fuzzy_hand_computed_jaccard(spark):
    """Distinct-3-gram Jaccard against a tiny benchmark, checked by hand.
    base: tokens a b c d e f -> 3-grams {abc, bcd, cde, def} (4 grams).
    edit: a b c d e X -> {abc, bcd, cde, deX} -> shared 3, union 5 -> 0.6.
    far:  shares one gram -> jaccard 1/7, below threshold."""
    from cqaduplicatefind_spark.operators.contamination import (
        fuzzy_contaminated_docs,
    )

    docs = spark.createDataFrame(
        [
            ("edit", "a b c d e X"),
            ("far", "a b c p q r s t u v"),
            ("clean", "m n o p q"),
            ("short", "a b"),
        ],
        "url string, text string",
    )
    bench = spark.createDataFrame([("b1", "a b c d e f")], "url string, text string")
    pairs = {
        (r.id, r.bench_id): r.jaccard
        for r in fuzzy_contaminated_docs(
            docs, bench, n=3, threshold=0.5, return_pairs=True
        ).collect()
    }
    assert set(pairs) == {("edit", "b1")}
    assert abs(pairs[("edit", "b1")] - 0.6) < 1e-12

    summary = fuzzy_contaminated_docs(docs, bench, n=3, threshold=0.5).collect()
    assert [(r.id, r.n_matched_bench) for r in summary] == [("edit", 1)]
    assert abs(summary[0].max_jaccard - 0.6) < 1e-12


def test_fuzzy_self_match_and_multi_bench(spark):
    """A doc identical to a bench doc scores 1.0; matching several bench docs
    raises n_matched_bench and max_jaccard takes the best."""
    from cqaduplicatefind_spark.operators.contamination import (
        fuzzy_contaminated_docs,
    )

    text = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " z"
    docs = spark.createDataFrame([("d", text)], "url string, text string")
    bench = spark.createDataFrame(
        [("b1", text), ("b2", near)], "url string, text string"
    )
    (row,) = fuzzy_contaminated_docs(docs, bench, n=13, threshold=0.3).collect()
    assert row.n_matched_bench == 2
    assert row.max_jaccard == 1.0


def test_fuzzy_repeated_grams_use_distinct_sets(spark):
    """Jaccard is over DISTINCT gram sets: within-doc gram multiplicity must
    not change the score (doc repeats its grams, bench does not)."""
    from cqaduplicatefind_spark.operators.contamination import (
        fuzzy_contaminated_docs,
    )

    base = "a b c d e"
    docs = spark.createDataFrame(
        [("rep", f"{base} {base} {base}")], "url string, text string"
    )
    bench = spark.createDataFrame([("b1", base)], "url string, text string")
    (row,) = fuzzy_contaminated_docs(
        docs, bench, n=3, threshold=0.1, return_pairs=True
    ).collect()
    # rep's distinct 3-grams: {abc,bcd,cde, "e a"-spanning grams...}: tokens
    # a b c d e a b c d e a b c d e -> 13 positions, distinct grams =
    # {abc,bcd,cde,dea,eab} = 5; bench = {abc,bcd,cde} = 3; shared 3, union 5
    assert abs(row.jaccard - 3 / 5) < 1e-12


def test_fuzzy_duplicate_bench_rows_do_not_inflate_jaccard(spark):
    """An eval set built by unioning files repeats rows; a repeated bench row
    must not double-count shared grams (jaccard could then exceed 1.0 and
    false-flag docs). Two DIFFERENT texts under one bench id stay two bench
    docs — neither the shared count nor the gram-set size mixes them."""
    from cqaduplicatefind_spark.operators.contamination import (
        fuzzy_contaminated_docs,
    )

    docs = spark.createDataFrame([("edit", "a b c d e X")], "url string, text string")
    bench = spark.createDataFrame(
        [
            ("b1", "a b c d e f"),
            ("b1", "a b c d e f"),      # exact duplicate row: collapses
            ("b2", "a b c d e f"),
            ("b2", "m n o p q r s"),    # same id, different text: 2 bench docs
        ],
        "url string, text string",
    )
    pairs = {
        (r.id, r.bench_id): r.jaccard
        for r in fuzzy_contaminated_docs(
            docs, bench, n=3, threshold=0.5, return_pairs=True
        ).collect()
    }
    # shared 3 of union 5 against the f-text under BOTH ids; never > 0.6
    assert set(pairs) == {("edit", "b1"), ("edit", "b2")}
    assert all(abs(j - 0.6) < 1e-12 for j in pairs.values())
    summary = fuzzy_contaminated_docs(docs, bench, n=3, threshold=0.5).collect()
    assert [(r.id, r.n_matched_bench) for r in summary] == [("edit", 2)]


def test_fuzzy_duplicate_corpus_rows_do_not_inflate_jaccard(spark):
    """The mirror of the bench-side dedup, from the corpus direction: a crawl
    corpus built by unioning files repeats rows, and a repeated (id, text)
    corpus row must not double _shared (jaccard would exceed its true value —
    or 1.0 — and false-flag the doc). Different texts under one corpus id
    score separately; the per-id summary reports the best."""
    from cqaduplicatefind_spark.operators.contamination import (
        fuzzy_contaminated_docs,
    )

    docs = spark.createDataFrame(
        [
            ("edit", "a b c d e X"),
            ("edit", "a b c d e X"),    # exact duplicate row: collapses
            ("two", "a b c d e f"),
            ("two", "zz yy xx ww vv"),  # same id, different text: best wins
        ],
        "url string, text string",
    )
    bench = spark.createDataFrame(
        [("b1", "a b c d e f")], "url string, text string"
    )
    pairs = {
        (r.id, r.bench_id): r.jaccard
        for r in fuzzy_contaminated_docs(
            docs, bench, n=3, threshold=0.5, return_pairs=True
        ).collect()
    }
    # edit: 3 shared of union 5 = 0.6 (NOT 6/(5+4-6) = 2.0); two: exact = 1.0
    assert set(pairs) == {("edit", "b1"), ("two", "b1")}
    assert abs(pairs[("edit", "b1")] - 0.6) < 1e-12
    assert pairs[("two", "b1")] == 1.0
    summary = {
        r.id: r.max_jaccard
        for r in fuzzy_contaminated_docs(docs, bench, n=3, threshold=0.5).collect()
    }
    assert set(summary) == {"edit", "two"}
    assert abs(summary["edit"] - 0.6) < 1e-12 and summary["two"] == 1.0


def test_fuzzy_probe_is_broadcast_and_python_free(spark):
    """Same plan contract as the exact tier: the corpus probes a
    BroadcastHashJoin (no corpus shuffle for the join), everything JVM-side;
    the exchanges are the two-stage distinct pair count (count_distinct over
    the post-join gram-sharing sliver — the duplicate-corpus-row guard; both
    stages carry sliver rows, never the corpus), the per-doc summary, and the
    bench-doc dedup — the last on the SMALL side only."""
    from cqaduplicatefind_spark.operators.contamination import (
        fuzzy_contaminated_docs,
    )

    docs = spark.range(300).select(
        F.col("id").cast("string").alias("url"),
        F.concat(F.lit("x y z " * 6), F.col("id").cast("string")).alias("text"),
    )
    bench = docs.limit(5)
    plan = (
        fuzzy_contaminated_docs(docs, bench, n=13)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 4
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
