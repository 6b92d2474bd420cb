"""Corpus-level stats: top-k n-gram exactness vs a pandas reference (including
tie boundaries), and the stratified sample's determinism / nesting / rate
properties + its no-shuffle plan shape."""

from __future__ import annotations

from collections import Counter

import numpy as np
from pyspark.sql import functions as F

from cqaduplicatefind_spark.operators.corpus_stats import stratified_sample, top_ngrams


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_top_ngrams_matches_reference_with_ties(spark):
    rng = np.random.default_rng(5)
    vocab = [f"t{j}" for j in range(6)]  # tiny vocab -> many tied counts
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(2, 30)))) for _ in range(50)]
    ref = Counter()
    for t in texts:
        toks = t.split(" ")
        ref.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r.gram, r.cnt) for r in top_ngrams(_docs(spark, texts), n=2, k=10).collect()]
    assert got == expect


def test_top_ngrams_short_docs_and_small_corpus(spark):
    # fewer distinct grams than k; one-token docs contribute nothing
    got = top_ngrams(_docs(spark, ["a b a b", "x", ""]), n=2, k=20).collect()
    assert {(r.gram, r.cnt) for r in got} == {("a b", 2), ("b a", 1)}


def test_top_ngrams_tie_heavy_boundary_shuffle_fallback(spark, monkeypatch):
    """When the k-th-count boundary is tie-heavy the candidate set approaches
    vocab size; the text-fetch join must fall back to a shuffle join instead
    of force-broadcasting a vocab-sized frame through the driver. Forced here
    by shrinking the gate to 0; the result stays exact either way."""
    from cqaduplicatefind_spark.operators import corpus_stats

    texts = [f"u{i} v{i} w{i}" for i in range(30)]  # every bigram count = 1
    ref = Counter()
    for t in texts:
        toks = t.split(" ")
        ref.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    monkeypatch.setattr(corpus_stats, "BROADCAST_MAX_CANDS", 0)
    got = [
        (r.gram, r.cnt)
        for r in top_ngrams(_docs(spark, texts), n=2, k=5).collect()
    ]
    assert got == expect


def test_stratified_sample_rates_and_nesting(spark):
    rows = [(f"u{i}", "web" if i % 2 else "books") for i in range(4000)]
    df = spark.createDataFrame(rows, "url string, source string")
    lo = stratified_sample(df, {"web": 0.2, "books": 0.0})
    hi = stratified_sample(df, {"web": 0.6, "books": 1.0})
    lo_ids = {r.url for r in lo.collect()}
    hi_ids = {r.url for r in hi.collect()}
    assert lo_ids <= hi_ids                      # nested samples
    assert all(int(u[1:]) % 2 for u in lo_ids)   # books at 0.0 -> none kept
    n_web = 2000
    assert abs(len(lo_ids) / n_web - 0.2) < 0.05
    # rerun is bit-identical (no RNG state anywhere)
    assert {r.url for r in stratified_sample(df, {"web": 0.2, "books": 0.0}).collect()} == lo_ids
    # rate 1.0 keeps every row of its stratum
    assert sum(1 for u in hi_ids if not int(u[1:]) % 2) == 2000


def test_stratified_sample_default_rate_and_plan(spark):
    df = spark.createDataFrame(
        [("a", "s1"), ("b", "s2"), ("c", "s1")], "url string, source string"
    )
    kept = stratified_sample(df, {"s1": 1.0}, default_rate=0.0)
    assert {r.url for r in kept.collect()} == {"a", "c"}
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # broadcast rate table; the corpus side never shuffles
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
