"""Unigram-LM quality scoring: hand-computed parity, head/tail path equality,
and partitioning invariance (the properties that make the score usable as a
deterministic corpus filter)."""

from __future__ import annotations

import math

import pytest

from cqaduplicatefind_spark.operators.lm_quality import unigram_logprob

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "zyx qwv zyx"),
    (4, "the the the the"),
    (5, ""),  # token-free: no defined mean, must be absent from the output
]


def _expected(alpha: float = 0.5) -> dict[int, tuple[int, float, float]]:
    """Pure-Python restatement of the model."""
    tf: dict[int, dict[str, int]] = {}
    counts: dict[str, int] = {}
    for doc_id, text in DOCS:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            continue
        d = tf.setdefault(doc_id, {})
        for t in toks:
            d[t] = d.get(t, 0) + 1
            counts[t] = counts.get(t, 0) + 1
    n = float(sum(counts.values()))
    v = float(len(counts))
    out = {}
    for doc_id, d in tf.items():
        ntok = sum(d.values())
        lp = sum(
            c * math.log((counts[t] + alpha) / (n + alpha * v))
            for t, c in d.items()
        ) / ntok
        lp = round(lp, 6)
        out[doc_id] = (ntok, lp, round(math.exp(-lp), 2))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_hand_parity(spark, docs_df):
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"], r["ppl"])
        for r in unigram_logprob(docs_df).collect()
    }
    want = _expected()
    assert set(got) == set(want)  # doc 5 (no tokens) absent from both
    for doc_id, (ntok, lp, ppl) in want.items():
        g_ntok, g_lp, g_ppl = got[doc_id]
        assert g_ntok == ntok
        assert g_lp == pytest.approx(lp, abs=1e-6)
        assert g_ppl == pytest.approx(ppl, abs=1e-2)


def test_head_tail_paths_agree(spark, docs_df):
    """head_k=1 forces all but the single hottest token through the shuffled
    tail join; results must be identical to the all-broadcast path."""
    full = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"], r["ppl"])
        for r in unigram_logprob(docs_df, head_k=1 << 20).collect()
    }
    split = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"], r["ppl"])
        for r in unigram_logprob(docs_df, head_k=1).collect()
    }
    assert full == split


def test_partitioning_invariance(spark, docs_df):
    base = sorted(unigram_logprob(docs_df).collect())
    repart = sorted(unigram_logprob(docs_df.repartition(7)).collect())
    assert base == repart


def test_boilerplate_scores_higher_than_gibberish(spark, docs_df):
    """The filter's point: an all-stop-token page ("the the the the") has a
    much higher mean logprob (lower ppl) than a rare-token page."""
    got = {r["doc_id"]: r["avg_logprob"] for r in unigram_logprob(docs_df).collect()}
    assert got[4] > got[1] > got[3]


def test_whitespace_tokenization_and_no_default_caches(spark):
    """Tabs/newlines are token boundaries (a multi-line page must score like
    its single-spaced twin, not accrue glued rare 'words'), and the default
    persisted=None call leaves NO cached RDDs behind (callers without a
    release handle cannot strand executor storage)."""
    single = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog ran")], "doc_id long, text string"
    )
    mixed = spark.createDataFrame(
        [(1, "the\tcat\nsat"), (2, "the  dog\r\nran")], "doc_id long, text string"
    )
    a = {r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
         for r in unigram_logprob(single).collect()}
    b = {r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
         for r in unigram_logprob(mixed).collect()}
    assert a == b
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    before = {int(i) for i in jmap.keySet().toArray()}
    unigram_logprob(single).count()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    after = {int(i) for i in jmap.keySet().toArray()}
    assert after <= before
    # opt-in caching still works and is caller-released
    handles: list = []
    unigram_logprob(single, persisted=handles).count()
    assert len(handles) == 2
    for h in handles:
        h.unpersist()


def test_ordering_is_scale_free(spark):
    """Duplicating the corpus k times rescales counts but preserves the
    quality ORDERING (the decision a threshold filter acts on)."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    tripled = docs.unionByName(
        docs.selectExpr("doc_id + 100 AS doc_id", "text")
    ).unionByName(docs.selectExpr("doc_id + 200 AS doc_id", "text"))
    base = {r["doc_id"]: r["avg_logprob"] for r in unigram_logprob(docs).collect()}
    big = {
        r["doc_id"]: r["avg_logprob"]
        for r in unigram_logprob(tripled).collect()
        if r["doc_id"] < 100
    }
    rank = lambda d: [k for k, _ in sorted(d.items(), key=lambda kv: kv[1])]
    assert rank(base) == rank(big)
