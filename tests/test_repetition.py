"""Intra-document repetition signals (operators/repetition.py): hand-computed
fixtures for all three fractions, edge cases (empty/short docs), and the plan
shapes the operator relies on at crawl scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from cqaduplicatefind_spark.operators.repetition import (
    _gram_stat,
    repetition_features,
)

DOCS = [
    # 4 tokens; 2-grams (a b, b a, a b): top "a b" x2 -> 2*2/4 = 1.0;
    # too short for 5-grams; one line -> dup_line_frac 0
    ("d1", "a b a b"),
    # newline-split lines x,x,y -> 1 - 2/3; but ONE space-token -> no grams
    ("d2", "x\nx\ny"),
    # 10 tokens, the 5-run repeats: "w1..w5" 5-gram occurs twice among 6
    # grams -> dup = 2*5/10 = 1.0; top 2-gram "w1 w2" x2 -> 2*2/10 = 0.4
    ("d3", "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5"),
    # empty text: every fraction 0, row still present
    ("d4", ""),
    # single token: no grams, no repeats
    ("d5", "only"),
]


def test_hand_computed_fractions(spark):
    docs = spark.createDataFrame(DOCS, "url string, text string")
    got = {
        r.url: (r.dup_line_frac, r.top_ngram_frac, r.dup_ngram_frac)
        for r in repetition_features(docs).collect()
    }
    def close(a, b):
        return all(abs(x - y) < 1e-9 for x, y in zip(a, b))
    assert len(got) == len(DOCS)            # one output row per input row
    assert close(got["d1"], (0.0, 1.0, 0.0))
    assert close(got["d2"], (1.0 - 2.0 / 3.0, 0.0, 0.0))
    assert close(got["d3"], (0.0, 0.4, 1.0))
    assert close(got["d4"], (0.0, 0.0, 0.0))
    assert close(got["d5"], (0.0, 0.0, 0.0))


def test_dup_ngram_overlap_is_capped(spark):
    # "t t t t t t": every 5-gram identical (2 grams, both duplicated) ->
    # overlap counting gives 2*5/6 > 1? no: 10/6 = 1.67 -> capped at 1.0
    docs = spark.createDataFrame([("d", "t t t t t t")], "url string, text string")
    (row,) = repetition_features(docs).collect()
    assert abs(row.dup_ngram_frac - 1.0) < 1e-9


def test_gram_stat_plan_is_two_slim_exchanges(spark):
    """Each gram statistic must be explode + two map-side-combined hash
    aggregates keyed on the 8-byte gram hash — no Window, no Python, and the
    only text-width data stays before the first exchange."""
    docs = spark.range(200).select(
        F.col("id").cast("string").alias("url"),
        F.concat(F.lit("w x y z "), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        _gram_stat(docs, "url", "text", 2, "f", "top")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 2
    assert "partial_count" in plan
    assert "xxhash64" in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_top_frac_capped_on_overlapping_repeats(spark):
    """Overlapping repeats ("a a a a": top 2-gram "a a" occurs 3x in 4 tokens)
    would push an uncapped 'fraction' to 1.5; both gram signals cap at 1."""
    from cqaduplicatefind_spark.operators.repetition import repetition_features

    docs = spark.createDataFrame([("x", "a a a a")], "url string, text string")
    (row,) = repetition_features(docs, signals=("top",)).collect()
    assert row.top_ngram_frac == 1.0


def test_null_text_reports_zero_fractions(spark):
    """NULL text must report 0 fractions like any no-content doc (under ANSI
    mode size(split(NULL)) is NULL, which would otherwise leak through the
    line-fraction guard as NULL and silently drop the row from <= filters)."""
    from cqaduplicatefind_spark.operators.repetition import repetition_features

    docs = spark.createDataFrame(
        [("x", None), ("y", "ok line")], "url string, text string"
    )
    rows = {r.url: r for r in repetition_features(docs).collect()}
    assert rows["x"].dup_line_frac == 0.0
    assert rows["x"].top_ngram_frac == 0.0 and rows["x"].dup_ngram_frac == 0.0
