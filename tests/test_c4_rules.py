"""C4-style rule cleaning (operators/c4_rules.py): every rule pinned on
hand-built pages, plus the plan shape the tier relies on at crawl scale
(ONE shuffle-free codegen projection — zero exchanges, zero Python).

Rules pinned: terminal-punctuation line keep, min-words-per-line,
javascript-line drop, curly-brace page drop, lorem-ipsum page drop,
min-sentence-marks page gate, trim + order-preserving reassembly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cqaduplicatefind_spark.operators.c4_rules import (
    c4_clean,
    c4_page_stats,
)

GOOD = "This page has a perfectly normal first sentence."
GOOD2 = "It also has a second sentence with many words!"
GOOD3 = 'And a third one ending in a quote."'
SHORT = "Too short."                       # 2 words -> dropped
NOPUNCT = "this line has words but never ends properly"
JSLINE = "Enable JavaScript to view the full comments section."

DOCS = [
    # d1: all three good lines survive; short/no-punct/js lines dropped
    ("d1", f"{GOOD}\n{SHORT}\n{NOPUNCT}\n{JSLINE}\n{GOOD2}\n{GOOD3}"),
    # d2: enough words+punct but page contains a curly brace -> dropped
    ("d2", f"{GOOD}\n{GOOD2}\nfunction f() {{ return 1; }}"),
    # d3: lorem ipsum filler -> dropped (case-insensitive)
    ("d3", f"{GOOD}\n{GOOD2}\nLorem Ipsum dolor sit amet."),
    # d4: lines survive but only 2 sentence marks < min_sentences=3 -> dropped
    ("d4", f"{GOOD}\n{GOOD2}"),
    # d5: every line dropped -> zero sentence marks -> dropped
    ("d5", f"{SHORT}\n{NOPUNCT}"),
    # d6: leading/trailing spaces must be trimmed before testing + emitting
    ("d6", f"   {GOOD}   \n {GOOD2} \n{GOOD3}"),
    # d7: CRLF page — every line carries a trailing \r, which must not
    # defeat the terminal-punctuation rule (space-only trim would)
    ("d7", f"{GOOD}\r\n{GOOD2}\r\n{GOOD3}\t\r"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "url string, text string")


def test_clean_semantics(spark):
    out = {r.url: r.text for r in c4_clean(_docs(spark), min_sentences=3).collect()}
    assert out["d1"] == f"{GOOD}\n{GOOD2}\n{GOOD3}"
    assert "d2" not in out           # curly-brace page
    assert "d3" not in out           # lorem-ipsum page
    assert "d4" not in out           # below the sentence gate
    assert "d5" not in out           # nothing survived line cleaning
    assert out["d6"] == f"{GOOD}\n{GOOD2}\n{GOOD3}"   # trimmed emission
    assert out["d7"] == f"{GOOD}\n{GOOD2}\n{GOOD3}"   # CRLF page survives


def test_page_stats_gates(spark):
    s = {r.url: r for r in c4_page_stats(_docs(spark), min_sentences=3).collect()}
    assert s["d1"].n_lines == 6 and s["d1"].n_kept_lines == 3
    assert s["d1"].n_sentences == 3 and s["d1"].keep
    assert s["d2"].has_brace and not s["d2"].keep
    assert s["d3"].has_lorem and not s["d3"].keep
    assert s["d4"].n_sentences == 2 and not s["d4"].keep
    assert s["d5"].n_kept_lines == 0 and s["d5"].n_sentences == 0
    # the js line is dropped for content, not punctuation/words
    assert not s["d1"].has_brace and not s["d1"].has_lorem


def test_min_words_knob(spark):
    # with min_words_per_line=2 the 2-word line now survives, adding a mark
    out = {
        r.url: r
        for r in c4_page_stats(
            _docs(spark), min_words_per_line=2, min_sentences=3
        ).collect()
    }
    assert out["d1"].n_kept_lines == 4
    assert out["d1"].n_sentences == 4


def test_sentence_gate_counts_marks_in_kept_text_only(spark):
    # d4's dropped lines must not contribute sentence marks
    docs = spark.createDataFrame(
        [("x", "One good sentence right here.\nbad! bad! bad!")],
        "url string, text string",
    )
    s = c4_page_stats(docs, min_sentences=2).collect()[0]
    # second line has 3 marks but only 1 word-ish tokens... it has 3 words and
    # ends in '!', so it IS kept; use a no-punct filler instead
    docs2 = spark.createDataFrame(
        [("x", "One good sentence right here.\nfiller words no punct at all")],
        "url string, text string",
    )
    s2 = c4_page_stats(docs2, min_sentences=2).collect()[0]
    assert s2.n_sentences == 1 and not s2.keep
    assert s.n_sentences == 4 and s.keep


def test_plan_is_one_shuffle_free_projection(spark):
    """The whole tier must stay inside whole-stage codegen: no Exchange, no
    Window, no Python eval — the shape that costs one scan at 10^12 docs."""
    docs = spark.range(1000).select(
        F.col("id").cast("string").alias("url"),
        F.concat(F.lit("A normal sentence here.\nshort\nbody "), F.col("id")).alias(
            "text"
        ),
    )
    for frame in (c4_clean(docs), c4_page_stats(docs)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
