"""Line-level boilerplate removal (operators/linededup.py): semantics on
hand-built fixtures plus the plan shapes the tier relies on at crawl scale.

Semantics pinned: a line is boilerplate when it appears in >= min_doc_freq
DISTINCT docs (within-doc repeats count once), empty lines are never
boilerplate and survive removal, line order is preserved byte-exactly, and a
document whose every line is boilerplate disappears from the output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cqaduplicatefind_spark.operators.linededup import (
    boilerplate_lines,
    dedup_lines_within_doc,
    line_doc_freq,
    remove_boilerplate_lines,
)

NAV = "home | about | contact"
FOOT = "all rights reserved"

DOCS = [
    # d1: nav appears TWICE in one doc — must count once toward doc freq,
    # but BOTH occurrences are removed; empty line preserved
    ("d1", f"{NAV}\nalpha body one\n\n{NAV}\n{FOOT}"),
    ("d2", f"{NAV}\nbeta body two\n{FOOT}"),
    ("d3", f"{NAV}\ngamma body three\n{FOOT}"),
    # d4: all-boilerplate page — must vanish from the output
    ("d4", f"{NAV}\n{FOOT}"),
    # d5: no boilerplate at all
    ("d5", "delta body five\nepsilon line"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "url string, text string")


def test_doc_freq_distinct_per_doc(spark):
    freq = {
        r.line_hash: r.n_docs
        for r in line_doc_freq(_docs(spark)).collect()
    }
    hashed = {
        r.line: r.h
        for r in spark.createDataFrame(
            [(NAV,), (FOOT,), ("alpha body one",)], "line string"
        ).withColumn("h", F.xxhash64("line")).collect()
    }
    assert freq[hashed[NAV]] == 4          # d1 counts once despite 2 copies
    assert freq[hashed[FOOT]] == 4
    assert freq[hashed["alpha body one"]] == 1
    # the empty line in d1 never reaches the frequency table
    empty_hash = (
        spark.range(1).select(F.xxhash64(F.lit(""))).collect()[0][0]
    )
    assert empty_hash not in freq


def test_boilerplate_threshold(spark):
    assert boilerplate_lines(_docs(spark), min_doc_freq=4).count() == 2
    assert boilerplate_lines(_docs(spark), min_doc_freq=5).count() == 0


def test_removal_semantics(spark):
    out = {
        r.url: r.text
        for r in remove_boilerplate_lines(_docs(spark), min_doc_freq=3).collect()
    }
    assert out["d1"] == "alpha body one\n"   # both navs + footer gone; empty line kept
    assert out["d2"] == "beta body two"
    assert out["d3"] == "gamma body three"
    assert "d4" not in out                   # all-boilerplate doc dropped
    assert out["d5"] == "delta body five\nepsilon line"


def test_null_text_survives_as_empty_doc(spark):
    """A NULL-text row must not vanish from removal output (posexplode of a
    NULL split emits no rows); it is treated as the empty document and
    survives with '' text. Frequency counting ignores it entirely."""
    docs = _docs(spark).unionByName(
        spark.createDataFrame([("dnull",)], "url string").withColumn(
            "text", F.lit(None).cast("string")
        )
    )
    freq = {r.line_hash: r.n_docs for r in line_doc_freq(docs).collect()}
    base = {r.line_hash: r.n_docs for r in line_doc_freq(_docs(spark)).collect()}
    assert freq == base  # NULL text contributes no lines
    out = {
        r.url: r.text
        for r in remove_boilerplate_lines(docs, min_doc_freq=3).collect()
    }
    assert out["dnull"] == ""
    assert "d4" not in out  # the documented all-boilerplate drop still holds


def test_high_threshold_is_identity(spark):
    out = {
        r.url: r.text
        for r in remove_boilerplate_lines(_docs(spark), min_doc_freq=99).collect()
    }
    assert out == dict(DOCS)


def test_freq_exchange_is_slim_and_combined(spark):
    """The frequency pass's Exchanges must carry only 8-byte hashes with
    map-side partial aggregation — never line text — and no Window: the shape
    that survives 10^12 docs. Two exchanges total: the dominant distinct over
    (doc_hash, line_hash) pairs (what makes repeated captures count once) and
    the much smaller per-line document-frequency count after it."""
    docs = spark.range(2000).select(
        F.col("id").cast("string").alias("url"),
        F.concat(F.lit("nav\nbody "), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        line_doc_freq(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 2
    assert "partial_count" in plan
    assert "Window" not in plan


def test_multicapture_rows_count_once(spark):
    """Crawl input arrives multi-captured: many rows sharing one document id.
    Document frequency must count the ID once, so a much-recaptured page's
    unique content must NOT cross the boilerplate threshold (the bug this
    pins: row-frequency counting would strip — and then drop — the page)."""
    captures = [("dup", "unique content line\nsomething else")] * 50 + [
        ("d1", "alpha\nshared footer"),
        ("d2", "beta\nshared footer"),
        ("d3", "gamma\nshared footer"),
    ]
    docs = spark.createDataFrame(captures, "url string, text string")
    freq = {
        r.line_hash: r.n_docs for r in line_doc_freq(docs).collect()
    }
    h = lambda s: spark.range(1).select(  # noqa: E731
        F.xxhash64(F.lit(s))
    ).collect()[0][0]
    assert freq[h("unique content line")] == 1
    assert freq[h("shared footer")] == 3
    # threshold 3: only the real shared footer qualifies
    boiler = boilerplate_lines(docs, min_doc_freq=3)
    assert boiler.count() == 1


def test_removal_persist_handle(spark):
    """The boilerplate set is persisted so the corpus-wide frequency job runs
    once; the caller-supplied list receives the cached frame for release."""
    handles: list = []
    out = remove_boilerplate_lines(
        _docs(spark), min_doc_freq=3, persisted=handles
    )
    assert out.count() == 4
    assert len(handles) == 1 and handles[0].storageLevel.useMemory
    handles[0].unpersist()
    assert not handles[0].storageLevel.useMemory


def test_intra_doc_dedup_semantics(spark):
    """Within-page exact line dedup: first occurrence survives, later repeats
    go, whitespace-only lines are structure and ALWAYS survive (even when
    repeated), order is byte-preserved, and a line repeated only within one
    page is removed even though it could never cross a cross-document
    frequency threshold."""
    docs = spark.createDataFrame(
        [
            # nav twice, body re-pasted, two blank lines, a tab-only line
            ("p1", "nav bar\nalpha\n\nnav bar\nalpha\n\n\t\nomega"),
            # no repeats at all — identity, 0 removed
            ("p2", "one\ntwo\nthree"),
            # repeated blank-ish lines only — all preserved
            ("p3", "\n\n  \n  "),
        ],
        "url string, text string",
    )
    rows = {r.url: r for r in dedup_lines_within_doc(docs).collect()}
    assert rows["p1"].text == "nav bar\nalpha\n\n\n\t\nomega"
    assert rows["p1"].n_lines_removed == 2  # second nav + second alpha
    assert rows["p2"].text == "one\ntwo\nthree"
    assert rows["p2"].n_lines_removed == 0
    assert rows["p3"].text == "\n\n  \n  "  # whitespace-only lines untouched
    assert rows["p3"].n_lines_removed == 0


def test_intra_doc_dedup_null_and_crlf(spark):
    """NULL text is the empty document (survives with '', 0 removed); CRLF
    lines are byte-distinct from their bare-LF twins and must NOT dedup
    against them (the C4 CRLF lesson: trimming here would change bytes)."""
    docs = spark.createDataFrame(
        [("dnull", None), ("dcrlf", "foo\r\nfoo\nfoo\r")],
        "url string, text string",
    )
    rows = {r.url: r for r in dedup_lines_within_doc(docs).collect()}
    assert rows["dnull"].text == "" and rows["dnull"].n_lines_removed == 0
    # split on \n: ["foo\r", "foo", "foo\r"] — only the second foo\r repeats
    assert rows["dcrlf"].text == "foo\r\nfoo"
    assert rows["dcrlf"].n_lines_removed == 1


def test_intra_doc_dedup_is_shuffle_free(spark):
    """The tier must be ONE codegen projection: no Exchange, no Window, no
    Python — a map over the scan at any corpus size."""
    docs = spark.range(500).select(
        F.col("id").cast("string").alias("url"),
        F.concat(F.lit("nav\nbody "), F.col("id").cast("string"),
                 F.lit("\nnav")).alias("text"),
    )
    out = dedup_lines_within_doc(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert out.where(F.col("n_lines_removed") != 1).count() == 0


def test_removal_uses_broadcast_anti_join(spark):
    """With a small boilerplate set the anti-join must broadcast (no shuffle
    of the exploded lines for the join), leaving the reassembly groupBy as
    the only exchange that moves text."""
    docs = spark.range(500).select(
        F.col("id").cast("string").alias("url"),
        F.concat(F.lit("nav\nbody "), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        remove_boilerplate_lines(docs, min_doc_freq=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
