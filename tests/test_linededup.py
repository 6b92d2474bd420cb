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


def test_high_threshold_is_identity(spark):
    out = {
        r.url: r.text
        for r in remove_boilerplate_lines(_docs(spark), min_doc_freq=99).collect()
    }
    assert out == dict(DOCS)


def test_freq_exchange_is_slim_and_combined(spark):
    """The frequency pass's single Exchange must carry only the 8-byte hash
    with a map-side partial count — never line text — and no Window: the
    shape that survives 10^12 docs."""
    docs = spark.range(2000).select(
        F.col("id").cast("string").alias("url"),
        F.concat(F.lit("nav\nbody "), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        line_doc_freq(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan
    assert "Window" not in plan


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
