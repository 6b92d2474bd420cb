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
