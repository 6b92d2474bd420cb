"""URL canonicalization unit + plan-quality tests.

Golden cases are hand-derived from the canonical form defined in
``functions/urls.py`` (scheme/host lowering, www/default-port/fragment/
tracking-param stripping, query byte-sort, trailing-slash collapse); the
equivalence-class test pins the property the URL dedup tier actually relies
on: every surface variant of the same logical page maps to ONE canonical id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cqaduplicatefind_spark.functions.urls import (
    canonical_url,
    latest_capture_per_url,
    with_canonical_url,
)

GOLDEN = [
    # (raw, canonical)
    ("https://example.com/a", "https://example.com/a"),
    ("HTTPS://WWW.Example.COM/a", "https://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/a///", "https://example.com/a"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com", "https://example.com"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    (
        "https://example.com/a?utm_source=x&b=2&utm_medium=y&a=1",
        "https://example.com/a?a=1&b=2",
    ),
    ("https://example.com/a?gclid=z&fbclid=w", "https://example.com/a"),
    # tracking-param KEYS match case-insensitively (case-preserved in the
    # wild); surviving pairs keep their bytes, values stay case-sensitive
    ("https://example.com/a?UTM_SOURCE=feed&a=1", "https://example.com/a?a=1"),
    ("https://example.com/a?Gclid=z&B=2", "https://example.com/a?B=2"),
    ("https://example.com/a?", "https://example.com/a"),
    ("https://example.com/a?x=1#f?fake=2", "https://example.com/a?x=1"),
    ("https://sub.www-like.example.com/a", "https://sub.www-like.example.com/a"),
    ("https://wwwx.example.com/a", "https://wwwx.example.com/a"),
    # junk rows pass through untouched (canonicalizer is total)
    ("not a url", "not a url"),
    ("", ""),
]


def test_canonical_url_goldens(spark):
    df = spark.createDataFrame(
        [(r,) for r, _ in GOLDEN], "url string"
    ).withColumn("got", canonical_url(F.col("url")))
    got = {r.url: r.got for r in df.collect()}
    for raw, want in GOLDEN:
        assert got[raw] == want, raw


def test_equivalence_class_collapses_to_one(spark):
    variants = [
        "https://example.com/page/1?a=1&b=2",
        "HTTPS://www.EXAMPLE.com/page/1?b=2&a=1",
        "https://example.com:443/page/1/?a=1&b=2&utm_campaign=c#top",
        "https://example.com/page/1?fbclid=abc&a=1&b=2",
    ]
    df = with_canonical_url(
        spark.createDataFrame([(v,) for v in variants], "url string")
    )
    assert df.select("canonical_url").distinct().count() == 1


def test_latest_capture_per_url(spark):
    rows = [
        ("https://a.com/x", 3, "d1"),
        ("https://WWW.A.com/x/", 7, "d2"),   # same page, newer
        ("https://a.com/x?utm_source=s", 5, "d3"),
        ("https://a.com/y", 1, "d4"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts long, doc string")
    out = {
        r.canonical_url: r
        for r in latest_capture_per_url(df, ts_col="warc_ts", tie_col="doc").collect()
    }
    assert out["https://a.com/x"].n_captures == 3
    assert out["https://a.com/x"].latest_ts == 7
    assert out["https://a.com/x"].latest_doc == "d2"
    assert out["https://a.com/y"].n_captures == 1


def test_latest_capture_tie_break_deterministic(spark):
    rows = [("https://a.com/x", 5, "d1"), ("https://a.com/x", 5, "d9")]
    df = spark.createDataFrame(rows, "url string, warc_ts long, doc string")
    row = latest_capture_per_url(df, ts_col="warc_ts", tie_col="doc").collect()[0]
    assert row.latest_doc == "d9"  # larger tie value wins


def test_canonicalize_is_shuffle_free_and_jvm_side(spark):
    """The canonicalizer must stay a narrow projection: no Exchange in the
    plan and no Python round-trip. (The query-param filter/sort are Catalyst
    higher-order functions — JVM expression eval, outside whole-stage codegen
    by Spark design, but still never a UDF.)"""
    df = with_canonical_url(
        spark.range(1000).select(
            F.concat(F.lit("https://WWW.h"), (F.col("id") % 7).cast("string"),
                     F.lit(".com/p/"), F.col("id").cast("string"),
                     F.lit("?utm_source=x&b=2&a=1#f")).alias("url")
        )
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_latest_capture_single_shuffle(spark):
    """URL-tier dedup is ONE aggregation: exactly one Exchange, a partial
    (map-side) combine before it, and no global Window — the shape that
    survives 10^12 rows. (The per-partition sorts belong to SortAggregate,
    forced by max_by's struct buffer; they are local, not a shuffle.)"""
    df = spark.range(1000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".com/p")).alias("url"),
        F.col("id").alias("warc_ts"),
    )
    plan = (
        latest_capture_per_url(df, ts_col="warc_ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Window" not in plan
    assert "partial_" in plan  # map-side combine before the shuffle
