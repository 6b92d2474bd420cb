"""PII redaction (functions/pii.py): golden redactions, audit counts, the
order-of-application property, and the shuffle-free plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from cqaduplicatefind_spark.functions.pii import redact_pii, with_pii_redacted

GOLDEN = [
    # (raw, redacted)
    ("mail me at bob.smith+x@sub.example.co.uk today",
     "mail me at <EMAIL> today"),
    ("two: a@b.io and c_d%e@f-g.org here",
     "two: <EMAIL> and <EMAIL> here"),
    ("server 192.168.001.1 and 10.0.0.7", "server <IP> and <IP>"),
    ("call 555-0123 or 415 555 0199", "call <PHONE> or <PHONE>"),
    # email domain must be consumed by the email rule, not half-eaten by the
    # IP/phone rules; digit-bearing local parts stay inside the email match
    ("x 42admin@ops.example.org y", "x <EMAIL> y"),
    # word boundaries: version-ish digit runs that are NOT phones/IPs survive
    ("build 12345678 and 1.2 and 1.2.3", "build 12345678 and 1.2 and 1.2.3"),
    ("", ""),
    ("no pii here", "no pii here"),
]


def test_redaction_goldens(spark):
    df = spark.createDataFrame(
        [(r,) for r, _ in GOLDEN], "text string"
    ).withColumn("got", redact_pii(F.col("text")))
    got = {r.text: r.got for r in df.collect()}
    for raw, want in GOLDEN:
        assert got[raw] == want, raw


def test_counts_and_columns(spark):
    df = with_pii_redacted(
        spark.createDataFrame(
            [("u1", "a@b.io and c@d.org from 10.0.0.1 call 555-0100")],
            "url string, text string",
        )
    )
    row = df.collect()[0]
    assert row.n_email == 2 and row.n_ip == 1 and row.n_phone == 1
    assert row.clean_text == "<EMAIL> and <EMAIL> from <IP> call <PHONE>"
    assert row.text.startswith("a@b.io")  # raw column untouched


def test_counts_reconcile_with_placeholders_on_nested_shapes(spark):
    """Counts are chained in redaction order: an IPv4-looking domain inside an
    email redacts as ONE <EMAIL>, and n_ip must be 0 — n_<kind> always equals
    the number of <KIND> placeholders in clean_text (a raw-text count would
    report n_ip=1 for a page whose redacted text contains no IP)."""
    df = with_pii_redacted(
        spark.createDataFrame(
            [("u1", "mail user@10.1.2.3.example.net and real 10.9.8.7 here")],
            "url string, text string",
        )
    )
    row = df.collect()[0]
    assert row.clean_text == "mail <EMAIL> and real <IP> here"
    assert row.n_email == 1 and row.n_ip == 1 and row.n_phone == 0
    for kind, n in (("<EMAIL>", row.n_email), ("<IP>", row.n_ip),
                    ("<PHONE>", row.n_phone)):
        assert row.clean_text.count(kind) == n


def test_redaction_enables_exact_dedup(spark):
    """Two pages differing only in contact lines become byte-identical after
    redaction — the property the dedup pipeline relies on."""
    rows = [
        ("u1", "great article body. contact alice@a.com or 555-0101"),
        ("u2", "great article body. contact bob@b.org or 555-0202"),
    ]
    df = with_pii_redacted(spark.createDataFrame(rows, "url string, text string"))
    assert df.select("clean_text").distinct().count() == 1


def test_redaction_is_shuffle_free_and_jvm_side(spark):
    df = with_pii_redacted(
        spark.range(1000).select(
            F.col("id").cast("string").alias("url"),
            F.concat(F.lit("body u"), F.col("id").cast("string"),
                     F.lit("@x.io at 10.0.0.1")).alias("text"),
        )
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
