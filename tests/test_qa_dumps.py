"""Reference-format ingestion (orient='index' JSON dumps) and labeled-pair CSV
round-trip — SURVEY S1-S4 lifecycle A end to end."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cqaduplicatefind_spark.operators.pairs import (
    gold_edges_from_dups,
    labeled_pairs,
)
from cqaduplicatefind_spark.sources.qa_dumps import (
    read_pairs_csv,
    read_question_dumps,
    write_pairs_csv,
)


@pytest.fixture(scope="module")
def dump_dir(tmp_path_factory):
    """Two per-forum dumps in the reference's orient='index' shape."""
    d = tmp_path_factory.mktemp("dumps")
    android = {
        "101": {"title": "wifi drops", "body": "<p>wifi keeps dropping</p>",
                "dups": ["102"], "tags": ["wifi"]},
        "102": {"title": "wifi disconnects", "body": "<p>wifi disconnects a lot</p>",
                "dups": ["101"]},
        "103": {"title": "battery drain", "body": "<p>battery dies fast</p>",
                "dups": []},
        "104": {"title": "screen rotate", "body": "<p>rotation stuck</p>"},
    }
    gaming = {
        "201": {"title": "fps drops", "body": "<p>frames tank</p>", "dups": []},
        "202": {"title": "controller lag", "body": "<p>input lag</p>", "dups": []},
    }
    (d / "android.json").write_text(json.dumps(android))
    (d / "gaming.json").write_text(json.dumps(gaming))
    return str(d)


def test_read_question_dumps(spark, dump_dir):
    df = read_question_dumps(spark, dump_dir + "/*.json").cache()
    assert df.count() == 6
    assert set(df.columns) == {"forum", "question_id", "title", "body", "dups"}
    rows = {r.question_id: r for r in df.collect()}
    assert rows["101"].forum == "android"
    assert rows["201"].forum == "gaming"
    assert rows["101"].dups == ["102"]
    assert rows["104"].dups == []  # missing dups field -> empty array, not null
    # extra JSON fields (tags) silently ignored, like the reference's projection
    assert rows["101"].title == "wifi drops"


def test_dump_to_labeled_pairs_to_csv_roundtrip(spark, dump_dir, tmp_path):
    docs = read_question_dumps(spark, dump_dir + "/*.json").select(
        F.col("question_id").alias("url"),
        F.concat_ws(" ", "title", "body").alias("norm_text"),
        "dups",
    )
    gold = gold_edges_from_dups(docs)
    assert gold.count() == 1  # 101<->102 canonicalized to one edge

    pairs = labeled_pairs(docs, gold, negatives_per_positive=2)
    got = pairs.collect()
    n_pos = sum(1 for r in got if r.dup == 1)
    n_neg = sum(1 for r in got if r.dup == 0)
    assert n_pos == 2  # one per direction (each doc with a gold dup)
    assert n_neg >= 1  # small negative pool, ratio capped by availability

    out = str(tmp_path / "pairs_csv")
    write_pairs_csv(pairs, out)
    back = read_pairs_csv(spark, out)
    assert back.count() == pairs.count()
    assert set(back.columns) == {"q1_id", "q1", "q2_id", "q2", "dup"}
    # exact content round-trip
    assert pairs.exceptAll(back).count() == 0
    assert back.exceptAll(pairs).count() == 0


def test_pairs_csv_roundtrips_newlines_and_quotes(spark, tmp_path):
    """Forum text contains newlines and quotes; write_pairs_csv emits them as
    quoted multi-line records and read_pairs_csv must reassemble them (the
    default line-oriented reader split such records into malformed rows)."""
    pairs = spark.createDataFrame(
        [
            ("a", 'first line\nsecond "quoted" line', "b", "plain", 1),
            ("c", "text, with comma", "d", "tab\there", 0),
        ],
        "q1_id string, q1 string, q2_id string, q2 string, dup int",
    )
    out = str(tmp_path / "csv")
    write_pairs_csv(pairs, out)
    back = read_pairs_csv(spark, out)
    assert back.count() == 2
    assert pairs.exceptAll(back).count() == 0
    assert back.exceptAll(pairs).count() == 0


def test_malformed_dump_raises(spark, tmp_path):
    """A truncated/invalid dump must raise, not silently erase the forum
    (from_json -> NULL -> explode emits no rows; the reference's pd.read_json
    raises on the same input)."""
    good = tmp_path / "good.json"
    good.write_text(json.dumps({"1": {"title": "t", "body": "b", "dups": []}}))
    bad = tmp_path / "bad.json"
    bad.write_text('{"1": {"title": "t", "body"')  # truncated
    # the guard lives IN the plan (lazy raise_error — keeps the read single-
    # pass), so the failure surfaces at the first action as a Spark exception
    # carrying the malformed file's name
    with pytest.raises(Exception, match="malformed"):
        read_question_dumps(spark, str(tmp_path / "*.json")).count()
    # a directory of only-good files still reads
    bad.unlink()
    assert read_question_dumps(spark, str(tmp_path / "*.json")).count() == 1
