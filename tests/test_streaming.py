"""Structured Streaming: incremental dedup over a file source, windowed metrics."""

import datetime as dt
import os

from pyspark.sql import functions as F

from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.streaming.incremental import (
    run_incremental_dedup,
    windowed_event_metrics,
)


def test_incremental_dedup_file_source(spark, tmp_path):
    cfg = DedupConfig(shingle_k=3, jaccard_threshold=0.7, shuffle_partitions=4)
    src = str(tmp_path / "incoming")
    os.makedirs(src)

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    batch1 = [(f"u{i}", base + f"tail{i}") for i in range(4)]          # near-dups
    batch2 = [("u9", base + "tail0"), ("u10", "totally different words here " * 8)]

    spark.createDataFrame(batch1, "url string, text string").write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema("url string, text string").parquet(src)
    q, dedup = run_incremental_dedup(spark, stream, cfg, str(tmp_path / "work"))
    q.awaitTermination(120)

    # first batch only populates the index (nothing to match against)
    n_first = dedup.matches().count()

    spark.createDataFrame(batch2, "url string, text string").write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema("url string, text string").parquet(src)
    q2, dedup2 = run_incremental_dedup(spark, stream2, cfg, str(tmp_path / "work"))
    q2.awaitTermination(120)

    got = {(r.id_a, r.id_b) for r in dedup2.matches().collect()}
    # u9 duplicates every u0..u3 (same base text); u10 matches nothing
    assert ("u0", "u9") in got
    assert not any("u10" in p for pair in got for p in pair)
    assert len(got) >= n_first


def test_windowed_event_metrics_batch_semantics(spark):
    # semantics check on a static frame (same expression tree as streaming)
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 10, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 11, "click", 2.0, "{}"),
        (3, t0 + dt.timedelta(hours=2), 12, "view", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    out = {
        (r.window_start.hour, r.event_type): (r.n, r.total)
        for r in windowed_event_metrics(df).collect()
    }
    assert out[(0, "click")] == (2, 3.0)
    assert out[(2, "view")] == (1, 5.0)
