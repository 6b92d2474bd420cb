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
    """Three micro-batches: (1) intra-batch duplicates are detected within their
    own batch (match results independent of batch boundaries), (2) a later dup
    matches the accumulated index, (3) per-batch work reads the slim band index
    but fetches signature payloads ONLY for candidate ids — an unrelated batch
    touches zero payload rows no matter how big the index is."""
    cfg = DedupConfig(shingle_k=3, jaccard_threshold=0.7, shuffle_partitions=4)
    src = str(tmp_path / "incoming")
    os.makedirs(src)

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    batch1 = [(f"u{i}", base + f"tail{i}") for i in range(4)]          # near-dups
    batch2 = [("u9", base + "tail0"), ("v0", "totally different words here " * 8)]
    batch3 = [(f"w{i}", f"unrelated corpus w{i} " + "qq ww ee rr tt yy " * 10)
              for i in range(3)]

    def run_batch(rows):
        spark.createDataFrame(rows, "url string, text string").write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema("url string, text string").parquet(src)
        q, dedup = run_incremental_dedup(spark, stream, cfg, str(tmp_path / "work"))
        q.awaitTermination(120)
        return dedup

    # batch 1: intra-batch duplicate pairs are found immediately — results do
    # not depend on arbitrary micro-batch boundaries
    d1 = run_batch(batch1)
    got1 = {(r.id_a, r.id_b) for r in d1.matches().collect()}
    assert got1 == {
        (f"u{i}", f"u{j}") for i in range(4) for j in range(4) if i < j
    }

    # batch 2: u9 duplicates every u0..u3 via the accumulated index; v0 nothing
    d2 = run_batch(batch2)
    got2 = {(r.id_a, r.id_b) for r in d2.matches().collect()}
    assert got2 - got1 == {(f"u{i}", "u9") for i in range(4)}
    (s2,) = d2.batch_stats
    assert s2["n_index_band_rows"] == 4 * cfg.bands  # slim band index joined
    # payload rows fetched = only candidate ids (u0..u3, u9), NOT the whole index
    assert s2["n_sig_payload_rows"] == 5

    # batch 3: unrelated docs -> zero candidates, ZERO payload rows fetched even
    # though the index now holds 6 docs
    d3 = run_batch(batch3)
    (s3,) = d3.batch_stats
    assert s3["n_candidates"] == 0
    assert s3["n_sig_payload_rows"] == 0
    assert {(r.id_a, r.id_b) for r in d3.matches().collect()} == got2


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
