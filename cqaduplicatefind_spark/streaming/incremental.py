"""Incremental near-duplicate detection with Structured Streaming.

The reference is batch-only (SURVEY.md §2.10); this is the engine's forward path
for continuously-arriving crawl data: new pages stream in, get normalized + signed
with the SAME Arrow-batched kernels as batch (identical signatures by construction),
and are matched against the accumulated corpus index via the LSH band join inside
``foreachBatch``.

Design:
- signature computation is a stateless narrow map -> works unchanged on a streaming
  DataFrame;
- the corpus index (signatures stage table) lives in the warehouse; each micro-batch
  LSH-joins its new docs against the index, emits duplicate edges, then appends its
  own signatures to the index (exactly-once via batch-id-keyed idempotent writes —
  here: overwrite-by-batch-subdir, the Iceberg ``MERGE`` analog);
- event-time windowed aggregation with a watermark covers the metrics-over-time
  surface (docs/sec, dup-rate per window).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.functions.normalize import with_normalized_text
from cqaduplicatefind_spark.functions.signatures import with_signatures
from cqaduplicatefind_spark.operators.candidates import explode_bands
from cqaduplicatefind_spark.operators.verify import accept_edges, score_pairs


def stream_signatures(pages_stream: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Streaming pages(url, text, ...) -> streaming signatures. Stateless."""
    norm = with_normalized_text(pages_stream, "text", "norm_text")
    return with_signatures(norm, cfg, "norm_text").select(
        "url", "minhash", "simhash", "n_tokens", "n_shingles", "shingles"
    )


class IncrementalDedup:
    """foreachBatch processor: match each micro-batch against the corpus index.

    ``index_dir`` holds per-batch parquet subdirs (idempotent re-runs of a batch id
    overwrite their own subdir — micro-batch replays cannot duplicate index rows).
    Matches append to ``matches_dir``, partitioned by batch id the same way.
    """

    def __init__(self, spark: SparkSession, cfg: DedupConfig,
                 index_dir: str, matches_dir: str) -> None:
        self.spark = spark
        self.cfg = cfg
        self.index_dir = index_dir
        self.matches_dir = matches_dir
        os.makedirs(index_dir, exist_ok=True)
        os.makedirs(matches_dir, exist_ok=True)

    def _index(self) -> DataFrame | None:
        subdirs = [
            os.path.join(self.index_dir, d)
            for d in os.listdir(self.index_dir)
            if d.startswith("batch=")
        ]
        if not subdirs:
            return None
        return self.spark.read.parquet(*subdirs)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            index = self._index()
            if index is not None:
                new_bands = explode_bands(batch_df, self.cfg).withColumnRenamed(
                    "id", "id_new"
                )
                idx_bands = explode_bands(index, self.cfg).withColumnRenamed(
                    "id", "id_idx"
                )
                cand = (
                    new_bands.join(idx_bands, ["band", "bh"])
                    .where(F.col("id_new") != F.col("id_idx"))
                    .select(
                        F.least("id_new", "id_idx").alias("id_a"),
                        F.greatest("id_new", "id_idx").alias("id_b"),
                    )
                    .dropDuplicates(["id_a", "id_b"])
                )
                both = index.unionByName(batch_df.select(*index.columns))
                scored = score_pairs(cand, both, self.cfg)
                edges = accept_edges(scored, self.cfg)
                edges.write.mode("overwrite").parquet(
                    os.path.join(self.matches_dir, f"batch={batch_id}")
                )
            # idempotent index append: replays overwrite their own subdir
            batch_df.write.mode("overwrite").parquet(
                os.path.join(self.index_dir, f"batch={batch_id}")
            )
        finally:
            batch_df.unpersist()

    def matches(self) -> DataFrame:
        subdirs = [
            os.path.join(self.matches_dir, d)
            for d in os.listdir(self.matches_dir)
            if d.startswith("batch=")
        ]
        if not subdirs:
            return self.spark.createDataFrame(
                [], "id_a string, id_b string, jaccard double, est_jaccard double, "
                    "hamming int, containment double"
            )
        return self.spark.read.parquet(*subdirs)


def run_incremental_dedup(
    spark: SparkSession,
    pages_stream: DataFrame,
    cfg: DedupConfig,
    work_dir: str,
    checkpoint_dir: str | None = None,
):
    """Wire a streaming pages source through signature computation into the
    incremental matcher. Returns (query, dedup) — await query termination, then
    read ``dedup.matches()``."""
    sigs = stream_signatures(pages_stream, cfg)
    dedup = IncrementalDedup(
        spark, cfg, os.path.join(work_dir, "index"), os.path.join(work_dir, "matches")
    )
    q = (
        sigs.writeStream.foreachBatch(dedup.process_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(work_dir, "checkpoint"),
        )
        .trigger(availableNow=True)
        .start()
    )
    return q, dedup


def windowed_event_metrics(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late data beyond the watermark is
    dropped; state is bounded) — the Structured Streaming metrics surface."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )
