"""SparkSession construction with scale-appropriate defaults.

Centralizes the tuning the north_rule requires to be explicit: shuffle partition
counts, AQE (runtime coalescing + skew-join splitting), and Arrow batching for the
pandas-UDF stages. In production these settings ride along spark-submit; tests and
bench use this helper so every run is reproducible from code.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "cqaduplicatefind-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    arrow_max_records: int = 2048,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    confs = {
        # explicit shuffle width (north_rule: partitioning handled explicitly);
        # AQE coalesces down at runtime when partitions are small
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        # SIZE-driven coalescing (r6): with the default parallelismFirst=true
        # AQE refuses to coalesce below defaultParallelism, so every tiny
        # shuffle in the many-small-jobs paths (incremental store kernels, CC
        # fixed-point probes, singleton queries) still scheduled 32 reduce
        # tasks for kilobytes of data — pure task-launch overhead. Size-first
        # coalescing collapses those to 1-2 tasks while big stages still get
        # bytes/advisory tasks; 4m (not the 64m default) keeps mid-size
        # CPU-bound stages (verify joins at sf0.1, tens of MB compressed) at
        # healthy parallelism — coalescing can only merge DOWN from
        # shuffle_partitions, so large stages are unchanged. Scale-adaptive by
        # construction: partition count follows data volume.
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        # hot LSH bands produce skewed shuffle blocks; let AQE split them too
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # runtime join-strategy upgrades (r6, guide §3.1): the static planner
        # sees unmaterialized caches/store scans and estimates them large, so
        # the verify-side joins (candidate pairs x signature payloads) planned
        # sort-merge even when the runtime side is a few MB. AQE re-decides
        # per query stage from EXACT shuffle sizes: <=24m builds a broadcast
        # hash join (skips the sort and the probe-side exchange network read;
        # kept below the verify-join payload sizes — building a 40-80MB hash
        # relation single-threaded measurably taxed the pipeline legs in the
        # 64m A/B), and partitions <=64m may build local shuffled-hash joins
        # (skips the sort, parallel build). Both are size-gated at runtime,
        # so a 100TB run with multi-GB stages keeps sort-merge automatically —
        # nothing here is tuned to the local corpus size.
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "24m",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
        # local-FS writes: commit algorithm v2 renames task output once
        # instead of twice (job commit loops over per-task dirs in v1) — the
        # incremental stores commit 3 writes per micro-batch
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        # Arrow transfer for pandas UDFs; bounded batches keep the numpy signature
        # kernels' intermediates small and the pipeline memory-stable
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(arrow_max_records),
        "spark.sql.session.timeZone": "UTC",
        # deterministic shuffle behavior for the local[8]==local[32] check
        "spark.sql.execution.sortBeforeRepartition": "true",
    }
    # shuffle files on tmpfs when available: this sandbox's /tmp is a slow overlay
    # (2x shuffle-stage latency). On a real cluster the platform sets local dirs
    # (NVMe) and this is skipped via SPARK_GRAFT_LOCAL_DIR='' or an existing env.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        confs["spark.local.dir"] = local_dir
    if extra:
        confs.update(extra)
    for k, v in confs.items():
        b = b.config(k, v)
    return b.getOrCreate()
