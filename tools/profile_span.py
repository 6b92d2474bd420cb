"""One-off profiler: where does the span pass's sf0.1 overhead go?

Times, warm, on the bench corpus: (a) full pipeline span off, (b) span on,
(c) the het-aggregate job in isolation, (d) the fingerprint explode+count.
"""
from __future__ import annotations

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import make_pages
from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.plans.pipeline import (
    normalize_stage,
    run_pipeline,
    signature_stage,
)
from cqaduplicatefind_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="cqadf-profile-span",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra={"spark.ui.enabled": "false", "spark.driver.memory": "6g"},
    )
    cfg = DedupConfig(shingle_k=3, jaccard_threshold=0.7)
    pages = make_pages(spark, sf_dir).cache()
    n = pages.count()
    print(f"n_docs={n}", flush=True)

    def full(c):
        t0 = time.perf_counter()
        r = run_pipeline(spark, pages, c)
        r.clusters.count()
        r.release()
        return time.perf_counter() - t0

    # warm-up (span on = superset)
    full(cfg)
    time.sleep(10)

    nospan = replace(cfg, span_pass=False)
    for i in range(3):
        t_off = full(nospan)
        time.sleep(10)
        t_on = full(cfg)
        time.sleep(10)
        print(f"trial{i}: span_off={t_off:.2f}s span_on={t_on:.2f}s "
              f"delta={t_on - t_off:+.2f}s", flush=True)

    # isolated sub-jobs: signatures cached, then the span pieces
    sigs = signature_stage(normalize_stage(pages, cfg), cfg).cache()
    sigs.count()
    time.sleep(5)

    # fingerprint explode volume + cost
    t0 = time.perf_counter()
    slim = sigs.where(F.col("n_tokens") >= cfg.min_overlap_span).select(
        "url", F.explode("span_fps").alias("fp"))
    n_fp = slim.count()
    t_explode = time.perf_counter() - t0
    print(f"explode: {n_fp} fp rows in {t_explode:.2f}s", flush=True)
    time.sleep(5)

    # het aggregate with a fake single-cluster assignment (worst case: nothing
    # pure -> aggregate scans everything). Using xxhash64(url) as cluster.
    t0 = time.perf_counter()
    fps = sigs.where(F.col("n_tokens") >= cfg.min_overlap_span).select(
        "url", F.xxhash64("url").alias("_cl"), F.explode("span_fps").alias("fp"))
    het = (fps.groupBy("fp").agg(F.min("_cl").alias("lo"), F.max("_cl").alias("hi"))
           .where(F.col("lo") != F.col("hi")))
    n_het = het.count()
    t_agg = time.perf_counter() - t0
    print(f"het aggregate (all-singleton clusters): {n_het} het buckets "
          f"in {t_agg:.2f}s", flush=True)
    sigs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
