"""Stage-level breakdown of the span branch at sf0.1: which job eats the
with_span - nospan delta?  Everything warm, signatures/edges pre-cached so
only the span-branch-specific work is timed.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import make_pages
from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.operators.connected_components import (
    attach_singletons,
    connected_components,
)
from cqaduplicatefind_spark.operators.overlap import exact_span_edges
from cqaduplicatefind_spark.operators.verify import accept_edges, score_pairs
from cqaduplicatefind_spark.plans.pipeline import (
    candidate_stage,
    normalize_stage,
    signature_stage,
)
from cqaduplicatefind_spark.session import build_session


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s -> {out}", flush=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="cqadf-profile-span-stages",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra={"spark.ui.enabled": "false", "spark.driver.memory": "6g"},
    )
    cfg = DedupConfig(shingle_k=3, jaccard_threshold=0.7)
    pages = make_pages(spark, sf_dir).cache()
    print(f"n_docs={pages.count()}", flush=True)

    sigs = signature_stage(normalize_stage(pages, cfg), cfg).persist()
    timed("signatures (cold+persist)", lambda: sigs.count())
    cands = candidate_stage(sigs, cfg, mode="base").persist()
    timed("candidates", lambda: cands.count())
    scored = score_pairs(cands, sigs, cfg, evidence=cfg.verify_evidence,
                         keep_cols=("is_star",)).persist()
    timed("scored", lambda: scored.count())
    edges = accept_edges(scored, cfg).persist()
    timed("edges", lambda: edges.count())

    for trial in range(2):
        print(f"--- trial {trial} ---", flush=True)
        pre = connected_components(
            edges.select("id_a", "id_b"),
            assume_unconverged=True, input_distinct=True,
        ).persist()
        timed("pre_clusters CC", lambda: pre.count())

        persisted: list = []
        ov = exact_span_edges(sigs, cfg, exclude_assignments=pre,
                              persisted=persisted)
        n_ov = timed("exact_span_edges", lambda: ov.count())

        if n_ov == 0:
            timed("attach_singletons(pre)",
                  lambda: attach_singletons(pages.select("url"), pre).count())
        else:
            all_edges = pre.select(
                F.col("id").alias("id_a"), F.col("cluster_id").alias("id_b")
            ).unionByName(ov.select("id_a", "id_b"))
            timed("second CC + attach",
                  lambda: attach_singletons(
                      pages.select("url"),
                      connected_components(all_edges, input_distinct=True),
                  ).count())
        # nospan-branch equivalent for comparison: single CC + attach
        timed("nospan clusters (CC+attach)",
              lambda: attach_singletons(
                  pages.select("url"),
                  connected_components(
                      edges.select("id_a", "id_b"),
                      assume_unconverged=True, input_distinct=True,
                  ),
              ).count())
        pre.unpersist()
        for h in persisted:
            h.unpersist()
        time.sleep(5)
    spark.stop()


if __name__ == "__main__":
    main()
