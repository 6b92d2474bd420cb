"""Dump .explain('formatted') for the round-6 optimization evidence.

Usage: python tools/dump_plans_r06.py <suffix> [name ...]
Writes plans/r06/<name>_<suffix>.txt for each requested surface (default: the
bench-timed singletons plus the pipeline stage frames and the incremental-store
internals the round touches). ``suffix`` is ``before`` or ``after``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.session import build_session

TIMED_SINGLETONS = [
    "groupby_agg_tpch_q1", "multiway_join_agg", "window_topk_per_group",
    "ngram_jaccard_pairs", "minhash_md5_signatures", "ann_cosine_topk",
    "exact_dedup_hash_groups", "time_window_agg", "lang_id_histogram",
    "latest_event_per_user", "retrieval_metrics_p_at_k",
    "unigram_logprob_quality", "c4_clean_docs", "bm25_topk_retrieval",
]


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(
        app_name="dump-plans-r06", master="local[8]", shuffle_partitions=8,
        extra={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    frames: dict = {}
    for name in TIMED_SINGLETONS:
        if not only or name in only:
            frames[name] = lambda name=name: qs[name](spark, sf)

    def pipeline_frames():
        from bench import make_pages
        from cqaduplicatefind_spark.operators.verify import (
            accept_edges,
            score_pairs,
        )
        from cqaduplicatefind_spark.plans.pipeline import (
            candidate_stage,
            normalize_stage,
            signature_stage,
        )

        cfg = DedupConfig(shingle_k=3, jaccard_threshold=0.7)
        pages = make_pages(spark, sf, replicate=2)
        signatures = signature_stage(normalize_stage(pages, cfg), cfg)
        cand = candidate_stage(signatures, cfg)
        return {
            "pipeline_signatures": lambda: signatures,
            "pipeline_candidates": lambda: cand,
            "pipeline_verify_edges": lambda: accept_edges(
                score_pairs(cand, signatures, cfg, evidence=cfg.verify_evidence),
                cfg,
            ),
        }

    def incremental_frames():
        """Lazy frames matching process_batch's internal plan shapes against a
        small on-disk store (written here, then discarded)."""
        import shutil
        import tempfile

        from cqaduplicatefind_spark.functions.signatures import with_signatures
        from cqaduplicatefind_spark.plans.delta import seed_index
        from cqaduplicatefind_spark.streaming.incremental import (
            SIG_COLS,
            IncrementalDedup,
        )

        cfg = DedupConfig(shingle_k=3, jaccard_threshold=0.7)
        docs = spark.read.parquet(f"{sf}/documents.parquet").limit(400)
        pages = docs.select(
            F.col("doc_id").cast("string").alias("url"), F.col("text")
        )
        work = tempfile.mkdtemp(prefix="plans_r06_store_")
        seed_index(spark, pages, cfg, work)
        dedup = IncrementalDedup(
            spark, cfg,
            os.path.join(work, "bands"), os.path.join(work, "sigs"),
            os.path.join(work, "matches"),
        )
        # suffix "before" reproduces the round-start read path (schema
        # inference via mergeSchema); "after" uses the declared-schema reads
        # process_batch now issues
        from cqaduplicatefind_spark.streaming.incremental import (
            BAND_STORE_SCHEMA,
            SIG_STORE_SCHEMA,
        )

        band_schema = BAND_STORE_SCHEMA if suffix != "before" else None
        sig_schema = SIG_STORE_SCHEMA if suffix != "before" else None
        idx_bands = dedup._read_batches(
            dedup.bands_dir, exclude_batch=1, schema=band_schema
        )
        sig_store = dedup._read_batches(
            dedup.sigs_dir, exclude_batch=1, schema=sig_schema
        )
        batch = (
            with_signatures(pages.withColumn("norm_text", F.col("text")), cfg,
                            "norm_text")
            .select(*SIG_COLS)
            .where(F.col("n_shingles") > 0)
        )
        from cqaduplicatefind_spark.operators.candidates import explode_bands

        new_bands = explode_bands(batch, cfg).withColumn("is_new", F.lit(True))
        touched = new_bands.select("band", "bh").distinct()
        out = {
            "incremental_band_store_read": lambda: idx_bands,
            "incremental_sig_store_read": lambda: sig_store,
            "incremental_idx_semi_join": lambda: idx_bands.join(
                F.broadcast(touched), ["band", "bh"], "left_semi"
            ).dropDuplicates(["id", "band", "bh"]),
        }
        # note: store dir is leaked to /tmp for the session lifetime; plan-dump
        # only, removed by the OS tmp cleaner
        out["_cleanup"] = lambda: shutil.rmtree(work, ignore_errors=True)
        return out

    results = {}
    for name, fn in frames.items():
        results[name] = _formatted(fn())
    if not only or any(k.startswith("pipeline") for k in only):
        for name, fn in pipeline_frames().items():
            if not only or name in only:
                results[name] = _formatted(fn())
    if not only or any(k.startswith("incremental") for k in only):
        inc = incremental_frames()
        cleanup = inc.pop("_cleanup")
        for name, fn in inc.items():
            if not only or name in only:
                df = fn()
                if df is not None:
                    results[name] = _formatted(df)
        cleanup()

    for name, text in results.items():
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
