"""spark-submit entry point for the dedup pipeline (north_rule: "runs launch via
spark-submit --py-files on multi-executor clusters").

Examples
--------
Local smoke run over a parquet pages table, writing stage tables + clusters::

    spark-submit --py-files cqaduplicatefind_spark.zip \
        -m cqaduplicatefind_spark.run ...          # or:
    spark-submit --py-files cqaduplicatefind_spark.zip run.py \
        --input /data/pages.parquet --id-col url --text-col text \
        --output /out/dedup --warehouse /out/warehouse \
        --shingle-k 5 --jaccard-threshold 0.8 --shuffle-partitions 4096

On a cluster, master/executor sizing comes from spark-submit flags
(``--master yarn --num-executors N --executor-cores C``); this module only sets
job-level knobs (shuffle width, AQE, Arrow batching) via ``build_session``'s
defaults, which spark-submit-provided conf overrides.

Resumability: with ``--warehouse`` every stage (signatures, candidate_pairs,
scored_pairs, dup_edges, clusters) is written as a checkpointed stage table with
a manifest (row count + config fingerprint + lineage); re-running the same
command resumes from the last completed stage (see ``sources/warehouse.py``).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cqaduplicatefind_spark.run",
        description="Near-duplicate detection + clustering over a pages table",
    )
    p.add_argument("--input", required=True, help="parquet path of the pages table")
    p.add_argument("--id-col", default="url")
    p.add_argument("--text-col", default="text")
    p.add_argument("--html-col", default=None,
                   help="binary/string HTML column; when set, text is re-extracted "
                        "with the byte-identical strip_tags pass")
    p.add_argument("--group-col", default=None,
                   help="scope dedup within groups (the reference's per-forum runs, "
                        "as ONE job); omit for the combined corpus run")
    p.add_argument("--output", required=True, help="output dir (clusters/, edges/, metrics.json)")
    p.add_argument("--warehouse", default=None, help="stage-table dir for resumable checkpoints")
    p.add_argument("--shingle-k", type=int, default=5)
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--num-perms", type=int, default=128)
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--rows-per-band", type=int, default=8)
    p.add_argument("--hamming-k", type=int, default=3)
    p.add_argument("--max-band-group", type=int, default=8)
    p.add_argument("--shuffle-partitions", type=int, default=None,
                   help="explicit shuffle width; default = spark.sql.shuffle.partitions")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)

    # under spark-submit a session already exists with the submitted conf;
    # getOrCreate attaches to it instead of building a new one
    from cqaduplicatefind_spark.config import DedupConfig
    from cqaduplicatefind_spark.plans.pipeline import run_pipeline
    from cqaduplicatefind_spark.sources.warehouse import Warehouse

    spark = SparkSession.builder.appName("cqaduplicatefind-run").getOrCreate()
    shuffle = args.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    cfg = DedupConfig(
        shingle_k=args.shingle_k,
        jaccard_threshold=args.jaccard_threshold,
        num_perms=args.num_perms,
        bands=args.bands,
        rows_per_band=args.rows_per_band,
        hamming_k=args.hamming_k,
        max_band_group=args.max_band_group,
        shuffle_partitions=shuffle,
        signature_partitions=shuffle,
    )

    pages = spark.read.parquet(args.input)
    sel = [F.col(args.id_col).cast("string").alias("url")]
    if args.html_col:
        sel.append(F.col(args.html_col).alias("html"))
    sel.append(F.col(args.text_col).alias("text"))
    if args.group_col:
        sel.append(F.col(args.group_col).cast("string").alias("group"))
    pages = pages.select(*sel)

    from cqaduplicatefind_spark.sources.warehouse import input_fingerprint_for

    warehouse = (
        Warehouse(
            args.warehouse,
            cfg.fingerprint(),
            input_fingerprint=input_fingerprint_for(pages, args.input),
        )
        if args.warehouse
        else None
    )
    t0 = time.time()
    result = run_pipeline(
        spark,
        pages,
        cfg,
        warehouse=warehouse,
        use_html=bool(args.html_col),
        group_col="group" if args.group_col else None,
    )

    result.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    result.edges.select("id_a", "id_b", "jaccard", "hamming").write.mode(
        "overwrite"
    ).parquet(f"{args.output}/edges")

    clusters = spark.read.parquet(f"{args.output}/clusters")
    n_docs = clusters.count()
    n_members = clusters.where(F.col("url") != F.col("cluster_id")).count()
    wall = time.time() - t0
    metrics = {
        "n_docs": n_docs,
        "n_nontrivial_members": n_members,
        "n_edges": spark.read.parquet(f"{args.output}/edges").count(),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1) if wall > 0 else None,
        "config_fingerprint": cfg.fingerprint(),
        "stage_metrics": result.stage_metrics,
    }
    # the small metrics blob goes through the Hadoop filesystem API so it
    # lands NEXT TO clusters/ and edges/ for any --output scheme (hdfs://,
    # s3a://, file:/). Driver-local open() would write a literal
    # 'hdfs:/...' directory on the driver's disk — the data outputs succeed
    # while the metrics file silently lands somewhere else entirely.
    # Stage-level metrics live in the warehouse manifests when --warehouse
    # is set.
    blob = json.dumps(metrics, indent=2)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(f"{args.output}/metrics.json")
    fs = path.getFileSystem(hconf)
    out = fs.create(path, True)
    try:
        out.write(bytearray(blob.encode("utf-8")))
    finally:
        out.close()
    # every output is written and metrics are re-read from disk above, so the
    # pipeline's cached frames (signatures, candidates, base edges) are done:
    # release them. Under spark-submit the session usually ends right after,
    # but a long-lived session re-invoking main() (notebook driver, repeated
    # --resume runs against one session) would otherwise accrete executor
    # storage per invocation.
    result.release()
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
