"""Batch delta-dedup: match a new crawl increment against an accumulated corpus
index WITHOUT re-pairing the corpus.

The production monthly-recrawl path. The accumulated corpus is presumed already
deduplicated, so ``seed_index`` only builds the band/signature store from it —
one signature scan plus two parquet writes, never a self-join (and zero corpus
work when the store already exists from a previous increment or a streaming
run). Each increment then pays pairing work bounded by the LSH buckets it
actually touches (``IncrementalDedup``'s touched-bucket semi-join), never
O(corpus): at 10^12 indexed docs a 10^9-doc monthly increment shuffles ~its own
band rows plus the index rows sharing its buckets.

The store layout (``bands/`` ``sigs/`` ``matches/`` under one work dir, tiered
compaction, ``src_batch`` row tags) is shared with the streaming matcher, so
batch increments, streaming micro-batches, and this API interoperate on ONE
index: seed once, then apply increments from either mode with disjoint batch
ids.

Survivor semantics (cluster-consistent — the flagship's transitive-closure rule
scoped to the increment): connected components over the increment's accepted
edges; a component touching ANY corpus doc is already represented, so all its
new members drop; a new-only component keeps its min-id member; an increment
doc matching nothing survives. Deterministic, independent of partitioning.

Reference capability analog: the incremental partial-progress builder at
/root/reference/src/archive/MyReader2.py:16,41-42 re-runs pairwise similarity
for delta rows against the FULL frame in-process; here the corpus side is never
re-paired at all.
"""

from __future__ import annotations

import os
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession, functions as F

from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.functions.normalize import with_normalized_text
from cqaduplicatefind_spark.functions.signatures import with_signatures
from cqaduplicatefind_spark.operators.candidates import explode_bands
from cqaduplicatefind_spark.operators.connected_components import (
    connected_components,
)
from cqaduplicatefind_spark.streaming.incremental import (
    SIG_COLS,
    IncrementalDedup,
)

_EMPTY_EDGES_SCHEMA = (
    "id_a string, id_b string, jaccard double, est_jaccard double, "
    "hamming int, containment double"
)


class DeltaResult(NamedTuple):
    """Output of one increment: ``edges`` are the accepted duplicate pairs
    involving at least one increment doc (intra-increment and
    increment-vs-corpus; corpus-corpus pairs cannot form — the corpus was
    never paired); ``surviving_new`` (one ``url`` column) are the increment
    docs that enter the corpus under the cluster-consistent rule;``stats`` is
    the increment's ``IncrementalDedup`` batch-stats row (index rows joined,
    candidates, payload rows fetched — the per-increment work bound
    evidence)."""

    edges: DataFrame
    surviving_new: DataFrame
    stats: dict


def _store_dirs(work_dir: str) -> tuple[str, str, str]:
    return (
        os.path.join(work_dir, "bands"),
        os.path.join(work_dir, "sigs"),
        os.path.join(work_dir, "matches"),
    )


def signature_frame(
    pages: DataFrame,
    cfg: DedupConfig,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """pages -> (url, minhash, simhash, n_tokens, n_shingles, shingles),
    honoring ``cfg.normalize_input`` exactly like ``plans.pipeline`` (so an
    index seeded here matches signatures the flagship or the streaming path
    would compute for the same text). Docs with zero shingles are dropped —
    they can never pair and the stores stay slim (callers that need them,
    e.g. survivor selection, keep their own id frame)."""
    df = pages.select(
        F.col(id_col).cast("string").alias("url"), F.col(text_col).alias("text")
    )
    if cfg.normalize_input:
        df = with_normalized_text(df, "text", "norm_text")
    else:
        df = df.withColumn("norm_text", F.col("text"))
    return (
        with_signatures(df, cfg, "norm_text")
        .select(*SIG_COLS)
        .where(F.col("n_shingles") > 0)
    )


def seed_index(
    spark: SparkSession,
    corpus_pages: DataFrame,
    cfg: DedupConfig,
    work_dir: str,
    batch_id: int = 0,
    id_col: str = "url",
    text_col: str = "text",
) -> int:
    """Build the band + signature store from an already-deduplicated corpus
    WITHOUT pairing it. Idempotent per ``batch_id`` (overwrite-by-subdir, the
    same exactly-once discipline as the streaming path). Returns the number of
    corpus docs indexed. Cost: one signature pass over the corpus and two
    parquet writes — no shuffle wider than the writes themselves."""
    bands_dir, sigs_dir, matches_dir = _store_dirs(work_dir)
    for d in (bands_dir, sigs_dir, matches_dir):
        os.makedirs(d, exist_ok=True)
    sig = signature_frame(corpus_pages, cfg, id_col, text_col).persist()
    try:
        explode_bands(sig, cfg).withColumn(
            "src_batch", F.lit(int(batch_id)).cast("long")
        ).write.mode("overwrite").parquet(
            os.path.join(bands_dir, f"batch={batch_id}")
        )
        sig.select(*SIG_COLS).write.mode("overwrite").parquet(
            os.path.join(sigs_dir, f"batch={batch_id}")
        )
        return sig.count()
    finally:
        sig.unpersist()


def surviving_new(
    edges: DataFrame, new_ids: DataFrame, id_col: str = "url"
) -> DataFrame:
    """Apply the cluster-consistent survivor rule: components over ``edges``
    (bounded by the increment's duplicate pairs, never the corpus); any
    component containing a non-increment doc drops all its increment members;
    a new-only component keeps its min-id member; increment docs in no edge
    survive untouched. Returns one ``url`` column."""
    ids = new_ids.select(F.col(id_col).alias("url")).distinct()
    # accept_edges emits one row per undirected pair -> skip the initial dedup
    asg = connected_components(
        edges.select("id_a", "id_b"), input_distinct=True
    )
    members = asg.join(
        ids.select(F.col("url").alias("id"), F.lit(True).alias("_new")),
        "id",
        "left",
    ).withColumn("_new", F.coalesce("_new", F.lit(False)))
    verdicts = members.groupBy("cluster_id").agg(
        F.min(F.when(F.col("_new"), F.col("id"))).alias("_keep"),
        F.max(F.when(F.col("_new"), 0).otherwise(1)).alias("_has_old"),
    )
    kept_in_clusters = (
        members.join(verdicts, "cluster_id")
        .where((F.col("_has_old") == 0) & (F.col("id") == F.col("_keep")))
        .select(F.col("id").alias("url"))
    )
    untouched = ids.join(
        members.select(F.col("id").alias("url")), "url", "left_anti"
    )
    return untouched.unionByName(kept_in_clusters)


def delta_dedup(
    spark: SparkSession,
    new_pages: DataFrame,
    cfg: DedupConfig,
    work_dir: str,
    batch_id: int,
    id_col: str = "url",
    text_col: str = "text",
    compact_every: int = 16,
) -> DeltaResult:
    """Dedup one increment against the store under ``work_dir`` (seeded by
    ``seed_index`` and/or grown by previous increments / streaming batches),
    then append the increment's own bands + signatures so the NEXT increment
    sees it as corpus. ``batch_id`` must be unique per increment (replays of
    the same id are idempotent — they overwrite their own subdirs)."""
    bands_dir, sigs_dir, matches_dir = _store_dirs(work_dir)
    dedup = IncrementalDedup(
        spark, cfg, bands_dir, sigs_dir, matches_dir, compact_every=compact_every
    )
    sig = signature_frame(new_pages, cfg, id_col, text_col)
    dedup.process_batch(sig, int(batch_id))
    match_dir = os.path.join(matches_dir, f"batch={batch_id}")
    try:
        edges = spark.read.parquet(match_dir)
    except Exception:
        edges = spark.createDataFrame([], _EMPTY_EDGES_SCHEMA)
    ids = new_pages.select(F.col(id_col).cast("string").alias("url")).distinct()
    return DeltaResult(
        edges=edges,
        surviving_new=surviving_new(edges, ids),
        stats=dedup.batch_stats[-1],
    )
