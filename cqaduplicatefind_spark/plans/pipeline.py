"""The flagship dedup pipeline: pages -> normalize -> signatures -> LSH+SimHash
candidates -> exact verify -> duplicate edges -> connected-component clusters ->
metrics.

This is the Spark re-design of the reference's lifecycle B (SURVEY.md §3.2:
``BM25DuplicateRetriever.main``): corpus build + BM25 index + per-query top-10 +
pair scoring + metrics — re-expressed as six declarative stages, each optionally
checkpointed to a warehouse stage table so any stage resumes idempotently
(north_rule).

Shuffle budget (the plan you'd want at 10^12 docs):
  1. normalize+sign: narrow maps over the scan — ZERO shuffle; partition count
     follows the input splits (``cfg.signature_partitions`` repartition only when
     the source is pathologically skewed).
  2. candidates: one shuffle on band key (+ one on simhash piece key), one on the
     pair key for dedup.
  3. verify: two id-key shuffles (attach signature evidence to each pair side).
  4. clustering: O(log n) rounds over the (tiny) accepted-edge set.
  5. metrics: counts on edges/clusters — negligible.
Every stage's output is columnar-prunable; nothing materializes O(n^2).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.functions.html_strip import with_extracted_text
from cqaduplicatefind_spark.functions.normalize import with_normalized_text
from cqaduplicatefind_spark.functions.signatures import with_signatures
from cqaduplicatefind_spark.operators.candidates import (
    minhash_lsh_candidates,
    simhash_candidates,
)
from cqaduplicatefind_spark.operators.connected_components import (
    attach_singletons,
    connected_components,
)
from cqaduplicatefind_spark.operators.verify import accept_edges, score_pairs
from cqaduplicatefind_spark.sources.warehouse import Warehouse


@dataclass
class PipelineResult:
    signatures: DataFrame
    candidates: DataFrame
    scored: DataFrame
    edges: DataFrame
    clusters: DataFrame
    overlap_edges: DataFrame | None = None
    stage_metrics: dict = field(default_factory=dict)
    persisted: list = field(default_factory=list)

    def release(self) -> None:
        """Unpersist every frame run_pipeline cached (signatures, candidates,
        base edges, span edges). Call when done consuming the result — repeated
        pipeline runs in one session leak executor storage otherwise."""
        for df in self.persisted:
            df.unpersist()
        self.persisted.clear()


def normalize_stage(
    pages: DataFrame,
    cfg: DedupConfig,
    use_html: bool = False,
    group_col: str | None = None,
) -> DataFrame:
    """pages(url, [html], text, lang) -> (url, [group], norm_text). If ``use_html``
    the text column is re-extracted from html (byte-identical invariant); default
    trusts the provided text column (it must equal strip_tags(html) — verified by
    tests)."""
    df = pages
    # pandas-UDF stages parallelize over partitions; a small input (one parquet
    # file -> one split) would otherwise run the whole normalize+signature chain
    # on a single core. Hash-partition on url (deterministic under retries, unlike
    # round-robin). The width probe uses the scan's file listing first (free for
    # the parquet/Iceberg scans this stage sees in production — no RDD
    # conversion); only file-less in-memory frames (tests, bench fixtures) pay
    # the driver-side df.rdd probe, which avoids re-shuffling an input that is
    # already wide. At cluster scale input files >> target and this is a no-op.
    try:
        n_input = len(df.inputFiles())
    except Exception:
        n_input = 0
    if n_input == 0:
        n_input = df.rdd.getNumPartitions()
    if n_input < cfg.signature_partitions:
        df = df.repartition(cfg.signature_partitions, "url")
    if use_html:
        df = with_extracted_text(df, "html", "text")
    keep = ["url"] + ([group_col] if group_col else []) + ["norm_text"]
    if not cfg.normalize_input:
        # input is declared already-normalized (tokenized, single-spaced):
        # skip the reference normalization pass entirely
        return df.withColumn("norm_text", F.col("text")).select(*keep)
    return with_normalized_text(df, "text", "norm_text").select(*keep)


def signature_stage(
    normalized: DataFrame, cfg: DedupConfig, group_col: str | None = None
) -> DataFrame:
    # norm_text + span_fps ride along for the exact-span pass (fingerprint
    # explode + span verify read them from the signatures stage table); every
    # other consumer prunes them at the scan via explicit selects. With the
    # span pass OFF nobody ever reads them, and keeping norm_text (the full
    # normalized document — the widest column in the frame) would still
    # materialize it into the persisted stage cache: column pruning happens at
    # cache READS, not at the cache build (r6 optimization; the span-free and
    # html bench flavors build a signature cache ~2x slimmer).
    keep = ["url"] + ([group_col] if group_col else []) + [
        "minhash", "simhash", "n_tokens", "n_shingles", "shingles",
    ]
    if cfg.span_pass and cfg.min_overlap_span > 0:
        keep += ["span_fps", "norm_text"]
    return with_signatures(normalized, cfg, "norm_text").select(*keep)


def candidate_stage(
    signatures: DataFrame,
    cfg: DedupConfig,
    group_col: str | None = None,
    mode: str = "base",
    orphans: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs from both bucket families (MinHash LSH bands + SimHash
    pigeonhole pieces), one dedup shuffle at the end.

    ``mode="base"`` (the pipeline's first round) emits small-bucket pairs plus
    star edges tagged ``is_star``; ``mode="rescue"`` with an ``orphans`` (id)
    table emits hot-bucket salted sub-bucket pairs touching an orphan — the
    verify feedback loop documented in ``operators/candidates.py``.
    ``mode="all"`` emits everything in one shot (one-shot/standalone callers)."""
    # both sources skip their internal dedup; one dropDuplicates shuffle at the end
    g = [group_col] if group_col else []
    # docs with zero shingles (fewer than shingle_k tokens) carry the all-MAX_U64
    # sentinel MinHash and simhash=0 — identical signatures for UNRELATED docs.
    # They must be excluded from BOTH bucket explodes or every pair of short docs
    # becomes a candidate (and, in verify_evidence="estimate" mode, a false edge).
    signed = signatures.where(F.col("n_shingles") > 0)
    mh = minhash_lsh_candidates(
        signed.select("url", *g, "minhash"), cfg, dedup=False, group_col=group_col,
        mode=mode, orphans=orphans,
    )
    sh = simhash_candidates(
        signed.select("url", *g, "simhash"),
        cfg,
        dedup=False,
        group_col=group_col,
        mode=mode,
        orphans=orphans,
    )
    u = mh.unionByName(sh)
    if mode == "base":
        # keep star provenance through the dedup: a pair that is a star edge in
        # ANY bucket must orphan its endpoints if verify rejects it
        return u.groupBy("id_a", "id_b").agg(F.max("is_star").alias("is_star"))
    return u.dropDuplicates(["id_a", "id_b"])


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: DedupConfig,
    warehouse: Warehouse | None = None,
    use_html: bool = False,
    group_col: str | None = None,
    timings: dict | None = None,
) -> PipelineResult:
    """Run (or resume) the full dedup pipeline. With a warehouse, every stage is
    checkpointed + resumable; without, it's one lazy plan.

    ``group_col`` scopes candidate generation within groups (the reference's
    per-forum corpora, SURVEY U1) — one job over the union, not a driver loop;
    omit for the combined ("full") corpus run.

    ``timings`` (a dict): when given, receives ``span_extra_sec`` — the wall
    time of the span branch's work BEYOND what the span-free branch runs (the
    het-aggregate discovery job, candidate verify, and — when spans exist —
    the second components job; the one CC pass both branches share is
    excluded). This is the low-variance direct measurement of the span pass's
    cost; bench.py reports it next to the noisy full-run paired deltas."""

    persisted: list = []

    def stage(name: str, compute, reused: bool = False):
        if warehouse is None:
            df = compute()
            if reused:
                # consumed by several downstream branches (both LSH paths + both
                # verify sides): persist or the signature UDF chain recomputes 4x
                df = df.persist()
                persisted.append(df)
            return df
        return warehouse.get_or_compute(spark, name, compute)

    signatures = stage(
        "signatures",
        lambda: signature_stage(
            normalize_stage(pages, cfg, use_html, group_col), cfg, group_col
        ),
        reused=True,
    )
    candidates = stage(
        "candidate_pairs",
        lambda: candidate_stage(signatures, cfg, group_col, mode="base"),
        reused=True,  # feeds scoring AND the rescue round's orphan derivation
    )
    # is_star rides through scoring so the rescue round's orphan probe can read
    # the rejected side of the accept decision straight off the scored frame
    # (see below) instead of anti-joining two million-row frames
    has_star = "is_star" in candidates.columns  # absent: pre-upgrade checkpoint
    scored = stage(
        "scored_pairs",
        lambda: score_pairs(
            candidates, signatures, cfg, evidence=cfg.verify_evidence,
            keep_cols=("is_star",) if has_star else (),
        ),
        reused=has_star and cfg.verify_evidence == "exact",  # edges + orphan probe
    )
    edges = stage("dup_edges", lambda: accept_edges(scored, cfg), reused=True)

    # rescue round (operators/candidates.py module docstring): members of
    # MinHash-band star edges that verify REJECTED ("orphans") get salted
    # sub-bucket pairing inside their hot buckets (both bucket families) —
    # recovering true pairs a heterogeneous hot bucket's star backbone cannot
    # connect. SimHash stars carry is_star=false (hot piece buckets are noise
    # collisions; their rejections are expected, not a heterogeneity signal).
    # On homogeneous corpora (hot bands = one dup family, stars all pass) the
    # orphan set is empty and the round is skipped: the pipeline pays O(m) per
    # hot bucket, never C(m,2)/n_sub, unless verify proves a band heterogeneous.
    rescue_edges = None
    if has_star:
        if cfg.verify_evidence == "exact" and "is_star" in scored.columns:
            # evidence="exact" has no estimate prefilter, so EVERY candidate
            # pair reaches the scored frame and a rejected star edge is simply
            # a scored row failing the accept condition — one filter over the
            # persisted scored cache, no join. ("both"/"estimate" drop
            # implausible pairs before scoring; a prefiltered-away star edge is
            # also a rejection, so those modes keep the anti-join below.)
            from cqaduplicatefind_spark.operators.verify import accept_condition

            orphans = (
                scored.where(F.col("is_star") & ~accept_condition(cfg))
                .select(F.explode(F.array("id_a", "id_b")).alias("id"))
                .distinct()
            )
        else:
            orphans = (
                candidates.where(F.col("is_star"))
                .join(edges.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
                .select(F.explode(F.array("id_a", "id_b")).alias("id"))
                .distinct()
            )
        # count, not isEmpty: orphans is usually EMPTY (homogeneous corpora),
        # and take(1) on an empty frame runs its scan in several escalating
        # waves — each wave re-driving the candidate+verify mega-job's final
        # stage. count() is one wave plus a scalar agg, and it materializes
        # the persisted candidates/edges caches the rescue branch reads anyway.
        if orphans.count() > 0:
            rescue_cands = stage(
                "rescue_pairs",
                lambda: candidate_stage(
                    signatures, cfg, group_col, mode="rescue", orphans=orphans
                ).join(
                    candidates.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
                ),
            )
            rescue_edges = stage(
                "rescue_edges",
                lambda: accept_edges(
                    score_pairs(
                        rescue_cands, signatures, cfg, evidence=cfg.verify_evidence
                    ),
                    cfg,
                ),
            )
            edges = edges.unionByName(rescue_edges)

    # the suffix-array-analog stage (north_star): exact-span edges for pairs
    # sharing a contiguous run >= min_overlap_span tokens, discovered corpus-wide
    # by winnowing fingerprints (LSH never surfaces low-Jaccard containment
    # pairs). The LSH edges are clustered FIRST; span candidates whose endpoints
    # already share a cluster are dropped before the dedup shuffle and the
    # per-pair verification (they add no connectivity), so the span stage's
    # verify cost is O(genuinely-new containment pairs), not O(near-dup pairs).
    # Final clustering then runs over the (id -> cluster) assignment edges plus
    # the new span edges — the assignment graph is already near-converged, so
    # the second components job finishes in O(1) rounds.
    overlap_edges = None
    if cfg.span_pass and cfg.min_overlap_span > 0:
        from cqaduplicatefind_spark.operators.overlap import exact_span_edges

        # accept_edges output is one row per undirected pair (candidate dedup)
        # and a fresh pairing graph is never a converged star forest: skip the
        # initial dedup shuffle and the first fixed-point probe
        pre_assign = stage(
            "pre_clusters",
            lambda: connected_components(
                edges.select("id_a", "id_b"),
                assume_unconverged=True, input_distinct=True,
                persisted=persisted,
            ),
            # consumed by exact_span_edges (fingerprint-row join) AND by the
            # final clusters stage: CC's return value re-runs its
            # roots-union + groupBy-min shuffle on EVERY action, so without a
            # persist the span branch pays that assignment shuffle twice
            reused=True,
        )
        # materialize the shared assignment cache NOW, outside the span-cost
        # window: the span-free branch pays the same CC-output re-derivation
        # inside attach_singletons, so this is common-path work, and the count
        # doubles as the span stage's broadcast-vs-shuffle gate (saving it an
        # extra job)
        n_assign = pre_assign.count()
        _span_t0 = time.perf_counter()
        overlap_edges = stage(
            "overlap_edges",
            lambda: exact_span_edges(
                signatures, cfg, exclude_assignments=pre_assign,
                group_col=group_col, persisted=persisted,
                assignments_count=n_assign,
            ),
            reused=True,  # probed for emptiness below, then unioned/returned
        )
        # count, not isEmpty: the frame is persisted and consumed in full either
        # way, and on the (common) empty result take(1) runs its partition scan
        # in several escalating waves while count() is one wave + a scalar agg
        if overlap_edges.count() == 0:
            # nothing new beyond the LSH clustering: skip the second components
            # job entirely (the common case on corpora without shell-containment)
            clusters = stage(
                "clusters",
                lambda: attach_singletons(pages.select("url"), pre_assign),
            )
        else:
            # assignment stars and span edges are disjoint by construction
            # (same-cluster span pairs were excluded pre-verify), so the union
            # is already distinct; probe-first stays — span edges alone CAN be
            # a converged forest (containment pairs among otherwise-unique docs)
            all_edges = pre_assign.select(
                F.col("id").alias("id_a"), F.col("cluster_id").alias("id_b")
            ).unionByName(overlap_edges.select("id_a", "id_b"))
            clusters = stage(
                "clusters",
                lambda: attach_singletons(
                    pages.select("url"),
                    connected_components(
                        all_edges, input_distinct=True, persisted=persisted
                    ),
                ),
            )
        if timings is not None:
            # everything since _span_t0 is span-specific: the het-aggregate
            # discovery job, candidate verify, the emptiness probe, and the
            # second CC when spans exist. The pre_assign cache materialization
            # (the n_assign count above) is NOT in the window — the span-free
            # branch pays the same CC-output re-derivation inside
            # attach_singletons, so it is common-path work. The clusters stage
            # itself is lazy in the empty case, eager (CC driver loop)
            # otherwise — both correctly charged.
            timings["span_extra_sec"] = time.perf_counter() - _span_t0
    else:
        clusters = stage(
            "clusters",
            lambda: attach_singletons(
                pages.select("url"),
                connected_components(
                    edges.select("id_a", "id_b"),
                    assume_unconverged=True, input_distinct=True,
                    persisted=persisted,
                ),
            ),
        )

    stage_metrics: dict = {}
    if warehouse is not None:
        tables = ["signatures", "candidate_pairs", "scored_pairs", "dup_edges"]
        if rescue_edges is not None:
            tables.extend(["rescue_pairs", "rescue_edges"])
        if overlap_edges is not None:
            tables.extend(["pre_clusters", "overlap_edges"])
        tables.append("clusters")
        for t in tables:
            stage_metrics[t] = warehouse.manifest(t).get("row_count")

    return PipelineResult(
        signatures, candidates, scored, edges, clusters, overlap_edges,
        stage_metrics, persisted,
    )


def dedup_clusters_df(spark: SparkSession, pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Convenience: pages -> (url, cluster_id), leak-free. run_pipeline is
    EAGER (orphan probe, CC rounds) and caches several intermediates whose
    release handle lives on the PipelineResult — discarding that result would
    strand the caches for the session lifetime, so this wrapper materializes
    the clusters into a localCheckpoint (decoupling them from the caches) and
    releases everything before returning. Callers wanting the lazy
    intermediates use run_pipeline directly and call .release() themselves."""
    result = run_pipeline(spark, pages, cfg)
    clusters = result.clusters.localCheckpoint()
    result.release()
    return clusters


def retrieval_scored_pairs(result: PipelineResult, cfg: DedupConfig) -> DataFrame:
    """Scored pairs for the retrieval API: direct candidates UNION pairs implied by
    the final clusters (transitive closure). Sibling docs connected only through a
    hub (template) are retrievable this way even when their direct Jaccard sits
    below the LSH collision curve — mirroring the reference's behavior where BM25
    retrieves any lexically-close candidate (src/BM25DuplicateRetriever.py:63).
    Closure pairs are bounded by cluster sizes, so this never approaches O(n^2)."""
    from cqaduplicatefind_spark.operators.metrics import clusters_to_pairs

    closure = clusters_to_pairs(result.clusters)
    pairs = result.candidates.select("id_a", "id_b").unionByName(closure).dropDuplicates(
        ["id_a", "id_b"]
    )
    return score_pairs(pairs, result.signatures, cfg, prefilter_margin=1.0)


def cluster_summary(clusters: DataFrame) -> DataFrame:
    """Per-cluster rollup (size, members count) — the 'which pages are duplicates'
    answer shape."""
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("size"))
        .withColumn("is_duplicate_cluster", F.col("size") > 1)
    )
