"""End-to-end pipeline correctness: the BASELINE.json acceptance gate.

- dup-pair recall >= 0.99 vs gold edges (pairs implied by predicted clusters)
- exact cluster-assignment match vs gold at the fixed shingle/signature config
- LSH candidates vs a brute-force all-pairs exact-Jaccard oracle (the reference's
  archive semantics, src/archive/MyReader.py:17-27) on the tiny fixture
- determinism: identical clusters under different input partitioning
"""

import pytest
from pyspark.sql import functions as F

from cqaduplicatefind_spark.operators.candidates import all_pairs
from cqaduplicatefind_spark.operators.metrics import (
    cluster_exact_match,
    clusters_to_pairs,
    pair_recall,
)
from cqaduplicatefind_spark.operators.verify import score_pairs
from cqaduplicatefind_spark.plans.pipeline import (
    cluster_summary,
    normalize_stage,
    run_pipeline,
    signature_stage,
)


@pytest.fixture(scope="module")
def tiny_run(spark, tiny_fixture, cfg):
    pages, edges, clusters = tiny_fixture
    return run_pipeline(spark, pages, cfg), pages, edges, clusters


def test_recall_against_gold_edges(tiny_run):
    result, pages, gold_edges, _ = tiny_run
    predicted_pairs = clusters_to_pairs(result.clusters)
    row = pair_recall(predicted_pairs, gold_edges).collect()[0]
    assert row.recall >= 0.99, row.asDict()


def test_exact_cluster_match(tiny_run):
    result, _, _, gold_clusters = tiny_run
    assert cluster_exact_match(result.clusters, gold_clusters)


def test_precision_no_cross_cluster_merges(tiny_run):
    result, _, gold_edges, _ = tiny_run
    predicted_pairs = clusters_to_pairs(result.clusters)
    row = pair_recall(predicted_pairs, gold_edges).collect()[0]
    assert row.precision >= 0.99, row.asDict()


def test_small_fixture_recall_and_match(spark, small_fixture, cfg):
    pages, gold_edges, gold_clusters = small_fixture
    result = run_pipeline(spark, pages, cfg)
    predicted_pairs = clusters_to_pairs(result.clusters)
    row = pair_recall(predicted_pairs, gold_edges).collect()[0]
    assert row.recall >= 0.99, row.asDict()
    assert cluster_exact_match(result.clusters, gold_clusters)


def test_lsh_candidates_vs_bruteforce_oracle(spark, tiny_fixture, cfg):
    """Every pair with exact Jaccard >= threshold must be produced as a candidate
    (LSH probabilistic recall at this (b, r) and J >= 0.8 is ~1-1e-7 per pair)."""
    pages, _, _ = tiny_fixture
    signatures = signature_stage(normalize_stage(pages, cfg), cfg).cache()
    brute = all_pairs(signatures)
    brute_scored = score_pairs(brute, signatures, cfg, prefilter_margin=1.0)
    truly_dup = brute_scored.where(F.col("jaccard") >= cfg.jaccard_threshold)

    from cqaduplicatefind_spark.plans.pipeline import candidate_stage

    cands = candidate_stage(signatures, cfg)
    missed = truly_dup.join(cands, ["id_a", "id_b"], "left_anti").count()
    total = truly_dup.count()
    assert total > 0
    assert missed == 0, f"LSH missed {missed}/{total} true dup pairs"


def test_determinism_under_partitioning(spark, tiny_fixture, cfg):
    pages, _, _ = tiny_fixture
    r1 = run_pipeline(spark, pages.repartition(1), cfg)
    r2 = run_pipeline(spark, pages.repartition(13), cfg)
    c1 = sorted((r.url, r.cluster_id) for r in r1.clusters.collect())
    c2 = sorted((r.url, r.cluster_id) for r in r2.clusters.collect())
    assert c1 == c2


def test_cluster_summary_shape(tiny_run):
    result, pages, _, _ = tiny_run
    summary = cluster_summary(result.clusters)
    total = summary.agg(F.sum("size")).collect()[0][0]
    assert total == pages.count()
