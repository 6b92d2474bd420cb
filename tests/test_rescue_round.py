"""The verify-driven rescue round's cost/recall contract.

Base candidates are small-bucket pairs + star edges; salted sub-bucket pairing
inside hot buckets runs ONLY when exact-verify rejects a MinHash star edge
(a heterogeneous hot bucket). Contract pinned here:

- homogeneous corpora (hot buckets = one duplicate family) trigger NO rescue
  round — the pipeline pays O(m) per hot bucket, observable as the absence of
  the rescue_* warehouse stage tables;
- a heterogeneous hot bucket (two duplicate sub-families colliding in shared
  bands, cross-family similarity below threshold) DOES trigger it, and the
  final clusters keep each sub-family intact;
- rescue candidates never re-verify a base-round pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.plans.pipeline import run_pipeline
from cqaduplicatefind_spark.sources.warehouse import Warehouse


def _cfg(**kw):
    base = dict(shingle_k=3, jaccard_threshold=0.9, max_band_group=4,
                shuffle_partitions=8, signature_partitions=8, span_pass=False)
    base.update(kw)
    return DedupConfig(**base)


def _hetero_pages(spark, copies: int = 12):
    """Two sub-families of identical copies sharing ~82% of their tokens:
    cross-family Jaccard ~0.82 puts them in shared (hot) LSH bands but below
    the 0.9 threshold, so cross-family star edges are rejected by verify."""
    shared = " ".join(f"w{j}" for j in range(180))
    a_text = shared + " " + " ".join(f"aonly{j}" for j in range(20))
    b_text = shared + " " + " ".join(f"bonly{j}" for j in range(20))
    rows = [(f"a{i:02d}", a_text) for i in range(copies)]
    rows += [(f"b{i:02d}", b_text) for i in range(copies)]
    return spark.createDataFrame(rows, "url string, text string")


def test_homogeneous_hot_bucket_skips_rescue(spark, tmp_path):
    """One 60-member duplicate family: every band bucket is hot, all star edges
    pass verify, so the rescue round must not materialize (no rescue_* stage
    tables) and the family still forms one cluster."""
    text = "every page in this family shares the exact same body " + " ".join(
        f"w{j}" for j in range(40)
    )
    pages = spark.createDataFrame(
        [(f"u{i:03d}", text) for i in range(60)], "url string, text string"
    )
    cfg = _cfg()
    wh = Warehouse(str(tmp_path / "wh"), cfg.fingerprint())
    result = run_pipeline(spark, pages, cfg, warehouse=wh)
    sizes = result.clusters.groupBy("cluster_id").count().collect()
    assert len(sizes) == 1 and sizes[0]["count"] == 60
    assert not wh.exists("rescue_pairs"), "rescue ran on a homogeneous corpus"
    assert not wh.exists("rescue_edges")
    assert "rescue_pairs" not in result.stage_metrics


def test_heterogeneous_hot_bucket_triggers_rescue(spark, tmp_path):
    """Cross-family star edges in the shared hot bands fail verify -> non-empty
    orphan set -> the rescue round materializes; each sub-family stays one
    intact cluster and the families do not merge."""
    pages = _hetero_pages(spark)
    cfg = _cfg()
    wh = Warehouse(str(tmp_path / "wh"), cfg.fingerprint())
    result = run_pipeline(spark, pages, cfg, warehouse=wh)
    assert wh.exists("rescue_pairs"), "expected a rescue round on rejected stars"
    assert wh.exists("rescue_edges")
    clusters = {r["url"]: r["cluster_id"] for r in result.clusters.collect()}
    a_clusters = {v for k, v in clusters.items() if k.startswith("a")}
    b_clusters = {v for k, v in clusters.items() if k.startswith("b")}
    assert len(a_clusters) == 1, f"sub-family A split: {a_clusters}"
    assert len(b_clusters) == 1, f"sub-family B split: {b_clusters}"
    assert a_clusters != b_clusters, "families merged despite sub-threshold J"


def test_rescue_does_not_duplicate_base_pairs(spark, tmp_path):
    """Rescue candidates are anti-joined against the base round: no pair is
    verified twice (the rescue_pairs stage table is disjoint from
    candidate_pairs)."""
    pages = _hetero_pages(spark)
    cfg = _cfg()
    wh = Warehouse(str(tmp_path / "wh"), cfg.fingerprint())
    run_pipeline(spark, pages, cfg, warehouse=wh)
    assert wh.exists("rescue_pairs")
    base = wh.read(spark, "candidate_pairs").select("id_a", "id_b")
    rescue = wh.read(spark, "rescue_pairs").select("id_a", "id_b")
    assert rescue.count() > 0
    assert rescue.join(base, ["id_a", "id_b"], "left_semi").count() == 0
