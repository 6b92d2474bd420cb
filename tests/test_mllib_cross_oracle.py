"""Second-opinion oracle (SURVEY §5.2): Spark MLlib's MinHashLSH
``approxSimilarityJoin`` — an independent MinHash implementation — must agree
with the engine's duplicate edges at the same Jaccard threshold on a fixture
whose similarities sit far from the threshold on both sides."""

from __future__ import annotations

from pyspark.sql import functions as F

from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.plans.pipeline import normalize_stage, run_pipeline


def test_engine_edges_match_mllib_minhash_lsh(spark):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    # 10 triples of near-identical docs (pairwise Jaccard >> 0.7) + unrelated
    # filler (pairwise Jaccard << 0.7): both implementations must find exactly
    # the 10 * C(3,2) = 30 edges
    rows = []
    for t in range(10):
        base = [f"grp{t}word{j}" for j in range(30)]
        rows.append((f"t{t}a", " ".join(base)))
        rows.append((f"t{t}b", " ".join(base + [f"extraB{t}"])))
        rows.append((f"t{t}c", " ".join(base + [f"extraC{t}"])))
    for u in range(10):
        rows.append((f"x{u}", " ".join(f"solo{u}tok{j}" for j in range(30))))
    pages = spark.createDataFrame(rows, "url string, text string")

    cfg = DedupConfig(
        shingle_k=3, jaccard_threshold=0.7, span_pass=False,
        shuffle_partitions=8, signature_partitions=8,
    )
    engine_edges = {
        (r.id_a, r.id_b)
        for r in run_pipeline(spark, pages, cfg).edges.select("id_a", "id_b").collect()
    }

    # independent path: 3-gram shingle STRINGS over the same normalized text ->
    # binary count vectors -> MLlib MinHashLSH -> exact-Jaccard-distance join
    norm = normalize_stage(pages, cfg)
    shingled = norm.select(
        "url",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(F.split("norm_text", " ")) - cfg.shingle_k),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split("norm_text", " "), i + 1, cfg.shingle_k)
                ),
            )
        ).alias("shingles"),
    )
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True
    ).fit(shingled)
    feats = cv.transform(shingled)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=16, seed=7
    ).fit(feats)
    joined = lsh.approxSimilarityJoin(
        feats, feats, 1.0 - cfg.jaccard_threshold, distCol="dist"
    )
    mllib_edges = {
        (a, b) if a < b else (b, a)
        for a, b in (
            (r["datasetA"]["url"], r["datasetB"]["url"])
            for r in joined.collect()
        )
        if a != b
    }

    expected = {
        tuple(sorted((f"t{t}{x}", f"t{t}{y}")))
        for t in range(10)
        for x, y in (("a", "b"), ("a", "c"), ("b", "c"))
    }
    assert engine_edges == expected
    assert mllib_edges == expected
