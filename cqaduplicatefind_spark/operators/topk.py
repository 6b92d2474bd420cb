"""Top-k retrieval per query — the reference's flagship API shape.

Reference: BM25 top-10 per query (``/root/reference/src/BM25DuplicateRetriever.py:63``)
re-ranked by pair score (``:73-77``); Doc2Vec ``most_similar(topn=10)``
(``src/DuplicateRetriever.py:47``). Here: the scored candidate-pair DataFrame is
symmetrized (each pair serves both directions, mirroring the reference's
query->candidate orientation), ranked per query by a pluggable score column, and
truncated with a window ``row_number() <= k`` — the distributed top-k that never
materializes a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def symmetrize_scored(scored: DataFrame, score_col: str = "jaccard") -> DataFrame:
    """(id_a, id_b, score...) -> (query_id, candidate_id, score), both directions."""
    fwd = scored.select(
        F.col("id_a").alias("query_id"),
        F.col("id_b").alias("candidate_id"),
        F.col(score_col).alias("score"),
    )
    rev = scored.select(
        F.col("id_b").alias("query_id"),
        F.col("id_a").alias("candidate_id"),
        F.col(score_col).alias("score"),
    )
    return fwd.unionByName(rev)


def topk_per_query(
    ranked: DataFrame, k: int = 10, query_col: str = "query_id",
    score_col: str = "score", candidate_col: str = "candidate_id",
) -> DataFrame:
    """Window top-k: rank desc by score, deterministic tie-break on candidate id.
    Shuffles once on query_id; each partition sorts locally (no global sort)."""
    w = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.asc(candidate_col)
    )
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def retrieve_duplicates(
    scored: DataFrame, k: int = 10, score_col: str = "jaccard"
) -> DataFrame:
    """The reference's retrieval answer shape: for every document, its top-k most
    similar candidates with scores and ranks."""
    return topk_per_query(symmetrize_scored(scored, score_col), k)


def canonical_per_cluster(
    clusters: DataFrame,
    scores: DataFrame,
    score_col: str,
    id_col: str = "url",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One representative document per duplicate cluster — the step that emits
    the DEDUPLICATED corpus after clustering: keep the member with the highest
    ``score_col`` (ties broken by smallest id, a total order), singletons keep
    themselves. Output: (cluster_id, url, <score_col>, n_members).

    Deliberately an AGGREGATE, not a window: ``row_number() over (partition by
    cluster_id)`` funnels each cluster into ONE task, and at web scale a
    boilerplate cluster can hold 10^7 members — a single-task sort. ``min_by``
    over the composite ordering (-score, id) is a hash aggregate with map-side
    partial combine, so a hot cluster's members reduce locally on every input
    partition and only one candidate row per (partition, cluster) crosses the
    shuffle. The composite struct makes the winner unique, so min_by's
    tie-behavior never matters.

    Members with no score row (left join) or a NULL score still count in
    ``n_members`` and rank LAST for representative selection (+inf ordering
    key) — an unscored doc can only represent a cluster nothing else scored;
    a cluster is never silently dropped from the deduplicated corpus.
    ``n_members`` is aggregated from the CLUSTERS side alone (one row per
    member by contract), never from the joined rows — a scores side carrying
    several rows per id (a per-pair or multi-metric frame) fans out the join
    but cannot inflate the member count, and the count aggregate keeps its
    plain map-side-combined shape instead of the multi-pass plan a distinct
    count over the join would need; the representative is then the member's
    best-scoring row, which is the sensible reading."""
    members = clusters.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_cid")
    )
    joined = members.join(
        scores.select(F.col(id_col).alias("_id"), F.col(score_col)), "_id", "left"
    )
    order_key = F.coalesce((-F.col(score_col)).cast("double"), F.lit(float("inf")))
    rep = F.min_by(
        F.struct(F.col("_id"), F.col(score_col)),
        F.struct(order_key.alias("neg_score"), F.col("_id").alias("id")),
    )
    sizes = members.groupBy("_cid").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        joined.groupBy("_cid")
        .agg(rep.alias("_rep"))
        .join(sizes, "_cid")  # two one-row-per-cluster frames
        .select(
            F.col("_cid").alias(cluster_col),
            F.col(f"_rep._id").alias(id_col),
            F.col(f"_rep.{score_col}").alias(score_col),
            "n_members",
        )
    )
