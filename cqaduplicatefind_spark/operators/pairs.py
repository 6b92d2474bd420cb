"""Labeled-pair dataset generation — the reference's training-CSV builder recast as
one declarative job.

Reference semantics (``/root/reference/src/JsonToCsvConverter.py:80-134``):
for every document that has gold duplicates, emit 1 positive pair (doc, first gold
dup) and ``negatives_per_positive`` (=2, ``:84``) negative pairs, where negatives are
checked against the gold relation symmetrically (``check_dup``, ``:17-22``) — here a
left anti-join against the gold edge table. Texts are normalized
(title+body -> ``review_to_wordlist(strip_tags(.))``, ``:92-101``); our docs carry
one text column, already normalized upstream.

Spark redesign: no Python loops or positional cursors — positives via an ordered
dedup (min dst per src), negatives via a deterministic rank-pairing (row_number over
a seeded-hash order) + anti-join, so the job is a fixed number of shuffles at any
scale and fully reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def gold_edges_from_dups(docs: DataFrame, id_col: str = "url",
                         dups_col: str = "dups") -> DataFrame:
    """docs(id, dups:array<id>) -> canonical symmetric edge table (src < dst).
    The reference's ground-truth encoding (per-question dups lists) exploded."""
    e = docs.select(
        F.col(id_col).alias("a"), F.explode(dups_col).alias("b")
    )
    return (
        e.select(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"))
        .where(F.col("src") < F.col("dst"))
        .distinct()
    )


def labeled_pairs(
    docs: DataFrame,
    gold_edges: DataFrame,
    negatives_per_positive: int = 2,
    seed: int = 42,
    id_col: str = "url",
    text_col: str = "norm_text",
) -> DataFrame:
    """-> (q1_id, q1, q2_id, q2, dup) with dup ratio 1:negatives_per_positive.

    Positives: for every doc with >= 1 gold dup, its smallest gold partner
    (the reference takes the first dup, ``:97-98``; min = deterministic analog).
    Negatives: docs paired by deterministic pseudo-random rank (seeded hash order,
    front-to-back vs back-to-front — the reference pairs a forward cursor with a
    mirrored cursor, ``:118-119``), anti-joined against gold edges (``check_dup``).
    """
    d = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    sym = gold_edges.select("src", "dst").unionByName(
        gold_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # positive: min partner per source doc
    pos = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("dst"))
        .select(F.col("src").alias("q1_id"), F.col("dst").alias("q2_id"))
        .withColumn("dup", F.lit(1))
    )
    n_pos = pos.count()

    # negative pool: docs with no gold dups (reference's non_dup_rows, :148-152).
    # Deterministic pseudo-random GLOBAL rank without a single-partition window
    # (row_number over an unpartitioned ORDER BY pulls every row through one
    # task): hash rows into B buckets, rank within each bucket in parallel, then
    # add per-bucket offsets (B scalar rows collected to the driver). The total
    # order is (bucket, hash, id) — seeded, reproducible, partition-independent.
    n_buckets = 64
    dup_ids = sym.select(F.col("src").alias("id")).distinct()
    h = F.xxhash64(F.col("id"), F.lit(seed))
    non_dup = (
        d.join(dup_ids, "id", "left_anti")
        .withColumn("_h", h)
        .withColumn("_b", F.pmod(h, F.lit(n_buckets)))
    )
    bw = Window.partitionBy("_b").orderBy("_h", "id")
    local = non_dup.withColumn("_lr", F.row_number().over(bw))
    sizes = {
        r["_b"]: r["n"]
        for r in non_dup.groupBy("_b").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += sizes.get(b, 0)
    n_non = acc
    off_map = F.create_map(
        *[F.lit(x) for b_off in offsets.items() for x in b_off]
    )
    ordered = local.withColumn("r", F.col("_lr") + off_map[F.col("_b")]).drop(
        "_h", "_b", "_lr"
    )
    need = n_pos * negatives_per_positive
    fwd = ordered.where(F.col("r") <= need).select(
        F.col("id").alias("q1_id"), F.col("r").alias("k")
    )
    bwd = ordered.select(
        F.col("id").alias("q2_id"), (F.lit(n_non + 1) - F.col("r")).alias("k")
    )
    neg = (
        fwd.join(bwd, "k")
        .where(F.col("q1_id") != F.col("q2_id"))
        .select("q1_id", "q2_id")
        .withColumn("dup", F.lit(0))
    )
    # reference's check_dup: drop sampled pairs that are secretly gold (symmetric)
    neg = neg.join(
        gold_edges.select(
            F.col("src").alias("q1_id"), F.col("dst").alias("q2_id")
        ).unionByName(
            gold_edges.select(
                F.col("dst").alias("q1_id"), F.col("src").alias("q2_id")
            )
        ),
        ["q1_id", "q2_id"],
        "left_anti",
    )

    pairs = pos.unionByName(neg)
    t1 = d.select(F.col("id").alias("q1_id"), F.col("text").alias("q1"))
    t2 = d.select(F.col("id").alias("q2_id"), F.col("text").alias("q2"))
    return pairs.join(t1, "q1_id").join(t2, "q2_id").select(
        "q1_id", "q1", "q2_id", "q2", "dup"
    )


def train_test_split(
    pairs: DataFrame, train_fraction: float = 0.75, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """The reference's model_selection.train_test_split analog
    (src/DataSetUtil.py:34-46): seeded random split of the labeled pair table."""
    train, test = pairs.randomSplit([train_fraction, 1.0 - train_fraction], seed=seed)
    return train, test
