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

    Negatives reproduce BOTH of the reference's negative classes, cursor-free:

    - one **query-anchored** negative per positive — the dup question itself
      paired with a non-dup doc (``:106-115``: ``(dupRow, non_dup_rows[cursor])``).
      Without this class no negative ever contains a dup-carrying doc and the
      training distribution has no hard negatives anchored on query docs;
    - ``negatives_per_positive - 1`` **pool** negatives pairing two non-dup
      docs far apart in a seeded pseudo-random order (``:118-119`` pairs a
      forward cursor with an end cursor; here rank j pairs rank j + ~n/2
      cyclically, which keeps the far-apart spirit and — unlike a literal
      mirror pairing — never emits the same unordered pair twice while
      ``need`` <= n_non; pools of <= 2 non-dup docs, where no cyclic offset
      can avoid mirroring, are canonicalized and deduped instead).

    All negatives are anti-joined against gold edges (``check_dup``, symmetric).
    A pool smaller than the demand under-delivers gracefully (ranks wrap for
    the anchored class; pool pairs stop at n_non) — the reference would
    IndexError there.
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

    # Deterministic pseudo-random GLOBAL rank without a single-partition window
    # (row_number over an unpartitioned ORDER BY pulls every row through one
    # task): hash rows into B buckets, rank within each bucket in parallel, then
    # add per-bucket offsets (B scalar rows collected to the driver). The total
    # order is (bucket, hash, id) — seeded, reproducible, partition-independent.
    n_buckets = 64

    def _ranked(frame: DataFrame) -> tuple[DataFrame, int]:
        h = F.xxhash64(F.col("id"), F.lit(seed))
        bucketed = frame.withColumn("_h", h).withColumn(
            "_b", F.pmod(h, F.lit(n_buckets))
        )
        bw = Window.partitionBy("_b").orderBy("_h", "id")
        local = bucketed.withColumn("_lr", F.row_number().over(bw))
        sizes = {
            r["_b"]: r["n"]
            for r in bucketed.groupBy("_b").agg(F.count("*").alias("n")).collect()
        }
        offsets, acc = {}, 0
        for b in range(n_buckets):
            offsets[b] = acc
            acc += sizes.get(b, 0)
        off_map = F.create_map(
            *[F.lit(x) for b_off in offsets.items() for x in b_off]
        )
        ranked = local.withColumn("r", F.col("_lr") + off_map[F.col("_b")]).drop(
            "_h", "_b", "_lr"
        )
        return ranked, acc

    # negative pool: docs with no gold dups (reference's non_dup_rows, :148-152)
    dup_ids = sym.select(F.col("src").alias("id")).distinct()
    ordered, n_non = _ranked(d.join(dup_ids, "id", "left_anti").select("id"))

    # anchored class: dup doc at rank r pairs the non-dup doc at rank
    # ((r-1) mod n_non) + 1 — one per positive, wrapping on small pools
    dup_ranked, _ = _ranked(pos.select(F.col("q1_id").alias("id")))
    anchored = (
        dup_ranked.select(
            F.col("id").alias("q1_id"),
            (F.pmod(F.col("r") - 1, F.lit(max(n_non, 1))) + 1).alias("k"),
        )
        .join(ordered.select(F.col("id").alias("q2_id"), F.col("r").alias("k")), "k")
        .select("q1_id", "q2_id")
    )

    # pool class: rank j pairs rank ((j-1+o) mod n_non)+1 with o ~ n_non/2
    # (o chosen so 2o != 0 mod n_non where possible — a literal mirror
    # pairing re-emits every unordered pair once need exceeds n_non/2)
    need = n_pos * max(negatives_per_positive - 1, 0)
    o = max(1, n_non // 2 - 1)
    fwd = ordered.where(F.col("r") <= need).select(
        F.col("id").alias("q1_id"),
        (F.pmod(F.col("r") - 1 + o, F.lit(max(n_non, 1))) + 1).alias("k"),
    )
    bwd = ordered.select(F.col("id").alias("q2_id"), F.col("r").alias("k"))
    pool = fwd.join(bwd, "k").select("q1_id", "q2_id")
    if 0 < n_non <= 2:
        # With n_non <= 2 every offset is self-inverse mod n_non (2o ≡ 0), so
        # the cyclic pairing emits each unordered pair from both ends and the
        # no-repeat guarantee above cannot hold. Canonicalize (lower id first
        # — deterministic, partition-independent) and keep one.
        pool = (
            pool.select(
                F.least("q1_id", "q2_id").alias("_lo"),
                F.greatest("q1_id", "q2_id").alias("_hi"),
            )
            .distinct()
            .select(F.col("_lo").alias("q1_id"), F.col("_hi").alias("q2_id"))
        )

    neg = (
        anchored.unionByName(pool)
        .where(F.col("q1_id") != F.col("q2_id"))
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
