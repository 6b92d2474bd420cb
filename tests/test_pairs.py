"""Labeled-pair generation: ratio control, anti-join purity, determinism."""

from pyspark.sql import functions as F

from cqaduplicatefind_spark.operators.pairs import (
    gold_edges_from_dups,
    labeled_pairs,
    train_test_split,
)


def _docs(spark):
    rows = [
        # id, text, dups
        ("d01", "alpha beta gamma", ["d02"]),
        ("d02", "alpha beta gamma delta", ["d01"]),
        ("d03", "epsilon zeta eta", ["d04", "d05"]),
        ("d04", "epsilon zeta eta theta", ["d03"]),
        ("d05", "epsilon zeta iota", ["d03"]),
    ] + [(f"n{i:02d}", f"unique text number {i}", []) for i in range(20)]
    return spark.createDataFrame(
        rows, "url string, norm_text string, dups array<string>"
    )


def test_gold_edges_exploded_canonical(spark):
    docs = _docs(spark)
    edges = gold_edges_from_dups(docs)
    got = {(r.src, r.dst) for r in edges.collect()}
    assert got == {("d01", "d02"), ("d03", "d04"), ("d03", "d05")}


def test_ratio_and_purity(spark):
    docs = _docs(spark)
    gold = gold_edges_from_dups(docs)
    pairs = labeled_pairs(docs, gold, negatives_per_positive=2)
    rows = pairs.collect()
    pos = [r for r in rows if r.dup == 1]
    neg = [r for r in rows if r.dup == 0]
    # one positive per doc with >= 1 gold dup (5 such docs)
    assert len(pos) == 5
    # ~2 negatives per positive (mirror-cursor self-pairs may trim a couple)
    assert len(neg) >= len(pos)
    # purity: no negative pair is secretly gold
    gold_set = {(r.src, r.dst) for r in gold.collect()}
    for r in neg:
        a, b = sorted((r.q1_id, r.q2_id))
        assert (a, b) not in gold_set
    # texts attached correctly
    by_id = {r.url: r.norm_text for r in docs.collect()}
    for r in rows:
        assert r.q1 == by_id[r.q1_id]
        assert r.q2 == by_id[r.q2_id]


def test_anchored_negative_class_and_no_mirror_duplicates(spark):
    """The reference emits one negative per positive anchored on the dup
    question itself (JsonToCsvConverter.py:106-115) plus pool negatives
    between two non-dup docs (:118-130): every positive's q1 must appear in
    at least one negative, and no unordered negative pair may repeat (the
    old literal mirror pairing re-emitted pairs once need > n_non/2)."""
    docs = _docs(spark)  # 5 dup docs, 20-doc pool; need=5 pool negatives
    gold = gold_edges_from_dups(docs)
    rows = labeled_pairs(docs, gold, negatives_per_positive=2).collect()
    pos_q1 = {r.q1_id for r in rows if r.dup == 1}
    neg = [r for r in rows if r.dup == 0]
    anchored_q1 = {r.q1_id for r in neg if r.q1_id in pos_q1}
    assert anchored_q1 == pos_q1  # each dup doc anchors a negative
    unordered = [tuple(sorted((r.q1_id, r.q2_id))) for r in neg]
    assert len(unordered) == len(set(unordered))  # no mirror duplicates
    # stress the mirror regime: demand close to the pool size
    rows4 = labeled_pairs(docs, gold, negatives_per_positive=4).collect()
    neg4 = [tuple(sorted((r.q1_id, r.q2_id))) for r in rows4 if r.dup == 0]
    assert len(neg4) == len(set(neg4))


def test_deterministic(spark):
    docs = _docs(spark)
    gold = gold_edges_from_dups(docs)
    a = sorted(map(tuple, labeled_pairs(docs, gold).collect()))
    b = sorted(map(tuple, labeled_pairs(docs, gold).collect()))
    assert a == b


def test_train_test_split_partition(spark):
    docs = _docs(spark)
    gold = gold_edges_from_dups(docs)
    pairs = labeled_pairs(docs, gold).cache()
    train, test = train_test_split(pairs, 0.75, seed=7)
    n, tr, te = pairs.count(), train.count(), test.count()
    assert tr + te == n
    # split is disjoint
    assert train.intersect(test).count() == 0


def test_labeled_pairs_no_single_partition_exchange(spark, tiny_fixture):
    """The negative-sampling rank must be distributed: an unpartitioned
    row_number window would plan Exchange SinglePartition and pull every
    non-dup doc through one task."""
    from cqaduplicatefind_spark.operators.pairs import gold_edges_from_dups, labeled_pairs

    pages, gold, _ = tiny_fixture
    docs = pages.select("url", F.col("text").alias("norm_text"))
    pairs = labeled_pairs(docs, gold)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


def test_tiny_pool_n_non_2_no_duplicate_negatives(spark):
    """With exactly 2 non-dup docs no cyclic offset avoids mirroring
    (2o ≡ 0 mod 2 for every o): ranks 1 and 2 would emit the same unordered
    pool pair twice. The canonicalize-and-dedup branch must collapse it to
    one labeled row."""
    rows = [
        ("d01", "alpha beta gamma", ["d02"]),
        ("d02", "alpha beta gamma delta", ["d01"]),
        ("n01", "unique text one", []),
        ("n02", "unique text two", []),
    ]
    docs = spark.createDataFrame(
        rows, "url string, norm_text string, dups array<string>"
    )
    gold = gold_edges_from_dups(docs)
    # negatives_per_positive=4 -> need = 2*(4-1) = 6 >= 2: both pool ranks emit
    out = labeled_pairs(docs, gold, negatives_per_positive=4).collect()
    neg = [r for r in out if r.dup == 0]
    unordered = [tuple(sorted((r.q1_id, r.q2_id))) for r in neg]
    assert len(unordered) == len(set(unordered)), unordered
    # the n01-n02 pool pair survives exactly once
    assert unordered.count(("n01", "n02")) == 1
