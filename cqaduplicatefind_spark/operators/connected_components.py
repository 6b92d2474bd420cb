"""Iterative large-star/small-star connected components over the candidate-edge
DataFrame (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14).

The reference encodes duplicate groups only as per-question ``dups`` lists
(``/root/reference/src/JsonToCsvConverter.py:17-22``); cluster resolution is the new
capability the north_rule mandates. Canonical cluster id = min node id in the
component (FIXTURES.md).

Spark-first design notes:

- No ``collect_list``: star operations are expressed as groupBy-min + join, so a
  giant component never materializes a giant array in one task.
- The driver loop iterates O(log n) rounds; each round ``localCheckpoint``s the edge
  set to cut lineage (otherwise the plan doubles every round and kills the driver —
  the standard Spark iterative-algorithm trap).
- Convergence test is a direct fixed-point check (star forest: no edge target is
  also a source — one semi-join per round), so the loop never pays a full
  confirmation round after the edge set stabilizes.
- Deterministic under any partitioning/parallelism: every transform is min/union
  based, so local[8] and local[32] produce identical assignments (BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to min(N(u) ∪ {u})."""
    sym = edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).unionAll(
        edges.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("id_a"), F.col("m").alias("id_b"))
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high->low; for each node u: connect u and all smaller neighbors
    to the smallest of them."""
    down = edges.select(
        F.greatest("id_a", "id_b").alias("u"), F.least("id_a", "id_b").alias("v")
    )
    mins = down.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        down.join(mins, "u")
        .select(F.col("v").alias("id_a"), F.col("m").alias("id_b"))
        .unionAll(mins.select(F.col("u").alias("id_a"), F.col("m").alias("id_b")))
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    return out


def _is_star_forest(edges: DataFrame) -> bool:
    """True iff the edge set is in converged assignment form (member ->
    component-min stars) — exactly the large-star/small-star fixed point:

    1. every edge points larger -> smaller (id_a > id_b),
    2. every source has exactly one outgoing edge (it's a function), and
    3. no target is also a source (stars, not chains).

    Together these force each component to be a star whose root is its minimum
    (the root is smaller than every member by 1+3), and such a star is mapped
    to itself by both operators. All three checks fold into ONE job (a
    per-node in/out-degree aggregation over the symmetrized projection + a
    scalar count): the probe runs once per round, and job-launch latency is
    pure constant driver overhead that dilutes multi-core scaling — the
    previous 3-probe formulation (narrow filter + groupBy + semi-join) cost
    3 jobs per round. Still far cheaper than the classical convergence
    protocol of running one extra full round (~6 exchanges) and comparing
    checksums."""
    stats = (
        edges.select(
            F.col("id_a").alias("n"),
            F.lit(1).alias("out_deg"),
            F.lit(0).alias("in_deg"),
            (F.col("id_a") < F.col("id_b")).cast("int").alias("misoriented"),
        )
        .unionAll(
            edges.select(F.col("id_b"), F.lit(0), F.lit(1), F.lit(0))
        )
        .groupBy("n")
        .agg(
            F.sum("out_deg").alias("out_deg"),
            F.sum("in_deg").alias("in_deg"),
            F.max("misoriented").alias("misoriented"),
        )
    )
    violations = stats.where(
        (F.col("misoriented") == 1)
        | (F.col("out_deg") > 1)
        | ((F.col("out_deg") > 0) & (F.col("in_deg") > 0))
    )
    return violations.count() == 0


def _persistent_rdd_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def _unpersist_rdd_ids(spark, ids) -> None:
    """Free block-manager storage for the given RDD ids (non-blocking). Used to
    drop superseded localCheckpoint rounds — without this, every CC round's
    checkpoint blocks stay pinned until a driver full GC, and a long session
    (streaming incremental dedup, repeated pipeline runs) degrades as the heap
    balloons into kernel page-fault storms."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist(False)


class CheckpointHandle:
    """``unpersist()``-compatible handle that releases localCheckpoint RDD
    blocks by id. Rides ``PipelineResult.persisted`` next to cached frames —
    ``release()`` duck-types on ``unpersist()``. Needed because
    ``DataFrame.unpersist()`` does NOT free localCheckpoint blocks (it only
    uncaches cacheManager entries); after the handle fires, frames derived
    from the checkpoint can no longer be recomputed — callers release only
    when done consuming."""

    def __init__(self, spark, rdd_ids) -> None:
        self._spark = spark
        self._ids = set(rdd_ids)

    def unpersist(self) -> None:
        _unpersist_rdd_ids(self._spark, self._ids)
        self._ids = set()


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    assume_unconverged: bool = False,
    input_distinct: bool = False,
    persisted: list | None = None,
) -> DataFrame:
    """edges(id_a, id_b) -> assignments(id, cluster_id) for every node that appears
    in an edge. cluster_id = min node id in the component. Callers attach singletons
    with a left join + coalesce (see ``plans.pipeline``).

    ``assume_unconverged=True`` runs the first large/small-star round before the
    first fixed-point probe. Tradeoff, not a free win: a raw pairing graph with
    any duplicate family of 3+ docs fails the probe, so probing first adds one
    full-edge-set shuffle of driver-sequential latency per run — but a corpus
    whose accepted edges are ALL disjoint 2-doc pairs (or empty) is already a
    star forest after canonicalization, and skipping the probe costs it one
    wasted star round. Web dedup corpora are family-heavy, so the flagship
    callers opt in; callers re-clustering prior assignments keep the default
    probe-first order and converge in zero rounds. ``input_distinct=True`` skips the initial
    dedup shuffle — correct when the caller guarantees one row per undirected
    pair (e.g. edges straight out of ``accept_edges``, whose candidate source
    dedups on the pair key); orientation canonicalization is a projection and
    cannot introduce duplicates.

    The final round's checkpoint stays alive (the returned plan reads from it);
    every earlier round is unpersisted as soon as it is superseded. Pass
    ``persisted`` (a list) to receive a ``CheckpointHandle`` for that final
    checkpoint — ``run_pipeline`` hands it to ``PipelineResult.persisted`` so
    ``release()`` frees it; without the handle the blocks stay pinned for the
    session lifetime (the round-4 runner-leak finding)."""
    spark = edges.sparkSession
    before = _persistent_rdd_ids(spark)
    cur = (
        # canonical orientation is larger -> smaller (id_a > id_b): that is the
        # converged star-forest form, so an input that is ALREADY an assignment
        # table (member -> component-min, e.g. re-clustering prior assignments
        # plus a few new edges) passes _is_star_forest immediately and runs
        # zero rounds. least-first orientation would force one full round on
        # every input because check 1 (id_a > id_b) could never hold.
        edges.select(
            F.greatest("id_a", "id_b").alias("id_a"),
            F.least("id_a", "id_b").alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
    )
    if not input_distinct:
        cur = cur.distinct()
    cur = cur.localCheckpoint()
    live = _persistent_rdd_ids(spark) - before
    # the star-forest test detects the fixed point directly, so an
    # already-converged input (e.g. re-clustering assignment edges plus a few
    # new span edges) runs zero rounds, and convergence costs one semi-join
    # instead of one confirmation round
    rounds = 0
    first_probe_skipped = assume_unconverged
    while first_probe_skipped or not _is_star_forest(cur):
        first_probe_skipped = False
        if rounds >= max_iterations:
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} rounds"
            )
        pre = _persistent_rdd_ids(spark)
        cur = _small_star(_large_star(cur)).localCheckpoint()
        _unpersist_rdd_ids(spark, live)
        live = _persistent_rdd_ids(spark) - pre
        rounds += 1

    if persisted is not None:
        persisted.append(CheckpointHandle(spark, live))
    # at convergence every edge is (node, component-min)
    assign = cur.select(F.col("id_a").alias("id"), F.col("id_b").alias("cluster_id"))
    roots = cur.select(F.col("id_b").alias("id"), F.col("id_b").alias("cluster_id"))
    return assign.unionByName(roots).groupBy("id").agg(
        F.min("cluster_id").alias("cluster_id")
    )


def attach_singletons(
    all_ids: DataFrame, assignments: DataFrame, id_col: str = "url"
) -> DataFrame:
    """Every id gets a cluster: components keep their min-id label, singletons
    cluster with themselves (FIXTURES.md gold_clusters semantics)."""
    ids = all_ids.select(F.col(id_col).alias("id"))
    return ids.join(assignments, "id", "left").select(
        F.col("id").alias("url"),
        F.coalesce("cluster_id", "id").alias("cluster_id"),
    )
