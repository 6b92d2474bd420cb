"""Connected-components correctness vs a union-find oracle, on adversarial graph
shapes (long paths stress iteration count; stars/cliques stress the star ops) and
random graphs, plus partitioning-invariance."""

import random

import pytest
from pyspark.sql import functions as F

from cqaduplicatefind_spark.operators.connected_components import (
    attach_singletons,
    connected_components,
)


def _oracle(edges, nodes=None):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    out = {}
    for n in nodes if nodes is not None else list(parent):
        out[n] = find(n)
    # canonicalize to min member per component
    comp = {}
    for n, r in out.items():
        comp.setdefault(r, []).append(n)
    result = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            result[n] = m
    return result


def _run(spark, edges):
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {
        r.id: r.cluster_id for r in connected_components(df).collect()
    }
    return got


GRAPHS = {
    "path": [(f"n{i:03d}", f"n{i+1:03d}") for i in range(40)],
    "two_cliques": [
        (f"a{i}", f"a{j}") for i in range(5) for j in range(i + 1, 5)
    ] + [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)],
    "star": [("hub", f"leaf{i:02d}") for i in range(20)],
    "reversed_path": [(f"n{i+1:03d}", f"n{i:03d}") for i in range(30)],
    "self_loops_and_dups": [("x", "y"), ("y", "x"), ("x", "x"), ("y", "z"), ("y", "z")],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_known_graphs(spark, name):
    edges = GRAPHS[name]
    got = _run(spark, edges)
    nodes = {n for e in edges for n in e}
    assert got == _oracle(edges, nodes)


def test_random_graphs_vs_oracle(spark):
    rnd = random.Random(123)
    nodes = [f"v{i:04d}" for i in range(300)]
    edges = [
        (rnd.choice(nodes), rnd.choice(nodes)) for _ in range(250)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges)
    assert got == _oracle(edges, {n for e in edges for n in e})


def test_partitioning_invariance(spark):
    edges = GRAPHS["path"] + GRAPHS["star"]
    df1 = spark.createDataFrame(edges, "id_a string, id_b string").repartition(1)
    df17 = spark.createDataFrame(edges, "id_a string, id_b string").repartition(17)
    got1 = {r.id: r.cluster_id for r in connected_components(df1).collect()}
    got17 = {r.id: r.cluster_id for r in connected_components(df17).collect()}
    assert got1 == got17


def test_fixed_point_equivalence_adversarial(spark):
    """Pin the Kiveris fixed-point equivalence the convergence check relies on:
    alternating small_star(large_star(E)) eventually satisfies _is_star_forest
    on adversarial shapes (chains, duplicate-heavy, cliques) — i.e. an edge set
    stable under the alternation IS a star forest, so the strict functional/
    star checks can never raise on a stabilized set."""
    from cqaduplicatefind_spark.operators.connected_components import (
        _is_star_forest,
        _large_star,
        _small_star,
    )

    for name in ("path", "reversed_path", "self_loops_and_dups", "two_cliques"):
        edges = GRAPHS[name]
        cur = (
            spark.createDataFrame(edges, "id_a string, id_b string")
            .select(
                F.greatest("id_a", "id_b").alias("id_a"),
                F.least("id_a", "id_b").alias("id_b"),
            )
            .where(F.col("id_a") != F.col("id_b"))
            .distinct()
            .localCheckpoint()
        )
        for _ in range(30):
            if _is_star_forest(cur):
                break
            cur = _small_star(_large_star(cur)).localCheckpoint()
        assert _is_star_forest(cur), name
        # and once a star forest, the alternation maps it to itself
        again = _small_star(_large_star(cur))
        assert _is_star_forest(again), name
        got = set(map(tuple, cur.collect()))
        assert got == set(map(tuple, again.collect())), name


def test_converged_input_runs_zero_rounds(spark):
    """An input that is already an assignment table (member -> component-min)
    must pass the star-forest check immediately — the zero-round fast path the
    span pass relies on when re-clustering prior assignments."""
    from cqaduplicatefind_spark.operators.connected_components import _is_star_forest

    assign = [("b", "a"), ("c", "a"), ("z", "y")]
    cur = (
        spark.createDataFrame(assign, "id_a string, id_b string")
        .select(
            F.greatest("id_a", "id_b").alias("id_a"),
            F.least("id_a", "id_b").alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    assert _is_star_forest(cur)
    got = _run(spark, assign)
    assert got == _oracle(assign, {n for e in assign for n in e})


def test_attach_singletons(spark):
    edges = [("a", "b")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    assign = connected_components(df)
    ids = spark.createDataFrame([("a",), ("b",), ("c",)], "url string")
    full = {r.url: r.cluster_id for r in attach_singletons(ids, assign).collect()}
    assert full == {"a": "a", "b": "a", "c": "c"}
