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


def test_attach_singletons(spark):
    edges = [("a", "b")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    assign = connected_components(df)
    ids = spark.createDataFrame([("a",), ("b",), ("c",)], "url string")
    full = {r.url: r.cluster_id for r in attach_singletons(ids, assign).collect()}
    assert full == {"a": "a", "b": "a", "c": "c"}
