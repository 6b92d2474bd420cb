"""Shard packing (distributed prefix sum) and per-host caps: exact parity with
a driver-side reference, budget invariants, partitioning independence, and the
skew-safe plan shapes (no global single-task window; salted phase-1 cap)."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from cqaduplicatefind_spark.operators.sharding import cap_per_host, pack_shards


def _docs(spark, weights, n_parts=None):
    df = spark.createDataFrame(
        [(i, int(w)) for i, w in enumerate(weights)], "doc_id long, n_tokens long"
    )
    return df.repartition(n_parts) if n_parts else df


def _reference_packing(weights, budget):
    order = sorted(
        range(len(weights)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    out, acc = {}, 0
    for i in order:
        out[i] = acc // budget
        acc += weights[i]
    return out


def test_pack_shards_matches_reference(spark):
    rng = np.random.default_rng(3)
    weights = rng.integers(1, 400, size=300).tolist()
    got = {
        r.doc_id: r.shard_id
        for r in pack_shards(_docs(spark, weights), budget=1000).collect()
    }
    assert got == _reference_packing(weights, 1000)


def test_pack_shards_budget_invariant_and_contiguity(spark):
    rng = np.random.default_rng(11)
    weights = rng.integers(1, 250, size=500).tolist()
    budget = 2000
    rows = pack_shards(_docs(spark, weights), budget=budget).collect()
    totals: dict[int, int] = {}
    for r in rows:
        totals[r.shard_id] = totals.get(r.shard_id, 0) + r.n_tokens
    # contiguous shard ids 0..max
    assert sorted(totals) == list(range(len(totals)))
    # every shard but the last within budget +/- one max-weight doc
    mx = max(weights)
    for sid in sorted(totals)[:-1]:
        assert abs(totals[sid] - budget) <= mx
    assert sum(totals.values()) == sum(weights)


def test_pack_shards_partitioning_and_bucket_width_invariant(spark):
    rng = np.random.default_rng(7)
    weights = rng.integers(1, 100, size=400).tolist()
    base = {
        r.doc_id: r.shard_id
        for r in pack_shards(_docs(spark, weights), budget=500).collect()
    }
    for n_parts, hexlen in [(1, 1), (13, 3), (8, 2)]:
        again = {
            r.doc_id: r.shard_id
            for r in pack_shards(
                _docs(spark, weights, n_parts), budget=500, bucket_hex_len=hexlen
            ).collect()
        }
        assert again == base


def test_pack_shards_no_global_window(spark):
    """The prefix sum must run as per-bucket windows (partitioned exchange),
    never one unpartitioned global-order window."""
    plan = pack_shards(_docs(spark, [5] * 50), budget=20)._jdf.queryExecution(
    ).executedPlan().toString()
    window_lines = [ln for ln in plan.splitlines() if "Window " in ln]
    assert window_lines, plan
    # every Window node must be partitioned by the bucket column (an
    # unpartitioned ORDER BY window would list no partition columns and
    # execute on a single task)
    assert all("_b" in ln for ln in window_lines), plan


def _hosted(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, host string, n_tokens long")


def test_pack_shards_null_id_survives(spark):
    """A NULL doc id must neither crash the driver's bucket fold (md5(NULL)
    gave a None bucket key that sorted() cannot compare) nor silently vanish
    at the offsets join: it sorts with the empty-string hash bucket and keeps
    its weight in the packing."""
    from cqaduplicatefind_spark.operators.sharding import pack_shards

    docs = spark.createDataFrame(
        [("a", 10), (None, 10), ("b", 10)], "doc_id string, n_tokens long"
    )
    out = pack_shards(docs, budget=100)
    rows = out.collect()
    assert len(rows) == 3  # the NULL-id row is packed, not dropped
    assert {r.shard_id for r in rows} == {0}


def test_cap_per_host_matches_bruteforce(spark):
    rng = np.random.default_rng(5)
    rows = [
        (i, f"h{int(rng.integers(0, 7))}", int(rng.integers(1, 50)))
        for i in range(400)
    ]
    k = 5
    got = {
        (r.doc_id, r.host_rank)
        for r in cap_per_host(_hosted(spark, rows), k=k).collect()
    }
    expect = set()
    by_host: dict[str, list] = {}
    for i, h, w in rows:
        by_host.setdefault(h, []).append((i, w))
    for h, docs in by_host.items():
        ranked = sorted(docs, key=lambda iw: (-iw[1], iw[0]))[:k]
        expect |= {(i, rank + 1) for rank, (i, _) in enumerate(ranked)}
    assert got == expect


def test_cap_per_host_hot_host_and_salt_invariance(spark):
    # one mega-host (10k docs) next to tiny ones; ties in weight everywhere
    rows = [(i, "mega", int(i % 3)) for i in range(10_000)] + [
        (100_000 + i, f"t{i}", 99) for i in range(5)
    ]
    df = _hosted(spark, rows)
    a = {(r.doc_id, r.host_rank) for r in cap_per_host(df, k=4, n_salts=2).collect()}
    b = {(r.doc_id, r.host_rank) for r in cap_per_host(df, k=4, n_salts=64).collect()}
    assert a == b
    mega = sorted(d for d, _ in a if d < 100_000)
    # weight desc (2), then id asc -> ids 2, 5, 8, 11
    assert mega == [2, 5, 8, 11]
    assert {d for d, _ in a if d >= 100_000} == {100_000 + i for i in range(5)}


def test_cap_per_host_keeps_small_hosts_whole(spark):
    rows = [(i, f"h{i % 50}", 10) for i in range(100)]  # 2 docs per host
    out = cap_per_host(_hosted(spark, rows), k=5).collect()
    assert len(out) == 100
