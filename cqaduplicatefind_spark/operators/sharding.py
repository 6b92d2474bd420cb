"""Corpus sharding operators for training-data preparation.

Two operators a 100-TB training pipeline needs after dedup/filtering:

- :func:`pack_shards` — assign every document to a fixed token-budget training
  shard (the "chunk the corpus into ~B-token files" step) via a distributed
  prefix sum: no global single-task window, ever.
- :func:`cap_per_host` — keep at most K documents per registrable host
  (C4/RefinedWeb-style per-domain cap) with a salted two-phase top-K so a
  mega-host (the 10^8-page domain every crawl has) never lands in one task.

Both define a deterministic, partition-independent total order so results are
reproducible across engines, parallelism levels and reruns — the same property
the scaling bench pins for clusters (SURVEY §7.3 "determinism under
parallelism"). The reference has no sharding analog (its corpora are per-forum
pandas frames, ``/root/reference/src/DataSetUtil.py:24-31``); this is part of
the LLM-pipeline surface the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _order_hash(id_col: Column) -> Column:
    """Deterministic pseudo-random order key, restatable in ANSI SQL: md5 of
    the stringified id. (xxhash64 would be cheaper but has no DuckDB twin;
    this column is computed once per row and never shuffled as text beyond
    the 32-byte hex.)"""
    # NULL-id rows still need a total-order position: md5(NULL) is NULL, which
    # would (a) give them a NULL bucket key that crashes the driver's
    # sorted(sizes) fold with a None-vs-str TypeError and (b) silently drop
    # them at the offsets join. Coalesce to '' — a NULL id sorts with the
    # empty-string bucket, deterministically (the window's id tie-break puts
    # NULLs first), instead of derailing the job.
    return F.md5(F.coalesce(id_col.cast("string"), F.lit("")))


def pack_shards(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    bucket_hex_len: int = 2,
    persisted: list | None = None,
) -> DataFrame:
    """Pack documents into fixed-weight shards: shard_id = floor(P / budget)
    where P is the exclusive prefix sum of ``weight_col`` over the global
    order ``(md5(id), id)``.

    A single ``sum() OVER (ORDER BY ...)`` window would pull the whole corpus
    through one task. Instead (the distributed-rank pattern from
    ``operators/pairs.py``): bucket rows by the first ``bucket_hex_len`` hex
    chars of the order hash — buckets are CONTIGUOUS RANGES of the global
    order, so (bucket, hash, id) == (hash, id) — cumsum within each bucket in
    parallel, then add per-bucket offsets (16**bucket_hex_len scalar rows
    folded on the driver and shipped back as a broadcast join: an O(1) hash
    probe per row, where a 16^k-entry map literal would be a linear key scan
    per row and, at 16^4, a codegen-budget hazard). At 10^12 docs raise
    ``bucket_hex_len`` so each bucket's window fits one task
    (16**4 = 65 536 buckets ≈ 15 M rows/bucket; offsets stay a trivial
    driver fold).

    The slim (id, weight, hash, bucket) projection feeds two consumers (the
    offsets collect and the windowed plan), so it is persisted — pass
    ``persisted`` (a list) to receive the cached frame for ``unpersist()``
    once the output is materialized. Besides the double scan, the persist is
    what makes the result well-defined over nondeterministic upstreams (a
    sampled/limited input recomputed differently between the two jobs would
    desynchronize the offsets from the windowed rows).

    Shard invariant: every shard except the last carries ``budget ± max(w)``
    tokens (a document is never split). Deterministic: independent of input
    partitioning and parallelism.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if not 1 <= bucket_hex_len <= 4:
        raise ValueError("bucket_hex_len must be in 1..4")
    idc = F.col(id_col)
    h = _order_hash(idc)
    d = docs.select(
        idc.alias(id_col),
        F.col(weight_col).cast("long").alias(weight_col),
        h.alias("_h"),
        F.substring(h, 1, bucket_hex_len).alias("_b"),
    ).persist()
    if persisted is not None:
        persisted.append(d)

    # per-bucket totals -> exclusive offsets (16**k scalars; driver fold).
    # A bucket whose every weight is NULL sums to NULL -> contributes 0,
    # matching the window sum (which also skips NULLs).
    sizes = {
        r["_b"]: r["w"] or 0
        for r in d.groupBy("_b").agg(F.sum(weight_col).alias("w")).collect()
    }
    hexd = "0123456789abcdef"
    offsets: dict[str, int] = {}
    acc = 0
    for b in sorted(sizes):  # hex strings sort like the hash order
        offsets[b] = acc
        acc += sizes[b]
    assert all(len(b) == bucket_hex_len and all(c in hexd for c in b) for b in sizes)
    off_df = docs.sparkSession.createDataFrame(
        list(offsets.items()), "_b string, _off long"
    )

    w = (
        Window.partitionBy("_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(weight_col).over(w), F.lit(0)) + F.col("_off")
    return (
        d.join(F.broadcast(off_df), "_b")
        .withColumn("_prior", prior)
        # integer division (not floor of a double quotient) so shard boundaries
        # are exact at any corpus size — priors are nonnegative longs, and the
        # shard id stays BIGINT (10^12 docs / small budgets exceed INT32;
        # under Spark 4's ANSI mode an INT cast would throw mid-job)
        .withColumn("shard_id", F.expr(f"_prior DIV {int(budget)}"))
        .select(id_col, weight_col, "shard_id")
    )


def cap_per_host(
    docs: DataFrame,
    k: int,
    host_col: str = "host",
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    n_salts: int = 16,
) -> DataFrame:
    """Keep the top-``k`` documents per host by ``(weight desc, id asc)`` —
    the per-domain volume cap (C4 §2.2 / RefinedWeb-style) that stops a
    single boilerplate-heavy domain from dominating the training mixture.

    Skew-safe two-phase top-K: phase 1 ranks within ``(host, salt)`` where
    salt = xxhash64(id) % n_salts — a mega-host splits across ``n_salts``
    tasks and each emits at most k survivors; phase 2 ranks the ≤ k·n_salts
    survivors per host. The global top-k per host is a subset of the union of
    per-salt top-k's (each global winner beats everything, in particular
    within its own salt), so phase 2 sees every winner; no host ever routes
    more than k·n_salts rows through one task.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    order = [F.col(weight_col).desc(), F.col(id_col).asc()]
    salted = docs.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    )
    w1 = Window.partitionBy(host_col, "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy(host_col).orderBy(*order)
    return (
        survivors.withColumn("host_rank", F.row_number().over(w2))
        .where(F.col("host_rank") <= k)
    )
