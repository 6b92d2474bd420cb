"""Corpus-level statistics and mixture construction for training pipelines:
exact top-k n-grams (corpus profiling / template detection) and deterministic
stratified sampling (building a training mixture with per-source rates).

The reference computes corpus stats single-node in pandas (row counts and
dup-ratio prints, /root/reference/src/DataSetUtil.py:35-38); these are the
corpus-scale analogs the Common-Crawl-shaped input needs.

Scale shape:

- ``top_ngrams`` never shuffles gram TEXT for the corpus: the counting
  exchange carries (8-byte xxhash64, partial count) rows (map-side combined)
  into a persisted vocab-sized count frame that both downstream consumers
  read, the k-th count threshold comes from a distributed top-k on that slim
  frame (TakeOrderedAndProject — no global sort), and gram text is fetched
  only for the >= threshold winners via a broadcast semi-join back over the
  gram stream (vocab text crosses the wire for candidate hashes only, ~k
  rows). Two corpus scans total (count pass + text-fetch pass), both pure
  Catalyst.
- ``stratified_sample`` is one broadcast join + a per-row md5 comparison in
  whole-stage codegen: keep a row iff the first 8 hex digits of
  md5(seed:id) sort below the stratum's rate threshold. Deterministic across
  engines, partitionings, and reruns (the property that makes a training
  mixture reproducible); no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cqaduplicatefind_spark.operators.repetition import _ngrams

# above this many boundary-tie candidate hashes, fetch gram text with a
# shuffle join instead of broadcasting through the driver (8-byte hashes:
# 1M rows ~ 8 MB broadcast — same bound as linededup.BROADCAST_MAX_BOILER)
BROADCAST_MAX_CANDS = 1_000_000


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
    persisted: list | None = None,
) -> DataFrame:
    """Exact global top-k n-grams: ``(gram, cnt)``, ordered by count desc then
    gram asc (total order — deterministic at tie boundaries). Counts are by
    occurrence (not per-document).

    The per-hash count frame feeds two consumers (the k-th-count threshold
    and the boundary-candidate filter), so it is persisted — without the
    cache the corpus-wide counting exchange would run twice. Pass
    ``persisted`` (a list) to take ownership of releasing it after the
    returned frame is materialized; with ``None`` the cache lives until the
    session drops it (fine for one-shot jobs, wrong for harnesses — the
    driver query threads its handle list)."""
    gram_stream = docs.select(
        F.explode(_ngrams(F.split(F.col(text_col), " "), n)).alias("gram")
    ).select(F.xxhash64("gram").alias("_gh"), "gram")
    counts = (
        gram_stream.groupBy("_gh").agg(F.count(F.lit(1)).alias("cnt")).persist()
    )
    if persisted is not None:
        persisted.append(counts)
    # k-th highest count as a 1-row frame: candidates = every hash at or above
    # it (ties at the boundary included, so the final text-ordered limit k is
    # exact regardless of which hashes the slim top-k happened to keep)
    thr = counts.orderBy(F.desc("cnt")).limit(k).agg(F.min("cnt").alias("_thr"))
    cands = counts.join(F.broadcast(thr)).where(F.col("cnt") >= F.col("_thr"))
    # the candidate set is ~k rows in practice, but a tie-heavy boundary (e.g.
    # _thr lands on 1 because < k grams repeat) makes it vocab-sized — gate the
    # broadcast on a cheap count over the persisted frame, shuffle fallback
    # (same count-gated pattern as linededup.remove_boilerplate_lines)
    cand_hashes = cands.select("_gh")
    if cands.count() <= BROADCAST_MAX_CANDS:
        cand_hashes = F.broadcast(cand_hashes)
    texts = (
        gram_stream.join(cand_hashes, "_gh")
        .groupBy("_gh")
        .agg(F.min("gram").alias("gram"))  # min: deterministic under collisions
    )
    return (
        cands.join(texts, "_gh")
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
        .select("gram", "cnt")
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strat_col: str = "source",
    id_col: str = "url",
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff the first 8 hex digits
    of ``md5(seed:id)`` fall below ``floor(rate * 16^8)`` for its stratum —
    the same row survives on any engine, partitioning, or rerun, and raising a
    stratum's rate strictly grows its sample (nested samples: the r=0.1 set is
    a subset of the r=0.2 set). Strata absent from ``rates`` use
    ``default_rate``. Returns ``docs``' surviving rows unchanged."""
    spark = docs.sparkSession

    def hex_thr(rate: float) -> str:
        r = min(max(float(rate), 0.0), 1.0)
        return f"{min(int(r * 16**8), 16**8 - 1):08x}" if r < 1.0 else "g"
        # "g" sorts after every hex digit: rate 1.0 keeps all rows

    rate_rows = [(s, hex_thr(r)) for s, r in sorted(rates.items())]
    rt = spark.createDataFrame(rate_rows, f"{strat_col} string, _thr string")
    joined = docs.join(F.broadcast(rt), strat_col, "left").withColumn(
        "_thr", F.coalesce(F.col("_thr"), F.lit(hex_thr(default_rate)))
    )
    # NOTE: the decision is keyed on id alone (that is what makes samples
    # reproducible and nested across rates); rows with a NULL id therefore
    # share ONE key per corpus (concat_ws skips NULLs) and are kept or
    # dropped together — assign real ids upstream if per-row independence
    # matters for such rows.
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    return joined.where(F.substring(key, 1, 8) < F.col("_thr")).drop("_thr")
