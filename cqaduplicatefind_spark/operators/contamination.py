"""Benchmark decontamination — flag training documents that share long
n-grams with an evaluation set (the GPT-3 appendix-C / PaLM-style overlap
check every LLM training pipeline runs before ingest). A document is
contaminated when any of its n-grams (default n=13, the GPT-3 choice)
appears in the benchmark; the per-document hit count supports both hard
drops and audit thresholds. ``fuzzy_contaminated_docs`` is the companion
near-duplicate check: distinct-n-gram Jaccard vs any benchmark document,
catching lightly-edited eval copies the verbatim test misses.

The reference has no decontamination layer; this is a forward-path operator
for the Common-Crawl-shaped input (BASELINE.json ``input_hint``), reusing
the repetition tier's n-gram builder (``operators/repetition.py``).

Scale shape (10^12 training docs vs a small eval set):

- the benchmark side reduces to DISTINCT 8-byte xxhash64 gram hashes —
  eval suites are thousands of documents, so this set is tiny; it is
  count-gated broadcast (shuffle-join fallback so an adversarially large
  "benchmark" cannot blow up the driver);
- the training side explodes grams map-side and probes the broadcast set
  with an inner hash join — no shuffle of the corpus — and the only
  exchange is the final map-side-combined per-document hit count;
- ``bloom_prefilter=True`` puts an exact-preserving Bloom gate in front of
  the confirming join: a broadcast bitmap of ~10 bits per benchmark gram
  (vs 64 for the raw hash set) filters corpus grams map-side; results are
  bit-identical because every Bloom positive is re-checked exactly. The
  gate's win condition is a benchmark too big to broadcast raw (see the
  ``contaminated_docs`` docstring) — with a comfortably-broadcast raw set
  the codegen join probe alone is cheaper than the Arrow round-trip;
- gram text never crosses an exchange (8-byte hashes; ~2^-64 per-gram
  collision caveat, the same documented class as the line tier — a
  collision can only over-flag, never silently pass contamination).

Semantics: ``n_contaminated_grams`` counts n-gram POSITIONS in the document
whose gram occurs anywhere in the benchmark (multiplicity on the document
side, distinct on the benchmark side); documents with zero hits are absent
from the output (a pipeline anti-joins the flags against the corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from cqaduplicatefind_spark.functions.hashing import splitmix64
from cqaduplicatefind_spark.operators.repetition import _ngrams

# 8-byte hashes: 50M grams ~ 400 MB broadcast upper bound; beyond that the
# probe falls back to a shuffle join
BROADCAST_MAX_BENCH_GRAMS = 50_000_000

# the fuzzy tier broadcasts (bench_id string, n_grams long, gram hash long)
# rows — ~50 bytes each, not 8 — so its gate is row-width-adjusted to the
# same ~400 MB budget; beyond it the probe falls back to a shuffle join
BROADCAST_MAX_FUZZY_BENCH_ROWS = 8_000_000

# bitmap cap: 200M grams at 10 bits/elem ~ 250 MB driver/broadcast footprint;
# beyond that the Bloom gate is skipped (the shuffle-join fallback handles it)
BLOOM_MAX_BENCH_GRAMS = 200_000_000


def _bloom_positions(gh: np.ndarray, m: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(word index, bit mask) arrays of shape (len(gh), k) for double-hashed
    Bloom probes. All arithmetic in wrapping uint64 numpy — Spark 4's ANSI mode
    makes the equivalent JVM-side hash multiplication an overflow ERROR, which
    is exactly why position math lives here and only bit tests ride the plan."""
    h1 = gh.astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        h2 = splitmix64(h1) | np.uint64(1)  # odd stride: full-cycle mod 2^64
        pos = (
            h1[:, None] + np.arange(k, dtype=np.uint64)[None, :] * h2[:, None]
        ) % np.uint64(m)
    return (pos >> np.uint64(6)).astype(np.int64), np.uint64(1) << (
        pos & np.uint64(63)
    )


def build_gram_bloom(
    gram_hashes: DataFrame, n_grams: int, bits_per_elem: int = 10, k: int = 7
) -> tuple[np.ndarray, int, int]:
    """(bitmap as uint64 words, m bits, k) Bloom filter over a one-column
    DataFrame of 8-byte gram hashes (column ``_gh``).

    Built distributed: each partition emits ONE binary row (its partial
    bitmap), OR-folded on the driver — driver traffic is n_partitions x m/8
    bytes, never the gram set itself. At the operator's contract scale (eval
    suites: <= ~10^7 grams) the bitmap is ~12 MB at 10 bits/elem, vs ~80 MB
    for the raw distinct-hash broadcast it pre-filters."""
    m = max(64, ((bits_per_elem * max(n_grams, 1) + 63) // 64) * 64)
    words = m // 64

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(words, dtype=np.uint64)
        seen = False
        for pdf in it:
            if len(pdf) == 0:
                continue
            seen = True
            w, b = _bloom_positions(pdf["_gh"].to_numpy(), m, k)
            np.bitwise_or.at(bitmap, w.ravel(), b.ravel())
        if seen:
            yield pd.DataFrame({"part": [bitmap.tobytes()]})

    # OR-fold via toLocalIterator, NOT collect(): the partial frame has one
    # bitmap row per non-empty input partition, and at the gate's own win
    # condition (n_bench large enough that the raw hash set cannot broadcast)
    # each partial is tens of MB — collect() would hold n_partitions of them
    # on the driver simultaneously (~15 GB at 60M grams x 200 shuffle
    # partitions) while the iterator holds ONE at a time. Each iterator
    # partition is a separate job wave; the partial frame is 1 row per
    # partition, so that costs n_partitions tiny tasks, not recomputation of
    # the gram stream per wave (mapInPandas runs once per partition either way).
    bitmap = np.zeros(words, dtype=np.uint64)
    for r in gram_hashes.select("_gh").mapInPandas(
        partial, "part binary"
    ).toLocalIterator():
        bitmap |= np.frombuffer(r.part, dtype=np.uint64)
    return bitmap, m, k


def _gram_hashes(df: DataFrame, text_col: str, n: int, *keep) -> DataFrame:
    toks = F.split(F.col(text_col), " ")
    return df.select(
        *keep, F.explode(_ngrams(toks, n)).alias("_g")
    ).select(*keep, F.xxhash64("_g").alias("_gh"))


def fuzzy_contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    threshold: float = 0.8,
    id_col: str = "url",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str = "text",
    return_pairs: bool = False,
) -> DataFrame:
    """Fuzzy decontamination: flag training documents whose DISTINCT-n-gram
    Jaccard similarity with ANY benchmark document is ``>= threshold`` — the
    near-duplicate analog of the exact 13-gram check (``contaminated_docs``),
    catching lightly-edited eval copies a verbatim-gram test misses.

    Returns ``(id, n_matched_bench, max_jaccard)`` per flagged document, or
    the audit pairs ``(id, bench_id, jaccard)`` with ``return_pairs=True``.
    Documents shorter than ``n`` tokens have no grams and cannot match.

    EXACT by construction, not LSH: a pair with Jaccard >= threshold shares at
    least one gram, so candidates = "share >= 1 distinct gram hash with a
    bench doc" has zero false negatives, and the Jaccard is computed from true
    distinct-gram counts (no MinHash estimate). That is affordable precisely
    because of this operator's asymmetry — eval suites are tiny next to the
    corpus, so where self-dedup needs banding to avoid the quadratic
    candidate blow-up, here the whole bench gram table broadcasts.

    Scale shape (10^12 training docs vs a small eval set):

    - per-document distinct grams and their count come from ONE projection on
      the document's own row (``array_distinct`` before the explode) — no
      exchange to deduplicate grams within a doc;
    - the bench side keeps ``(bench_id, n_bench_grams, gram_hash)`` and is
      count-gated broadcast (same gate as the exact tier); the corpus side
      explodes map-side and probes the BroadcastHashJoin — the corpus never
      shuffles for the join;
    - the only exchanges are the per-(doc, bench_doc) shared-gram count —
      bounded by the gram-sharing sliver, the same rows the exact tier
      aggregates — and the final per-doc summary; both carry ids + counts,
      never gram text;
    - per-gram fan-out is bounded by the number of BENCH docs containing the
      gram (13-grams are near-unique within a benchmark, so ~1); an
      adversarial benchmark of repeated boilerplate inflates candidates but
      never the corpus shuffle;
    - gram identity is the 8-byte xxhash64 — a 2^-64 collision can only nudge
      a count upward (over-flag), the same documented class as the exact tier.
    """
    bid = bench_id_col or id_col
    # bench-doc identity = (id, text), deduplicated: an eval set built by
    # unioning files can repeat rows, and a repeated row would double-count
    # every shared gram (jaccard = 2g/(na+nb-2g) can then exceed 1.0 and
    # false-flag docs); two DIFFERENT texts under one id stay two bench docs
    # (disambiguated by a text hash) so neither the shared-gram count nor
    # _nb mixes their gram sets. The distinct is an exchange on the SMALL
    # side only — the corpus still never shuffles for the join.
    bench_docs = benchmark.select(
        F.col(bid).alias("bench_id"), F.col(bench_text_col).alias("_bt")
    ).distinct()
    bench_grams = (
        bench_docs.select(
            "bench_id",
            F.xxhash64("_bt").alias("_bdoc"),
            F.array_distinct(_ngrams(F.split(F.col("_bt"), " "), n)).alias("_gs"),
        )
        .withColumn("_nb", F.size("_gs"))
        .select("bench_id", "_bdoc", "_nb", F.explode("_gs").alias("_g"))
        .select("bench_id", "_bdoc", "_nb", F.xxhash64("_g").alias("_gh"))
    )
    # count-gated broadcast, deliberately not persisted — same rationale as
    # contaminated_docs: the bench side is small by contract and the gate's
    # recompute is cheaper than a caller-managed cache lifecycle
    n_bench_rows = bench_grams.count()
    probe = (
        F.broadcast(bench_grams)
        if n_bench_rows <= BROADCAST_MAX_FUZZY_BENCH_ROWS
        else bench_grams
    )
    # corpus-doc identity = (id, text) via the _cdoc text hash, and _shared
    # counts DISTINCT gram hashes — the SAME defect class the bench side
    # fixes above, from the other direction: a corpus built by unioning crawl
    # files can repeat a row, and a repeated (id, text) row would otherwise
    # emit each gram twice, doubling _shared (jaccard can then exceed 1.0 and
    # false-flag the doc). count_distinct dedups INSIDE the pair aggregation,
    # so the fix costs one distinct pass over the gram-SHARING sliver (the
    # post-join rows the aggregate reads anyway) — never a corpus-wide
    # (id, text) distinct exchange. Two DIFFERENT texts under one id stay
    # separate scoring units (_cdoc pins the text, so F.first(_na) is
    # deterministic within a group); the per-id summary reports the best.
    corpus_grams = (
        docs.select(
            F.col(id_col).alias("id"),
            F.xxhash64(text_col).alias("_cdoc"),
            F.array_distinct(_ngrams(F.split(F.col(text_col), " "), n)).alias("_gs"),
        )
        .withColumn("_na", F.size("_gs"))
        .select("id", "_cdoc", "_na", F.explode("_gs").alias("_g"))
        .select("id", "_cdoc", "_na", F.xxhash64("_g").alias("_gh"))
    )
    pairs = (
        corpus_grams.join(probe, "_gh")
        .groupBy("id", "_cdoc", "bench_id", "_bdoc")
        .agg(
            F.count_distinct("_gh").alias("_shared"),
            F.first("_na").alias("_na"),
            F.first("_nb").alias("_nb"),
        )
        .withColumn(
            "jaccard",
            F.col("_shared") / (F.col("_na") + F.col("_nb") - F.col("_shared")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    if return_pairs:
        # one audit row per (doc, bench id); an id carrying several distinct
        # texts reports its best-matching one
        return pairs.groupBy("id", "bench_id").agg(
            F.max("jaccard").alias("jaccard")
        )
    return pairs.groupBy("id").agg(
        F.count_distinct("bench_id").alias("n_matched_bench"),
        F.max("jaccard").alias("max_jaccard"),
    )


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "url",
    text_col: str = "text",
    bench_text_col: str = "text",
    bloom_prefilter: bool = False,
    bloom_bits_per_elem: int = 10,
    bloom_k: int = 7,
    persisted: list | None = None,
) -> DataFrame:
    """``(id, n_contaminated_grams)`` for every training document sharing at
    least one n-gram with the benchmark. See module docstring for semantics
    and the scale shape.

    ``bloom_prefilter=True`` inserts an EXACT-preserving map-side Bloom gate:
    corpus gram rows probe a broadcast bitmap (~10 bits per benchmark gram vs
    64 for the raw hash set) and only Bloom-positives — true hits plus the
    ~0.8% false-positive tail at the defaults — reach the confirming join,
    while results stay bit-identical (a Bloom negative is never a member;
    every positive is re-checked exactly). Be honest about the win condition:
    the gate routes the corpus gram stream through an Arrow round-trip, which
    costs MORE per row than the whole-stage-codegen BroadcastHashJoin probe
    it short-circuits — it pays off only when the raw distinct-hash set is
    too big to broadcast (n_bench > BROADCAST_MAX_BENCH_GRAMS, where the
    confirm join degrades to a corpus-wide shuffle the gate then starves
    down to the Bloom-positive sliver) or when executor broadcast memory is
    the binding constraint (the bitmap is ~6x smaller). When the raw set
    already broadcasts comfortably, leave the gate off. Benchmarks too big
    for even the bitmap (> BLOOM_MAX_BENCH_GRAMS) skip the gate rather than
    OOM the driver.

    With the gate on, the Bloom bitmap rides a SparkContext broadcast that the
    returned frame's plan needs until materialization, so it cannot be freed
    here; pass ``persisted`` (a list) to receive the broadcast handle and call
    ``.unpersist()`` once the output is materialized — otherwise it is
    reclaimed only when the frame (and the UDF closure holding the handle) is
    garbage-collected, which pins up to ~250 MB per call in a long session."""
    bench = _gram_hashes(benchmark, bench_text_col, n).distinct()
    # count-gated broadcast with shuffle fallback. The count gate runs the
    # benchmark-side distinct once and the join re-runs it — deliberately NOT
    # persisted: the benchmark is the SMALL side by this operator's contract
    # (eval suites, not corpora), so the recompute is cheap and the operator
    # stays leak-free with no caller-managed cache lifecycle. Contrast the
    # line tier, whose count-gated set derives from a corpus-wide pass and
    # therefore IS persisted with a release handle.
    n_bench = bench.count()
    probe = F.broadcast(bench) if n_bench <= BROADCAST_MAX_BENCH_GRAMS else bench
    corpus_grams = _gram_hashes(docs, text_col, n, F.col(id_col))
    if bloom_prefilter and 0 < n_bench <= BLOOM_MAX_BENCH_GRAMS:
        bitmap, m, k = build_gram_bloom(bench, n_bench, bloom_bits_per_elem, bloom_k)
        bc = docs.sparkSession.sparkContext.broadcast(bitmap.tobytes())
        if persisted is not None:
            persisted.append(bc)

        def gate(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            bm = np.frombuffer(bc.value, dtype=np.uint64)
            for pdf in it:
                if len(pdf) == 0:
                    continue
                w, b = _bloom_positions(pdf["_gh"].to_numpy(), m, k)
                yield pdf[((bm[w] & b) != 0).all(axis=1)]

        corpus_grams = corpus_grams.mapInPandas(gate, corpus_grams.schema)
    return (
        corpus_grams.join(probe, "_gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
