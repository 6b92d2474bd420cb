"""Benchmark decontamination — flag training documents that share long
n-grams with an evaluation set (the GPT-3 appendix-C / PaLM-style overlap
check every LLM training pipeline runs before ingest). A document is
contaminated when any of its n-grams (default n=13, the GPT-3 choice)
appears in the benchmark; the per-document hit count supports both hard
drops and audit thresholds.

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

    parts = gram_hashes.select("_gh").mapInPandas(partial, "part binary").collect()
    bitmap = np.zeros(words, dtype=np.uint64)
    for r in parts:
        bitmap |= np.frombuffer(r.part, dtype=np.uint64)
    return bitmap, m, k


def _gram_hashes(df: DataFrame, text_col: str, n: int, *keep) -> DataFrame:
    toks = F.split(F.col(text_col), " ")
    return df.select(
        *keep, F.explode(_ngrams(toks, n)).alias("_g")
    ).select(*keep, F.xxhash64("_g").alias("_gh"))


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
    OOM the driver."""
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
