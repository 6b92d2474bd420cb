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
- gram text never crosses an exchange (8-byte hashes; ~2^-64 per-gram
  collision caveat, the same documented class as the line tier — a
  collision can only over-flag, never silently pass contamination).

Semantics: ``n_contaminated_grams`` counts n-gram POSITIONS in the document
whose gram occurs anywhere in the benchmark (multiplicity on the document
side, distinct on the benchmark side); documents with zero hits are absent
from the output (a pipeline anti-joins the flags against the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cqaduplicatefind_spark.operators.repetition import _ngrams

# 8-byte hashes: 50M grams ~ 400 MB broadcast upper bound; beyond that the
# probe falls back to a shuffle join
BROADCAST_MAX_BENCH_GRAMS = 50_000_000


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
) -> DataFrame:
    """``(id, n_contaminated_grams)`` for every training document sharing at
    least one n-gram with the benchmark. See module docstring for semantics
    and the scale shape."""
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
    return (
        _gram_hashes(docs, text_col, n, F.col(id_col))
        .join(probe, "_gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
