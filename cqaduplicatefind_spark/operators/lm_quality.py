"""Corpus-trained unigram language-model quality scoring (the CCNet-style
perplexity filter a Common-Crawl training pipeline runs after dedup): score
every document by the average log-probability of its tokens under a unigram
model fitted on the corpus itself, so template/boilerplate-heavy pages (high
probability, low information) and gibberish pages (very low probability)
both surface on one scale.

The reference has no corpus-level quality model — its quality signal is the
per-pair classifier zoo (/root/reference/src/NBAndXGBCountVectorClassifier.py)
over hand-built count vectors; this is the corpus-scale analog the
Common-Crawl-shaped input needs (CCNet, Wenzek et al. 2020, uses a 5-gram
KenLM; the unigram Lidstone model here keeps the operator pure-Catalyst and
exactly restatable in SQL while exercising the identical pipeline shape:
fit token counts corpus-wide, then score every doc against the fitted table).

Model: p(t) = (c_t + alpha) / (N + alpha * V) over the corpus's own vocabulary
(Lidstone smoothing; every scored token is in-vocabulary because the model is
fitted on the corpus being scored). Per doc: avg_logprob = sum_t tf_t *
ln p(t) / n_tokens, and ppl = exp(-avg_logprob).

Scale shape (the part that must survive 100 TB):

- Token counting never shuffles raw token instances twice: the per-doc
  term-frequency frame ``(id, tok, tf)`` is built first (groupBy on the
  skew-free composite key), and the vocab count table aggregates THAT (one
  map-side-combined exchange carrying one row per distinct (doc, token)).
- The totals (N, V) ride as a broadcast 1-row frame — no driver collect, no
  extra barrier.
- The score join is the skew hazard: a shuffle join tf-vs-counts would route
  every ``(doc, "the")`` row to the single reducer owning "the". Split the
  vocab by frequency instead: the top ``head_k`` tokens (which carry almost
  all token mass under Zipf) join BROADCAST — hot keys never shuffle — and
  only the rare tail (per-token row count bounded by the k-th head count, so
  skew-free by construction) goes through the shuffled join. Both paths
  produce identical columns and union before the per-doc aggregate.
- Determinism for cross-engine hash-matching: the per-doc mean is rounded to
  6 decimals (fp reorder noise across partitionings is ~1e-13 relative) and
  ppl is exp of the ROUNDED mean, so both engines exponentiate the same
  input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    head_k: int = 65536,
    persisted: list | None = None,
) -> DataFrame:
    """Score each document under a corpus-fitted unigram LM.

    Returns ``(id_col, n_tokens, avg_logprob, ppl)`` — one row per document
    that has at least one (whitespace) token; token-free documents have no
    defined mean and are omitted, mirroring the SQL restatement's join.

    ``head_k`` sizes the broadcast head of the vocabulary (64 Ki token texts
    plus counts is a few MiB — safe at default broadcast limits); the rare
    tail joins shuffled. ``persisted`` (a list) OPTS INTO the two caches and
    takes ownership of them: the term-frequency frame (one row per distinct
    (doc, token) — feeds the count fit plus both score branches; without the
    cache the tokenize + groupBy exchange runs three times, and
    MEMORY_AND_DISK spilling beats recomputing the corpus scan at scale) and
    the vocab count frame (feeds the head top-k, the tail join, and the
    totals). The caller unpersists after materializing the result. With
    ``persisted=None`` nothing is cached: the plan recomputes the tokenize
    exchange per consumer, but a caller holding no release handle can never
    strand executor storage in a long-lived session (the hot callers — entry
    queries, the corpus-prep composite — all pass the list).
    """

    def _maybe_persist(df: DataFrame) -> DataFrame:
        if persisted is None:
            return df
        df = df.persist()
        persisted.append(df)
        return df
    # \s+ split, not single-space: this tier faces raw multi-line crawl pages
    # (the corpus-prep composite feeds it decontaminated page text), and a
    # single-space split would glue tokens across newlines/tabs into rare
    # "words" whose Lidstone floor depresses well-formed documents' scores —
    # the same hazard bm25.py documents at its tokenizer
    tf = _maybe_persist(
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("_tok"),
        )
        .where(F.col("_tok") != "")
        .groupBy("_id", "_tok")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    counts = _maybe_persist(tf.groupBy("_tok").agg(F.sum("_tf").alias("_c")))
    totals = counts.agg(
        F.sum("_c").cast("double").alias("_n"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    head = counts.orderBy(F.desc("_c"), F.asc("_tok")).limit(head_k)
    with_head = tf.join(F.broadcast(head), "_tok", "left")
    hot = with_head.where(F.col("_c").isNotNull())
    rare = (
        with_head.where(F.col("_c").isNull())
        .drop("_c")
        .join(counts, "_tok")
    )
    lp_tok = F.log(
        (F.col("_c").cast("double") + F.lit(float(alpha)))
        / (F.col("_n") + F.lit(float(alpha)) * F.col("_v"))
    )
    scored = hot.unionByName(rare).join(F.broadcast(totals))
    per_doc = scored.groupBy("_id").agg(
        F.sum("_tf").alias("n_tokens"),
        F.round(
            F.sum(F.col("_tf").cast("double") * lp_tok) / F.sum(F.col("_tf")).cast("double"),
            6,
        ).alias("avg_logprob"),
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "avg_logprob",
        F.round(F.exp(-F.col("avg_logprob")), 2).alias("ppl"),
    )
