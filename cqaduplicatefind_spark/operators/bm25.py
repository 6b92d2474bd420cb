"""Distributed BM25 top-k retrieval — the reference's candidate generator as a
first-class inverted-index join.

Reference: ``rank_bm25.BM25Okapi`` over per-forum normalized titles with query
= title + body (``/root/reference/src/BM25DuplicateRetriever.py:46-63``): the
reference scores EVERY corpus doc against every query in a Python loop. Here
the same scores come out of an inverted-index formulation — postings join
query terms on the term key, per-(query, doc) contributions sum in a hash
aggregate with map-side partial combine, and a per-query window takes top-k —
so corpus × query work is bounded by posting-list sizes, never N×M.

Formula fidelity (BM25Okapi, rank_bm25 defaults): ``idf = ln((N-df+0.5)/(df+0.5))``
with negative idfs floored at ``epsilon * avg_idf`` (avg over the raw idfs of
the whole corpus vocabulary), ``score += q_mult * idf * tf*(k1+1) /
(tf + k1*(1-b+b*dl/avgdl))`` — query-term multiplicity counts, exactly like the
reference's loop over query tokens. Pinned against a faithful local BM25Okapi
in tests.

Scale guards:
- ``df_cap``: posting lists for terms in more than ``df_cap`` docs are excluded
  from the JOIN (both sides). A term in millions of pages produces a
  ``|queries| × df`` join blowup while its floored idf contributes ~nothing —
  the same reasoning as ``ngram.py``'s DF cap, and the set-theoretic analog of
  impact-ordered index pruning. idf/avg_idf statistics still come from the FULL
  vocabulary so capped and uncapped runs agree on every surviving term's weight.
- corpus statistics (N, avgdl, avg_idf) ride broadcast one-row frames — no
  driver collect, no recompute per stage.
- scores round to 6dp BEFORE ranking with a deterministic candidate-id
  tie-break, so rankings are reproducible across engines and run-to-run
  (float summation order varies under parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _tokens(df: DataFrame, id_col: str, text_col: str, out_id: str) -> DataFrame:
    """(out_id, t): whitespace tokens, empties dropped — Python ``str.split()``
    semantics (any whitespace run is a boundary). The reference tokenizes with
    ``doc.split(" ")`` (src/BM25DuplicateRetriever.py:46,59) over corpora its
    normalization pass has already single-spaced, where the two agree;
    splitting on ``\\s+`` extends the same semantics correctly to raw crawl
    text (a single-space split would glue tokens across tabs/newlines)."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.filter(F.split(text_col, r"\s+"), lambda x: x != "").alias("t"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
    df_cap: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    exclude_self: bool | None = None,
    persisted: list | None = None,
) -> DataFrame:
    """(query_id, candidate_id, bm25, rank): top-``k`` corpus docs per query by
    BM25Okapi score (ties broken by candidate id; a doc sharing no query term
    is unranked, matching how the reference's top-10 slice treats all-zero
    rows as noise — a doc matched only through zero-idf terms still ranks,
    with score 0, exactly like rank_bm25's zero entries in ``get_scores``).

    ``queries=None`` is self-retrieval (every doc queries the corpus);
    ``exclude_self`` drops the qid==doc_id hit. Its default (``None``) means
    "exclude iff self-retrieval": with an INDEPENDENT query table the ids are
    unrelated, and filtering on id equality would silently drop a legitimate
    (possibly top-1) candidate that happens to share a number with the query.
    Pass ``exclude_self=True`` explicitly when ``queries`` is a subset of the
    corpus rows (same id = same document). Corpus statistics (df, idf, avgdl)
    come from ``docs`` alone — query-only terms score 0, like ``rank_bm25``.
    """
    if exclude_self is None:
        exclude_self = queries is None
    corpus = _tokens(docs, id_col, text_col, "doc_id")
    qtoks = _tokens(queries if queries is not None else docs, id_col, text_col, "qid")

    stats = F.broadcast(
        corpus.agg(
            F.count("*").alias("n_docs"), F.avg(F.size("t")).alias("avgdl")
        )
    )
    postings = (
        corpus.select("doc_id", F.size("t").alias("dl"), F.explode("t").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    if persisted is not None:
        # postings feed TWO consumers (document frequencies + the scoring
        # join): uncached, the token explode + tf aggregation — the operator's
        # widest shuffle — runs once per consumer (r6; same handle contract as
        # operators/lm_quality.py, caller releases)
        postings = postings.persist()
        persisted.append(postings)
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))
    idf_raw = dfreq.crossJoin(stats).select(
        "term",
        "df",
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias(
            "idf_raw"
        ),
    )
    avg_idf = F.broadcast(idf_raw.agg(F.avg("idf_raw").alias("avg_idf")))
    idf = idf_raw.crossJoin(avg_idf).select(
        "term",
        "df",
        F.when(F.col("idf_raw") >= 0, F.col("idf_raw"))
        .otherwise(epsilon * F.col("avg_idf"))
        .alias("idf"),
    )
    if df_cap is not None:
        idf = idf.where(F.col("df") <= df_cap)

    qterms = (
        qtoks.select("qid", F.explode("t").alias("term"))
        .groupBy("qid", "term")
        .agg(F.count("*").alias("q_mult"))
    )

    joined = qterms.join(idf, "term").join(postings, "term")
    if exclude_self:
        joined = joined.where(F.col("doc_id") != F.col("qid"))
    contrib = (
        F.col("q_mult")
        * F.col("idf")
        * F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        joined.crossJoin(stats.select("avgdl"))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("doc_id").alias("candidate_id"),
            "bm25",
            "rank",
        )
    )
