"""Exact n-gram Jaccard similarity pairs over a document table.

The set-exact analog of the MinHash estimate (SURVEY U3 — the reference's
token-set "leaks" features at ``/root/reference/src/lstm-siamese/inputHandler.py:
97-98`` are exactly this intersection count). Used as the deterministic candidate
generator for the oracle-checked retrieval-metrics and overlap-span queries.

Scale guard: the self-join on the raw gram key is quadratic in a gram's document
frequency — one ubiquitous 3-gram ("click here to") produces a quadratic group at
web scale. Grams with DF above ``df_cap`` are dropped from the WHOLE computation
(intersections AND sizes), i.e. Jaccard is computed over the non-ubiquitous gram
universe; ubiquitous grams carry no similarity signal (their IDF is ~0 — the same
reasoning BM25 encodes). The cap is a window count over the gram key: one
exchange, reused by the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def doc_ngrams(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int | None = 1000,
) -> DataFrame:
    """(id, g): distinct n-gram strings per doc, DF-capped. Pure Catalyst."""
    d = docs.select(
        F.col(id_col).alias("id"), F.split(text_col, " ").alias("t")
    ).where(F.size("t") >= n)
    grams = d.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.concat_ws(" ", F.slice("t", i + 1, n)),
            )
        ).alias("g"),
    ).distinct()
    if df_cap is not None:
        w = Window.partitionBy("g")
        grams = (
            grams.withColumn("_df", F.count("*").over(w))
            .where(F.col("_df") <= df_cap)
            .drop("_df")
        )
    return grams


def _pair_intersections(
    docs: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    df_cap: int | None,
) -> DataFrame:
    """Shared pair kernel for the set-similarity queries: canonical pairs
    (id_a < id_b) sharing >= 1 DF-capped gram, with the intersection count
    ``c`` and both sides' capped-gram-set sizes ``na``/``nb``. The DF-capped
    gram self-join is the one skew-guarded shuffle; both the symmetric
    (Jaccard) and directed (containment) queries are per-pair arithmetic over
    this frame — a fix to the skew guard or pair canonicalization lands in
    both automatically."""
    grams = doc_ngrams(docs, n, id_col, text_col, df_cap)
    sizes = grams.groupBy("id").agg(F.count("*").alias("n"))
    a = grams.select(F.col("id").alias("id_a"), "g")
    b = grams.select(F.col("id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    return inter.join(
        sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a"
    ).join(
        sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b"
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    min_jaccard: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with exact n-gram Jaccard >= min_jaccard,
    computed over the DF-capped gram universe."""
    both = _pair_intersections(docs, n, id_col, text_col, df_cap)
    j = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return both.where(j >= min_jaccard).select(
        "id_a", "id_b", F.round(j, 6).alias("jaccard")
    )


def ngram_containment_pairs(
    docs: DataFrame,
    n: int = 3,
    min_containment: float = 0.9,
    min_grams: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int | None = 1000,
) -> DataFrame:
    """(inner_id, outer_id, containment): DIRECTED near-subset pairs where
    ``containment = |inner ∩ outer| / |inner| >= min_containment`` over the
    DF-capped distinct-gram universe.

    The asymmetric complement of :func:`ngram_jaccard_pairs`: a page whose
    content is another page wrapped in boilerplate has high containment but
    low Jaccard when the outer page is much larger, so symmetric dedup misses
    it (the same blind spot the pipeline's winnowing span pass exists for —
    this is the exact set-level query form of that capability, with a SQL
    oracle). ``min_grams`` floors the inner doc's capped-gram count: tiny
    gram sets are trivially contained and carry no signal. Same skew story as
    the Jaccard query — the shared ``_pair_intersections`` kernel DF-caps the
    gram self-join, everything here is per-pair arithmetic."""
    both = _pair_intersections(docs, n, id_col, text_col, df_cap)

    def directed(inner_id, outer_id, inner_n):
        cont = F.col("c") / F.col(inner_n)
        return both.where(
            (F.col(inner_n) >= min_grams) & (cont >= min_containment)
        ).select(
            F.col(inner_id).alias("inner_id"),
            F.col(outer_id).alias("outer_id"),
            F.round(cont, 6).alias("containment"),
        )

    return directed("id_a", "id_b", "na").unionByName(
        directed("id_b", "id_a", "nb")
    )
