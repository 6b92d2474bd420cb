"""Exact n-gram Jaccard similarity pairs over a document table.

The set-exact analog of the MinHash estimate (SURVEY U3 — the reference's
token-set "leaks" features at ``/root/reference/src/lstm-siamese/inputHandler.py:
97-98`` are exactly this intersection count). Used as the deterministic candidate
generator for the oracle-checked retrieval-metrics and overlap-span queries.

Scale guard: the self-join on the gram key is quadratic in a gram's document
frequency — one ubiquitous 3-gram ("click here to") produces a quadratic group at
web scale. Grams with DF above ``df_cap`` are dropped from the WHOLE computation
(intersections AND sizes), i.e. Jaccard is computed over the non-ubiquitous gram
universe; ubiquitous grams carry no similarity signal (their IDF is ~0 — the same
reasoning BM25 encodes).

Exchange discipline (round 5): gram *text* never rides a shuffle. Grams are
hashed to 8-byte ``xxhash64`` inside the same codegen stage that explodes them,
so the DF-cap aggregation, the cap join, and the pair self-join all exchange
(id, int64) rows — the identical move the line-dedup, repetition, and top-ngram
tiers make (``operators/linededup.py:72``, ``operators/repetition.py``,
``operators/corpus_stats.py``). Collision caveat: two distinct grams hashing
together (~2^-64 per pair) would merge their DF counts / intersections — the
same accepted caveat those tiers document. The DuckDB oracle twins stay stated
on gram strings: the query outputs are pair-level counts only, identical under
any injective-on-the-data hashing, so the string oracle remains a valid (and
hash-function-independent) restatement. The DF cap itself is a map-side
combinable ``groupBy(gh).count()`` joined back on the 8-byte key — not a window
(a window's single exchange carries every row unsorted-combined; the groupBy
pre-aggregates map-side so only (gh, count) partials shuffle for the count leg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def doc_ngrams(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int | None = 1000,
) -> DataFrame:
    """(id, gh): distinct xxhash64 n-gram hashes per doc, DF-capped.

    Pure Catalyst: split → sliding slice → concat_ws → xxhash64 → explode all
    fuse into one whole-stage-codegen projection; the hash is taken BEFORE the
    ``distinct()`` exchange, so no gram string ever leaves its scan task.
    """
    d = docs.select(
        F.col(id_col).alias("id"), F.split(text_col, " ").alias("t")
    ).where(F.size("t") >= n)
    grams = d.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice("t", i + 1, n))),
            )
        ).alias("gh"),
    ).distinct()
    if df_cap is not None:
        dfreq = grams.groupBy("gh").agg(F.count("*").alias("_df"))
        grams = (
            grams.join(dfreq.where(F.col("_df") <= df_cap), "gh")
            .select("id", "gh")
        )
    return grams


def _pair_intersections(
    docs: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    df_cap: int | None,
    persisted: list | None = None,
) -> DataFrame:
    """Shared pair kernel for the set-similarity queries: canonical pairs
    (id_a < id_b) sharing >= 1 DF-capped gram, with the intersection count
    ``c`` and both sides' capped-gram-set sizes ``na``/``nb``. The DF-capped
    gram self-join is the one skew-guarded shuffle, and it joins on the 8-byte
    ``gh`` hash — gram text never shuffles. Both the symmetric (Jaccard) and
    directed (containment) queries are per-pair arithmetic over this frame — a
    fix to the skew guard or pair canonicalization lands in both
    automatically.

    ``persisted``: optional handle list (same contract as
    ``operators/lm_quality.py``). When given, the capped gram frame is
    persisted — it feeds THREE consumers (per-doc sizes, both self-join
    sides), so without a cache each consumer re-explodes and re-caps; AQE
    reuses the identical exchanges at runtime either way, but the cache also
    collapses the three SMJ sort recomputes. Caller releases via the handle.
    """
    grams = doc_ngrams(docs, n, id_col, text_col, df_cap)
    if persisted is not None:
        grams = grams.persist()
        persisted.append(grams)
    sizes = grams.groupBy("id").agg(F.count("*").alias("n"))
    a = grams.select(F.col("id").alias("id_a"), "gh")
    b = grams.select(F.col("id").alias("id_b"), "gh")
    inter = (
        a.join(b, "gh")
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
    persisted: list | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with exact n-gram Jaccard >= min_jaccard,
    computed over the DF-capped gram universe."""
    both = _pair_intersections(docs, n, id_col, text_col, df_cap, persisted)
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
    persisted: list | None = None,
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
    both = _pair_intersections(docs, n, id_col, text_col, df_cap, persisted)

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
