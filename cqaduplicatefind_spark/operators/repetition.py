"""Intra-document repetition filters — Gopher/MassiveText-style quality
signals (Rae et al. 2021, "Scaling Language Models", §A1.1) computed per
document, the fourth angle on duplication in a web corpus: whole-page
recaptures (URL tier), near-duplicate pages (MinHash/SimHash/span tiers),
cross-document repeated lines (line tier), and — here — text that repeats
WITHIN one page (looping boilerplate, scraped templates, generation
degeneracies). Pipelines drop documents whose repetition fractions exceed
thresholds before training.

The reference has no repetition layer (single-paragraph forum questions,
``src/DataSetUtil.py``); this is a forward-path operator for the
Common-Crawl-shaped input (BASELINE.json ``input_hint``).

Semantics (deterministic, oracle-restatable in ANSI SQL; tokens are the
single-space splits the rest of the engine uses, ``functions/text_stats``):

- ``dup_line_frac``: 1 − (distinct non-empty lines / non-empty lines); 0 for
  documents with no non-empty line. Within-row expression, no shuffle.
- ``top_ngram_frac`` (default n=2): occurrences of the MOST FREQUENT n-gram
  × n / token count; 0 when the document has fewer than n tokens.
- ``dup_ngram_frac`` (default n=5): tokens covered by n-grams occurring ≥ 2
  times, counted WITH overlap — Σ count(g) × n over duplicated grams / token
  count — capped at 1.0 (overlapping duplicated grams can cover more token
  slots than the document has; the cap keeps the signal a fraction). This is
  the simple overlap-counting variant of Gopher's "fraction of characters in
  duplicated n-grams"; the exact-coverage variant needs interval union per
  document and buys little as a filter signal.

Scale shape: the line fraction is pure Catalyst projection (free at 10^12
rows). Each n-gram statistic is ONE explode + two map-side-combined hash
aggregates — the exchange carries (id, 8-byte xxhash64(gram), partial count)
rows, never gram text (same slim-exchange discipline as the line tier;
~2^-64 per-gram collision caveat, same documented class). No window, no
per-row Python, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _ngrams(toks: Column, n: int) -> Column:
    """Array of n-grams (space-joined) from a token array; empty when the
    document has fewer than n tokens."""
    if n < 1:
        raise ValueError("n must be >= 1")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n, F.transform(idx, gram)
    ).otherwise(F.array().cast("array<string>"))


def dup_line_frac_expr(text_col: str) -> Column:
    """1 − distinct/total over non-empty lines; 0 when no non-empty line
    (including NULL text, where the split itself is NULL — the outer coalesce
    keeps the documented every-row-defined contract)."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: x != F.lit("")
    )
    n = F.size(lines)
    return F.coalesce(
        F.when(n == 0, F.lit(0.0)).otherwise(
            1.0 - F.size(F.array_distinct(lines)) / n
        ),
        F.lit(0.0),
    )


def _gram_stat(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    out_col: str,
    mode: str,
) -> DataFrame:
    """(id, out_col) for one n-gram statistic; ``mode`` is ``top`` (most
    frequent gram's token coverage) or ``dup`` (all duplicated grams' token
    coverage, capped at 1)."""
    toks = F.split(F.col(text_col), " ")
    exploded = docs.select(
        F.col(id_col),
        F.size(toks).alias("_nt"),
        F.explode(_ngrams(toks, n)).alias("_g"),
    )
    per_gram = (
        exploded.groupBy(id_col, F.xxhash64("_g").alias("_gh"))
        # max, not first: constant within a group under the one-row-per-id
        # precondition, and still deterministic if that precondition is broken
        .agg(F.max("_nt").alias("_nt"), F.count(F.lit(1)).alias("_c"))
    )
    if mode == "top":
        # capped at 1 like dup mode: overlapping repeats ("a a a a", top gram
        # "a a" occurring 3x in 4 tokens) would otherwise push the "fraction"
        # past 1.0 and break callers normalizing on [0, 1]
        frac = F.least(F.lit(1.0), F.max("_c") * n / F.first("_nt"))
    elif mode == "dup":
        frac = F.least(
            F.lit(1.0),
            F.sum(F.when(F.col("_c") >= 2, F.col("_c")).otherwise(0))
            * n / F.first("_nt"),
        )
    else:  # pragma: no cover - caller bug
        raise ValueError(mode)
    return per_gram.groupBy(id_col).agg(frac.cast("double").alias(out_col))


def repetition_features(
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
    signals: tuple = ("line", "top", "dup"),
) -> DataFrame:
    """``(id, <requested fraction columns>)`` per document — the Gopher-style
    intra-document repetition signals (module docstring). ``signals`` selects
    which to compute (``line``/``top``/``dup``): a caller thresholding on one
    signal should not pay the others' corpus-wide gram explodes and shuffles.
    Documents too short to form grams report 0 fractions; every input row
    appears in the output exactly once.

    Expects ONE ROW PER ``id_col`` (same precondition as
    ``linededup.remove_boilerplate_lines``): the gram aggregates group by id,
    so multi-capture input would merge gram counts ACROSS captures (inflating
    the duplication fractions) and fan out the assembly joins — run the URL
    tier's latest-capture collapse first."""
    unknown = set(signals) - {"line", "top", "dup"}
    if unknown or not signals:
        raise ValueError(f"repetition_features: bad signals {signals!r}")
    line_expr = (
        [dup_line_frac_expr(text_col).cast("double").alias("dup_line_frac")]
        if "line" in signals
        else []
    )
    out = docs.select(F.col(id_col), *line_expr)
    cols = (["dup_line_frac"] if "line" in signals else [])
    if "top" in signals:
        out = out.join(
            _gram_stat(docs, id_col, text_col, top_n, "top_ngram_frac", "top"),
            id_col, "left",
        )
        cols.append("top_ngram_frac")
    if "dup" in signals:
        out = out.join(
            _gram_stat(docs, id_col, text_col, dup_n, "dup_ngram_frac", "dup"),
            id_col, "left",
        )
        cols.append("dup_ngram_frac")
    return out.select(
        id_col,
        *[
            F.coalesce(c, F.lit(0.0)).alias(c) if c != "dup_line_frac" else F.col(c)
            for c in cols
        ],
    )
