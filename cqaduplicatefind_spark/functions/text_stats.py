"""Text-analysis operators for a training-data pipeline: language ID, quality
scoring, token counting, document fingerprinting.

Everything here is pure Catalyst expressions (whole-stage codegen, zero Python) —
these run per-document over 10^12 rows, so they must stay JVM-side. Each has a
SQL-oracle-checkable form surfaced in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Compact per-language marker sets (top high-frequency function words that are
# strongly language-specific). An n-gram model would use mapInPandas; for a
# pipeline gate this word-marker heuristic is the standard cheap first pass.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "que", "pour", "qui"),
    "es": ("el", "los", "las", "una", "es", "que", "por", "con", "para", "del"),
}


def tokens(col) -> Column:
    """Whitespace tokens (``\\s+`` boundaries, Python ``str.split()``
    semantics), edge empties dropped — a single-space split would glue tokens
    across tabs/newlines, contradicting this docstring."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def token_count(col) -> Column:
    """Whitespace token count; empty or whitespace-only string -> 0."""
    return F.size(tokens(col))


def word_token_count(col) -> Column:
    """BPE-ish subword proxy: count word chunks + digit runs + punctuation marks
    separately (regexp-based; a real BPE table would be a broadcast join)."""
    return F.regexp_count(col, F.lit(r"[\p{L}]+|[0-9]+|[^\p{L}0-9\s]"))


def distinct_tokens_expr(text_col) -> Column:
    """Distinct lowercase whitespace tokens — project this ONCE and feed
    ``lang_id_from_tokens``: inlining it per language makes Catalyst evaluate the
    split+distinct four times (it was the slowest scalar query in the bench)."""
    return F.array_distinct(F.split(F.lower(text_col), r"\s+"))


def lang_id_from_tokens(toks_col) -> Column:
    """Language with the highest marker-word hit count over a pre-computed
    distinct-token array; 'und' (undetermined) when nothing matches."""
    scores = [
        (
            lang,
            F.size(
                F.array_intersect(toks_col, F.array(*[F.lit(w) for w in markers]))
            ),
        )
        for lang, markers in LANG_MARKERS.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    pick = F.lit("und")
    # deterministic priority order on ties: en > de > fr > es (reversed fold)
    for lang, s in reversed(scores):
        pick = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(pick)
    return pick


def lang_id_expr(text_col) -> Column:
    """Single-expression heuristic language ID (compatibility form). Prefer
    projecting ``distinct_tokens_expr`` first and applying ``lang_id_from_tokens``
    so the token array is computed once per row."""
    return lang_id_from_tokens(distinct_tokens_expr(text_col))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard web-text quality gates (Gopher/C4-style rule features):
    token count, mean word length, alpha ratio, punctuation density, uppercase
    ratio, repetition proxy (distinct/total tokens)."""
    t = F.col(text_col)
    # drop the empty tokens a \s+ split leaves at the text's edges: web text
    # routinely ends with a newline, and counting the '' token would inflate
    # q_n_tokens, deflate q_mean_word_len, and admit '' as a distinct token —
    # skewing exactly the threshold gates these features feed
    toks = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    n_tok = F.size(toks)
    n_chars = F.length(t)
    return df.withColumns(
        {
            "q_n_tokens": n_tok,
            "q_mean_word_len": F.when(
                n_tok > 0, (n_chars - (n_tok - 1)).cast("double") / n_tok
            ).otherwise(F.lit(0.0)),
            "q_alpha_ratio": F.when(
                n_chars > 0,
                F.length(F.regexp_replace(t, r"[^\p{L}]", "")).cast("double") / n_chars,
            ).otherwise(F.lit(0.0)),
            "q_punct_ratio": F.when(
                n_chars > 0,
                F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double") / n_chars,
            ).otherwise(F.lit(0.0)),
            "q_upper_ratio": F.when(
                n_chars > 0,
                F.length(F.regexp_replace(t, r"[^A-Z]", "")).cast("double") / n_chars,
            ).otherwise(F.lit(0.0)),
            "q_distinct_token_ratio": F.when(
                n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok
            ).otherwise(F.lit(0.0)),
        }
    )


def fingerprint_expr(text_col, prefix_tokens: int = 8) -> Column:
    """Cheap stable document fingerprint: md5 of the first-k-token prefix.
    For full-content identity use ``F.md5(text)`` (exact dedup); this prefix form
    groups near-identical heads (title boilerplate detection)."""
    return F.md5(F.concat_ws(" ", F.slice(F.split(text_col, " "), 1, prefix_tokens)))


def content_hash_expr(text_col) -> Column:
    """Exact-dup content hash (hash-groupBy dedup key)."""
    return F.md5(text_col)
