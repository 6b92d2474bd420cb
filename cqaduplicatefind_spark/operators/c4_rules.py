"""C4-style rule-based line/page cleaning (Raffel et al. 2020, §2.2).

The classic "Colossal Clean Crawled Corpus" heuristics sit between HTML
extraction and the dedup tiers: they drop *lines* that do not look like
prose (no terminal punctuation, too few words, javascript residue) and
*pages* that are code or filler (curly braces, "lorem ipsum") or have too
little sentence-like content after line cleaning. This is a different tier
from ``operators/linededup.py`` — that one removes lines because they recur
across documents (a corpus-frequency property needing a shuffle); this one
removes lines because of what they ARE (a per-row property needing none).

The reference has no line tier at all (its inputs are single-paragraph forum
questions, ``src/DataSetUtil.py:88-102``); this is a forward-path operator
for the Common-Crawl-shaped input (BASELINE.json ``input_hint``).

Scale shape: the whole operator is ONE Catalyst projection + filter —
``split``/``transform``/``filter``/``array_join`` over the line array and a
handful of string predicates, all inside whole-stage codegen. Zero
exchanges, zero Python, trivially partition-parallel: at 10^12 documents it
costs one scan. That is the point of expressing it as array lambdas instead
of an explode → filter → groupBy reassembly, which would shuffle every
surviving line's text.

Semantics (deterministic, oracle-restatable in ANSI-ish SQL — pinned by the
hash-matched ``c4_clean_docs`` driver row):

- a "line" is a ``\\n``-split segment, compared after trimming leading and
  trailing WHITESPACE (``\\s`` — spaces, tabs, and the ``\\r`` a CRLF page
  leaves on every line, which a space-only trim would let defeat the
  terminal-punctuation rule); kept lines are emitted trimmed, in original
  order, re-joined with ``\\n``;
- a line is kept iff (a) its last character is one of ``. ! ? "`` (the C4
  terminal-punctuation rule), (b) it has >= ``min_words_per_line``
  whitespace-delimited words, and (c) it does not contain ``javascript``
  case-insensitively;
- a page is dropped iff its ORIGINAL text contains ``{`` or ``}`` (code) or
  ``lorem ipsum`` case-insensitively (filler), or the CLEANED text has fewer
  than ``min_sentences`` sentence marks (count of ``. ! ?`` characters — a
  deterministic stand-in for C4's sentence tokenizer, which is not
  SQL-restatable);
- pages whose every line is dropped have zero sentence marks and therefore
  disappear whenever ``min_sentences >= 1``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TERMINAL_PUNCT_RE = '[.!?"]$'
SENTENCE_MARK_RE = "[^.!?]"


def _word_count(line: Column) -> Column:
    return F.size(F.filter(F.split(line, r"\s+"), lambda w: w != F.lit("")))


def c4_keep_line(line: Column, min_words_per_line: int = 3) -> Column:
    """C4 line predicate over a (trimmed) line column/lambda argument."""
    return (
        line.rlike(TERMINAL_PUNCT_RE)
        & (_word_count(line) >= F.lit(min_words_per_line))
        & ~F.contains(F.lower(line), F.lit("javascript"))
    )


def c4_page_stats(
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """Per-page audit columns: the cleaned text plus every gate's value.

    Returns ``(id, clean_text, n_lines, n_kept_lines, n_sentences,
    has_brace, has_lorem, keep)`` — one shuffle-free projection. ``keep``
    is exactly the predicate ``c4_clean`` filters on.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    trimmed = F.transform(
        lines, lambda x: F.regexp_replace(x, r"^\s+|\s+$", "")
    )
    kept = F.filter(
        trimmed, lambda x: c4_keep_line(x, min_words_per_line=min_words_per_line)
    )
    clean = F.array_join(kept, "\n")
    n_sent = F.length(F.regexp_replace(clean, SENTENCE_MARK_RE, ""))
    has_brace = F.contains(t, F.lit("{")) | F.contains(t, F.lit("}"))
    has_lorem = F.contains(F.lower(t), F.lit("lorem ipsum"))
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        (~has_brace & ~has_lorem & (n_sent >= F.lit(min_sentences))).alias("keep"),
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """The cleaned-corpus emit: ``(id, text)`` with non-prose lines removed
    and code/filler/low-content pages dropped (see module docstring for the
    exact rule set). Pure projection + filter — zero shuffles."""
    stats = c4_page_stats(
        docs,
        id_col=id_col,
        text_col=text_col,
        min_words_per_line=min_words_per_line,
        min_sentences=min_sentences,
    )
    return stats.where(F.col("keep")).select(
        F.col(id_col), F.col("clean_text").alias(text_col)
    )
