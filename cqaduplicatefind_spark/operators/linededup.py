"""Line-level boilerplate removal — the web pipeline's third dedup tier.

A crawl corpus carries three kinds of duplication: whole-page re-captures
(URL tier, ``functions/urls.py``), near-duplicate pages (MinHash/SimHash/span
tiers, ``plans/pipeline.py``), and *repeated lines inside otherwise-distinct
pages* — navigation bars, cookie banners, copyright footers — which no page-
level tier touches because each hosting page is unique. CCNet and
RefinedWeb-style pipelines remove a line when it recurs across enough
documents; this module is that operator, Spark-first.

The reference has no line tier (its inputs are single-paragraph forum
questions, ``src/DataSetUtil.py:88-102`` strips HTML but never splits lines);
this is a forward-path operator for the Common-Crawl-shaped input
(BASELINE.json ``input_hint``).

Scale shape (the part that matters at 10^12 docs):

- the frequency pass never ships line text through its exchange: lines are
  per-doc deduplicated map-side (``array_distinct`` inside the row, no
  shuffle), and both the document id and the line are hashed to 8 bytes
  (``xxhash64``) before the exchange — a distinct over (doc_hash, line_hash)
  16-byte rows (hash aggregate, map-side combined) collapses repeated
  captures of the same document, then a second, much smaller map-side-combined
  count per line_hash yields document frequency;
- the boilerplate set (lines with document frequency >= ``min_doc_freq``) is
  bounded by total_line_occurrences / min_doc_freq, tiny in practice; it is
  broadcast when a cheap count says it fits (same count-gated pattern as the
  span pass's heterogeneous-bucket semi-join), with a shuffle anti-join
  fallback so an adversarial corpus cannot blow up the driver;
- removal + reassembly is ONE exchange of the exploded lines (the anti-join
  is broadcast in the common case, and the groupBy that re-assembles each
  page is the only shuffle that moves text) — there is no per-row Python
  anywhere, the whole operator is Catalyst expressions.

Semantics (deterministic, oracle-restatable in ANSI SQL):

- a "line" is a ``\\n``-split segment, compared byte-exactly (no trimming);
- empty lines are never boilerplate (they carry no content and would
  otherwise always cross the frequency threshold) and are preserved;
- a line is boilerplate when it appears in >= ``min_doc_freq`` DISTINCT
  documents (within-doc repeats count once, and multiple capture rows of the
  same document id count once — crawl input arrives multi-captured, so row
  frequency would silently misclassify a much-recaptured page's unique
  content as boilerplate);
- documents whose every line is boilerplate disappear from the output — they
  had no original content; a NULL-text document is treated as the empty
  document (it survives removal with ``''`` text rather than vanishing);
- hash caveat: removal matches lines by ``xxhash64`` (and distinct-document
  counting matches documents by ``xxhash64`` of the id), so a 64-bit
  collision could remove a non-boilerplate line or under-count a document —
  ~2^-64 per distinct value, the same documented class as the rolling-hash
  span verify;
- ``remove_boilerplate_lines`` expects ONE ROW PER DOCUMENT ID (its
  reassembly groups by id, so duplicate captures would interleave into one
  garbled page) — run the URL tier's latest-capture collapse first;
  ``line_doc_freq``/``boilerplate_lines`` are safe on multi-capture input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# above this many boilerplate lines, anti-join by shuffle instead of
# broadcast (8-byte hashes: 1M rows ~ 8 MB broadcast, comfortably small)
BROADCAST_MAX_BOILER = 1_000_000


def _split_lines(text: Column) -> Column:
    return F.split(text, "\n")


def line_doc_freq(
    docs: DataFrame, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Document frequency per distinct non-empty line: ``(line_hash, n_docs)``
    where ``n_docs`` counts DISTINCT document ids (multi-capture safe).

    Per-doc distinct happens inside the row (``array_distinct`` — map-side,
    no shuffle); the dominant exchange is a distinct over 16-byte
    (doc_hash, line_hash) rows (hash aggregate, map-side combined — this is
    what makes repeated captures of one document count once), and the
    document-frequency count that follows exchanges only one row per distinct
    line hash per partition.
    """
    per_doc = docs.select(
        F.xxhash64(F.col(id_col)).alias("_dh"),
        F.explode(
            F.array_distinct(
                F.filter(_split_lines(F.col(text_col)), lambda x: x != F.lit(""))
            )
        ).alias("line"),
    )
    return (
        per_doc.select("_dh", F.xxhash64("line").alias("line_hash"))
        .distinct()
        .groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def boilerplate_lines(
    docs: DataFrame,
    min_doc_freq: int,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """``(line_hash, n_docs)`` for lines in >= ``min_doc_freq`` distinct docs."""
    return line_doc_freq(docs, id_col, text_col).where(
        F.col("n_docs") >= F.lit(min_doc_freq)
    )


def dedup_lines_within_doc(
    docs: DataFrame, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """RefinedWeb-style exact *intra*-document line dedup: within each page,
    keep the FIRST occurrence of every repeated line and drop later repeats
    (within-page nav blocks, re-pasted paragraphs, chat-log echoes). The
    within-row complement to ``remove_boilerplate_lines`` (which needs a line
    to recur across >= K *distinct* documents): a line repeated ten times in
    ONE page and nowhere else never crosses the cross-document threshold, and
    `repetition.py` only *scores* that duplication — this emits the cleaned
    text. Returns ``(id, text, n_lines_removed)`` for every input row.

    Semantics (oracle-restatable, mirrored in DuckDB lambda dialect):

    - a "line" is a ``\\n``-split segment, compared byte-exactly (a CRLF
      page's ``foo\\r`` and a bare ``foo`` are distinct lines — both engines
      agree);
    - whitespace-only lines (``trim(x) == ''``) are ALWAYS preserved: they
      are paragraph structure, not repeated content, and deduplicating them
      would glue every paragraph after the first blank line together;
    - NULL text is the empty document (survives with ``''``, 0 removed);
    - line order is preserved.

    Scale shape: the whole operator is ONE whole-stage-codegen projection —
    zero exchanges, zero Python, a map over the scan at 10^12 docs (the
    "would this survive 100x" answer is: trivially, it's embarrassingly
    parallel). The in-row comparison is O(L^2) in a page's line count
    (each line scans its predecessors via ``array_position`` over a
    ``slice``); at typical web-page line counts (tens to a few hundred)
    that is thousands of pointer equality checks per row, far cheaper than
    shipping the corpus through the posexplode + window + re-assembly
    shuffle that an O(L log L) formulation would cost. A corpus of
    pathological million-line documents should be routed through the
    exploded/window variant instead (the ``remove_boilerplate_lines``
    reassembly pattern)."""
    # temp columns, not inline sibling expressions: the output text is
    # re-aliased as ``text_col``, and Spark's lateral-column-alias resolution
    # would bind a sibling expression's ``F.col(text_col)`` to the CLEANED
    # text instead of the input column (measured: n_lines_removed doubled)
    lines = _split_lines(F.coalesce(F.col(text_col), F.lit("")))
    kept = F.filter(
        F.col("_lines"),
        lambda x, i: (F.trim(x) == "")
        | (F.array_position(F.slice(F.col("_lines"), F.lit(1), i), x) == F.lit(0)),
    )
    return (
        docs.withColumn("_lines", lines)
        .withColumn("_kept", kept)
        .select(
            F.col(id_col),
            F.array_join("_kept", "\n").alias(text_col),
            (F.size("_lines") - F.size("_kept")).alias("n_lines_removed"),
        )
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_doc_freq: int,
    id_col: str = "url",
    text_col: str = "text",
    persisted: list | None = None,
) -> DataFrame:
    """Strip boilerplate lines from every document; returns ``(id, text)``
    with line order preserved and all-boilerplate documents dropped.
    Expects one row per ``id_col`` (see module docstring).

    One frequency pass over hashed lines, one (usually broadcast) anti-join,
    one reassembly exchange — the only shuffle that moves page text. The tiny
    boilerplate set is persisted before the broadcast-gate count so the
    corpus-wide frequency job runs ONCE, not once for the count and again for
    the join; pass ``persisted`` (a list) to receive the cached frame for
    ``unpersist()`` once the output is materialized (left cached otherwise —
    it is one 8-byte column of boilerplate hashes).
    """
    boiler = (
        boilerplate_lines(docs, min_doc_freq, id_col, text_col)
        .select(F.col("line_hash").alias("_blh"))
        .persist()
    )
    if persisted is not None:
        persisted.append(boiler)
    # count-gated broadcast, shuffle fallback (adversarial corpora can make
    # the boilerplate set large; the driver must never be the bottleneck).
    # The count doubles as the persist materialization.
    n_boiler = boiler.count()
    if n_boiler <= BROADCAST_MAX_BOILER:
        boiler = F.broadcast(boiler)

    # NULL text splits to NULL and posexplode would silently DROP the row —
    # beyond the documented all-boilerplate drop; treat NULL as the empty
    # document instead (split('') = [''], one empty line, never boilerplate),
    # so the row survives with '' text like any other content-free page
    exploded = docs.select(
        F.col(id_col),
        F.posexplode(
            _split_lines(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "line"),
    )
    kept = exploded.join(
        boiler, F.xxhash64(F.col("line")) == F.col("_blh"), "left_anti"
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias(text_col)
    )
