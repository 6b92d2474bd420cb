"""Reference-format sources/sinks: per-forum question dumps and labeled-pair CSVs.

The reference ingests CQADupStack JSON dumps with ``pd.read_json(path,
orient='index')`` — the whole file is ONE json object keyed by question id
(``/root/reference/src/JsonToCsvConverter.py:140-142``) — then promotes the index
to a ``QuestionID`` column (``:141``). Spark's line-oriented ``spark.read.json``
can't parse that shape directly; the Spark-first equivalent is whole-file text →
``from_json`` as ``map<string, struct<...>>`` → ``explode`` (one task per dump
file; per-forum dumps parallelize across files, and anything bigger than a
single-forum dump arrives sharded anyway).

Labeled pair tables round-trip through CSV with the reference's exact header
(``Q1ID, Q1, Q2ID, Q2, Dup`` — written at ``src/JsonToCsvConverter.py:156-160``,
read with an implicit schema at ``src/DataSetUtil.py:9-14``; we make the schema
explicit, never inferSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# struct schema for one question record; extra JSON fields are ignored by
# from_json, matching the reference's immediate projection (:142)
QUESTION_STRUCT = "struct<title: string, body: string, dups: array<string>>"

PAIR_CSV_SCHEMA = "Q1ID string, Q1 string, Q2ID string, Q2 string, Dup int"


def read_question_dumps(spark: SparkSession, path: str) -> DataFrame:
    """Per-forum question dumps -> (forum, question_id, title, body, dups).

    ``path`` may be a glob over many per-forum files; the forum name is the file
    stem (e.g. ``.../android.json`` -> 'android'), mirroring the reference's
    per-forum loop (src/JsonToCsvConverter.py:164-166). Questions with no
    ``dups`` field get an empty array (truthiness gate at ``:149`` maps to
    ``size(dups) > 0``).

    Error contract (changed in round 4, when the eager double-parse pre-check
    became the lazy in-plan guard below): a malformed dump no longer raises
    ``ValueError`` at ``read()`` listing every bad file — it surfaces as a
    Spark runtime error (``PySparkRuntimeError`` wrapping the in-plan
    ``raise_error``) at the FIRST action, naming the first bad file the
    executors hit. Callers that need the old read-time, all-files behavior
    should force an action (e.g. ``.limit(1).collect()``) in their own
    try/except; the repo's ValueError-only convention applies to driver-side
    validation (configs, codecs), not to distributed plan execution, where
    Spark's native error channel is the contract."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("_file"), F.col("value")
    )
    with_map = raw.select(
        "_file",
        F.from_json("value", f"map<string, {QUESTION_STRUCT}>").alias("_m"),
    )
    # fail loudly on malformed dumps: from_json returns NULL for invalid JSON
    # and explode(NULL) emits zero rows, so a truncated download would
    # otherwise silently erase the whole forum from the corpus (the
    # reference's pd.read_json raises — so do we). The guard is IN the plan
    # (raise_error on the NULL branch) rather than an eager collect: one JSON
    # parse per file total, and the reader stays lazy — an eager pre-check
    # would wholetext-parse every dump twice per call. Being lazy, the error
    # surfaces at the first action instead of at read() — the Spark-native
    # analog of pandas' read-time raise. (Catalyst collapses this projection
    # into the one below, leaving two textual from_json references; codegen's
    # subexpression elimination evaluates the parse once per row, and even in
    # the interpreted worst case the cost is bounded by the old eager path's
    # two full passes.)
    with_map = with_map.select(
        "_file",
        F.when(
            F.col("_m").isNull(),
            F.raise_error(
                F.concat(
                    F.lit("read_question_dumps: malformed JSON dump: "),
                    F.col("_file"),
                )
            ).cast(f"map<string, {QUESTION_STRUCT}>"),
        )
        .otherwise(F.col("_m"))
        .alias("_m"),
    )
    parsed = with_map.select(
        F.regexp_extract("_file", r"([^/]+?)(?:\.json)?$", 1).alias("forum"),
        F.explode("_m").alias("question_id", "q"),
    )
    return parsed.select(
        "forum",
        "question_id",
        F.col("q.title").alias("title"),
        F.col("q.body").alias("body"),
        F.coalesce(F.col("q.dups"), F.array().cast("array<string>")).alias("dups"),
    )


def write_pairs_csv(pairs: DataFrame, path: str) -> None:
    """Labeled pairs -> reference-format CSV (header Q1ID,Q1,Q2ID,Q2,Dup).
    Unlike the reference's racy shared-file append (src/archive/MyReader2.py:41-42)
    this is a parallel, atomic directory write."""
    pairs.select(
        F.col("q1_id").alias("Q1ID"),
        F.col("q1").alias("Q1"),
        F.col("q2_id").alias("Q2ID"),
        F.col("q2").alias("Q2"),
        F.col("dup").alias("Dup"),
    ).write.mode("overwrite").option("header", True).csv(path)


def read_pairs_csv(spark: SparkSession, path: str) -> DataFrame:
    """Reference-format pair CSV -> (q1_id, q1, q2_id, q2, dup); explicit schema,
    never inferSchema (SURVEY §1.3). ``multiLine``: forum question text
    routinely contains newlines, which ``write_pairs_csv`` emits as quoted
    multi-line records — the default line-oriented reader would split such a
    record mid-text into malformed rows."""
    return (
        spark.read.schema(PAIR_CSV_SCHEMA)
        .option("header", True)
        .option("multiLine", True)
        .csv(path)
        .select(
            F.col("Q1ID").alias("q1_id"),
            F.col("Q1").alias("q1"),
            F.col("Q2ID").alias("q2_id"),
            F.col("Q2").alias("q2"),
            F.col("Dup").alias("dup"),
        )
    )
