"""Custom stateful streaming operators (``applyInPandasWithState``) and
late-data-tolerant windowed aggregation (watermarks) — the two Structured
Streaming surfaces the incremental matcher (``streaming/incremental.py``,
foreachBatch) does not exercise.

- ``first_seen_stream``: exact-dedup as a STATEFUL STREAM — per content key,
  emit only the first-arriving row across the whole stream; every later
  duplicate (same micro-batch, later micro-batch, any interleaving) is
  suppressed by per-key state in Spark's state store. This is the streaming
  form of the exact-dedup tier (``exact_dedup_hash_groups``): on an unbounded
  crawl, "keep the first capture of each byte-identical page" cannot buffer
  the corpus — per-key state is the scale-correct shape (state size = one
  flag per distinct key, partitioned by the state store, never the stream).
  Capability analog of the reference's incremental partial-progress builder
  (/root/reference/src/archive/MyReader2.py:16,41-42) for the exact tier.

- ``windowed_doc_counts``: event-time tumbling-window counts with a watermark;
  rows arriving later than the watermark allows are dropped and finalized
  windows are emitted exactly once in append mode — the standard late-data
  contract for crawl-time monitoring aggregations.

Both operators are plain declarative Structured Streaming: the planner handles
state partitioning (hash on the group key) and recovery from the checkpoint;
nothing here collects to the driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def first_seen_stream(
    stream_df: DataFrame,
    key_col: str = "content_key",
    order_col: str = "url",
    out_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """streaming df -> rows whose ``key_col`` is seen for the FIRST time across
    the stream. Deterministic within a micro-batch: among a batch's rows for a
    new key, the min-``order_col`` row is emitted, with ties broken by the
    remaining output columns (an unstable single-column sort would otherwise
    pick an arbitrary row among equal-``order_col`` captures, varying across
    reruns with Arrow chunking and input partitioning). State per key is a single
    flag (``seen int``) — the smallest possible state footprint; no timeout, so
    a key stays deduplicated for the stream's lifetime (bound it with a TTL
    timeout if the key space is unbounded and staleness is acceptable).

    The grouping hash-partitions the stream by key, so duplicates of one key
    always meet the same state-store partition — correctness is independent of
    micro-batch boundaries and input partitioning.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if out_cols is None:
        out_cols = (order_col, key_col)
    fields = dict(stream_df.dtypes)
    out_schema = ", ".join(f"{c} {fields[c]}" for c in out_cols)
    cols = list(out_cols)

    # total order: order_col first, then every other emitted column — makes
    # the picked row a function of the batch's row MULTISET, independent of
    # chunk order
    sort_keys = [order_col] + [c for c in cols if c != order_col]

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        if state.exists:
            return  # duplicate key: suppress the whole group, touch nothing
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            cand = pdf.sort_values(sort_keys, kind="stable").head(1)
            best = (
                cand
                if best is None
                else pd.concat([best, cand]).sort_values(
                    sort_keys, kind="stable"
                ).head(1)
            )
        state.update((1,))
        if best is not None:
            yield best[cols]

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, "seen int", "append", GroupStateTimeout.NoTimeout
    )


def windowed_doc_counts(
    stream_df: DataFrame,
    ts_col: str = "warc_ts",
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Event-time tumbling-window document counts with late-data handling:
    rows older than ``max(event time seen) - watermark_delay`` are dropped, and
    in append mode a window row is emitted exactly once, when the watermark
    passes its end. Pure declarative streaming aggregation — partial aggregates
    combine map-side and the only exchange is on (window, extra_keys)."""
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), *extra_keys)
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *extra_keys,
            "n_docs",
        )
    )
