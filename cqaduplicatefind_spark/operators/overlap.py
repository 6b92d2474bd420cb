"""Exact overlapping-span pass over candidate pairs.

The north_star's "suffix-array substring pass for exact overlapping spans": for each
candidate pair, the length (in tokens) of the longest exactly-shared contiguous token
run. Catches substring containment (one page embedded in another's boilerplate
shell) that set-based Jaccard underestimates — the capability analog of the
reference's exact token-overlap "leaks" features
(``/root/reference/src/lstm-siamese/inputHandler.py:97-98``).

Implementation note (Spark-first): a classical suffix array per concatenated pair
would be per-pair O(n log n) Python; instead we binary-search the span length with
vectorized rolling window hashes (the same order-sensitive k-window hash kernel the
shingler uses — numpy, no per-token Python). Equivalent answer (window-hash
collisions are ~2^-64), ~10x less constant cost, and every batch stays Arrow-sized.
This is the documented fallback in SURVEY.md §7.3 chosen as primary for scale.

Dataflow: pairs join normalized docs on each side (two id-key shuffles — same shape
as verify), then ``applyInPandas``-free ``mapInPandas`` computes spans per Arrow
batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from cqaduplicatefind_spark.functions.hashing import TokenHasher, shingle_hashes


def longest_common_span(a: np.ndarray, b: np.ndarray) -> int:
    """Longest L with an exactly-equal contiguous L-token window in both arrays.
    Binary search over L; window membership via vectorized rolling hashes."""
    lo, hi = 0, min(len(a), len(b))
    if hi == 0:
        return 0

    def has_common(L: int) -> bool:
        ha = shingle_hashes(a, L) if len(a) >= L else np.empty(0, np.uint64)
        hb = shingle_hashes(b, L) if len(b) >= L else np.empty(0, np.uint64)
        if len(ha) == 0 or len(hb) == 0:
            return False
        return bool(np.intersect1d(ha, hb, assume_unique=False).size)

    while lo < hi:
        mid = (lo + hi + 1) // 2
        if has_common(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def overlap_spans(
    pairs: DataFrame,
    normalized: DataFrame,
    id_col: str = "url",
    text_col: str = "norm_text",
    hash_seed: int = 42,
) -> DataFrame:
    """(id_a, id_b) + docs(url, norm_text) -> (id_a, id_b, overlap_span).

    ``overlap_span`` = longest exactly-shared token run (0 when either side empty).
    """
    a = normalized.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("_text_a")
    )
    b = normalized.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("_text_b")
    )
    joined = pairs.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", "_text_a", "_text_b"
    )

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hasher = TokenHasher(hash_seed)
        for pdf in it:
            spans = []
            for ta, tb in zip(pdf["_text_a"], pdf["_text_b"]):
                va = hasher.hash_tokens(ta.split(" ")) if ta else np.empty(0, np.uint64)
                vb = hasher.hash_tokens(tb.split(" ")) if tb else np.empty(0, np.uint64)
                spans.append(longest_common_span(va, vb))
            yield pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "overlap_span": spans}
            )

    return joined.mapInPandas(
        compute, "id_a string, id_b string, overlap_span int"
    )


def containment_edges(
    scored: DataFrame,
    normalized: DataFrame,
    min_span: int,
    containment_floor: float = 0.5,
) -> DataFrame:
    """Containment-suspect pairs (moderate containment but sub-threshold Jaccard)
    verified by exact span: an edge iff the shared contiguous run >= min_span.
    Runs on the small residue the main threshold already rejected — cheap."""
    suspects = scored.where(
        (F.col("containment") >= containment_floor)
    ).select("id_a", "id_b")
    spans = overlap_spans(suspects, normalized)
    return spans.where(F.col("overlap_span") >= min_span)
