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
  band collides at huge multiplicity) would emit O(m^2) pairs; groups larger than
  ``cfg.max_band_group`` are bounded two ways, both O(m):
    (a) **star edges** (member -> group-min id): a connectivity backbone. Star edges
        preserve the RAW candidate graph's components, but downstream exact-verify
        can reject a (min, member) edge while the (member, member) pair it replaced
        would have passed — so stars alone are not recall-safe in heterogeneous hot
        buckets (a template family containing several distinct dup-clusters).
    (b) **salted sub-buckets**: members are re-keyed by
        ``xxhash64(id, bucket-key) % ceil(n / max_group)`` into sub-groups of
        expected size ``max_group`` and fully paired within each — per-member
        pairing cost in a hot bucket equals the cost members of an ordinary
        ``max_group``-sized bucket already pay. The salt includes the bucket key,
        so a true dup pair gets an INDEPENDENT 1/n_sub co-location draw in every
        band it collides in, on top of its (usually non-hot) content-specific
        bands. ``cfg.salt_buckets`` caps an unlucky/adversarial sub-group at
        ``salt_buckets * max_group`` members (beyond that: stars only).
  AQE skew-join handles residual block-level skew; group-size accounting is an
  explicit aggregation, not a sample.
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
    carry_cols: tuple[str, ...] = (),
    pair_filter=None,
    salt_cap: int = 8,
    salt_seed: int = 17,
) -> DataFrame:
    """(id, bucket-key..., carry...) -> candidate edges (id_a, id_b), skew-capped.

    Groups with <= max_group members emit all C(m,2) pairs via a self-equi-join.
    Hot groups (> max_group) emit (a) m-1 star edges to the group minimum (O(m)
    connectivity backbone) and (b) full pairs within salted sub-buckets of
    expected size max_group (so member-member true-dup pairs survive a later
    exact-verify that may reject their star edges; see module docstring).
    ``salt_cap`` bounds an unlucky sub-bucket at salt_cap*max_group members
    (0 disables sub-bucket pairing entirely).

    ``carry_cols`` ride to both pair sides as ``<col>_a``/``<col>_b`` (star edges
    carry the group-min's values via a struct-min window); ``pair_filter`` is
    applied to every emitted pair WITH the carried columns — e.g. the SimHash
    Hamming gate — before canonicalization.

    Plan shape: small-bucket pairing and hot-bucket sub-bucket pairing are ONE
    self-join on (bucket key, _salt) — small buckets get the constant salt -1, hot
    members get ``xxhash64(id, bucket key) % n_sub`` — so the whole treatment is
    one pairing join + a star projection. Both window passes and the join
    partition by (a refinement of) the bucket key, so Catalyst satisfies them
    with a SINGLE exchange (asserted by the plan shuffle-budget test).
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    carry = list(carry_cols)
    out_cols = ["id_a", "id_b"] + [f"{c}_{s}" for c in carry for s in ("a", "b")]

    b = buckets.select(F.col(id_col).alias("id"), *keys, *carry)
    w = Window.partitionBy(*keys)
    annotated = (
        b.withColumn("_n", F.count("*").over(w))
        # struct-min ordered by id first: the group-min id AND its carried columns
        .withColumn("_mn", F.min(F.struct(F.col("id"), *carry)).over(w))
        .where(F.col("_n") >= 2)  # singleton buckets can't produce pairs
    )

    # unified pairing key: small buckets pair whole (salt -1); hot-bucket members
    # pair within salted sub-buckets of expected size max_group (salt over the
    # bucket key too -> independent draws per band). salt_cap=0 exempts hot
    # members from pairing entirely (stars only): salt NULL, filtered below.
    is_small = F.col("_n") <= max_group
    if salt_cap > 0:
        n_sub = F.ceil(F.col("_n") / F.lit(max_group))
        hot_salt = F.pmod(
            F.xxhash64(F.col("id"), *[F.col(k) for k in keys], F.lit(salt_seed)),
            n_sub,
        )
    else:
        hot_salt = F.lit(None).cast("long")
    annotated = annotated.withColumn(
        "_salt", F.when(is_small, F.lit(-1).cast("long")).otherwise(hot_salt)
    )
    skeys = [*keys, "_salt"]
    sw = Window.partitionBy(*skeys)
    annotated = annotated.withColumn("_sn", F.count("*").over(sw))

    pairable = annotated.where(
        F.col("_salt").isNotNull()
        & (F.col("_sn") >= 2)
        & (F.col("_sn") <= F.lit(max(salt_cap, 1) * max_group))
    )
    left = pairable.select(
        *skeys, F.col("id").alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
    )
    right = pairable.select(
        *skeys, F.col("id").alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
    )
    pairs = (
        left.join(right, skeys).where(F.col("id_a") < F.col("id_b")).select(*out_cols)
    )

    # hot buckets additionally emit the O(m) star backbone to the bucket minimum
    star = (
        annotated.where(~is_small)
        .where(F.col("id") != F.col("_mn.id"))
        .select(
            F.col("_mn.id").alias("id_a"),
            *[F.col(f"_mn.{c}").alias(f"{c}_a") for c in carry],
            F.col("id").alias("id_b"),
            *[F.col(c).alias(f"{c}_b") for c in carry],
        )
        .select(*out_cols)
    )
    pairs = pairs.unionByName(star)

    if pair_filter is not None:
        pairs = pair_filter(pairs)
    return canonical_pairs(pairs.select("id_a", "id_b"), dedup=dedup)


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
        salt_cap=cfg.salt_buckets,
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
    (bit_count of xor, JVM-side) <= k — applied uniformly to full pairs, star
    edges (vs the group-min's simhash), and salted sub-bucket pairs.
    ``group_col`` scopes buckets per group."""
    extras = (group_col,) if group_col else ()
    pieces = signatures.select(
        F.col(id_col).alias("id"),
        *extras,
        F.col("simhash"),
        F.explode(F.array(*simhash_piece_keys(cfg))).alias("pk"),
    ).select(
        "id", *extras, "simhash",
        F.col("pk.piece").alias("piece"), F.col("pk.pv").alias("pv"),
    )

    def hamming_gate(pairs: DataFrame) -> DataFrame:
        return pairs.where(
            F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
            <= cfg.hamming_k
        )

    return bucket_candidates(
        pieces,
        "id",
        (*extras, "piece", "pv"),
        max_group=cfg.max_band_group,
        dedup=dedup,
        carry_cols=("simhash",),
        pair_filter=hamming_gate,
        salt_cap=cfg.salt_buckets,
    )


def all_pairs(docs: DataFrame, id_col: str = "url") -> DataFrame:
    """Brute-force upper-triangle cross join — the reference's archive semantics
    (src/archive/MyReader.py:17-27). ONLY for tiny oracle fixtures; never at scale."""
    a = docs.select(F.col(id_col).alias("id_a"))
    b = docs.select(F.col(id_col).alias("id_b"))
    return a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
