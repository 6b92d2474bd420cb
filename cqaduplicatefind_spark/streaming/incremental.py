"""Incremental near-duplicate detection with Structured Streaming.

The reference is batch-only (SURVEY.md §2.10); this is the engine's forward path
for continuously-arriving crawl data: new pages stream in, get normalized + signed
with the SAME Arrow-batched kernels as batch (identical signatures by construction),
and are matched against the accumulated corpus inside ``foreachBatch``.

Design (the part that must stay sub-linear per batch at 10^12 docs):

- signature computation is a stateless narrow map -> works unchanged on a
  streaming DataFrame;
- the corpus index is a **band table** (id, band, bh — one slim row per LSH band)
  appended incrementally per batch: each micro-batch explodes ONLY its own docs'
  bands and equi-joins them against the accumulated band table. The heavyweight
  signature payloads (128-lane minhash, shingle arrays) are stored separately and
  are touched only for ids that actually appear in candidate pairs;
- candidate generation handles intra-batch duplicates and batch-vs-index matches
  in ONE skew-capped pass: the union of (TOUCHED index bands, new bands) goes
  through the same ``bucket_candidates`` kernel as batch mode, with an ``is_new``
  flag carried to both pair sides and pairs between two index docs filtered out
  (they were reported when the younger of the two arrived). Match results are
  therefore independent of micro-batch boundaries — a duplicate pair arriving
  within one batch is found exactly like one split across batches;
- **per-batch pairing work is bounded by TOUCHED buckets, not the index**: the
  accumulated band table is semi-joined on the batch's distinct ``(band, bh)``
  keys before entering the pairing kernel, so the kernel's bucket-size windows
  and self-join shuffle only the buckets this batch can possibly pair in.
  Correct by construction: every emitted pair must involve a new doc (the
  ``involves_new`` gate), and a pair forms only inside a bucket that contains a
  new row — index rows in untouched buckets can never contribute. Without this
  the pairing window re-shuffled the ENTIRE index every micro-batch (O(index)
  per trigger — the round-2 scale hazard);
- the band/signature stores are **tier-compacted**: every ``compact_every``
  small ``batch=*`` parts fold into one ``compacted=`` tier (write work
  bounded by those parts, not the store), and tiers themselves merge once
  ``compact_every`` of them accumulate — a long-running stream reads
  O(compact_every) parquet footers per trigger and never pays an O(index)
  rewrite per compaction; the merge protocol keeps the store a readable
  superset through every crash window (see ``_merge``);
- exactly-once via batch-id-keyed idempotent writes (overwrite-by-batch-subdir,
  the Iceberg ``MERGE`` analog);
- event-time windowed aggregation with a watermark covers the metrics-over-time
  surface (docs/sec, dup-rate per window).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.functions.normalize import with_normalized_text
from cqaduplicatefind_spark.functions.signatures import with_signatures
from cqaduplicatefind_spark.operators.candidates import (
    bucket_candidates,
    explode_bands,
)
from cqaduplicatefind_spark.operators.verify import accept_edges, score_pairs

SIG_COLS = ("url", "minhash", "simhash", "n_tokens", "n_shingles", "shingles")

# accept_edges output schema — the empty-matches frame and any caller
# synthesizing an edge frame must stay in lockstep with score_pairs/accept_edges
EDGE_SCHEMA = (
    "id_a string, id_b string, jaccard double, est_jaccard double, "
    "hamming int, containment double"
)

# Explicit store schemas: reading with a declared schema skips parquet footer
# schema inference entirely (the old mergeSchema=true read opened EVERY footer
# in the store on EVERY trigger — measured at ~0.5s/trigger on a 4-batch sf0.1
# store, and O(files) at scale). Parquet fills columns absent from a file with
# NULLs, so legacy pre-``src_batch`` dirs read exactly as the mergeSchema path
# read them (src_batch=null ⇒ treated as index; see _read_batches) — pinned by
# tests/test_streaming.py's legacy-store tests.
BAND_STORE_SCHEMA = "id string, band int, bh long, src_batch long"
SIG_STORE_SCHEMA = (
    "url string, minhash array<long>, simhash long, n_tokens int, "
    "n_shingles int, shingles array<long>"
)

# File-sizing targets for the store writers (rows per output file). The stores
# were previously written with the upstream partitioning (32-64 tiny files per
# batch dir at bench scale): every trigger then re-listed and re-opened
# hundreds of files across the accumulated dirs. Row-count-based sizing is
# scale-free: a 6k-doc micro-batch folds to 1 file, a 10^9-row increment still
# writes ~250 band files of a few hundred MB each (guide §6: aim 128MB-1GB).
BAND_ROWS_PER_FILE = 4_000_000  # ~50B/row -> ~200MB files
SIG_ROWS_PER_FILE = 250_000     # ~1KB/row (shingle payload) -> ~250MB files


def _n_files(n_rows: int, rows_per_file: int) -> int:
    return max(1, -(-int(n_rows) // int(rows_per_file)))


def stream_signatures(pages_stream: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Streaming pages(url, text, ...) -> streaming signatures. Stateless."""
    norm = with_normalized_text(pages_stream, "text", "norm_text")
    return with_signatures(norm, cfg, "norm_text").select(*SIG_COLS)


class IncrementalDedup:
    """foreachBatch processor: match each micro-batch against the corpus index.

    Layout under ``work_dir``: ``bands/batch=N`` (slim band index rows),
    ``sigs/batch=N`` (signature payloads, read back only for candidate ids),
    ``matches/batch=N`` (accepted duplicate edges). Idempotent re-runs of a batch
    id overwrite their own subdirs — micro-batch replays cannot duplicate rows.

    ``batch_stats`` records per-batch row counts (new docs, index band rows
    joined, candidate pairs, signature payload rows fetched) — the evidence that
    per-batch work scales with the batch + index BAND table, never with the
    accumulated signature payloads.
    """

    def __init__(self, spark: SparkSession, cfg: DedupConfig,
                 bands_dir: str, sigs_dir: str, matches_dir: str,
                 compact_every: int = 16,
                 count_index_stats: bool = True,
                 broadcast_touched_max: int = 4_000_000) -> None:
        self.spark = spark
        self.cfg = cfg
        self.bands_dir = bands_dir
        self.sigs_dir = sigs_dir
        self.matches_dir = matches_dir
        self.compact_every = compact_every
        # count_index_stats=False skips the one-time logical index count a
        # fresh processor over an existing store would otherwise pay (a
        # dropDuplicates+count shuffle over the WHOLE band store — fine once
        # per long-running stream, O(index) PER INCREMENT for the batch
        # delta path, which constructs a processor per call); stats then
        # report n_index_band_rows=None. broadcast_touched_max bounds the
        # touched-(band,bh)-key broadcast: a streaming micro-batch's key set
        # is tiny, but a huge batch increment (10^9 docs x bands keys) must
        # fall back to a plain shuffle semi-join instead of OOMing the
        # driver — at that size the increment touches most buckets anyway,
        # so the wide join is the right plan, not a regression.
        self.count_index_stats = count_index_stats
        self.broadcast_touched_max = broadcast_touched_max
        self.batch_stats: list[dict] = []
        # wall-clock per phase of each processed batch (read/pair/score/write/
        # compact) — the profiling evidence the bench-leg optimization work
        # reads; pure timing, no behavioral coupling
        self.phase_times: list[dict] = []
        # logical band-index size, maintained arithmetically so the per-batch
        # stats never pay an O(index) count scan (the same per-trigger scale
        # hazard class the touched-bucket semi-join removes from pairing):
        # base = rows already in the store when this processor first runs
        # (one-time count on restart), plus per-batch appended row counts
        # keyed by batch_id so idempotent replays overwrite, not double-count
        self._band_rows_base: int | None = None
        self._band_rows_by_batch: dict[int, int] = {}
        for d in (bands_dir, sigs_dir, matches_dir):
            os.makedirs(d, exist_ok=True)

    def _parts(self, root: str) -> list[str]:
        return [
            os.path.join(root, d)
            for d in sorted(os.listdir(root))
            if d.startswith("batch=") or d.startswith("compacted=")
        ]

    def _read_batches(
        self, root: str, exclude_batch: int | None = None,
        schema: str | None = None,
    ) -> DataFrame | None:
        """Read the store; ``exclude_batch`` skips that batch's own
        ``batch=<id>`` subdir. Used by the replay path: a crash between the
        index append and the checkpoint commit means the replayed batch finds
        its OWN rows in the store — they are not "index" (the overwrite is
        about to replace them), and including them would inflate the recovery
        row count and feed the pairing kernel stale copies of the batch's own
        docs. The dir-name skip is only an I/O shortcut: rows a pre-crash
        compaction already folded into a tier no longer live under the
        ``batch=<id>`` name, so the BAND store also tags every row with its
        source batch (``src_batch``) and the caller filters on it — that row
        tag, not the dir name, is what makes replay exclusion exact through
        every crash window."""
        parts = self._parts(root)
        if exclude_batch is not None:
            skip = f"batch={exclude_batch}"
            parts = [p for p in parts if os.path.basename(p) != skip]
        if not parts:
            return None
        if schema is not None:
            # declared schema: zero footer reads; files lacking a column (a
            # store written before the src_batch row tag existed, or a mixed
            # store upgraded mid-stream) fill it with NULL — identical frames
            # to the old mergeSchema read, without opening every footer on
            # every trigger
            return self.spark.read.schema(schema).parquet(*parts)
        # no declared schema (callers outside the three known stores):
        # mergeSchema keeps the tag column present even when inference from a
        # single legacy footer would drop it. Footer count is bounded by the
        # tier compaction (~2*compact_every dirs), so this stays O(1)/trigger.
        return self.spark.read.option("mergeSchema", "true").parquet(*parts)

    def _merge(
        self, root: str, sources: list[str], final: str,
        schema: str | None = None,
    ) -> None:
        """Fold ``sources`` into ``final``, leaving the store a READABLE
        SUPERSET through every crash window: (1) the union is written to a temp
        dir no reader scans, (2) a pre-existing ``final`` (batch replay) is
        renamed to ``<final>.old`` — still matching the reader prefix, and its
        rows are already in the temp union because sources are read FIRST —
        (3) the temp dir renames into place, (4) sources and ``.old`` are
        removed LAST. A crash at any point leaves every row reachable under a
        scanned name (possibly duplicated; readers dropDuplicate), and stale
        ``.old`` dirs self-heal by re-entering the next merge as sources."""
        import shutil

        tmp = os.path.join(root, "_compact_tmp")
        # declared schema when the store is a known one (same legacy-column
        # rule as _read_batches: a MIXED store's pre-src_batch rows read the
        # tag as NULL, never dropping the column from the tier); mergeSchema
        # fallback otherwise. The fold is written size-targeted (one shuffle-
        # free coalesce) instead of inheriting the scan's many-small-files
        # partitioning — a tier must not multiply the file count it replaces.
        src = (
            self.spark.read.schema(schema).parquet(*sources)
            if schema is not None
            else self.spark.read.option("mergeSchema", "true").parquet(*sources)
        )
        n_bytes = sum(
            os.path.getsize(os.path.join(p, f))
            for p in sources
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
        target = max(1, -(-n_bytes // (512 * 1024 * 1024)))  # ~512MB/file
        src.coalesce(target).write.mode("overwrite").parquet(tmp)
        old = final + ".old"
        if os.path.exists(final):
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(final, old)
        os.rename(tmp, final)
        for p in sources + [old]:
            if p != final and os.path.exists(p):
                shutil.rmtree(p)

    def _maybe_compact(
        self, root: str, batch_id: int, schema: str | None = None
    ) -> None:
        """TIERED compaction: once ``compact_every`` small ``batch=*`` parts
        accumulate they fold into ONE new ``compacted=<batch_id>`` tier —
        O(compact_every x batch) write work, NOT a rewrite of the whole store —
        and once ``compact_every`` tiers accumulate they merge into one
        (amortized O(index / compact_every^2) per batch). Without any
        compaction a stream at batch 10^4 reads 10^4 parquet footers per
        trigger; with whole-store compaction every K batches the write path
        becomes O(index) per K triggers — the same scale hazard the
        touched-bucket semi-join removes from the read path. Tiering bounds
        BOTH: <= ~2*compact_every dirs read per trigger, amortized per-batch
        write work independent of the index for the common tier-0 fold."""
        batches = [
            p for p in self._parts(root)
            if os.path.basename(p).startswith("batch=")
        ]
        if len(batches) >= self.compact_every:
            self._merge(
                root, batches, os.path.join(root, f"compacted={batch_id}"),
                schema=schema,
            )
        tiers = [
            p for p in self._parts(root)
            if os.path.basename(p).startswith("compacted=")
        ]
        if len(tiers) >= self.compact_every:
            self._merge(
                root, tiers, os.path.join(root, f"compacted={batch_id}m"),
                schema=schema,
            )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        cfg = self.cfg
        phases: dict[str, float] = {"batch_id": int(batch_id)}
        _t0 = time.perf_counter()

        def _mark(name: str) -> None:
            nonlocal _t0
            now = time.perf_counter()
            phases[name] = round(phases.get(name, 0.0) + (now - _t0), 3)
            _t0 = now

        batch_df = batch_df.where(F.col("n_shingles") > 0).persist()
        # every frame persisted mid-batch lands here and is released in the
        # finally block: a failed write/compaction must not strand caches in a
        # long-lived session (the delta path runs one processor per increment)
        held: list[DataFrame] = [batch_df]
        try:
            # materialize the batch cache ONCE, up front: n_new feeds the
            # stats row, the broadcast-decision bound, the exact band-row
            # arithmetic, and the store writers' file sizing — the old flow
            # re-derived each of those with its own job
            n_new = batch_df.count()
            _mark("batch_count")
            new_bands = explode_bands(batch_df, cfg).withColumn(
                "is_new", F.lit(True)
            ).persist()
            held.append(new_bands)
            idx_bands = self._read_batches(
                self.bands_dir, exclude_batch=int(batch_id),
                schema=BAND_STORE_SCHEMA,
            )
            _mark("read_band_store")
            if idx_bands is not None:
                # exact replay exclusion by row tag (see _read_batches): rows
                # this batch appended before a crash are not "index" even when
                # a pre-crash compaction moved them into a tier the dir-name
                # skip cannot see. Legacy stores predate the tag: a whole-store
                # legacy read has no src_batch column at all (add it as null),
                # and a mixed store reads legacy rows as null — either way an
                # untagged row was written by a finished pre-upgrade batch, so
                # it IS index (null must not compare-exclude, hence coalesce).
                if "src_batch" not in idx_bands.columns:
                    idx_bands = idx_bands.withColumn(
                        "src_batch", F.lit(None).cast("long")
                    )
                idx_bands = idx_bands.where(
                    F.coalesce(F.col("src_batch"), F.lit(-1)) != int(batch_id)
                ).drop("src_batch")
            if idx_bands is None:
                all_bands = new_bands
                idx_touched = None
                n_idx_joined = 0
                self._band_rows_base = 0
            else:
                if self._band_rows_base is None and self.count_index_stats:
                    # restart over an existing store: one-time recovery count;
                    # every later batch maintains the total arithmetically.
                    # idx_bands already excludes the replaying batch's own
                    # pre-crash append (src_batch row tag, see _read_batches),
                    # so the base is the index as it stood BEFORE this batch —
                    # and the count is LOGICAL (dedup over the key), so
                    # physical duplicates a crash-interrupted compaction left
                    # behind don't inflate it either.
                    self._band_rows_base = idx_bands.dropDuplicates(
                        ["id", "band", "bh"]
                    ).count()
                # bound per-batch pairing work by TOUCHED buckets: only index
                # rows whose (band, bh) bucket also contains a new row can ever
                # pair (every pair must involve a new doc), so the pairing
                # kernel's windows + self-join never shuffle the rest of the
                # index. The touched-key set is O(batch x bands) — broadcast
                # when it fits (the streaming case), plain shuffle semi-join
                # when a huge batch increment exceeds broadcast_touched_max
                # (such an increment touches most buckets anyway, so the wide
                # join is the right plan there). The decision uses the free
                # upper bound n_new*bands (distinct keys can only be fewer)
                # instead of paying a count job to learn the exact size.
                touched = new_bands.select("band", "bh").distinct()
                probe = (
                    F.broadcast(touched)
                    if n_new * cfg.bands <= self.broadcast_touched_max
                    else touched
                )
                idx_touched = (
                    idx_bands.join(probe, ["band", "bh"], "left_semi")
                    # tolerate duplicate rows from a crash-interrupted
                    # compaction; cost bounded by touched rows, not the index
                    .dropDuplicates(["id", "band", "bh"])
                    .persist()
                )
                held.append(idx_touched)
                # NOT pre-counted: the pairing job below materializes this
                # cache inline (one job barrier instead of two); the stats
                # count afterwards reads the populated cache
                all_bands = idx_touched.withColumn(
                    "is_new", F.lit(False)
                ).unionByName(new_bands)

            # one skew-capped pass over the band union: intra-batch pairs AND
            # batch-vs-index pairs; index-index pairs (already reported when the
            # younger doc arrived) are dropped by the pair filter
            def involves_new(pairs: DataFrame) -> DataFrame:
                return pairs.where(F.col("is_new_a") | F.col("is_new_b"))

            cand = bucket_candidates(
                all_bands,
                "id",
                ("band", "bh"),
                max_group=cfg.max_band_group,
                carry_cols=("is_new",),
                pair_filter=involves_new,
                salt_cap=cfg.salt_buckets,
            ).persist()
            held.append(cand)
            n_cand = cand.count()
            _mark("pairing")
            if idx_touched is not None:
                n_idx_joined = idx_touched.count()  # cache hot from pairing
                _mark("idx_count")

            # fetch signature payloads ONLY for ids in candidate pairs; a
            # quiet batch (zero candidates) skips the store read entirely —
            # otherwise the semi-join still scans every sig part for nothing.
            # The fetch is NOT pre-counted: the scoring job below is its first
            # action (one job materializes fetch + verify + write), and the
            # stats count afterwards reads the already-populated cache.
            if n_cand == 0:
                needed = batch_df.select(*SIG_COLS).limit(0)
                n_payload = 0
            else:
                ids = (
                    cand.select(F.col("id_a").alias("url"))
                    .unionByName(cand.select(F.col("id_b").alias("url")))
                    .distinct()
                )
                if 2 * n_cand <= self.broadcast_touched_max:
                    # candidate endpoints are a tiny set in the streaming
                    # case: broadcasting them keeps the store scan shuffle-
                    # free for the semi-join (the same bound-based decision
                    # as the touched-bucket probe; huge increments fall back
                    # to the shuffle semi-join)
                    ids = F.broadcast(ids)
                idx_sigs = self._read_batches(
                    self.sigs_dir, exclude_batch=int(batch_id),
                    schema=SIG_STORE_SCHEMA,
                )
                store = (
                    batch_df.select(*SIG_COLS)
                    if idx_sigs is None
                    else idx_sigs.unionByName(batch_df.select(*SIG_COLS))
                )
                needed = (
                    store.join(ids, "url", "left_semi")
                    .dropDuplicates(["url"])  # compaction crash-window tolerance
                    .persist()
                )
                held.append(needed)

            edges = accept_edges(
                score_pairs(cand, needed, cfg, evidence=cfg.verify_evidence), cfg
            )

            # the three per-batch writes are mutually independent (distinct
            # dirs, distinct cached sources) and every one is idempotent per
            # batch_id — overwrite-by-subdir — so ANY interleaving/crash
            # prefix replays correctly (the same exactly-once argument as the
            # serial order). Overlapping them fills each job's straggler tail
            # with the next job's tasks (guide §2.6) instead of paying three
            # serial job latencies.
            from concurrent.futures import ThreadPoolExecutor

            n_band_rows = n_new * cfg.bands  # explode_bands: exactly bands/doc

            def _write_bands():
                new_bands.drop("is_new").withColumn(
                    "src_batch", F.lit(int(batch_id)).cast("long")
                ).coalesce(
                    _n_files(n_band_rows, BAND_ROWS_PER_FILE)
                ).write.mode("overwrite").parquet(
                    os.path.join(self.bands_dir, f"batch={batch_id}")
                )

            def _write_sigs():
                batch_df.select(*SIG_COLS).coalesce(
                    _n_files(n_new, SIG_ROWS_PER_FILE)
                ).write.mode("overwrite").parquet(
                    os.path.join(self.sigs_dir, f"batch={batch_id}")
                )

            with ThreadPoolExecutor(max_workers=2) as pool:
                f_bands = pool.submit(_write_bands)
                f_sigs = pool.submit(_write_sigs)
                edges.write.mode("overwrite").parquet(
                    os.path.join(self.matches_dir, f"batch={batch_id}")
                )
                f_bands.result()
                f_sigs.result()
            _mark("score_write")
            if n_cand > 0:
                n_payload = needed.count()  # cache populated by the write job
                _mark("payload_count")

            self.batch_stats.append(
                {
                    "batch_id": int(batch_id),
                    "n_new_docs": n_new,
                    # logical index size BEFORE this batch, from the running
                    # total (a replayed batch's own prior append is excluded —
                    # its overwrite replaces those rows, they are not "index");
                    # None when count_index_stats=False skipped the recovery
                    # count (the batch delta path)
                    "n_index_band_rows": (
                        None
                        if self._band_rows_base is None
                        else self._band_rows_base + sum(
                            v for b, v in self._band_rows_by_batch.items()
                            if b != int(batch_id)
                        )
                    ),
                    # band rows that actually entered the pairing kernel —
                    # O(touched buckets), the per-batch work bound
                    "n_index_band_rows_joined": n_idx_joined,
                    "n_candidates": n_cand,
                    "n_sig_payload_rows": n_payload,
                }
            )
            _mark("stats_count")

            # index append bookkeeping: the writes themselves ran overlapped
            # with the matches write above (src_batch rides every band row so
            # replay exclusion stays exact after compaction renames the row's
            # home dir — see _read_batches); both writers read hot caches
            # materialized by the pairing job, and coalesce merges cached
            # partitions — no shuffle, no recompute — into size-targeted
            # files instead of one tiny file per upstream partition.
            self._band_rows_by_batch[int(batch_id)] = n_band_rows
            # compaction stays SERIAL (unlike the writes above): the merge
            # crash-window tests pin per-dir fault sequencing, and an A/B of
            # overlapping the two folds broke that pinned contract for ~0.5s
            self._maybe_compact(self.bands_dir, int(batch_id),
                                schema=BAND_STORE_SCHEMA)
            self._maybe_compact(self.sigs_dir, int(batch_id),
                                schema=SIG_STORE_SCHEMA)
            _mark("compact")
        finally:
            for df in held:
                df.unpersist()
            self.phase_times.append(phases)

    def matches(self) -> DataFrame:
        m = self._read_batches(self.matches_dir, schema=EDGE_SCHEMA)
        if m is None:
            return self.spark.createDataFrame([], EDGE_SCHEMA)
        return m


def run_incremental_dedup(
    spark: SparkSession,
    pages_stream: DataFrame,
    cfg: DedupConfig,
    work_dir: str,
    checkpoint_dir: str | None = None,
    compact_every: int = 16,
):
    """Wire a streaming pages source through signature computation into the
    incremental matcher. Returns (query, dedup) — await query termination, then
    read ``dedup.matches()``."""
    sigs = stream_signatures(pages_stream, cfg)
    dedup = IncrementalDedup(
        spark, cfg,
        os.path.join(work_dir, "bands"),
        os.path.join(work_dir, "sigs"),
        os.path.join(work_dir, "matches"),
        compact_every=compact_every,
    )
    q = (
        sigs.writeStream.foreachBatch(dedup.process_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(work_dir, "checkpoint"),
        )
        .trigger(availableNow=True)
        .start()
    )
    return q, dedup


def windowed_event_metrics(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late data beyond the watermark is
    dropped; state is bounded) — the Structured Streaming metrics surface."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )
