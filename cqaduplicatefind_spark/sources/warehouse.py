"""Checkpointed stage tables with atomic commit, config lineage, and resume.

Production target is Iceberg (``df.writeTo("warehouse.signatures").append()`` with
snapshot isolation, hidden partitioning on ``lang``/``warc_ts``, and time-travel for
stage resume — BASELINE.json north_star). The Iceberg runtime jars cannot be
installed in this offline sandbox, so this module provides the same contract on
plain Parquet directories:

- **atomic commit**: write to ``<table>.__tmp__``, then a single ``os.rename`` —
  readers never observe a half-written table (the reference's concurrent CSV append
  at ``src/archive/MyReader2.py:41-42`` is the racy anti-pattern this replaces);
- **lineage**: every commit records a manifest (config fingerprint, input
  fingerprint, row count, per-partition file rows) — the "per-partition lineage +
  metrics" the north_rule requires;
- **idempotent resume**: a stage is skipped iff a committed manifest exists whose
  config fingerprint AND input fingerprint both match; a changed config — or the
  same warehouse pointed at different input data — invalidates every stage
  instead of silently resuming from stale checkpoints of the old input. (On
  Iceberg the input fingerprint is the source table's snapshot id; here it is
  derived from the input's file listing.)

Swapping in Iceberg is confined to this module: commit -> ``writeTo().append()``,
manifest -> snapshot summary properties, resume -> snapshot existence check.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def input_fingerprint_for(df: DataFrame, label: str = "") -> str:
    """Fingerprint of a DataFrame's input data for resume-safety: the sorted file
    listing (name + size + mtime where stat-able) plus a caller label. The Iceberg
    analog is the source snapshot id; content hashing would force a full scan."""
    import hashlib

    entries = []
    for uri in sorted(df.inputFiles()):
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        try:
            st = os.stat(path)
            entries.append(f"{uri}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            entries.append(uri)
    blob = json.dumps({"label": label, "files": entries}).encode("utf-8")
    return hashlib.sha256(blob).hexdigest()[:16]


@dataclass
class Warehouse:
    root: str
    config_fingerprint: str
    input_fingerprint: str = ""

    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        """Committed with matching config AND input fingerprints?"""
        mpath = os.path.join(self._dir(table), _MANIFEST)
        if not os.path.exists(mpath):
            return False
        try:
            with open(mpath) as f:
                manifest = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return manifest.get("config_fingerprint") == self.config_fingerprint and (
            manifest.get("input_fingerprint", "") == self.input_fingerprint
        )

    def write(self, df: DataFrame, table: str, extra_meta: dict | None = None) -> dict:
        """Atomic checkpoint: parquet to tmp dir, manifest, rename into place."""
        final = self._dir(table)
        tmp = final + ".__tmp__"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)

        # per-partition lineage: rows per output file (order-insensitive)
        files = sorted(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        part_rows = {}
        try:
            import pyarrow.parquet as pq

            for f in files:
                part_rows[f] = pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
        except Exception:  # lineage is best-effort metadata, never fails the commit
            part_rows = {f: None for f in files}

        manifest = {
            "table": table,
            "config_fingerprint": self.config_fingerprint,
            "input_fingerprint": self.input_fingerprint,
            "row_count": int(sum(v for v in part_rows.values() if v) or 0),
            "partitions": part_rows,
            **(extra_meta or {}),
        }
        with open(os.path.join(tmp, _MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)

        # replace via rename-rename, never rmtree-then-rename: deleting the
        # committed table BEFORE the new one lands would leave a crash window
        # with NEITHER table on disk (the old checkpoint destroyed, resume
        # forced to recompute). Parking the old table under .__old__ first
        # means every instant has a complete table either committed or
        # recoverable; the stale .__old__ is swept on the next write.
        old = final + ".__old__"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old)
        return manifest

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self._dir(table))

    def manifest(self, table: str) -> dict:
        with open(os.path.join(self._dir(table), _MANIFEST)) as f:
            return json.load(f)

    def get_or_compute(
        self, spark: SparkSession, table: str, compute, extra_meta: dict | None = None
    ) -> DataFrame:
        """Resume-or-run: reuse the committed stage table when its lineage matches,
        else compute, commit, and re-read (re-reading pins the stage to its
        checkpoint — downstream plans don't recompute upstream lineage)."""
        if not self.exists(table):
            self.write(compute(), table, extra_meta)
        return self.read(spark, table)

    def drop(self, table: str) -> None:
        d = self._dir(table)
        if os.path.exists(d):
            shutil.rmtree(d)
