"""Smoke coverage for the bench harness itself (round-5: the evidence
harnesses are load-bearing — a silent harness bug corrupts every number built
on it, so the incremental legs get the same bitrot protection as operators).

Timing VALUES are not asserted (this is a correctness smoke, not a benchmark);
what is pinned: the legs run end-to-end on a real Spark session, produce
positive walls, per-run lists of the requested length, and clean up their
store directories and cached frames.
"""

from __future__ import annotations

import glob
import tempfile

import bench


def test_bench_incremental_smoke(spark, monkeypatch):
    monkeypatch.setattr(bench, "COOLDOWN_SEC", 0)
    before = set(glob.glob(tempfile.gettempdir() + "/bench_*"))
    out = bench.bench_incremental(
        spark, "/root/testdata/sf0.001", replicate=1, n_passes=1
    )
    runs = out.pop("_runs")
    assert set(out) == {"delta_dedup", "streaming_incremental"}
    for name, wall in out.items():
        assert wall > 0, name
        assert len(runs[name]) == 1, name
        assert min(runs[name]) > 0, name
    # work dirs removed (fresh store per run — rerunning a used store would
    # grow it and time a different job)
    after = set(glob.glob(tempfile.gettempdir() + "/bench_*"))
    assert after == before
    # no cached frames leaked into executor storage
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().isEmpty()
