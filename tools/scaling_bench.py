"""Scaling-evidence protocol (BASELINE.md): run the identical full dedup pipeline
at three pinned parallelism levels (local[1], local[4], local[16]) on the same
input; report docs/sec at each, the N->4N scaling efficiencies
R_4N / (4 * R_N) for both adjacent pairs, and verify the cluster assignments are
identical across levels (determinism check).

Why two pairs: `tools/host_calibration.py` shows this sandbox VM provisions real
4x resources only from 1 -> 4 cores (pure-CPU x4.0, streaming-DRAM x4.0); beyond
~4 concurrent streams the host's memory system is saturated (16 processes move
LESS aggregate data than 4), so 4 -> 16 measures the hypervisor's memory wall,
not the software. Both numbers are reported; 1 -> 4 is the pair where the
hardware can actually deliver what a real N -> 4N executor cluster would
(per-executor CPUs *and* per-executor DRAM).

Methodology (each measured, see BASELINE.md):
- fresh subprocess per level (Spark masters are fixed per JVM), pinned with
  `taskset -c 0..N-1` so local[N] really owns N cores (JVM + Python size their
  pools from sched_getaffinity);
- one untimed warmup run per level (JVM heap growth shows up as kernel
  page-fault storms otherwise), then timed runs separated by idle cool-downs
  that refill the hypervisor's burst budget; minimum reported;
- modest fixed heap (6g) at every level: bigger heaps make the host's page
  management pathological (measured 2.2x wall at 32g);
- AQE disabled for the bench: at toy scale its per-exchange materialization
  barriers add ~4.5s of pure latency per run; at cluster scale the same flag is
  a win (skew-join splitting) and the pipeline's explicit band-group salting
  handles the hot-band skew either way.

Usage: python tools/scaling_bench.py [sf_dir] [out_json]
Env: SPARK_GRAFT_SCALE_LEVELS (default "1,4,16"), SPARK_GRAFT_SCALE_REPLICATE
(default 60 -> 300k docs at sf0.1), SPARK_GRAFT_SCALE_COOLDOWN (default 40s),
SPARK_GRAFT_SCALE_RUNS (default 2 timed runs per level).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", "60"))
COOLDOWN_SEC = int(os.environ.get("SPARK_GRAFT_SCALE_COOLDOWN", "40"))
N_RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.session import build_session
from cqaduplicatefind_spark.plans.pipeline import run_pipeline
from bench import make_pages, _warmup

cpus, sf_dir, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
replicate, cooldown, n_runs = int(sys.argv[4]), int(sys.argv[5]), int(sys.argv[6])
spark = build_session(
    app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
    shuffle_partitions=cpus,
    extra={
        "spark.ui.enabled": "false",
        "spark.driver.memory": "6g",
        "spark.sql.adaptive.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
_warmup(spark, cpus)
cfg = DedupConfig(shingle_k=3, jaccard_threshold=0.7,
                  shuffle_partitions=cpus, signature_partitions=cpus)
pages = make_pages(spark, sf_dir, replicate=replicate).cache()
n = pages.count()

def once():
    t0 = time.perf_counter()
    r = run_pipeline(spark, pages, cfg)
    n_clusters = r.clusters.where(F.col("url") != F.col("cluster_id")).count()
    dt = time.perf_counter() - t0
    return dt, n_clusters, r

once()[2].release()  # untimed warmup: heap growth, python workers, codegen

runs = []
r = None
for i in range(n_runs):
    time.sleep(cooldown)  # refill the hypervisor burst budget
    if r is not None:
        r.release()  # cached frames from the previous run would skew this one
    dt, n_dup, r = once()
    runs.append(round(dt, 2))
runs_sorted = sorted(runs)
dt = runs_sorted[0]
dt_median = runs_sorted[len(runs_sorted) // 2]
checksum = (
    r.clusters.select(F.xxhash64("url", "cluster_id").alias("h"))
    .agg(F.bit_xor("h")).collect()[0][0]
)
json.dump(
    {"cpus": cpus, "n_docs": n, "wall_sec": dt, "wall_sec_median": dt_median,
     "runs_sec": runs, "docs_per_sec": round(n / dt, 1),
     "docs_per_sec_median": round(n / dt_median, 1),
     "n_nontrivial_members": n_dup, "cluster_checksum": checksum},
    open(out_path, "w"),
)
spark.stop()
"""


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_json = sys.argv[2] if len(sys.argv) > 2 else "SCALING.json"
    levels = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "1,4,16").split(",")
    ]
    results = {}
    for cpus in levels:
        out = f"/tmp/scaling_{cpus}.json"
        subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}",
             sys.executable, "-c", CHILD, str(cpus), sf_dir, out,
             str(REPLICATE), str(COOLDOWN_SEC), str(N_RUNS)],
            check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        results[str(cpus)] = json.load(open(out))
    summary: dict = {f"local{c}": results[str(c)] for c in levels}
    for lo, hi in zip(levels, levels[1:]):
        if hi == 4 * lo:
            eff = results[str(hi)]["docs_per_sec"] / (
                4 * results[str(lo)]["docs_per_sec"]
            )
            summary[f"scaling_efficiency_{lo}_to_{hi}"] = round(eff, 3)
            eff_med = results[str(hi)]["docs_per_sec_median"] / (
                4 * results[str(lo)]["docs_per_sec_median"]
            )
            summary[f"scaling_efficiency_{lo}_to_{hi}_median"] = round(eff_med, 3)
    checksums = {results[str(c)]["cluster_checksum"] for c in levels}
    summary["deterministic_clusters"] = len(checksums) == 1
    summary["sf_dir"] = sf_dir
    summary["protocol"] = (
        "pinned cores (taskset), fresh JVM per level, 6g heap, AQE off at bench "
        f"scale, 1 untimed warmup run, {N_RUNS} timed runs with {COOLDOWN_SEC}s "
        "idle cool-downs, min reported; see BASELINE.md + CALIBRATION.json for "
        "the host's own scaling ceilings"
    )
    print(json.dumps(summary, indent=2))
    json.dump(summary, open(out_json, "w"), indent=2)


if __name__ == "__main__":
    main()
