"""Profile one full-pipeline run at a given core count with event logging,
then decompose wall time: per-stage durations, task-time sums, stragglers,
and driver-side gaps (wall time covered by no running stage).

Usage:  taskset -c 0-15 python tools/profile_stages.py 16 [replicate]

This is the 4-vs-16-core scaling diagnostic: `driver_gap` is the serial
spine (job launches, probe barriers, driver-side planning) that does not
shrink with cores; `par_eff` per stage shows which exchanges under-fill the
core pin (task_sum / (stage_dur * cpus)).
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.session import build_session
from cqaduplicatefind_spark.plans.pipeline import run_pipeline
from bench import make_pages, _warmup

cpus = int(sys.argv[1])
replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 60
evdir = f"/tmp/evlog_{cpus}"
os.makedirs(evdir, exist_ok=True)
for f in glob.glob(os.path.join(evdir, "**"), recursive=True):
    if os.path.isfile(f):
        os.unlink(f)

spark = build_session(
    app_name=f"prof-{cpus}", master=f"local[{cpus}]",
    shuffle_partitions=32,
    extra={
        "spark.ui.enabled": "false",
        "spark.driver.memory": "6g",
        "spark.sql.adaptive.enabled": "false",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        # one flat uncompressed file per app (the default rolling v2 layout
        # nests zstd files in an eventlog_v2_* dir; flat plain is parseable)
        "spark.eventLog.rolling.enabled": "false",
        "spark.eventLog.compress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
_warmup(spark, cpus)
cfg = DedupConfig(shingle_k=3, jaccard_threshold=0.7,
                  shuffle_partitions=32, signature_partitions=32)
pages = make_pages(spark, "/root/testdata/sf0.1", replicate=replicate).cache()
n = pages.count()


def once():
    t0 = time.perf_counter()
    r = run_pipeline(spark, pages, cfg)
    n_dup = r.clusters.where(F.col("url") != F.col("cluster_id")).count()
    dt = time.perf_counter() - t0
    r.release()
    return dt, n_dup


once()  # warmup 1
once()  # warmup 2
t_mark = time.time() * 1000.0
dt, n_dup = once()
t_end = time.time() * 1000.0
print(f"TIMED {cpus} cores: {dt:.2f}s n_docs={n} n_dup={n_dup}", flush=True)
spark.stop()

# ---- parse event log (v1 flat file or v2 rolling dir), window [t_mark, t_end]
ev = [p for p in glob.glob(os.path.join(evdir, "**"), recursive=True)
      if os.path.isfile(p) and "appstatus" not in os.path.basename(p)]
stages = {}
tasks = {}
for path in ev:
    with open(path) as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except Exception:
                continue
            t = e.get("Event")
            if t == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                if sub is None or com is None or com < t_mark or sub > t_end:
                    continue
                sid = (si["Stage ID"], si["Stage Attempt ID"])
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "sub": sub, "com": com, "dur": (com - sub) / 1000.0,
                    "ntasks": si["Number of Tasks"],
                }
            elif t == "SparkListenerTaskEnd":
                ti = e.get("Task Info", {})
                fin = ti.get("Finish Time", 0)
                if fin < t_mark or fin > t_end:
                    continue
                sid = (e["Stage ID"], e["Stage Attempt ID"])
                tasks.setdefault(sid, []).append(
                    (fin - ti.get("Launch Time", 0)) / 1000.0)

# stage union coverage -> driver gaps
ivals = sorted((s["sub"], s["com"]) for s in stages.values())
merged = []
for a, b in ivals:
    if merged and a <= merged[-1][1]:
        merged[-1][1] = max(merged[-1][1], b)
    else:
        merged.append([a, b])
covered = sum(b - a for a, b in merged) / 1000.0
wall = (t_end - t_mark) / 1000.0
rows = []
for sid, s in stages.items():
    tt = tasks.get(sid, [])
    rows.append({
        "sid": sid[0], "dur": round(s["dur"], 2), "ntasks": s["ntasks"],
        "task_sum": round(sum(tt), 2),
        "task_max": round(max(tt), 2) if tt else 0,
        "par_eff": round(sum(tt) / (s["dur"] * cpus), 2) if s["dur"] > 0 else 0,
        "name": s["name"],
    })
rows.sort(key=lambda r: -r["dur"])
out = {
    "cpus": cpus, "wall": round(wall, 2), "stage_covered": round(covered, 2),
    "driver_gap": round(wall - covered, 2), "n_stages": len(stages),
    "total_task_time": round(sum(sum(v) for v in tasks.values()), 2),
}
print("SUMMARY " + json.dumps(out), flush=True)
for r in rows[:22]:
    print(f"  stage {r['sid']:>4} dur={r['dur']:>6.2f}s tasks={r['ntasks']:>3} "
          f"tsum={r['task_sum']:>7.2f} tmax={r['task_max']:>6.2f} "
          f"eff={r['par_eff']:>4.2f} {r['name']}", flush=True)
