"""Scaling-evidence protocol (BASELINE.md): run the identical full dedup pipeline
at pinned parallelism levels (local[1], local[4], local[16]) on the same input;
report docs/sec at each, the N->4N scaling efficiencies R_4N / (4 * R_N), and
verify the cluster assignments are identical across every run at every level
(determinism check).

Why per-trial interleaving (the round-2 protocol fix): this sandbox VM's CPU
delivery varies over time (hypervisor burst credit — `tools/host_calibration.py`
measured the SAME pure-CPU spin loop scaling 1->4 at 0.69 in one window and 1.03
in another). Running all of level A's repetitions, then all of level B's —
minutes apart — makes the efficiency ratio compare two different hosts, which is
exactly why the round-1 committed artifact (0.716) disagreed with the prior run
of the same code (0.846). Here every trial runs local[1], local[4], local[16]
back-to-back inside the same ~5-minute window and the efficiency is computed
WITHIN the trial, so host drift cancels out of the ratio; the summary reports
the per-trial ratio list plus its median and min. A 1-second pinned spin probe
before each timed run records the host's instantaneous speed as throttle
evidence alongside each measurement.

Mechanics:
- one persistent child process per level, pinned with `taskset -c 0..N-1` so
  local[N] really owns N cores (JVM + Python size their pools from
  sched_getaffinity); each child builds its session once, warms the JVM +
  Python worker pool, caches the corpus, and does one untimed warmup pipeline
  run (heap growth shows up as kernel page-fault storms otherwise);
- the parent then drives trials over stdin/stdout: each trial = one timed run
  per level in ascending order, short idle gaps between runs;
- modest fixed heap (6g) at every level: bigger heaps make the host's page
  management pathological (measured 2.2x wall at 32g);
- AQE disabled for the bench: at toy scale its per-exchange materialization
  barriers add ~4.5s of pure latency per run; at cluster scale the same flag is
  a win (skew-join splitting) and the pipeline's explicit band-group salting
  handles the hot-band skew either way;
- cluster checksums from every run at every level must agree (results are
  parallelism-independent).

1->4 is the pair where the hardware can actually deliver what a real N->4N
executor cluster would: beyond ~4 concurrent streams the host's memory system
saturates (16 processes move LESS aggregate data than 4 — CALIBRATION.json), so
4->16 measures the hypervisor's memory wall, not the software. Both are
reported.

Usage: python tools/scaling_bench.py [sf_dir] [out_json]
Env: SPARK_GRAFT_SCALE_LEVELS (default "1,4,16"), SPARK_GRAFT_SCALE_REPLICATE
(default 60 -> 300k docs at sf0.1), SPARK_GRAFT_SCALE_TRIALS (default 3),
SPARK_GRAFT_SCALE_GAP (idle seconds between runs, default 10).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", "60"))
N_TRIALS = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "5"))
GAP_SEC = int(os.environ.get("SPARK_GRAFT_SCALE_GAP", "10"))
# per-child JVM heap. The 6g default is the measured sweet spot up to 1.2M
# docs (bigger heaps trigger this host's page-fault pathology). At 2.4M docs
# the 6g shared local-mode heap OOMs (first 16-way, then 4-way mid-trial) —
# local[N] shares ONE heap across N ways, where a real N-executor cluster
# scales aggregate memory with N. Override (documented in the artifact) for
# sizes beyond the 6g budget.
HEAP = os.environ.get("SPARK_GRAFT_SCALE_HEAP", "6g")

CHILD = r"""
import json, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from cqaduplicatefind_spark.config import DedupConfig
from cqaduplicatefind_spark.session import build_session
from cqaduplicatefind_spark.plans.pipeline import run_pipeline
from bench import make_pages, _warmup

cpus, sf_dir, replicate = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
heap = sys.argv[4] if len(sys.argv) > 4 else "6g"
# the JOB is held constant across levels (strong scaling: same plan, same
# shuffle width = the production default 32); only the core count varies. A
# per-level-tuned width would compare different physical plans: local[1] with
# shuffle_partitions=1 satisfies every required distribution with its single
# partition, so Catalyst elides every exchange and the baseline never pays
# shuffle serialization at all — inflating apparent 1-core throughput by the
# entire shuffle machinery the parallel levels must run (measured ~15% of the
# 1-core wall). A real N -> 4N executor comparison runs one fixed job config.
spark = build_session(
    app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
    shuffle_partitions=32,
    extra={
        "spark.ui.enabled": "false",
        "spark.driver.memory": heap,
        "spark.sql.adaptive.enabled": "false",
        # this JVM is SIGSTOPped between its own timed runs (parent protocol:
        # one live Spark process at a time). Spark's internal RPC timeouts are
        # wall-clock; a freeze longer than the 120s default expires pending
        # asks/heartbeats the moment the process thaws and kills the scheduler
        # endpoint (observed: RpcEndpointNotFoundException on resume). Raise
        # them past the longest possible freeze window (~one full trial).
        "spark.network.timeout": "7200s",
        "spark.rpc.askTimeout": "7200s",
        "spark.rpc.lookupTimeout": "7200s",
        "spark.executor.heartbeatInterval": "600s",
    },
)
spark.sparkContext.setLogLevel("ERROR")
_warmup(spark, cpus)
cfg = DedupConfig(shingle_k=3, jaccard_threshold=0.7,
                  shuffle_partitions=32, signature_partitions=32)
pages = make_pages(spark, sf_dir, replicate=replicate).cache()
n = pages.count()

def once():
    t0 = time.perf_counter()
    r = run_pipeline(spark, pages, cfg)
    n_dup = r.clusters.where(F.col("url") != F.col("cluster_id")).count()
    dt = time.perf_counter() - t0
    # checksum outside the timed region: CC output is localCheckpointed, so this
    # re-reads the checkpoint, not the pipeline
    checksum = (
        r.clusters.select(F.xxhash64("url", "cluster_id").alias("h"))
        .agg(F.bit_xor("h")).collect()[0][0]
    )
    r.release()
    return dt, n_dup, checksum

# TWO untimed warmup runs: the first pays heap growth, python workers, and
# codegen; the second still runs ~10% above steady state (block-manager and
# shuffle-service warmup) and absorbing it keeps trial 0 comparable to the rest
wdt, _, _ = once()
wdt2, _, _ = once()
print("READY " + json.dumps(
    {"cpus": cpus, "n_docs": n,
     "warmup_sec": [round(wdt, 2), round(wdt2, 2)]}), flush=True)
for line in sys.stdin:
    cmd = line.strip()
    if cmd == "RUN":
        dt, n_dup, checksum = once()
        print("RESULT " + json.dumps(
            {"wall_sec": round(dt, 2), "n_nontrivial_members": n_dup,
             "cluster_checksum": checksum}), flush=True)
    elif cmd == "EXIT":
        break
spark.stop()
"""


def _freeze(proc: subprocess.Popen) -> None:
    """SIGSTOP the child's whole process group (python driver + JVM + python
    workers). Idle levels hold a warm 6g JVM whose GC/heartbeat threads run on
    core pins OVERLAPPING the measured level's (local[16] is pinned to cores
    0-15 while local[1] is timed on core 0); freezing them makes each timed run
    the only live Spark process on the machine. Local-mode Spark has no
    cross-process liveness protocol, so a frozen JVM resumes cleanly."""
    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGSTOP)
    except (OSError, ProcessLookupError):
        pass


def _thaw(proc: subprocess.Popen) -> None:
    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGCONT)
    except (OSError, ProcessLookupError):
        pass


def _await(proc: subprocess.Popen, prefix: str) -> dict:
    """Read child stdout until a `<prefix> {json}` line (Spark banners ignored)."""
    while True:
        line = proc.stdout.readline()
        if not line:
            raise RuntimeError(f"child died awaiting {prefix}")
        if line.startswith(prefix + " "):
            return json.loads(line[len(prefix) + 1:])


def _aba_order(levels: list[int]) -> list[int]:
    """Per-trial run order with A-B-A drift bracketing (round-5 review: was a
    per-level-list ladder that silently fell through to NO bracketing for new
    combinations). The SLOWEST level (fewest cores -> longest wall) is the
    long leg of every N->4N ratio it appears in, so run the next level up
    both BEFORE and AFTER it; the efficiency already averages all of a
    level's runs within the trial, so the two short legs cancel monotone host
    drift to first order. Remaining levels follow in ascending order.
    Derives the historical orders exactly: [1,4,16] -> [4,1,4,16];
    [1,4] -> [4,1,4]; [4,16] -> [16,4,16]."""
    lv = sorted(levels)
    return [lv[1], lv[0], lv[1]] + lv[2:] if len(lv) >= 2 else lv


def _spin_rate(duration: float = 1.0) -> float:
    """Pinned single-core spin rate — instantaneous host-speed probe (the parent
    is pinned to the last core, away from every child's 0..N-1 pin)."""
    t_end = time.perf_counter() + duration
    n, x = 0, 1.0001
    while time.perf_counter() < t_end:
        for _ in range(10_000):
            x = x * 1.0000001 % 1e9
        n += 1
    return round(n / duration, 1)


class _SpinSampler:
    """Samples the host's instantaneous single-core speed on the parent's core
    for the whole duration of a child's timed run. The mean sample during a run
    is the measured host speed for that run; the ratio of two runs' means is the
    measured drift between them. This turns the hypervisor's time-varying CPU
    delivery (spin rate observed swinging 1147-2167/s across minutes on this
    box) from an uncontrolled confound into a recorded, correctable quantity."""

    def __init__(self):
        import threading

        self._samples: list[float] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def _loop(self):
        while not self._stop.is_set():
            self._samples.append(_spin_rate(0.5))

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join()

    @property
    def mean(self) -> float:
        return round(sum(self._samples) / max(len(self._samples), 1), 1)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_json = sys.argv[2] if len(sys.argv) > 2 else "SCALING.json"
    levels = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "1,4,16").split(",")
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:  # park the parent on the last core, clear of the children's pins
        os.sched_setaffinity(0, {os.cpu_count() - 1})
    except OSError:
        pass

    procs: dict[int, subprocess.Popen] = {}
    ready: dict[int, dict] = {}
    try:
        # start + warm sequentially: concurrent warmups would contend for cores
        for cpus in levels:
            p = subprocess.Popen(
                ["taskset", "-c", f"0-{cpus - 1}",
                 sys.executable, "-c", CHILD, str(cpus), sf_dir, str(REPLICATE),
                 HEAP],
                cwd=repo, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                text=True, bufsize=1, start_new_session=True,
            )
            procs[cpus] = p
            ready[cpus] = _await(p, "READY")
            print(f"level local[{cpus}] ready: {ready[cpus]}", file=sys.stderr)
            _freeze(p)  # stay frozen except during its own timed runs

        # A-B-A sandwich (paired-design drift cancellation): the short 4-core
        # leg runs BOTH before and after the long 1-core leg, and the 1->4
        # ratio uses the MEAN of the two 4-leg measurements. The plain
        # interleaved order samples the host ~10 min apart for the two legs of
        # the ratio, so a monotone host-speed drift across the trial (burst
        # credit draining/refilling — the observed failure mode: 1-core walls
        # swung 426-660 s across trials of identical work) lands entirely in
        # the ratio; bracketing makes it cancel to first order, because the
        # mean of the two 4-legs measures the 4-core wall at the effective
        # host speed of the 1-leg's midpoint. The spin-rate normalization
        # stays on top as the measured (not assumed) second line of defense.
        order = _aba_order(levels)
        trials: list[dict] = []
        for t in range(N_TRIALS):
            trial: dict = {"runs": {}, "spin_rate": {}}
            for cpus in order:
                time.sleep(GAP_SEC)  # idle gap: every child is frozen here
                _thaw(procs[cpus])
                procs[cpus].stdin.write("RUN\n")
                procs[cpus].stdin.flush()
                with _SpinSampler() as sampler:
                    res = _await(procs[cpus], "RESULT")
                trial["runs"].setdefault(str(cpus), []).append(res)
                trial["spin_rate"].setdefault(str(cpus), []).append(sampler.mean)
                _freeze(procs[cpus])

            def _walls(c):
                return [r["wall_sec"] for r in trial["runs"][str(c)]]

            def _works(c):
                # wall x measured host speed = machine-independent work units
                return [
                    r["wall_sec"] * s
                    for r, s in zip(trial["runs"][str(c)], trial["spin_rate"][str(c)])
                ]

            _mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
            for lo, hi in zip(levels, levels[1:]):
                if hi == 4 * lo:
                    trial[f"eff_{lo}_to_{hi}"] = round(
                        _mean(_walls(lo)) / (4 * _mean(_walls(hi))), 3,
                    )
                    # host-speed-corrected: each wall rescaled by the measured
                    # mean host speed DURING that run, so residual drift the
                    # sandwich cannot cancel is corrected by measurement
                    trial[f"eff_{lo}_to_{hi}_normalized"] = round(
                        _mean(_works(lo)) / (4 * _mean(_works(hi))), 3,
                    )
            trials.append(trial)
            print(f"trial {t}: " + json.dumps(trial), file=sys.stderr)
    finally:
        for p in procs.values():
            _thaw(p)
            try:
                p.stdin.write("EXIT\n")
                p.stdin.flush()
            except OSError:
                pass
        for p in procs.values():
            p.wait(timeout=120)

    summary: dict = {}
    n_docs = ready[levels[0]]["n_docs"]
    for cpus in levels:
        all_walls = [
            r["wall_sec"] for t in trials for r in t["runs"][str(cpus)]
        ]
        walls = sorted(all_walls)
        best, med = walls[0], walls[len(walls) // 2]
        summary[f"local{cpus}"] = {
            "cpus": cpus,
            "n_docs": n_docs,
            "wall_sec": best,
            "wall_sec_median": med,
            "runs_sec": all_walls,
            "docs_per_sec": round(n_docs / best, 1),
            "docs_per_sec_median": round(n_docs / med, 1),
            "n_nontrivial_members": trials[0]["runs"][str(cpus)][0][
                "n_nontrivial_members"
            ],
        }
    for lo, hi in zip(levels, levels[1:]):
        if hi == 4 * lo:
            effs = sorted(t[f"eff_{lo}_to_{hi}"] for t in trials)
            summary[f"scaling_efficiency_{lo}_to_{hi}"] = effs[len(effs) // 2]
            summary[f"scaling_efficiency_{lo}_to_{hi}_trials"] = [
                t[f"eff_{lo}_to_{hi}"] for t in trials
            ]
            summary[f"scaling_efficiency_{lo}_to_{hi}_min"] = effs[0]
            neffs = sorted(t[f"eff_{lo}_to_{hi}_normalized"] for t in trials)
            summary[f"scaling_efficiency_{lo}_to_{hi}_normalized"] = neffs[
                len(neffs) // 2
            ]
            summary[f"scaling_efficiency_{lo}_to_{hi}_normalized_trials"] = [
                t[f"eff_{lo}_to_{hi}_normalized"] for t in trials
            ]
            summary[f"scaling_efficiency_{lo}_to_{hi}_normalized_min"] = neffs[0]
    checksums = {
        r["cluster_checksum"]
        for t in trials for c in levels for r in t["runs"][str(c)]
    }
    summary["deterministic_clusters"] = len(checksums) == 1
    summary["cluster_checksum"] = trials[0]["runs"][str(levels[0])][0][
        "cluster_checksum"
    ]
    summary["host_spin_rates"] = [t["spin_rate"] for t in trials]
    summary["sf_dir"] = sf_dir
    summary["heap"] = HEAP
    summary["replicate"] = REPLICATE
    summary["protocol"] = (
        f"persistent pinned child per level (taskset, fresh JVM, {HEAP} heap, "
        f"replicate={REPLICATE}, AQE "
        "off at bench scale, untimed warmup run), idle levels' process groups "
        "SIGSTOPped so each timed run is the only live Spark process (idle "
        "JVMs' GC threads share overlapping core pins otherwise), levels "
        "interleaved per trial in an A-B-A sandwich (the 4-core leg runs "
        "before AND after the 1-core leg; ratios use the mean of the two "
        "4-leg walls, cancelling monotone host drift across the trial to "
        "first order) "
        f"so each efficiency ratio is computed within one host window; "
        f"{N_TRIALS} trials, {GAP_SEC}s idle gaps, median-of-trial-ratios "
        "headline with the full per-trial list + min alongside; the parent "
        "continuously samples pinned single-core spin rate on its own core "
        "DURING every run, and the *_normalized efficiencies rescale each wall "
        "time by the measured mean host speed during that run (the hypervisor's "
        "CPU delivery drifts 1.1-2.2k spin/s across minutes on this box — "
        "measured, not assumed); see BASELINE.md + CALIBRATION.json for the "
        "host's own scaling ceilings"
    )
    print(json.dumps(summary, indent=2))
    with open(os.path.join(repo, out_json) if not os.path.isabs(out_json)
              else out_json, "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
