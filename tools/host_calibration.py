"""Host-calibration microbenchmarks: what scaling can THIS machine deliver?

Writes CALIBRATION.json with three ceilings, each measured at 1/4/16 pinned
processes (matching the scaling-bench levels):

- cpu:    cache-resident integer hashing (sha256 chains) — pure compute, no DRAM
          pressure. On healthy hardware scales ~linearly.
- dram:   streaming 64MB numpy transforms — pure memory bandwidth. On this
          sandbox VM, aggregate throughput SATURATES around 4 concurrent
          streams (16 processes move less data than 4) — the hard wall for any
          shuffle/cache-heavy phase of any engine run on this box.
- kernel: the engine's own signature kernel (shingle + 128-perm MinHash +
          SimHash over Arrow-batch-sized chunks) via plain multiprocessing —
          the pipeline's dominant genuine compute, free of Spark overhead.

Protocol (same per-trial interleaving as ``tools/scaling_bench.py``, and for the
same reason): the host's CPU delivery drifts over minutes (hypervisor burst
credit — this very benchmark measured pure-CPU 1->4 efficiency at 0.69 in one
window and 1.03 in another), so comparing levels measured minutes apart compares
two different hosts. Each trial measures every level back-to-back inside one
short window and the N->4N efficiency rate_4N / (4 * rate_N) is computed WITHIN
the trial; the report carries the per-trial lists plus median and min.

A full Spark pipeline mixes all three profiles plus unavoidable barrier latency;
its measured efficiency must land between `dram` (worst case) and `cpu` (best
case) on this host. See BASELINE.md for how these ceilings map to a real N -> 4N
executor cluster, where each executor brings its own DRAM and the `dram` wall
does not exist.

Usage: python tools/host_calibration.py [out_json]
Env: SPARK_GRAFT_CAL_TRIALS (default 3), SPARK_GRAFT_CAL_SECONDS (default 6).
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

LEVELS = (1, 4, 16)
SECONDS = float(os.environ.get("SPARK_GRAFT_CAL_SECONDS", "6"))
N_TRIALS = int(os.environ.get("SPARK_GRAFT_CAL_TRIALS", "3"))


def _pin(worker_idx: int) -> None:
    os.sched_setaffinity(0, {worker_idx})


def cpu_work(idx: int) -> int:
    _pin(idx)
    h = b"x"
    t0 = time.perf_counter()
    chunks = 0
    while time.perf_counter() - t0 < SECONDS:
        for _ in range(20_000):
            h = hashlib.sha256(h).digest()
        chunks += 1
    return chunks


def dram_work(idx: int) -> int:
    _pin(idx)
    a = np.random.default_rng(idx).integers(0, 2**60, size=8_000_000, dtype=np.int64)
    b = np.empty_like(a)
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < SECONDS:
        np.right_shift(a, 3, out=b)
        np.bitwise_xor(b, a, out=b)
        iters += 1
    return iters


def kernel_work(idx: int) -> int:
    _pin(idx)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import pandas as pd

    from cqaduplicatefind_spark.config import DedupConfig
    from cqaduplicatefind_spark.functions.hashing import TokenHasher
    from cqaduplicatefind_spark.functions.signatures import compute_signatures_pdf

    cfg = DedupConfig(shingle_k=3)
    hasher = TokenHasher(cfg.minhash_seed)
    rng = np.random.default_rng(idx)
    texts = pd.Series(
        [
            " ".join(f"tok{v}" for v in rng.integers(0, 5000, size=40))
            for _ in range(2000)
        ]
    )
    compute_signatures_pdf(texts, cfg, hasher)  # warm the token cache
    t0 = time.perf_counter()
    batches = 0
    while time.perf_counter() - t0 < SECONDS:
        compute_signatures_pdf(texts, cfg, hasher)
        batches += 1
    return batches


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "CALIBRATION.json"
    report: dict = {
        "levels": list(LEVELS),
        "seconds_per_trial": SECONDS,
        "n_trials": N_TRIALS,
        "protocol": (
            "persistent pinned worker pool per level; levels measured "
            "back-to-back within each trial; N->4N efficiency computed per "
            "trial (host speed drifts across minutes, so cross-trial ratios "
            "would compare different hosts); median of per-trial efficiencies "
            "headline, full lists + min alongside"
        ),
    }
    for name, fn in (("cpu", cpu_work), ("dram", dram_work), ("kernel", kernel_work)):
        pools = {n: mp.Pool(n) for n in LEVELS}
        for n, pool in pools.items():
            pool.map(fn, range(n))  # warmup (imports, allocations, page faults)
        trials: list[dict] = []
        for _ in range(N_TRIALS):
            rates: dict[str, float] = {}
            for n in LEVELS:
                t0 = time.perf_counter()
                res = pools[n].map(fn, range(n))
                rates[str(n)] = round(sum(res) / (time.perf_counter() - t0), 1)
            trial = {"rates_per_sec": rates}
            for lo, hi in zip(LEVELS, LEVELS[1:]):
                if hi == 4 * lo:
                    trial[f"eff_{lo}_to_{hi}"] = round(
                        rates[str(hi)] / (4 * rates[str(lo)]), 3
                    )
            trials.append(trial)
            time.sleep(5)
        for pool in pools.values():
            pool.terminate()
        summary: dict = {"trials": trials}
        for lo, hi in zip(LEVELS, LEVELS[1:]):
            if hi == 4 * lo:
                effs = sorted(t[f"eff_{lo}_to_{hi}"] for t in trials)
                summary[f"eff_{lo}_to_{hi}"] = effs[len(effs) // 2]
                summary[f"eff_{lo}_to_{hi}_min"] = effs[0]
                summary[f"eff_{lo}_to_{hi}_trials"] = [
                    t[f"eff_{lo}_to_{hi}"] for t in trials
                ]
        # median rates across trials, per level (for the BASELINE.md table)
        summary["rates_per_sec"] = {
            str(n): sorted(t["rates_per_sec"][str(n)] for t in trials)[
                N_TRIALS // 2
            ]
            for n in LEVELS
        }
        report[name] = summary
        print(name, json.dumps(summary), flush=True)
        time.sleep(15)  # refill burst budget between profiles
    json.dump(report, open(out_json, "w"), indent=2)


if __name__ == "__main__":
    main()
