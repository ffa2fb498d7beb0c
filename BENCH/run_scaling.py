"""North-rule scaling evidence: run the IDENTICAL CDC replay job at two
parallelism levels (local[8] vs local[32] — the sandbox surrogate for N vs 4N
executors, per the driver instruction) on the same input, report events/sec at
both plus scaling efficiency = (T_8 / T_32) / 4, and write BENCH/BASELINE.md.

Each level runs in a fresh JVM (subprocess) so nothing is shared or cached
across levels.  Usage: python BENCH/run_scaling.py [n_events] [n_batches]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_events: int, n_batches: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_EVENTS=str(n_events),
        SPARK_GRAFT_BATCHES=str(n_batches),
        SPARK_GRAFT_BENCH_MODE="cdc_only",
    )
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    wall = time.time() - t0
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    res["wall_s"] = round(wall, 1)
    return res


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    results = {}
    for cpus in (8, 32):
        print(f"=== local[{cpus}] ===", flush=True)
        results[cpus] = run_level(cpus, n_events, n_batches)
        print(json.dumps(results[cpus]["headline"]), flush=True)

    t8 = results[8]["headline"]["duration_s"]
    t32 = results[32]["headline"]["duration_s"]
    eff = (t8 / t32) / 4.0
    eps8 = results[8]["headline"]["events_per_sec"]
    eps32 = results[32]["headline"]["events_per_sec"]

    md = f"""# BENCH/BASELINE.md — measured engine numbers

## CDC MERGE replay throughput (headline, north rule)

Same job, same deterministic input (seed 42, {n_events:,} change events,
{n_batches} micro-batches, Zipf hot-key fraction 0.2), two parallelism
levels in fresh JVMs. `local[8]` vs `local[32]` is the sandbox surrogate for
N vs 4N executors (no real cluster available; allowed by the driver
instruction).  Work dir + shuffle dirs are tmpfs (/dev/shm): the box's single
shared disk does not scale with thread count the way a cluster's aggregate
I/O scales with executors, so disk-backed runs measure /dev/vda, not the
engine.  An untimed 20k-event warm-up replay amortizes JIT/codegen/committer
init out of the timed section.

| parallelism | apply wall (s) | events/sec |
|---|---|---|
| local[8]  (N)  | {t8:.1f} | {eps8:,.0f} |
| local[32] (4N) | {t32:.1f} | {eps32:,.0f} |

**Scaling efficiency (T_N / T_4N) / 4 = {eff:.3f}** (north-rule target ≥ 0.8).

Per-batch events/sec at local[32]: {results[32]["headline"]["per_batch_events_per_sec"]}

## 10^10-event positioning (honest extrapolation, not a measurement)

The measured replay profile is the sf-scaled local proxy. At 10^10 events the
same plan shape holds: dedup is a partial-aggregated (salted) shuffle of each
micro-batch, MERGE reads only the buckets the batch touches, and every stage
scales with executors — but numbers above are single-node; real-cluster
throughput depends on shuffle fabric and object-store I/O and is NOT claimed
here.
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
