"""North-rule scaling evidence: run the IDENTICAL CDC replay job at two
parallelism levels (local[8] vs local[32] — the sandbox surrogate for N vs 4N
executors, per the driver instruction) on the same input, report events/sec at
both plus scaling efficiency = (T_8 / T_32) / 4, and write BENCH/BASELINE.md.

Each level runs in a fresh JVM (subprocess) so nothing is shared or cached
across levels.  Within a JVM the replay runs SPARK_GRAFT_REPS times after an
untimed warm-up and the best rep is reported: this VM's CPU is bursty (2-3x
wall-clock swings measured between byte-identical runs), so min-of-R is the
noise-robust throughput estimator.  Both write modes are measured: cow
(copy-on-write MERGE — rewrite touched buckets) and mor (merge-on-read —
append bucketed delta files, resolve at read).

Usage: python BENCH/run_scaling.py [n_events] [n_batches] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def prepare_shared_feed(feed_dir: str, n_events: int, n_batches: int) -> None:
    """Generate the warm-up + timed feed ONCE (at local[32]; generation is
    untimed) so both parallelism levels replay byte-identical files."""
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from magneto_matcher_spark.session import get_spark; "
        "from bench import prepare_feed; "
        "spark = get_spark(app_name='feedprep', master='local[32]', "
        "shuffle_partitions=32, extra_conf={'spark.ui.showConsoleProgress': 'false'}); "
        "prepare_feed(spark, %r, %d, %d)" % (REPO, feed_dir, n_events, n_batches)
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=3600,
                   capture_output=True, text=True)


def run_level(cpus: int, n_events: int, n_batches: int, reps: int,
              feed_dir: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_EVENTS=str(n_events),
        SPARK_GRAFT_BATCHES=str(n_batches),
        SPARK_GRAFT_REPS=str(reps),
        SPARK_GRAFT_BENCH_MODE="cdc_only",
        SPARK_GRAFT_WRITE_MODES="cow,mor",
        SPARK_GRAFT_FEED_DIR=feed_dir,
    )
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=7200,
    )
    wall = time.time() - t0
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    res["wall_s"] = round(wall, 1)
    return res


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import shutil
    import tempfile

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    feed_dir = tempfile.mkdtemp(prefix="scaling_feed_", dir=base)
    print("=== preparing shared feed ===", flush=True)
    prepare_shared_feed(feed_dir, n_events, n_batches)

    results = {}
    try:
        for cpus in (8, 32):
            print(f"=== local[{cpus}] ===", flush=True)
            results[cpus] = run_level(cpus, n_events, n_batches, reps, feed_dir)
            print(json.dumps(results[cpus]["by_write_mode"]), flush=True)
    finally:
        shutil.rmtree(feed_dir, ignore_errors=True)

    lines = []
    effs = {}
    for mode in ("cow", "mor"):
        m8 = results[8]["by_write_mode"][mode]
        m32 = results[32]["by_write_mode"][mode]
        eff = (m8["duration_s"] / m32["duration_s"]) / 4.0
        effs[mode] = eff
        lines.append(
            f"| {mode} | local[8]  (N)  | {m8['duration_s']:.1f} | "
            f"{m8['events_per_sec']:,.0f} | {m8['rep_durations_s']} |"
        )
        lines.append(
            f"| {mode} | local[32] (4N) | {m32['duration_s']:.1f} | "
            f"{m32['events_per_sec']:,.0f} | {m32['rep_durations_s']} |"
        )

    md = f"""# BENCH/BASELINE.md — measured engine numbers

## CDC MERGE replay throughput (headline, north rule)

Same job, same deterministic input (seed 42, {n_events:,} change events,
{n_batches} micro-batches, Zipf hot-key fraction 0.2, bucket/salt/feed layout
fixed across levels), two parallelism levels in fresh JVMs.  `local[8]` vs
`local[32]` is the sandbox surrogate for N vs 4N executors (no real cluster
available; allowed by the driver instruction).

Methodology notes:
- Work + shuffle dirs on tmpfs (/dev/shm): the box's single shared disk does
  not scale with thread count the way a cluster's aggregate I/O scales with
  executors, so disk-backed runs would measure /dev/vda, not the engine.
- Untimed 500k-event warm-up per JVM (JIT/codegen/committer init).
- Each level replays the same feed {reps}x into fresh tables; best rep
  reported (the VM's CPU is bursty: 2-3x swings between identical runs were
  measured, so min-of-R estimates engine throughput, not host noise).
- `cow` = copy-on-write MERGE (rewrite touched buckets, plain-scan reads);
  `mor` = merge-on-read (append bucketed delta files — O(batch) per merge —
  resolve max-LSN winners at read; `compact()` folds deltas).

| mode | parallelism | best wall (s) | events/sec | all reps (s) |
|---|---|---|---|---|
{chr(10).join(lines)}

**Scaling efficiency (T_N / T_4N) / 4: cow = {effs['cow']:.3f}, mor =
{effs['mor']:.3f}** (north-rule target >= 0.8).

## 10^10-event positioning (honest extrapolation, not a measurement)

The measured replay profile is the sf-scaled local proxy. At 10^10 events the
same plan shape holds: dedup is a partial-aggregated (salted) shuffle of each
micro-batch, MERGE touches only the buckets the batch hits (mor: appends only
delta files), and every stage scales with executors — but numbers above are
single-node; real-cluster throughput depends on shuffle fabric and
object-store I/O and is NOT claimed here.
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
