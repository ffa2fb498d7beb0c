"""Provisioned-layout CoW scaling supplement.

The official scaling table (BENCH/BASELINE.md) holds the table layout FIXED
across parallelism levels (n_buckets=32) to isolate executor-thread scaling.
That is the conservative reading for CoW: its merge rewrites touched buckets
in a single n_buckets-task wave, so at local[32] the fixed layout gives one
task per core with no room to re-balance stragglers — the documented
residual behind cow 8→32 ≈ 0.34.

Real deployments provision partition counts to the cluster (Iceberg tables
are bucketed for the fleet that writes them).  This supplement measures that
operating point: local[8] with 32 buckets (4 tasks/core) vs local[32] with
128 buckets (4 tasks/core) — same feed, same engine, layout scaled WITH the
level, exactly as a 4x-larger cluster would run 4x the buckets.  The
fixed-layout local[32]x32 point is re-measured in the SAME interleaved
rounds so both efficiencies share one host window and one local[8] anchor.

Methodology inherited from run_scaling.py: shared byte-identical feed,
fresh taskset-pinned JVM per run, levels interleaved x reps, min-of-reps,
memory-bandwidth probe first (host-health gate: the 8v32 aggregate
bandwidth ratio must look like the healthy ~3.5x window, else numbers are
co-tenancy noise).

Writes BENCH/BASELINE_PROVISIONED_COW.md.
Usage: python BENCH/run_provisioned_cow.py [n_events] [n_batches] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_scaling import (  # noqa: E402
    REPO,
    measure_mem_bandwidth,
    prepare_shared_feed,
    run_level,
)


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    print("=== host-health gate: memory bandwidth ===", flush=True)
    bw = measure_mem_bandwidth()
    ratio_8_32 = bw[32] / bw[8] if bw.get(8) else float("nan")
    healthy = ratio_8_32 >= 3.0
    print(json.dumps({"bw": bw, "ratio_8_32": round(ratio_8_32, 2),
                      "healthy_window": healthy}), flush=True)

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    feed_dir = tempfile.mkdtemp(prefix="provcow_feed_", dir=base)
    # configs: (label, cpus, n_buckets)
    configs = [
        ("local8_b32", 8, 32),
        ("local32_b32", 32, 32),
        ("local32_b128", 32, 128),
    ]
    results: dict[str, list[float]] = {c[0]: [] for c in configs}
    try:
        print("=== preparing shared feed ===", flush=True)
        prepare_shared_feed(feed_dir, n_events, n_batches)
        for rep in range(reps):
            for label, cpus, buckets in configs:
                os.environ["SPARK_GRAFT_BUCKETS"] = str(buckets)
                rec = run_level(
                    cpus, n_events, n_batches, feed_dir, modes="cow"
                )["by_write_mode"]["cow"]
                results[label].append(rec["duration_s"])
                print(json.dumps({"rep": rep, "config": label,
                                  "wall_s": rec["duration_s"]}), flush=True)
    finally:
        os.environ.pop("SPARK_GRAFT_BUCKETS", None)
        shutil.rmtree(feed_dir, ignore_errors=True)

    best = {k: min(v) for k, v in results.items()}
    eps = {k: n_events / v for k, v in best.items()}
    eff_fixed = best["local8_b32"] / best["local32_b32"] / 4
    eff_prov = best["local8_b32"] / best["local32_b128"] / 4
    out = {
        "n_events": n_events,
        "best_wall_s": {k: round(v, 2) for k, v in best.items()},
        "events_per_sec": {k: round(v, 1) for k, v in eps.items()},
        "all_reps_s": {k: [round(x, 2) for x in v] for k, v in results.items()},
        "eff_8_32_fixed_layout": round(eff_fixed, 3),
        "eff_8_32_provisioned": round(eff_prov, 3),
        "bw_ratio_8_32": round(ratio_8_32, 2),
        "healthy_window": healthy,
    }
    print(json.dumps(out), flush=True)

    md = f"""# BENCH/BASELINE_PROVISIONED_COW.md — CoW scaling with provisioned bucket layout

Question: how much of CoW's fixed-layout 8→32 residual is the LAYOUT
(n_buckets=32 → a single 32-task rewrite wave at local[32], one task per
core, stragglers un-rebalanceable) rather than the plan or the platform?

Setup: {n_events:,} events / {n_batches} batches, same shared feed, fresh
taskset-pinned JVMs, {reps} interleaved rounds, min-of-reps (methodology of
BENCH/run_scaling.py).  Host-health gate: aggregate memory bandwidth
8→32 procs = {ratio_8_32:.2f}x ({'healthy' if healthy else 'DEGRADED — treat numbers as noise'};
healthy window ≈ 3.5x).  The provisioned point runs local[32] with
n_buckets=128 — 4 rewrite tasks per core, the tasks-per-core ratio
local[8]x32 has — mirroring how a 4x cluster provisions 4x the buckets.

| config | best wall (s) | events/sec | all reps (s) |
|---|---|---|---|
| local[8], 32 buckets (anchor) | {best['local8_b32']:.2f} | {eps['local8_b32']:,.0f} | {out['all_reps_s']['local8_b32']} |
| local[32], 32 buckets (fixed layout) | {best['local32_b32']:.2f} | {eps['local32_b32']:,.0f} | {out['all_reps_s']['local32_b32']} |
| local[32], 128 buckets (provisioned) | {best['local32_b128']:.2f} | {eps['local32_b128']:,.0f} | {out['all_reps_s']['local32_b128']} |

CoW 8→32 efficiency: **{eff_fixed:.3f} fixed layout → {eff_prov:.3f}
provisioned** (same host window, same local[8] anchor).

Reading: {'provisioning the layout to the level lifts CoW high-N scaling — the fixed-layout table understates the deployment operating point'
          if eff_prov > eff_fixed + 0.02 else
          'at THIS feed scale provisioning does NOT help — the touched-table rewrite volume (~50k rows) divided by 128 buckets is below the per-task/per-file overhead floor, so finer layout is pure overhead, consistent with the files_per_bucket ablation.  The wave-parallelism hypothesis only becomes testable at rewrite volumes where a bucket task is compute-bound; at this scale CoW 8→32 remains amortization-bound (see BASELINE_BIGBATCH_COW.md: bigger batches DO lift it)'}.
The fixed-layout column remains the apples-to-apples thread-scaling
measurement reported in BENCH/BASELINE.md.
"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE_PROVISIONED_COW.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/BASELINE_PROVISIONED_COW.md", flush=True)


if __name__ == "__main__":
    main()
