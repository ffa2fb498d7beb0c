#!/bin/bash
# Interleaved A/B MoR-only level runs against the shared /dev/shm feed.
# Usage: exp_mor.sh <tag> [extra env assignments...]
set -e
cd /root/repo
export SPARK_GRAFT_EVENTS=16000000 SPARK_GRAFT_BATCHES=10 SPARK_GRAFT_REPS=1 \
       SPARK_GRAFT_BENCH_MODE=cdc_only SPARK_GRAFT_WRITE_MODES=mor \
       SPARK_GRAFT_FEED_DIR=/dev/shm/mor_feed
tag="$1"; shift
for kv in "$@"; do export "$kv"; done
for rep in 1 2; do
  for cpus in 8 32; do
    out=$(taskset -c 0-$((cpus-1)) env SPARK_GRAFT_CPUS=$cpus python bench.py 2>/dev/null | grep -o '{"metric.*')
    dur=$(echo "$out" | python3 -c "import json,sys; d=json.load(sys.stdin); print(d['headline']['duration_s'])")
    echo "$tag rep$rep cpus$cpus dur=$dur"
  done
done
