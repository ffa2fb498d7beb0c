"""Supplementary measurement harness (guide §1.4/§1.5) — NOT the driver bench.

Times individual registry queries in isolation with the noop sink and dumps
``explain('formatted')`` plans, so optimization claims in OPTIMIZATION_r06.md
are backed by per-query numbers and committed plan files.  ``bench.py`` stays
frozen (driver contract).

Usage:
  python bench_extra.py time  [query ...]   # min-of-N noop-sink timings
  python bench_extra.py plan  [query ...]   # write explain('formatted') files
  python bench_extra.py both  [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), BENCH_EXTRA_REPS (default 3), BENCH_EXTRA_PLAN_DIR
(default plans/r06), BENCH_EXTRA_SUFFIX (plan file suffix, default 'before').
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "w4_max_lsn_dedup",
    "cdc_replay_final_state",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "text_quality_score",
    "text_lang_id",
    "magneto_get_matches_f4",
    "magneto_e2e_matches",
    "w_sessionize_gaps",
]


def get_session():
    import tempfile

    from magneto_matcher_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_dir = os.environ.get(
        "SPARK_GRAFT_WORKDIR",
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir(),
    )
    return get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
        extra_conf={"spark.local.dir": f"{shuffle_dir}/spark_local_extra_{cpus}"},
    )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    plan_dir = os.environ.get("BENCH_EXTRA_PLAN_DIR", "plans/r06")
    suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "before")

    from magneto_matcher_spark.queries import build_queries

    queries = build_queries()
    spark = get_session()
    sc = spark.sparkContext

    if mode in ("plan", "both"):
        os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        if mode in ("plan", "both"):
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(plan_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
        if mode in ("time", "both"):
            samples = []
            for r in range(reps):
                sc.setJobDescription(f"{name} rep{r}")
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
            out[name] = samples
            print(
                f"{name:30s} min={min(samples):7.3f}  samples={samples}",
                file=sys.stderr,
            )
    if out:
        print(json.dumps({k: {"min": min(v), "samples": v} for k, v in out.items()}))


if __name__ == "__main__":
    main()
