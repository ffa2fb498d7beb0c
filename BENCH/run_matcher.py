"""Matcher-side benchmark (SURVEY.md §3.2; reference gdc_benchmark.py:65-238).

Loops the F4 fixture family (sandbox stand-in for the GDC/Valentine corpora —
no benchmark data ships with the reference snapshot) through
``run_matcher_benchmark`` and writes per-pair MRR / Recall@GT / Recall@5 /
runtime rows to ``BENCH/matcher_results.csv`` via the S4 append-CSV sink
(header once, resume-safe).

Usage: python BENCH/run_matcher.py [out_csv]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_csv = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH", "matcher_results.csv"
    )
    from magneto_matcher_spark.benchrunner import run_matcher_benchmark
    from magneto_matcher_spark.session import get_spark
    from magneto_matcher_spark.sources.fixtures import make_matching_pair

    spark = get_spark(app_name="matcher_bench")

    pairs = []
    for n_rows in (60, 120, 240, 480):
        src, tgt, gt = make_matching_pair(spark, n_rows=n_rows)
        pairs.append((f"f4_n{n_rows}", src, tgt, gt))

    # default configuration (embedding + equal, the reference's live path)
    rows = run_matcher_benchmark(
        spark, pairs, out_csv, benchmark="f4-family", method="magneto-spark"
    )
    # + strsim, mirroring the reference's include_strsim ablation arm
    rows += run_matcher_benchmark(
        spark, pairs, out_csv, benchmark="f4-family",
        method="magneto-spark+strsim", include_strsim_matches=True,
    )
    # + BP reranker arm (run_bp_gdc.py:74-80)
    rows += run_matcher_benchmark(
        spark, pairs, out_csv, benchmark="f4-family",
        method="magneto-spark+bp", include_strsim_matches=True,
        use_bp_reranker=True,
    )
    for r in rows:
        print(r)
    print(f"wrote {out_csv}")


if __name__ == "__main__":
    main()
