"""Matcher benchmark runner + S4 results sink (SURVEY.md §3.2).

Reference: ``run_benchmark`` (experiments/benchmarks/gdc_benchmark.py:65-238)
— loop over (source, target, ground-truth) table pairs, RESUME by skipping
pairs already present in the results CSV (gdc_benchmark.py:158-165), time
``get_matches``, compute MRR / Recall@GT, append one row per pair to a CSV
whose header is written exactly once (S4, benchmark_utils.py:137-156
``create_result_file`` / ``record_result``).

The sink is a driver-side file by design: results are one row per TABLE PAIR
(metadata-sized forever); a distributed writer would add a Spark job per
append for nothing.  The engine-side per-batch metrics sink (JSONL,
streaming/engine.py) is the data-scale sibling.
"""

from __future__ import annotations

import csv
import os
import time

RESULT_HEADER = [
    "benchmark",
    "pair_name",
    "method",
    "runtime_s",
    "mrr",
    "recall_at_gt",
    "recall_at_k",
    "n_src_cols",
    "n_tgt_cols",
    "n_gt",
    "topk",
]


def create_result_file(path: str, header: list[str] | None = None) -> None:
    """S4: write the header row IFF the file doesn't exist yet
    (benchmark_utils.py:137-146)."""
    if os.path.exists(path):
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", newline="") as fh:
        csv.writer(fh).writerow(header or RESULT_HEADER)


def record_result(path: str, row: list) -> None:
    """S4: append one result row (benchmark_utils.py:149-156)."""
    with open(path, "a", newline="") as fh:
        csv.writer(fh).writerow(row)


def completed_pairs(path: str) -> set[tuple[str, str]]:
    """Resume check: (method, pair_name) keys already recorded
    (gdc_benchmark.py:158-165)."""
    if not os.path.exists(path):
        return set()
    with open(path, newline="") as fh:
        reader = csv.DictReader(fh)
        return {(r["method"], r["pair_name"]) for r in reader}


def run_matcher_benchmark(
    spark,
    pairs: list[tuple],
    out_csv: str,
    benchmark: str = "fixture",
    method: str = "magneto-spark",
    topk: int = 20,
    recall_k: int = 5,
    **matcher_overrides,
) -> list[dict]:
    """Entry point 2 (§3.2): ``pairs`` is a list of
    (pair_name, source_df, target_df, gt_df) where gt_df has
    (src_col, tgt_col).  Returns the metric dicts of the pairs RUN this call
    (resumed pairs are skipped, like the reference)."""
    from magneto_matcher_spark.operators.metrics import (
        mrr,
        recall_at_ground_truth,
        recall_at_k,
    )
    from magneto_matcher_spark.plans.matcher import get_matches

    create_result_file(out_csv)
    done = completed_pairs(out_csv)
    results = []
    for pair_name, src, tgt, gt in pairs:
        if (method, pair_name) in done:
            continue
        t0 = time.time()
        matches = get_matches(src, tgt, topk=topk, **matcher_overrides)
        matches = matches.cache()
        n_matches = matches.count()  # materialize inside the timed window
        runtime = time.time() - t0
        rec = {
            "benchmark": benchmark,
            "pair_name": pair_name,
            "method": method,
            "runtime_s": round(runtime, 3),
            "mrr": round(mrr(matches, gt, adjusted=True), 6),
            "recall_at_gt": round(recall_at_ground_truth(matches, gt), 6),
            "recall_at_k": round(recall_at_k(matches, gt, k=recall_k), 6),
            "n_src_cols": len(src.columns),
            "n_tgt_cols": len(tgt.columns),
            "n_gt": gt.count(),
            "topk": topk,
        }
        matches.unpersist()
        record_result(out_csv, [rec[h] for h in RESULT_HEADER])
        results.append(rec)
        _ = n_matches
    return results
