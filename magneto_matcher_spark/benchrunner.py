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


def completed_pairs(path: str) -> set[tuple[str, str, str]]:
    """Resume check: (benchmark, method, pair_name) keys already recorded
    (gdc_benchmark.py:158-165).  The benchmark field is part of the key so
    two benchmark families sharing an output CSV and pair names don't
    wrongly skip each other's pairs on resume."""
    if not os.path.exists(path):
        return set()
    with open(path, newline="") as fh:
        reader = csv.DictReader(fh)
        return {(r["benchmark"], r["method"], r["pair_name"]) for r in reader}


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
        if (benchmark, method, pair_name) in done:
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


# --------------------------------------------------------------------------
# Valentine corpus layout walk (valentine_benchmark.py:139-145, 296-315)
# --------------------------------------------------------------------------

def walk_valentine_pairs(spark, root: str, levels: int = 3, skip=frozenset()):
    """Yield (pair_name, source_df, target_df, gt_df) from a Valentine-layout
    corpus on disk.

    ``levels=1`` (reference ``run_valentine_benchmark_one_level``,
    valentine_benchmark.py:139-145): ``ROOT/<folder>/<folder.lower()>_source
    .csv`` + ``_target.csv`` + ``_mapping.json``.

    ``levels=3`` (``run_valentine_benchmark_three_levels``,
    valentine_benchmark.py:296-315): an extra suite directory —
    ``ROOT/<type>/<table_folder>/<table_folder>_source.csv`` — where <type>
    is Unionable / View-Unionable / Joinable / Semantically-Joinable;
    ``pair_name`` is ``"<type>/<table_folder>"`` so the suite survives into
    the results CSV.

    Pairs with an empty ground truth are skipped, like the reference
    (valentine_benchmark.py:153-154, 327-328).  Deterministic order: sorted
    directory listings.

    ``skip``: pair_names to skip BEFORE any file read or Spark job — the
    resume path (pairs already in the results CSV) costs O(1) per skipped
    pair instead of two inferSchema scans + a ground-truth count job.
    """
    from pyspark.sql import functions as F

    from magneto_matcher_spark.sources.fixtures import read_ground_truth_json

    def _triple(folder: str, stem: str):
        return (
            os.path.join(folder, stem + "_source.csv"),
            os.path.join(folder, stem + "_target.csv"),
            os.path.join(folder, stem + "_mapping.json"),
        )

    def _load(pair_name: str, src_p: str, tgt_p: str, map_p: str):
        if pair_name in skip:
            return None
        if not (os.path.exists(src_p) and os.path.exists(tgt_p)
                and os.path.exists(map_p)):
            return None
        gt = read_ground_truth_json(spark, map_p).select(
            F.col("source_column").alias("src_col"),
            F.col("target_column").alias("tgt_col"),
        )
        if gt.limit(1).count() == 0:
            return None
        src = spark.read.csv(src_p, header=True, inferSchema=True)
        tgt = spark.read.csv(tgt_p, header=True, inferSchema=True)
        return (pair_name, src, tgt, gt)

    if levels == 1:
        for folder in sorted(os.listdir(root)):
            d = os.path.join(root, folder)
            if not os.path.isdir(d):
                continue
            item = _load(folder, *_triple(d, folder.lower()))
            if item:
                yield item
        return
    for suite in sorted(os.listdir(root)):
        sd = os.path.join(root, suite)
        if not os.path.isdir(sd):
            continue
        for folder in sorted(os.listdir(sd)):
            d = os.path.join(sd, folder)
            if not os.path.isdir(d):
                continue
            item = _load(f"{suite}/{folder}", *_triple(d, folder))
            if item:
                yield item


def run_valentine_benchmark(
    spark,
    root: str,
    out_csv: str,
    levels: int = 3,
    benchmark: str = "valentine",
    **kwargs,
) -> list[dict]:
    """Directory-walking wrapper over :func:`run_matcher_benchmark` for a
    Valentine-layout corpus, plus per-suite aggregation: one ``<suite>:mean``
    row per suite carries the suite's mean MRR / recall / runtime (the
    reference reports per-dataset means from the same CSV downstream).

    Resume-safe and idempotent: already-recorded pairs are skipped before
    any file read or Spark job, and the mean rows are RECOMPUTED over every
    per-pair row in the CSV on each call (stale ``:mean`` rows from earlier
    partial runs are dropped and rewritten), so a resumed run never records
    a partial-suite mean."""
    method = kwargs.get("method", "magneto-spark")
    done = completed_pairs(out_csv)
    skip = {
        p for (b, m, p) in done
        if b == benchmark and m == method and not p.endswith(":mean")
    }
    pairs = list(walk_valentine_pairs(spark, root, levels=levels, skip=skip))
    results = run_matcher_benchmark(
        spark, pairs, out_csv, benchmark=benchmark, **kwargs
    )
    summaries = _rewrite_suite_means(out_csv, levels, benchmark, method)
    return results + summaries


def _rewrite_suite_means(
    out_csv: str, levels: int, benchmark: str, method: str
) -> list[dict]:
    """Recompute THIS (benchmark, method)'s ``:mean`` rows over all of its
    per-pair rows and rewrite the CSV with exactly one mean row per suite.
    Other families sharing the CSV are untouched — their per-pair AND mean
    rows pass through verbatim (``levels`` only interprets this family's
    pair names).  The rewrite is atomic (temp file + ``os.replace``) so a
    crash mid-write can never destroy previously recorded results."""
    if not os.path.exists(out_csv):
        return []
    with open(out_csv, newline="") as fh:
        rows = list(csv.DictReader(fh))
    ours = lambda r: r["benchmark"] == benchmark and r["method"] == method  # noqa: E731
    kept = [
        r for r in rows
        if not (ours(r) and r["pair_name"].endswith(":mean"))
    ]
    groups: dict[str, list[dict]] = {}
    for r in kept:
        if not ours(r) or r["pair_name"].endswith(":mean"):
            continue
        suite = (
            r["pair_name"].split("/")[0] if levels == 3 and "/" in r["pair_name"]
            else benchmark
        )
        groups.setdefault(suite, []).append(r)
    summaries = []
    for suite in sorted(groups):
        recs = groups[suite]
        mean = lambda k: round(sum(float(r[k]) for r in recs) / len(recs), 6)  # noqa: E731
        summaries.append({
            "benchmark": benchmark,
            "pair_name": f"{suite}:mean",
            "method": method,
            "runtime_s": mean("runtime_s"),
            "mrr": mean("mrr"),
            "recall_at_gt": mean("recall_at_gt"),
            "recall_at_k": mean("recall_at_k"),
            "n_src_cols": len(recs),  # repurposed: pair count in the suite
            "n_tgt_cols": 0,
            "n_gt": sum(int(r["n_gt"]) for r in recs),
            "topk": int(recs[0]["topk"]),
        })
    tmp = out_csv + ".tmp"
    with open(tmp, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(RESULT_HEADER)
        for r in kept:
            w.writerow([r[h] for h in RESULT_HEADER])
        for s in summaries:
            w.writerow([s[h] for h in RESULT_HEADER])
    os.replace(tmp, out_csv)
    return summaries


# --------------------------------------------------------------------------
# GDC corpus layout walk (gdc_benchmark.py:121-140)
# --------------------------------------------------------------------------

def walk_gdc_pairs(spark, root: str, target_csv: str | None = None,
                   skip=frozenset()):
    """Yield (pair_name, source_df, target_df, gt_df) from a GDC-layout
    corpus: per-source tables in ``ROOT/source-tables/<name>.csv``, matching
    ground-truth CSVs (same filename) in ``ROOT/ground-truth/<name>.csv``,
    and ONE shared concatenated target table (reference
    gdc_benchmark.py:121-140 — the GT listing drives the walk; a GT file
    without a source table is skipped, and the target is read once and
    shared by every pair).

    ``target_csv`` defaults to the reference's
    ``target-tables/gdc_unique_columns_concat_values.csv``; any single CSV
    under ``target-tables/`` is accepted as a fallback.  ``skip`` works like
    :func:`walk_valentine_pairs`'s — O(1) resume before any file read."""
    from pyspark.sql import functions as F

    from magneto_matcher_spark.sources.fixtures import read_ground_truth_csv

    if target_csv is None:
        default = os.path.join(
            root, "target-tables", "gdc_unique_columns_concat_values.csv"
        )
        if os.path.exists(default):
            target_csv = default
        else:
            tdir = os.path.join(root, "target-tables")
            cands = sorted(
                f for f in os.listdir(tdir) if f.endswith(".csv")
            ) if os.path.isdir(tdir) else []
            if not cands:
                return
            target_csv = os.path.join(tdir, cands[0])
    # the shared target is the LARGEST file in the corpus and inferSchema
    # scans it eagerly — defer until the first non-skipped pair so a fully
    # resumed (or empty) walk really is O(1), as the docstring promises
    tgt = None

    gt_dir = os.path.join(root, "ground-truth")
    src_dir = os.path.join(root, "source-tables")
    if not os.path.isdir(gt_dir):
        return
    for gt_file in sorted(os.listdir(gt_dir)):
        if not gt_file.endswith(".csv"):
            continue
        pair_name = gt_file[:-4]
        if pair_name in skip:
            continue
        src_p = os.path.join(src_dir, gt_file)
        if not os.path.exists(src_p):
            continue
        if tgt is None:
            tgt = spark.read.csv(target_csv, header=True, inferSchema=True)
        gt = read_ground_truth_csv(spark, os.path.join(gt_dir, gt_file)).select(
            F.col("source_column").alias("src_col"),
            F.col("target_column").alias("tgt_col"),
        )
        src = spark.read.csv(src_p, header=True, inferSchema=True)
        yield (pair_name, src, tgt, gt)


def run_gdc_benchmark(
    spark,
    root: str,
    out_csv: str,
    benchmark: str = "gdc",
    target_csv: str | None = None,
    **kwargs,
) -> list[dict]:
    """Directory-walking wrapper over :func:`run_matcher_benchmark` for a
    GDC-layout corpus — resume-safe like :func:`run_valentine_benchmark`,
    with one ``gdc:mean`` row recomputed over all recorded pairs."""
    method = kwargs.get("method", "magneto-spark")
    done = completed_pairs(out_csv)
    skip = {
        p for (b, m, p) in done
        if b == benchmark and m == method and not p.endswith(":mean")
    }
    pairs = list(walk_gdc_pairs(spark, root, target_csv=target_csv, skip=skip))
    results = run_matcher_benchmark(
        spark, pairs, out_csv, benchmark=benchmark, **kwargs
    )
    summaries = _rewrite_suite_means(out_csv, 1, benchmark, method)
    return results + summaries


# --------------------------------------------------------------------------
# encoding × sampling ablation grid
# (run_encoding_sampling_ablation_valentine.py:35-52, 94-170)
# --------------------------------------------------------------------------

def run_ablation_grid(
    spark,
    pairs: list[tuple],
    out_csv: str,
    encoding_modes=None,
    sampling_modes=None,
    sampling_sizes=(10, 30),
    benchmark: str = "ablation",
    **kwargs,
) -> list[dict]:
    """Grid-search ablation: run the full cascade over every pair for each
    (encoding_mode, sampling_mode, sampling_size) cell — the reference's
    encoding/sampling ablation (its grid: 9 encodings × 6 sampling modes ×
    sizes [10, 30]).  Defaults reproduce that grid from the repo's own
    mode registries.

    Each cell is encoded into the method column
    (``"<method>|<enc>|<samp>|<size>"``) so the S4 sink's resume key and
    the per-suite mean machinery work unchanged per cell; the reference
    instead widens the CSV header — same information, stable schema.

    The reference's other ablations are plain parameter cells of
    :func:`run_matcher_benchmark` (no extra runner needed): BP reranker
    (``method="magneto-bp", use_bp_reranker=True`` — run_bp_valentine.py),
    LLM reranker (``use_llm_reranker=True`` — gpt_matcher/
    run_gpt_reranker_valentine.py), and strategy-order ablation
    (``strategy_order=[...]`` — run_multistrategy_ablation_valentine.py)."""
    from itertools import product

    from magneto_matcher_spark.operators.sampling import MODES as SAMPLING_MODES
    from magneto_matcher_spark.operators.serialize import ENCODING_MODES

    encoding_modes = list(encoding_modes or ENCODING_MODES)
    sampling_modes = list(sampling_modes or SAMPLING_MODES)
    base_method = kwargs.pop("method", "magneto-spark")
    results = []
    for enc, samp, size in product(encoding_modes, sampling_modes, sampling_sizes):
        results += run_matcher_benchmark(
            spark,
            pairs,
            out_csv,
            benchmark=benchmark,
            method=f"{base_method}|{enc}|{samp}|{size}",
            encoding_mode=enc,
            sampling_mode=samp,
            sampling_size=size,
            **kwargs,
        )
    return results
