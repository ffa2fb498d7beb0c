"""Evaluation metrics — M1-M5 (SURVEY.md §2.10).

Reference: ``experiments/benchmarks/benchmark_utils.py:27-134`` (MRR variants,
recall@k) and ``algorithms/topk_metrics.py:8-65`` (RecallAtTopK).  All set
intersections become semi/anti joins; ranks come from the W1 window the
matches frame already carries.

``matches``: (src_col, tgt_col, score, rank) — rank 1 = best per src_col.
``ground_truth``: (src_col, tgt_col) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ensure_rank(matches: DataFrame) -> DataFrame:
    if "rank" in matches.columns:
        return matches
    w = Window.partitionBy("src_col").orderBy(F.col("score").desc(), F.col("tgt_col"))
    return matches.withColumn("rank", F.row_number().over(w))


def mrr(matches: DataFrame, ground_truth: DataFrame, adjusted: bool = True) -> float:
    """M1/M2: mean reciprocal rank of the first correct match per source col.

    ``adjusted=True`` (benchmark_utils.py:45-72): average over source columns
    that HAVE ground truth; a column with GT but no hit contributes 0.
    ``adjusted=False`` (benchmark_utils.py:27-42): denominator = |GT| pairs.

    Documented divergences from the reference, pinned by the
    ``metrics_mrr_recall`` oracle (r05 ADVICE item, closed):
    - adjusted: the reference excludes GT source columns entirely absent
      from ``matches`` from the denominator; this implementation counts
      them as 0 contributions (a stricter, monotone-comparable metric).
    - simple: when one source column has multiple GT targets, the
      reference sums 1/rank once per (src, tgt) pair; this implementation
      uses the first (minimum-rank) hit per source column once.
    """
    m = _ensure_rank(matches)
    hits = m.join(ground_truth, ["src_col", "tgt_col"], "left_semi")
    first_hit = hits.groupBy("src_col").agg(F.min("rank").alias("first_rank"))
    if adjusted:
        gt_cols = ground_truth.select("src_col").distinct()
        per_col = gt_cols.join(first_hit, "src_col", "left").select(
            F.coalesce(1.0 / F.col("first_rank"), F.lit(0.0)).alias("rr")
        )
        row = per_col.agg(F.avg("rr").alias("mrr")).collect()[0]
        return float(row["mrr"] or 0.0)
    n_gt = ground_truth.count()
    s = first_hit.agg(F.sum(1.0 / F.col("first_rank")).alias("s")).collect()[0]["s"]
    return float((s or 0.0) / n_gt) if n_gt else 0.0


def recall_at_k(matches: DataFrame, ground_truth: DataFrame, k: int) -> float:
    """M3 (topk_metrics.py:20-40 + benchmark_utils.py:75-87): fraction of GT
    pairs present in the top-k candidate lists."""
    m = _ensure_rank(matches).filter(F.col("rank") <= k)
    hit = ground_truth.join(
        m.select("src_col", "tgt_col"), ["src_col", "tgt_col"], "left_semi"
    ).count()
    n_gt = ground_truth.count()
    return hit / n_gt if n_gt else 0.0


def recall_at_ground_truth(matches: DataFrame, ground_truth: DataFrame) -> float:
    """Recall@GT: k = number of GT pairs (valentine RecallAtSizeofGroundTruth).
    Uses GLOBAL top-|GT| by score (ties by src, tgt)."""
    n_gt = ground_truth.count()
    if not n_gt:
        return 0.0
    w = Window.orderBy(F.col("score").desc(), F.col("src_col"), F.col("tgt_col"))
    top = (
        matches.withColumn("_gr", F.row_number().over(w))
        .filter(F.col("_gr") <= n_gt)
        .select("src_col", "tgt_col")
    )
    hit = ground_truth.join(top, ["src_col", "tgt_col"], "left_semi").count()
    return hit / n_gt


def one_to_one(matches: DataFrame) -> DataFrame:
    """M4 helper: one-to-one filter with Valentine's greedy semantics — walk
    pairs by descending score (ties: src, tgt) and keep a pair iff neither
    side is taken yet.

    Greedy matching is order-sequential, so it runs on the DRIVER over the
    collected candidate set — metadata-sized by construction (post-top-k
    column pairs, not data).  The strict distributed variant (survives iff
    rank-1 in BOTH directions) is ``mutual_best``."""
    spark = matches.sparkSession
    rows = sorted(
        matches.collect(), key=lambda r: (-r["score"], r["src_col"], r["tgt_col"])
    )
    used_s, used_t, keep = set(), set(), []
    for r in rows:
        if r["src_col"] not in used_s and r["tgt_col"] not in used_t:
            used_s.add(r["src_col"])
            used_t.add(r["tgt_col"])
            keep.append(r.asDict())
    return spark.createDataFrame(keep, matches.schema)


def mutual_best(matches: DataFrame) -> DataFrame:
    """Distributed strict one-to-one: pair survives iff it is rank-1 for its
    src AND rank-1 for its tgt (both-directions row_number)."""
    ws = Window.partitionBy("src_col").orderBy(F.col("score").desc(), F.col("tgt_col"))
    wt = Window.partitionBy("tgt_col").orderBy(F.col("score").desc(), F.col("src_col"))
    return (
        matches.withColumn("_rs", F.row_number().over(ws))
        .withColumn("_rt", F.row_number().over(wt))
        .filter((F.col("_rs") == 1) & (F.col("_rt") == 1))
        .drop("_rs", "_rt")
    )


def precision_recall_f1(
    matches: DataFrame, ground_truth: DataFrame, at_rank: int = 1
) -> dict:
    """M4: P/R/F1 of the rank≤``at_rank`` predictions vs GT pairs."""
    pred = _ensure_rank(matches).filter(F.col("rank") <= at_rank).select(
        "src_col", "tgt_col"
    )
    tp = pred.join(ground_truth, ["src_col", "tgt_col"], "left_semi").count()
    n_pred = pred.count()
    n_gt = ground_truth.count()
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gt if n_gt else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return {"precision": precision, "recall": recall, "f1": f1, "tp": tp}


def misses(matches: DataFrame, ground_truth: DataFrame) -> DataFrame:
    """M5 (benchmark_utils.py:101-134): GT pairs absent from the candidates —
    the left_anti sink the reference logs for error analysis."""
    return ground_truth.join(
        matches.select("src_col", "tgt_col"), ["src_col", "tgt_col"], "left_anti"
    )
