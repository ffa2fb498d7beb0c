"""String-similarity matcher — J2 (SURVEY.md §2.3).

Reference: ``get_str_similarity_candidates``
(algorithms/magneto/magneto/basic_matcher.py:51-79) — a Python double loop over
source×target column names scoring two similarities:

- ``alignment_score_consecutive`` (basic_matcher.py:11-44): greedy consecutive
  char alignment with gap ≤ 2 after ``preprocess_string``, with a length-ratio
  prune (longer > 2× shorter ⇒ 0).
- ``fuzzy_similarity`` (basic_matcher.py:47-48): ``fuzz.ratio/100``.
  fuzzywuzzy's pure-python ratio is difflib.SequenceMatcher with int rounding,
  which is what we use (fuzzywuzzy is unavailable; same definition).

Both column name sets are first stripped of their common prefix
(utils/utils.py:36-44) — table-wide boilerplate like ``gdc_`` shouldn't count
as similarity signal.

Spark shape: the pair space is |src_cols| × |tgt_cols| — a *metadata-sized*
cross join (thousands of pairs for very wide tables, never data-sized), scored
with one Arrow-batched pandas UDF; the dict-overwrite quirk of the reference
(fuzzy result replaces alignment result for the same pair, because it is
assigned second — basic_matcher.py:67-77) is preserved explicitly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def preprocess_string(s: str) -> str:
    """P4, Python twin of ``preprocess_string_expr`` for use inside UDFs
    (reference utils.py:70-72)."""
    return "".join(ch for ch in s if ch.isalnum()).lower()


def alignment_score_consecutive(
    str1: str, str2: str, max_distance: int = 2, size_ratio_threshold: int = 2
) -> float:
    """Greedy consecutive-character alignment score in [0, 1].

    Port of basic_matcher.py:11-44: walk the shorter string; for each char,
    scan forward in the longer string for the next occurrence; accept it only
    while the gap from the previous match is ≤ ``max_distance``, else stop
    looking for that char.  Score = matched chars / len(shorter).
    """
    s1, s2 = preprocess_string(str1), preprocess_string(str2)
    shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    if len(longer) > len(shorter) * size_ratio_threshold:
        return 0.0
    matches = 0
    last_index = -1
    for char in shorter:
        for i in range(last_index + 1, len(longer)):
            if longer[i] == char:
                if last_index == -1 or (i - last_index) <= max_distance:
                    matches += 1
                    last_index = i
                break
    return matches / len(shorter) if shorter else 0.0


def fuzzy_ratio(s1: str, s2: str) -> float:
    """fuzz.ratio/100 — difflib SequenceMatcher ratio with fuzzywuzzy's int
    rounding (basic_matcher.py:47-48)."""
    from difflib import SequenceMatcher

    if not s1 and not s2:
        return 0.0
    return round(100 * SequenceMatcher(None, s1, s2).ratio()) / 100.0


def common_prefix(strings: list[str]) -> str:
    """W5 (utils/utils.py:36-44): common prefix = prefix of min/max under sort."""
    if not strings:
        return ""
    first, last = min(strings), max(strings)
    i = 0
    while i < len(first) and i < len(last) and first[i] == last[i]:
        i += 1
    return first[:i]


@pandas_udf(T.DoubleType())
def alignment_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [alignment_score_consecutive(x or "", y or "") for x, y in zip(a, b)]
    )


@pandas_udf(T.DoubleType())
def fuzzy_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([fuzzy_ratio(x or "", y or "") for x, y in zip(a, b)])


def levenshtein_ratio_expr(a, b):
    """SQL-expressible similarity twin (1 - lev/max_len) used where the DuckDB
    oracle must reproduce the score exactly; NOT the fuzz.ratio definition."""
    return F.when(
        (F.length(a) == 0) & (F.length(b) == 0), F.lit(1.0)
    ).otherwise(
        1.0 - F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b)).cast("double")
    )


def levenshtein_distance(s1: str, s2: str) -> int:
    """Python twin of Spark's ``F.levenshtein`` (plain edit distance) for the
    driver-local cascade — both paths must score identically."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, start=1):
        cur = [i]
        for j, c2 in enumerate(s2, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def levenshtein_ratio(s1: str, s2: str) -> float:
    """Python twin of :func:`levenshtein_ratio_expr`."""
    if not s1 and not s2:
        return 1.0
    return 1.0 - levenshtein_distance(s1, s2) / float(max(len(s1), len(s2)))


def strsim_candidates(
    spark,
    source_cols: list[str],
    target_cols: list[str],
    alignment_threshold: float = 0.95,
    fuzzy_threshold: float = 0.6,
    priority: int = 1,
    flavor: str = "fuzzy",
) -> DataFrame:
    """J2: score all (src, tgt) column-name pairs; emit CANDIDATES rows.

    Keeps the reference's last-writer quirk: when both scores pass their
    thresholds, the fuzzy score wins (basic_matcher.py:67-77).

    ``flavor="levenshtein"`` swaps the fuzzy+alignment UDF pair for the
    pure-Catalyst ``levenshtein_ratio_expr`` on the lowercased
    prefix-stripped names (threshold = ``fuzzy_threshold``, no alignment
    branch) — bit-identical to a SQL oracle, so the end-to-end cascade can
    be driver-hash-verified.
    """
    prefix_s = common_prefix(list(source_cols))
    prefix_t = common_prefix(list(target_cols))

    # LocalTableScan frames (localframe.py): an RDD-backed pair would plan a
    # 1024-task CartesianProduct; these broadcast-nested-loop in one task
    from magneto_matcher_spark.localframe import local_df

    src = local_df(spark, [(c,) for c in source_cols], "src_col string")
    tgt = local_df(spark, [(c,) for c in target_cols], "tgt_col string")
    # F.replace with lit args, not an interpolated F.expr: a prefix
    # containing a quote/backslash must not break SQL parsing (the driver
    # twin uses Python str.replace — the two paths must accept equal inputs)
    pairs = src.crossJoin(tgt).select(
        "src_col",
        "tgt_col",
        (
            F.replace(F.col("src_col"), F.lit(prefix_s), F.lit(""))
            if prefix_s
            else F.col("src_col")
        ).alias("_ps"),
        (
            F.replace(F.col("tgt_col"), F.lit(prefix_t), F.lit(""))
            if prefix_t
            else F.col("tgt_col")
        ).alias("_pt"),
    )
    if flavor == "levenshtein":
        # project the O(len^2) ratio into a column ONCE, then threshold the
        # column — Catalyst does not CSE across When branches, so inlining
        # the expr in both condition and value would evaluate it twice per
        # pair (the same cost textops.quality_score_expr avoids)
        scored = pairs.withColumn(
            "_ratio", levenshtein_ratio_expr(F.lower("_ps"), F.lower("_pt"))
        ).withColumn(
            "score", F.when(F.col("_ratio") >= fuzzy_threshold, F.col("_ratio"))
        )
    else:
        scored = pairs.select(
            "src_col",
            "tgt_col",
            alignment_udf(F.col("_ps"), F.col("_pt")).alias("alignment"),
            fuzzy_ratio_udf(F.col("_ps"), F.col("_pt")).alias("fuzzy"),
        ).withColumn(
            "score",
            F.when(F.col("fuzzy") >= fuzzy_threshold, F.col("fuzzy")).otherwise(
                F.when(F.col("alignment") >= alignment_threshold, F.col("alignment"))
            ),
        )
    return (
        scored
        .filter(F.col("score").isNotNull())
        .select(
            "src_col",
            "tgt_col",
            F.col("score").cast("double").alias("score"),
            F.lit("strsim").alias("strategy"),
            F.lit(priority).alias("priority"),
        )
    )
