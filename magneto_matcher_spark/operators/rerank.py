"""Rerankers — R1/R2 (bipartite) and R3 (LLM interface + deterministic mock).

R1: the reference delegates one-to-one assignment to
``scipy.optimize.linear_sum_assignment`` (bp_reranker.py:2, algorithm spelled
out in the commented ``bipartite_filtering`` bp_reranker.py:6-51).  scipy is
unavailable, so a standard O(n³) Hungarian (augmenting-path with potentials)
is vendored here in pure numpy.  It runs DRIVER-SIDE on the collected top-k
candidate set — deliberately: the matrix is |src_cols| × |tgt_cols| (metadata-
sized, thousands at most); distributing it would add shuffles to a microscopic
problem (SURVEY.md §2.9).

R2: score rescaling per ``arrange_bipartite_matches`` (bp_reranker.py:54-87):
assigned pairs keep their scores; every other candidate is scaled by
``(min(assigned) − 0.01) / max(unassigned)`` so the assignment ranks first
while relative order among the rest is preserved.

R3: the LLM reranker (llm_reranker.py:34-179) is a pluggable scorer executed
as one call per source column; the sandbox provider is a deterministic mock
that formats candidates through the same ``Name(0.95); …`` codec and re-parses
them — exercising the parse/retry loop with zero network.
"""

from __future__ import annotations

import re

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# R1: Hungarian assignment (vendored, pure numpy)
# --------------------------------------------------------------------------

def linear_sum_assignment_maximize(score: np.ndarray) -> list[tuple[int, int]]:
    """Max-weight one-to-one assignment on a (possibly rectangular) matrix.

    Classic O(n³) Hungarian with row/column potentials on the cost matrix
    ``-score`` padded to square.  Returns (row, col) pairs restricted to the
    original shape.
    """
    n_rows, n_cols = score.shape
    n = max(n_rows, n_cols)
    cost = np.zeros((n, n), dtype=np.float64)
    cost[:n_rows, :n_cols] = -score  # maximize → minimize

    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=int)  # p[j] = row assigned to column j
    way = np.zeros(n + 1, dtype=int)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, np.inf)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], np.inf, 0
            for j in range(1, n + 1):
                if not used[j]:
                    cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    pairs = []
    for j in range(1, n + 1):
        i = p[j]
        if 1 <= i <= n_rows and 1 <= j <= n_cols:
            pairs.append((i - 1, j - 1))
    return pairs


# --------------------------------------------------------------------------
# R1+R2 over the candidates DataFrame
# --------------------------------------------------------------------------

def bp_rerank(candidates: DataFrame) -> DataFrame:
    """Bipartite rerank of a (src_col, tgt_col, score) frame.

    Collects the (tiny) candidate set, runs Hungarian on the dense score
    matrix (missing pairs = 0, bp_reranker.py:20-30, maximize=True :34), then
    applies the R2 rescale and returns a frame with the same columns, scores
    adjusted.  Assigned pairs that were not candidates are not invented
    (parity with reference: only existing entries are reordered/rescaled).
    """
    spark = candidates.sparkSession
    rows = candidates.collect()
    if not rows:
        return candidates

    extra_cols = [c for c in candidates.columns if c not in ("src_col", "tgt_col", "score")]
    src_cols = sorted({r["src_col"] for r in rows})
    tgt_cols = sorted({r["tgt_col"] for r in rows})
    s_idx = {c: i for i, c in enumerate(src_cols)}
    t_idx = {c: i for i, c in enumerate(tgt_cols)}
    mat = np.zeros((len(src_cols), len(tgt_cols)))
    by_pair = {}
    for r in rows:
        mat[s_idx[r["src_col"]], t_idx[r["tgt_col"]]] = r["score"]
        by_pair[(r["src_col"], r["tgt_col"])] = r

    assigned_pairs = {
        (src_cols[i], tgt_cols[j])
        for i, j in linear_sum_assignment_maximize(mat)
        if mat[i, j] > 0 and (src_cols[i], tgt_cols[j]) in by_pair
    }

    assigned = {k: by_pair[k]["score"] for k in assigned_pairs}
    others = {
        k: r["score"] for k, r in by_pair.items() if k not in assigned_pairs
    }
    out_rows = []
    if assigned:
        min_assigned = min(assigned.values())
        max_other = max(others.values()) if others else 0.0
        factor = (min_assigned - 0.01) / max_other if max_other > 0 else 1.0
    else:
        factor = 1.0
    for k, r in by_pair.items():
        d = r.asDict()
        if k not in assigned_pairs:
            d["score"] = d["score"] * factor
        out_rows.append(d)

    from magneto_matcher_spark.localframe import local_df

    return local_df(
        spark, [tuple(d[f] for f in candidates.columns) for d in out_rows],
        candidates.schema,
    ).select("src_col", "tgt_col", "score", *extra_cols)


# --------------------------------------------------------------------------
# R3: LLM reranker interface + deterministic mock
# --------------------------------------------------------------------------

_RESP_RE = re.compile(r"([^;()]+)\((\d*\.?\d+)\)")


def format_candidates(scored: list[tuple[str, float]]) -> str:
    """The ``Name(0.95); …`` response codec (llm_reranker.py:147-179 spirit)."""
    return "; ".join(f"{name}({score:.4f})" for name, score in scored)


def parse_candidates(text: str) -> list[tuple[str, float]]:
    out = []
    for m in _RESP_RE.finditer(text):
        name = m.group(1).strip().strip(";").strip()
        if name:
            out.append((name, float(m.group(2))))
    return out


def mock_llm_scorer(src_col: str, src_samples: list[str], candidates: list[tuple[str, float]]) -> str:
    """Deterministic stand-in for the chat call.  Mirrors the reference's
    prompt construction (magneto.py:142-147: column NAME + up to 10 SAMPLES),
    so the samples measurably change the output: score = mean of the
    name-name similarity and a sample-evidence term (fraction of sample
    tokens that match the candidate name).  Formatted through the codec
    so the parser is exercised end-to-end.

    The similarity is :func:`~magneto_matcher_spark.operators.strsim.
    levenshtein_ratio` — SQL-expressible (``1 - levenshtein/greatest(len)``),
    so the whole mock-rerank round trip (score → ``Name(0.95); …`` codec →
    parse) has an exact DuckDB oracle twin (``r3_llm_rerank_mock``); the
    round-3 fuzzy_ratio flavor had none (difflib has no SQL equivalent)."""
    from magneto_matcher_spark.operators.strsim import levenshtein_ratio

    def score(tgt: str) -> float:
        name_part = levenshtein_ratio(src_col.lower(), tgt.lower())
        if not src_samples:
            return round(name_part, 4)
        hits = sum(
            1 for s in src_samples
            if levenshtein_ratio(str(s).lower(), tgt.lower()) >= 0.5
        )
        return round(0.5 * name_part + 0.5 * hits / len(src_samples), 4)

    rescored = sorted(
        ((tgt, score(tgt)) for tgt, _ in candidates), key=lambda x: (-x[1], x[0])
    )
    return format_candidates(rescored)


def llm_rerank(
    candidates: DataFrame,
    scorer=mock_llm_scorer,
    max_attempts: int = 5,
    samples: dict[str, list[str]] | None = None,
    distributed: bool = False,
) -> DataFrame:
    """R3: one scorer call per source column, prompt built from the column
    name + its profile ``samples`` (reference magneto.py:142-147,
    llm_reranker.py:34-92); parse failures retry up to ``max_attempts``
    (llm_reranker.py:68-84).

    ``distributed=True`` runs the per-column calls as a grouped
    ``applyInPandas`` (one group per src_col — the shape for wide schemas /
    rate-limit parallelism); default is a driver loop over the collected
    groups, which is faster for metadata-sized schemas."""
    spark = candidates.sparkSession
    samples = samples or {}

    def rescore_group(src_col: str, cands: list) -> list[tuple]:
        parsed = []
        for _ in range(max_attempts):
            resp = scorer(src_col, samples.get(src_col, []), cands)
            parsed = parse_candidates(resp)
            if parsed:
                break
        if not parsed:
            # exhausted retries: keep the ORIGINAL candidates/scores rather
            # than silently emitting zero matches for this column — a rerank
            # failure must degrade to no-rerank, not to data loss (the
            # reference keeps the pre-rerank matches dict on failure too)
            return [(src_col, tgt, float(sc), "llm", 10) for tgt, sc in cands]
        return [(src_col, tgt, float(sc), "llm", 10) for tgt, sc in parsed]

    from magneto_matcher_spark.schemas import CANDIDATES_SCHEMA

    if distributed:
        import pandas as pd

        def apply_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
            src_col = pdf["src_col"].iloc[0]
            cands = list(zip(pdf["tgt_col"], pdf["score"]))
            rows = rescore_group(src_col, cands)
            return pd.DataFrame(
                rows, columns=["src_col", "tgt_col", "score", "strategy", "priority"]
            )

        return (
            candidates.select("src_col", "tgt_col", "score")
            .groupBy("src_col")
            .applyInPandas(apply_group, CANDIDATES_SCHEMA)
        )

    rows = candidates.collect()
    grouped: dict[str, list] = {}
    for r in rows:
        grouped.setdefault(r["src_col"], []).append((r["tgt_col"], r["score"]))
    out = []
    for src_col, cands in sorted(grouped.items()):
        out += rescore_group(src_col, cands)
    from magneto_matcher_spark.localframe import local_df

    return local_df(spark, out, CANDIDATES_SCHEMA)
