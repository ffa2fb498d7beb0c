"""Shared DuckDB-oracle comparison core — the local replica of the driver's
correctness gate, used by both ``BENCH/check_oracle.py`` (CLI sweep) and
``tests/test_oracles_full.py`` (the every-run pytest gate over ALL
oracle-backed queries, not just the 50-slot driver window).

The comparison mimics the driver exactly: pandas-style fetch on both sides,
sorted column names, and an order-insensitive typed value hash (int64 123 and
float64 123.0 hash differently; NaN ≈ null; -0.0 normalized).
"""

from __future__ import annotations

import hashlib

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def norm_cell(v):
    """Typed normalization mimicking the driver's comparator.

    The driver fetches both sides pandas-style and compares typed values, so
    an int64 123 and a float64 123.0 MUST hash differently (that exact
    divergence produced 3 round-2 hash-fails that an int-collapsing norm
    masked).  Floats keep their float rendering (repr keeps the trailing .0);
    ints stay ints.
    """
    import numpy as np

    if v is None:
        return "\\N"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f != f:
            return "\\N"  # NaN ≈ null after a pandas round-trip
        if f == 0.0:
            f = 0.0  # normalize -0.0
        return repr(f)
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def frame_fingerprint(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def check_query(spark, con, name: str, fn, oracle_sql: str | None, sf_dir: str) -> dict:
    """Run one registry query and (if oracled) its DuckDB twin; return the
    driver-shaped verdict dict.  ``ok`` is True for a hash-green result AND
    for an error-free rows-only run (no oracle to disagree with)."""
    try:
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        # pandas-style fetch = the driver's typed view of the result
        s_pdf = sdf.toPandas()
        # Driver canonicalization replica: pandas sort_values over every
        # column.  Non-hashable cells (array/map/struct results) raise here
        # exactly as they do driver-side — fail locally, not in round r+1.
        if len(s_pdf):
            s_pdf.sort_values(by=list(s_pdf.columns))
        s_rows = [tuple(r) for r in s_pdf.itertuples(index=False)]
    except Exception as ex:  # noqa: BLE001 — driver records any error type
        return {"ok": False, "name": name, "rows_only": False,
                "detail": f"spark error: {type(ex).__name__}: {str(ex)[:400]}"}
    if oracle_sql is None:
        return {"ok": True, "name": name, "rows_only": True,
                "spark_rows": len(s_rows), "cols": s_cols, "detail": "rows-only"}
    try:
        # .df() (not fetchall) so HUGEINT/epoch() land as float64 exactly as
        # the driver sees them — fetchall()'s Python ints masked the round-2
        # type divergences.
        d_pdf = con.execute(oracle_sql).df()
        d_cols = list(d_pdf.columns)
        d_rows = [tuple(r) for r in d_pdf.itertuples(index=False)]
    except Exception as ex:  # noqa: BLE001
        return {"ok": False, "name": name, "rows_only": False,
                "detail": f"duckdb error: {type(ex).__name__}: {str(ex)[:400]}"}
    ok_cols = sorted(s_cols) == sorted(d_cols)
    ok_count = len(s_rows) == len(d_rows)
    s_fp = frame_fingerprint(s_cols, s_rows)
    d_fp = frame_fingerprint(d_cols, d_rows)
    ok = ok_cols and ok_count and s_fp == d_fp
    detail = f"rows={len(s_rows)}"
    if not ok:
        detail = (
            f"cols_ok={ok_cols} ({s_cols} vs {d_cols}) "
            f"count {len(s_rows)} vs {len(d_rows)} hash {s_fp} vs {d_fp}"
        )
        if ok_cols and ok_count:
            s_set = {tuple(map(norm_cell, r)) for r in s_rows}
            d_set = {tuple(map(norm_cell, r)) for r in d_rows}
            detail += (
                f" spark-only={list(s_set - d_set)[:3]}"
                f" duck-only={list(d_set - s_set)[:3]}"
            )
    return {"ok": ok, "name": name, "rows_only": False,
            "spark_rows": len(s_rows), "detail": detail}
