"""Local replica of the driver's DuckDB-oracle correctness gate.

For every queries() entry: run the Spark DataFrame and (if present) the
oracle SQL in DuckDB over views registered on the same parquet files; compare
row count, sorted column names, and an order-insensitive value hash.

Usage: python BENCH/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    """Typed normalization mimicking the driver's comparator.

    The driver fetches both sides pandas-style and compares typed values, so
    an int64 123 and a float64 123.0 MUST hash differently (that exact
    divergence produced 3 round-2 hash-fails that this gate's old
    int-collapsing norm masked).  Floats keep their float rendering
    (repr keeps the trailing .0); ints stay ints.
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


def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from magneto_matcher_spark.queries import build_oracles, build_queries
    from magneto_matcher_spark.session import get_spark

    spark = get_spark(
        app_name="check_oracle", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "12g"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = build_queries(), build_oracles()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            # pandas-style fetch = the driver's typed view of the result
            s_pdf = sdf.toPandas()
            # Driver canonicalization replica: pandas sort_values over every
            # column.  Non-hashable cells (array/map/struct results) raise
            # here exactly as they do driver-side — fail locally, not in r+1.
            if len(s_pdf):
                s_pdf.sort_values(by=list(s_pdf.columns))
            s_rows = [tuple(r) for r in s_pdf.itertuples(index=False)]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {str(ex)[:400]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: rows={len(s_rows)} cols={s_cols} ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            # .df() (not fetchall) so HUGEINT/epoch() land as float64 exactly
            # as the driver sees them — fetchall()'s Python ints masked the
            # round-2 type divergences.
            d_pdf = res.df()
            d_cols = list(d_pdf.columns)
            d_rows = [tuple(r) for r in d_pdf.itertuples(index=False)]
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {str(ex)[:400]}")
            n_fail += 1
            continue
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_count = len(s_rows) == len(d_rows)
        s_fp = frame_fingerprint(s_cols, s_rows)
        d_fp = frame_fingerprint(d_cols, d_rows)
        ok_hash = s_fp == d_fp
        if ok_cols and ok_count and ok_hash:
            print(f"PASS  {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(
                f"FAIL  {name}: cols_ok={ok_cols} ({s_cols} vs {d_cols}) "
                f"count {len(s_rows)} vs {len(d_rows)} hash {s_fp} vs {d_fp}"
            )
            if not ok_hash and ok_count and ok_cols:
                s_set = {tuple(map(norm_cell, r)) for r in s_rows}
                d_set = {tuple(map(norm_cell, r)) for r in d_rows}
                print(f"      spark-only: {list(s_set - d_set)[:3]}")
                print(f"      duck-only : {list(d_set - s_set)[:3]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
