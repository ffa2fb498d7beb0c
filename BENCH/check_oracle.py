"""Local replica of the driver's DuckDB-oracle correctness gate (CLI).

For every queries() entry: run the Spark DataFrame and (if present) the
oracle SQL in DuckDB over views registered on the same parquet files; compare
row count, sorted column names, and an order-insensitive value hash.

The comparison core lives in ``magneto_matcher_spark.oracle_gate`` and is
also run as a pytest over ALL oracle-backed queries every test run
(``tests/test_oracles_full.py``) — this CLI is the ad-hoc/debug entry point.

Usage: python BENCH/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from magneto_matcher_spark.oracle_gate import check_query, register_views
    from magneto_matcher_spark.queries import build_oracles, build_queries
    from magneto_matcher_spark.session import get_spark

    spark = get_spark(
        app_name="check_oracle", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "12g"},
    )
    con = duckdb.connect()
    register_views(con, sf_dir)

    queries, oracles = build_queries(), build_oracles()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        res = check_query(spark, con, name, fn, oracles.get(name), sf_dir)
        dt = time.time() - t0
        if res.get("rows_only"):
            print(f"rows  {name}: rows={res['spark_rows']} cols={res['cols']} ({dt:.1f}s)")
            n_rows_only += 1
        elif res["ok"]:
            print(f"PASS  {name}: {res['detail']} ({dt:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {res['detail']}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
