"""Grade the ANN scale tiers, don't just floor them: measured recall@10 of
knn_topk_lsh / knn_topk_ivf against the brute-force oracle (knn_topk), across
the documented parameter points, on TWO corpora:

- the shipped embeddings fixture (synthetic, essentially clusterless — the
  adversarial case for learned cells), and
- a seeded Gaussian-blob corpus (``make_blob_embeddings``) — the case IVF is
  designed for, so the default operating point is graded where it actually
  operates, not only at its floor.

Reference analog: the retriever's accuracy-vs-k framing
(experiments/benchmarks/gdc_ablations.py:111-115) — at 100 TB the LSH/IVF
tiers are the ones that actually run, so their accuracy budget deserves a
number, not a smoke floor.

Writes BENCH/ANN_RECALL.md (a markdown table per tier per corpus) and prints
it.  Usage: python BENCH/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
N_QUERIES = 50

LSH_DEFAULT = (12, 4)   # (n_tables, n_bits)
IVF_DEFAULT = (16, 8)   # (n_cells, n_probe)


def recall_of(exact_rows, approx_rows) -> float:
    exact = {(r["vec_id"], r["neighbor_id"]) for r in exact_rows}
    approx = {(r["vec_id"], r["neighbor_id"]) for r in approx_rows}
    return len(exact & approx) / len(exact)


def grade(spark, emb):
    """Run the full LSH and IVF parameter grids on one corpus; returns
    (lsh_rows, ivf_rows, n_corpus, dim)."""
    from magneto_matcher_spark.operators.embedding import (
        knn_topk,
        knn_topk_ivf,
        knn_topk_lsh,
    )

    emb = emb.cache()
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
    return lsh_rows, ivf_rows, n_corpus, dim


def _tables(md, lsh_rows, ivf_rows):
    md += [
        "### LSH (`knn_topk_lsh`) — data-oblivious hyperplane buckets",
        "",
        "| n_tables | n_bits | recall@10 |",
        "|---|---|---|",
    ]
    for nt, nb, r in lsh_rows:
        mark = " ← default" if (nt, nb) == LSH_DEFAULT else ""
        md.append(f"| {nt} | {nb} | {r}{mark} |")
    md += [
        "",
        "### IVF (`knn_topk_ivf`) — learned cells, probe-N",
        "",
        "| n_cells | n_probe | recall@10 |",
        "|---|---|---|",
    ]
    for nc, np_, r in ivf_rows:
        mark = " ← default" if (nc, np_) == IVF_DEFAULT else ""
        md.append(f"| {nc} | {np_} | {r}{mark} |")
    md.append("")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from magneto_matcher_spark.session import get_spark
    from magneto_matcher_spark.sources.fixtures import make_blob_embeddings

    spark = get_spark(app_name="ann_recall", master="local[8]",
                      shuffle_partitions=16)

    print("== corpus: fixture (clusterless) ==", flush=True)
    fix = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lsh_f, ivf_f, n_f, dim_f = grade(spark, fix)

    print("== corpus: gaussian blobs (clustered) ==", flush=True)
    blobs = make_blob_embeddings(spark, n_vecs=2000, dim=64, n_clusters=20,
                                 intra_std=0.25, seed=7)
    lsh_b, ivf_b, n_b, dim_b = grade(spark, blobs)

    def pick(rows, key):
        return next(r for a, b, r in rows if (a, b) == key)

    md = [
        "# BENCH/ANN_RECALL.md — measured ANN tier accuracy",
        "",
        f"recall@{K} vs the brute-force oracle (`knn_topk`), {N_QUERIES}",
        "queries, graded on TWO corpora (produced by `python",
        "BENCH/ann_recall.py`; pytest floors in tests/test_matching.py are",
        "pinned to the default operating points marked below):",
        "",
        f"1. **fixture** — `{sf_dir}/embeddings.parquet` ({n_f} vectors, dim",
        f"   {dim_f}), synthetic and essentially clusterless: the",
        "   *adversarial* case for learned cells.",
        f"2. **blobs** — `make_blob_embeddings(seed=7)` ({n_b} vectors, dim",
        f"   {dim_b}, 20 Gaussian clusters, intra-std 0.25): the case IVF is",
        "   designed for — real embedding corpora (web text, images) cluster.",
        "",
        "## Corpus 1: fixture (clusterless — worst case)",
        "",
    ]
    _tables(md, lsh_f, ivf_f)
    md += [
        "Raise n_tables (more candidate unions) or lower n_bits (bigger",
        "buckets) to buy LSH recall with more within-bucket work.  IVF recall",
        "here needs a ~50% probe ratio because there are no real cells to",
        "learn — this table is the tier's FLOOR, not its operating point.",
        "",
        "## Corpus 2: Gaussian blobs (clustered — design case)",
        "",
    ]
    _tables(md, lsh_b, ivf_b)
    md += [
        "On a clustered corpus the learned cells align with the real",
        f"clusters: IVF default recall {pick(ivf_b, IVF_DEFAULT)} (vs",
        f"{pick(ivf_f, IVF_DEFAULT)} clusterless) and probe-2 of 16 cells",
        f"already reaches {next(r for a, b, r in ivf_b if (a, b) == (16, 2))}",
        "— an 8× candidate-set reduction at high recall, which is the knob",
        "that matters at 100 TB.  LSH default:",
        f"{pick(lsh_b, LSH_DEFAULT)} (vs {pick(lsh_f, LSH_DEFAULT)}).",
        "",
        "Floors asserted in pytest: LSH default ≥ 0.8 (fixture),",
        "IVF default ≥ 0.8 (fixture); on a 400-vector blob twin, IVF ≥ 0.9",
        "at default and ≥ 0.85 at probe-2-of-10-cells",
        "(`test_knn_ivf_recall_clustered`, measured 0.995 / 0.94).",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ANN_RECALL.md")
    with open(out, "w") as fh:
        fh.write("\n".join(md))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
