"""Deduplication operators for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design notes (the point of each variant):

- **exact**: one hash-aggregate on the text (or fingerprint) — partial
  map-side combine makes this skew-proof; O(data) with one shuffle.
- **n-gram Jaccard**: exact pairwise similarity — only viable within bounded
  candidate sets (the verify stage of LSH, or a bounded scan slice) because
  the pair space is quadratic.
- **MinHash+LSH**: the 100 TB path.  k seeded xxhash64 min-hashes per doc,
  banded so that docs agreeing on any band land in the same bucket →
  candidate pairs only within buckets → Jaccard verify.  Every step is
  groupBy/join on bounded keys; no cross join anywhere.
- **SimHash**: 64-bit weighted-token signature; near-dup candidates share at
  least one of four 16-bit chunks (Hamming ≤ 3 guarantee within chunks-style
  banding), verified by Hamming distance.
- **embedding cosine**: semantic near-dup via the kNN kernel
  (operators/embedding.py) — brute-force (broadcast) baseline and the
  LSH-bucketed variant as the scale path.

Determinism: all hashes are xxhash64 with literal seeds; no RNG.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per distinct text. One hash aggregate."""
    keep = df.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    return df.join(keep, [text_col, id_col], "left_semi")


def shingles_expr(text, n: int = 3):
    """Word n-gram shingles (distinct) of a text column.

    Arrow-vectorized pandas UDF, NOT the tempting pure-expression version
    (``transform(sequence(...), i -> array_join(slice(toks, i+1, n)))``):
    nested higher-order functions with lambdas fall out of whole-stage
    codegen into interpreted evaluation — measured 3.6 s vs 0.5 s warm for
    the same 260k shingles over sf0.1 documents (~7×).  Tokenization matches
    the Java-regex semantics the DuckDB oracles assume: ASCII ``\\s+`` split
    after trim + lower.  Output order is first-occurrence; every consumer
    (min-hash, Jaccard intersect/union) is order-insensitive."""
    import re

    _ws = re.compile(r"[ \t\n\x0b\f\r]+")
    _JAVA_WS = " \t\n\x0b\f\r"  # ASCII \s — NOT Unicode str.strip(), which
    # would drop NBSP etc. and break parity with Java trim / DuckDB oracles

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _shingles(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [w for w in _ws.split((t or "").strip(_JAVA_WS).lower()) if w]
            if len(toks) < n:
                out.append([])
                continue
            out.append(
                list(
                    dict.fromkeys(
                        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                    )
                )
            )
        return pd.Series(out)

    return _shingles(text)


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share ≥1 shingle.

    (a_id, b_id, jaccard) with a_id < b_id and jaccard ≥ threshold.  Pair
    generation is a self-join on the exploded shingle — use only on bounded
    inputs or post-LSH candidates (see module notes).
    """
    sh = df.select(
        F.col(id_col).alias("id"), shingles_expr(F.col(text_col), n).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select("id", "n_sh", F.explode("sh").alias("g"))
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return common.select(
        "a_id",
        "b_id",
        (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def shingle_rows(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, g) exploded word n-gram shingles — pure whole-stage codegen
    (``split`` → ``explode(sequence)`` → ``element_at`` concat): no Python
    worker anywhere, unlike :func:`shingles_expr` (the array-building pandas
    UDF kept for exact-Jaccard, which needs per-doc DISTINCT shingles).

    Shingles here are NOT deduped per doc: every consumer on the MinHash
    path is set-based (``min`` hash aggregation, ``collect_set``, array
    set-ops in the verify), so duplicates are harmless and the dedup pass
    is skipped.  Tokenization parity with the UDF: tokens are the non-empty
    maximal runs of non-ASCII-whitespace characters of the lowered text
    (leading/trailing ws yields empty tokens that the filter drops, so the
    missing explicit trim changes nothing).

    If the scan is narrower than the cluster (a single small parquet file →
    1 partition → the map side runs on one core), widen it first; at real
    scale the input already has ≥ defaultParallelism splits and this no-ops,
    so no full-table shuffle is ever added on the 100 TB path."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    target = df.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < target:
        base = base.repartition(target)
    idx = F.explode(
        F.when(
            F.size("toks") >= n, F.sequence(F.lit(1), F.size("toks") - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
    ).alias("i")
    g = F.concat_ws(
        " ", *[F.element_at("toks", F.col("i") + j) for j in range(n)]
    )
    return base.select("id", "toks", idx).select("id", g.alias("g"))


def minhash_signatures(
    df: DataFrame,
    k: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    collect_shingles: bool = False,
) -> DataFrame:
    """k seeded min-hashes per doc: sig[i] = min over shingles of
    xxhash64(i, shingle).

    Physical shape: exploded shingle rows → k codegen'd ``min(xxhash64(i,
    g))`` hash-aggregates → array.  (The tempting nested-transform
    expression — ``transform(seq(0,k-1), i -> array_min(transform(sh, g ->
    hash(i,g))))`` — drops out of whole-stage codegen into interpreted
    evaluation and is ~50× slower per row; the explode/agg shape also gets
    map-side partial combine at scale.)  Docs with < n tokens produce no
    shingle rows and therefore no signature.

    ``collect_shingles=True`` additionally returns each doc's distinct
    shingle set (``sh`` column) from the SAME aggregation — the fused
    single-text-pass shape the LSH verify stage relies on (no second
    tokenize/shingle evaluation)."""
    ex = shingle_rows(df, n=n, text_col=text_col, id_col=id_col)
    # F.expr-built aggregates: the Column-builder form (min + xxhash64 + lit
    # + alias per hash) issues ~4 py4j round trips per seed — ~0.3 s of
    # driver build time per call at k=32; a server-side-parsed SQL snippet
    # is one call per aggregate.  `{i}` parses as an INT literal, matching
    # the previous F.lit(i) (int), so the hashes are unchanged.
    aggs = [F.expr(f"min(xxhash64({i}, g)) AS _h{i}") for i in range(k)]
    if collect_shingles:
        aggs.append(F.expr("collect_set(g) AS sh"))
    return (
        ex.groupBy("id")
        .agg(*aggs)
        .select(
            "id",
            F.expr("array(" + ", ".join(f"_h{i}" for i in range(k)) + ") AS sig"),
            *(["sh"] if collect_shingles else []),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: bool = True,
    max_bucket_size: int = 200,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: signature → band buckets → bucket join →
    (optional) exact Jaccard verify.  rows = (a_id, b_id[, jaccard]).

    ``max_bucket_size`` drops degenerate buckets (boilerplate/templated text
    that hashes thousands of docs into one bucket would make the in-bucket
    self-join quadratic — standard LSH practice; run ``exact_dedup`` first to
    fold true duplicates).  Dropping is logged in the plan via a filter on a
    windowed count, one extra shuffle-free aggregation over the banded rows.

    The expensive leaf — tokenize + shingle + hash — is ONE fused
    aggregation producing the signature array AND (when verifying) the
    per-doc shingle set in the same shuffle; the cached per-doc frame then
    feeds banding and both verify-join sides.  Round 2 evaluated the
    shingle UDF three times (signatures + each verify side) and paid for it
    cold (6.0 s → 9.4 s in the driver bench); this shape has no Python and
    exactly one pass over the text."""
    if bands <= 0 or k % bands != 0:
        # k % bands != 0 would silently ignore the trailing hashes (paid-for
        # accuracy lost); bands > k would make rows_per_band 0 → every doc
        # in one bucket per band → all buckets over the size cap → an empty
        # result that reads as "no near-duplicates"
        raise ValueError(f"bands ({bands}) must evenly divide k ({k})")
    rows_per_band = k // bands
    per_doc = minhash_signatures(
        df, k=k, n=n, text_col=text_col, id_col=id_col, collect_shingles=verify
    )
    if verify:
        # banding + both verify sides reuse the per-doc frame.  localCheckpoint
        # (not persist): the materialized RDD is released by the ContextCleaner
        # when the frame goes out of scope, so repeated calls in one session
        # don't accumulate cached copies — CacheManager entries from persist()
        # would live until an explicit unpersist no caller can issue on a
        # lazily-returned result.  Trade-off: checkpointed partitions are not
        # recomputable on executor loss (fine locally; at cluster scale use
        # reliable checkpointing or persist+unpersist around a materializer).
        per_doc = per_doc.localCheckpoint(eager=False)
    banded = per_doc.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    # collect_list + in-array pair expansion instead of a size-count agg +
    # size-filter join + two-sided bucket self-join: one exchange of (band,
    # bucket, id) rows replaces four (same restructure as simhash_pairs —
    # see its docstring; the size cap drops oversized buckets identically,
    # as a filter on the collected array)
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size))
    )
    cand = (
        buckets.select(F.explode(bucket_pairs_expr(F.col("ids"))).alias("p"))
        .select("p.a_id", "p.b_id")
        .distinct()
    )
    if not verify:
        return cand
    sh = per_doc.select("id", "sh")
    cand = (
        cand.join(sh.withColumnRenamed("id", "a_id").withColumnRenamed("sh", "sh_a"), "a_id")
        .join(sh.withColumnRenamed("id", "b_id").withColumnRenamed("sh", "sh_b"), "b_id")
        .select(
            "a_id",
            "b_id",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return cand.filter(F.col("jaccard") >= threshold)


def dedup_keep_canonical(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop every doc that near-dups a lower-id doc (single-hop canonicalization;
    full transitive clustering would need iterative connected components —
    out of scope and rarely what data pipelines run at scale)."""
    losers = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame,
    bits: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit SimHash per doc: per token, xxhash64 gives its bit pattern; each
    bit position accumulates +1/−1 by token occurrence; sign → signature bit.

    Physical shape (r06): explode tokens → xxhash64 (JVM, so hashes stay
    engine-deterministic) → ``collect_list(h)`` per doc → one Arrow-batched
    numpy UDF unpacks the bit matrix and signs the column sums.  The
    previous shape — ``bits`` codegen'd sum-aggregates + a 64-wide sign
    projection — executed fine but cost ~1 s of driver-side
    analysis/optimization/codegen EVERY call (the plan carries 64 aggregate
    expressions and a 64-branch projection; measured 1.06 s fresh-plan vs
    0.38 s for this shape on the same 2000-doc corpus, identical output,
    and the gap is planning, not tasks).  Scale note: the per-doc shuffle
    payload grows from 64 partial sums (512 B) to the token-hash list
    (8 B/token); both are small against the banding/verify stages this
    feeds, and the signing arithmetic is integer-exact in numpy
    (2·popcount − n > 0) so signatures are bit-identical to the aggregate
    form (pinned by tests and the invariance oracle)."""
    import numpy as np

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _sign(hlists: pd.Series) -> pd.Series:
        shifts = np.arange(bits, dtype=np.uint64)
        out = []
        for hl in hlists:
            h = np.asarray(hl, dtype=np.int64).view(np.uint64)
            ones = ((h[:, None] >> shifts) & 1).astype(np.int64).sum(axis=0)
            out.append(((2 * ones - len(h)) > 0).astype(np.int32).tolist())
        return pd.Series(out)

    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")
    ex = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("t")).withColumn(
        "h", F.xxhash64(F.col("t"))
    )
    return (
        ex.groupBy("id")
        .agg(F.collect_list("h").alias("_hs"))
        .select("id", _sign(F.col("_hs")).alias("bits"))
    )


def bucket_pairs_expr(ids_col):
    """All (a_id, b_id) pairs with a_id < b_id from a SORTED-ascending array
    of distinct ids — the in-bucket pair expansion shared by the LSH-style
    candidate generators.  Requires size ≥ 2 (callers filter first).

    Interpreted HOFs are fine here: the arrays are bucket-capped (≤
    max_bucket_size elements), so this runs over candidate-sized data, never
    over the corpus."""
    n = F.size(ids_col)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(ids_col, i + 1, n - i),
                lambda y: F.struct(
                    F.element_at(ids_col, i).alias("a_id"), y.alias("b_id")
                ),
            ),
        )
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int = 200,
) -> DataFrame:
    """SimHash near-dup pairs: 4×16-bit chunk banding (two sigs within Hamming
    ≤ 3 of each other agree on ≥1 chunk by pigeonhole) then Hamming verify.

    Physical shape (r06): the signature frame is localCheckpointed ONCE and
    reused by banding and both verify-side lookups — without it the physical
    plan inlined the 64-aggregate signature pipeline once per consumer (4
    full scan→explode→aggregate subtrees in the r05 plan).  Candidate pairs
    come from ``collect_list(id)`` per (chunk, bucket) + in-array pair
    expansion instead of a bucket self-join: one exchange of (chunk, bucket,
    id) rows replaces the size-count aggregation, the size-filter join and
    the two-sided self-join (18 → 7 exchanges, 2.13 s → ~0.8 s warm at
    sf0.1).  The size cap becomes a plain filter on the collected array;
    a degenerate bucket costs one spillable ObjectHashAggregate group
    instead of a quadratic join, and is dropped identically."""
    sigs = simhash_signatures(df, text_col=text_col, id_col=id_col)
    sigs = sigs.localCheckpoint(eager=False)
    chunks = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda c: F.struct(
                    c.alias("chunk"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("bits"), c * 16 + 1, 16),
                                lambda x: x.cast("string"),
                            ),
                            "",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("cb"),
    ).select("id", "cb.chunk", "cb.bucket")
    buckets = (
        chunks.groupBy("chunk", "bucket")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size))
    )
    cand = (
        buckets.select(F.explode(bucket_pairs_expr(F.col("ids"))).alias("p"))
        .select("p.a_id", "p.b_id")
        .distinct()
    )
    cand = cand.join(
        sigs.select(F.col("id").alias("a_id"), F.col("bits").alias("ba")), "a_id"
    ).join(
        sigs.select(F.col("id").alias("b_id"), F.col("bits").alias("bb")), "b_id"
    )
    hamming = F.size(
        F.filter(F.zip_with("ba", "bb", lambda x, y: (x != y).cast("int")), lambda v: v == 1)
    )
    return cand.select("a_id", "b_id", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------

def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    max_broadcast_rows: int = 100_000,
    dim: int | None = None,
    n_bits: int = 6,
    n_tables: int = 4,
) -> DataFrame:
    """Semantic near-dup: each vector's top-k cosine neighbours, keep pairs
    ≥ threshold with a_id < b_id.

    ``method``: 'bruteforce' collects the corpus to the driver and broadcasts
    it (exact kNN) — a scale-killer beyond ~10^5 rows; 'lsh' buckets both
    sides by hyperplane SimHash (one shuffle, never broadcasts — the 100 TB
    path, approximate); 'auto' counts the corpus and picks 'lsh' above
    ``max_broadcast_rows``."""
    from magneto_matcher_spark.operators.embedding import knn_topk, knn_topk_lsh

    if method == "auto":
        # bounded probe: only needs to know whether the corpus exceeds the
        # broadcast threshold — never a full count of a 100 TB table
        probe = emb.limit(max_broadcast_rows + 1).count()
        method = "bruteforce" if probe <= max_broadcast_rows else "lsh"
    if method == "bruteforce":
        nn = knn_topk(emb, emb, k=k + 1, query_id=id_col, corpus_id=id_col,
                      query_vec=vec_col, corpus_vec=vec_col)
    elif method == "lsh":
        if dim is None:
            first = emb.select(vec_col).first()
            if first is None:  # empty corpus → no pairs (bruteforce parity)
                return emb.sparkSession.createDataFrame(
                    [],
                    f"a_id {emb.schema[id_col].dataType.simpleString()}, "
                    f"b_id {emb.schema[id_col].dataType.simpleString()}, "
                    "cosine double",
                )
            dim = len(first[0])
        nn = knn_topk_lsh(emb, emb, k=k + 1, dim=dim, n_bits=n_bits,
                          n_tables=n_tables, query_id=id_col, vec_col=vec_col,
                          corpus_id=id_col)
    else:
        raise ValueError(f"unknown method: {method!r}")
    # canonicalize with least/greatest, do NOT filter id < neighbor: the
    # directed kNN lists are asymmetric (doc 9's top-k may contain 5 while
    # doc 5's top-k is saturated by closer neighbors and omits 9), so a
    # one-sided filter would drop pairs discovered only from the higher id
    return (
        nn.filter(F.col(id_col) != F.col("neighbor_id"))
        .filter(F.col("score") >= threshold)
        .select(
            F.least(F.col(id_col), F.col("neighbor_id")).alias("a_id"),
            F.greatest(F.col(id_col), F.col("neighbor_id")).alias("b_id"),
            F.col("score").alias("cosine"),
        )
        .groupBy("a_id", "b_id")
        .agg(F.max("cosine").alias("cosine"))
    )
