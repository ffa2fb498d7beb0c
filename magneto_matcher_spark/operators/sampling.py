"""SA1-SA6 sampling operators (SURVEY.md §2.6) — column → ≤n representative
values, as ONE generic grouped-count → scored → top-n pattern.

Reference: ``get_samples`` (algorithms/magneto/magneto/utils/utils.py:212-308),
``fibonacci_hash`` (utils.py:207-209).  All reference randomness is replaced by
seeded *cross-engine* hash arithmetic so every mode is deterministic at any
parallelism (FIXTURES.md determinism rules) AND reproducible by the DuckDB
oracle (round-4 verdict: xxhash64 keys blocked their own verification — DuckDB
lacks xxhash64, but both engines agree bit-for-bit on
``md5 → first 15 hex chars → BIGINT``).  Documented divergences:

- mmh3 is unavailable → the value hash is the md5-derived 60-bit integer of
  ``str(seed) || value`` (:func:`_stable_hash64`; still a stable hash, the
  fibonacci golden-ratio scrambling is kept).  md5 is ~3× slower per value
  than xxhash64 but sampling hashes *distinct values per column* (metadata
  scale), never the 100 TB row stream — the dedup/ANN hot paths deliberately
  stay on xxhash64 (operators/dedup.py, operators/embedding.py).
- 'random' uses seeded hash-order sampling instead of ``np.random.choice``
  (reproducible, partition-independent).
- 'mixed' strides over *sorted* uniques; the reference strides over uniques in
  first-seen row order, which is partition-order-dependent — unreproducible in
  a distributed setting by construction.
- 'weighted' uses A-Res weighted reservoir keys (-log(u)/w) with hashed u.

Per the reference: if a column has ≤ n uniques, all are returned; 'random' /
'frequent' / 'mixed' return values sorted as strings; 'priority_sampling' /
'consistent_sampling' return values in priority order (utils.py:286-287,300-301).

At scale: everything is ``groupBy(value).count()`` (partial-agg friendly) plus
a per-column top-n — no collect, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: golden-ratio fractional constant used by the reference's fibonacci_hash.
PHI_FRACTION = 0.6180339887498949

MODES = (
    "random",
    "frequent",
    "mixed",
    "weighted",
    "priority_sampling",
    "consistent_sampling",
)

def _stable_hash64(value_col, seed: int = 42):
    """Cross-engine 60-bit hash: first 15 hex chars of ``md5(seed || value)``
    as a BIGINT.  DuckDB twin (bit-identical, verified):
    ``('0x' || substr(md5('<seed>' || value), 1, 15))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(seed)), value_col)), 1, 15), 16, 10
    ).cast("bigint")


def _unit_hash(value_col, seed: int = 42):
    """Deterministic hash of a value into (0, 1]: fibonacci scrambling of
    :func:`_stable_hash64`, the Spark stand-in for
    fibonacci_hash(mmh3.hash(str(v), 42)).

    The hash is bounded below 2^32 BEFORE the golden-ratio multiply (matching
    the reference's 32-bit mmh3 input): for a ~2^60 hash the double-precision
    product's ULP exceeds 1, so its fractional part is almost always exactly
    0.0 and every value would collapse to the sentinel.  At 2^32 the product
    is ≤ ~2.7e9 whose ULP is ~4.8e-7 — the fractional part keeps ~21
    significant bits, plenty to order samples deterministically.

    DuckDB twin (the int→double cast must be explicit or DuckDB multiplies in
    DECIMAL and diverges in the 7th decimal):
    ``fmod(CAST(h % 4294967296 AS DOUBLE) * 0.6180339887498949, 1.0)``."""
    h32 = F.pmod(_stable_hash64(value_col, seed), F.lit(1 << 32)).cast("double")
    frac = (h32 * F.lit(PHI_FRACTION)) % F.lit(1.0)
    # avoid exact zero (division by it in priority mode)
    return F.when(frac == 0.0, F.lit(1e-18)).otherwise(frac)


def melt(df: DataFrame, columns: list[str] | None = None, col_field: str = "col_name",
         value_field: str = "value") -> DataFrame:
    """Long-format view (col_name, value:string) of a table — the engine's
    replacement for materializing per-column value lists (SURVEY §1.4)."""
    columns = columns or df.columns

    # one selectExpr string instead of ~4 Column-builder py4j round trips per
    # column (same rationale as cleaning._clean_element_sql: the expression
    # tree is rebuilt per call, so builder chatter is a per-call driver cost)
    def entry(c: str) -> str:
        ref = "`" + c.replace("`", "``") + "`"  # dotted names ≠ struct paths
        lit = "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
        return (
            f"struct({lit} AS {col_field}, CAST({ref} AS STRING) AS {value_field})"
        )

    pairs = "array(" + ", ".join(entry(c) for c in columns) + ")"
    return df.selectExpr(f"explode({pairs}) AS kv").select("kv.*")


def value_counts(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """A1 per column: (col_name, value, cnt) with nulls dropped — the shared
    input of every sampling mode. One shuffle for ALL columns."""
    return (
        melt(df, columns)
        .filter(F.col("value").isNotNull())
        .groupBy("col_name", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sample_columns(
    df: DataFrame,
    n: int = 10,
    mode: str = "mixed",
    columns: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Return (col_name, samples:array<string>) — ≤ n representative values per
    column under ``mode``.  See module docstring for mode semantics."""
    if mode not in MODES:
        raise ValueError(f"Unsupported mode: {mode}. Use one of {MODES}")
    counts = value_counts(df, columns)
    return samples_from_counts(counts, n=n, mode=mode, seed=seed)


def samples_from_counts(
    counts: DataFrame,
    n: int = 10,
    mode: str = "mixed",
    seed: int = 42,
    group_cols: tuple[str, ...] = ("col_name",),
) -> DataFrame:
    """Same as :func:`sample_columns` but over a precomputed (*group_cols,
    value, cnt) frame, so the counts shuffle is shared across modes/profiles.
    ``group_cols`` lets one pass sample many tables at once
    (e.g. ``("table_name", "col_name")`` in the unified profiler)."""
    gc = [F.col(c) for c in group_cols]
    by_col = Window.partitionBy(*gc)

    total_unique = F.count(F.lit(1)).over(by_col)
    counts = counts.withColumn("_total_unique", total_unique)
    small = F.col("_total_unique") <= n  # ≤ n uniques → return all (sorted)

    if mode == "frequent":
        order = by_col.orderBy(F.col("cnt").desc(), F.col("value"))
        picked = counts.withColumn("_rn", F.row_number().over(order)).filter(
            small | (F.col("_rn") <= n)
        )
        return _collect_sorted(picked, group_cols)

    if mode == "random":
        order = by_col.orderBy(
            _stable_hash64(F.col("value"), seed), F.col("value")
        )
        picked = counts.withColumn("_rn", F.row_number().over(order)).filter(
            small | (F.col("_rn") <= n)
        )
        return _collect_sorted(picked, group_cols)

    if mode == "mixed":
        n_frequent = n // 2
        n_diverse = n - n_frequent
        freq_order = by_col.orderBy(F.col("cnt").desc(), F.col("value"))
        val_order = by_col.orderBy(F.col("value"))
        stride = F.greatest(
            F.lit(1), F.floor(F.col("_total_unique") / F.lit(n_diverse))
        )
        scored = (
            counts.withColumn("_fr", F.row_number().over(freq_order))
            .withColumn("_vr", F.row_number().over(val_order))
            .withColumn(
                "_diverse_pick",
                ((F.col("_vr") - 1) % stride == 0)
                & (((F.col("_vr") - 1) / stride) < n_diverse),
            )
        )
        picked = scored.filter(
            small | (F.col("_fr") <= n_frequent) | F.col("_diverse_pick")
        )
        return _collect_sorted(picked, group_cols)

    if mode == "weighted":
        # A-Res reservoir key: u^(1/w) maximized ⟺ -log(u)/w minimized
        key = -F.log(_unit_hash(F.col("value"), seed)) / F.col("cnt")
        order = by_col.orderBy(key.asc(), F.col("value"))
        picked = counts.withColumn("_rn", F.row_number().over(order)).filter(
            small | (F.col("_rn") <= n)
        )
        return _collect_sorted(picked, group_cols)

    if mode == "priority_sampling":
        priority = F.col("cnt") / _unit_hash(F.col("value"), seed)
        return _collect_by_priority(counts, priority, n, small, group_cols)

    # consistent_sampling: top-n by value hash alone
    priority = _unit_hash(F.col("value"), seed)
    return _collect_by_priority(counts, priority, n, small, group_cols)


def _collect_sorted(picked: DataFrame, group_cols: tuple[str, ...]) -> DataFrame:
    return picked.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("value")).alias("samples")
    )


def _collect_by_priority(
    counts: DataFrame, priority, n: int, small, group_cols: tuple[str, ...]
) -> DataFrame:
    order = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        priority.desc(), F.col("value")
    )
    picked = (
        counts.withColumn("_pr", priority)
        .withColumn("_rn", F.row_number().over(order))
        .filter(small | (F.col("_rn") <= n))
    )
    # priority order in the output array (reference utils.py:286-287) — except
    # the ≤n-uniques whole-set case, which the reference sorts (utils.py:235):
    # a constant sort key there makes array_sort fall through to the value.
    sort_key = F.when(small, F.lit(0.0)).otherwise(-F.col("_pr"))
    return picked.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(sort_key.alias("np"), F.col("value")))
            ),
            lambda s: s["value"],
        ).alias("samples")
    )
