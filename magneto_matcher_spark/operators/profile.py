"""Column profiling — A2-A6 + the two-layer type system (SURVEY.md §1.2).

Produces the ``profiles`` DataFrame (PROFILE_SCHEMA): one row per column with
physical type, semantic type, cardinality stats and representative samples.
This is the engine's working representation of "a table's schema + content"
— the input to serialization, matching, and the CDC drift resolver.

Semantic type detection ports the decision procedure of
``detect_column_type`` (reference
``algorithms/magneto/magneto/utils/utils.py:131-186``), including its quirks
(e.g. a column where ANY value parses numeric is "numerical" — rule 1):

 1. any value numeric-parsable                      → numerical
 2. 'gene' in name                                  → gene
 3. 'date' in name                                  → date
 4. distinct/total > 0.8 and not float-typed        → key
 5. zero non-null uniques                           → unknown
 6. name starts/ends with a key-ish token           → key
 7. (float/int physical type                        → numerical)
 8. >90% of uniques numeric-parsable                → binary if uniques ⊆ {0,1}
                                                      else numerical
 9. exactly 2 uniques, both in BINARY_VALUES        → binary
10. otherwise                                       → categorical

Physical types map Spark dtypes → {date, varchar, int, float} like the
Valentine layer (reference ``utils/base_table.py:49-67``).

Execution shape (scale story): one typed aggregation scan for row-level stats
+ one melted groupBy for unique-level stats and samples — two jobs total for
ALL columns, no per-column scans, no collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from magneto_matcher_spark.functions.cleaning import BINARY_VALUES
from magneto_matcher_spark.operators.sampling import (
    samples_from_counts,
    value_counts,
)

#: key-ish name prefixes/suffixes (reference utils/constants.py:47-67 spirit).
KEY_REPRESENTATIONS = [
    "id",
    "identifier",
    "key",
    "uuid",
    "gid",
    "sid",
    "token",
    "serial",
    "code",
    "hash",
    "primary_key",
    "foreign_key",
    "access_key",
    "unique_id",
    "slug",
    "auth_token",
    "apikey",
    "object_id",
    "record_id",
]


def physical_type(dt: T.DataType) -> str:
    """Valentine physical type (reference base_table.py:49-67)."""
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "date"
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    return "varchar"


def _is_keyish_name(name: str) -> bool:
    low = name.lower()
    return any(low.startswith(rep) or low.endswith(rep) for rep in KEY_REPRESENTATIONS)


def profile_table(
    df: DataFrame,
    table_name: str,
    n_samples: int = 10,
    sample_mode: str = "mixed",
    exact_distinct: bool = True,
    key_threshold: float = 0.8,
    numeric_threshold: float = 0.90,
) -> DataFrame:
    """Profile every column of ``df`` → PROFILE_SCHEMA rows.

    ``exact_distinct=False`` switches cardinalities to
    ``approx_count_distinct`` (HLL) — the 100 TB setting, where a 2% ratio
    error cannot flip sane key-detection; exact is kept for oracle parity.
    """
    spark = df.sparkSession
    cols = df.columns
    phys = {c: physical_type(df.schema[c].dataType) for c in cols}

    # ---- pass 1: typed row-level stats, one aggregation over all columns ----
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for i, c in enumerate(cols):
        col_s = F.col(c).cast("string")
        num = F.expr(f"try_cast(`{c}` as double)")
        dtm = (
            F.col(c)
            if phys[c] == "date"
            else F.expr(f"try_to_timestamp(cast(`{c}` as string))")
        )
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{i}"),
            F.max(num.isNotNull().cast("int")).alias(f"_anynum_{i}"),
            F.avg(num.isNotNull().cast("int")).alias(f"_numfrac_{i}"),
            F.avg(dtm.isNotNull().cast("int")).alias(f"_dtfrac_{i}"),
            (
                F.count_distinct(col_s)
                if exact_distinct
                else F.approx_count_distinct(col_s)
            ).alias(f"_nd_{i}"),
        ]
    stats = df.agg(*aggs).collect()[0]
    n_rows = stats["_n_rows"]

    # ---- pass 2: unique-level stats + samples from one melted shuffle ----
    counts = value_counts(df).cache()
    uniq = (
        counts.groupBy("col_name")
        .agg(
            F.avg(
                F.expr("try_cast(value as double)").isNotNull().cast("int")
            ).alias("uniq_num_frac"),
            F.max(
                F.when(
                    F.expr("try_cast(value as double)").isNotNull(),
                    ~F.col("value").cast("double").isin([0.0, 1.0]),
                ).otherwise(F.lit(False)).cast("int")
            ).alias("any_non01"),
            F.min(F.lower(F.trim("value")).isin(BINARY_VALUES).cast("int")).alias(
                "all_binary_vocab"
            ),
        )
        .collect()
    )
    uniq_by_col = {r["col_name"]: r for r in uniq}
    samples = {
        r["col_name"]: r["samples"]
        for r in samples_from_counts(counts, n=n_samples, mode=sample_mode).collect()
    }
    counts.unpersist()

    rows = []
    for i, c in enumerate(cols):
        nn = stats[f"_nn_{i}"]
        nd = stats[f"_nd_{i}"]
        distinct_ratio = (nd / n_rows) if n_rows else 0.0
        null_frac = 1.0 - (nn / n_rows) if n_rows else 1.0
        u = uniq_by_col.get(c)

        sem = _semantic_type(
            name=c,
            phys=phys[c],
            any_numeric=bool(stats[f"_anynum_{i}"]),
            n_distinct=nd,
            distinct_ratio=distinct_ratio,
            uniq_num_frac=(u["uniq_num_frac"] if u else 0.0),
            any_non01=bool(u["any_non01"]) if u else False,
            all_binary_vocab=bool(u["all_binary_vocab"]) if u else False,
            key_threshold=key_threshold,
            numeric_threshold=numeric_threshold,
        )
        rows.append(
            (
                table_name,
                c,
                phys[c],
                sem,
                n_rows,
                nd,
                float(distinct_ratio),
                float(null_frac),
                float(stats[f"_numfrac_{i}"] or 0.0),
                float(stats[f"_dtfrac_{i}"] or 0.0),
                list(samples.get(c, [])),
            )
        )

    from magneto_matcher_spark.schemas import PROFILE_SCHEMA

    return spark.createDataFrame(rows, PROFILE_SCHEMA)


def _semantic_type(
    name: str,
    phys: str,
    any_numeric: bool,
    n_distinct: int,
    distinct_ratio: float,
    uniq_num_frac: float,
    any_non01: bool,
    all_binary_vocab: bool,
    key_threshold: float,
    numeric_threshold: float,
) -> str:
    if any_numeric:
        return "numerical"
    low = name.lower()
    if "gene" in low:
        return "gene"
    if "date" in low:
        return "date"
    if distinct_ratio > key_threshold and phys != "float":
        return "key"
    if n_distinct == 0:
        return "unknown"
    if _is_keyish_name(name):
        return "key"
    if phys in ("int", "float"):
        return "numerical"
    if n_distinct and uniq_num_frac > numeric_threshold:
        if n_distinct > 2 or any_non01:
            return "numerical"
        return "binary"
    if n_distinct == 2 and all_binary_vocab:
        return "binary"
    return "categorical"


def type2columns_map(profiles: DataFrame) -> DataFrame:
    """A6 (reference utils.py:189-204): sem_type → list of columns."""
    return profiles.groupBy("sem_type").agg(
        F.array_sort(F.collect_list("col_name")).alias("columns")
    )
