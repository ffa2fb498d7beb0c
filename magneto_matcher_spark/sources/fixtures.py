"""F4 fixture: the miniature schema-matching pair (FIXTURES.md §F4).

A deterministic (seed 42) source/target table pair covering every semantic
type of ``detect_column_type``, with renamed/cased/abbreviated twin columns
and a ground-truth mapping — the sandbox stand-in for the reference's
Valentine corpus layout (``*_source.csv`` / ``*_target.csv`` / mapping,
valentine_benchmark.py:139-145).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

GROUND_TRUTH = [
    ("PatientID", "patient_id"),
    ("age_at_diagnosis", "AgeAtDx"),
    ("tumorStage", "tumor_stage"),
    ("gender", "sex"),
    ("smoker", "smoking_status"),
    ("bmi", "body_mass_index"),
    ("diag_date", "date_of_diagnosis"),
    ("gene_symbol", "gene"),
    ("follow_up_days", "followup_d"),
    ("site", "anatomic_site"),
    ("notes", "comments"),
]

_STAGES = ["stageI", "stageII", "stageIII", "stageIV"]
_SITES = ["lung", "breast", "colon", "kidney", "liver"]
_GENES = ["TP53", "KRAS", "EGFR", "BRCA1", "BRCA2", "ALK", "MET", "RET"]
_WORDS = "tumor sample biopsy margin clear pending review stable progression".split()


def make_matching_pair(
    spark: SparkSession, n_rows: int = 200, seed: int = 42
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (sm_source, sm_target, sm_gt)."""
    rng = random.Random(seed)

    def null_sprinkle(val, p=0.05):
        return rng.choice(["not reported", "Unknown", "n/a"]) if rng.random() < p else val

    src_rows, tgt_rows = [], []
    for i in range(n_rows):
        stage = rng.choice(_STAGES)
        sex = rng.choice(["M", "F"])
        smoker = rng.choice(["yes", "no"])
        bmi = round(rng.uniform(17, 40), 1)
        date = f"202{rng.randint(0,4)}-{rng.randint(1,12):02d}-{rng.randint(1,28):02d}"
        gene = rng.choice(_GENES)
        fup = rng.randint(10, 2000)
        site = rng.choice(_SITES)
        note = " ".join(rng.choice(_WORDS) for _ in range(5))
        src_rows.append(
            (
                f"P{i:05d}",
                rng.randint(20, 90),
                null_sprinkle(stage),
                sex,
                null_sprinkle(smoker),
                bmi,
                date,
                gene,
                fup,
                null_sprinkle(site),
                note,
                rng.choice(["not reported", "Not Reported", "unknown"]),
            )
        )
        # target twin rows: same domains, value variants (case/synonyms)
        tgt_rows.append(
            (
                f"p-{rng.randint(0, n_rows):05d}",
                rng.randint(20, 90),
                null_sprinkle(stage.replace("stage", "Stage ")),
                rng.choice(["male", "female"]),
                rng.choice(["Smoker", "Non-Smoker"]),
                round(rng.uniform(17, 40), 1),
                date,
                gene.lower(),
                fup,
                null_sprinkle(site.upper()),
                " ".join(rng.choice(_WORDS) for _ in range(5)),
                rng.randint(0, 1),
                rng.choice(["A", "B", "C"]),
                round(rng.uniform(0, 1), 3),
            )
        )

    # local_df (LocalTableScan), not createDataFrame(list): RDD-backed
    # frames have no size statistics and pay a Python-worker round trip per
    # action — the F4 cascade runs many actions over these metadata-sized
    # frames (localframe.py module notes)
    from magneto_matcher_spark.localframe import local_df

    sm_source = local_df(
        spark,
        src_rows,
        "PatientID string, age_at_diagnosis int, tumorStage string, gender string,"
        " smoker string, bmi double, diag_date string, gene_symbol string,"
        " follow_up_days int, site string, notes string, empty_col string",
    )
    sm_target = local_df(
        spark,
        tgt_rows,
        "patient_id string, AgeAtDx int, tumor_stage string, sex string,"
        " smoking_status string, body_mass_index double, date_of_diagnosis string,"
        " gene string, followup_d int, anatomic_site string, comments string,"
        " flag int, category string, weight double",
    )
    sm_gt = local_df(spark, GROUND_TRUTH, "src_col string, tgt_col string")
    return sm_source, sm_target, sm_gt


def read_ground_truth_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2 — ground-truth scan, CSV with (source_column, target_column)
    header (reference gdc_benchmark.py:138-140 incl. the dropna)."""
    return (
        spark.read.csv(path, header=True, inferSchema=False)
        .select("source_column", "target_column")
        .na.drop()
    )


def read_ground_truth_json(spark: SparkSession, path: str) -> DataFrame:
    """S3 — ground-truth scan, Valentine mapping JSON: a ``matches`` array of
    ``{"source_column": ..., "target_column": ...}`` objects (reference
    ``extract_matchings``, valentine_benchmark.py:35-42, read at :316)."""
    from pyspark.sql import functions as F

    # explicit schema: an empty ``matches`` array would otherwise be
    # inferred as array<string>, breaking the struct field extraction
    raw = spark.read.option("multiLine", "true").schema(
        "matches array<struct<source_column:string,target_column:string>>"
    ).json(path)
    return raw.select(F.explode("matches").alias("m")).select(
        F.col("m.source_column").alias("source_column"),
        F.col("m.target_column").alias("target_column"),
    )


def make_blob_embeddings(
    spark: SparkSession,
    n_vecs: int = 2000,
    dim: int = 64,
    n_clusters: int = 20,
    intra_std: float = 0.25,
    seed: int = 7,
) -> DataFrame:
    """Seeded Gaussian-blob embedding corpus: ``n_clusters`` unit-sphere-ish
    centers, each vector = its cluster center + N(0, intra_std) noise.

    The shipped ``embeddings.parquet`` fixture is essentially clusterless —
    the *adversarial* case for learned-cell ANN (IVF).  This is the case IVF
    is designed for, so the recall grid (BENCH/ann_recall.py) grades both.
    Deterministic: one ``default_rng(seed)`` stream, driver-generated (the
    corpus is a graded fixture, metadata-scale by construction), columns
    ``(vec_id bigint, embedding array<float>, label int)`` matching the
    parquet fixture's schema.
    """
    import numpy as np
    from pyspark.sql import types as T

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, size=n_vecs)
    vecs = centers[labels] + intra_std * rng.standard_normal((n_vecs, dim))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(labels[i]))
        for i in range(n_vecs)
    ]
    return spark.createDataFrame(rows, schema)
