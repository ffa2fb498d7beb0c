"""Column serialization — §2.7: profile row → text, 9 encoding modes.

Reference: ``ColumnEncoder`` (algorithms/magneto/magneto/column_encoder.py:25-148).
Each mode is pure string formatting of (header, semantic type, samples) with
tokenizer cls/sep/eos tokens; here each is ONE Catalyst ``concat`` projection
over the profiles DataFrame — byte-for-byte reproducible, no UDF, no
tokenizer dependency (cls/sep/eos default to the mpnet-style tokens but are
parameters).

Note the reference keys its embedding cache by the serialized text
(embedding_matcher.py:85-86), which silently collides if two columns
serialize identically; our frame keeps ``col_name`` as the key, so the
latent bug does not carry over (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ENCODING_MODES = [
    "header_values_default",
    "header_values_prefix",
    "header_values_repeat",
    "header_values_verbose",
    "header_only",
    "header_values_verbose_notype",
    "header_values_columnvaluepair_notype",
    "header_header_values_repeat_notype",
    "header_values_default_notype",
]


def serialize_expr(
    mode: str,
    header: Column,
    data_type: Column,
    samples: Column,
    cls: str = "<s>",
    sep: str = "</s>",
    eos: str = "</s>",
) -> Column:
    """Build the serialization expression for one mode.

    ``samples`` is an ``array<string>`` column (profile ``samples``).
    Formats mirror column_encoder.py:72-148 exactly.
    """
    sepl = F.lit(sep)
    joined = F.array_join(samples, sep)

    if mode == "header_values_verbose":
        return F.concat(
            F.lit(cls),
            F.lit("Column: "), header, sepl,
            F.lit("Type: "), data_type, sepl,
            F.lit("Values: "), joined, sepl,
        )
    if mode in ("header_values_default",):
        return F.concat(F.lit(cls), header, sepl, data_type, sepl, joined)
    if mode == "header_values_prefix":
        return F.concat(
            F.lit(cls),
            F.lit("header:"), header, sepl,
            F.lit("datatype:"), data_type, sepl,
            F.lit("values:"), F.array_join(samples, ", "),
        )
    if mode in ("header_values_repeat", "header_header_values_repeat_notype"):
        repeated = F.array_join(F.array_repeat(header, 5), sep)
        return F.concat(F.lit(cls), repeated, sepl, data_type, sepl, joined)
    if mode == "header_only":
        return F.concat(F.lit(cls), header, F.lit(eos))
    if mode == "header_values_verbose_notype":
        return F.concat(
            F.lit(cls),
            F.lit("Column: "), header, sepl,
            F.lit("Values: "), joined, sepl,
            F.lit(eos),
        )
    if mode == "header_values_columnvaluepair_notype":
        pairs = F.array_join(
            F.transform(samples, lambda t: F.concat(header, F.lit(":"), t)), sep
        )
        return F.concat(
            F.lit(cls),
            F.lit("Column: "), header, sepl,
            F.lit("Values: "), pairs, sepl,
            F.lit(eos),
        )
    if mode == "header_values_default_notype":
        return F.concat(F.lit(cls), header, sepl, joined)
    raise ValueError(
        f"Unsupported encoding mode: {mode}. Supported modes are: {ENCODING_MODES}"
    )


def serialize_text(
    mode: str,
    header: str,
    data_type: str,
    samples: list[str] | None,
    cls: str = "<s>",
    sep: str = "</s>",
    eos: str = "</s>",
) -> str:
    """Python twin of :func:`serialize_expr` — byte-identical output, used by
    the driver-local matcher cascade (plans/matcher.py) on metadata-sized
    profile sets.  Parity with the expression version is pinned by
    tests/test_matching.py::test_serialize_text_twin_parity."""
    vals = [s for s in (samples or []) if s is not None]
    joined = sep.join(vals)

    if mode == "header_values_verbose":
        return f"{cls}Column: {header}{sep}Type: {data_type}{sep}Values: {joined}{sep}"
    if mode == "header_values_default":
        return f"{cls}{header}{sep}{data_type}{sep}{joined}"
    if mode == "header_values_prefix":
        return (
            f"{cls}header:{header}{sep}datatype:{data_type}{sep}"
            f"values:{', '.join(vals)}"
        )
    if mode in ("header_values_repeat", "header_header_values_repeat_notype"):
        repeated = sep.join([header] * 5)
        return f"{cls}{repeated}{sep}{data_type}{sep}{joined}"
    if mode == "header_only":
        return f"{cls}{header}{eos}"
    if mode == "header_values_verbose_notype":
        return f"{cls}Column: {header}{sep}Values: {joined}{sep}{eos}"
    if mode == "header_values_columnvaluepair_notype":
        pairs = sep.join(f"{header}:{v}" for v in vals)
        return f"{cls}Column: {header}{sep}Values: {pairs}{sep}{eos}"
    if mode == "header_values_default_notype":
        return f"{cls}{header}{sep}{joined}"
    raise ValueError(
        f"Unsupported encoding mode: {mode}. Supported modes are: {ENCODING_MODES}"
    )


def serialize_profiles(
    profiles: DataFrame,
    mode: str = "header_values_verbose",
    cls: str = "<s>",
    sep: str = "</s>",
    eos: str = "</s>",
) -> DataFrame:
    """profiles → (table_name, col_name, text) under ``mode``.

    Default mode matches the reference engine default
    (``encoding_mode="header_values_verbose"``, magneto.py:32).
    """
    return profiles.select(
        "table_name",
        "col_name",
        serialize_expr(
            mode,
            F.col("col_name"),
            F.col("sem_type"),
            F.coalesce(F.col("samples"), F.array()),
            cls=cls,
            sep=sep,
            eos=eos,
        ).alias("text"),
    )
