"""Canonical StructTypes for the engine.

The ``transcripts`` shape is the north-rule ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.  The change feed adds ``lsn:long`` (globally monotone) and
``op:string`` ('I'/'U'/'D') plus, under schema drift, renamed/added payload
columns.

Matching IRs follow SURVEY.md §1.4: the reference's nested
``{src:{tgt:score}}`` similarity map (magneto/magneto.py:232 in the reference)
becomes a flat ``candidates`` DataFrame; the Valentine match format becomes a
``matches`` DataFrame.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- lake / CDC -----------------------------------------------------------

TRANSCRIPTS_FIELDS = [
    ("conv_id", T.StringType()),
    ("turn_idx", T.IntegerType()),
    ("role", T.StringType()),
    ("text", T.StringType()),
    ("tool", T.StringType()),
    ("ts", T.TimestampType()),
]

TRANSCRIPTS_SCHEMA = T.StructType(
    [T.StructField(n, t, True) for n, t in TRANSCRIPTS_FIELDS]
)

#: primary key of the transcripts table — the MERGE / dedup key.
TRANSCRIPT_KEY = ["conv_id", "turn_idx"]

CHANGE_FEED_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
    ]
    + [T.StructField(n, t, True) for n, t in TRANSCRIPTS_FIELDS]
)

# --- matching IRs ---------------------------------------------------------

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType(), False),
        T.StructField("col_name", T.StringType(), False),
        T.StructField("phys_type", T.StringType(), True),
        T.StructField("sem_type", T.StringType(), True),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("n_distinct", T.LongType(), True),
        T.StructField("distinct_ratio", T.DoubleType(), True),
        T.StructField("null_frac", T.DoubleType(), True),
        T.StructField("numeric_frac", T.DoubleType(), True),
        T.StructField("datetime_frac", T.DoubleType(), True),
        T.StructField("samples", T.ArrayType(T.StringType()), True),
    ]
)

CANDIDATES_SCHEMA = T.StructType(
    [
        T.StructField("src_col", T.StringType(), False),
        T.StructField("tgt_col", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("strategy", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

MATCHES_SCHEMA = T.StructType(
    [
        T.StructField("src_table", T.StringType(), False),
        T.StructField("src_col", T.StringType(), False),
        T.StructField("tgt_table", T.StringType(), False),
        T.StructField("tgt_col", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)
