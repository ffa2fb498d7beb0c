"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The container ships no image/audio codecs, so the DECODE step is a
deterministic fake (clearly marked, seam for Pillow/torchaudio/pyav); the
Spark-side plumbing — schema, batch shape, partitioning, UDF signatures — is
real and tested.  The fake "decode" derives pixel/sample statistics from the
payload bytes so downstream operators (resize, frame sample, feature extract)
have stable, assertable semantics.

Payload format (synthesized by :func:`synthesize_media`, parsed by
``_fake_decode``): a 15-byte ASCII header —
``b"FAKE" + kind(1 char: I/A/V) + width(5 chars, zero-padded decimal) +
height(5 chars, zero-padded decimal)`` — followed by the body bytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image / audio / video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

def synthesize_media(docs: DataFrame, kind_cycle=("image", "audio", "video")) -> DataFrame:
    """Deterministic media table derived from ``documents``: payload bytes =
    fake header + utf-8 text body. Pure expressions."""
    kinds = F.array(*[F.lit(k) for k in kind_cycle])
    kind = F.element_at(kinds, (F.col("doc_id") % len(kind_cycle) + 1).cast("int"))
    w = (F.col("doc_id") % 64 + 1).cast("int")
    h = (F.col("doc_id") % 48 + 1).cast("int")
    header = F.concat(
        F.lit(b"FAKE"),
        F.encode(F.substring(F.upper(kind), 1, 1), "utf-8"),
        F.encode(F.lpad(w.cast("string"), 5, "0"), "utf-8"),
        F.encode(F.lpad(h.cast("string"), 5, "0"), "utf-8"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(header, F.encode(F.col("text"), "utf-8")).alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, n_features: int) -> tuple[int, int, int, list[float]]:
    """STUB decode — replace with a real codec when available.  Parses the
    fake header and derives deterministic 'pixel statistics' from body bytes."""
    if payload is None or len(payload) < 15 or payload[:4] != b"FAKE":
        raise NotImplementedError(
            "real media decode not available in this container; payload must "
            "be synthesize_media() format"
        )
    w = int(payload[5:10].decode())
    h = int(payload[10:15].decode())
    body = np.frombuffer(payload[15:], dtype=np.uint8).astype(np.float64)
    if body.size == 0:
        feats = np.zeros(n_features)
    else:
        pad = (-body.size) % n_features
        padded = np.pad(body, (0, pad))
        feats = padded.reshape(n_features, -1).mean(axis=1) / 255.0
    return w, h, len(payload), feats.astype(np.float32).tolist()


def decode_media(media: DataFrame, n_features: int = 16) -> DataFrame:
    """mapInPandas decode: binary payload → typed dimensions + feature vector.
    Arrow-batched; one Python worker pass over each partition."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (mid, kind, *_fake_decode(payload, n_features))
                for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "n_bytes", "features"],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _decode, DECODED_SCHEMA
    )


def resize_features(decoded: DataFrame, out_dim: int) -> DataFrame:
    """'Resize' = average-pool the feature vector to ``out_dim`` (expression-
    only; stands in for image resize over the decoded representation)."""
    idx = F.sequence(F.lit(0), F.lit(out_dim - 1))
    src_n = F.size("features")
    stride = (src_n / out_dim).cast("double")
    pooled = F.transform(
        idx,
        lambda i: F.element_at(
            F.col("features"), (F.floor(i * stride) + 1).cast("int")
        ),
    )
    return decoded.withColumn("features", pooled)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for 'video' payloads: body bytes → every-Nth 'frame'
    (byte) retained; non-video rows pass through unchanged. Expression-only."""
    body = F.decode(F.expr("substring(payload, 16, length(payload))"), "utf-8")
    sampled_body = F.array_join(
        F.filter(
            F.transform(
                F.split(body, ""),
                lambda ch, i: F.when(i % every_n == 0, ch).otherwise(F.lit(None)),
            ),
            lambda x: x.isNotNull(),
        ),
        "",
    )
    new_payload = F.concat(
        F.expr("substring(payload, 1, 15)"), F.encode(sampled_body, "utf-8")
    )
    return media.withColumn(
        "payload",
        F.when(F.col("kind") == "video", new_payload).otherwise(F.col("payload")),
    )
