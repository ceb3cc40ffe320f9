"""Multimodal-column plumbing: treat image/audio/video as opaque BINARY
columns with typed metadata; decode / feature-extract via Arrow-batched
``mapInPandas``.

The actual media codecs are NOT available in this environment, so the decode
kernel is a clearly-marked deterministic STUB (``_fake_decode``) — but the
Spark-side plumbing is real and tested: binary column handling, schema
contract, partition-preserving mapInPandas with Arrow batches, and batch-size
control. Swapping ``_fake_decode`` for PIL/ffmpeg is a one-function change.

Scale notes: mapInPandas streams Arrow batches (no per-row Python overhead);
media bytes never hit the driver; `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds executor memory for large blobs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def with_media_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Synthesize a deterministic binary payload column from text (stands in
    for real image/audio bytes; preserves the binary-column code path)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3).cast("int") + 1,
        ).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas (Arrow batches).

    STUB decode: real deployments replace ``_fake_decode`` with PIL /
    torchaudio / ffmpeg calls; everything else (schema, batching,
    partitioning) is production-shaped.
    """

    def decode_batches(batches):
        for pdf in batches:
            n_bytes = pdf["payload"].map(lambda b: 0 if b is None else len(b))

            def _fake_decode(row_bytes: int, kind: str) -> tuple[int, int, int]:
                # deterministic stand-in for a codec: derive fake dimensions
                # from the byte length. Replace with a real decoder.
                if kind == "image":
                    return (row_bytes % 640 + 1, row_bytes % 480 + 1, 1)
                if kind == "audio":
                    return (0, 0, row_bytes % 1000 + 1)
                return (row_bytes % 1920 + 1, row_bytes % 1080 + 1, row_bytes % 240 + 1)

            dims = [
                _fake_decode(nb, mt)
                for nb, mt in zip(n_bytes, pdf["media_type"])
            ]
            out = pdf[["media_id", "media_type"]].copy()
            out["n_bytes"] = n_bytes.astype("int32")
            out["width"] = [d[0] for d in dims]
            out["height"] = [d[1] for d in dims]
            out["n_frames"] = [d[2] for d in dims]
            yield out

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)
