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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize image payloads to a fixed (width, height) via mapInPandas.

    STUB resize: the payload passes through unchanged and only the target
    dimensions are attached (a real deployment decodes + resamples with
    PIL/opencv inside the same batch loop). Non-image rows pass through
    with their payload and null dimensions — the op is safe on mixed
    media tables.
    """

    def resize_batches(batches):
        for pdf in batches:
            out = pdf[["media_id", "media_type", "payload"]].copy()
            is_img = pdf["media_type"] == "image"
            out["width"] = [width if i else None for i in is_img]
            out["height"] = [height if i else None for i in is_img]
            yield out

    return df.mapInPandas(resize_batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Explode video payloads into sampled frames (one output row per kept
    frame) via mapInPandas — the 1:N shape real frame extraction has.

    STUB sampler: frame count comes from the same deterministic fake as
    ``decode_media`` and each "frame" is a byte slice of the payload; a real
    deployment runs ffmpeg/pyav per batch. Non-video rows emit nothing.
    """

    def frame_batches(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if mtype != "video" or payload is None:
                    continue
                n_frames = len(payload) % 240 + 1
                for f in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(f)
                    start = (f * 16) % max(len(payload), 1)
                    frames.append(bytes(payload[start : start + 16]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(frame_batches, FRAMES_SCHEMA)


def extract_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """Media -> embedding feature extraction via mapInPandas: one
    ``array<float>`` of length ``dim`` per row, derived deterministically
    from the payload bytes (STUB for a real vision/audio encoder — the
    output contract, Arrow batching and downstream ANN compatibility are
    the real parts: the result feeds ``ivf_ann_topk``/``cosine_topk``
    directly).
    """
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def feature_batches(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                if payload is None:
                    embs.append(None)
                    continue
                # deterministic pseudo-encoder: md5-seeded byte expansion,
                # scaled to [-1, 1)
                seed = hashlib.md5(bytes(payload)).digest()
                reps = (dim * 4) // len(seed) + 1
                raw = np.frombuffer((seed * reps)[: dim * 4], dtype="<u4")
                embs.append(
                    ((raw / 2**31) - 1.0).astype(np.float32).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "embedding": embs,
                }
            )

    return df.mapInPandas(feature_batches, schema)
