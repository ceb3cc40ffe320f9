"""Multimodal-column plumbing: treat image/audio/video as opaque BINARY
columns with typed metadata; decode / feature-extract via Arrow-batched
``mapInPandas``.

Decode kernels are REAL for the codec-free container formats — netpbm
P5/P6 (PGM/PPM), uncompressed BI_RGB BMP, and PCM WAV — parsed with
stdlib ``struct``/``wave`` plus numpy (header walk, pixel/sample arrays,
nearest-neighbor resample, grid/energy features). Compressed formats
(JPEG/PNG/MP4/...) need codec libraries that are NOT in this environment,
so payloads that don't sniff as a supported container fall back to a
clearly-marked deterministic STUB; the ``codec`` output column records
which path decoded each row. Swapping the fallback for PIL/ffmpeg is a
one-function change.

Scale notes: mapInPandas streams Arrow batches (no per-row Python overhead);
media bytes never hit the driver; `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds executor memory for large blobs.

Worker-serialization note: the decode helpers are (re)defined inside each
operator's batch function so cloudpickle ships them BY VALUE — executor
Python workers do not share the driver's sys.path, so module-level helper
references would fail to unpickle on a real cluster.
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
        StructField("codec", StringType()),
    ]
)


# Shared source for the in-worker netpbm header/pixel helpers. Defined as a
# factory so each operator's batch function instantiates the helpers
# locally and cloudpickle ships them by value (see module docstring); the
# factory itself runs on the DRIVER at plan time, so its closure results
# (plain functions over stdlib+numpy) are what travel to workers.
def _netpbm_helpers():
    def pnm_header(buf):
        """(channels, width, height, maxval, pixel_offset) for P5/P6, else
        None. Handles whitespace/comment runs per the netpbm spec."""
        if len(buf) < 4 or buf[:1] != b"P" or buf[1:2] not in b"56":
            return None
        ch = 3 if buf[1:2] == b"6" else 1
        toks, i = [], 2
        try:
            while len(toks) < 3:
                while i < len(buf) and buf[i : i + 1].isspace():
                    i += 1
                if buf[i : i + 1] == b"#":
                    while i < len(buf) and buf[i] != 0x0A:
                        i += 1
                    continue
                j = i
                while j < len(buf) and not buf[j : j + 1].isspace():
                    j += 1
                toks.append(int(buf[i:j]))
                i = j
            i += 1  # exactly one whitespace byte after maxval
        except (ValueError, IndexError):
            return None
        w, h, maxval = toks
        if w <= 0 or h <= 0 or not (0 < maxval < 65536):
            return None
        need = w * h * ch * (2 if maxval > 255 else 1)
        if len(buf) - i < need:
            return None
        return ch, w, h, maxval, i

    def pnm_pixels(buf):
        """(array[h, w, ch] uint8/uint16, maxval) or None."""
        import numpy as np

        hd = pnm_header(buf)
        if hd is None:
            return None
        ch, w, h, maxval, off = hd
        dt = ">u2" if maxval > 255 else np.uint8
        px = np.frombuffer(buf, dtype=dt, count=w * h * ch, offset=off)
        return px.reshape(h, w, ch), maxval

    return pnm_header, pnm_pixels


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
    """Decode media payloads via mapInPandas (Arrow batches).

    REAL header decode for codec-free containers — netpbm P5/P6 (pgm/ppm),
    uncompressed BI_RGB BMP (8/24/32 bpp), PCM WAV — yielding true
    width/height (images) or sample count (audio). Anything else (JPEG,
    PNG, MP4, ... — codec libs absent here) falls back to the
    deterministic byte-length stub; ``codec`` records the path
    ('ppm'/'pgm'/'bmp'/'wav'/'stub') so downstream filters can require
    real decodes.

    Extra input columns (anything beyond media_id/media_type/payload,
    e.g. a ``media_phash`` fingerprint) pass through unchanged — metadata
    ops compose in ONE mapInPandas pass instead of a re-scan + self-join
    per derived column.
    """
    pnm_header, _ = _netpbm_helpers()
    extra_fields = [
        f
        for f in df.schema.fields
        if f.name not in ("media_id", "media_type", "payload")
    ]
    extra_names = [f.name for f in extra_fields]
    out_schema = StructType(DECODED_SCHEMA.fields + extra_fields)

    def decode_batches(batches):
        import struct

        def sniff(buf):
            """(codec, width, height, n_frames) for supported containers."""
            hd = pnm_header(buf)
            if hd is not None:
                ch, w, h, _maxval, _off = hd
                return ("ppm" if ch == 3 else "pgm", w, h, 1)
            if buf[:2] == b"BM" and len(buf) >= 54:
                w, h = struct.unpack_from("<ii", buf, 18)
                planes, bpp = struct.unpack_from("<HH", buf, 26)
                (comp,) = struct.unpack_from("<I", buf, 30)
                if comp == 0 and planes == 1 and bpp in (8, 24, 32) and w > 0:
                    return ("bmp", w, abs(h), 1)
                return None
            if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
                import io
                import wave

                try:
                    with wave.open(io.BytesIO(bytes(buf))) as wf:
                        return ("wav", 0, 0, wf.getnframes())
                except Exception:
                    return None
            return None

        def fake(row_bytes: int, kind: str):
            # deterministic stand-in for absent codecs, derived from the
            # byte length (mirrored by the q26 oracle)
            if kind == "image":
                return (row_bytes % 640 + 1, row_bytes % 480 + 1, 1)
            if kind == "audio":
                return (0, 0, row_bytes % 1000 + 1)
            return (row_bytes % 1920 + 1, row_bytes % 1080 + 1, row_bytes % 240 + 1)

        for pdf in batches:
            n_bytes, dims, codecs = [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                buf = b"" if payload is None else bytes(payload)
                n_bytes.append(len(buf))
                real = sniff(buf) if buf else None
                if real is not None:
                    codecs.append(real[0])
                    dims.append(real[1:])
                else:
                    codecs.append("stub")
                    dims.append(fake(len(buf), mtype))
            out = pdf[["media_id", "media_type"]].copy()
            out["n_bytes"] = n_bytes
            out["width"] = [d[0] for d in dims]
            out["height"] = [d[1] for d in dims]
            out["n_frames"] = [d[2] for d in dims]
            out["codec"] = codecs
            for name in extra_names:
                out[name] = pdf[name]
            yield out

    return df.mapInPandas(decode_batches, out_schema)


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

    REAL resample for netpbm payloads: pixels decode to a numpy array,
    nearest-neighbor index-resample to the target grid, and re-encode as
    the same netpbm flavor — the output payload IS the resized image.
    Non-netpbm payloads (absent codecs) pass through unchanged with null
    dimensions, as do non-image rows — the op is safe on mixed media
    tables.
    """
    _, pnm_pixels = _netpbm_helpers()

    def resize_batches(batches):
        import numpy as np

        def resample(buf):
            dec = pnm_pixels(buf)
            if dec is None:
                return None
            px, maxval = dec
            h, w, ch = px.shape
            rows = (np.arange(height) * h) // height
            cols = (np.arange(width) * w) // width
            out = np.ascontiguousarray(px[rows][:, cols])
            magic = b"P6" if ch == 3 else b"P5"
            return (
                magic
                + b"\n%d %d\n%d\n" % (width, height, maxval)
                + out.tobytes()
            )

        for pdf in batches:
            payloads, ws, hs = [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                buf = None if payload is None else bytes(payload)
                resized = (
                    resample(buf) if (mtype == "image" and buf) else None
                )
                if resized is not None:
                    payloads.append(resized)
                    ws.append(width)
                    hs.append(height)
                else:
                    payloads.append(buf)
                    ws.append(None)
                    hs.append(None)
            out = pdf[["media_id", "media_type"]].copy()
            out["payload"] = payloads
            out["width"] = ws
            out["height"] = hs
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
    ``array<float>`` of length ``dim`` per row, ANN-ready (feeds
    ``ivf_ann_topk``/``cosine_topk`` directly).

    REAL features for decodable payloads: netpbm images produce a
    grayscale ``sqrt(dim) x sqrt(dim)`` intensity grid (nearest-sampled,
    scaled to [-1, 1)); PCM WAV audio produces ``dim`` windowed RMS
    energies. Undecodable payloads fall back to the deterministic
    md5-seeded pseudo-encoder so the column stays total.
    """
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    _, pnm_pixels = _netpbm_helpers()

    def feature_batches(batches):
        import hashlib
        import io
        import wave

        import numpy as np
        import pandas as pd

        side = max(int(dim**0.5), 1)

        def image_grid(buf):
            dec = pnm_pixels(buf)
            if dec is None:
                return None
            px, maxval = dec
            gray = px.astype(np.float64).mean(axis=2)
            h, w = gray.shape
            rows = (np.arange(side) * h) // side
            cols = (np.arange(side) * w) // side
            grid = gray[rows][:, cols] / maxval * 2.0 - 1.0  # [-1, 1)
            v = np.zeros(dim)
            v[: side * side] = grid.ravel()
            return v.astype(np.float32).tolist()

        def audio_energies(buf):
            if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
                return None
            try:
                with wave.open(io.BytesIO(buf)) as wf:
                    sw = wf.getsampwidth()
                    raw = wf.readframes(wf.getnframes())
            except Exception:
                return None
            if sw == 2:
                x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 2**15
            elif sw == 1:
                x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128
            else:
                return None
            if not len(x):
                return None
            # dim windowed RMS energies over the (channel-interleaved) signal
            bounds = (np.arange(dim + 1) * len(x)) // dim
            v = np.zeros(dim)
            for i in range(dim):
                seg = x[bounds[i] : bounds[i + 1]]
                if len(seg):
                    v[i] = np.sqrt(np.mean(seg * seg))
            return v.astype(np.float32).tolist()

        def pseudo(buf):
            # deterministic pseudo-encoder: md5-seeded byte expansion,
            # scaled to [-1, 1)
            seed = hashlib.md5(buf).digest()
            reps = (dim * 4) // len(seed) + 1
            raw = np.frombuffer((seed * reps)[: dim * 4], dtype="<u4")
            return ((raw / 2**31) - 1.0).astype(np.float32).tolist()

        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                if payload is None:
                    embs.append(None)
                    continue
                buf = bytes(payload)
                emb = image_grid(buf)
                if emb is None:
                    emb = audio_energies(buf)
                if emb is None:
                    emb = pseudo(buf)
                embs.append(emb)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "embedding": embs,
                }
            )

    return df.mapInPandas(feature_batches, schema)


def media_phash(
    df: DataFrame, payload_col: str = "payload", out_col: str = "phash"
) -> DataFrame:
    """64-bit perceptual fingerprint of a binary payload (average-hash
    family: aHash over a fixed-size downsample, Zauner 2010) as a pure
    JVM Column — appended to the input schema.

    Bit ``j`` is 1 iff the byte at offset ``floor(j*n/64)`` is strictly
    above the mean of the 64 sampled bytes (integer compare
    ``64*b_j > sum`` — no float). Null/empty payloads hash to 0. Bit 63
    carries Long.MIN_VALUE (two's complement), the simhash packing, so
    ``media_dup_pairs`` reuses the banded Hamming join unchanged.

    This is the content-defined near-dup key for media corpora: byte-level
    exact dedup misses re-muxed/re-padded copies, while the stride sample
    tracks gross payload structure. With real codecs the input would be
    the decoded luma plane; over raw bytes the plumbing, banding, and
    oracle arithmetic are identical.

    Scale: 64 codegen'd substring/conv terms over the hex projection —
    map-only, zero shuffle, no Python. DuckDB mirrors every term
    (``('0x' || substr(hex(payload), 2*off+1, 2))::int``), so gate hashes
    match bit-for-bit.
    """
    payload = F.col(payload_col)
    n = F.length(payload)
    # Byte j: hex a ONE-BYTE binary slice, not the whole payload (hexing
    # a ~5 KB payload once per row measured 9.2-12.6 s at 500k docs vs
    # 6.9-7.8 s for single-byte slices, identical fingerprints — the
    # full-hex projection materializes a 2n-char string per row).
    #
    # HOF formulation over a 64-element sequence, NOT 64 flat columns:
    # the 64-wide struct spelling measured 2.3 s at 5k docs (pure
    # Catalyst planning/codegen of a ~1000-node plan) and 4.7 s at 500k,
    # vs 0.5 s / 1.4 s for this interpreted-HOF plan — the wide plan
    # falls out of whole-stage codegen while 64 interpreted iterations
    # per row are trivial. Opposite outcome to simhash's wide-vs-HOF
    # trade (dedup.py): there the per-row feature count is unbounded,
    # here it is a fixed 64.
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: F.conv(
            F.hex(
                F.substring(
                    payload, (F.floor((j * n) / F.lit(64))).cast("int") + 1, 1
                )
            ),
            16,
            10,
        ).cast("int"),
    )
    # Two Generate barriers (the shingled_docs idiom): _ba is consumed by
    # both the total fold and the bit fold, _bt by all 64 bit compares —
    # unpinned, Catalyst re-derives the sampled array per consumer.
    sampled = df.withColumn("_ba", F.explode(F.array(arr)))
    total = F.aggregate(F.col("_ba"), F.lit(0), lambda a, x: a + x)
    pinned = sampled.withColumn("_bt", F.explode(F.array(total)))
    weights = F.array(
        *[
            F.lit(-(1 << 63) if j == 63 else (1 << j)).cast("bigint")
            for j in range(64)
        ]
    )
    fp = F.aggregate(
        F.zip_with(
            F.col("_ba"),
            weights,
            lambda b, w: F.when(b * 64 > F.col("_bt"), w).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    guarded = F.when(
        payload.isNull() | (n == 0), F.lit(0).cast("bigint")
    ).otherwise(fp)
    return pinned.withColumn(out_col, guarded).drop("_ba", "_bt")


def media_dup_pairs(
    fps: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
    fp_col: str = "phash",
) -> DataFrame:
    """Near-dup media pairs by fingerprint Hamming distance — delegates to
    ``simhash_pairs`` (dedup.py): same 4x16-bit exact banding, same
    pigeonhole-exact radius-3 guarantee, same near-linear per-band
    self-join at corpus scale. Output: (media_a, media_b, hamming)."""
    from exon_spark.operators.dedup import simhash_pairs

    renamed = fps.select(
        F.col(id_col).alias("doc_id"), F.col(fp_col).alias("simhash")
    )
    return simhash_pairs(renamed, max_hamming).select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )
