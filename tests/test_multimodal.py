"""Multimodal plumbing: binary columns through mapInPandas — decode,
resize, frame-sample, feature-extract. Kernels are REAL for codec-free
containers (netpbm/BMP/WAV, tested against hand-built payloads with known
pixels/samples); other formats ride the deterministic stub fallback."""

import io
import struct
import wave

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _media(spark):
    from exon_spark.operators import with_media_payload

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return with_media_payload(docs)


def test_decode_media_shapes(spark):
    from exon_spark.operators import decode_media

    out = decode_media(_media(spark))
    rows = out.collect()
    assert len(rows) == spark.read.parquet(f"{SF}/documents.parquet").count()
    for r in rows:
        if r.media_type == "audio":
            assert (r.width, r.height) == (0, 0) and r.n_frames >= 1
        else:
            assert r.width >= 1 and r.height >= 1


def test_resize_images_passthrough(spark):
    """Non-decodable payloads (text bytes aren't netpbm) pass through
    unchanged with null dims — resize only claims dimensions it actually
    produced."""
    from exon_spark.operators.multimodal import resize_images

    out = resize_images(_media(spark), 224, 224).collect()
    for r in out:
        assert r.width is None and r.height is None
        assert r.payload is not None


def test_sample_frames_only_videos(spark):
    from exon_spark.operators.multimodal import sample_frames

    media = _media(spark)
    out = sample_frames(media, every_n=10)
    rows = out.collect()
    video_ids = {
        r.media_id for r in media.filter(F.col("media_type") == "video").collect()
    }
    assert {r.media_id for r in rows} <= video_ids
    assert all(r.frame_idx % 10 == 0 for r in rows)
    assert all(len(r.frame) <= 16 for r in rows)


def test_extract_features_feed_ann(spark):
    from exon_spark.operators import cosine_topk
    from exon_spark.operators.multimodal import extract_features

    feats = extract_features(_media(spark), dim=64).withColumnRenamed(
        "media_id", "vec_id"
    )
    assert dict(feats.dtypes)["embedding"] == "array<float>"
    sample = feats.limit(64).cache()
    first = sample.first()
    assert len(first.embedding) == 64
    # embeddings are deterministic: same payload -> same vector
    again = extract_features(_media(spark), dim=64).filter(
        F.col("media_id") == first.vec_id
    ).first()
    assert again.embedding == first.embedding
    # and they feed the ANN operators directly
    topk = cosine_topk(sample, sample.limit(2), k=3)
    assert topk.count() == 2 * 3


def _ppm_4x2():
    # P6 4x2: top row = red,green,blue,white; bottom = black,gray,black,gray
    px = bytes(
        [255,0,0, 0,255,0, 0,0,255, 255,255,255,
         0,0,0, 128,128,128, 0,0,0, 128,128,128]
    )
    return b"P6\n# comment\n4 2\n255\n" + px


def _wav_mono(samples):
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(struct.pack("<%dh" % len(samples), *samples))
    return bio.getvalue()


def _bmp_header(w, h, bpp=24):
    # minimal BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB, no pixel data
    # needed for header decode
    row = (w * bpp // 8 + 3) & ~3
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, row * h, 0, 0, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 54 + row * h, 0, 0, 54)
    return head + info + b"\x00" * (row * h)


def _payload_df(spark, rows):
    return spark.createDataFrame(
        rows, "media_id bigint, media_type string, payload binary"
    )


def test_decode_media_real_containers(spark):
    from exon_spark.operators import decode_media

    df = _payload_df(
        spark,
        [
            (1, "image", _ppm_4x2()),
            (2, "audio", _wav_mono([1000] * 16)),
            (3, "image", _bmp_header(7, 5)),
            (4, "image", b"not an image at all........."),
        ],
    )
    out = {r.media_id: r for r in decode_media(df).collect()}
    assert (out[1].codec, out[1].width, out[1].height, out[1].n_frames) == (
        "ppm", 4, 2, 1,
    )
    assert (out[2].codec, out[2].width, out[2].n_frames) == ("wav", 0, 16)
    assert (out[3].codec, out[3].width, out[3].height) == ("bmp", 7, 5)
    assert out[4].codec == "stub"


def test_resize_ppm_real_nearest_neighbor(spark):
    from exon_spark.operators.multimodal import resize_images

    df = _payload_df(spark, [(1, "image", _ppm_4x2())])
    r = resize_images(df, width=2, height=1).collect()[0]
    assert (r.width, r.height) == (2, 1)
    # nearest-neighbor with floor mapping: row 0 of 1 -> src row 0;
    # cols (0,1) of 2 -> src cols (0, 2) -> red, blue
    assert bytes(r.payload) == b"P6\n2 1\n255\n" + bytes([255,0,0, 0,0,255])


def test_extract_features_real_image_and_audio(spark):
    from exon_spark.operators.multimodal import extract_features

    df = _payload_df(
        spark,
        [(1, "image", _ppm_4x2()), (2, "audio", _wav_mono([16384] * 64))],
    )
    out = {r.media_id: r for r in extract_features(df, dim=64).collect()}
    img = out[1].embedding
    assert len(img) == 64
    # 8x8 grid nearest-sampled from 4x2: first grid cell = red pixel
    # grayscale (255/3)/255*2-1
    assert abs(img[0] - ((255 / 3) / 255 * 2 - 1)) < 1e-6
    # white pixel (top-right region) maps to +1-ish
    assert abs(img[7] - 1.0) < 1e-5
    aud = out[2].embedding
    # constant-amplitude PCM: every RMS window = 16384/32768 = 0.5
    assert len(aud) == 64
    assert all(abs(v - 0.5) < 1e-6 for v in aud)


def _py_phash(buf: bytes) -> int:
    """Pure-Python aHash reference (mirrors media_phash bit-for-bit)."""
    if not buf:
        return 0
    n = len(buf)
    sample = [buf[(j * n) // 64] for j in range(64)]
    s = sum(sample)
    fp = 0
    for j, x in enumerate(sample):
        if 64 * x > s:
            fp |= 1 << j
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def test_media_phash_hand_computed(spark):
    from exon_spark.operators import media_phash

    payloads = [
        b"short",  # n < 64: offsets repeat bytes
        bytes(range(256)),  # monotone ramp
        b"\x00" * 100,  # constant: no byte above mean -> 0
        "héllo 世界 payload".encode("utf-8") * 7,  # multi-byte
        bytes([255] + [0] * 200),  # one hot byte
        b"",  # empty -> 0
        None,  # null -> 0
    ]
    rows = [(i, bytearray(p) if p is not None else None) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r["media_id"]: r["phash"] for r in media_phash(df).collect()}
    for i, p in enumerate(payloads):
        assert out[i] == _py_phash(p or b""), f"payload {i}"


def test_media_phash_plan_jvm_only(spark):
    from exon_spark.operators import media_phash

    df = spark.createDataFrame([(1, bytearray(b"x" * 80))], "media_id bigint, payload binary")
    plan = media_phash(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python UDF in the hot path


def test_media_dup_pairs_radius(spark):
    from exon_spark.operators import media_dup_pairs, media_phash

    base = bytes(range(200))
    # id 2 = exact copy of 1; id 3 = one sampled byte nudged above/below
    # the mean (small hamming); id 4 = unrelated constant payload
    near = bytearray(base)
    near[100] = 255
    rows = [
        (1, bytearray(base)),
        (2, bytearray(base)),
        (3, near),
        (4, bytearray(b"\x07" * 200)),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    fps = media_phash(df).select("media_id", "phash")
    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in media_dup_pairs(fps, max_hamming=8).collect()
    }
    assert got[(1, 2)] == 0  # exact copy always pairs at hamming 0
    exp = {}
    hm = {i: _py_phash(bytes(p)) for i, p in rows}
    for a in (1, 2, 3, 4):
        for b in (1, 2, 3, 4):
            if a < b:
                d = bin((hm[a] ^ hm[b]) & ((1 << 64) - 1)).count("1")
                if d <= 8:
                    exp[(a, b)] = d
    assert got == exp


def test_decode_media_passes_extra_columns_through(spark):
    from exon_spark.operators import decode_media, media_phash

    rows = [(1, "image", bytearray(b"payload one" * 10)), (2, "audio", bytearray(b"pp" * 40))]
    df = spark.createDataFrame(rows, "media_id bigint, media_type string, payload binary")
    out = decode_media(media_phash(df))
    assert "phash" in out.columns  # fingerprint rides through the decode
    got = {r["media_id"]: r for r in out.collect()}
    exp = {r["media_id"]: r["phash"] for r in media_phash(df).collect()}
    for i in (1, 2):
        assert got[i]["phash"] == exp[i]
        assert got[i]["codec"] == "stub"
    # no extra columns -> unchanged legacy schema
    legacy = decode_media(df)
    assert legacy.columns == [
        "media_id", "media_type", "n_bytes", "width", "height", "n_frames", "codec",
    ]
