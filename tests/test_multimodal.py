"""Multimodal plumbing: binary columns through mapInPandas — decode,
resize, frame-sample, feature-extract (stub kernels, real Spark shape)."""

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
    from exon_spark.operators.multimodal import resize_images

    out = resize_images(_media(spark), 224, 224).collect()
    for r in out:
        if r.media_type == "image":
            assert (r.width, r.height) == (224, 224)
        else:
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
