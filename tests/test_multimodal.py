"""Multimodal plumbing: binary payloads + typed metadata through
Arrow-batched mapInPandas — schema, batching, determinism, stub gating."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ovalspark.operators.multimodal import (
    check_media_metadata,
    extract_features,
    generate_media_assets,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return generate_media_assets(spark, 300, payload_len=1024).cache()


def test_generator_deterministic_and_typed(spark, media):
    again = generate_media_assets(spark, 300, payload_len=1024)
    assert media.exceptAll(again).count() == 0
    row = media.filter(F.col("media_type") == "video").first()
    assert len(row.payload) == 1024
    assert row.meta.n_frames is not None and row.meta.sample_rate is not None
    img = media.filter(F.col("media_type") == "image").first()
    assert img.meta.n_frames is None  # images have no frames


def test_extract_features_schema_and_determinism(spark, media):
    feats = extract_features(media, dim=8)
    assert [f.name for f in feats.schema.fields] == ["asset_id", "media_type", "n_bytes", "mean_byte", "byte_entropy", "feature"]
    rows = {r.asset_id: r for r in feats.collect()}
    assert len(rows) == 300
    r = next(iter(rows.values()))
    assert r.n_bytes == 1024 and len(r.feature) == 8
    assert 0.0 < r.byte_entropy <= 8.0  # bytes from md5 → near-uniform
    # deterministic across repartitioning
    rows2 = {r.asset_id: r for r in extract_features(media.repartition(7), dim=8).collect()}
    assert rows.keys() == rows2.keys()
    assert all(rows[k].feature == rows2[k].feature for k in rows)


def test_feature_vectors_usable_for_similarity(spark, media):
    """Feature output plugs straight into the similarity operators."""
    from ovalspark.operators.similarity import cosine_topk

    feats = extract_features(media, dim=8).withColumnRenamed("asset_id", "vec_id").withColumnRenamed("feature", "embedding")
    q = feats.first().embedding
    top = cosine_topk(feats, list(q), k=5, id_col="vec_id", vec_col="embedding").collect()
    assert len(top) == 5 and top[0].cos_sim == pytest.approx(1.0, abs=1e-6)


def test_sample_frames_only_video_and_exploded(spark, media):
    frames = sample_frames(media, every_n=60)
    got = frames.collect()
    assert got, "expected sampled frames"
    video_ids = {r.asset_id for r in media.filter(F.col("media_type") == "video").collect()}
    assert {r.asset_id for r in got} <= video_ids
    assert all(r.frame_idx % 60 == 0 and len(r.frame) > 0 for r in got)


def test_resize_without_pillow_raises_cleanly(spark, media):
    """Without the optional codec the kernel must fail LOUDLY per batch,
    never return a silent empty frame."""
    from ovalspark.operators.multimodal import pillow_available

    if pillow_available():
        pytest.skip("Pillow present — covered by test_resize_with_pillow")
    with pytest.raises(Exception) as ei:
        resize_images(media).collect()
    assert "NotImplementedError" in str(ei.value) or "Pillow" in str(ei.value)


def test_resize_with_pillow(spark, media):
    """With Pillow importable the real kernel decodes, thumbnails with
    preserved aspect, and re-encodes PNG bytes."""
    from ovalspark.operators.multimodal import pillow_available

    if not pillow_available():
        pytest.skip("Pillow not installed (optional dependency)")
    import io

    from PIL import Image

    # synthetic payloads aren't decodable images: build one real PNG
    img = Image.new("RGB", (128, 64), (200, 10, 10))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [("img-1", "image", None, bytearray(buf.getvalue()))],
        "asset_id string, media_type string, meta struct<width:int,height:int>, payload binary",
    )
    got = resize_images(df, max_side=32).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.width, r.height) == (32, 16)  # aspect preserved
    back = Image.open(io.BytesIO(bytes(r.thumb)))
    assert back.size == (32, 16)


def test_metadata_validation(spark, media):
    assert check_media_metadata(media).count() == 0
    broken = media.withColumn(
        "meta",
        F.when(
            F.col("media_type") == "video",
            F.struct(
                F.col("meta.width").alias("width"),
                F.col("meta.height").alias("height"),
                F.col("meta.sample_rate").alias("sample_rate"),
                F.lit(None).cast("int").alias("n_frames"),
                F.col("meta.codec").alias("codec"),
            ),
        ).otherwise(F.col("meta")),
    )
    v = check_media_metadata(broken)
    n_videos = media.filter(F.col("media_type") == "video").count()
    assert v.count() == n_videos
    assert {r.field for r in v.collect()} == {"n_frames"}
