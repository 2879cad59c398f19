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


def test_resize_status_accounting_with_fake_codec(spark):
    """The status contract (ok / empty / undecodable:<Exc>) must hold:
    one output row per input image, corrupted assets surfaced, never
    dropped. Pillow is optional and absent in CI, so ship a minimal fake
    PIL to the executors via addPyFile; when real Pillow exists this is
    covered (stronger) by test_resize_with_pillow, and injecting a fake
    would shadow it for the rest of the session — skip then."""
    from ovalspark.operators.multimodal import pillow_available

    if pillow_available():
        pytest.skip("real Pillow present — fake would shadow it session-wide")
    import os
    import tempfile
    import zipfile

    fake_pil = (
        "import io\n"
        "class _Img:\n"
        "    def __init__(self, data):\n"
        "        if not data.startswith(b'FAKEPNG'):\n"
        "            raise ValueError('not a fake png')\n"
        "        self.width, self.height = 128, 64\n"
        "    def thumbnail(self, size):\n"
        "        self.width, self.height = size[0], size[1] // 2\n"
        "    def save(self, buf, format=None):\n"
        "        buf.write(b'THUMB')\n"
        "def open(fp):\n"
        "    return _Img(fp.read())\n"
    )
    d = tempfile.mkdtemp()
    zpath = os.path.join(d, "fakepil.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("PIL/__init__.py", "")
        z.writestr("PIL/Image.py", fake_pil)
    spark.sparkContext.addPyFile(zpath)

    df = spark.createDataFrame(
        [
            ("img-ok", "image", None, bytearray(b"FAKEPNG....")),
            ("img-corrupt", "image", None, bytearray(b"\x00garbage\xff")),
            ("img-empty", "image", None, bytearray(b"")),
        ],
        "asset_id string, media_type string, meta struct<width:int,height:int>, payload binary",
    )
    got = {r.asset_id: r for r in resize_images(df, max_side=32).collect()}
    assert set(got) == {"img-ok", "img-corrupt", "img-empty"}  # nothing vanishes
    ok = got["img-ok"]
    assert ok.status == "ok" and bytes(ok.thumb) == b"THUMB" and (ok.width, ok.height) == (32, 16)
    bad = got["img-corrupt"]
    assert bad.status == "undecodable:ValueError" and bad.thumb is None and bad.width is None
    assert got["img-empty"].status == "empty"
    # a per-status count is one groupBy away — the loud-failure contract
    counts = {r.status: r["count"] for r in resize_images(df).groupBy("status").count().collect()}
    assert counts == {"ok": 1, "undecodable:ValueError": 1, "empty": 1}


def test_resize_with_pillow(spark, media):
    """With Pillow importable the real kernel decodes, thumbnails with
    preserved aspect, and re-encodes PNG bytes."""
    from ovalspark.operators.multimodal import pillow_available

    if not pillow_available():
        pytest.skip("Pillow not installed (optional dependency)")
    import io

    from PIL import Image

    if not hasattr(Image, "new"):
        pytest.skip("fake test codec shadows PIL (addPyFile is session-wide)")

    # synthetic payloads aren't decodable images: build one real PNG, plus
    # a corrupted payload and an empty one — both must surface as status
    # rows, never silently vanish from the output
    img = Image.new("RGB", (128, 64), (200, 10, 10))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [
            ("img-1", "image", None, bytearray(buf.getvalue())),
            ("img-corrupt", "image", None, bytearray(b"\x00not-a-png\xff" * 5)),
            ("img-empty", "image", None, bytearray(b"")),
        ],
        "asset_id string, media_type string, meta struct<width:int,height:int>, payload binary",
    )
    got = {r.asset_id: r for r in resize_images(df, max_side=32).collect()}
    assert set(got) == {"img-1", "img-corrupt", "img-empty"}  # one row per input
    r = got["img-1"]
    assert r.status == "ok"
    assert (r.width, r.height) == (32, 16)  # aspect preserved
    back = Image.open(io.BytesIO(bytes(r.thumb)))
    assert back.size == (32, 16)
    bad = got["img-corrupt"]
    assert bad.status.startswith("undecodable:") and bad.thumb is None
    assert got["img-empty"].status == "empty"


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
