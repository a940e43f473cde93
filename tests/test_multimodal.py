"""Multimodal plumbing: mapInPandas feature extraction over binary
columns, frame sampling, stub boundary behavior."""

import pytest
from pyspark.sql import functions as F

from deja_view_spark.functions.multimodal import (
    extract_media_features,
    fake_media_bytes,
    fake_media_df,
    sample_video_frames,
    MEDIA_SCHEMA,
)


@pytest.fixture(scope="module")
def media(spark):
    return fake_media_df(spark, n=60).cache()


def test_feature_extraction_schema_and_rows(media):
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 60
    by_kind = {r.kind: r for r in rows}
    img = [r for r in rows if r.kind == "image"][0]
    assert img.width == 640 and img.channels == 3
    aud = [r for r in rows if r.kind == "audio"][0]
    assert aud.sample_rate == 16000 and aud.duration_s > 0
    vid = [r for r in rows if r.kind == "video"][0]
    assert vid.n_frames >= 30


def test_sha256_lineage_matches_jvm(media):
    """content_sha256 from the Python path equals JVM sha2(data) —
    the cross-boundary lineage invariant."""
    feats = extract_media_features(media).select("media_id", "content_sha256")
    jvm = media.select(
        "media_id", F.lower(F.sha2(F.col("data"), 256)).alias("jvm_sha")
    )
    mismatches = (
        feats.join(jvm, "media_id")
        .where(F.col("content_sha256") != F.col("jvm_sha"))
        .count()
    )
    assert mismatches == 0


def test_frame_sampling(media):
    frames = sample_video_frames(media, every_n=10, max_frames=4).collect()
    assert frames
    per_media = {}
    for r in frames:
        per_media.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in per_media.values():
        assert len(idxs) <= 4
        assert all(i % 10 == 0 for i in idxs)


def test_unknown_format_raises(spark):
    bad = spark.createDataFrame(
        [(0, "image", bytearray(b"\x89PNG\r\n..."), "s")], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_media_features(bad).collect()


def test_partition_parallel_shape(media):
    """mapInPandas preserves distribution: works identically over a
    repartitioned input (each partition decoded independently)."""
    a = sorted(
        map(tuple, extract_media_features(media).collect())
    )
    b = sorted(
        map(tuple, extract_media_features(media.repartition(7)).collect())
    )
    assert a == b


def test_resize_images_geometry(media):
    from deja_view_spark.functions.multimodal import resize_images

    got = {r["media_id"]: r for r in resize_images(media, max_side=256).collect()}
    assert len(got) > 0
    for mid, r in got.items():
        # aspect-preserving, bounded by max_side, never upscaled
        assert max(r["new_height"], r["new_width"]) <= 256
        assert r["new_height"] <= r["height"] and r["new_width"] <= r["width"]
        ratio_in = r["height"] / r["width"]
        ratio_out = r["new_height"] / r["new_width"]
        assert abs(ratio_in - ratio_out) < 0.02
        assert len(r["resized_sha256"]) == 64
