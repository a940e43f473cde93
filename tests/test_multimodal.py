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


def test_resize_pixel_parity_with_numpy_oracle(spark):
    """The distributed resample's output bytes equal an independent
    driver-side numpy oracle (floor-index nearest-neighbor), pixel for
    pixel — the compute path is real, not a geometry stub."""
    import hashlib

    import numpy as np

    from deja_view_spark.functions.multimodal import (
        fake_media_bytes,
        resize_images,
    )

    rng = np.random.default_rng(11)
    rows, oracle = [], {}
    for i, (h, w) in enumerate([(40, 64), (300, 200), (17, 13)]):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append(
            (i, "image", bytearray(fake_media_bytes(
                "image", height=h, width=w, channels=3, payload=px.tobytes()
            )), "s")
        )
        scale = min(1.0, 32 / max(h, w, 1))
        nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
        ih = np.floor(np.arange(nh) * h / nh).astype(int)
        iw = np.floor(np.arange(nw) * w / nw).astype(int)
        expect = np.ascontiguousarray(px[ih][:, iw]).tobytes()
        oracle[i] = (nh, nw, expect, hashlib.sha256(expect).hexdigest())
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in resize_images(media, max_side=32).collect()}
    assert set(got) == set(oracle)
    for mid, (nh, nw, expect, sha) in oracle.items():
        r = got[mid]
        assert (r["new_height"], r["new_width"]) == (nh, nw)
        assert bytes(r["resized_bytes"]) == expect
        assert r["resized_sha256"] == sha


def test_audio_stats_numpy_oracle(spark):
    """Audio RMS/mean/peak match the numpy oracle on raw PCM."""
    import numpy as np

    from deja_view_spark.functions.multimodal import audio_stats, fake_media_bytes

    rng = np.random.default_rng(3)
    s = rng.integers(-30000, 30000, size=4096, dtype=np.int16)
    media = spark.createDataFrame(
        [(0, "audio", bytearray(fake_media_bytes(
            "audio", channels=1, sample_rate=8000, duration_ms=512,
            payload=s.astype("<i2").tobytes(),
        )), "s")],
        MEDIA_SCHEMA,
    )
    r = audio_stats(media).collect()[0]
    x = s.astype(np.float64)
    assert r["n_samples"] == 4096
    assert r["mean_amp"] == round(float(x.mean()), 4)
    assert r["rms"] == round(float(np.sqrt((x * x).mean())), 4)
    assert r["peak"] == int(np.abs(s.astype(np.int32)).max())
