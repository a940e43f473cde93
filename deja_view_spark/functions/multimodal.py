"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with ``mapInPandas`` (Arrow-batched, zero per-row
Python overhead in the plan).

The container has no codec libraries (PIL/ffmpeg/librosa), so the
actual byte-decoding step is STUBBED: ``_decode_stub`` parses a tiny
deterministic fake header (see ``fake_media_bytes``) and raises
``NotImplementedError`` for real formats. Everything AROUND the decode
— the schemas, the mapInPandas batch iteration, the metadata
extraction contract, the partition-preserving shape — is real and
tested; swapping ``_decode_stub`` for cv2/PIL/soundfile is a one-
function change.

MEDIA_SCHEMA (input):
    media_id: long, kind: string ('image'|'audio'|'video'),
    data: binary, source: string

FEATURES out: media_id, kind, height, width, channels, n_frames,
    sample_rate, duration_s, byte_len, content_sha256
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = "media_id long, kind string, data binary, source string"

FEATURES_SCHEMA = (
    "media_id long, kind string, height int, width int, channels int, "
    "n_frames int, sample_rate int, duration_s double, byte_len long, "
    "content_sha256 string"
)

_MAGIC = b"DVSM"  # deja-view-spark media (deterministic fake container)


def fake_media_bytes(
    kind: str,
    height: int = 0,
    width: int = 0,
    channels: int = 0,
    n_frames: int = 0,
    sample_rate: int = 0,
    duration_ms: int = 0,
    payload: bytes = b"",
) -> bytes:
    """Deterministic fake media container: 4-byte magic + packed header
    + payload. Lets tests exercise the full decode path without codecs."""
    kind_code = {"image": 1, "audio": 2, "video": 3}[kind]
    header = struct.pack(
        "<4sBiiiiii",
        _MAGIC,
        kind_code,
        height,
        width,
        channels,
        n_frames,
        sample_rate,
        duration_ms,
    )
    return header + payload


_HEADER_LEN = 29


def _decode_stub(data: bytes) -> dict:
    """Parse the fake container; REAL formats raise NotImplementedError
    (plumbing is environment-gated, SURVEY training-data ops)."""
    if data[:4] == _MAGIC:
        (_, kind_code, h, w, c, nf, sr, dur_ms) = struct.unpack(
            "<4sBiiiiii", data[:_HEADER_LEN]
        )
        return {
            "height": h,
            "width": w,
            "channels": c,
            "n_frames": nf,
            "sample_rate": sr,
            "duration_s": dur_ms / 1000.0,
        }
    raise NotImplementedError(
        "real media decoding requires codec libraries not present in "
        "this environment (PIL/ffmpeg/soundfile); plug them in here"
    )


def decode_pixels(data: bytes) -> "np.ndarray | None":
    """Decode the fake container's payload as a (h, w, c) uint8 pixel
    array when the payload length matches the header geometry; None
    for geometry-only payloads (header present, no raster). Real
    formats hit the _decode_stub codec boundary first."""
    meta = _decode_stub(data)
    h, w, c = meta["height"], meta["width"], meta["channels"]
    payload = data[_HEADER_LEN:]
    if h > 0 and w > 0 and c > 0 and len(payload) == h * w * c:
        return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, c)
    return None


def decode_samples(data: bytes) -> "np.ndarray | None":
    """Decode the fake container's payload as int16 PCM samples
    (little-endian, channel-interleaved); None if the payload is not
    sample-aligned."""
    payload = data[_HEADER_LEN:] if data[:4] == _MAGIC else None
    if payload and len(payload) % 2 == 0 and len(payload) > 0:
        return np.frombuffer(payload, dtype="<i2")
    return None


def resample_nearest(px: "np.ndarray", nh: int, nw: int) -> "np.ndarray":
    """Deterministic nearest-neighbor resample of an (h, w, c) uint8
    array — pure numpy index mapping (floor(i * h / nh)), bit-exact
    everywhere, no codec dependency."""
    h, w = px.shape[0], px.shape[1]
    ih = np.floor(np.arange(nh) * h / nh).astype(np.int64)
    iw = np.floor(np.arange(nw) * w / nw).astype(np.int64)
    return np.ascontiguousarray(px[ih][:, iw])


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one
    vectorized feature frame out; sha256 lineage per row (the same
    per-row invariant the text pipeline carries)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_stub(bytes(b)) for b in pdf["data"]]
            out = pd.DataFrame(metas)
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            out.insert(1, "kind", pdf["kind"].to_numpy())
            out["byte_len"] = pdf["data"].map(len).astype("int64")
            out["content_sha256"] = [
                hashlib.sha256(bytes(b)).hexdigest() for b in pdf["data"]
            ]
            yield out[
                [
                    "media_id",
                    "kind",
                    "height",
                    "width",
                    "channels",
                    "n_frames",
                    "sample_rate",
                    "duration_s",
                    "byte_len",
                    "content_sha256",
                ]
            ]

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits one row per
    sampled frame index (the decode of actual frame bytes is the same
    stub boundary). Output: media_id, frame_idx, frame_sha256."""
    out_schema = "media_id long, frame_idx int, frame_sha256 string"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                meta = _decode_stub(bytes(data))
                idxs = list(range(0, meta["n_frames"], every_n))[:max_frames]
                for i in idxs:
                    # deterministic per-frame fingerprint of (content, idx)
                    fh = hashlib.sha256(bytes(data) + str(i).encode()).hexdigest()
                    rows.append((mid, i, fh))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_sha256"]
            )

    return media.where("kind = 'video'").mapInPandas(sample, schema=out_schema)


def resize_images(
    media: DataFrame, max_side: int = 256
) -> DataFrame:
    """Resize image rows: aspect-preserving target dimensions from the
    decoded header, then a REAL nearest-neighbor pixel resample (pure
    numpy, deterministic) when the container carries a raster payload —
    output is the resized bytes plus their sha256. Geometry-only
    containers (no raster) fall back to a deterministic fingerprint of
    (content, target dims) with NULL resized_bytes; real encoded
    formats (PNG/JPEG) hit the _decode_stub codec boundary.
    Output: media_id, height, width, new_height, new_width,
    resized_bytes, resized_sha256."""
    out_schema = (
        "media_id long, height int, width int, new_height int, "
        "new_width int, resized_bytes binary, resized_sha256 string"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                data = bytes(data)
                meta = _decode_stub(data)
                h, w = meta["height"], meta["width"]
                scale = min(1.0, max_side / max(h, w, 1))
                nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
                px = decode_pixels(data)
                if px is not None:
                    out = resample_nearest(px, nh, nw).tobytes()
                    fh = hashlib.sha256(out).hexdigest()
                else:
                    out = None
                    fh = hashlib.sha256(data + f"{nh}x{nw}".encode()).hexdigest()
                rows.append((mid, h, w, nh, nw, out, fh))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "height", "width", "new_height",
                    "new_width", "resized_bytes", "resized_sha256",
                ],
            )

    return media.where("kind = 'image'").mapInPandas(resize, schema=out_schema)


def audio_stats(media: DataFrame) -> DataFrame:
    """Audio feature extraction over the raw int16 PCM payload: sample
    count, mean, RMS, peak — real vectorized numpy per Arrow batch (the
    compute path a loudness/silence filter in a training-data pipeline
    needs). Rows without sample-aligned payloads emit NULL stats.
    Output: media_id, n_samples, mean_amp, rms, peak."""
    out_schema = (
        "media_id long, n_samples long, mean_amp double, rms double, peak int"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                s = decode_samples(bytes(data))
                if s is None:
                    rows.append((mid, None, None, None, None))
                else:
                    x = s.astype(np.float64)
                    rows.append(
                        (
                            mid,
                            int(s.size),
                            round(float(x.mean()), 4),
                            round(float(np.sqrt((x * x).mean())), 4),
                            int(np.abs(s.astype(np.int32)).max()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "mean_amp", "rms", "peak"]
            )

    return media.where("kind = 'audio'").mapInPandas(stats, schema=out_schema)


def fake_media_df(spark, n: int = 64, seed: int = 5):
    """Synthesize a deterministic media table for tests/benches.

    Image rows carry a REAL raster payload (h*w*c uint8 pixels) so the
    resample compute path runs on actual pixel data; audio rows carry
    real int16 PCM samples; video rows stay geometry-only (the frame
    decode is the codec boundary)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            h, w, c = 480 + i, 640, 3
            px = rng.integers(0, 256, size=h * w * c, dtype=np.uint8)
            b = fake_media_bytes(
                "image", height=h, width=w, channels=c, payload=px.tobytes()
            )
        elif kind == "audio":
            samples = rng.integers(
                -20000, 20000, size=2048 + 64 * i, dtype=np.int16
            )
            b = fake_media_bytes(
                "audio",
                channels=2,
                sample_rate=16000,
                duration_ms=1000 + i * 10,
                payload=samples.astype("<i2").tobytes(),
            )
        else:
            payload = bytes(rng.integers(0, 256, size=32, dtype=np.uint8))
            b = fake_media_bytes(
                "video",
                height=720,
                width=1280,
                channels=3,
                n_frames=30 + i,
                duration_ms=2000,
                payload=payload,
            )
        rows.append((i, kind, bytearray(b), f"src{i % 4}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
