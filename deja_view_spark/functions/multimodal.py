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


def _decode_stub(data: bytes) -> dict:
    """Parse the fake container; REAL formats raise NotImplementedError
    (plumbing is environment-gated, SURVEY training-data ops)."""
    if data[:4] == _MAGIC:
        (_, kind_code, h, w, c, nf, sr, dur_ms) = struct.unpack(
            "<4sBiiiiii", data[:29]
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
    """Resize plumbing for image rows: aspect-preserving target
    dimensions computed from the decoded header; the pixel resample
    itself sits behind the same stub boundary (PIL/cv2 in a real
    deployment — the output here is the new geometry plus a
    deterministic fingerprint of (content, target dims), which is what
    the downstream schema/partitioning contract needs).
    Output: media_id, height, width, new_height, new_width,
    resized_sha256."""
    out_schema = (
        "media_id long, height int, width int, new_height int, "
        "new_width int, resized_sha256 string"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                meta = _decode_stub(bytes(data))
                h, w = meta["height"], meta["width"]
                scale = min(1.0, max_side / max(h, w, 1))
                nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
                fh = hashlib.sha256(
                    bytes(data) + f"{nh}x{nw}".encode()
                ).hexdigest()
                rows.append((mid, h, w, nh, nw, fh))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "height", "width",
                    "new_height", "new_width", "resized_sha256",
                ],
            )

    return media.where("kind = 'image'").mapInPandas(resize, schema=out_schema)


def fake_media_df(spark, n: int = 64, seed: int = 5):
    """Synthesize a deterministic media table for tests/benches."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=32, dtype=np.uint8))
        if kind == "image":
            b = fake_media_bytes("image", height=480 + i, width=640, channels=3, payload=payload)
        elif kind == "audio":
            b = fake_media_bytes("audio", channels=2, sample_rate=16000, duration_ms=1000 + i * 10, payload=payload)
        else:
            b = fake_media_bytes("video", height=720, width=1280, channels=3, n_frames=30 + i, duration_ms=2000, payload=payload)
        rows.append((i, kind, bytearray(b), f"src{i % 4}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
