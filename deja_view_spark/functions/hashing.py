"""LSH signatures (Arrow-vectorized pandas UDFs) + lineage hashing.

Two candidate-generation families, both deterministic and seeded:

- **Random-hyperplane (SimHash) bands over embedding vectors** — the
  candidate generator for the cosine duplicate self-join (J2). For unit
  vectors u, v with cos(u,v)=s, P[sign(r.u)=sign(r.v)] = 1 - acos(s)/pi;
  with r bits per band and b bands, recall at s=0.8 and (b=24, r=8) is
  ~0.985. Replaces the reference's Chroma HNSW index
  (github_similarity_service.py:106-109) with a shuffle-join-friendly
  layout: equal band keys <=> candidate pair.

- **MinHash bands over token shingles** — Jaccard-space candidate
  generator for the text-dedup suite (near-duplicate docs), the classic
  shingle->minhash->band->bucket-join pipeline.

Lineage: sha256 over content is plain ``F.sha2(col, 256)`` — no UDF.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"[a-z0-9_]+")


# ---------------------------------------------------------------- simhash
_plane_cache: dict[tuple[int, int, int], np.ndarray] = {}


def _planes(dim: int, nbits: int, seed: int) -> np.ndarray:
    key = (dim, nbits, seed)
    if key not in _plane_cache:
        rng = np.random.default_rng(seed)
        _plane_cache[key] = rng.standard_normal((dim, nbits))
    return _plane_cache[key]


def simhash_bands_numpy(
    vecs: np.ndarray, bands: int, rows: int, seed: int = 1337
) -> np.ndarray:
    """(n, dim) float -> (n, bands) int64 band keys.

    Each band key packs its `rows` sign bits together with the band
    index, so a single equi-join column suffices after explode.
    """
    nbits = bands * rows
    planes = _planes(vecs.shape[1], nbits, seed)
    bits = (vecs @ planes) > 0  # (n, nbits) bool
    bits = bits.reshape(len(vecs), bands, rows)
    weights = (1 << np.arange(rows, dtype=np.int64))[None, None, :]
    keys = (bits * weights).sum(axis=2)  # (n, bands) in [0, 2^rows)
    band_idx = np.arange(bands, dtype=np.int64)[None, :]
    return keys | (band_idx << 32)


def make_simhash_udf(bands: int = 24, rows: int = 8, seed: int = 1337):
    """array<float> embedding column -> array<long> of band keys."""

    @F.pandas_udf(ArrayType(LongType()))
    def simhash_bands(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        keys = simhash_bands_numpy(mat, bands, rows, seed)
        return pd.Series(list(keys))

    return simhash_bands


# ---------------------------------------------------------------- minhash
_perm_cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _perms(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    key = (n_perm, seed)
    if key not in _perm_cache:
        rng = np.random.default_rng(seed)
        a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64)
        b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64)
        _perm_cache[key] = (a, b)
    return _perm_cache[key]


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Token k-shingles -> uint32 hashes (crc32: C-speed, process-stable)."""
    import zlib

    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.int64)
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in shingles),
        dtype=np.int64,
        count=len(shingles),
    )


def minhash_signature(text: str, n_perm: int, k: int, seed: int) -> np.ndarray:
    """One document -> (n_perm,) int64 minhash signature."""
    hashes = np.unique(_shingle_hashes(text, k))
    if len(hashes) == 0:
        return np.full(n_perm, -1, dtype=np.int64)
    a, b = _perms(n_perm, seed)
    vals = (hashes[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    return vals.min(axis=0)


def make_minhash_bands_udf(
    bands: int = 16, rows: int = 4, shingle_k: int = 3, seed: int = 7
):
    """string column -> array<long> of band keys (band idx in high bits).

    Band key = crc32 of the band's row segment bytes | band_idx << 32,
    so one equi-join column carries (band, signature-segment) equality.
    """
    import zlib

    n_perm = bands * rows

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_bands(texts: pd.Series) -> pd.Series:
        out = []
        band_shift = np.int64(1) << 32
        for text in texts.fillna("").astype(str).to_numpy():
            sig = minhash_signature(text, n_perm, shingle_k, seed)
            segs = sig.reshape(bands, rows)
            bkeys = np.fromiter(
                (zlib.crc32(segs[bi].tobytes()) for bi in range(bands)),
                dtype=np.int64,
                count=bands,
            )
            bkeys = bkeys + np.arange(bands, dtype=np.int64) * band_shift
            out.append(bkeys)
        return pd.Series(out)

    return minhash_bands


# ----------------------------------------------------------------- simhash64
def make_simhash64_udf(seed: int = 99):
    """Classic 64-bit SimHash fingerprint over tokens (dedup op).

    Token-weighted sign accumulation -> 64-bit fingerprint; hamming
    distance <= t <=> near-duplicate.
    """

    @F.pandas_udf(LongType())
    def simhash64(texts: pd.Series) -> pd.Series:
        import hashlib

        out = np.zeros(len(texts), dtype=np.int64)
        cache: dict[str, int] = {}
        for i, text in enumerate(texts.fillna("").astype(str).to_numpy()):
            toks = _TOKEN_RE.findall(text.lower())
            if not toks:
                continue
            acc = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for t in toks:
                bits = cache.get(t)
                if bits is None:
                    h = np.uint64(
                        int.from_bytes(
                            hashlib.md5(f"{seed}:{t}".encode()).digest()[:8],
                            "little",
                        )
                    )
                    bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
                    cache[t] = bits
                acc += 2 * bits - 1
            fp = np.uint64(0)
            one = np.uint64(1)
            for b in np.nonzero(acc > 0)[0]:
                fp |= one << np.uint64(b)
            out[i] = np.int64(fp.astype(np.int64))
        return pd.Series(out)

    return simhash64


def sha256_col(col: Column) -> Column:
    """Per-row lineage hash (input_hint: sha256(content) equality)."""
    return F.sha2(col, 256)
