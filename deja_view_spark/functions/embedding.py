"""Deterministic, vectorized text embedder (the engine's stand-in for
Chroma Cloud's server-side embedding function).

The reference never defines an embedder in repo code — Chroma embeds
server-side at upsert/query (github_similarity_service.py:365-369,
397-401) and declares cosine space (:106-109). We therefore need a
reproducible local embedder with the same *interface contract*:
text -> fixed-dim vector, cosine-comparable, L2-normalized.

Design: seeded feature hashing ("hashing trick") with mean pooling —
a sentence-transformer-shaped pipeline (tokenize, per-token vector,
mean-pool, L2-normalize) that is fully deterministic across runs,
processes and parallelism levels:

  token -> md5(token || seed)          (stable across processes; NOT
                                        Python hash(), which is salted)
        -> bucket = h mod dim, sign = ±1 from another md5 bit
  doc   -> sum of signed one-hot token vectors (token-frequency
           weighted), L2-normalized.

Implementation notes (performance):
- scalar pandas_udf: Arrow-batched, zero per-row Python in the plan;
- inside a batch: per-token accumulation through a process-local
  (token -> (bucket, sign)) memo. This loop was MEASURED against a
  "fully vectorized" alternative (pd.factorize over all batch tokens +
  one np.bincount scatter): the vectorized form wins ~2x in a single
  warm process, but LOSES 1.5-3x inside the real pipeline at local[32]
  — 32 concurrent Python workers each streaming multi-MB factorize
  tables and bincount temporaries saturate memory bandwidth, while the
  memoized loop stays cache-resident (interleaved A/B, kg_run 1M rows:
  embed stage 25-30s loop vs 40-82s vectorized). Hot loops that fit in
  L2 beat wide vectorization when every core runs one.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 64
_TOKEN_RE = re.compile(r"[a-z0-9_]+")

# process-local memo: token -> (bucket, sign). Tokens repeat heavily
# across documents (vocab << corpus), so this collapses hashing work.
_token_cache: dict[str, tuple[int, float]] = {}
_token_cache_dim = None


def _hash_token(token: str, dim: int, seed: int) -> tuple[int, float]:
    h = hashlib.md5(f"{seed}:{token}".encode("utf-8")).digest()
    bucket = int.from_bytes(h[:8], "little") % dim
    sign = 1.0 if h[8] & 1 else -1.0
    return bucket, sign


def embed_series(texts: pd.Series, dim: int = DEFAULT_DIM, seed: int = 42) -> pd.Series:
    """Embed a pandas Series of strings -> Series of np.float32 arrays."""
    global _token_cache_dim
    if _token_cache_dim != (dim, seed):
        _token_cache.clear()
        _token_cache_dim = (dim, seed)

    out = np.zeros((len(texts), dim), dtype=np.float64)
    vals = texts.fillna("").astype(str).str.lower()
    for i, text in enumerate(vals.to_numpy()):
        toks = _TOKEN_RE.findall(text)
        if not toks:
            continue
        row = out[i]
        cache = _token_cache
        for t in toks:
            bs = cache.get(t)
            if bs is None:
                bs = _hash_token(t, dim, seed)
                cache[t] = bs
            row[bs[0]] += bs[1]
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    out32 = out.astype(np.float32)
    return pd.Series(list(out32))


def make_embed_udf(dim: int = DEFAULT_DIM, seed: int = 42):
    """Return a scalar pandas_udf: string column -> array<float> column."""

    @F.pandas_udf(ArrayType(FloatType()))
    def embed_text(texts: pd.Series) -> pd.Series:
        return embed_series(texts, dim=dim, seed=seed)

    return embed_text


def embed_numpy(texts: list[str], dim: int = DEFAULT_DIM, seed: int = 42) -> np.ndarray:
    """Driver-side exact oracle used by tests (same math, returns a
    (n, dim) float32 matrix)."""
    s = embed_series(pd.Series(texts), dim=dim, seed=seed)
    return np.stack(s.to_numpy())
