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


_HEX = "0123456789abcdef"


def duckdb_embed_cte(
    docs_sql: str,
    dim: int = DEFAULT_DIM,
    seed: int = 42,
    out: str = "emb",
) -> str:
    """DuckDB CTE chain reproducing ``embed_series`` BIT-FOR-BIT, so
    embed-dependent queries get full value-hash oracles instead of
    rows-only checks.

    ``docs_sql`` must select ``(doc_id, text)``; the final CTE ``out``
    yields ``(doc_id, vec DOUBLE[])`` where ``vec`` equals the Spark
    UDF's float32 output widened to double.

    Why this is exact, not approximate:
    - bucket = little-endian-int(md5[:8]) % dim reduces to
      (first byte) % dim whenever dim divides 256 (2^8 = 0 mod dim),
      and sign = md5[8] & 1 is the parity of the 18th hex digit — both
      pure string arithmetic on DuckDB's md5() hex output;
    - the accumulated coordinates are sums of +-1: exactly-representable
      integers, so numpy's pairwise summation and SQL's sequential
      SUM() agree to the last bit, as does the norm (sqrt of an exact
      integer) and the IEEE division;
    - the float32 round-trip (``astype(np.float32)``) is one
      correctly-rounded CAST(.. AS FLOAT) on each coordinate.
    """
    if 256 % dim != 0:
        raise ValueError("dim must divide 256 for the byte0-mod trick")
    h = f"md5('{seed}:' || __tok)"
    byte0 = (
        f"((strpos('{_HEX}', substr({h}, 1, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr({h}, 2, 1)) - 1))"
    )
    sign_bit = f"(strpos('{_HEX}', substr({h}, 18, 1)) - 1) % 2"
    return f"""
__docs_{out} AS (
  SELECT doc_id, lower(coalesce(text, '')) AS __t FROM ({docs_sql})),
__toks_{out} AS (
  SELECT doc_id, unnest(regexp_extract_all(__t, '[a-z0-9_]+')) AS __tok
  FROM __docs_{out}),
__contrib_{out} AS (
  SELECT doc_id,
         {byte0} % {dim} AS bucket,
         CASE WHEN {sign_bit} = 1 THEN 1.0 ELSE -1.0 END AS sign
  FROM __toks_{out}),
__sums_{out} AS (
  SELECT doc_id, bucket, sum(sign) AS val
  FROM __contrib_{out} GROUP BY 1, 2),
__dense_{out} AS (
  SELECT d.doc_id, i.i AS i, coalesce(s.val, 0.0) AS val
  FROM (SELECT DISTINCT doc_id FROM __docs_{out}) d
  CROSS JOIN (SELECT unnest(range({dim})) AS i) i
  LEFT JOIN __sums_{out} s ON s.doc_id = d.doc_id AND s.bucket = i.i),
__vecs_{out} AS (
  SELECT doc_id, list(val ORDER BY i) AS raw
  FROM __dense_{out} GROUP BY doc_id),
{out} AS (
  SELECT doc_id,
         CASE WHEN list_dot_product(raw, raw) > 0
           THEN list_transform(
                  raw,
                  x -> CAST(CAST(x / sqrt(list_dot_product(raw, raw)) AS FLOAT)
                            AS DOUBLE))
           ELSE raw END AS vec
  FROM __vecs_{out})"""


def duckdb_hex_int_sql(hex_expr: str, n_chars: int) -> str:
    """DuckDB fragment: integer value of the first ``n_chars`` hex
    digits of ``hex_expr`` (twin of Spark's ``conv(substring(h,1,n),
    16,10)``) — used for md5-based deterministic row splits that must
    agree across both engines."""
    acc = "0"
    for i in range(1, n_chars + 1):
        acc = f"({acc} * 16 + (strpos('{_HEX}', substr({hex_expr}, {i}, 1)) - 1))"
    return acc
