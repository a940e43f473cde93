"""Single-probe top-k similarity lookup (J1).

Reference: ``find_similar_issues`` service call
(github_similarity_service.py:386-426): embed the probe document, cosine
ANN over the repo-scoped collection with n_results=top_k+1, drop the
self-match (:405-407), similarity = 1 - distance (:410), threshold
filter (:412), round to 4dp (:417).

Spark shape: the probe is a literal vector folded into the plan (the
degenerate broadcast — zero-shuffle); candidates are a partition-pruned
scan of the embeddings table; scoring is a codegen'd dot product; the
sorted limit compiles to TakeOrderedAndProject (exact top-k without a
global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deja_view_spark.functions.embedding import embed_numpy
from deja_view_spark.functions.similarity import cosine_sim


def topk_similar(
    emb: DataFrame,
    probe_vector: list[float],
    probe_doc_id: str | None = None,
    top_k: int = 5,
    min_similarity: float = 0.0,
    scope: dict[str, str] | None = None,
    convention: str = "service",
    assume_normalized: bool = True,
) -> DataFrame:
    """Top-k neighbors of one probe vector. Returns
    (doc_id, similarity) sorted desc, ties by doc_id asc."""
    df = emb
    for col, val in (scope or {}).items():
        df = df.where(F.col(col) == val)  # pushed down to the scan
    if probe_doc_id is not None:
        df = df.where(F.col("doc_id") != probe_doc_id)

    probe = F.array(*[F.lit(float(x)) for x in probe_vector])
    cos = cosine_sim(F.col("vector"), probe, assume_normalized)
    sim = cos if convention == "service" else (F.lit(1.0) + cos) / 2.0
    return (
        df.withColumn("similarity", F.round(sim, 4))
        .where(F.col("similarity") >= min_similarity)
        .select("doc_id", "similarity")
        .orderBy(F.desc("similarity"), F.asc("doc_id"))
        .limit(top_k)
    )


def topk_similar_text(
    emb: DataFrame,
    probe_text: str,
    dim: int = 64,
    seed: int = 42,
    **kwargs,
) -> DataFrame:
    """Convenience: embed the probe text driver-side (same deterministic
    embedder the table was built with), then run topk_similar."""
    vec = embed_numpy([probe_text], dim=dim, seed=seed)[0].tolist()
    return topk_similar(emb, vec, **kwargs)
