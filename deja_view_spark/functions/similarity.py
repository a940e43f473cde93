"""Similarity math as native column expressions (no UDFs).

Both of the reference's distance->similarity normalizations exist and
are used in different paths; we keep both (SURVEY §2.4 F5):

- service path:  sim = 1 - d       (github_similarity_service.py:410,
                                    pinned by test_github_similarity_service.py:374-381)
- report paths:  sim = 1 - d/2     (cli.py:550, find_similar_issues.py:108)

Cosine over ArrayType(Float) columns is pure ``zip_with``/``aggregate``
— stays inside whole-stage codegen, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<float|double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column, assume_normalized: bool = False) -> Column:
    """Cosine similarity. If vectors are pre-L2-normalized (our embedder
    guarantees it) this is just the dot product — one fused loop."""
    if assume_normalized:
        return dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def dot_over_norms(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    """Cosine for PAIR-SCORING plans: norms precomputed once per row on
    each side (one projection), so the per-pair work is a single
    zip_with/aggregate pass instead of three. Use for large candidate
    joins; cosine_sim stays for one-off scoring."""
    denom = na * nb
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(va, vb) / denom)


def duckdb_cosine_sql(a: str, b: str) -> str:
    """DuckDB SQL fragment for cosine(a, b) BIT-IDENTICAL to
    ``cosine_sim`` / ``dot_over_norms``: ``list_dot_product`` on
    DOUBLE[] performs the same sequential double accumulation as
    Spark's ``zip_with``/``aggregate``, and ``/``, ``*``, ``sqrt`` are
    IEEE-correctly-rounded, so the whole expression matches Spark to
    the last bit. DuckDB's ``list_cosine_similarity`` is NOT safe in
    oracles: it computes in float32, and a true cosine within 1 ulp of
    a x.xxxx5 boundary then rounds to 4dp differently than Spark
    (observed at sf0.001: 0.3479 vs 0.3478 on one pair)."""
    dot = f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
    na = f"sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
    nb = f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))"
    return f"({dot} / ({na} * {nb}))"


def distance_to_similarity(distance: Column, convention: str = "service") -> Column:
    """'service' -> 1-d (github_similarity_service.py:410);
    'report' -> 1-d/2 (cli.py:550)."""
    if convention == "service":
        return F.lit(1.0) - distance
    if convention == "report":
        return F.lit(1.0) - distance / 2.0
    raise ValueError(f"unknown convention {convention!r}")


def clamp01(score: Column) -> Column:
    """max(0, min(1, score)) — reference github_similarity_service.py:547."""
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), score))


def similarity_band(sim: Column, scheme: str = "cli") -> Column:
    """Band labels.

    'cli'    : >=0.90 very_high, >=0.80 high, else below (cli.py:589-590)
    'report' : >=0.85 very_high, >=0.70 high, else below
               (find_similar_issues.py:160-161)
    """
    hi, lo = (0.90, 0.80) if scheme == "cli" else (0.85, 0.70)
    return (
        F.when(sim >= hi, F.lit("very_high"))
        .when(sim >= lo, F.lit("high"))
        .otherwise(F.lit("below"))
    )


def confidence_bucket(score: Column) -> Column:
    """>=0.7 high, >=0.5 medium, else low
    (reference github_similarity_service.py:600-607)."""
    return (
        F.when(score >= 0.7, F.lit("high"))
        .when(score >= 0.5, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
