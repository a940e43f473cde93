"""Distributed Lloyd's k-means as pure DataFrame ops (no MLlib, no UDF).

The canonical MapReduce k-means plan: the k-row centroid table
BROADCASTS, assignment is a map-side argmin (min-of-struct — full
map-side combine, no n×k window), and the centroid update is ONE
partial aggregation producing k rows of per-dimension means. Per
round the corpus is touched exactly once; lineage grows linearly in
rounds (each round references the previous centroid table once).

QUANTIZED Lloyd's: centroids are rounded to ``decimals`` after every
update. This makes the ENTIRE iteration bit-reproducible across
engines — the per-dimension mean is the only place float summation
order can differ (~1e-13 relative), and rounding to a 1e-4 grid
absorbs it — so the registry query carries a full value-hash DuckDB
oracle (unrolled rounds), the same discipline as `events_pagerank`'s
fixed-point iterations. The quantization perturbs centroids by at
most 5e-5 per dimension, far below the cluster geometry scale.

Init is the deterministic md5-medoid draw shared with
`operators/semdedup.medoid_centroids` (and `ann.ivf_topk_det`) — a
seeded uniform sample both engines can compute. The production IVF
path (`ann.ivf_index`) sample-fits with numpy; this operator is the
fully-distributed alternative when the fit itself must scale past a
driver sample.

Reference tie-in: the reference clusters nothing itself (Chroma Cloud
owns its index internals); this is the missing build-side of the IVF
coarse quantizer its ANN probes assume (github_similarity_service.py:
380-430 queries such an index one issue at a time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deja_view_spark.functions.similarity import dot
from deja_view_spark.operators.semdedup import (
    assign_clusters,
    medoid_centroids,
)


def _d2(v: Column, c: Column) -> Column:
    # identical token order to the DuckDB oracle (and semdedup._d2)
    return (dot(v, v) - F.lit(2.0) * dot(v, c)) + dot(c, c)


def _assign_lean(pts: DataFrame, cents: DataFrame) -> DataFrame:
    """(id, v, bucket) argmin assignment — the update rounds don't
    need the cosine `assign_clusters` also computes."""
    return (
        pts.join(F.broadcast(cents))
        .withColumn("_d2", _d2(F.col("v"), F.col("cvec")))
        .groupBy("id")
        .agg(
            F.min(F.struct("_d2", "bucket")).alias("_m"),
            F.any_value("v").alias("v"),
        )
        .select("id", "v", F.col("_m.bucket").alias("bucket"))
    )


def lloyd_kmeans(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    rounds: int = 2,
    dim: int = 64,
    decimals: int = 4,
) -> DataFrame:
    """``rounds`` quantized Lloyd's updates from the md5-medoid init;
    returns the final centroid table (bucket, cvec: array<double>).

    A bucket that loses all members simply drops out of the table (the
    same deterministic behavior in both engines); k is an upper bound.
    """
    pts = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cents = medoid_centroids(emb, vec_col, id_col, k)
    for _ in range(rounds):
        assigned = _assign_lean(pts, cents)
        means = assigned.groupBy("bucket").agg(
            *[
                F.round(F.avg(F.col("v")[i]), decimals).alias(f"_c{i}")
                for i in range(dim)
            ]
        )
        cents = means.select(
            "bucket",
            F.array(*[F.col(f"_c{i}") for i in range(dim)]).alias("cvec"),
        )
    return cents


def kmeans_assignments(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    rounds: int = 2,
    dim: int = 64,
    decimals: int = 4,
) -> DataFrame:
    """Final per-vector assignment (vec_id, bucket, ccos) against the
    trained centroids — ccos is the 4dp cosine to the OWN centroid."""
    cents = lloyd_kmeans(emb, vec_col, id_col, k, rounds, dim, decimals)
    mem = assign_clusters(emb, cents, vec_col, id_col)
    return mem.select(
        F.col("id").alias(id_col), "bucket", "ccos"
    ).orderBy(id_col)
