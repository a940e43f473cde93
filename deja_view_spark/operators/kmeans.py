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


def pq_assignments(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    subdim: int = 16,
    k: int = 8,
    rounds: int = 1,
    decimals: int = 4,
) -> DataFrame:
    """Product quantization: the vector is split into ``m`` contiguous
    sub-blocks of ``subdim`` dims, each block gets its OWN quantized
    Lloyd's codebook (same md5-medoid init + broadcast-assign +
    partial-agg-mean machinery as `lloyd_kmeans`, run on the slice),
    and every vector is encoded as its per-block nearest-centroid ids
    — the PQ code. Returns one row per vector: the joined code string
    ("b0-b1-...-bm"), plus the per-block squared quantization error
    (4dp) — the reconstruction-quality signal.

    Why this exists at 100 TB: a float64[64] embedding is 512 bytes; a
    PQ(4x8) code is 4 SMALL ints (codebook = m*k*subdim doubles,
    metadata-sized). PQ codes are what an IVF-PQ ANN index actually
    stores and scans — this operator is the distributed encode pass
    that builds it (the compression half of the coarse-quantizer story
    `embeddings_kmeans` / `ann_ivf_topk` cover).

    Scale shape: per block, the codebook fit touches the corpus
    ``rounds``+1 times via broadcast joins and partial aggs (k-row
    build side, min-of-struct argmin — no window over n x k); the m
    per-block assignment streams are UNIONED and folded to one row per
    vector by a single conditional-aggregation groupBy (one shuffle of
    (long, int, int, double) rows), not m-1 self-joins. Argmin
    tie-break is (d2, bucket) ascending, mirrored by the oracle's
    row_number ordering."""
    blocks = []
    for b in range(m):
        sub = emb.select(
            F.col(id_col).alias("id"),
            F.slice(F.col(vec_col), b * subdim + 1, subdim).alias("v"),
        )
        cents = lloyd_kmeans(
            sub, vec_col="v", id_col="id", k=k, rounds=rounds,
            dim=subdim, decimals=decimals,
        )
        blocks.append(
            sub.join(F.broadcast(cents))
            .withColumn("_d2", _d2(F.col("v"), F.col("cvec")))
            .groupBy("id")
            .agg(F.min(F.struct("_d2", "bucket")).alias("_m"))
            .select(
                "id",
                F.lit(b).alias("block"),
                F.col("_m.bucket").alias("bucket"),
                F.round(F.col("_m._d2"), decimals).alias("d2"),
            )
        )
    u = blocks[0]
    for nxt in blocks[1:]:
        u = u.unionByName(nxt)
    code = F.concat_ws(
        "-",
        *[
            F.max(F.when(F.col("block") == b, F.col("bucket")))
            .cast("int")
            .cast("string")
            for b in range(m)
        ],
    )
    aggs = [code.alias("pq_code")] + [
        F.max(F.when(F.col("block") == b, F.col("d2"))).alias(f"d2_{b}")
        for b in range(m)
    ]
    return (
        u.groupBy(F.col("id").alias(id_col)).agg(*aggs).orderBy(id_col)
    )


def pq_encode(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    subdim: int = 16,
    k: int = 8,
    rounds: int = 1,
    decimals: int = 4,
):
    """Fit the per-block PQ codebooks and encode every vector; returns
    (codes, codebooks) where codes is (id, c0..c{m-1}: int) and
    codebooks is the list of m (bucket, cvec) centroid tables (k rows
    each — metadata-sized, broadcastable). The numeric-code sibling of
    `pq_assignments` for consumers that need the ids (IVF-PQ ADC
    search), same codebook fit and argmin tie order."""
    codebooks = []
    blocks = []
    for b in range(m):
        sub = emb.select(
            F.col(id_col).alias("id"),
            F.slice(F.col(vec_col), b * subdim + 1, subdim).alias("v"),
        )
        cents = lloyd_kmeans(
            sub, vec_col="v", id_col="id", k=k, rounds=rounds,
            dim=subdim, decimals=decimals,
        )
        codebooks.append(cents)
        blocks.append(
            sub.join(F.broadcast(cents))
            .withColumn("_d2", _d2(F.col("v"), F.col("cvec")))
            .groupBy("id")
            .agg(F.min(F.struct("_d2", "bucket")).alias("_m"))
            .select(
                "id",
                F.lit(b).alias("block"),
                F.col("_m.bucket").alias("bucket"),
            )
        )
    u = blocks[0]
    for nxt in blocks[1:]:
        u = u.unionByName(nxt)
    codes = u.groupBy("id").agg(
        *[
            F.max(F.when(F.col("block") == b, F.col("bucket")))
            .cast("int")
            .alias(f"c{b}")
            for b in range(m)
        ]
    )
    return codes, codebooks
