"""Wave-38: centroid-based silhouette cluster-quality audit."""

import math

import numpy as np
import pytest
from pyspark.sql import Row

from deja_view_spark.queries_text import (
    KMEANS_DIM,
    q_embeddings_silhouette,
)

SF = "/root/testdata/sf0.001"


def test_silhouette_bounds_and_coverage(spark):
    import duckdb

    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchone()[0]
    rows = q_embeddings_silhouette(spark, SF).collect()
    assert sum(r.n_points for r in rows) == n_vecs
    for r in rows:
        # s = 1 - d1/d2 with 0 <= d1 <= d2 -> s in [0, 1]
        assert 0 <= r.min_sil_ppm <= r.mean_sil_ppm <= r.max_sil_ppm <= 10**6


def _blob_table(spark, tmp_path, n_blobs, n_points, spread, name):
    # blob centers on distinct coordinate axes, far apart
    rng = np.random.default_rng(7)
    rows = []
    for i in range(n_points):
        blob = i % n_blobs
        center = np.zeros(KMEANS_DIM)
        center[blob] = 50.0
        v = center + rng.normal(0.0, spread, KMEANS_DIM)
        rows.append(
            Row(vec_id=i, embedding=[float(x) for x in v], label=blob)
        )
    path = f"{tmp_path}/{name}"
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet"
    )
    return path


def test_silhouette_detects_fit_vs_overclustering(spark, tmp_path):
    # k = KMEANS_K blobs (matched k) must score clearly higher than
    # 2 blobs forced into KMEANS_K clusters (over-clustering splits
    # tight blobs, collapsing the d1/d2 gap) — the discriminative
    # property the audit exists for
    from deja_view_spark.queries_text import KMEANS_K

    matched = _blob_table(spark, tmp_path, KMEANS_K, 64, 0.05, "matched")
    overclustered = _blob_table(spark, tmp_path, 2, 64, 0.05, "over")

    def weighted(path):
        out = q_embeddings_silhouette(spark, path).collect()
        assert sum(r.n_points for r in out) == 64
        return sum(r.mean_sil_ppm * r.n_points for r in out) / 64

    w_matched = weighted(matched)
    w_over = weighted(overclustered)
    assert w_matched > w_over + 200_000
    assert w_matched > 500_000


def test_silhouette_identical_points_zero(spark, tmp_path):
    # all points identical -> every centroid collapses to the same
    # vector, d1 == d2 == 0 -> silhouette defined as 0
    v = [1.0] * KMEANS_DIM
    rows = [Row(vec_id=i, embedding=v, label=0) for i in range(20)]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    out = q_embeddings_silhouette(spark, str(tmp_path)).collect()
    assert sum(r.n_points for r in out) == 20
    for r in out:
        assert r.mean_sil_ppm == 0
        assert r.min_sil_ppm == 0
        assert r.max_sil_ppm == 0
