"""Wave-53: quantized power-method PCA and SQ8 saturation audit."""

from pyspark.sql import Row

from deja_view_spark.queries_retrieval import (
    PCA_DIM,
    q_embeddings_pca_power,
    q_embeddings_sq8_saturation,
)

SQ8_LEVELS = 127


def _write_emb(spark, tmp_path, vecs):
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in v], label=i % 3)
        for i, v in enumerate(vecs)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )


def _axis(i, scale=3.0):
    v = [0.0] * PCA_DIM
    v[i] = scale
    return v


def test_pca_recovers_dominant_axis_exactly(spark, tmp_path):
    # 32 vectors on +-axis0, 4 on axis1: after normalization the SQ8
    # codes are +-127 one-hot rows, the integer covariance is diagonal
    # [32*127^2, 4*127^2, 0...], and 8 power rounds shrink the axis-1
    # component to integer zero ((1/8)^8 of scale): the iterate lands
    # EXACTLY on e0 * 1e6 and the Rayleigh quotient equals 32*127^2.
    vecs = [_axis(0, 3.0) for _ in range(16)]
    vecs += [_axis(0, -3.0) for _ in range(16)]
    vecs += [_axis(1, 5.0) for _ in range(4)]
    _write_emb(spark, tmp_path, vecs)
    out = {r.dim: r for r in
           q_embeddings_pca_power(spark, str(tmp_path)).collect()}
    assert len(out) == PCA_DIM
    assert out[0].v_ppm == 1_000_000  # sign rule: pivot positive
    assert all(out[d].v_ppm == 0 for d in range(1, PCA_DIM))
    assert out[0].rayleigh == 32 * SQ8_LEVELS**2


def test_sq8_saturation_census(spark, tmp_path):
    vecs = [_axis(0, 3.0) for _ in range(16)]
    vecs += [_axis(0, -3.0) for _ in range(16)]
    vecs += [_axis(1, 5.0) for _ in range(4)]
    _write_emb(spark, tmp_path, vecs)
    out = {r.dim: r for r in
           q_embeddings_sq8_saturation(spark, str(tmp_path)).collect()}
    d0, d1 = out[0], out[1]
    assert (d0.min_code, d0.max_code) == (-SQ8_LEVELS, SQ8_LEVELS)
    assert d0.n_saturated == 32
    assert d0.saturated_ppm == 32 * 1_000_000 // 36
    assert (d1.min_code, d1.max_code) == (0, SQ8_LEVELS)
    assert d1.n_saturated == 4
    assert d1.mean_centi == SQ8_LEVELS * 4 * 100 // 36
    # untouched dimensions carry dead-zero codes
    assert out[5].min_code == 0 and out[5].max_code == 0
