"""Similarity math — pins both of the reference's distance conventions
(test_github_similarity_service.py:374-381 for 1-d; cli.py:550 for
1-d/2) plus banding/bucketing thresholds."""

import math

from pyspark.sql import functions as F

from deja_view_spark.functions.similarity import (
    clamp01,
    confidence_bucket,
    cosine_sim,
    distance_to_similarity,
    similarity_band,
)


def test_distance_conventions(spark):
    df = spark.createDataFrame([(0.1,), (0.2,)], "d double")
    svc = [r[0] for r in df.select(distance_to_similarity(F.col("d"), "service")).collect()]
    rep = [r[0] for r in df.select(distance_to_similarity(F.col("d"), "report")).collect()]
    # reference pins 0.1 -> 0.9, 0.2 -> 0.8 on the service path
    assert [round(x, 4) for x in svc] == [0.9, 0.8]
    assert [round(x, 4) for x in rep] == [0.95, 0.9]


def test_cosine_known_vectors(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]),
         ([1.0, 1.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    out = [r[0] for r in df.select(cosine_sim(F.col("a"), F.col("b"))).collect()]
    assert abs(out[0] - 1.0) < 1e-9
    assert abs(out[1]) < 1e-9
    assert abs(out[2] - 1 / math.sqrt(2)) < 1e-9


def test_cosine_zero_vector_guard(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 0.0])],
                               "a array<double>, b array<double>")
    assert df.select(cosine_sim(F.col("a"), F.col("b"))).head()[0] == 0.0


def test_clamp01(spark):
    df = spark.createDataFrame([(-0.5,), (0.5,), (1.7,)], "s double")
    assert [r[0] for r in df.select(clamp01(F.col("s"))).collect()] == [0.0, 0.5, 1.0]


def test_similarity_bands(spark):
    df = spark.createDataFrame([(0.95,), (0.85,), (0.5,)], "s double")
    cli = [r[0] for r in df.select(similarity_band(F.col("s"), "cli")).collect()]
    rep = [r[0] for r in df.select(similarity_band(F.col("s"), "report")).collect()]
    assert cli == ["very_high", "high", "below"]  # cli.py:589-590
    assert rep == ["very_high", "very_high", "below"]  # find_similar_issues.py:160-161


def test_confidence_bucket(spark):
    df = spark.createDataFrame([(0.8,), (0.6,), (0.3,)], "s double")
    out = [r[0] for r in df.select(confidence_bucket(F.col("s"))).collect()]
    assert out == ["high", "medium", "low"]  # github_similarity_service.py:600-607
