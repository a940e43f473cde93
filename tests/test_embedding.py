"""Deterministic embedder invariants (SURVEY §7.4.1: stability across
runs and parallelism is the load-bearing property)."""

import numpy as np
from pyspark.sql import functions as F

from deja_view_spark.functions.embedding import embed_numpy, make_embed_udf


def test_deterministic_across_calls():
    a = embed_numpy(["hello world foo bar"])
    b = embed_numpy(["hello world foo bar"])
    np.testing.assert_array_equal(a, b)


def test_l2_normalized():
    v = embed_numpy(["some sample text with several tokens"])[0]
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_empty_text_zero_vector():
    v = embed_numpy([""])[0]
    assert np.all(v == 0)


def test_similar_texts_score_higher():
    base = "the cache invalidation races with concurrent writers"
    near = "the cache invalidation races with concurrent readers"
    far = "completely unrelated sentence about gardening tulips"
    e = embed_numpy([base, near, far])
    assert float(e[0] @ e[1]) > float(e[0] @ e[2])
    assert float(e[0] @ e[1]) > 0.8


def test_udf_matches_driver_oracle(spark):
    texts = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(make_embed_udf()(F.col("t")).alias("v")).collect()
    want = embed_numpy(texts)
    for row, w in zip(got, want):
        np.testing.assert_allclose(np.array(row[0]), w, rtol=1e-6)
