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


def test_duckdb_embed_cte_bit_exact():
    """The SQL twin (duckdb_embed_cte) must reproduce embed_series
    BIT-FOR-BIT — it is the foundation of every embed-dependent
    value-hash oracle (incremental_probe). Checked over the real
    sf0.001 corpus, including the zero-vector (empty-text) edge."""
    import duckdb

    from deja_view_spark.functions.embedding import duckdb_embed_cte

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    cte = duckdb_embed_cte("SELECT doc_id, text FROM documents", dim=64)
    got = con.sql(
        f"WITH {cte} SELECT doc_id, vec FROM emb ORDER BY doc_id"
    ).df()
    docs = con.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").df()
    want = embed_numpy(docs.text.tolist(), dim=64, seed=42).astype(np.float64)
    np.testing.assert_array_equal(np.stack(got.vec.to_numpy()), want)


def test_duckdb_hex_int_matches_spark_conv(spark):
    """md5-prefix integer split must agree across engines (it selects
    the incremental_probe 'new docs' partition)."""
    import duckdb

    from deja_view_spark.functions.embedding import duckdb_hex_int_sql

    ids = [str(i) for i in range(200)]
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    got_spark = {
        r.doc_id: r.v
        for r in sdf.select(
            "doc_id",
            F.conv(F.substring(F.md5(F.col("doc_id").cast("binary")), 1, 4), 16, 10)
            .cast("long")
            .alias("v"),
        ).collect()
    }
    con = duckdb.connect()
    frag = duckdb_hex_int_sql("md5(doc_id)", 4)
    got_duck = {
        r[0]: r[1]
        for r in con.sql(
            "SELECT doc_id, " + frag + " AS v FROM (SELECT unnest(["
            + ",".join(f"'{i}'" for i in ids)
            + "]) AS doc_id)"
        ).fetchall()
    }
    assert got_spark == got_duck
