"""IncrementalDuplicates (operators/incremental_edges.py): the
incremental duplicate-edge store must equal the from-scratch
duplicate_edges(method='stored') + connected_components over the full
table, with REAL cross-batch duplicates (the datagen clusters are
split across batches by doc-id hash), and batch replay must be a
no-op."""

from pyspark.sql import functions as F

from deja_view_spark.datagen import generate_repos
from deja_view_spark.functions.embedding import make_embed_udf
from deja_view_spark.functions.hashing import make_minhash_bands_udf
from deja_view_spark.functions.text import truncate_body
from deja_view_spark.operators.components import connected_components
from deja_view_spark.operators.incremental_edges import IncrementalDuplicates
from deja_view_spark.operators.selfjoin import duplicate_edges

KNOBS = dict(threshold=0.85, top_k=3, convention="report")


def _featurized(spark, n_rows=240):
    embed = make_embed_udf(dim=64)
    mh = make_minhash_bands_udf(bands=16, rows=4, seed=1337)
    docs = generate_repos(spark, n_rows).select(
        F.concat_ws("/", "repo", "path").alias("doc_id"),
        truncate_body(F.col("content")).alias("doc_text"),
    )
    return docs.select(
        "doc_id",
        embed("doc_text").alias("vector"),
        mh("doc_text").alias("bands"),
    ).localCheckpoint(eager=True)


def _expected(full):
    edges = duplicate_edges(full, method="stored", scope_col=None, **KNOBS)
    comp = connected_components(
        edges.where(F.col("src") < F.col("dst")), None, "src", "dst"
    )
    return (
        {(r.src, r.dst, r.similarity, r.rank) for r in edges.collect()},
        {(r.id, r.component) for r in comp.collect()},
    )


def test_incremental_equals_full_selfjoin(spark, tmp_path):
    full = _featurized(spark)
    splits = [
        full.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i)
        for i in range(3)
    ]
    inc = IncrementalDuplicates(spark, str(tmp_path / "st"), **KNOBS)
    for i, b in enumerate(splits):
        inc.add_batch(b, i)

    exp_edges, exp_comp = _expected(full)
    got_edges = {
        (r.src, r.dst, r.similarity, r.rank) for r in inc.edges().collect()
    }
    got_comp = {(r.id, r.component) for r in inc.components().collect()}
    assert got_edges == exp_edges and len(got_edges) > 0
    assert got_comp == exp_comp

    # the test is only meaningful if duplicates actually CROSS batches
    membership = {}
    for i, b in enumerate(splits):
        for r in b.select("doc_id").collect():
            membership[r.doc_id] = i
    cross = [
        (s, d)
        for (s, d, _, _) in got_edges
        if membership[s] != membership[d]
    ]
    assert cross, "corpus split produced no cross-batch duplicates"


def test_incremental_replay_is_idempotent(spark, tmp_path):
    full = _featurized(spark, n_rows=120)
    b0 = full.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    b1 = full.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)
    inc = IncrementalDuplicates(spark, str(tmp_path / "st"), **KNOBS)
    inc.add_batch(b0, 0)
    m = inc.add_batch(b1, 1)
    before = {
        (r.src, r.dst, r.similarity) for r in inc.pairs().collect()
    }
    m2 = inc.add_batch(b1, 1)  # crash-replay of the same batch
    after = {(r.src, r.dst, r.similarity) for r in inc.pairs().collect()}
    assert after == before
    assert m2["new_pairs"] == m["new_pairs"]  # regenerated, not lost


def test_incremental_stream_availablenow(spark, tmp_path):
    """The foreachBatch wiring drains a featurized file stream and
    lands the same edges as the full self-join over everything."""
    full = _featurized(spark, n_rows=160)
    src = str(tmp_path / "in")
    full.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0).write.parquet(
        src + "/p0.parquet"
    )
    full.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1).write.parquet(
        src + "/p1.parquet"
    )
    stream = (
        spark.readStream.schema(
            "doc_id string, vector array<float>, bands array<bigint>"
        )
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    inc = IncrementalDuplicates(spark, str(tmp_path / "st"), **KNOBS)
    q = inc.attach_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    exp_edges, _ = _expected(full)
    got = {(r.src, r.dst, r.similarity, r.rank) for r in inc.edges().collect()}
    assert got == exp_edges and len(got) > 0
