"""End-to-end KG pipeline over the synthesized repos table: triples
exist per predicate, per-row sha256 lineage holds, re-run is
idempotent, resume skips completed partitions."""

import shutil

import pytest
from pyspark.sql import functions as F

from deja_view_spark.datagen import generate_repos
from deja_view_spark.plans.lineage import read_lineage
from deja_view_spark.plans.pipeline import KGPipeline

N_ROWS = 400


@pytest.fixture(scope="module")
def out_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("kg_out")
    yield str(d)
    shutil.rmtree(str(d), ignore_errors=True)


@pytest.fixture(scope="module")
def built(spark, out_dir):
    src = generate_repos(spark, N_ROWS)
    pipe = KGPipeline(spark, src, out_dir, threshold=0.8, method="lsh")
    triples = pipe.run()
    return src, pipe, triples


def test_datagen_shape(spark):
    df = generate_repos(spark, N_ROWS)
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    assert df.count() == N_ROWS
    # deterministic: same rows on regeneration
    a = df.orderBy("repo", "path").limit(5).collect()
    b = generate_repos(spark, N_ROWS).orderBy("repo", "path").limit(5).collect()
    assert a == b
    # hot repo ~30% (FIXTURES.md: skew knob)
    hot = df.where(F.col("repo") == "bigcorp/monorepo").count()
    assert 0.2 * N_ROWS < hot < 0.4 * N_ROWS
    # 40-hex commits
    assert df.where(~F.col("commit").rlike("^[0-9a-f]{40}$")).count() == 0


def test_all_predicates_present(built):
    _, _, triples = built
    preds = {r.pred for r in triples.select("pred").distinct().collect()}
    assert {"contains", "mentions", "duplicates", "same_as"} <= preds


def test_sha256_lineage_per_row(spark, built):
    """input_hint invariant: sha256(content) equality vs source, every row."""
    src, pipe, _ = built
    emb = spark.read.parquet(pipe._emb_path())
    joined = (
        src.withColumn("doc_id", F.concat_ws("/", "repo", "path"))
        .withColumn("src_sha", F.sha2(F.col("content"), 256))
        .join(emb.select("doc_id", "sha256"), "doc_id")
    )
    assert joined.count() == N_ROWS
    assert joined.where(F.col("src_sha") != F.col("sha256")).count() == 0


def test_duplicate_edges_exist_and_thresholded(built):
    _, _, triples = built
    dups = triples.where(F.col("pred") == "duplicates")
    assert dups.count() > 0
    assert dups.where(F.col("weight") < 0.8).count() == 0


def test_mentions_extracted(built):
    _, _, triples = built
    m = triples.where(F.col("pred") == "mentions")
    assert m.count() > 0
    # every mention object is path-shaped
    assert m.where(~F.col("obj").rlike(r"^[A-Za-z0-9_\-/]+\.[A-Za-z]+$")).count() == 0


def test_idempotent_rerun(spark, built, out_dir):
    """Re-running the whole build converges to the same triple set
    (upsert semantics, reference github_similarity_service.py:365-369)."""
    src, _, triples = built
    before = triples.groupBy("pred").count().collect()
    pipe2 = KGPipeline(spark, src, out_dir, threshold=0.8, method="lsh")
    after_df = pipe2.run()
    after = after_df.groupBy("pred").count().collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_resume_skips_completed(spark, built, out_dir):
    src, _, _ = built
    pipe3 = KGPipeline(spark, src, out_dir, threshold=0.8, method="lsh")
    pipe3.build_embeddings(resume=True)
    assert pipe3.metrics["embeddings"]["input_rows"] == 0


def test_lineage_rows_recorded(spark, built, out_dir):
    lin = read_lineage(spark, out_dir)
    stages = {r.stage for r in lin.select("stage").distinct().collect()}
    assert {"embeddings", "triples"} <= stages
    emb_lin = lin.where(F.col("stage") == "embeddings")
    # one part per repo, counts sum to the source size (first full run)
    first_run = emb_lin.groupBy("run_id").agg(
        F.sum("input_rows").alias("n")).orderBy(F.desc("n")).head()
    assert first_run.n == N_ROWS
