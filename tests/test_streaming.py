"""Incremental/streaming surface: batch-incremental probe semantics and
the Structured Streaming file-watch wrapper (availableNow drain)."""

import time

import pytest
from pyspark.sql import functions as F

from deja_view_spark.datagen import generate_repos
from deja_view_spark.plans.pipeline import KGPipeline
from deja_view_spark.streaming.incremental import (
    incremental_duplicate_probe,
    stream_duplicate_probe,
)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_kg"))
    src = generate_repos(spark, 300)
    pipe = KGPipeline(spark, src, out, threshold=0.8)
    emb = pipe.build_embeddings()
    return pipe, emb, out


def test_incremental_probe_matches_duplicates(spark, built):
    """A doc re-probed against the index finds its near-duplicates at
    the same threshold/semantics as the batch self-join."""
    pipe, emb, _ = built
    docs = pipe.documents()
    # probe 20 existing docs "as if new" — their own row is excluded,
    # near-dup cluster members surface
    new = docs.limit(20).select("doc_id", "doc_text")
    edges = incremental_duplicate_probe(new, emb, threshold=0.8, top_k=5)
    rows = edges.collect()
    assert all(r.src != r.dst for r in rows)
    assert all(r.similarity >= 0.8 for r in rows)
    # per-src ranks are 1..k dense
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_src.values())


def test_stream_available_now_drains(spark, built, tmp_path):
    pipe, emb, out = built
    watch = str(tmp_path / "incoming")
    sink = str(tmp_path / "edges")
    ck = str(tmp_path / "ck")
    docs = pipe.documents()
    docs.limit(10).select("doc_id", "doc_text").coalesce(1).write.mode(
        "overwrite"
    ).parquet(watch)

    q = stream_duplicate_probe(
        spark,
        watch,
        pipe._emb_path(),
        sink,
        ck,
        threshold=0.8,
        top_k=3,
    )
    q.awaitTermination(120)
    assert not q.isActive  # availableNow drains and stops
    edges = spark.read.parquet(sink)
    assert edges.count() > 0
    assert {"src", "dst", "similarity", "rank", "batch_id"} <= set(edges.columns)
