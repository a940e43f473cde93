"""Incremental / streaming surface (SURVEY §2.9).

The reference's GitHub Action (action.py:72-166) is an event-driven
incremental query: on each new issue, embed it and probe the existing
index for top-k neighbors, then comment. Two Spark-native shapes:

- ``incremental_duplicate_probe`` — the batch-incremental core: new
  docs only vs the existing embeddings table (broadcast of the small
  new side), reusing the exact J1 semantics (self-exclusion,
  threshold, top-k). This is what a ``foreachBatch`` body calls.
- ``stream_duplicate_probe`` — Structured Streaming wrapper: a file
  source watching a directory of new-docs parquet, probing each
  micro-batch via foreachBatch and appending duplicate edges to a
  sink directory. ST2 (the weekly metrics cron) is stateless re-run
  of the WoW aggregation — no streaming state needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deja_view_spark.functions.embedding import make_embed_udf
from deja_view_spark.functions.similarity import cosine_sim


def incremental_duplicate_probe(
    new_docs: DataFrame,
    emb: DataFrame,
    dim: int = 128,
    threshold: float = 0.8,
    top_k: int = 5,
    convention: str = "report",
    scope_col: str | None = None,
) -> DataFrame:
    """Probe NEW documents against the EXISTING embeddings table.

    new_docs: (doc_id, doc_text[, scope]); emb: (doc_id, vector[, scope]).
    Returns (src, dst, similarity, rank) — src is a new doc. The new
    side is embedded with the same deterministic embedder and broadcast
    (it is small by construction); the big table streams through one
    scan. Mirrors action.py:126-133 probe semantics (self-exclusion,
    threshold, top-k).
    """
    embed = make_embed_udf(dim=dim)
    probes = new_docs.select(
        F.col("doc_id").alias("src"),
        *([F.col(scope_col).alias("_pscope")] if scope_col else []),
        embed(F.col("doc_text")).alias("pvec"),
    )
    cand = emb.select(
        F.col("doc_id").alias("dst"),
        *([F.col(scope_col).alias("_cscope")] if scope_col else []),
        F.col("vector"),
    )
    cond = F.col("src") != F.col("dst")
    if scope_col:
        cond = cond & (F.col("_pscope") == F.col("_cscope"))
    cos = cosine_sim(F.col("vector"), F.col("pvec"), assume_normalized=True)
    sim = cos if convention == "service" else (F.lit(1.0) + cos) / 2.0
    scored = (
        cand.join(F.broadcast(probes), cond)
        .withColumn("similarity", F.round(sim, 4))
        .where(F.col("similarity") >= threshold)
    )
    w = Window.partitionBy("src").orderBy(F.desc("similarity"), F.asc("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("src", "dst", "similarity", "rank")
    )


def stream_duplicate_probe(
    spark: SparkSession,
    watch_dir: str,
    emb_path: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id string, doc_text string",
    trigger_available_now: bool = True,
    **probe_kwargs,
):
    """Structured Streaming wrapper: watch ``watch_dir`` for new-docs
    parquet, probe each micro-batch against the embeddings table, and
    append edges to ``sink_dir``. Returns the StreamingQuery.

    availableNow=True drains what exists and stops — the
    GitHub-Action-style "run on event, then exit" trigger; set False
    for a continuously-running micro-batch pipeline.
    """
    stream = (
        spark.readStream.schema(schema).parquet(watch_dir)
    )

    def _probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        emb = spark.read.parquet(emb_path)
        edges = incremental_duplicate_probe(batch_df, emb, **probe_kwargs)
        edges.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sink_dir)

    writer = stream.writeStream.foreachBatch(_probe_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
