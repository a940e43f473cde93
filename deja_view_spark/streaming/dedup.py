"""Streaming dedup + stream-stream interval join.

Two streaming operator classes the batch suite already covers whose
streaming forms need bounded state:

- **Watermark-bounded exact dedup** (`dropDuplicatesWithinWatermark`):
  the streaming form of the training-pipeline exact-dedup op
  (queries.q_docs_exact_dedup — full-content sha256 equality). Plain
  ``dropDuplicates`` on a stream keeps every key seen FOREVER; the
  WithinWatermark variant expires key state once the watermark passes
  it, so state is bounded by the duplicate-arrival horizon instead of
  corpus cardinality — at 100 TB that is the difference between a
  state store holding hours of keys and one holding the whole corpus.
  Contract: duplicates arriving within the watermark delay of the
  first-seen row are dropped; a re-emit AFTER the horizon is a new
  row by design (the horizon IS the dedup guarantee).

- **Stream-stream interval join**: the streaming form of the as-of /
  range join (J5, operators/asof.py; batch query
  events_asof_purchase). Watermarks on BOTH sides plus a closed time
  bound in the join condition let Spark evict buffered rows the
  moment they can no longer match — without the bound, both join
  buffers grow forever.

Both are exercised by availableNow drains in tests with a batch
equivalence oracle (same input, batch operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def dedup_docs_within_watermark(
    docs: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 day",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup of a streaming documents frame on full-content
    sha256 (same key as the batch q_docs_exact_dedup), state bounded
    by ``watermark``. First-ARRIVAL-wins: exactly one row per key is
    emitted, but within a micro-batch the surviving row is arrival-
    (task-)order arbitrary, not the event-time minimum — across
    micro-batches the earlier batch's row always wins (its key is
    already in state).

    The sha256 is computed IN the stream (sha2 — JVM, codegen) so the
    operator needs no precomputed fingerprint column.
    """
    keyed = docs.withColumn("sha256", F.sha2(F.col(text_col), 256))
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["sha256"]
    )


def stream_dedup_docs(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType | str,
    watermark: str = "1 day",
):
    """File-source wrapper: watch ``in_dir`` for new parquet, emit
    first-seen rows to ``out_dir``. availableNow drain; dedup state
    carries across runs via the checkpoint."""
    src = spark.readStream.schema(schema).parquet(in_dir)
    out = dedup_docs_within_watermark(src, watermark=watermark)
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def purchases_after_clicks(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to every
    click by the same user in the preceding ``max_gap`` (closed
    interval [purchase - gap, purchase]) — the streaming form of the
    batch as-of join query (events_asof_purchase), except all matches
    in the window are kept (streaming cannot rank "latest only"
    without another stateful op downstream).

    Both sides carry a watermark and the join condition bounds event
    time in both directions, so Spark evicts click/purchase buffer
    state as the watermark advances (state ~ O(rows per gap window),
    not O(stream length)).
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"""c_user = p_user
            AND click_ts <= purchase_ts
            AND purchase_ts <= click_ts + interval {max_gap}"""
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_ts",
        "click_value",
        "purchase_ts",
        "purchase_value",
    )


def stream_purchases_after_clicks(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType | str,
    max_gap: str = "1 hour",
):
    """File-source wrapper for ``purchases_after_clicks``: one watched
    events directory feeds both join sides (two filtered views of the
    same stream). availableNow drain, append sink."""
    src = spark.readStream.schema(schema).parquet(in_dir)
    out = purchases_after_clicks(src, max_gap=max_gap)
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
