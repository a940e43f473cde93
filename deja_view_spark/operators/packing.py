"""Token-budget shard packing — the "write training shards of ~B
tokens each" step of a pre-training data pipeline.

Semantics: documents are laid out in a fixed global order (a
deterministic `order_col`); each document's shard is

    shard_id = floor(exclusive_prefix_sum(weight) / budget)

i.e. contiguous runs of documents whose cumulative token count crosses
a budget boundary start a new shard. A document may overflow its
shard's budget by at most its own weight (standard greedy packing —
no document is split).

Scale shape (the reason this is an operator, not one window call): a
global ordered prefix sum as a single `Window.orderBy(...)` is a
ONE-PARTITION sort — the classic driver-shaped bottleneck that dies at
100 TB. This implementation uses the textbook two-phase distributed
scan instead:

  1. bucket each row by `floor(order / bucket_width)` (order-preserving
     coarse ranges) and aggregate per-bucket weight totals — one narrow
     shuffle of (bucket, total) rows;
  2. prefix-sum the per-bucket totals — a window over the TOTALS table
     only (thousands of rows at 10^12 inputs, one tiny partition of
     metadata, not data);
  3. broadcast-join each bucket's exclusive offset back and finish with
     a window PARTITIONED BY bucket (parallel across buckets) ordered
     by `order_col` within.

Every shuffle moves fixed-width (bucket, long) rows; the only ordered
window over the full data is bucket-partitioned. The same layout
serves any distributed cumulative aggregate (running totals, monotonic
ids); SNIPPETS.md's Flink/Beam batch scans use the identical split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(
    df: DataFrame,
    budget: int,
    weight_col: str = "n_tokens",
    order_col: str = "doc_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """Assign every row a ``shard_id`` by greedy budget packing in
    ``order_col`` order (see module docstring for the distributed
    prefix-sum layout). Returns the input plus ``shard_id``.

    ``order_col`` must be numeric and unique (it defines the global
    layout); ``bucket_width`` trades per-bucket parallelism against the
    size of the totals table (rows/bucket_width rows of metadata).
    """
    reserved = {"_bucket", "_cum_in_bucket", "_offset", "shard_id"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"pack_shards reserved column collision: {sorted(clash)}"
        )

    rows = df.withColumn(
        "_bucket", F.floor(F.col(order_col) / F.lit(bucket_width))
    )
    # phase 1: per-bucket totals — narrow shuffle of (bucket, sum)
    totals = rows.groupBy("_bucket").agg(
        F.sum(weight_col).alias("_bucket_total")
    )
    # phase 2: exclusive running offset per bucket. The window is over
    # the TOTALS table (one row per bucket — metadata-sized), so the
    # single-partition sort touches thousands of rows, not the corpus.
    wb = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "_bucket",
        (F.sum("_bucket_total").over(wb) - F.col("_bucket_total")).alias(
            "_offset"
        ),
    )
    # phase 3: bucket-local ordered cumsum + broadcast offset join
    ww = (
        Window.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rows.join(F.broadcast(offsets), "_bucket")
        .withColumn("_cum_in_bucket", F.sum(weight_col).over(ww))
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("_offset") + F.col("_cum_in_bucket") - F.col(weight_col))
                / F.lit(budget)
            ),
        )
        .drop("_bucket", "_cum_in_bucket", "_offset")
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    budget: int,
    weight_col: str = "n_tokens",
    order_col: str = "doc_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """Pack ``df`` into token-budget shards and write them as one
    parquet directory partitioned by ``shard_id`` — each shard is the
    unit a training loader reads, so the physical layout mirrors the
    logical packing (one directory per shard, file count per shard set
    by the upstream partitioning, no global sort).

    Returns the shard manifest of what was written (re-read from the
    output so the manifest reflects the files on disk, not the plan)."""
    packed = pack_shards(
        df, budget, weight_col=weight_col, order_col=order_col,
        bucket_width=bucket_width,
    )
    packed.write.mode("overwrite").partitionBy("shard_id").parquet(out_dir)
    written = df.sparkSession.read.parquet(out_dir)
    return shard_manifest(written, weight_col=weight_col)


def shard_manifest(packed: DataFrame, weight_col: str = "n_tokens") -> DataFrame:
    """Per-shard rollup of a ``pack_shards`` output: document count,
    token total and the shard's [first, last] order range — the
    manifest a shard writer would key its output files by."""
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(weight_col).alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard_id")
    )
