"""Per-partition lineage + idempotent resume (north_rule requirement).

Every stage writes, alongside its output, lineage rows:

    (run_id, stage, part_key, input_rows, input_sha_agg, output_rows)

- ``part_key`` is the pipeline's unit of resume (the repo — the same
  key the output tables are partitioned by);
- ``input_sha_agg`` is an order-independent digest of the partition's
  input sha256 set (sum of the first 16 hex chars as unsigned ints,
  mod 2^63) — equal inputs produce equal digests regardless of row
  order or parallelism, so a resumed run can verify it is extending
  the same inputs;
- resume = source partitions ANTI JOIN lineage partitions for that
  stage (SURVEY §2.8): only missing partitions are recomputed, and
  outputs are written with dynamic partition overwrite, which makes
  re-running a completed stage a no-op (idempotence, SURVEY §1.4
  upsert semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, stage string, part_key string, input_rows long, "
    "input_sha_agg decimal(38,0), output_rows long"
)


def sha_agg_col() -> F.Column:
    """Order-independent digest of a partition's sha256 set."""
    return F.sum(
        F.conv(F.substring(F.col("sha256"), 1, 15), 16, 10).cast("decimal(38,0)")
    )


def lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "kg_lineage")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    path = lineage_path(out_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def completed_parts(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    return (
        read_lineage(spark, out_dir)
        .where(F.col("stage") == stage)
        .select("part_key")
        .distinct()
    )


def record_lineage(
    inputs: DataFrame,
    outputs_count_by_part: DataFrame,
    out_dir: str,
    stage: str,
    run_id: str,
    part_col: str = "repo",
) -> None:
    """Aggregate lineage for this stage run and append it.

    ``inputs`` must carry (part_col, sha256); ``outputs_count_by_part``
    is (part_key, output_rows).
    """
    lin = (
        inputs.groupBy(F.col(part_col).alias("part_key"))
        .agg(
            F.count("*").alias("input_rows"),
            sha_agg_col().alias("input_sha_agg"),
        )
        .join(outputs_count_by_part, "part_key", "left")
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "part_key",
            "input_rows",
            "input_sha_agg",
            F.coalesce(F.col("output_rows"), F.lit(0)).alias("output_rows"),
        )
    )
    lin.write.mode("append").parquet(lineage_path(out_dir))


def record_lineage_from_table(
    table: DataFrame,
    out_dir: str,
    stage: str,
    run_id: str,
    part_col: str = "repo",
) -> None:
    """Fast path for stages whose output is 1:1 with its input and
    carries the sha256 column (embeddings): ONE aggregation over the
    written table yields input_rows == output_rows and the sha digest —
    no source re-scan, no join."""
    lin = table.groupBy(F.col(part_col).alias("part_key")).agg(
        F.count("*").alias("input_rows"),
        sha_agg_col().alias("input_sha_agg"),
    )
    lin.select(
        F.lit(run_id).alias("run_id"),
        F.lit(stage).alias("stage"),
        "part_key",
        "input_rows",
        "input_sha_agg",
        F.col("input_rows").alias("output_rows"),
    ).write.mode("append").parquet(lineage_path(out_dir))
