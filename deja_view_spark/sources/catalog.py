"""Table access layer.

The driver provides deterministic parquet tables at
/root/testdata/sf{0.001,0.01,0.1}/{name}.parquet; the KG pipeline's own
source table (`repos`, per BASELINE.json input_hint) is synthesized by
:mod:`deja_view_spark.datagen` under the repo's .data/ directory.

At production scale these reads would be Iceberg
(``spark.read.table("catalog.db.t")``) with partition pruning on
(repo-bucket, lang); parquet-dir layout here is format-identical at the
file level (the Iceberg runtime jar is not available in-sandbox).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Tables whose downstream operators are compute-heavy per row (text
# shingling, vector math, UDF featurization). The driver ships each as
# ONE parquet file with one row group — an unsplittable single-task
# scan that serializes everything above it. A real deployment reads
# thousands of splits; here we restore scan parallelism with one cheap
# round-robin exchange (a few MB) right above the scan. Column pruning
# and predicate pushdown still reach the scan below the exchange.
_FANOUT_TABLES = {"documents", "embeddings", "events"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided table. Catalyst handles column pruning
    + predicate pushdown; compute-heavy tables additionally get a
    parallelism-restoring repartition (see _FANOUT_TABLES)."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name in _FANOUT_TABLES:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < max(2, target // 2):
            df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
