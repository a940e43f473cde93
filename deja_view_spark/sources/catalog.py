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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided table. Plain parquet scan: Catalyst
    handles column pruning + predicate pushdown into the footer stats."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
