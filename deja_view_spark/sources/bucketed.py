"""Bucketed-table layout for exchange-free co-located joins.

At 100 TB the dominant cost of the verify / enrichment joins
(candidate pairs x vectors, triples x metadata) is re-shuffling the
wide side on every run. Writing the long-lived tables BUCKETED on the
join key fixes the partitioning in the table layout itself: a join of
two tables bucketed on the same key with the same bucket count needs
NO Exchange on either side — the shuffle is paid once at write time
and amortized over every subsequent query. (This is the
parquet-warehouse analogue of Iceberg's ``bucket(n, key)`` partition
transform, which is where this layout lands on a real deployment —
SURVEY §7.1.)

Spark only applies bucketed scan-to-join alignment through the
catalog (``saveAsTable``/``spark.table``), not bare parquet paths —
hence the table-name API here vs. catalog.py's path loads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and, by default,
    sorted) on ``key``. Sorting within buckets lets a sort-merge join
    skip its sort as well — the scan is already in join order — but
    Spark only trusts the sort metadata when each bucket holds at most
    ONE file; writers that want the sort elided should
    ``df.repartition(buckets, key)`` (or coalesce) first so each task
    owns whole buckets."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With aligned
    bucket counts the physical plan contains no Exchange (asserted in
    tests/test_bucketed.py); the merge hint pins SMJ so the
    demonstration is not short-circuited by a broadcast."""
    left = spark.table(left_table)
    right = spark.table(right_table).hint("merge")
    return left.join(right, key)
