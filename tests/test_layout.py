"""Z-order layout (operators/layout.py): the clustered layout must
bound EVERY dimension's per-cell span (quad-tree cells), which is the
property file-level min/max pruning consumes; a single-column sort
provably cannot (the other dimension stays full-range)."""

from pyspark.sql import functions as F

from deja_view_spark.operators.layout import (
    ZBITS,
    cluster_by_zorder,
    scale_sql,
    zvalue_sql,
)


def _grid(spark, n=64):
    """Full n x n grid: every (x, y) combination — the worst case for
    single-dim sorting, the best illustration of z-locality."""
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
    )


def test_zvalue_bit_interleave_known_values(spark):
    """Hand-checked Morton codes: z(1,0)=1, z(0,1)=2, z(1,1)=3,
    z(2,3)=14, z(7,7)=63 for the (x lowest bit first) convention."""
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (1, 1), (2, 3), (7, 7)], "x long, y long"
    ).select("x", "y", F.expr(zvalue_sql(["x", "y"])).alias("z"))
    got = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    assert got == {(1, 0): 1, (0, 1): 2, (1, 1): 3, (2, 3): 14, (7, 7): 63}


def test_zorder_bounds_both_dims_where_single_sort_cannot(spark):
    """Bucket the grid into 16 cells by (a) top-4 z-key bits and (b)
    ranges of x alone. Z-cells bound BOTH x and y spans to a quarter
    of the domain; x-ranging leaves the y span at full range in every
    bucket."""
    n = 64
    g = _grid(spark, n).select(
        "x",
        "y",
        F.expr(scale_sql("x", "0", str(n - 1))).alias("sx"),
        F.expr(scale_sql("y", "0", str(n - 1))).alias("sy"),
    )
    z = g.select(
        "x", "y", F.expr(zvalue_sql(["sx", "sy"])).alias("z")
    ).select(
        "x", "y", F.shiftright("z", 2 * ZBITS - 4).alias("bucket")
    )
    zspans = z.groupBy("bucket").agg(
        (F.max("x") - F.min("x")).alias("xs"),
        (F.max("y") - F.min("y")).alias("ys"),
    ).collect()
    assert len(zspans) == 16
    for r in zspans:
        assert r["xs"] <= n // 4 and r["ys"] <= n // 4, dict(r.asDict())

    xonly = _grid(spark, n).withColumn(
        "bucket", F.floor(F.col("x") / (n / 16))
    )
    xspans = xonly.groupBy("bucket").agg(
        (F.max("x") - F.min("x")).alias("xs"),
        (F.max("y") - F.min("y")).alias("ys"),
    ).collect()
    for r in xspans:
        assert r["ys"] == n - 1  # the unsorted dim never tightens


def test_cluster_by_zorder_partitions_are_z_contiguous(spark):
    """After cluster_by_zorder, partitions hold disjoint contiguous
    z-ranges (range partitioning + in-partition sort), i.e. the file
    layout a writer would emit is prune-friendly."""
    n = 32
    g = _grid(spark, n).select(
        F.expr(scale_sql("x", "0", str(n - 1))).alias("x"),
        F.expr(scale_sql("y", "0", str(n - 1))).alias("y"),
    )
    out = cluster_by_zorder(g, ["x", "y"], partitions=8)
    assert out.columns == ["x", "y"]  # helper key dropped

    def part_ranges(idx, rows):
        zs = [
            sum(((r.x >> b) & 1) << (2 * b) | ((r.y >> b) & 1) << (2 * b + 1)
                for b in range(16))
            for r in rows
        ]
        if zs:
            yield idx, min(zs), max(zs), all(
                a <= b for a, b in zip(zs, zs[1:])
            )

    parts = sorted(
        out.rdd.mapPartitionsWithIndex(part_ranges).collect(),
        key=lambda t: t[1],
    )
    assert all(sorted_flag for _, _, _, sorted_flag in parts)
    for (_, _, hi_prev, _), (_, lo_next, _, _) in zip(parts, parts[1:]):
        assert hi_prev <= lo_next  # disjoint, contiguous ranges


def test_cluster_by_zorder_scales_wide_and_negative_inputs(spark):
    """Raw inputs outside [0, 2^bits) — here x spans ~2M (> 2^16) and
    is negative — must still yield a layout that PRUNES: a 10% x-slice
    should touch few partitions after scale=True clustering, while the
    unscaled interleave aliases x modulo 2^16 (and interleaves sign
    bits), smearing the slice across ~all partitions (round-3 fix)."""
    import pyspark.sql.functions as SF

    n = 1 << 8
    g = spark.range(n * n).select(
        ((F.col("id") % n) * 7919 - 50_000).alias("x"),
        ((F.col("id") / n).cast("long") * 11 + 100_000).alias("y"),
    )
    lo_q, hi_q = -50_000, -50_000 + 25 * 7919  # ~10% slice of x

    def touched(df):
        # partitions whose [min(x), max(x)] overlaps the slice — the
        # file-skipping decision a parquet reader makes from footers
        stats = (
            df.withColumn("_pid", SF.spark_partition_id())
            .groupBy("_pid")
            .agg(SF.min("x").alias("lo"), SF.max("x").alias("hi"))
            .collect()
        )
        return sum(1 for r in stats if r.hi >= lo_q and r.lo <= hi_q), len(stats)

    t_scaled, n_scaled = touched(cluster_by_zorder(g, ["x", "y"], partitions=16))
    t_raw, n_raw = touched(
        cluster_by_zorder(g, ["x", "y"], partitions=16, scale=False)
    )
    assert n_scaled == n_raw == 16
    assert t_raw >= 14, t_raw  # aliased layout: slice smears everywhere
    assert t_scaled <= 8, t_scaled  # scaled layout actually prunes
