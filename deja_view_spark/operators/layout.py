"""Z-order (Morton) data layout for multi-dimensional scan pruning.

At 100 TB, file-level min/max statistics are what turn a full scan
into a pruned one — but sorting by a single column only tightens THAT
column's ranges. Interleaving the bits of k columns into one Morton
key and range-partition-sorting by it bounds EVERY dimension's span
per file (each file covers a quad-tree cell), so predicates on any of
the clustered columns prune files. This is the layout move behind
Delta/Iceberg ``ZORDER BY`` / ``sort_order(z)``, expressed here as a
plain column expression + ``repartitionByRange``.

The bit-interleave is generated ONCE as a dialect-neutral SQL string
(``>> & << |`` behave identically on BIGINT in Spark SQL and DuckDB),
so the driver oracle runs the very same expression text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits kept per dimension (values clamped via mask)


def zvalue_sql(cols: list[str], bits: int = ZBITS) -> str:
    """Dialect-neutral SQL for the Morton interleave of ``cols``
    (lowest ``bits`` of each, BIGINT). Column j's bit b lands at
    output position b*k + j."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for b in range(bits):
            terms.append(f"((({c} >> {b}) & 1) << {b * k + j})")
    return "(" + " | ".join(terms) + ")"


def scale_sql(col: str, lo: str, hi: str, bits: int = ZBITS) -> str:
    """Dialect-neutral min/max scaling of ``col`` into [0, 2^bits):
    integer-only ((col - lo) * (2^bits - 1)) / (hi - lo), guarded for
    degenerate (constant) dimensions. Needed because the interleave's
    high-order bits come from each dimension's high-order bits — a
    narrow-range dim must be stretched to fill the bit width or it
    contributes constant zeros and the z-key degenerates."""
    top = (1 << bits) - 1
    span = f"CASE WHEN {hi} > {lo} THEN {hi} - {lo} ELSE 1 END"
    # CAST(floor(a / b)): `/` yields double in both dialects and the
    # operands stay far below 2^53, so the result is exact; Spark's
    # DIV and DuckDB's // are not cross-dialect
    return f"CAST(floor((({col} - {lo}) * {top}) / ({span})) AS BIGINT)"


def zvalue(cols: list[str], bits: int = ZBITS) -> Column:
    """Morton key as a Spark column (codegen'd bit arithmetic —
    no UDF, no shuffle)."""
    return F.expr(zvalue_sql(cols, bits))


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = ZBITS,
    partitions: int | None = None,
    scale: bool = True,
) -> DataFrame:
    """Layout pass: range-partition + sort by the Morton key so every
    output file covers one contiguous z-range (a quad-tree cell whose
    per-dimension spans shrink with file count). Write the result with
    any sink; downstream scans prune on min/max of ANY clustered col.

    ``scale=True`` (default) min/max-scales every dimension into
    [0, 2^bits) first — one tiny (2k-value) aggregate, then the same
    codegen'd interleave. Without it, raw values >= 2^bits alias
    modulo 2^bits and negative values contribute sign bits, silently
    destroying clustering locality; pass ``scale=False`` ONLY when the
    inputs are already integers in [0, 2^bits) (the scaling is then an
    exact identity anyway, so the flag is a one-job optimization, not
    a semantic knob)."""
    if scale:
        stats = df.agg(
            *[F.min(c).cast("long").alias(f"_lo_{c}") for c in cols],
            *[F.max(c).cast("long").alias(f"_hi_{c}") for c in cols],
        ).first()
        scaled = [
            F.expr(
                scale_sql(c, str(stats[f"_lo_{c}"]), str(stats[f"_hi_{c}"]), bits)
            ).alias(f"_s_{c}")
            for c in cols
        ]
        out = df.select("*", *scaled).withColumn(
            "_z", F.expr(zvalue_sql([f"_s_{c}" for c in cols], bits))
        )
        out = out.drop(*[f"_s_{c}" for c in cols])
    else:
        out = df.withColumn("_z", zvalue(cols, bits))
    if partitions:
        out = out.repartitionByRange(partitions, "_z")
    else:
        out = out.repartitionByRange("_z")
    return out.sortWithinPartitions("_z").drop("_z")
