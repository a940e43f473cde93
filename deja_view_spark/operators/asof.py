"""As-of (point-in-time) join — the general form of the reference's
week-window membership lookups (J5, discussions_metrics.py:95-103):
for every left row, attach the most recent right row for the same key
whose timestamp is <= the left row's timestamp.

Spark has no built-in as-of join; the naive encodings both fail at
scale:

- range-join (``l.ts >= r.ts`` theta join + window max) explodes to
  O(|L|·|R|) per key before pruning;
- per-key ``applyInPandas`` + ``pandas.merge_asof`` ships every byte
  through Python.

This implementation uses the **union + running-last** layout instead:
tag both sides, union them into one narrow table, and take, per key in
timestamp order, the running ``last(right_payload, ignorenulls=True)``.
One shuffle on the key, no pair explosion, no Python, whole-stage
codegen throughout — the plan survives a 100x scale-up because its
cost is O(|L|+|R|) shuffle + a linear window pass.

Ordering discipline (determinism at any parallelism, SURVEY §7.4.6):
rows sort by (ts, side) with right rows first, so a right row with
ts == left ts IS visible to that left row (inclusive backward match,
pandas ``merge_asof(direction='backward')`` semantics). Right-side
duplicates on (key, ts) are resolved by ``tie_col`` (greatest wins)
before the union, so the carried value is unique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_col: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: every ``left`` row plus the latest ``right``
    row (same ``on`` key, ``right_ts`` <= ``left_ts``); right columns
    come back ``prefix``-renamed, NULL when no match exists (left join).

    ``right_cols`` defaults to every right column except the key. When
    (key, right_ts) is not unique, pass ``tie_col``: the row with the
    greatest tie value wins (deterministic).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    if right_ts not in right_cols:
        right_cols = [right_ts, *right_cols]

    # reserved working names and the prefixed outputs must not collide
    # with caller columns — fail loudly instead of producing ambiguous
    # columns or silently wrong output
    reserved = {"_ts", "_side", "_payload", "_match", "_rn"}
    clash = (reserved & set(left.columns)) | (reserved & set(right.columns))
    out_clash = {f"{prefix}{c}" for c in right_cols} & set(left.columns)
    if clash or out_clash:
        raise ValueError(
            f"asof_join reserved/output name collision: "
            f"{sorted(clash | out_clash)} — rename these input columns "
            f"or pass a different prefix"
        )

    r = right
    if tie_col is not None:
        wt = Window.partitionBy(*keys, right_ts).orderBy(F.desc(tie_col))
        r = (
            r.withColumn("_rn", F.row_number().over(wt))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    payload = F.struct(*[F.col(c) for c in right_cols])
    left_cols = list(left.columns)
    r_tagged = r.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in keys],
    )
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in left_cols if c not in keys],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("_ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r_tagged.unionByName(l_tagged)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    out_cols = [F.col(c) for c in left_cols]
    out_cols += [
        F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return matched.select(*out_cols)
