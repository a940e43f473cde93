"""Streaming windowed aggregation + custom stateful operator.

The reference's scheduled weekly metrics job (ST2,
.github/workflows/weekly-discussions-metrics.yml + discussions_metrics.py)
is a periodic tumbling-window aggregation. Batch mode re-runs it
statelessly (queries_events.q_events_weekly_by_type); this module is
the Structured Streaming form: a file source watched continuously,
7-day tumbling windows, a watermark bounding state for late data.

``running_user_counts`` adds the custom-stateful-operator surface
(applyInPandasWithState): per-user running event count + last-seen
timestamp kept in explicit GroupState across micro-batches — the shape
any bespoke streaming operator (sessionizer, dedup-within-horizon,
rate limiter) takes when window()/agg() can't express it.

Scale notes: the window aggregation is a standard partial-agg +
state-store plan (state keyed by (window, event_type) — small; the
watermark bounds it). The stateful operator's state is keyed by user —
state-store partitioning spreads it across executors; by DEFAULT its
state is unbounded (a lifetime running count needs lifetime state);
pass ``idle_timeout_ms`` to evict users idle longer than that via
ProcessingTimeTimeout, bounding state to recently-active keys.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "7 days",
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts per event_type with a watermark bounding
    late-data state. Works identically on a batch OR streaming frame
    (batch ignores the watermark) — the ST2 weekly rollup, streamified.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            # exact-integer sum (round-4 hardening): DOUBLE sums are
            # accumulation-order-dependent across engines/retries, so
            # sum BIGINT 1e-4 ticks and divide once — the 4dp total of
            # 4dp-exact values, bit-stable in batch AND streaming
            # (state-store merge order stops mattering too)
            (
                F.sum(
                    F.round(F.col("value") * 10000, 0).cast("bigint")
                ).cast("double")
                / 10000.0
            ).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("week_start"),
            F.col("win.end").alias("week_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType | str,
    window: str = "7 days",
    watermark: str = "1 day",
):
    """File-source streaming form of ``windowed_event_counts``:
    watch ``in_dir`` for new parquet, maintain windowed counts, write
    completed windows to ``out_dir``. Returns the started query
    (trigger availableNow — drains what exists, then stops; a deployed
    job would use a processingTime trigger)."""
    src = spark.readStream.schema(schema).parquet(in_dir)
    agg = windowed_event_counts(src, window=window, watermark=watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


_RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", TimestampType()),
        StructField("last_event_type", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("last_event_type", StringType()),
    ]
)


def _make_update_running(idle_timeout_ms: int | None):
    def _update_running(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """applyInPandasWithState update fn: fold this micro-batch's
        rows for one user into (count, last_ts, last_type) state; emit
        the updated running row. On idle timeout: evict the key's state
        and emit nothing."""
        if idle_timeout_ms is not None and state.hasTimedOut:
            state.remove()
            return
        n_prev, last_us, last_type = (
            state.get if state.exists else (0, None, None)
        )
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
            if len(pdf):
                mx = pdf.loc[pdf["ts"].idxmax()]
                us = int(mx["ts"].value // 1000)
                if last_us is None or us >= last_us:
                    last_us, last_type = us, str(mx["event_type"])
        n = n_prev + n_new
        state.update((n, last_us, last_type))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        # `is not None`, not truthiness: a legitimate event at exactly
        # the epoch (last_us == 0) must not collapse to NaT
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "last_ts": [
                    pd.Timestamp(last_us * 1000)
                    if last_us is not None
                    else pd.NaT
                ],
                "last_event_type": [last_type],
            }
        )

    return _update_running


def running_user_counts(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator: per-user running event count
    and last-seen event, state carried across micro-batches in explicit
    GroupState (applyInPandasWithState, Arrow-batched — no per-row
    Python). Input: a STREAMING frame of (user_id, ts, event_type, ...).

    State bound: by default state is per-user FOREVER (a lifetime
    running count requires it — unbounded by design). For corpora with
    a long tail of one-shot users, pass ``idle_timeout_ms``: users idle
    longer than that are evicted via ProcessingTimeTimeout (their count
    restarts at 0 if they return).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_running(idle_timeout_ms),
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_running_user_counts(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType | str,
):
    """File-source wrapper for ``running_user_counts``; availableNow
    drain, parquet sink of per-batch updated rows."""
    src = spark.readStream.schema(schema).parquet(in_dir)
    out = running_user_counts(src)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    return (
        out.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------------------ sessionizer
_SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("closed", StringType()),  # 'closed' | 'open'
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _make_sessionize(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Fold this micro-batch's events (sorted by ts, then event_id
        when present) into the user's open-session state; emit one
        'closed' row per session that ended (gap exceeded) and one
        'open' row for the session still in state — so a consumer sees
        every completed session exactly once plus the current running
        session (outputMode update)."""
        start_us, last_us, n = (
            state.get if state.exists else (None, None, 0)
        )
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        sort_cols = ["ts"] + (["event_id"] if "event_id" in batch else [])
        batch = batch.sort_values(sort_cols, kind="mergesort")
        for ts in batch["ts"]:
            us = int(ts.value // 1000)
            if last_us is not None and us - last_us > gap_us:
                rows.append((start_us, last_us, n, "closed"))
                start_us, n = us, 0
            if start_us is None:
                start_us = us
            last_us = us
            n += 1
        state.update((start_us, last_us, n))
        rows.append((start_us, last_us, n, "open"))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(rows),
                "session_start": [pd.Timestamp(r[0] * 1000) for r in rows],
                "session_end": [pd.Timestamp(r[1] * 1000) for r in rows],
                "n_events": [r[2] for r in rows],
                "closed": [r[3] for r in rows],
            }
        )

    return _update


def sessionize_events(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful streaming sessionizer (the shape window()/agg()
    cannot express): per-user sessions split on inactivity gaps, the
    OPEN session carried across micro-batches in explicit GroupState —
    a session spanning two file arrivals is stitched, not split.

    Semantics match the batch lag+running-sum sessionization
    (queries_events.q_events_sessions, 30-min default gap): closed
    rows are emitted exactly once, the latest 'open' row per user is
    the running session. State is one fixed-width row per user with an
    open session; a deployment that must bound it adds a watermark +
    EventTimeTimeout flush (same pattern as running_user_counts'
    idle_timeout_ms)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_sessionize(gap_seconds),
        outputStructType=_SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sessionize(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType | str,
    gap_seconds: int = 1800,
):
    """File-source wrapper for ``sessionize_events``; availableNow
    drain, parquet sink of per-batch session rows."""
    src = spark.readStream.schema(schema).parquet(in_dir)
    out = sessionize_events(src, gap_seconds=gap_seconds)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        out.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_hll_registers(
    events: DataFrame,
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-day dense-HLL register state as a STREAMING aggregation:
    groupBy(day, reg).max(rho) over the arriving event stream — max is
    the canonical mergeable streaming aggregate, so the state store
    holds exactly the (day x HLL_M) register table the batch builder
    (queries_events.q_events_hll_sliding) materializes, updated
    incrementally per micro-batch and bounded by the watermark.

    Works identically on a batch frame (watermark ignored) — the
    batch-equivalence oracle the tests assert. Downstream, the
    register stream feeds the same scaled-integer estimator and the
    same sliding register-max merge as the batch path; state is
    register-sized (days x 256 longs), never event-sized."""
    from deja_view_spark.queries_corpus import HLL_M, HLL_P, _hll_rho

    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"), F.lit("|"), F.col("props")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.select(
            F.col(ts_col),
            F.to_date(ts_col).alias("day"),
            (h % HLL_M).alias("reg"),
            _hll_rho(F.shiftright(h, HLL_P)).alias("rho"),
        )
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("mr"))
    )
