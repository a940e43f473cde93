"""Incremental decayed-trending maintenance — the streaming twin of
``events_decayed_trending`` (queries_stats.py).

The batch query scores each item with exponentially time-decayed
weights (exact dyadic ``2^20 >> days_old``). In production the event
stream GROWS, and the naive incremental update — "shift yesterday's
score right and add today's" — is WRONG once weights floor: a shifted
SUM keeps carries that per-event shifted weights lose
(``(1+1) >> 1 = 1`` but ``(1>>1)+(1>>1) = 0``), so the maintained
score silently drifts from the from-scratch one.

The exactly-maintainable state is the ADDITIVE layer underneath the
decay: per-(item, day) event counts. Counts merge across batches by
plain addition regardless of how the stream is chopped, late events
land in their own day bucket, and the decayed score is computed AT
READ TIME from the bounded (|items| x horizon-days) count table with
the identical dyadic weights — so the streaming scores are
BIT-IDENTICAL to running the batch query over all events ever seen
(asserted batch-split-invariant by the tests). The same
aggregate-at-read discipline as the sliding-HLL register state
(streaming/windows.py).

State layout: one parquet delta file PER BATCH ID
(``delta_b{batch_id}``). Re-applying a batch overwrites its own delta
— crash-replay is idempotent without read-modify-write races — and
``scores()`` unions the deltas and sums (a compactor could fold old
deltas; the union is metadata-bounded either way). Scale shape: each
batch does ONE partial-agg groupBy over its own rows; the read-side
sum is one agg over the count table, never the event history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deja_view_spark.queries_stats import DECAY_Q, DECAY_SCALE, PPM

_DELTA_SCHEMA = "item long, d date, cnt long"


class IncrementalTrending:
    """Per-(item, day) additive count state + decayed read-time scores."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    # ---------------------------------------------------------- state
    def _deltas(self) -> list[str]:
        return sorted(
            os.path.join(self.state_dir, f)
            for f in os.listdir(self.state_dir)
            if f.startswith("delta_b")
        )

    def counts(self) -> DataFrame:
        files = self._deltas()
        if not files:
            return self.spark.createDataFrame([], _DELTA_SCHEMA)
        return (
            self.spark.read.parquet(*files)
            .groupBy("item", "d")
            .agg(F.sum("cnt").alias("cnt"))
        )

    # ---------------------------------------------------------- merge
    def apply_batch(self, events: DataFrame, batch_id: int) -> int:
        """Fold one micro-batch of raw event rows (needs ``props`` and
        ``ts``) into the per-(item, day) counts. Overwrites this
        batch_id's own delta file — replay-idempotent."""
        delta = (
            events.select(
                F.get_json_object("props", "$.k").cast("long").alias("item"),
                F.col("ts").cast("date").alias("d"),
            )
            .where(F.col("item").isNotNull())
            .groupBy("item", "d")
            .agg(F.count("*").alias("cnt"))
        )
        out = os.path.join(self.state_dir, f"delta_b{batch_id}")
        delta.write.mode("overwrite").parquet(out)
        return 1

    # ----------------------------------------------------------- read
    def scores(self) -> DataFrame:
        """Decayed scores over ALL events seen so far — the identical
        dyadic math as q_events_decayed_trending, so the result is
        bit-equal to the batch query over the full history."""
        c = self.counts()
        anchor = c.agg(F.max("d").alias("anchor"))
        return (
            c.crossJoin(F.broadcast(anchor))
            .select(
                "item",
                "cnt",
                F.least(F.datediff("anchor", "d"), F.lit(DECAY_Q)).alias(
                    "days_old"
                ),
            )
            .select(
                "item",
                "cnt",
                (
                    F.col("cnt")
                    * F.expr(
                        f"shiftright(CAST({DECAY_SCALE} AS BIGINT),"
                        " CAST(days_old AS INT))"
                    )
                ).alias("w"),
            )
            .groupBy("item")
            .agg(
                F.sum("cnt").alias("n_events"),
                F.sum("w").alias("score_q20"),
            )
            .select(
                "item",
                "n_events",
                "score_q20",
                F.expr(
                    f"CAST(score_q20 * {PPM}"
                    f" DIV (n_events * {DECAY_SCALE}) AS BIGINT)"
                ).alias("recency_ppm"),
            )
        )

    # ------------------------------------------------------ streaming
    def attach_stream(self, event_stream: DataFrame, checkpoint_dir: str):
        """foreachBatch wiring: every micro-batch folds into its own
        delta. Batching-invariant by construction (counts are
        additive)."""

        def _merge(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            self.apply_batch(batch_df, batch_id)

        return (
            event_stream.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
