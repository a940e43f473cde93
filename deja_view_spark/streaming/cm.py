"""Incremental count-min sketch maintenance — the streaming twin of
``events_cm_sketch`` (queries_events.py).

The batch query builds a d×w count-min table and audits it against the
exact top-k. Under streaming ingest the EXACT side is precisely what a
sketch exists to avoid maintaining (per-item counts are unbounded
state), so the streaming operator maintains ONLY the sketch cells —
and sketch cells are pure counters, i.e. ADDITIVE: per-batch cell
deltas merge by plain sum no matter how the stream is chopped, which
makes the maintained sketch BIT-IDENTICAL to the batch-built sketch
over all events ever seen. Point estimates for any candidate key list
then agree bit-for-bit with the batch query's ``cm_estimate`` column
(asserted batch-split-invariant by the tests) while the state stays
d×w rows forever.

State layout mirrors streaming/decay.py: one parquet delta file per
batch id (``delta_b{batch_id}``) so crash-replay overwrites itself —
idempotent without read-modify-write races; ``cells()`` unions the
deltas and sums. Scale shape: each batch explodes its own rows to
CM_DEPTH cells with full map-side combine (every partition collapses
to ≤ d·w rows before the shuffle); the read side broadcasts the
d·w-row sketch into the candidate lookups exactly like the batch
query, with the same fixed-order ``least()`` so the estimate
arithmetic is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deja_view_spark.queries_events import CM_DEPTH, _cm_bucket

_CELL_SCHEMA = "r int, b long, cnt long"


class IncrementalCMSketch:
    """Additive d×w count-min cell state + point-estimate reads."""

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

    def cells(self) -> DataFrame:
        files = self._deltas()
        if not files:
            return self.spark.createDataFrame([], _CELL_SCHEMA)
        return (
            self.spark.read.parquet(*files)
            .groupBy("r", "b")
            .agg(F.sum("cnt").alias("cnt"))
        )

    # ---------------------------------------------------------- merge
    def apply_batch(self, events: DataFrame, batch_id: int) -> int:
        """Fold one micro-batch of raw event rows (needs ``props``)
        into the sketch cells. Overwrites this batch_id's own delta —
        replay-idempotent."""
        item = F.get_json_object("props", "$.k").cast("long")
        occ = events.select(item.alias("item")).where(
            F.col("item").isNotNull()
        )
        delta = (
            occ.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(r).alias("r"),
                                _cm_bucket(F.col("item"), r).alias("b"),
                            )
                            for r in range(CM_DEPTH)
                        ]
                    )
                ).alias("c")
            )
            .groupBy("c.r", "c.b")
            .agg(F.count("*").alias("cnt"))
        )
        out = os.path.join(self.state_dir, f"delta_b{batch_id}")
        delta.write.mode("overwrite").parquet(out)
        return 1

    # ----------------------------------------------------------- read
    def estimates(self, keys: DataFrame) -> DataFrame:
        """Count-min point estimates for a candidate key table
        (one ``item`` long column) — same broadcast-LUT lookups and
        fixed-order least() as the batch query, so estimates are
        bit-equal to q_events_cm_sketch's cm_estimate for the same
        keys over the same history."""
        sketch = self.cells()
        est = keys.select("item")
        for r in range(CM_DEPTH):
            lut = sketch.where(F.col("r") == r).select(
                F.col("b").alias(f"_b{r}"), F.col("cnt").alias(f"_c{r}")
            )
            est = est.withColumn(
                f"_b{r}", _cm_bucket(F.col("item"), r)
            ).join(F.broadcast(lut), f"_b{r}", "left")
        cm = F.least(
            *[F.coalesce(F.col(f"_c{r}"), F.lit(0)) for r in range(CM_DEPTH)]
        )
        return est.select("item", cm.alias("cm_estimate")).orderBy("item")

    # ------------------------------------------------------ streaming
    def attach_stream(self, event_stream: DataFrame, checkpoint_dir: str):
        """foreachBatch wiring: every micro-batch folds into its own
        delta. Batching-invariant by construction (cells are
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
