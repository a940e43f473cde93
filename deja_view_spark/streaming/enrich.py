"""Stream-static enrichment join with dimension hot-reload.

The ingestion shape every event pipeline needs: each micro-batch of
facts joins the CURRENT version of a slowly-changing dimension (user
segments, item catalog, blocklists). Spark's native stream-static join
re-evaluates the static plan per micro-batch, but whether a *file*
dimension actually re-lists is a caching subtlety users get wrong; the
operator makes the contract explicit — the dimension directory is
RE-READ inside foreachBatch, so a dim updated between batches enriches
the very next batch (hot reload), and each batch writes its own output
file keyed by batch id (replay overwrites itself — the same
crash-idempotence layout as streaming/decay.py and streaming/cm.py).

Scale shape: the dimension broadcasts into every batch (dims are
metadata-sized next to the stream; a fact-sized dim belongs in a
stream-stream join with watermarks — streaming/dedup.py covers that
shape), so each micro-batch is one map-side hash join + one append
write. Left join: facts with no dim row pass through with NULL
enrichment rather than silently dropping (the blocklist/segment-miss
case downstream quality gates want visible).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamStaticEnricher:
    """foreachBatch enrichment against a hot-reloadable parquet dim."""

    def __init__(
        self,
        spark: SparkSession,
        dim_dir: str,
        out_dir: str,
        join_key: str = "user_id",
    ):
        self.spark = spark
        self.dim_dir = dim_dir
        self.out_dir = out_dir
        self.join_key = join_key
        os.makedirs(out_dir, exist_ok=True)

    # ---------------------------------------------------------- merge
    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> int:
        """Enrich one micro-batch against the CURRENT dim contents and
        write it to this batch id's own output file (replay
        overwrites itself)."""
        dim = self.spark.read.parquet(self.dim_dir)
        enriched = batch_df.join(F.broadcast(dim), self.join_key, "left")
        out = os.path.join(self.out_dir, f"batch_b{batch_id}")
        enriched.write.mode("overwrite").parquet(out)
        return 1

    # ----------------------------------------------------------- read
    def enriched(self) -> DataFrame:
        files = sorted(
            os.path.join(self.out_dir, f)
            for f in os.listdir(self.out_dir)
            if f.startswith("batch_b")
        )
        return self.spark.read.parquet(*files)

    # ------------------------------------------------------ streaming
    def attach_stream(self, event_stream: DataFrame, checkpoint_dir: str):
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
