"""Incremental duplicate-edge maintenance over a growing embeddings
store — the unscoped companion to the pipeline's repo-keyed resume.

The KG pipeline's resume mode (plans/pipeline.py) is keyed by repo and
scopes duplicate pairs within a repo, so a resumed batch is
independent of history BY CONSTRUCTION. The general case — an
embeddings table where a new document can duplicate ANY prior
document — needs real cross-batch candidate discovery without
re-running the full self-join per batch. This operator maintains it:

  per batch of featurized rows (doc_id, vector, bands[, scope])
    1. append the batch to a per-batch versioned embeddings store
       (idempotent: re-running a batch overwrites its own subdir);
    2. TOUCHED-BUCKET restriction: only band buckets containing a
       batch member can yield new pairs. The batch's bucket keys are
       BROADCAST into a semi-join against the full band table, so
       untouched buckets are dropped map-side — the band shuffle is
       bounded by the touched buckets, never the corpus;
    3. run the standard bucket-local pair machinery
       (operators/selfjoin._pairs_from_band_table — same salting, same
       exact pair-set guarantee) on the touched subset, anti-join the
       pair store (pairs already scored in earlier batches), and
       exact-cosine-verify only the NEW pairs;
    4. append verified pairs to the per-batch pair store.

Induction gives exact equivalence with a from-scratch self-join: when
the later member of any qualifying pair arrives, its buckets are
touched, so the pair is generated in exactly one batch. ``edges()``
(top-k trim) and ``components()`` recompute over the accumulated pair
store — those are edge-sized graph operations (<= bands collisions
above threshold), never a corpus scan; the expensive stages
(featurize, band shuffle, cosine verify) are the incremental ones.

Equivalence is asserted by tests against duplicate_edges(method=
'stored') + connected_components over the full table, with planted
cross-batch duplicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deja_view_spark.functions.similarity import cosine_sim
from deja_view_spark.operators.components import connected_components
from deja_view_spark.operators.selfjoin import (
    _pairs_from_band_table,
    _similarity,
)


class IncrementalDuplicates:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        threshold: float = 0.8,
        top_k: int = 3,
        convention: str = "report",
        scope_col: str | None = None,
        max_bucket: int = 200,
        assume_normalized: bool = True,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.threshold = threshold
        self.top_k = top_k
        self.convention = convention
        self.scope_col = scope_col
        self.max_bucket = max_bucket
        self.assume_normalized = assume_normalized
        os.makedirs(os.path.join(state_dir, "emb_store"), exist_ok=True)
        os.makedirs(os.path.join(state_dir, "pair_store"), exist_ok=True)

    # ----------------------------------------------------------- state
    def _batches(self, sub: str) -> list[str]:
        d = os.path.join(self.state_dir, sub)
        return sorted(
            os.path.join(d, b) for b in os.listdir(d) if b.startswith("batch_")
        )

    def _emb_schema(self) -> str:
        s = "doc_id string, vector array<float>, bands array<bigint>"
        if self.scope_col:
            s += f", {self.scope_col} string"
        return s

    def embeddings(self, exclude_batch: int | None = None) -> DataFrame:
        paths = [
            p
            for p in self._batches("emb_store")
            if exclude_batch is None
            or not p.endswith(f"batch_{exclude_batch}")
        ]
        if not paths:
            return self.spark.createDataFrame([], self._emb_schema())
        return self.spark.read.parquet(*paths)

    def pairs(self, exclude_batch: int | None = None) -> DataFrame:
        """Accumulated scored pairs; ``exclude_batch`` drops that
        batch's own store so RE-RUNNING a batch regenerates (not
        anti-joins away) its pairs — the idempotent-replay guard."""
        schema = "src string, dst string, similarity double"
        paths = [
            p
            for p in self._batches("pair_store")
            if exclude_batch is None
            or not p.endswith(f"batch_{exclude_batch}")
        ]
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*paths)

    # ----------------------------------------------------------- merge
    def _band_table(self, emb: DataFrame) -> DataFrame:
        scope = F.col(self.scope_col) if self.scope_col else F.lit("")
        return emb.select(
            "doc_id",
            scope.alias("_scope"),
            F.explode("bands").alias("band"),
        )

    def add_batch(self, emb_batch: DataFrame, batch_id: int) -> dict:
        cols = ["doc_id", "vector", "bands"] + (
            [self.scope_col] if self.scope_col else []
        )
        batch = emb_batch.select(*cols).localCheckpoint(eager=True)
        # idempotent: a re-run of the same batch overwrites its own dir
        batch.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "emb_store", f"batch_{batch_id}")
        )
        full = self.embeddings(exclude_batch=batch_id).unionByName(batch)
        # touched buckets only: broadcast the batch's bucket keys so the
        # corpus band table is filtered map-side (no corpus shuffle)
        hot = (
            self._band_table(batch).select("_scope", "band").distinct()
        )
        bt_touch = self._band_table(full).join(
            F.broadcast(hot), ["_scope", "band"], "left_semi"
        )
        cand = _pairs_from_band_table(
            bt_touch, self.max_bucket, checkpoint_bt=False
        )
        new_pairs = cand.join(
            self.pairs(exclude_batch=batch_id).select("src", "dst"),
            ["src", "dst"],
            "left_anti",
        )
        # exact-cosine verify, identical to duplicate_edges' verify
        # (operators/selfjoin.py): scope screened exactly, similarity
        # rounded to 4dp, threshold filter
        scope = [self.scope_col] if self.scope_col else []
        va = full.select(
            F.col("doc_id").alias("src"),
            F.col("vector").alias("_va"),
            *[F.col(c).alias("_sa") for c in scope],
        )
        vb = full.select(
            F.col("doc_id").alias("dst"),
            F.col("vector").alias("_vb"),
            *[F.col(c).alias("_sb") for c in scope],
        )
        scored = new_pairs.join(va, "src").join(vb, "dst")
        if scope:
            scored = scored.where(F.col("_sa") == F.col("_sb"))
        scored = (
            scored.withColumn(
                "_cos",
                cosine_sim(F.col("_va"), F.col("_vb"), self.assume_normalized),
            )
            .withColumn(
                "similarity",
                F.round(_similarity(F.col("_cos"), self.convention), 4),
            )
            .where(F.col("similarity") >= self.threshold)
            .select("src", "dst", "similarity")
            .localCheckpoint(eager=True)
        )
        n_new = scored.count()
        scored.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "pair_store", f"batch_{batch_id}")
        )
        return {"batch_id": batch_id, "new_pairs": n_new}

    # --------------------------------------------------------- outputs
    def edges(self) -> DataFrame:
        """Directed (src, dst, similarity, rank) — per-src top-k over
        the ACCUMULATED pair store (the trim must see the union:
        a batch can push an old neighbor out of an old src's top-k)."""
        p = self.pairs()
        mirrored = p.unionByName(
            p.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "similarity",
            )
        )
        w = Window.partitionBy("src").orderBy(
            F.desc("similarity"), F.asc("dst")
        )
        return (
            mirrored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= self.top_k)
            .select("src", "dst", "similarity", "rank")
        )

    def components(self) -> DataFrame:
        """(id, component) over the trimmed edge graph — the same
        canonicalization the batch pipeline derives (CC over top-k
        edges), recomputed from the edge-sized store."""
        return connected_components(
            self.edges().where(F.col("src") < F.col("dst")),
            None,
            "src",
            "dst",
        )

    # ------------------------------------------------------- streaming
    def attach_stream(self, emb_stream: DataFrame, checkpoint_dir: str):
        """foreachBatch wiring: each micro-batch of featurized rows
        (doc_id, vector, bands[, scope]) merges through add_batch with
        the STREAM's batch_id (checkpoint-stable, so a restarted query
        replays into the same per-batch dirs — the idempotent-replay
        guarantee add_batch already provides)."""

        def _merge(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            self.add_batch(batch_df, int(batch_id))

        return (
            emb_stream.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
