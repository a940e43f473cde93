"""Connected components over the similarity graph (canonicalization).

GraphFrames-style iterative label propagation, dependency-free
(SURVEY §4 conclusion, §7.2 step 5): every vertex starts labeled with
itself; each round every vertex takes the min label among itself and
its neighbors; converged when no label changes. Canonical entity id is
therefore the min doc_id of its component — deterministic at any
parallelism.

Scale notes:
- each round is one shuffle (join on dst) + one aggregation (min per
  id) — both key-partitioned by vertex id, so AQE coalesces them;
- ``localCheckpoint`` every round cuts the exponentially growing plan
  lineage (SURVEY §7.4.4) — without it Catalyst re-analyzes a 2^k-deep
  plan;
- rounds needed = graph diameter; duplicate clusters are tiny cliques
  (diameter 1-2), so convergence is fast; ``max_iter`` bounds
  pathological chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Return (id, component) with component = min id in the component.

    ``edges`` is treated as undirected. ``vertices`` (single column
    ``id``) optionally adds isolated vertices.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.localCheckpoint(eager=True)

    verts = und.select(F.col("a").alias("id")).distinct()
    if vertices is not None:
        verts = verts.unionByName(vertices.select("id")).distinct()

    labels = verts.select("id", F.col("id").alias("component")).localCheckpoint(
        eager=True
    )

    for _ in range(max_iter):
        # neighbor labels: for edge (a,b), a receives b's current label.
        # The previous label rides along as `old` (unique non-null per
        # id), so convergence is read off the SAME aggregation — no
        # extra labels-vs-labels join per round.
        nbr = und.join(
            labels.withColumnRenamed("id", "b"), "b"
        ).select(
            F.col("a").alias("id"),
            "component",
            F.lit(None).cast(labels.schema["component"].dataType).alias("old"),
        )
        # LAZY checkpoint: the convergence count below is the job that
        # materializes it (persisted partitions are written as that job
        # computes them), so each round costs ONE job, not a separate
        # eager-checkpoint job plus a count job. Full count (no
        # limit(1)): a short-circuited job would leave partitions
        # unpersisted and re-derive the whole lineage next round.
        new_labels = (
            labels.withColumn("old", F.col("component"))
            .unionByName(nbr)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.min("old").alias("old"),  # min ignores nulls -> prev label
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where(F.col("component") != F.col("old")).count()
        labels = new_labels.drop("old")
        if changed == 0:
            break
    return labels
