"""Query operators over the materialized KG triple table — the
consumption side of the pipeline (plans/pipeline.py writes
``kg_triples/`` partitioned by ``pred``; these operators are why that
layout was chosen).

Reference parity: the reference answers "what duplicates issue X"
by one Chroma ANN query per issue (cli.py:459-678) and has no graph
store at all; here the duplicate edges, mention edges and canonical
mapping are rows in one (subj, pred, obj, weight) table, so the same
questions — and their multi-hop compositions — are plain DataFrame
joins the optimizer can plan.

Scale shapes:
- every operator starts from a ``pred`` equality filter, which on the
  pred-partitioned table is PARTITION PRUNING — a two-hop query over
  ``duplicates`` (sparse) never reads the ``contains`` partitions
  (bulk of a 10^12-file graph);
- hop joins shuffle on the join node id; when one hop's predicate is
  sparse (duplicates, same_as) mark it broadcastable and the hop is
  map-side;
- canonicalization is a left join against ``same_as`` (identity rows
  included, so ``coalesce`` handles never-linked nodes for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pred_scan(triples: DataFrame, pred: str) -> DataFrame:
    """All edges of one predicate. On the pred-partitioned table this
    is a partition-pruned scan (assert: PartitionFilters in the plan,
    tools/explain_audit.py discipline)."""
    return triples.where(F.col("pred") == pred)


def neighbors(
    triples: DataFrame,
    node: str,
    pred: str | None = None,
    direction: str = "out",
) -> DataFrame:
    """One-hop neighborhood of ``node``: ``out`` follows subj->obj,
    ``in`` follows obj->subj, ``both`` unions the two (edge mirrored
    into (node, neighbor, weight) either way)."""
    t = pred_scan(triples, pred) if pred else triples
    out = t.where(F.col("subj") == node).select(
        F.col("subj").alias("node"),
        F.col("pred"),
        F.col("obj").alias("neighbor"),
        F.col("weight"),
    )
    inn = t.where(F.col("obj") == node).select(
        F.col("obj").alias("node"),
        F.col("pred"),
        F.col("subj").alias("neighbor"),
        F.col("weight"),
    )
    if direction == "out":
        return out
    if direction == "in":
        return inn
    if direction == "both":
        return out.unionByName(inn).distinct()
    raise ValueError(f"direction must be out|in|both, got {direction!r}")


def two_hop(
    triples: DataFrame,
    pred1: str,
    pred2: str,
    broadcast_first: bool = False,
) -> DataFrame:
    """Distinct (a, b, c) paths a -[pred1]-> b -[pred2]-> c.

    The join key is the middle node; each side is a partition-pruned
    single-predicate scan. ``broadcast_first=True`` marks the pred1
    side broadcastable — right for sparse-over-dense compositions
    (e.g. duplicates ∘ mentions: the duplicate edge set is orders of
    magnitude smaller than the mention set, so the hop becomes a
    map-side join over the dense side). Path weight = product of the
    two edge weights (max over duplicate parallel paths)."""
    t1 = pred_scan(triples, pred1).select(
        F.col("subj").alias("a"),
        F.col("obj").alias("b"),
        F.col("weight").alias("_w1"),
    )
    if broadcast_first:
        t1 = F.broadcast(t1)
    t2 = pred_scan(triples, pred2).select(
        F.col("subj").alias("b"),
        F.col("obj").alias("c"),
        F.col("weight").alias("_w2"),
    )
    return (
        t1.join(t2, "b")
        .where(F.col("a") != F.col("c"))
        .groupBy("a", "b", "c")
        .agg(F.max(F.col("_w1") * F.col("_w2")).alias("path_weight"))
    )


def resolve_canonical(
    df: DataFrame, triples: DataFrame, cols: list[str]
) -> DataFrame:
    """Rewrite every id column in ``cols`` through the ``same_as``
    canonical mapping (subj -> obj). Nodes without a mapping keep
    their own id (the pipeline emits identity rows, but coalesce makes
    the operator total on any input). The mapping table is one narrow
    partition-pruned scan, joined per column — broadcast it when the
    linked-entity set is small relative to ``df``."""
    mapping = pred_scan(triples, "same_as").select(
        F.col("subj").alias("_from"), F.col("obj").alias("_to")
    )
    out = df
    for c in cols:
        out = (
            out.join(mapping, on=out[c] == mapping["_from"], how="left")
            .withColumn(c, F.coalesce(F.col("_to"), F.col(c)))
            .drop("_from", "_to")
        )
    return out


def degree_stats(triples: DataFrame) -> DataFrame:
    """Per-predicate edge census: edge count, distinct subjects /
    objects, mean out-degree — one partial-agg pass, the health check
    a KG build publishes next to its lineage rows."""
    return (
        triples.groupBy("pred")
        .agg(
            F.count("*").alias("n_edges"),
            F.countDistinct("subj").alias("n_subj"),
            F.countDistinct("obj").alias("n_obj"),
            F.round(F.count("*") / F.countDistinct("subj"), 4).alias(
                "avg_out_degree"
            ),
        )
        .orderBy("pred")
    )


def pagerank(
    triples: DataFrame,
    pred: str | None = None,
    iters: int = 10,
    damping: float = 0.85,
    undirected: bool = False,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Entity importance over the triple graph: PageRank restricted to
    one predicate's edges (partition-pruned scan) or the whole graph.

    Returns (node, rank) with sum(rank) <= 1 (dangling mass is
    dropped, the usual simplification). ``undirected=True`` mirrors
    every edge first — right for symmetric predicates (duplicates).

    Scale shape: the canonical MapReduce PageRank — the edge set is
    localCheckpoint'ed once and reused by every iteration; each
    iteration is one equi-join on src plus one aggregation on dst
    (fixed-width rows); ``checkpoint_every`` bounds plan lineage the
    same way the connected-components loop does (SURVEY §7.4.4). For
    cross-engine bit-exact parity see the fixed-point integer variant
    (queries_graph.py); this float form is the KG-side operator where
    a numpy test oracle, not a SQL hash, is the check."""
    t = pred_scan(triples, pred) if pred else triples
    e = t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    edges = (
        e.where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_df = nodes.agg(F.count("*").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for i in range(iters):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.lit(damping) * F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.crossJoin(F.broadcast(n_df))
            .join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def duplicate_clusters(triples: DataFrame, min_size: int = 2) -> DataFrame:
    """Canonical duplicate groups from the ``same_as`` partition:
    (canonical, members sorted, size), size >= ``min_size`` — the
    find-duplicates report shape (reference cli.py:580-649) read
    straight off the materialized graph instead of re-running ANN."""
    return (
        pred_scan(triples, "same_as")
        .groupBy(F.col("obj").alias("canonical"))
        .agg(
            F.sort_array(F.collect_list("subj")).alias("members"),
            F.count("*").alias("size"),
        )
        .where(F.col("size") >= min_size)
        .orderBy("canonical")
    )


def reach_pairs(
    edges: DataFrame, k: int = 4, dedup: bool = True
) -> DataFrame:
    """Min-distance pair table (src, dst, d) for all pairs first
    reached within <= k directed hops — the semi-naive BFS core shared
    by `reach_k` and the harmonic-centrality query (see
    queries_graph.py for the scale discussion: each round's frontier
    holds only NEWLY discovered pairs via an anti-join against the
    reached set, localCheckpoint per round keeps lineage linear in k;
    doubling-trick for full closure). Pass ``dedup=False`` when the
    edge table is already distinct to skip the safety-dedup shuffle."""
    edges = edges.select("src", "dst")
    if dedup:
        edges = edges.distinct()
    edges = edges.localCheckpoint(eager=True)
    reached = edges.withColumn("d", F.lit(1))
    frontier = edges
    for i in range(2, k + 1):
        step = (
            frontier.withColumnRenamed("dst", "mid")
            .join(edges.withColumnRenamed("src", "mid"), "mid")
            .select("src", "dst")
            .distinct()
        )
        frontier = step.join(
            reached.select("src", "dst"), ["src", "dst"], "left_anti"
        ).localCheckpoint(eager=True)
        reached = reached.unionByName(frontier.withColumn("d", F.lit(i)))
    return reached


def reach_k(edges: DataFrame, k: int = 4, dedup: bool = True) -> DataFrame:
    """Bounded reachability census over an arbitrary (src, dst) edge
    table: per source node, the count of DISTINCT nodes first reached
    within <= k directed hops, plus the exact-distance-k ring. Built
    on `reach_pairs`; the generic core behind the registry query
    `events_reach_k` and the CLI triples-graph `reach` verb."""
    pairs = reach_pairs(edges, k=k, dedup=dedup)
    return (
        pairs.where(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(
            F.count("*").alias("n_reach"),
            F.sum(F.when(F.col("d") == k, 1).otherwise(0))
            .cast("bigint")
            .alias("n_ring_k"),
        )
        .select(F.col("src").alias("node"), "n_reach", "n_ring_k")
    )
