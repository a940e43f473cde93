"""Graph-analytics queries (driver-checkable).

``events_pagerank`` — PageRank over the user co-engagement graph
derived from the events table, in FIXED-POINT INTEGER arithmetic so
the iterative computation is bit-exact across engines and partition
orders (floating-point PageRank sums in whatever order the shuffle
delivers; integer sums are order-independent, so the DuckDB oracle
matches on the full value hash, not a rounded approximation).

Graph definition (deterministic, mirrored in the oracle):
  - two users are linked when they touch the same item (props $.k);
  - per item, the sorted distinct user list contributes directed edges
    user[i] -> user[i+1] (the standard co-engagement chain — linear in
    group size, NOT the quadratic all-pairs clique);
  - self-loops dropped, multi-edges collapsed.

PageRank semantics: damping 0.85, ranks held as integer micro-units
(SCALE = 1e12), ITERS fixed iterations, uniform init SCALE/N. Per-edge
contribution floor((rank * 85) / (100 * outdeg)); per-node rank =
floor(15*SCALE / (100*N)) + sum(contributions). Dangling-node mass is
dropped (the usual simplification; mirrored in the oracle).

Scale shape: the build is two narrow shuffles (distinct on (item,
user), groupBy item) and each iteration is one join + one aggregation
keyed on node ids — the canonical MapReduce PageRank plan. The edge
set is localCheckpoint'ed once and reused by all iterations (on a
cluster: a cached/bucketed edge table); rank updates shuffle
fixed-width (long, long) rows. The oracle unrolls the same iterations
as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deja_view_spark.sources.catalog import load_table

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as a ratio
ITERS = 8


def q_events_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    item = F.get_json_object("props", "$.k").cast("long")
    touched = ev.select(item.alias("item"), "user_id").distinct()
    chains = touched.groupBy("item").agg(
        F.sort_array(F.collect_list("user_id")).alias("us")
    )
    # consecutive-pair explode; guard size==1 (Spark's sequence(1,0)
    # yields a DESCENDING [1,0], unlike SQL generate_series)
    pair_idx = F.when(
        F.size("us") > 1, F.sequence(F.lit(1), F.size("us") - 1)
    ).otherwise(F.array().cast("array<int>"))
    edges = (
        chains.select(
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at("us", i).alias("src"),
                        F.element_at("us", i + 1).alias("dst"),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # reused by every iteration
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_df = nodes.agg(F.count("*").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.expr(f"CAST({SCALE} DIV n AS BIGINT)").alias("rank")
    )
    for _ in range(ITERS):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST((rank * {DAMP_NUM}) DIV ({DAMP_DEN} * outdeg)"
                    " AS BIGINT)"
                ).alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.crossJoin(F.broadcast(n_df))
            .join(sums, "node", "left")
            .select(
                "node",
                (
                    F.expr(
                        f"CAST(({DAMP_DEN - DAMP_NUM} * {SCALE})"
                        f" DIV ({DAMP_DEN} * n) AS BIGINT)"
                    )
                    + F.coalesce(F.col("s"), F.lit(0))
                )
                .cast("long")
                .alias("rank"),
            )
        )
    return ranks.orderBy("node")


def _oracle_pagerank() -> str:
    teleport = f"(({DAMP_DEN - DAMP_NUM} * {SCALE}::BIGINT) // ({DAMP_DEN} * n))"
    iters = []
    prev = "r0"
    for i in range(1, ITERS + 1):
        iters.append(f"""
r{i} AS (
  SELECT nodes.node,
         CAST({teleport} + coalesce(c.s, 0) AS BIGINT) AS rank
  FROM nodes CROSS JOIN n
  LEFT JOIN (
    SELECT e.dst AS node,
           sum((r.rank * {DAMP_NUM}) // ({DAMP_DEN} * d.outdeg)) AS s
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst) c ON nodes.node = c.node)""")
        prev = f"r{i}"
    chain = ",".join(iters)
    return f"""
WITH touched AS (
  SELECT DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         user_id
  FROM events),
chains AS (
  SELECT item, list_sort(list(user_id)) AS us FROM touched GROUP BY item),
edges AS (
  SELECT DISTINCT us[i] AS src, us[i + 1] AS dst
  FROM (SELECT us, unnest(generate_series(1, len(us) - 1)) AS i FROM chains)
  WHERE us[i] <> us[i + 1]),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
n AS (SELECT count(*) AS n FROM nodes),
r0 AS (
  SELECT node, CAST({SCALE}::BIGINT // n AS BIGINT) AS rank
  FROM nodes CROSS JOIN n),{chain}
SELECT node, rank FROM {prev} ORDER BY node
"""


ORACLE_EVENTS_PAGERANK = _oracle_pagerank()

QUERIES = {"events_pagerank": q_events_pagerank}
ORACLES = {"events_pagerank": ORACLE_EVENTS_PAGERANK}
