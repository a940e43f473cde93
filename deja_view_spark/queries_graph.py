"""Graph-analytics queries (driver-checkable).

``events_triangles`` — per-vertex triangle counts over the undirected
co-engagement graph via degree orientation (wedge join bounded by
O(sqrt(m)) out-neighborhoods, each triangle emitted once).

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


def _chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed distinct co-engagement chain edges (see module doc)."""
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
    return (
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
    )


def q_events_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _chain_edges(spark, sf_dir).localCheckpoint(
        eager=True  # reused by every iteration
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


# chain-edges CTEs shared by every oracle that queries the
# co-engagement graph (pagerank here, kg_two_hop in queries_retrieval)
SQL_CHAIN_EDGES_CTES = """touched AS (
  SELECT DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         user_id
  FROM events),
chains AS (
  SELECT item, list_sort(list(user_id)) AS us FROM touched GROUP BY item),
edges AS (
  SELECT DISTINCT us[i] AS src, us[i + 1] AS dst
  FROM (SELECT us, unnest(generate_series(1, len(us) - 1)) AS i FROM chains)
  WHERE us[i] <> us[i + 1])"""


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
WITH {SQL_CHAIN_EDGES_CTES},
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


# ------------------------------------------------------ triangle counting
def q_events_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user triangle participation counts over the (undirected)
    co-engagement graph — the clustering-coefficient numerator, the
    standard community-density signal.

    Scale shape: DEGREE ORIENTATION. Each undirected edge is directed
    from its lower-(degree, id) endpoint to the higher one, so every
    out-neighborhood is O(sqrt(m)) even on power-law graphs — the wedge
    self-join (the quadratic step) is bounded by the orientation, not
    by the hottest vertex's true degree. One self-join on the wedge
    apex + one semi-join against the oriented edge set closes the
    wedges; each triangle is emitted exactly once and exploded to its
    three corners for the per-vertex census. The oracle counts the
    same triangles with the plain id-ordered three-way join (a < b < c
    — fine at oracle scale, hot-vertex-quadratic at corpus scale)."""
    und = (
        _chain_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)  # reused: degrees + wedges + closure
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient by (deg, id): out-degree <= O(sqrt(m)) per vertex
    withdeg = (
        und.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    # wedges u -> {v, w} with v ≺ w in the (deg, id) order (each
    # unordered wedge once); closure edge is then oriented v -> w
    e1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = e1.join(e2, "u").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, ["x", "y"], "left_semi").select("u", "x", "y")
    corners = tris.select(
        F.explode(F.array("u", "x", "y")).alias("node")
    )
    return (
        corners.groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy("node")
    )


ORACLE_EVENTS_TRIANGLES = """
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
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri)
SELECT node, count(*) AS n_triangles
FROM corners
GROUP BY node
ORDER BY node
"""

# --------------------------------------- duplicate clusters (CC as a query)
# The KG canonicalization step in driver-checkable form: connected
# components over the near-duplicate pair graph (docs_jaccard_pairs),
# computed as CC_ITERS rounds of synchronous min-label propagation.
# Fixed-round semantics make the output well-defined on BOTH engines
# whether or not the labels have converged (they have, at any tested
# scale: near-dup clusters are shallow); the oracle unrolls the same
# rounds as chained CTEs, so the full value hash must match. 5 rounds
# (was 8 in r2): Spark converges in 3 on every tested corpus, and each
# unrolled oracle round costs real DuckDB time inside the driver's
# correctness budget.
CC_ITERS = 5


def q_docs_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup cluster assignment: transitive closure of the
    Jaccard near-duplicate pairs, one row per clustered document with
    its cluster id (min doc_id reachable in {CC_ITERS} hops), the
    cluster size, and the keep/drop decision (keep the representative,
    drop the other members) — the decision a dedup pipeline acts on.

    Scale shape: the edge list is checkpointed once and every round is
    one long-keyed join + one min-aggregation (the label-propagation
    CC plan; operators/components.py holds the alternating large/small
    star variant for high-diameter graphs). Labels shuffle as (long,
    long) rows; cluster sizes are one extra aggregation at the end."""
    from deja_view_spark.queries_text import q_docs_jaccard_pairs

    pairs = q_docs_jaccard_pairs(spark, sf_dir).select("src_doc", "dst_doc")
    mirrored = pairs.unionByName(
        pairs.select(
            F.col("dst_doc").alias("src_doc"), F.col("src_doc").alias("dst_doc")
        )
    )
    # self-loops make each round ONE join + agg over the CLOSED
    # neighborhood (min over N(v) ∪ {v}), so the plan lineage grows
    # linearly in rounds — a labels-referenced-twice formulation
    # doubles the plan per round (2^ITERS blowup)
    edges = (
        mirrored.unionByName(
            mirrored.select("src_doc").distinct().select(
                "src_doc", F.col("src_doc").alias("dst_doc")
            )
        )
        .localCheckpoint(eager=True)  # reused by every round
    )
    labels = edges.select(F.col("src_doc").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(CC_ITERS):
        labels = (
            edges.join(labels.withColumnRenamed("node", "src_doc"), "src_doc")
            .groupBy(F.col("dst_doc").alias("node"))
            .agg(F.min("label").alias("label"))
        )
    sizes = labels.groupBy("label").agg(F.count("*").alias("n_docs"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            "n_docs",
            (F.col("node") == F.col("label")).alias("is_rep"),
        )
        .orderBy("doc_id")
    )


def _oracle_duplicate_clusters() -> str:
    from deja_view_spark.queries_text import ORACLE_DOCS_JACCARD

    iters = []
    prev = "l0"
    for i in range(1, CC_ITERS + 1):
        iters.append(f"""
l{i} AS (
  SELECT e.dst_doc AS node, min(p.label) AS label
  FROM edges e JOIN {prev} p ON e.src_doc = p.node
  GROUP BY e.dst_doc)""")
        prev = f"l{i}"
    chain = ",".join(iters)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT src_doc, dst_doc FROM ({ORACLE_DOCS_JACCARD})),
mirrored AS (
  SELECT src_doc, dst_doc FROM pairs
  UNION ALL SELECT dst_doc, src_doc FROM pairs),
edges AS MATERIALIZED (
  -- MATERIALIZED: every label round references `edges`; DuckDB would
  -- otherwise inline (= recompute) the whole Jaccard subquery once per
  -- round (~8x oracle cost observed in round 2)
  SELECT src_doc, dst_doc FROM mirrored
  UNION ALL SELECT DISTINCT src_doc, src_doc FROM mirrored),
l0 AS (
  SELECT DISTINCT src_doc AS node, src_doc AS label FROM edges),{chain}
SELECT l.node AS doc_id, l.label AS cluster_id, s.n_docs,
       (l.node = l.label) AS is_rep
FROM {prev} l
JOIN (SELECT label, count(*) AS n_docs FROM {prev} GROUP BY label) s
  ON l.label = s.label
ORDER BY doc_id
"""


ORACLE_DOCS_DUPLICATE_CLUSTERS = _oracle_duplicate_clusters()

# ------------------------------------------------- bounded k-hop reach
REACH_K = 4


def q_events_reach_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded reachability census: for every node of the directed
    co-engagement graph, how many DISTINCT other nodes it reaches in
    at most ``REACH_K`` hops, and how many of those are first reached
    at exactly distance K (the expanding-frontier signal) — the
    influence-radius metric behind "who sees content seeded here".

    Scale shape: SEMI-NAIVE BFS. Round i's frontier holds only the
    pairs FIRST discovered at distance i (anti-join against the
    reached set), so each round shuffles the newly discovered pairs,
    not the whole closure; every round is one equi-join + one distinct
    over fixed-width (long, long) rows with full map-side partial
    aggregation. The edge set and each frontier are localCheckpoint'ed
    (on a cluster: a cached/bucketed edge table) so lineage stays
    linear in K, not exponential. K is fixed and small — the k-hop
    census is the standard bounded-radius proxy; a full transitive
    closure at corpus scale would switch to the doubling trick
    (O(log diameter) rounds) with the identical join shape. The
    oracle is a depth-bounded recursive CTE taking min-distance per
    pair (= BFS first-discovery), so the two engines must agree on
    both counts. Parallels the reference's neighborhood expansion of
    similar-issue links (github_similarity_service.py find_similar
    fan-out), generalized to K hops. Core loop:
    operators/graphquery.reach_k (shared with the CLI's triples-graph
    `reach` verb); chain edges are already distinct, so the
    safety-dedup shuffle is skipped."""
    from deja_view_spark.operators.graphquery import reach_k

    edges = _chain_edges(spark, sf_dir)
    return reach_k(edges, k=REACH_K, dedup=False).orderBy("node")


ORACLE_EVENTS_REACH_K = f"""
WITH RECURSIVE {SQL_CHAIN_EDGES_CTES},
walk(src, dst, d) AS (
  SELECT src, dst, 1 FROM edges
  UNION
  SELECT w.src, e.dst, w.d + 1
  FROM walk w JOIN edges e ON w.dst = e.src
  WHERE w.d < {REACH_K}),
md AS (
  SELECT src, dst, min(d) AS md FROM walk
  WHERE src <> dst GROUP BY src, dst)
SELECT src AS node,
       count(*) AS n_reach,
       count(*) FILTER (WHERE md = {REACH_K}) AS n_ring_k
FROM md GROUP BY src ORDER BY node
"""


# ----------------------------------------------- harmonic centrality
def q_events_harmonic_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated harmonic centrality (Boldi & Vigna, "Axioms for
    Centrality"): per node, sum of 1/d over every node first reached
    within <= REACH_K hops — the centrality that handles disconnected
    graphs where closeness degenerates. Shares the semi-naive BFS pair
    table with `events_reach_k` (operators/graphquery.reach_pairs).

    Cross-engine determinism: summing 1/d floats directly is
    shuffle-order-dependent (1/3 is inexact), so both engines first
    count pairs PER DISTANCE (integers — order-independent) and then
    evaluate the fixed-order expression n1/1 + n2/2 + ... + nK/K,
    rounded to 4dp. Output carries the per-distance counts too (the
    reach profile a crawl-frontier planner actually reads)."""
    from deja_view_spark.operators.graphquery import reach_pairs

    pairs = reach_pairs(
        _chain_edges(spark, sf_dir), k=REACH_K, dedup=False
    ).where(F.col("src") != F.col("dst"))
    counts = pairs.groupBy("src").agg(
        *[
            F.sum(F.when(F.col("d") == i, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_d{i}")
            for i in range(1, REACH_K + 1)
        ]
    )
    harmonic = F.col("n_d1") / F.lit(1.0)
    for i in range(2, REACH_K + 1):
        harmonic = harmonic + F.col(f"n_d{i}") / F.lit(float(i))
    return (
        counts.select(
            F.col("src").alias("node"),
            *[f"n_d{i}" for i in range(1, REACH_K + 1)],
            F.round(harmonic, 4).alias("harmonic"),
        )
        .orderBy("node")
    )


def _oracle_harmonic() -> str:
    counts = ",\n       ".join(
        f"count(*) FILTER (WHERE md = {i}) AS n_d{i}"
        for i in range(1, REACH_K + 1)
    )
    expr = " + ".join(
        f"n_d{i} / {float(i)}" for i in range(1, REACH_K + 1)
    )
    return f"""
WITH RECURSIVE {SQL_CHAIN_EDGES_CTES},
walk(src, dst, d) AS (
  SELECT src, dst, 1 FROM edges
  UNION
  SELECT w.src, e.dst, w.d + 1
  FROM walk w JOIN edges e ON w.dst = e.src
  WHERE w.d < {REACH_K}),
md AS (
  SELECT src, dst, min(d) AS md FROM walk
  WHERE src <> dst GROUP BY src, dst),
counts AS (
  SELECT src AS node,
       {counts}
  FROM md GROUP BY src)
SELECT node, {", ".join(f"n_d{i}" for i in range(1, REACH_K + 1))},
       round({expr}, 4) AS harmonic
FROM counts ORDER BY node
"""


ORACLE_EVENTS_HARMONIC_K = _oracle_harmonic()


# ------------------------------------------------------------ k-core
KCORE_K = 3
KCORE_ROUNDS = 8


def q_events_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-core of the undirected co-engagement graph (k=KCORE_K):
    the maximal subgraph where every vertex keeps degree >= k after
    repeatedly peeling lower-degree vertices — the standard
    dense-community pruning primitive (spam-ring/bot-cluster
    detection, graph sparsification before expensive analytics).

    Scale shape: ITERATIVE PEELING — each round is one degree
    aggregation (explode both endpoints, partial-agg count) plus two
    semi-joins filtering surviving edges; the edge set shrinks
    monotonically and is localCheckpoint'ed per round (linear
    lineage). Rounds are FIXED at KCORE_ROUNDS so both engines run the
    identical computation (the peeling converges in <= 3 rounds on
    this corpus — asserted by test — and a non-converged prefix is
    still bit-identical cross-engine); production would loop until an
    empty frontier with the same per-round plan. Output: each
    surviving node with its within-core degree."""
    und = (
        _chain_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = und
    for _ in range(KCORE_ROUNDS):
        deg = (
            edges.select(F.col("a").alias("node"))
            .unionByName(edges.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.where(F.col("d") >= KCORE_K).select("node")
        edges = (
            edges.join(keep.withColumnRenamed("node", "a"), "a", "semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("core_deg"))
        .orderBy("node")
    )


def _oracle_kcore() -> str:
    # every e{r+1} references e{r} three times (degree union + two IN
    # filters): without MATERIALIZED DuckDB inlines the chain 3^rounds
    # times and exhausts file handles re-opening the base parquet —
    # the same inlining trap the duplicate_clusters oracle documents
    ctes = []
    prev = "e0"
    for r in range(KCORE_ROUNDS):
        ctes.append(f"""d{r} AS (
  SELECT node, count(*) AS d FROM (
    SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
  GROUP BY node),
k{r} AS (SELECT node FROM d{r} WHERE d >= {KCORE_K}),
e{r + 1} AS MATERIALIZED (
  SELECT a, b FROM {prev}
  WHERE a IN (SELECT node FROM k{r}) AND b IN (SELECT node FROM k{r}))""")
        prev = f"e{r + 1}"
    chain = ",\n".join(ctes)
    return f"""
WITH {SQL_CHAIN_EDGES_CTES},
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges),
{chain}
SELECT node, count(*) AS core_deg FROM (
  SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
GROUP BY node ORDER BY node
"""


ORACLE_EVENTS_KCORE = _oracle_kcore()


# ------------------------------------------- label propagation (LPA)
LPA_ROUNDS = 4


def q_events_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan-
    Albert-Kumara 2007) over the undirected co-engagement graph:
    every node starts as its own label and, each round, adopts the
    most frequent label among its neighbors. Near-linear-time
    community structure — the cheap first cut before anything
    modularity-based, and the canonicalization fallback when the
    similarity graph is too dense for exact connected components.

    Determinism: vanilla LPA random-breaks ties; here ties go to the
    SMALLEST label (min of a (-count, label) struct — an integer
    argmin, shuffle-order-independent), and rounds are FIXED at
    LPA_ROUNDS so both engines run the identical computation (a
    non-converged prefix is still bit-identical cross-engine).

    Scale shape: each round is ONE equi-join (messages along mirrored
    edges) + two partial aggregations over fixed-width (long, long)
    rows — the canonical Pregel step as DataFrames. The mirrored edge
    set is localCheckpoint'ed once and every round's label table is
    checkpointed too (linear lineage; on a cluster: cached/bucketed
    tables). Label tables are node-sized, never edge-sized."""
    _half, _und, labels = _lpa_labels(spark, sf_dir)
    sizes = labels.groupBy("lab").agg(F.count("*").alias("comm_size"))
    return (
        labels.join(F.broadcast(sizes), "lab")
        .select("node", F.col("lab").alias("community"), "comm_size")
        .orderBy("node")
    )


def _lpa_labels(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared LPA machinery: returns (half, und, labels) where half is
    the canonical a<b undirected edge set, und its mirror (both
    localCheckpoint'ed — reused by every round AND by downstream
    community-metric queries without re-deriving the graph), and
    labels the node->lab table after LPA_ROUNDS fixed rounds."""
    half = (
        _chain_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    und = half.unionByName(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
    )
    for _ in range(LPA_ROUNDS):
        msgs = und.join(labels.withColumnRenamed("node", "a"), "a").select(
            F.col("b").alias("node"), "lab"
        )
        counts = msgs.groupBy("node", "lab").agg(F.count("*").alias("c"))
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"), F.col("lab").alias("lab")
                    )
                ).alias("m")
            )
            .select("node", F.col("m.lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
    return half, und, labels


def _lpa_chain_sql() -> tuple[str, str]:
    """(CTE prefix computing half/und/l0..lN, final label CTE name) —
    shared by the LPA oracle and the modularity oracle so both engines'
    label tables are the same computation by construction."""
    ctes = []
    prev = "l0"
    for r in range(1, LPA_ROUNDS + 1):
        ctes.append(f"""c{r} AS (
  SELECT u.b AS node, l.lab, count(*) AS c
  FROM und u JOIN {prev} l ON u.a = l.node GROUP BY 1, 2),
l{r} AS MATERIALIZED (
  SELECT node, lab FROM (
    SELECT node, lab,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
    FROM c{r}) WHERE rn = 1)""")
        prev = f"l{r}"
    chain = ",\n".join(ctes)
    prefix = f"""{SQL_CHAIN_EDGES_CTES},
half AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges),
und AS MATERIALIZED (
  SELECT a, b FROM half UNION ALL SELECT b, a FROM half),
l0 AS (SELECT DISTINCT a AS node, a AS lab FROM und),
{chain}"""
    return prefix, prev


def _oracle_label_prop() -> str:
    prefix, prev = _lpa_chain_sql()
    return f"""
WITH {prefix}
SELECT l.node, l.lab AS community, s.comm_size
FROM {prev} l
JOIN (SELECT lab, count(*) AS comm_size FROM {prev} GROUP BY lab) s
  USING (lab)
ORDER BY l.node
"""


ORACLE_EVENTS_LABEL_PROP = _oracle_label_prop()


QUERIES = {
    "events_pagerank": q_events_pagerank,
    "events_triangles": q_events_triangles,
    "docs_duplicate_clusters": q_docs_duplicate_clusters,
    "events_reach_k": q_events_reach_k,
    "events_harmonic_k": q_events_harmonic_k,
    "events_kcore": q_events_kcore,
    "events_label_prop": q_events_label_prop,
}
ORACLES = {
    "events_pagerank": ORACLE_EVENTS_PAGERANK,
    "events_triangles": ORACLE_EVENTS_TRIANGLES,
    "docs_duplicate_clusters": ORACLE_DOCS_DUPLICATE_CLUSTERS,
    "events_reach_k": ORACLE_EVENTS_REACH_K,
    "events_harmonic_k": ORACLE_EVENTS_HARMONIC_K,
    "events_kcore": ORACLE_EVENTS_KCORE,
    "events_label_prop": ORACLE_EVENTS_LABEL_PROP,
}


# --------------------------------------- personalized PageRank (PPR)
# Teleport-to-seed-set PageRank (Jeh-Widom 2003 scaled to MapReduce):
# identical fixed-point integer machinery to events_pagerank, but the
# (1-d) restart mass flows ONLY to a deterministic seed set — the
# relevance-to-these-entities primitive behind recommendation and
# entity-linking candidate ranking (rank entities by proximity to the
# query's seed mentions) rather than global importance. Seeds here:
# nodes with id % PPR_SEED_MOD == 0 (deterministic, spread across the
# id domain). Dangling mass drops, as in events_pagerank — the twin
# convention both engines share.
PPR_SEED_MOD = 7


def q_events_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the co-engagement graph, seeds =
    nodes with id % {PPR_SEED_MOD} == 0, ITERS fixed rounds in BIGINT
    micro-units (order-independent sums -> full value-hash parity).

    Scale shape: identical to events_pagerank — edge set
    localCheckpoint'ed once, ONE join + partial agg per iteration over
    node-sized rank tables, seed teleport is a map-side expression
    (no extra join; the seed test is arithmetic on the node id)."""
    edges = _chain_edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    is_seed = F.col("node") % PPR_SEED_MOD == 0
    ns_df = nodes.where(is_seed).agg(F.count("*").alias("ns"))
    ranks = nodes.crossJoin(F.broadcast(ns_df)).select(
        "node",
        F.when(is_seed, F.expr(f"CAST({SCALE} DIV ns AS BIGINT)"))
        .otherwise(F.lit(0).cast("long"))
        .alias("rank"),
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
            nodes.crossJoin(F.broadcast(ns_df))
            .join(sums, "node", "left")
            .select(
                "node",
                (
                    F.when(
                        is_seed,
                        F.expr(
                            f"CAST(({DAMP_DEN - DAMP_NUM} * {SCALE})"
                            f" DIV ({DAMP_DEN} * ns) AS BIGINT)"
                        ),
                    ).otherwise(F.lit(0).cast("long"))
                    + F.coalesce(F.col("s"), F.lit(0))
                )
                .cast("long")
                .alias("rank"),
            )
        )
    return ranks.select(
        "node", (F.col("node") % PPR_SEED_MOD == 0).alias("is_seed"), "rank"
    ).orderBy("node")


def _oracle_ppr() -> str:
    teleport = (
        f"CASE WHEN nodes.node % {PPR_SEED_MOD} = 0 THEN"
        f" (({DAMP_DEN - DAMP_NUM} * {SCALE}::BIGINT)"
        f" // ({DAMP_DEN} * ns)) ELSE 0 END"
    )
    iters = []
    prev = "r0"
    for i in range(1, ITERS + 1):
        iters.append(f"""
r{i} AS (
  SELECT nodes.node,
         CAST({teleport} + coalesce(c.s, 0) AS BIGINT) AS rank
  FROM nodes CROSS JOIN ns
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
WITH {SQL_CHAIN_EDGES_CTES},
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
ns AS (SELECT count(*) AS ns FROM nodes WHERE node % {PPR_SEED_MOD} = 0),
r0 AS (
  SELECT node,
         CAST(CASE WHEN node % {PPR_SEED_MOD} = 0
                   THEN {SCALE}::BIGINT // ns ELSE 0 END AS BIGINT) AS rank
  FROM nodes CROSS JOIN ns),{chain}
SELECT node, node % {PPR_SEED_MOD} = 0 AS is_seed, rank
FROM {prev} ORDER BY node
"""


ORACLE_EVENTS_PPR = _oracle_ppr()

QUERIES["events_ppr"] = q_events_ppr
ORACLES["events_ppr"] = ORACLE_EVENTS_PPR


# ------------------------------------------------- community modularity
# Newman-Girvan modularity of the LPA communities: per community c,
# Q_c = e_c/m - (d_c/2m)^2 where e_c = intra-community edges, d_c = sum
# of member degrees, m = |undirected edges|. The quality score that
# tells you whether a community structure (here: the canonicalized
# entity clusters a KG build emits) is real signal or partition noise
# — the acceptance gate before trusting LPA/CC output downstream.
#
# Determinism: e_c, d_c, m are INTEGERS (exact in any shuffle order);
# the only float math is the final per-row expression over those three
# integers, written token-identically in both engines, rounded to 6dp.
# The total Q = sum(q_contrib) is left to the READER (summing doubles
# cross-engine is fold-order-dependent; per-community rows are not).
def q_events_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community modularity contributions over the LPA communities.

    Scale shape: reuses the checkpointed LPA label table (node-sized);
    intra-edge counting is TWO equi-joins of the half-edge set against
    node-sized label tables + one partial agg keyed by community;
    degree sums are one agg over the mirrored edges + one node-sized
    join. m ships as a broadcast 1-row table. Nothing here is wider
    than the edge list itself."""
    half, und, labels = _lpa_labels(spark, sf_dir)
    m_df = half.agg(F.count("*").alias("m"))
    la = labels.withColumnRenamed("node", "a").withColumnRenamed("lab", "lab_a")
    lb = labels.withColumnRenamed("node", "b").withColumnRenamed("lab", "lab_b")
    intra = (
        half.join(la, "a")
        .join(lb, "b")
        .where(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("lab"))
        .agg(F.count("*").alias("intra_edges"))
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("d"))
    dsum = (
        deg.join(labels, "node")
        .groupBy("lab")
        .agg(F.sum("d").alias("deg_sum"), F.count("*").alias("n_nodes"))
    )
    return (
        dsum.join(intra, "lab", "left")
        .na.fill({"intra_edges": 0})
        .crossJoin(F.broadcast(m_df))
        .select(
            F.col("lab").alias("community"),
            "n_nodes",
            "intra_edges",
            "deg_sum",
            # + 0.0 after the round: IEEE addition maps -0.0 to +0.0 in
            # BOTH engines — without it a tiny negative contribution
            # rounds to DuckDB's -0.0 vs Spark's 0.0 and the value hash
            # diverges on numerically equal outputs (observed at sf0.1)
            (
                F.round(
                    F.col("intra_edges") * 1.0 / F.col("m")
                    - (F.col("deg_sum") * 1.0 / (2 * F.col("m")))
                    * (F.col("deg_sum") * 1.0 / (2 * F.col("m"))),
                    6,
                )
                + 0.0
            ).alias("q_contrib"),
        )
        .orderBy("community")
    )


def _oracle_modularity() -> str:
    prefix, prev = _lpa_chain_sql()
    return f"""
WITH {prefix},
m AS (SELECT count(*) AS m FROM half),
intra AS (
  SELECT la.lab, count(*) AS intra_edges
  FROM half h
  JOIN {prev} la ON h.a = la.node
  JOIN {prev} lb ON h.b = lb.node
  WHERE la.lab = lb.lab GROUP BY la.lab),
deg AS (SELECT a AS node, count(*) AS d FROM und GROUP BY a),
dsum AS (
  SELECT l.lab, CAST(sum(d.d) AS BIGINT) AS deg_sum, count(*) AS n_nodes
  FROM deg d JOIN {prev} l ON d.node = l.node GROUP BY l.lab)
SELECT s.lab AS community, s.n_nodes,
       coalesce(i.intra_edges, 0) AS intra_edges, s.deg_sum,
       round(coalesce(i.intra_edges, 0) * 1.0 / m.m
             - (s.deg_sum * 1.0 / (2 * m.m))
             * (s.deg_sum * 1.0 / (2 * m.m)), 6) + 0.0 AS q_contrib
FROM dsum s LEFT JOIN intra i ON s.lab = i.lab CROSS JOIN m
ORDER BY community
"""


ORACLE_EVENTS_MODULARITY = _oracle_modularity()

QUERIES["events_modularity"] = q_events_modularity
ORACLES["events_modularity"] = ORACLE_EVENTS_MODULARITY


# --------------------------------------------- degree assortativity
# Pearson correlation of endpoint degrees over the undirected edge
# list (Newman 2002, eq. 4 computed over the mirrored edge set so each
# edge contributes both orientations): r > 0 = hubs link to hubs
# (social graphs), r < 0 = hubs link to leaves (the fan-out shape KG
# similarity graphs usually have — a sanity diagnostic before
# community detection, and the skew early-warning for join planning:
# strongly negative r means hot hub keys).
#
# Determinism: every sum (S_jk, S_j, S_jj, M2) is an exact BIGINT; the
# correlation is ONE float expression over five integers, identical
# tokens both engines, rounded to 6dp. NULLIF guards the regular-graph
# degenerate case (zero variance).
def q_events_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row degree-assortativity summary of the co-engagement
    graph.

    Scale shape: one degree agg (node-sized), two equi-joins of the
    edge list against the node-sized degree table, one global partial
    agg to five integers — the whole statistic is a map-side-combined
    reduction; no window, no collect."""
    _half, und, _labels = _und_edges(spark, sf_dir)
    deg = und.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("d"))
    da = deg.withColumnRenamed("node", "a").withColumnRenamed("d", "da")
    db = deg.withColumnRenamed("node", "b").withColumnRenamed("d", "db")
    s = (
        und.join(da, "a")
        .join(db, "b")
        .agg(
            F.sum(F.col("da") * F.col("db")).alias("s_jk"),
            F.sum("da").alias("s_j"),
            F.sum(F.col("da") * F.col("da")).alias("s_jj"),
            F.count("*").alias("m2"),
        )
    )
    n_df = und.select("a").distinct().agg(F.count("*").alias("n_nodes"))
    return s.crossJoin(F.broadcast(n_df)).select(
        (F.col("m2") / 2).cast("long").alias("n_edges"),
        "n_nodes",
        F.round(
            (
                F.col("s_jk") * 1.0 / F.col("m2")
                - (F.col("s_j") * 1.0 / F.col("m2"))
                * (F.col("s_j") * 1.0 / F.col("m2"))
            )
            / F.nullif(
                F.col("s_jj") * 1.0 / F.col("m2")
                - (F.col("s_j") * 1.0 / F.col("m2"))
                * (F.col("s_j") * 1.0 / F.col("m2")),
                F.lit(0.0),
            ),
            6,
        ).alias("assortativity"),
    )


def _und_edges(spark: SparkSession, sf_dir: str):
    """(half, und, None) — the undirected edge sets without running
    LPA (assortativity needs no labels; skipping the rounds keeps the
    single-statistic query cheap)."""
    half = (
        _chain_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    und = half.unionByName(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    return half, und, None


ORACLE_EVENTS_ASSORTATIVITY = f"""
WITH {SQL_CHAIN_EDGES_CTES},
half AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges),
und AS (SELECT a, b FROM half UNION ALL SELECT b, a FROM half),
deg AS (SELECT a AS node, count(*) AS d FROM und GROUP BY a),
s AS (
  SELECT sum(da.d * db.d) AS s_jk, sum(da.d) AS s_j,
         sum(da.d * da.d) AS s_jj, count(*) AS m2
  FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node),
n AS (SELECT count(DISTINCT a) AS n_nodes FROM und)
SELECT CAST(m2 / 2 AS BIGINT) AS n_edges, n_nodes,
       round((s_jk * 1.0 / m2 - (s_j * 1.0 / m2) * (s_j * 1.0 / m2))
             / nullif(s_jj * 1.0 / m2 - (s_j * 1.0 / m2) * (s_j * 1.0 / m2),
                      0.0), 6) AS assortativity
FROM s CROSS JOIN n
"""

QUERIES["events_assortativity"] = q_events_assortativity
ORACLES["events_assortativity"] = ORACLE_EVENTS_ASSORTATIVITY


# --------------------------------------- time-respecting reachability
# Temporal K-hop reachability (Holme-Saramäki temporal-network
# semantics): a path is valid only if edge times are NON-DECREASING
# along it — "who could information from the seeds have reached,
# given when each interaction actually happened". The static reach
# census (events_reach_k) overcounts: an edge that fired BEFORE the
# infection arrived cannot forward it. Temporal edges: per item, the
# first-touch sequence ordered by (first_ts, user_id); consecutive
# touchers u_i -> u_{i+1} with edge time = u_{i+1}'s first touch
# (micros). Seeds = user_id % 13 == 0, active from t=0.
#
# Determinism: arrival times are INTEGER microseconds and each round
# takes a per-node min — order-independent; rounds fixed at
# TEMPORAL_HOPS so both engines run the identical computation.
#
# Scale shape: the frontier relaxation is one equi-join (edges x
# node-sized arrival table, time predicate in the join condition) +
# one min partial agg per round, over a localCheckpoint'ed edge set —
# the Bellman-Ford round shape, linear lineage, arrival table
# node-sized.
TEMPORAL_HOPS = 3
TEMPORAL_SEED_MOD = 13


def _temporal_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    item = F.get_json_object("props", "$.k").cast("long")
    touched = (
        ev.select(
            item.alias("item"),
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .groupBy("item", "user_id")
        .agg(F.min("us").alias("t"))
    )
    chains = touched.groupBy("item").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("t"), F.col("user_id")))
        ).alias("us")
    )
    pair_idx = F.when(
        F.size("us") > 1, F.sequence(F.lit(1), F.size("us") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        chains.select(
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at("us", i)["user_id"].alias("src"),
                        F.element_at("us", i + 1)["user_id"].alias("dst"),
                        F.element_at("us", i + 1)["t"].alias("t"),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst", "e.t")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def q_events_temporal_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _temporal_edges(spark, sf_dir).localCheckpoint(eager=True)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % TEMPORAL_SEED_MOD == 0)
        .select("node", F.lit(0).cast("long").alias("arr"))
    )
    arrival = seeds
    for _ in range(TEMPORAL_HOPS):
        relax = (
            edges.join(arrival.withColumnRenamed("node", "src"), "src")
            .where(F.col("t") >= F.col("arr"))
            .select(F.col("dst").alias("node"), F.col("t").alias("arr"))
        )
        arrival = (
            arrival.unionByName(relax)
            .groupBy("node")
            .agg(F.min("arr").alias("arr"))
            .localCheckpoint(eager=True)
        )
    return arrival.select(
        "node",
        (F.col("node") % TEMPORAL_SEED_MOD == 0).alias("is_seed"),
        F.col("arr").alias("first_reach_us"),
    ).orderBy("node")


def _oracle_temporal_reach() -> str:
    ctes = []
    prev = "a0"
    for r in range(1, TEMPORAL_HOPS + 1):
        ctes.append(f"""a{r} AS MATERIALIZED (
  SELECT node, min(arr) AS arr FROM (
    SELECT node, arr FROM {prev}
    UNION ALL
    SELECT e.dst AS node, e.t AS arr
    FROM tedges e JOIN {prev} p ON e.src = p.node AND e.t >= p.arr)
  GROUP BY node)""")
        prev = f"a{r}"
    chain = ",\n".join(ctes)
    return f"""
WITH touched AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         user_id, min(epoch_us(ts)) AS t
  FROM events GROUP BY 1, 2),
ord AS (
  SELECT item, user_id, t,
         row_number() OVER (PARTITION BY item ORDER BY t, user_id) AS rn
  FROM touched),
tedges AS MATERIALIZED (
  SELECT DISTINCT a.user_id AS src, b.user_id AS dst, b.t AS t
  FROM ord a JOIN ord b ON a.item = b.item AND b.rn = a.rn + 1
  WHERE a.user_id <> b.user_id),
nodes AS (SELECT src AS node FROM tedges UNION SELECT dst FROM tedges),
a0 AS (
  SELECT node, CAST(0 AS BIGINT) AS arr FROM nodes
  WHERE node % {TEMPORAL_SEED_MOD} = 0),
{chain}
SELECT node, node % {TEMPORAL_SEED_MOD} = 0 AS is_seed,
       arr AS first_reach_us
FROM {prev} ORDER BY node
"""


ORACLE_EVENTS_TEMPORAL_REACH = _oracle_temporal_reach()

QUERIES["events_temporal_reach"] = q_events_temporal_reach
ORACLES["events_temporal_reach"] = ORACLE_EVENTS_TEMPORAL_REACH


# ------------------------------------------------------ link prediction
# Resource-allocation link prediction (Zhou-Lü-Zhang 2009): for every
# non-adjacent pair (u, v) sharing >= 2 common neighbors, score
# RA(u,v) = sum over common neighbors z of 1/deg(z). RA is chosen over
# Adamic-Adar deliberately: AA's 1/ln(deg) would put a libm log() on
# the cross-engine comparison path (JVM Math.log and DuckDB's C log
# may disagree in the last ulp), while RA's 1/deg stays in EXACT
# fixed-point integer arithmetic (RA_SCALE DIV deg, order-independent
# BIGINT sums) — the same determinism discipline as pagerank.
#
# Hub suppression: wedge apexes with deg > LP_APEX_CAP are excluded
# (mirrored in the oracle). Standard practice — a hub's RA weight is
# ~0 and its deg^2 wedge fan-out is exactly the skew a 100-TB run
# cannot afford; the cap bounds per-apex pair generation the same way
# degree orientation bounds the triangle wedge join.
#
# Scale shape: one wedge equi-join on the apex (bounded by the cap),
# one partial-agg sum over fixed-width keys, one anti-join against the
# (canonical, a<b) edge set, one hash join to attach endpoint degrees.
RA_SCALE = 10**9
LP_APEX_CAP = 64
LP_MIN_CN = 2


def q_events_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    half, und, _ = _und_edges(spark, sf_dir)
    deg = und.groupBy("a").agg(F.count("*").alias("d"))
    # apex view: z adjacent u, with z's degree in [MIN_CN, CAP]
    apex = (
        und.join(deg.where(
            (F.col("d") >= LP_MIN_CN) & (F.col("d") <= LP_APEX_CAP)
        ), "a")
        .select(F.col("a").alias("z"), F.col("b").alias("u"), "d")
    )
    wedges = apex.join(
        apex.select("z", F.col("u").alias("v")), "z"
    ).where(F.col("u") < F.col("v"))
    scored = wedges.groupBy("u", "v").agg(
        F.count("*").alias("common_neighbors"),
        F.sum(F.expr(f"CAST({RA_SCALE} DIV d AS BIGINT)")).alias("ra_fp"),
    )
    nonadj = scored.join(
        half.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    return (
        nonadj.where(F.col("common_neighbors") >= LP_MIN_CN)
        .select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            "common_neighbors",
            "ra_fp",
        )
        .orderBy("src", "dst")
    )


ORACLE_EVENTS_LINK_PREDICTION = f"""
WITH {SQL_CHAIN_EDGES_CTES},
half AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges),
und AS (SELECT a, b FROM half UNION ALL SELECT b, a FROM half),
deg AS (SELECT a AS node, count(*) AS d FROM und GROUP BY a),
apex AS (
  SELECT u.a AS z, u.b AS u, deg.d
  FROM und u JOIN deg ON u.a = deg.node
  WHERE deg.d BETWEEN {LP_MIN_CN} AND {LP_APEX_CAP}),
wedge AS (
  SELECT x.u AS u, y.u AS v, x.d
  FROM apex x JOIN apex y ON x.z = y.z AND x.u < y.u),
scored AS (
  SELECT u, v, count(*) AS common_neighbors,
         CAST(sum({RA_SCALE}::BIGINT // d) AS BIGINT) AS ra_fp
  FROM wedge GROUP BY u, v)
SELECT s.u AS src, s.v AS dst, s.common_neighbors, s.ra_fp
FROM scored s
WHERE NOT EXISTS (
  SELECT 1 FROM half h WHERE h.a = s.u AND h.b = s.v)
  AND s.common_neighbors >= {LP_MIN_CN}
ORDER BY src, dst
"""

QUERIES["events_link_prediction"] = q_events_link_prediction
ORACLES["events_link_prediction"] = ORACLE_EVENTS_LINK_PREDICTION


# --------------------------------------------------- weighted SSSP
# Multi-seed weighted shortest paths (Bellman-Ford rounds) over the
# co-engagement graph with TIE-STRENGTH weights: an edge crossed by
# cnt co-engagement items has length W_SCALE DIV cnt ("stronger ties
# are shorter") — the social-distance metric behind influence radii
# and weighted-closeness features. Distinct from events_reach_k (hop
# counts) and events_temporal_reach (time-respecting): here the
# relaxation minimizes an additive INTEGER path length.
#
# Determinism: weights and distances are exact integers; each round
# takes a per-node min (order-independent); rounds fixed at
# SSSP_ROUNDS so both engines run the identical computation whether
# or not the relaxation has converged.
#
# Scale shape: identical to temporal reach — per round ONE equi-join
# (edges x node-sized distance table) + one min partial agg behind a
# localCheckpoint; the weighted edge build is one count aggregation
# over the pre-distinct pair stream (the same shuffle _chain_edges
# already pays).
W_SCALE = 10**6
SSSP_ROUNDS = 4
SSSP_SEED_MOD = 17


def _weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-engagement edges with per-pair item counts:
    (a, b, w) both directions, w = W_SCALE DIV cnt."""
    ev = load_table(spark, sf_dir, "events")
    item = F.get_json_object("props", "$.k").cast("long")
    touched = ev.select(item.alias("item"), "user_id").distinct()
    chains = touched.groupBy("item").agg(
        F.sort_array(F.collect_list("user_id")).alias("us")
    )
    pair_idx = F.when(
        F.size("us") > 1, F.sequence(F.lit(1), F.size("us") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = (
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
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
        .select(
            "src", "dst",
            F.expr(f"CAST({W_SCALE} DIV cnt AS BIGINT)").alias("w"),
        )
    )
    return pairs.unionByName(
        pairs.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )


def q_events_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _weighted_edges(spark, sf_dir).localCheckpoint(eager=True)
    dist = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % SSSP_SEED_MOD == 0)
        .select("node", F.lit(0).cast("long").alias("dist"))
    )
    for _ in range(SSSP_ROUNDS):
        relax = (
            edges.join(dist.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).cast("long").alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist.select(
        "node",
        (F.col("node") % SSSP_SEED_MOD == 0).alias("is_seed"),
        "dist",
    ).orderBy("node")


# weighted-edge CTEs shared by the SSSP oracle
SQL_WEIGHTED_EDGES_CTES = f"""touched AS (
  SELECT DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         user_id
  FROM events),
ord AS (
  SELECT item, user_id,
         row_number() OVER (PARTITION BY item ORDER BY user_id) AS rn
  FROM touched),
halfw AS (
  SELECT a.user_id AS src, b.user_id AS dst,
         CAST({W_SCALE} // count(*) AS BIGINT) AS w
  FROM ord a JOIN ord b ON a.item = b.item AND b.rn = a.rn + 1
  WHERE a.user_id <> b.user_id
  GROUP BY 1, 2),
wedges AS (
  SELECT src, dst, w FROM halfw
  UNION ALL SELECT dst, src, w FROM halfw)"""


def _oracle_sssp() -> str:
    ctes = []
    prev = "d0"
    for r in range(1, SSSP_ROUNDS + 1):
        ctes.append(f"""d{r} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS node, p.dist + e.w AS dist
    FROM wedges e JOIN {prev} p ON e.src = p.node)
  GROUP BY node)""")
        prev = f"d{r}"
    chain = ",\n".join(ctes)
    return f"""
WITH {SQL_WEIGHTED_EDGES_CTES},
nodes AS (SELECT src AS node FROM wedges UNION SELECT dst FROM wedges),
d0 AS (
  SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
  WHERE node % {SSSP_SEED_MOD} = 0),
{chain}
SELECT node, node % {SSSP_SEED_MOD} = 0 AS is_seed, dist
FROM {prev} ORDER BY node
"""


ORACLE_EVENTS_SSSP = _oracle_sssp()

QUERIES["events_sssp"] = q_events_sssp
ORACLES["events_sssp"] = ORACLE_EVENTS_SSSP


# ---------------------------------------------------------- HITS
# Kleinberg hubs & authorities (HITS 1999) over the DIRECTED
# co-engagement chain graph, in normalized fixed-point integer
# arithmetic: per iteration h(u) = Σ a(v) over out-edges, a(v) = Σ
# h(u) over in-edges, each rescaled to a total mass of HITS_SCALE via
# integer division (x * SCALE DIV total — the L1 normalization the
# power iteration needs to converge, kept exact so BIGINT sums stay
# order-independent and the oracle matches on the full value hash).
#
# Bit budget: values are <= SCALE (1e6) after each rescale, raw sums
# <= deg_max * SCALE (~1e10 at tested scales), and the rescale
# multiplication <= 1e10 * 1e6 = 1e16 — three orders inside BIGINT.
# (SCALE=1e12 would overflow here, which is why HITS uses its own
# scale rather than the PageRank one.)
#
# Scale shape: per iteration TWO join+agg rounds over the
# checkpointed edge set plus one single-row total broadcast each —
# the canonical power-iteration plan, linear lineage.
HITS_SCALE = 10**6
HITS_ITERS = 5


def q_events_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _chain_edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    auth = nodes.select("node", F.lit(HITS_SCALE).cast("long").alias("a"))

    def rescale(df: DataFrame, col: str) -> DataFrame:
        total = df.agg(F.sum(col).alias("_t"))
        return df.crossJoin(F.broadcast(total)).select(
            "node",
            F.expr(f"CAST({col} * {HITS_SCALE} DIV _t AS BIGINT)").alias(col),
        )

    for _ in range(HITS_ITERS):
        h_raw = (
            edges.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        hub = rescale(
            nodes.join(h_raw, "node", "left").select(
                "node", F.coalesce("h", F.lit(0)).cast("long").alias("h")
            ),
            "h",
        )
        a_raw = (
            edges.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        auth = rescale(
            nodes.join(a_raw, "node", "left").select(
                "node", F.coalesce("a", F.lit(0)).cast("long").alias("a")
            ),
            "a",
        ).localCheckpoint(eager=True)
        hub = hub.localCheckpoint(eager=True)
        last_hub = hub
    return (
        nodes.join(last_hub, "node")
        .join(auth, "node")
        .select("node", F.col("h").alias("hub_fp"), F.col("a").alias("auth_fp"))
        .orderBy("node")
    )


def _oracle_hits() -> str:
    ctes = []
    prev_a = "a0"
    for i in range(1, HITS_ITERS + 1):
        ctes.append(f"""hraw{i} AS (
  SELECT nodes.node, CAST(coalesce(s.h, 0) AS BIGINT) AS h
  FROM nodes LEFT JOIN (
    SELECT e.src AS node, sum(p.a) AS h
    FROM edges e JOIN {prev_a} p ON e.dst = p.node
    GROUP BY e.src) s ON nodes.node = s.node),
h{i} AS MATERIALIZED (
  SELECT node,
         CAST(h * {HITS_SCALE} // (SELECT sum(h) FROM hraw{i}) AS BIGINT)
           AS h
  FROM hraw{i}),
araw{i} AS (
  SELECT nodes.node, CAST(coalesce(s.a, 0) AS BIGINT) AS a
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, sum(p.h) AS a
    FROM edges e JOIN h{i} p ON e.src = p.node
    GROUP BY e.dst) s ON nodes.node = s.node),
a{i} AS MATERIALIZED (
  SELECT node,
         CAST(a * {HITS_SCALE} // (SELECT sum(a) FROM araw{i}) AS BIGINT)
           AS a
  FROM araw{i})""")
        prev_a = f"a{i}"
    chain = ",\n".join(ctes)
    return f"""
WITH {SQL_CHAIN_EDGES_CTES},
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
a0 AS (SELECT node, CAST({HITS_SCALE} AS BIGINT) AS a FROM nodes),
{chain}
SELECT n.node, h.h AS hub_fp, a.a AS auth_fp
FROM nodes n
JOIN h{HITS_ITERS} h ON n.node = h.node
JOIN a{HITS_ITERS} a ON n.node = a.node
ORDER BY n.node
"""


ORACLE_EVENTS_HITS = _oracle_hits()

QUERIES["events_hits"] = q_events_hits
ORACLES["events_hits"] = ORACLE_EVENTS_HITS


# ---------------------------------------------------------- k-truss
# K-truss decomposition (Cohen 2008): the maximal subgraph where every
# EDGE participates in >= K_TRUSS-2 triangles — the community-core
# primitive strictly stronger than k-core (a k-truss is always inside
# a (k-1)-core, never vice versa; it is the standard spam-ring /
# cohesive-subgroup extraction when vertex degree alone is too weak a
# signal). TRUSS_ROUNDS fixed peel rounds: each round computes
# per-edge triangle support and drops every under-supported edge
# SIMULTANEOUSLY (distributed formulation; converges to the textbook
# sequential peel's fixed point). Output: surviving edges with the
# support that justified keeping them in the final round.
#
# Scale shape: per round the support computation is the SAME
# degree-orientation wedge join events_triangles uses (out-neighborhood
# bounded by O(sqrt(m)) regardless of hub degree), each triangle
# emitted once and exploded to its three canonical edges for one
# partial-agg count; the shrinking edge set is localCheckpoint'ed per
# round. The oracle unrolls the identical rounds with the id-ordered
# 3-way join (fine at oracle scale, hot-vertex-quadratic at corpus
# scale — the orientation is the Spark-side answer to that).
K_TRUSS = 4
TRUSS_ROUNDS = 3


def _edge_support(half: DataFrame) -> DataFrame:
    """Per-edge triangle support over a canonical (a<b) edge set, via
    degree orientation — each triangle counted once."""
    deg = (
        half.select(F.col("a").alias("node"))
        .unionByName(half.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    withdeg = half.join(
        deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a"
    ).join(
        deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b"
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    e1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = e1.join(e2, "u").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, ["x", "y"], "left_semi").select("u", "x", "y")
    tri_edges = tris.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("u", "x").alias("a"), F.greatest("u", "x").alias("b")
                ),
                F.struct(
                    F.least("u", "y").alias("a"), F.greatest("u", "y").alias("b")
                ),
                F.struct(
                    F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
                ),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return tri_edges.groupBy("a", "b").agg(F.count("*").alias("support"))


def q_events_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    half = (
        _chain_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = half
    sup = None
    for _ in range(TRUSS_ROUNDS):
        bare = edges.select("a", "b")
        sup = _edge_support(bare)
        edges = (
            bare.join(sup, ["a", "b"])
            .where(F.col("support") >= K_TRUSS - 2)
            .localCheckpoint(eager=True)
        )
    return edges.orderBy("a", "b")


def _oracle_ktruss() -> str:
    ctes = []
    prev = "t0"
    for r in range(1, TRUSS_ROUNDS + 1):
        ctes.append(f"""tri{r} AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM {prev} e1
  JOIN {prev} e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN {prev} e3 ON e3.a = e1.b AND e3.b = e2.b),
sup{r} AS (
  SELECT a, b, count(*) AS support FROM (
    SELECT x AS a, y AS b FROM tri{r}
    UNION ALL SELECT x, z FROM tri{r}
    UNION ALL SELECT y, z FROM tri{r})
  GROUP BY a, b),
t{r} AS MATERIALIZED (
  SELECT e.a, e.b, s.support
  FROM {prev} e JOIN sup{r} s ON e.a = s.a AND e.b = s.b
  WHERE s.support >= {K_TRUSS - 2})""")
        prev = f"t{r}"
    chain = ",\n".join(ctes)
    return f"""
WITH {SQL_CHAIN_EDGES_CTES},
t0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges),
{chain}
SELECT a, b, support FROM {prev} ORDER BY a, b
"""


ORACLE_EVENTS_KTRUSS = _oracle_ktruss()

QUERIES["events_ktruss"] = q_events_ktruss
ORACLES["events_ktruss"] = ORACLE_EVENTS_KTRUSS


# --------------------------------------------------- random-walk corpus
# Deterministic random-walk generation over the co-engagement graph —
# the walk-corpus step of DeepWalk/node2vec-style graph embedding
# training. One walk starts at every node with out-edges; at step t the
# walk at node c moves to the j-th neighbor (neighbors ranked by dst
# id) where j = 1 + H(walk_id, t) mod outdeg(c) and H is a 48-bit
# md5-prefix integer — a hash-seeded "random" choice that is
# REPRODUCIBLE at any parallelism (the same no-rand() argument as
# docs_stratified_sample) and expressible identically in both engines
# (Spark conv(hex,16,10) == DuckDB '0x'||hex cast). Dead ends yield
# NULL tail steps, preserved in the output shape.
#
# Scale shape: the adjacency table (src, dst, j, outdeg) is built with
# ONE src-partitioned window, then each step is ONE equi-join on the
# current node (the j/outdeg selection is a residual filter on the
# joined row, not a second shuffle). WALK_STEPS fixed joins = linear
# lineage, the PageRank discipline. At 100x the walk table and the
# adjacency shuffle both stay |nodes|-bounded.
WALK_STEPS = 4
_WALK_SALT = "walk7"


def _walk_hash_spark(walk_col: str, step: int) -> str:
    return (
        f"CAST(conv(substr(md5(concat_ws(':', '{_WALK_SALT}',"
        f" CAST({walk_col} AS STRING), '{step}')), 1, 12), 16, 10)"
        " AS BIGINT)"
    )


def _walk_hash_sql(walk_col: str, step: int) -> str:
    return (
        f"('0x' || substr(md5(concat_ws(':', '{_WALK_SALT}',"
        f" {walk_col}::VARCHAR, '{step}')), 1, 12))::BIGINT"
    )


def q_events_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    edges = _chain_edges(spark, sf_dir)
    w = Window.partitionBy("src").orderBy("dst")
    adj = edges.select(
        "src",
        "dst",
        F.row_number().over(w).alias("j"),
        F.count("*").over(Window.partitionBy("src")).alias("outdeg"),
    ).localCheckpoint(eager=False)
    state = adj.select(F.col("src").alias("walk_id")).distinct().select(
        "walk_id", F.col("walk_id").alias("cur")
    )
    cols = ["walk_id", F.col("cur").alias("step0")]
    out = state.select(*cols)
    for t in range(1, WALK_STEPS + 1):
        a = adj.select(
            F.col("src").alias("_s"),
            F.col("dst").alias("_d"),
            "j",
            "outdeg",
        )
        pick = (
            out.join(a, F.col(f"step{t-1}") == F.col("_s"), "left")
            .where(
                F.col("_s").isNull()
                | (
                    F.col("j")
                    == 1
                    + F.expr(_walk_hash_spark("walk_id", t)) % F.col("outdeg")
                )
            )
            .drop("_s", "j", "outdeg")
            .withColumnRenamed("_d", f"step{t}")
        )
        out = pick
    return out.orderBy("walk_id")


def _oracle_random_walks() -> str:
    steps = []
    prev = "s0"
    for t in range(1, WALK_STEPS + 1):
        h = _walk_hash_sql(f"{prev}.walk_id", t)
        carry = ", ".join(
            [f"{prev}.walk_id"] + [f"{prev}.step{k}" for k in range(t)]
        )
        steps.append(f"""
s{t} AS (
  SELECT {carry}, a.dst AS step{t}
  FROM {prev}
  LEFT JOIN adj a
    ON a.src = {prev}.step{t-1}
   AND a.j = 1 + {h} % a.outdeg)""")
        prev = f"s{t}"
    chain = ",".join(steps)
    cols = ", ".join(["walk_id", "step0"] + [f"step{t}" for t in range(1, WALK_STEPS + 1)])
    return f"""
WITH {SQL_CHAIN_EDGES_CTES},
adj AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) AS j,
         count(*) OVER (PARTITION BY src) AS outdeg
  FROM edges),
s0 AS (
  SELECT DISTINCT src AS walk_id, src AS step0 FROM adj),{chain}
SELECT {cols} FROM {prev} ORDER BY walk_id
"""


ORACLE_EVENTS_RANDOM_WALKS = _oracle_random_walks()

QUERIES["events_random_walks"] = q_events_random_walks
ORACLES["events_random_walks"] = ORACLE_EVENTS_RANDOM_WALKS


# ---------------------------------------------- clustering coefficient
# Per-node LOCAL clustering coefficient over the undirected
# co-engagement graph — Watts-Strogatz neighborhood density, the
# per-vertex refinement of the global triangle census (how close each
# user's neighborhood is to a clique; the standard community-tightness
# / spam-farm signal). lcc = 2·tri(v) / (deg(v)·(deg(v)−1)) emitted in
# EXACT integer ppm; nodes with deg < 2 are excluded (undefined),
# triangle-free nodes report 0.
#
# Scale shape: the triangle census is the degree-oriented wedge join
# of q_events_triangles (out-neighborhoods O(sqrt m) on power-law
# graphs); degrees are one partial agg over the undirected edge set;
# the finish is one left join of two node-sized tables. The edge set
# is derived twice here (census + degrees) — at 100 TB you'd persist
# `und` once; both derivations ride the same checkpointed lineage.
def q_events_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = (
        _chain_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .where(F.col("deg") >= 2)
    )
    census = q_events_triangles(spark, sf_dir)
    return (
        deg.join(census, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.expr(
                "CAST(2 * coalesce(n_triangles, 0) * 1000000"
                " DIV (deg * (deg - 1)) AS BIGINT)"
            ).alias("lcc_ppm"),
        )
        .orderBy("node")
    )


ORACLE_EVENTS_LCC = f"""
WITH {SQL_CHAIN_EDGES_CTES},
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und)
  GROUP BY node HAVING count(*) >= 2),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
census AS (
  SELECT node, count(*) AS n_triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri)
  GROUP BY node)
SELECT d.node, d.deg,
       coalesce(c.n_triangles, 0) AS n_triangles,
       CAST(2 * coalesce(c.n_triangles, 0) * 1000000
            // (d.deg * (d.deg - 1)) AS BIGINT) AS lcc_ppm
FROM deg d LEFT JOIN census c ON d.node = c.node
ORDER BY d.node
"""

QUERIES["events_lcc"] = q_events_lcc
ORACLES["events_lcc"] = ORACLE_EVENTS_LCC


# ------------------------------------------------------- HyperBall ANF
# Per-node 2-hop neighborhood-size estimate via register propagation
# (Boldi-Rosa-Vigna HyperBall / the approximate-neighborhood-function
# sketch). events_reach_k computes the EXACT bounded ball with a
# (node, reached) pair table — correct, but the pair table is the
# quadratic object that dies on dense 100-TB graphs. HyperBall keeps
# per-node HLL REGISTERS instead (|V| x 256 bounded state) and closes
# one hop per round by register-wise max over out-neighbors:
#   regs_{t+1}(v) = regs_t(v) ∨ max over v->w of regs_t(w)
# Two rounds here = ball(v, 2) = {v} ∪ N(v) ∪ N²(v). Shares the exact
# md5-60 / integer-rho / scaled-harmonic-sum construction with
# docs_hll_distinct, so both engines agree bit-for-bit on registers
# and the float estimate is one identical expression. The exact ball
# count rides along as the audit (it re-builds the pair table — the
# thing the sketch DELETES at scale).
HB_ROUNDS = 2


def q_events_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deja_view_spark.queries_corpus import (
        HLL_M,
        HLL_P,
        HLL_W,
        _HLL_LC_CUT,
        _HLL_NUM,
        _hll_rho,
    )

    edges = _chain_edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hb|"), F.col("node").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    regs = nodes.select(
        "node",
        (h % HLL_M).alias("reg"),
        _hll_rho(F.shiftright(h, HLL_P)).alias("rho"),
    ).localCheckpoint(eager=True)
    for _ in range(HB_ROUNDS):
        via = (
            edges.join(
                regs.withColumnRenamed("node", "dst"), "dst"
            ).select(F.col("src").alias("node"), "reg", "rho")
        )
        regs = (
            regs.unionByName(via)
            .groupBy("node", "reg")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True)
        )
    agg = regs.groupBy("node").agg(
        F.count("*").alias("cnt"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_W + 1} - rho)")).alias("s_hit"),
    )
    zero = HLL_M - F.col("cnt")
    s_int = F.col("s_hit") + zero.cast("long") * F.lit(1 << (HLL_W + 1))
    raw = F.lit(_HLL_NUM) / s_int.cast("double")
    est = F.when(
        (raw <= F.lit(_HLL_LC_CUT)) & (zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zero.cast("double")),
    ).otherwise(raw)
    # exact audit: the bounded pair table the sketch replaces
    b1 = nodes.select(F.col("node"), F.col("node").alias("x")).unionByName(
        edges.select(F.col("src").alias("node"), F.col("dst").alias("x"))
    )
    b2 = b1.unionByName(
        b1.join(edges.withColumnRenamed("src", "x"), "x").select(
            "node", F.col("dst").alias("x")
        )
    ).distinct()
    exact = b2.groupBy("node").agg(F.count("*").alias("exact_ball2"))
    return (
        agg.join(exact, "node")
        .select(
            "node",
            F.col("cnt").cast("int").alias("registers_hit"),
            F.round(est, 4).alias("ball2_est"),
            "exact_ball2",
            F.round(
                (est - F.col("exact_ball2")) / F.col("exact_ball2") * 100, 4
            ).alias("rel_err_pct"),
        )
        .orderBy("node")
    )


def _oracle_hyperball() -> str:
    from deja_view_spark.queries_corpus import (
        HLL_M,
        HLL_W,
        _HLL_LC_CUT,
        _HLL_NUM,
        _sql_hex60,
    )

    whens = " ".join(
        f"WHEN v >= {1 << k} THEN {HLL_W - k}"
        for k in range(HLL_W - 1, -1, -1)
    )
    rounds = []
    prev = "regs0"
    for t in range(1, HB_ROUNDS + 1):
        rounds.append(f"""
regs{t} AS (
  SELECT node, reg, max(rho) AS rho FROM (
    SELECT node, reg, rho FROM {prev}
    UNION ALL
    SELECT e.src AS node, r.reg, r.rho
    FROM edges e JOIN {prev} r ON r.node = e.dst)
  GROUP BY node, reg)""")
        prev = f"regs{t}"
    chain = ",".join(rounds)
    return f"""
WITH {SQL_CHAIN_EDGES_CTES},
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
hx AS (
  SELECT node,
         {_sql_hex60("md5('hb|' || CAST(node AS VARCHAR))")} AS h
  FROM nodes),
regs0 AS (
  SELECT node, h % {HLL_M} AS reg,
         CASE {whens.replace('v >=', f'(h // {HLL_M}) >=')}
              ELSE {HLL_W + 1} END AS rho
  FROM hx),{chain},
agg AS (
  SELECT node, count(*) AS cnt,
         sum(1::BIGINT << ({HLL_W + 1} - rho)) AS s_hit
  FROM {prev} GROUP BY node),
b1 AS (
  SELECT node, node AS x FROM nodes
  UNION SELECT src AS node, dst AS x FROM edges),
b2 AS (
  SELECT DISTINCT node, x FROM (
    SELECT node, x FROM b1
    UNION ALL
    SELECT b1.node, e.dst AS x FROM b1 JOIN edges e ON e.src = b1.x)),
exact AS (SELECT node, count(*) AS exact_ball2 FROM b2 GROUP BY node),
fin AS (
  SELECT node, cnt, {HLL_M} - cnt AS vz,
         {_HLL_NUM!r} / CAST(s_hit + ({HLL_M} - cnt)
                             * (1::BIGINT << {HLL_W + 1}) AS DOUBLE) AS raw
  FROM agg),
est AS (
  SELECT node, cnt, vz,
         CASE WHEN raw <= {_HLL_LC_CUT!r} AND vz > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(vz AS DOUBLE))
              ELSE raw END AS e
  FROM fin)
SELECT est.node, CAST(cnt AS INT) AS registers_hit,
       round(e, 4) AS ball2_est, exact.exact_ball2,
       round((e - exact.exact_ball2) / exact.exact_ball2 * 100, 4)
         AS rel_err_pct
FROM est JOIN exact ON est.node = exact.node
ORDER BY est.node
"""


ORACLE_EVENTS_HYPERBALL = _oracle_hyperball()

QUERIES["events_hyperball"] = q_events_hyperball
ORACLES["events_hyperball"] = ORACLE_EVENTS_HYPERBALL


# --------------------------------------------- negative edge sampling
# Deterministic negative sampling over the co-engagement graph — the
# training-pair generator that complements events_random_walks (walks
# give positives, this gives the non-edges a link-prediction / KG-
# embedding loss contrasts against). Per out-node, NEG_TRIES hash-
# seeded candidate ids (md5-prefix mod (max_id+1), the stratified-
# sample no-rand() discipline); a candidate survives if it is a real
# node (semi-join), not the source itself, and not an UNDIRECTED
# neighbor (anti-join on the canonical pair — a reversed edge is
# still a positive). Variable survivor counts per node are the
# documented semantics (rejection sampling reports what it rejected:
# try_idx is kept so the consumer can take the first k survivors).
#
# Scale shape: candidate generation is a map-side explode (|V| x
# NEG_TRIES rows); the validity checks are one broadcastable
# node-set semi-join and one anti-join against the edge set on its
# natural key. No pair table beyond the candidate explode.
NEG_TRIES = 8
_NEG_SALT = "neg5"


def q_events_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _chain_edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    mx = nodes.agg(F.max("node").alias("mx"))
    cands = (
        edges.select("src")
        .distinct()
        .crossJoin(F.broadcast(mx))
        .select(
            "src",
            F.explode(F.sequence(F.lit(0), F.lit(NEG_TRIES - 1))).alias(
                "try_idx"
            ),
            "mx",
        )
        .select(
            "src",
            "try_idx",
            F.expr(
                f"CAST(conv(substr(md5(concat_ws('|', '{_NEG_SALT}',"
                f" CAST(src AS STRING), CAST(try_idx AS STRING))), 1, 12),"
                f" 16, 10) AS BIGINT) % (mx + 1)"
            ).alias("cand"),
        )
        .where(F.col("cand") != F.col("src"))
    )
    valid = cands.join(
        nodes.withColumnRenamed("node", "cand"), "cand", "left_semi"
    )
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    survivors = valid.join(
        und,
        (F.least("src", "cand") == und.a) & (F.greatest("src", "cand") == und.b),
        "left_anti",
    )
    return survivors.select("src", "try_idx", F.col("cand").alias("neg_dst")).orderBy(
        "src", "try_idx"
    )


ORACLE_EVENTS_NEGATIVE_SAMPLES = f"""
WITH {SQL_CHAIN_EDGES_CTES},
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
mx AS (SELECT max(node) AS mx FROM nodes),
srcs AS (SELECT DISTINCT src FROM edges),
cands AS (
  -- table-function generate_series: the unnest-in-SELECT form trips
  -- a DuckDB 1.x internal binder error once joined downstream
  SELECT src, g.try_idx, mx
  FROM srcs CROSS JOIN mx
  CROSS JOIN generate_series(0, {NEG_TRIES - 1}) AS g(try_idx)),
hashed AS (
  SELECT src, try_idx,
         ('0x' || substr(md5(concat_ws('|', '{_NEG_SALT}',
              src::VARCHAR, try_idx::VARCHAR)), 1, 12))::BIGINT % (mx + 1)
           AS cand
  FROM cands),
valid AS (
  SELECT h.src, h.try_idx, h.cand
  FROM hashed h
  JOIN nodes n ON h.cand = n.node
  WHERE h.cand <> h.src),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges)
SELECT v.src, CAST(v.try_idx AS INT) AS try_idx, v.cand AS neg_dst
FROM valid v
WHERE NOT EXISTS (
  SELECT 1 FROM und
  WHERE least(v.src, v.cand) = und.a AND greatest(v.src, v.cand) = und.b)
ORDER BY src, try_idx
"""

QUERIES["events_negative_samples"] = q_events_negative_samples
ORACLES["events_negative_samples"] = ORACLE_EVENTS_NEGATIVE_SAMPLES


# --------------------------------------------- effective diameter (ANF)
# The neighborhood function N(t) = Σ_v |ball(v, t)| estimated per
# round from the SAME HyperBall register propagation, and the
# effective diameter read off it: the smallest t whose N(t) reaches
# 90% of the deepest round's — the Palmer/Boldi-Vigna statistic that
# tells you how many propagation rounds ANY reachability-style
# operator on this graph actually needs. Sketch-only by design (no
# exact pair table anywhere — events_hyperball already carries the
# exact-vs-sketch audit at 2 hops); registers are bit-identical across
# engines, the per-round float sum uses the accepted 2dp grid, and
# the 90% test compares ROUNDED sums so both engines flag the same
# round. Scale: ED_ROUNDS register joins over |V| x 256 state.
ED_ROUNDS = 4
ED_PCT = 0.9


def q_events_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deja_view_spark.queries_corpus import (
        HLL_M,
        HLL_P,
        HLL_W,
        _HLL_LC_CUT,
        _HLL_NUM,
        _hll_rho,
    )

    def nf(regs):
        agg = regs.groupBy("node").agg(
            F.count("*").alias("cnt"),
            F.sum(F.expr(f"shiftleft(1L, {HLL_W + 1} - rho)")).alias("s_hit"),
        )
        zero = HLL_M - F.col("cnt")
        s_int = F.col("s_hit") + zero.cast("long") * F.lit(1 << (HLL_W + 1))
        raw = F.lit(_HLL_NUM) / s_int.cast("double")
        est = F.when(
            (raw <= F.lit(_HLL_LC_CUT)) & (zero > 0),
            F.lit(float(HLL_M))
            * F.log(F.lit(float(HLL_M)) / zero.cast("double")),
        ).otherwise(raw)
        return agg.agg(F.round(F.sum(est), 2).alias("n_est"))

    edges = _chain_edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hb|"), F.col("node").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    regs = nodes.select(
        "node",
        (h % HLL_M).alias("reg"),
        _hll_rho(F.shiftright(h, HLL_P)).alias("rho"),
    ).localCheckpoint(eager=True)
    rounds = nf(regs).select(F.lit(0).alias("t"), "n_est")
    for t in range(1, ED_ROUNDS + 1):
        via = edges.join(
            regs.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "reg", "rho")
        regs = (
            regs.unionByName(via)
            .groupBy("node", "reg")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True)
        )
        rounds = rounds.unionByName(
            nf(regs).select(F.lit(t).alias("t"), "n_est")
        )
    final = rounds.where(F.col("t") == ED_ROUNDS).select(
        F.col("n_est").alias("n_final")
    )
    return (
        rounds.crossJoin(F.broadcast(final))
        .select(
            "t",
            "n_est",
            F.expr(
                f"CAST(floor(n_est * 1000000 / n_final) AS BIGINT)"
            ).alias("pct_of_final_ppm"),
            (F.col("n_est") >= ED_PCT * F.col("n_final")).alias(
                "reaches_effective"
            ),
        )
        .orderBy("t")
    )


def _oracle_effective_diameter() -> str:
    from deja_view_spark.queries_corpus import (
        HLL_M,
        HLL_W,
        _HLL_LC_CUT,
        _HLL_NUM,
        _sql_hex60,
    )

    whens = " ".join(
        f"WHEN (h // {HLL_M}) >= {1 << k} THEN {HLL_W - k}"
        for k in range(HLL_W - 1, -1, -1)
    )

    def nf_sql(regsrc: str, t: int) -> str:
        return f"""
nf{t} AS (
  SELECT {t} AS t, round(sum(e), 2) AS n_est FROM (
    SELECT CASE WHEN raw <= {_HLL_LC_CUT!r} AND vz > 0
                THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(vz AS DOUBLE))
                ELSE raw END AS e
    FROM (
      SELECT node, count(*) AS cnt, {HLL_M} - count(*) AS vz,
             {_HLL_NUM!r} / CAST(sum(1::BIGINT << ({HLL_W + 1} - rho))
                 + ({HLL_M} - count(*)) * (1::BIGINT << {HLL_W + 1})
                 AS DOUBLE) AS raw
      FROM {regsrc} GROUP BY node)))"""

    parts = [nf_sql("regs0", 0)]
    prev = "regs0"
    for t in range(1, ED_ROUNDS + 1):
        parts.append(f"""
regs{t} AS (
  SELECT node, reg, max(rho) AS rho FROM (
    SELECT node, reg, rho FROM {prev}
    UNION ALL
    SELECT e.src AS node, r.reg, r.rho
    FROM edges e JOIN {prev} r ON r.node = e.dst)
  GROUP BY node, reg)""")
        parts.append(nf_sql(f"regs{t}", t))
        prev = f"regs{t}"
    chain = ",".join(parts)
    union = "\nUNION ALL\n".join(
        f"SELECT t, n_est FROM nf{t}" for t in range(ED_ROUNDS + 1)
    )
    return f"""
WITH {SQL_CHAIN_EDGES_CTES},
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
hx AS (
  SELECT node,
         {_sql_hex60("md5('hb|' || CAST(node AS VARCHAR))")} AS h
  FROM nodes),
regs0 AS (
  SELECT node, h % {HLL_M} AS reg,
         CASE {whens} ELSE {HLL_W + 1} END AS rho
  FROM hx),{chain},
rounds AS ({union}),
fin AS (SELECT n_est AS n_final FROM rounds WHERE t = {ED_ROUNDS})
SELECT t, n_est,
       CAST(floor(n_est * 1000000 / n_final) AS BIGINT) AS pct_of_final_ppm,
       n_est >= {ED_PCT} * n_final AS reaches_effective
FROM rounds CROSS JOIN fin
ORDER BY t
"""


ORACLE_EVENTS_EFFECTIVE_DIAMETER = _oracle_effective_diameter()

QUERIES["events_effective_diameter"] = q_events_effective_diameter
ORACLES["events_effective_diameter"] = ORACLE_EVENTS_EFFECTIVE_DIAMETER


# ----------------------------------------------- skip-gram pair census
# DeepWalk/node2vec step 2: turn the generated walks into the
# (center, context) co-occurrence counts a skip-gram embedding trainer
# consumes — every ordered pair of nodes within SG_WINDOW positions of
# each other on the same walk, exact counts. Composes
# q_events_random_walks UNCHANGED (the census can never drift from the
# walk generator it feeds); with events_negative_samples this
# completes the word2vec-style training-set story: positives here,
# negatives there. Scale shape: two Generates expand each walk to its
# O(L * W) in-window pairs map-side (L = walk length, both small
# constants), then ONE (center, context) partial agg; dead-end NULL
# tails drop in the filter.
SG_WINDOW = 2


def q_events_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    walks = q_events_random_walks(spark, sf_dir)
    arr = F.array(*[f"step{t}" for t in range(WALK_STEPS + 1)])
    a = walks.select(arr.alias("a")).select(
        "a", F.posexplode("a").alias("i", "center")
    )
    pairs = (
        a.select("i", "center", F.posexplode("a").alias("j", "context"))
        .where(
            F.col("center").isNotNull()
            & F.col("context").isNotNull()
            & (F.col("i") != F.col("j"))
            & (F.abs(F.col("i") - F.col("j")) <= SG_WINDOW)
        )
        .groupBy("center", "context")
        .agg(F.count("*").alias("n_pairs"))
    )
    return pairs.orderBy(
        F.desc("n_pairs"), F.asc("center"), F.asc("context")
    )


def _oracle_skipgram() -> str:
    positions = "\nUNION ALL\n".join(
        f"SELECT walk_id, {t} AS i, step{t} AS node FROM walks"
        for t in range(WALK_STEPS + 1)
    )
    return f"""
WITH walks AS ({ORACLES["events_random_walks"]}),
pos AS ({positions})
SELECT a.node AS center, b.node AS context, count(*) AS n_pairs
FROM pos a
JOIN pos b ON a.walk_id = b.walk_id AND a.i <> b.i
          AND abs(a.i - b.i) <= {SG_WINDOW}
WHERE a.node IS NOT NULL AND b.node IS NOT NULL
GROUP BY a.node, b.node
ORDER BY n_pairs DESC, center ASC, context ASC
"""


QUERIES["events_skipgram_pairs"] = q_events_skipgram_pairs
ORACLES["events_skipgram_pairs"] = _oracle_skipgram()


# ------------------------------------------- degree power-law MLE fit
# Degree-distribution diagnosis for both edge directions: node/edge
# counts, max degree, and the Clauset–Shalizi–Newman continuous MLE
# exponent alpha = 1 + n / sum(ln(d / 0.5)) at xmin = 1 — the number
# that says whether the graph is scale-free enough to need hot-key
# salting before any key-partitioned traversal (alpha < ~2.5 means
# the hub tail dominates; events_skew_report is the per-key view,
# this is the distribution-level one). Float discipline: the log
# terms are evaluated ONCE PER DISTINCT DEGREE over the metadata-
# sized histogram (round(ln(2d), 6) — identical few evaluations in
# both engines), weighted by exact BIGINT counts, so the sum has a
# few hundred terms instead of |V| and the 4dp output grid sits ~8
# orders above any fold-order noise. Scale shape: one degree partial
# agg per side + a histogram agg; output is 2 rows.
def q_events_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _chain_edges(spark, sf_dir)
    sides = []
    for side, key in (("out", "src"), ("in", "dst")):
        deg = edges.groupBy(F.col(key).alias("node")).agg(
            F.count("*").alias("degree")
        )
        hist = deg.groupBy("degree").agg(F.count("*").alias("cnt"))
        sides.append(
            hist.agg(
                F.lit(side).alias("side"),
                F.sum("cnt").alias("n_nodes"),
                F.sum(F.expr("cnt * degree")).alias("n_edges"),
                F.max("degree").alias("max_degree"),
                F.sum(
                    F.col("cnt")
                    * F.round(F.log(2.0 * F.col("degree")), 6)
                ).alias("_sum_ln"),
            )
        )
    both = sides[0].unionByName(sides[1])
    return both.select(
        "side",
        "n_nodes",
        "n_edges",
        "max_degree",
        F.round(
            F.lit(1.0) + F.col("n_nodes") / F.col("_sum_ln"), 4
        ).alias("alpha_mle"),
    ).orderBy("side")


def _oracle_degree_powerlaw() -> str:
    branches = []
    for side, key in (("out", "src"), ("in", "dst")):
        branches.append(f"""
SELECT '{side}' AS side, CAST(sum(cnt) AS BIGINT) AS n_nodes,
       CAST(sum(cnt * degree) AS BIGINT) AS n_edges,
       CAST(max(degree) AS BIGINT) AS max_degree,
       round(1.0 + sum(cnt) / sum(cnt * round(ln(2.0 * degree), 6)), 4)
         AS alpha_mle
FROM (
  SELECT degree, count(*) AS cnt FROM (
    SELECT {key}, count(*) AS degree FROM edges GROUP BY {key})
  GROUP BY degree)""")
    return (
        f"WITH {SQL_CHAIN_EDGES_CTES}\n"
        + "\nUNION ALL\n".join(branches)
        + "\nORDER BY side"
    )


ORACLE_EVENTS_DEGREE_POWERLAW = _oracle_degree_powerlaw()

QUERIES["events_degree_powerlaw"] = q_events_degree_powerlaw
ORACLES["events_degree_powerlaw"] = ORACLE_EVENTS_DEGREE_POWERLAW


# --------------------------------------- Boruvka minimum spanning forest
# The one classic distributed-graph primitive the battery lacked: a
# minimum spanning forest over the weighted item co-engagement graph
# (items = props $.k, edge weight = 1e6 // n_shared_users, so heavily
# co-engaged item pairs are "close"). The MSF is the backbone a
# single-linkage clustering / network-cost planner reads off.
#
# Algorithm (identical, fixed-round, in BOTH engines): Boruvka with
# pointer-doubling contraction —
#   each round: (1) relabel edges by current component, drop
#   intra-component edges; (2) every component picks its minimum
#   incident edge under the STRICT total order (w, a, b) — min-of-ROW
#   lexicographic comparison, the same cross-engine struct-min used by
#   docs_repetition; (3) the chosen-edge pointer graph has only
#   2-cycles (weights strictly decrease along parent chains under a
#   strict order), broken root-ward by keeping the smaller id; (4)
#   MSF_K pointer-doubling steps contract every chain of length up to
#   2^MSF_K to its root — a deterministic bound, unlike hash-min
#   convergence-looping, so the SQL oracle can mirror it EXACTLY as
#   unrolled CTEs.
# MSF_ROUNDS rounds halve (at least) the component count each round,
# so 7 rounds cover >= 128 initial components; MSF_K = 12 covers
# chains to depth 4096. Both bounds are corpus-scale knobs that grow
# LOGARITHMICALLY with graph size (at 1000x items: rounds 7 -> 10) —
# the per-round work is two narrow joins + one struct-min aggregation
# keyed on component id, and the component table shrinks
# geometrically; edges stream through one relabel join per round with
# no quadratic term anywhere. Safety: every edge Boruvka selects is an
# MSF edge by the cut property, independent of the round bounds —
# tests additionally pin the OUTPUT equal to a Python Kruskal
# ground truth on real and adversarial-chain graphs.
MSF_ROUNDS = 7
MSF_K = 12  # pointer-doubling steps per round (chains to 2^12)
MSF_W_NUM = 1_000_000


def _cf_item_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted item-item co-engagement edges (a < b, BIGINT weight
    ``1e6 // n_shared``) with the same power-user discipline as
    ``events_item_cf`` (users over the item cap are excluded from the
    user-local pair generation, bounding per-key fan-out)."""
    from deja_view_spark.queries_events import (
        CF_MAX_USER_ITEMS,
        CF_MIN_SHARED,
    )

    ev = load_table(spark, sf_dir, "events")
    item = F.get_json_object("props", "$.k").cast("long")
    ui = (
        ev.select("user_id", item.alias("item"))
        .where(F.col("item").isNotNull())
        .distinct()
    )
    udeg = ui.groupBy("user_id").agg(F.count("*").alias("u_items"))
    kept = ui.join(
        F.broadcast(udeg.where(F.col("u_items") <= CF_MAX_USER_ITEMS)),
        "user_id",
    ).select("user_id", "item")
    a = kept.select("user_id", F.col("item").alias("a"))
    b = kept.select("user_id", F.col("item").alias("b"))
    return (
        a.join(b, "user_id")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("ns"))
        .where(F.col("ns") >= CF_MIN_SHARED)
        .select(
            "a",
            "b",
            F.expr(f"CAST({MSF_W_NUM} DIV ns AS BIGINT)").alias("w"),
        )
    )


def q_events_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _cf_item_edges(spark, sf_dir).localCheckpoint(eager=True)
    # component label per item, initially itself
    lab = (
        edges.select(F.col("a").alias("item"))
        .unionByName(edges.select(F.col("b").alias("item")))
        .distinct()
        .select("item", F.col("item").alias("c"))
        .localCheckpoint(eager=True)
    )
    selected = None
    for rnd in range(1, MSF_ROUNDS + 1):
        la = lab.select(F.col("item").alias("a"), F.col("c").alias("ca"))
        lb = lab.select(F.col("item").alias("b"), F.col("c").alias("cb"))
        e2 = (
            edges.join(F.broadcast(la), "a")
            .join(F.broadcast(lb), "b")
            .where(F.col("ca") != F.col("cb"))
            .select("ca", "cb", "w", "a", "b")
            .localCheckpoint(eager=True)
        )
        # early exit once no edge crosses components: the remaining
        # oracle rounds select nothing and relabel nothing, so
        # stopping here is output-identical (the fixed-round SQL twin
        # just runs idempotent no-op rounds)
        if e2.isEmpty():
            break
        inc = e2.select(
            F.col("ca").alias("c"), F.col("cb").alias("partner"), "w", "a", "b"
        ).unionByName(
            e2.select(
                F.col("cb").alias("c"), F.col("ca").alias("partner"),
                "w", "a", "b",
            )
        )
        choice = inc.groupBy("c").agg(
            F.min(F.struct("w", "a", "b", "partner")).alias("m")
        ).select(
            "c",
            F.col("m.w").alias("w"),
            F.col("m.a").alias("a"),
            F.col("m.b").alias("b"),
            F.col("m.partner").alias("p"),
        ).localCheckpoint(eager=True)
        sel = choice.select(
            F.lit(rnd).alias("round"), "a", "b", "w"
        ).distinct()
        selected = sel if selected is None else selected.unionByName(sel)
        # 2-cycle root fix: smaller id of a mutual-min pair is root
        q = choice.select(F.col("c").alias("p"), F.col("p").alias("pp"))
        ptr = (
            choice.join(q, "p")
            .select(
                "c",
                F.when(
                    (F.col("pp") == F.col("c")) & (F.col("p") > F.col("c")),
                    F.col("c"),
                ).otherwise(F.col("p")).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        # pointer doubling, checkpointed EVERY step (the plan would
        # otherwise double per step — 2^K nodes for Catalyst), with a
        # fixpoint early-exit: once p == p(p) for every component the
        # remaining steps are identity, so stopping is
        # output-identical to the oracle's fixed K
        for _ in range(MSF_K):
            stepped = (
                ptr.select("c", F.col("p").alias("pc"))
                .join(
                    F.broadcast(
                        ptr.select(
                            F.col("c").alias("pc"), F.col("p").alias("p2")
                        )
                    ),
                    "pc",
                )
                .select("c", F.col("p2").alias("p"))
                .localCheckpoint(eager=True)
            )
            converged = (
                stepped.join(
                    F.broadcast(
                        ptr.select("c", F.col("p").alias("p_prev"))
                    ),
                    "c",
                )
                .where(F.col("p") != F.col("p_prev"))
                .isEmpty()
            )
            ptr = stepped
            if converged:
                break
        lab = (
            lab.join(
                F.broadcast(ptr.select(F.col("c"), F.col("p"))), "c", "left"
            )
            .select("item", F.coalesce("p", "c").alias("c"))
            .localCheckpoint(eager=True)
        )
    if selected is None:  # graph had no qualifying edges at all
        return spark.createDataFrame(
            [], "round INT, item_a BIGINT, item_b BIGINT, w BIGINT"
        )
    return (
        selected.select("round", F.col("a").alias("item_a"),
                        F.col("b").alias("item_b"), "w")
        .distinct()
        .orderBy("w", "item_a", "item_b")
    )


def _oracle_msf() -> str:
    from deja_view_spark.queries_events import (
        CF_MAX_USER_ITEMS,
        CF_MIN_SHARED,
    )

    parts = [f"""
WITH ui AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
kept AS MATERIALIZED (
  SELECT user_id, item FROM ui
  WHERE user_id IN (
    SELECT user_id FROM ui GROUP BY user_id
    HAVING count(*) <= {CF_MAX_USER_ITEMS})),
edges AS MATERIALIZED (
  SELECT a.item AS a, b.item AS b,
         CAST({MSF_W_NUM} // count(*) AS BIGINT) AS w
  FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= {CF_MIN_SHARED}),
lab0 AS MATERIALIZED (
  SELECT item, item AS c FROM (
    SELECT a AS item FROM edges UNION SELECT b FROM edges))"""]
    sel_names = []
    for r in range(1, MSF_ROUNDS + 1):
        p = f"r{r}"
        prev = f"lab{r - 1}"
        parts.append(f""",
{p}_e AS MATERIALIZED (
  SELECT la.c AS ca, lb.c AS cb, e.w, e.a, e.b
  FROM edges e JOIN {prev} la ON e.a = la.item
               JOIN {prev} lb ON e.b = lb.item
  WHERE la.c <> lb.c),
{p}_inc AS MATERIALIZED (
  SELECT ca AS c, cb AS partner, w, a, b FROM {p}_e
  UNION ALL
  SELECT cb, ca, w, a, b FROM {p}_e),
{p}_choice AS MATERIALIZED (
  SELECT c, min({{'w': w, 'a': a, 'b': b, 'partner': partner}}) AS m
  FROM {p}_inc GROUP BY c),
{p}_sel AS (
  SELECT DISTINCT {r} AS round, m['a'] AS a, m['b'] AS b, m['w'] AS w
  FROM {p}_choice),
{p}_d0 AS MATERIALIZED (
  SELECT x.c,
         CASE WHEN y.m['partner'] = x.c AND x.m['partner'] > x.c
              THEN x.c ELSE x.m['partner'] END AS p
  FROM {p}_choice x JOIN {p}_choice y ON x.m['partner'] = y.c)""")
        for k in range(1, MSF_K + 1):
            parts.append(f""",
{p}_d{k} AS MATERIALIZED (
  SELECT x.c, y.p FROM {p}_d{k - 1} x
  JOIN {p}_d{k - 1} y ON x.p = y.c)""")
        parts.append(f""",
lab{r} AS MATERIALIZED (
  SELECT l.item, coalesce(d.p, l.c) AS c
  FROM {prev} l LEFT JOIN {p}_d{MSF_K} d ON l.c = d.c)""")
        sel_names.append(f"{p}_sel")
    union = "\nUNION ALL\n".join(f"SELECT * FROM {s}" for s in sel_names)
    parts.append(f"""
SELECT DISTINCT CAST(round AS INT) AS round,
       CAST(a AS BIGINT) AS item_a, CAST(b AS BIGINT) AS item_b,
       CAST(w AS BIGINT) AS w
FROM ({union})
ORDER BY w, item_a, item_b""")
    return "".join(parts)


ORACLE_EVENTS_MSF = _oracle_msf()

QUERIES["events_msf"] = q_events_msf
ORACLES["events_msf"] = ORACLE_EVENTS_MSF


# ------------------------------------------- item-graph SCC / classes
# Strongly-connected-component decomposition of the support-filtered
# item-transition graph — the communicating-class analysis of the
# "next item touched" Markov chain (complement of
# events_markov_stationary, which assumes the chain is irreducible;
# this query PROVES which item sets actually communicate). Per user,
# distinct items are ordered by first touch (min (ts_micros,
# event_id) — a partial agg, no window over raw events); adjacent
# first-touches become directed src→dst transition edges; edges below
# SCC_MIN_EDGE support and items outside the SCC_TOP_ITEMS support cap
# are dropped (the same vocabulary-bounding move as
# events_market_basket / docs_bpe_train). On the resulting
# vocabulary-sized digraph the transitive closure is computed by
# SCC_DOUBLING_ROUNDS doublings (reach ∪ reach∘reach — O(log
# diameter) rounds; 2^6 = 64 ≥ any simple path on ≤40 nodes), SCC id
# = min item mutually reachable (incl. self), and a class is
# *recurrent* (closed, in the Markov sense) iff no kept edge leaves
# it. Output: one row per SCC with the member list, internal edge
# count, and the recurrent flag.
#
# Scale shape: the ONLY corpus-sized work is the (user,item) first-
# touch agg and one per-user window over first-touches (rows = user's
# distinct kept items, not raw events). Everything after the support
# filters lives on a ≤SCC_TOP_ITEMS-node metadata graph: closure rows
# are bounded by 40² = 1 600, every join in the doubling loop is a
# sub-broadcast-threshold hash join, and the DuckDB oracle can afford
# a full WITH RECURSIVE fixpoint over the same edges — which is what
# makes an EXACT cross-engine check of an iterative graph algorithm
# possible at all.

SCC_TOP_ITEMS = 40
SCC_MIN_EDGE = 3
SCC_DOUBLING_ROUNDS = 6


def q_events_item_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
        )
        .where(F.col("item").isNotNull())
    )
    ft = ev.groupBy("user_id", "item").agg(
        F.min(F.struct("us", "event_id")).alias("first")
    )
    supp = ft.groupBy("item").agg(F.count("*").alias("supp"))
    top = (
        supp.orderBy(F.desc("supp"), F.asc("item"))
        .limit(SCC_TOP_ITEMS)
        .select("item")
    )
    kept = ft.join(F.broadcast(top), "item", "left_semi").select(
        "user_id",
        "item",
        F.col("first.us").alias("us"),
        F.col("first.event_id").alias("eid"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "eid")
    steps = kept.select(
        F.col("item").alias("src"), F.lead("item").over(w).alias("dst")
    ).where(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    edges = (
        steps.groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= SCC_MIN_EDGE)
        .select("src", "dst")
    )
    # Each doubling round references `reach` twice; without lineage
    # truncation the logical plan doubles per round (2^ROUNDS copies)
    # and Catalyst planning — not the data — becomes the bottleneck.
    # localCheckpoint materializes the (≤1600-row) closure and keeps
    # every round's plan constant-size, the same idiom as
    # events_pagerank's edge checkpoint.
    reach = edges.localCheckpoint()
    n_reach = reach.count()
    for _ in range(SCC_DOUBLING_ROUNDS):
        hop = (
            reach.alias("a")
            .join(reach.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        reach = reach.unionByName(hop).distinct().localCheckpoint()
        # exact fixpoint early-exit: the closure is monotone, so an
        # unchanged pair count means no new path was found and further
        # doubling is a no-op (counts are ~free on the materialized
        # metadata-sized closure). Same termination rule as the
        # oracle's WITH RECURSIVE fixpoint — results identical.
        n_next = reach.count()
        if n_next == n_reach:
            break
        n_reach = n_next
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    mutual = (
        reach.alias("f")
        .join(
            reach.alias("b"),
            (F.col("f.src") == F.col("b.dst"))
            & (F.col("f.dst") == F.col("b.src")),
        )
        .select(F.col("f.src").alias("node"), F.col("f.dst").alias("peer"))
        .unionByName(nodes.select("node", F.col("node").alias("peer")))
        .distinct()
    )
    scc = mutual.groupBy("node").agg(F.min("peer").alias("scc_id"))
    mem = scc.groupBy("scc_id").agg(
        F.count("*").alias("n_members"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("node")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("members"),
    )
    e2 = (
        edges.join(
            scc.withColumnRenamed("node", "src").withColumnRenamed(
                "scc_id", "s_src"
            ),
            "src",
        )
        .join(
            scc.withColumnRenamed("node", "dst").withColumnRenamed(
                "scc_id", "s_dst"
            ),
            "dst",
        )
    )
    deg = e2.groupBy("s_src").agg(
        F.sum((F.col("s_dst") == F.col("s_src")).cast("long")).alias(
            "n_internal"
        ),
        F.sum((F.col("s_dst") != F.col("s_src")).cast("long")).alias("n_out"),
    )
    return (
        mem.join(deg.withColumnRenamed("s_src", "scc_id"), "scc_id", "left")
        .select(
            "scc_id",
            "n_members",
            "members",
            F.coalesce("n_internal", F.lit(0)).alias("n_internal_edges"),
            (F.coalesce("n_out", F.lit(0)) == 0).cast("long").alias(
                "is_recurrent"
            ),
        )
        .orderBy("scc_id")
    )


ORACLE_EVENTS_ITEM_SCC = f"""
WITH RECURSIVE f AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         epoch_us(ts) AS us, event_id
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
ft AS (
  SELECT user_id, item, us, event_id FROM (
    SELECT user_id, item, us, event_id,
           row_number() OVER (PARTITION BY user_id, item
                              ORDER BY us, event_id) AS rn
    FROM f) WHERE rn = 1),
supp AS (SELECT item, count(*) AS supp FROM ft GROUP BY item),
top AS (SELECT item FROM supp
        ORDER BY supp DESC, item ASC LIMIT {SCC_TOP_ITEMS}),
seq AS (
  SELECT item AS src,
         lead(item) OVER (PARTITION BY user_id ORDER BY us, event_id) AS dst
  FROM ft WHERE item IN (SELECT item FROM top)),
edges AS (
  SELECT src, dst FROM (
    SELECT src, dst, count(*) AS n FROM seq
    WHERE dst IS NOT NULL AND dst <> src GROUP BY 1, 2)
  WHERE n >= {SCC_MIN_EDGE}),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
mutual AS (
  SELECT fw.src AS node, fw.dst AS peer
  FROM reach fw JOIN reach bw ON fw.src = bw.dst AND fw.dst = bw.src
  UNION
  SELECT node, node FROM nodes),
scc AS (SELECT node, min(peer) AS scc_id FROM mutual GROUP BY node),
mem AS (
  SELECT scc_id, count(*) AS n_members,
         string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS members
  FROM scc GROUP BY scc_id),
e2 AS (
  SELECT s1.scc_id AS s_src, s2.scc_id AS s_dst
  FROM edges e
  JOIN scc s1 ON e.src = s1.node
  JOIN scc s2 ON e.dst = s2.node),
deg AS (
  SELECT s_src AS scc_id,
         CAST(sum(CASE WHEN s_dst = s_src THEN 1 ELSE 0 END) AS BIGINT)
           AS n_internal,
         CAST(sum(CASE WHEN s_dst <> s_src THEN 1 ELSE 0 END) AS BIGINT)
           AS n_out
  FROM e2 GROUP BY s_src)
SELECT m.scc_id, m.n_members, m.members,
       coalesce(d.n_internal, 0) AS n_internal_edges,
       CAST(CASE WHEN coalesce(d.n_out, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS is_recurrent
FROM mem m LEFT JOIN deg d USING (scc_id)
ORDER BY scc_id
"""


QUERIES["events_item_scc"] = q_events_item_scc
ORACLES["events_item_scc"] = ORACLE_EVENTS_ITEM_SCC


# --------------------------------------------- hub-knockout resilience
# Attack-tolerance audit of the item co-engagement graph: remove the
# top-k highest-degree items ("hubs") for k in KNOCKOUT_KS and report
# how the graph fragments (component count, largest-component size) —
# the Albert-Barabási robustness experiment run as a query. In a KG /
# recommendation context this answers an operational question: how
# much of the catalog's connectivity flows through the few hub items
# that skew-handling already special-cases (kg_degree_topk surfaces
# them; this measures what happens when they're gone — delisted,
# filtered, or sharded away).
#
# Scale shape: the graph is the same support-capped item-item
# projection as events_item_cf / events_item_scc (top KNOCK_TOP_ITEMS
# items by audience, pairs with >= KNOCK_MIN_SHARED shared users —
# the corpus-sized work is ONE distinct + ONE bounded pair agg);
# every knockout scenario then runs connected components on a
# ≤40-node metadata graph via the doubling closure with fixpoint
# early-exit (the events_item_scc machinery), so the whole scenario
# sweep is broadcast-sized joins. Degree ties break on item id
# (deterministic knockout sets).

KNOCK_TOP_ITEMS = 40
KNOCK_MIN_SHARED = 3
KNOCKOUT_KS = (0, 2, 5, 10)


def q_events_hub_knockout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull())
    ui = ev.distinct()
    supp = ui.groupBy("item").agg(F.count("*").alias("supp"))
    top = (
        supp.orderBy(F.desc("supp"), F.asc("item"))
        .limit(KNOCK_TOP_ITEMS)
        .select("item")
    )
    kept = ui.join(F.broadcast(top), "item", "left_semi")
    a = kept.select(F.col("item").alias("ia"), "user_id")
    b = kept.select(F.col("item").alias("ib"), "user_id")
    pairs = (
        a.join(b, "user_id")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= KNOCK_MIN_SHARED)
        .select("ia", "ib")
        .localCheckpoint()
    )
    deg = (
        pairs.select(F.col("ia").alias("item"))
        .unionByName(pairs.select(F.col("ib").alias("item")))
        .groupBy("item")
        .agg(F.count("*").alias("deg"))
        .orderBy(F.desc("deg"), F.asc("item"))
    )
    ranked = [r.item for r in deg.collect()]  # ≤40 rows: metadata
    out = None
    for k in KNOCKOUT_KS:
        removed = set(ranked[:k])
        e = pairs.where(
            ~F.col("ia").isin(removed) & ~F.col("ib").isin(removed)
            if removed
            else F.lit(True)
        )
        nodes = (
            e.select(F.col("ia").alias("node"))
            .unionByName(e.select(F.col("ib").alias("node")))
            .distinct()
        )
        und = e.select(F.col("ia").alias("src"), F.col("ib").alias("dst"))
        und = und.unionByName(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        reach = und.unionByName(
            nodes.select("node", F.col("node").alias("peer")).toDF(
                "src", "dst"
            )
        ).localCheckpoint()
        n_reach = reach.count()
        for _ in range(6):
            hop = (
                reach.alias("x")
                .join(reach.alias("y"), F.col("x.dst") == F.col("y.src"))
                .select(
                    F.col("x.src").alias("src"), F.col("y.dst").alias("dst")
                )
            )
            reach = reach.unionByName(hop).distinct().localCheckpoint()
            n_next = reach.count()
            if n_next == n_reach:
                break
            n_reach = n_next
        comp = reach.groupBy("src").agg(F.min("dst").alias("comp"))
        sizes = comp.groupBy("comp").agg(F.count("*").alias("sz"))
        row = (
            sizes.agg(
                F.count("*").alias("n_components"),
                F.coalesce(F.max("sz"), F.lit(0)).alias("largest_cc"),
                F.coalesce(F.sum("sz"), F.lit(0)).alias("n_nodes"),
            )
            .crossJoin(
                F.broadcast(e.agg(F.count("*").alias("n_edges")))
            )
            .select(
                F.lit(k).alias("k_removed"),
                "n_nodes",
                "n_edges",
                "n_components",
                "largest_cc",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("k_removed")


def _knockout_oracle() -> str:
    blocks = []
    for k in KNOCKOUT_KS:
        blocks.append(f"""
SELECT {k} AS k_removed, * FROM (
  WITH RECURSIVE removed AS (
    SELECT item FROM deg ORDER BY deg DESC, item ASC LIMIT {k}),
  e AS (
    SELECT ia, ib FROM pairs
    WHERE ia NOT IN (SELECT item FROM removed)
      AND ib NOT IN (SELECT item FROM removed)),
  nodes AS (SELECT ia AS node FROM e UNION SELECT ib FROM e),
  und AS (
    SELECT ia AS src, ib AS dst FROM e
    UNION ALL SELECT ib, ia FROM e
    UNION ALL SELECT node, node FROM nodes),
  reach AS (
    SELECT src, dst FROM und
    UNION
    SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src),
  comp AS (SELECT src, min(dst) AS comp FROM reach GROUP BY src),
  sizes AS (SELECT comp, count(*) AS sz FROM comp GROUP BY comp)
  SELECT coalesce((SELECT CAST(sum(sz) AS BIGINT) FROM sizes), 0)
           AS n_nodes,
         (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
         (SELECT count(*) FROM sizes) AS n_components,
         coalesce((SELECT CAST(max(sz) AS BIGINT) FROM sizes), 0)
           AS largest_cc)""")
    scen = "\nUNION ALL".join(blocks)
    return f"""
WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
supp AS (SELECT item, count(*) AS supp FROM ui GROUP BY item),
top AS (SELECT item FROM supp
        ORDER BY supp DESC, item ASC LIMIT {KNOCK_TOP_ITEMS}),
kept AS (SELECT ui.* FROM ui JOIN top USING (item)),
pairs AS MATERIALIZED (
  SELECT a.item AS ia, b.item AS ib
  FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= {KNOCK_MIN_SHARED}),
deg AS MATERIALIZED (
  SELECT item, count(*) AS deg FROM (
    SELECT ia AS item FROM pairs UNION ALL SELECT ib FROM pairs)
  GROUP BY item)
{scen}
ORDER BY k_removed
"""


QUERIES["events_hub_knockout"] = q_events_hub_knockout
ORACLES["events_hub_knockout"] = _knockout_oracle()


# ------------------------------------------------ rich-club coefficient
# Rich-club coefficient of the item co-engagement graph: for each
# degree threshold k, the density among nodes of degree > k —
# phi(k) = 2·E_k / (N_k·(N_k−1)) — quantifying whether the hubs form
# their own tightly-wired club (phi grows with k) or merely fan out
# to the periphery. The structural complement of
# events_assortativity (correlation) and events_hub_knockout
# (consequence of removal): a strong rich club means hub knockout
# fragments the periphery but the core survives, and hub-to-hub
# traffic dominates shuffle volume at scale. Emitted in exact ppm.
#
# Scale shape: same support-capped projection as the knockout audit
# (the corpus-sized work is one distinct + one bounded pair agg);
# degrees and the per-threshold counts are conditional sums in ONE
# scalar aggregate over the ≤ capped-size edge/degree tables, stacked
# to |thresholds| rows. No scenario loop, no closure.

RICH_CLUB_KS = (1, 2, 3, 5, 8)


def q_events_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull())
    ui = ev.distinct()
    supp = ui.groupBy("item").agg(F.count("*").alias("supp"))
    top = (
        supp.orderBy(F.desc("supp"), F.asc("item"))
        .limit(KNOCK_TOP_ITEMS)
        .select("item")
    )
    kept = ui.join(F.broadcast(top), "item", "left_semi")
    a = kept.select(F.col("item").alias("ia"), "user_id")
    b = kept.select(F.col("item").alias("ib"), "user_id")
    pairs = (
        a.join(b, "user_id")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= KNOCK_MIN_SHARED)
        .select("ia", "ib")
    )
    deg = (
        pairs.select(F.col("ia").alias("item"))
        .unionByName(pairs.select(F.col("ib").alias("item")))
        .groupBy("item")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("item").alias("ia"), F.col("deg").alias("da"))
    db = deg.select(F.col("item").alias("ib"), F.col("deg").alias("db"))
    e = pairs.join(F.broadcast(da), "ia").join(F.broadcast(db), "ib")
    n_aggs = [
        F.sum((F.col("deg") > k).cast("long")).alias(f"n{k}")
        for k in RICH_CLUB_KS
    ]
    e_aggs = [
        F.sum(
            ((F.col("da") > k) & (F.col("db") > k)).cast("long")
        ).alias(f"e{k}")
        for k in RICH_CLUB_KS
    ]
    nrow = deg.agg(*n_aggs)
    erow = e.agg(*e_aggs)
    stack_args = ", ".join(f"{k}, n{k}, e{k}" for k in RICH_CLUB_KS)
    return (
        nrow.crossJoin(erow)
        .select(
            F.expr(
                f"stack({len(RICH_CLUB_KS)}, {stack_args}) "
                "AS (k, n_club, e_club)"
            )
        )
        .withColumn(
            "phi_ppm",
            F.expr(
                "CASE WHEN n_club >= 2 THEN 2 * e_club * 1000000"
                " DIV (n_club * (n_club - 1)) ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .orderBy("k")
    )


def _rich_club_oracle() -> str:
    n_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN deg > {k} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n{k}"
        for k in RICH_CLUB_KS
    )
    e_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN da > {k} AND db > {k} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS e{k}"
        for k in RICH_CLUB_KS
    )
    rows = "\n  UNION ALL ".join(
        f"SELECT {k} AS k, n{k} AS n_club, e{k} AS e_club"
        " FROM nrow CROSS JOIN erow"
        for k in RICH_CLUB_KS
    )
    return f"""
WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
supp AS (SELECT item, count(*) AS supp FROM ui GROUP BY item),
top AS (SELECT item FROM supp
        ORDER BY supp DESC, item ASC LIMIT {KNOCK_TOP_ITEMS}),
kept AS (SELECT ui.* FROM ui JOIN top USING (item)),
pairs AS MATERIALIZED (
  SELECT a.item AS ia, b.item AS ib
  FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= {KNOCK_MIN_SHARED}),
deg AS MATERIALIZED (
  SELECT item, count(*) AS deg FROM (
    SELECT ia AS item FROM pairs UNION ALL SELECT ib FROM pairs)
  GROUP BY item),
e AS (
  SELECT p.ia, p.ib, x.deg AS da, y.deg AS db
  FROM pairs p JOIN deg x ON p.ia = x.item JOIN deg y ON p.ib = y.item),
nrow AS (
  SELECT {n_cols}
  FROM deg),
erow AS (
  SELECT {e_cols}
  FROM e),
rows_ AS (
  {rows})
SELECT k, n_club, e_club,
       CASE WHEN n_club >= 2
            THEN 2 * e_club * 1000000 // (n_club * (n_club - 1))
            ELSE CAST(0 AS BIGINT) END AS phi_ppm
FROM rows_
ORDER BY k
"""


QUERIES["events_rich_club"] = q_events_rich_club
ORACLES["events_rich_club"] = _rich_club_oracle()
