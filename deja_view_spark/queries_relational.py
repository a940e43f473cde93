"""Relational query registry, part 2: as-of join (J5 general form),
rollup grouping sets, exact percentiles, and the classic 3-table
shipping-priority join (TPC-H Q3 shape) exercising broadcast dim joins
+ partial aggregation + TakeOrderedAndProject."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deja_view_spark.functions.similarity import duckdb_cosine_sql
from deja_view_spark.operators.asof import asof_join
from deja_view_spark.sources.catalog import load_table


# ------------------------------------------------------------- as-of join (J5)
def q_events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's most recent purchase at-or-before
    the click (backward as-of). One shuffle on user_id via the
    union + running-last layout (operators/asof.py) — the scalable
    generalization of the reference's week-window membership lookups
    (discussions_metrics.py:95-103)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        right_cols=["ts", "event_id", "value"],
        tie_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts"),
        F.col("asof_event_id"),
        F.round("asof_value", 6).alias("asof_value"),
    )


ORACLE_EVENTS_ASOF = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), r AS (
  SELECT user_id, ts, event_id, value FROM (
    SELECT user_id, ts, event_id, value,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase') WHERE rn = 1
)
SELECT l.event_id, l.user_id, l.ts,
       r.ts AS asof_ts, r.event_id AS asof_event_id,
       round(r.value, 6) AS asof_value
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# ------------------------------------------------------- rollup grouping sets
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue by (region, nation) with ROLLUP subtotals —
    grouping-sets coverage. Dims are broadcast (tiny); the fact scan
    aggregates partially before the shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == customer.c_custkey,
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
            "n_orders",
        )
    )


ORACLE_REVENUE_ROLLUP = """
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       round(sum(o_totalprice), 4) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------- exact percentiles
def q_docs_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length quartiles via Spark's exact
    ``percentile`` (continuous interpolation — matches DuckDB
    quantile_cont). Exact is fine per-group at any scale: the sketch
    alternative (approx_percentile/KLL) trades this for one pass, but
    the group count here is tiny so the sort-based exact path holds."""
    docs = load_table(spark, sf_dir, "documents")
    pcts = [0.25, 0.5, 0.75, 0.9]
    aggs = [
        F.round(
            F.expr(f"percentile(n_chars, {p})"), 6
        ).alias(f"p{int(p * 100)}")
        for p in pcts
    ]
    return (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), *aggs)
        .orderBy("lang")
    )


ORACLE_DOCS_PCTL = """
SELECT lang, count(*) AS n_docs,
       round(quantile_cont(n_chars, 0.25), 6) AS p25,
       round(quantile_cont(n_chars, 0.50), 6) AS p50,
       round(quantile_cont(n_chars, 0.75), 6) AS p75,
       round(quantile_cont(n_chars, 0.90), 6) AS p90
FROM documents GROUP BY lang ORDER BY lang
"""


# ------------------------------------------------- shipping priority (Q3 shape)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    revenue per order, top 10. Customer dim broadcasts; lineitem
    partially aggregates map-side; the final top-10 is
    TakeOrderedAndProject (no global sort)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = "1998-06-01"
    j = (
        lineitem.where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .join(
            orders.where(
                F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                customer.where(F.col("c_mktsegment") == "BUILDING").select(
                    "c_custkey"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------- tumbling window()
def q_events_tumbling_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aligned 7-day tumbling windows per event_type via Spark's
    window() — the batch twin of the streaming watermark aggregation
    (streaming/windows.py); state in streaming mode is bounded by the
    watermark, here it is a plain hash aggregate."""
    from deja_view_spark.streaming.windows import windowed_event_counts

    ev = load_table(spark, sf_dir, "events")
    return windowed_event_counts(ev)


ORACLE_EVENTS_TUMBLING = """
WITH b AS (
  SELECT *, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
  FROM events
)
SELECT CAST(DATE '1970-01-01' + (ed - ed % 7) * INTERVAL 1 DAY AS TIMESTAMP) AS week_start,
       CAST(DATE '1970-01-01' + (ed - ed % 7 + 7) * INTERVAL 1 DAY AS TIMESTAMP) AS week_end,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS total_value
FROM b
GROUP BY 1, 2, 3
"""


# ------------------------------------- flagship J2 semantics, exact oracle
def q_duplicate_edges_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference find-duplicates semantics (cli.py:459-678: directed
    edges, 1-d/2 report convention, threshold, top-3 per src, 4dp
    rounding, (sim desc, dst asc) ties) over the pre-embedded
    ``embeddings`` table with the EXACT all-pairs generator — the one
    J2 configuration DuckDB can replay verbatim
    (list_cosine_similarity), so the flagship operator gets a full
    value-hash oracle, not just rows-only. Subsampled (vec_id % 5) to
    keep the quadratic oracle bounded at any sf."""
    from deja_view_spark.operators.selfjoin import duplicate_edges

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") % 5 == 0)
        .select(
            F.col("vec_id").cast("string").alias("doc_id"),
            F.col("embedding").alias("vector"),
        )
    )
    return duplicate_edges(
        emb,
        threshold=0.65,
        top_k=3,
        convention="report",
        method="exact",
        assume_normalized=False,
    )


ORACLE_DUP_EXACT = f"""
WITH e AS (
  SELECT CAST(vec_id AS VARCHAR) AS id, embedding
  FROM embeddings WHERE vec_id % 5 = 0
), p AS (
  SELECT a.id AS src, b.id AS dst,
         round((1 + {duckdb_cosine_sql('a.embedding', 'b.embedding')}) / 2, 4)
           AS similarity
  FROM e a JOIN e b ON a.id <> b.id
), f AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY src ORDER BY similarity DESC, dst ASC) AS INT) AS rank
  FROM p WHERE similarity >= 0.65
)
SELECT src, dst, similarity, rank FROM f WHERE rank <= 3
"""


# ------------------------------------------------------- SQL-text surface
def q_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape via the spark.sql TEXT interface (temp views +
    ANSI SQL string) — exercises the SQL parser path end-to-end; every
    other registry entry uses the DataFrame API. Left join so
    zero-order customers count, then histogram of order counts."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM v_customer c LEFT JOIN v_orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """
    )


ORACLE_CUSTOMER_HISTOGRAM = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ----------------------------------------------------- promo revenue (Q14)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly share of revenue from PROMO parts.
    The part dim broadcasts into the fact scan; one pass, conditional
    sum over the join output, month bucketing via date_trunc."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return (
        j.groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                * 100.0
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.round(F.sum(rev), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("month")
    )


ORACLE_PROMO_REVENUE = """
SELECT date_trunc('month', l_shipdate) AS month,
       round(sum(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             * 100.0 / sum(l_extendedprice * (1 - l_discount)), 4)
         AS promo_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------- anti-join / EXCEPT
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT orders — left ANTI join with a pushed
    predicate on the right side (the same plan shape as the pipeline's
    lineage resume: source partitions EXCEPT completed partitions).
    DuckDB oracle uses EXCEPT for the set-op twin of the anti join."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        customer.join(urgent, "c_custkey", "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ORACLE_CUSTOMERS_NO_ORDERS = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (
  SELECT c_custkey FROM customer
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
"""


# ------------------------------------------------- ST1 incremental probe
def q_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-driven incremental query (ST1, reference action.py:72-166):
    'new' documents (a deterministic ~1/50 md5 split) probed against
    the embedding index of the rest — broadcast of the small new side,
    one scan of the big side, J1 semantics (self-exclusion, threshold,
    top-k). Full value-hash oracle since round 3: the feature-hashing
    embedder is reproduced bit-for-bit in DuckDB SQL
    (functions/embedding.py:duckdb_embed_cte), so the driver checks the
    embed -> probe -> rank chain end to end; batch/stream equivalence
    stays asserted in tests/test_streaming.py."""
    from deja_view_spark.functions.embedding import make_embed_udf
    from deja_view_spark.streaming.incremental import (
        incremental_duplicate_probe,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("text").alias("doc_text"),
    )
    # md5-hex split (NOT xxhash64: the oracle must compute the same
    # partition, and DuckDB lacks Spark's seeded xxhash64)
    is_new = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("binary")), 1, 4), 16, 10)
        .cast("long")
        % 50
        == 0
    )
    embed = make_embed_udf(dim=64)
    existing = docs.where(~is_new).select(
        "doc_id", embed("doc_text").alias("vector")
    )
    return incremental_duplicate_probe(
        docs.where(is_new), existing, dim=64, threshold=0.6, top_k=3
    ).orderBy("src", "rank")


def _oracle_incremental_probe() -> str:
    from deja_view_spark.functions.embedding import (
        duckdb_embed_cte,
        duckdb_hex_int_sql,
    )

    emb = duckdb_embed_cte(
        "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents",
        dim=64,
        out="emb",
    )
    split = duckdb_hex_int_sql("md5(doc_id)", 4)
    return f"""
WITH {emb},
flagged AS (
  SELECT doc_id, vec, ({split}) % 50 = 0 AS is_new FROM emb),
probes AS (
  SELECT doc_id AS src, vec AS pvec FROM flagged WHERE is_new),
cands AS (
  SELECT doc_id AS dst, vec FROM flagged WHERE NOT is_new),
scored AS (
  SELECT src, dst,
         round((1.0 + list_dot_product(vec, pvec)) / 2.0, 4) AS similarity
  FROM cands, probes
  WHERE src <> dst)
SELECT src, dst, similarity, rank
FROM (
  SELECT src, dst, similarity,
         row_number() OVER (
           PARTITION BY src
           ORDER BY similarity DESC, dst ASC) AS rank
  FROM scored
  WHERE similarity >= 0.6) t
WHERE rank <= 3
ORDER BY src, rank
"""


ORACLE_INCREMENTAL_PROBE = _oracle_incremental_probe()


# ------------------------------------------- large orders (Q18 shape)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (HAVING-subquery): orders whose total quantity
    exceeds a threshold, joined back to customer detail. The inner
    aggregation is the decorrelated form of `o_orderkey IN (SELECT ..
    GROUP BY .. HAVING sum > t)` — one partial-agg pass over lineitem,
    a semi-join on the tiny qualifying-key set, then the detail joins;
    customer broadcasts."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            F.round("total_qty", 4).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


ORACLE_LARGE_ORDERS = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 4) AS o_totalprice,
       round(total_qty, 4) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) q
  ON o_orderkey = q.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


# --------------------------------------- waiting suppliers (Q21 shape)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (correlated EXISTS + NOT EXISTS), adapted to
    this schema's columns: per supplier, count finalized orders where
    it is the ONLY supplier with a returned ('R') lineitem while the
    order involved other suppliers. Written as SQL text so Catalyst's
    subquery DECORRELATION does the work — the physical plan contains
    a left semi and a left anti join, no correlated subquery remains
    (asserted in tools/explain_audit.py)."""
    for t in ("supplier", "lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 25
        """
    )


ORACLE_WAITING_SUPPLIERS = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 25
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape (per-brand): revenue from 'small' line items — those
    below 20% of their part's average order quantity — for small parts
    (p_size < 20), reported as avg yearly revenue per brand.

    The reference SQL's correlated scalar subquery
    (``l_quantity < (SELECT 0.2*avg(l_quantity) ... WHERE l_partkey =
    p_partkey)``) is hand-decorrelated the way Catalyst would: one
    partial-agg pass builds the per-part threshold, then a broadcast
    join applies it — the fact table is scanned twice but shuffled
    never (thresholds and the filtered part dim both broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") < 20)
        .select("p_partkey", "p_brand")
    )
    thresh = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh"))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(thresh), "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .groupBy("p_brand")
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
        .orderBy("p_brand")
    )


ORACLE_SMALL_QTY_REVENUE = """
SELECT p_brand, round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_size < 20
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
ORDER BY p_brand
"""


# ------------------------------------------- two-role dimension (Q7 shape)
TRADE_PAIRS = [("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")]
TRADE_SINCE, TRADE_UNTIL = "1996-01-01", "1997-12-31"


def q_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the SAME dimension (nation) joined in two roles
    — supplier nation via lineitem.l_suppkey, customer nation via
    orders→customer — with a symmetric nation-pair predicate and a
    per-(pair, year) revenue rollup.

    Scale shape: supplier/customer/nation are broadcast (dims), so the
    only shuffle is the lineitem↔orders fact-fact join on orderkey;
    the pair predicate applies AFTER both role joins, but because the
    dims are broadcast the filter still runs map-side on the fact
    scan's stage. The nation table enters the plan twice under
    different aliases — Catalyst treats the two roles as independent
    broadcasts (no self-join confusion)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair_pred = None
    for a, b in TRADE_PAIRS:
        c = (F.col("supp_nation") == a) & (F.col("cust_nation") == b)
        pair_pred = c if pair_pred is None else (pair_pred | c)
    return (
        li.where(
            F.col("l_shipdate").between(TRADE_SINCE, f"{TRADE_UNTIL} 23:59:59")
        )
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair_pred)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_PAIR_SQL = " OR ".join(
    f"(supp_nation = '{a}' AND cust_nation = '{b}')" for a, b in TRADE_PAIRS
)

ORACLE_BILATERAL_TRADE = f"""
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue,
       count(*) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate BETWEEN TIMESTAMP '{TRADE_SINCE} 00:00:00'
                       AND TIMESTAMP '{TRADE_UNTIL} 23:59:59')
WHERE {_PAIR_SQL}
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


QUERIES = {
    "bilateral_trade": q_bilateral_trade,
    "events_asof_purchase": q_events_asof_purchase,
    "events_tumbling_weeks": q_events_tumbling_weeks,
    "duplicate_edges_exact": q_duplicate_edges_exact,
    "customer_order_histogram": q_customer_order_histogram,
    "incremental_probe": q_incremental_probe,
    "promo_revenue": q_promo_revenue,
    "customers_without_orders": q_customers_without_orders,
    "revenue_rollup": q_revenue_rollup,
    "docs_length_percentiles": q_docs_length_percentiles,
    "shipping_priority": q_shipping_priority,
    "large_orders": q_large_orders,
    "waiting_suppliers": q_waiting_suppliers,
    "small_quantity_revenue": q_small_quantity_revenue,
}

ORACLES = {
    "bilateral_trade": ORACLE_BILATERAL_TRADE,
    "events_asof_purchase": ORACLE_EVENTS_ASOF,
    "events_tumbling_weeks": ORACLE_EVENTS_TUMBLING,
    "duplicate_edges_exact": ORACLE_DUP_EXACT,
    "customer_order_histogram": ORACLE_CUSTOMER_HISTOGRAM,
    "incremental_probe": ORACLE_INCREMENTAL_PROBE,
    "promo_revenue": ORACLE_PROMO_REVENUE,
    "customers_without_orders": ORACLE_CUSTOMERS_NO_ORDERS,
    "revenue_rollup": ORACLE_REVENUE_ROLLUP,
    "docs_length_percentiles": ORACLE_DOCS_PCTL,
    "shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "large_orders": ORACLE_LARGE_ORDERS,
    "waiting_suppliers": ORACLE_WAITING_SUPPLIERS,
    "small_quantity_revenue": ORACLE_SMALL_QTY_REVENUE,
}


# ----------------------------------------- histogram-quantile sketch
# The single-pass SCALE companion to q_docs_length_percentiles: exact
# per-group percentiles sort every value; the histogram sketch needs
# one partial-agg shuffle over a FIXED key space (lang x bin) and a
# window over #bins rows per group, so its memory is O(domain/W) no
# matter how many documents exist. Quantile q is read off the
# cumulative histogram with linear interpolation inside the owning
# bin — rank arithmetic is integer-only, one float division at the
# end, identical in both engines.
HIST_BIN_W = 25  # n_chars per bin
HIST_QS = (50, 90, 99)


def q_docs_length_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bins = (
        docs.select("lang", (F.floor(F.col("n_chars") / HIST_BIN_W)).alias("bin"))
        .groupBy("lang", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("lang")
    cum = bins.select(
        "lang",
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    aggs = [F.max("n").alias("n_docs")]
    for q in HIST_QS:
        rank = F.ceil(F.col("n") * q / 100)
        owning = (rank > F.col("cum") - F.col("cnt")) & (rank <= F.col("cum"))
        est = (
            F.col("bin") * HIST_BIN_W
            + HIST_BIN_W
            * (rank - (F.col("cum") - F.col("cnt")))
            / F.col("cnt")
        )
        aggs.append(
            F.round(F.min(F.when(owning, est)), 4).alias(f"h{q}")
        )
    return cum.groupBy("lang").agg(*aggs).orderBy("lang")


def _oracle_hist_quantiles() -> str:
    cols = []
    for q in HIST_QS:
        rank = f"CAST(ceil(n * {q} / 100.0) AS BIGINT)"
        cols.append(
            f"round(min(CASE WHEN {rank} > cum - cnt AND {rank} <= cum"
            f" THEN bin * {HIST_BIN_W} + {HIST_BIN_W} *"
            f" ({rank} - (cum - cnt)) * 1.0 / cnt END), 4) AS h{q}"
        )
    sel = ",\n       ".join(cols)
    return f"""
WITH bins AS (
  SELECT lang, CAST(floor(n_chars / {HIST_BIN_W}.0) AS BIGINT) AS bin,
         count(*) AS cnt
  FROM documents GROUP BY 1, 2),
cum AS (
  SELECT lang, bin, cnt,
         sum(cnt) OVER (PARTITION BY lang ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(cnt) OVER (PARTITION BY lang) AS n
  FROM bins)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
       {sel}
FROM cum GROUP BY lang ORDER BY lang
"""


ORACLE_DOCS_HIST_QUANTILES = _oracle_hist_quantiles()

QUERIES["docs_length_hist_quantiles"] = q_docs_length_hist_quantiles
ORACLES["docs_length_hist_quantiles"] = ORACLE_DOCS_HIST_QUANTILES


# ----------------------------------------------- Q22 shape (TPC-H)
SALES_OPP_CUTOFF = "2000-01-01"


def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape on this schema: per nation, the count and total
    balance of well-funded customers (acctbal above the average
    POSITIVE balance — a scalar subquery kept inside the plan as a
    broadcast one-row cross join, never a driver collect) with no
    order since SALES_OPP_CUTOFF (anti join with the date predicate
    pushed into the orders scan; Q22 proper uses a 7-year dormancy
    window the same way). The classic 'dormant high-value accounts'
    report combining a scalar aggregate filter, an anti join, and a
    dimension rollup.

    Scale shape: the scalar average is a full-agg one-row table
    (map-side partial agg) broadcast into the customer scan; the anti
    join shuffles only the distinct custkey projection of orders; the
    nation dimension broadcasts. One wide shuffle total (the anti
    join's), then a nation-sized aggregation."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(
            orders.where(F.col("o_orderdate") >= SALES_OPP_CUTOFF)
            .select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("nation")
    )


ORACLE_SALES_OPPORTUNITY = """
SELECT n.n_name AS nation,
       count(*) AS n_custs,
       round(sum(c.c_acctbal), 2) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= DATE '2000-01-01')
GROUP BY n.n_name
ORDER BY nation
"""

QUERIES["sales_opportunity"] = q_sales_opportunity
ORACLES["sales_opportunity"] = ORACLE_SALES_OPPORTUNITY


# ---------------------------------------- Bloom-filter semi-join
# The runtime-filter pattern Spark's own optimizer applies under
# spark.sql.optimizer.runtime.bloomFilter.enabled (InjectRuntimeFilter
# builds a BloomFilterAggregate on the creation side and stitches a
# might_contain onto the application side): pre-filter the BIG probe
# side with a compact summary of the SMALL build side BEFORE the
# shuffle join, then let the real join remove the false positives —
# exact semantics, shuffle volume cut to (true matches + fp_rate).
# Re-expressed engine-portably so DuckDB reproduces it bit-for-bit:
# k seeded md5-60 hashes per key mod BLOOM_M give the set-bit
# positions; the distinct-position table (<= BLOOM_M rows = the bitset
# cardinality bound, here << that) broadcasts; a probe key passes iff
# ALL its positions hit. The query reports the filter's measured
# behavior — pass/true/false-positive counts and the lineitem volume
# the filter would admit vs the exact semi-join — so the fp rate is
# an asserted output, not a hope.
BLOOM_M = 1 << 14   # bits
BLOOM_K = 3         # hash functions
BLOOM_PRICE_MIN = 450_000.0  # build side: high-value orders


def _bloom_positions(key, engine: str):
    """The k seeded hash positions of ``key`` (string form), as a
    Spark Column array or a DuckDB list-literal SQL fragment. Shared
    construction: md5-prefix 60-bit of 'seed:key', mod BLOOM_M."""
    if engine == "spark":
        return F.array_distinct(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(f"{i}:"), key.cast("string")
                                    )
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % BLOOM_M
                    )
                    for i in range(BLOOM_K)
                ]
            )
        )
    from deja_view_spark.queries_text import _sql_hex60

    elems = ", ".join(
        "({h}) % {m}".format(
            h=_sql_hex60("md5('{i}:' || CAST({k} AS VARCHAR))".format(i=i, k=key)),
            m=BLOOM_M,
        )
        for i in range(BLOOM_K)
    )
    return f"list_distinct([{elems}])"


def q_orders_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join audit: lineitem keys probed against a
    Bloom filter built from high-value orders (o_totalprice >=
    BLOOM_PRICE_MIN). One summary row: build/probe/pass/true/fp key
    counts, the measured false-positive rate, and the lineitem row
    volume the filter admits vs the exact semi-join.

    Scale shape: the filter is build-side-sized and BROADCAST (the
    positions table is bounded by BLOOM_M regardless of build
    cardinality — that bound is the whole point of a Bloom filter);
    probing is a broadcast hash join over the probe side's exploded
    (key, position) pairs followed by an all-positions-hit partial
    agg, i.e. the probe side never shuffles on the join key until
    AFTER it has been thinned to (true + fp); the exact semi-join
    runs only over bloom survivors, which is precisely where the real
    join would run. No corpus-wide window, no cartesian, no Python."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    build = orders.where(F.col("o_totalprice") >= BLOOM_PRICE_MIN).select(
        F.col("o_orderkey").alias("k")
    )
    filt = (
        build.select(
            F.explode(_bloom_positions(F.col("k"), "spark")).alias("p")
        )
        .distinct()
    )
    probe_keys = lineitem.select(F.col("l_orderkey").alias("k")).distinct()
    probed = probe_keys.select(
        "k", _bloom_positions(F.col("k"), "spark").alias("ps")
    ).select("k", F.size("ps").alias("np"), F.explode("ps").alias("p"))
    passed = (
        probed.join(F.broadcast(filt), "p")
        .groupBy("k", "np")
        .agg(F.count("*").alias("hits"))
        .where(F.col("hits") == F.col("np"))
        .select("k")
    )
    truth = probe_keys.join(build.distinct(), "k", "left_semi")
    li_keyed = lineitem.select(F.col("l_orderkey").alias("k"))
    stats = (
        probe_keys.agg(F.count("*").alias("n_probe_keys"))
        .crossJoin(build.agg(F.count("*").alias("n_build_keys")))
        .crossJoin(passed.agg(F.count("*").alias("n_bloom_pass")))
        .crossJoin(truth.agg(F.count("*").alias("n_true_match")))
        .crossJoin(
            li_keyed.join(F.broadcast(passed), "k", "left_semi").agg(
                F.count("*").alias("lineitems_admitted")
            )
        )
        .crossJoin(
            li_keyed.join(F.broadcast(truth), "k", "left_semi").agg(
                F.count("*").alias("lineitems_true")
            )
        )
    )
    fp = F.col("n_bloom_pass") - F.col("n_true_match")
    return stats.select(
        "n_build_keys",
        "n_probe_keys",
        "n_bloom_pass",
        "n_true_match",
        fp.alias("n_false_pos"),
        F.round(
            fp / (F.col("n_probe_keys") - F.col("n_true_match")), 6
        ).alias("fp_rate"),
        "lineitems_admitted",
        "lineitems_true",
    )


def _oracle_bloom_semijoin() -> str:
    pos = _bloom_positions("k", "duckdb")
    return f"""
WITH build AS (
  SELECT o_orderkey AS k FROM orders
  WHERE o_totalprice >= {BLOOM_PRICE_MIN}),
filt AS (
  SELECT DISTINCT unnest({pos}) AS p FROM build),
probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
probed AS (
  SELECT k, len({pos}) AS np, unnest({pos}) AS p FROM probe),
passed AS (
  SELECT k FROM probed JOIN filt USING (p)
  GROUP BY k, np HAVING count(*) = any_value(np)),
truth AS (SELECT k FROM probe WHERE k IN (SELECT k FROM build)),
li AS (SELECT l_orderkey AS k FROM lineitem)
SELECT
  (SELECT count(*) FROM build) AS n_build_keys,
  (SELECT count(*) FROM probe) AS n_probe_keys,
  (SELECT count(*) FROM passed) AS n_bloom_pass,
  (SELECT count(*) FROM truth) AS n_true_match,
  (SELECT count(*) FROM passed) - (SELECT count(*) FROM truth)
    AS n_false_pos,
  round(((SELECT count(*) FROM passed)
         - (SELECT count(*) FROM truth)) * 1.0
        / ((SELECT count(*) FROM probe)
           - (SELECT count(*) FROM truth)), 6) AS fp_rate,
  (SELECT count(*) FROM li WHERE k IN (SELECT k FROM passed))
    AS lineitems_admitted,
  (SELECT count(*) FROM li WHERE k IN (SELECT k FROM truth))
    AS lineitems_true
"""


ORACLE_ORDERS_BLOOM = _oracle_bloom_semijoin()

QUERIES["orders_bloom_semijoin"] = q_orders_bloom_semijoin
ORACLES["orders_bloom_semijoin"] = ORACLE_ORDERS_BLOOM


# ------------------------------------------- Q19 shape: disjunctive join
# TPC-H Q19's load-bearing property is the OR-of-ANDs predicate: three
# (brand, size, type, quantity) conjunctions united by OR. A naive
# engine evaluates it post-join; Catalyst must (a) push the OR of the
# part-only conjuncts down to the part SCAN (disjunctive pushdown —
# asserted by the plan audit) and (b) keep the mixed part+lineitem
# conjuncts as the join filter. Output is per-branch so the value hash
# certifies WHICH branch each row matched, not just the total.
Q19_BRANCHES = [
    ("Brand#12", "SMALL", 1, 5, 1.0, 11.0),
    ("Brand#23", "MEDIUM", 1, 10, 10.0, 20.0),
    ("Brand#34", "LARGE", 1, 15, 20.0, 30.0),
]


def q_brand_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )

    def branch(i: int):
        b, t, s_lo, s_hi, q_lo, q_hi = Q19_BRANCHES[i]
        return (
            (F.col("p_brand") == b)
            & (F.col("p_type") == t)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    matched = j.where(branch(0) | branch(1) | branch(2)).select(
        F.when(branch(0), 1).when(branch(1), 2).otherwise(3).alias("branch"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        matched.groupBy("branch")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("rev"), 4).alias("revenue"),
        )
        .orderBy("branch")
    )


def _oracle_q19() -> str:
    conds = [
        f"(p_brand = '{b}' AND p_type = '{t}' AND p_size BETWEEN {sl} AND {sh}"
        f" AND l_quantity BETWEEN {ql} AND {qh})"
        for b, t, sl, sh, ql, qh in Q19_BRANCHES
    ]
    return f"""
SELECT CASE WHEN {conds[0]} THEN 1
            WHEN {conds[1]} THEN 2 ELSE 3 END AS branch,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {conds[0]} OR {conds[1]} OR {conds[2]}
GROUP BY 1
ORDER BY branch
"""


ORACLE_BRAND_PROMO = _oracle_q19()

QUERIES["brand_promo_revenue"] = q_brand_promo_revenue
ORACLES["brand_promo_revenue"] = ORACLE_BRAND_PROMO


# --------------------------------------- Q15 shape: top supplier view
# TPC-H Q15: suppliers whose windowed revenue EQUALS the maximum —
# the correlated scalar subquery Catalyst decorrelates into one
# aggregate + a broadcast of the single max row + a filter (never a
# self-join of the aggregate with itself on a sort). Revenue is
# rounded to 4dp BEFORE the max/equality so the comparison runs on
# identical values in both engines (float-sum order differences live
# below the rounding).
Q15_SHIP_LO, Q15_SHIP_HI = "1996-01-01", "1996-03-31"


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        lineitem.where(
            F.col("l_shipdate").between(Q15_SHIP_LO, f"{Q15_SHIP_HI} 23:59:59")
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            rev.l_suppkey == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE_TOP_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate BETWEEN TIMESTAMP '{Q15_SHIP_LO} 00:00:00'
                       AND TIMESTAMP '{Q15_SHIP_HI} 23:59:59'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s.s_suppkey
"""

QUERIES["top_supplier_revenue"] = q_top_supplier_revenue
ORACLES["top_supplier_revenue"] = ORACLE_TOP_SUPPLIER


# ------------------------------------------------------------------
# Q6 shape — forecast revenue change: the canonical PUSHDOWN showcase.
# Every predicate (shipdate year window, discount band, quantity cap)
# is a plain scan filter and the whole query is one partial-agg'd
# global sum — zero joins, zero windows; at 100 TB this is the query
# whose cost is pure pruned-scan bandwidth, and the plan audit pins
# all three filters inside PushedFilters.
Q6_DATE_LO, Q6_DATE_HI = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_QTY_CAP = 24


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= Q6_DATE_LO)
            & (F.col("l_shipdate") < Q6_DATE_HI)
            & (F.col("l_discount") >= Q6_DISC_LO)
            & (F.col("l_discount") <= Q6_DISC_HI)
            & (F.col("l_quantity") < Q6_QTY_CAP)
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * l_discount * 100, 0)"
                    " AS BIGINT)"
                )
            ).alias("cents"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.expr("CAST(cents AS DOUBLE) / 100").alias("revenue"), "n_items"
        )
    )


ORACLE_FORECAST_REVENUE = f"""
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100, 0)
                     AS BIGINT)) AS DOUBLE) / 100 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_DATE_LO}'
  AND l_shipdate <  TIMESTAMP '{Q6_DATE_HI}'
  AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY_CAP}
"""


# ------------------------------------------------------------------
# Q8 shape — nation market share: the deep broadcast-join pyramid
# (lineitem ⋈ part ⋈ orders ⋈ customer ⋈ nation ⋈ region ⋈ supplier
# ⋈ nation) with a conditional-share finish. Only lineitem and orders
# are fact-sized; every dim broadcasts, so the single real shuffle is
# the fact-fact join key. Share emitted per (year, supplier nation)
# as ppm of the year's regional volume — volumes are summed in EXACT
# integer cents (order-independent BIGINT sums) and the share is pure
# integer ppm, so nothing float-order-sensitive reaches the hash.
Q8_REGION = "ASIA"
Q8_TYPE = "ECONOMY"


def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == Q8_TYPE)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat_c = load_table(spark, sf_dir, "nation").alias("nc")
    nat_s = load_table(spark, sf_dir, "nation").alias("ns")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat_c), cust.c_nationkey == F.col("nc.n_nationkey"))
        .join(F.broadcast(reg), F.col("nc.n_regionkey") == reg.r_regionkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat_s), sup.s_nationkey == F.col("ns.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.col("ns.n_name").alias("supp_nation"),
            F.expr(
                "CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)"
                " AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy("o_year", "supp_nation")
        .agg(F.sum("cents").alias("nation_cents"))
    )
    tot = vol.groupBy("o_year").agg(F.sum("nation_cents").alias("year_cents"))
    return (
        vol.join(F.broadcast(tot), "o_year")
        .select(
            "o_year",
            "supp_nation",
            F.expr("CAST(nation_cents AS DOUBLE) / 100").alias(
                "nation_volume"
            ),
            F.expr(
                "CAST(nation_cents * 1000000 DIV year_cents AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("o_year", "supp_nation")
    )


ORACLE_NATION_MARKET_SHARE = f"""
WITH vol AS (
  SELECT extract(year FROM o_orderdate) AS o_year,
         ns.n_name AS supp_nation,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS nation_cents
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey AND p_type = '{Q8_TYPE}'
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region   ON nc.n_regionkey = r_regionkey AND r_name = '{Q8_REGION}'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  GROUP BY 1, 2),
tot AS (
  SELECT o_year, CAST(sum(nation_cents) AS BIGINT) AS year_cents
  FROM vol GROUP BY o_year)
SELECT o_year, supp_nation,
       CAST(nation_cents AS DOUBLE) / 100 AS nation_volume,
       CAST(nation_cents * 1000000 // year_cents AS BIGINT) AS share_ppm
FROM vol JOIN tot USING (o_year)
ORDER BY o_year, supp_nation
"""


# ------------------------------------------------------------------
# Q10 shape — returned-item revenue: which customers returned the
# most value in a quarter. One fact-fact join (lineitem R-rows ⋈
# orders in the window), customer/nation broadcast, exact top-20 via
# TakeOrdered on the rounded revenue with custkey tiebreak.
Q10_DATE_LO, Q10_DATE_HI = "1996-01-01", "1996-04-01"


def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= Q10_DATE_LO)
        & (F.col("o_orderdate") < Q10_DATE_HI)
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)"
                    " AS BIGINT)"
                )
            ).alias("revenue_cents"),
            F.count("*").alias("n_returned"),
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "c_acctbal",
            F.expr("CAST(revenue_cents AS DOUBLE) / 100").alias("revenue"),
            "n_returned",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


ORACLE_RETURNED_ITEM_REVENUE = f"""
SELECT c_custkey, c_name, n_name, c_acctbal,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                     AS BIGINT)) AS DOUBLE) / 100 AS revenue,
       count(*) AS n_returned
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_DATE_LO}'
  AND o_orderdate <  TIMESTAMP '{Q10_DATE_HI}'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

QUERIES["forecast_revenue"] = q_forecast_revenue
ORACLES["forecast_revenue"] = ORACLE_FORECAST_REVENUE
QUERIES["nation_market_share"] = q_nation_market_share
ORACLES["nation_market_share"] = ORACLE_NATION_MARKET_SHARE
QUERIES["returned_item_revenue"] = q_returned_item_revenue
ORACLES["returned_item_revenue"] = ORACLE_RETURNED_ITEM_REVENUE


# ==================================================================
# Round-3 closing wave: the five TPC-H shapes not yet in the registry
# (Q9, Q11, Q12, Q16, Q20 analogues on this schema — the testdata has
# no partsupp table, so supplycost/availqty-dependent predicates are
# restated over part.p_retailprice and lineitem-derived part-supplier
# pairs; every money/share figure stays in exact integer cents / ppm
# so the cross-engine hash has no float-order term).
# ==================================================================

# Q9 shape — product-type profit by (supplier nation, order year).
# Profit proxy: revenue cents minus a unit-cost proxy of 10% of the
# part's retail price (supplycost stand-in; p_retailprice is the only
# cost-bearing column in this schema). Cost cents are computed as
# round(p_retailprice*10) * l_quantity — both factors BIGINT (quantity
# is integral by generation), so the sum is order-independent.
# Scale shape: ONE fact-sized shuffle (lineitem ⋈ orders on orderkey);
# part/supplier/nation broadcast; group-by output is |nations|×|years|.
Q9_PART_LIKE = "%bolt%"


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like(Q9_PART_LIKE)
    )
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.expr(
                    "CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)"
                    " AS BIGINT)"
                )
                - F.expr(
                    "CAST(round(p_retailprice * 10, 0) AS BIGINT)"
                    " * CAST(l_quantity AS BIGINT)"
                )
            ).alias("profit_cents"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("profit_cents").alias("cents"))
        .select(
            "nation",
            "o_year",
            F.expr("CAST(cents AS DOUBLE) / 100").alias("profit"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


ORACLE_PRODUCT_PROFIT = f"""
SELECT n_name AS nation,
       extract(year FROM o_orderdate) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                     AS BIGINT)
                - CAST(round(p_retailprice * 10, 0) AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100 AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '{Q9_PART_LIKE}'
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# Q11 shape — "important stock": parts whose revenue exceeds a
# threshold derived from a scalar subquery over the whole fact table
# (Q11's HAVING sum(...) > scalar-threshold). Q11 scales its fraction
# by 1/SF; here the equivalent scale-free rule keeps parts above
# 1.5x the MEAN per-part revenue (part_cents * n_parts * 2 >
# 3 * total_cents — pure BIGINT, no division), so the query is
# non-degenerate at every sf dir. The global (total, count) is a
# one-row broadcast; share_ppm is integer ppm over exact cents.
# Scale: per-part partial agg (one shuffle keyed on partkey),
# threshold join is a broadcast of one row.
Q11_MULT_NUM, Q11_MULT_DEN = 3, 2  # keep parts > (NUM/DEN) x mean


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = li.select(
        "l_partkey",
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)"
            " AS BIGINT)"
        ).alias("cents"),
    ).groupBy("l_partkey").agg(F.sum("cents").alias("part_cents"))
    total = rev.agg(
        F.sum("part_cents").alias("total_cents"),
        F.count("*").alias("n_parts"),
    )
    return (
        rev.crossJoin(F.broadcast(total))
        .where(
            F.expr(
                f"part_cents * n_parts * {Q11_MULT_DEN}"
                f" > {Q11_MULT_NUM} * total_cents"
            )
        )
        .select(
            "l_partkey",
            "part_cents",
            F.expr("part_cents * 1000000 DIV total_cents").alias("share_ppm"),
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            "l_partkey",
            F.col("p_name").alias("part_name"),
            F.expr("CAST(part_cents AS DOUBLE) / 100").alias("revenue"),
            "share_ppm",
        )
        .orderBy(F.desc("share_ppm"), F.asc("l_partkey"))
    )


ORACLE_IMPORTANT_PARTS = f"""
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS part_cents
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT CAST(sum(part_cents) AS BIGINT) AS total_cents,
               count(*) AS n_parts FROM rev)
SELECT l_partkey, p_name AS part_name,
       CAST(part_cents AS DOUBLE) / 100 AS revenue,
       CAST(part_cents * 1000000 // total_cents AS BIGINT) AS share_ppm
FROM rev CROSS JOIN tot
JOIN part ON l_partkey = p_partkey
WHERE part_cents * n_parts * {Q11_MULT_DEN}
      > {Q11_MULT_NUM} * total_cents
ORDER BY share_ppm DESC, l_partkey ASC
"""


# Q12 shape — shipping-class vs order-priority matrix: per lineitem
# class (l_linestatus stands in for l_shipmode, absent here), count
# lines on URGENT/HIGH orders vs the rest, within a shipdate year.
# The canonical conditional-aggregation (CASE inside sum) shape; one
# fact-fact join, group-by output is |classes| rows.
Q12_DATE_LO, Q12_DATE_HI = "1997-01-01", "1998-01-01"


def q_shipclass_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= Q12_DATE_LO)
        & (F.col("l_shipdate") < Q12_DATE_HI)
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).alias("high_line_count"),
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0
                ).otherwise(1)
            ).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


ORACLE_SHIPCLASS_PRIORITY = f"""
SELECT l_linestatus AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_DATE_LO}'
  AND l_shipdate <  TIMESTAMP '{Q12_DATE_HI}'
GROUP BY l_linestatus
ORDER BY ship_class
"""


# Q16 shape — supplier count by part attribute, with a NOT-IN
# supplier exclusion (negative-balance suppliers stand in for Q16's
# complaint suppliers). Part-supplier pairs are DERIVED from lineitem
# (distinct partkey/suppkey — this schema's partsupp), the exclusion
# is a broadcast anti-join, and the count-distinct groups on part
# attributes. Scale: the distinct pair build is the one fact shuffle.
Q16_BRAND_NOT = "Brand#13"
Q16_TYPE_NOT_LIKE = "PROMO%"
Q16_SIZES = (1, 7, 14, 21, 28, 35, 42, 49)


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_BRAND_NOT)
        & ~F.col("p_type").like(Q16_TYPE_NOT_LIKE)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    bad_sup = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(bad_sup),
            pairs.l_suppkey == bad_sup.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
    )


ORACLE_SUPPLIER_PART_COUNTS = f"""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_BRAND_NOT}'
  AND p_type NOT LIKE '{Q16_TYPE_NOT_LIKE}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


# Q20 shape — suppliers holding an outsized share of a part's flow:
# for parts matching the name pattern, keep (supplier, part) pairs
# whose shipped-quantity share of the part's total exceeds the ppm
# threshold, then emit the distinct suppliers (semi-join) with their
# nation. Q20's availqty>0.5*sum(qty) correlated subquery restated as
# an integer-ppm share over lineitem-derived totals. Scale: two
# partial aggs on (part) and (supp, part) — the second reuses the
# first's shuffle key prefix — and broadcast dims for the finish.
Q20_PART_LIKE = "%gear%"
Q20_SHARE_PPM = 100_000  # supplier ships >10% of the part's quantity


def q_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like(Q20_PART_LIKE)
    ).select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    flow = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "l_suppkey",
            "l_partkey",
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
    )
    per_pair = flow.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("qty").alias("pair_qty")
    )
    per_part = flow.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    excess = (
        per_pair.join(per_part, "l_partkey")
        .where(
            F.expr("pair_qty * 1000000 DIV part_qty") > Q20_SHARE_PPM
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        excess.join(F.broadcast(sup), excess.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
        )
        .orderBy("supplier")
    )


ORACLE_EXCESS_SHARE_SUPPLIERS = f"""
WITH flow AS (
  SELECT l_suppkey, l_partkey, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '{Q20_PART_LIKE}'),
per_pair AS (
  SELECT l_suppkey, l_partkey, CAST(sum(qty) AS BIGINT) AS pair_qty
  FROM flow GROUP BY l_suppkey, l_partkey),
per_part AS (
  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS part_qty
  FROM flow GROUP BY l_partkey),
excess AS (
  SELECT DISTINCT l_suppkey
  FROM per_pair JOIN per_part USING (l_partkey)
  WHERE pair_qty * 1000000 // part_qty > {Q20_SHARE_PPM})
SELECT s_name AS supplier, n_name AS nation
FROM excess
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
ORDER BY supplier
"""


QUERIES["product_profit"] = q_product_profit
ORACLES["product_profit"] = ORACLE_PRODUCT_PROFIT
QUERIES["important_parts"] = q_important_parts
ORACLES["important_parts"] = ORACLE_IMPORTANT_PARTS
QUERIES["shipclass_priority"] = q_shipclass_priority
ORACLES["shipclass_priority"] = ORACLE_SHIPCLASS_PRIORITY
QUERIES["supplier_part_counts"] = q_supplier_part_counts
ORACLES["supplier_part_counts"] = ORACLE_SUPPLIER_PART_COUNTS
QUERIES["excess_share_suppliers"] = q_excess_share_suppliers
ORACLES["excess_share_suppliers"] = ORACLE_EXCESS_SHARE_SUPPLIERS


# ==================================================================
# Q2 shape — the last of the 22 TPC-H query shapes: minimum-cost
# supplier per part in a region (the correlated MIN subquery).
# This schema has no partsupp, so the pair supply cost is DERIVED:
# per (part, supplier) the minimum observed unit price over lineitem,
# in exact integer cents (round(extendedprice*100/quantity) — per-row
# double math identical in both engines, then BIGINT min, which is
# order-independent). Decorrelation: one (part, supp) partial agg off
# the fact table, region suppliers broadcast into it, the per-part
# MIN re-aggregates the pair table (shares the partkey shuffle
# prefix), and the winners come back via an equi-join on
# (partkey, cents). The final sort keys (acctbal desc, supplier,
# partkey) are a total order, so the LIMIT is deterministic.
# ==================================================================
Q2_REGION = "EUROPE"
Q2_PTYPE = "ECONOMY"
Q2_TOP_N = 100


def q_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == Q2_PTYPE
    ).select("p_partkey", "p_name")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q2_REGION
    )
    region_sup = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pair_cost = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "l_partkey",
            "l_suppkey",
            F.expr(
                "CAST(round(l_extendedprice * 100 / l_quantity, 0)"
                " AS BIGINT)"
            ).alias("unit_cents"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_cents").alias("cost_cents"))
    )
    rp = pair_cost.join(
        F.broadcast(region_sup),
        pair_cost.l_suppkey == region_sup.s_suppkey,
    )
    min_cost = rp.groupBy("l_partkey").agg(
        F.min("cost_cents").alias("min_cents")
    )
    return (
        rp.join(min_cost, "l_partkey")
        .where(F.col("cost_cents") == F.col("min_cents"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
            F.col("l_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.expr("CAST(cost_cents AS DOUBLE) / 100").alias("supply_cost"),
        )
        .orderBy(F.desc("acctbal"), F.asc("supplier"), F.asc("partkey"))
        .limit(Q2_TOP_N)
    )


ORACLE_CHEAPEST_SUPPLIER = f"""
WITH pair_cost AS (
  SELECT l_partkey, l_suppkey,
         CAST(min(CAST(round(l_extendedprice * 100 / l_quantity, 0)
                       AS BIGINT)) AS BIGINT) AS cost_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = '{Q2_PTYPE}'
  GROUP BY l_partkey, l_suppkey),
region_sup AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = '{Q2_REGION}'),
rp AS (
  SELECT * FROM pair_cost JOIN region_sup ON l_suppkey = s_suppkey),
min_cost AS (
  SELECT l_partkey, min(cost_cents) AS min_cents
  FROM rp GROUP BY l_partkey)
SELECT s_acctbal AS acctbal, s_name AS supplier, n_name AS nation,
       l_partkey AS partkey, p_name AS part_name,
       CAST(cost_cents AS DOUBLE) / 100 AS supply_cost
FROM rp
JOIN min_cost USING (l_partkey)
JOIN part ON l_partkey = p_partkey
WHERE cost_cents = min_cents
ORDER BY acctbal DESC, supplier ASC, partkey ASC
LIMIT {Q2_TOP_N}
"""


QUERIES["cheapest_supplier"] = q_cheapest_supplier
ORACLES["cheapest_supplier"] = ORACLE_CHEAPEST_SUPPLIER


# ------------------------------------------------ partition advisor
# The layout-planning query a 100-TB table ingest runs before writing:
# from exact byte totals (text payload + fixed per-row overhead for
# the scalar columns), recommend shuffle-partition and output-file
# counts against the standard targets (128 MiB in-flight partitions,
# 1 GiB parquet files), with ceil-division so recommendations never
# round to zero. Pure arithmetic over ONE aggregate row — the planner
# consumes docs_table_stats-style numbers; this emits the decision.
ADVISOR_PARTITION_BYTES = 128 * 1024 * 1024
ADVISOR_FILE_BYTES = 1024 * 1024 * 1024
ADVISOR_ROW_OVERHEAD = 64  # scalar columns + layout overhead per row


def q_docs_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.length("text")).alias("text_bytes"),
    )
    return agg.select(
        "n_rows",
        "text_bytes",
        F.expr(
            f"text_bytes + n_rows * {ADVISOR_ROW_OVERHEAD}"
        ).alias("est_bytes"),
        F.expr(
            f"CAST(ceil((text_bytes + n_rows * {ADVISOR_ROW_OVERHEAD})"
            f" / CAST({ADVISOR_PARTITION_BYTES} AS DOUBLE)) AS BIGINT)"
        ).alias("rec_shuffle_partitions"),
        F.expr(
            f"CAST(ceil((text_bytes + n_rows * {ADVISOR_ROW_OVERHEAD})"
            f" / CAST({ADVISOR_FILE_BYTES} AS DOUBLE)) AS BIGINT)"
        ).alias("rec_output_files"),
        F.expr(
            f"(text_bytes + n_rows * {ADVISOR_ROW_OVERHEAD}) DIV n_rows"
        ).alias("avg_row_bytes"),
    )


ORACLE_DOCS_PARTITION_ADVISOR = f"""
WITH agg AS (
  SELECT count(*) AS n_rows,
         CAST(sum(length(text)) AS BIGINT) AS text_bytes
  FROM documents)
SELECT n_rows, text_bytes,
       text_bytes + n_rows * {ADVISOR_ROW_OVERHEAD} AS est_bytes,
       CAST(ceil((text_bytes + n_rows * {ADVISOR_ROW_OVERHEAD})
                 / CAST({ADVISOR_PARTITION_BYTES} AS DOUBLE)) AS BIGINT)
         AS rec_shuffle_partitions,
       CAST(ceil((text_bytes + n_rows * {ADVISOR_ROW_OVERHEAD})
                 / CAST({ADVISOR_FILE_BYTES} AS DOUBLE)) AS BIGINT)
         AS rec_output_files,
       (text_bytes + n_rows * {ADVISOR_ROW_OVERHEAD}) // n_rows
         AS avg_row_bytes
FROM agg
"""

QUERIES["docs_partition_advisor"] = q_docs_partition_advisor
ORACLES["docs_partition_advisor"] = ORACLE_DOCS_PARTITION_ADVISOR


# ------------------------------------------- fulfillment latency SLA
# Order-to-ship latency profile per order priority: exact rank-picked
# p50/p90 (the MAD/winsorize lower-rank convention — never
# interpolated floats) plus min/max/count over
# datediff(l_shipdate, o_orderdate) — the SLA report of the
# fulfillment pipeline, and the latency analogue of
# events_conversion_lag on the relational side. Deterministic rank
# tiebreak (latency, orderkey, linenumber); percentile ranks
# r50 = (n+1) DIV 2, r90 = greatest(9n DIV 10, 1) mirrored verbatim.
#
# Scale shape: orders is FACT-sized (1.5M rows at sf1, linear in sf),
# so the orders-lineitem join carries NO broadcast hint — the
# 3-column projection is handed to AQE, which broadcasts at bench
# scale and falls back to a shuffle join when the projected side
# outgrows the threshold; ONE rank window per priority partition over
# the narrow (priority, latency, keys) projection; boundary ranks
# join back by (priority, rank) against the broadcast per-priority
# counts (6 rows — a true dimension).


def q_orders_fulfillment_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("days"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        "days", "l_orderkey", "l_linenumber"
    )
    ranked = lat.withColumn("rn", F.row_number().over(w))
    stats = lat.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.min("days").alias("min_days"),
        F.max("days").alias("max_days"),
    )
    p50 = (
        ranked.join(F.broadcast(stats), "o_orderpriority")
        .where(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("o_orderpriority", F.col("days").alias("p50_days"))
    )
    p90 = (
        ranked.join(F.broadcast(stats), "o_orderpriority")
        .where(F.col("rn") == F.expr("greatest(9 * n DIV 10, 1)"))
        .select("o_orderpriority", F.col("days").alias("p90_days"))
    )
    return (
        stats.join(p50, "o_orderpriority")
        .join(p90, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n",
            "min_days",
            "p50_days",
            "p90_days",
            "max_days",
        )
        .orderBy("o_orderpriority")
    )


ORACLE_ORDERS_FULFILLMENT_LATENCY = """
WITH lat AS (
  SELECT o.o_orderpriority,
         CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
              AS BIGINT) AS days,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
ranked AS (
  SELECT o_orderpriority, days,
         row_number() OVER (PARTITION BY o_orderpriority
           ORDER BY days, l_orderkey, l_linenumber) AS rn
  FROM lat),
stats AS (
  SELECT o_orderpriority, count(*) AS n,
         min(days) AS min_days, max(days) AS max_days
  FROM lat GROUP BY 1),
p50 AS (
  SELECT r.o_orderpriority, r.days AS p50_days
  FROM ranked r JOIN stats s USING (o_orderpriority)
  WHERE r.rn = (s.n + 1) // 2),
p90 AS (
  SELECT r.o_orderpriority, r.days AS p90_days
  FROM ranked r JOIN stats s USING (o_orderpriority)
  WHERE r.rn = greatest(9 * s.n // 10, 1))
SELECT s.o_orderpriority, s.n, s.min_days, p50.p50_days, p90.p90_days,
       s.max_days
FROM stats s
JOIN p50 USING (o_orderpriority)
JOIN p90 USING (o_orderpriority)
ORDER BY o_orderpriority
"""


QUERIES["orders_fulfillment_latency"] = q_orders_fulfillment_latency
ORACLES["orders_fulfillment_latency"] = ORACLE_ORDERS_FULFILLMENT_LATENCY
