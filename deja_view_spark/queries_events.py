"""Event/relational query registry: discussions-metrics analogs (WoW
windows, rate math with zero guards — reference discussions_metrics.py),
sessionization (lag windows), JSON extraction, multi-join TPC-H-Q5
shape, and A1-style distinct-collect stats."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deja_view_spark.sources.catalog import load_table


# ------------------------------------------------------------ WoW metrics (A5/A6)
def q_events_wow_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """This-week vs last-week counts anchored at max(ts), WoW % with
    the reference's divide-by-zero guard (discussions_metrics.py:
    95-114): one scan, conditional sums, broadcast scalar anchor."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("anchor"))
    j = ev.crossJoin(F.broadcast(anchor))
    wk1 = F.col("ts") >= F.col("anchor") - F.expr("INTERVAL 7 DAYS")
    wk2 = (F.col("ts") >= F.col("anchor") - F.expr("INTERVAL 14 DAYS")) & ~wk1
    # avg in exact BIGINT tick space (round-4 hardening): double
    # avg/sum accumulation order differs across engines; 4dp half-up
    # via half-up tick division, sign-correct: abs-space DIV with the
    # sign reapplied, so Spark DIV (truncate) == DuckDB // (floor) on
    # the nonneg dividend and ties round away from zero like round()
    # in both engines; one exact division at the end
    agg = j.agg(
        F.sum(wk1.cast("long")).alias("this_week"),
        F.sum(wk2.cast("long")).alias("last_week"),
        F.sum(
            F.round(F.col("value") * 10000, 0).cast("bigint")
        ).alias("svt"),
        F.count("*").alias("total"),
    ).withColumn(
        "avg_value",
        F.expr(
            "CASE WHEN svt < 0 THEN -((-2 * svt + total) DIV (2 * total)) ELSE (2 * svt + total) DIV (2 * total) END"
        ).cast("double")
        / 10000.0,
    )
    change = F.col("this_week") - F.col("last_week")
    pct = F.when(
        F.col("last_week") == 0,
        F.when(F.col("this_week") > 0, F.lit(100.0)).otherwise(F.lit(0.0)),
    ).otherwise(F.round(change * 100.0 / F.col("last_week"), 4))
    return agg.select(
        "this_week",
        "last_week",
        change.alias("wow_change"),
        pct.alias("wow_pct"),
        "avg_value",
        "total",
    )


ORACLE_EVENTS_WOW = """
WITH a AS (SELECT max(ts) AS anchor FROM events),
c AS (
  SELECT
    CAST(sum(CASE WHEN ts >= anchor - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS this_week,
    CAST(sum(CASE WHEN ts >= anchor - INTERVAL 14 DAY
              AND ts < anchor - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS last_week,
    CAST((CASE WHEN sum(CAST(round(value * 10000, 0) AS BIGINT)) < 0
           THEN -((-2 * CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT)
                   + count(*)) // (2 * count(*)))
           ELSE (2 * CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT)
                 + count(*)) // (2 * count(*)) END) AS DOUBLE) / 10000.0 AS avg_value,
    count(*) AS total
  FROM events, a)
SELECT this_week, last_week,
       this_week - last_week AS wow_change,
       CASE WHEN last_week = 0 THEN (CASE WHEN this_week > 0 THEN 100.0 ELSE 0.0 END)
            ELSE round((this_week - last_week) * 100.0 / last_week, 4) END AS wow_pct,
       avg_value, total
FROM c
"""


# ------------------------------------------------------------- sessionization
def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize per user with a 30-min inactivity gap (lag window +
    running sum — the classic streaming-session shape executed as a
    batch window): sessions and events per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_flag = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        with_flag.groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


ORACLE_EVENTS_SESSIONS = """
WITH g AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id,
       CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM g GROUP BY user_id ORDER BY user_id
"""


# ------------------------------------------------------------ JSON extraction
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: extract $.k, aggregate per
    event_type (JSON path pushdown stays JVM-side via get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


ORACLE_EVENTS_JSON = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------- multi-join (Q5 shape)
def q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with dims broadcast, fact-fact
    co-partitioned shuffle join on orderkey; tests Catalyst join
    ordering + broadcast selection at scale."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(nation),
            (supplier.s_nationkey == nation.n_nationkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("r_name", "n_name")
    )


ORACLE_REGIONAL_SUPPLIER = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey AND c_nationkey = s_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# --------------------------------------------------------------- corpus stats (A1)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-style stats row: counts + sorted distinct collections
    (reference get_stats, github_similarity_service.py:428-441) —
    array outputs joined to strings for cross-engine comparison."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("total_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.array_join(F.sort_array(F.collect_set("lang")), ",").alias("langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
    )


ORACLE_CORPUS_STATS = """
SELECT count(*) AS total_docs,
       count(DISTINCT lang) AS n_langs,
       (SELECT string_agg(lang, ',' ORDER BY lang)
        FROM (SELECT DISTINCT lang FROM documents)) AS langs,
       count(DISTINCT source) AS n_sources,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
"""


# ----------------------------------------------------------------- registry
# -------------------------------------------------- CUBE + grouping flags
def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, month): all four grouping-set combinations
    in ONE pass (Spark plans cube as an Expand + single hash aggregate,
    not four scans), with grouping() flags distinguishing the subtotal
    rows from genuine NULL keys — the multidimensional-report shape."""
    ev = load_table(spark, sf_dir, "events")
    month = F.month("ts").alias("month")
    return (
        ev.select(
            "event_type",
            month,
            # exact BIGINT ticks pre-cube (round-4 hardening): the 2dp
            # cell total is integer half-up of the tick sum, immune to
            # double accumulation order across engines
            F.round(F.col("value") * 10000, 0).cast("bigint").alias("vt"),
        )
        .cube("event_type", "month")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("month").cast("int").alias("g_month"),
            F.count("*").alias("n"),
            (
                F.expr(
                    "CASE WHEN sum(vt) < 0"
                    " THEN -((-2 * sum(vt) + 100) DIV 200)"
                    " ELSE (2 * sum(vt) + 100) DIV 200 END"
                ).cast("double")
                / 100.0
            ).alias("total_value"),
        )
        .select(
            "event_type", "month", "g_type", "g_month", "n", "total_value"
        )
        .orderBy("g_type", "g_month", "event_type", "month")
    )


ORACLE_EVENTS_CUBE = """
SELECT event_type, month,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(month) AS INTEGER) AS g_month,
       count(*) AS n,
       CAST((CASE WHEN sum(vt) < 0
              THEN -((-2 * CAST(sum(vt) AS BIGINT) + 100) // 200)
              ELSE (2 * CAST(sum(vt) AS BIGINT) + 100) // 200 END)
            AS DOUBLE) / 100.0
         AS total_value
FROM (SELECT event_type, month(ts) AS month,
             CAST(round(value * 10000, 0) AS BIGINT) AS vt FROM events)
GROUP BY CUBE (event_type, month)
ORDER BY g_type, g_month, event_type, month
"""


# ------------------------------------------------------------------ PIVOT
PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly activity matrix: groupBy(week).pivot(event_type, FIXED
    value list) — the fixed list keeps the output schema deterministic
    (no schema-inference scan) and pivot compiles to one hash aggregate
    with conditional counts, exactly the oracle's CASE sums."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).alias("week")
    out = (
        ev.select(week, "event_type")
        .groupBy("week")
        .pivot("event_type", PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, PIVOT_TYPES)
        .orderBy("week")
    )
    return out


ORACLE_EVENTS_PIVOT = f"""
SELECT date_trunc('week', ts) AS week,
       {", ".join(
           f"CAST(coalesce(sum(CASE WHEN event_type = '{t}' THEN 1 END), 0)"
           f" AS BIGINT) AS {t}" for t in PIVOT_TYPES)}
FROM events
GROUP BY 1
ORDER BY week
"""


QUERIES = {
    "events_cube": q_events_cube,
    "events_pivot": q_events_pivot,
    "events_wow_metrics": q_events_wow_metrics,
    "events_sessions": q_events_sessions,
    "events_json_props": q_events_json_props,
    "regional_supplier_volume": q_regional_supplier_volume,
    "corpus_stats": q_corpus_stats,
}

ORACLES = {
    "events_cube": ORACLE_EVENTS_CUBE,
    "events_pivot": ORACLE_EVENTS_PIVOT,
    "events_wow_metrics": ORACLE_EVENTS_WOW,
    "events_sessions": ORACLE_EVENTS_SESSIONS,
    "events_json_props": ORACLE_EVENTS_JSON,
    "regional_supplier_volume": ORACLE_REGIONAL_SUPPLIER,
    "corpus_stats": ORACLE_CORPUS_STATS,
}


# ----------------------------------------------------- release tiers (F15/A8/A9)
_TIER_ALIASES = {
    1: ["tier 1", "tier-1", "tier1"],
    2: ["tier 2", "tier-2", "tier2"],
    3: ["tier 3", "tier-3", "tier3"],
}
_LABEL_CHOICES = [
    "Tier 1", "tier-2", "TIER3", "bug", "enhancement", "tier 2", "docs",
]


def q_release_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference release-notes tier classification (release_notes.py:
    26-30,94-107): first tier whose alias set intersects the item's
    labels case-insensitively, else tier 0; per-tier counts + sorted
    distinct contributor set (A8/A9). Labels synthesized
    deterministically from doc_id (the corpus has no label column)."""
    docs = load_table(spark, sf_dir, "documents")
    label = F.element_at(
        F.array(*[F.lit(x) for x in _LABEL_CHOICES]),
        (F.col("doc_id") % len(_LABEL_CHOICES) + 1).cast("int"),
    )
    lowered = F.lower(label)
    tier = (
        F.when(lowered.isin(_TIER_ALIASES[1]), 1)
        .when(lowered.isin(_TIER_ALIASES[2]), 2)
        .when(lowered.isin(_TIER_ALIASES[3]), 3)
        .otherwise(0)
    )
    return (
        docs.select(tier.alias("tier"), F.col("source").alias("author"))
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_items"),
            F.array_join(F.sort_array(F.collect_set("author")), ",").alias(
                "contributors"
            ),
        )
        .orderBy("tier")
    )


def _sql_tier_aliases(t: int) -> str:
    return ", ".join(f"'{a}'" for a in _TIER_ALIASES[t])


ORACLE_RELEASE_TIERS = f"""
WITH labeled AS (
  SELECT source AS author,
         lower((ARRAY[{", ".join(f"'{x}'" for x in _LABEL_CHOICES)}])
               [CAST(doc_id % {len(_LABEL_CHOICES)} + 1 AS INT)]) AS lbl
  FROM documents),
tiered AS (
  SELECT author,
         CASE WHEN lbl IN ({_sql_tier_aliases(1)}) THEN 1
              WHEN lbl IN ({_sql_tier_aliases(2)}) THEN 2
              WHEN lbl IN ({_sql_tier_aliases(3)}) THEN 3
              ELSE 0 END AS tier
  FROM labeled)
SELECT tier, count(*) AS n_items,
       (SELECT string_agg(a, ',' ORDER BY a)
        FROM (SELECT DISTINCT author AS a FROM tiered i WHERE i.tier = o.tier)) AS contributors
FROM tiered o
GROUP BY tier
ORDER BY tier
"""


QUERIES["release_tiers"] = q_release_tiers
ORACLES["release_tiers"] = ORACLE_RELEASE_TIERS


# ---------------------------------------------------- F11 timestamp parsing
def q_events_ts_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 ISO-8601/Z timestamp round-trip (reference
    discussions_metrics.py:97 `fromisoformat(createdAt.replace('Z',
    '+00:00'))`): format each event ts as the ISO/Z wire string, parse
    it back with an explicit pattern, and verify second-granularity
    equality per event_type. The testdata ships typed timestamps, so
    the wire string is synthesized — the operator under test is the
    parse."""
    ev = load_table(spark, sf_dir, "events")
    iso = F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    parsed = F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return (
        ev.select(
            "event_type",
            parsed.alias("parsed"),
            (parsed == F.date_trunc("second", F.col("ts"))).alias("ok"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("ok").cast("long")).alias("n_roundtrip_exact"),
            F.max("parsed").alias("max_parsed"),
        )
        .orderBy("event_type")
    )


ORACLE_EVENTS_TS_PARSE = """
WITH w AS (
  SELECT event_type,
         strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'),
                  '%Y-%m-%dT%H:%M:%SZ') AS parsed,
         (strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'),
                   '%Y-%m-%dT%H:%M:%SZ') = date_trunc('second', ts)) AS ok
  FROM events)
SELECT event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_exact,
       max(parsed) AS max_parsed
FROM w
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["events_ts_parse"] = q_events_ts_parse
ORACLES["events_ts_parse"] = ORACLE_EVENTS_TS_PARSE


# ------------------------------------------- RANGE-frame moving average
# Window-FRAME coverage: a RANGE frame over an integer day key (7-day
# trailing moving average) plus a ROWS-unbounded running cumulative sum
# in the same window spec family. The RANGE frame is keyed on an
# integer day ordinal, not an interval literal, so Spark
# (rangeBetween(-6, 0)) and DuckDB (RANGE BETWEEN 6 PRECEDING AND
# CURRENT ROW) agree exactly; float outputs are rounded. Scale shape:
# one partial-agg shuffle to the per-(user, day) grain, then windows
# partitioned BY USER — parallel across users, never a global sort.
MOVAVG_MAX_USER = 30


def q_events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id") < MOVAVG_MAX_USER
    )
    # exact-integer discipline (round-4 hardening, the
    # events_anomalies precedent): day values are summed as BIGINT
    # 1e-4 ticks — double sums are accumulation-order-dependent
    # across engines (DuckDB segment-tree frames vs Spark's) and
    # Spark's round(double) rounds the Double.toString shortest repr
    # where DuckDB rounds the binary value, so both the daily sum and
    # the windowed average stay in integer space until one
    # exact-input division at the end; 4dp half-up via
    # sign-correct half-up tick division (abs-space DIV, sign
    # reapplied — truncate == floor on the nonneg dividend).
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.round(F.col("value") * 10000, 0).cast("bigint")
        ).alias("dvt"),
    ).withColumn("day_ord", F.datediff("day", F.lit("1970-01-01")))
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("day_ord")
        .rangeBetween(-6, 0)
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("day_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win = daily.select(
        "user_id",
        "day",
        "n_events",
        F.sum("dvt").over(w7).alias("s7"),
        F.count("dvt").over(w7).alias("n7"),
        F.sum("n_events").over(wcum).alias("cum_events"),
    )
    return (
        win.select(
            "user_id",
            "day",
            "n_events",
            (
                F.expr(
                    "CASE WHEN s7 < 0 THEN -((-2 * s7 + n7) DIV (2 * n7)) ELSE (2 * s7 + n7) DIV (2 * n7) END"
                ).cast("double")
                / 10000.0
            ).alias("ma7_value"),
            "cum_events",
        )
        .orderBy("user_id", "day")
    )


ORACLE_EVENTS_MOVING_AVG = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         count(*) AS n_events,
         CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT)
           AS dvt,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_ord
  FROM events
  WHERE user_id < {MOVAVG_MAX_USER}
  GROUP BY user_id, CAST(ts AS DATE)),
win AS (
  SELECT user_id, day, n_events,
         CAST(sum(dvt) OVER w7 AS BIGINT) AS s7,
         count(dvt) OVER w7 AS n7,
         CAST(sum(n_events) OVER (
           PARTITION BY user_id ORDER BY day_ord
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_events
  FROM daily
  WINDOW w7 AS (
    PARTITION BY user_id ORDER BY day_ord
    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT user_id, day, n_events,
       CAST((CASE WHEN s7 < 0 THEN -((-2 * s7 + n7) // (2 * n7)) ELSE (2 * s7 + n7) // (2 * n7) END) AS DOUBLE) / 10000.0 AS ma7_value,
       cum_events
FROM win
ORDER BY user_id, day
"""

QUERIES["events_moving_avg"] = q_events_moving_avg
ORACLES["events_moving_avg"] = ORACLE_EVENTS_MOVING_AVG


# ------------------------------------------------------- FULL OUTER join
# Join-type coverage: FULL OUTER between two per-user aggregates with
# asymmetric membership (heavy clickers vs heavy purchasers), the
# "compare two cohorts, keep everyone" report shape. Scale shape: both
# sides partial-aggregate before the join, the join shuffles on the
# user key; at 100 TB this is the same co-partitioned SMJ as any
# fact-fact equi-join (or a bucketed exchange-free one, see
# sources/bucketed.py).
COHORT_MIN = 15


def q_events_cohort_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
        .where(F.col("n_clicks") >= COHORT_MIN)
    )
    buys = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"))
        .where(F.col("n_purchases") >= COHORT_MIN)
    )
    joined = clicks.join(buys, "user_id", "full_outer")
    status = (
        F.when(F.col("n_clicks").isNull(), F.lit("purchase_only"))
        .when(F.col("n_purchases").isNull(), F.lit("click_only"))
        .otherwise(F.lit("both"))
    )
    return (
        joined.select(
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            status.alias("status"),
        )
        .orderBy("user_id")
    )


ORACLE_EVENTS_COHORT_FULL_OUTER = f"""
WITH clicks AS (
  SELECT user_id, count(*) AS n_clicks FROM events
  WHERE event_type = 'click' GROUP BY user_id
  HAVING count(*) >= {COHORT_MIN}),
buys AS (
  SELECT user_id, count(*) AS n_purchases FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
  HAVING count(*) >= {COHORT_MIN})
SELECT coalesce(c.user_id, b.user_id) AS user_id,
       coalesce(n_clicks, 0) AS n_clicks,
       coalesce(n_purchases, 0) AS n_purchases,
       CASE WHEN c.user_id IS NULL THEN 'purchase_only'
            WHEN b.user_id IS NULL THEN 'click_only'
            ELSE 'both' END AS status
FROM clicks c FULL OUTER JOIN buys b ON c.user_id = b.user_id
ORDER BY user_id
"""

QUERIES["events_cohort_full_outer"] = q_events_cohort_full_outer
ORACLES["events_cohort_full_outer"] = ORACLE_EVENTS_COHORT_FULL_OUTER


# ----------------------------------------- ranking-function breadth
# The remaining window-ranking functions in one query: per event-type
# user leaderboards with rank (gapped), dense_rank (gapless),
# percent_rank (float, rounded) and ntile(4) quartile buckets over the
# per-user event count. Scale shape: one partial-agg shuffle to the
# (type, user) grain, then ONE window pass per partition key — all
# four functions share the same window spec, so Catalyst evaluates
# them in a single Window operator with one sort.
def q_events_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n"), F.asc("user_id")
    )
    return (
        per_user.select(
            "event_type",
            "user_id",
            "n",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .where(F.col("rnk") <= 25)
        .orderBy("event_type", "rnk", "user_id")
    )


ORACLE_EVENTS_RANK_FUNCTIONS = """
WITH per_user AS (
  SELECT event_type, user_id, count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, user_id, n, rnk, drnk, prnk, quartile
FROM (
  SELECT event_type, user_id, n,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         round(percent_rank() OVER w, 6) AS prnk,
         ntile(4) OVER w AS quartile
  FROM per_user
  WINDOW w AS (PARTITION BY event_type ORDER BY n DESC, user_id ASC)) t
WHERE rnk <= 25
ORDER BY event_type, rnk, user_id
"""

QUERIES["events_rank_functions"] = q_events_rank_functions
ORACLES["events_rank_functions"] = ORACLE_EVENTS_RANK_FUNCTIONS


# -------------------------------------------------- z-order layout stats
# Driver-checkable form of the Morton-layout operator
# (operators/layout.py): bucket events by the top bits of the
# z-interleave of (user_id, day ordinal) and report each bucket's
# per-dimension min/max spans — the exact statistics a file-level
# pruner would consult. Under z-clustering BOTH dimensions' spans are
# bounded per bucket (each bucket is a quad-tree cell); under a
# single-column sort the other dimension's span stays full-range
# (asserted in tests/test_layout.py). Integer-only, no floats.
ZORDER_BUCKET_BITS = 4  # 16 buckets = top 4 bits of the 32-bit z key


def q_events_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deja_view_spark.operators.layout import ZBITS, scale_sql, zvalue_sql

    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.col("user_id").alias("u"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
    )
    # min/max scaling to fill the bit width (broadcast single-row agg,
    # never a collect) — without it the interleave's high bits are the
    # constant high-order zeros of narrow-range dims and every row
    # lands in one bucket
    bounds = keyed.agg(
        F.min("u").alias("u_lo"), F.max("u").alias("u_hi"),
        F.min("d").alias("d_lo"), F.max("d").alias("d_hi"),
    )
    scaled = keyed.crossJoin(F.broadcast(bounds)).select(
        "u",
        "d",
        F.expr(scale_sql("u", "u_lo", "u_hi")).alias("su"),
        F.expr(scale_sql("d", "d_lo", "d_hi")).alias("sd"),
    )
    zk = scaled.select("u", "d", F.expr(zvalue_sql(["su", "sd"])).alias("z"))
    bucket = F.shiftright("z", 2 * ZBITS - ZORDER_BUCKET_BITS).alias("bucket")
    return (
        zk.groupBy(bucket)
        .agg(
            F.count("*").alias("n"),
            F.min("u").alias("u_min"),
            F.max("u").alias("u_max"),
            F.min("d").alias("d_min"),
            F.max("d").alias("d_max"),
        )
        .orderBy("bucket")
    )


def _oracle_zorder() -> str:
    from deja_view_spark.operators.layout import ZBITS, scale_sql, zvalue_sql

    z = zvalue_sql(["su", "sd"])
    return f"""
WITH keyed AS (
  SELECT user_id AS u,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
  FROM events),
bounds AS (
  SELECT min(u) AS u_lo, max(u) AS u_hi, min(d) AS d_lo, max(d) AS d_hi
  FROM keyed),
scaled AS (
  SELECT u, d,
         {scale_sql('u', 'u_lo', 'u_hi')} AS su,
         {scale_sql('d', 'd_lo', 'd_hi')} AS sd
  FROM keyed CROSS JOIN bounds),
zk AS (SELECT u, d, {z} AS z FROM scaled)
SELECT (z >> {2 * ZBITS - ZORDER_BUCKET_BITS}) AS bucket,
       count(*) AS n,
       min(u) AS u_min, max(u) AS u_max,
       min(d) AS d_min, max(d) AS d_max
FROM zk
GROUP BY bucket
ORDER BY bucket
"""


ORACLE_EVENTS_ZORDER = _oracle_zorder()

QUERIES["events_zorder_stats"] = q_events_zorder_stats
ORACLES["events_zorder_stats"] = ORACLE_EVENTS_ZORDER


# ------------------------------------------------ SCD-1 latest state
# Aggregate-function breadth: max_by / min_by (DuckDB arg_max /
# arg_min) keyed on the event epoch — the "current state per entity"
# upsert-view a mutable-table MERGE would maintain, computed instead as
# one partial-agg pass over the immutable log (the lakehouse way). The
# ordering key is zero-padded unix_micros(ts) concatenated with the
# zero-padded UNIQUE event_id: a fixed-width ASCII string whose binary
# comparison equals (ts, event_id) numeric order in both engines, so
# the argmax is a TOTAL order — deterministic even if a source ever
# emits (user_id, ts) ties (round-3 hardening; the previous key relied
# on the corpus being tie-free, which is a data property, not a query
# property).
def q_events_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "tkey",
        F.concat(
            F.lpad(
                F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
                20,
                "0",
            ),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ),
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("max_by(event_type, tkey)").alias("last_type"),
            F.round(F.expr("max_by(value, tkey)"), 4).alias("last_value"),
            F.expr("min_by(event_type, tkey)").alias("first_type"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


ORACLE_EVENTS_LATEST_STATE = """
WITH keyed AS (
  SELECT *,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS tkey
  FROM events)
SELECT user_id,
       count(*) AS n_events,
       arg_max(event_type, tkey) AS last_type,
       round(arg_max(value, tkey), 4) AS last_value,
       arg_min(event_type, tkey) AS first_type,
       max(ts) AS last_ts
FROM keyed
GROUP BY user_id
ORDER BY user_id
"""

QUERIES["events_latest_state"] = q_events_latest_state
ORACLES["events_latest_state"] = ORACLE_EVENTS_LATEST_STATE


# ----------------------------------------------------------------- funnel
# Ordered conversion funnel view -> click -> purchase: the first view
# starts the funnel, then the first click STRICTLY after it, then the
# first purchase strictly after that. Computed as ONE shuffle: per-user
# sorted event array scanned left-to-right by a higher-order
# `aggregate` expression holding a 3-field timestamp state — entirely
# whole-stage-codegen, no UDF, no self-joins. The equivalent
# conditional-min join chain (t1 = min view; t2 = min click > t1;
# t3 = min purchase > t2 — the oracle's formulation) is the skew-safe
# fallback when a power-law user's event array would not fit a task;
# on this corpus the single-shuffle scan is strictly fewer exchanges
# (1 vs 3 + two joins).
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select(
        "user_id",
        F.struct(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.col("event_id").alias("event_id"),
            F.col("event_type").alias("event_type"),
        ).alias("e"),
    )

    def step(acc, e):
        t1, t2, t3 = acc["t1"], acc["t2"], acc["t3"]
        new_t1 = F.when(
            t1.isNull() & (e["event_type"] == "view"), e["us"]
        ).otherwise(t1)
        new_t2 = F.when(
            t2.isNull()
            & t1.isNotNull()
            & (e["event_type"] == "click")
            & (e["us"] > t1),
            e["us"],
        ).otherwise(t2)
        new_t3 = F.when(
            t3.isNull()
            & t2.isNotNull()
            & (e["event_type"] == "purchase")
            & (e["us"] > t2),
            e["us"],
        ).otherwise(t3)
        return F.struct(
            new_t1.alias("t1"), new_t2.alias("t2"), new_t3.alias("t3")
        )

    init = F.struct(
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("t2"),
        F.lit(None).cast("long").alias("t3"),
    )
    scanned = (
        rows.groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("es"))
        .select("user_id", F.aggregate("es", init, step).alias("s"))
    )
    t1, t2, t3 = F.col("s.t1"), F.col("s.t2"), F.col("s.t3")
    return scanned.select(
        "user_id",
        F.when(t3.isNotNull(), 3)
        .when(t2.isNotNull(), 2)
        .when(t1.isNotNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("reached"),
        t1.alias("view_us"),
        (t2 - t1).alias("click_gap_us"),
        (t3 - t2).alias("purchase_gap_us"),
    ).orderBy("user_id")


ORACLE_EVENTS_FUNNEL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
u AS (SELECT DISTINCT user_id FROM e),
s1 AS (
  SELECT user_id, min(us) AS t1 FROM e
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
  WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
  WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN t3 IS NOT NULL THEN 3
                 WHEN t2 IS NOT NULL THEN 2
                 WHEN t1 IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS reached,
       t1 AS view_us,
       t2 - t1 AS click_gap_us,
       t3 - t2 AS purchase_gap_us
FROM u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
ORDER BY user_id
"""

QUERIES["events_funnel"] = q_events_funnel
ORACLES["events_funnel"] = ORACLE_EVENTS_FUNNEL


# ------------------------------------------------- count-min sketch
# Frequency-estimation sibling of the KMV distinct sketch
# (docs_kmv_distinct): a d x w count-min table (Cormode &
# Muthukrishnan 2005) answers "how often did key X occur" in
# fixed memory when the key cardinality is too large to count
# exactly. The registry query builds the sketch AND audits it against
# the exact counts of the top items — surfacing the one-sided
# overestimate the sketch guarantees (est >= exact always; the oracle
# hash-check therefore certifies collision behavior bit-for-bit, which
# is why the bucket hash is the cross-engine md5-prefix, not
# engine-local xxhash).
CM_DEPTH = 4     # hash rows
CM_WIDTH = 64    # buckets per row
CM_TOP = 20      # audited heavy keys


def _cm_bucket(item, r: int):
    """Cross-engine bucket hash: first-8-hex-digit integer of
    md5(item || ':' || r), mod CM_WIDTH (same md5-prefix trick as the
    deterministic corpus splits)."""
    h = F.md5(
        F.concat(item.cast("string"), F.lit(f":{r}")).cast("binary")
    )
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CM_WIDTH
    )


def q_events_cm_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-CM_TOP items by exact frequency, each with its count-min
    estimate and the overestimate the sketch's collisions introduced.

    Scale shape: the sketch build explodes each occurrence into
    CM_DEPTH (row, bucket) cells and aggregates — map-side combine
    collapses every partition to <= d*w rows, so the shuffle carries
    sketch-sized, not corpus-sized, data. The d*w-row sketch table
    BROADCASTS to the audit side, where each candidate key's estimate
    is the fixed-order least() of its d looked-up cells. The exact
    top-k (one groupBy + TakeOrdered) exists to audit the sketch at
    registry scale; at 100 TB only the sketch and the candidate keys
    survive."""
    ev = load_table(spark, sf_dir, "events")
    item = F.get_json_object("props", "$.k").cast("long")
    occ = ev.select(item.alias("item"))
    cells = occ.select(
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
    sketch = cells.groupBy("c.r", "c.b").agg(F.count("*").alias("cnt"))
    exact = (
        occ.groupBy("item")
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("item"))
        .limit(CM_TOP)
    )
    est = exact
    for r in range(CM_DEPTH):
        lut = sketch.where(F.col("r") == r).select(
            F.col("b").alias(f"_b{r}"), F.col("cnt").alias(f"_c{r}")
        )
        est = est.withColumn(f"_b{r}", _cm_bucket(F.col("item"), r)).join(
            F.broadcast(lut), f"_b{r}"
        )
    cm = F.least(*[F.col(f"_c{r}") for r in range(CM_DEPTH)])
    return (
        est.select(
            "item",
            "exact_count",
            cm.alias("cm_estimate"),
            (cm - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_count"), F.asc("item"))
    )


def _oracle_cm_sketch() -> str:
    from deja_view_spark.functions.embedding import duckdb_hex_int_sql

    def bucket(item_expr: str, r: int) -> str:
        h = f"md5({item_expr} || ':{r}')"
        return f"(({duckdb_hex_int_sql(h, 8)}) % {CM_WIDTH})"

    cells = " UNION ALL ".join(
        f"SELECT {r} AS r, {bucket('CAST(item AS VARCHAR)', r)} AS b "
        f"FROM occ"
        for r in range(CM_DEPTH)
    )
    ests = ", ".join(
        f"(SELECT cnt FROM sketch s WHERE s.r = {r} "
        f"AND s.b = {bucket('CAST(e.item AS VARCHAR)', r)}) "
        for r in range(CM_DEPTH)
    )
    return f"""
WITH occ AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events),
cells AS ({cells}),
sketch AS (
  SELECT r, b, count(*) AS cnt FROM cells GROUP BY r, b),
exact AS (
  SELECT item, count(*) AS exact_count FROM occ GROUP BY item
  ORDER BY exact_count DESC, item ASC LIMIT {CM_TOP})
SELECT e.item, e.exact_count,
       least({ests}) AS cm_estimate,
       least({ests}) - e.exact_count AS overestimate
FROM exact e
ORDER BY e.exact_count DESC, e.item ASC
"""


ORACLE_EVENTS_CM_SKETCH = _oracle_cm_sketch()

QUERIES["events_cm_sketch"] = q_events_cm_sketch
ORACLES["events_cm_sketch"] = ORACLE_EVENTS_CM_SKETCH


# ------------------------------------- sliding-window HLL state merge
# The production reason sketches exist in OLAP: per-PARTITION sketch
# state is computed once and any window query is answered by MERGING
# state, never rescanning events. Here: one dense-HLL register table
# per day over distinct (user, props) activity pairs; a trailing
# 7-day distinct estimate per day is then register-wise max over the
# window's days — the merge input is (days x 256) register rows,
# regardless of event volume. Exact trailing countDistinct rides
# along as the audit (it re-touches events and is exactly what the
# sketch DELETES at 100 TB). Shares the HLL construction (md5-60
# hash, integer rho chain, scaled-integer harmonic sum) with
# docs_hll_distinct so both engines agree bit-for-bit.
HLL_SLIDE_DAYS = 7


def q_events_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {HLL_SLIDE_DAYS}-day distinct-activity estimate per
    day from merged per-day HLL registers, audited against the exact
    trailing distinct.

    Scale shape: events are touched ONCE to build per-day registers
    (two cascaded partial aggs, shuffle carries at most
    days x {HLL_M} register rows); the sliding merge explodes each
    day's registers to the {HLL_SLIDE_DAYS} window ends it feeds —
    register-sized data times a constant — and one more partial agg
    takes the per-(end-day, register) max. No window function over
    events, no rescan per window position."""
    from deja_view_spark.queries_corpus import (
        HLL_M,
        HLL_P,
        HLL_W,
        _HLL_LC_CUT,
        _HLL_NUM,
        _hll_rho,
    )

    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit("|"), F.col("props"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    hv = ev.select(
        F.to_date("ts").alias("day"),
        (h % HLL_M).alias("reg"),
        _hll_rho(F.shiftright(h, HLL_P)).alias("rho"),
    )
    regs_day = hv.groupBy("day", "reg").agg(F.max("rho").alias("mr"))
    days = ev.select(F.to_date("ts").alias("end_day")).distinct()
    spread = regs_day.select(
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), HLL_SLIDE_DAYS - 1)
            )
        ).alias("end_day"),
        "reg",
        "mr",
    ).join(F.broadcast(days), "end_day")
    merged = spread.groupBy("end_day", "reg").agg(F.max("mr").alias("mr"))
    agg = merged.groupBy("end_day").agg(
        F.count("*").alias("cnt"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_W + 1} - mr)")).alias("s_hit"),
    )
    zero = HLL_M - F.col("cnt")
    s_int = F.col("s_hit") + zero.cast("long") * F.lit(1 << (HLL_W + 1))
    raw = F.lit(_HLL_NUM) / s_int.cast("double")
    est = F.when(
        (raw <= F.lit(_HLL_LC_CUT)) & (zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zero.cast("double")),
    ).otherwise(raw)
    # exact audit: one distinct over (day, pair-hash), exploded to the
    # window ends it feeds, then a per-end-day distinct count
    pairs_day = (
        ev.select(
            F.to_date("ts").alias("day"),
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"), F.lit("|"), F.col("props")
                )
            ).alias("ph"),
        )
        .distinct()
        .select(
            F.explode(
                F.sequence(
                    F.col("day"), F.date_add(F.col("day"), HLL_SLIDE_DAYS - 1)
                )
            ).alias("end_day"),
            "ph",
        )
        .join(F.broadcast(days), "end_day")
    )
    exact = pairs_day.groupBy("end_day").agg(
        F.countDistinct("ph").alias("exact_distinct")
    )
    return (
        agg.join(F.broadcast(exact), "end_day")
        .select(
            F.col("end_day").cast("string").alias("end_day"),
            F.col("cnt").cast("int").alias("registers_hit"),
            F.round(est, 4).alias("hll_est"),
            "exact_distinct",
            F.round(
                (est - F.col("exact_distinct")) / F.col("exact_distinct") * 100,
                4,
            ).alias("rel_err_pct"),
        )
        .orderBy("end_day")
    )


def _oracle_hll_sliding() -> str:
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
    return f"""
WITH e AS (
  SELECT CAST(ts AS DATE) AS day,
         md5(CAST(user_id AS VARCHAR) || '|' || props) AS mh
  FROM events),
days AS (SELECT DISTINCT day AS end_day FROM e),
hx AS (SELECT day, {_sql_hex60('mh')} AS h FROM e),
rv AS (SELECT day, h % {HLL_M} AS reg, h // {HLL_M} AS v FROM hx),
rr AS (SELECT day, reg, CASE {whens} ELSE {HLL_W + 1} END AS rho FROM rv),
regs_day AS (SELECT day, reg, max(rho) AS mr FROM rr GROUP BY 1, 2),
spread AS (
  SELECT CAST(unnest(generate_series(day, day + INTERVAL {HLL_SLIDE_DAYS - 1} DAY,
               INTERVAL 1 DAY)) AS DATE) AS end_day, reg, mr
  FROM regs_day),
merged AS (
  SELECT s.end_day, s.reg, max(s.mr) AS mr
  FROM spread s JOIN days USING (end_day) GROUP BY 1, 2),
agg AS (
  SELECT end_day, count(*) AS cnt,
         sum(1::BIGINT << ({HLL_W + 1} - mr)) AS s_hit
  FROM merged GROUP BY 1),
pd AS (SELECT DISTINCT day, mh FROM e),
pspread AS (
  SELECT CAST(unnest(generate_series(day, day + INTERVAL {HLL_SLIDE_DAYS - 1} DAY,
               INTERVAL 1 DAY)) AS DATE) AS end_day, mh
  FROM pd),
ex AS (
  SELECT p.end_day, count(DISTINCT mh) AS exact_distinct
  FROM pspread p JOIN days USING (end_day) GROUP BY 1),
fin AS (
  SELECT end_day, cnt, {HLL_M} - cnt AS vz,
         {_HLL_NUM!r} / CAST(s_hit + ({HLL_M} - cnt)
                             * (1::BIGINT << {HLL_W + 1}) AS DOUBLE) AS raw
  FROM agg),
est AS (
  SELECT end_day, cnt, vz,
         CASE WHEN raw <= {_HLL_LC_CUT!r} AND vz > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(vz AS DOUBLE))
              ELSE raw END AS e
  FROM fin)
SELECT CAST(e.end_day AS VARCHAR) AS end_day,
       CAST(cnt AS INT) AS registers_hit,
       round(e.e, 4) AS hll_est, ex.exact_distinct,
       round((e.e - ex.exact_distinct) / ex.exact_distinct * 100, 4)
         AS rel_err_pct
FROM est e JOIN ex USING (end_day)
ORDER BY end_day
"""


ORACLE_EVENTS_HLL_SLIDING = _oracle_hll_sliding()

QUERIES["events_hll_sliding"] = q_events_hll_sliding
ORACLES["events_hll_sliding"] = ORACLE_EVENTS_HLL_SLIDING


# ------------------------------------------- cohort retention matrix
# The classic product-analytics triangle: users grouped by first-seen
# week (their cohort), each later week of activity counted at its
# offset from the cohort week, retention = share of the cohort still
# active at that offset. Week bucketing is date_trunc('week') in both
# engines (ISO Monday start in Spark and DuckDB alike), offsets are
# integer day-diffs DIV 7 — no float, no timezone arithmetic.
def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort x offset retention matrix.

    Scale shape: ONE distinct over (user, week) fixed-width rows; the
    per-user cohort week is a partial-agg min; activity joins its
    cohort on user_id (the only wide shuffle — at 100 TB, both sides
    arrive bucketed by user_id); the (cohort, offset) matrix and the
    cohort-size attach are metadata-sized broadcast joins. No window
    function, no events rescan per offset."""
    ev = load_table(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    cohorts = weeks.groupBy("user_id").agg(F.min("wk").alias("cwk"))
    acts = weeks.join(cohorts, "user_id").select(
        "cwk",
        (F.datediff(F.col("wk"), F.col("cwk")) / 7).cast("int").alias("offset"),
        "user_id",
    )
    matrix = acts.groupBy("cwk", "offset").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    base = matrix.where(F.col("offset") == 0).select(
        "cwk", F.col("n_users").alias("_cohort_size")
    )
    return (
        matrix.join(F.broadcast(base), "cwk")
        .select(
            F.col("cwk").cast("string").alias("cohort_week"),
            "offset",
            "n_users",
            F.col("_cohort_size").alias("cohort_size"),
            F.round(F.col("n_users") / F.col("_cohort_size"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "offset")
    )


ORACLE_EVENTS_COHORT_RETENTION = """
WITH weeks AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events),
cohorts AS (SELECT user_id, min(wk) AS cwk FROM weeks GROUP BY user_id),
acts AS (
  SELECT c.cwk, CAST(datediff('day', c.cwk, w.wk) // 7 AS INT) AS "offset",
         w.user_id
  FROM weeks w JOIN cohorts c USING (user_id)),
matrix AS (
  SELECT cwk, "offset", count(DISTINCT user_id) AS n_users
  FROM acts GROUP BY 1, 2),
base AS (SELECT cwk, n_users AS cohort_size FROM matrix WHERE "offset" = 0)
SELECT CAST(m.cwk AS VARCHAR) AS cohort_week, m."offset" AS offset,
       m.n_users, b.cohort_size,
       round(m.n_users * 1.0 / b.cohort_size, 4) AS retention
FROM matrix m JOIN base b USING (cwk)
ORDER BY cohort_week, m."offset"
"""

QUERIES["events_cohort_retention"] = q_events_cohort_retention
ORACLES["events_cohort_retention"] = ORACLE_EVENTS_COHORT_RETENTION


# ------------------------------------------- sweep-line peak concurrency
# Interval analytics WITHOUT an interval join: materialize each
# session as +1/-1 boundary deltas and take a running sum in time
# order — the sweep line. Max concurrent sessions per day, with the
# earliest instant the peak is reached. The join-free shape matters at
# scale: the naive formulation is an interval self-join (quadratic on
# busy windows); the sweep is two window passes over boundary rows.
# Sessions are the q_events_sessions 30-min-gap islands; they are
# CLIPPED to day boundaries so the sweep's running sum partitions by
# day (distributed, never a SinglePartition global sort) — the
# documented semantics is per-day concurrency with cross-midnight
# sessions contributing to both days.
def q_events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day peak concurrent sessions (sweep line over session
    boundary deltas), with the earliest peak instant.

    Scale shape: session assembly is the per-user lag+cumsum window
    (hashpartitioning(user_id)); boundary deltas explode to at most
    2 x sessions x days-spanned rows; the sweep's running sum windows
    partition BY DAY — each day's boundary stream is one partition's
    sort, bounded by that day's sessions, never a global single
    sort. Ties: at an equal instant, ends (-1) process before starts
    (+1), then user_id — the closed-open [start, end) convention."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    # order the session-id cumsum on MICROSECONDS (+ event_id): two
    # events of one user inside the same truncated second must
    # accumulate flags in the same order the flags were assigned, or
    # a tie could split a session differently per engine
    flagged = ev.select(
        "user_id",
        epoch.alias("sec"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("usec"),
        "event_id",
        F.when(gap.isNull() | (gap > 1800), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sid = F.sum("new_session").over(
        Window.partitionBy("user_id")
        .orderBy("usec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = (
        flagged.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(F.min("sec").alias("s"), (F.max("sec") + 1).alias("e"))
    )
    # clip to day boundaries: one output interval per covered day
    day0 = (F.col("s") - F.col("s") % 86400).alias("d0")
    days = F.sequence(
        F.col("s") - F.col("s") % 86400,
        (F.col("e") - 1) - (F.col("e") - 1) % 86400,
        F.lit(86400),
    )
    clipped = sessions.select(
        "user_id",
        F.explode(days).alias("day_sec"),
        "s",
        "e",
    ).select(
        "user_id",
        "day_sec",
        F.greatest("s", "day_sec").alias("cs"),
        F.least("e", F.col("day_sec") + 86400).alias("ce"),
    )
    deltas = clipped.select(
        "day_sec", F.col("cs").alias("t"), F.lit(1).alias("d"), "user_id"
    ).unionByName(
        clipped.select(
            "day_sec", F.col("ce").alias("t"), F.lit(-1).alias("d"), "user_id"
        )
    )
    sweep = Window.partitionBy("day_sec").orderBy("t", "d", "user_id")
    run = deltas.withColumn(
        "conc",
        F.sum("d").over(sweep.rowsBetween(Window.unboundedPreceding, 0)),
    )
    run = run.withColumn(
        "day_max", F.max("conc").over(Window.partitionBy("day_sec"))
    )
    return (
        run.groupBy("day_sec")
        .agg(
            F.max("conc").alias("peak_concurrency"),
            F.min(
                F.when(F.col("conc") == F.col("day_max"), F.col("t"))
            ).alias("peak_sec"),
            F.count("*").alias("n_boundaries"),
        )
        .select(
            F.from_unixtime("day_sec").cast("date").cast("string").alias("day"),
            "peak_concurrency",
            "peak_sec",
            (F.col("n_boundaries") / 2).cast("long").alias("n_sessions"),
        )
        .orderBy("day")
    )


ORACLE_EVENTS_PEAK_CONCURRENCY = """
WITH g AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS sec,
         epoch_us(ts) AS usec, event_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sids AS (
  SELECT user_id, sec,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY usec, event_id
           ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
sessions AS (
  SELECT user_id, sid, min(sec) AS s, max(sec) + 1 AS e
  FROM sids GROUP BY user_id, sid),
clipped AS (
  SELECT user_id, day_sec,
         greatest(s, day_sec) AS cs,
         least(e, day_sec + 86400) AS ce
  FROM (
    SELECT user_id, s, e,
           unnest(generate_series(s - s % 86400,
                                  (e - 1) - (e - 1) % 86400,
                                  86400)) AS day_sec
    FROM sessions)),
deltas AS (
  SELECT day_sec, cs AS t, 1 AS d, user_id FROM clipped
  UNION ALL
  SELECT day_sec, ce AS t, -1 AS d, user_id FROM clipped),
run AS (
  SELECT day_sec, t, d,
         sum(d) OVER (
           PARTITION BY day_sec ORDER BY t, d, user_id
           ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas),
run2 AS (
  SELECT *, max(conc) OVER (PARTITION BY day_sec) AS day_max FROM run),
peaks AS (
  SELECT day_sec,
         max(conc) AS peak_concurrency,
         min(CASE WHEN conc = day_max THEN t END) AS peak_sec,
         count(*) AS n_boundaries
  FROM run2 GROUP BY day_sec)
SELECT CAST(CAST(to_timestamp(day_sec) AS DATE) AS VARCHAR) AS day,
       CAST(peak_concurrency AS BIGINT) AS peak_concurrency,
       CAST(peak_sec AS BIGINT) AS peak_sec,
       CAST(n_boundaries / 2 AS BIGINT) AS n_sessions
FROM peaks ORDER BY day
"""

QUERIES["events_peak_concurrency"] = q_events_peak_concurrency
ORACLES["events_peak_concurrency"] = ORACLE_EVENTS_PEAK_CONCURRENCY


# --------------------------------------------- bitmap audience overlap
# The bitmap-index segmentation pattern (roaring-bitmap OLAP, fixed
# 32-bit words here): each behavioral segment (event_type) keeps one
# bitmap over the user-id domain — (word = id DIV 32, bits = OR of
# 1 << id % 32) — and every audience question (who did A and B? A or
# B? Jaccard between segments?) is answered by WORD-WISE bitwise ops
# over segment bitmaps, never by re-touching events or distinct-
# joining user sets. Exact (not a sketch), mergeable (bit_or is
# associative), and the state is |users|/32 words per segment.
def q_events_bitmap_audience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event-type segments from
    word-partitioned user bitmaps: exact distinct users per segment,
    intersection / union / Jaccard per segment pair.

    Scale shape: events reduce ONCE to (segment, word) bitmap rows
    (distinct + bit_or partial aggs — map-side combine does the
    heavy lifting); every overlap then joins bitmap WORDS on the word
    key (rows = users/32 per segment) and folds bit_count — the
    canonical audience-segmentation plan at any scale."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("seg"), "user_id"
    ).distinct()
    bm = (
        base.select(
            "seg",
            (F.col("user_id") / 32).cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(user_id % 32 AS INT))").alias("bit"),
        )
        .groupBy("seg", "word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .localCheckpoint(eager=False)
    )
    sizes = bm.groupBy("seg").agg(
        F.sum(F.bit_count("bits")).alias("n")
    )
    a = bm.select(
        F.col("seg").alias("seg_a"), "word", F.col("bits").alias("ba")
    )
    b = bm.select(
        F.col("seg").alias("seg_b"), "word", F.col("bits").alias("bb")
    )
    both = (
        a.join(b, "word")
        .where(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(
            F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb")))).alias(
                "n_both"
            )
        )
    )
    na = sizes.select(F.col("seg").alias("seg_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("seg").alias("seg_b"), F.col("n").alias("n_b"))
    return (
        both.join(F.broadcast(na), "seg_a")
        .join(F.broadcast(nb), "seg_b")
        .select(
            "seg_a",
            "seg_b",
            "n_a",
            "n_b",
            "n_both",
            (F.col("n_a") + F.col("n_b") - F.col("n_both")).alias("n_either"),
            F.round(
                F.col("n_both")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("seg_a", "seg_b")
    )


ORACLE_EVENTS_BITMAP_AUDIENCE = """
WITH base AS (SELECT DISTINCT event_type AS seg, user_id FROM events),
bm AS (
  SELECT seg, user_id // 32 AS word,
         bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bits
  FROM base GROUP BY 1, 2),
sizes AS (SELECT seg, sum(bit_count(bits)) AS n FROM bm GROUP BY seg),
ovl AS (
  SELECT a.seg AS seg_a, b.seg AS seg_b,
         sum(bit_count(a.bits & b.bits)) AS n_both
  FROM bm a JOIN bm b ON a.word = b.word AND a.seg < b.seg
  GROUP BY 1, 2)
SELECT seg_a, seg_b,
       CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
       CAST(n_both AS BIGINT) AS n_both,
       CAST(na.n + nb.n - n_both AS BIGINT) AS n_either,
       round(n_both * 1.0 / (na.n + nb.n - n_both), 4) AS jaccard
FROM ovl
JOIN sizes na ON seg_a = na.seg
JOIN sizes nb ON seg_b = nb.seg
ORDER BY seg_a, seg_b
"""

QUERIES["events_bitmap_audience"] = q_events_bitmap_audience
ORACLES["events_bitmap_audience"] = ORACLE_EVENTS_BITMAP_AUDIENCE


# ------------------------------------------------- SCD-2 history build
# The warehouse history table: collapse the immutable event log into
# per-user STATE VALIDITY INTERVALS (state = event_type; a new
# interval opens when the state changes), each row carrying
# valid_from / valid_to / the run length — slowly-changing-dimension
# type 2 built from a log, the batch shape of every CDC-merge
# pipeline. Gaps-and-islands: lag() flags changes, a running sum
# numbers the islands, one agg folds each island to its interval.
def q_events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user SCD-2 state history from the event log.

    Scale shape: both windows partition by user_id (hashpartitioning,
    never a global sort) and the island fold is one partial agg — the
    whole build is two window passes + one agg over the log, linear.
    valid_to is the next interval's open instant (closed-open), NULL
    on the current interval. Ordering ties broken by event_id so runs
    are engine-stable at microsecond collisions."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("int")
    isl = ev.withColumn("chg", changed).withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    hist = isl.groupBy("user_id", "island", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("island")
    return (
        hist.withColumn("valid_to", F.lead("valid_from").over(w2))
        .select(
            "user_id",
            F.col("island").cast("int").alias("version"),
            F.col("event_type").alias("state"),
            "valid_from",
            "valid_to",
            "n_events",
        )
        .orderBy("user_id", "version")
    )


ORACLE_EVENTS_SCD2 = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
              OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
isl AS (
  SELECT *, sum(chg) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged),
hist AS (
  SELECT user_id, island, event_type,
         min(ts) AS valid_from, count(*) AS n_events
  FROM isl GROUP BY 1, 2, 3)
SELECT user_id, CAST(island AS INT) AS version, event_type AS state,
       valid_from,
       lead(valid_from) OVER (
         PARTITION BY user_id ORDER BY island) AS valid_to,
       n_events
FROM hist
ORDER BY user_id, version
"""

QUERIES["events_scd2_history"] = q_events_scd2_history
ORACLES["events_scd2_history"] = ORACLE_EVENTS_SCD2


# ------------------------------------------------- last-touch attribution
# Conversion attribution: each purchase is credited to the SAME
# user's most recent click strictly before it, if that click happened
# within the attribution window — the standard marketing/causal-credit
# assignment (and the funnel's per-conversion refinement). The
# carried click is one last(IGNORE NULLS) over a user-ordered window
# with an EXCLUSIVE upper bound (ROWS ... 1 PRECEDING: a click and a
# purchase sharing a timestamp never self-attribute), so the whole
# query is ONE user-partitioned window pass + one tiny groupBy —
# never a purchases x clicks join. Window arithmetic in integer
# micros; the deterministic (us, event_id) ordering key shared with
# events_latest_state/transitions.
ATTR_WINDOW_S = 7 * 86400


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    carried = ev.select(
        "event_type",
        "us",
        F.last(F.when(is_click, F.col("us")), ignorenulls=True)
        .over(w)
        .alias("click_us"),
        F.last(F.when(is_click, F.col("item")), ignorenulls=True)
        .over(w)
        .alias("click_item"),
    )
    purchases = carried.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("click_us").isNotNull()
            & (
                (F.col("us") - F.col("click_us"))
                <= F.lit(ATTR_WINDOW_S * 1000000)
            ),
            F.col("click_item"),
        )
        .otherwise(F.lit(-1))
        .alias("item")
    )
    return (
        purchases.groupBy("item")
        .agg(F.count("*").alias("n_conversions"))
        .orderBy("item")
    )


ORACLE_EVENTS_ATTRIBUTION = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events),
carried AS (
  SELECT event_type, us,
         last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS click_us,
         last_value(CASE WHEN event_type = 'click' THEN item END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS click_item
  FROM ev),
attributed AS (
  SELECT CASE WHEN click_us IS NOT NULL
               AND us - click_us <= {ATTR_WINDOW_S}::BIGINT * 1000000
              THEN click_item ELSE -1 END AS item
  FROM carried WHERE event_type = 'purchase')
SELECT item, count(*) AS n_conversions
FROM attributed
GROUP BY item
ORDER BY item
"""

QUERIES["events_attribution"] = q_events_attribution
ORACLES["events_attribution"] = ORACLE_EVENTS_ATTRIBUTION


# ----------------------------------------------------- RFM segmentation
# Recency / Frequency / Monetary user segmentation — the standard
# audience-building aggregate. FIXED thresholds rather than quantile
# buckets BY DESIGN (ntile needs a corpus-sized global sort; fixed
# cutoffs are map-side arithmetic — the same argument as the score
# calibration bins), monetary in EXACT integer cents (the wave-10
# money discipline), recency in whole days against the stream's own
# max date (a broadcast scalar agg). One per-user agg, one
# 27-cell-bounded segment agg.
RFM_R_DAYS = (7, 14)  # recency cutoffs: hot / warm / cold
RFM_F_CNT = (20, 10)  # frequency cutoffs: heavy / regular / light
RFM_M_CENTS = (200_000, 50_000)  # monetary cutoffs (cents)


def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    anchor = ev.agg(F.max("d").alias("anchor"))
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.min(F.expr("datediff(anchor, d)")).alias("recency_d"),
            F.count("*").alias("freq"),
            F.sum("cents").alias("cents"),
        )
    )
    seg = per_user.select(
        F.expr(
            f"CASE WHEN recency_d <= {RFM_R_DAYS[0]} THEN 'hot'"
            f" WHEN recency_d <= {RFM_R_DAYS[1]} THEN 'warm'"
            " ELSE 'cold' END"
        ).alias("r_seg"),
        F.expr(
            f"CASE WHEN freq >= {RFM_F_CNT[0]} THEN 'heavy'"
            f" WHEN freq >= {RFM_F_CNT[1]} THEN 'regular'"
            " ELSE 'light' END"
        ).alias("f_seg"),
        F.expr(
            f"CASE WHEN cents >= {RFM_M_CENTS[0]} THEN 'high'"
            f" WHEN cents >= {RFM_M_CENTS[1]} THEN 'mid'"
            " ELSE 'low' END"
        ).alias("m_seg"),
        "cents",
    )
    return (
        seg.groupBy("r_seg", "f_seg", "m_seg")
        .agg(
            F.count("*").alias("n_users"),
            F.expr("CAST(sum(cents) AS BIGINT)").alias("segment_cents"),
        )
        .orderBy("r_seg", "f_seg", "m_seg")
    )


ORACLE_EVENTS_RFM = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events),
anchor AS (SELECT max(d) AS anchor FROM ev),
per_user AS (
  SELECT user_id,
         min(datediff('day', d, anchor)) AS recency_d,
         count(*) AS freq,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM ev CROSS JOIN anchor
  GROUP BY user_id),
seg AS (
  SELECT CASE WHEN recency_d <= {RFM_R_DAYS[0]} THEN 'hot'
              WHEN recency_d <= {RFM_R_DAYS[1]} THEN 'warm'
              ELSE 'cold' END AS r_seg,
         CASE WHEN freq >= {RFM_F_CNT[0]} THEN 'heavy'
              WHEN freq >= {RFM_F_CNT[1]} THEN 'regular'
              ELSE 'light' END AS f_seg,
         CASE WHEN cents >= {RFM_M_CENTS[0]} THEN 'high'
              WHEN cents >= {RFM_M_CENTS[1]} THEN 'mid'
              ELSE 'low' END AS m_seg,
         cents
  FROM per_user)
SELECT r_seg, f_seg, m_seg, count(*) AS n_users,
       CAST(sum(cents) AS BIGINT) AS segment_cents
FROM seg
GROUP BY 1, 2, 3
ORDER BY r_seg, f_seg, m_seg
"""

QUERIES["events_rfm"] = q_events_rfm
ORACLES["events_rfm"] = ORACLE_EVENTS_RFM


# ------------------------------------------- native session windows
# Spark's DEDICATED session-window aggregation (F.session_window — the
# UpdatingSessions/MergingSessions physical operators, a different
# execution path from the lag-window sessionizer in events_sessions):
# per (user, session) the merged window bounds, event count and exact
# spend cents, with a 30-minute inactivity gap. Session semantics:
# each event opens [ts, ts+gap) and overlapping intervals merge, so
# two events exactly gap apart do NOT merge (end-exclusive) — the
# DuckDB twin's island detection therefore breaks on gap >= 1800s,
# and session_end is last_ts + gap. In streaming this same operator
# runs with watermark-bounded state; the batch form here is what the
# driver can oracle-check. Scale shape: one user-keyed shuffle, then
# in-partition session merging; output is one row per session.
SESSION_GAP_SEC = 1800


def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_SEC} seconds"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias(
                "cents"
            ),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "cents",
        )
        .orderBy("user_id", "session_start")
    )


ORACLE_EVENTS_SESSION_WINDOWS = f"""
WITH o AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) >= {SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts, cents,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM o)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_SEC} SECOND AS session_end,
       count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS cents
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""

QUERIES["events_session_windows"] = q_events_session_windows
ORACLES["events_session_windows"] = ORACLE_EVENTS_SESSION_WINDOWS


# ------------------------------------------- multi-touch attribution
# Linear multi-touch attribution — the companion to the last-touch
# window in events_attribution: each purchase's credit (1e6 ppm)
# splits EQUALLY across all of the same user's clicks in the
# preceding 7-day window, with the integer remainder (1e6 mod k)
# pinned to the most recent click so every purchase's credit sums to
# exactly 1e6 and the whole ledger is exact-integer. Unlike
# last-touch, multi-touch fundamentally needs the (purchase, click)
# PAIRS — a user-keyed interval self-join (the J5 range-join shape) —
# because each click's share depends on the per-purchase touch count.
# Scale shape: one user-keyed shuffle, pairs bounded by per-user
# activity × window (AQE skew-join covers hot users), per-purchase
# ranking windows ride the pair table, final census is one item agg.
MT_WINDOW_S = 7 * 86400


def q_events_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    item = F.get_json_object("props", "$.k").cast("long")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        us.alias("click_us"),
        F.col("event_id").alias("click_id"),
        item.alias("item"),
    ).where(F.col("item").isNotNull())
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        us.alias("p_us"),
        F.col("event_id").alias("purchase_id"),
    )
    pairs = purchases.join(
        clicks,
        (purchases.user_id == clicks.cu)
        & (clicks.click_us < purchases.p_us)
        & (
            purchases.p_us - clicks.click_us
            <= F.lit(MT_WINDOW_S).cast("long") * 1_000_000
        ),
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc("click_us"), F.desc("click_id")
    )
    credited = (
        pairs.withColumn("k", F.count("*").over(Window.partitionBy("purchase_id")))
        .withColumn("r", F.row_number().over(w))
        .select(
            "item",
            (
                F.expr("1000000 DIV k")
                + F.when(
                    F.col("r") == 1, F.expr("1000000 % k")
                ).otherwise(F.lit(0))
            ).alias("credit_ppm"),
        )
    )
    return (
        credited.groupBy("item")
        .agg(
            F.sum("credit_ppm").alias("credit_ppm"),
            F.count("*").alias("n_touches"),
        )
        .orderBy(F.desc("credit_ppm"), F.asc("item"))
    )


ORACLE_EVENTS_MULTITOUCH = f"""
WITH clicks AS (
  SELECT user_id AS cu, epoch_us(ts) AS click_us, event_id AS click_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE event_type = 'click'
    AND json_extract_string(props, '$.k') IS NOT NULL),
purchases AS (
  SELECT user_id, epoch_us(ts) AS p_us, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT purchase_id, item, click_us, click_id
  FROM purchases JOIN clicks
    ON user_id = cu AND click_us < p_us
   AND p_us - click_us <= {MT_WINDOW_S}::BIGINT * 1000000),
credited AS (
  SELECT item,
         1000000 // k
         + CASE WHEN r = 1 THEN 1000000 % k ELSE 0 END AS credit_ppm
  FROM (
    SELECT item,
           count(*) OVER (PARTITION BY purchase_id) AS k,
           row_number() OVER (PARTITION BY purchase_id
                              ORDER BY click_us DESC, click_id DESC) AS r
    FROM pairs) t)
SELECT item, CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm,
       count(*) AS n_touches
FROM credited
GROUP BY item
ORDER BY credit_ppm DESC, item ASC
"""

QUERIES["events_multitouch"] = q_events_multitouch
ORACLES["events_multitouch"] = ORACLE_EVENTS_MULTITOUCH


# ----------------------------------------------- numeric band join
# The band-join decorrelation pattern: a non-equi |a - b| <= delta
# predicate turned into an EQUI-join by bucketing both sides at width
# delta and exploding one side to its {bucket-1, bucket, bucket+1}
# neighborhood — every true pair shares an exploded bucket (|a-b| <=
# delta spans at most adjacent buckets), so the O(n^2) inequality join
# becomes one hash shuffle + a cheap verify filter. Semantics here:
# "price-anchored conversions" — purchases whose value sits within
# BAND_DELTA of a preceding view by the same user within 7 days.
# Value compared in exact integer cents. Scale shape: 3x explode on
# the view side only, equi-join on (user, bucket), residual time +
# band verify in codegen; per-(user, bucket) cardinalities bound the
# pair fan-out the way LSH buckets do.
BAND_DELTA_CENTS = 500  # |purchase - view| <= $5.00


def q_events_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"),
        F.col("us").alias("v_us"),
        F.col("cents").alias("v_cents"),
        F.explode(
            F.array(
                F.expr(f"cents DIV {BAND_DELTA_CENTS} - 1"),
                F.expr(f"cents DIV {BAND_DELTA_CENTS}"),
                F.expr(f"cents DIV {BAND_DELTA_CENTS} + 1"),
            )
        ).alias("bucket"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("us").alias("p_us"),
        F.col("cents").alias("p_cents"),
        F.expr(f"cents DIV {BAND_DELTA_CENTS}").alias("bucket"),
    )
    pairs = purchases.join(
        views,
        (purchases.user_id == views.vu)
        & (purchases.bucket == views.bucket)
        & (views.v_us < purchases.p_us)
        & (purchases.p_us - views.v_us <= F.lit(MT_WINDOW_S).cast("long") * 1_000_000)
        & (F.abs(purchases.p_cents - views.v_cents) <= BAND_DELTA_CENTS),
    ).select("purchase_id", "p_cents", "v_cents").distinct()
    return (
        pairs.groupBy("purchase_id")
        .agg(
            F.count("*").alias("n_anchor_views"),
            F.min(F.abs(F.col("p_cents") - F.col("v_cents"))).alias(
                "closest_gap_cents"
            ),
        )
        .orderBy("purchase_id")
    )


ORACLE_EVENTS_BAND_JOIN = f"""
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events),
pairs AS (
  SELECT DISTINCT p.event_id AS purchase_id, p.cents AS p_cents,
         v.cents AS v_cents
  FROM ev p JOIN ev v
    ON p.event_type = 'purchase' AND v.event_type = 'view'
   AND p.user_id = v.user_id
   AND v.us < p.us
   AND p.us - v.us <= {MT_WINDOW_S}::BIGINT * 1000000
   AND abs(p.cents - v.cents) <= {BAND_DELTA_CENTS})
SELECT purchase_id, count(*) AS n_anchor_views,
       CAST(min(abs(p_cents - v_cents)) AS BIGINT) AS closest_gap_cents
FROM pairs
GROUP BY purchase_id
ORDER BY purchase_id
"""

QUERIES["events_band_join"] = q_events_band_join
ORACLES["events_band_join"] = ORACLE_EVENTS_BAND_JOIN


# ------------------------------------------- item-item CF similarity
# The collaborative-filtering bipartite projection: item-item cosine
# over the binary user-item engagement matrix — n_shared /
# sqrt(deg_i * deg_j), the similarity a classic item-to-item
# recommender serves. Power-user discipline: users touching more than
# CF_MAX_USER_ITEMS items are EXCLUDED from pair generation (the
# standard CF move — a 10k-item user contributes 10k^2/2 pairs and no
# signal; the cap bounds per-key fan-out exactly like the LSH bucket
# salting threshold). Pair generation is user-local (item_a < item_b
# over each kept user's item set), so the shuffle carries one
# fixed-width row per co-engagement, never a cartesian. The cosine is
# ONE token-identical float over exact integers, rounded to ppm.
CF_MAX_USER_ITEMS = 50
CF_MIN_SHARED = 2
CF_TOP_K = 50


def q_events_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    ideg = ui.groupBy("item").agg(F.count("*").alias("deg"))
    a = kept.select("user_id", F.col("item").alias("item_a"))
    b = kept.select("user_id", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= CF_MIN_SHARED)
    )
    da = ideg.select(F.col("item").alias("item_a"), F.col("deg").alias("deg_a"))
    db = ideg.select(F.col("item").alias("item_b"), F.col("deg").alias("deg_b"))
    return (
        pairs.join(F.broadcast(da), "item_a")
        .join(F.broadcast(db), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_shared",
            "deg_a",
            "deg_b",
            F.expr(
                "CAST(round(CAST(n_shared AS DOUBLE) * 1000000"
                " / sqrt(CAST(deg_a AS DOUBLE) * deg_b), 0) AS BIGINT)"
            ).alias("cos_ppm"),
        )
        .orderBy(F.desc("cos_ppm"), F.asc("item_a"), F.asc("item_b"))
        .limit(CF_TOP_K)
    )


ORACLE_EVENTS_ITEM_CF = f"""
WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
kept AS (
  SELECT user_id, item FROM ui
  WHERE user_id IN (
    SELECT user_id FROM ui GROUP BY user_id
    HAVING count(*) <= {CF_MAX_USER_ITEMS})),
ideg AS (SELECT item, count(*) AS deg FROM ui GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_shared
  FROM kept a JOIN kept b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= {CF_MIN_SHARED})
SELECT item_a, item_b, n_shared,
       CAST(da.deg AS BIGINT) AS deg_a, CAST(db.deg AS BIGINT) AS deg_b,
       CAST(round(CAST(n_shared AS DOUBLE) * 1000000
                  / sqrt(CAST(da.deg AS DOUBLE) * db.deg), 0) AS BIGINT)
         AS cos_ppm
FROM pairs
JOIN ideg da ON item_a = da.item
JOIN ideg db ON item_b = db.item
ORDER BY cos_ppm DESC, item_a ASC, item_b ASC
LIMIT {CF_TOP_K}
"""

QUERIES["events_item_cf"] = q_events_item_cf
ORACLES["events_item_cf"] = ORACLE_EVENTS_ITEM_CF


# --------------------------------------------- conversion lag profile
# Latency from a user's FIRST view to their FIRST purchase: per-user
# conditional-min timestamps (one partial agg over the fact table),
# then exact rank-picked p50/p90 of the lag distribution plus the
# never-converted count — the activation-funnel health metric a
# growth dashboard tracks per cohort/release. Lags in exact whole
# seconds; percentiles by the same lower-rank convention as the MAD
# medians (no float interpolation). Scale shape: per-user agg is the
# only corpus shuffle; ranks ride the |converted users| lag table.
def q_events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", us)
        ).alias("first_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", us)
        ).alias("first_purchase"),
    )
    lags = per_user.select(
        F.when(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view")),
            F.expr("(first_purchase - first_view) DIV 1000000"),
        ).alias("lag_s")
    )
    conv = lags.where(F.col("lag_s").isNotNull())
    w = Window.orderBy("lag_s")
    ranked = conv.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy(F.lit(1)))
    )
    pcts = ranked.agg(
        F.min(
            F.when(
                F.col("rn") == F.expr("CAST(floor((n + 1) / 2.0) AS BIGINT)"),
                F.col("lag_s"),
            )
        ).alias("p50_lag_s"),
        F.min(
            F.when(
                F.col("rn")
                == F.expr("greatest(CAST(ceil(n * 0.9) AS BIGINT), 1)"),
                F.col("lag_s"),
            )
        ).alias("p90_lag_s"),
        F.count("*").alias("n_converted"),
    )
    totals = lags.agg(F.count("*").alias("n_users_total"))
    return pcts.crossJoin(F.broadcast(totals)).select(
        "n_users_total",
        "n_converted",
        (F.col("n_users_total") - F.col("n_converted")).alias(
            "n_not_converted"
        ),
        "p50_lag_s",
        "p90_lag_s",
    )


ORACLE_EVENTS_CONVERSION_LAG = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view'
                  THEN epoch_us(ts) END) AS first_view,
         min(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(ts) END) AS first_purchase
  FROM events GROUP BY user_id),
lags AS (
  SELECT CASE WHEN first_view IS NOT NULL
                AND first_purchase IS NOT NULL
                AND first_purchase >= first_view
              THEN (first_purchase - first_view) // 1000000
         END AS lag_s
  FROM per_user),
conv AS (SELECT lag_s FROM lags WHERE lag_s IS NOT NULL),
ranked AS (
  SELECT lag_s, row_number() OVER (ORDER BY lag_s) AS rn,
         count(*) OVER () AS n
  FROM conv),
pcts AS (
  SELECT min(CASE WHEN rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
                  THEN lag_s END) AS p50_lag_s,
         min(CASE WHEN rn = greatest(CAST(ceil(n * 0.9) AS BIGINT), 1)
                  THEN lag_s END) AS p90_lag_s,
         count(*) AS n_converted
  FROM ranked),
totals AS (SELECT count(*) AS n_users_total FROM lags)
SELECT n_users_total, n_converted,
       n_users_total - n_converted AS n_not_converted,
       p50_lag_s, p90_lag_s
FROM pcts CROSS JOIN totals
"""

QUERIES["events_conversion_lag"] = q_events_conversion_lag
ORACLES["events_conversion_lag"] = ORACLE_EVENTS_CONVERSION_LAG


# ------------------------------------------------ DAU/WAU stickiness
# The product-engagement headline: per ISO week, weekly active users
# (exact distinct), average daily actives in exact centi-users, and
# the stickiness ratio avg(DAU)/WAU in ppm — the "how often do weekly
# users show up" number every growth report leads with. Non-
# overlapping calendar buckets keep every distinct count exact (the
# SLIDING-window variant is events_hll_sliding's register sketch —
# this is the exact calendar twin). Scale shape: one (day, user)
# distinct projection feeds both censuses; output is |weeks| rows.
def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("week", F.col("ts")).alias("week"),
        F.col("ts").cast("date").alias("d"),
        "user_id",
    ).distinct()
    dau = du.groupBy("week", "d").agg(F.count("*").alias("dau"))
    weekly_dau = dau.groupBy("week").agg(
        F.sum("dau").alias("dau_sum"),
        F.count("*").alias("n_days"),
    )
    wau = du.select("week", "user_id").distinct().groupBy("week").agg(
        F.count("*").alias("wau")
    )
    return (
        weekly_dau.join(wau, "week")
        .select(
            "week",
            "wau",
            F.expr("dau_sum * 100 DIV n_days").alias("avg_dau_centi"),
            "n_days",
            F.expr("dau_sum * 1000000 DIV (n_days * wau)").alias(
                "stickiness_ppm"
            ),
        )
        .orderBy("week")
    )


ORACLE_EVENTS_STICKINESS = """
WITH du AS (
  SELECT DISTINCT date_trunc('week', ts) AS week,
         CAST(ts AS DATE) AS d, user_id
  FROM events),
dau AS (
  SELECT week, d, count(*) AS dau FROM du GROUP BY week, d),
weekly_dau AS (
  SELECT week, CAST(sum(dau) AS BIGINT) AS dau_sum,
         count(*) AS n_days
  FROM dau GROUP BY week),
wau AS (
  SELECT week, count(DISTINCT user_id) AS wau FROM du GROUP BY week)
SELECT week, wau,
       CAST(dau_sum * 100 // n_days AS BIGINT) AS avg_dau_centi,
       n_days,
       CAST(dau_sum * 1000000 // (n_days * wau) AS BIGINT)
         AS stickiness_ppm
FROM weekly_dau JOIN wau USING (week)
ORDER BY week
"""

QUERIES["events_stickiness"] = q_events_stickiness
ORACLES["events_stickiness"] = ORACLE_EVENTS_STICKINESS


# --------------------------------------------- growth accounting
# Weekly growth-accounting census — the standard four-bucket user
# decomposition every growth team reports: per week, users who are
# NEW (first-ever activity), RETAINED (active this week and last),
# RESURRECTED (active this week, inactive last week, seen before),
# and CHURNED (active last week, absent this week). The accounting
# identities active(w) = new + retained + resurrected and
# churned(w) = active(w−1) − retained(w) hold exactly by
# construction — the planted test asserts both. Distinct from
# events_stickiness (intensity ratio) and events_cohort_retention
# (fixed-cohort triangle): this is the week-over-week state machine.
#
# Scale shape: events fold to one (user, week) DISTINCT activity row
# (partial agg); ONE window (lag/lead over each user's ordered
# distinct weeks — rows per user = active weeks, never events)
# classifies transitions; churn events are emitted at prev_week+7 via
# the lead gap (capped at the corpus's last week via a broadcast
# scalar). Final regroup is per-week.


def q_events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("week", F.col("ts").cast("timestamp"))
        .cast("date")
        .alias("week"),
    )
    act = ev.distinct()
    maxw = act.agg(F.max("week").alias("max_week"))
    w = W.partitionBy("user_id").orderBy("week")
    flagged = act.withColumn("prev_week", F.lag("week").over(w)).withColumn(
        "next_week", F.lead("week").over(w)
    )
    per_week = flagged.groupBy("week").agg(
        F.sum(F.col("prev_week").isNull().cast("long")).alias("n_new"),
        # null-safe: on an all-new week every prev_week is NULL and a
        # bare == would make the whole sum NULL (DuckDB's CASE yields 0)
        F.sum(
            (
                F.col("prev_week").isNotNull()
                & (F.col("prev_week") == F.date_sub("week", 7))
            ).cast("long")
        ).alias("n_retained"),
        F.sum(
            (
                F.col("prev_week").isNotNull()
                & (F.col("prev_week") < F.date_sub("week", 7))
            ).cast("long")
        ).alias("n_resurrected"),
    )
    # churn events: a user active in week W churns at W+7 unless also
    # active then; the corpus's final week can't observe churn yet
    churn = (
        flagged.where(
            F.col("next_week").isNull()
            | (F.col("next_week") > F.date_add("week", 7))
        )
        .select(F.date_add("week", 7).alias("week"))
        .crossJoin(F.broadcast(maxw))
        .where(F.col("week") <= F.col("max_week"))
        .groupBy("week")
        .agg(F.count("*").alias("n_churned"))
    )
    return (
        per_week.join(churn, "week", "left")
        .select(
            "week",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
            (
                F.col("n_new")
                + F.col("n_retained")
                + F.col("n_resurrected")
            ).alias("n_active"),
        )
        .orderBy("week")
    )


ORACLE_EVENTS_GROWTH_ACCOUNTING = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events),
maxw AS (SELECT max(week) AS max_week FROM act),
flagged AS (
  SELECT user_id, week,
         lag(week) OVER (PARTITION BY user_id ORDER BY week)
           AS prev_week,
         lead(week) OVER (PARTITION BY user_id ORDER BY week)
           AS next_week
  FROM act),
per_week AS (
  SELECT week,
         CAST(sum(CASE WHEN prev_week IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new,
         CAST(sum(CASE WHEN prev_week = week - 7 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_retained,
         CAST(sum(CASE WHEN prev_week IS NOT NULL
                        AND prev_week < week - 7 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_resurrected
  FROM flagged GROUP BY week),
churn AS (
  SELECT week + 7 AS week, CAST(count(*) AS BIGINT) AS n_churned
  FROM flagged CROSS JOIN maxw
  WHERE (next_week IS NULL OR next_week > week + 7)
    AND week + 7 <= max_week
  GROUP BY week + 7)
SELECT p.week, p.n_new, p.n_retained, p.n_resurrected,
       coalesce(c.n_churned, 0) AS n_churned,
       p.n_new + p.n_retained + p.n_resurrected AS n_active
FROM per_week p LEFT JOIN churn c USING (week)
ORDER BY week
"""


QUERIES["events_growth_accounting"] = q_events_growth_accounting
ORACLES["events_growth_accounting"] = ORACLE_EVENTS_GROWTH_ACCOUNTING


# ------------------------------------------------ velocity rule flags
# Sliding-window velocity rule — the fraud/abuse screen run on every
# event stream: a user emitting >= VEL_THRESHOLD events of one type
# inside any VEL_WINDOW_US-long window is flagged (card-testing
# bursts, scraper loops, notification storms). The count uses a RANGE
# frame over exact epoch-micros (window semantics identical in Spark
# and DuckDB: count of events in (t - W, t]), the per-user maximum
# burst is taken, and the census reports per event type how many
# users trip the rule plus the corpus-wide worst burst. Rows appear
# for every event type even when nothing trips (n_flagged = 0), so
# the report shape is corpus-independent.
#
# Scale shape: ONE range-frame window per (user, type) partition
# (sorted by the same micros key every sequence operator here uses),
# one (user, type) partial-agg max, one per-type rollup. Nothing
# leaves the user partition before aggregation.

VEL_WINDOW_US = 3_600_000_000  # 1 hour
VEL_THRESHOLD = 3


def q_events_velocity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        W.partitionBy("user_id", "event_type")
        .orderBy("us")
        .rangeBetween(-(VEL_WINDOW_US - 1), 0)
    )
    burst = ev.withColumn("in_window", F.count("*").over(w))
    per_user = burst.groupBy("user_id", "event_type").agg(
        F.max("in_window").alias("max_burst")
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(
                (F.col("max_burst") >= VEL_THRESHOLD).cast("long")
            ).alias("n_flagged"),
            F.max("max_burst").alias("max_burst"),
        )
        .withColumn(
            "flag_ppm", F.expr("n_flagged * 1000000 DIV n_users")
        )
        .orderBy("event_type")
    )


ORACLE_EVENTS_VELOCITY_FLAGS = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
burst AS (
  SELECT user_id, event_type,
         count(*) OVER (PARTITION BY user_id, event_type ORDER BY us
                        RANGE BETWEEN {VEL_WINDOW_US - 1} PRECEDING
                              AND CURRENT ROW) AS in_window
  FROM ev),
per_user AS (
  SELECT user_id, event_type, max(in_window) AS max_burst
  FROM burst GROUP BY 1, 2)
SELECT event_type, count(*) AS n_users,
       CAST(sum(CASE WHEN max_burst >= {VEL_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged,
       CAST(max(max_burst) AS BIGINT) AS max_burst,
       CAST(sum(CASE WHEN max_burst >= {VEL_THRESHOLD} THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS flag_ppm
FROM per_user
GROUP BY event_type
ORDER BY event_type
"""


QUERIES["events_velocity_flags"] = q_events_velocity_flags
ORACLES["events_velocity_flags"] = ORACLE_EVENTS_VELOCITY_FLAGS


# --------------------------------------------------- debounce dedup
# Debounce deduplication census — the double-fire cleanup every
# client-event pipeline runs before analytics: an event repeating the
# same (user, event_type) within DEBOUNCE_US of the PREVIOUS such
# event is a retry/double-click artifact and is dropped (debounce
# semantics: the timer resets on every event, so a dense burst
# collapses to its first event — deliberately distinct from
# TTL-anchor dedup, whose restart rule is not expressible in one
# window pass). The census reports, per event type, events kept vs
# dropped and how many users had at least one drop — the report that
# says whether the corpus needs the cleanup at all.
#
# Scale shape: ONE lag window per (user, type) partition, one
# per-type partial-agg rollup. The drop decision is a pure column
# predicate on the lag delta; nothing shuffles except the final
# per-type census.

DEBOUNCE_US = 600_000_000  # 10 minutes


def q_events_debounce_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = W.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    flagged = ev.withColumn(
        "dropped",
        (
            F.lag("us").over(w).isNotNull()
            & (F.col("us") - F.lag("us").over(w) < DEBOUNCE_US)
        ).cast("long"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("dropped").alias("n_dropped"),
            F.countDistinct(
                F.when(F.col("dropped") == 1, F.col("user_id"))
            ).alias("n_users_affected"),
        )
        .withColumn(
            "drop_ppm", F.expr("n_dropped * 1000000 DIV n_events")
        )
        .orderBy("event_type")
    )


ORACLE_EVENTS_DEBOUNCE_DEDUP = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
flagged AS (
  SELECT user_id, event_type,
         CASE WHEN lag(us) OVER (PARTITION BY user_id, event_type
                                 ORDER BY us, event_id) IS NOT NULL
               AND us - lag(us) OVER (PARTITION BY user_id, event_type
                                      ORDER BY us, event_id)
                   < {DEBOUNCE_US}
              THEN 1 ELSE 0 END AS dropped
  FROM ev)
SELECT event_type, count(*) AS n_events,
       CAST(sum(dropped) AS BIGINT) AS n_dropped,
       count(DISTINCT CASE WHEN dropped = 1 THEN user_id END)
         AS n_users_affected,
       CAST(sum(dropped) * 1000000 // count(*) AS BIGINT) AS drop_ppm
FROM flagged
GROUP BY event_type
ORDER BY event_type
"""


QUERIES["events_debounce_dedup"] = q_events_debounce_dedup
ORACLES["events_debounce_dedup"] = ORACLE_EVENTS_DEBOUNCE_DEDUP


# ------------------------------------------------ cumulative adoption
# Cumulative-reach adoption curve: per day, how many users touched
# the product for the FIRST time and the running total of users ever
# seen — the saturation curve growth planning reads next to
# events_growth_accounting's weekly state machine (this is the
# integral view: its derivative is the acquisition rate, its plateau
# the addressable-corpus ceiling; the same first-touch primitive, at
# day grain, feeding the running sum).
#
# Scale shape: one partial agg to per-user first days (min over the
# user's partition — never a corpus sort), one per-day count, then a
# running sum over the |days|-sized series (the only window sorts
# days, not events or users).


def q_events_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.col("ts").cast("timestamp")).alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    per_day = first.groupBy("day").agg(F.count("*").alias("n_new_users"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return (
        per_day.withColumn("cum_users", F.sum("n_new_users").over(w))
        .select("day", "n_new_users", "cum_users")
        .orderBy("day")
    )


ORACLE_EVENTS_CUMULATIVE_REACH = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events
  GROUP BY user_id),
per_day AS (
  SELECT day, count(*) AS n_new_users FROM first GROUP BY day)
SELECT day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_users
FROM per_day
ORDER BY day
"""


QUERIES["events_cumulative_reach"] = q_events_cumulative_reach
ORACLES["events_cumulative_reach"] = ORACLE_EVENTS_CUMULATIVE_REACH


# -------------------------------------------- item adoption half-life
# Time-to-half-audience per item: for the HL_TOP_ITEMS biggest
# audiences, the number of days from the item's first engagement to
# the day its cumulative distinct-user count first reaches half its
# final audience — the adoption-speed census (a fast half-life is a
# launch spike, a slow one organic growth; the item-grain drill-down
# of events_cumulative_reach's corpus curve). Exact integer
# semantics: "half" is the two-sided BIGINT comparison
# 2·cum ≥ n_users, no rounding anywhere.
#
# Scale shape: one (item, user) first-touch partial agg (min day),
# one (item, day) census, ONE per-item window over that item's
# distinct active days (not events), a broadcast of per-item
# audience totals, and a min-day pick per item. Top items by
# audience, deterministic tiebreak.

HL_TOP_ITEMS = 20


def q_events_item_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
            F.to_date(F.col("ts").cast("timestamp")).alias("day"),
        )
        .where(F.col("item").isNotNull())
    )
    ft = ev.groupBy("item", "user_id").agg(F.min("day").alias("day"))
    aud = ft.groupBy("item").agg(F.count("*").alias("n_users"))
    top = (
        aud.orderBy(F.desc("n_users"), F.asc("item"))
        .limit(HL_TOP_ITEMS)
    )
    daily = (
        ft.join(F.broadcast(top.select("item")), "item", "left_semi")
        .groupBy("item", "day")
        .agg(F.count("*").alias("n_new"))
    )
    w = W.partitionBy("item").orderBy("day").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = daily.withColumn("cum", F.sum("n_new").over(w))
    half = (
        cum.join(F.broadcast(top), "item")
        .where(F.col("cum") * 2 >= F.col("n_users"))
        .groupBy("item")
        .agg(F.min("day").alias("half_day"))
    )
    launch = daily.groupBy("item").agg(F.min("day").alias("launch_day"))
    return (
        top.join(launch, "item")
        .join(half, "item")
        .select(
            "item",
            "n_users",
            "launch_day",
            "half_day",
            F.datediff("half_day", "launch_day").alias("halflife_days"),
        )
        .orderBy(F.desc("n_users"), F.asc("item"))
    )


ORACLE_EVENTS_ITEM_HALFLIFE = f"""
WITH ev AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         CAST(ts AS DATE) AS day
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
ft AS (SELECT item, user_id, min(day) AS day FROM ev GROUP BY 1, 2),
aud AS (SELECT item, count(*) AS n_users FROM ft GROUP BY item),
top AS (SELECT item, n_users FROM aud
        ORDER BY n_users DESC, item ASC LIMIT {HL_TOP_ITEMS}),
daily AS (
  SELECT f.item, f.day, count(*) AS n_new
  FROM ft f JOIN top t USING (item)
  GROUP BY 1, 2),
cum AS (
  SELECT item, day,
         sum(n_new) OVER (PARTITION BY item ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM daily),
half AS (
  SELECT c.item, min(c.day) AS half_day
  FROM cum c JOIN top t USING (item)
  WHERE c.cum * 2 >= t.n_users
  GROUP BY c.item),
launch AS (SELECT item, min(day) AS launch_day FROM daily GROUP BY item)
SELECT t.item, t.n_users, l.launch_day, h.half_day,
       CAST(h.half_day - l.launch_day AS BIGINT) AS halflife_days
FROM top t JOIN launch l USING (item) JOIN half h USING (item)
ORDER BY n_users DESC, item ASC
"""


QUERIES["events_item_halflife"] = q_events_item_halflife
ORACLES["events_item_halflife"] = ORACLE_EVENTS_ITEM_HALFLIFE
