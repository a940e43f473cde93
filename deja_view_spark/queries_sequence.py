"""Sequence & association mining over the event log (driver-checkable).

``events_transitions`` — first-order Markov transition matrix over
per-user event-type sequences: the behavioral-model building block
(next-action prediction, anomaly scoring, funnel simulation). Each
user's events are ordered by the same deterministic key
``events_latest_state`` established (timestamp micros, then event_id —
ties can never flip the sequence across partitionings); adjacent pairs
are counted per (from_type, to_type); row-conditional probabilities
are emitted in EXACT parts-per-million integer arithmetic
(count * 1e6 DIV row_total) so the full value hash matches DuckDB with
no cross-engine float division on the comparison path.

Scale shape: ONE window (partitioned by user_id — never a global
sort), one partial-agg count over the tiny (from, to) key space, and a
broadcast join to attach row totals (|event types|^2 rows, metadata-
sized). The event scan prunes to 4 columns.

``events_market_basket`` — pairwise frequent-itemset association rules
(Agrawal-Srikant Apriori, the 2-itemset stage) over user baskets of
touched items (props $.k): support, directional confidence, and lift,
all in exact integer / ppm arithmetic. The Apriori pruning IS the
scale design: items are frequency-filtered (>= MB_MIN_SUPP users)
BEFORE any pair is generated, baskets wider than MB_BASKET_CAP are
excluded (mirrored in the oracle — a degenerate power-user basket
contributes cap^2 pairs and ~no signal, the same hub-suppression
argument as link prediction's apex cap), and pairs are generated
bucket-locally from each user's sorted item array (posting-array
explode, the idiom shared with the linkage blockers) rather than a
basket self-join.

Output rules are canonical (item_x < item_y) with BOTH directional
confidences, so no information is lost to the ordering; lift_ppm =
n_baskets * pair_users * 1e6 DIV (supp_x * supp_y) in BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deja_view_spark.sources.catalog import load_table

PPM = 10**6

# market-basket knobs (mirrored verbatim in the oracle SQL)
MB_MIN_SUPP = 5  # an item must appear in >= this many baskets
MB_MIN_PAIR = 3  # a rule must be supported by >= this many baskets
MB_BASKET_CAP = 256  # baskets wider than this are excluded


def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("row_total")
    )
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.expr(f"CAST(n_transitions * {PPM} DIV row_total AS BIGINT)").alias(
                "prob_ppm"
            ),
        )
        .orderBy("from_type", "to_type")
    )


ORACLE_EVENTS_TRANSITIONS = f"""
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS to_type
  FROM events),
counts AS (
  SELECT event_type AS from_type, to_type, count(*) AS n_transitions
  FROM ordered WHERE to_type IS NOT NULL
  GROUP BY 1, 2),
totals AS (
  SELECT from_type, sum(n_transitions) AS row_total
  FROM counts GROUP BY from_type)
SELECT c.from_type, c.to_type, c.n_transitions,
       CAST(c.n_transitions * {PPM} // t.row_total AS BIGINT) AS prob_ppm
FROM counts c JOIN totals t USING (from_type)
ORDER BY from_type, to_type
"""


def q_events_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    item = F.get_json_object("props", "$.k").cast("long")
    baskets = (
        ev.select("user_id", item.alias("item"))
        .where(F.col("item").isNotNull())
        .distinct()
    )
    n_df = baskets.select("user_id").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    supp = baskets.groupBy("item").agg(F.count("*").alias("supp"))
    freq = supp.where(F.col("supp") >= MB_MIN_SUPP)
    kept = baskets.join(freq.select("item"), "item", "left_semi")
    arrays = (
        kept.groupBy("user_id")
        .agg(F.sort_array(F.collect_list("item")).alias("items"))
        .where((F.size("items") >= 2) & (F.size("items") <= MB_BASKET_CAP))
    )
    pairs = (
        arrays.select(
            F.posexplode("items").alias("_i", "item_x"), F.col("items")
        )
        .select(
            "item_x",
            F.explode(
                F.slice(F.col("items"), F.col("_i") + 2, F.size("items"))
            ).alias("item_y"),
        )
        .groupBy("item_x", "item_y")
        .agg(F.count("*").alias("pair_users"))
        .where(F.col("pair_users") >= MB_MIN_PAIR)
    )
    sx = freq.select(F.col("item").alias("item_x"), F.col("supp").alias("supp_x"))
    sy = freq.select(F.col("item").alias("item_y"), F.col("supp").alias("supp_y"))
    return (
        pairs.join(sx, "item_x")
        .join(sy, "item_y")
        .crossJoin(F.broadcast(n_df))
        .select(
            "item_x",
            "item_y",
            "pair_users",
            "supp_x",
            "supp_y",
            F.expr(f"CAST(pair_users * {PPM} DIV supp_x AS BIGINT)").alias(
                "conf_x_to_y_ppm"
            ),
            F.expr(f"CAST(pair_users * {PPM} DIV supp_y AS BIGINT)").alias(
                "conf_y_to_x_ppm"
            ),
            F.expr(
                f"CAST(n_baskets * pair_users * {PPM}"
                " DIV (supp_x * supp_y) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy("item_x", "item_y")
    )


ORACLE_EVENTS_MARKET_BASKET = f"""
WITH baskets AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
n AS (SELECT count(DISTINCT user_id) AS n_baskets FROM baskets),
supp AS (SELECT item, count(*) AS supp FROM baskets GROUP BY item),
freq AS (SELECT * FROM supp WHERE supp >= {MB_MIN_SUPP}),
kept AS (
  SELECT b.user_id, b.item FROM baskets b
  JOIN freq f ON b.item = f.item),
sized AS (
  SELECT user_id FROM kept GROUP BY user_id
  HAVING count(*) BETWEEN 2 AND {MB_BASKET_CAP}),
pairs AS (
  SELECT a.item AS item_x, b.item AS item_y, count(*) AS pair_users
  FROM kept a
  JOIN kept b ON a.user_id = b.user_id AND a.item < b.item
  JOIN sized s ON a.user_id = s.user_id
  GROUP BY 1, 2
  HAVING count(*) >= {MB_MIN_PAIR})
SELECT p.item_x, p.item_y, p.pair_users, fx.supp AS supp_x,
       fy.supp AS supp_y,
       CAST(p.pair_users * {PPM} // fx.supp AS BIGINT) AS conf_x_to_y_ppm,
       CAST(p.pair_users * {PPM} // fy.supp AS BIGINT) AS conf_y_to_x_ppm,
       CAST(n.n_baskets * p.pair_users * {PPM}
            // (fx.supp * fy.supp) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN freq fx ON p.item_x = fx.item
JOIN freq fy ON p.item_y = fy.item
CROSS JOIN n
ORDER BY item_x, item_y
"""

QUERIES = {
    "events_transitions": q_events_transitions,
    "events_market_basket": q_events_market_basket,
}
ORACLES = {
    "events_transitions": ORACLE_EVENTS_TRANSITIONS,
    "events_market_basket": ORACLE_EVENTS_MARKET_BASKET,
}


# ------------------------------------------------- anomaly detection
# Rolling-zscore anomaly detection over each user's event-value
# series (the ops-monitoring / fraud-screen primitive): an event is
# anomalous when its value sits >= ANOM_Z rolling standard deviations
# from the mean of its own trailing window (the PRECEDING ANOM_W rows,
# current row excluded — the score must not contaminate its own
# baseline).
#
# Cross-engine float discipline (the events_moving_avg precedent,
# hardened round 4): the series is quantized to EXACT INTEGER
# 1e-4 ticks (vt = round(v4·10000) as BIGINT) and the window sums run
# over ticks — integer addition is order-independent, so s1/s2 are
# bit-identical across engines no matter how each implements sliding
# frames (windowed DOUBLE sums are accumulation-order-dependent:
# at sf0.1 one row in 2,859 landed on a round(·,4) half-ulp boundary
# and the engines disagreed). mean/zscore are then a FIXED tree of
# IEEE ops over identical integers (each correctly rounded →
# deterministic), mirrored verbatim in the oracle; never stddev_samp
# (Welford accumulation differs at the last ulp). Tick overflow
# bound: |value| ≤ ~1e4 keeps n·s2 under 2^63 at W=20 (events values
# are ≤ ~600; widen to DECIMAL beyond that).
#
# Scale shape: ONE user-partitioned window pass (never a global
# sort), all arithmetic codegen; the output is the anomaly subset.
ANOM_W = 20
ANOM_MIN_N = 10
ANOM_Z = 3.0


def q_events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round("value", 4).alias("v4"),
    ).withColumn("vt", F.round(F.col("v4") * 10000, 0).cast("bigint"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-ANOM_W, -1)
    )
    stats = ev.select(
        "user_id",
        "event_id",
        "v4",
        "vt",
        F.count("vt").over(w).alias("n"),
        F.sum("vt").over(w).alias("s1"),
        F.sum(F.col("vt") * F.col("vt")).over(w).alias("s2"),
    ).where(F.col("n") >= ANOM_MIN_N)
    # b = n·s2 − s1² = n(n−1)·var·1e8 ticks² — exact BIGINT; b>0 ⇔ var>0
    b = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    a = F.col("vt") * F.col("n") - F.col("s1")  # n·(v − mean) in ticks
    scored = stats.where(b > 0).select(
        "user_id",
        "event_id",
        "v4",
        # 4dp mean via INTEGER half-up in tick space — round(double, d)
        # itself is engine-divergent at .5 boundaries (Spark rounds the
        # Double.toString shortest repr, DuckDB the binary value; the
        # mean of integer ticks lands on exact halves routinely, and
        # sf0.1 hit one). Half-up is done sign-correct: abs-space DIV
        # with the sign reapplied, so Spark DIV (truncate) == DuckDB //
        # (floor) on the nonneg dividend and ties round away from zero;
        # ticks/1e4 is then one exact-input IEEE division in both.
        (
            F.expr(
                "CASE WHEN s1 < 0 THEN -((-2 * s1 + n) DIV (2 * n)) ELSE (2 * s1 + n) DIV (2 * n) END"
            ).cast("double")
            / 10000.0
        ).alias("baseline_mean"),
        # zscore = a/n · sqrt(n(n−1)) / sqrt(b); op tree mirrored
        # verbatim in the oracle so both engines round identically
        F.round(
            a / F.col("n")
            * F.sqrt(F.col("n") * (F.col("n") - 1))
            / F.sqrt(b),
            3,
        ).alias("zscore"),
    )
    return scored.where(F.abs(F.col("zscore")) >= ANOM_Z).orderBy(
        "user_id", "event_id"
    )


ORACLE_EVENTS_ANOMALIES = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, round(value, 4) AS v4,
         CAST(round(round(value, 4) * 10000, 0) AS BIGINT) AS vt
  FROM events),
stats AS (
  SELECT user_id, event_id, v4, vt,
         count(vt) OVER w AS n,
         CAST(sum(vt) OVER w AS BIGINT) AS s1,
         CAST(sum(vt * vt) OVER w AS BIGINT) AS s2
  FROM ev
  WINDOW w AS (
    PARTITION BY user_id ORDER BY us, event_id
    ROWS BETWEEN {ANOM_W} PRECEDING AND 1 PRECEDING)),
scored AS (
  SELECT user_id, event_id, v4,
         CAST((CASE WHEN s1 < 0 THEN -((-2 * s1 + n) // (2 * n)) ELSE (2 * s1 + n) // (2 * n) END) AS DOUBLE) / 10000.0
           AS baseline_mean,
         round((vt * n - s1) / n
               * sqrt(n * (n - 1))
               / sqrt(n * s2 - s1 * s1), 3) AS zscore
  FROM stats
  WHERE n >= {ANOM_MIN_N}
    AND n * s2 - s1 * s1 > 0)
SELECT user_id, event_id, v4, baseline_mean, zscore
FROM scored
WHERE abs(zscore) >= {ANOM_Z}
ORDER BY user_id, event_id
"""

QUERIES["events_anomalies"] = q_events_anomalies
ORACLES["events_anomalies"] = ORACLE_EVENTS_ANOMALIES


# ------------------------------------------------- survival analysis
# Kaplan-Meier LIFE TABLE over user lifetimes (the retention/churn
# survival primitive), kept in the exact-integer form: rather than the
# cumulative survival product (whose exp(sum(log)) evaluation would
# put libm on the comparison path), the query emits the discrete life
# table itself — per lifetime-day t: users at risk, deaths, censorings
# and the hazard in ppm (d * 1e6 DIV n) — from which S(t) is a trivial
# downstream fold. Lifetime = days between a user's first and last
# event; users whose last event falls within KM_CENSOR_DAYS of the
# corpus horizon are CENSORED (still alive when observation ended),
# the distinction that separates survival analysis from a naive
# lifetime histogram.
#
# Scale shape: one per-user agg (partial-agg min/max micros), one
# day-cardinality histogram, then a reverse running sum over the
# day-sized table — the ONLY SinglePartition window in the module, on
# a table whose cardinality is the number of distinct lifetime days
# (metadata-sized at any corpus scale, same argument as the shard
# packer's totals window).
KM_CENSOR_DAYS = 7


def q_events_lifetable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    spans = ev.groupBy("user_id").agg(
        F.min("us").alias("first_us"), F.max("us").alias("last_us")
    )
    horizon = spans.agg(F.max("last_us").alias("h_us"))
    day_us = 86_400 * 10**6
    per_user = spans.crossJoin(F.broadcast(horizon)).select(
        F.expr(f"CAST((last_us - first_us) DIV {day_us} AS BIGINT)").alias(
            "t"
        ),
        (
            F.col("h_us") - F.col("last_us") < KM_CENSOR_DAYS * day_us
        ).alias("censored"),
    )
    by_t = per_user.groupBy("t").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias("n_deaths"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0)).alias("n_censored"),
    )
    w = (
        Window.orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        by_t.withColumn(
            "n_at_risk", F.sum(F.col("n_deaths") + F.col("n_censored")).over(w)
        )
        .select(
            "t",
            "n_at_risk",
            "n_deaths",
            "n_censored",
            F.expr("CAST(n_deaths * 1000000 DIV n_at_risk AS BIGINT)").alias(
                "hazard_ppm"
            ),
        )
        .orderBy("t")
    )


ORACLE_EVENTS_LIFETABLE = f"""
WITH spans AS (
  SELECT user_id, min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id),
h AS (SELECT max(last_us) AS h_us FROM spans),
per_user AS (
  SELECT CAST((last_us - first_us) // 86400000000 AS BIGINT) AS t,
         (h.h_us - last_us) < {KM_CENSOR_DAYS} * 86400000000 AS censored
  FROM spans CROSS JOIN h),
by_t AS (
  SELECT t,
         sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS n_deaths,
         sum(CASE WHEN censored THEN 1 ELSE 0 END) AS n_censored
  FROM per_user GROUP BY t)
SELECT t,
       CAST(sum(n_deaths + n_censored) OVER (
         ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS n_at_risk,
       CAST(n_deaths AS BIGINT) AS n_deaths,
       CAST(n_censored AS BIGINT) AS n_censored,
       CAST(n_deaths * 1000000 // sum(n_deaths + n_censored) OVER (
         ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS hazard_ppm
FROM by_t
ORDER BY t
"""

QUERIES["events_lifetable"] = q_events_lifetable
ORACLES["events_lifetable"] = ORACLE_EVENTS_LIFETABLE


# ------------------------------------------------ forecast backtest
# Seasonal-naive forecast evaluation (the M-competition baseline every
# real forecaster must beat): predict each (event_type, day)'s event
# count with the count from FC_SEASON days earlier, score the
# prediction against the actual on every day where both exist, and
# report per-type MAE and sMAPE in exact ppm integer arithmetic
# (counts are integers; |a-p| sums exactly; the per-row sMAPE term is
# an integer division so the aggregate is order-independent).
#
# Scale shape: one (type, day) partial-agg histogram, then an
# equi-join of the histogram WITH ITSELF shifted by the season length
# (day = day + 7) — deliberately a join, not a lag() window: lag(7
# ROWS) silently mispredicts across gaps in the day sequence, while
# the shifted join is gap-correct and needs no per-type ordering.
FC_SEASON = 7


def q_events_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    pred = daily.select(
        "event_type",
        F.date_add("day", FC_SEASON).alias("day"),
        F.col("n").alias("pred"),
    )
    scored = daily.join(pred, ["event_type", "day"]).select(
        "event_type",
        "day",
        "n",
        "pred",
        F.abs(F.col("n") - F.col("pred")).alias("abs_err"),
        F.expr(
            "CAST(2000000 * abs(n - pred) DIV (n + pred) AS BIGINT)"
        ).alias("smape_term_ppm"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("n").alias("total_actual"),
            F.sum("abs_err").alias("total_abs_err"),
            F.expr(
                "CAST(sum(abs_err) * 1000000 DIV count(*) AS BIGINT)"
            ).alias("mae_ppm"),
            F.expr(
                "CAST(sum(smape_term_ppm) DIV count(*) AS BIGINT)"
            ).alias("smape_ppm"),
        )
        .orderBy("event_type")
    )


ORACLE_EVENTS_FORECAST_EVAL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2),
scored AS (
  SELECT a.event_type, a.day, a.n, p.n AS pred,
         abs(a.n - p.n) AS abs_err,
         CAST(2000000 * abs(a.n - p.n) // (a.n + p.n) AS BIGINT)
           AS smape_term_ppm
  FROM daily a
  JOIN daily p ON a.event_type = p.event_type
              AND a.day = p.day + INTERVAL {FC_SEASON} DAY)
SELECT event_type,
       count(*) AS n_days,
       CAST(sum(n) AS BIGINT) AS total_actual,
       CAST(sum(abs_err) AS BIGINT) AS total_abs_err,
       CAST(sum(abs_err) * 1000000 // count(*) AS BIGINT) AS mae_ppm,
       CAST(sum(smape_term_ppm) // count(*) AS BIGINT) AS smape_ppm
FROM scored
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["events_forecast_eval"] = q_events_forecast_eval
ORACLES["events_forecast_eval"] = ORACLE_EVENTS_FORECAST_EVAL


# ------------------------------------------------- A/B test evaluation
# Two-cohort conversion comparison (the experimentation-platform
# primitive): users split deterministically by id parity, conversion =
# purchases exceed 20% of the user's events (a SHARE predicate — the
# naive "any purchase" definition saturates on a dense event log where
# every user eventually buys, zeroing a contingency marginal; the
# degenerate-marginal case is still guarded below, chi2 = 0 when any
# marginal is empty). Counts and rates are exact integers /
# ppm; the chi-square statistic (2x2 contingency, the two-proportion
# z-test squared) follows the assortativity precedent — exact BIGINT
# sums feed ONE token-identical float formula, rounded to 4dp, so the
# only cross-engine float op is a single shared expression over
# identical integers.
#
# Scale shape: one per-user partial agg (bool_or over the purchase
# predicate), one 4-cell contingency agg — two map-side-combining
# passes, output is a single row.
def q_events_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            * 5
            > F.count("*")
        )
        .cast("int")
        .alias("converted")
    )
    cells = per_user.agg(
        F.sum(
            F.when((F.col("user_id") % 2 == 0) & (F.col("converted") == 1), 1)
            .otherwise(0)
        ).alias("a_conv"),
        F.sum(
            F.when((F.col("user_id") % 2 == 0) & (F.col("converted") == 0), 1)
            .otherwise(0)
        ).alias("a_no"),
        F.sum(
            F.when((F.col("user_id") % 2 == 1) & (F.col("converted") == 1), 1)
            .otherwise(0)
        ).alias("b_conv"),
        F.sum(
            F.when((F.col("user_id") % 2 == 1) & (F.col("converted") == 0), 1)
            .otherwise(0)
        ).alias("b_no"),
    )
    n = F.col("a_conv") + F.col("a_no") + F.col("b_conv") + F.col("b_no")
    denom = (
        (F.col("a_conv") + F.col("a_no"))
        * (F.col("b_conv") + F.col("b_no"))
        * (F.col("a_conv") + F.col("b_conv"))
        * (F.col("a_no") + F.col("b_no"))
    )
    chi2 = F.when(denom == 0, F.lit(0.0)).otherwise(
        n
        * F.pow(
            F.col("a_conv") * F.col("b_no") - F.col("a_no") * F.col("b_conv"),
            2,
        )
        / denom
    )
    return cells.select(
        "a_conv",
        "a_no",
        "b_conv",
        "b_no",
        F.expr(
            "CAST(a_conv * 1000000 DIV (a_conv + a_no) AS BIGINT)"
        ).alias("rate_a_ppm"),
        F.expr(
            "CAST(b_conv * 1000000 DIV (b_conv + b_no) AS BIGINT)"
        ).alias("rate_b_ppm"),
        F.round(chi2, 4).alias("chi2"),
    )


ORACLE_EVENTS_ABTEST = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5
              > count(*) AS INT) AS converted
  FROM events GROUP BY user_id),
cells AS (
  SELECT
    sum(CASE WHEN user_id % 2 = 0 AND converted = 1 THEN 1 ELSE 0 END)
      AS a_conv,
    sum(CASE WHEN user_id % 2 = 0 AND converted = 0 THEN 1 ELSE 0 END)
      AS a_no,
    sum(CASE WHEN user_id % 2 = 1 AND converted = 1 THEN 1 ELSE 0 END)
      AS b_conv,
    sum(CASE WHEN user_id % 2 = 1 AND converted = 0 THEN 1 ELSE 0 END)
      AS b_no
  FROM per_user)
SELECT CAST(a_conv AS BIGINT) AS a_conv, CAST(a_no AS BIGINT) AS a_no,
       CAST(b_conv AS BIGINT) AS b_conv, CAST(b_no AS BIGINT) AS b_no,
       CAST(a_conv * 1000000 // (a_conv + a_no) AS BIGINT) AS rate_a_ppm,
       CAST(b_conv * 1000000 // (b_conv + b_no) AS BIGINT) AS rate_b_ppm,
       round(coalesce((a_conv + a_no + b_conv + b_no)
             * pow(a_conv * b_no - a_no * b_conv, 2)
             / nullif((a_conv + a_no) * (b_conv + b_no)
                * (a_conv + b_conv) * (a_no + b_no), 0), 0.0), 4) AS chi2
FROM cells
"""

QUERIES["events_abtest"] = q_events_abtest
ORACLES["events_abtest"] = ORACLE_EVENTS_ABTEST


# --------------------------------------------------- CUPED adjustment
# CUPED variance-reduced A/B evaluation (Deng, Xu, Kohavi & Walker,
# WSDM 2013): adjust each user's metric y by a pre-determined
# covariate x — here y = purchase spend in exact cents, x = the
# user's engagement count (views+clicks) — with the pooled
# theta = cov(x,y)/var(x), then report per-cohort raw and adjusted
# means plus the variance-reduction factor (1 - corr^2). This is THE
# standard industry estimator for shrinking experiment confidence
# intervals without touching the point estimate (adjusted cohort means
# preserve the treatment effect because theta is cohort-independent).
# Determinism discipline: all sufficient statistics (n, Sx, Sy, Sxx,
# Sxy, Syy — pooled and per cohort) are EXACT BIGINT sums
# (order-independent), and theta / means / var-reduction are
# closed-form doubles over those identical integers with
# token-identical expression trees in both engines (the
# docs_quality_regression / events_abtest discipline). Scale shape:
# one per-user partial agg over the fact table, then two
# metadata-sized aggregates (pooled + per-cohort); the 1-row pooled
# moments broadcast into the 2-row cohort table.
def q_events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100, 0) AS BIGINT)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("y"),
    )
    pooled = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    cohorts = per_user.groupBy(
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias(
            "cohort"
        )
    ).agg(
        F.count("*").alias("n_users"),
        F.sum("x").alias("cx"),
        F.sum("y").alias("cy"),
    )
    theta = (
        "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    )
    vr = (
        "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
        "    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"
    )
    return (
        cohorts.crossJoin(F.broadcast(pooled))
        .select(
            "cohort",
            "n_users",
            "cy",
            F.round(F.expr("CAST(cy AS DOUBLE) / n_users / 100"), 4).alias(
                "mean_y"
            ),
            F.round(
                F.expr(
                    f"(CAST(cy AS DOUBLE) - ({theta})"
                    " * (CAST(cx AS DOUBLE) - CAST(n_users AS DOUBLE)"
                    "    * sx / n))"
                    " / n_users / 100"
                ),
                4,
            ).alias("mean_y_adj"),
            F.round(F.expr(theta), 4).alias("theta"),
            F.round(F.expr(f"1.0 - ({vr})"), 4).alias("var_ratio"),
        )
        .orderBy("cohort")
    )


ORACLE_EVENTS_CUPED = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type IN ('view', 'click')
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id),
pooled AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM per_user),
cohorts AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS cohort,
         count(*) AS n_users,
         CAST(sum(x) AS BIGINT) AS cx, CAST(sum(y) AS BIGINT) AS cy
  FROM per_user GROUP BY 1)
SELECT cohort, n_users, cy,
       round(CAST(cy AS DOUBLE) / n_users / 100, 4) AS mean_y,
       round((CAST(cy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                * (CAST(cx AS DOUBLE)
                   - CAST(n_users AS DOUBLE) * sx / n))
             / n_users / 100, 4) AS mean_y_adj,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 4)
         AS theta,
       round(1.0 - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / ((CAST(n AS DOUBLE) * sxx
                       - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy
                         - CAST(sy AS DOUBLE) * sy)), 4) AS var_ratio
FROM cohorts CROSS JOIN pooled
ORDER BY cohort
"""

QUERIES["events_cuped"] = q_events_cuped
ORACLES["events_cuped"] = ORACLE_EVENTS_CUPED


# ------------------------------------------------- top event paths
# Most common session-opening paths: each user's first PATH_LEN event
# types in (ts, event_id) order, folded to a path string and counted —
# the Sankey/flow-diagram source and the input to funnel design
# (events_funnel checks ONE hypothesized order; this DISCOVERS the
# orders that actually happen). Scale shape: one user-keyed rank
# window over the narrow (user, ts, id, type) projection, a per-user
# sorted-collect of at most PATH_LEN rows, one path partial agg +
# TakeOrdered — never a corpus-wide sort.
PATH_LEN = 3
PATH_TOP_K = 20


def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= PATH_LEN)
    )
    paths = firsts.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("r", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            " > ",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(PATH_TOP_K)
    )


ORACLE_EVENTS_TOP_PATHS = f"""
WITH firsts AS (
  SELECT user_id, event_type, r FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS r
    FROM events) t
  WHERE r <= {PATH_LEN}),
paths AS (
  SELECT user_id,
         string_agg(event_type, ' > ' ORDER BY r) AS path
  FROM firsts GROUP BY user_id)
SELECT path, count(*) AS n_users
FROM paths
GROUP BY path
ORDER BY n_users DESC, path ASC
LIMIT {PATH_TOP_K}
"""

QUERIES["events_top_paths"] = q_events_top_paths
ORACLES["events_top_paths"] = ORACLE_EVENTS_TOP_PATHS


# --------------------------------------------- CUSUM changepoint scan
# Mean-shift changepoint detection on the daily event-count series:
# the CUSUM statistic S_t = sum_{i<=t}(x_i - mean) peaks at the most
# likely shift day (Page 1954 / the at-most-one-changepoint scan).
# Exact-integer discipline: with T = total events over N days, the
# deviation is scaled to N*x_i - T (integer) so the running sum and
# its argmax carry NO float at all; the magnitude is reported back in
# micro-day-units (DIV N). The production monitor for "when did the
# pipeline's input change" — pairing with events_dow_seasonality
# (expected weekly structure) and docs_split_drift (content drift).
# Scale shape: one (day) partial agg off the fact table; the cumsum
# window and argmax ride the |days| table — metadata-sized.
def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("x")
    )
    tot = daily.agg(
        F.sum("x").alias("t_all"), F.count("*").alias("n_days")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cusum = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn(
            "s",
            F.sum(
                F.expr("x * n_days - t_all")
            ).over(w),
        )
        .select("d", "x", "s", "n_days", "t_all")
    )
    peak = cusum.orderBy(
        F.desc(F.abs(F.col("s"))), F.asc("d")
    ).limit(1)
    return peak.select(
        F.col("d").alias("changepoint_day"),
        F.col("x").alias("day_count"),
        F.expr("CAST(abs(s) DIV n_days AS BIGINT)").alias(
            "peak_cusum_events"
        ),
        "n_days",
        F.expr("CAST(t_all DIV n_days AS BIGINT)").alias(
            "mean_daily_events"
        ),
    )


ORACLE_EVENTS_CHANGEPOINT = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS x
  FROM events GROUP BY 1),
tot AS (
  SELECT CAST(sum(x) AS BIGINT) AS t_all, count(*) AS n_days
  FROM daily),
cusum AS (
  SELECT d, x,
         sum(x * n_days - t_all) OVER (ORDER BY d
           ROWS UNBOUNDED PRECEDING) AS s,
         n_days, t_all
  FROM daily CROSS JOIN tot)
SELECT d AS changepoint_day, x AS day_count,
       CAST(abs(s) // n_days AS BIGINT) AS peak_cusum_events,
       n_days,
       CAST(t_all // n_days AS BIGINT) AS mean_daily_events
FROM cusum
ORDER BY abs(s) DESC, d ASC
LIMIT 1
"""

QUERIES["events_changepoint"] = q_events_changepoint
ORACLES["events_changepoint"] = ORACLE_EVENTS_CHANGEPOINT


# ------------------------------------------- Markov stationary state
# Long-run state mix of the first-order chain events_transitions
# estimates: MARKOV_ROUNDS synchronous power-iteration steps
# pi' = pi.P in integer micro-units (pi'_j = sum_i floor(pi_i * n_ij /
# rowtotal_i)) — the same order-independent BIGINT fixed-point
# discipline as events_pagerank, so the whole iteration value-hashes.
# The chain runs on the states with outgoing transitions (every event
# type here); floor division leaks ppm-scale mass per round, reported
# rather than renormalized (the PageRank convention). Output compares
# the stationary estimate against the EMPIRICAL state share — the
# "will tomorrow look like today" drift check for the event mix.
# Scale shape: the count matrix is |types|^2 metadata; each round is
# one broadcast join + partial agg over it; the corpus is touched
# once (the lead() window in the shared transitions plan).
MARKOV_ROUNDS = 16


def q_events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    trans = q_events_transitions(spark, sf_dir).select(
        "from_type", "to_type", "n_transitions"
    )
    totals = trans.groupBy("from_type").agg(
        F.sum("n_transitions").alias("row_total")
    )
    mat = trans.join(F.broadcast(totals), "from_type")
    states = mat.select(F.col("from_type").alias("state")).distinct()
    k = states.count()  # |event types| — metadata
    pi = states.select("state", F.lit(PPM // k).cast("long").alias("mass"))
    for _ in range(MARKOV_ROUNDS):
        pi = (
            mat.join(
                F.broadcast(pi), mat.from_type == F.col("state")
            )
            .groupBy(F.col("to_type").alias("state"))
            .agg(
                F.sum(
                    F.expr("mass * n_transitions DIV row_total")
                ).alias("mass")
            )
        )
    ev = load_table(spark, sf_dir, "events")
    emp = ev.groupBy(F.col("event_type").alias("state")).agg(
        F.count("*").alias("n_events")
    )
    n_tot = emp.agg(F.sum("n_events").alias("n_all"))
    return (
        pi.join(F.broadcast(emp), "state")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "state",
            F.col("mass").alias("stationary_ppm"),
            F.expr(f"n_events * {PPM} DIV n_all").alias("empirical_ppm"),
            "n_events",
        )
        .orderBy("state")
    )


def _oracle_markov_stationary() -> str:
    rounds = []
    prev = "r0"
    for t in range(1, MARKOV_ROUNDS + 1):
        rounds.append(f"""
r{t} AS (
  SELECT to_type AS state,
         CAST(sum((mass * n_transitions) // row_total) AS BIGINT) AS mass
  FROM mat JOIN {prev} ON mat.from_type = {prev}.state
  GROUP BY to_type)""")
        prev = f"r{t}"
    chain = ",".join(rounds)
    return f"""
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS to_type
  FROM events),
counts AS (
  SELECT event_type AS from_type, to_type, count(*) AS n_transitions
  FROM ordered WHERE to_type IS NOT NULL GROUP BY 1, 2),
totals AS (
  SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS row_total
  FROM counts GROUP BY from_type),
mat AS (SELECT * FROM counts JOIN totals USING (from_type)),
states AS (SELECT DISTINCT from_type AS state FROM mat),
kk AS (SELECT count(*) AS k FROM states),
r0 AS (
  SELECT state, CAST({PPM} // k AS BIGINT) AS mass
  FROM states CROSS JOIN kk),{chain},
emp AS (
  SELECT event_type AS state, count(*) AS n_events
  FROM events GROUP BY event_type),
n_tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS n_all FROM emp)
SELECT state, mass AS stationary_ppm,
       CAST(n_events * {PPM} // n_all AS BIGINT) AS empirical_ppm,
       n_events
FROM {prev}
JOIN emp USING (state)
CROSS JOIN n_tot
ORDER BY state
"""


ORACLE_EVENTS_MARKOV_STATIONARY = _oracle_markov_stationary()

QUERIES["events_markov_stationary"] = q_events_markov_stationary
ORACLES["events_markov_stationary"] = ORACLE_EVENTS_MARKOV_STATIONARY


# ------------------------------------------- Holt linear-trend smoothing
# Double exponential smoothing (Holt 1957) over each event type's
# daily-count series — the classic level+trend forecaster one rung
# above the seasonal-naive baseline ``events_forecast_eval`` scores.
# The recurrence
#     l_t = alpha*y_t + (1-alpha)*(l_{t-1} + b_{t-1})
#     b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
# with the textbook init l_2 = y_2, b_2 = y_2 - y_1 (Hyndman & # noqa
# Athanasopoulos, fpp3 ch. 8), smoothing from t = 3 — under which a
# purely linear series is tracked EXACTLY (zero one-step error), the
# property the test suite pins.
# is inherently SEQUENTIAL per series, which is exactly where a naive
# port reaches for a Python loop. Here it is a higher-order-function
# fold: Spark ``aggregate()`` over the sorted per-type day array,
# twinned by a DuckDB linear recursive CTE carrying the same
# recurrence — the cross-engine hash match proves lambda-fold parity,
# a mechanism none of the other 200 oracles exercises. (DuckDB's own
# ``list_reduce`` was measured and rejected: in 1.0 it assigns
# accumulator-struct fields sequentially, so a later field sees the
# already-updated ``l`` — see the oracle note.)
# Determinism is engineered, not hoped for: the
# inputs are exact integer day-counts, alpha = beta = 1/2 are exact
# dyadic doubles, and the lambda bodies are written with the SAME
# IEEE expression tree in both dialects, so every intermediate level/
# trend/SSE double is bit-identical.
#
# Scale shape: one (type, day) partial-agg histogram (map-side
# combinable), then ONE fixed-width row per series through the fold —
# state per series is 3 doubles, series length is the day horizon
# (bounded by retention, not corpus size), and series are independent
# so the stage is embarrassingly parallel across the series key. No
# window over raw events, no driver loop.
HOLT_FORECAST_H = 7  # forecast horizon (days ahead)


def q_events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, n))),"
            " s -> CAST(s.n AS DOUBLE))"
        ).alias("ys")
    )
    holt = series.where(F.expr("size(ys) >= 3")).select(
        "event_type",
        F.expr("size(ys)").alias("n_days"),
        F.expr(
            """
            aggregate(
              slice(ys, 3, size(ys) - 2),
              named_struct(
                'l', element_at(ys, 2),
                'b', element_at(ys, 2) - element_at(ys, 1),
                'sse', CAST(0 AS DOUBLE)),
              (acc, y) -> named_struct(
                'l', y * 0.5D + (acc.l + acc.b) * 0.5D,
                'b', (y * 0.5D + (acc.l + acc.b) * 0.5D - acc.l) * 0.5D
                     + acc.b * 0.5D,
                'sse', acc.sse + (y - (acc.l + acc.b))
                               * (y - (acc.l + acc.b))))
            """
        ).alias("h"),
    )
    return holt.select(
        "event_type",
        "n_days",
        F.expr("round(h.l, 6)").alias("level"),
        F.expr("round(h.b, 6)").alias("trend"),
        F.expr(f"round(h.l + h.b * CAST({HOLT_FORECAST_H} AS DOUBLE), 6)")
         .alias("forecast_h"),
        F.expr(
            "round(sqrt(h.sse / CAST(n_days - 2 AS DOUBLE)), 6)"
        ).alias("rmse_1step"),
    ).orderBy("event_type")


# NOTE the oracle is a linear RECURSIVE CTE, not DuckDB's
# ``list_reduce``: duckdb 1.0's list_reduce assigns the accumulator
# struct's fields SEQUENTIALLY (a later field expression observes the
# already-updated earlier fields — ``b`` would see the new ``l``),
# while Spark's named_struct is simultaneous. The recursive CTE has
# well-defined simultaneous semantics and carries the very same IEEE
# expression tree, so the value hash still proves fold parity.
ORACLE_EVENTS_HOLT_FORECAST = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2),
idx AS (
  SELECT event_type, CAST(n AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_days
  FROM daily),
init AS (
  SELECT a.event_type, a.n_days, 2 AS t,
         b.y AS l, b.y - a.y AS b, CAST(0 AS DOUBLE) AS sse
  FROM idx a
  JOIN idx b ON a.event_type = b.event_type AND b.rn = 2
  WHERE a.rn = 1 AND a.n_days >= 3),
holt AS (
  SELECT * FROM init
  UNION ALL
  SELECT r.event_type, r.n_days, r.t + 1,
         d.y * 0.5 + (r.l + r.b) * 0.5,
         (d.y * 0.5 + (r.l + r.b) * 0.5 - r.l) * 0.5 + r.b * 0.5,
         r.sse + (d.y - (r.l + r.b)) * (d.y - (r.l + r.b))
  FROM holt r
  JOIN idx d ON d.event_type = r.event_type AND d.rn = r.t + 1)
SELECT event_type,
       CAST(n_days AS BIGINT) AS n_days,
       round(l, 6) AS level,
       round(b, 6) AS trend,
       round(l + b * CAST({HOLT_FORECAST_H} AS DOUBLE), 6)
         AS forecast_h,
       round(sqrt(sse / CAST(n_days - 2 AS DOUBLE)), 6) AS rmse_1step
FROM holt
WHERE t = n_days
ORDER BY event_type
"""

QUERIES["events_holt_forecast"] = q_events_holt_forecast
ORACLES["events_holt_forecast"] = ORACLE_EVENTS_HOLT_FORECAST


# ------------------------------------------- burst-state segmentation
# Kleinberg-style two-state burst automaton over each event type's
# daily-count series, solved EXACTLY by min-plus Viterbi — the
# trending/incident segmentation one rung above single-changepoint
# CUSUM (``events_changepoint``): hysteresis via an entry toll means
# one noisy day neither starts nor ends a burst.
#
# Integer formulation (no float anywhere): threshold thr =
# floor(3*total / (2*T)) + 1 (strictly above 1.5x the mean day);
# day-cost of the BASE state = max(0, n_t - thr) (pays for excess),
# of the BURST state = max(0, thr - n_t) (pays for shortfall);
# entering the burst state costs GAMMA = thr. Viterbi recurrence
#   c0_t = base_t + min(c0, c1);          pred0 = argmin (ties: stay)
#   c1_t = burst_t + min(c1, c0 + thr);   pred1 = argmin (ties: stay)
# then a backward pass follows the argmin pointers from the cheaper
# final state (ties: base). Everything is BIGINT min-plus algebra, so
# both engines agree bit-for-bit with no expression-tree discipline
# needed.
#
# Mechanism: the forward pass is a second aggregate() HOF fold (after
# ``events_holt_forecast``) but carrying DP state + per-step
# BACKPOINTER ARRAYS, and the backward pass is a second fold over the
# reversed index range — i.e. a full per-series dynamic program in
# pure DataFrame expressions. The DuckDB twin runs the identical
# recurrence as two linear recursive CTEs (forward, then pointer-
# following backtrack). Scale shape: one (type, day) partial-agg
# histogram, then ONE row per series through the folds; series are
# independent and state is O(T) per series (the day horizon, bounded
# by retention) — embarrassingly parallel, no window over raw events.
def q_events_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    series = daily.groupBy("event_type").agg(
        F.expr(
            "array_sort(collect_list(struct(day, n)))"
        ).alias("ds")
    ).select(
        "event_type",
        F.expr("transform(ds, s -> s.day)").alias("days"),
        F.expr("transform(ds, s -> s.n)").alias("ys"),
        F.expr("size(ds)").alias("t_days"),
        F.expr(
            "CAST(3 * aggregate(ds, 0L, (a, s) -> a + s.n)"
            " DIV (2 * size(ds)) + 1 AS BIGINT)"
        ).alias("thr"),
    )
    fwd = series.select(
        "event_type",
        "days",
        "ys",
        "t_days",
        "thr",
        F.expr(
            """
            aggregate(
              slice(ys, 2, t_days - 1),
              named_struct(
                'c0', greatest(element_at(ys, 1) - thr, 0L),
                'c1', thr + greatest(thr - element_at(ys, 1), 0L),
                'p0', CAST(array() AS ARRAY<INT>),
                'p1', CAST(array() AS ARRAY<INT>)),
              (acc, y) -> named_struct(
                'c0', greatest(y - thr, 0L) + least(acc.c0, acc.c1),
                'c1', greatest(thr - y, 0L)
                      + least(acc.c1, acc.c0 + thr),
                'p0', concat(acc.p0,
                             array(IF(acc.c1 < acc.c0, 1, 0))),
                'p1', concat(acc.p1,
                             array(IF(acc.c0 + thr < acc.c1, 0, 1)))))
            """
        ).alias("v"),
    )
    # backward pass: state_T = argmin(c0,c1) (ties: base); walking t =
    # T..2, state_{t-1} = p{state_t}[t-1] (pointer arrays are 1-based
    # over steps 2..T, so step t's pointer sits at index t-1)
    back = fwd.select(
        "event_type",
        "days",
        "ys",
        "t_days",
        F.expr(
            """
            aggregate(
              CASE WHEN t_days >= 2
                   THEN sequence(CAST(t_days AS INT), 2)
                   ELSE CAST(array() AS ARRAY<INT>) END,
              named_struct(
                'cur', IF(v.c1 < v.c0, 1, 0),
                'rev', array(IF(v.c1 < v.c0, 1, 0))),
              (acc, t) -> named_struct(
                'cur', IF(acc.cur = 0,
                          element_at(v.p0, t - 1),
                          element_at(v.p1, t - 1)),
                'rev', concat(acc.rev,
                              array(IF(acc.cur = 0,
                                       element_at(v.p0, t - 1),
                                       element_at(v.p1, t - 1))))))
            """
        ).alias("b"),
    )
    return (
        back.select(
            "event_type",
            F.expr(
                """
                posexplode(
                  zip_with(days, reverse(b.rev),
                           (d, s) -> struct(d AS day, s AS state)))
                """
            ).alias("_pos", "z"),
            F.col("ys"),
        )
        .select(
            "event_type",
            F.col("z.day").alias("day"),
            F.expr("element_at(ys, _pos + 1)").alias("n"),
            F.col("z.state").cast("int").alias("burst"),
        )
        .orderBy("event_type", "day")
    )


ORACLE_EVENTS_BURSTS = """
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT event_type, day, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         count(*) OVER (PARTITION BY event_type) AS t_days,
         CAST(3 * sum(n) OVER (PARTITION BY event_type)
              // (2 * count(*) OVER (PARTITION BY event_type)) + 1
              AS BIGINT) AS thr
  FROM daily),
fwd AS (
  SELECT event_type, t, t_days, thr,
         greatest(n - thr, 0) AS c0,
         thr + greatest(thr - n, 0) AS c1,
         0 AS p0, 0 AS p1
  FROM idx WHERE t = 1
  UNION ALL
  SELECT f.event_type, d.t, f.t_days, f.thr,
         greatest(d.n - f.thr, 0) + least(f.c0, f.c1),
         greatest(f.thr - d.n, 0) + least(f.c1, f.c0 + f.thr),
         CASE WHEN f.c1 < f.c0 THEN 1 ELSE 0 END,
         CASE WHEN f.c0 + f.thr < f.c1 THEN 0 ELSE 1 END
  FROM fwd f JOIN idx d ON d.event_type = f.event_type
                       AND d.t = f.t + 1),
back AS (
  SELECT event_type, t,
         CASE WHEN c1 < c0 THEN 1 ELSE 0 END AS state
  FROM fwd WHERE t = t_days
  UNION ALL
  SELECT b.event_type, b.t - 1,
         CASE WHEN b.state = 0 THEN f.p0 ELSE f.p1 END
  FROM back b JOIN fwd f ON f.event_type = b.event_type
                        AND f.t = b.t
  WHERE b.t > 1)
SELECT i.event_type, i.day, i.n, CAST(b.state AS INT) AS burst
FROM idx i JOIN back b ON i.event_type = b.event_type AND i.t = b.t
ORDER BY i.event_type, i.day
"""

QUERIES["events_bursts"] = q_events_bursts
ORACLES["events_bursts"] = ORACLE_EVENTS_BURSTS


# --------------------------------------- difference-in-differences
# The panel-data causal estimator that closes the experimentation
# family (events_abtest's cross-section chi-square, events_cuped's
# variance reduction, multi-touch attribution): cohorts split by the
# same deterministic id parity as events_abtest, periods split at the
# corpus midpoint date (computed IN-QUERY from min/max event days, so
# the estimator is corpus-relative, not a hardcoded date), and
# DiD = (treat_post - treat_pre) - (ctrl_post - ctrl_pre)
# over per-cell mean event values. Exactness discipline: values are
# exact integer cents, each cell mean is emitted as micro-cents via
# BIGINT floor division (sum * 1e6 DIV n), and the DiD is integer
# arithmetic over those four integers — no float anywhere.
#
# Scale shape: ONE pass — a single 4-cell partial aggregation keyed on
# (treat, post) after a broadcast of the scalar midpoint; output is
# one row. The parallel-trends diagnostic (pre-period gap) rides along.
def q_events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.expr(
            "CAST(min(CAST(ts AS DATE)) + CAST("
            "datediff(max(CAST(ts AS DATE)), min(CAST(ts AS DATE)))"
            " DIV 2 AS INT) AS DATE)"
        ).alias("mid")
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        (F.col("user_id") % 2 == 1).cast("int").alias("treat"),
        (F.col("ts").cast("date") > F.col("mid")).cast("int").alias("post"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )

    def cell(t: int, p: int) -> str:
        # exact micro-cents cell mean: sum * 1e6 DIV n
        s = f"sum(IF(treat = {t} AND post = {p}, cents, 0L))"
        n = f"sum(IF(treat = {t} AND post = {p}, 1L, 0L))"
        return f"CAST({s} * 1000000 DIV {n} AS BIGINT)"

    return tagged.groupBy().agg(
        F.expr("sum(IF(treat = 0, 1L, 0L))").alias("n_ctrl"),
        F.expr("sum(IF(treat = 1, 1L, 0L))").alias("n_treat"),
        F.expr(cell(0, 0)).alias("ctrl_pre_ucents"),
        F.expr(cell(0, 1)).alias("ctrl_post_ucents"),
        F.expr(cell(1, 0)).alias("treat_pre_ucents"),
        F.expr(cell(1, 1)).alias("treat_post_ucents"),
        F.expr(
            f"({cell(1, 1)} - {cell(1, 0)}) - ({cell(0, 1)} - {cell(0, 0)})"
        ).alias("did_ucents"),
        F.expr(f"{cell(1, 0)} - {cell(0, 0)}").alias("pre_gap_ucents"),
    )


ORACLE_EVENTS_DID = """
WITH bounds AS (
  SELECT CAST(min(CAST(ts AS DATE))
         + CAST((max(CAST(ts AS DATE)) - min(CAST(ts AS DATE))) // 2
                AS INTEGER)
         AS DATE) AS mid
  FROM events),
cells AS (
  SELECT CAST(user_id % 2 = 1 AS INT) AS treat,
         CAST(CAST(ts AS DATE) > b.mid AS INT) AS post,
         count(*) AS n,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) * 1000000
              // count(*) AS BIGINT) AS mean_ucents
  FROM events CROSS JOIN bounds b
  GROUP BY 1, 2)
SELECT
  CAST((SELECT sum(n) FROM cells WHERE treat = 0) AS BIGINT) AS n_ctrl,
  CAST((SELECT sum(n) FROM cells WHERE treat = 1) AS BIGINT) AS n_treat,
  (SELECT mean_ucents FROM cells WHERE treat = 0 AND post = 0)
    AS ctrl_pre_ucents,
  (SELECT mean_ucents FROM cells WHERE treat = 0 AND post = 1)
    AS ctrl_post_ucents,
  (SELECT mean_ucents FROM cells WHERE treat = 1 AND post = 0)
    AS treat_pre_ucents,
  (SELECT mean_ucents FROM cells WHERE treat = 1 AND post = 1)
    AS treat_post_ucents,
  (SELECT mean_ucents FROM cells WHERE treat = 1 AND post = 1)
  - (SELECT mean_ucents FROM cells WHERE treat = 1 AND post = 0)
  - ((SELECT mean_ucents FROM cells WHERE treat = 0 AND post = 1)
     - (SELECT mean_ucents FROM cells WHERE treat = 0 AND post = 0))
    AS did_ucents,
  (SELECT mean_ucents FROM cells WHERE treat = 1 AND post = 0)
  - (SELECT mean_ucents FROM cells WHERE treat = 0 AND post = 0)
    AS pre_gap_ucents
"""

QUERIES["events_did"] = q_events_did
ORACLES["events_did"] = ORACLE_EVENTS_DID


# ---------------------------------------------- sequence-pattern CEP
# Regex pattern matching over per-user event-type sequences — the
# batch form of the CEP / MATCH_RECOGNIZE workload: each user's
# history collapses to a compact string of event-type initials
# (deterministic (ts_micros, event_id) order — the module's standard
# sequence key), and a fixed bank of behavioral patterns is evaluated
# as substring regexes: signup converting to purchase with only
# views/clicks between, an error burst (3+ consecutive errors), and
# adjacent repeat purchases. Output: per pattern, matching-user count
# and exact ppm share of the user base. The patterns use only
# alternation / classes / star — the regex fragment where Java
# (Spark) and RE2 (DuckDB) semantics coincide; contains-semantics in
# both engines (rlike / regexp_matches).
#
# Scale shape: ONE groupBy(user) building the ordered initial string
# (ObjectHashAggregate; string length = the user's event count, the
# same per-user bound every sequence operator here carries), then ONE
# scalar aggregate evaluating all patterns as codegen flags, then a
# 3-row stack. No joins, no window over raw events.

CEP_PATTERNS = (
    ("signup_to_purchase", "s[vc]*p"),
    ("error_burst", "eee"),
    ("repeat_purchase", "pp"),
)

# Symbols come from a FIXED explicit type->char map, not
# substring(event_type,1,1): a future event type sharing an initial
# with an existing one (e.g. 'export' next to 'error') would silently
# corrupt every pattern while tests kept passing. Types outside the
# map collapse to '_', a character no pattern references, so unknown
# taxonomy additions break nothing and match nothing.
CEP_SYMBOLS = (
    ("click", "c"),
    ("error", "e"),
    ("purchase", "p"),
    ("signup", "s"),
    ("view", "v"),
)
assert len({ch for _, ch in CEP_SYMBOLS}) == len(CEP_SYMBOLS)
CEP_SYMBOL_CASE = (
    "CASE event_type "
    + " ".join(f"WHEN '{t}' THEN '{ch}'" for t, ch in CEP_SYMBOLS)
    + " ELSE '_' END"
)


def q_events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.expr(CEP_SYMBOL_CASE).alias("ini"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("us", "event_id", "ini"))
                ),
                lambda x: x.ini,
            ),
            "",
        ).alias("seq")
    )
    flags = [
        F.sum(F.col("seq").rlike(pat).cast("long")).alias(f"m{i}")
        for i, (_, pat) in enumerate(CEP_PATTERNS)
    ]
    agg = seqs.agg(F.count("*").alias("n_users"), *flags)
    stack_args = ", ".join(
        f"'{name}', '{pat}', m{i}"
        for i, (name, pat) in enumerate(CEP_PATTERNS)
    )
    return (
        agg.select(
            F.expr(
                f"stack({len(CEP_PATTERNS)}, {stack_args}) "
                "AS (pattern, regex, n_matching)"
            ),
            "n_users",
        )
        .withColumn("share_ppm", F.expr("n_matching * 1000000 DIV n_users"))
        .orderBy("pattern")
    )


def _cep_oracle() -> str:
    flag_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN regexp_matches(seq, '{pat}') THEN 1 ELSE 0 "
        f"END) AS BIGINT) AS m{i}"
        for i, (_, pat) in enumerate(CEP_PATTERNS)
    )
    rows = "\n  UNION ALL ".join(
        f"SELECT '{name}' AS pattern, '{pat}' AS regex, m{i} AS n_matching,"
        " n_users FROM agg"
        for i, (name, pat) in enumerate(CEP_PATTERNS)
    )
    return f"""
WITH seqs AS (
  SELECT user_id,
         string_agg({CEP_SYMBOL_CASE}, ''
                    ORDER BY epoch_us(ts), event_id) AS seq
  FROM events GROUP BY user_id),
agg AS (
  SELECT count(*) AS n_users,
         {flag_cols}
  FROM seqs),
rows_ AS (
  {rows})
SELECT pattern, regex, n_matching, n_users,
       n_matching * 1000000 // n_users AS share_ppm
FROM rows_
ORDER BY pattern
"""


QUERIES["events_pattern_match"] = q_events_pattern_match
ORACLES["events_pattern_match"] = _cep_oracle()


# ------------------------------------------------ sample-ratio check
# Sample-ratio-mismatch (SRM) guardrail for the A/B machinery — the
# pre-test every experiment readout must pass: under the module's
# id-parity assignment (user_id % 2, the events_abtest / events_cuped
# convention) the two cohorts should split 50/50 among ASSIGNED users
# actually observed; a significant imbalance means broken
# randomization or differential logging, and every downstream lift
# number is void. Evaluated overall AND per event type (a type whose
# observed users skew by cohort is differential logging even when the
# global split looks fine). For an equal split the chi-square
# statistic reduces to (n_a − n_b)² / n; it is emitted in exact
# integer micro units and the flag compares cross-multiplied BIGINTs
# against the χ²₁ 5% critical value 3.841459 — no float anywhere.
#
# Scale shape: one pruned scan folding to distinct (segment, cohort,
# user) rows (partial agg), a |segments|×2 census, and a 6-integer
# final row per segment. The ALL segment rides the same aggregation.

SRM_CHI2_CRIT_MICRO = 3_841_459  # chi-square(1 df) at alpha = 0.05


def q_events_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    )
    seg = ev.select("event_type", "user_id").unionByName(
        ev.select(F.lit("ALL").alias("event_type"), "user_id")
    )
    per = (
        seg.distinct()
        .groupBy("event_type")
        .agg(
            F.sum((F.col("user_id") % 2 == 0).cast("long")).alias("n_a"),
            F.sum((F.col("user_id") % 2 == 1).cast("long")).alias("n_b"),
        )
    )
    diff2 = "(n_a - n_b) * (n_a - n_b)"
    return per.select(
        F.col("event_type").alias("segment"),
        "n_a",
        "n_b",
        F.expr(f"{diff2} * 1000000 DIV (n_a + n_b)").alias("chi2_micro"),
        F.expr(
            f"CAST({diff2} * 1000000 > {SRM_CHI2_CRIT_MICRO} * (n_a + n_b)"
            " AS BIGINT)"
        ).alias("srm_flag"),
    ).orderBy("segment")


ORACLE_EVENTS_AB_SRM = f"""
WITH seg AS (
  SELECT event_type, user_id FROM events
  UNION ALL
  SELECT 'ALL', user_id FROM events),
per AS (
  SELECT event_type,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_b
  FROM (SELECT DISTINCT event_type, user_id FROM seg)
  GROUP BY event_type)
SELECT event_type AS segment, n_a, n_b,
       (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) AS chi2_micro,
       CAST((n_a - n_b) * (n_a - n_b) * 1000000
            > {SRM_CHI2_CRIT_MICRO} * (n_a + n_b) AS BIGINT) AS srm_flag
FROM per
ORDER BY segment
"""


QUERIES["events_ab_srm"] = q_events_ab_srm
ORACLES["events_ab_srm"] = ORACLE_EVENTS_AB_SRM


# ------------------------------------------- second-order transitions
# Second-order (trigram) Markov transitions over per-user event-type
# sequences, with the first-order baseline attached: for each
# (a, b) → c step the conditional probability P(c | a,b) is compared
# against P(c | b) — lift_ppm > 1e6 means the extra symbol of memory
# genuinely sharpens next-action prediction (the memory-order test a
# behavioral model runs before paying for longer context; the
# quantitative follow-up to events_transitions' first-order matrix).
# Sequences use the module's deterministic (ts_micros, event_id)
# ordering; probabilities are exact ppm integers; lift_ppm =
# p2_ppm · 1e6 DIV p1_ppm in BIGINT, with the explicit sentinel -1
# when p1_ppm truncates to 0 (undefined lift at extreme skew). Output
# is the TRIGRAM_TOP most frequent trigram steps under a total order.
#
# Scale shape: ONE per-user window produces both lead(1) and lead(2)
# in the same Window op; trigram and bigram counts are partial aggs
# over the (|types|³ / |types|²)-sized key spaces; the baseline
# attaches by broadcast. No second pass over events.

TRIGRAM_TOP = 50


def q_events_trigram_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    steps = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).where(F.col("c").isNotNull())
    tri = steps.groupBy("a", "b", "c").agg(F.count("*").alias("n_abc"))
    tri_tot = tri.groupBy("a", "b").agg(F.sum("n_abc").alias("n_ab"))
    bi = steps.groupBy("b", "c").agg(F.count("*").alias("n_bc"))
    bi_tot = bi.groupBy("b").agg(F.sum("n_bc").alias("n_b"))
    return (
        tri.join(F.broadcast(tri_tot), ["a", "b"])
        .join(F.broadcast(bi), ["b", "c"])
        .join(F.broadcast(bi_tot), ["b"])
        .select(
            "a",
            "b",
            "c",
            "n_abc",
            F.expr("n_abc * 1000000 DIV n_ab").alias("p2_ppm"),
            F.expr("n_bc * 1000000 DIV n_b").alias("p1_ppm"),
            # p1_ppm truncates to 0 when n_b > 1e6*n_bc (large-corpus
            # skew); lift is then undefined, so emit the explicit -1
            # sentinel rather than ride DIV-by-zero into an accidental
            # NULL in a top-50 report column.
            F.expr(
                "CASE WHEN n_bc * 1000000 DIV n_b = 0 THEN -1"
                " ELSE (n_abc * 1000000 DIV n_ab) * 1000000"
                " DIV (n_bc * 1000000 DIV n_b) END"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("n_abc"), "a", "b", "c")
        .limit(TRIGRAM_TOP)
    )


ORACLE_EVENTS_TRIGRAM_TRANSITIONS = f"""
WITH ordered AS (
  SELECT event_type AS a,
         lead(event_type, 1) OVER
           (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS b,
         lead(event_type, 2) OVER
           (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS c
  FROM events),
steps AS (SELECT a, b, c FROM ordered WHERE c IS NOT NULL),
tri AS (SELECT a, b, c, count(*) AS n_abc FROM steps GROUP BY 1, 2, 3),
tri_tot AS (SELECT a, b, CAST(sum(n_abc) AS BIGINT) AS n_ab
            FROM tri GROUP BY 1, 2),
bi AS (SELECT b, c, count(*) AS n_bc FROM steps GROUP BY 1, 2),
bi_tot AS (SELECT b, CAST(sum(n_bc) AS BIGINT) AS n_b
           FROM bi GROUP BY 1)
SELECT t.a, t.b, t.c, t.n_abc,
       t.n_abc * 1000000 // tt.n_ab AS p2_ppm,
       b2.n_bc * 1000000 // bt.n_b AS p1_ppm,
       CASE WHEN b2.n_bc * 1000000 // bt.n_b = 0 THEN -1
            ELSE (t.n_abc * 1000000 // tt.n_ab) * 1000000
                 // (b2.n_bc * 1000000 // bt.n_b) END AS lift_ppm
FROM tri t
JOIN tri_tot tt USING (a, b)
JOIN bi b2 USING (b, c)
JOIN bi_tot bt USING (b)
ORDER BY n_abc DESC, a, b, c
LIMIT {TRIGRAM_TOP}
"""


QUERIES["events_trigram_transitions"] = q_events_trigram_transitions
ORACLES["events_trigram_transitions"] = ORACLE_EVENTS_TRIGRAM_TRANSITIONS
