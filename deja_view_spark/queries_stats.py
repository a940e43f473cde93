"""Distribution / drift / trend statistics a corpus-curation pipeline
monitors continuously (driver-checkable, exact-arithmetic oracles).

Four operator families, each chosen so the cross-engine comparison
path is either pure integer arithmetic or a single deterministic
float expression over exact integer inputs:

``events_decayed_trending`` — exponentially time-decayed activity
scores per item (props ``$.k``), the standard trending-detection
primitive (recent events count more; half-life = 1 day). The decay
weight is computed in EXACT integer arithmetic: ``w = 2^20 >> d``
(days old, clamped to 20), so the per-item score is a plain BIGINT
sum — order-independent, bit-identical across engines, no float on
the comparison path. ``recency_ppm`` normalizes by the score a
same-sized burst of brand-new events would get. Scale shape: one
column-pruned scan, the anchor date is a broadcast scalar aggregate,
one partial-agg groupBy over the item key space, TakeOrdered finish.

``docs_quality_regression`` — per-language ordinary-least-squares fit
of token count against character count (chars-per-token calibration,
the sizing model a tokenizer-budget planner needs). The DISTRIBUTED
part is one aggregation of exact BIGINT sufficient statistics
(n, Σx, Σy, Σx², Σxy, Σy²) — the "GLM by moments" pattern that scales
to any corpus size with a single map-side-combinable shuffle of six
numbers per group; slope/intercept/R² are then closed-form doubles
derived from identical integers in both engines (same IEEE expression
tree → same bits), rounded for display.

``events_gini`` — Gini concentration coefficient of per-user activity,
per event type plus overall: the skew monitor that tells you whether
a handful of power users dominate the stream (and hence whether a
user-keyed shuffle needs salting). Pure integer arithmetic end to end:
G = (2·Σrank·cnt − (n+1)·T) / (n·T), emitted in exact ppm via BIGINT
DIV. The rank window sorts one fixed-width row per (type, user) —
|users| not |events| — with a deterministic (cnt, user_id) tiebreak.

``docs_split_drift`` — per-source Jensen-Shannon divergence (bits)
between the source's token distribution and the whole-corpus
distribution: the drift alarm for ingest monitoring (a source whose
JSD jumps changed its content mix). One tokenize pass; the q-side mass
of tokens ABSENT from a source is folded in closed form
(p=0 ⇒ m=q/2 ⇒ the token contributes exactly q/2 bits), so the join
stays (source, token)-present-pairs-sized instead of source×vocab.
Float log2 sums use the accepted rounding pattern of
``docs_lm_perplexity`` (round 4dp; libm-ulp risk ~1e-12 against a
1e-4 grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deja_view_spark.queries_text import TOKEN_RE
from deja_view_spark.sources.catalog import load_table

PPM = 10**6

# decayed-trending knobs (mirrored verbatim in the oracle SQL)
DECAY_Q = 20  # weight = 2^DECAY_Q >> days_old  (exact dyadic decay)
DECAY_SCALE = 1 << DECAY_Q
TREND_TOPK = 25


def q_events_decayed_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("long").alias("item"),
        F.col("ts").cast("date").alias("d"),
    ).where(F.col("item").isNotNull())
    anchor = ev.agg(F.max("d").alias("anchor"))
    scored = (
        ev.crossJoin(F.broadcast(anchor))
        .select(
            "item",
            F.least(F.datediff("anchor", "d"), F.lit(DECAY_Q)).alias("days_old"),
        )
        .select(
            "item",
            # SQL shiftright takes a column shift amount (the Python
            # helper F.shiftright only accepts an int literal)
            F.expr(
                f"shiftright(CAST({DECAY_SCALE} AS BIGINT),"
                " CAST(days_old AS INT))"
            ).alias("w"),
        )
        .groupBy("item")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("w").alias("score_q20"),
        )
        .select(
            "item",
            "n_events",
            "score_q20",
            F.expr(
                f"CAST(score_q20 * {PPM} DIV (n_events * {DECAY_SCALE}) AS BIGINT)"
            ).alias("recency_ppm"),
        )
    )
    return scored.orderBy(F.desc("score_q20"), "item").limit(TREND_TOPK)


ORACLE_EVENTS_DECAYED_TRENDING = f"""
WITH ev AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         CAST(ts AS DATE) AS d
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL),
anchor AS (SELECT max(d) AS anchor FROM ev),
weighted AS (
  SELECT item,
         {DECAY_SCALE} >> least(datediff('day', d, anchor), {DECAY_Q}) AS w
  FROM ev CROSS JOIN anchor),
scored AS (
  SELECT item, count(*) AS n_events, sum(w) AS score_q20
  FROM weighted GROUP BY item)
SELECT item, n_events, CAST(score_q20 AS BIGINT) AS score_q20,
       CAST(score_q20 * {PPM} // (n_events * {DECAY_SCALE}) AS BIGINT)
         AS recency_ppm
FROM scored
ORDER BY score_q20 DESC, item
LIMIT {TREND_TOPK}
"""


def q_docs_quality_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0))
        .cast("long")
        .alias("y"),
    )
    moments = docs.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    # closed-form OLS from exact integer moments; every float op below
    # is the same IEEE expression tree the oracle evaluates.
    return moments.select(
        "lang",
        "n",
        F.expr(
            "round(CAST(n * sxy - sx * sy AS DOUBLE)"
            " / CAST(n * sxx - sx * sx AS DOUBLE), 8)"
        ).alias("slope"),
        F.expr(
            "round((CAST(sy AS DOUBLE)"
            " - (CAST(n * sxy - sx * sy AS DOUBLE)"
            "    / CAST(n * sxx - sx * sx AS DOUBLE))"
            "   * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)"
        ).alias("intercept"),
        F.expr(
            "round((CAST(n * sxy - sx * sy AS DOUBLE)"
            "       / CAST(n * sxx - sx * sx AS DOUBLE))"
            "    * (CAST(n * sxy - sx * sy AS DOUBLE)"
            "       / CAST(n * syy - sy * sy AS DOUBLE)), 6)"
        ).alias("r2"),
    ).orderBy("lang")


ORACLE_DOCS_QUALITY_REGRESSION = f"""
WITH feats AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS x,
         CAST(length(regexp_extract_all(lower(text), '{TOKEN_RE}'))
              AS BIGINT) AS y
  FROM documents),
moments AS (
  SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM feats GROUP BY lang)
SELECT lang, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 8) AS slope,
       round((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
       round((CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE))
           * (CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
FROM moments
ORDER BY lang
"""


def q_events_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("cnt")
    )
    # overall row derived by RE-AGGREGATING the per-type counts — no
    # second scan of the event log.
    overall = (
        per_user.groupBy("user_id")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.lit("__all__").alias("event_type"), "user_id", "cnt")
    )
    both = per_user.unionByName(overall)
    w = Window.partitionBy("event_type").orderBy("cnt", "user_id")
    ranked = both.select(
        "event_type", "cnt", F.row_number().over(w).alias("r")
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("cnt").alias("total_events"),
            F.sum(F.expr("r * cnt")).alias("sr"),
        )
        .select(
            "event_type",
            "n_users",
            "total_events",
            F.expr(
                f"CAST((2 * sr - (n_users + 1) * total_events) * {PPM}"
                " DIV (n_users * total_events) AS BIGINT)"
            ).alias("gini_ppm"),
        )
        .orderBy("event_type")
    )


ORACLE_EVENTS_GINI = f"""
WITH per_user AS (
  SELECT event_type, user_id, count(*) AS cnt
  FROM events GROUP BY 1, 2),
both_lvls AS (
  SELECT event_type, user_id, cnt FROM per_user
  UNION ALL
  SELECT '__all__' AS event_type, user_id, sum(cnt) AS cnt
  FROM per_user GROUP BY user_id),
ranked AS (
  SELECT event_type, cnt,
         row_number() OVER (
           PARTITION BY event_type ORDER BY cnt, user_id) AS r
  FROM both_lvls)
SELECT event_type, count(*) AS n_users,
       CAST(sum(cnt) AS BIGINT) AS total_events,
       CAST((2 * sum(r * cnt) - (count(*) + 1) * sum(cnt)) * {PPM}
            // (count(*) * sum(cnt)) AS BIGINT) AS gini_ppm
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


def q_docs_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
        ).alias("tok"),
    )
    st = docs.groupBy("source", "tok").agg(F.count("*").alias("c_st"))
    tot_s = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    glob = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    n_tot = glob.agg(F.sum("c_t").alias("n_tot"))
    terms = (
        st.join(F.broadcast(tot_s), "source")
        .join(glob, "tok")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "source",
            "n_s",
            # p, q as identical double expressions in both engines;
            # absent-token q-mass enters as the closed-form +0.5 bits
            # minus the 0.5*q of PRESENT tokens (folded into `term`).
            F.expr(
                "0.5 * (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))"
                " * log2(2.0 * (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))"
                "   / (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)"
                "      + CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE)))"
                " + 0.5 * (CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE))"
                " * log2(2.0 * (CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE))"
                "   / (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)"
                "      + CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE)))"
                " - 0.5 * (CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE))"
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.round(F.lit(0.5) + F.sum("term"), 4).alias("jsd_bits"),
        )
        .orderBy("source")
    )


ORACLE_DOCS_SPLIT_DRIFT = f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
  FROM documents),
st AS (SELECT source, tok, count(*) AS c_st FROM toks GROUP BY 1, 2),
tot_s AS (SELECT source, sum(c_st) AS n_s FROM st GROUP BY source),
gtok AS (SELECT tok, sum(c_st) AS c_t FROM st GROUP BY tok),
n_tot AS (SELECT sum(c_t) AS n_tot FROM gtok),
terms AS (
  SELECT st.source, tot_s.n_s,
         0.5 * (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
         * log2(2.0 * (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
             / (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)
                + CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE)))
         + 0.5 * (CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE))
         * log2(2.0 * (CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE))
             / (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)
                + CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE)))
         - 0.5 * (CAST(c_t AS DOUBLE) / CAST(n_tot AS DOUBLE)) AS term
  FROM st
  JOIN tot_s ON st.source = tot_s.source
  JOIN gtok ON st.tok = gtok.tok
  CROSS JOIN n_tot)
SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens, count(*) AS vocab,
       round(0.5 + sum(term), 4) AS jsd_bits
FROM terms
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "events_decayed_trending": q_events_decayed_trending,
    "docs_quality_regression": q_docs_quality_regression,
    "events_gini": q_events_gini,
    "docs_split_drift": q_docs_split_drift,
}
ORACLES = {
    "events_decayed_trending": ORACLE_EVENTS_DECAYED_TRENDING,
    "docs_quality_regression": ORACLE_DOCS_QUALITY_REGRESSION,
    "events_gini": ORACLE_EVENTS_GINI,
    "docs_split_drift": ORACLE_DOCS_SPLIT_DRIFT,
}


# ------------------------------------------------------------------
# Per-document unigram entropy — the information-density quality
# signal (gibberish and keyword-stuffed documents sit at the extremes;
# complements docs_quality's ratio gates and docs_repetition's
# Gopher gates). entropy_bits = -Σ (c/n)·log2(c/n) over the document's
# token counts; norm_ppm = entropy / log2(vocab) in ppm (1e6 = the
# uniform-distribution maximum), guarded for single-token docs. Scale
# shape: one tokenize pass, one (doc_id, tok) partial-agg count, one
# per-doc agg — no join, no window, no Python. Float log2 sums are
# PER-DOCUMENT (dozens of terms, not corpus-sized), so the 4dp
# rounding grid sits ~10 orders above the worst-case reorder error.
def q_docs_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
        ).alias("tok"),
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("vocab"),
        F.sum(F.expr("c * log2(c)")).alias("sclogc"),
    )
    # H = log2(n) - (Σ c·log2 c)/n  — one float term per (doc,tok),
    # aggregated with the same expression tree in both engines
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "vocab",
        F.expr(
            "round(log2(CAST(n_tokens AS DOUBLE))"
            " - sclogc / CAST(n_tokens AS DOUBLE), 4)"
        ).alias("entropy_bits"),
        F.expr(
            "CASE WHEN vocab <= 1 THEN 0 ELSE CAST(round("
            "  (log2(CAST(n_tokens AS DOUBLE))"
            "   - sclogc / CAST(n_tokens AS DOUBLE))"
            "  * 1000000 / log2(CAST(vocab AS DOUBLE)), 0) AS BIGINT) END"
        ).alias("norm_ppm"),
    ).orderBy("doc_id")


ORACLE_DOCS_TOKEN_ENTROPY = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
  FROM documents),
counts AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*) AS vocab, sum(c * log2(c)) AS sclogc
  FROM counts GROUP BY doc_id)
SELECT doc_id, n_tokens, vocab,
       round(log2(CAST(n_tokens AS DOUBLE))
             - sclogc / CAST(n_tokens AS DOUBLE), 4) AS entropy_bits,
       CASE WHEN vocab <= 1 THEN 0 ELSE CAST(round(
         (log2(CAST(n_tokens AS DOUBLE))
          - sclogc / CAST(n_tokens AS DOUBLE))
         * 1000000 / log2(CAST(vocab AS DOUBLE)), 0) AS BIGINT) END
         AS norm_ppm
FROM per_doc
ORDER BY doc_id
"""

QUERIES["docs_token_entropy"] = q_docs_token_entropy
ORACLES["docs_token_entropy"] = ORACLE_DOCS_TOKEN_ENTROPY


# ------------------------------------------------------------------
# Inter-event burstiness — Goh-Barabási B = (σ−μ)/(σ+μ) over each
# user's inter-arrival gaps, grouped by the type of the later event:
# the bot/automation signal (B → −1 periodic scripts, B ≈ 0 Poisson
# humans, B → 1 bursty sessions). All moments (n, Σgap, Σgap²) are
# EXACT BIGINT sums of truncated-second gaps; σ enters through one
# identical double expression D = sqrt(n·Σx² − (Σx)²) so
# B = (D − Σx) / (D + Σx) — no float aggregation anywhere. Scale
# shape: ONE user-partitioned window (never global), one partial-agg
# groupBy over the tiny type key space.
def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = ev.select(
        "event_type",
        ((F.col("us") - F.lag("us").over(w)) / F.lit(1000000))
        .cast("long")
        .alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    m = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap_s").alias("sx"),
        F.sum(F.expr("gap_s * gap_s")).alias("sxx"),
    )
    return m.select(
        "event_type",
        "n_gaps",
        F.expr("round(CAST(sx AS DOUBLE) / n_gaps, 4)").alias("mean_gap_s"),
        F.expr(
            "round((sqrt(CAST(n_gaps * sxx - sx * sx AS DOUBLE)) - sx)"
            " / (sqrt(CAST(n_gaps * sxx - sx * sx AS DOUBLE)) + sx), 6)"
        ).alias("burstiness"),
    ).orderBy("event_type")


ORACLE_EVENTS_BURSTINESS = """
WITH seq AS (
  SELECT event_type, user_id, epoch_us(ts) AS us, event_id,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
  FROM events),
gaps AS (
  SELECT event_type, CAST((us - prev) // 1000000 AS BIGINT) AS gap_s
  FROM seq WHERE prev IS NOT NULL),
m AS (
  SELECT event_type, count(*) AS n_gaps,
         CAST(sum(gap_s) AS BIGINT) AS sx,
         CAST(sum(gap_s * gap_s) AS BIGINT) AS sxx
  FROM gaps GROUP BY event_type)
SELECT event_type, n_gaps,
       round(CAST(sx AS DOUBLE) / n_gaps, 4) AS mean_gap_s,
       round((sqrt(CAST(n_gaps * sxx - sx * sx AS DOUBLE)) - sx)
             / (sqrt(CAST(n_gaps * sxx - sx * sx AS DOUBLE)) + sx), 6)
         AS burstiness
FROM m
ORDER BY event_type
"""

QUERIES["events_burstiness"] = q_events_burstiness
ORACLES["events_burstiness"] = ORACLE_EVENTS_BURSTINESS


# ------------------------------------------------------------------
# Join-key skew report — the operational diagnostic that decides
# whether a key needs salting BEFORE the shuffle that would discover
# it the hard way (operators/skew.py is the fix; this is the
# detector). For each candidate join key: row count, distinct keys,
# the hottest key's count, its share of all rows (= the floor any
# hash partitioning can reach, in exact ppm), and the skew factor
# max_cnt·n_keys/n_rows (1e6 = perfectly uniform). Pure integers;
# one partial-agg count per key column + a second metadata-sized agg.
def q_events_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.get_json_object("props", "$.k").cast("long").alias("item")
    )

    def profile(col: str):
        counts = (
            ev.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count("*").alias("cnt"))
        )
        return counts.agg(
            F.lit(col).alias("key_col"),
            F.sum("cnt").alias("n_rows"),
            F.count("*").alias("n_keys"),
            F.max("cnt").alias("max_cnt"),
        ).select(
            "key_col",
            "n_rows",
            "n_keys",
            "max_cnt",
            F.expr("CAST(max_cnt * 1000000 DIV n_rows AS BIGINT)").alias(
                "top_share_ppm"
            ),
            F.expr(
                "CAST(max_cnt * n_keys * 1000000 DIV n_rows AS BIGINT)"
            ).alias("skew_factor_ppm"),
        )

    return profile("user_id").unionByName(profile("item")).orderBy("key_col")


ORACLE_EVENTS_SKEW_REPORT = """
WITH ev AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events),
cu AS (SELECT user_id AS k, count(*) AS cnt FROM ev
       WHERE user_id IS NOT NULL GROUP BY 1),
ci AS (SELECT item AS k, count(*) AS cnt FROM ev
       WHERE item IS NOT NULL GROUP BY 1),
pu AS (
  SELECT 'user_id' AS key_col, CAST(sum(cnt) AS BIGINT) AS n_rows,
         count(*) AS n_keys, CAST(max(cnt) AS BIGINT) AS max_cnt
  FROM cu),
pi AS (
  SELECT 'item' AS key_col, CAST(sum(cnt) AS BIGINT) AS n_rows,
         count(*) AS n_keys, CAST(max(cnt) AS BIGINT) AS max_cnt
  FROM ci),
both_keys AS (SELECT * FROM pu UNION ALL SELECT * FROM pi)
SELECT key_col, n_rows, n_keys, max_cnt,
       CAST(max_cnt * 1000000 // n_rows AS BIGINT) AS top_share_ppm,
       CAST(max_cnt * n_keys * 1000000 // n_rows AS BIGINT)
         AS skew_factor_ppm
FROM both_keys
ORDER BY key_col
"""

QUERIES["events_skew_report"] = q_events_skew_report
ORACLES["events_skew_report"] = ORACLE_EVENTS_SKEW_REPORT


# ------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test — the distribution-free
# companion to docs_split_drift: for each source, D = sup|F_s - F_rest|
# over the length distribution, computed ENTIRELY in integers
# (D_ppm = max |cumS·Nrest − cumRest·Ns| · 1e6 DIV (Ns·Nrest)) so the
# comparison path carries no float CDFs at all; the α=0.05 rejection
# flag uses the classic c·sqrt((n+m)/nm) critical value as one
# identical double expression over exact integer inputs. Scale shape:
# the evaluation grid is sources × distinct-lengths (metadata-sized;
# bucket the support if a column is pathologically high-cardinality),
# per-source cumulative windows ride that grid, never the corpus.
KS_C_05 = 1.358  # Smirnov critical coefficient at alpha = 0.05


def q_docs_length_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    per = docs.groupBy("source", "x").agg(F.count("*").alias("c"))
    support = per.select("x").distinct()
    sources = per.groupBy("source").agg(F.sum("c").alias("ns"))
    n_tot = sources.agg(F.sum("ns").alias("n_tot"))
    grid = (
        sources.crossJoin(support)
        .join(per, ["source", "x"], "left")
        .select(
            "source", "ns", "x", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    glob = (
        per.groupBy("x")
        .agg(F.sum("c").alias("gc"))
        .select(
            "x",
            F.sum("gc")
            .over(
                Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("cum_g"),
        )
    )
    cums = (
        grid.select("source", "ns", "x", F.sum("c").over(w).alias("cum_s"))
        .join(F.broadcast(glob), "x")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "source",
            "ns",
            (F.col("n_tot") - F.col("ns")).alias("nr"),
            F.abs(
                F.col("cum_s") * (F.col("n_tot") - F.col("ns"))
                - (F.col("cum_g") - F.col("cum_s")) * F.col("ns")
            ).alias("gap"),
        )
    )
    return (
        cums.groupBy("source", "ns", "nr")
        .agg(F.max("gap").alias("max_gap"))
        .select(
            "source",
            F.col("ns").alias("n_docs"),
            F.expr("CAST(max_gap * 1000000 DIV (ns * nr) AS BIGINT)").alias(
                "ks_d_ppm"
            ),
            F.expr(
                f"CAST(floor({KS_C_05} * sqrt(CAST(ns + nr AS DOUBLE)"
                " / (CAST(ns AS DOUBLE) * CAST(nr AS DOUBLE))) * 1000000)"
                " AS BIGINT)"
            ).alias("crit_ppm"),
        )
        .select(
            "source",
            "n_docs",
            "ks_d_ppm",
            "crit_ppm",
            (F.col("ks_d_ppm") > F.col("crit_ppm")).alias("drifted"),
        )
        .orderBy("source")
    )


ORACLE_DOCS_LENGTH_KS = f"""
WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents),
per AS (SELECT source, x, count(*) AS c FROM d GROUP BY 1, 2),
support AS (SELECT DISTINCT x FROM per),
sources AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM per GROUP BY 1),
nt AS (SELECT CAST(sum(ns) AS BIGINT) AS n_tot FROM sources),
grid AS (
  SELECT s.source, s.ns, sp.x, coalesce(p.c, 0) AS c
  FROM sources s CROSS JOIN support sp
  LEFT JOIN per p ON p.source = s.source AND p.x = sp.x),
cum_s AS (
  SELECT source, ns, x,
         sum(c) OVER (PARTITION BY source ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_s
  FROM grid),
gl AS (
  SELECT x, sum(gc) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g
  FROM (SELECT x, sum(c) AS gc FROM per GROUP BY x)),
gaps AS (
  SELECT c.source, c.ns, (n_tot - c.ns) AS nr,
         abs(c.cum_s * (n_tot - c.ns) - (g.cum_g - c.cum_s) * c.ns) AS gap
  FROM cum_s c JOIN gl g USING (x) CROSS JOIN nt),
agg AS (
  SELECT source, ns, nr, CAST(max(gap) AS BIGINT) AS max_gap
  FROM gaps GROUP BY 1, 2, 3)
SELECT source, ns AS n_docs,
       CAST(max_gap * 1000000 // (ns * nr) AS BIGINT) AS ks_d_ppm,
       CAST(floor({KS_C_05} * sqrt(CAST(ns + nr AS DOUBLE)
            / (CAST(ns AS DOUBLE) * CAST(nr AS DOUBLE))) * 1000000)
            AS BIGINT) AS crit_ppm,
       CAST(max_gap * 1000000 // (ns * nr) AS BIGINT)
         > CAST(floor({KS_C_05} * sqrt(CAST(ns + nr AS DOUBLE)
            / (CAST(ns AS DOUBLE) * CAST(nr AS DOUBLE))) * 1000000)
            AS BIGINT) AS drifted
FROM agg
ORDER BY source
"""

QUERIES["docs_length_ks"] = q_docs_length_ks
ORACLES["docs_length_ks"] = ORACLE_DOCS_LENGTH_KS


# --------------------------------------------------- ANALYZE statistics
# The cost-based-optimizer statistics collection pass (ANALYZE TABLE /
# Iceberg's column stats): one row per column of the documents table —
# row count, null count, exact NDV, min/max (display-truncated), and
# the average serialized width in exact centichars. These are the
# numbers join reordering, broadcast-threshold decisions and file
# pruning run on; the engine computes them as ONE aggregate pass
# (count-distinct over k columns plans as a single Expand + hash agg),
# then unpivots the 1-row result into the stats-table shape with a
# metadata-sized explode. Exact NDV is right here because stats are a
# per-ingest batch job; the streaming/monitoring path uses the KMV
# sketch (docs_kmv_distinct) instead.
STATS_COLUMNS = ("doc_id", "lang", "n_chars", "source", "text")
STATS_DISPLAY_CHARS = 20


def q_docs_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aggs = [F.count("*").alias("n_rows")]
    for c in STATS_COLUMNS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"ndv_{c}"),
            F.substring(F.min(c).cast("string"), 1, STATS_DISPLAY_CHARS)
            .alias(f"min_{c}"),
            F.substring(F.max(c).cast("string"), 1, STATS_DISPLAY_CHARS)
            .alias(f"max_{c}"),
            F.sum(F.length(F.col(c).cast("string"))).alias(f"len_{c}"),
        ]
    row = docs.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"nn_{c}").alias("nn"),
                F.col(f"ndv_{c}").alias("ndv"),
                F.col(f"min_{c}").alias("min_val"),
                F.col(f"max_{c}").alias("max_val"),
                F.col(f"len_{c}").alias("len_sum"),
            )
            for c in STATS_COLUMNS
        ]
    )
    return (
        row.select("n_rows", F.explode(per_col).alias("s"))
        .select(
            F.col("s.col_name").alias("col_name"),
            "n_rows",
            (F.col("n_rows") - F.col("s.nn")).alias("n_null"),
            F.col("s.ndv").alias("ndv"),
            F.col("s.min_val").alias("min_val"),
            F.col("s.max_val").alias("max_val"),
            F.expr("s.len_sum * 100 DIV greatest(s.nn, 1)").alias(
                "avg_width_centichars"
            ),
        )
        .orderBy("col_name")
    )


def _oracle_table_stats() -> str:
    branches = []
    for c in STATS_COLUMNS:
        branches.append(f"""
SELECT '{c}' AS col_name,
       count(*) AS n_rows,
       count(*) - count({c}) AS n_null,
       count(DISTINCT {c}) AS ndv,
       substr(CAST(min({c}) AS VARCHAR), 1, {STATS_DISPLAY_CHARS})
         AS min_val,
       substr(CAST(max({c}) AS VARCHAR), 1, {STATS_DISPLAY_CHARS})
         AS max_val,
       CAST(sum(length(CAST({c} AS VARCHAR))) * 100
            // greatest(count({c}), 1) AS BIGINT)
         AS avg_width_centichars
FROM documents""")
    return "\nUNION ALL\n".join(branches) + "\nORDER BY col_name"


ORACLE_DOCS_TABLE_STATS = _oracle_table_stats()

QUERIES["docs_table_stats"] = q_docs_table_stats
ORACLES["docs_table_stats"] = ORACLE_DOCS_TABLE_STATS


# ------------------------------------------------ robust MAD outliers
# Median-absolute-deviation outlier detection per language over doc
# length — the robust alternative to z-scores (a handful of giant
# crawl artifacts inflate a mean/stddev gate but cannot move the
# median). Exact-integer discipline: medians are LOWER medians picked
# by rank (never interpolated floats), MAD is the lower median of
# |x - med|, and the outlier test |x - med| * 10000 > 44780 * mad is
# the integer form of |x - med| > 3 * 1.4826 * MAD (the normal-
# consistency constant). Scale shape: two rank windows ride (lang,
# n_chars) projections — per-group exact medians fundamentally sort
# the group; the fixed-memory histogram sketch
# (docs_length_hist_quantiles) is the documented 100-TB alternative,
# this is the exact batch audit. Output is |languages| rows.
MAD_K_X10000 = 44_780  # 3 * 1.4826, scaled


def q_docs_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    w = Window.partitionBy("lang").orderBy("n_chars")
    med = (
        docs.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("lang")))
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("lang", F.col("n_chars").alias("med"))
    )
    dev = docs.join(F.broadcast(med), "lang").select(
        "lang", "n_chars", "med",
        F.abs(F.col("n_chars") - F.col("med")).alias("adev"),
    )
    wd = Window.partitionBy("lang").orderBy("adev")
    mad = (
        dev.withColumn("rn", F.row_number().over(wd))
        .withColumn("n", F.count("*").over(Window.partitionBy("lang")))
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("lang", F.col("adev").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("med").alias("median_chars"),
            F.min("mad").alias("mad_chars"),
            F.sum(
                F.when(
                    F.col("adev") * 10_000 > MAD_K_X10000 * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("lang")
    )


ORACLE_DOCS_MAD_OUTLIERS = f"""
WITH d AS (SELECT lang, n_chars FROM documents),
med AS (
  SELECT lang, n_chars AS med FROM (
    SELECT lang, n_chars,
           row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
           count(*) OVER (PARTITION BY lang) AS n
    FROM d) t
  WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)),
dev AS (
  SELECT lang, n_chars, med, abs(n_chars - med) AS adev
  FROM d JOIN med USING (lang)),
mad AS (
  SELECT lang, adev AS mad FROM (
    SELECT lang, adev,
           row_number() OVER (PARTITION BY lang ORDER BY adev) AS rn,
           count(*) OVER (PARTITION BY lang) AS n
    FROM dev) t
  WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT))
SELECT lang, count(*) AS n_docs,
       CAST(min(med) AS BIGINT) AS median_chars,
       CAST(min(mad) AS BIGINT) AS mad_chars,
       CAST(sum(CASE WHEN adev * 10000 > {MAD_K_X10000} * mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (lang)
GROUP BY lang
ORDER BY lang
"""

QUERIES["docs_mad_outliers"] = q_docs_mad_outliers
ORACLES["docs_mad_outliers"] = ORACLE_DOCS_MAD_OUTLIERS


# ------------------------------------------ day-of-week seasonality
# Weekly seasonality profile per event type: the day-of-week activity
# histogram in exact-ppm shares plus a chi-square uniformity statistic
# — the signal that separates organic human traffic (strong weekday/
# weekend structure) from automation (flat profile), and the
# pre-check before any day-aligned forecast (events_forecast_eval's
# season length). Exact-integer discipline: counts and ppm shares are
# pure BIGINT; chi2 = sum((o - n/7)^2) * 7 / n is ONE token-identical
# float expression over identical integers (the abtest/assortativity
# rule). Scale shape: one (type, dow) partial agg — output is
# |types| x 7 rows; per-type totals re-aggregate from those counts.
def q_events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").alias("n"))
    tot = cnt.groupBy("event_type").agg(
        F.sum("n").alias("n_type"),
        # chi2 numerator needs sum of squared deviations from n/7:
        # expand (o - n/7)^2 = o^2 - 2*o*n/7 + (n/7)^2 so the sums
        # stay integer until ONE final float expression
        F.sum(F.expr("n * n")).alias("soo"),
    )
    chi2 = (
        "(CAST(soo AS DOUBLE) * 7.0 / n_type) - CAST(n_type AS DOUBLE)"
    )
    return (
        cnt.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "dow",
            "n",
            F.expr("n * 1000000 DIV n_type").alias("share_ppm"),
            F.round(F.expr(chi2), 4).alias("chi2_uniform"),
        )
        .orderBy("event_type", "dow")
    )


ORACLE_EVENTS_DOW_SEASONALITY = """
WITH cnt AS (
  SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS n
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type,
         CAST(sum(n * n) AS BIGINT) AS soo
  FROM cnt GROUP BY event_type)
SELECT event_type, dow, n,
       CAST(n * 1000000 // n_type AS BIGINT) AS share_ppm,
       round((CAST(soo AS DOUBLE) * 7.0 / n_type)
             - CAST(n_type AS DOUBLE), 4) AS chi2_uniform
FROM cnt JOIN tot USING (event_type)
ORDER BY event_type, dow
"""

QUERIES["events_dow_seasonality"] = q_events_dow_seasonality
ORACLES["events_dow_seasonality"] = ORACLE_EVENTS_DOW_SEASONALITY


# ------------------------------------------------- winsorized means
# Winsorized robust statistics per language: clip doc lengths at the
# exact p05/p95 RANK boundaries (picked by row_number like the MAD
# medians — never interpolated floats) and report the clipped mean in
# exact centichars plus how many rows each tail clamped. The
# companion to docs_mad_outliers: MAD flags outliers, winsorization
# bounds their influence on the headline mean — the robust pair a
# data-quality dashboard runs per ingest. Scale shape: one rank
# window over the narrow (lang, n_chars) projection, the 2-value
# bounds table broadcast back, one partial agg.
WINSOR_LO_PPM = 50_000   # p05
WINSOR_HI_PPM = 950_000  # p95


def q_docs_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    w = Window.partitionBy("lang").orderBy("n_chars")
    ranked = docs.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("lang"))
    )
    # rank of the p-th percentile (lower, 1-based): max(1, ceil(p*n))
    lo_rank = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("n") * WINSOR_LO_PPM / 1_000_000),
    )
    hi_rank = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("n") * WINSOR_HI_PPM / 1_000_000),
    )
    bounds = (
        ranked.where(
            (F.col("rn") == lo_rank) | (F.col("rn") == hi_rank)
        )
        .groupBy("lang")
        .agg(
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
    )
    clipped = docs.join(F.broadcast(bounds), "lang").select(
        "lang",
        "lo",
        "hi",
        F.least(F.greatest(F.col("n_chars"), F.col("lo")), F.col("hi")).alias(
            "clipped"
        ),
        (F.col("n_chars") < F.col("lo")).cast("int").alias("clamped_lo"),
        (F.col("n_chars") > F.col("hi")).cast("int").alias("clamped_hi"),
    )
    return (
        clipped.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("lo").alias("p05_chars"),
            F.min("hi").alias("p95_chars"),
            F.expr(
                "CAST(sum(clipped) * 100 DIV count(*) AS BIGINT)"
            ).alias("winsor_mean_centichars"),
            F.sum("clamped_lo").alias("n_clamped_lo"),
            F.sum("clamped_hi").alias("n_clamped_hi"),
        )
        .orderBy("lang")
    )


ORACLE_DOCS_WINSORIZED_STATS = f"""
WITH ranked AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents),
bounds AS (
  SELECT lang, min(n_chars) AS lo, max(n_chars) AS hi
  FROM ranked
  WHERE rn = greatest(1, CAST(ceil(n * {WINSOR_LO_PPM} / 1000000.0)
                              AS BIGINT))
     OR rn = greatest(1, CAST(ceil(n * {WINSOR_HI_PPM} / 1000000.0)
                              AS BIGINT))
  GROUP BY lang),
clipped AS (
  SELECT d.lang, lo, hi,
         least(greatest(n_chars, lo), hi) AS clipped,
         CASE WHEN n_chars < lo THEN 1 ELSE 0 END AS clamped_lo,
         CASE WHEN n_chars > hi THEN 1 ELSE 0 END AS clamped_hi
  FROM documents d JOIN bounds USING (lang))
SELECT lang, count(*) AS n_docs,
       CAST(min(lo) AS BIGINT) AS p05_chars,
       CAST(min(hi) AS BIGINT) AS p95_chars,
       CAST(sum(clipped) * 100 // count(*) AS BIGINT)
         AS winsor_mean_centichars,
       CAST(sum(clamped_lo) AS BIGINT) AS n_clamped_lo,
       CAST(sum(clamped_hi) AS BIGINT) AS n_clamped_hi
FROM clipped
GROUP BY lang
ORDER BY lang
"""

QUERIES["docs_winsorized_stats"] = q_docs_winsorized_stats
ORACLES["docs_winsorized_stats"] = ORACLE_DOCS_WINSORIZED_STATS


# ------------------------------------------------- one-way ANOVA
# Parametric drift test across sources: one-way ANOVA F statistic for
# doc length by source — the mean-shift complement to the
# distribution-free KS test (docs_length_ks): KS sees any shape
# change, ANOVA pinpoints mean separation with df-adjusted power.
# Exact-integer discipline: group sums/sumsq are BIGINT; SS_between
# and SS_within come from the closed forms k·Σ(T_g²/n_g) − T²/N
# evaluated as ONE token-identical float expression over identical
# integers (the OLS/CUPED rule). Scale shape: one per-source partial
# agg (k rows), then a metadata-sized rollup; output is 1 row.
def q_docs_length_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(
        F.count("*").alias("n_g"),
        F.sum("n_chars").alias("t_g"),
        F.sum(F.expr("n_chars * n_chars")).alias("ss_g"),
    )
    return g.agg(
        F.count("*").alias("k_groups"),
        F.sum("n_g").alias("n_total"),
        F.round(
            F.expr(
                "sum(CAST(t_g AS DOUBLE) * t_g / n_g)"
                " - CAST(sum(t_g) AS DOUBLE) * sum(t_g) / sum(n_g)"
            ),
            4,
        ).alias("ss_between"),
        F.round(
            F.expr(
                "CAST(sum(ss_g) AS DOUBLE)"
                " - sum(CAST(t_g AS DOUBLE) * t_g / n_g)"
            ),
            4,
        ).alias("ss_within"),
    ).select(
        "k_groups",
        "n_total",
        "ss_between",
        "ss_within",
        F.round(
            F.expr(
                "(ss_between / (k_groups - 1))"
                " / (ss_within / (n_total - k_groups))"
            ),
            4,
        ).alias("f_stat"),
    )


ORACLE_DOCS_LENGTH_ANOVA = """
WITH g AS (
  SELECT source, count(*) AS n_g,
         CAST(sum(n_chars) AS BIGINT) AS t_g,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS ss_g
  FROM documents GROUP BY source),
agg AS (
  SELECT count(*) AS k_groups, CAST(sum(n_g) AS BIGINT) AS n_total,
         round(sum(CAST(t_g AS DOUBLE) * t_g / n_g)
               - CAST(sum(t_g) AS DOUBLE) * sum(t_g) / sum(n_g), 4)
           AS ss_between,
         round(CAST(sum(ss_g) AS DOUBLE)
               - sum(CAST(t_g AS DOUBLE) * t_g / n_g), 4) AS ss_within
  FROM g)
SELECT k_groups, n_total, ss_between, ss_within,
       round((ss_between / (k_groups - 1))
             / (ss_within / (n_total - k_groups)), 4) AS f_stat
FROM agg
"""

QUERIES["docs_length_anova"] = q_docs_length_anova
ORACLES["docs_length_anova"] = ORACLE_DOCS_LENGTH_ANOVA


# ------------------------------------------------ Mann-Whitney U test
# Nonparametric two-sample location test between the id-parity
# cohorts (the events_abtest/cuped cohort convention) on per-user
# event counts: the rank-sum U statistic with exact tie handling —
# average ranks kept EXACT by working in DOUBLED rank units (2x the
# midrank is always an integer), so U arrives as a pure BIGINT and
# the normal z approximation (with the standard tie correction) is
# one token-identical float expression over identical integers.
# Completes the drift/test battery: KS (any shape), ANOVA (means,
# parametric), Mann-Whitney (location, rank-based). Scale shape: one
# per-user partial agg, one rank window over the (value) projection,
# tie table re-aggregated from value counts; output is 1 row.
def q_events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("x"))
    ranked = per_user.select(
        (F.col("user_id") % 2 == 0).alias("is_a"),
        "x",
        # doubled midrank: 2*avg rank of the tie block containing x =
        # (first_rank + last_rank) over the global value order
        (
            F.row_number().over(Window.orderBy("x", "user_id"))
        ).alias("_rn"),
    )
    # doubled midrank per value: min(rn) + max(rn) within the tie block
    blocks = ranked.groupBy("x").agg(
        (F.min("_rn") + F.max("_rn")).alias("dbl_midrank"),
        F.count("*").alias("t"),
    )
    joined = ranked.join(F.broadcast(blocks), "x")
    agg = joined.agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("is_a"), F.col("dbl_midrank")).otherwise(0)
        ).alias("dbl_rank_sum_a"),
    )
    ties = blocks.agg(
        F.sum(F.expr("t * t * t - t")).alias("tie_term")
    )
    z = (
        "(CAST(u2 AS DOUBLE) / 2 - CAST(n_a AS DOUBLE) * n_b / 2)"
        " / sqrt((CAST(n_a AS DOUBLE) * n_b / 12)"
        "        * ((CAST(n_a AS DOUBLE) + n_b + 1)"
        "           - CAST(tie_term AS DOUBLE)"
        "             / ((CAST(n_a AS DOUBLE) + n_b)"
        "                * (CAST(n_a AS DOUBLE) + n_b - 1))))"
    )
    return (
        agg.crossJoin(F.broadcast(ties))
        .select(
            "n_a",
            "n_b",
            # 2*U_a = 2*rank_sum_a - n_a*(n_a+1); dbl_rank_sum_a is
            # already 2*rank_sum_a
            F.expr("dbl_rank_sum_a - n_a * (n_a + 1)").alias("u2"),
            "tie_term",
        )
        .select(
            "n_a",
            "n_b",
            "u2",
            "tie_term",
            F.round(F.expr(z), 4).alias("z_stat"),
        )
    )


ORACLE_EVENTS_MANN_WHITNEY = """
WITH per_user AS (
  SELECT user_id, count(*) AS x FROM events GROUP BY user_id),
ranked AS (
  SELECT user_id % 2 = 0 AS is_a, x,
         row_number() OVER (ORDER BY x, user_id) AS rn
  FROM per_user),
blocks AS (
  SELECT x, min(rn) + max(rn) AS dbl_midrank, count(*) AS t
  FROM ranked GROUP BY x),
agg AS (
  SELECT CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN is_a THEN dbl_midrank ELSE 0 END)
              AS BIGINT) AS dbl_rank_sum_a
  FROM ranked JOIN blocks USING (x)),
ties AS (
  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_term FROM blocks),
u AS (
  SELECT n_a, n_b,
         dbl_rank_sum_a - n_a * (n_a + 1) AS u2, tie_term
  FROM agg CROSS JOIN ties)
SELECT n_a, n_b, u2, tie_term,
       round((CAST(u2 AS DOUBLE) / 2 - CAST(n_a AS DOUBLE) * n_b / 2)
             / sqrt((CAST(n_a AS DOUBLE) * n_b / 12)
                    * ((CAST(n_a AS DOUBLE) + n_b + 1)
                       - CAST(tie_term AS DOUBLE)
                         / ((CAST(n_a AS DOUBLE) + n_b)
                            * (CAST(n_a AS DOUBLE) + n_b - 1)))), 4)
         AS z_stat
FROM u
"""

QUERIES["events_mann_whitney"] = q_events_mann_whitney
ORACLES["events_mann_whitney"] = ORACLE_EVENTS_MANN_WHITNEY


# ---------------------------------------------- Poisson bootstrap CI
# Distributed bootstrap confidence interval for the mean doc length —
# the Poisson bootstrap (each replicate weights each row by an
# independent Poisson(1) count, the classical resample's streaming-
# friendly form: no global n needed at draw time, one pass for ALL
# replicates). Determinism: the Poisson draw is an inverse-CDF lookup
# on a 20-bit md5 prefix (integer thresholds at the Poisson(1) CDF,
# capped at 5) — reproducible at any parallelism and token-identical
# in both engines, the same no-rand() discipline as the samplers.
# Each replicate's mean is an exact integer centichar ratio; the CI
# is the 1st/31st order statistic of the 32 replicate means (a ~94%
# percentile interval). Scale shape: one map-side explode to
# B=32 (replicate, weight) terms per row, one partial agg to 32 rows,
# a metadata-sized rank for the CI. At 100 TB this is THE way to put
# error bars on corpus statistics without a second pass.
BOOT_B = 32
# P(X<=k) for Poisson(1), scaled to 2^20 (floor), k = 0..4; >=5 capped
_POIS_CDF_Q20 = (385749, 771499, 964373, 1028665, 1044738)


def _poisson_weight_sql(col_expr: str) -> str:
    """Dialect-neutral: 20-bit hash prefix -> Poisson(1) count."""
    cases = " ".join(
        f"WHEN {col_expr} < {thr} THEN {k}"
        for k, thr in enumerate(_POIS_CDF_Q20)
    )
    return f"(CASE {cases} ELSE 5 END)"


def q_docs_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    reps = docs.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.array(*[F.lit(b) for b in range(BOOT_B)])
        ).alias("b"),
    )
    u20 = (
        "CAST(conv(substring(md5(CAST(concat('boot', b, ':', doc_id)"
        " AS BINARY)), 1, 5), 16, 10) AS BIGINT)"
    )
    weighted = reps.select(
        "b",
        "n_chars",
        F.expr(_poisson_weight_sql(u20)).alias("w"),
    )
    means = (
        weighted.groupBy("b")
        .agg(
            F.sum("w").alias("n_eff"),
            F.sum(F.expr("w * n_chars")).alias("tot"),
        )
        .where(F.col("n_eff") > 0)
        .select(
            "b",
            F.expr("tot * 100 DIV n_eff").alias("mean_centichars"),
        )
    )
    ranked = means.select(
        "mean_centichars",
        F.row_number()
        .over(Window.orderBy("mean_centichars", "b"))
        .alias("r"),
    )
    return (
        ranked.agg(
            F.count("*").alias("n_replicates"),
            F.min(
                F.when(F.col("r") == 2, F.col("mean_centichars"))
            ).alias("ci_lo_centichars"),
            F.min(
                F.when(F.col("r") == BOOT_B - 1, F.col("mean_centichars"))
            ).alias("ci_hi_centichars"),
            F.expr(
                "CAST(sum(mean_centichars) DIV count(*) AS BIGINT)"
            ).alias("boot_mean_centichars"),
        )
    )


def _oracle_bootstrap() -> str:
    u20 = (
        "CAST(('0x' || substring(md5('boot' || CAST(b AS VARCHAR) || ':'"
        " || CAST(doc_id AS VARCHAR)), 1, 5))::BIGINT AS BIGINT)"
    )
    w = _poisson_weight_sql(u20)
    return f"""
WITH reps AS (
  SELECT doc_id, n_chars, unnest(range(0, {BOOT_B})) AS b
  FROM documents),
weighted AS (
  SELECT b, n_chars, {w} AS w FROM reps),
means AS (
  SELECT b, CAST(sum(w * n_chars) * 100 // sum(w) AS BIGINT)
           AS mean_centichars
  FROM weighted GROUP BY b HAVING sum(w) > 0),
ranked AS (
  SELECT mean_centichars,
         row_number() OVER (ORDER BY mean_centichars, b) AS r
  FROM means)
SELECT count(*) AS n_replicates,
       min(CASE WHEN r = 2 THEN mean_centichars END)
         AS ci_lo_centichars,
       min(CASE WHEN r = {BOOT_B - 1} THEN mean_centichars END)
         AS ci_hi_centichars,
       CAST(sum(mean_centichars) // count(*) AS BIGINT)
         AS boot_mean_centichars
FROM ranked
"""


ORACLE_DOCS_BOOTSTRAP_CI = _oracle_bootstrap()

QUERIES["docs_bootstrap_ci"] = q_docs_bootstrap_ci
ORACLES["docs_bootstrap_ci"] = ORACLE_DOCS_BOOTSTRAP_CI


# ------------------------------------- chi-square independence (r x c)
# General r x c categorical independence test: is document language
# independent of source? The contingency generalization of the 2x2
# abtest chi-square — the ingest-mix alarm (a crawl source suddenly
# skewing toward one language is a pipeline change upstream).
# Exact-integer discipline: observed cells and margins are BIGINT;
# each cell's (o*n - r*c)^2 / (r*c*n) term is ONE token-identical
# float expression over identical integers, summed over the
# metadata-sized contingency table (r*c rows — NEVER corpus-sized).
# Scale shape: one (source, lang) partial agg; margins re-aggregate
# from the cells; output is 1 row.
def q_docs_src_lang_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count("*").alias("o"))
    row_m = cells.groupBy("source").agg(F.sum("o").alias("r_tot"))
    col_m = cells.groupBy("lang").agg(F.sum("o").alias("c_tot"))
    n_tot = cells.agg(F.sum("o").alias("n"))
    terms = (
        cells.join(F.broadcast(row_m), "source")
        .join(F.broadcast(col_m), "lang")
        .crossJoin(F.broadcast(n_tot))
        .select(
            F.expr(
                "(CAST(o AS DOUBLE) * n - CAST(r_tot AS DOUBLE) * c_tot)"
                " * (CAST(o AS DOUBLE) * n - CAST(r_tot AS DOUBLE) * c_tot)"
                " / (CAST(r_tot AS DOUBLE) * c_tot * n)"
            ).alias("term"),
            "n",
        )
    )
    dims = cells.agg(
        F.countDistinct("source").alias("r_dims"),
        F.countDistinct("lang").alias("c_dims"),
    )
    return (
        terms.groupBy()
        .agg(
            F.round(F.sum(F.expr("term / n")), 4).alias("chi2"),
            F.min("n").alias("n_docs"),
        )
        .crossJoin(F.broadcast(dims))
        .select(
            "n_docs",
            "r_dims",
            "c_dims",
            ((F.col("r_dims") - 1) * (F.col("c_dims") - 1)).alias("dof"),
            "chi2",
        )
    )


ORACLE_DOCS_SRC_LANG_INDEPENDENCE = """
WITH cells AS (
  SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2),
row_m AS (SELECT source, CAST(sum(o) AS BIGINT) AS r_tot
          FROM cells GROUP BY source),
col_m AS (SELECT lang, CAST(sum(o) AS BIGINT) AS c_tot
          FROM cells GROUP BY lang),
n_tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
dims AS (SELECT count(DISTINCT source) AS r_dims,
                count(DISTINCT lang) AS c_dims FROM cells),
terms AS (
  SELECT (CAST(o AS DOUBLE) * n - CAST(r_tot AS DOUBLE) * c_tot)
         * (CAST(o AS DOUBLE) * n - CAST(r_tot AS DOUBLE) * c_tot)
         / (CAST(r_tot AS DOUBLE) * c_tot * n) AS term, n
  FROM cells
  JOIN row_m USING (source)
  JOIN col_m USING (lang)
  CROSS JOIN n_tot)
SELECT min(n) AS n_docs, r_dims, c_dims,
       (r_dims - 1) * (c_dims - 1) AS dof,
       round(sum(term / n), 4) AS chi2
FROM terms CROSS JOIN dims
GROUP BY r_dims, c_dims
"""

QUERIES["docs_src_lang_independence"] = q_docs_src_lang_independence
ORACLES["docs_src_lang_independence"] = ORACLE_DOCS_SRC_LANG_INDEPENDENCE


# ----------------------------------------------------- Benford audit
# First-significant-digit census of every money/value column in the
# corpus vs the Benford expectation — the classic forensic
# data-quality screen (fabricated or unit-mangled numeric feeds break
# the log-uniform digit law long before summary stats move). Values
# are fixed to EXACT integer cents map-side (floor(v*100 + 0.5) — the
# float multiply-add is the same IEEE op in both engines, floor is
# exact), the leading digit is string-derived from the integer (no
# log10 on the comparison path), and the per-digit deviation
# statistic is pure BIGINT arithmetic: with p̂ = obs_ppm and
# p = benford_ppm, chi_contrib_micro = (p̂−p)² DIV p ≈ 1e6·(p̂−p)²/p,
# the n-normalized chi-square contribution. The Benford constants are
# floor(log10(1+1/d)·1e6), computed once in Python and inlined into
# BOTH engines' plans — a single source of truth, zero cross-engine
# float evaluation.
#
# Scale shape: three column-pruned scans (one per audited column),
# each folding to a 9-row digit histogram via one map-side-combinable
# partial agg; the per-source totals join is a broadcast of a 3-row
# table. Output is 27 rows regardless of corpus size.

import math as _math

BENFORD_PPM = {
    d: int(_math.floor(_math.log10(1.0 + 1.0 / d) * 1_000_000))
    for d in range(1, 10)
}
_BENFORD_SOURCES = (
    ("lineitem", "l_extendedprice"),
    ("orders", "o_totalprice"),
    ("events", "value"),
)


def q_docs_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_src = []
    for table, col in _BENFORD_SOURCES:
        t = load_table(spark, sf_dir, table)
        per_src.append(
            t.select(
                F.lit(f"{table}.{col}").alias("src"),
                F.floor(F.col(col) * 100 + F.lit(0.5))
                .cast("long")
                .alias("cents"),
            ).where(F.col("cents") > 0)
        )
    cents = per_src[0]
    for p in per_src[1:]:
        cents = cents.unionByName(p)
    digits = cents.select(
        "src",
        F.substring(F.col("cents").cast("string"), 1, 1)
        .cast("long")
        .alias("digit"),
    )
    obs = digits.groupBy("src", "digit").agg(F.count("*").alias("n_obs"))
    totals = obs.groupBy("src").agg(F.sum("n_obs").alias("n_src"))
    bz = F.create_map(
        *[x for d, p in sorted(BENFORD_PPM.items()) for x in (F.lit(d), F.lit(p))]
    )
    return (
        obs.join(F.broadcast(totals), "src")
        .withColumn("obs_ppm", F.expr("n_obs * 1000000 DIV n_src"))
        .withColumn("benford_ppm", bz[F.col("digit")])
        .withColumn("delta_ppm", F.col("obs_ppm") - F.col("benford_ppm"))
        .withColumn(
            "chi_contrib_micro",
            F.expr("delta_ppm * delta_ppm DIV benford_ppm"),
        )
        .select(
            "src",
            "digit",
            "n_obs",
            "obs_ppm",
            "benford_ppm",
            "delta_ppm",
            "chi_contrib_micro",
        )
        .orderBy("src", "digit")
    )


def _benford_oracle() -> str:
    scans = "\nUNION ALL\n".join(
        f"""SELECT '{t}.{c}' AS src,
       CAST(floor({c} * 100 + 0.5) AS BIGINT) AS cents
FROM {t} WHERE CAST(floor({c} * 100 + 0.5) AS BIGINT) > 0"""
        for t, c in _BENFORD_SOURCES
    )
    bmap = " ".join(
        f"WHEN {d} THEN {p}" for d, p in sorted(BENFORD_PPM.items())
    )
    return f"""
WITH cents AS ({scans}),
digits AS (
  SELECT src, CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM cents),
obs AS (SELECT src, digit, count(*) AS n_obs FROM digits GROUP BY 1, 2),
totals AS (SELECT src, CAST(sum(n_obs) AS BIGINT) AS n_src
           FROM obs GROUP BY src)
SELECT src, digit, n_obs,
       n_obs * 1000000 // n_src AS obs_ppm,
       CAST(CASE digit {bmap} END AS BIGINT) AS benford_ppm,
       n_obs * 1000000 // n_src - (CASE digit {bmap} END) AS delta_ppm,
       (n_obs * 1000000 // n_src - (CASE digit {bmap} END))
         * (n_obs * 1000000 // n_src - (CASE digit {bmap} END))
         // (CASE digit {bmap} END) AS chi_contrib_micro
FROM obs JOIN totals USING (src)
ORDER BY src, digit
"""


QUERIES["docs_benford"] = q_docs_benford
ORACLES["docs_benford"] = _benford_oracle()


# -------------------------------------------------- lead-lag profile
# Lagged cross-correlation between two daily event-count series
# (does activity in X lead conversions in Y, and by how many days?) —
# the causal-ordering screen run before any attribution or
# forecasting model. Day d of LL_X is aligned with day d+lag of LL_Y
# for lag = 0..LL_MAX_LAG; per lag the Pearson correlation is
# computed from EXACT BIGINT sufficient statistics (n, Σx, Σy, Σxy,
# Σx², Σy² — the "GLM by moments" pattern shared with
# docs_quality_regression), with the one closed-form double at the
# end under the repo's round(·,0)→BIGINT ppm convention (identical
# IEEE expression tree in both engines). Degenerate lags (zero
# variance on either side) emit corr_ppm = 0 rather than NULL.
#
# Scale shape: the event scan folds to ≤|days|·|2 types| rows in one
# partial agg; the lag expansion is an 8-row broadcast; everything
# after is metadata-sized. One shuffle over the daily key space.

LL_X = "view"
LL_Y = "purchase"
LL_MAX_LAG = 7


def q_events_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date(F.col("ts").cast("timestamp")).alias("day"), "event_type"
    )
    daily = (
        ev.where(F.col("event_type").isin(LL_X, LL_Y))
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("n"))
    )
    x = daily.where(F.col("event_type") == LL_X).select(
        "day", F.col("n").alias("x")
    )
    y = daily.where(F.col("event_type") == LL_Y).select(
        F.col("day").alias("y_day"), F.col("n").alias("y")
    )
    lags = spark.range(LL_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    aligned = (
        x.crossJoin(F.broadcast(lags))
        .withColumn("y_day", F.date_add("day", F.col("lag")))
        .join(y, "y_day")
    )
    stats = aligned.groupBy("lag").agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).alias("sum_x2"),
        F.sum(F.col("y") * F.col("y")).alias("sum_y2"),
    )
    num = "CAST(n_days * sum_xy - sum_x * sum_y AS DOUBLE)"
    vx = "CAST(n_days * sum_x2 - sum_x * sum_x AS DOUBLE)"
    vy = "CAST(n_days * sum_y2 - sum_y * sum_y AS DOUBLE)"
    return stats.select(
        "lag",
        "n_days",
        "sum_x",
        "sum_y",
        "sum_xy",
        F.expr(
            f"CASE WHEN {vx} <= 0 OR {vy} <= 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(round({num} * 1000000 / sqrt({vx} * {vy}), 0) "
            "AS BIGINT) END"
        ).alias("corr_ppm"),
    ).orderBy("lag")


ORACLE_EVENTS_LEADLAG = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events
  WHERE event_type IN ('{LL_X}', '{LL_Y}')
  GROUP BY 1, 2),
x AS (SELECT day, n AS x FROM daily WHERE event_type = '{LL_X}'),
y AS (SELECT day AS y_day, n AS y FROM daily WHERE event_type = '{LL_Y}'),
lags AS (SELECT CAST(unnest(range(0, {LL_MAX_LAG + 1})) AS INTEGER) AS lag),
aligned AS (
  SELECT l.lag, x.x, y.y
  FROM x CROSS JOIN lags l
  JOIN y ON y.y_day = x.day + l.lag),
stats AS (
  SELECT lag, count(*) AS n_days,
         CAST(sum(x) AS BIGINT) AS sum_x,
         CAST(sum(y) AS BIGINT) AS sum_y,
         CAST(sum(x * y) AS BIGINT) AS sum_xy,
         CAST(sum(x * x) AS BIGINT) AS sum_x2,
         CAST(sum(y * y) AS BIGINT) AS sum_y2
  FROM aligned GROUP BY lag)
SELECT lag, n_days, sum_x, sum_y, sum_xy,
       CASE WHEN CAST(n_days * sum_x2 - sum_x * sum_x AS DOUBLE) <= 0
              OR CAST(n_days * sum_y2 - sum_y * sum_y AS DOUBLE) <= 0
            THEN CAST(0 AS BIGINT)
            ELSE CAST(round(
              CAST(n_days * sum_xy - sum_x * sum_y AS DOUBLE) * 1000000
              / sqrt(CAST(n_days * sum_x2 - sum_x * sum_x AS DOUBLE)
                     * CAST(n_days * sum_y2 - sum_y * sum_y AS DOUBLE)),
              0) AS BIGINT) END AS corr_ppm
FROM stats
ORDER BY lag
"""


QUERIES["events_leadlag"] = q_events_leadlag
ORACLES["events_leadlag"] = ORACLE_EVENTS_LEADLAG


# ------------------------------------------------------ Lorenz curve
# Lorenz-curve decile points of per-user activity concentration — the
# curve BEHIND events_gini's scalar: cumulative event share held by
# the bottom 10%, 20%, ..., 100% of users (sorted ascending by
# activity, deterministic user-id tiebreak). The readable capacity-
# planning form of the skew story: "the bottom half of users
# contributes X ppm of traffic, the top decile the rest" — exactly
# the imbalance a user-keyed shuffle inherits. Exact ppm integers;
# decile boundary rank = d·n DIV 10 (boundary rows join by rank, so
# small corpora where boundaries coincide emit the same row under
# several deciles — both engines identically).
#
# Scale shape: one per-user partial-agg count, one rank window over
# the |users|-sized count table (never events), totals broadcast, a
# 10-row broadcast decile join.


def q_events_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.asc("cnt"), F.asc("user_id"))
    ranked = counts.select(
        "cnt",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
    )
    tot = counts.agg(
        F.count("*").alias("n_users"), F.sum("cnt").alias("n_events")
    )
    deciles = spark.range(1, 11).select(F.col("id").alias("decile"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(deciles),
            F.col("rn") == F.expr("decile * n_users DIV 10"),
        )
        .select(
            "decile",
            "rn",
            F.expr("cum * 1000000 DIV n_events").alias("cum_share_ppm"),
        )
        .orderBy("decile")
    )


ORACLE_EVENTS_LORENZ_DECILES = """
WITH counts AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
ranked AS (
  SELECT cnt, user_id,
         row_number() OVER (ORDER BY cnt ASC, user_id ASC) AS rn,
         sum(cnt) OVER (ORDER BY cnt ASC, user_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM counts),
tot AS (
  SELECT count(*) AS n_users, CAST(sum(cnt) AS BIGINT) AS n_events
  FROM counts),
deciles AS (SELECT unnest(range(1, 11)) AS decile)
SELECT d.decile, r.rn,
       CAST(r.cum * 1000000 // t.n_events AS BIGINT) AS cum_share_ppm
FROM ranked r
CROSS JOIN tot t
JOIN deciles d ON r.rn = d.decile * t.n_users // 10
ORDER BY d.decile
"""


QUERIES["events_lorenz_deciles"] = q_events_lorenz_deciles
ORACLES["events_lorenz_deciles"] = ORACLE_EVENTS_LORENZ_DECILES
