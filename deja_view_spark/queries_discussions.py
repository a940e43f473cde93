"""Discussions-metrics query suite (driver-checkable).

Implements the reference's DiscussionsMetricsService analytics
(discussions_metrics.py:70-190) over a discussions-shaped corpus:
P10 (Q&A-category predicate, :128,162-164), P11 (unanswered predicate,
:129-130,167), answer rate (:166-169), category histogram (:154-158),
top-20 upvoted (:136-152), week-over-week counts (:105-114) — plus the
suggest-discussions composed pipeline
(github_similarity_service.py:549-639).

The driver's pre-registered ``documents`` view carries only
(doc_id, text, lang, source, n_chars), so the discussion attributes
(FIXTURES.md §2: state, category, upvote_count, answer_id, labels,
created_at, is_pull_request, is_discussion) are DERIVED as
deterministic functions of doc_id with expressions that evaluate
byte-identically in Spark and DuckDB. One source of truth below
generates BOTH sides, so the oracle compares real computation, not
copied constants.

"Now" is pinned to a constant (NOW_TS) so week-over-week windows are
reproducible — the reference anchors to datetime.now()
(discussions_metrics.py:84); a deterministic engine anchors to the
batch watermark instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deja_view_spark.functions import scoring as S
from deja_view_spark.sources.catalog import load_table

# ------------------------------------------------- derivation (shared truth)
CATEGORIES = ["Q&A", "Help", "General", "Feature Requests", "Models + Providers"]
BASE_TS = "2024-06-01 00:00:00"
NOW_TS = "2024-06-29 00:00:00"
THIS_WEEK_START = "2024-06-22 00:00:00"
LAST_WEEK_START = "2024-06-15 00:00:00"
# Q&A-category predicate, reference discussions_metrics.py:128:
# lower(category) in ('q&a','help') or 'question' in lower(category)
QA_CATS = ["q&a", "help"]


def discussions_view(docs: DataFrame) -> DataFrame:
    """documents -> discussions-shaped frame (FIXTURES.md §2 columns).
    Pure column expressions; every attribute is a function of doc_id."""
    d = F.col("doc_id")
    is_pr = d % 7 == 0
    is_disc = (d % 2 == 0) & ~is_pr
    cat_arr = F.array(*[F.lit(c) for c in CATEGORIES])
    category = F.when(is_disc, F.element_at(cat_arr, (d % 5 + 1).cast("int")))
    answered = is_disc & (d % 4 == 0)
    created = F.timestamp_add(
        "HOUR",
        (d % 24).cast("int"),
        F.timestamp_add("DAY", (d % 28).cast("int"), F.lit(BASE_TS).cast("timestamp")),
    )
    labels = F.when(
        d % 11 == 0, F.array(F.lit("question"))
    ).when(
        d % 11 == 5, F.array(F.lit("bug"))
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id",
        F.substring("text", 1, 60).alias("title"),
        F.col("text").alias("body"),
        F.when(d % 3 == 0, F.lit("closed")).otherwise(F.lit("open")).alias("state"),
        is_pr.alias("is_pull_request"),
        is_disc.alias("is_discussion"),
        category.alias("category"),
        ((d * 37) % 50).alias("upvote_count"),
        F.when(answered, F.concat(F.lit("ans-"), d.cast("string"))).alias("answer_id"),
        created.alias("created_at"),
        F.concat(F.lit("user"), (d % 23).cast("string")).alias("author"),
        labels.alias("labels"),
    )


_CATS_SQL = ", ".join(f"'{c}'" for c in CATEGORIES)

# DuckDB CTE computing the identical derivation (list literals are
# 1-indexed in both element_at and list indexing)
DISC_CTE = f"""
disc AS (
  SELECT doc_id,
         substr(text, 1, 60) AS title,
         text AS body,
         CASE WHEN doc_id % 3 = 0 THEN 'closed' ELSE 'open' END AS state,
         (doc_id % 7 = 0) AS is_pull_request,
         (doc_id % 2 = 0 AND NOT doc_id % 7 = 0) AS is_discussion,
         CASE WHEN doc_id % 2 = 0 AND NOT doc_id % 7 = 0
              THEN ([{_CATS_SQL}])[CAST(doc_id % 5 + 1 AS INT)] END AS category,
         (doc_id * 37) % 50 AS upvote_count,
         CASE WHEN doc_id % 2 = 0 AND NOT doc_id % 7 = 0 AND doc_id % 4 = 0
              THEN concat('ans-', doc_id) END AS answer_id,
         TIMESTAMP '{BASE_TS}'
           + (doc_id % 28) * INTERVAL 1 DAY
           + (doc_id % 24) * INTERVAL 1 HOUR AS created_at,
         concat('user', doc_id % 23) AS author,
         CASE WHEN doc_id % 11 = 0 THEN ['question']
              WHEN doc_id % 11 = 5 THEN ['bug']
              ELSE [] END AS labels
  FROM documents)
"""

_QA_SQL = (
    "(lower(category) IN ('q&a', 'help') OR contains(lower(category), 'question'))"
)


def _is_qa(category: F.Column) -> F.Column:
    lc = F.lower(category)
    return lc.isin(QA_CATS) | lc.contains("question")


# ------------------------------------------------------------- 1. overview
def q_discussions_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row rollup: totals, WoW counts/change/pct (reference
    :105-114 incl. the last_week==0 branch), unanswered-Q&A count
    (P10+P11), answer rate (:166-169), avg upvotes (:173-174)."""
    disc = discussions_view(load_table(spark, sf_dir, "documents")).where(
        "is_discussion"
    )
    this_wk = F.col("created_at") >= F.lit(THIS_WEEK_START).cast("timestamp")
    last_wk = (F.col("created_at") >= F.lit(LAST_WEEK_START).cast("timestamp")) & (
        F.col("created_at") < F.lit(THIS_WEEK_START).cast("timestamp")
    )
    qa = _is_qa(F.col("category"))
    unanswered = qa & F.col("answer_id").isNull()
    agg = disc.agg(
        F.count("*").alias("total_discussions"),
        F.sum(this_wk.cast("long")).alias("discussions_this_week"),
        F.sum(last_wk.cast("long")).alias("discussions_last_week"),
        F.sum(unanswered.cast("long")).alias("total_unanswered_qa"),
        F.sum(qa.cast("long")).alias("_qa"),
        F.sum((qa & F.col("answer_id").isNotNull()).cast("long")).alias("_ans"),
        F.round(F.avg("upvote_count"), 4).alias("avg_upvotes"),
    )
    tw, lw = F.col("discussions_this_week"), F.col("discussions_last_week")
    return agg.select(
        "total_discussions",
        "discussions_this_week",
        "discussions_last_week",
        F.when(lw > 0, tw - lw).otherwise(tw).alias("week_over_week_change"),
        F.when(lw > 0, F.round((tw - lw) * 100.0 / lw, 1))
        .when(tw > 0, F.lit(100.0))
        .otherwise(F.lit(0.0))
        .alias("week_over_week_percentage"),
        "total_unanswered_qa",
        F.when(F.col("_qa") > 0, F.round(F.col("_ans") * 100.0 / F.col("_qa"), 1))
        .otherwise(F.lit(0.0))
        .alias("answer_rate"),
        "avg_upvotes",
    )


ORACLE_DISCUSSIONS_OVERVIEW = f"""
WITH {DISC_CTE},
d AS (SELECT * FROM disc WHERE is_discussion),
agg AS (
  SELECT count(*) AS total_discussions,
         CAST(sum(CASE WHEN created_at >= TIMESTAMP '{THIS_WEEK_START}' THEN 1 ELSE 0 END) AS BIGINT) AS tw,
         CAST(sum(CASE WHEN created_at >= TIMESTAMP '{LAST_WEEK_START}'
                   AND created_at < TIMESTAMP '{THIS_WEEK_START}' THEN 1 ELSE 0 END) AS BIGINT) AS lw,
         CAST(sum(CASE WHEN {_QA_SQL} AND answer_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unans,
         CAST(sum(CASE WHEN {_QA_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS qa,
         CAST(sum(CASE WHEN {_QA_SQL} AND answer_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ans,
         round(avg(upvote_count), 4) AS avg_upvotes
  FROM d)
SELECT total_discussions,
       tw AS discussions_this_week,
       lw AS discussions_last_week,
       CASE WHEN lw > 0 THEN tw - lw ELSE tw END AS week_over_week_change,
       CASE WHEN lw > 0 THEN round((tw - lw) * 100.0 / lw, 1)
            WHEN tw > 0 THEN 100.0 ELSE 0.0 END AS week_over_week_percentage,
       unans AS total_unanswered_qa,
       CASE WHEN qa > 0 THEN round(ans * 100.0 / qa, 1) ELSE 0.0 END AS answer_rate,
       avg_upvotes
FROM agg
"""


# --------------------------------------------------- 2. category histogram
def q_discussions_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 in its native shape: discussion count per category
    (reference :154-158), sorted count desc then name."""
    disc = discussions_view(load_table(spark, sf_dir, "documents")).where(
        "is_discussion"
    )
    return (
        disc.groupBy("category")
        .agg(F.count("*").alias("n_discussions"))
        .orderBy(F.desc("n_discussions"), F.asc("category"))
    )


ORACLE_DISCUSSIONS_CATEGORIES = f"""
WITH {DISC_CTE}
SELECT category, count(*) AS n_discussions
FROM disc WHERE is_discussion
GROUP BY category
ORDER BY n_discussions DESC, category ASC
"""


# ------------------------------------------------- 3. unanswered Q&A list
def q_discussions_unanswered_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 + P11 + sorted limit: unanswered Q&A/Help discussions,
    newest first (reference :117-133, display cap :325)."""
    disc = discussions_view(load_table(spark, sf_dir, "documents")).where(
        "is_discussion"
    )
    return (
        disc.where(_is_qa(F.col("category")) & F.col("answer_id").isNull())
        .select("doc_id", "title", "category", "upvote_count", "created_at", "author")
        .orderBy(F.desc("created_at"), F.desc("doc_id"))
        .limit(20)
    )


ORACLE_DISCUSSIONS_UNANSWERED = f"""
WITH {DISC_CTE}
SELECT doc_id, title, category, upvote_count, created_at, author
FROM disc
WHERE is_discussion AND {_QA_SQL} AND answer_id IS NULL
ORDER BY created_at DESC, doc_id DESC
LIMIT 20
"""


# ----------------------------------------------------- 4. top upvoted
def q_discussions_top_upvoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 by upvotes with has_answer flag (reference :136-152)."""
    disc = discussions_view(load_table(spark, sf_dir, "documents")).where(
        "is_discussion"
    )
    return (
        disc.select(
            "doc_id",
            "title",
            "category",
            "upvote_count",
            F.col("answer_id").isNotNull().alias("has_answer"),
        )
        .orderBy(F.desc("upvote_count"), F.asc("doc_id"))
        .limit(20)
    )


ORACLE_DISCUSSIONS_TOP_UPVOTED = f"""
WITH {DISC_CTE}
SELECT doc_id, title, category, upvote_count,
       (answer_id IS NOT NULL) AS has_answer
FROM disc WHERE is_discussion
ORDER BY upvote_count DESC, doc_id ASC
LIMIT 20
"""


# --------------------------------------------- 5. suggest_discussions (J3/P6)
# the composed pipeline, reference github_similarity_service.py:549-639:
# scan issues (not PRs, not discussions) -> F8-F10 score (incl. the
# labels bonus :530-534 via the J3 label semi-check) -> P6 min_score
# filter (:599) -> sort score desc (:621-622) -> limit max_suggestions
# (:623) -> confidence bucket (:600-607)
SUGGEST_MIN_SCORE = 0.3
SUGGEST_MAX = 20


def q_suggest_discussions(spark: SparkSession, sf_dir: str) -> DataFrame:
    disc = discussions_view(load_table(spark, sf_dir, "documents"))
    issues = disc.where(~F.col("is_pull_request") & ~F.col("is_discussion"))
    score = S.discussion_score(
        F.col("title"),
        F.col("body"),
        state=F.col("state"),
        labels=F.col("labels"),
    )
    rounded, conf = S.score_with_confidence(score)
    return (
        issues.select(
            "doc_id",
            "title",
            "state",
            rounded.alias("score"),
            conf.alias("confidence"),
        )
        .where(F.col("score") >= SUGGEST_MIN_SCORE)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(SUGGEST_MAX)
    )


def _sql_bank(patterns: list[str], col: str) -> str:
    ors = " OR ".join(f"regexp_matches({col}, '{p}')" for p in patterns)
    return f"(CASE WHEN {ors} THEN 1 ELSE 0 END)"


def _sql_contains_any(words: list[str], col: str) -> str:
    ors = " OR ".join(f"contains({col}, '{w}')" for w in words)
    return f"(CASE WHEN {ors} THEN 1 ELSE 0 END)"


def _sql_kw_count(words: list[str], col: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN contains({col}, '{w}') THEN 1 ELSE 0 END)" for w in words
    )
    return f"({terms})"


_SQL_DISC_LABELS = ", ".join(f"'{x}'" for x in S.DISCUSSION_LABELS)

ORACLE_SUGGEST_DISCUSSIONS = f"""
WITH {DISC_CTE},
base AS (
  SELECT doc_id, title, state,
         lower(title) AS title_l,
         concat_ws(' ', lower(title), lower(body)) AS combined,
         labels
  FROM disc
  WHERE NOT is_pull_request AND NOT is_discussion),
scored AS (
  SELECT doc_id, title, state,
    {_sql_bank(S.QUESTION_PATTERNS, 'combined')} * 0.4
    + {_sql_bank(S.FEATURE_PATTERNS, 'combined')} * 0.35
    + {_sql_bank(S.PROPOSAL_PATTERNS, 'combined')} * 0.45
    + {_sql_bank(S.DISCUSSION_PHRASES, 'combined')} * 0.3
    + least(0.3, {_sql_kw_count(S.DISCUSSION_KEYWORDS, 'combined')} * 0.1)
    - {_sql_contains_any(S.BUG_KEYWORDS, 'combined')} * 0.15
    + {_sql_contains_any(S.NON_BUG_INDICATORS, 'title_l')} * 0.2
    + {_sql_bank(S.TITLE_DISCUSSION_PATTERNS, 'title_l')} * 0.25
    + (CASE WHEN state = 'open' THEN 0.15 ELSE 0 END)
    + (CASE WHEN list_has_any(list_transform(labels, x -> lower(x)),
                              [{_SQL_DISC_LABELS}]) THEN 0.5 ELSE 0 END) AS raw
  FROM base),
final AS (
  SELECT doc_id, title, state,
         round(greatest(0.0, least(1.0, raw)), 3) AS score,
         CASE WHEN greatest(0.0, least(1.0, raw)) >= 0.7 THEN 'high'
              WHEN greatest(0.0, least(1.0, raw)) >= 0.5 THEN 'medium'
              ELSE 'low' END AS confidence
  FROM scored)
SELECT doc_id, title, state, score, confidence
FROM final
WHERE score >= {SUGGEST_MIN_SCORE}
ORDER BY score DESC, doc_id ASC
LIMIT {SUGGEST_MAX}
"""


# ----------------------------------------------------------------- registry
QUERIES = {
    "discussions_overview": q_discussions_overview,
    "discussions_category_counts": q_discussions_category_counts,
    "discussions_unanswered_top": q_discussions_unanswered_top,
    "discussions_top_upvoted": q_discussions_top_upvoted,
    "suggest_discussions": q_suggest_discussions,
}

ORACLES = {
    "discussions_overview": ORACLE_DISCUSSIONS_OVERVIEW,
    "discussions_category_counts": ORACLE_DISCUSSIONS_CATEGORIES,
    "discussions_unanswered_top": ORACLE_DISCUSSIONS_UNANSWERED,
    "discussions_top_upvoted": ORACLE_DISCUSSIONS_TOP_UPVOTED,
    "suggest_discussions": ORACLE_SUGGEST_DISCUSSIONS,
}
