"""Web-scale corpus quality filters (driver-checkable).

Two query families a pre-training pipeline runs before dedup/sampling
(queries_corpus.py), extending the text-analysis suite:

  docs_repetition  Gopher-style repetition signals per document
                   (distinct-token ratio, duplicated-trigram fraction,
                   most-frequent-bigram mass) + the composite keep gate
                   — the filters of Rae et al. 2021 §A1.1 re-expressed
                   as one Spark pass.
  docs_pii_scrub   PII detection + redaction: e-mail / IPv4 / phone
                   regex banks, per-doc match counts and the md5 of the
                   redacted text (byte-level proof the scrubbed output
                   is identical across engines).

The driver's synthetic `documents` corpus contains no PII, so
docs_pii_scrub first APPENDS deterministic PII spans derived from
doc_id (same expression in Spark and the DuckDB oracle) — the
detection/redaction logic is what is actually under test, on text
whose ground truth is known exactly.

Oracle-parity discipline (house rules): thresholds and regexes live
once as module constants rendered into both engines; patterns are
restricted to the Java-regex ∩ RE2 common dialect (\\b, \\d, bounded
quantifiers — no lookaround, no backrefs); floats rounded to 4dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deja_view_spark.queries_text import TOKEN_RE, _shingles_from_toks
from deja_view_spark.sources.catalog import load_table

# ----------------------------------------------------------------- constants
# Gopher-style gate thresholds (Rae et al. 2021, Table A1 — adapted to
# token fractions; the synthetic corpus medians are distinct≈0.46,
# dup-trigram≈0.0, top-bigram-slot≈0.033, so the gate is
# non-degenerate). top_bigram_frac = mode_count / (n_tokens - 1): the
# fraction of overlapping-bigram SLOTS the mode occupies, a true [0,1]
# fraction (round 3; the old *2/n_tokens form could exceed 1.0).
MIN_DISTINCT_RATIO = 0.35   # below: boilerplate / degenerate repetition
MAX_DUP_TRIGRAM = 0.05      # above: copy-pasted spans
MAX_TOP_BIGRAM = 0.05       # above: one phrase dominates the doc

# PII regex banks — Java-regex ∩ RE2 dialect only.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"
# Redaction runs e-mail -> IP -> phone, in that order (an e-mail's
# numeric local-part must not be half-eaten by the IP pass first).
PII_BANKS = [("email", EMAIL_RE, "<EMAIL>"),
             ("ipv4", IPV4_RE, "<IP>"),
             ("phone", PHONE_RE, "<PHONE>")]


# ------------------------------------------- reusable column builders
# (shared with streaming/quality.py — the streaming gate/scrubber are
# the SAME column expressions bound to a readStream source)
def repetition_scalar_cols(toks):
    """Map-side repetition metrics from a token-array column:
    (n_tokens, distinct_ratio, dup_trigram_frac) — the shuffle-free
    subset of the Gopher gate (the most-frequent-bigram mass needs an
    aggregation and stays batch/windowed)."""
    tri = _shingles_from_toks(toks, 3)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    distinct_ratio = F.round(nd / n, 4)
    dup_tri = (
        F.when(
            F.size(tri) > 0,
            F.round(
                (F.size(tri) - F.size(F.array_distinct(tri))) / F.size(tri), 4
            ),
        )
        .otherwise(F.lit(0.0))
    )
    return n, distinct_ratio, dup_tri


def pii_count_cols(txt):
    """One match-count column per PII bank, aliased n_<bank>."""
    return [
        F.size(F.regexp_extract_all(txt, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat, _ in PII_BANKS
    ]


def pii_redact_col(txt):
    """The fully redacted text (banks applied in declaration order)."""
    red = txt
    for _, pat, token in PII_BANKS:
        red = F.regexp_replace(red, pat, token)
    return red


# -------------------------------------------------- repetition quality gate
def q_docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics + keep gate (Gopher filters).

    Scale shape: distinct-token ratio and duplicated-trigram fraction
    are PURE MAP-SIDE array expressions (size/array_distinct over the
    shingle arrays — no explode needed for them); the
    most-frequent-bigram statistic (a per-doc mode) rides ONE explode
    whose rows carry the already-computed scalars, so the whole query
    is one scan + two narrow key-partitioned aggregations — no join,
    no window sort, no second pass over the text. The mode's
    tie-break (count desc, bigram asc) is a min-of-struct((-count,
    bigram)) aggregate, which keeps full map-side combine where a
    row_number window would force a per-group sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
    base = docs.select("doc_id", toks.alias("_toks"))
    n, dr, dt = repetition_scalar_cols(F.col("_toks"))
    per_doc = base.select(
        "doc_id",
        n.alias("n_tokens"),
        dr.alias("distinct_ratio"),
        dt.alias("dup_trigram_frac"),
        # explode_outer keeps token-poor docs (no bigrams) as one
        # null-bigram row so they survive to the output
        F.explode_outer(_shingles_from_toks(F.col("_toks"), 2)).alias(
            "bigram"
        ),
    )
    counts = per_doc.groupBy("doc_id", "bigram").agg(
        F.count("*").alias("c"),
        F.max("n_tokens").alias("n_tokens"),
        F.max("distinct_ratio").alias("distinct_ratio"),
        F.max("dup_trigram_frac").alias("dup_trigram_frac"),
    )
    top = counts.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.max("distinct_ratio").alias("distinct_ratio"),
        F.max("dup_trigram_frac").alias("dup_trigram_frac"),
        F.min(
            F.when(
                F.col("bigram").isNotNull(),
                F.struct((-F.col("c")).alias("negc"), F.col("bigram")),
            )
        ).alias("_m"),
    )
    out = top.select(
        "doc_id",
        "n_tokens",
        "distinct_ratio",
        "dup_trigram_frac",
        F.coalesce(F.col("_m.bigram"), F.lit("")).alias("top_bigram"),
        # fraction of BIGRAM SLOTS (n_tokens - 1 overlapping bigrams)
        # occupied by the mode — a true [0, 1] fraction, matching the
        # Gopher-style repetition mass definition ('a a a a' -> 1.0,
        # not the 1.5 the old top_c*2/n_tokens normalization gave)
        F.round(
            F.coalesce(-F.col("_m.negc"), F.lit(0))
            / F.greatest(F.col("n_tokens") - 1, F.lit(1)),
            4,
        ).alias("top_bigram_frac"),
    )
    keep = (
        (F.col("distinct_ratio") >= MIN_DISTINCT_RATIO)
        & (F.col("dup_trigram_frac") <= MAX_DUP_TRIGRAM)
        & (F.col("top_bigram_frac") <= MAX_TOP_BIGRAM)
    )
    return out.withColumn("keep", keep).orderBy("doc_id")


_SQL_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"

ORACLE_DOCS_REPETITION = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS nd,
         list_transform(generate_series(1, len(toks) - 2),
                        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
           AS tri,
         list_transform(generate_series(1, len(toks) - 1),
                        i -> concat_ws(' ', toks[i], toks[i+1])) AS bi
  FROM t),
b AS (
  SELECT doc_id, g AS bigram, count(*) AS c
  FROM (SELECT doc_id, unnest(bi) AS g FROM m)
  GROUP BY 1, 2),
tb AS (
  SELECT doc_id, bigram AS top_bigram, c AS top_c FROM (
    SELECT doc_id, bigram, c,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, bigram ASC) AS rn
    FROM b) WHERE rn = 1),
per_doc AS (
  SELECT m.doc_id, m.n_tokens,
         round(nd * 1.0 / n_tokens, 4) AS distinct_ratio,
         CASE WHEN len(tri) > 0
              THEN round((len(tri) - len(list_distinct(tri))) * 1.0
                         / len(tri), 4)
              ELSE 0.0 END AS dup_trigram_frac,
         coalesce(top_bigram, '') AS top_bigram,
         round(coalesce(top_c, 0) * 1.0
               / greatest(n_tokens - 1, 1), 4) AS top_bigram_frac
  FROM m LEFT JOIN tb ON m.doc_id = tb.doc_id)
SELECT doc_id, n_tokens, distinct_ratio, dup_trigram_frac, top_bigram,
       top_bigram_frac,
       (distinct_ratio >= {MIN_DISTINCT_RATIO}
        AND dup_trigram_frac <= {MAX_DUP_TRIGRAM}
        AND top_bigram_frac <= {MAX_TOP_BIGRAM}) AS keep
FROM per_doc
ORDER BY doc_id
"""


# ----------------------------------------------------------- PII scrubbing
def _spark_seeded_text():
    """text + deterministic PII spans keyed off doc_id (mirrored in the
    oracle SQL below): every 5th doc gets an e-mail, every 7th an IPv4,
    every 11th a phone number."""
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"),
                     F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(F.lit(" node at 10."), (did % 256).cast("string"),
                     F.lit(".0."), (did % 100).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(F.lit(" call 555-"),
                     F.lpad((did % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )


_SQL_SEEDED = """
concat(text,
  CASE WHEN doc_id % 5 = 0
       THEN concat(' contact user', doc_id::VARCHAR, '@example.com')
       ELSE '' END,
  CASE WHEN doc_id % 7 = 0
       THEN concat(' node at 10.', (doc_id % 256)::VARCHAR, '.0.',
                   (doc_id % 100)::VARCHAR)
       ELSE '' END,
  CASE WHEN doc_id % 11 = 0
       THEN concat(' call 555-', lpad((doc_id % 10000)::VARCHAR, 4, '0'))
       ELSE '' END)
"""


def q_docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the (deterministically seeded)
    corpus: per-doc match counts per bank and the md5 of the fully
    redacted text; emits only documents that contained PII.

    Scale shape: one map-side pass — regexp_extract_all counts and the
    chained regexp_replace all run inside whole-stage codegen on the
    scan, no UDF, no shuffle (the final orderBy is presentation). At
    100 TB this is the cheapest possible shape: scan-bandwidth-bound,
    trivially parallel, and the redacted output could be written
    straight back out partition-by-partition."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = _spark_seeded_text()
    row = docs.select("doc_id", seeded.alias("_txt"))
    out = row.select(
        "doc_id",
        *pii_count_cols(F.col("_txt")),
        F.md5(pii_redact_col(F.col("_txt"))).alias("redacted_md5"),
    )
    any_pii = None
    for name, _, _ in PII_BANKS:
        c = F.col(f"n_{name}") > 0
        any_pii = c if any_pii is None else (any_pii | c)
    return out.where(any_pii).orderBy("doc_id")


_SQL_PII_COUNTS = ",\n       ".join(
    f"len(regexp_extract_all(_txt, '{pat}')) AS n_{name}"
    for name, pat, _ in PII_BANKS
)
_sql_redacted = "_txt"
for _name, _pat, _token in PII_BANKS:
    _sql_redacted = f"regexp_replace({_sql_redacted}, '{_pat}', '{_token}', 'g')"

ORACLE_DOCS_PII_SCRUB = f"""
WITH seeded AS (
  SELECT doc_id, {_SQL_SEEDED} AS _txt FROM documents),
scored AS (
  SELECT doc_id,
       {_SQL_PII_COUNTS},
       md5({_sql_redacted}) AS redacted_md5
  FROM seeded)
SELECT * FROM scored
WHERE n_email > 0 OR n_ipv4 > 0 OR n_phone > 0
ORDER BY doc_id
"""


QUERIES = {
    "docs_repetition": q_docs_repetition,
    "docs_pii_scrub": q_docs_pii_scrub,
}

ORACLES = {
    "docs_repetition": ORACLE_DOCS_REPETITION,
    "docs_pii_scrub": ORACLE_DOCS_PII_SCRUB,
}


# ---------------------------------------------------- k-anonymity audit
# Privacy audit before a data release: treat (lang, source,
# length-bucket) as the quasi-identifier and report, per equivalence
# class size band, how many classes and rows fall below the k=5
# anonymity floor — the table a release reviewer reads to decide
# whether the QI columns need further coarsening. Sweeney's k-anonymity
# reframed as the aggregation it is: one QI partial agg (class sizes),
# one metadata-sized band rollup. The length bucket (floor(n_chars /
# 100)) is the coarsening knob; at 100 TB both aggs stay
# map-side-combining and the output is |bands| rows.
K_ANON_FLOOR = 5


def q_docs_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    classes = docs.groupBy(
        "lang",
        "source",
        F.expr("n_chars DIV 100").alias("len_bucket"),
    ).agg(F.count("*").alias("class_size"))
    banded = classes.select(
        F.when(F.col("class_size") == 1, "1 (unique)")
        .when(F.col("class_size") < K_ANON_FLOOR, f"2-{K_ANON_FLOOR - 1}")
        .otherwise(f">={K_ANON_FLOOR}")
        .alias("size_band"),
        "class_size",
    )
    return (
        banded.groupBy("size_band")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
            (F.min("class_size") >= K_ANON_FLOOR).alias("k_anonymous"),
        )
        .orderBy("size_band")
    )


ORACLE_DOCS_K_ANONYMITY = f"""
WITH classes AS (
  SELECT lang, source, n_chars // 100 AS len_bucket,
         count(*) AS class_size
  FROM documents GROUP BY 1, 2, 3),
banded AS (
  SELECT CASE WHEN class_size = 1 THEN '1 (unique)'
              WHEN class_size < {K_ANON_FLOOR} THEN '2-{K_ANON_FLOOR - 1}'
              ELSE '>={K_ANON_FLOOR}' END AS size_band,
         class_size
  FROM classes)
SELECT size_band, count(*) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_rows,
       min(class_size) >= {K_ANON_FLOOR} AS k_anonymous
FROM banded
GROUP BY size_band
ORDER BY size_band
"""

QUERIES["docs_k_anonymity"] = q_docs_k_anonymity
ORACLES["docs_k_anonymity"] = ORACLE_DOCS_K_ANONYMITY


# ------------------------------------------------- expectation suite
# Data-contract checks (the dbt-test / Great-Expectations shape) as
# ONE aggregate pass: each rule is a conditional count over the same
# scan, so adding a rule costs a column, not a job. Rules cover the
# contract the rest of the engine assumes: key not-null and unique,
# lang in the accepted set, n_chars positive, and the n_chars ==
# length(text) consistency every length-based operator (percentiles,
# MAD, winsorized means) silently relies on. Output is one row per
# rule with violation count and verdict — the CI gate an ingest runs
# before promoting a snapshot.
EXPECT_LANGS = ("en", "de", "es", "fr", "zh")


def q_docs_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    langs = ", ".join(f"'{x}'" for x in EXPECT_LANGS)
    row = docs.agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.when(F.col("doc_id").isNull(), 1).otherwise(0)
        ).alias("v_notnull"),
        (F.count("*") - F.countDistinct("doc_id")).alias("v_unique"),
        F.sum(
            F.when(~F.expr(f"lang IN ({langs})"), 1).otherwise(0)
        ).alias("v_accepted"),
        F.sum(
            F.when(F.col("n_chars") <= 0, 1).otherwise(0)
        ).alias("v_range"),
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).alias("v_consistent"),
    )
    rules = [
        ("doc_id_not_null", "v_notnull"),
        ("doc_id_unique", "v_unique"),
        ("lang_accepted_values", "v_accepted"),
        ("n_chars_positive", "v_range"),
        ("n_chars_matches_text", "v_consistent"),
    ]
    stacked = row.select(
        "n_rows",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(col).alias("n_violations"),
                    )
                    for name, col in rules
                ]
            )
        ).alias("s"),
    )
    return stacked.select(
        F.col("s.rule").alias("rule"),
        "n_rows",
        F.col("s.n_violations").alias("n_violations"),
        (F.col("s.n_violations") == 0).alias("passed"),
    ).orderBy("rule")


def _oracle_expectations() -> str:
    langs = ", ".join(f"'{x}'" for x in EXPECT_LANGS)
    branches = {
        "doc_id_not_null":
            "CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)"
            " AS BIGINT)",
        "doc_id_unique": "count(*) - count(DISTINCT doc_id)",
        "lang_accepted_values":
            f"CAST(sum(CASE WHEN lang NOT IN ({langs}) THEN 1 ELSE 0 END)"
            " AS BIGINT)",
        "n_chars_positive":
            "CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END)"
            " AS BIGINT)",
        "n_chars_matches_text":
            "CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)"
            " AS BIGINT)",
    }
    selects = "\nUNION ALL\n".join(
        f"SELECT '{rule}' AS rule, count(*) AS n_rows, {expr} AS "
        f"n_violations FROM documents"
        for rule, expr in branches.items()
    )
    return f"""
SELECT rule, n_rows, n_violations, n_violations = 0 AS passed
FROM ({selects})
ORDER BY rule
"""


ORACLE_DOCS_EXPECTATIONS = _oracle_expectations()

QUERIES["docs_expectations"] = q_docs_expectations
ORACLES["docs_expectations"] = ORACLE_DOCS_EXPECTATIONS


# --------------------------------------------- filter-funnel census
# Attribution census for the composed quality filter — the report a
# corpus curator reads before shipping a filter chain: not just how
# many docs each rule rejects (rules overlap heavily), but how many
# each rule rejects FIRST (its marginal effect in the fixed chain
# order — what the rule actually removes given everything before it)
# and how many it is the SOLE reason for (what would be recovered by
# deleting just that rule). Four expression-level rules in ONE
# tokenize pass: too_short (< FF_MIN_TOKENS tokens), too_long
# (> FF_MAX_CHARS chars), low_distinct (distinct-token ratio below
# FF_MIN_DISTINCT_PCT% — integer cross-multiplication, no division),
# has_pii (the module's email/phone banks). A final 'pass' row
# carries the survivor count through the same three columns.
#
# Scale shape: one pruned scan, every flag a codegen column expr, ONE
# global aggregate emitting 16 integers, then a 5-row stack of that
# single row. No joins, no window, no shuffle beyond the scalar agg.

FF_MIN_TOKENS = 10
FF_MAX_CHARS = 5000
FF_MIN_DISTINCT_PCT = 35


def q_docs_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
    flagged = docs.select(
        (F.size(toks) < FF_MIN_TOKENS).alias("f1"),
        (F.col("n_chars") > FF_MAX_CHARS).alias("f2"),
        (
            F.size(F.array_distinct(toks)) * 100
            < F.size(toks) * FF_MIN_DISTINCT_PCT
        ).alias("f3"),
        (
            F.lower(F.col("text")).rlike(EMAIL_RE)
            | F.lower(F.col("text")).rlike(PHONE_RE)
        ).alias("f4"),
    )
    c = lambda e: F.sum(e.cast("long"))  # noqa: E731
    f1, f2, f3, f4 = (F.col(x) for x in ("f1", "f2", "f3", "f4"))
    agg = flagged.agg(
        F.count("*").alias("n_docs"),
        c(f1).alias("any1"),
        c(f2).alias("any2"),
        c(f3).alias("any3"),
        c(f4).alias("any4"),
        c(f1).alias("first1"),
        c(f2 & ~f1).alias("first2"),
        c(f3 & ~f1 & ~f2).alias("first3"),
        c(f4 & ~f1 & ~f2 & ~f3).alias("first4"),
        c(f1 & ~f2 & ~f3 & ~f4).alias("sole1"),
        c(f2 & ~f1 & ~f3 & ~f4).alias("sole2"),
        c(f3 & ~f1 & ~f2 & ~f4).alias("sole3"),
        c(f4 & ~f1 & ~f2 & ~f3).alias("sole4"),
        c(~f1 & ~f2 & ~f3 & ~f4).alias("survivors"),
    )
    return agg.select(
        F.expr(
            "stack(5, "
            "1, 'too_short',    any1, first1, sole1, "
            "2, 'too_long',     any2, first2, sole2, "
            "3, 'low_distinct', any3, first3, sole3, "
            "4, 'has_pii',      any4, first4, sole4, "
            "5, 'pass',         survivors, survivors, survivors) "
            "AS (rule_order, rule, n_failing, n_first, n_sole)"
        ),
        "n_docs",
    ).withColumn(
        "share_ppm", F.expr("n_failing * 1000000 DIV n_docs")
    ).orderBy("rule_order")


ORACLE_DOCS_FILTER_FUNNEL = f"""
WITH flags AS (
  SELECT len({_SQL_TOKS}) < {FF_MIN_TOKENS} AS f1,
         n_chars > {FF_MAX_CHARS} AS f2,
         len(list_distinct({_SQL_TOKS})) * 100
           < len({_SQL_TOKS}) * {FF_MIN_DISTINCT_PCT} AS f3,
         (regexp_matches(lower(text), '{EMAIL_RE}')
          OR regexp_matches(lower(text), '{PHONE_RE}')) AS f4
  FROM documents),
agg AS (
  SELECT count(*) AS n_docs,
         CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS any1,
         CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS any2,
         CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS any3,
         CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS any4,
         CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS first1,
         CAST(sum(CASE WHEN f2 AND NOT f1 THEN 1 ELSE 0 END) AS BIGINT)
           AS first2,
         CAST(sum(CASE WHEN f3 AND NOT f1 AND NOT f2 THEN 1 ELSE 0 END)
              AS BIGINT) AS first3,
         CAST(sum(CASE WHEN f4 AND NOT f1 AND NOT f2 AND NOT f3
                       THEN 1 ELSE 0 END) AS BIGINT) AS first4,
         CAST(sum(CASE WHEN f1 AND NOT f2 AND NOT f3 AND NOT f4
                       THEN 1 ELSE 0 END) AS BIGINT) AS sole1,
         CAST(sum(CASE WHEN f2 AND NOT f1 AND NOT f3 AND NOT f4
                       THEN 1 ELSE 0 END) AS BIGINT) AS sole2,
         CAST(sum(CASE WHEN f3 AND NOT f1 AND NOT f2 AND NOT f4
                       THEN 1 ELSE 0 END) AS BIGINT) AS sole3,
         CAST(sum(CASE WHEN f4 AND NOT f1 AND NOT f2 AND NOT f3
                       THEN 1 ELSE 0 END) AS BIGINT) AS sole4,
         CAST(sum(CASE WHEN NOT f1 AND NOT f2 AND NOT f3 AND NOT f4
                       THEN 1 ELSE 0 END) AS BIGINT) AS survivors
  FROM flags),
rows_ AS (
  SELECT 1 AS rule_order, 'too_short' AS rule,
         any1 AS n_failing, first1 AS n_first, sole1 AS n_sole, n_docs
  FROM agg
  UNION ALL SELECT 2, 'too_long', any2, first2, sole2, n_docs FROM agg
  UNION ALL SELECT 3, 'low_distinct', any3, first3, sole3, n_docs
  FROM agg
  UNION ALL SELECT 4, 'has_pii', any4, first4, sole4, n_docs FROM agg
  UNION ALL SELECT 5, 'pass', survivors, survivors, survivors, n_docs
  FROM agg)
SELECT rule_order, rule, n_failing, n_first, n_sole, n_docs,
       n_failing * 1000000 // n_docs AS share_ppm
FROM rows_
ORDER BY rule_order
"""


QUERIES["docs_filter_funnel"] = q_docs_filter_funnel
ORACLES["docs_filter_funnel"] = ORACLE_DOCS_FILTER_FUNNEL


# --------------------------------------------------- l-diversity audit
# l-diversity — the privacy audit k-anonymity alone cannot pass: a
# quasi-identifier class can be large (k-anonymous) yet HOMOGENEOUS in
# the sensitive attribute, so membership still discloses it. Quasi
# classes here are (lang, n_chars DIV 100) — docs_k_anonymity's
# quasi-identifier set minus the sensitive column — and the sensitive
# attribute is `source` (which corpus a document came from is exactly
# the kind of provenance a release pipeline may need to withhold).
# Classes are banded by their distinct-sensitive-value count l, same
# report shape as the k-anonymity census; the audit passes only when
# every class carries >= L_DIV_FLOOR distinct sources.
#
# Scale shape: one partial agg to (quasi-class, source) rows, one
# per-class rollup, one |bands|-row census. No joins, no windows.

L_DIV_FLOOR = 2


def q_docs_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    classes = docs.groupBy(
        "lang", F.expr("n_chars DIV 100").alias("len_bucket")
    ).agg(
        F.count("*").alias("class_size"),
        F.countDistinct("source").alias("l_count"),
    )
    banded = classes.select(
        F.when(F.col("l_count") == 1, "1 (homogeneous)")
        .when(F.col("l_count") < L_DIV_FLOOR, f"2-{L_DIV_FLOOR - 1}")
        .otherwise(f">={L_DIV_FLOOR}")
        .alias("l_band"),
        "class_size",
        "l_count",
    )
    return (
        banded.groupBy("l_band")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
            F.min("l_count").alias("min_l"),
            (F.min("l_count") >= L_DIV_FLOOR).alias("l_diverse"),
        )
        .orderBy("l_band")
    )


ORACLE_DOCS_L_DIVERSITY = f"""
WITH classes AS (
  SELECT lang, n_chars // 100 AS len_bucket,
         count(*) AS class_size,
         count(DISTINCT source) AS l_count
  FROM documents GROUP BY 1, 2),
banded AS (
  SELECT CASE WHEN l_count = 1 THEN '1 (homogeneous)'
              WHEN l_count < {L_DIV_FLOOR} THEN '2-{L_DIV_FLOOR - 1}'
              ELSE '>={L_DIV_FLOOR}' END AS l_band,
         class_size, l_count
  FROM classes)
SELECT l_band, count(*) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_rows,
       CAST(min(l_count) AS BIGINT) AS min_l,
       min(l_count) >= {L_DIV_FLOOR} AS l_diverse
FROM banded
GROUP BY l_band
ORDER BY l_band
"""


QUERIES["docs_l_diversity"] = q_docs_l_diversity
ORACLES["docs_l_diversity"] = ORACLE_DOCS_L_DIVERSITY
