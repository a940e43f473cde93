"""Probabilistic record linkage (Fellegi-Sunter) — driver-checkable.

``docs_record_linkage`` — the classic entity-resolution decision model
(Fellegi & Sunter 1969) over the documents corpus: blocked candidate
pairs are scored by a PER-FIELD agreement vector (language, length,
token overlap) weighted by log-likelihood ratios log2(m/u) /
log2((1-m)/(1-u)), then classified match / possible / non-match by
two thresholds. This is the weighted multi-evidence entity-linking
step of a KG build (reference semantics: deja-view links issues by a
single cosine score — `github_similarity_service.py:370-424`; a
production KG linker combines several weak field signals exactly this
way), distinct from the dedup family: those threshold ONE similarity,
this one fuses a VECTOR of field comparisons under a generative
match/non-match model.

Determinism contract (full value-hash oracle):
- every gamma is integer arithmetic (length tolerance via
  ``abs(da-db)*20 <= greatest(da,db)``, token-set Jaccard via
  cross-multiplied integers ``10*|A∩B| >= 6*|A∪B|``) — no float
  compare anywhere;
- the m/u priors are module constants, so the 8 possible scores (and
  their decisions) are precomputed IN PYTHON and inlined as one CASE
  over the packed gamma bits — both engines evaluate literal doubles,
  zero cross-engine float arithmetic (the same trick the scoring bank
  uses);
- the u-probability the model would estimate from data IS estimated
  from data as an audit column: u_lang_hat = P(two random docs agree
  on lang) = sum_l n_l*(n_l-1) / (n*(n-1)) — exact integer sums, one
  final division, 6dp round.

Scale shape: blocking key = first-4-token prefix (one narrow shuffle
on a short string; production swap-in: any blocking key union —
sorted-neighborhood windows, LSH bands — without touching the model);
per-block posting arrays capped at BLOCK_CAP (the df-cutoff discipline
every pair generator in this repo uses — oversized boilerplate blocks
are dropped, bounded candidate count, never all-pairs); pair
generation is bucket-local posexplode+slice in whole-stage codegen;
the comparison vector and CASE score are pure expressions. The lang
frequency table for u_lang_hat is a 5-row broadcast.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deja_view_spark.queries_text import TOKEN_RE
from deja_view_spark.sources.catalog import load_table

BLOCK_CAP = 50  # max docs per block before the block is dropped
TOK_K = 50  # token-overlap field compares the first-K distinct tokens

# m/u priors per field: m = P(field agrees | same entity), u = P(field
# agrees | different entities). Externally calibrated constants (the
# EM fit that estimates them in production is driver-side metadata
# work, like the IVF sample fit); u_lang's data-driven estimate ships
# alongside as the audit column.
_MU = {
    "lang": (0.95, 0.20),
    "len": (0.90, 0.10),
    "tok": (0.90, 0.02),
}
MATCH_T = 6.0  # score >= MATCH_T  -> 'match'
POSSIBLE_T = 0.0  # score >= POSSIBLE_T -> 'possible'


def _weights() -> dict[str, tuple[float, float]]:
    """(agree, disagree) log2 likelihood-ratio weights per field."""
    return {
        f: (
            round(math.log2(m / u), 4),
            round(math.log2((1 - m) / (1 - u)), 4),
        )
        for f, (m, u) in _MU.items()
    }


def _score_case_sql() -> tuple[str, str]:
    """Two CASE expressions over the packed gamma bits — score and
    decision — with every branch a Python-computed literal. The SAME
    string is used as a Spark expression and inside the DuckDB oracle,
    so both engines evaluate identical double literals."""
    w = _weights()
    score_arms, dec_arms = [], []
    for bits in range(8):
        g = {
            "lang": (bits >> 2) & 1,
            "len": (bits >> 1) & 1,
            "tok": bits & 1,
        }
        score = round(
            sum(w[f][0] if g[f] else w[f][1] for f in ("lang", "len", "tok")),
            4,
        )
        dec = (
            "match"
            if score >= MATCH_T
            else ("possible" if score >= POSSIBLE_T else "non-match")
        )
        score_arms.append(f"WHEN {bits} THEN CAST({score!r} AS DOUBLE)")
        dec_arms.append(f"WHEN {bits} THEN '{dec}'")
    packed = "g_lang * 4 + g_len * 2 + g_tok"
    return (
        f"CASE {packed} {' '.join(score_arms)} END",
        f"CASE {packed} {' '.join(dec_arms)} END",
    )


def q_docs_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    score_sql, dec_sql = _score_case_sql()
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
    rec = (
        docs.select("doc_id", "lang", "n_chars", toks.alias("toks"))
        .where(F.size("toks") >= 4)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.array_distinct(F.slice("toks", 1, TOK_K)).alias("t50"),
            F.concat_ws(
                " ",
                F.element_at("toks", 1),
                F.element_at("toks", 2),
                F.element_at("toks", 3),
                F.element_at("toks", 4),
            ).alias("bk"),
        )
    )
    # one shuffle: per-block posting arrays, sorted so pairs come out
    # (a.doc_id < b.doc_id); BLOCK_CAP drops boilerplate mega-blocks
    blocks = (
        rec.groupBy("bk")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "lang", "n_chars", "t50"))
            ).alias("rs")
        )
        .where((F.size("rs") >= 2) & (F.size("rs") <= BLOCK_CAP))
    )
    pairs = (
        blocks.select(F.posexplode("rs").alias("_i", "ra"), F.col("rs"))
        .select(
            "ra",
            F.explode(
                F.slice(F.col("rs"), F.col("_i") + 2, F.size("rs"))
            ).alias("rb"),
        )
    )
    inter = F.size(F.array_intersect(F.col("ra.t50"), F.col("rb.t50")))
    union = F.size("ra.t50") + F.size("rb.t50") - inter
    gammas = pairs.select(
        F.col("ra.doc_id").alias("src_doc"),
        F.col("rb.doc_id").alias("dst_doc"),
        (F.col("ra.lang") == F.col("rb.lang")).cast("int").alias("g_lang"),
        (
            F.abs(F.col("ra.n_chars") - F.col("rb.n_chars")) * 20
            <= F.greatest(F.col("ra.n_chars"), F.col("rb.n_chars"))
        )
        .cast("int")
        .alias("g_len"),
        (10 * inter >= 6 * union).cast("int").alias("g_tok"),
    )
    # audit column: data-estimated u for the lang field (exact integer
    # sums over the 5-row lang histogram, one division at the end)
    u_hat = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("nl"))
        .agg(
            F.sum(F.col("nl") * (F.col("nl") - 1)).alias("num"),
            F.sum("nl").alias("nn"),
        )
        .select(
            F.round(
                F.col("num") * 1.0 / (F.col("nn") * (F.col("nn") - 1)), 6
            ).alias("u_lang_hat")
        )
    )
    return (
        gammas.withColumn("fs_score", F.expr(score_sql))
        .withColumn("decision", F.expr(dec_sql))
        .crossJoin(F.broadcast(u_hat))
        .orderBy("src_doc", "dst_doc")
    )


def _oracle_record_linkage() -> str:
    score_sql, dec_sql = _score_case_sql()
    return f"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents),
k AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(toks[1:{TOK_K}]) AS t50,
         concat_ws(' ', toks[1], toks[2], toks[3], toks[4]) AS bk
  FROM t WHERE len(toks) >= 4),
kept AS (
  SELECT * FROM k
  QUALIFY count(*) OVER (PARTITION BY bk) BETWEEN 2 AND {BLOCK_CAP}),
u AS (
  SELECT round(sum(nl * (nl - 1)) * 1.0
               / (sum(nl) * (sum(nl) - 1)), 6) AS u_lang_hat
  FROM (SELECT count(*) AS nl FROM documents GROUP BY lang)),
p AS (
  SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc,
         CAST(a.lang = b.lang AS INT) AS g_lang,
         CAST(abs(a.n_chars - b.n_chars) * 20
              <= greatest(a.n_chars, b.n_chars) AS INT) AS g_len,
         CAST(10 * len(list_intersect(a.t50, b.t50))
              >= 6 * (len(a.t50) + len(b.t50)
                      - len(list_intersect(a.t50, b.t50))) AS INT) AS g_tok
  FROM kept a JOIN kept b ON a.bk = b.bk AND a.doc_id < b.doc_id)
SELECT src_doc, dst_doc, g_lang, g_len, g_tok,
       {score_sql} AS fs_score,
       {dec_sql} AS decision,
       u.u_lang_hat
FROM p CROSS JOIN u
ORDER BY src_doc, dst_doc
"""


ORACLE_DOCS_RECORD_LINKAGE = _oracle_record_linkage()


# ---------------------------------------------------- blocking quality
# The two numbers every ER/dedup blocking scheme is judged by
# (Christen 2012): pair completeness PC = fraction of TRUE near-dup
# pairs the blocking co-blocks (recall of the candidate generator) and
# reduction ratio RR = 1 - candidates / all-pairs (how much of the
# quadratic it avoids). Ground truth here = the exact 3-gram-Jaccard
# near-dup pairs (docs_jaccard_pairs — itself oracle-checked), so the
# metric measures the FS prefix blocking against a content-similarity
# truth it does not see. On boilerplate-headed corpora (the sf1 stress
# generator) this query is the machine-readable form of the blocking
# degeneracy: PC collapses because BLOCK_CAP drops the mega-blocks —
# the measured argument for unioning a content-aware pass (SNM / LSH
# bands, both in this repo) into the candidate set.
#
# Determinism: every count is an exact integer; PC and RR are one
# token-identical division each, 6dp round, NULLIF-guarded.
#
# Scale shape: block sizes are ONE narrow shuffle; the truth table is
# the already-bucketed jaccard pair set (never all-pairs); the final
# row is a crossJoin of broadcast 1-row aggregates.
def q_docs_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deja_view_spark.queries_text import q_docs_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
    rec = (
        docs.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 4)
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at("toks", 1),
                F.element_at("toks", 2),
                F.element_at("toks", 3),
                F.element_at("toks", 4),
            ).alias("bk"),
        )
    )
    bsz = rec.groupBy("bk").agg(F.count("*").alias("s"))
    kept = bsz.where((F.col("s") >= 2) & (F.col("s") <= BLOCK_CAP))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    n_cand = kept.agg(
        F.expr(
            "CAST(coalesce(sum(s * (s - 1)), 0) DIV 2 AS BIGINT)"
        ).alias("n_cand_pairs")
    )
    n_drop = bsz.where(F.col("s") > BLOCK_CAP).agg(
        F.count("*").alias("n_blocks_dropped")
    )
    truth = q_docs_jaccard_pairs(spark, sf_dir).select("src_doc", "dst_doc")
    bka = rec.select(F.col("doc_id").alias("src_doc"), F.col("bk").alias("bk_a"))
    bkb = rec.select(F.col("doc_id").alias("dst_doc"), F.col("bk").alias("bk_b"))
    kflag = kept.select(F.col("bk").alias("bk_a"), F.lit(1).alias("kept_flag"))
    tc = (
        truth.join(bka, "src_doc", "left")
        .join(bkb, "dst_doc", "left")
        .join(kflag, "bk_a", "left")
        .agg(
            F.count("*").alias("n_true_pairs"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("bk_a") == F.col("bk_b"))
                        & (F.col("kept_flag") == 1),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_caught"),
        )
    )
    return (
        n_docs.crossJoin(F.broadcast(tc))
        .crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_drop))
        .select(
            "n_docs",
            "n_true_pairs",
            "n_cand_pairs",
            "n_caught",
            "n_blocks_dropped",
            F.round(
                F.col("n_caught") * 1.0 / F.nullif(F.col("n_true_pairs"), F.lit(0)),
                6,
            ).alias("pair_completeness"),
            F.round(
                1
                - F.col("n_cand_pairs")
                * 2.0
                / (F.col("n_docs") * (F.col("n_docs") - 1)),
                6,
            ).alias("reduction_ratio"),
        )
    )


def _oracle_blocking_quality() -> str:
    from deja_view_spark.queries_text import _JACCARD_CAND_SQL

    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents),
k AS (
  SELECT doc_id,
         concat_ws(' ', toks[1], toks[2], toks[3], toks[4]) AS bk
  FROM t WHERE len(toks) >= 4),
bsz AS (SELECT bk, count(*) AS s FROM k GROUP BY bk),
kept AS (SELECT bk, s FROM bsz WHERE s BETWEEN 2 AND {BLOCK_CAP}),
nd AS (SELECT count(*) AS n_docs FROM documents),
cand AS (
  SELECT CAST(coalesce(sum(s * (s - 1)), 0) // 2 AS BIGINT) AS n_cand_pairs
  FROM kept),
drp AS (
  SELECT count(*) AS n_blocks_dropped FROM bsz WHERE s > {BLOCK_CAP}),
truth AS (SELECT src_doc, dst_doc FROM ({_JACCARD_CAND_SQL})),
tc AS (
  SELECT count(*) AS n_true_pairs,
         CAST(coalesce(sum(CASE WHEN ka.bk = kb.bk AND kk.bk IS NOT NULL
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_caught
  FROM truth tr
  LEFT JOIN k ka ON tr.src_doc = ka.doc_id
  LEFT JOIN k kb ON tr.dst_doc = kb.doc_id
  LEFT JOIN kept kk ON ka.bk = kk.bk)
SELECT n_docs, n_true_pairs, n_cand_pairs, n_caught, n_blocks_dropped,
       round(n_caught * 1.0 / nullif(n_true_pairs, 0), 6)
         AS pair_completeness,
       round(1 - n_cand_pairs * 2.0 / (n_docs * (n_docs - 1)), 6)
         AS reduction_ratio
FROM nd CROSS JOIN tc CROSS JOIN cand CROSS JOIN drp
"""


ORACLE_DOCS_BLOCKING_QUALITY = _oracle_blocking_quality()


# ------------------------------------------------- multi-pass linkage
# The production answer to the blocking degeneracy docs_blocking_quality
# measures: UNION two independent blocking passes — the prefix key and
# the two-pass sorted-neighborhood windows (Hernandez-Stolfo multi-pass
# merge/purge, exactly as the original paper prescribes) — then score
# every candidate once with the same FS model. Per-pair provenance
# flags (via_prefix / via_snm) make the union auditable: on the oracle
# corpus most pairs carry both flags; on boilerplate-headed corpora
# (the sf1 stress generator) the prefix flag vanishes and SNM carries
# the recall.
#
# Scale shape: each pass keeps its own bound (capped posting arrays /
# O(n·w) windows); the union dedups on fixed-width (long, long) keys;
# gammas need two hash joins back to the node-sized field table; score
# is the same literal CASE.
def q_docs_record_linkage_multi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from deja_view_spark.queries_corpus import sn_candidate_pairs

    score_sql, dec_sql = _score_case_sql()
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
    base = docs.select(
        "doc_id", "lang", "n_chars", toks.alias("toks")
    ).where(F.size("toks") >= 1)
    # pass 1: capped prefix blocks (docs with >= 4 tokens)
    rec4 = base.where(F.size("toks") >= 4).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at("toks", 1),
            F.element_at("toks", 2),
            F.element_at("toks", 3),
            F.element_at("toks", 4),
        ).alias("bk"),
    )
    blocks = (
        rec4.groupBy("bk")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= BLOCK_CAP))
    )
    pp = (
        blocks.select(F.posexplode("ids").alias("_i", "src_doc"), F.col("ids"))
        .select(
            "src_doc",
            F.explode(
                F.slice(F.col("ids"), F.col("_i") + 2, F.size("ids"))
            ).alias("dst_doc"),
        )
        .select(
            "src_doc",
            "dst_doc",
            F.lit(1).alias("vp"),
            F.lit(0).alias("vs"),
        )
    )
    # pass 2: sorted-neighborhood windows (any token count)
    snm = sn_candidate_pairs(
        base.select("doc_id", F.col("toks").alias("tk"))
    ).select(
        "src_doc", "dst_doc", F.lit(0).alias("vp"), F.lit(1).alias("vs")
    )
    u = (
        pp.unionByName(snm)
        .groupBy("src_doc", "dst_doc")
        .agg(
            F.max("vp").cast("int").alias("via_prefix"),
            F.max("vs").cast("int").alias("via_snm"),
        )
    )
    fields = base.select(
        "doc_id",
        "lang",
        "n_chars",
        F.array_distinct(F.slice("toks", 1, TOK_K)).alias("t50"),
    )
    fa = fields.select(
        F.col("doc_id").alias("src_doc"),
        F.col("lang").alias("lang_a"),
        F.col("n_chars").alias("nc_a"),
        F.col("t50").alias("t50_a"),
    )
    fb = fields.select(
        F.col("doc_id").alias("dst_doc"),
        F.col("lang").alias("lang_b"),
        F.col("n_chars").alias("nc_b"),
        F.col("t50").alias("t50_b"),
    )
    inter = F.size(F.array_intersect("t50_a", "t50_b"))
    union = F.size("t50_a") + F.size("t50_b") - inter
    gammas = (
        u.join(fa, "src_doc")
        .join(fb, "dst_doc")
        .select(
            "src_doc",
            "dst_doc",
            "via_prefix",
            "via_snm",
            (F.col("lang_a") == F.col("lang_b")).cast("int").alias("g_lang"),
            (
                F.abs(F.col("nc_a") - F.col("nc_b")) * 20
                <= F.greatest(F.col("nc_a"), F.col("nc_b"))
            )
            .cast("int")
            .alias("g_len"),
            (10 * inter >= 6 * union).cast("int").alias("g_tok"),
        )
    )
    return (
        gammas.withColumn("fs_score", F.expr(score_sql))
        .withColumn("decision", F.expr(dec_sql))
        .orderBy("src_doc", "dst_doc")
    )


def _oracle_record_linkage_multi() -> str:
    from deja_view_spark.queries_corpus import SN_CAND_SQL

    score_sql, dec_sql = _score_case_sql()
    return f"""
WITH {SN_CAND_SQL},
k AS (
  SELECT doc_id,
         concat_ws(' ', toks[1], toks[2], toks[3], toks[4]) AS bk
  FROM t WHERE len(toks) >= 4),
kb AS (
  SELECT * FROM k
  QUALIFY count(*) OVER (PARTITION BY bk) BETWEEN 2 AND {BLOCK_CAP}),
pp AS (
  SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc
  FROM kb a JOIN kb b ON a.bk = b.bk AND a.doc_id < b.doc_id),
u AS (
  SELECT src_doc, dst_doc,
         CAST(max(vp) AS INT) AS via_prefix,
         CAST(max(vs) AS INT) AS via_snm
  FROM (
    SELECT src_doc, dst_doc, 1 AS vp, 0 AS vs FROM pp
    UNION ALL
    SELECT src_doc, dst_doc, 0 AS vp, 1 AS vs FROM cand)
  GROUP BY 1, 2),
f AS (
  SELECT t.doc_id, d.lang, d.n_chars,
         list_distinct(toks[1:{TOK_K}]) AS t50
  FROM t JOIN documents d USING (doc_id)),
p AS (
  SELECT u.src_doc, u.dst_doc, u.via_prefix, u.via_snm,
         CAST(a.lang = b.lang AS INT) AS g_lang,
         CAST(abs(a.n_chars - b.n_chars) * 20
              <= greatest(a.n_chars, b.n_chars) AS INT) AS g_len,
         CAST(10 * len(list_intersect(a.t50, b.t50))
              >= 6 * (len(a.t50) + len(b.t50)
                      - len(list_intersect(a.t50, b.t50))) AS INT) AS g_tok
  FROM u
  JOIN f a ON u.src_doc = a.doc_id
  JOIN f b ON u.dst_doc = b.doc_id)
SELECT src_doc, dst_doc, via_prefix, via_snm, g_lang, g_len, g_tok,
       {score_sql} AS fs_score,
       {dec_sql} AS decision
FROM p
ORDER BY src_doc, dst_doc
"""


ORACLE_DOCS_RECORD_LINKAGE_MULTI = _oracle_record_linkage_multi()

QUERIES = {
    "docs_record_linkage": q_docs_record_linkage,
    "docs_blocking_quality": q_docs_blocking_quality,
    "docs_record_linkage_multi": q_docs_record_linkage_multi,
}
ORACLES = {
    "docs_record_linkage": ORACLE_DOCS_RECORD_LINKAGE,
    "docs_blocking_quality": ORACLE_DOCS_BLOCKING_QUALITY,
    "docs_record_linkage_multi": ORACLE_DOCS_RECORD_LINKAGE_MULTI,
}


# ------------------------------------------------- threshold sweep (OC)
# The Fellegi-Sunter OPERATING-CHARACTERISTIC table — what an ER
# practitioner actually tunes MATCH_T / POSSIBLE_T against: one row
# per gamma cell (there are only 2^3), carrying the cell's exact pair
# count, its python-literal FS score, the decision it currently gets,
# and the CUMULATIVE pairs that a threshold set at this score would
# declare matches (descending-score running sum — over ≤8 rows, the
# metadata-sized window argument). Pure integers plus the same score
# literals both engines already share; composes q_docs_record_linkage
# unchanged, so the sweep can never drift from the pairer it tunes.
def q_docs_linkage_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    pairs = q_docs_record_linkage(spark, sf_dir)
    cells = pairs.groupBy(
        "g_lang", "g_len", "g_tok", "fs_score", "decision"
    ).agg(F.count("*").alias("n_pairs"))
    w = (
        Window.orderBy(F.desc("fs_score"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.select(
            "g_lang",
            "g_len",
            "g_tok",
            "fs_score",
            "decision",
            "n_pairs",
            F.sum("n_pairs").over(w).alias("cum_matches_at_threshold"),
        )
        .orderBy(F.desc("fs_score"))
    )


def _oracle_linkage_sweep() -> str:
    inner = _oracle_record_linkage().replace("ORDER BY src_doc, dst_doc", "")
    return f"""
WITH pairs AS ({inner}),
cells AS (
  SELECT g_lang, g_len, g_tok, fs_score, decision, count(*) AS n_pairs
  FROM pairs GROUP BY 1, 2, 3, 4, 5)
SELECT g_lang, g_len, g_tok, fs_score, decision, n_pairs,
       CAST(sum(n_pairs) OVER (ORDER BY fs_score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_matches_at_threshold
FROM cells
ORDER BY fs_score DESC
"""


ORACLE_DOCS_LINKAGE_SWEEP = _oracle_linkage_sweep()

QUERIES["docs_linkage_sweep"] = q_docs_linkage_sweep
ORACLES["docs_linkage_sweep"] = ORACLE_DOCS_LINKAGE_SWEEP
