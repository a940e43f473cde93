"""Training-corpus preparation queries (driver-checkable).

The operators a pre-training data pipeline runs between "raw crawl"
and "training shards", each as a (spark_fn, oracle_sql) pair over the
driver's parquet views — extending the dedup/similarity/text-analysis
families (queries_text.py) with the layout/selection steps:

  docs_stratified_sample  deterministic per-language hash sampling
  docs_pack_shards        token-budget shard packing (distributed
                          prefix sum, operators/packing.py)
  docs_tfidf_topterms     per-document top-k TF-IDF terms
  docs_decontaminate      eval-set n-gram contamination scan
  corpus_clean            the composed end-to-end cleaning pipeline

Oracle-parity discipline (house rule, queries_text.py): thresholds,
rates and keyword lists live ONCE as module constants and are rendered
into both the Spark expressions and the DuckDB SQL; md5 is the
cross-engine deterministic hash; floats are rounded before emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deja_view_spark.operators.packing import pack_shards, shard_manifest
from deja_view_spark.queries_text import (
    TOKEN_RE,
    _shingle_col,
    _shingles_from_toks,
)
from deja_view_spark.sources.catalog import load_table

# --------------------------------------------------------------- constants
# Per-language keep rates: downsample the over-represented language,
# keep the tail (the usual pre-training rebalancing move). A document
# is kept iff the first 16 bits of md5("strat:<doc_id>") fall under
# rate * 2^16 — deterministic across engines, partitionings and runs
# (NOT rand()/sample(): those depend on partition layout).
SAMPLE_RATES = {"en": 0.35, "de": 0.7, "es": 0.7, "fr": 0.7, "zh": 0.7}
_SALT = "strat"

SHARD_BUDGET = 2500  # tokens per training shard (greedy, no doc split)

TFIDF_TOP_K = 3

EVAL_MOD = 97        # doc_id % 97 == 0 -> held-out eval document
DECON_MIN_OVERLAP = 3  # shared 3-gram shingles to call contamination

MIN_TOKENS = 20          # quality gate: drop ultra-short docs
MIN_DISTINCT_RATIO = 0.3  # quality gate: drop degenerate repetition


def _hex_threshold(rate: float) -> str:
    """rate in [0,1] -> 4-hex-digit cutoff for substr(md5(..),1,4)."""
    return format(min(int(rate * 65536), 65535), "04x")


def _spark_keep(doc_id_col, lang_col):
    """Deterministic keep-predicate: hex-prefix of md5 under the
    language's rate cutoff (lexicographic compare == numeric compare
    for fixed-width lowercase hex)."""
    h4 = F.substring(
        F.md5(F.concat_ws(":", F.lit(_SALT), doc_id_col.cast("string"))), 1, 4
    )
    expr = F.lit(False)
    for lang, rate in SAMPLE_RATES.items():
        expr = F.when(
            lang_col == lang, h4 < F.lit(_hex_threshold(rate))
        ).otherwise(expr)
    return expr


def _sql_keep(doc_id: str, lang: str) -> str:
    cases = " ".join(
        f"WHEN {lang} = '{lg}' THEN "
        f"substr(md5(concat_ws(':', '{_SALT}', {doc_id}::VARCHAR)), 1, 4)"
        f" < '{_hex_threshold(rate)}'"
        for lg, rate in SAMPLE_RATES.items()
    )
    return f"(CASE {cases} ELSE FALSE END)"


_SQL_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
_SQL_SHINGLES = f"""
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 2),
                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
  WHERE len(toks) >= 3
"""


# ------------------------------------------------- stratified hash sampling
def q_docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling: per-language keep
    rates applied via a salted md5 hash of the document id.

    Scale shape: pure map-side predicate — no shuffle, no rand() (whose
    output depends on partition layout), no driver state; the sample is
    reproducible row-for-row at any parallelism and composes with
    partition pruning (the filter sits on the scan). Rebalances the
    reference corpus's language skew the way pre-training mixes do."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(_spark_keep(F.col("doc_id"), F.col("lang")))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_sql_keep('doc_id', 'lang')}
ORDER BY doc_id
"""


# --------------------------------------------------- token-budget packing
def q_docs_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget shard packing over the corpus in doc_id
    order (operators/packing.py: two-phase distributed prefix sum —
    the full-data window is bucket-partitioned, the single-partition
    window only ever sees per-bucket totals). Emits the shard manifest
    (count, token total, doc range per shard)."""
    docs = load_table(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias(
            "n_tokens"
        ),
    )
    packed = pack_shards(
        weighted, budget=SHARD_BUDGET, weight_col="n_tokens",
        order_col="doc_id", bucket_width=256,
    )
    return shard_manifest(packed, weight_col="n_tokens")


ORACLE_PACK_SHARDS = f"""
WITH w AS (
  SELECT doc_id, len({_SQL_TOKS}) AS n_tokens FROM documents),
packed AS (
  SELECT doc_id, n_tokens,
         CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / {SHARD_BUDGET}) AS BIGINT) AS shard_id
  FROM w)
SELECT shard_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM packed
GROUP BY shard_id
ORDER BY shard_id
"""


# ------------------------------------------------------- TF-IDF top terms
def q_docs_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (keyword extraction): term
    frequency from one explode, document frequency from the same
    grouped table, idf = ln(N / df).

    Scale shape: both aggregations shuffle on the term (fine-grained
    key, no skew beyond stopword terms, which df itself bounds); the
    corpus size N rides a broadcast single-row aggregate, never a
    driver collect; ranking is a per-document window. Ties rank by
    (rounded score desc, term asc) in both engines so the emitted rows
    are deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 4)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    )


ORACLE_TFIDF_TOPTERMS = f"""
WITH tf AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
tfc AS (
  SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
dfc AS (
  SELECT term, count(*) AS df FROM tfc GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, tfc.term,
         round(tf * ln(n * 1.0 / df), 4) AS tfidf
  FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN n)
SELECT doc_id, term, tfidf, rank FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored) t
WHERE rank <= {TFIDF_TOP_K}
ORDER BY doc_id, rank
"""


# ------------------------------------------- eval-set decontamination scan
def q_docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag corpus documents sharing >=
    {DECON_MIN_OVERLAP} 3-gram shingles with any held-out eval document
    (eval set := doc_id % {EVAL_MOD} == 0 — the benchmark split).

    Scale shape: the eval side is always small (benchmarks are
    thousands of docs, the corpus is billions), so its distinct
    shingle set is BROADCAST and the scan is one map-side join over
    the corpus shingles — no corpus-side shuffle at all until the
    tiny per-pair aggregate. The analog with a large eval set is the
    hashed-shingle equi-join of docs_jaccard_pairs."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(_shingle_col(F.col("text")))).alias("sh")
    )
    eval_sh = (
        sh.where(F.col("doc_id") % EVAL_MOD == 0)
        .withColumnRenamed("doc_id", "eval_doc")
    )
    hits = (
        sh.join(F.broadcast(eval_sh), "sh")
        .where(F.col("doc_id") != F.col("eval_doc"))
        .groupBy("doc_id", "eval_doc")
        .agg(F.count("*").alias("overlap"))
        .where(F.col("overlap") >= DECON_MIN_OVERLAP)
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_eval_hits"),
            F.max("overlap").alias("max_overlap"),
        )
        .orderBy("doc_id")
    )


ORACLE_DECONTAMINATE = f"""
WITH s AS ({_SQL_SHINGLES}),
ev AS (SELECT doc_id AS eval_doc, sh FROM s WHERE doc_id % {EVAL_MOD} = 0),
hits AS (
  SELECT s.doc_id, ev.eval_doc, count(*) AS overlap
  FROM s JOIN ev ON s.sh = ev.sh AND s.doc_id <> ev.eval_doc
  GROUP BY 1, 2
  HAVING count(*) >= {DECON_MIN_OVERLAP})
SELECT doc_id, count(*) AS n_eval_hits, max(overlap) AS max_overlap
FROM hits
GROUP BY doc_id
ORDER BY doc_id
"""


# ------------------------------------------------ composed cleaning pipeline
def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-prep pipeline, raw docs -> per-(lang, source)
    surviving stats, chaining the families above in the order a real
    pre-training pipeline runs them:

      1. quality gate   (>= {MIN_TOKENS} tokens, distinct-token ratio
                         > {MIN_DISTINCT_RATIO})
      2. exact dedup    (md5 of full text, keep lowest doc_id)
      3. eval split     (drop eval docs AND docs contaminated against
                         them, >= {DECON_MIN_OVERLAP} shared shingles)
      4. stratified sample (per-language md5 keep rates)

    Every stage is deterministic + map-side or narrowly-shuffled (see
    the individual queries for the per-stage scale shapes); the output
    is the per-(lang, source) document/token census of the surviving
    corpus — what you'd log before launching a training run."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE tokenize pass: Catalyst does not CSE a regexp_extract_all
    # repeated across output columns, so materialize the token array in
    # a projection and derive counts + shingles from it
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
    base = docs.select(
        "doc_id", "lang", "source", "text", toks.alias("_toks")
    ).select(
        "doc_id", "lang", "source", "text",
        F.size("_toks").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).alias("n_distinct"),
        F.array_distinct(_shingles_from_toks(F.col("_toks"))).alias("_sh"),
    )
    quality = base.where(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_distinct") / F.col("n_tokens") > MIN_DISTINCT_RATIO)
    )
    wdup = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    deduped = (
        quality.withColumn("_rn", F.row_number().over(wdup))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    sh = deduped.select("doc_id", F.explode("_sh").alias("sh"))
    # contamination screened against the FULL corpus's eval docs (the
    # eval split exists independently of quality filtering); the eval
    # side re-derives shingles only for the tiny doc_id%MOD slice
    all_sh = docs.where(F.col("doc_id") % EVAL_MOD == 0).select(
        "doc_id", F.explode(F.array_distinct(_shingle_col(F.col("text")))).alias("sh")
    )
    eval_sh = all_sh.withColumnRenamed("doc_id", "eval_doc")
    contaminated = (
        sh.join(F.broadcast(eval_sh), "sh")
        .where(F.col("doc_id") != F.col("eval_doc"))
        .groupBy("doc_id", "eval_doc")
        .agg(F.count("*").alias("overlap"))
        .where(F.col("overlap") >= DECON_MIN_OVERLAP)
        .select("doc_id")
        .distinct()
    )
    clean = (
        deduped.where(F.col("doc_id") % EVAL_MOD != 0)
        .join(contaminated, "doc_id", "left_anti")
        .where(_spark_keep(F.col("doc_id"), F.col("lang")))
    )
    return (
        clean.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang", "source")
    )


ORACLE_CORPUS_CLEAN = f"""
WITH base AS (
  SELECT doc_id, lang, source, text,
         len({_SQL_TOKS}) AS n_tokens,
         len(list_distinct({_SQL_TOKS})) AS n_distinct
  FROM documents),
quality AS (
  SELECT * FROM base
  WHERE n_tokens >= {MIN_TOKENS}
    AND n_distinct * 1.0 / n_tokens > {MIN_DISTINCT_RATIO}),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text)
                                 ORDER BY doc_id) AS _rn
    FROM quality) t
  WHERE _rn = 1),
s AS ({_SQL_SHINGLES}),
ev AS (SELECT doc_id AS eval_doc, sh FROM s WHERE doc_id % {EVAL_MOD} = 0),
contaminated AS (
  SELECT DISTINCT s.doc_id
  FROM (SELECT * FROM s WHERE doc_id IN (SELECT doc_id FROM deduped)) s
  JOIN ev ON s.sh = ev.sh AND s.doc_id <> ev.eval_doc
  GROUP BY s.doc_id, ev.eval_doc
  HAVING count(*) >= {DECON_MIN_OVERLAP}),
clean AS (
  SELECT * FROM deduped
  WHERE doc_id % {EVAL_MOD} <> 0
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND {_sql_keep('doc_id', 'lang')})
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM clean
GROUP BY lang, source
ORDER BY lang, source
"""


QUERIES = {
    "docs_stratified_sample": q_docs_stratified_sample,
    "docs_pack_shards": q_docs_pack_shards,
    "docs_tfidf_topterms": q_docs_tfidf_topterms,
    "docs_decontaminate": q_docs_decontaminate,
    "corpus_clean": q_corpus_clean,
}

ORACLES = {
    "docs_stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "docs_pack_shards": ORACLE_PACK_SHARDS,
    "docs_tfidf_topterms": ORACLE_TFIDF_TOPTERMS,
    "docs_decontaminate": ORACLE_DECONTAMINATE,
    "corpus_clean": ORACLE_CORPUS_CLEAN,
}
