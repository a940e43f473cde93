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

import os

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
# Max eval-split size (docs) the decontamination scan will broadcast.
# The synthetic split is a fixed FRACTION of the corpus (1/97), so a
# blind broadcast grows with corpus size and would OOM executors at
# 100 TB; past this bound the scan falls back to the hashed shingle
# equi-join (the docs_jaccard_pairs discipline). Real eval sets are
# fixed-size (thousands of docs) and stay on the broadcast path.
DECON_BROADCAST_MAX_EVAL_DOCS = 100_000

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
def _hashed_shingle_explode(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) with sh = xxhash64 of each distinct 3-token
    shingle, built straight from the token array — no shingle STRINGS
    are ever materialized (no concat_ws, bigint array_distinct, 8-byte
    join/shuffle keys). Set semantics match the string form exactly
    modulo xxhash64 collisions (~n²/2^65 per doc-pair — ~1e-8 at 50k
    docs; measured equal output row-for-row on the 50k stress corpus,
    both join paths)."""
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
    idx = F.sequence(F.lit(1), F.size(toks) - 2)
    shs = F.transform(
        idx,
        lambda i: F.xxhash64(
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )
    arr = F.when(F.size(toks) >= 3, shs).otherwise(
        F.array().cast("array<bigint>")
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(arr)).alias("sh")
    )


def q_docs_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    broadcast_max_eval_docs: int = DECON_BROADCAST_MAX_EVAL_DOCS,
    eval_docs: int | None = None,
    hash_keys: bool = True,
) -> DataFrame:
    """Test-set decontamination: flag corpus documents sharing >=
    {DECON_MIN_OVERLAP} 3-gram shingles with any held-out eval document
    (eval set := doc_id % {EVAL_MOD} == 0 — the benchmark split).

    Scale shape: SIZE-GATED. Real eval sets are small (benchmarks are
    thousands of docs, the corpus is billions), so when the split
    holds <= broadcast_max_eval_docs documents its shingle set is
    BROADCAST and the scan is one map-side join over the corpus
    shingles — no corpus-side shuffle at all until the tiny per-pair
    aggregate. The synthetic split here is a corpus FRACTION (1/97),
    so past the bound the plan switches to the hashed shingle
    equi-join (the docs_jaccard_pairs discipline): both sides shuffle
    on `sh`, nothing data-sized reaches the driver or the broadcast
    exchange.

    The gate is JOB-FREE (round-5 ADVICE fix — building the
    DataFrame used to run an eager pruned count, breaking the lazy
    registry contract for plan-only consumers like explain_audit):
    callers that know their eval-set size pass `eval_docs`; otherwise
    the gate reads the parquet FOOTER row count of `documents`
    driver-side (pyarrow, milliseconds, no Spark job) — a sound
    upper bound on the eval split (eval ⊆ docs), so `total <= bound`
    proves the broadcast safe. A corpus past the bound whose eval
    split is still small lands on the (safe, slower) hashed join
    unless `eval_docs` says otherwise; only if the footers are
    unreadable does the gate fall back to the old pruned count.

    `hash_keys` (default True, round-5): join on xxhash64 shingle
    hashes instead of shingle strings — the overlap count is a
    distinct-set size either way, and hashing drops the string
    build + string-keyed probe (measured at 50k docs, interleaved:
    broadcast path 19.4-24.7s -> 17.9s; shuffle fallback
    27.4-35.2s -> 26.1s; outputs row-identical on both paths). At
    census scale the fallback's shuffle rows go from ~30-byte
    strings to 16 bytes — the docs_span_dedup(hash_only) shape.
    False restores exact string keys (the oracle's literal form)."""
    docs = load_table(spark, sf_dir, "documents")
    if hash_keys:
        sh = _hashed_shingle_explode(docs)
    else:
        sh = docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(_shingle_col(F.col("text")))
            ).alias("sh"),
        )
    eval_sh = (
        sh.where(F.col("doc_id") % EVAL_MOD == 0)
        .withColumnRenamed("doc_id", "eval_doc")
    )
    if eval_docs is not None:
        eval_bound = eval_docs
    else:
        try:
            import pyarrow.dataset as _pads

            eval_bound = _pads.dataset(
                os.path.join(sf_dir, "documents.parquet"),
                format="parquet",
            ).count_rows()
        except Exception:
            eval_bound = (
                docs.where(F.col("doc_id") % EVAL_MOD == 0).count()
            )
    if eval_bound <= broadcast_max_eval_docs:
        eval_side = F.broadcast(eval_sh)
    else:
        # hashed equi-join on sh: pin shuffle-hash so the planner can
        # never auto-broadcast a side we just measured as oversized
        # (its size ESTIMATE post-filter can still look broadcastable)
        eval_side = eval_sh.hint("shuffle_hash")
    hits = (
        sh.join(eval_side, "sh")
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


# ------------------------------------------------- line-level dedup (CCNet)
# CCNet-style segment-level deduplication: hash every text segment,
# count how many DISTINCT documents each segment appears in, and flag
# segments above the document-frequency cutoff as boilerplate. The
# corpus ships newline-free text, so "lines" are deterministic
# fixed-width token windows (LINE_W tokens, non-overlapping); on a real
# crawl the segmenter is split('\n') and everything downstream is
# identical. A document whose duplicated-segment fraction exceeds
# DOC_DUP_FRAC is dropped (the doc-level consequence CCNet applies
# after paragraph dedup).
LINE_W = 8        # tokens per segment
LINE_DF = 2       # segment in >= this many distinct docs -> duplicated
DOC_DUP_FRAC = 0.5  # drop docs with more than half their segments duplicated


def q_docs_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level (segment) dedup census: per document, how many of its
    {LINE_W}-token segments are corpus-wide boilerplate (present in >=
    {LINE_DF} distinct docs), and the resulting keep/drop decision.

    Scale shape: segments shuffle as xxhash64 longs, never strings —
    one aggregation keyed on the segment hash computes document
    frequency (countDistinct doc), one long-keyed equi-join carries df
    back to the per-(doc, segment) stream, one final per-doc
    aggregation. No window over the corpus, no driver state; both
    aggregations are partial-agg friendly. A hash collision
    (~#segments²/2⁶⁴) could merge two segments; the DuckDB oracle
    joins on the raw segment string, so the green hash doubles as a
    no-collision witness at test scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
    nseg = F.ceil(F.size("toks") / LINE_W).cast("int")
    # guard size==0: Spark's sequence(1,0) yields DESCENDING [1,0]
    idx = F.when(F.size("toks") > 0, F.sequence(F.lit(1), nseg)).otherwise(
        F.array().cast("array<int>")
    )
    segs = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(
                        " ", F.slice("toks", (i - 1) * LINE_W + 1, LINE_W)
                    ),
                )
            ).alias("seg"),
        )
        .select("doc_id", F.xxhash64("seg").alias("h"))
    )
    df_ = segs.groupBy("h").agg(F.countDistinct("doc_id").alias("df"))
    per_doc = (
        segs.join(df_, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segs"),
            F.sum((F.col("df") >= LINE_DF).cast("long")).alias("n_dup_segs"),
        )
        .withColumn(
            "dup_frac", F.round(F.col("n_dup_segs") / F.col("n_segs"), 4)
        )
        .withColumn("keep", F.col("dup_frac") <= DOC_DUP_FRAC)
    )
    return per_doc.select(
        "doc_id", "n_segs", "n_dup_segs", "dup_frac", "keep"
    ).orderBy("doc_id")


ORACLE_LINE_DEDUP = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
segs AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, CAST(ceil(len(toks) / {LINE_W}.0) AS INT)),
           i -> array_to_string(
                  list_slice(toks, (i - 1) * {LINE_W} + 1, i * {LINE_W}),
                  ' '))) AS seg
  FROM t WHERE len(toks) > 0),
df AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
SELECT doc_id,
       count(*) AS n_segs,
       CAST(sum(CASE WHEN df >= {LINE_DF} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_segs,
       round(sum(CASE WHEN df >= {LINE_DF} THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS dup_frac,
       (sum(CASE WHEN df >= {LINE_DF} THEN 1 ELSE 0 END) * 1.0 / count(*)
        <= {DOC_DUP_FRAC}) AS keep
FROM segs JOIN df USING (seg)
GROUP BY doc_id
ORDER BY doc_id
"""


# ----------------------------------------- KMV distinct-count sketch
# K-minimum-values sketch: the K smallest hash values of a set
# determine an unbiased distinct-count estimate D ~ (K-1)/r_K where
# r_K is the K-th minimum normalized to [0,1]. Unlike
# approx_count_distinct (whose HLL is engine-specific), KMV over a
# shared hash (md5) is DETERMINISTIC and cross-engine reproducible, so
# the estimate itself carries a full value-hash oracle. Estimated set:
# distinct 3-gram shingles per language.
KMV_K = 64
# Map-side pre-filter: only hashes with first hex digit < '4' (top 2
# bits zero, p = 1/4) survive to the shuffle. The K-th minimum is far
# below the cutoff whenever distinct >> K/p, so the estimate is
# unchanged; the shuffle carries ~p of the distinct values instead of
# all of them. Groups with fewer than K survivors fall back to the
# plain hash-sampling estimate survivors/p (deterministic too).
KMV_PREFILTER = "4"  # hex prefix cutoff, keep h < '4...'
KMV_INV_P = 4
_HEX60 = 1 << 60  # first 15 hex digits of md5 -> 60-bit integer


def _sql_hex60(col: str) -> str:
    """DuckDB: numeric value of the first 15 hex digits of ``col``
    (md5 hex string) — digit-positional sum, BIGINT-safe (< 2^60)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({col}, {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}::BIGINT"
        for i in range(15)
    )
    return f"({terms})"


def q_docs_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-shingle cardinality estimate via a
    K-minimum-values sketch (K={KMV_K}, md5 as the shared hash).

    Scale shape: the hash + pre-filter are map-side (only ~1/{KMV_INV_P}
    of distinct shingle hashes reach the shuffle); the distinct and the
    per-language top-K window then run over that thin slice — the
    full-corpus distinct set is never shuffled, which is the entire
    point of the sketch. The estimate arithmetic is integer-only
    ((K-1)·2^60 DIV value, DECIMAL(38,0) intermediate), so both engines
    agree bit-for-bit — no float division in the output."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "lang", F.explode(F.array_distinct(_shingle_col(F.col("text")))).alias("sh")
    )
    hashed = (
        sh.select("lang", F.md5("sh").alias("h"))
        .where(F.col("h") < KMV_PREFILTER)
        .distinct()
    )
    w = Window.partitionBy("lang").orderBy("h")
    topk = hashed.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= KMV_K
    )
    agg = topk.groupBy("lang").agg(
        F.max("rk").alias("n_seen"), F.max("h").alias("kth_hash")
    )
    est = F.when(
        F.col("n_seen") >= KMV_K,
        F.expr(
            f"CAST(CAST({(KMV_K - 1) * _HEX60} AS DECIMAL(38,0))"
            f" DIV CAST(conv(substr(kth_hash, 1, 15), 16, 10) AS DECIMAL(38,0))"
            " AS BIGINT)"
        ),
    ).otherwise(F.col("n_seen").cast("long") * KMV_INV_P)
    return (
        agg.select(
            "lang",
            F.col("n_seen").cast("int").alias("n_seen"),
            "kth_hash",
            est.alias("est_distinct"),
        )
        .orderBy("lang")
    )


ORACLE_KMV_DISTINCT = f"""
WITH s AS (
  SELECT DISTINCT lang,
         unnest(list_transform(generate_series(1, len(toks) - 2),
                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
  FROM (SELECT lang, {_SQL_TOKS} AS toks FROM documents)
  WHERE len(toks) >= 3),
hashed AS (
  SELECT DISTINCT lang, md5(sh) AS h FROM s WHERE md5(sh) < '{KMV_PREFILTER}'),
topk AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rk
  FROM hashed QUALIFY rk <= {KMV_K}),
agg AS (
  SELECT lang, max(rk) AS n_seen, max(h) AS kth_hash FROM topk GROUP BY lang)
SELECT lang, CAST(n_seen AS INT) AS n_seen, kth_hash,
       CAST(CASE WHEN n_seen >= {KMV_K}
                 THEN {(KMV_K - 1) * _HEX60}::HUGEINT
                      // {_sql_hex60('kth_hash')}::HUGEINT
                 ELSE n_seen * {KMV_INV_P} END AS BIGINT) AS est_distinct
FROM agg
ORDER BY lang
"""


# --------------------------------------- HyperLogLog distinct (dense)
# Flajolet-Fusy-Gandouet-Meunier 2007 dense HLL over the same 3-gram
# shingle stream the KMV sketch estimates — the two sketches audit
# each other on one surface. Same md5 shared hash: the first 15 hex
# digits give a 60-bit integer; the low HLL_P bits pick a register and
# the remaining HLL_W bits feed the leading-zero rank. Everything
# cross-engine-exact by construction:
#   * rho is an integer CASE chain over power-of-two thresholds — no
#     log2() float (whose last-ulp could differ between engines);
#   * the harmonic register sum is kept as a *scaled integer*
#     sum(2^(W+1-mr)) (+ 2^(W+1) per empty register), so both engines
#     produce the identical BIGINT and one identical IEEE division
#     yields the raw estimate;
#   * the linear-counting branch (the only transcendental, ln) only
#     fires for tiny cardinalities and the output is rounded to 4dp.
# Scale shape: two cascaded groupBys with full map-side combine — the
# shuffle carries at most (#groups x HLL_M) register rows, never the
# shingle stream; the exact countDistinct exists to audit the sketch
# at registry scale and is dropped at 100 TB, where the register table
# (256 longs per group) IS the mergeable state.
HLL_P = 8
HLL_M = 1 << HLL_P   # 256 registers
HLL_W = 60 - HLL_P   # 52 value bits per hash
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha * m^2, pre-scaled by 2^(W+1) to cancel the integer sum's scale
_HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W + 1))
_HLL_LC_CUT = 2.5 * HLL_M  # raw-estimate cutoff for linear counting


def _hll_rho(v):
    """1 + leading-zero count of ``v`` within a HLL_W-bit field, as a
    first-match-wins threshold chain (integer-exact in both engines)."""
    cond = F.when(v >= (1 << (HLL_W - 1)), 1)
    for k in range(HLL_W - 2, -1, -1):
        cond = cond.when(v >= (1 << k), HLL_W - k)
    return cond.otherwise(HLL_W + 1)


def q_docs_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-shingle cardinality via dense HLL
    (m={HLL_M}), audited against the exact count. Compare with
    ``docs_kmv_distinct``: same input stream, different sketch."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "lang", F.explode(F.array_distinct(_shingle_col(F.col("text")))).alias("sh")
    )
    h = F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long")
    hv = sh.select(
        "lang",
        (h % HLL_M).alias("reg"),
        _hll_rho(F.shiftright(h, HLL_P)).alias("rho"),
    )
    regs = hv.groupBy("lang", "reg").agg(F.max("rho").alias("mr"))
    agg = regs.groupBy("lang").agg(
        F.count("*").alias("cnt"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_W + 1} - mr)")).alias("s_hit"),
    )
    exact = sh.groupBy("lang").agg(
        F.countDistinct("sh").alias("exact_distinct")
    )
    zero = HLL_M - F.col("cnt")
    s_int = F.col("s_hit") + zero.cast("long") * F.lit(1 << (HLL_W + 1))
    raw = F.lit(_HLL_NUM) / s_int.cast("double")
    est = F.when(
        (raw <= F.lit(_HLL_LC_CUT)) & (zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zero.cast("double")),
    ).otherwise(raw)
    return (
        agg.join(F.broadcast(exact), "lang")
        .select(
            "lang",
            F.col("cnt").cast("int").alias("registers_hit"),
            zero.cast("int").alias("zero_registers"),
            F.round(est, 4).alias("hll_est"),
            "exact_distinct",
            F.round(
                (est - F.col("exact_distinct")) / F.col("exact_distinct") * 100,
                4,
            ).alias("rel_err_pct"),
        )
        .orderBy("lang")
    )


def _oracle_hll_distinct() -> str:
    whens = " ".join(
        f"WHEN v >= {1 << k} THEN {HLL_W - k}"
        for k in range(HLL_W - 1, -1, -1)
    )
    return f"""
WITH s AS (
  SELECT DISTINCT lang,
         unnest(list_transform(generate_series(1, len(toks) - 2),
                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
  FROM (SELECT lang, {_SQL_TOKS} AS toks FROM documents)
  WHERE len(toks) >= 3),
hx AS (SELECT lang, {_sql_hex60('md5(sh)')} AS h FROM s),
rv AS (SELECT lang, h % {HLL_M} AS reg, h // {HLL_M} AS v FROM hx),
rr AS (SELECT lang, reg, CASE {whens} ELSE {HLL_W + 1} END AS rho FROM rv),
regs AS (SELECT lang, reg, max(rho) AS mr FROM rr GROUP BY 1, 2),
agg AS (
  SELECT lang, count(*) AS cnt,
         sum(1::BIGINT << ({HLL_W + 1} - mr)) AS s_hit
  FROM regs GROUP BY 1),
ex AS (SELECT lang, count(DISTINCT sh) AS exact_distinct FROM s GROUP BY 1),
fin AS (
  SELECT lang, cnt, {HLL_M} - cnt AS vz,
         {_HLL_NUM!r} / CAST(s_hit + ({HLL_M} - cnt)
                             * (1::BIGINT << {HLL_W + 1}) AS DOUBLE) AS raw
  FROM agg),
est AS (
  SELECT lang, cnt, vz,
         CASE WHEN raw <= {_HLL_LC_CUT!r} AND vz > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(vz AS DOUBLE))
              ELSE raw END AS e
  FROM fin)
SELECT e.lang, CAST(cnt AS INT) AS registers_hit,
       CAST(vz AS INT) AS zero_registers,
       round(e.e, 4) AS hll_est, ex.exact_distinct,
       round((e.e - ex.exact_distinct) / ex.exact_distinct * 100, 4)
         AS rel_err_pct
FROM est e JOIN ex USING (lang)
ORDER BY e.lang
"""


ORACLE_HLL_DISTINCT = _oracle_hll_distinct()


# ---------------------------------- multi-pass sorted-neighborhood dedup
# Hernandez-Stolfo 1995 (the merge/purge problem): sort records by a
# discriminating key and compare only records within a fixed window of
# the sorted order — candidate generation is O(n·w) instead of the
# inverted index's posting-size blowup, and it catches near-dups that
# share a PREFIX even when token-set overlap is too diluted for a
# df-cutoff index. One sort key misses records that disagree early, so
# the classic fix is MULTI-PASS: run again under an independent key
# (here: the token-REVERSED prefix) and union the candidates.
# Candidate pairs are then verified with exact token-set Jaccard.
SN_W = 3            # compare each record to its next SN_W sort-neighbors
SN_KEY_TOKENS = 6   # sort key = first SN_KEY_TOKENS tokens
SN_SIM_MIN = 0.5    # verified token-set Jaccard to emit


def _sn_pass_pairs(t: DataFrame, blk, key) -> DataFrame:
    """One SNM pass: rank within blocks by key, emit (doc, next-i)
    neighbor pairs via lead() — a single per-block window, NO
    self-join and NO global sort (ranks are per-block, so the window
    partitions by the block key and stays distributed)."""
    w = Window.partitionBy("_blk").orderBy("_key", "doc_id")
    ranked = t.select(
        "doc_id", blk.alias("_blk"), key.alias("_key")
    ).select(
        "doc_id",
        F.array(
            *[F.lead("doc_id", i).over(w) for i in range(1, SN_W + 1)]
        ).alias("_nbrs"),
    )
    return ranked.select(
        "doc_id", F.explode("_nbrs").alias("other")
    ).where(F.col("other").isNotNull())


def sn_candidate_pairs(t: DataFrame) -> DataFrame:
    """Canonical (src_doc < dst_doc) two-pass SNM candidate pairs over
    a (doc_id, tk) token table — shared by the SNM dedup query and the
    multi-pass record linkage (queries_linkage)."""
    fwd_blk = F.element_at("tk", 1)
    fwd_key = F.concat_ws(" ", F.slice("tk", 1, SN_KEY_TOKENS))
    rev = F.reverse(F.col("tk"))
    rev_blk = F.element_at(rev, 1)
    rev_key = F.concat_ws(" ", F.slice(rev, 1, SN_KEY_TOKENS))
    return (
        _sn_pass_pairs(t, fwd_blk, fwd_key)
        .unionByName(_sn_pass_pairs(t, rev_blk, rev_key))
        .select(
            F.least("doc_id", "other").alias("src_doc"),
            F.greatest("doc_id", "other").alias("dst_doc"),
        )
        .distinct()
    )


def q_docs_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass sorted-neighborhood near-dup pairs (forward + reversed
    token-prefix keys), verified by exact token-set Jaccard >=
    SN_SIM_MIN.

    Scale shape: each pass is ONE distributed window (partitioned by
    the block token — never a SinglePartition global sort) feeding a
    lead() neighbor explode; the union of candidate pairs dedups on
    fixed-width (long, long) keys; only verified candidates ever touch
    the token arrays again (two hash joins back to the token table).
    O(n·w) candidates by construction — no posting-list blowup on hot
    shingles, which is the regime where this beats the inverted
    index at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
    t = docs.select("doc_id", toks.alias("tk")).where(F.size("tk") >= 1)
    cands = sn_candidate_pairs(t)
    sets = t.select("doc_id", F.array_distinct("tk").alias("ts"))
    a = sets.select(F.col("doc_id").alias("src_doc"), F.col("ts").alias("_ta"))
    b = sets.select(F.col("doc_id").alias("dst_doc"), F.col("ts").alias("_tb"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    uni = F.size(F.array_union("_ta", "_tb"))
    return (
        cands.join(a, "src_doc")
        .join(b, "dst_doc")
        .withColumn("jaccard", F.round(inter / uni, 4))
        .where(F.col("jaccard") >= SN_SIM_MIN)
        .select("src_doc", "dst_doc", "jaccard")
        .orderBy("src_doc", "dst_doc")
    )


# the SNM candidate CTE chain (t/fwd/rev/cand) is shared verbatim with
# the multi-pass record-linkage oracle (queries_linkage) so both
# engines' candidate sets are the same computation by construction
SN_CAND_SQL = f"""t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
  WHERE len({_SQL_TOKS}) >= 1),
fwd AS (
  SELECT doc_id, toks[1] AS blk,
         array_to_string(toks[1:{SN_KEY_TOKENS}], ' ') AS key,
         row_number() OVER (
           PARTITION BY toks[1]
           ORDER BY array_to_string(toks[1:{SN_KEY_TOKENS}], ' '), doc_id
         ) AS rn
  FROM t),
rev AS (
  SELECT doc_id, list_reverse(toks)[1] AS blk,
         array_to_string(list_reverse(toks)[1:{SN_KEY_TOKENS}], ' ') AS key,
         row_number() OVER (
           PARTITION BY list_reverse(toks)[1]
           ORDER BY array_to_string(list_reverse(toks)[1:{SN_KEY_TOKENS}], ' '),
                    doc_id
         ) AS rn
  FROM t),
cand AS (
  SELECT DISTINCT least(a.doc_id, b.doc_id) AS src_doc,
                  greatest(a.doc_id, b.doc_id) AS dst_doc
  FROM fwd a JOIN fwd b
    ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + {SN_W}
  UNION
  SELECT DISTINCT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id)
  FROM rev a JOIN rev b
    ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + {SN_W})"""

ORACLE_SORTED_NEIGHBORHOOD = f"""
WITH {SN_CAND_SQL},
sets AS (SELECT doc_id, list_distinct(toks) AS ts FROM t),
scored AS (
  SELECT src_doc, dst_doc,
         round(len(list_intersect(x.ts, y.ts)) * 1.0
               / len(list_distinct(x.ts || y.ts)), 4) AS jaccard
  FROM cand
  JOIN sets x ON src_doc = x.doc_id
  JOIN sets y ON dst_doc = y.doc_id)
SELECT src_doc, dst_doc, jaccard FROM scored
WHERE jaccard >= {SN_SIM_MIN}
ORDER BY src_doc, dst_doc
"""


# ------------------------------------- weighted reservoir sampling (A-ES)
# Efraimidis & Spirakis 2006: drawing k items with probability
# proportional to weight == taking the top-k by ln(u_i)/w_i for
# independent uniforms u_i. With u_i derived from md5(doc_id) the draw
# is deterministic, partition-invariant, and bit-reproducible in both
# engines — the weighted counterpart of the stratified md5 sampler.
ES_SAMPLE_K = 150
_ES_SALT = "es"
_ES_DENOM = float((1 << 48) + 1)  # u = (h48 + 1) / (2^48 + 1) in (0,1)


def q_docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-ES_SAMPLE_K docs drawn with probability proportional to
    length (n_chars) — the token-budget-weighted inclusion rule a
    mixture builder uses when long documents should be picked more
    often, without replacement.

    Scale shape: the priority key ln(u)/w is a pure map-side
    expression (48-bit md5 prefix -> exact double), selection is a
    sorted limit (TakeOrderedAndProject) — no shuffle beyond the top-k
    merge, no rand() (partition-layout-dependent), no driver state."""
    docs = load_table(spark, sf_dir, "documents")
    h48 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(_ES_SALT), F.col("doc_id").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h48 + F.lit(1)) / F.lit(_ES_DENOM)
    key = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.col("n_chars").alias("weight"),
            F.round(key, 10).alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(ES_SAMPLE_K)
    )


ORACLE_WEIGHTED_SAMPLE = f"""
SELECT doc_id, lang, n_chars AS weight,
       round(ln((('0x' || substr(md5(concat_ws(':', '{_ES_SALT}',
                  doc_id::VARCHAR)), 1, 12))::BIGINT + 1)
                / {_ES_DENOM}) / n_chars, 10) AS priority
FROM documents
ORDER BY priority DESC, doc_id ASC
LIMIT {ES_SAMPLE_K}
"""


# ------------------------------- temperature-based language sampling
# Multilingual temperature sampling (mT5 / XLM-R style): language l is
# sampled with probability proportional to n_l^ALPHA, flattening the
# head-language skew. Realized as per-language keep RATES applied via
# the same salted-md5 predicate as the stratified sampler — but with
# the rates COMPUTED IN-QUERY from the corpus language histogram
# (5-row aggregate, broadcast back), not hardcoded.
TEMP_ALPHA = 0.3
TEMP_BUDGET_FRAC = 0.5   # sample totals ~half the corpus
_TEMP_SALT = "temp"


def q_docs_lang_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature-alpha language rebalancing sample.

    rate_l = min(1, (n_l^a / sum_l n_l^a) * (frac * N) / n_l); a doc
    is kept iff its 16-bit salted-md5 value < floor(rate_l * 65536).

    Scale shape: the language histogram is a tiny agg (one row per
    language) that broadcasts back over the corpus; the keep test is
    then a pure map-side integer compare riding the scan. No window,
    no rand(), reproducible at any parallelism."""
    docs = load_table(spark, sf_dir, "documents")
    hist = docs.groupBy("lang").agg(F.count("*").alias("n_l"))
    tot = hist.agg(
        F.sum(F.pow(F.col("n_l"), F.lit(TEMP_ALPHA))).alias("z"),
        F.sum("n_l").alias("n_total"),
    )
    rates = hist.join(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(1.0),
            F.pow(F.col("n_l"), F.lit(TEMP_ALPHA))
            / F.col("z")
            * (F.lit(TEMP_BUDGET_FRAC) * F.col("n_total"))
            / F.col("n_l"),
        ).alias("rate"),
    )
    h16 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.lit(_TEMP_SALT), F.col("doc_id").cast("string"))
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        docs.join(F.broadcast(rates), "lang")
        .where(h16 < F.floor(F.col("rate") * F.lit(65536.0)))
        .select("doc_id", "lang", F.round("rate", 4).alias("rate"))
        .orderBy("doc_id")
    )


ORACLE_LANG_TEMPERATURE_SAMPLE = f"""
WITH hist AS (
  SELECT lang, count(*)::BIGINT AS n_l FROM documents GROUP BY lang),
tot AS (
  SELECT sum(pow(n_l, {TEMP_ALPHA})) AS z, sum(n_l)::BIGINT AS n_total
  FROM hist),
rates AS (
  SELECT lang,
         least(1.0, pow(n_l, {TEMP_ALPHA}) / z
                    * ({TEMP_BUDGET_FRAC} * n_total) / n_l) AS rate
  FROM hist CROSS JOIN tot)
SELECT d.doc_id, d.lang, round(r.rate, 4) AS rate
FROM documents d JOIN rates r USING (lang)
WHERE ('0x' || substr(md5(concat_ws(':', '{_TEMP_SALT}',
        d.doc_id::VARCHAR)), 1, 4))::BIGINT
      < floor(r.rate * 65536.0)
ORDER BY d.doc_id
"""


# ---------------------------------------- span census (exact substring dedup)
# The primitive behind exact-substring training-data dedup (Lee et al.
# 2021, "Deduplicating Training Data Makes Language Models Better"):
# find every SPAN_K-token span that recurs across >= SPAN_DF distinct
# documents, at ANY alignment. Overlapping sliding windows — unlike
# ``docs_line_dedup``'s fixed non-overlapping segments — so a
# duplicated substring is caught even when the copies start at
# different token offsets. The published pipelines build a suffix
# array; the distributed equivalent is this hashed span census (one
# narrow explode + one aggregation with full map-side combine).
SPAN_K = 10   # tokens per overlapping span
SPAN_DF = 2   # span in >= this many distinct docs -> duplicated


def q_docs_span_dedup(
    spark: SparkSession, sf_dir: str, hash_only: bool = False
) -> DataFrame:
    """Repeated-span census: every {SPAN_K}-token sliding-window span
    occurring in >= {SPAN_DF} distinct documents, with its document
    frequency, total occurrence count and first (min) document.

    Scale shape: the explode emits one row per corpus token (minus
    edge effects) — linear, no pairwise blowup — and the single
    aggregation groups on the span's xxhash64 LONG, so the shuffle
    combine runs on 8-byte keys. Two exemplar disciplines:

    - default (bench scale): the span text rides the census shuffle as
      a min() exemplar so one pass yields human-usable output;
    - ``hash_only=True`` (the 100-TB escalation, identical output):
      the census shuffles ONLY (h, doc_id) — 16 bytes/row instead of
      the ~9-word text — and the exemplar is recovered by a second
      hash-keyed pass semi-joined down to the df>={SPAN_DF} SURVIVORS
      before any text shuffles (survivors are a tiny fraction of the
      corpus under real dup rates, so the text exchange is
      metadata-sized and AQE broadcasts the survivor key set).

    The DuckDB oracle groups by the RAW span string, so a green value
    hash doubles as a no-collision witness at test scale (cf.
    ``docs_line_dedup``)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
    # guard size<K: Spark's sequence(1, n) with n<=0 yields a
    # DESCENDING range, not an empty one
    idx = F.when(
        F.size("toks") >= SPAN_K,
        F.sequence(F.lit(1), F.size("toks") - SPAN_K + 1),
    ).otherwise(F.array().cast("array<int>"))
    spans = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    idx, lambda i: F.concat_ws(" ", F.slice("toks", i, SPAN_K))
                )
            ).alias("span"),
        )
        .select("doc_id", F.xxhash64("span").alias("h"), "span")
    )
    if hash_only:
        census = (
            spans.drop("span")
            .groupBy("h")
            .agg(
                F.countDistinct("doc_id").alias("n_docs"),
                F.count("*").alias("n_occ"),
                F.min("doc_id").alias("first_doc"),
            )
            .where(F.col("n_docs") >= SPAN_DF)
        )
        exemplar = (
            spans.join(census.select("h"), "h", "leftsemi")
            .groupBy("h")
            .agg(F.min("span").alias("span"))
        )
        return (
            census.join(exemplar, "h")
            .select("span", "n_docs", "n_occ", "first_doc")
            .orderBy("span")
        )
    return (
        spans.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
            F.min("doc_id").alias("first_doc"),
            F.min("span").alias("span"),
        )
        .where(F.col("n_docs") >= SPAN_DF)
        .select("span", "n_docs", "n_occ", "first_doc")
        .orderBy("span")
    )


ORACLE_SPAN_DEDUP = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
spans AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, len(toks) - {SPAN_K} + 1),
           i -> array_to_string(list_slice(toks, i, i + {SPAN_K} - 1),
                                ' '))) AS span
  FROM t WHERE len(toks) >= {SPAN_K})
SELECT span,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occ,
       min(doc_id) AS first_doc
FROM spans
GROUP BY span
HAVING count(DISTINCT doc_id) >= {SPAN_DF}
ORDER BY span
"""


# --------------------------------------- span scrub (dedup action step)
# The consequence stage of the span census: per document, the token
# positions covered by corpus-duplicated spans, with overlapping /
# adjacent span intervals MERGED (gaps-and-islands) so the duplicated
# token count is the size of the interval UNION, not a double-counted
# sum — the "cut the repeated substring" step of exact-substring dedup.
SCRUB_DROP_FRAC = 0.5  # drop docs with > half their tokens duplicated


def q_docs_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-token coverage: every {SPAN_K}-token
    span with corpus document frequency >= {SPAN_DF} marks the
    interval [pos, pos+{SPAN_K}-1]; overlapping-or-adjacent intervals
    merge into islands; dup_tokens is the summed island size (the
    union), dup_token_frac its share of the doc, keep the
    {SCRUB_DROP_FRAC} drop decision.

    Scale shape: three keyed shuffles, each narrow — (1) the census
    aggregation on the span's xxhash64 long, (2) the equi-join of the
    per-(doc, pos) span stream against the df>={SPAN_DF} survivor set
    on that same long key, (3) the per-document island merge, a window
    partitioned BY DOCUMENT (never corpus-wide) whose partitions hold
    only that doc's matched spans. The running-max island scan is the
    classic gaps-and-islands plan and is mirrored verbatim in the
    DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
    idx = F.when(
        F.size("toks") >= SPAN_K,
        F.sequence(F.lit(1), F.size("toks") - SPAN_K + 1),
    ).otherwise(F.array().cast("array<int>"))
    spans = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(
                            F.concat_ws(" ", F.slice("toks", i, SPAN_K))
                        ).alias("h"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", "n_tokens", F.col("s.pos").alias("pos"),
                F.col("s.h").alias("h"))
    )
    hot = (
        spans.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= SPAN_DF)
        .select("h")
    )
    marked = spans.join(hot, "h").withColumn(
        "end", F.col("pos") + SPAN_K - 1
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = marked.withColumn(
        "new_island",
        F.when(
            prev_end.isNull() | (F.col("pos") > prev_end + 1), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "island", F.sum("new_island").over(w)
    )
    per_island = islands.groupBy("doc_id", "island").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.count("*").alias("n_spans"),
        (F.max("end") - F.min("pos") + 1).alias("covered"),
    )
    return (
        per_island.groupBy("doc_id")
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.sum("n_spans").alias("n_dup_spans"),
            F.sum("covered").alias("dup_tokens"),
        )
        .withColumn(
            "dup_token_frac",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 4),
        )
        .withColumn("keep", F.col("dup_token_frac") <= SCRUB_DROP_FRAC)
        .select(
            "doc_id", "n_tokens", "n_dup_spans", "dup_tokens",
            "dup_token_frac", "keep",
        )
        .orderBy("doc_id")
    )


ORACLE_SPAN_SCRUB = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
spans AS (
  SELECT doc_id, len(toks) AS n_tokens,
         unnest(generate_series(1, len(toks) - {SPAN_K} + 1)) AS pos,
         toks
  FROM t WHERE len(toks) >= {SPAN_K}),
keyed AS (
  SELECT doc_id, n_tokens, pos,
         array_to_string(list_slice(toks, pos, pos + {SPAN_K} - 1),
                         ' ') AS span
  FROM spans),
hot AS (
  SELECT span FROM keyed
  GROUP BY span HAVING count(DISTINCT doc_id) >= {SPAN_DF}),
marked AS (
  SELECT doc_id, n_tokens, pos, pos + {SPAN_K} - 1 AS e
  FROM keyed JOIN hot USING (span)),
flagged AS (
  SELECT *,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                IS NULL
              OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM marked),
isl AS (
  SELECT *,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged),
per_island AS (
  SELECT doc_id, island,
         any_value(n_tokens) AS n_tokens,
         count(*) AS n_spans,
         max(e) - min(pos) + 1 AS covered
  FROM isl GROUP BY doc_id, island)
SELECT doc_id,
       any_value(n_tokens) AS n_tokens,
       CAST(sum(n_spans) AS BIGINT) AS n_dup_spans,
       CAST(sum(covered) AS BIGINT) AS dup_tokens,
       round(sum(covered) * 1.0 / any_value(n_tokens), 4)
         AS dup_token_frac,
       (round(sum(covered) * 1.0 / any_value(n_tokens), 4)
         <= {SCRUB_DROP_FRAC}) AS keep
FROM per_island
GROUP BY doc_id
ORDER BY doc_id
"""


# ------------------------------- incremental span contamination probe
# Third member of the incremental family (minhash bands =
# docs_incremental_dedup, semantic = docs_incremental_semdedup): a
# small NEW BATCH of documents is screened against the indexed
# corpus's span table for verbatim k-token overlap — the
# "quarantine incoming data that copies the corpus" gate an ingest
# pipeline runs per batch. Same deterministic 20% md5 split as the
# other two probes so the fixtures cover real matches.
SPAN_PROBE_FLAG_FRAC = 0.2  # quarantine batch docs > this contaminated


def q_docs_incremental_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per new-batch document: how many of its {SPAN_K}-token spans
    already exist verbatim in the indexed corpus, how many distinct
    corpus documents share them, and the quarantine decision at
    >{SPAN_PROBE_FLAG_FRAC} contaminated-span fraction.

    Scale shape (mirrors incremental_minhash_pairs): the batch span
    table is the SMALL side and is BROADCAST into the corpus span
    stream, so the corpus never shuffles for the candidate join; only
    MATCHED rows (contamination-sized, not corpus-sized) reach the
    per-batch-doc aggregation, and the batch's own span totals come
    from a batch-sized aggregation. Hash keys are xxhash64 longs; the
    DuckDB oracle joins raw span strings (collision witness)."""
    docs = load_table(spark, sf_dir, "documents")
    is_new = (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 5
        == 0
    )
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
    idx = F.when(
        F.size("toks") >= SPAN_K,
        F.sequence(F.lit(1), F.size("toks") - SPAN_K + 1),
    ).otherwise(F.array().cast("array<int>"))

    def spans_of(df):
        return (
            df.select("doc_id", toks.alias("toks"))
            .select(
                "doc_id",
                F.explode(
                    F.transform(
                        idx,
                        lambda i: F.struct(
                            i.alias("pos"),
                            F.xxhash64(
                                F.concat_ws(" ", F.slice("toks", i, SPAN_K))
                            ).alias("h"),
                        ),
                    )
                ).alias("s"),
            )
            .select("doc_id", F.col("s.pos").alias("pos"),
                    F.col("s.h").alias("h"))
        )

    batch_spans = spans_of(docs.where(is_new)).withColumnRenamed(
        "doc_id", "batch_doc"
    )
    corpus_spans = spans_of(docs.where(~is_new)).select(
        F.col("doc_id").alias("corpus_doc"), "h"
    )
    matched = corpus_spans.join(F.broadcast(batch_spans), "h")
    hits = matched.groupBy("batch_doc").agg(
        F.countDistinct("pos").alias("n_contaminated"),
        F.countDistinct("corpus_doc").alias("n_corpus_docs"),
    )
    totals = batch_spans.groupBy("batch_doc").agg(
        F.countDistinct("pos").alias("n_spans")
    )
    return (
        totals.join(F.broadcast(hits), "batch_doc", "left")
        .select(
            F.col("batch_doc").alias("doc_id"),
            "n_spans",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.coalesce("n_corpus_docs", F.lit(0)).alias("n_corpus_docs"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_spans"), 4
            ).alias("contaminated_frac"),
        )
        .withColumn(
            "quarantine",
            F.col("contaminated_frac") > SPAN_PROBE_FLAG_FRAC,
        )
        .orderBy("doc_id")
    )


def _oracle_incremental_spans() -> str:
    from deja_view_spark.functions.embedding import duckdb_hex_int_sql

    split = duckdb_hex_int_sql("md5(CAST(doc_id AS VARCHAR))", 4)
    return f"""
WITH d AS (
  SELECT doc_id, text, ({split}) % 5 = 0 AS is_new FROM documents),
t AS (
  SELECT doc_id, is_new, {_SQL_TOKS} AS toks FROM d),
spans AS (
  SELECT doc_id, is_new,
         unnest(generate_series(1, len(toks) - {SPAN_K} + 1)) AS pos,
         toks
  FROM t WHERE len(toks) >= {SPAN_K}),
keyed AS (
  SELECT doc_id, is_new, pos,
         array_to_string(list_slice(toks, pos, pos + {SPAN_K} - 1),
                         ' ') AS span
  FROM spans),
hits AS (
  SELECT b.doc_id,
         count(DISTINCT b.pos) AS n_contaminated,
         count(DISTINCT c.doc_id) AS n_corpus_docs
  FROM keyed b JOIN keyed c ON b.span = c.span
  WHERE b.is_new AND NOT c.is_new
  GROUP BY b.doc_id),
totals AS (
  SELECT doc_id, count(DISTINCT pos) AS n_spans
  FROM keyed WHERE is_new GROUP BY doc_id)
SELECT t.doc_id, t.n_spans,
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       coalesce(h.n_corpus_docs, 0) AS n_corpus_docs,
       round(coalesce(h.n_contaminated, 0) * 1.0 / t.n_spans, 4)
         AS contaminated_frac,
       (round(coalesce(h.n_contaminated, 0) * 1.0 / t.n_spans, 4)
         > {SPAN_PROBE_FLAG_FRAC}) AS quarantine
FROM totals t LEFT JOIN hits h USING (doc_id)
ORDER BY t.doc_id
"""


ORACLE_INCREMENTAL_SPANS = _oracle_incremental_spans()


# ---------------------------------------- source-priority exact dedup
# Cross-source dedup with a retention POLICY: when identical content
# arrives from several sources, keep the copy from the most trusted
# source (curated > original crawl > mirror), not an arbitrary one —
# the "prefer the canonical edition" rule every multi-source training
# corpus applies before near-dup passes. The driver corpus has no
# verbatim duplicates, so the input is the corpus plus two
# deterministic re-ingest slices (the re-crawl shape `docs_exact_dedup`
# also uses): every 23rd doc re-ingested from a low-priority "mirror"
# source, every 69th ALSO from a high-priority "curated" source.
CROSS_SOURCE_PRIORITY = "CASE WHEN source = 'curated' THEN 0 WHEN source = 'mirror' THEN 2 ELSE 1 END"


def q_docs_cross_source_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per multi-copy content group: the kept (doc, source) under the
    priority policy, copy/source counts, and the chars freed by
    dropping the losers.

    Scale shape: ONE shuffle — a single groupBy on the 256-bit content
    hash with full map-side partial aggregation; the policy winner is
    a `min_by` over the (priority, doc_id) ordering struct inside the
    same aggregate, so no window, no self-join, no second pass. The
    oracle picks the winner with a row_number window (fine at oracle
    scale; the min_by form is the corpus-scale plan)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text", "source", "n_chars")
    mirror = base.where(F.col("doc_id") % 23 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        "text",
        F.lit("mirror").alias("source"),
        "n_chars",
    )
    curated = base.where(F.col("doc_id") % 69 == 0).select(
        (F.col("doc_id") + 30_000_000).alias("doc_id"),
        "text",
        F.lit("curated").alias("source"),
        "n_chars",
    )
    corpus = base.unionByName(mirror).unionByName(curated)
    prio = F.expr(CROSS_SOURCE_PRIORITY)
    return (
        corpus.groupBy(F.sha2(F.col("text"), 256).alias("content_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("source").alias("n_sources"),
            F.min_by(
                F.struct(F.col("doc_id"), F.col("source")),
                F.struct(prio.alias("p"), F.col("doc_id")),
            ).alias("w"),
            (F.sum("n_chars") - F.min("n_chars")).alias("freed_chars"),
        )
        .where(F.col("n_copies") > 1)
        .select(
            "content_hash",
            "n_copies",
            "n_sources",
            F.col("w.doc_id").alias("kept_doc_id"),
            F.col("w.source").alias("kept_source"),
            "freed_chars",
        )
        .orderBy("kept_doc_id")
    )


ORACLE_CROSS_SOURCE_DEDUP = f"""
WITH corpus AS (
  SELECT doc_id, text, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 20000000, text, 'mirror', n_chars
  FROM documents WHERE doc_id % 23 = 0
  UNION ALL
  SELECT doc_id + 30000000, text, 'curated', n_chars
  FROM documents WHERE doc_id % 69 = 0),
ranked AS (
  SELECT sha256(text) AS content_hash, doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY sha256(text)
           ORDER BY {CROSS_SOURCE_PRIORITY}, doc_id) AS rn
  FROM corpus),
grp AS (
  SELECT content_hash, count(*) AS n_copies,
         count(DISTINCT source) AS n_sources,
         CAST(sum(n_chars) - min(n_chars) AS BIGINT) AS freed_chars
  FROM ranked GROUP BY content_hash HAVING count(*) > 1)
SELECT g.content_hash, g.n_copies, g.n_sources,
       r.doc_id AS kept_doc_id, r.source AS kept_source, g.freed_chars
FROM grp g JOIN ranked r ON g.content_hash = r.content_hash AND r.rn = 1
ORDER BY kept_doc_id
"""


# ------------------------------------------------- first-occurrence novelty
# Per-document "new information yield": the fraction of a document's
# distinct n-grams whose FIRST corpus occurrence (min doc_id =
# ingestion order) is this document. The crawl-prioritization signal —
# a feed whose documents stop contributing unseen n-grams is saturated
# (dedup-adjacent but graded, like the deduplicated-token-yield curves
# in data-scaling studies).
NOVELTY_N = 3


def q_docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc (with >= {NOVELTY_N} tokens): distinct n-gram count,
    how many of those n-grams first appear in the corpus here, and the
    novelty fraction.

    Scale shape: the (doc, ngram) stream is aggregated, never joined
    back to the corpus. In-row `array_distinct` dedups within-doc
    repeats BEFORE the explode (no corpus-wide distinct shuffle), then
    per-hash min(doc_id) is one partial-agg shuffle of fixed-width
    (long, long) rows and the per-doc census of firsts is a second,
    doc-sized agg; final assembly joins two doc-sized aggregates.
    Hash keys are xxhash64 longs; the oracle groups the RAW n-gram
    string (collision witness)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
    idx = F.when(
        F.size("toks") >= NOVELTY_N,
        F.sequence(F.lit(1), F.size("toks") - NOVELTY_N + 1),
    ).otherwise(F.array().cast("array<int>"))
    pairs = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        idx,
                        lambda i: F.xxhash64(
                            F.concat_ws(" ", F.slice("toks", i, NOVELTY_N))
                        ),
                    )
                )
            ).alias("h"),
        )
    )
    totals = pairs.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    firsts = pairs.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    novel = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_novel")
    )
    return (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0)) / F.col("n_ngrams"), 4
            ).alias("novelty_frac"),
        )
        .orderBy("doc_id")
    )


ORACLE_NGRAM_NOVELTY = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         array_to_string(
           list_slice(toks, i, i + {NOVELTY_N} - 1), ' ') AS ng
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {NOVELTY_N} + 1)) AS i
        FROM t WHERE len(toks) >= {NOVELTY_N})),
dg AS (SELECT DISTINCT doc_id, ng FROM g),
totals AS (SELECT doc_id, count(*) AS n_ngrams FROM dg GROUP BY doc_id),
firsts AS (SELECT ng, min(doc_id) AS first_doc FROM dg GROUP BY ng),
novel AS (
  SELECT first_doc AS doc_id, count(*) AS n_novel FROM firsts
  GROUP BY first_doc)
SELECT t.doc_id, t.n_ngrams,
       coalesce(n.n_novel, 0) AS n_novel,
       round(coalesce(n.n_novel, 0) * 1.0 / t.n_ngrams, 4) AS novelty_frac
FROM totals t LEFT JOIN novel n USING (doc_id)
ORDER BY t.doc_id
"""


QUERIES = {
    "docs_stratified_sample": q_docs_stratified_sample,
    "docs_pack_shards": q_docs_pack_shards,
    "docs_tfidf_topterms": q_docs_tfidf_topterms,
    "docs_decontaminate": q_docs_decontaminate,
    "corpus_clean": q_corpus_clean,
    "docs_line_dedup": q_docs_line_dedup,
    "docs_kmv_distinct": q_docs_kmv_distinct,
    "docs_hll_distinct": q_docs_hll_distinct,
    "docs_sorted_neighborhood": q_docs_sorted_neighborhood,
    "docs_weighted_sample": q_docs_weighted_sample,
    "docs_lang_temperature_sample": q_docs_lang_temperature_sample,
    "docs_span_dedup": q_docs_span_dedup,
    "docs_span_scrub": q_docs_span_scrub,
    "docs_incremental_spans": q_docs_incremental_spans,
    "docs_cross_source_dedup": q_docs_cross_source_dedup,
    "docs_ngram_novelty": q_docs_ngram_novelty,
}

ORACLES = {
    "docs_stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "docs_pack_shards": ORACLE_PACK_SHARDS,
    "docs_tfidf_topterms": ORACLE_TFIDF_TOPTERMS,
    "docs_decontaminate": ORACLE_DECONTAMINATE,
    "corpus_clean": ORACLE_CORPUS_CLEAN,
    "docs_line_dedup": ORACLE_LINE_DEDUP,
    "docs_kmv_distinct": ORACLE_KMV_DISTINCT,
    "docs_hll_distinct": ORACLE_HLL_DISTINCT,
    "docs_sorted_neighborhood": ORACLE_SORTED_NEIGHBORHOOD,
    "docs_weighted_sample": ORACLE_WEIGHTED_SAMPLE,
    "docs_lang_temperature_sample": ORACLE_LANG_TEMPERATURE_SAMPLE,
    "docs_span_dedup": ORACLE_SPAN_DEDUP,
    "docs_span_scrub": ORACLE_SPAN_SCRUB,
    "docs_incremental_spans": ORACLE_INCREMENTAL_SPANS,
    "docs_cross_source_dedup": ORACLE_CROSS_SOURCE_DEDUP,
    "docs_ngram_novelty": ORACLE_NGRAM_NOVELTY,
}


# ------------------------------------- KMV sketch set algebra
# Beyer et al. 2007 (SIGMOD, "On synopses for distinct-value
# estimation"): K-minimum-values sketches COMPOSE — the k smallest
# hashes of A union B are contained in (k-min of A) union (k-min of
# B), so union cardinality, intersection cardinality and Jaccard are
# all estimable from the per-set sketches alone, never re-touching
# the data. The estimator: with U = k' smallest of the merged
# sketches (k' = min(K, |merged|)), D_union ~ (k'-1)/u_k' and
# rho = |{h in U : h in both sketches}| / k' estimates the Jaccard,
# so D_intersect ~ rho * D_union. Deterministic by the same argument
# as docs_kmv_distinct (shared md5-60 hash, k-smallest is order-free)
# — the estimates THEMSELVES carry a full value-hash oracle, and the
# exact per-pair overlap rides along as the audit columns.
# This is the sketch-algebra a 100-TB catalog runs instead of pairwise
# distinct-joins: per-partition sketches merge associatively, and any
# pair/group overlap question is answered from sketch metadata.
KMV_OV_K = 256
# the '4' hex-prefix cutoff of docs_kmv_distinct, as a 60-bit integer
KMV_OV_CUT = 4 << 56


def q_docs_kmv_lang_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise language vocabulary overlap (distinct 3-gram shingles)
    estimated purely from per-language KMV sketches, audited against
    the exact intersection/union/Jaccard.

    Scale shape: everything is keyed on the 60-bit md5 prefix (8-byte
    shuffle keys, never shingle or hex strings); the distinct
    (lang, h) stream is checkpointed ONCE and feeds all four consumers
    (sketch build, two size aggs, the exact self-join) — one tokenize
    +hash pass total. Sketch build = map-side range prefilter + one
    per-language bottom-K window over the filtered slice; the pairwise
    algebra then runs over 5 sketch rows of {KMV_OV_K} longs each —
    in-row array functions on broadcast-sized data, NO pairwise data
    join. The exact audit (the self-join) exists to score the
    estimates at registry scale and is dropped at 100 TB — the
    sketches are the product."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "lang",
        F.explode(F.array_distinct(_shingle_col(F.col("text")))).alias("sh"),
    )
    h60 = F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long")
    hashed = (
        sh.select("lang", h60.alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    filt = hashed.where(F.col("h") < KMV_OV_CUT)
    w = Window.partitionBy("lang").orderBy("h")
    sketches = (
        filt.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= KMV_OV_K)
        .groupBy("lang")
        .agg(F.sort_array(F.collect_list("h")).alias("sk"))
    )
    a = sketches.select(
        F.col("lang").alias("lang_a"), F.col("sk").alias("ska")
    )
    b = sketches.select(
        F.col("lang").alias("lang_b"), F.col("sk").alias("skb")
    )
    merged = F.array_sort(F.array_union("ska", "skb"))
    kp = F.least(F.lit(KMV_OV_K), F.size(merged))
    u = F.slice(merged, 1, kp)
    kth = F.element_at(merged, kp)
    matches = F.size(
        F.filter(
            u,
            lambda x: F.array_contains("ska", x)
            & F.array_contains("skb", x),
        )
    )
    union_est = F.when(
        F.size(merged) >= KMV_OV_K,
        F.expr(
            f"CAST(CAST({(KMV_OV_K - 1) * _HEX60} AS DECIMAL(38,0))"
            " DIV CAST(_kth AS DECIMAL(38,0)) AS BIGINT)"
        ),
    ).otherwise(F.size(merged).cast("long") * KMV_INV_P)
    pairs = (
        a.join(b, F.col("lang_a") < F.col("lang_b"))
        .withColumn("_kth", kth)
        .withColumn("_kp", kp)
        .withColumn("_m", matches)
        .withColumn("est_union", union_est)
        .withColumn(
            "est_intersection",
            F.expr(
                "CAST(CAST(_m AS DECIMAL(38,0)) * CAST(est_union AS"
                " DECIMAL(38,0)) DIV CAST(_kp AS DECIMAL(38,0)) AS BIGINT)"
            ),
        )
        .withColumn("est_jaccard", F.round(F.col("_m") / F.col("_kp"), 4))
    )
    # exact audit: one self-join over the checkpointed distinct stream
    sizes = hashed.groupBy("lang").agg(F.count("*").alias("n"))
    inter = (
        hashed.alias("x")
        .join(hashed.alias("y"), "h")
        .where(F.col("x.lang") < F.col("y.lang"))
        .groupBy(
            F.col("x.lang").alias("lang_a"), F.col("y.lang").alias("lang_b")
        )
        .agg(F.count("*").alias("exact_intersection"))
    )
    na = sizes.select(F.col("lang").alias("lang_a"), F.col("n").alias("_na"))
    nb = sizes.select(F.col("lang").alias("lang_b"), F.col("n").alias("_nb"))
    return (
        pairs.join(F.broadcast(inter), ["lang_a", "lang_b"])
        .join(F.broadcast(na), "lang_a")
        .join(F.broadcast(nb), "lang_b")
        .withColumn(
            "exact_union",
            F.col("_na") + F.col("_nb") - F.col("exact_intersection"),
        )
        .select(
            "lang_a",
            "lang_b",
            F.col("_kp").cast("int").alias("k_used"),
            "est_jaccard",
            "est_intersection",
            "est_union",
            "exact_intersection",
            "exact_union",
            F.round(
                F.col("exact_intersection") / F.col("exact_union"), 4
            ).alias("exact_jaccard"),
        )
        .orderBy("lang_a", "lang_b")
    )


def _oracle_kmv_lang_overlap() -> str:
    return f"""
WITH t AS (
  SELECT lang, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT DISTINCT lang,
         unnest(list_transform(generate_series(1, len(toks) - 2),
                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
  FROM t WHERE len(toks) >= 3),
hashed AS MATERIALIZED (
  SELECT DISTINCT lang, {_sql_hex60('md5(sh)')} AS h FROM s),
filt AS (SELECT lang, h FROM hashed WHERE h < {KMV_OV_CUT}),
rk AS (
  SELECT lang, h,
         row_number() OVER (PARTITION BY lang ORDER BY h) AS rk
  FROM filt),
sk AS (
  SELECT lang, array_agg(h ORDER BY h) AS sk
  FROM rk WHERE rk <= {KMV_OV_K} GROUP BY lang),
pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         list_sort(list_distinct(a.sk || b.sk)) AS merged,
         a.sk AS ska, b.sk AS skb
  FROM sk a JOIN sk b ON a.lang < b.lang),
calc AS (
  SELECT lang_a, lang_b,
         least({KMV_OV_K}, len(merged)) AS kp,
         merged[least({KMV_OV_K}, len(merged))] AS kth,
         len(list_filter(merged[1:least({KMV_OV_K}, len(merged))],
             x -> list_contains(ska, x) AND list_contains(skb, x)))
           AS m,
         len(merged) AS n_merged
  FROM pairs),
est AS (
  SELECT lang_a, lang_b, kp, m,
         CASE WHEN n_merged >= {KMV_OV_K}
              THEN CAST({(KMV_OV_K - 1) * _HEX60}::HUGEINT
                   // kth::HUGEINT AS BIGINT)
              ELSE n_merged::BIGINT * {KMV_INV_P} END AS est_union
  FROM calc),
sizes AS (SELECT lang, count(*) AS n FROM hashed GROUP BY lang),
inter AS (
  SELECT x.lang AS lang_a, y.lang AS lang_b,
         count(*) AS exact_intersection
  FROM hashed x JOIN hashed y ON x.h = y.h AND x.lang < y.lang
  GROUP BY 1, 2)
SELECT e.lang_a, e.lang_b,
       CAST(kp AS INT) AS k_used,
       round(m * 1.0 / kp, 4) AS est_jaccard,
       CAST(m::HUGEINT * est_union::HUGEINT
            // kp::HUGEINT AS BIGINT) AS est_intersection,
       est_union,
       i.exact_intersection,
       na.n + nb.n - i.exact_intersection AS exact_union,
       round(i.exact_intersection * 1.0
             / (na.n + nb.n - i.exact_intersection), 4) AS exact_jaccard
FROM est e
JOIN inter i USING (lang_a, lang_b)
JOIN sizes na ON e.lang_a = na.lang
JOIN sizes nb ON e.lang_b = nb.lang
ORDER BY e.lang_a, e.lang_b
"""


ORACLE_KMV_LANG_OVERLAP = _oracle_kmv_lang_overlap()

QUERIES["docs_kmv_lang_overlap"] = q_docs_kmv_lang_overlap
ORACLES["docs_kmv_lang_overlap"] = ORACLE_KMV_LANG_OVERLAP


# ------------------------------------------------------------------
# Sliding token-window chunker — the training-sequence prep step that
# turns variable-length documents into fixed-budget overlapping
# context windows (the precursor to shard packing: pack_shards bins
# whole docs; this emits the W-token windows a sequence trainer
# actually consumes). Deterministic end to end: the chunk COUNT is
# closed-form integer arithmetic (1 + ceil((n-W)/S) for n > W), chunk
# boundaries are pure index math, and each chunk ships its content
# sha256 (the same per-row lineage idiom as the KG pipeline's
# input-sha lineage rows). Scale shape: one tokenize pass, the
# per-doc sequence explode is bounded by n/S chunks per doc (never a
# cross-doc join), and everything below the explode is map-side
# column math — embarrassingly parallel at any corpus size.
CHUNK_W = 32  # window size (tokens)
CHUNK_S = 24  # stride (tokens) -> 8-token overlap


def q_docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0).alias(
                "toks"
            ),
        )
        .select("doc_id", "toks", F.size("toks").alias("n"))
        .where(F.col("n") >= 1)
        .select(
            "doc_id",
            "toks",
            "n",
            F.expr(
                f"CASE WHEN n <= {CHUNK_W} THEN 1"
                f" ELSE (n - {CHUNK_W} + {CHUNK_S} - 1) DIV {CHUNK_S} + 1 END"
            ).alias("nk"),
        )
    )
    chunks = toks.select(
        "doc_id",
        "n",
        F.explode(F.expr("sequence(0, nk - 1)")).alias("chunk_idx"),
        "toks",
    ).select(
        "doc_id",
        "chunk_idx",
        F.expr(f"chunk_idx * {CHUNK_S} + 1").alias("tok_start"),
        F.expr(f"least(chunk_idx * {CHUNK_S} + {CHUNK_W}, n)").alias("tok_end"),
        F.expr(
            f"array_join(slice(toks, chunk_idx * {CHUNK_S} + 1, {CHUNK_W}), ' ')"
        ).alias("chunk_text"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "tok_start",
        "tok_end",
        (F.col("tok_end") - F.col("tok_start") + 1).alias("chunk_tokens"),
        F.sha2(F.col("chunk_text"), 256).alias("chunk_sha"),
        "chunk_text",
    ).orderBy("doc_id", "chunk_idx")


ORACLE_DOCS_CHUNK_WINDOWS = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents),
s AS (
  SELECT doc_id, toks, length(toks) AS n FROM t WHERE length(toks) >= 1),
k AS (
  SELECT doc_id, toks, n,
         CASE WHEN n <= {CHUNK_W} THEN 1
              ELSE (n - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S} + 1 END AS nk
  FROM s),
e AS (
  SELECT doc_id, toks, n, unnest(range(0, nk)) AS chunk_idx FROM k),
c AS (
  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         chunk_idx * {CHUNK_S} + 1 AS tok_start,
         least(chunk_idx * {CHUNK_S} + {CHUNK_W}, n) AS tok_end,
         array_to_string(
           list_slice(toks, chunk_idx * {CHUNK_S} + 1,
                      least(chunk_idx * {CHUNK_S} + {CHUNK_W}, n)),
           ' ') AS chunk_text
  FROM e)
SELECT doc_id, chunk_idx,
       CAST(tok_start AS INT) AS tok_start,
       CAST(tok_end AS INT) AS tok_end,
       CAST(tok_end - tok_start + 1 AS INT) AS chunk_tokens,
       sha256(chunk_text) AS chunk_sha,
       chunk_text
FROM c
ORDER BY doc_id, chunk_idx
"""

QUERIES["docs_chunk_windows"] = q_docs_chunk_windows
ORACLES["docs_chunk_windows"] = ORACLE_DOCS_CHUNK_WINDOWS


# ----------------------------------------------------- k-fold assignment
# Deterministic cross-validation fold assignment + balance audit — the
# split step upstream of quality-classifier training (and the
# train/held-out split every dedup-threshold tuning run needs). Folds
# come from a salted md5-prefix integer mod K (reproducible at any
# parallelism, composable with partition pruning — the
# stratified-sample discipline); the output is the per-(fold, lang)
# balance table a reviewer checks before trusting a split: doc count,
# token mass, and each fold's share of the language in exact ppm.
# Scale shape: map-side fold/token math, ONE partial-agg groupBy over
# the K x |langs| key space, broadcast per-lang totals back.
CV_FOLDS = 5
_CV_SALT = "cv3"


def q_docs_crossval_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.expr(
            f"CAST(conv(substr(md5(concat_ws(':', '{_CV_SALT}',"
            f" CAST(doc_id AS STRING))), 1, 12), 16, 10) AS BIGINT)"
            f" % {CV_FOLDS}"
        ).alias("fold"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0))
        .cast("long")
        .alias("toks"),
    )
    cells = docs.groupBy("fold", "lang").agg(
        F.count("*").alias("n_docs"), F.sum("toks").alias("n_tokens")
    )
    lang_tot = cells.groupBy("lang").agg(F.sum("n_docs").alias("lang_docs"))
    return (
        cells.join(F.broadcast(lang_tot), "lang")
        .select(
            "fold",
            "lang",
            "n_docs",
            "n_tokens",
            F.expr(f"CAST(n_docs * 1000000 DIV lang_docs AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy("fold", "lang")
    )


ORACLE_DOCS_CROSSVAL_FOLDS = f"""
WITH assigned AS (
  SELECT lang,
         ('0x' || substr(md5(concat_ws(':', '{_CV_SALT}',
              doc_id::VARCHAR)), 1, 12))::BIGINT % {CV_FOLDS} AS fold,
         CAST(length(regexp_extract_all(lower(text), '{TOKEN_RE}'))
              AS BIGINT) AS toks
  FROM documents),
cells AS (
  SELECT fold, lang, count(*) AS n_docs,
         CAST(sum(toks) AS BIGINT) AS n_tokens
  FROM assigned GROUP BY 1, 2),
lang_tot AS (
  SELECT lang, CAST(sum(n_docs) AS BIGINT) AS lang_docs
  FROM cells GROUP BY lang)
SELECT fold, lang, n_docs, n_tokens,
       CAST(n_docs * 1000000 // lang_docs AS BIGINT) AS share_ppm
FROM cells JOIN lang_tot USING (lang)
ORDER BY fold, lang
"""

QUERIES["docs_crossval_folds"] = q_docs_crossval_folds
ORACLES["docs_crossval_folds"] = ORACLE_DOCS_CROSSVAL_FOLDS


# --------------------------------------------------- CDC snapshot diff
# Change-data-capture between two corpus snapshots: the MERGE-source
# computation every incremental ingest runs before writing (Iceberg's
# changelog view / Delta CDF shape). The "next" snapshot is derived
# deterministically from the corpus so the driver can oracle it:
# every 53rd doc is DELETED, every 41st (surviving) doc's text is
# UPDATED (a marker suffix — new sha, same id), and one INSERT per
# 97th doc arrives under a shifted id. The diff itself is the
# operator under test: FULL OUTER join on the key, change class from
# null-ness + content-sha comparison, per-class census plus the
# per-row change list a MERGE would consume. Scale shape: one
# key-keyed shuffle join of two corpus-sized sides (the unavoidable
# CDC cost), sha comparison in codegen; census re-aggregates from the
# classified rows.
def _snapshot_next(docs):
    survivors = docs.where(F.col("doc_id") % 53 != 0)
    updated = survivors.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 41 == 0,
            F.concat(F.col("text"), F.lit(" [rev2]")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    inserts = docs.where(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.lit("new: "), F.col("text")).alias("text"),
    )
    return updated.unionByName(inserts)


def q_docs_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("old_sha")
    )
    new = _snapshot_next(docs).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("new_sha")
    )
    classified = (
        old.join(new, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("old_sha").isNull(), "insert")
            .when(F.col("new_sha").isNull(), "delete")
            .when(F.col("old_sha") != F.col("new_sha"), "update")
            .otherwise("unchanged")
            .alias("change_type"),
        )
    )
    return (
        classified.groupBy("change_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
        )
        .orderBy("change_type")
    )


ORACLE_DOCS_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT doc_id, sha256(text) AS old_sha FROM documents),
next_snap AS (
  SELECT doc_id,
         CASE WHEN doc_id % 41 = 0 THEN text || ' [rev2]'
              ELSE text END AS text
  FROM documents WHERE doc_id % 53 <> 0
  UNION ALL
  SELECT doc_id + 20000000 AS doc_id, 'new: ' || text AS text
  FROM documents WHERE doc_id % 97 = 0),
new_s AS (
  SELECT doc_id, sha256(text) AS new_sha FROM next_snap),
classified AS (
  SELECT coalesce(old.doc_id, new_s.doc_id) AS doc_id,
         CASE WHEN old_sha IS NULL THEN 'insert'
              WHEN new_sha IS NULL THEN 'delete'
              WHEN old_sha <> new_sha THEN 'update'
              ELSE 'unchanged' END AS change_type
  FROM old FULL OUTER JOIN new_s ON old.doc_id = new_s.doc_id)
SELECT change_type, count(*) AS n_rows,
       min(doc_id) AS first_id, max(doc_id) AS last_id
FROM classified
GROUP BY change_type
ORDER BY change_type
"""

QUERIES["docs_snapshot_diff"] = q_docs_snapshot_diff
ORACLES["docs_snapshot_diff"] = ORACLE_DOCS_SNAPSHOT_DIFF


# ----------------------------------------- exact-k per-group sampler
# Exactly min(k, group size) documents per language, drawn by salted
# md5 rank — the per-group companion to the global weighted draw
# (docs_weighted_sample, A-ES) and the rate-based stratified sampler
# (docs_stratified_sample): a training-mix builder that wants "give me
# exactly 20 eval docs per language" needs the EXACT-k form, and the
# hash-rank draw keeps it partition-invariant and reproducible (the
# no-rand() discipline). Scale shape: one rank window per group over
# the narrow (lang, doc_id) projection — the window rides hash-ordered
# ids, never the text; output is at most |langs| * k rows.
GROUP_SAMPLE_K = 20
GROUP_SAMPLE_SALT = "gsample-r3"


def q_docs_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    pri = F.md5(
        F.concat(
            F.lit(GROUP_SAMPLE_SALT), F.col("doc_id").cast("string")
        ).cast("binary")
    )
    w = Window.partitionBy("lang").orderBy(pri.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("draw_rank", F.row_number().over(w))
        .where(F.col("draw_rank") <= GROUP_SAMPLE_K)
        .select("lang", "draw_rank", "doc_id")
        .orderBy("lang", "draw_rank")
    )


ORACLE_DOCS_GROUP_SAMPLE = f"""
SELECT lang, draw_rank, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('{GROUP_SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)),
                    doc_id) AS draw_rank
  FROM documents) t
WHERE draw_rank <= {GROUP_SAMPLE_K}
ORDER BY lang, draw_rank
"""

QUERIES["docs_group_sample"] = q_docs_group_sample
ORACLES["docs_group_sample"] = ORACLE_DOCS_GROUP_SAMPLE


# ---------------------------------------------- dedup savings census
# The "why dedup matters" report: over the exact-dedup corpus view
# (corpus + the deterministic replica slice, the docs_exact_dedup
# convention), per duplicate-cluster-size band: clusters, total rows,
# redundant rows (size - 1 per cluster) and exact redundant BYTES —
# the storage/compute bill a keep-one-per-cluster pass saves. This is
# the number that justifies the dedup stage's own cost at 100 TB and
# the per-ingest trend a data-platform dashboard tracks. Scale shape:
# one content-sha partial agg (the dedup shuffle itself), one
# metadata-sized band rollup.
def q_docs_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text")
    replicas = base.where(F.col("doc_id") % 37 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    corpus = base.unionByName(replicas)
    groups = corpus.groupBy(
        F.sha2(F.col("text"), 256).alias("h")
    ).agg(
        F.count("*").alias("n_copies"),
        F.sum(F.length("text")).alias("bytes_all"),
        F.min(F.length("text")).alias("bytes_one"),
    )
    return (
        groups.select(
            F.when(F.col("n_copies") == 1, "unique")
            .when(F.col("n_copies") == 2, "pair")
            .otherwise("3+")
            .alias("band"),
            "n_copies",
            "bytes_all",
            "bytes_one",
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("n_copies").alias("n_rows"),
            F.sum(F.expr("n_copies - 1")).alias("redundant_rows"),
            F.sum(F.expr("bytes_all - bytes_one")).alias(
                "redundant_bytes"
            ),
        )
        .orderBy("band")
    )


ORACLE_DOCS_DEDUP_SAVINGS = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 37 = 0),
groups AS (
  SELECT sha256(text) AS h, count(*) AS n_copies,
         CAST(sum(length(text)) AS BIGINT) AS bytes_all,
         CAST(min(length(text)) AS BIGINT) AS bytes_one
  FROM corpus GROUP BY 1)
SELECT CASE WHEN n_copies = 1 THEN 'unique'
            WHEN n_copies = 2 THEN 'pair'
            ELSE '3+' END AS band,
       count(*) AS n_clusters,
       CAST(sum(n_copies) AS BIGINT) AS n_rows,
       CAST(sum(n_copies - 1) AS BIGINT) AS redundant_rows,
       CAST(sum(bytes_all - bytes_one) AS BIGINT) AS redundant_bytes
FROM groups
GROUP BY 1
ORDER BY band
"""

QUERIES["docs_dedup_savings"] = q_docs_dedup_savings
ORACLES["docs_dedup_savings"] = ORACLE_DOCS_DEDUP_SAVINGS


# -------------------------------------------- rendezvous shard audit
# Highest-random-weight (rendezvous / Thaler-Ravishankar) shard
# assignment plus the reshard-movement audit — the partition-stability
# primitive behind incremental corpus materialization: when a 100-TB
# triple store grows from W to W+1 output shards, mod-hashing moves
# ~W/(W+1) of ALL rows, while rendezvous hashing provably moves only
# ~1/(W+1), every one of them INTO the new shard. The query assigns
# every doc under both worlds (W_OLD and W_NEW shards) and emits, per
# old shard, the exact movement count in ppm — with an
# `n_moved_elsewhere` column that the rendezvous monotonicity
# guarantee forces to zero (the audit self-evidences the property the
# operator exists for).
#
# Determinism / oracle story: a doc's weight for shard s is
# md5(doc_id || ':' || s) — lowercase hex in both engines; argmax is
# taken over the fixed-length string 'md5#ss' (s zero-padded), so the
# lexicographic max IS the (weight, shard) struct max, bit-identical
# cross-engine, no numeric conversion anywhere.
#
# Scale shape: W_NEW md5 evaluations per row, all map-side inside
# whole-stage codegen (the candidate array never leaves the row); the
# only shuffle carries one (shard_old, flags) row per doc into a
# 16-group partial agg. Output is W_OLD rows regardless of corpus
# size.

RDV_W_OLD = 16
RDV_W_NEW = 17


def _rdv_shard(w: int):
    cands = [
        F.concat(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(f":{s}")
                )
            ),
            F.lit(f"#{s:02d}"),
        )
        for s in range(w)
    ]
    return F.substring(F.array_max(F.array(*cands)), 34, 2).cast("int")


def q_docs_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assigned = docs.select(
        _rdv_shard(RDV_W_OLD).alias("shard"),
        _rdv_shard(RDV_W_NEW).alias("shard_new"),
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                (F.col("shard_new") != F.col("shard")).cast("long")
            ).alias("n_moved"),
            F.sum(
                (
                    (F.col("shard_new") != F.col("shard"))
                    & (F.col("shard_new") != F.lit(RDV_W_OLD))
                ).cast("long")
            ).alias("n_moved_elsewhere"),
        )
        .withColumn("moved_ppm", F.expr("n_moved * 1000000 DIV n_docs"))
        .orderBy("shard")
    )


def _rdv_oracle() -> str:
    def assign(w: int, alias: str) -> str:
        return f"""
  SELECT doc_id,
         CAST(substr(max(md5(CAST(doc_id AS VARCHAR) || ':'
                              || CAST(s AS VARCHAR))
                         || '#' || lpad(CAST(s AS VARCHAR), 2, '0')),
                     34, 2) AS INTEGER) AS {alias}
  FROM documents CROSS JOIN (SELECT unnest(range(0, {w})) AS s)
  GROUP BY doc_id"""

    return f"""
WITH olds AS ({assign(RDV_W_OLD, "shard")}),
news AS ({assign(RDV_W_NEW, "shard_new")}),
j AS (SELECT o.shard, n.shard_new
      FROM olds o JOIN news n USING (doc_id))
SELECT shard, count(*) AS n_docs,
       CAST(sum(CASE WHEN shard_new <> shard THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved,
       CAST(sum(CASE WHEN shard_new <> shard
                      AND shard_new <> {RDV_W_OLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved_elsewhere,
       CAST(sum(CASE WHEN shard_new <> shard THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS moved_ppm
FROM j
GROUP BY shard
ORDER BY shard
"""


QUERIES["docs_rendezvous_shards"] = q_docs_rendezvous_shards
ORACLES["docs_rendezvous_shards"] = _rdv_oracle()


# ---------------------------------------------- source-overlap matrix
# Source × source near-duplicate overlap matrix — the crawl-overlap
# report a corpus acquisition team reads before paying for a new
# source: how many of source B's documents are near-duplicates of
# what source A already delivers (and how much of each source
# duplicates ITSELF). Built by joining the exact-Jaccard
# near-duplicate pairs (docs_jaccard_pairs, called unchanged — the
# composition pattern of docs_dedup_method_eval / kg_merge_audit)
# back to document sources; pairs collapse onto the canonical
# (least, greatest) source combination so intra-source pairs land on
# the diagonal. cross_rate_ppb normalizes by the pair universe
# n_docs_a × n_docs_b (ppb — per-billion — because real cross-source
# dup rates at corpus scale are tiny and would round to 0 in ppm).
#
# Scale shape: the pair table carries one row per NEAR-DUP PAIR (df-
# cutoff bounded, never all-pairs); two broadcast-joinable lookups
# attach sources (documents pruned to (doc_id, source)); the matrix
# agg is |sources|² rows. The per-source doc counts ride in on a
# broadcast.


def q_docs_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deja_view_spark.queries_text import q_docs_jaccard_pairs

    pairs = q_docs_jaccard_pairs(spark, sf_dir).select("src_doc", "dst_doc")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = docs.select(
        F.col("doc_id").alias("src_doc"), F.col("source").alias("sa")
    )
    sb = docs.select(
        F.col("doc_id").alias("dst_doc"), F.col("source").alias("sb")
    )
    tagged = (
        pairs.join(sa, "src_doc")
        .join(sb, "dst_doc")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    mat = tagged.groupBy("source_a", "source_b").agg(
        F.count("*").alias("n_pairs")
    )
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    ca = counts.select(
        F.col("source").alias("source_a"), F.col("n_docs").alias("n_docs_a")
    )
    cb = counts.select(
        F.col("source").alias("source_b"), F.col("n_docs").alias("n_docs_b")
    )
    return (
        mat.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_pairs",
            "n_docs_a",
            "n_docs_b",
            F.expr(
                "n_pairs * 1000000000 DIV (n_docs_a * n_docs_b)"
            ).alias("cross_rate_ppb"),
        )
        .orderBy("source_a", "source_b")
    )


def _source_overlap_oracle() -> str:
    from deja_view_spark.queries_text import ORACLE_DOCS_JACCARD

    return f"""
WITH pairs AS (
  SELECT src_doc, dst_doc FROM ({ORACLE_DOCS_JACCARD})),
tagged AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM pairs p
  JOIN documents da ON p.src_doc = da.doc_id
  JOIN documents db ON p.dst_doc = db.doc_id),
mat AS (
  SELECT source_a, source_b, count(*) AS n_pairs
  FROM tagged GROUP BY 1, 2),
counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
SELECT m.source_a, m.source_b, m.n_pairs,
       ca.n_docs AS n_docs_a, cb.n_docs AS n_docs_b,
       CAST(m.n_pairs * 1000000000 // (ca.n_docs * cb.n_docs) AS BIGINT)
         AS cross_rate_ppb
FROM mat m
JOIN counts ca ON m.source_a = ca.source
JOIN counts cb ON m.source_b = cb.source
ORDER BY source_a, source_b
"""


QUERIES["docs_source_overlap"] = q_docs_source_overlap
ORACLES["docs_source_overlap"] = _source_overlap_oracle()
