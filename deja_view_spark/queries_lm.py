"""Statistical-LM corpus filters (driver-checkable).

Two selection operators a pre-training data pipeline runs after the
structural quality gates (queries_quality.py) and before sampling
(queries_corpus.py) — both published methods, both re-expressed as
pure DataFrame plans with full cross-engine oracles:

  docs_lm_perplexity  CCNet-style language-model filtering (Wenzek et
                      al., arXiv:1911.00359 §4.3): train an add-k
                      bigram LM on an in-domain slice, score every
                      document by bits-per-bigram under that LM, keep
                      the low-perplexity tail. The reference repo has
                      no batch corpus path at all (it scores one issue
                      at a time against Chroma); this is the filter
                      CCNet/RedPajama run over each CommonCrawl dump.
  docs_dsir_weights   Data Selection via Importance Resampling (Xie et
                      al., arXiv:2302.03169): hashed-n-gram importance
                      weights log(p_target/p_raw) per document against
                      a target-domain slice, top-K selection.

Scale shape (the reason these formulations were chosen):
  * The LM / the two DSIR histograms are BOUNDED-SIZE side tables by
    construction — the bigram model is pruned to the top LM_TOP_BIGRAMS
    rows (sorted limit = TakeOrdered, never a global sort), the context
    table is unigram-vocab-sized, the DSIR histograms are exactly
    DSIR_BUCKETS rows each. All of them broadcast; the scoring pass is
    therefore ONE explode + broadcast hash joins + one per-doc partial
    agg — no shuffle keyed on anything corpus-sized except doc_id.
  * Model building is one explode + one hash aggregation over the
    train/target slice with full map-side combine (keys are n-grams,
    values are counts).
  * Per-doc scoring aggregates (doc, gram) COUNTS first (integers),
    then folds count x weight — fewer float terms and a smaller
    shuffle than summing per-occurrence rows.

Oracle-parity discipline (house rules): every constant below is
rendered into both engines from this module; md5 is the cross-engine
hash for DSIR bucketing; tokenization is the shared TOKEN_RE; floats
round to 4dp, and order-sensitive LIMITs sort on the ROUNDED value
with doc_id as the total-order tiebreak. The only cross-engine
divergence risk is libm log ulps, ~1e-13 relative against a 1e-4
rounding grid — the same accepted risk class as the cosine queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deja_view_spark.queries_text import TOKEN_RE, _shingles_from_toks
from deja_view_spark.sources.catalog import load_table

# ----------------------------------------------------------------- constants
LM_TRAIN_LANG = "en"      # in-domain slice the bigram LM is fit on
LM_ADD_K = 0.5            # add-k smoothing mass
LM_TOP_BIGRAMS = 4096     # model pruned to the top-count bigrams
DSIR_BUCKETS = 1024       # hashed-feature space size (DSIR §2.2)
DSIR_TARGET_SOURCES = ("src1", "src2", "src3")  # target-domain proxy
DSIR_TOP_K = 200          # resampled selection size


def _bigram_col(text_col):
    toks = F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_RE), 0)
    return _shingles_from_toks(toks, 2)


_SQL_BIGRAMS = (
    "list_transform(generate_series(1, len(toks) - 1),"
    " i -> concat_ws(' ', toks[i], toks[i+1]))"
)
_SQL_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks"


# ------------------------------------------------- CCNet-style LM filter
def q_docs_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bits-per-bigram of every document under an add-k bigram LM fit
    on the LM_TRAIN_LANG slice, plus the CCNet keep gate.

    p(w2|w1) = (c2(w1 w2) + k) / (c1(w1) + k*V) where c2 comes from the
    top-LM_TOP_BIGRAMS pruned model (absent => 0), c1 is the UNPRUNED
    context mass (so pruning only ever RAISES a score, it never
    manufactures probability), and V = distinct continuations in the
    train slice. Unseen contexts degrade to k/(k*V) = 1/V — the uniform
    floor. ppl_bucket = head/middle/tail perplexity terciles PER
    LANGUAGE (CCNet §4.3's split), assigned by ntile(3) over the total
    order (rounded bits, doc_id) — integer ranks, bit-exact across
    engines by construction.

    Plan: model fit = filter (pushed to the scan) + one explode + one
    count agg; pruning is a sorted limit (TakeOrderedAndProject);
    scoring = one explode + per-(doc, bigram) integer counts +
    broadcast joins against the bounded model/context/V tables + one
    per-doc agg. The tercile window sorts one fixed-width row per doc
    within each language — at 100 TB swap it for a two-pass
    approx-percentile cutoff (compute per-lang tercile bits once,
    then a map-side comparison); ntile is kept here because exact
    integer ranks are what a value-hash oracle can certify.
    """
    docs = load_table(spark, sf_dir, "documents")
    train_bg = docs.where(F.col("lang") == LM_TRAIN_LANG).select(
        F.explode(_bigram_col(F.col("text"))).alias("bg")
    )
    c2_full = train_bg.groupBy("bg").agg(F.count("*").alias("c2"))
    model = c2_full.orderBy(F.desc("c2"), F.asc("bg")).limit(LM_TOP_BIGRAMS)
    ctx = c2_full.groupBy(
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1")
    ).agg(F.sum("c2").alias("c1"))
    vocab = c2_full.agg(
        F.count_distinct(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2))
        ).alias("vsz")
    )

    db = (
        docs.select("doc_id", "lang", F.explode(_bigram_col(F.col("text"))).alias("bg"))
        .groupBy("doc_id", "lang", "bg")
        .agg(F.count("*").alias("cnt"))
    )
    scored = (
        db.join(F.broadcast(model), "bg", "left")
        .join(
            F.broadcast(ctx),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)) == F.col("w1"),
            "left",
        )
        .join(F.broadcast(vocab))
        .withColumn(
            "bits",
            -F.log2(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(LM_ADD_K))
                / (
                    F.coalesce(F.col("c1"), F.lit(0))
                    + F.lit(LM_ADD_K) * F.col("vsz")
                )
            ),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.round(
            F.sum(F.col("cnt") * F.col("bits")) / F.sum("cnt"), 4
        ).alias("bits_per_bigram"),
    )
    from pyspark.sql import Window

    tercile = F.ntile(3).over(
        Window.partitionBy("lang").orderBy("bits_per_bigram", "doc_id")
    )
    return per_doc.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "bits_per_bigram",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), tercile
        ).alias("ppl_bucket"),
    ).orderBy("doc_id")


ORACLE_DOCS_LM_PERPLEXITY = f"""
WITH train AS (
  SELECT {_SQL_TOKS} FROM documents WHERE lang = '{LM_TRAIN_LANG}'),
tb AS (
  SELECT unnest({_SQL_BIGRAMS}) AS bg FROM train WHERE len(toks) >= 2),
c2_full AS (
  SELECT bg, count(*)::BIGINT AS c2 FROM tb GROUP BY bg),
model AS (
  SELECT bg, c2 FROM c2_full ORDER BY c2 DESC, bg ASC LIMIT {LM_TOP_BIGRAMS}),
ctx AS (
  SELECT split_part(bg, ' ', 1) AS w1, sum(c2)::BIGINT AS c1
  FROM c2_full GROUP BY 1),
vocab AS (
  SELECT count(DISTINCT split_part(bg, ' ', 2))::BIGINT AS vsz FROM c2_full),
alldocs AS (
  SELECT doc_id, lang, {_SQL_TOKS} FROM documents),
db AS (
  SELECT doc_id, lang, bg, count(*)::BIGINT AS cnt
  FROM (SELECT doc_id, lang, unnest({_SQL_BIGRAMS}) AS bg
        FROM alldocs WHERE len(toks) >= 2)
  GROUP BY 1, 2, 3),
sc AS (
  SELECT doc_id, lang, cnt,
         -log2((coalesce(m.c2, 0) + {LM_ADD_K})
               / (coalesce(x.c1, 0) + {LM_ADD_K} * v.vsz)) AS bits
  FROM db
  LEFT JOIN model m USING (bg)
  LEFT JOIN ctx x ON split_part(db.bg, ' ', 1) = x.w1
  CROSS JOIN vocab v),
per_doc AS (
  SELECT doc_id, lang, sum(cnt)::BIGINT AS n_bigrams,
         round(sum(cnt * bits) / sum(cnt), 4) AS bits_per_bigram
  FROM sc GROUP BY 1, 2)
SELECT doc_id, lang, n_bigrams, bits_per_bigram,
       (['head', 'middle', 'tail'])[
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY bits_per_bigram, doc_id)] AS ppl_bucket
FROM per_doc ORDER BY doc_id
"""


# ------------------------------------------------------ DSIR selection
def _bucket_col(feat):
    """md5-prefix bucket in [0, DSIR_BUCKETS) — the cross-engine
    deterministic stand-in for DSIR's hashed n-gram featurizer."""
    return (
        F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("bigint")
        % DSIR_BUCKETS
    )


def _sql_bucket(feat: str) -> str:
    return f"(('0x' || substr(md5({feat}), 1, 8))::BIGINT % {DSIR_BUCKETS})"


def q_docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-DSIR_TOP_K documents by hashed-n-gram importance weight
    against the DSIR_TARGET_SOURCES domain.

    Features are unigrams + bigrams hashed into DSIR_BUCKETS buckets;
    weight(doc) = mean over its feature occurrences of
    ln((t_b + 1)/(N_t + B)) - ln((r_b + 1)/(N_r + B)) — the
    Laplace-smoothed log importance ratio of the target vs the raw
    bucket distributions. Selection = sorted limit on the ROUNDED
    weight with doc_id tiebreak (identical ordering in both engines).

    Plan: ONE explode + ONE (doc, bucket) partial agg is the only
    corpus-sized work — BOTH histograms then derive from those counts
    (hist[b] = sum of per-doc counts; the target count is a
    conditional sum riding the same B-key agg), so the tokenizer and
    the md5 bucketing run exactly once per feature occurrence (the
    two-pass formulation measured 39 s at the 50k-doc stress row; this
    one re-aggregates a table that is already counts). The B-row
    log-ratio table broadcasts back; the finish is TakeOrdered.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
    feats = F.concat(toks, _shingles_from_toks(toks, 2))
    doc_bucket = (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.explode(feats).alias("feat"),
        )
        .select(
            "doc_id", "lang", "source", _bucket_col(F.col("feat")).alias("b")
        )
        .groupBy("doc_id", "lang", "source", "b")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )

    hist = doc_bucket.groupBy("b").agg(
        F.sum("cnt").alias("rcnt"),
        F.sum(
            F.when(
                F.col("source").isin(*DSIR_TARGET_SOURCES), F.col("cnt")
            ).otherwise(F.lit(0))
        ).alias("tcnt"),
    )
    totals = hist.agg(
        F.sum("rcnt").alias("n_r"), F.sum("tcnt").alias("n_t")
    )

    per_bucket = hist.join(F.broadcast(totals)).select(
        "b",
        (
            F.log(
                (F.col("tcnt") + F.lit(1)) / (F.col("n_t") + F.lit(DSIR_BUCKETS))
            )
            - F.log(
                (F.col("rcnt") + F.lit(1)) / (F.col("n_r") + F.lit(DSIR_BUCKETS))
            )
        ).alias("lr"),
    )

    per_doc = (
        doc_bucket.join(F.broadcast(per_bucket), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.round(
                F.sum(F.col("cnt") * F.col("lr")) / F.sum("cnt"), 4
            ).alias("dsir_weight"),
        )
    )
    return per_doc.orderBy(
        F.desc("dsir_weight"), F.asc("doc_id")
    ).limit(DSIR_TOP_K)


_DSIR_SRC_LIST = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)

ORACLE_DOCS_DSIR_WEIGHTS = f"""
WITH base AS (
  SELECT doc_id, lang, source, {_sql_bucket('feat')} AS b
  FROM (
    SELECT doc_id, lang, source,
           unnest(list_concat(toks, {_SQL_BIGRAMS})) AS feat
    FROM (SELECT doc_id, lang, source, {_SQL_TOKS} FROM documents))),
tgt AS (
  SELECT b, count(*)::BIGINT AS tcnt FROM base
  WHERE source IN ({_DSIR_SRC_LIST}) GROUP BY b),
raw AS (
  SELECT b, count(*)::BIGINT AS rcnt FROM base GROUP BY b),
nt AS (SELECT sum(tcnt)::BIGINT AS n_t FROM tgt),
nr AS (SELECT sum(rcnt)::BIGINT AS n_r FROM raw),
per_bucket AS (
  SELECT raw.b,
         ln((coalesce(tgt.tcnt, 0) + 1) / (nt.n_t + {DSIR_BUCKETS}))
         - ln((raw.rcnt + 1) / (nr.n_r + {DSIR_BUCKETS})) AS lr
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN nt CROSS JOIN nr),
per_doc AS (
  SELECT doc_id, lang, sum(cnt)::BIGINT AS n_feats,
         round(sum(cnt * lr) / sum(cnt), 4) AS dsir_weight
  FROM (SELECT doc_id, lang, b, count(*)::BIGINT AS cnt
        FROM base GROUP BY 1, 2, 3) dc
  JOIN per_bucket USING (b)
  GROUP BY 1, 2)
SELECT doc_id, lang, n_feats, dsir_weight
FROM per_doc
ORDER BY dsir_weight DESC, doc_id ASC
LIMIT {DSIR_TOP_K}
"""


QUERIES = {
    "docs_lm_perplexity": q_docs_lm_perplexity,
    "docs_dsir_weights": q_docs_dsir_weights,
}
ORACLES = {
    "docs_lm_perplexity": ORACLE_DOCS_LM_PERPLEXITY,
    "docs_dsir_weights": ORACLE_DOCS_DSIR_WEIGHTS,
}
