"""Retrieval-stack queries (driver-checkable): BM25 lexical ranking,
hybrid lexical+semantic fusion (RRF), and a two-hop KG triple-pattern
traversal.

These extend the reference's single-modality semantic search
(github_similarity_service.py:397-447 embeds a probe and asks Chroma
for nearest neighbors) with the lexical and fused counterparts a
production retrieval stack pairs with ANN, plus the graph-traversal
query shape the KG pipeline's materialized triples exist to serve.

Cross-engine determinism discipline (same as queries_corpus TF-IDF):
``F.log``/DuckDB ``ln`` agree after round(.., 4); every ranking orders
by the ROUNDED score with an id tiebreak so row_number is stable; RRF
scores are built from integer ranks only, so the fusion arithmetic is
bit-identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deja_view_spark.functions.similarity import cosine_sim, duckdb_cosine_sql
from deja_view_spark.queries_graph import SQL_CHAIN_EDGES_CTES
from deja_view_spark.sources.catalog import load_table

TOKEN_RE = "[a-z0-9_]+"

# fixed lexical probe: terms chosen from the synthetic corpus vocabulary
BM25_TERMS = ["join", "window", "vector"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20

RRF_K = 60  # standard reciprocal-rank-fusion constant
RRF_POOL = 50  # candidates taken from each ranker before fusion
HYBRID_PROBE_ID = 7  # semantic probe: embeddings.vec_id == 7
HYBRID_TOP_K = 20

TWO_HOP_TOP_K = 25


# --------------------------------------------------------------- BM25
def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BM25 score for the fixed query BM25_TERMS.

    Scale shape: ONE tokenize pass per row — dl and every per-term tf
    come out of a single ``aggregate`` fold over the token array, so
    Catalyst's CollapseProject cannot inline the regexp tokenizer once
    per consumer (it would otherwise run 1 + len(terms) times per row).
    Corpus stats (N, avgdl, per-term df) are a single-row aggregate
    broadcast back over the scored table — two scans of a pruned
    (doc_id, text) projection total, no driver collect, no explode:
    the inverted-index-free formulation that scales linearly.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
    acc0 = F.struct(
        F.lit(0).alias("dl"),
        *[F.lit(0).alias(f"tf{i}") for i in range(len(BM25_TERMS))],
    )
    fold = F.aggregate(
        toks,
        acc0,
        lambda acc, x: F.struct(
            (acc["dl"] + 1).alias("dl"),
            *[
                (
                    acc[f"tf{i}"]
                    + F.when(x == F.lit(t), F.lit(1)).otherwise(F.lit(0))
                ).alias(f"tf{i}")
                for i, t in enumerate(BM25_TERMS)
            ],
        ),
    )
    base = docs.select("doc_id", fold.alias("c")).select(
        "doc_id",
        F.col("c.dl").alias("dl"),
        *[F.col(f"c.tf{i}").alias(f"tf{i}") for i in range(len(BM25_TERMS))],
    )
    stats = base.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    norm = 1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    score = F.lit(0.0)
    for i in range(len(BM25_TERMS)):
        tf = F.col(f"tf{i}")
        idf = F.log(
            1.0
            + (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        score = score + idf * tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * norm)
    return scored.select("doc_id", F.round(score, 4).alias("bm25"))


def _sql_bm25_scored() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    terms = " + ".join(
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * tf{i} * ({BM25_K1} + 1.0)"
        f" / (tf{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
        for i in range(len(BM25_TERMS))
    )
    return f"""
tokd AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents),
base AS (
  SELECT doc_id, len(toks) AS dl, {tf_cols} FROM tokd),
stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl, {df_cols} FROM base),
bm25_scored AS (
  SELECT doc_id, round({terms}, 4) AS bm25 FROM base CROSS JOIN stats)"""


def q_docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k BM25 lexical retrieval for the fixed query. The final
    ranking is a sorted limit (TakeOrderedAndProject — no global
    sort materializes)."""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOP_K)
    )


ORACLE_DOCS_BM25 = f"""
WITH {_sql_bm25_scored()}
SELECT doc_id, bm25 FROM bm25_scored
ORDER BY bm25 DESC, doc_id ASC
LIMIT {BM25_TOP_K}
"""


# ------------------------------------------------- hybrid fusion (RRF)
def q_docs_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 ranking and
    a cosine-similarity ranking for the probe embedding
    (vec_id == HYBRID_PROBE_ID), rrf = sum over rankers of
    1 / (RRF_K + rank).

    Scale shape: each ranker reduces to a sorted limit of RRF_POOL rows
    (TakeOrderedAndProject — scales; the rank window then runs over the
    already-pooled RRF_POOL rows, a metadata-sized single partition,
    NOT over the corpus). The probe row rides a broadcast, the fusion
    join is RRF_POOL x RRF_POOL row-count, and the fused scores are
    functions of INTEGER ranks only, so they are bit-identical across
    engines with no float-fold caveats."""
    lex_pool = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RRF_POOL)
    )
    w_lex = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = lex_pool.select(
        "doc_id", F.row_number().over(w_lex).alias("rank_lex")
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.where(F.col("vec_id") == HYBRID_PROBE_ID).select(
        F.col("embedding").alias("probe_vec")
    )
    sem_pool = (
        emb.where(F.col("vec_id") != HYBRID_PROBE_ID)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                cosine_sim(F.col("embedding"), F.col("probe_vec")), 4
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(RRF_POOL)
    )
    w_sem = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    sem = sem_pool.select(
        "doc_id", F.row_number().over(w_sem).alias("rank_sem")
    )

    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(
                1.0 / (F.lit(RRF_K) + F.col("rank_sem")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
        "rank_lex",
        "rank_sem",
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(HYBRID_TOP_K)


ORACLE_DOCS_HYBRID_RRF = f"""
WITH {_sql_bm25_scored()},
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_lex
  FROM bm25_scored
  ORDER BY bm25 DESC, doc_id ASC
  LIMIT {RRF_POOL}),
sem AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS rank_sem
  FROM (
    SELECT e.vec_id AS doc_id,
           round({duckdb_cosine_sql('e.embedding', 'p.embedding')}, 4) AS cos
    FROM embeddings e,
         (SELECT embedding FROM embeddings
          WHERE vec_id = {HYBRID_PROBE_ID}) p
    WHERE e.vec_id <> {HYBRID_PROBE_ID})
  ORDER BY cos DESC, doc_id ASC
  LIMIT {RRF_POOL})
SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       round(coalesce(1.0 / ({RRF_K} + rank_lex), 0.0)
             + coalesce(1.0 / ({RRF_K} + rank_sem), 0.0), 6) AS rrf,
       rank_lex, rank_sem
FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
ORDER BY rrf DESC, doc_id ASC
LIMIT {HYBRID_TOP_K}
"""


# ------------------------------------------- two-hop triple traversal
def q_kg_two_hop(
    spark: SparkSession, sf_dir: str, max_mid_degree: int | None = None
) -> DataFrame:
    """Two-hop triple-pattern traversal over the co-engagement KG:
    match (a)-[:chain]->(b)-[:chain]->(c) with a <> c and count the
    distinct intermediates per (a, c) endpoint pair — the canonical
    "related via shared neighbor" KG query the materialized triple
    table exists to answer (the reference's duplicate graph supports
    exactly this shape of transitive lookup).

    Scale shape: the hop is ONE shuffle — both edge aliases hash on the
    join key (dst = src), and the endpoint aggregation shuffles (a, c)
    pairs with full map-side combine. Edges are distinct by
    construction, so count(*) per (a, c) IS the distinct-intermediate
    count — no count(distinct) expansion. At 100x scale the only
    hazard is super-node skew on b; AQE skew-join splitting handles
    the moderate case (enabled session-wide), and `max_mid_degree` is
    the coded escalation for the pathological one: intermediates whose
    total degree exceeds the cap are dropped BEFORE the hop join (a
    d-degree hub alone emits ~d^2 pairs — one 10M-degree node is 10^14
    rows out of a single key). The keep-set semi-joins hash on the
    same hop key as the hop itself, so the pre-filter rides the
    exchange the join already pays; the degree census is one partial
    agg over the edge list. Capped results are an explicit
    approximation (hub-routed pairs are excluded — hubs in real KGs
    are stop-word-like entities whose co-occurrence signal is noise),
    so the default (None) stays oracle-exact."""
    from deja_view_spark.queries_graph import _chain_edges

    edges = _chain_edges(spark, sf_dir)
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    if max_mid_degree is not None:
        keep = (
            edges.select(F.col("dst").alias("b"))
            .unionByName(edges.select(F.col("src").alias("b")))
            .groupBy("b")
            .agg(F.count("*").alias("deg"))
            .where(F.col("deg") <= max_mid_degree)
            .select("b")
        )
        # leftsemi on the hop key: co-partitioned with the hop join,
        # no extra data-sized exchange; never broadcast (the keep set
        # is node-sized — almost everything is below the cap)
        e1 = e1.join(keep, "b", "leftsemi")
        e2 = e2.join(keep, "b", "leftsemi")
    return (
        e1.join(e2, "b")
        .where(F.col("a") != F.col("c"))
        .groupBy("a", "c")
        .agg(F.count("*").alias("n_mids"))
        .orderBy(F.desc("n_mids"), F.asc("a"), F.asc("c"))
        .limit(TWO_HOP_TOP_K)
    )


ORACLE_KG_TWO_HOP = f"""
WITH {SQL_CHAIN_EDGES_CTES}
SELECT e1.src AS a, e2.dst AS c, count(*) AS n_mids
FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
WHERE e1.src <> e2.dst
GROUP BY e1.src, e2.dst
ORDER BY n_mids DESC, a ASC, c ASC
LIMIT {TWO_HOP_TOP_K}
"""


QUERIES = {
    "docs_bm25_topk": q_docs_bm25_topk,
    "docs_hybrid_rrf": q_docs_hybrid_rrf,
    "kg_two_hop": q_kg_two_hop,
}

ORACLES = {
    "docs_bm25_topk": ORACLE_DOCS_BM25,
    "docs_hybrid_rrf": ORACLE_DOCS_HYBRID_RRF,
    "kg_two_hop": ORACLE_KG_TWO_HOP,
}


# --------------------------------------- MMR diversified top-k (ANN+)
# Carbonell-Goldstein 1998 maximal marginal relevance: greedy-select K
# results maximizing lambda*rel(q,d) - (1-lambda)*max_{s in S} sim(d,s)
# — the dedup-aware serving layer over ANN (a plain top-k over a
# near-dup-heavy corpus returns K copies of one document; MMR returns
# the K most relevant NON-redundant ones). Determinism: cosine is
# bit-identical cross-engine (list_dot_product DOUBLE == zip_with
# sequential fold, see functions/similarity.duckdb_cosine_sql), so
# every greedy argmax (vec_id tiebreak) picks the same row in both
# engines; the emitted columns are INTEGERS (selection rank, ids).
MMR_LAMBDA = 0.5
MMR_POOL = 32
MMR_K = 8
MMR_PROBES = 3  # probes = vec_id < MMR_PROBES


def q_embeddings_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-{MMR_K} per probe over a {MMR_POOL}-vector
    relevance pool.

    Scale shape: the corpus is touched ONCE by the pooled relevance
    scan (probe side broadcast, per-probe sorted limit); everything
    after operates on probes x {MMR_POOL} rows — each greedy round is
    an argmin partial agg + a broadcast join against the one-row-per-
    probe pick, with the pool localCheckpoint'ed per round (the
    iterative-lineage rule; state is pool-sized, never corpus-sized).
    The greedy loop is inherently sequential in K, but K is a serving
    constant — no driver-side math, no Python, no corpus rescan."""
    from deja_view_spark.functions.similarity import l2_norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    probes = emb.where(F.col("vec_id") < MMR_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pv"),
        F.col("nrm").alias("pn"),
    )
    scored = (
        emb.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .withColumn(
            "rel",
            F.expr(
                "aggregate(zip_with(embedding, pv, (x, y) -> x * y),"
                " CAST(0.0 AS DOUBLE), (a, x) -> a + x) / (nrm * pn)"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("rel"), F.asc("vec_id"))
    pool = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= MMR_POOL)
        .select(
            "probe_id",
            "vec_id",
            "embedding",
            "nrm",
            "rel",
            F.lit(-1.0).cast("double").alias("maxsel"),
        )
        .localCheckpoint(eager=False)
    )
    picks = None
    for step in range(1, MMR_K + 1):
        score = (
            F.lit(MMR_LAMBDA) * F.col("rel")
            - F.lit(1.0 - MMR_LAMBDA) * F.col("maxsel")
        )
        best = (
            pool.withColumn("_s", score)
            .groupBy("probe_id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("_s")).alias("ns"),
                        F.col("vec_id").alias("vec_id"),
                    )
                ).alias("m")
            )
            .select("probe_id", F.col("m.vec_id").alias("sel_id"))
        )
        sel = (
            pool.join(
                best.withColumnRenamed("sel_id", "vec_id"),
                ["probe_id", "vec_id"],
            )
            .select(
                "probe_id",
                F.col("vec_id").alias("sel_id"),
                F.col("embedding").alias("sv"),
                F.col("nrm").alias("sn"),
            )
        )
        step_picks = sel.select(
            "probe_id", F.lit(step).alias("mmr_rank"), "sel_id"
        )
        picks = (
            step_picks
            if picks is None
            else picks.unionByName(step_picks)
        )
        pool = (
            pool.join(F.broadcast(sel), "probe_id")
            .where(F.col("vec_id") != F.col("sel_id"))
            .withColumn(
                "_sim",
                F.expr(
                    "aggregate(zip_with(embedding, sv, (x, y) -> x * y),"
                    " CAST(0.0 AS DOUBLE), (a, x) -> a + x) / (nrm * sn)"
                ),
            )
            .select(
                "probe_id",
                "vec_id",
                "embedding",
                "nrm",
                "rel",
                F.greatest("maxsel", "_sim").alias("maxsel"),
            )
            .localCheckpoint(eager=False)
        )
    return picks.select(
        "probe_id", "mmr_rank", F.col("sel_id").alias("vec_id")
    ).orderBy("probe_id", "mmr_rank")


def _oracle_mmr() -> str:
    cos_sel = duckdb_cosine_sql("p.embedding", "s.embedding")
    rounds = []
    prev_pool = "pool0"
    prev_picks = []
    for step in range(1, MMR_K + 1):
        rounds.append(f"""
best{step} AS (
  SELECT probe_id, vec_id AS sel_id
  FROM (
    SELECT probe_id, vec_id,
           row_number() OVER (
             PARTITION BY probe_id
             ORDER BY {MMR_LAMBDA} * rel - {1.0 - MMR_LAMBDA} * maxsel
               DESC, vec_id) AS rn
    FROM {prev_pool}) WHERE rn = 1),
pool{step} AS MATERIALIZED (
  SELECT p.probe_id, p.vec_id, p.embedding, p.rel,
         greatest(p.maxsel, {cos_sel}) AS maxsel
  FROM {prev_pool} p
  JOIN best{step} b ON p.probe_id = b.probe_id
  JOIN emb s ON s.vec_id = b.sel_id
  WHERE p.vec_id <> b.sel_id)""")
        prev_picks.append(
            f"SELECT probe_id, {step} AS mmr_rank, sel_id FROM best{step}"
        )
        prev_pool = f"pool{step}"
    chain = ",".join(rounds)
    picks = " UNION ALL ".join(prev_picks)
    return f"""
WITH emb AS (SELECT vec_id, embedding FROM embeddings),
probes AS (
  SELECT vec_id AS probe_id, embedding AS pv FROM emb
  WHERE vec_id < {MMR_PROBES}),
scored AS (
  SELECT p.probe_id, e.vec_id, e.embedding,
         {duckdb_cosine_sql('e.embedding', 'p.pv')} AS rel
  FROM emb e JOIN probes p ON e.vec_id <> p.probe_id),
pool0 AS MATERIALIZED (
  SELECT probe_id, vec_id, embedding, rel, -1.0::DOUBLE AS maxsel
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY probe_id ORDER BY rel DESC, vec_id) AS rk
    FROM scored) WHERE rk <= {MMR_POOL}),{chain}
SELECT probe_id, mmr_rank, sel_id AS vec_id FROM ({picks})
ORDER BY probe_id, mmr_rank
"""


ORACLE_EMBEDDINGS_MMR = _oracle_mmr()

QUERIES["embeddings_mmr_topk"] = q_embeddings_mmr_topk
ORACLES["embeddings_mmr_topk"] = ORACLE_EMBEDDINGS_MMR


# ---------------------------------------------- hard-negative mining
# Contrastive-training hard negatives (the DPR / SimCSE curation
# step): for each anchor, the top-K highest-cosine candidates that are
# (a) NOT the anchor, (b) from a DIFFERENT class (label), and (c) below
# the near-duplicate ceiling (rounded cos < HN_MAX_COS — anything above
# it is a probable positive/duplicate leaking into the negative set,
# the classic false-negative poisoning failure). "Hard" = closest to
# the decision boundary, which is exactly what makes training signal.
#
# Scale shape: the SAME hyperplane-LSH candidate generation as
# ann_lsh_topk (bucket-colliding candidates only, anchors broadcast),
# with the label / ceiling / self filters applied BEFORE the per-anchor
# window so pruned candidates never reach the top-k sort. The
# brute-force oracle doubles as a recall==1.0 assertion at these
# (bands, rows) on this corpus (same discipline as ann_lsh_topk).
# Ranking is on the ROUNDED cosine with id tiebreak — stable across
# engines and float-fold orders.
HN_K = 5
HN_MAX_COS = 0.95
HN_ANCHOR_MOD = 10


def q_embeddings_hard_negatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from deja_view_spark.functions.hashing import make_simhash_udf

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") % HN_ANCHOR_MOD == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("avec"),
        F.col("label").alias("alabel"),
    )
    sh = make_simhash_udf(bands=64, rows=4, seed=4242)
    cand_bands = emb.select(
        F.col("vec_id").alias("negative_id"),
        F.col("embedding").alias("nvec"),
        F.col("label").alias("nlabel"),
        F.explode(sh(F.col("embedding"))).alias("band"),
    )
    anchor_bands = anchors.select(
        "anchor_id", "avec", "alabel", F.explode(sh(F.col("avec"))).alias("band")
    )
    cands = (
        cand_bands.join(
            F.broadcast(anchor_bands),
            (cand_bands.band == anchor_bands.band)
            & (F.col("negative_id") != F.col("anchor_id"))
            & (F.col("nlabel") != F.col("alabel")),
        )
        .select("anchor_id", "avec", "negative_id", "nvec", "nlabel", "alabel")
        .distinct()
    )
    scored = cands.withColumn(
        "cos", F.round(cosine_sim(F.col("nvec"), F.col("avec")), 4)
    ).where(F.col("cos") < HN_MAX_COS)
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos"), F.asc("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= HN_K)
        .select(
            "anchor_id",
            F.col("alabel").alias("anchor_label"),
            "negative_id",
            F.col("nlabel").alias("negative_label"),
            "cos",
            "rank",
        )
        .orderBy("anchor_id", "rank")
    )


ORACLE_EMBEDDINGS_HARD_NEGATIVES = f"""
WITH scored AS (
  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
         e.vec_id AS negative_id, e.label AS negative_label,
         round({duckdb_cosine_sql('e.embedding', 'a.embedding')}, 4) AS cos
  FROM embeddings a, embeddings e
  WHERE a.vec_id % {HN_ANCHOR_MOD} = 0
    AND e.vec_id <> a.vec_id
    AND e.label <> a.label)
SELECT anchor_id, anchor_label, negative_id, negative_label, cos, rank
FROM (
  SELECT *,
         row_number() OVER (
           PARTITION BY anchor_id
           ORDER BY cos DESC, negative_id ASC) AS rank
  FROM scored
  WHERE cos < {HN_MAX_COS}) t
WHERE rank <= {HN_K}
ORDER BY anchor_id, rank
"""

QUERIES["embeddings_hard_negatives"] = q_embeddings_hard_negatives
ORACLES["embeddings_hard_negatives"] = ORACLE_EMBEDDINGS_HARD_NEGATIVES


# ------------------------------------------- int8 scalar quantization
# The third leg of the vector-index compression story (alongside
# embeddings_pq and ann_ivf_topk): int8 scalar quantization of the
# whole embedding table — a 512-byte double vector becomes 64 signed
# bytes — and top-k retrieval by EXACT INTEGER dot product over the
# codes. This is the SQ8 storage mode every production vector store
# offers (faiss ScalarQuantizer, Milvus/qdrant int8). Construction
# follows the cosine-preserving recipe: L2-NORMALIZE first (dot of
# normalized vectors == cosine), then ONE symmetric global scale
# 127/gmax (gmax = max |component| over the normalized corpus) so the
# integer dot product is a monotone proxy of cosine up to quantization
# error — a per-dimension affine quantizer would add per-dim offsets
# that break rank equivalence, which is why faiss's cosine mode does
# exactly this. Scale shape: normalization and code generation are
# map-side transform()s in codegen; gmax is a single-row aggregate
# crossJoin-broadcast back (never collected); probes broadcast; the
# BIGINT dot folds in codegen and is order-independent, so the value
# hash covers the SCORES themselves, not just ranks (the float cosine
# queries can only hash ranks).
SQ8_LEVELS = 127
SQ8_PROBE_MAX = 10  # probes: vec_id < 10
SQ8_TOP_K = 3


def q_embeddings_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _sq8_codes(spark, sf_dir)
    probes = q.where(F.col("vec_id") < SQ8_PROBE_MAX).select(
        F.col("vec_id").alias("probe_id"), F.col("q").alias("qp")
    )
    scored = q.join(
        F.broadcast(probes), F.col("vec_id") != F.col("probe_id")
    ).select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        F.aggregate(
            F.zip_with("q", "qp", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot_q"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("dot_q"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= SQ8_TOP_K)
        .select("probe_id", "neighbor_id", "rank", "dot_q")
        .orderBy("probe_id", "rank")
    )


ORACLE_EMBEDDINGS_SQ8 = f"""
WITH pts AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
withn AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM pts),
n AS (
  SELECT vec_id, list_transform(v, x -> x / nrm) AS nx FROM withn),
g AS (
  SELECT max(list_max(list_transform(nx, x -> abs(x)))) AS gmax FROM n),
q AS (
  SELECT vec_id,
         list_transform(nx, x -> CAST(floor(x * ({float(SQ8_LEVELS)}
                                             / gmax)) AS BIGINT)) AS q
  FROM n CROSS JOIN g),
scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(p.q::DOUBLE[], c.q::DOUBLE[])
              AS BIGINT) AS dot_q
  FROM q p JOIN q c ON c.vec_id <> p.vec_id
  WHERE p.vec_id < {SQ8_PROBE_MAX})
SELECT probe_id, neighbor_id, rank, dot_q FROM (
  SELECT probe_id, neighbor_id, dot_q,
         row_number() OVER (PARTITION BY probe_id
           ORDER BY dot_q DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= {SQ8_TOP_K}
ORDER BY probe_id, rank
"""


QUERIES["embeddings_sq8_topk"] = q_embeddings_sq8_topk
ORACLES["embeddings_sq8_topk"] = ORACLE_EMBEDDINGS_SQ8


# --------------------------------------- two-stage SQ8 -> exact rerank
# The production retrieval pattern the SQ8 codes exist to serve:
# stage 1 scans the COMPRESSED table (integer dot over int8 codes,
# 8x less memory traffic) and keeps a small pool per probe; stage 2
# re-scores ONLY the pool with the exact float cosine and emits the
# final top-k. At 100 TB the exact vectors for stage 2 come from a
# point-lookup of pool-sized row ids — here the pool join IS that
# lookup. Recall is governed by the pool width (pool >> k soaks up
# quantization rank noise); correctness of the fused plan is oracle-
# checked end-to-end. Scale shape: stage 1 is the SQ8 plan (map-side
# codes, broadcast probes, BIGINT dot in codegen, per-probe window
# over pool-sized data); stage 2 joins the pool (|probes| x POOL rows,
# broadcast) back to the vector table — the expensive float cosine
# runs POOL times per probe, never corpus times.
SQ8_RERANK_POOL = 25
SQ8_RERANK_TOP_K = 3


def _sq8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared SQ8 code builder (see q_embeddings_sq8_topk)."""
    from deja_view_spark.functions.similarity import l2_norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    withn = emb.select("vec_id", "v", l2_norm(F.col("v")).alias("nrm"))
    n = withn.select(
        "vec_id",
        F.transform("v", lambda x: x / F.col("nrm")).alias("nx"),
    )
    g = n.agg(
        F.max(F.array_max(F.transform("nx", lambda x: F.abs(x)))).alias(
            "gmax"
        )
    )
    return n.crossJoin(F.broadcast(g)).select(
        "vec_id",
        F.transform(
            "nx",
            lambda x: F.floor(
                x * (F.lit(float(SQ8_LEVELS)) / F.col("gmax"))
            ).cast("long"),
        ).alias("q"),
    )


def q_embeddings_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _sq8_codes(spark, sf_dir)
    probes = q.where(F.col("vec_id") < SQ8_PROBE_MAX).select(
        F.col("vec_id").alias("probe_id"), F.col("q").alias("qp")
    )
    pooled = (
        q.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with("q", "qp", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_q"),
        )
        .withColumn(
            "prank",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(
                    F.desc("dot_q"), F.asc("neighbor_id")
                )
            ),
        )
        .where(F.col("prank") <= SQ8_RERANK_POOL)
        .select("probe_id", "neighbor_id")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    cand = pooled.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
        ),
        "neighbor_id",
    )
    pv = emb.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv")
    ).where(F.col("probe_id") < SQ8_PROBE_MAX)
    rescored = cand.join(F.broadcast(pv), "probe_id").select(
        "probe_id",
        "neighbor_id",
        F.round(cosine_sim(F.col("cv"), F.col("pv")), 4).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= SQ8_RERANK_TOP_K)
        .select("probe_id", "neighbor_id", "rank", "cos")
        .orderBy("probe_id", "rank")
    )


ORACLE_EMBEDDINGS_SQ8_RERANK = f"""
WITH pts AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
withn AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM pts),
n AS (
  SELECT vec_id, list_transform(v, x -> x / nrm) AS nx FROM withn),
g AS (
  SELECT max(list_max(list_transform(nx, x -> abs(x)))) AS gmax FROM n),
q AS (
  SELECT vec_id,
         list_transform(nx, x -> CAST(floor(x * ({float(SQ8_LEVELS)}
                                             / gmax)) AS BIGINT)) AS q
  FROM n CROSS JOIN g),
pooled AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY p.vec_id
             ORDER BY CAST(list_dot_product(p.q::DOUBLE[], c.q::DOUBLE[])
                           AS BIGINT) DESC,
                      c.vec_id ASC) AS prank
    FROM q p JOIN q c ON c.vec_id <> p.vec_id
    WHERE p.vec_id < {SQ8_PROBE_MAX}) t
  WHERE prank <= {SQ8_RERANK_POOL})
SELECT probe_id, neighbor_id, rank, cos FROM (
  SELECT probe_id, neighbor_id,
         round({duckdb_cosine_sql('c.embedding', 'p.embedding')}, 4)
           AS cos,
         row_number() OVER (PARTITION BY probe_id
           ORDER BY round({duckdb_cosine_sql('c.embedding', 'p.embedding')},
                          4) DESC,
                    neighbor_id ASC) AS rank
  FROM pooled
  JOIN embeddings c ON neighbor_id = c.vec_id
  JOIN embeddings p ON probe_id = p.vec_id) t
WHERE rank <= {SQ8_RERANK_TOP_K}
ORDER BY probe_id, rank
"""


QUERIES["embeddings_sq8_rerank"] = q_embeddings_sq8_rerank
ORACLES["embeddings_sq8_rerank"] = ORACLE_EMBEDDINGS_SQ8_RERANK


# ------------------------------------------- label-coherence report
# Embedding-space health check against the labeled embeddings table:
# per label, the 4dp-quantized mean vector (the kmeans/semdedup
# centroid discipline — quantization makes the iteration-free centroid
# bit-reproducible cross-engine), each member's cosine to its OWN
# centroid averaged in exact integer ppm-of-4dp terms, and the most
# confusable OTHER centroid (highest centroid-centroid cosine). This
# is the supervision-signal audit run before trusting labels for
# classifier training or semdedup eps tuning: low own-cosine = noisy
# label, high cross-centroid cosine = mergeable classes. Scale shape:
# centroids are ONE per-label partial agg (k rows, broadcast back);
# member scoring is map-side; the centroid-centroid matrix is k^2
# metadata.
def q_embeddings_label_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    dim = 64
    cents = emb.groupBy("label").agg(
        F.array(
            *[
                F.round(F.avg(F.element_at("v", i + 1)), 4)
                for i in range(dim)
            ]
        ).alias("cvec"),
        F.count("*").alias("n_members"),
    )
    own = (
        emb.join(F.broadcast(cents), "label")
        .select(
            "label",
            F.expr(
                "CAST(round(" + _COS_SQL.format(a="v", b="cvec")
                + " * 10000, 0) AS BIGINT)"
            ).alias("cos4"),
        )
        .groupBy("label")
        .agg(
            F.expr("sum(cos4) * 100 DIV count(*)").alias(
                "own_cos_ppm"
            )
        )
    )
    a = cents.select(
        F.col("label").alias("label"), F.col("cvec").alias("ca")
    )
    b = cents.select(
        F.col("label").alias("other"), F.col("cvec").alias("cb")
    )
    confus = (
        a.join(F.broadcast(b), F.col("label") != F.col("other"))
        .select(
            "label",
            "other",
            F.expr(
                "CAST(round(" + _COS_SQL.format(a="ca", b="cb")
                + " * 10000, 0) AS BIGINT)"
            ).alias("cc4"),
        )
        .groupBy("label")
        .agg(
            F.max(F.struct("cc4", F.col("other"))).alias("_m"),
        )
        .select(
            "label",
            F.col("_m.other").alias("nearest_label"),
            F.col("_m.cc4").alias("nearest_cos_x1e4"),
        )
    )
    return (
        cents.select("label", "n_members")
        .join(F.broadcast(own), "label")
        .join(F.broadcast(confus), "label")
        .orderBy("label")
    )


# cosine as a dialect-neutral SQL fragment over double arrays — same
# sequential-fold semantics as functions/similarity (aggregate <->
# list_dot_product equivalence established there)
_COS_SQL = (
    "(aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D,"
    " (acc, x) -> acc + x)"
    " / (sqrt(aggregate({a}, 0.0D, (acc, x) -> acc + x * x))"
    "    * sqrt(aggregate({b}, 0.0D, (acc, x) -> acc + x * x))))"
)


def _oracle_label_coherence() -> str:
    dim = 64
    means = ", ".join(
        f"round(avg(v[{i + 1}]), 4)" for i in range(dim)
    )
    cos = (
        "(list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        "    * sqrt(list_dot_product({b}, {b}))))"
    )
    own_cos = cos.format(a="e.v", b="c.cvec")
    cc = cos.format(a="a.cvec", b="b.cvec")
    return f"""
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
  SELECT label, [{means}]::DOUBLE[] AS cvec, count(*) AS n_members
  FROM e GROUP BY label),
own AS (
  SELECT e.label,
         CAST(sum(CAST(round({own_cos} * 10000, 0) AS BIGINT)) * 100
              // count(*) AS BIGINT) AS own_cos_ppm
  FROM e JOIN c USING (label) GROUP BY e.label),
confus AS (
  SELECT label, nearest_label, nearest_cos_x1e4 FROM (
    SELECT a.label, b.label AS nearest_label,
           CAST(round({cc} * 10000, 0) AS BIGINT) AS nearest_cos_x1e4,
           row_number() OVER (PARTITION BY a.label
             ORDER BY CAST(round({cc} * 10000, 0) AS BIGINT) DESC,
                      b.label DESC) AS r
    FROM c a JOIN c b ON a.label <> b.label) t
  WHERE r = 1)
SELECT label, n_members, own_cos_ppm, nearest_label, nearest_cos_x1e4
FROM c JOIN own USING (label) JOIN confus USING (label)
ORDER BY label
"""


ORACLE_EMBEDDINGS_LABEL_COHERENCE = _oracle_label_coherence()

QUERIES["embeddings_label_coherence"] = q_embeddings_label_coherence
ORACLES["embeddings_label_coherence"] = ORACLE_EMBEDDINGS_LABEL_COHERENCE


# -------------------------------------- quantized PCA (power method)
# Distributed PCA, made value-hashable: the leading principal
# direction of the embedding cloud via the power method over the
# EXACT INTEGER covariance of the SQ8 codes. Floating covariance sums
# are order-dependent (never cross-engine stable), so the pipeline
# quantizes first (the shared _sq8_codes builder — already the
# serving representation) and every downstream op is BIGINT: the
# Gram/covariance matrix C[i][j] = Σ_rows q_i·q_j is one
# explode+partial-agg pass; PCA_POWER_ROUNDS synchronous power-method
# rounds renormalize the iterate to PCA_SCALE by its max |component|
# with integer DIV (the events_pagerank / markov_stationary
# fixed-point discipline); the Rayleigh quotient v·Cv / v·v is the
# eigenvalue estimate in the same integer units. Sign is fixed by
# making the largest-|v| component positive (eigenvectors are
# sign-ambiguous; both engines apply the identical rule). PCA over a
# training-data embedding table is the drift/anisotropy monitor: a
# collapsing spectrum (λ₁ ≫ rest) is representation collapse.
#
# Scale shape: the ONLY corpus-sized work is one 64×-explode +
# 64-column partial agg building C (linear in rows, map-side
# combinable); the power iteration runs on the 64-row C table with
# the iterate as 64 inlined integer literals per round (each round's
# rescale collects 64 metadata integers — the bounded-fit discipline
# of ann.py's sample collect). Output is |dims| rows.

PCA_POWER_ROUNDS = 8
PCA_SCALE = 1_000_000
PCA_DIM = 64


def _pca_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-sized stage of the PCA: integer covariance rows
    (i, c[64]) — separated so the plan audit can target it (the
    returned frame's lineage is checkpoint-truncated)."""
    q = _sq8_codes(spark, sf_dir)
    qi = q.select(F.posexplode("q").alias("i", "qi"), F.col("q"))
    cov = qi.groupBy("i").agg(
        *[
            F.sum(F.col("qi") * F.col("q")[j]).alias(f"c{j}")
            for j in range(PCA_DIM)
        ]
    )
    return cov.select(
        "i", F.array(*[F.col(f"c{j}") for j in range(PCA_DIM)]).alias("c")
    )


def q_embeddings_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    cov = _pca_cov(spark, sf_dir).localCheckpoint()
    v = [PCA_SCALE] * PCA_DIM
    for _ in range(PCA_POWER_ROUNDS):
        varr = F.array(*[F.lit(x) for x in v])
        w = cov.select(
            "i",
            F.aggregate(
                F.zip_with("c", varr, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("w"),
        )
        rows = {r["i"]: r["w"] for r in w.collect()}
        wv = [rows[i] for i in range(PCA_DIM)]
        m = max(abs(x) for x in wv) or 1
        # TRUNCATING division (sign x abs-quotient): both engines'
        # integer `/`//`DIV` truncate toward zero; python's bare //
        # floors and would disagree on negative components
        v = [
            (abs(x) * PCA_SCALE // m) * (1 if x >= 0 else -1)
            for x in wv
        ]
    # deterministic sign: the largest-|component| entry positive
    # (lowest dim wins |v| ties)
    pivot = max(range(PCA_DIM), key=lambda i: (abs(v[i]), -i))
    if v[pivot] < 0:
        v = [-x for x in v]
    # Rayleigh quotient in exact python big-int arithmetic (the
    # intermediates exceed int64; the oracle mirrors with HUGEINT):
    # one more metadata-sized collect gives w = C.v, then
    # lambda = (v . C v) / (v . v), both sides nonnegative (C is a
    # Gram matrix), so trunc == floor and the engines agree.
    varr = F.array(*[F.lit(x) for x in v])
    w = cov.select(
        "i",
        F.aggregate(
            F.zip_with("c", varr, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("w"),
    )
    rows = {r["i"]: r["w"] for r in w.collect()}
    vcv = sum(rows[i] * v[i] for i in range(PCA_DIM))
    vv = sum(x * x for x in v)
    rayleigh = int(vcv // vv)
    return (
        cov.select("i")
        .select(
            F.col("i").alias("dim"),
            F.element_at(varr, F.col("i") + 1).alias("v_ppm"),
            F.lit(rayleigh).alias("rayleigh"),
        )
        .orderBy("dim")
    )


def _pca_oracle() -> str:
    # the same SQ8 code CTE as ORACLE_EMBEDDINGS_SQ8, then integer
    # covariance + unrolled power rounds (each round renormalized by
    # max |component| to PCA_SCALE, floor division)
    rounds = []
    prev = "v0"
    for t in range(1, PCA_POWER_ROUNDS + 1):
        rounds.append(f"""
w{t} AS MATERIALIZED (
  -- MATERIALIZED: w is referenced by BOTH m and v; inlined, each
  -- round would re-expand the previous round twice (2^rounds blowup
  -- over the cov self-join — measured 448s vs <1s at sf0.01)
  SELECT c.i, CAST(sum(c.cij * p.v) AS BIGINT) AS w
  FROM cov c JOIN {prev} p ON c.j = p.i GROUP BY c.i),
m{t} AS (SELECT greatest(max(abs(w)), 1) AS m FROM w{t}),
v{t} AS MATERIALIZED (
  -- HUGEINT keeps w*SCALE exact; // truncates toward zero, matching
  -- the engine's sign x abs-quotient rule
  SELECT i, CAST(CAST(w AS HUGEINT) * {PCA_SCALE} // m AS BIGINT) AS v
  FROM w{t} CROSS JOIN m{t})""")
        prev = f"v{t}"
    chain = ",".join(rounds)
    last = prev
    return f"""
WITH pts AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
withn AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM pts),
n AS (
  SELECT vec_id, list_transform(v, x -> x / nrm) AS nx FROM withn),
g AS (
  SELECT max(list_max(list_transform(nx, x -> abs(x)))) AS gmax FROM n),
q AS (
  SELECT vec_id,
         list_transform(nx, x -> CAST(floor(x * ({float(SQ8_LEVELS)}
                                             / gmax)) AS BIGINT)) AS q
  FROM n CROSS JOIN g),
qi AS (
  SELECT vec_id, ix.i - 1 AS i, q.q[ix.i] AS qi
  FROM q CROSS JOIN
       (SELECT unnest(range(1, {PCA_DIM + 1})) AS i) ix),
cov AS MATERIALIZED (
  SELECT a.i, b.i AS j, CAST(sum(a.qi * b.qi) AS BIGINT) AS cij
  FROM qi a JOIN qi b ON a.vec_id = b.vec_id
  GROUP BY 1, 2),
v0 AS (
  SELECT DISTINCT i, CAST({PCA_SCALE} AS BIGINT) AS v FROM cov),
{chain},
sgn AS (
  SELECT v AS pv FROM {last}
  ORDER BY abs(v) DESC, i ASC LIMIT 1),
vf AS (
  SELECT i, CASE WHEN (SELECT pv FROM sgn) < 0 THEN -v ELSE v END AS v
  FROM {last}),
vv AS (SELECT sum(CAST(v AS HUGEINT) * v) AS vv FROM vf),
vcv AS (
  SELECT sum(CAST(c.cij AS HUGEINT) * a.v * b.v) AS vcv
  FROM cov c JOIN vf a ON c.i = a.i JOIN vf b ON c.j = b.i)
SELECT f.i AS dim, f.v AS v_ppm,
       CAST((SELECT vcv FROM vcv) // (SELECT vv FROM vv) AS BIGINT)
         AS rayleigh
FROM vf f
ORDER BY dim
"""


QUERIES["embeddings_pca_power"] = q_embeddings_pca_power
ORACLES["embeddings_pca_power"] = _pca_oracle()


# ------------------------------------------- SQ8 quantizer health
# Per-dimension census of the SQ8 codes the serving path scans
# (shared _sq8_codes builder): min/max code, mean in exact
# centi-units, and the saturation count (codes at the ±SQ8_LEVELS
# clip boundary) — the quantizer-health audit run before trusting
# compressed-domain scores: a dimension that saturates is losing
# resolution (its scale is set by a global max another dimension
# owns), and a dimension whose codes hug zero is wasting its byte.
# Exact integers end to end.
#
# Scale shape: one posexplode (|dims|× rows, map-side) + one
# per-dimension partial agg; output is |dims| rows.


def q_embeddings_sq8_saturation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    q = _sq8_codes(spark, sf_dir)
    per = q.select(F.posexplode("q").alias("dim", "code"))
    return (
        per.groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.min("code").alias("min_code"),
            F.max("code").alias("max_code"),
            F.expr("sum(code) * 100 DIV count(*)").alias("mean_centi"),
            F.sum(
                (F.abs(F.col("code")) >= SQ8_LEVELS - 1).cast("long")
            ).alias("n_saturated"),
        )
        .withColumn(
            "saturated_ppm", F.expr("n_saturated * 1000000 DIV n")
        )
        .orderBy("dim")
    )


ORACLE_EMBEDDINGS_SQ8_SATURATION = f"""
WITH pts AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
withn AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM pts),
n AS (
  SELECT vec_id, list_transform(v, x -> x / nrm) AS nx FROM withn),
g AS (
  SELECT max(list_max(list_transform(nx, x -> abs(x)))) AS gmax FROM n),
q AS (
  SELECT vec_id,
         list_transform(nx, x -> CAST(floor(x * ({float(SQ8_LEVELS)}
                                             / gmax)) AS BIGINT)) AS q
  FROM n CROSS JOIN g),
per AS (
  SELECT ix.i - 1 AS dim, q.q[ix.i] AS code
  FROM q CROSS JOIN
       (SELECT unnest(range(1, {PCA_DIM + 1})) AS i) ix)
SELECT dim, count(*) AS n,
       min(code) AS min_code, max(code) AS max_code,
       CAST(sum(code) * 100 // count(*) AS BIGINT) AS mean_centi,
       CAST(sum(CASE WHEN abs(code) >= {SQ8_LEVELS - 1}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_saturated,
       CAST(sum(CASE WHEN abs(code) >= {SQ8_LEVELS - 1}
                     THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         AS saturated_ppm
FROM per
GROUP BY dim
ORDER BY dim
"""


QUERIES["embeddings_sq8_saturation"] = q_embeddings_sq8_saturation
ORACLES["embeddings_sq8_saturation"] = ORACLE_EMBEDDINGS_SQ8_SATURATION
