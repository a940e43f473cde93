"""SemDeDup — semantic deduplication over an embedding column.

Public-method source: Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication" (arXiv:2303.09540).
Cluster the embedding space, compute pairwise cosine ONLY within each
cluster, and drop every vector that is epsilon-close to a better
representative. The reference repo reaches the same goal (collapse
semantically-duplicate issues) through a serving-time ANN probe per
new issue (github_similarity_service.py:380-430); SemDeDup is the
batch/corpus-scale formulation a training-data pipeline needs.

Scale shape (the whole point of the method): the O(n^2) cosine matrix
is confined to cluster-local blocks — one equi-join shuffle on the
cluster key, never an all-pairs join. At 100 TB the cluster count
grows with the corpus (the paper uses 50k clusters for 600M docs), so
per-cluster block size stays bounded; the centroid table stays
broadcast-sized metadata.

Two quantizer choices, same skeleton as operators/ann.py:
- production: the sample-fit KMeans of `ivf_index` (seeded, bounded
  driver-side fit — centroid METADATA, not data);
- registry/oracle: deterministic md5-medoid centroids, which make the
  ENTIRE pipeline — centroid pick, coarse assign, within-cluster
  pairs, keep-rule — bit-reproducible in DuckDB SQL, so the query
  carries a full value-hash oracle instead of a rows-only check.

Keep-rule (paper §2: keep the item with LOW similarity to the
centroid, i.e. keep edge points, drop the redundant core): for a
duplicate pair (a, b) with cos(a,b) >= eps, the member CLOSER to the
centroid loses; ties break on the larger id losing. A vector is
dropped if ANY same-cluster partner dominates it; its reported
`kept_id` is the dominating partner with the highest cosine
(tie: smallest id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from deja_view_spark.functions.similarity import cosine_sim, dot


def _d2(v: Column, c: Column) -> Column:
    # identical token order to the DuckDB oracle:
    # (dot(v,v) - 2*dot(v,c)) + dot(c,c)
    return (dot(v, v) - F.lit(2.0) * dot(v, c)) + dot(c, c)


def medoid_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
) -> DataFrame:
    """Deterministic seeded centroid draw: the ``n_centroids`` vectors
    whose md5(id) sorts lowest — a uniform sample both engines can
    compute (same draw operators/ann.py:ivf_topk_det uses). Compiles
    to a TakeOrdered of k rows + a k-row window: metadata-sized at any
    corpus scale."""
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    return (
        emb.select(F.col(vec_col).alias("cvec"), h.alias("_h"))
        .orderBy("_h")
        .limit(n_centroids)
        .withColumn(
            "bucket",
            F.row_number().over(Window.orderBy("_h")).cast("int") - 1,
        )
        .select("bucket", "cvec")
    )


def assign_clusters(
    emb: DataFrame,
    cents: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment as ONE map-side pass: broadcast the
    k-row centroid table, expand squared distance, take the min as a
    partial-aggregable min-of-struct (no window over n x k rows).
    Returns (id, v, bucket, ccos) where ccos is the 4dp cosine to the
    OWN centroid — the keep-rule's ranking key."""
    assigned = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .join(F.broadcast(cents))
        .withColumn("_d2", _d2(F.col("v"), F.col("cvec")))
        .groupBy("id")
        .agg(
            F.min(F.struct("_d2", "bucket", "cvec")).alias("_m"),
            F.any_value("v").alias("v"),
        )
        .select(
            "id",
            "v",
            F.col("_m.bucket").alias("bucket"),
            F.round(cosine_sim(F.col("v"), F.col("_m.cvec")), 4).alias("ccos"),
        )
    )
    return assigned


def semantic_dedup(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    eps: float = 0.4,
    cents: DataFrame | None = None,
) -> DataFrame:
    """Dropped-duplicate report: one row per vector SemDeDup removes,
    with the cluster it sat in, the kept partner that dominated it,
    and their cosine. Columns: (vec_id, bucket, kept_id, cos).

    Pass ``cents`` to supply production KMeans centroids
    (operators/ann.ivf_index); default is the deterministic medoid
    draw, which the registry oracle reproduces in SQL.
    """
    if cents is None:
        cents = medoid_centroids(emb, vec_col, id_col, n_centroids)
    mem = assign_clusters(emb, cents, vec_col, id_col)

    a = mem.select(
        F.col("id").alias("ida"),
        F.col("v").alias("va"),
        F.col("bucket"),
        F.col("ccos").alias("ccosa"),
    )
    b = mem.select(
        F.col("id").alias("idb"),
        F.col("v").alias("vb"),
        F.col("bucket").alias("_bb"),
        F.col("ccos").alias("ccosb"),
    )
    # cluster-local pairs: equi-join on the cluster key (one shuffle of
    # fixed-width rows), id< to emit each pair once
    pairs = (
        a.join(b, (F.col("bucket") == F.col("_bb")) & (F.col("ida") < F.col("idb")))
        .withColumn("cos", F.round(cosine_sim(F.col("va"), F.col("vb")), 4))
        .where(F.col("cos") >= F.lit(eps))
    )
    # keep-rule: the member closer to the centroid loses (paper keeps
    # edge points); ties lose to the larger id
    a_loses = (F.col("ccosa") > F.col("ccosb")) | (
        (F.col("ccosa") == F.col("ccosb")) & (F.col("ida") > F.col("idb"))
    )
    dominated = pairs.select(
        F.when(a_loses, F.col("ida")).otherwise(F.col("idb")).alias("vec_id"),
        F.when(a_loses, F.col("idb")).otherwise(F.col("ida")).alias("kept_id"),
        "bucket",
        "cos",
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("kept_id"))
    return (
        dominated.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("vec_id", "bucket", "kept_id", "cos")
        .orderBy("vec_id")
    )


def incremental_semantic_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    eps: float = 0.4,
    cents: DataFrame | None = None,
) -> DataFrame:
    """Serving-time SemDeDup: a small NEW batch probed against the
    already-indexed corpus — the batched Spark shape of the reference's
    per-issue duplicate probe (github_similarity_service.py:380-430),
    in semantic space (the MinHash twin is
    operators/dedup.incremental_minhash_pairs).

    Keep rule: the INDEXED side always wins — a batch vector is
    dropped iff ANY same-cluster corpus member is eps-close; its
    reported partner is the closest one (tie: smallest id). No
    ccos comparison: precedence is temporal, not geometric.

    Scale shape: centroids default to the corpus medoid draw (in
    production the stored quantizer — e.g. `kmeans.lloyd_kmeans`
    output); the corpus side is assigned ONCE map-side (in production
    that assignment is the stored IVF index, a narrow read); the
    batch's assigned table BROADCASTS into the corpus stream, so NO
    corpus row ever shuffles — the candidate join is map-side, and
    cosine verify touches only same-cluster candidates.

    Output: (vec_id, bucket, kept_id, cos) per dropped BATCH vector.
    """
    if cents is None:
        cents = medoid_centroids(corpus, vec_col, id_col, n_centroids)
    cm = assign_clusters(corpus, cents, vec_col, id_col)
    bm = assign_clusters(batch, cents, vec_col, id_col)
    b = bm.select(
        F.col("id").alias("bid"),
        F.col("v").alias("bv"),
        F.col("bucket").alias("_bb"),
    )
    pairs = (
        cm.join(F.broadcast(b), F.col("bucket") == F.col("_bb"))
        .withColumn("cos", F.round(cosine_sim(F.col("bv"), F.col("v")), 4))
        .where(F.col("cos") >= F.lit(eps))
    )
    w = Window.partitionBy("bid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        pairs.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(
            F.col("bid").alias("vec_id"),
            F.col("_bb").alias("bucket"),
            F.col("id").alias("kept_id"),
            "cos",
        )
        .orderBy("vec_id")
    )
