"""Approximate nearest-neighbor search over an embedding column.

Two paths (SURVEY training-data ops):
- brute-force cosine top-k (queries.q_knn_bruteforce) — the exact
  baseline; probes broadcast, candidates stream, Window top-k;
- LSH-bucketed top-k (here) — the scale path: hyperplane band keys on
  both sides, candidates limited to bucket collisions, exact cosine
  re-rank. Replaces the reference's Chroma HNSW index
  (github_similarity_service.py:106-109,397-401) with a
  shuffle-friendly layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deja_view_spark.functions.hashing import make_simhash_udf
from deja_view_spark.functions.similarity import cosine_sim


def ann_topk_lsh(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 64,
    rows: int = 4,
    seed: int = 4242,
    assume_normalized: bool = False,
) -> DataFrame:
    """Top-k neighbors per probe among bucket-colliding candidates.

    probes: (probe_id, probe_vec). Returns
    (probe_id, neighbor_id, cos, rank) — rank by (cos desc, id asc),
    deterministic at any parallelism.
    Recall is tunable via (bands, rows): more/shorter bands -> higher
    recall, more candidates. Defaults (64 bands x 4 bits) hold
    recall@3 >= 0.95 even when true neighbors sit at cos ~0.3-0.5
    (the hard regime: hyperplane collision prob decays toward 0.5^rows
    as cos -> 0, so pruning weakens as similarity structure weakens —
    on near-uniform corpora bucketed ANN degrades toward brute force
    by design; the pruning win appears when real clusters exist).
    """
    sh = make_simhash_udf(bands=bands, rows=rows, seed=seed)
    cand_bands = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        F.explode(sh(F.col(vec_col))).alias("band"),
    )
    probe_bands = probes.select(
        "probe_id",
        "probe_vec",
        F.explode(sh(F.col("probe_vec"))).alias("band"),
    )
    cands = (
        cand_bands.join(
            F.broadcast(probe_bands),
            (cand_bands.band == probe_bands.band)
            & (F.col("neighbor_id") != F.col("probe_id")),
        )
        .select("probe_id", "probe_vec", "neighbor_id", "nvec")
        .distinct()
    )
    scored = cands.withColumn(
        "cos",
        F.round(
            cosine_sim(F.col("nvec"), F.col("probe_vec"), assume_normalized), 4
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
        .orderBy("probe_id", "rank")
    )
