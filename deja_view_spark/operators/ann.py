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

import numpy as np
import pandas as pd
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
    # rank on the ROUNDED cosine: two candidates whose true cosines
    # differ below 1e-4 are a tie broken by id, so the ranking is
    # stable across engines/float-fold orders (unrounded ranking made
    # near-ties flip between Spark and the DuckDB oracle)
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
        .orderBy("probe_id", "rank")
    )


# ---------------------------------------------------------------- IVF
def _kmeans_once(X, k: int, rng, max_iter: int):
    """One seeded Lloyd's run with k-means++ init; returns
    (centroids, inertia)."""
    n = len(X)
    x2 = (X**2).sum(1, keepdims=True)
    idx = [int(rng.integers(n))]
    d2 = ((X - X[idx[0]]) ** 2).sum(1)
    for _ in range(1, k):
        p = d2 / d2.sum() if d2.sum() > 0 else None
        idx.append(int(rng.choice(n, p=p)))
        d2 = np.minimum(d2, ((X - X[idx[-1]]) ** 2).sum(1))
    C = X[idx].copy()
    for _ in range(max_iter):
        d = x2 - 2.0 * (X @ C.T) + (C**2).sum(1)[None, :]
        a = d.argmin(1)
        for j in range(k):
            members = X[a == j]
            if len(members):
                C[j] = members.mean(0)
    d = x2 - 2.0 * (X @ C.T) + (C**2).sum(1)[None, :]
    return C, float(d.min(1).sum())


def _kmeans_numpy(X, k: int, seed: int, max_iter: int = 20, restarts: int = 4):
    """Seeded Lloyd's over a bounded sample: ``restarts`` independent
    k-means++ runs, keep the lowest-inertia centroids (deterministic —
    every draw comes from the seeded generator). The sample is
    k x hundreds of rows — centroid METADATA, not data — so the fit
    belongs on the driver: a distributed KMeans here pays max_iter
    rounds of job-scheduling overhead to average a few thousand
    vectors (measured ~4s of the 6s ann_ivf_topk wall at sf0.1 before
    this change); the whole multi-restart numpy fit is milliseconds."""
    rng = np.random.default_rng(seed)
    best, best_inertia = None, np.inf
    for _ in range(restarts):
        C, inertia = _kmeans_once(X, k, rng, max_iter)
        if inertia < best_inertia:
            best, best_inertia = C, inertia
    return best


def make_assign_bucket_udf(centroids):
    """array<float> vector column -> int nearest-centroid bucket; the
    centroid matrix rides the UDF closure (tiny, broadcast with the
    task), the batch assignment is one matmul + argmin."""
    from pyspark.sql.types import IntegerType

    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C**2).sum(1)

    @F.pandas_udf(IntegerType())
    def assign_bucket(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        X = np.stack(vs.to_numpy()).astype(np.float64)
        d = (X**2).sum(1, keepdims=True) - 2.0 * (X @ C.T) + c2[None, :]
        return pd.Series(d.argmin(1).astype(np.int32))

    return assign_bucket


def ivf_index(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 11,
    max_iter: int = 10,
    fit_sample_rows: int = 4096,
):
    """Train the IVF coarse quantizer and assign every vector to its
    nearest centroid bucket.

    Returns (assigned_df with `_bucket` column, centroid ndarray).
    The centroid set is tiny model metadata (k x dim floats): the fit
    runs driver-side on a seeded SAMPLE of ~``fit_sample_rows`` rows
    collected once (a multi-pass KMeans over the full table would be a
    scale bug — centroid quality saturates at a few hundred points per
    centroid; and a distributed fit of a few thousand rows is pure
    scheduler overhead), then the FULL table is assigned in one
    map-side Arrow pass against the closure-shipped centroids."""
    import numpy as np

    # metadata-only count sizes the sample fraction; oversample 1.2x so
    # Bernoulli sampling variance still lands near the target rows
    n = emb.count()
    fit_df = emb.select(vec_col)
    if n > fit_sample_rows:
        fit_df = fit_df.sample(
            fraction=min(1.0, 1.2 * fit_sample_rows / n), seed=seed
        ).limit(fit_sample_rows)
    X = np.stack([r[0] for r in fit_df.collect()]).astype(np.float64)
    k = min(n_centroids, len(X))
    centroids = _kmeans_numpy(X, k, seed, max_iter)
    assigned = emb.withColumn(
        "_bucket", make_assign_bucket_udf(centroids)(F.col(vec_col))
    )
    return assigned, centroids


def ivf_topk_det(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 6,
) -> DataFrame:
    """IVF ANN with a DETERMINISTIC medoid coarse quantizer — the
    driver-checkable twin of ``ivf_topk``.

    The KMeans fit in ``ivf_topk`` is seeded-deterministic in Spark but
    not reproducible in SQL (iterative float averaging), which forced a
    rows-only driver check in rounds 1-2. This variant keeps the full
    IVF plan shape — coarse-assign every vector to an inverted list,
    probe only the ``nprobe`` nearest lists, exact cosine re-rank — but
    picks the ``n_centroids`` centroids as MEDOIDS: the vectors whose
    ``md5(vec_id)`` sorts lowest (a seeded uniform draw both engines
    can compute). Every arithmetic step (squared-distance expansion
    ``|v|^2 - 2<v,c> + |c|^2`` over double-widened float32 values,
    rounded-cosine ranking) is bit-reproducible in DuckDB, so the whole
    pruned search carries a full value-hash oracle. Expression-only:
    no Python anywhere in the plan.

    Scale shape: the centroid table is ``n_centroids`` rows (broadcast);
    assignment is one map-side projection + a partial-agg min-of-struct
    per vector (no window over the big side); the probe fan-out joins on
    the bucket key with the probe side broadcast — same skeleton the
    KMeans variant uses, so the oracle certifies the production plan.
    """
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    cents = (
        emb.select(F.col(vec_col).alias("cvec"), h.alias("_h"))
        .orderBy("_h")
        .limit(n_centroids)
        .withColumn(
            "bucket",
            F.row_number().over(Window.orderBy("_h")).cast("int") - 1,
        )
        .select("bucket", "cvec")
    )

    def d2(v, c):
        # identical token order to the oracle: (dot(v,v) - 2*dot(v,c)) + dot(c,c)
        from deja_view_spark.functions.similarity import dot

        return dot(v, v) - F.lit(2.0) * dot(v, c) + dot(c, c)

    # assignment: min-of-struct partial agg (map-side combinable), not a
    # window sort over n x n_centroids rows
    assigned = (
        emb.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
        )
        .crossJoin(F.broadcast(cents))
        .withColumn("_d2", d2(F.col("nvec"), F.col("cvec")))
        .groupBy("neighbor_id")
        .agg(
            F.min(F.struct("_d2", "bucket")).alias("_m"),
            F.any_value("nvec").alias("nvec"),
        )
        .select("neighbor_id", "nvec", F.col("_m.bucket").alias("_bucket"))
    )

    pw = Window.partitionBy("probe_id").orderBy(F.asc("_d2"), F.asc("bucket"))
    probe_buckets = (
        probes.crossJoin(F.broadcast(cents))
        .withColumn("_d2", d2(F.col("probe_vec"), F.col("cvec")))
        .withColumn("_r", F.row_number().over(pw))
        .where(F.col("_r") <= nprobe)
        .select("probe_id", "probe_vec", F.col("bucket").alias("_bucket"))
    )

    scored = assigned.join(
        F.broadcast(probe_buckets),
        (assigned._bucket == probe_buckets._bucket)
        & (F.col("neighbor_id") != F.col("probe_id")),
    ).withColumn(
        "cos", F.round(cosine_sim(F.col("nvec"), F.col("probe_vec")), 4)
    )
    w2 = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
        .orderBy("probe_id", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 11,
    assume_normalized: bool = False,
) -> DataFrame:
    """IVF ANN: coarse-quantize candidates into centroid buckets, probe
    only the `nprobe` nearest buckets per query, exact cosine re-rank.

    probes: (probe_id, probe_vec). Returns
    (probe_id, neighbor_id, cos, rank). The inverted-list layout is a
    plain bucket column — the probe-side bucket fan-out is an explode +
    equi-join, so at cluster scale the search is one shuffle on the
    bucket key with the probe side broadcast."""
    import numpy as np

    assigned, centroids = ivf_index(emb, vec_col, n_centroids, seed)
    spark = emb.sparkSession
    cent_rows = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(centroids)
    ]
    cents = spark.createDataFrame(cent_rows, "bucket int, cvec array<float>")

    # nprobe nearest buckets per probe: tiny cross join (n_probes x k)
    pc = probes.crossJoin(F.broadcast(cents)).withColumn(
        "_pdist",
        F.aggregate(
            F.zip_with(F.col("probe_vec"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("_pdist"), F.asc("bucket"))
    probe_buckets = (
        pc.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= nprobe)
        .select("probe_id", "probe_vec", F.col("bucket").alias("_bucket"))
    )

    cand = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        "_bucket",
    )
    scored = (
        cand.join(
            F.broadcast(probe_buckets),
            (cand._bucket == probe_buckets._bucket)
            & (F.col("neighbor_id") != F.col("probe_id")),
        )
        .withColumn(
            "cos",
            F.round(cosine_sim(F.col("nvec"), F.col("probe_vec"), assume_normalized), 4),
        )
    )
    w2 = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
        .orderBy("probe_id", "rank")
    )


def ivfpq_topk_det(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 6,
    m: int = 4,
    subdim: int = 16,
    pq_k: int = 8,
    pq_rounds: int = 1,
    decimals: int = 4,
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ ANN with asymmetric distance computation (ADC) — the
    index layout a billion-vector deployment actually serves from:
    candidates are pruned by the md5-medoid coarse quantizer
    (`ivf_topk_det`'s inverted lists), then RANKED FROM THEIR PQ CODES
    ALONE. Per probe, a lookup table of squared distances from the
    probe's sub-vectors to every block centroid (m*pq_k rows —
    metadata) is broadcast, and a candidate's ADC distance is the
    in-row sum of m LUT hits; the original vectors are never touched
    after encode time. The default quantizes raw vectors (not coarse
    residuals) so every arithmetic step reproduces bit-for-bit in the
    DuckDB oracle; ``residual=True`` switches to classic IVF-PQ
    residual encoding (quantize v - coarse_centroid, probe LUTs keyed
    per (probe, probed coarse bucket)) — the recall refinement for
    tight code budgets, measured in tests/test_ann.py against the
    exact-L2 ground truth.

    Scale shape: codebooks and LUTs broadcast (k-row / m*pq_k-row);
    the candidate fan-out is the same bucket equi-join as ivf_topk_det
    with the probe side broadcast; the m LUT joins are broadcast hash
    joins on (probe_id, code) adding one in-row double each — no
    explode, no per-candidate window until the final per-probe top-k.
    ADC sum order is the explicit left-to-right d0+d1+d2+d3 in both
    engines. Returns (probe_id, neighbor_id, adc, rank), rank by
    (adc asc, neighbor_id asc).
    """
    from deja_view_spark.operators.kmeans import pq_encode

    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    cents = (
        emb.select(F.col(vec_col).alias("cvec"), h.alias("_h"))
        .orderBy("_h")
        .limit(n_centroids)
        .withColumn(
            "bucket",
            F.row_number().over(Window.orderBy("_h")).cast("int") - 1,
        )
        .select("bucket", "cvec")
    )

    def d2(v, c):
        from deja_view_spark.functions.similarity import dot

        return dot(v, v) - F.lit(2.0) * dot(v, c) + dot(c, c)

    agg_struct = (
        F.struct("_d2", "bucket", "cvec") if residual
        else F.struct("_d2", "bucket")
    )
    assigned = (
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
        .crossJoin(F.broadcast(cents))
        .withColumn("_d2", d2(F.col("nvec"), F.col("cvec")))
        .groupBy("neighbor_id")
        .agg(
            F.min(agg_struct).alias("_m"),
            F.any_value("nvec").alias("nvec"),
        )
        .select(
            "neighbor_id",
            "nvec",
            F.col("_m.bucket").alias("_bucket"),
            *([F.col("_m.cvec").alias("_ccvec")] if residual else []),
        )
    )

    if residual:
        # classic IVF-PQ: quantize v - coarse_centroid[bucket]; the
        # codebooks see centered, lower-spread vectors, so the same
        # code budget reconstructs tighter (the recall refinement the
        # raw variant's docstring promises). Probe LUTs become
        # per-(probe, PROBED coarse bucket) — still metadata-sized
        # (nprobe * m * pq_k rows per probe).
        res_src = assigned.select(
            F.col("neighbor_id").alias(id_col),
            F.zip_with("nvec", "_ccvec", lambda x, c: x - c).alias("rv"),
        )
        codes, codebooks = pq_encode(
            res_src, "rv", id_col, m=m, subdim=subdim, k=pq_k,
            rounds=pq_rounds, decimals=decimals,
        )
    else:
        codes, codebooks = pq_encode(
            emb, vec_col, id_col, m=m, subdim=subdim, k=pq_k,
            rounds=pq_rounds, decimals=decimals,
        )
    cand_codes = assigned.select(
        "neighbor_id", "_bucket"
    ).join(codes.withColumnRenamed("id", "neighbor_id"), "neighbor_id")

    pw = Window.partitionBy("probe_id").orderBy(F.asc("_d2"), F.asc("bucket"))
    probe_buckets = (
        probes.crossJoin(F.broadcast(cents))
        .withColumn("_d2", d2(F.col("probe_vec"), F.col("cvec")))
        .withColumn("_r", F.row_number().over(pw))
        .where(F.col("_r") <= nprobe)
        .select(
            "probe_id",
            F.col("bucket").alias("_bucket"),
            *([F.col("cvec").alias("_pcvec")] if residual else []),
        )
    )

    scored = cand_codes.join(
        F.broadcast(probe_buckets),
        (cand_codes._bucket == probe_buckets._bucket)
        & (F.col("neighbor_id") != F.col("probe_id")),
    ).select(
        "probe_id", "neighbor_id",
        *([cand_codes["_bucket"]] if residual else []),
        *[f"c{b}" for b in range(m)],
    )

    if residual:
        # LUT keyed by (probe, coarse bucket, code): distance from the
        # probe's RESIDUAL against that coarse bucket to each block
        # centroid
        pb_vec = (
            probes.join(F.broadcast(probe_buckets), "probe_id")
            .select(
                "probe_id", "_bucket",
                F.zip_with("probe_vec", "_pcvec", lambda x, c: x - c)
                .alias("_qres"),
            )
        )
        for b in range(m):
            qsub = F.slice(F.col("_qres"), b * subdim + 1, subdim)
            lut = (
                pb_vec.crossJoin(F.broadcast(codebooks[b]))
                .select(
                    F.col("probe_id").alias("_lp"),
                    F.col("_bucket").alias(f"_lb{b}"),
                    F.col("bucket").alias(f"_lc{b}"),
                    d2(qsub, F.col("cvec")).alias(f"_d2p{b}"),
                )
            )
            scored = scored.join(
                F.broadcast(lut),
                (scored.probe_id == lut._lp)
                & (scored["_bucket"] == lut[f"_lb{b}"])
                & (scored[f"c{b}"] == lut[f"_lc{b}"]),
            ).drop("_lp", f"_lb{b}", f"_lc{b}")
    else:
        for b in range(m):
            qsub = F.slice(F.col("probe_vec"), b * subdim + 1, subdim)
            lut = (
                probes.crossJoin(F.broadcast(codebooks[b]))
                .select(
                    F.col("probe_id").alias("_lp"),
                    F.col("bucket").alias(f"_lc{b}"),
                    d2(qsub, F.col("cvec")).alias(f"_d2p{b}"),
                )
            )
            scored = scored.join(
                F.broadcast(lut),
                (scored.probe_id == lut._lp)
                & (scored[f"c{b}"] == lut[f"_lc{b}"]),
            ).drop("_lp", f"_lc{b}")

    total = F.col("_d2p0")
    for b in range(1, m):  # explicit left-to-right sum, oracle-identical
        total = total + F.col(f"_d2p{b}")
    adc = F.round(total, 4)
    w2 = Window.partitionBy("probe_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("adc", adc)
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc", "rank")
        .orderBy("probe_id", "rank")
    )
