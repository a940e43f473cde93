"""Ground-truth tests for operators/kmeans.py — a numpy mirror of the
quantized Lloyd's loop, plus planted-geometry recovery, independent of
the DuckDB oracle certifying the registry query."""

import hashlib

import numpy as np
import pyarrow.parquet as pq
import pytest

from deja_view_spark.operators.kmeans import kmeans_assignments, lloyd_kmeans

SF_DIR = "/root/testdata/sf0.001"


def _numpy_kmeans(ids, vecs, k, rounds, decimals):
    """Exact python twin: md5-medoid init, argmin assignment with
    (d2, bucket) tie order, per-dim mean rounded to `decimals`."""
    order = sorted(range(len(ids)), key=lambda i: hashlib.md5(
        str(ids[i]).encode()).hexdigest())
    cents = {b: vecs[order[b]].astype(np.float64) for b in range(k)}

    def assign(cents):
        out = {}
        for i, vid in enumerate(ids):
            v = vecs[i].astype(np.float64)
            best = min(
                (
                    (v @ v - 2.0 * (v @ c)) + c @ c,
                    b,
                )
                for b, c in cents.items()
            )
            out[vid] = best[1]
        return out

    for _ in range(rounds):
        a = assign(cents)
        new = {}
        for b in set(a.values()):
            members = [vecs[i].astype(np.float64)
                       for i, vid in enumerate(ids) if a[vid] == b]
            new[b] = np.round(np.mean(members, axis=0), decimals)
        cents = new
    return cents, assign(cents)


def test_kmeans_matches_numpy_reference(spark):
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)

    cents_np, assign_np = _numpy_kmeans(ids, vecs, k=8, rounds=2, decimals=4)

    from deja_view_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    got_cents = {
        r["bucket"]: np.array(r["cvec"])
        for r in lloyd_kmeans(emb, k=8, rounds=2).collect()
    }
    assert set(got_cents) == set(cents_np)
    for b in cents_np:
        # centroids are quantized to 1e-4 in both — allow one grid step
        # for summation-order ulps at the rounding boundary
        assert np.max(np.abs(got_cents[b] - cents_np[b])) <= 1.1e-4, b

    got_assign = {
        r["vec_id"]: r["bucket"]
        for r in kmeans_assignments(emb, k=8, rounds=2).collect()
    }
    mismatches = sum(1 for vid in assign_np if got_assign[vid] != assign_np[vid])
    # boundary points can flip only if a centroid dim landed on a
    # rounding boundary; none expected on this corpus
    assert mismatches == 0


def test_kmeans_recovers_planted_clusters(spark):
    rng = np.random.default_rng(11)
    rows = []
    # id offset chosen so the deterministic md5-medoid draw lands one
    # medoid in each planted cluster (ids 381/433/461 -> classes
    # 0/1/2); with a k=classes init inside one cluster, Lloyd's would
    # converge to the usual split/merge local optimum — a property of
    # the algorithm, not the implementation under test
    for i in range(380, 470):
        base = np.zeros(8)
        base[i % 3] = 1.0
        v = base + rng.normal(0, 0.02, 8)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = kmeans_assignments(emb, k=3, rounds=3, dim=8).collect()
    by_truth = {}
    for r in got:
        by_truth.setdefault(r["vec_id"] % 3, set()).add(r["bucket"])
    # every planted cluster maps to exactly one k-means bucket and the
    # three buckets are distinct
    assert all(len(s) == 1 for s in by_truth.values())
    assert len({next(iter(s)) for s in by_truth.values()}) == 3
    # every member sits close to its own centroid
    assert all(r["ccos"] > 0.9 for r in got)


def test_kmeans_centroid_count_bounded(spark):
    rows = [(i, [float(i % 2), float(1 - i % 2)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = lloyd_kmeans(emb, k=6, rounds=2, dim=2).collect()
    # only two distinct points exist: k is an upper bound, empty
    # buckets drop out, survivors are the two point masses
    assert 1 <= len(cents) <= 6
    got = {tuple(np.round(r["cvec"], 2)) for r in cents}
    assert got <= {(1.0, 0.0), (0.0, 1.0)}


# ------------------------------------------------ product quantization
def test_pq_matches_numpy_reference(spark):
    """pq_assignments == running the numpy Lloyd's twin independently
    on each 16-dim sub-block: same codes, same 4dp block errors."""
    from deja_view_spark.operators.kmeans import pq_assignments

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    m, subdim, k, rounds, decimals = 4, 16, 8, 1, 4

    expect_code = {}
    expect_d2 = {}
    for b in range(m):
        sub = vecs[:, b * subdim : (b + 1) * subdim]
        cents, assign = _numpy_kmeans(ids, sub, k, rounds, decimals)
        for i, vid in enumerate(ids):
            v = sub[i].astype(np.float64)
            d2, bkt = min(
                ((v @ v - 2.0 * (v @ c)) + c @ c, bb)
                for bb, c in cents.items()
            )
            expect_code.setdefault(vid, []).append(bkt)
            expect_d2.setdefault(vid, []).append(round(d2, decimals))

    from deja_view_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    out = pq_assignments(
        emb, m=m, subdim=subdim, k=k, rounds=rounds, decimals=decimals
    ).collect()
    assert len(out) == len(ids)
    for r in out:
        want = "-".join(str(b) for b in expect_code[r.vec_id])
        assert r.pq_code == want, r.vec_id
        for b in range(m):
            got = getattr(r, f"d2_{b}")
            assert got == pytest.approx(expect_d2[r.vec_id][b], abs=2e-4)


def test_pq_compression_beats_single_codebook_error(spark):
    """PQ's summed block error must not exceed the error of one 8-way
    64-dim codebook (same total byte budget comparison is unfair to
    the single codebook — 4x8^4 effective cells vs 8 — so PQ should
    reconstruct strictly better on real data)."""
    from deja_view_spark.operators.kmeans import pq_assignments
    from deja_view_spark.sources.catalog import load_table
    from deja_view_spark.operators.kmeans import lloyd_kmeans
    from deja_view_spark.operators.semdedup import assign_clusters
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    pq_out = pq_assignments(emb, m=4, subdim=16, k=8, rounds=1)
    pq_err = pq_out.select(
        (F.col("d2_0") + F.col("d2_1") + F.col("d2_2") + F.col("d2_3"))
        .alias("e")
    ).agg(F.sum("e")).collect()[0][0]

    cents = lloyd_kmeans(emb, k=8, rounds=1, dim=64)
    mem = assign_clusters(emb, cents)
    # assign_clusters returns ccos, recompute d2 directly
    from deja_view_spark.operators.kmeans import _d2
    full_err = (
        emb.select(F.col("vec_id").alias("id"),
                   F.col("embedding").alias("v"))
        .join(F.broadcast(cents))
        .withColumn("_d2", _d2(F.col("v"), F.col("cvec")))
        .groupBy("id")
        .agg(F.min("_d2").alias("e"))
        .agg(F.sum("e"))
        .collect()[0][0]
    )
    assert pq_err < full_err
