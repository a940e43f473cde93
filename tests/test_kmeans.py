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
