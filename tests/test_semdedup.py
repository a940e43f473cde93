"""SemDeDup operator (operators/semdedup.py) ground-truth tests.

Planted geometry: vectors placed so cluster membership and the
keep-rule outcome are known by construction, independent of the
DuckDB oracle that certifies the registry query."""

import pytest
from pyspark.sql import functions as F

from deja_view_spark.operators.semdedup import (
    assign_clusters,
    medoid_centroids,
    semantic_dedup,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )


def test_keep_rule_drops_member_closer_to_centroid(spark):
    # Two tight clusters on orthogonal axes. In each, one vector IS a
    # potential medoid and near-dup partners sit eps-close to it. The
    # partner closer to the chosen centroid must be the dropped one.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.14, 0.0]),  # cos(0,1) ~ 0.990
        (2, [0.0, 1.0, 0.0]),
        (3, [0.1, 0.995, 0.0]),  # cos(2,3) ~ 0.995
        (4, [0.0, 0.0, 1.0]),  # isolated: never dropped
    ]
    emb = _emb(spark, rows)
    out = semantic_dedup(emb, n_centroids=2, eps=0.9).collect()
    dropped = {r["vec_id"] for r in out}
    assert 4 not in dropped
    # every dropped row names a same-cluster partner with cos >= eps
    for r in out:
        assert r["cos"] >= 0.9
        assert r["kept_id"] != r["vec_id"]
    # pair members can't BOTH be dropped by each other: for each dup
    # pair exactly one side survives as the other's kept partner
    cents = medoid_centroids(emb, n_centroids=2)
    mem = {
        r["id"]: (r["bucket"], r["ccos"])
        for r in assign_clusters(emb, cents).collect()
    }
    for r in out:
        b_drop, c_drop = mem[r["vec_id"]]
        b_keep, c_keep = mem[r["kept_id"]]
        assert b_drop == b_keep  # cluster-local by construction
        # loser is the member closer to its centroid (ties: larger id)
        assert (c_drop, r["vec_id"] > r["kept_id"]) >= (c_keep, False)


def test_eps_monotone_and_cluster_local(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        base = [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]
        rows.append(
            (i, [base[0] + rng.uniform(-0.2, 0.2), base[1] + rng.uniform(-0.2, 0.2)])
        )
    emb = _emb(spark, rows)
    loose = {r["vec_id"] for r in semantic_dedup(emb, n_centroids=4, eps=0.8).collect()}
    tight = {r["vec_id"] for r in semantic_dedup(emb, n_centroids=4, eps=0.99).collect()}
    # higher eps -> fewer (subset of) drops
    assert tight <= loose
    assert len(loose) > 0


def test_custom_centroids_path(spark):
    # production path: caller supplies centroids (e.g. sample-fit
    # KMeans from operators/ann.ivf_index) instead of the medoid draw
    rows = [(i, [float(i % 2), float(1 - i % 2)]) for i in range(10)]
    emb = _emb(spark, rows)
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "bucket int, cvec array<float>",
    )
    out = semantic_dedup(emb, eps=0.99, cents=cents).collect()
    # identical vectors within each parity class: all but the keeper
    # of each class are dropped
    assert len(out) == 8
    buckets = {r["bucket"] for r in out}
    assert buckets == {0, 1}


def test_dedup_report_matches_bruteforce_within_cluster(spark):
    # within any one cluster the dropped set equals the brute-force
    # dominance computation done in python
    import itertools
    import math

    rows = [
        (i, [math.cos(0.03 * i), math.sin(0.03 * i), 0.1 * (i % 3)])
        for i in range(24)
    ]
    emb = _emb(spark, rows)
    cents = medoid_centroids(emb, n_centroids=3)
    mem = assign_clusters(emb, cents).collect()
    vecs = {r["id"]: r["v"] for r in mem}
    meta = {r["id"]: (r["bucket"], r["ccos"]) for r in mem}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 4)

    eps = 0.995
    expect = set()
    for i, j in itertools.combinations(sorted(vecs), 2):
        if meta[i][0] != meta[j][0]:
            continue
        if cos(vecs[i], vecs[j]) < eps:
            continue
        ci, cj = meta[i][1], meta[j][1]
        loser = i if (ci, -i) > (cj, -j) else j  # closer-to-centroid loses
        # NB python tie-break mirror: larger id loses on equal ccos
        loser = i if ci > cj or (ci == cj and i > j) else j
        expect.add(loser)
    got = {r["vec_id"] for r in semantic_dedup(emb, n_centroids=3, eps=eps).collect()}
    assert got == expect
    assert len(expect) > 0


def test_incremental_corpus_always_wins(spark):
    from deja_view_spark.operators.semdedup import incremental_semantic_dedup

    corpus = _emb(
        spark,
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [0.0, 0.0, 1.0]),
            (3, [0.96, 0.28, 0.0]),
        ],
    )
    batch = _emb(
        spark,
        [
            (100, [1.0, 0.0, 0.0]),     # exact dup of corpus 0 -> dropped
            (101, [0.99, 0.14, 0.0]),   # near-dup of 0/3 -> dropped
            (102, [-1.0, 0.5, 0.5]),    # nothing close -> survives
        ],
    )
    out = {r["vec_id"]: r for r in
           incremental_semantic_dedup(batch, corpus, n_centroids=2,
                                      eps=0.9).collect()}
    assert 100 in out and out[100]["cos"] == 1.0
    # the dropped batch vector names a CORPUS partner, never a batch one
    assert all(r["kept_id"] < 100 for r in out.values())
    assert 102 not in out


def test_incremental_subset_of_batch_union_corpus_full_dedup(spark):
    # a batch vector dropped by the incremental probe must also be a
    # duplicate-pair member in the full joint dedup (same centroids)
    import math

    rows = [(i, [math.cos(0.05 * i), math.sin(0.05 * i), 0.0])
            for i in range(40)]
    emb = _emb(spark, rows)
    batch = emb.where("vec_id % 10 = 0")
    corpus = emb.where("vec_id % 10 <> 0")
    from deja_view_spark.operators.semdedup import (
        incremental_semantic_dedup,
        medoid_centroids,
    )

    cents = medoid_centroids(corpus, n_centroids=3)
    inc = {r["vec_id"] for r in
           incremental_semantic_dedup(batch, corpus, eps=0.995,
                                      cents=cents).collect()}
    full_pairs = semantic_dedup(emb, eps=0.995, cents=cents)
    touched = {r["vec_id"] for r in full_pairs.collect()} | {
        r["kept_id"] for r in full_pairs.collect()
    }
    assert inc  # non-degenerate on this ring
    assert inc <= touched
