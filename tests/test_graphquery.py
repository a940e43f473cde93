"""Graph-consumption operators over a built KG (operators/graphquery):
partition-pruned predicate scans, hop joins, canonical resolution,
duplicate clusters."""

import shutil

import pytest
from pyspark.sql import functions as F

from deja_view_spark.datagen import generate_repos
from deja_view_spark.operators.graphquery import (
    degree_stats,
    duplicate_clusters,
    neighbors,
    pagerank,
    pred_scan,
    resolve_canonical,
    two_hop,
)
from deja_view_spark.plans.pipeline import KGPipeline

N_ROWS = 400


@pytest.fixture(scope="module")
def kg(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("kg_gq")
    src = generate_repos(spark, N_ROWS)
    pipe = KGPipeline(spark, src, str(d), threshold=0.8, method="lsh")
    pipe.run()
    # read back the PARTITIONED table — pruning behavior is the point
    triples = spark.read.parquet(pipe._triples_path())
    yield src, triples
    shutil.rmtree(str(d), ignore_errors=True)


def test_pred_scan_prunes_partitions(kg):
    _, triples = kg
    plan = pred_scan(triples, "duplicates")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "duplicates" in plan


def test_neighbors_contains_matches_source(kg):
    src, triples = kg
    repo = "bigcorp/monorepo"
    got = {r.neighbor for r in neighbors(triples, repo, pred="contains").collect()}
    want = {
        r.path for r in src.where(F.col("repo") == repo).select("path").collect()
    }
    assert got == want and got


def test_neighbors_in_and_both(kg):
    src, triples = kg
    # pick a path mentioned by someone
    m = pred_scan(triples, "mentions").limit(1).collect()
    if not m:
        pytest.skip("no mention edges at this corpus size")
    node = m[0].obj
    inn = {r.neighbor for r in neighbors(triples, node, direction="in").collect()}
    both = {r.neighbor for r in neighbors(triples, node, direction="both").collect()}
    assert m[0].subj in inn and inn <= both


def test_two_hop_matches_manual_join(kg):
    _, triples = kg
    got = two_hop(triples, "duplicates", "mentions", broadcast_first=True)
    d = pred_scan(triples, "duplicates").select(
        F.col("subj").alias("a"), F.col("obj").alias("b"),
        F.col("weight").alias("w1"))
    m = pred_scan(triples, "mentions").select(
        F.col("subj").alias("b"), F.col("obj").alias("c"),
        F.col("weight").alias("w2"))
    want = (
        d.join(m, "b").where(F.col("a") != F.col("c"))
        .groupBy("a", "b", "c")
        .agg(F.max(F.col("w1") * F.col("w2")).alias("path_weight"))
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_resolve_canonical_idempotent_and_total(kg):
    _, triples = kg
    dup = pred_scan(triples, "duplicates").select("subj", "obj", "weight")
    resolved = resolve_canonical(dup, triples, ["subj", "obj"])
    # total: same row count, no nulls introduced
    assert resolved.count() == dup.count()
    assert resolved.where(F.col("subj").isNull() | F.col("obj").isNull()).count() == 0
    # idempotent: resolving twice changes nothing (canonical ids map
    # to themselves via the identity rows)
    again = resolve_canonical(resolved, triples, ["subj", "obj"])
    assert resolved.exceptAll(again).count() == 0
    # duplicate edges collapse inside a component: every resolved
    # duplicate edge endpoint pair shares a canonical id
    assert resolved.where(F.col("subj") != F.col("obj")).count() == 0


def test_degree_stats_consistent(kg):
    _, triples = kg
    stats = {r.pred: r for r in degree_stats(triples).collect()}
    assert set(stats) == {"contains", "mentions", "duplicates", "same_as"}
    for pred, r in stats.items():
        n = triples.where(F.col("pred") == pred).count()
        assert r.n_edges == n
        assert r.avg_out_degree == pytest.approx(n / r.n_subj, abs=1e-3)


def test_duplicate_clusters_match_same_as(kg):
    _, triples = kg
    clusters = duplicate_clusters(triples).collect()
    assert clusters, "expected at least one duplicate cluster"
    for c in clusters:
        assert c.size == len(c.members) >= 2
        # every member maps to this canonical in same_as
    sa = {
        (r.subj, r.obj) for r in pred_scan(triples, "same_as").collect()
    }
    for c in clusters:
        for m in c.members:
            assert (m, c.canonical) in sa


def test_pagerank_matches_numpy(spark):
    # hand graph: star (a->b,c,d) + chain (b->c->d) + cycle (d->a)
    import numpy as np

    raw = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("c", "d"),
           ("d", "a")]
    triples = spark.createDataFrame(
        [(s, "links", o, 1.0) for s, o in raw],
        ["subj", "pred", "obj", "weight"],
    )
    got = {r.node: r.rank for r in pagerank(triples, iters=12).collect()}

    nodes = sorted({x for e in raw for x in e})
    idx = {u: i for i, u in enumerate(nodes)}
    outdeg = np.zeros(len(nodes))
    for s, _ in raw:
        outdeg[idx[s]] += 1
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(12):
        c = np.zeros(len(nodes))
        for s, o in raw:
            c[idx[o]] += 0.85 * r[idx[s]] / outdeg[idx[s]]
        r = 0.15 / len(nodes) + c
    assert set(got) == set(nodes)
    for u in nodes:
        assert got[u] == pytest.approx(r[idx[u]], abs=1e-12)
    # no dangling nodes here -> mass conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_undirected_symmetric(spark):
    # undirected path graph a-b-c: ends are symmetric, middle ranks top
    triples = spark.createDataFrame(
        [("a", "links", "b", 1.0), ("b", "links", "c", 1.0)],
        ["subj", "pred", "obj", "weight"],
    )
    got = {r.node: r.rank for r in
           pagerank(triples, undirected=True, iters=20).collect()}
    assert got["a"] == pytest.approx(got["c"], abs=1e-12)
    assert got["b"] > got["a"]


def test_pagerank_on_kg_duplicates(kg):
    _, triples = kg
    ranks = pagerank(triples, pred="duplicates", undirected=True, iters=8)
    rows = ranks.collect()
    assert rows and all(r.rank > 0 for r in rows)
    # nodes are exactly the duplicate-edge endpoints
    dup = pred_scan(triples, "duplicates")
    want = {r.subj for r in dup.collect()} | {r.obj for r in dup.collect()}
    assert {r.node for r in rows} == want
