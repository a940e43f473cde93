"""Dedup family: MinHash LSH recall vs exact Jaccard, SimHash hamming
correctness, fingerprint stability."""

import pytest
from pyspark.sql import functions as F

from deja_view_spark.operators.dedup import (
    minhash_dedup_pairs,
    simhash_dedup_pairs,
)

DOCS = [
    # near-dup cluster: same text with one-token edits (high jaccard)
    (0, "the cache invalidation races with concurrent writers under heavy load and the fix needs review"),
    (1, "the cache invalidation races with concurrent writers under heavy load and the fix needs testing"),
    (2, "the cache invalidation races with concurrent writers under heavy load and the patch needs review"),
    # exact duplicate pair
    (3, "pagination returns duplicate entries across page boundaries in the api"),
    (4, "pagination returns duplicate entries across page boundaries in the api"),
    # unrelated
    (5, "websocket connections drop silently behind the load balancer after deploys"),
    (6, "the scheduler starves low priority jobs when the queue depth grows"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_minhash_finds_near_dups(docs):
    pairs = minhash_dedup_pairs(docs, threshold=0.5).collect()
    found = {(r.src_doc, r.dst_doc) for r in pairs}
    # the exact pair and the heavy-overlap cluster must be found
    assert (3, 4) in found
    assert (0, 1) in found and (0, 2) in found
    # unrelated docs never pair
    assert not any(5 in p or 6 in p for p in found)
    # jaccard of the exact pair is 1.0
    exact = [r.jaccard for r in pairs if (r.src_doc, r.dst_doc) == (3, 4)]
    assert exact == [1.0]


def test_simhash_near_dups(docs):
    pairs = simhash_dedup_pairs(docs, max_hamming=10).collect()
    found = {(r.src_doc, r.dst_doc) for r in pairs}
    assert (3, 4) in found
    ham = {(r.src_doc, r.dst_doc): r.hamming for r in pairs}
    assert ham[(3, 4)] == 0  # identical text -> identical fingerprint


def test_simhash_deterministic(docs):
    a = sorted(map(tuple, simhash_dedup_pairs(docs, max_hamming=6).collect()))
    b = sorted(map(tuple, simhash_dedup_pairs(docs, max_hamming=6).collect()))
    assert a == b


def test_minhash_recall_vs_exact_on_testdata(spark):
    """On the real documents table: every exact-Jaccard pair >= 0.8
    must be recovered by the LSH path (recall 1.0 for true near-dups),
    and precision is exact by construction (verify step)."""
    from deja_view_spark.queries_text import q_docs_jaccard_pairs

    sf_dir = "/root/testdata/sf0.001"
    exact = {
        (r.src_doc, r.dst_doc)
        for r in q_docs_jaccard_pairs(spark, sf_dir).collect()
        if r.jaccard >= 0.8
    }
    lsh = {
        (r.src_doc, r.dst_doc)
        for r in minhash_dedup_pairs(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), threshold=0.8
        ).collect()
    }
    assert exact, "testdata should contain near-duplicate documents"
    assert exact <= lsh
    assert lsh <= exact  # verify step filters to the same threshold


def test_incremental_dedup_planted_pair(spark):
    """Incremental probe of a new batch against an indexed corpus:
    planted cross-split near-dup found with exact jaccard, corpus-side
    internal duplicates NOT re-emitted, and the new-batch band table is
    broadcast (no corpus shuffle)."""
    from deja_view_spark.operators.dedup import incremental_minhash_pairs

    corpus = spark.createDataFrame(
        [r for r in DOCS if r[0] != 1], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [r for r in DOCS if r[0] == 1], "doc_id long, text string"
    )
    out = incremental_minhash_pairs(new, corpus, threshold=0.5)
    rows = out.collect()
    found = {(r.src_doc, r.dst_doc) for r in rows}
    # the new doc pairs with both members of its cluster in the corpus
    assert (1, 0) in found and (1, 2) in found
    # the corpus-internal exact pair (3, 4) is NOT re-deduplicated
    assert all(r.src_doc == 1 for r in rows)
    # plan: candidate join must broadcast the (small) new side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_incremental_dedup_matches_full_pairs_subset(spark):
    """On the real documents table, the incremental query's output is
    exactly the cross-split subset of the full-corpus minhash pair set
    (same banding => same recall; disjoint split => src is always
    new-side)."""
    from deja_view_spark.queries import (
        q_docs_incremental_dedup,
        q_docs_minhash_pairs,
    )

    sf_dir = "/root/testdata/sf0.001"
    inc = {
        (r.src_doc, r.dst_doc, r.jaccard)
        for r in q_docs_incremental_dedup(spark, sf_dir).collect()
    }
    full = q_docs_minhash_pairs(spark, sf_dir).collect()
    new_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(
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
        .collect()
    }
    # full pairs are canonical (src < dst); incremental pairs are
    # directed new -> corpus. re-orient the cross-split subset.
    expect = set()
    for r in full:
        a, b = r.src_doc, r.dst_doc
        if (a in new_ids) != (b in new_ids):
            src, dst = (a, b) if a in new_ids else (b, a)
            expect.add((src, dst, r.jaccard))
    assert inc == expect
    assert expect, "split should cross at least one near-dup pair"
