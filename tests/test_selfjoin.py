"""Flagship operator: LSH self-join vs exact oracle (P/R gate),
reference-semantics invariants (self-exclusion, threshold, top-3,
mirroring)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deja_view_spark.functions.embedding import embed_numpy
from deja_view_spark.operators.selfjoin import duplicate_edges, duplicate_report

TEXTS = {
    # two near-dup clusters + singletons
    "d1": "the scheduler starves low priority jobs under heavy load always",
    "d2": "the scheduler starves low priority jobs under heavy load often",
    "d3": "the scheduler starves low priority jobs under heavy load",
    "d4": "pagination returns duplicate entries across page boundaries",
    "d5": "pagination returns duplicated entries across page boundaries too",
    "d6": "completely different text about websocket connection drops",
    "d7": "another unrelated note regarding metrics counters resetting",
}


@pytest.fixture(scope="module")
def emb(spark):
    ids = list(TEXTS)
    vecs = embed_numpy([TEXTS[i] for i in ids])
    rows = [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)]
    return spark.createDataFrame(rows, "doc_id string, vector array<float>").cache()


def test_exact_edges_semantics(emb):
    edges = duplicate_edges(emb, threshold=0.8, top_k=3, method="exact",
                            convention="report").collect()
    assert edges, "expected duplicate edges in clustered fixture"
    by_src = {}
    for r in edges:
        assert r.src != r.dst                      # self-exclusion
        assert r.similarity >= 0.8                 # threshold (cli.py:552)
        by_src.setdefault(r.src, []).append(r)
    for src, rs in by_src.items():
        assert len(rs) <= 3                        # top-3 (cli.py:571)
        ranks = sorted(x.rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
    # mirroring: d1-d2 must appear in both directions
    pairs = {(r.src, r.dst) for r in edges}
    assert ("d1", "d2") in pairs and ("d2", "d1") in pairs


def test_lsh_matches_exact(emb):
    exact = {(r.src, r.dst) for r in duplicate_edges(
        emb, threshold=0.8, method="exact", convention="report").collect()}
    lsh = {(r.src, r.dst) for r in duplicate_edges(
        emb, threshold=0.8, method="lsh", convention="report").collect()}
    # at this tiny scale LSH must achieve full recall and precision
    assert lsh == exact


def test_service_vs_report_convention(emb):
    svc = duplicate_edges(emb, threshold=0.8, method="exact",
                          convention="service")
    rep = duplicate_edges(emb, threshold=0.8, method="exact",
                          convention="report")
    svc_rows = {(r.src, r.dst): r.similarity for r in svc.collect()}
    rep_rows = {(r.src, r.dst): r.similarity for r in rep.collect()}
    for k in set(svc_rows) & set(rep_rows):
        cos_svc = svc_rows[k]                  # sim = cos
        cos_rep = 2 * rep_rows[k] - 1          # sim = (1+cos)/2
        assert abs(cos_svc - cos_rep) < 2e-3   # 4dp rounding slack


def test_duplicate_report_rollup(emb):
    edges = duplicate_edges(emb, threshold=0.8, method="exact",
                            convention="report")
    rep = duplicate_report(edges).collect()
    sims = {}
    for r in edges.collect():
        sims.setdefault(r.src, []).append(r.similarity)
    for row in rep:
        assert row.max_similarity == max(sims[row.src])   # cli.py:572
        assert row.band in ("very_high", "high", "below")


def test_lsh_recall_on_random_corpus(spark):
    """P/R gate at a few hundred docs: LSH candidates must recover
    >=0.95 of exact edges at threshold 0.8 (SURVEY §7.4.3)."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((60, 64))
    rows = []
    k = 0
    for i, b in enumerate(base):
        for j in range(4):  # clusters of 4 noisy variants
            v = b + rng.standard_normal(64) * 0.22
            v = v / np.linalg.norm(v)
            rows.append((f"c{i}_{j}", [float(x) for x in v]))
            k += 1
    emb = spark.createDataFrame(rows, "doc_id string, vector array<float>")
    exact = {(r.src, r.dst) for r in duplicate_edges(
        emb, threshold=0.8, method="exact", convention="report",
        top_k=10).collect()}
    lsh = {(r.src, r.dst) for r in duplicate_edges(
        emb, threshold=0.8, method="lsh", convention="report",
        top_k=10).collect()}
    assert exact, "fixture should produce edges"
    recall = len(lsh & exact) / len(exact)
    precision = len(lsh & exact) / max(1, len(lsh))
    assert recall >= 0.95, f"recall {recall:.3f}"
    assert precision >= 0.95, f"precision {precision:.3f}"


def test_salt_path_preserves_exact_pair_set(spark):
    """North-rule 'explicit salting of hot repos': forcing EVERY bucket
    through the oversized-bucket salted self-join (max_bucket=2) must
    emit exactly the pair set of the bucket-array fast path
    (max_bucket=10^9) — the salt decomposition is pair-set-preserving,
    not approximate."""
    from deja_view_spark.operators.selfjoin import _pairs_from_band_table

    # 3 buckets: sizes 7 (hot), 3, 1 — plus a doc in two buckets
    rows = []
    for i in range(7):
        rows.append((f"d{i:02d}", "", 100))
    for i in range(7, 10):
        rows.append((f"d{i:02d}", "", 200))
    rows.append(("d00", "", 200))  # cross-bucket membership
    rows.append(("d99", "", 300))  # singleton
    bt = spark.createDataFrame(rows, "doc_id string, _scope string, band long")

    fast = {
        (r["src"], r["dst"])
        for r in _pairs_from_band_table(bt, max_bucket=10**9).collect()
    }
    salted = {
        (r["src"], r["dst"])
        for r in _pairs_from_band_table(bt, max_bucket=2).collect()
    }
    # expected: all pairs within each bucket, deduped, src < dst
    import itertools

    expect = set()
    members = {100: [f"d{i:02d}" for i in range(7)],
               200: [f"d{i:02d}" for i in range(7, 10)] + ["d00"],
               300: ["d99"]}
    for ids in members.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            expect.add((a, b))
    assert fast == expect
    assert salted == expect
