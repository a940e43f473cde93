"""Golden duplicate-edge fixtures (FIXTURES.md §4): replay the
reference's similar-issue semantics end-to-end on Issue-shaped rows and
compare EVERY emitted value against an independent NumPy exact-cosine
oracle of the same semantics (find_similar_issues.py:111-132,
cli.py:550-573)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deja_view_spark.functions.embedding import embed_numpy, make_embed_udf
from deja_view_spark.functions.text import doc_text
from deja_view_spark.operators.selfjoin import duplicate_edges

ISSUES = [
    # (number, title, body, state, labels, is_pr, near-dup cluster id)
    (1, "How do I configure the model?", "Looking for guidance on the provider setup", "open", ["question"], False),
    (2, "How do I configure the model provider?", "Looking for guidance on the provider setup steps", "open", ["question"], False),
    (3, "App crashes with segfault on startup", "traceback attached, reproduces on arm64", "open", ["bug", "urgent"], False),
    (4, "App crashes with segfault on boot", "traceback attached, reproduces on arm64 runners", "closed", ["bug"], False),
    (5, "It would be great to have a dark mode option", "feature request for themes", "open", ["enhancement"], False),
    (6, "Add retry logic to the client", "x" * 12000, "open", [], False),  # truncation row
    (7, "Completely unrelated housekeeping task", "update the changelog for the release train", "open", [], False),
]

THRESHOLD = 0.8
TOP_K = 3
DIM = 64


def _doc_texts():
    """Reference template (github_similarity_service.py:186-211),
    computed independently in pure Python for the oracle."""
    out = {}
    for n, title, body, state, labels, is_pr in ISSUES:
        segs = [f"Title: {title}", "Type: Issue", f"State: {state}"]
        if labels:
            segs.append("Labels: " + ", ".join(labels))
        if body:
            b = body if len(body) <= 10_000 else body[:10_000] + "... [truncated]"
            segs.append("Body: " + b)
        out[f"o/r/issues/{n}"] = "\n\n".join(segs)
    return out


def _numpy_oracle():
    """Exact all-pairs top-k under report convention (1 - d/2), rounded
    4dp — the independent implementation of cli.py:543-573."""
    docs = _doc_texts()
    ids = sorted(docs)
    vecs = embed_numpy([docs[i] for i in ids], dim=DIM)
    sims = vecs @ vecs.T  # L2-normalized -> cosine
    edges = {}
    for i, src in enumerate(ids):
        cands = []
        for j, dst in enumerate(ids):
            if i == j:
                continue  # self-exclusion (:405-407)
            sim = round((1.0 + float(sims[i, j])) / 2.0, 4)  # 1 - d/2
            if sim >= THRESHOLD:  # threshold (cli.py:552)
                cands.append((sim, dst))
        cands.sort(key=lambda t: (-t[0], t[1]))  # ties: id asc
        for rank, (sim, dst) in enumerate(cands[:TOP_K], 1):  # top-3
            band = "very_high" if sim >= 0.90 else "high"  # cli.py:589-590
            edges[(src, dst)] = (sim, rank, band)
    return edges


@pytest.fixture(scope="module")
def engine_edges(spark):
    df = spark.createDataFrame(
        [
            (n, t, b, s, l, p)
            for n, t, b, s, l, p in ISSUES
        ],
        "number long, title string, body string, state string, "
        "labels array<string>, is_pull_request boolean",
    )
    docs = df.select(
        F.concat_ws("/", F.lit("o"), F.lit("r"), F.lit("issues"), F.col("number")).alias("doc_id"),
        doc_text(
            F.col("title"),
            F.col("body"),
            F.col("state"),
            F.col("labels"),
            F.col("is_pull_request"),
            F.lit(False),
        ).alias("doc_text"),
    )
    embed = make_embed_udf(dim=DIM)
    emb = docs.select("doc_id", embed(F.col("doc_text")).alias("vector"))
    edges = duplicate_edges(
        emb, threshold=THRESHOLD, top_k=TOP_K, method="exact", convention="report"
    )
    return {
        (r.src, r.dst): (r.similarity, r.rank)
        for r in edges.collect()
    }


def test_edge_set_matches_numpy_oracle(engine_edges):
    oracle = _numpy_oracle()
    assert set(engine_edges) == set(oracle)
    assert oracle, "fixture must produce golden edges"


def test_edge_values_match_numpy_oracle(engine_edges):
    oracle = _numpy_oracle()
    for key, (sim, rank) in engine_edges.items():
        osim, orank, _ = oracle[key]
        assert sim == pytest.approx(osim, abs=1.5e-4), key
        assert rank == orank, key


def test_question_cluster_is_golden_edge(engine_edges):
    # the near-identical question pair must be a mutual duplicate edge
    assert ("o/r/issues/1", "o/r/issues/2") in engine_edges
    assert ("o/r/issues/2", "o/r/issues/1") in engine_edges


def test_unrelated_issue_has_no_edges(engine_edges):
    assert not any("issues/7" in a or "issues/7" in b for a, b in engine_edges)
