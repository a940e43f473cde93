"""Retrieval-stack semantics: BM25 against an independent pure-python
scorer, RRF fusion arithmetic from the emitted ranks, two-hop counts
against a python traversal of the same edge set, and the plan shapes
(sorted limit, broadcast probe)."""

import math
import re

import pandas as pd
import pytest

from deja_view_spark import queries_retrieval as R

SF_DIR = "/root/testdata/sf0.001"


def _py_bm25(sf_dir: str) -> dict[int, float]:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tok = re.compile(R.TOKEN_RE)
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = tok.findall(text.lower())
        rows.append(
            (
                int(doc_id),
                len(toks),
                [sum(1 for x in toks if x == t) for t in R.BM25_TERMS],
            )
        )
    n = len(rows)
    avgdl = sum(dl for _, dl, _ in rows) / n
    dfs = [
        sum(1 for _, _, tfs in rows if tfs[i] > 0)
        for i in range(len(R.BM25_TERMS))
    ]
    out = {}
    for doc_id, dl, tfs in rows:
        s = 0.0
        for i, tf in enumerate(tfs):
            idf = math.log(1.0 + (n - dfs[i] + 0.5) / (dfs[i] + 0.5))
            norm = 1.0 - R.BM25_B + R.BM25_B * dl / avgdl
            s += idf * tf * (R.BM25_K1 + 1.0) / (tf + R.BM25_K1 * norm)
        out[doc_id] = round(s, 4)
    return out


def test_bm25_matches_python_scorer(spark):
    expected = _py_bm25(SF_DIR)
    got = {
        r["doc_id"]: r["bm25"]
        for r in R.q_docs_bm25_topk(spark, SF_DIR).collect()
    }
    assert len(got) == min(R.BM25_TOP_K, len(expected))
    for doc_id, score in got.items():
        assert score == pytest.approx(expected[doc_id], abs=1e-4)
    # the returned set IS the top-k of the python ranking
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))
    assert set(got) == {d for d, _ in top[: len(got)]}


def test_bm25_plan_is_sorted_limit(spark):
    plan = R.q_docs_bm25_topk(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_hybrid_rrf_fusion_arithmetic(spark):
    rows = R.q_docs_hybrid_rrf(spark, SF_DIR).collect()
    assert 0 < len(rows) <= R.HYBRID_TOP_K
    for r in rows:
        expect = 0.0
        if r["rank_lex"] is not None:
            assert 1 <= r["rank_lex"] <= R.RRF_POOL
            expect += 1.0 / (R.RRF_K + r["rank_lex"])
        if r["rank_sem"] is not None:
            assert 1 <= r["rank_sem"] <= R.RRF_POOL
            expect += 1.0 / (R.RRF_K + r["rank_sem"])
        assert r["rrf"] == pytest.approx(round(expect, 6), abs=1e-9)
    # fused output is sorted by (rrf desc, doc_id)
    keys = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_hybrid_lex_ranks_agree_with_bm25(spark):
    bm25 = {
        r["doc_id"]: r["bm25"]
        for r in R._bm25_scored(spark, SF_DIR).collect()
    }
    ranked = sorted(bm25.items(), key=lambda kv: (-kv[1], kv[0]))
    lex_rank = {d: i + 1 for i, (d, _) in enumerate(ranked[: R.RRF_POOL])}
    for r in R.q_docs_hybrid_rrf(spark, SF_DIR).collect():
        if r["rank_lex"] is not None:
            assert lex_rank[r["doc_id"]] == r["rank_lex"]


def test_hybrid_probe_is_broadcast(spark):
    plan = R.q_docs_hybrid_rrf(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_two_hop_matches_python_traversal(spark):
    from deja_view_spark.queries_graph import _chain_edges

    edges = [(r["src"], r["dst"]) for r in _chain_edges(spark, SF_DIR).collect()]
    out = {}
    by_src = {}
    for s, d in edges:
        by_src.setdefault(s, []).append(d)
    for a, b in edges:
        for c in by_src.get(b, []):
            if a != c:
                out[(a, c)] = out.get((a, c), 0) + 1
    expect = sorted(
        ((n, a, c) for (a, c), n in out.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[: R.TWO_HOP_TOP_K]
    got = [
        (r["n_mids"], r["a"], r["c"])
        for r in R.q_kg_two_hop(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_two_hop_degree_cap_drops_hub(spark):
    """The max_mid_degree escalation must (a) equal a python twin that
    excludes high-degree intermediates, (b) actually bite on the
    planted-skew graph, and (c) place the keep-set semi-joins BELOW
    the hop join in the plan."""
    from deja_view_spark.queries_graph import _chain_edges

    edges = [(r["src"], r["dst"]) for r in _chain_edges(spark, SF_DIR).collect()]
    deg: dict = {}
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    cap = max(deg.values()) - 1  # excludes at least the top hub
    keep = {n for n, dv in deg.items() if dv <= cap}
    by_src: dict = {}
    for s, d in edges:
        if s in keep:
            by_src.setdefault(s, []).append(d)
    out: dict = {}
    for a, b in edges:
        if b not in keep:
            continue
        for c in by_src.get(b, []):
            if a != c:
                out[(a, c)] = out.get((a, c), 0) + 1
    expect = sorted(
        ((n, a, c) for (a, c), n in out.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[: R.TWO_HOP_TOP_K]
    capped = R.q_kg_two_hop(spark, SF_DIR, max_mid_degree=cap)
    got = [(r["n_mids"], r["a"], r["c"]) for r in capped.collect()]
    assert got == expect
    uncapped = [
        (r["n_mids"], r["a"], r["c"])
        for r in R.q_kg_two_hop(spark, SF_DIR).collect()
    ]
    assert got != uncapped  # the cap must exclude hub-routed pairs
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


# ------------------------------------------------- MMR diversification
def test_mmr_matches_python_twin(spark):
    """embeddings_mmr_topk == a pure-python greedy MMR with the exact
    sequential-fold cosine (mirrors zip_with's accumulation order
    bit-for-bit); first pick per probe must be the plain relevance
    argmax."""
    from deja_view_spark.queries_retrieval import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        MMR_PROBES,
        q_embeddings_mmr_topk,
    )
    from deja_view_spark.sources.catalog import load_table

    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
    )
    vecs = {int(v): list(map(float, e)) for v, e in zip(emb["vec_id"], emb["embedding"])}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    import math

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    want = []
    for p in range(MMR_PROBES):
        pv = vecs[p]
        rel = {
            v: cos(vecs[v], pv) for v in vecs if v != p
        }
        pool = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_POOL]
        maxsel = {v: -1.0 for v in pool}
        selected = []
        for step in range(1, MMR_K + 1):
            best = min(
                (v for v in pool if v not in selected),
                key=lambda v: (
                    -(MMR_LAMBDA * rel[v] - (1.0 - MMR_LAMBDA) * maxsel[v]),
                    v,
                ),
            )
            selected.append(best)
            want.append((p, step, best))
            for v in pool:
                if v not in selected:
                    maxsel[v] = max(maxsel[v], cos(vecs[v], vecs[best]))
        # first pick is the relevance argmax (maxsel uniform at -1)
        assert selected[0] == min(pool, key=lambda v: (-rel[v], v))
        assert len(set(selected)) == MMR_K  # no repeats
    out = [
        (r.probe_id, r.mmr_rank, r.vec_id)
        for r in q_embeddings_mmr_topk(spark, "/root/testdata/sf0.001").collect()
    ]
    assert out == want
