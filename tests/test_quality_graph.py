"""Tests for the quality-filter and graph query families
(queries_quality.py, queries_graph.py) against independent
pure-Python/numpy oracles at sf0.001."""

import re

import numpy as np
import pytest

from deja_view_spark import queries_graph as QG
from deja_view_spark import queries_quality as QQ

SF = "/root/testdata/sf0.001"
TOKEN = re.compile(r"[a-z0-9_]+")


def _r4(x: float) -> float:
    """HALF_UP to 4dp (Spark/DuckDB round), not Python's banker's."""
    import decimal

    return float(
        decimal.Decimal(x).quantize(
            decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
        )
    )


@pytest.fixture(scope="module")
def docs_pd(spark):
    from deja_view_spark.sources.catalog import load_table

    return load_table(spark, SF, "documents").select(
        "doc_id", "text"
    ).toPandas()


# ---------------------------------------------------------- docs_repetition
def _py_repetition(text: str):
    toks = TOKEN.findall(text.lower())
    n = len(toks)
    tri = [" ".join(toks[i : i + 3]) for i in range(n - 2)]
    bi = [" ".join(toks[i : i + 2]) for i in range(n - 1)]
    dup_tri = _r4((len(tri) - len(set(tri))) / len(tri)) if tri else 0.0
    if bi:
        counts = {}
        for g in bi:
            counts[g] = counts.get(g, 0) + 1
        top_c = max(counts.values())
        top_g = min(g for g, c in counts.items() if c == top_c)
    else:
        top_c, top_g = 0, ""
    return {
        "n_tokens": n,
        "distinct_ratio": _r4(len(set(toks)) / n),
        "dup_trigram_frac": dup_tri,
        "top_bigram": top_g,
        "top_bigram_frac": _r4(top_c / max(n - 1, 1)),
    }


def test_repetition_matches_python_oracle(spark, docs_pd):
    out = QQ.q_docs_repetition(spark, SF).toPandas().set_index("doc_id")
    assert len(out) == len(docs_pd)
    for _, row in docs_pd.iterrows():
        exp = _py_repetition(row["text"])
        got = out.loc[row["doc_id"]]
        for k, v in exp.items():
            if isinstance(v, float):
                assert got[k] == pytest.approx(v, abs=1e-9), (row["doc_id"], k)
            else:
                assert got[k] == v, (row["doc_id"], k)
        exp_keep = (
            exp["distinct_ratio"] >= QQ.MIN_DISTINCT_RATIO
            and exp["dup_trigram_frac"] <= QQ.MAX_DUP_TRIGRAM
            and exp["top_bigram_frac"] <= QQ.MAX_TOP_BIGRAM
        )
        assert bool(got["keep"]) == exp_keep


def test_repetition_gate_is_nondegenerate(spark):
    out = QQ.q_docs_repetition(spark, SF).toPandas()
    assert 0 < out["keep"].sum() < len(out)


# ----------------------------------------------------------- docs_pii_scrub
def test_pii_counts_match_seeding(spark):
    out = QQ.q_docs_pii_scrub(spark, SF).toPandas()
    # the base corpus has no PII, so every count is exactly the seeded one
    assert (out["n_email"] == (out["doc_id"] % 5 == 0).astype(int)).all()
    assert (out["n_ipv4"] == (out["doc_id"] % 7 == 0).astype(int)).all()
    assert (out["n_phone"] == (out["doc_id"] % 11 == 0).astype(int)).all()
    # only PII-bearing docs are emitted
    assert (
        (out["doc_id"] % 5 == 0) | (out["doc_id"] % 7 == 0)
        | (out["doc_id"] % 11 == 0)
    ).all()


def test_pii_redaction_removes_all_matches(docs_pd):
    # replay seeding + redaction in pure Python; redacted text must be
    # pattern-free and each bank's token must appear where seeded
    for _, row in docs_pd.head(60).iterrows():
        did = int(row["doc_id"])
        txt = row["text"]
        if did % 5 == 0:
            txt += f" contact user{did}@example.com"
        if did % 7 == 0:
            txt += f" node at 10.{did % 256}.0.{did % 100}"
        if did % 11 == 0:
            txt += f" call 555-{did % 10000:04d}"
        red = txt
        for _n, pat, token in QQ.PII_BANKS:
            red = re.sub(pat, token, red)
        for _n, pat, _t in QQ.PII_BANKS:
            assert not re.search(pat, red), (did, pat)
        assert ("<EMAIL>" in red) == (did % 5 == 0)
        assert ("<IP>" in red) == (did % 7 == 0)
        assert ("<PHONE>" in red) == (did % 11 == 0)


# ---------------------------------------------------------- events_pagerank
def test_pagerank_matches_numpy(spark):
    out = QG.q_events_pagerank(spark, SF).toPandas()
    assert (out["rank"] > 0).all()
    # rebuild the same graph in pandas/numpy and run float PageRank;
    # fixed-point floor loss is O(1e-10) relative, so agreement is tight
    from deja_view_spark.sources.catalog import load_table
    import json

    ev = load_table(spark, SF, "events").select("props", "user_id").toPandas()
    ev["item"] = ev["props"].map(lambda s: json.loads(s)["k"])
    edges = set()
    for _, grp in ev.groupby("item"):
        us = sorted(set(grp["user_id"]))
        for a, b in zip(us, us[1:]):
            if a != b:
                edges.add((a, b))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _ in edges:
        outdeg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(QG.ITERS):
        contrib = np.zeros(n)
        for a, b in edges:
            contrib[idx[b]] += 0.85 * r[idx[a]] / outdeg[idx[a]]
        r = 0.15 / n + contrib
    got = out.set_index("node")["rank"]
    assert set(got.index) == set(nodes)
    for u in nodes:
        assert got[u] / QG.SCALE == pytest.approx(r[idx[u]], abs=1e-6)


def test_pagerank_mass_bounded(spark):
    out = QG.q_events_pagerank(spark, SF).toPandas()
    # total mass <= SCALE (floor rounding + dangling loss only shrink it)
    # dangling chain-tails leak mass every iteration, so the total is
    # well under SCALE but must stay positive and <= SCALE
    assert 0 < out["rank"].sum() <= QG.SCALE
