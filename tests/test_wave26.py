"""Wave-26: degree power-law MLE fit, exact-k per-group sampler."""

import collections
import hashlib
import math

import duckdb

from deja_view_spark.queries_corpus import (
    GROUP_SAMPLE_K,
    GROUP_SAMPLE_SALT,
    q_docs_group_sample,
)
from deja_view_spark.queries_graph import q_events_degree_powerlaw

SF = "/root/testdata/sf0.001"


def _edges_py():
    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT DISTINCT CAST(json_extract_string(props, '$.k')
                                 AS BIGINT) AS item, user_id
            FROM read_parquet('{SF}/events.parquet')
            WHERE json_extract_string(props, '$.k') IS NOT NULL"""
    ).fetchall()
    by_item: dict = collections.defaultdict(list)
    for item, u in rows:
        by_item[item].append(u)
    edges = set()
    for us in by_item.values():
        us.sort()
        for a, b in zip(us, us[1:]):
            if a != b:
                edges.add((a, b))
    return edges


def test_powerlaw_matches_python(spark):
    edges = _edges_py()
    got = {r.side: r for r in q_events_degree_powerlaw(spark, SF).collect()}
    assert set(got) == {"in", "out"}
    for side, idx in (("out", 0), ("in", 1)):
        deg = collections.Counter(e[idx] for e in edges)
        hist = collections.Counter(deg.values())
        n = sum(hist.values())
        sum_ln = sum(
            cnt * round(math.log(2.0 * d), 6) for d, cnt in hist.items()
        )
        r = got[side]
        assert (r.n_nodes, r.n_edges, r.max_degree) == (
            n, len(edges), max(deg.values()),
        )
        assert abs(r.alpha_mle - (1.0 + n / sum_ln)) < 1e-3
        assert r.alpha_mle > 1.0  # MLE lower bound for xmin=1


def test_group_sample_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang, doc_id FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    by_lang: dict = collections.defaultdict(list)
    for lang, did in rows:
        pri = hashlib.md5(
            f"{GROUP_SAMPLE_SALT}{did}".encode()
        ).hexdigest()
        by_lang[lang].append((pri, did))
    got: dict = collections.defaultdict(list)
    for r in q_docs_group_sample(spark, SF).collect():
        got[r.lang].append((r.draw_rank, r.doc_id))
    assert set(got) == set(by_lang)
    for lang, draws in by_lang.items():
        draws.sort()
        want = [
            (i + 1, did)
            for i, (_p, did) in enumerate(draws[:GROUP_SAMPLE_K])
        ]
        assert sorted(got[lang]) == want
        # exact-k contract
        assert len(got[lang]) == min(GROUP_SAMPLE_K, len(draws))
