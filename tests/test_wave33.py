"""Wave-33: Heaps' law vocabulary-growth fit."""

import collections
import math
import re

import duckdb
import pytest

from deja_view_spark.queries_text import (
    HEAPS_BUCKETS,
    TOKEN_RE,
    q_docs_heaps_law,
)

SF = "/root/testdata/sf0.001"


def _points_py():
    con = duckdb.connect()
    docs = sorted(
        con.sql(
            f"SELECT doc_id, text FROM "
            f"read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    tok = re.compile(TOKEN_RE)
    n = len(docs)
    bucket_tokens = collections.Counter()
    first_bucket: dict = {}
    for rk, (_did, text) in enumerate(docs, start=1):
        b = min(HEAPS_BUCKETS, math.ceil(rk * HEAPS_BUCKETS / n))
        toks = tok.findall(text.lower())
        shingles = [
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        ]
        bucket_tokens[b] += len(shingles)
        for sh in shingles:
            if sh not in first_bucket:
                first_bucket[sh] = b
    new_terms = collections.Counter(first_bucket.values())
    pts = []
    tc = vc = 0
    for b in range(1, HEAPS_BUCKETS + 1):
        tc += bucket_tokens[b]
        vc += new_terms[b]
        pts.append((b, tc, vc))
    return pts


def test_heaps_matches_python(spark):
    pts = _points_py()
    lx = [round(math.log(t), 6) for _b, t, _v in pts]
    ly = [round(math.log(v), 6) for _b, _t, v in pts]
    m = len(pts)
    sx, sy = sum(lx), sum(ly)
    sxx = sum(x * x for x in lx)
    sxy = sum(x * y for x, y in zip(lx, ly))
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    k = math.exp((sy - beta * sx) / m)
    got = q_docs_heaps_law(spark, SF).collect()
    assert [(r.bucket, r.tokens_cum, r.vocab_cum) for r in got] == pts
    for r in got:
        assert r.heaps_beta == pytest.approx(beta, abs=1e-3)
        assert r.heaps_k == pytest.approx(k, rel=1e-3)
    # sublinear growth: 0 < beta < 1 (the Heaps regime)
    assert 0.0 < got[0].heaps_beta < 1.0
    # the fit predicts the last point within 25% (log-log linearity)
    b, t, v = pts[-1]
    pred = k * t**got[0].heaps_beta
    assert abs(pred - v) / v < 0.25


def test_heaps_exact_power_law_recovered():
    """On synthetic points lying EXACTLY on V = K N^beta the log-log
    OLS recovers (K, beta) to rounding."""
    k_true, beta_true = 3.0, 0.75
    pts = [(10 ** (i / 2)) for i in range(2, 12)]
    lx = [round(math.log(t), 6) for t in pts]
    ly = [round(math.log(k_true * t**beta_true), 6) for t in pts]
    m = len(pts)
    sx, sy = sum(lx), sum(ly)
    sxx = sum(x * x for x in lx)
    sxy = sum(x * y for x, y in zip(lx, ly))
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert beta == pytest.approx(beta_true, abs=1e-4)
    assert math.exp((sy - beta * sx) / m) == pytest.approx(
        k_true, rel=1e-3
    )
