"""Wave-14 operators: exact-integer KS drift test, RFM segmentation,
RAKE keyphrase extraction."""

import collections
import math
import re

import duckdb
import pytest

from deja_view_spark.queries_events import (
    RFM_F_CNT,
    RFM_M_CENTS,
    RFM_R_DAYS,
    q_events_rfm,
)
from deja_view_spark.queries_stats import KS_C_05, q_docs_length_ks
from deja_view_spark.queries_text import (
    RAKE_MAX_PHRASE,
    _STOPWORDS,
    q_docs_rake_keyphrases,
)

SF = "/root/testdata/sf0.001"


def test_ks_matches_python(spark):
    out = {r.source: r for r in q_docs_length_ks(spark, SF).collect()}
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    by_src: dict = collections.defaultdict(list)
    for s, x in rows:
        by_src[s].append(x)
    all_x = sorted({x for _, x in rows})
    for src, xs in by_src.items():
        rest = [x for s, x in rows if s != src]
        ns, nr = len(xs), len(rest)
        max_gap = 0
        for t in all_x:
            cs = sum(1 for v in xs if v <= t)
            cr = sum(1 for v in rest if v <= t)
            max_gap = max(max_gap, abs(cs * nr - cr * ns))
        r = out[src]
        assert r.n_docs == ns
        assert r.ks_d_ppm == max_gap * 10**6 // (ns * nr)
        crit = math.floor(
            KS_C_05 * math.sqrt((ns + nr) / (ns * nr)) * 10**6
        )
        assert r.crit_ppm == crit
        assert r.drifted == (r.ks_d_ppm > crit)


def test_ks_identical_distributions_zero():
    # D over identical samples is 0 by the integer formula
    xs = [1, 2, 3, 4] * 5
    ns = nr = len(xs)
    for t in sorted(set(xs)):
        cs = sum(1 for v in xs if v <= t)
        assert abs(cs * nr - cs * ns) == 0


def test_rfm_partitions_users_and_conserves_cents(spark):
    segs = q_events_rfm(spark, SF).collect()
    con = duckdb.connect()
    per_user = con.sql(
        f"""WITH ev AS (
              SELECT user_id, CAST(ts AS DATE) AS d,
                     CAST(round(value * 100, 0) AS BIGINT) AS cents
              FROM read_parquet('{SF}/events.parquet')),
            a AS (SELECT max(d) AS anchor FROM ev)
            SELECT user_id, min(datediff('day', d, anchor)) AS r,
                   count(*) AS f, sum(cents) AS m
            FROM ev CROSS JOIN a GROUP BY user_id"""
    ).fetchall()
    assert sum(s.n_users for s in segs) == len(per_user)
    assert sum(s.segment_cents for s in segs) == sum(u[3] for u in per_user)
    want: dict = collections.defaultdict(lambda: [0, 0])
    for _, r, f, m in per_user:
        rs = "hot" if r <= RFM_R_DAYS[0] else ("warm" if r <= RFM_R_DAYS[1] else "cold")
        fs = "heavy" if f >= RFM_F_CNT[0] else ("regular" if f >= RFM_F_CNT[1] else "light")
        ms = "high" if m >= RFM_M_CENTS[0] else ("mid" if m >= RFM_M_CENTS[1] else "low")
        want[(rs, fs, ms)][0] += 1
        want[(rs, fs, ms)][1] += m
    for s in segs:
        n, cents = want[(s.r_seg, s.f_seg, s.m_seg)]
        assert (s.n_users, s.segment_cents) == (n, cents)


def _rake_py(texts, top_k):
    tok_re = re.compile(r"[a-z0-9_]+")
    stop = set(_STOPWORDS)
    phrases = []
    for t in texts:
        toks = tok_re.findall(t.lower())
        cur: list = []
        for w in toks:
            if w in stop:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    phrases = [p for p in phrases if len(p) <= RAKE_MAX_PHRASE]
    deg: dict = collections.defaultdict(int)
    freq: dict = collections.defaultdict(int)
    for p in phrases:
        for w in p:
            deg[w] += len(p)
            freq[w] += 1
    counts = collections.Counter(phrases)
    scored = [
        (
            " ".join(p),
            n,
            sum(deg[w] * 10**6 // freq[w] for w in p),
        )
        for p, n in counts.items()
    ]
    scored.sort(key=lambda r: (-r[2], -r[1], r[0]))
    return scored[:top_k]


def test_rake_matches_python(spark):
    from deja_view_spark.queries_text import RAKE_TOP_K

    got = [
        (r.phrase, r.n_occurrences, r.rake_score_ppm)
        for r in q_docs_rake_keyphrases(spark, SF).collect()
    ]
    con = duckdb.connect()
    texts = [
        t
        for (t,) in con.sql(
            f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    ]
    # exact-integer ppm scores: bit-for-bit equality, no tolerance
    assert got == _rake_py(texts, RAKE_TOP_K)
