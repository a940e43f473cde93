"""Wave-28: Mann-Whitney U test, Poisson-bootstrap CI."""

import collections
import hashlib
import math

import duckdb
import pytest

from deja_view_spark.queries_stats import (
    BOOT_B,
    _POIS_CDF_Q20,
    q_docs_bootstrap_ci,
    q_events_mann_whitney,
)

SF = "/root/testdata/sf0.001"


def test_mann_whitney_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, count(*) FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY user_id"
    ).fetchall()
    # midranks with ties (scipy convention), doubled to stay integer
    ordered = sorted((x, u) for u, x in rows)
    by_val: dict = collections.defaultdict(list)
    for i, (x, _u) in enumerate(ordered, start=1):
        by_val[x].append(i)
    dbl_mid = {x: min(r) + max(r) for x, r in by_val.items()}
    a = [(x) for u, x in rows if u % 2 == 0]
    n_a, n_b = len(a), len(rows) - len(a)
    dbl_rank_sum_a = sum(dbl_mid[x] for u, x in rows if u % 2 == 0)
    u2 = dbl_rank_sum_a - n_a * (n_a + 1)
    tie_term = sum(
        len(r) ** 3 - len(r) for r in by_val.values()
    )
    n = n_a + n_b
    z = (u2 / 2 - n_a * n_b / 2) / math.sqrt(
        (n_a * n_b / 12) * ((n + 1) - tie_term / (n * (n - 1)))
    )
    r = q_events_mann_whitney(spark, SF).collect()[0]
    assert (r.n_a, r.n_b, r.u2, r.tie_term) == (n_a, n_b, u2, tie_term)
    assert r.z_stat == pytest.approx(z, abs=1e-4)


def test_mann_whitney_identical_samples_zero():
    # U = n_a*n_b/2 exactly when both cohorts share every tie block
    # equally -> z == 0 by construction
    xs = [5, 5, 7, 7, 9, 9]
    cohorts = [0, 1, 0, 1, 0, 1]
    ordered = sorted(range(len(xs)), key=lambda i: (xs[i], i))
    by_val: dict = collections.defaultdict(list)
    for rank, i in enumerate(ordered, start=1):
        by_val[xs[i]].append(rank)
    dbl_mid = {x: min(r) + max(r) for x, r in by_val.items()}
    n_a = cohorts.count(0)
    dbl_sum_a = sum(dbl_mid[xs[i]] for i in range(len(xs)) if cohorts[i] == 0)
    u2 = dbl_sum_a - n_a * (n_a + 1)
    assert u2 / 2 == n_a * (len(xs) - n_a) / 2


def _pois_weight(b, doc_id):
    h = hashlib.md5(f"boot{b}:{doc_id}".encode()).hexdigest()
    u = int(h[:5], 16)
    for k, thr in enumerate(_POIS_CDF_Q20):
        if u < thr:
            return k
    return 5


def test_bootstrap_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, n_chars FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    means = []
    for b in range(BOOT_B):
        tot = n_eff = 0
        for did, n in rows:
            w = _pois_weight(b, did)
            tot += w * n
            n_eff += w
        if n_eff > 0:
            means.append((tot * 100 // n_eff, b))
    means.sort()
    r = q_docs_bootstrap_ci(spark, SF).collect()[0]
    assert r.n_replicates == len(means)
    assert r.ci_lo_centichars == means[1][0]
    assert r.ci_hi_centichars == means[BOOT_B - 2][0]
    assert r.boot_mean_centichars == sum(m for m, _b in means) // len(means)
    # the CI actually brackets the plain corpus mean
    corpus_mean = sum(n for _d, n in rows) * 100 // len(rows)
    assert r.ci_lo_centichars <= corpus_mean <= r.ci_hi_centichars


def test_poisson_cdf_thresholds():
    # thresholds are floor(CDF * 2^20) of Poisson(1)
    p = math.exp(-1)
    cdf = 0.0
    for k, thr in enumerate(_POIS_CDF_Q20):
        cdf += p
        assert thr == math.floor(cdf * (1 << 20))
        p /= k + 1
    # mean of the truncated draw stays ~1 (resample size ~ n)
    probs = []
    prev = 0
    for thr in _POIS_CDF_Q20:
        probs.append((thr - prev) / (1 << 20))
        prev = thr
    probs.append(1 - prev / (1 << 20))
    mean = sum(k * q for k, q in enumerate(probs))
    assert abs(mean - 1.0) < 0.01
