"""Wave-20 operators: MAD robust outliers, day-of-week seasonality."""

import collections

import duckdb
import pytest

from deja_view_spark.queries_stats import (
    MAD_K_X10000,
    q_docs_mad_outliers,
    q_events_dow_seasonality,
)

SF = "/root/testdata/sf0.001"


def _lower_median(xs):
    xs = sorted(xs)
    return xs[(len(xs) + 1) // 2 - 1]


def test_mad_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    by_lang: dict = collections.defaultdict(list)
    for lang, n in rows:
        by_lang[lang].append(n)
    got = {r.lang: r for r in q_docs_mad_outliers(spark, SF).collect()}
    assert set(got) == set(by_lang)
    for lang, xs in by_lang.items():
        med = _lower_median(xs)
        mad = _lower_median([abs(x - med) for x in xs])
        n_out = sum(
            1 for x in xs if abs(x - med) * 10_000 > MAD_K_X10000 * mad
        )
        r = got[lang]
        assert (r.n_docs, r.median_chars, r.mad_chars, r.n_outliers) == (
            len(xs), med, mad, n_out,
        )


def test_mad_robust_to_planted_outlier():
    """The defining MAD property: one planted giant moves a z-score
    gate's mean/stddev but CANNOT move the median or MAD."""
    xs = [100] * 50 + [101] * 49
    med, mad = _lower_median(xs), _lower_median(
        [abs(x - _lower_median(xs)) for x in xs]
    )
    xs_poisoned = xs + [10**9]
    med2 = _lower_median(xs_poisoned)
    mad2 = _lower_median([abs(x - med2) for x in xs_poisoned])
    assert (med, mad) == (med2, mad2)


def test_dow_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        # python-side dow: ISO weekday mapped to Spark's 1=Sunday base
        f"SELECT event_type, dayofweek(ts) + 1 "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    cnt: dict = collections.defaultdict(int)
    tot: dict = collections.defaultdict(int)
    for et, dow in rows:
        cnt[(et, dow)] += 1
        tot[et] += 1
    got = q_events_dow_seasonality(spark, SF).collect()
    assert len(got) == len(cnt)
    for r in got:
        n = cnt[(r.event_type, r.dow)]
        assert r.n == n
        assert r.share_ppm == n * 1_000_000 // tot[r.event_type]
        # chi2 over all 7 cells (absent cells contribute E each):
        # 7*sum(o^2)/n - n
        soo = sum(
            v * v for (et, _d), v in cnt.items() if et == r.event_type
        )
        want = 7.0 * soo / tot[r.event_type] - tot[r.event_type]
        assert r.chi2_uniform == pytest.approx(want, abs=1e-4)
    # shares per type sum to ~1e6 (floor rounding)
    shares: dict = collections.defaultdict(int)
    for r in got:
        shares[r.event_type] += r.share_ppm
    for s in shares.values():
        assert 1_000_000 - 7 < s <= 1_000_000


def test_dow_chi2_closed_forms():
    # uniform profile: chi2 == 0 by the expanded formula
    o = [10] * 7
    n = sum(o)
    assert 7.0 * sum(x * x for x in o) / n - n == 0.0
    # total concentration on one day: chi2 == 6n
    o = [70, 0, 0, 0, 0, 0, 0]
    n = sum(o)
    assert 7.0 * sum(x * x for x in o) / n - n == 6 * n
