"""Wave-22 operators: CDC snapshot diff, winsorized robust means."""

import collections
import math

import duckdb

from deja_view_spark.queries_corpus import q_docs_snapshot_diff
from deja_view_spark.queries_stats import (
    WINSOR_HI_PPM,
    WINSOR_LO_PPM,
    q_docs_winsorized_stats,
)

SF = "/root/testdata/sf0.001"


def test_snapshot_diff_matches_python(spark):
    con = duckdb.connect()
    ids = [
        i for (i,) in con.sql(
            f"SELECT doc_id FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    ]
    want = collections.Counter()
    firsts: dict = {}
    lasts: dict = {}

    def note(cls, i):
        want[cls] += 1
        firsts[cls] = min(firsts.get(cls, i), i)
        lasts[cls] = max(lasts.get(cls, i), i)

    for i in ids:
        if i % 53 == 0:
            note("delete", i)
        elif i % 41 == 0:
            note("update", i)
        else:
            note("unchanged", i)
        if i % 97 == 0:
            note("insert", i + 20_000_000)
    got = q_docs_snapshot_diff(spark, SF).collect()
    assert {r.change_type for r in got} == set(want)
    for r in got:
        assert (r.n_rows, r.first_id, r.last_id) == (
            want[r.change_type],
            firsts[r.change_type],
            lasts[r.change_type],
        )
    # all four change classes actually occur at this SF
    assert set(want) == {"insert", "delete", "update", "unchanged"}
    # conservation: old rows = deletes + updates + unchanged
    assert (
        want["delete"] + want["update"] + want["unchanged"] == len(ids)
    )


def test_winsorized_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    by_lang: dict = collections.defaultdict(list)
    for lang, n in rows:
        by_lang[lang].append(n)
    got = {r.lang: r for r in q_docs_winsorized_stats(spark, SF).collect()}
    assert set(got) == set(by_lang)
    for lang, xs in by_lang.items():
        xs = sorted(xs)
        n = len(xs)
        lo = xs[max(1, math.ceil(n * WINSOR_LO_PPM / 1_000_000)) - 1]
        hi = xs[max(1, math.ceil(n * WINSOR_HI_PPM / 1_000_000)) - 1]
        clipped = [min(max(x, lo), hi) for x in xs]
        r = got[lang]
        assert (r.n_docs, r.p05_chars, r.p95_chars) == (n, lo, hi)
        assert r.winsor_mean_centichars == sum(clipped) * 100 // n
        assert r.n_clamped_lo == sum(1 for x in xs if x < lo)
        assert r.n_clamped_hi == sum(1 for x in xs if x > hi)


def test_winsorized_bounds_outlier_influence():
    """The defining winsorization property: a planted giant moves the
    raw mean arbitrarily but shifts the winsorized mean by at most
    (p95 - old_max) / n."""
    xs = [100] * 99
    n = len(xs) + 1
    lo_r = max(1, math.ceil(n * WINSOR_LO_PPM / 1_000_000))
    hi_r = max(1, math.ceil(n * WINSOR_HI_PPM / 1_000_000))
    poisoned = sorted(xs + [10**9])
    lo, hi = poisoned[lo_r - 1], poisoned[hi_r - 1]
    clipped = [min(max(x, lo), hi) for x in poisoned]
    assert hi == 100  # p95 rank still lands on the bulk
    assert sum(clipped) // n == 100  # winsorized mean unmoved
    assert sum(poisoned) // n > 10**6  # raw mean destroyed
