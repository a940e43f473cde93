"""Wave-30: CUSUM changepoint, dedup savings census."""

import collections
import hashlib

import duckdb

from deja_view_spark.queries_corpus import q_docs_dedup_savings
from deja_view_spark.queries_sequence import q_events_changepoint

SF = "/root/testdata/sf0.001"


def test_changepoint_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT CAST(ts AS DATE), count(*) FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    n_days = len(rows)
    t_all = sum(x for _d, x in rows)
    s = 0
    best = None
    for d, x in rows:
        s += x * n_days - t_all
        key = (-abs(s), d)
        if best is None or key < best[0]:
            best = (key, d, x, abs(s))
    r = q_events_changepoint(spark, SF).collect()[0]
    assert (r.changepoint_day, r.day_count) == (best[1], best[2])
    assert r.peak_cusum_events == best[3] // n_days
    assert (r.n_days, r.mean_daily_events) == (n_days, t_all // n_days)


def test_cusum_closed_form_shift():
    """A planted level shift peaks CUSUM exactly at the shift
    boundary."""
    series = [10] * 20 + [30] * 10  # shift after day 20
    n = len(series)
    t = sum(series)
    s, best_day, best_mag = 0, None, -1
    for i, x in enumerate(series):
        s += x * n - t
        if abs(s) > best_mag:
            best_mag, best_day = abs(s), i
    assert best_day == 19  # last day of the old regime


def test_dedup_savings_matches_python(spark):
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    corpus = list(docs) + [
        (did + 10_000_000, text) for did, text in docs if did % 37 == 0
    ]
    groups: dict = collections.defaultdict(list)
    for _did, text in corpus:
        groups[hashlib.sha256(text.encode()).hexdigest()].append(len(text))
    bands: dict = collections.defaultdict(lambda: [0, 0, 0, 0])
    for sizes in groups.values():
        n = len(sizes)
        band = "unique" if n == 1 else ("pair" if n == 2 else "3+")
        b = bands[band]
        b[0] += 1
        b[1] += n
        b[2] += n - 1
        b[3] += sum(sizes) - min(sizes)
    got = q_docs_dedup_savings(spark, SF).collect()
    assert {r.band for r in got} == set(bands)
    for r in got:
        assert (
            r.n_clusters, r.n_rows, r.redundant_rows, r.redundant_bytes
        ) == tuple(bands[r.band])
    # replicas are exact copies: redundant bytes == replica text bytes
    planted = {r.band: r for r in got}
    assert "pair" in planted or "3+" in planted
    total_redundant = sum(r.redundant_bytes for r in got)
    want_redundant = sum(
        len(text) for did, text in docs if did % 37 == 0
    )
    assert total_redundant == want_redundant
