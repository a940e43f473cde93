"""Wave-35: DAU/WAU stickiness (registry entry #200)."""

import collections
import datetime

import duckdb

from deja_view_spark.queries_events import q_events_stickiness

SF = "/root/testdata/sf0.001"


def _week_of(ts):
    d = ts.date() if isinstance(ts, datetime.datetime) else ts
    return d - datetime.timedelta(days=d.weekday())


def test_stickiness_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT ts, user_id FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    day_users: dict = collections.defaultdict(set)
    week_users: dict = collections.defaultdict(set)
    for ts, u in rows:
        w = _week_of(ts)
        day_users[(w, ts.date())].add(u)
        week_users[w].add(u)
    dau_sum: dict = collections.defaultdict(int)
    n_days: dict = collections.defaultdict(int)
    for (w, _d), us in day_users.items():
        dau_sum[w] += len(us)
        n_days[w] += 1
    got = {r.week.date(): r for r in q_events_stickiness(spark, SF).collect()}
    assert set(got) == set(week_users)
    for w, r in got.items():
        wau = len(week_users[w])
        assert r.wau == wau
        assert r.n_days == n_days[w]
        assert r.avg_dau_centi == dau_sum[w] * 100 // n_days[w]
        assert r.stickiness_ppm == dau_sum[w] * 1_000_000 // (
            n_days[w] * wau
        )
        # avg DAU can never exceed WAU: stickiness <= 1
        assert 0 < r.stickiness_ppm <= 1_000_000


def test_stickiness_closed_forms():
    # everyone active every day -> stickiness == 1e6 exactly
    dau_sum, n_days, wau = 7 * 100, 7, 100
    assert dau_sum * 1_000_000 // (n_days * wau) == 1_000_000
    # each user active exactly once a week -> 1/7 (floored ppm)
    dau_sum = 100
    assert dau_sum * 1_000_000 // (n_days * wau) == 142_857
