"""Wave-34: item-item CF projection, conversion-lag percentiles."""

import collections
import math

import duckdb

from deja_view_spark.queries_events import (
    CF_MAX_USER_ITEMS,
    CF_MIN_SHARED,
    CF_TOP_K,
    q_events_conversion_lag,
    q_events_item_cf,
)

SF = "/root/testdata/sf0.001"


def _ui():
    con = duckdb.connect()
    return set(
        con.sql(
            f"""SELECT DISTINCT user_id,
                       CAST(json_extract_string(props, '$.k') AS BIGINT)
                FROM read_parquet('{SF}/events.parquet')
                WHERE json_extract_string(props, '$.k') IS NOT NULL"""
        ).fetchall()
    )


def test_item_cf_matches_python(spark):
    ui = _ui()
    by_user: dict = collections.defaultdict(set)
    ideg = collections.Counter()
    for u, i in ui:
        by_user[u].add(i)
        ideg[i] += 1
    pairs = collections.Counter()
    for items in by_user.values():
        if len(items) > CF_MAX_USER_ITEMS:
            continue
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                pairs[(a, b)] += 1
    scored = []
    for (a, b), n in pairs.items():
        if n < CF_MIN_SHARED:
            continue
        cos = int(round(n * 1_000_000 / math.sqrt(ideg[a] * ideg[b])))
        scored.append((cos, a, b, n, ideg[a], ideg[b]))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = scored[:CF_TOP_K]
    got = q_events_item_cf(spark, SF).collect()
    assert len(got) == len(want)
    for r, (cos, a, b, n, da, db) in zip(got, want):
        assert (r.item_a, r.item_b, r.n_shared, r.deg_a, r.deg_b) == (
            a, b, n, da, db,
        )
        assert abs(r.cos_ppm - cos) <= 1  # round-half convention
    # cosine is bounded by 1
    assert all(0 < r.cos_ppm <= 1_000_000 for r in got)


def test_conversion_lag_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT user_id, event_type, epoch_us(ts)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    fv: dict = {}
    fp: dict = {}
    users = set()
    for u, et, us in rows:
        users.add(u)
        if et == "view":
            fv[u] = min(fv.get(u, us), us)
        elif et == "purchase":
            fp[u] = min(fp.get(u, us), us)
    lags = sorted(
        (fp[u] - fv[u]) // 1_000_000
        for u in users
        if u in fv and u in fp and fp[u] >= fv[u]
    )
    n = len(lags)
    r = q_events_conversion_lag(spark, SF).collect()[0]
    assert (r.n_users_total, r.n_converted) == (len(users), n)
    assert r.n_not_converted == len(users) - n
    assert r.p50_lag_s == lags[(n + 1) // 2 - 1]
    assert r.p90_lag_s == lags[max(math.ceil(n * 0.9), 1) - 1]
    assert 0 <= r.p50_lag_s <= r.p90_lag_s
