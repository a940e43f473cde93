"""Wave-23: multi-touch (linear) attribution."""

import collections

import duckdb

from deja_view_spark.queries_events import (
    MT_WINDOW_S,
    q_events_multitouch,
)

SF = "/root/testdata/sf0.001"


def _pairs_py():
    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT user_id, event_type, epoch_us(ts), event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    clicks: dict = collections.defaultdict(list)
    purchases = []
    for u, et, us, eid, item in rows:
        if et == "click" and item is not None:
            clicks[u].append((us, eid, item))
        elif et == "purchase":
            purchases.append((u, us, eid))
    return clicks, purchases


def test_multitouch_matches_python(spark):
    clicks, purchases = _pairs_py()
    credit: dict = collections.defaultdict(int)
    touches: dict = collections.defaultdict(int)
    for u, p_us, _pid in purchases:
        window = [
            (us, eid, item)
            for us, eid, item in clicks.get(u, [])
            if us < p_us and p_us - us <= MT_WINDOW_S * 1_000_000
        ]
        if not window:
            continue
        k = len(window)
        base, rem = divmod(1_000_000, k)
        # the most recent click (ties by event_id desc) takes the rem
        newest = max(window, key=lambda t: (t[0], t[1]))
        for us, eid, item in window:
            credit[item] += base + (rem if (us, eid) == newest[:2] else 0)
            touches[item] += 1
    got = q_events_multitouch(spark, SF).collect()
    assert len(got) == len(credit)
    for r in got:
        assert (r.credit_ppm, r.n_touches) == (
            credit[r.item], touches[r.item],
        )


def test_multitouch_conserves_credit(spark):
    """Every attributed purchase hands out EXACTLY 1e6 ppm (the
    integer-remainder rule's whole point): total credit == 1e6 x the
    number of purchases with >= 1 in-window click."""
    clicks, purchases = _pairs_py()
    n_attributed = sum(
        1
        for u, p_us, _pid in purchases
        if any(
            us < p_us and p_us - us <= MT_WINDOW_S * 1_000_000
            for us, _e, _i in clicks.get(u, [])
        )
    )
    got = q_events_multitouch(spark, SF).collect()
    assert sum(r.credit_ppm for r in got) == n_attributed * 1_000_000
    assert n_attributed > 0
