"""Wave-48: velocity rule flags and debounce dedup census."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_events import (
    q_events_debounce_dedup,
    q_events_velocity_flags,
)

T0 = datetime.datetime(2024, 6, 1, 12, 0, 0)


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


def _ev(eid, user, etype, dt_us):
    return Row(
        event_id=eid,
        ts=T0 + datetime.timedelta(microseconds=dt_us),
        user_id=user,
        event_type=etype,
        value=1.0,
        props="{}",
    )


MIN = 60_000_000  # one minute in micros
HOUR = 60 * MIN


def test_velocity_flags_burst_and_boundary(spark, tmp_path):
    rows = [
        # user 1: 3 views inside 30 min -> burst 3 -> flagged
        _ev(1, 1, "view", 0),
        _ev(2, 1, "view", 10 * MIN),
        _ev(3, 1, "view", 30 * MIN),
        # user 2: 3 views 70 min apart -> burst 1 each -> clean
        _ev(4, 2, "view", 0),
        _ev(5, 2, "view", 70 * MIN),
        _ev(6, 2, "view", 140 * MIN),
        # user 3: pair 5 min apart -> burst 2 < threshold
        _ev(7, 3, "view", 0),
        _ev(8, 3, "view", 5 * MIN),
        # boundary cases on 'purchase': exactly 1h apart = OUTSIDE the
        # window; 1h minus 1us = inside
        _ev(9, 4, "purchase", 0),
        _ev(10, 4, "purchase", HOUR),
        _ev(11, 5, "purchase", 0),
        _ev(12, 5, "purchase", HOUR - 1),
    ]
    _write(spark, tmp_path, rows)
    out = {r.event_type: r for r in
           q_events_velocity_flags(spark, str(tmp_path)).collect()}
    v = out["view"]
    assert (v.n_users, v.n_flagged, v.max_burst) == (3, 1, 3)
    assert v.flag_ppm == 333333
    p = out["purchase"]
    assert p.n_flagged == 0
    assert p.max_burst == 2  # only the 1h-minus-1us pair co-windows


def test_debounce_collapses_chains_not_boundaries(spark, tmp_path):
    rows = [
        # user 1: a chained burst -> debounce drops everything after
        # the first (timer resets each event: 5,4,3 min gaps all < 10)
        _ev(1, 1, "click", 0),
        _ev(2, 1, "click", 5 * MIN),
        _ev(3, 1, "click", 9 * MIN),
        _ev(4, 1, "click", 12 * MIN),
        # user 2: exactly 10 min apart -> kept (strict <)
        _ev(5, 2, "click", 0),
        _ev(6, 2, "click", 10 * MIN),
        # user 3: different types 1 min apart -> independent partitions
        _ev(7, 3, "view", 0),
        _ev(8, 3, "click", 1 * MIN),
    ]
    _write(spark, tmp_path, rows)
    out = {r.event_type: r for r in
           q_events_debounce_dedup(spark, str(tmp_path)).collect()}
    c = out["click"]
    assert (c.n_events, c.n_dropped, c.n_users_affected) == (7, 3, 1)
    assert c.drop_ppm == 3 * 1_000_000 // 7
    assert out["view"].n_dropped == 0
