"""Wave-54: item adoption half-life and Lorenz deciles."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_events import q_events_item_halflife
from deja_view_spark.queries_stats import q_events_lorenz_deciles


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


def _ev(eid, user, day, item=None):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2024, 10, 1, 9, 0, 0)
        + datetime.timedelta(days=day, minutes=eid),
        user_id=user,
        event_type="view",
        value=1.0,
        props='{"k": %d}' % item if item is not None else "{}",
    )


def test_item_halflife_first_touch_semantics(spark, tmp_path):
    rows, eid = [], 0
    # item 1: audience 4, one new user per day -> half at day 1
    for u, d in ((1, 0), (2, 1), (3, 2), (4, 3)):
        rows.append(_ev(eid, u, d, 1)); eid += 1
    # item 2: audience 3 on days 0/5/9 -> half (2*2>=3) at day 5
    for u, d in ((1, 0), (5, 5), (6, 9)):
        rows.append(_ev(eid, u, d, 2)); eid += 1
    # repeat touches by an existing user must not shift anything
    rows.append(_ev(eid, 1, 8, 2)); eid += 1
    # item 3: a single user -> half-life 0
    rows.append(_ev(eid, 9, 2, 3)); eid += 1
    _write(spark, tmp_path, rows)
    out = {r.item: r for r in
           q_events_item_halflife(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1].n_users, out[1].halflife_days) == (4, 1)
    assert str(out[1].launch_day) == "2024-10-01"
    assert (out[2].n_users, out[2].halflife_days) == (3, 5)
    assert (out[3].n_users, out[3].halflife_days) == (1, 0)


def test_lorenz_deciles_closed_form(spark, tmp_path):
    rows, eid = [], 0
    for u in range(1, 11):        # user u emits exactly u events
        for _ in range(u):
            rows.append(_ev(eid, u, 0)); eid += 1
    _write(spark, tmp_path, rows)
    out = [(r.decile, r.rn, r.cum_share_ppm) for r in
           q_events_lorenz_deciles(spark, str(tmp_path)).collect()]
    exp = [
        (d, d, (d * (d + 1) // 2) * 1_000_000 // 55) for d in range(1, 11)
    ]
    assert out == exp
    assert out[-1][2] == 1_000_000  # the curve ends at full mass
