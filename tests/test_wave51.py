"""Wave-51: trigram transitions and cumulative adoption curve."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_events import q_events_cumulative_reach
from deja_view_spark.queries_sequence import q_events_trigram_transitions


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


def _ev(eid, user, etype, day=0, minute=0):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2024, 9, 1, 9, 0, 0)
        + datetime.timedelta(days=day, minutes=minute),
        user_id=user,
        event_type=etype,
        value=1.0,
        props="{}",
    )


TYPES = {"s": "signup", "v": "view", "p": "purchase", "c": "click",
         "e": "error"}


def test_trigram_lift_vs_first_order(spark, tmp_path):
    rows, eid, u = [], 0, 0
    for seq, n in ((["s", "v", "p"], 4), (["c", "v", "p"], 2),
                   (["s", "v", "e"], 3)):
        for _ in range(n):
            for m, t in enumerate(seq):
                rows.append(_ev(eid, u, TYPES[t], minute=m))
                eid += 1
            u += 1
    _write(spark, tmp_path, rows)
    out = [(r.a, r.b, r.c, r) for r in
           q_events_trigram_transitions(spark, str(tmp_path)).collect()]
    assert [(a, b, c) for a, b, c, _ in out] == [
        ("signup", "view", "purchase"),
        ("signup", "view", "error"),
        ("click", "view", "purchase"),
    ]
    by = {(a, b, c): r for a, b, c, r in out}
    svp = by[("signup", "view", "purchase")]
    assert svp.n_abc == 4
    assert svp.p2_ppm == 4 * 10**6 // 7      # P(p | s,v)
    assert svp.p1_ppm == 6 * 10**6 // 9      # P(p | v)
    cvp = by[("click", "view", "purchase")]
    assert cvp.p2_ppm == 1_000_000           # deterministic given (c,v)
    # lift always equals the published integer formula
    for r in (svp, cvp, by[("signup", "view", "error")]):
        assert r.lift_ppm == r.p2_ppm * 10**6 // r.p1_ppm
    # extra memory helps for (s,v,e) and (c,v,p), hurts for (s,v,p)
    assert by[("signup", "view", "error")].lift_ppm > 1_000_000
    assert cvp.lift_ppm > 1_000_000
    assert svp.lift_ppm < 1_000_000


def test_cumulative_reach_counts_first_touch_only(spark, tmp_path):
    rows = [
        _ev(1, 1, "view", day=0),
        _ev(2, 2, "view", day=0),
        _ev(3, 1, "view", day=1),   # repeat user -> not new
        _ev(4, 3, "view", day=1),
        _ev(5, 4, "view", day=3),   # day 2 has no events -> no row
    ]
    _write(spark, tmp_path, rows)
    out = [(str(r.day), r.n_new_users, r.cum_users) for r in
           q_events_cumulative_reach(spark, str(tmp_path)).collect()]
    assert out == [
        ("2024-09-01", 2, 2),
        ("2024-09-02", 1, 3),
        ("2024-09-04", 1, 4),
    ]
