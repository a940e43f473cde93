"""Wave-36: Holt linear-trend smoothing (aggregate()/list_reduce
lambda-fold parity)."""

import collections
import math

import duckdb
import pytest

from deja_view_spark.queries_sequence import (
    HOLT_FORECAST_H,
    q_events_holt_forecast,
)

SF = "/root/testdata/sf0.001"


def _holt(ys, alpha=0.5, beta=0.5):
    # textbook init (fpp3 ch.8): l2 = y2, b2 = y2 - y1, smooth from t=3
    l, b, sse = ys[1], ys[1] - ys[0], 0.0
    for y in ys[2:]:
        err = y - (l + b)
        sse += err * err
        l_new = y * alpha + (l + b) * (1 - alpha)
        b = (l_new - l) * beta + b * (1 - beta)
        l = l_new
    return l, b, sse


def test_holt_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_type, CAST(ts AS DATE) AS d "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    daily: dict = collections.defaultdict(collections.Counter)
    for et, d in rows:
        daily[et][d] += 1
    got = {r.event_type: r for r in q_events_holt_forecast(spark, SF).collect()}
    expected_types = {et for et, c in daily.items() if len(c) >= 3}
    assert set(got) == expected_types
    for et, r in got.items():
        ys = [float(daily[et][d]) for d in sorted(daily[et])]
        l, b, sse = _holt(ys)
        assert r.n_days == len(ys)
        assert r.level == pytest.approx(l, abs=1e-6)
        assert r.trend == pytest.approx(b, abs=1e-6)
        assert r.forecast_h == pytest.approx(l + b * HOLT_FORECAST_H, abs=1e-6)
        assert r.rmse_1step == pytest.approx(
            math.sqrt(sse / (len(ys) - 2)), abs=1e-6
        )


def test_holt_constant_series_zero_trend(spark, tmp_path):
    # constant series: level == the constant, trend == 0, rmse == 0
    import datetime

    from pyspark.sql import Row

    rows = []
    eid = 0
    for day in range(10):
        for _ in range(5):  # 5 events every day -> ys = [5.0] * 10
            rows.append(
                Row(
                    event_id=eid,
                    ts=datetime.datetime(2024, 1, 1 + day, 12, 0, 0),
                    user_id=eid % 3,
                    event_type="steady",
                    value=1.0,
                    props="{}",
                )
            )
            eid += 1
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    out = q_events_holt_forecast(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.level == 5.0
    assert r.trend == 0.0
    assert r.forecast_h == 5.0
    assert r.rmse_1step == 0.0


def test_holt_pure_linear_series_exact_trend(spark, tmp_path):
    # y_t = 4 + 2t: Holt tracks a pure linear series exactly
    # (one-step error is 0 from the l1/b1 init onward), so
    # level == last y, trend == slope, rmse == 0.
    import datetime

    from pyspark.sql import Row

    rows = []
    eid = 0
    for day in range(8):
        for _ in range(4 + 2 * day):
            rows.append(
                Row(
                    event_id=eid,
                    ts=datetime.datetime(2024, 2, 1 + day, 8, 0, 0),
                    user_id=eid % 5,
                    event_type="linear",
                    value=1.0,
                    props="{}",
                )
            )
            eid += 1
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    r = q_events_holt_forecast(spark, str(tmp_path)).collect()[0]
    assert r.level == 4.0 + 2.0 * 7  # last day's count
    assert r.trend == 2.0
    assert r.forecast_h == r.level + 2.0 * HOLT_FORECAST_H
    assert r.rmse_1step == 0.0


def test_holt_short_series_excluded(spark, tmp_path):
    # series shorter than 3 days carry no fold state -> filtered out
    import datetime

    from pyspark.sql import Row

    rows = [
        Row(
            event_id=i,
            ts=datetime.datetime(2024, 3, 1 + i, 0, 0, 0),
            user_id=0,
            event_type="short",
            value=0.0,
            props="{}",
        )
        for i in range(2)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    assert q_events_holt_forecast(spark, str(tmp_path)).count() == 0
