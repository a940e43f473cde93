"""Wave-42: Benford first-digit audit and lead-lag correlation."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_stats import (
    BENFORD_PPM,
    q_docs_benford,
    q_events_leadlag,
)


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )


def _ev(eid, day, etype, value=1.0):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2024, 5, 1, 12, 0, 0)
        + datetime.timedelta(days=day),
        user_id=eid % 7,
        event_type=etype,
        value=value,
        props="{}",
    )


# ------------------------------------------------------ docs_benford


def test_benford_digit_extraction_and_rounding(spark, tmp_path):
    # one source per table; events carries the interesting values:
    # 1.23 -> digit 1; 0.05 -> 5 cents -> digit 5; 9.995 -> 999 cents
    # (IEEE: 9.995*100 = 999.4999..., identical in both engines) ->
    # digit 9; 0.004 -> 0 cents -> EXCLUDED; -3.0 excluded
    _write(
        spark,
        tmp_path,
        "events",
        [
            _ev(0, 0, "view", 1.23),
            _ev(1, 0, "view", 0.05),
            _ev(2, 0, "view", 9.995),
            _ev(3, 0, "view", 0.004),
            _ev(4, 0, "view", -3.0),
        ],
    )
    _write(spark, tmp_path, "lineitem", [Row(l_extendedprice=700.0)])
    _write(spark, tmp_path, "orders", [Row(o_totalprice=42.0)])
    out = q_docs_benford(spark, str(tmp_path)).collect()
    ev = {r.digit: r for r in out if r.src == "events.value"}
    assert set(ev) == {1, 5, 9}
    assert ev[1].n_obs == 1 and ev[5].n_obs == 1 and ev[9].n_obs == 1
    assert ev[1].obs_ppm == 333333
    li = [r for r in out if r.src == "lineitem.l_extendedprice"]
    assert len(li) == 1 and li[0].digit == 7 and li[0].obs_ppm == 1000000
    od = [r for r in out if r.src == "orders.o_totalprice"]
    assert len(od) == 1 and od[0].digit == 4


def test_benford_chi_contrib_consistency(spark, tmp_path):
    # uniform digit load 1..9 (far from Benford): every row must
    # satisfy chi_contrib_micro == delta_ppm^2 // benford_ppm with the
    # module's own floor(log10(1+1/d)*1e6) constants
    rows = [_ev(i, 0, "view", float(d)) for i, d in enumerate(range(1, 10))]
    _write(spark, tmp_path, "events", rows)
    _write(spark, tmp_path, "lineitem", [Row(l_extendedprice=1.0)])
    _write(spark, tmp_path, "orders", [Row(o_totalprice=1.0)])
    out = [r for r in q_docs_benford(spark, str(tmp_path)).collect()
           if r.src == "events.value"]
    assert len(out) == 9
    for r in out:
        assert r.benford_ppm == BENFORD_PPM[r.digit]
        assert r.obs_ppm == 111111
        assert r.delta_ppm == r.obs_ppm - r.benford_ppm
        assert r.chi_contrib_micro == (r.delta_ppm**2) // r.benford_ppm
    # digit 1 is under-represented vs Benford, digit 9 over
    by_digit = {r.digit: r for r in out}
    assert by_digit[1].delta_ppm < 0
    assert by_digit[9].delta_ppm > 0


# ---------------------------------------------------- events_leadlag


def test_leadlag_recovers_planted_lag(spark, tmp_path):
    # y is x shifted forward 3 days -> lag 3 correlates perfectly
    # (pattern chosen so no OTHER lag's alignment is affine — e.g.
    # [...,7,...] would make x[0..2] vs y[7..9] an exact +2 shift)
    pattern = [1, 5, 2, 8, 3, 6, 4, 6, 9, 2]
    rows, eid = [], 0
    for d, n in enumerate(pattern):
        for _ in range(n):
            rows.append(_ev(eid, d, "view"))
            eid += 1
    for d in range(3, 10):
        for _ in range(pattern[d - 3]):
            rows.append(_ev(eid, d, "purchase"))
            eid += 1
    _write(spark, tmp_path, "events", rows)
    out = {r.lag: r for r in q_events_leadlag(spark, str(tmp_path)).collect()}
    assert set(out) == set(range(8))
    assert out[3].corr_ppm == 1_000_000
    assert out[3].n_days == 7
    assert all(out[lag].corr_ppm < 1_000_000 for lag in out if lag != 3)


def test_leadlag_zero_variance_guard(spark, tmp_path):
    # constant daily counts on both sides -> corr_ppm = 0, not NULL
    rows, eid = [], 0
    for d in range(6):
        for et in ("view", "purchase"):
            for _ in range(4):
                rows.append(_ev(eid, d, et))
                eid += 1
    _write(spark, tmp_path, "events", rows)
    out = q_events_leadlag(spark, str(tmp_path)).collect()
    # lags 6,7 have no aligned days in a 6-day corpus: the inner
    # join drops them (no row, rather than a degenerate n_days=0 row)
    assert [r.lag for r in out] == list(range(6))
    assert all(r.corr_ppm == 0 for r in out)
    assert out[0].sum_x == 24 and out[0].sum_y == 24
