"""Wave-39: two-state burst segmentation by integer min-plus Viterbi."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_sequence import q_events_bursts

SF = "/root/testdata/sf0.001"


def _viterbi(ys):
    """Python twin of the integer Viterbi (thr, costs, tie rules)."""
    T = len(ys)
    thr = 3 * sum(ys) // (2 * T) + 1
    c0 = max(ys[0] - thr, 0)
    c1 = thr + max(thr - ys[0], 0)
    p0, p1 = [], []
    for y in ys[1:]:
        n0 = max(y - thr, 0) + min(c0, c1)
        n1 = max(thr - y, 0) + min(c1, c0 + thr)
        p0.append(1 if c1 < c0 else 0)
        p1.append(0 if c0 + thr < c1 else 1)
        c0, c1 = n0, n1
    state = 1 if c1 < c0 else 0
    out = [state]
    for t in range(T - 1, 0, -1):
        state = p0[t - 1] if state == 0 else p1[t - 1]
        out.append(state)
    return list(reversed(out)), thr


def _write_daily(spark, tmp_path, counts_by_type):
    rows = []
    eid = 0
    for et, counts in counts_by_type.items():
        for day, n in enumerate(counts):
            for _ in range(n):
                rows.append(
                    Row(
                        event_id=eid,
                        ts=datetime.datetime(2024, 1, 1, 6, 0, 0)
                        + datetime.timedelta(days=day, seconds=eid % 3600),
                        user_id=eid % 11,
                        event_type=et,
                        value=1.0,
                        props="{}",
                    )
                )
                eid += 1
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


def test_bursts_sustained_block_flagged(spark, tmp_path):
    # 10 quiet days, 5 loud days, 10 quiet days: the loud block is a
    # burst, and ONLY the loud block
    counts = [5] * 10 + [50] * 5 + [5] * 10
    _write_daily(spark, tmp_path, {"click": counts})
    got = sorted(
        q_events_bursts(spark, str(tmp_path)).collect(),
        key=lambda r: r.day,
    )
    expected, thr = _viterbi(counts)
    assert [r.burst for r in got] == expected
    assert [r.burst for r in got] == [0] * 10 + [1] * 5 + [0] * 10
    assert all(r.n == c for r, c in zip(got, counts))


def test_bursts_single_small_spike_suppressed(spark, tmp_path):
    # hysteresis: a one-day spike whose excess is below the entry toll
    # (toll = thr) does NOT open a burst
    counts = [10] * 12 + [18] + [10] * 12
    _write_daily(spark, tmp_path, {"view": counts})
    expected, thr = _viterbi(counts)
    assert max(counts) - thr < thr  # spike excess below the toll
    got = sorted(
        q_events_bursts(spark, str(tmp_path)).collect(),
        key=lambda r: r.day,
    )
    assert [r.burst for r in got] == expected == [0] * 25


def test_bursts_flat_series_all_base(spark, tmp_path):
    counts = [7] * 15
    _write_daily(spark, tmp_path, {"error": counts})
    got = q_events_bursts(spark, str(tmp_path)).collect()
    assert all(r.burst == 0 for r in got)


def test_bursts_matches_python_on_multi_type(spark, tmp_path):
    series = {
        "a": [3, 3, 3, 30, 31, 29, 3, 3, 3, 3],
        "b": [8, 9, 7, 8, 9, 8, 7, 9, 8, 8],
        "c": [1, 1, 50, 50, 1, 1, 50, 50, 1, 1],
    }
    _write_daily(spark, tmp_path, series)
    got = q_events_bursts(spark, str(tmp_path)).collect()
    by_type = {}
    for r in got:
        by_type.setdefault(r.event_type, []).append((r.day, r.burst, r.n))
    for et, counts in series.items():
        rows = sorted(by_type[et])
        expected, _thr = _viterbi(counts)
        assert [s for _d, s, _n in rows] == expected, et
        assert [n for _d, _s, n in rows] == counts, et
