"""Wave-19: native session_window aggregation (the dedicated
MergingSessions operator, distinct from the lag-window sessionizer)."""

import collections
import datetime

import duckdb

from deja_view_spark.queries_events import (
    SESSION_GAP_SEC,
    q_events_session_windows,
)

SF = "/root/testdata/sf0.001"


def _sessions_py():
    con = duckdb.connect()
    rows = con.sql(
        "SELECT user_id, ts, event_id, "
        "CAST(round(value * 100, 0) AS BIGINT) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    by_user: dict = collections.defaultdict(list)
    for u, ts, eid, cents in rows:
        by_user[u].append((ts, eid, cents))
    out = []
    gap = datetime.timedelta(seconds=SESSION_GAP_SEC)
    for u, evs in by_user.items():
        evs.sort()
        cur = None
        for ts, _eid, cents in evs:
            # end-exclusive merge: an event exactly gap after the last
            # does NOT extend the session
            if cur is None or ts >= cur["last"] + gap:
                if cur:
                    out.append(cur)
                cur = {"u": u, "start": ts, "last": ts, "n": 1, "c": cents}
            else:
                cur["last"] = ts
                cur["n"] += 1
                cur["c"] += cents
        if cur:
            out.append(cur)
    return out


def test_session_windows_match_python(spark):
    want = {
        (s["u"], s["start"]): (s["last"], s["n"], s["c"])
        for s in _sessions_py()
    }
    got = q_events_session_windows(spark, SF).collect()
    assert len(got) == len(want)
    gap = datetime.timedelta(seconds=SESSION_GAP_SEC)
    for r in got:
        last, n, c = want[(r.user_id, r.session_start)]
        # Spark's session end = last event + gap (end-exclusive bound)
        assert r.session_end == last + gap
        assert (r.n_events, r.cents) == (n, c)
    # the corpus actually exercises merging: some session has >1 event
    assert any(r.n_events > 1 for r in got)
    # and sessionization is non-trivial: some user has >1 session
    per_user = collections.Counter(r.user_id for r in got)
    assert any(v > 1 for v in per_user.values())


def test_sessions_partition_events(spark):
    con = duckdb.connect()
    n_events = con.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    got = q_events_session_windows(spark, SF).collect()
    assert sum(r.n_events for r in got) == n_events
    # sessions of one user never overlap (end-exclusive bounds)
    by_user: dict = collections.defaultdict(list)
    for r in got:
        by_user[r.user_id].append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert s2 >= e1
