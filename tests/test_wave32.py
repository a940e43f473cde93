"""Wave-32: Markov stationary distribution by integer power iteration."""

import collections

import duckdb

from deja_view_spark.queries_sequence import (
    MARKOV_ROUNDS,
    PPM,
    q_events_markov_stationary,
)

SF = "/root/testdata/sf0.001"


def _chain_py():
    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT user_id, epoch_us(ts), event_id, event_type
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    by_user: dict = collections.defaultdict(list)
    for u, us, eid, et in rows:
        by_user[u].append((us, eid, et))
    counts: dict = collections.defaultdict(int)
    for evs in by_user.values():
        evs.sort()
        for (_u1, _e1, a), (_u2, _e2, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    emp = collections.Counter(et for _u, _us, _eid, et in rows)
    return counts, emp


def test_stationary_matches_python(spark):
    counts, emp = _chain_py()
    row_total: dict = collections.defaultdict(int)
    for (a, _b), n in counts.items():
        row_total[a] += n
    states = sorted(row_total)
    k = len(states)
    pi = {s: PPM // k for s in states}
    for _ in range(MARKOV_ROUNDS):
        nxt: dict = collections.defaultdict(int)
        for (a, b), n in counts.items():
            if a in pi:
                nxt[b] += pi[a] * n // row_total[a]
        pi = dict(nxt)
    n_all = sum(emp.values())
    got = {r.state: r for r in q_events_markov_stationary(spark, SF).collect()}
    assert set(got) == set(pi) & set(emp)
    for s, r in got.items():
        assert r.stationary_ppm == pi[s]
        assert r.empirical_ppm == emp[s] * 1_000_000 // n_all
        assert r.n_events == emp[s]


def test_stationary_mass_conserved_within_floor_leak(spark):
    got = q_events_markov_stationary(spark, SF).collect()
    total = sum(r.stationary_ppm for r in got)
    # floor division leaks at most |states|^2 units per round
    k = len(got)
    assert PPM - MARKOV_ROUNDS * k * k <= total <= PPM


def test_stationary_converged_fixed_point():
    """On a closed-form 2-state chain the integer iteration lands on
    the known stationary point (P(a->b)=1, P(b->a)=1 -> period-2;
    use a lazy chain instead: stays put w.p. 1/2)."""
    counts = {("a", "a"): 1, ("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}
    row_total = {"a": 2, "b": 2}
    pi = {"a": 700_000, "b": 300_000}
    for _ in range(40):
        nxt: dict = collections.defaultdict(int)
        for (x, y), n in counts.items():
            nxt[y] += pi[x] * n // row_total[x]
        pi = dict(nxt)
    # uniform stationary distribution, up to floor leak
    assert abs(pi["a"] - pi["b"]) <= 2
