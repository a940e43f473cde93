"""Wave-8 iterative graph operators: weighted SSSP (Bellman-Ford,
tie-strength integer weights) and HITS hubs/authorities (normalized
fixed-point power iteration) — queries_graph.py.

Planted ground truth: a weighted path with a doubled edge has
closed-form integer distances (min over the two-hop vs direct route);
HITS is checked against a pure-Python twin running the IDENTICAL
integer arithmetic, plus mass-conservation invariants. DuckDB
value-hash parity at sf0.01 is the driver's job."""

from datetime import datetime

from deja_view_spark.queries_graph import (
    HITS_ITERS,
    HITS_SCALE,
    SSSP_SEED_MOD,
    W_SCALE,
    q_events_hits,
    q_events_sssp,
)

SF = "/root/testdata/sf0.001"


def _events_from_items(spark, tmp_path, items):
    rows = []
    eid = 0
    for item, users in items:
        for u in users:
            rows.append(
                (eid, datetime(2024, 1, 1), u, "view", 1.0, '{"k": %d}' % item)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "ev")
    df.write.parquet(d + "/events.parquet")
    return d


# ------------------------------------------------------------ SSSP
def test_sssp_weighted_path(spark, tmp_path):
    """Seed 17 (17 % SSSP_SEED_MOD == 0). Edge (17,18) is crossed by
    TWO items -> w = W_SCALE//2; (18,19) by one -> w = W_SCALE.
    dist(18) = W_SCALE//2, dist(19) = W_SCALE//2 + W_SCALE."""
    assert 17 % SSSP_SEED_MOD == 0
    items = [(0, (17, 18)), (1, (17, 18)), (2, (18, 19))]
    d = _events_from_items(spark, tmp_path, items)
    got = {r.node: r for r in q_events_sssp(spark, d).collect()}
    assert got[17].dist == 0 and got[17].is_seed
    assert got[18].dist == W_SCALE // 2 and not got[18].is_seed
    assert got[19].dist == W_SCALE // 2 + W_SCALE


def test_sssp_takes_min_route(spark, tmp_path):
    """Add a direct (17,19) edge: dist(19) = min(1.5*W, 1.0*W). An
    isolated non-seed component (100,101) never enters the output."""
    items = [
        (0, (17, 18)),
        (1, (17, 18)),
        (2, (18, 19)),
        (3, (17, 19)),
        (4, (100, 101)),
    ]
    d = _events_from_items(spark, tmp_path, items)
    got = {r.node: r.dist for r in q_events_sssp(spark, d).collect()}
    assert got[19] == W_SCALE
    assert 100 not in got and 101 not in got


# ------------------------------------------------------------ HITS
def _hits_python(edges, iters, scale):
    """The identical integer fixed point, sequentially."""
    nodes = sorted({u for e in edges for u in e})
    a = {n: scale for n in nodes}
    h = {}
    for _ in range(iters):
        h_raw = {n: 0 for n in nodes}
        for s, d in edges:
            h_raw[s] += a[d]
        t = sum(h_raw.values())
        h = {n: h_raw[n] * scale // t for n in nodes}
        a_raw = {n: 0 for n in nodes}
        for s, d in edges:
            a_raw[d] += h[s]
        t = sum(a_raw.values())
        a = {n: a_raw[n] * scale // t for n in nodes}
    return h, a


def test_hits_matches_python_twin(spark, tmp_path):
    """Directed chains from sorted co-engagement: items (1,2), (1,3),
    (2,3), (2,4) give edges 1->2, 1->3, 2->3, 2->4. The Spark result
    must equal the sequential integer fixed point EXACTLY."""
    items = [(0, (1, 2)), (1, (1, 3)), (2, (2, 3)), (3, (2, 4))]
    d = _events_from_items(spark, tmp_path, items)
    edges = [(1, 2), (1, 3), (2, 3), (2, 4)]
    eh, ea = _hits_python(edges, HITS_ITERS, HITS_SCALE)
    got = {r.node: r for r in q_events_hits(spark, d).collect()}
    assert set(got) == set(eh)
    for n in eh:
        assert got[n].hub_fp == eh[n], n
        assert got[n].auth_fp == ea[n], n


def test_hits_mass_conserved(spark):
    """After each rescale the total mass is SCALE minus at most one
    floor-loss unit per node; sources have auth 0 only if nothing
    points at them, and every value is in [0, SCALE]."""
    rows = q_events_hits(spark, SF).collect()
    n = len(rows)
    th = sum(r.hub_fp for r in rows)
    ta = sum(r.auth_fp for r in rows)
    assert HITS_SCALE - n <= th <= HITS_SCALE
    assert HITS_SCALE - n <= ta <= HITS_SCALE
    assert all(0 <= r.hub_fp <= HITS_SCALE for r in rows)
    assert all(0 <= r.auth_fp <= HITS_SCALE for r in rows)


# ---------------------------------------------------------- k-truss
def test_ktruss_k4_survives_pendant_triangle_peeled(spark, tmp_path):
    """K4 on {1,2,3,4} is a 4-truss (every edge in 2 triangles). A
    pendant triangle (3,4,5) dies in the first peel (its new edges
    have support 1) and its removal must NOT drag K4 down: the shared
    edge (3,4) drops from support 3 to 2 and stays."""
    from deja_view_spark.queries_graph import q_events_ktruss

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pendant = [(3, 5), (4, 5)]
    items = [(i, e) for i, e in enumerate(k4 + pendant)]
    d = _events_from_items(spark, tmp_path, items)
    got = {(r.a, r.b): r.support for r in q_events_ktruss(spark, d).collect()}
    assert set(got) == set(k4)
    assert all(s == 2 for s in got.values())


def test_ktruss_single_triangle_empty(spark, tmp_path):
    """A lone triangle's edges all have support 1 < K_TRUSS-2: the
    first peel empties the graph."""
    from deja_view_spark.queries_graph import q_events_ktruss

    items = [(0, (1, 2)), (1, (2, 3)), (2, (1, 3))]
    d = _events_from_items(spark, tmp_path, items)
    assert q_events_ktruss(spark, d).count() == 0
