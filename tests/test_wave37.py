"""Wave-37: Boruvka minimum spanning forest (pointer-doubling
contraction, Kruskal ground truth)."""

import collections
import datetime
import json

import duckdb
import pytest

from deja_view_spark.queries_graph import (
    MSF_W_NUM,
    q_events_msf,
)

SF = "/root/testdata/sf0.001"


def _kruskal(edges):
    """edges: iterable of (w, a, b); returns the unique MSF under the
    strict (w, a, b) total order as a set of (a, b, w)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, a, b in sorted(edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def _cf_edges_python(rows, max_items=50, min_shared=2):
    per_user = collections.defaultdict(set)
    for u, i in rows:
        per_user[u].add(i)
    pairs = collections.Counter()
    for _u, items in per_user.items():
        if len(items) <= max_items:
            s = sorted(items)
            for x in range(len(s)):
                for y in range(x + 1, len(s)):
                    pairs[(s[x], s[y])] += 1
    return [
        (MSF_W_NUM // ns, a, b)
        for (a, b), ns in pairs.items()
        if ns >= min_shared
    ]


def test_msf_matches_kruskal_on_testdata(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT)"
        f" FROM read_parquet('{SF}/events.parquet')"
        f" WHERE json_extract_string(props, '$.k') IS NOT NULL"
    ).fetchall()
    expected = _kruskal(_cf_edges_python(set(rows)))
    got = {
        (r.item_a, r.item_b, r.w) for r in q_events_msf(spark, SF).collect()
    }
    assert got == expected
    # forest invariant: |edges| = |vertices| - |components|
    verts = {a for a, _b, _w in expected} | {b for _a, b, _w in expected}
    assert len(got) < len(verts)


def _write_events(spark, tmp_path, user_items):
    """user_items: list of (user_id, item) engagement pairs."""
    from pyspark.sql import Row

    rows = [
        Row(
            event_id=i,
            ts=datetime.datetime(2024, 1, 1, 0, 0, 0)
            + datetime.timedelta(minutes=i),
            user_id=u,
            event_type="view",
            value=1.0,
            props=json.dumps({"k": item}),
        )
        for i, (u, item) in enumerate(user_items)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


def test_msf_adversarial_chain(spark, tmp_path):
    # path graph 0-1-2-...-9 with strictly increasing weights: every
    # edge is in the MSF, and the chosen-edge pointer graph is a long
    # chain — the worst case for the pointer-doubling contraction.
    # Edge (i, i+1) shared by users u_i with multiplicity: weight
    # 1e6 // ns decreasing in ns; make ns = 12 - i so w increases
    # along the path.
    ui = []
    uid = 0
    for i in range(9):
        ns = 12 - i  # 12 down to 4 shared users -> strictly rising w
        for _ in range(ns):
            ui.append((uid, i))
            ui.append((uid, i + 1))
            uid += 1
    _write_events(spark, tmp_path, ui)
    got = {
        (r.item_a, r.item_b, r.w)
        for r in q_events_msf(spark, str(tmp_path)).collect()
    }
    expected = {(i, i + 1, MSF_W_NUM // (12 - i)) for i in range(9)}
    assert got == expected


def test_msf_cycle_breaks_heaviest_edge(spark, tmp_path):
    # triangle 0-1-2: the heaviest (least-shared) edge is excluded
    ui = []
    uid = 0
    for (a, b), ns in {(0, 1): 10, (1, 2): 8, (0, 2): 5}.items():
        for _ in range(ns):
            ui.append((uid, a))
            ui.append((uid, b))
            uid += 1
    _write_events(spark, tmp_path, ui)
    got = {
        (r.item_a, r.item_b) for r in q_events_msf(spark, str(tmp_path)).collect()
    }
    assert got == {(0, 1), (1, 2)}  # (0,2) is the heaviest -> cut


def test_msf_two_components_stay_separate(spark, tmp_path):
    # two disjoint cliques -> forest with one tree per clique, no
    # bridging edge invented
    ui = []
    uid = 0
    for base in (0, 100):
        for (a, b) in [(base, base + 1), (base + 1, base + 2)]:
            for _ in range(3):
                ui.append((uid, a))
                ui.append((uid, b))
                uid += 1
    _write_events(spark, tmp_path, ui)
    rows = q_events_msf(spark, str(tmp_path)).collect()
    verts = {r.item_a for r in rows} | {r.item_b for r in rows}
    assert len(rows) == 4  # 6 vertices, 2 components
    assert len(verts) == 6
    assert not any(r.item_a < 100 <= r.item_b for r in rows)


def test_msf_tie_weights_deterministic(spark, tmp_path):
    # equal-weight edges: the (w, a, b) total order picks the
    # lexicographically smallest spanning set — star around 0 beats
    # the 1-2 edge at the same weight
    ui = []
    uid = 0
    for (a, b) in [(0, 1), (0, 2), (1, 2)]:
        for _ in range(5):
            ui.append((uid, a))
            ui.append((uid, b))
            uid += 1
    _write_events(spark, tmp_path, ui)
    got = {
        (r.item_a, r.item_b) for r in q_events_msf(spark, str(tmp_path)).collect()
    }
    assert got == {(0, 1), (0, 2)}
