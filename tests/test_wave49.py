"""Wave-49: SRM guardrail and hub-knockout resilience."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_graph import q_events_hub_knockout
from deja_view_spark.queries_sequence import q_events_ab_srm


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


def _ev(eid, user, etype, props="{}"):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2024, 7, 1, 9, 0, 0)
        + datetime.timedelta(minutes=eid),
        user_id=user,
        event_type=etype,
        value=1.0,
        props=props,
    )


# --------------------------------------------------- events_ab_srm


def test_srm_flags_differential_logging(spark, tmp_path):
    rows, eid = [], 0
    for u in range(10):           # balanced: every user views
        rows.append(_ev(eid, u, "view"))
        eid += 1
    for u in (0, 2, 4, 6, 8):     # clicks logged only for cohort a
        rows.append(_ev(eid, u, "click"))
        eid += 1
    _write(spark, tmp_path, rows)
    out = {r.segment: r for r in
           q_events_ab_srm(spark, str(tmp_path)).collect()}
    assert set(out) == {"ALL", "view", "click"}
    assert (out["ALL"].n_a, out["ALL"].n_b) == (5, 5)
    assert out["ALL"].chi2_micro == 0 and out["ALL"].srm_flag == 0
    assert out["view"].srm_flag == 0
    c = out["click"]
    assert (c.n_a, c.n_b) == (5, 0)
    assert c.chi2_micro == 25 * 1_000_000 // 5
    assert c.srm_flag == 1


# --------------------------------------------- events_hub_knockout


def test_hub_knockout_fragmentation(spark, tmp_path):
    # two 4-cliques {1,2,3,7} and {7,11,12,13} sharing hub 7:
    # removing the hub (plus the deg-tie leader, item 1) splits the
    # graph; deeper knockouts strip it to an edge, then to nothing
    rows, eid = [], 0
    u = 0
    for _ in range(3):
        for item in (1, 2, 3, 7):
            rows.append(_ev(eid, u, "view", '{"k": %d}' % item))
            eid += 1
        u += 1
    for _ in range(3):
        for item in (7, 11, 12, 13):
            rows.append(_ev(eid, u, "view", '{"k": %d}' % item))
            eid += 1
        u += 1
    _write(spark, tmp_path, rows)
    out = {r.k_removed: r for r in
           q_events_hub_knockout(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 2, 5, 10}
    k0 = out[0]
    assert (k0.n_nodes, k0.n_edges, k0.n_components, k0.largest_cc) == \
        (7, 12, 1, 7)
    # ranked degrees: 7 (deg 6) first, then deg-3 ties by item asc (1)
    k2 = out[2]
    assert (k2.n_nodes, k2.n_edges, k2.n_components, k2.largest_cc) == \
        (5, 4, 2, 3)
    k5 = out[5]  # removes [7,1,2,3,11] -> only edge {12,13} survives
    assert (k5.n_nodes, k5.n_components, k5.largest_cc) == (2, 1, 2)
    k10 = out[10]
    assert (k10.n_nodes, k10.n_edges, k10.n_components,
            k10.largest_cc) == (0, 0, 0, 0)
