"""Wave-41: WL structural-role refinement and item-transition SCC."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_graph import q_events_item_scc
from deja_view_spark.queries_kg import q_kg_wl_colors


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


def _touch(eid, user, item, minute):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2024, 3, 1, 8, 0, 0)
        + datetime.timedelta(minutes=minute),
        user_id=user,
        event_type="view",
        value=1.0,
        props='{"k": %d}' % item,
    )


# ----------------------------------------------------- kg_wl_colors


def test_wl_groups_structurally_equivalent_users(spark, tmp_path):
    # u1,u2 touch items {1,2}; u3 touches {1} only. WL must merge
    # u1/u2 (isomorphic 3-hop trees) and keep u3, item1, item2 apart
    # (item1 deg 3 vs item2 deg 2).
    rows, eid = [], 0
    for u, items in ((1, (1, 2)), (2, (1, 2)), (3, (1,))):
        for k in items:
            rows.append(_touch(eid, u, k, eid))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = q_kg_wl_colors(spark, str(tmp_path)).collect()
    assert len(out) == 4  # {u1,u2} {u3} {i1} {i2}
    by_min = {r.min_entity: r for r in out}
    assert by_min["user:1"].n_entities == 2
    assert by_min["user:1"].n_users == 2
    assert by_min["user:3"].n_entities == 1
    assert by_min["item:1"].n_users == 0
    assert by_min["item:2"].n_entities == 1
    # the merged class sorts first (largest class)
    assert out[0].n_entities == 2


def test_wl_respects_graph_automorphism(spark, tmp_path):
    # path u1 - i1 - u2 - i2 - u3: the reflection automorphism maps
    # u1<->u3 and i1<->i2, so WL must give exactly three role classes.
    rows = [
        _touch(0, 1, 1, 0),
        _touch(1, 2, 1, 1),
        _touch(2, 2, 2, 2),
        _touch(3, 3, 2, 3),
    ]
    _write_events(spark, tmp_path, rows)
    out = q_kg_wl_colors(spark, str(tmp_path)).collect()
    assert len(out) == 3
    by_min = {r.min_entity: r for r in out}
    assert by_min["user:1"].n_entities == 2  # {u1, u3}
    assert by_min["user:1"].n_users == 2
    assert by_min["item:1"].n_entities == 2  # {i1, i2}
    assert by_min["item:1"].n_users == 0
    assert by_min["user:2"].n_entities == 1


# --------------------------------------------------- events_item_scc


def _rotations(rows, eid, users, cycle, minute0=0):
    """3 users per rotation of `cycle` -> every cycle edge support>=3."""
    u = users
    for rot in range(len(cycle)):
        order = cycle[rot:] + cycle[:rot]
        for _ in range(3):
            for step, item in enumerate(order):
                rows.append(_touch(eid, u, item, minute0 + step))
                eid += 1
            u += 1
    return eid, u


def test_scc_two_classes_with_one_way_bridge(spark, tmp_path):
    # cycle A = {1,2,3}, cycle B = {11,12,13}, bridge 3->11 (support 3)
    # -> A is a transient class (an edge leaves it), B is recurrent.
    rows, eid = [], 0
    eid, u = _rotations(rows, eid, 0, [1, 2, 3])
    eid, u = _rotations(rows, eid, u, [11, 12, 13])
    for _ in range(3):  # bridge users: 3 then 11
        rows.append(_touch(eid, u, 3, 0))
        eid += 1
        rows.append(_touch(eid, u, 11, 1))
        eid += 1
        u += 1
    _write_events(spark, tmp_path, rows)
    out = {r.scc_id: r for r in q_events_item_scc(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 11}
    assert out[1].members == "1,2,3"
    assert out[1].n_members == 3
    assert out[1].is_recurrent == 0  # 3->11 leaves the class
    assert out[11].members == "11,12,13"
    assert out[11].is_recurrent == 1
    assert out[1].n_internal_edges == 3
    assert out[11].n_internal_edges == 3


def test_scc_weak_bridge_below_support_is_dropped(spark, tmp_path):
    # same two cycles but the bridge has support 2 < SCC_MIN_EDGE:
    # both classes must come out recurrent (closed).
    rows, eid = [], 0
    eid, u = _rotations(rows, eid, 0, [1, 2, 3])
    eid, u = _rotations(rows, eid, u, [11, 12, 13])
    for _ in range(2):
        rows.append(_touch(eid, u, 3, 0))
        eid += 1
        rows.append(_touch(eid, u, 11, 1))
        eid += 1
        u += 1
    _write_events(spark, tmp_path, rows)
    out = {r.scc_id: r for r in q_events_item_scc(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 11}
    assert out[1].is_recurrent == 1
    assert out[11].is_recurrent == 1


def test_scc_top_item_cap_and_chain_closure(spark, tmp_path):
    # 3 users each touch items 1..41 in order: the support tie breaks
    # by item id, so item 41 falls outside the top-40 cap; the kept
    # graph is the 40-node chain 1->2->...->40 -> forty singleton
    # SCCs, only the sink (40) recurrent. Also exercises the doubling
    # closure on the longest path the cap admits.
    rows, eid = [], 0
    for u in range(3):
        for step in range(1, 42):
            rows.append(_touch(eid, u, step, step))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = q_events_item_scc(spark, str(tmp_path)).collect()
    assert len(out) == 40
    assert all(r.n_members == 1 for r in out)
    rec = {r.scc_id: r.is_recurrent for r in out}
    assert rec[40] == 1
    assert sum(rec.values()) == 1
