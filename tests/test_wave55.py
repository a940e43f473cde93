"""Wave-55: KG triple novelty and role-mix census."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_kg import q_kg_role_mix, q_kg_triple_novelty


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )


def _ev(eid, user, item, week_idx, minute=0):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2024, 1, 1, 10, 0, 0)  # a Monday
        + datetime.timedelta(days=7 * week_idx, minutes=minute),
        user_id=user,
        event_type="view",
        value=1.0,
        props='{"k": %d}' % item,
    )


def test_triple_novelty_first_seen_semantics(spark, tmp_path):
    rows = [
        # week 1: triples A=(u1,i1), B=(u2,i2); A asserted twice
        _ev(1, 1, 1, 0), _ev(2, 1, 1, 0, 30), _ev(3, 2, 2, 0),
        # week 2: A re-asserted + new C=(u1,i3)
        _ev(4, 1, 1, 1), _ev(5, 1, 3, 1),
        # week 3: A and B again, nothing new
        _ev(6, 1, 1, 2), _ev(7, 2, 2, 2),
    ]
    _write(spark, tmp_path, "events", rows)
    out = [(str(r.week), r.n_active, r.n_new, r.cum_triples,
            r.novelty_ppm) for r in
           q_kg_triple_novelty(spark, str(tmp_path)).collect()]
    assert out == [
        ("2024-01-01", 2, 2, 2, 1_000_000),
        ("2024-01-08", 2, 1, 3, 500_000),
        ("2024-01-15", 2, 0, 3, 0),
    ]


def test_role_mix_reflects_bipartite_schema(spark, tmp_path):
    _write(
        spark, tmp_path, "documents",
        [Row(doc_id=1, text="spark", lang="en", source="s1", n_chars=5),
         Row(doc_id=2, text="spark", lang="en", source="s1", n_chars=5)],
    )
    _write(spark, tmp_path, "events", [_ev(1, 9, 5, 0)])
    out = {r.entity_type: r for r in
           q_kg_role_mix(spark, str(tmp_path)).collect()}
    assert set(out) == {"doc", "user", "term", "lang", "src", "item"}
    assert (out["doc"].n_entities, out["doc"].n_subj_only) == (2, 2)
    assert out["user"].n_subj_only == 1
    for t in ("term", "lang", "src", "item"):
        assert out[t].n_obj_only == out[t].n_entities
    # the derived view is strictly bipartite — no entity plays both
    # roles (the premise kg_walk_census's inverse edges exist for)
    assert all(r.n_both == 0 for r in out.values())
