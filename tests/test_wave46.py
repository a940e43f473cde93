"""Wave-46: inverse-functional violations and sequence-pattern CEP."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_kg import q_kg_ifp_violations
from deja_view_spark.queries_sequence import q_events_pattern_match


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )


def _doc(doc_id, text, lang="en", source="s1"):
    return Row(
        doc_id=doc_id, text=text, lang=lang, source=source,
        n_chars=len(text),
    )


def _ev(eid, user, etype, minute, props="{}"):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2024, 2, 1, 10, 0, 0)
        + datetime.timedelta(minutes=minute),
        user_id=user,
        event_type=etype,
        value=1.0,
        props=props,
    )


# --------------------------------------------------- kg_ifp_violations


def test_ifp_violations_fanout_and_shares(spark, tmp_path):
    docs = [
        _doc(1, "spark vector runs", "en", "s1"),
        _doc(2, "spark engine", "en", "s1"),
        _doc(3, "spark cluster", "de", "s1"),
    ]
    _write(spark, tmp_path, "documents", docs)
    events = [
        _ev(1, 1, "view", 0, '{"k": 5}'),
        _ev(2, 2, "view", 1, '{"k": 5}'),
        _ev(3, 1, "view", 2, '{"k": 6}'),  # fanout 1 -> excluded
    ]
    _write(spark, tmp_path, "events", events)
    out = q_kg_ifp_violations(spark, str(tmp_path)).collect()
    rows = {(r.pred, r.obj): r for r in out}
    assert set(rows) == {
        ("from_source", "src:s1"),
        ("has_term", "term:spark"),
        ("in_lang", "lang:en"),
        ("view", "item:5"),
    }
    assert rows[("has_term", "term:spark")].n_subjs == 3
    # has_term emits 4 assertions (spark x3 + vector x1)
    assert rows[("has_term", "term:spark")].pred_triples == 4
    assert rows[("has_term", "term:spark")].share_ppm == 750000
    assert rows[("from_source", "src:s1")].share_ppm == 1000000
    assert rows[("in_lang", "lang:en")].n_subjs == 2
    assert rows[("view", "item:5")].n_subjs == 2
    # ordering: fanout desc, then pred asc
    assert [(r.pred, r.obj) for r in out[:2]] == [
        ("from_source", "src:s1"),
        ("has_term", "term:spark"),
    ]


# ----------------------------------------------- events_pattern_match


def test_pattern_match_planted_sequences(spark, tmp_path):
    rows, eid = [], 0

    def seq(user, types):
        nonlocal eid
        for m, t in enumerate(types):
            rows.append(_ev(eid, user, t, m))
            eid += 1

    seq(1, ["signup", "view", "view", "purchase"])   # s[vc]*p
    seq(2, ["view", "error", "error", "error", "purchase"])  # eee
    seq(3, ["purchase", "purchase"])                  # pp
    seq(4, ["signup", "error", "purchase"])           # no match (e gap)
    seq(5, ["signup", "purchase"])                    # zero-star match
    _write(spark, tmp_path, "events", rows)
    out = {r.pattern: r for r in
           q_events_pattern_match(spark, str(tmp_path)).collect()}
    assert all(r.n_users == 5 for r in out.values())
    assert out["signup_to_purchase"].n_matching == 2  # u1, u5
    assert out["error_burst"].n_matching == 1
    assert out["repeat_purchase"].n_matching == 1
    assert out["signup_to_purchase"].share_ppm == 400000
    assert out["signup_to_purchase"].regex == "s[vc]*p"
