"""Wave-43: KG predicate-drift alarm and merge-integrity audit."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_kg import q_kg_merge_audit, q_kg_predicate_drift


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )


# ------------------------------------------------ kg_predicate_drift


def _ev(eid, day0, etype, props='{"k": 7}'):
    # day0 counts from Monday 2024-01-01
    return Row(
        event_id=eid,
        ts=datetime.datetime(2024, 1, 1, 9, 0, 0)
        + datetime.timedelta(days=day0, minutes=eid),
        user_id=eid % 5,
        event_type=etype,
        value=1.0,
        props=props,
    )


def test_predicate_drift_shares_and_gap_weeks(spark, tmp_path):
    rows, eid = [], 0

    def emit(day0, etype, n, props='{"k": 7}'):
        nonlocal eid
        for _ in range(n):
            rows.append(_ev(eid, day0, etype, props))
            eid += 1

    # week 1 (Mon 2024-01-01): 10 view / 10 purchase / 4 signup
    emit(0, "view", 10)
    emit(0, "purchase", 10)
    emit(0, "signup", 4)
    # week 2 (Mon 2024-01-08): 15 view / 5 purchase, NO signup
    emit(7, "view", 15)
    emit(7, "purchase", 5)
    # week 3 (Mon 2024-01-15): same mix as week 1
    emit(14, "view", 10)
    emit(14, "purchase", 10)
    emit(14, "signup", 4)
    # keyless events must not count as triple emissions
    emit(7, "view", 100, props="{}")
    _write(spark, tmp_path, "events", rows)

    out = {
        (str(r.week), r.pred): r
        for r in q_kg_predicate_drift(spark, str(tmp_path)).collect()
    }
    # first week emits no drift rows; signup skips week 2 entirely
    assert set(out) == {
        ("2024-01-08", "view"),
        ("2024-01-08", "purchase"),
        ("2024-01-15", "view"),
        ("2024-01-15", "purchase"),
        ("2024-01-15", "signup"),
    }
    w2v = out[("2024-01-08", "view")]
    assert (w2v.share_ppm, w2v.prev_share_ppm) == (750000, 416666)
    assert w2v.drift_ppm == 333334
    assert out[("2024-01-08", "purchase")].drift_ppm == -166666
    assert out[("2024-01-15", "view")].drift_ppm == -333334
    # gap-week semantics: signup's week-3 row compares against week 1
    sg = out[("2024-01-15", "signup")]
    assert sg.prev_share_ppm == 166666 and sg.drift_ppm == 0


# ---------------------------------------------------- kg_merge_audit


def _doc(doc_id, text, lang, source):
    return Row(
        doc_id=doc_id, text=text, lang=lang, source=source,
        n_chars=len(text),
    )


def test_merge_audit_flags_cross_lang_clusters(spark, tmp_path):
    shared_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    shared_b = "one two three four five six seven eight nine ten"
    docs = [
        _doc(1, shared_a, "en", "s1"),
        _doc(2, shared_a, "de", "s1"),  # same text, different lang
        _doc(3, shared_b, "en", "s1"),
        _doc(4, shared_b, "en", "s2"),  # same text+lang, diff source
        _doc(5, "totally unrelated standalone words appear here once",
             "fr", "s3"),
    ]
    _write(spark, tmp_path, "documents", docs)
    out = {r.cluster_id: r for r in
           q_kg_merge_audit(spark, str(tmp_path)).collect()}
    # doc 5 is unclustered and must not appear
    assert set(out) == {1, 3}
    c1 = out[1]
    assert c1.n_members == 2 and c1.n_langs == 2
    assert c1.langs == "de,en"
    assert c1.mixed_lang == 1
    c3 = out[3]
    assert c3.n_members == 2 and c3.n_langs == 1 and c3.n_sources == 2
    assert c3.langs == "en"
    assert c3.mixed_lang == 0
