"""Wave-47: join-cardinality QA and growth accounting."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_events import q_events_growth_accounting
from deja_view_spark.queries_kg import q_kg_join_cardinality_qa


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )


def _ev(eid, user, day, props="{}"):
    return Row(
        event_id=eid,
        ts=datetime.datetime(2024, 1, 1, 10, 0, 0)
        + datetime.timedelta(days=day, minutes=eid),
        user_id=user,
        event_type="view",
        value=1.0,
        props=props,
    )


# --------------------------------------------- kg_join_cardinality_qa


def test_join_cardinality_exact_vs_sysr(spark, tmp_path):
    _write(
        spark, tmp_path, "documents",
        [Row(doc_id=1, text="spark vector", lang="en", source="s1",
             n_chars=12),
         Row(doc_id=2, text="spark", lang="en", source="s2", n_chars=5)],
    )
    _write(spark, tmp_path, "events", [_ev(1, 9, 0, '{"k": 5}')])
    out = {(r.p1, r.p2): r for r in
           q_kg_join_cardinality_qa(spark, str(tmp_path)).collect()}
    # objects never overlap across predicates here -> self-pairs only
    assert set(out) == {
        ("has_term", "has_term"), ("in_lang", "in_lang"),
        ("from_source", "from_source"), ("view", "view"),
    }
    ht = out[("has_term", "has_term")]
    # n=3 triples over v=2 objects: est = 9//2 = 4; actual = 2^2+1 = 5
    assert (ht.n1, ht.v1, ht.est_sysr, ht.actual) == (3, 2, 4, 5)
    assert ht.err_ppm == 200000
    il = out[("in_lang", "in_lang")]
    assert (il.est_sysr, il.actual, il.err_ppm) == (4, 4, 0)
    fs = out[("from_source", "from_source")]
    assert (fs.est_sysr, fs.actual, fs.err_ppm) == (2, 2, 0)


def test_join_cardinality_overflow_clamp(spark):
    """The est_sysr / err_ppm clamp (round-5 ADVICE fix): quotients
    past 2^63 must clamp to BIGINT max via the exact product-side
    guard, not NULL (Spark IntegralDivide) or error (DuckDB CAST)."""
    bigmax = 9223372036854775807
    est_expr = (
        "CASE WHEN CAST(n1 AS DECIMAL(38,0)) * n2"
        " > CAST(9223372036854775807 AS DECIMAL(38,0))"
        "   * greatest(v1, v2)"
        " THEN CAST(9223372036854775807 AS BIGINT)"
        " ELSE CAST(n1 AS DECIMAL(38,0)) * n2"
        "      DIV greatest(v1, v2) END"
    )
    rows = spark.createDataFrame(
        [
            # quotient 8e36 >> 2^63: clamps
            Row(n1=4_000_000_000_000_000_000,
                n2=4_000_000_000_000_000_000, v1=2, v2=2),
            # product overflows BIGINT but quotient fits: exact value
            Row(n1=4_000_000_000_000_000_000,
                n2=4_000_000_000_000_000_000,
                v1=4_000_000_000_000_000_000, v2=1),
            # small case: plain integer division
            Row(n1=9, n2=9, v1=2, v2=2),
        ]
    ).selectExpr(f"{est_expr} AS est_sysr").collect()
    assert rows[0].est_sysr == bigmax
    assert rows[1].est_sysr == 4_000_000_000_000_000_000
    assert rows[2].est_sysr == 40


# ------------------------------------------- events_growth_accounting


def test_growth_accounting_state_machine(spark, tmp_path):
    rows, eid = [], 0

    def on(user, week_idx):
        nonlocal eid
        rows.append(_ev(eid, user, 7 * week_idx))
        eid += 1

    for wk in (0, 1, 2, 3):
        on(1, wk)            # u1: every week
    on(2, 0)
    on(2, 2)                 # u2: W1, W3 -> resurrects W3, churns twice
    on(3, 1)                 # u3: W2 only
    on(4, 3)                 # u4: last week only (churn unobservable)
    _write(spark, tmp_path, "events", rows)
    out = {str(r.week): r for r in
           q_events_growth_accounting(spark, str(tmp_path)).collect()}
    w1, w2, w3, w4 = (out[d] for d in
                      ("2024-01-01", "2024-01-08", "2024-01-15",
                       "2024-01-22"))
    assert (w1.n_new, w1.n_retained, w1.n_resurrected, w1.n_churned) == \
        (2, 0, 0, 0)
    assert (w2.n_new, w2.n_retained, w2.n_resurrected, w2.n_churned) == \
        (1, 1, 0, 1)
    assert (w3.n_new, w3.n_retained, w3.n_resurrected, w3.n_churned) == \
        (0, 1, 1, 1)
    assert (w4.n_new, w4.n_retained, w4.n_resurrected, w4.n_churned) == \
        (1, 1, 0, 1)
    # accounting identities hold exactly
    weeks = [w1, w2, w3, w4]
    for w in weeks:
        assert w.n_active == w.n_new + w.n_retained + w.n_resurrected
    for prev, cur in zip(weeks, weeks[1:]):
        assert cur.n_churned == prev.n_active - cur.n_retained
