"""Wave-25: classifier-eval scorecard, numeric band join."""

import collections

import duckdb

from deja_view_spark.queries_events import (
    BAND_DELTA_CENTS,
    MT_WINDOW_S,
    q_events_band_join,
)
from deja_view_spark.queries_text import (
    q_docs_lang_id,
    q_docs_lang_id_metrics,
)

SF = "/root/testdata/sf0.001"


def test_lang_id_metrics_match_confusion(spark):
    conf = q_docs_lang_id(spark, SF).collect()
    n_labeled: dict = collections.defaultdict(int)
    n_pred: dict = collections.defaultdict(int)
    tp: dict = collections.defaultdict(int)
    for r in conf:
        n_labeled[r.labeled] += r.n
        n_pred[r.predicted] += r.n
        if r.labeled == r.predicted:
            tp[r.labeled] += r.n
    got = {r.klass: r for r in q_docs_lang_id_metrics(spark, SF).collect()}
    assert set(got) == set(n_labeled)
    for k, r in got.items():
        assert (r.n_labeled, r.n_predicted, r.tp) == (
            n_labeled[k], n_pred.get(k, 0), tp[k],
        )
        p = tp[k] * 1_000_000 // n_pred[k] if n_pred.get(k) else 0
        rec = tp[k] * 1_000_000 // n_labeled[k]
        assert (r.precision_ppm, r.recall_ppm) == (p, rec)
        f1 = 2 * p * rec // (p + rec) if p + rec else 0
        assert r.f1_ppm == f1
    # the heuristic is actually informative on this corpus
    assert any(r.f1_ppm > 500_000 for r in got.values())


def test_bucket_decomposition_is_lossless():
    """Core band-join invariant: if |a - b| <= delta then
    a DIV delta is within 1 of b DIV delta — the 3-bucket explode
    never loses a true pair (checked over the full residue lattice,
    including negatives: floor-division semantics)."""
    delta = 7
    for a in range(-3 * delta, 3 * delta):
        for b in range(-3 * delta, 3 * delta):
            if abs(a - b) <= delta:
                assert abs(a // delta - b // delta) <= 1


def test_band_join_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT user_id, event_type, event_id, epoch_us(ts),
                   CAST(round(value * 100, 0) AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    views: dict = collections.defaultdict(list)
    purchases = []
    for u, et, eid, us, cents in rows:
        if et == "view":
            views[u].append((us, cents))
        elif et == "purchase":
            purchases.append((u, eid, us, cents))
    want = {}
    for u, pid, p_us, p_cents in purchases:
        gaps = {
            abs(p_cents - v_cents)
            for v_us, v_cents in views.get(u, [])
            if v_us < p_us
            and p_us - v_us <= MT_WINDOW_S * 1_000_000
            and abs(p_cents - v_cents) <= BAND_DELTA_CENTS
        }
        # DISTINCT (purchase, p_cents, v_cents) pairs = distinct gaps
        # per purchase only when v_cents values are distinct; count
        # distinct v_cents instead
        v_set = {
            v_cents
            for v_us, v_cents in views.get(u, [])
            if v_us < p_us
            and p_us - v_us <= MT_WINDOW_S * 1_000_000
            and abs(p_cents - v_cents) <= BAND_DELTA_CENTS
        }
        if v_set:
            want[pid] = (len(v_set), min(gaps))
    got = q_events_band_join(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        assert (r.n_anchor_views, r.closest_gap_cents) == want[r.purchase_id]
    assert want  # non-degenerate at this SF
