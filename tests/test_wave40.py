"""Wave-40: difference-in-differences and mutual nearest neighbors."""

import datetime

import numpy as np
import pytest
from pyspark.sql import Row

from deja_view_spark.queries_sequence import q_events_did
from deja_view_spark.queries_text import q_embeddings_mutual_nn

SF = "/root/testdata/sf0.001"


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


def test_did_planted_lift_recovered(spark, tmp_path):
    # 10 days (mid = day 5 -> post = days 6..10); control (even users)
    # flat at 1.00; treatment (odd users) 1.00 pre, 3.00 post
    # -> DiD = +200 cents = 2e8 micro-cents, pre-gap 0
    rows = []
    eid = 0
    for day in range(1, 11):
        for u in range(4):
            treated = u % 2 == 1
            post = day > 5
            v = 3.0 if (treated and post) else 1.0
            rows.append(
                Row(
                    event_id=eid,
                    ts=datetime.datetime(2024, 1, day, 12, 0, 0),
                    user_id=u,
                    event_type="purchase",
                    value=v,
                    props="{}",
                )
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    r = q_events_did(spark, str(tmp_path)).collect()[0]
    assert r.n_ctrl == 20 and r.n_treat == 20
    assert r.ctrl_pre_ucents == r.ctrl_post_ucents == 100_000_000
    assert r.treat_pre_ucents == 100_000_000
    assert r.treat_post_ucents == 300_000_000
    assert r.did_ucents == 200_000_000
    assert r.pre_gap_ucents == 0


def test_did_parallel_shift_cancels(spark, tmp_path):
    # both cohorts shift up by the same amount post-period -> DiD = 0
    # (the common-trend confound DiD exists to cancel)
    rows = []
    eid = 0
    for day in range(1, 11):
        for u in range(4):
            v = 5.0 if day > 5 else 2.0
            rows.append(
                Row(
                    event_id=eid,
                    ts=datetime.datetime(2024, 2, day, 8, 0, 0),
                    user_id=u,
                    event_type="view",
                    value=v,
                    props="{}",
                )
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    r = q_events_did(spark, str(tmp_path)).collect()[0]
    assert r.did_ucents == 0
    assert r.pre_gap_ucents == 0


def test_mutual_nn_matches_numpy(spark):
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label"
        f" FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    L = [(i, np.array(v)) for i, v, lb in rows if lb % 2 == 0]
    R = [(i, np.array(v)) for i, v, lb in rows if lb % 2 == 1]

    def best(frm, to):
        out = {}
        for i, v in frm:
            scored = sorted(
                (
                    (-float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w))), j)
                    for j, w in to
                ),
            )
            out[i] = scored[0][1]
        return out

    bl, br = best(L, R), best(R, L)
    expected = {(i, j) for i, j in bl.items() if br[j] == i}
    got = {(r.lid, r.rid) for r in q_embeddings_mutual_nn(spark, SF).collect()}
    assert got == expected
    assert len(got) > 0


def test_mutual_nn_reciprocity_kills_hub(spark, tmp_path):
    # r1 is nearest to BOTH l0 and l2, but r1's own nearest is l0:
    # only (l0, r1) survives; l2's one-directional match is rejected
    dim = 64

    def vec(theta):
        v = np.zeros(dim)
        v[0], v[1] = np.cos(theta), np.sin(theta)
        return [float(x) for x in v]

    rows = [
        Row(vec_id=0, embedding=vec(0.00), label=0),   # l0
        Row(vec_id=2, embedding=vec(0.30), label=2),   # l2
        Row(vec_id=1, embedding=vec(0.05), label=1),   # r1 (hub)
        Row(vec_id=3, embedding=vec(2.00), label=3),   # r3 (far)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    got = {
        (r.lid, r.rid): r.cos_ppm
        for r in q_embeddings_mutual_nn(spark, str(tmp_path)).collect()
    }
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] == pytest.approx(
        round(np.cos(0.05) * 1_000_000), abs=1
    )
