"""Wave-50: l-diversity audit and rich-club coefficient."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_graph import q_events_rich_club
from deja_view_spark.queries_quality import q_docs_l_diversity


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )


# ---------------------------------------------------- docs_l_diversity


def test_l_diversity_bands_homogeneous_classes(spark, tmp_path):
    def doc(i, lang, source):
        t = "some short text"
        return Row(doc_id=i, text=t, lang=lang, source=source,
                   n_chars=len(t))

    docs = [
        doc(1, "en", "s1"), doc(2, "en", "s1"), doc(3, "en", "s1"),
        doc(4, "de", "s1"), doc(5, "de", "s2"),
    ]
    _write(spark, tmp_path, "documents", docs)
    out = {r.l_band: r for r in
           q_docs_l_diversity(spark, str(tmp_path)).collect()}
    assert set(out) == {"1 (homogeneous)", ">=2"}
    homo = out["1 (homogeneous)"]
    assert (homo.n_classes, homo.n_rows, homo.min_l) == (1, 3, 1)
    assert bool(homo.l_diverse) is False
    div = out[">=2"]
    assert (div.n_classes, div.n_rows, div.min_l) == (1, 2, 2)
    assert bool(div.l_diverse) is True


# --------------------------------------------------- events_rich_club


def test_rich_club_density_and_guard(spark, tmp_path):
    rows, eid, u = [], 0, 0

    def ev(user, item):
        nonlocal eid
        r = Row(
            event_id=eid,
            ts=datetime.datetime(2024, 8, 1, 9, 0, 0)
            + datetime.timedelta(minutes=eid),
            user_id=user,
            event_type="view",
            value=1.0,
            props='{"k": %d}' % item,
        )
        eid += 1
        return r

    for _ in range(3):
        for item in (1, 2, 3, 7):
            rows.append(ev(u, item))
        u += 1
    for _ in range(3):
        for item in (7, 11, 12, 13):
            rows.append(ev(u, item))
        u += 1
    _write(spark, tmp_path, "events", rows)
    out = {r.k: r for r in
           q_events_rich_club(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3, 5, 8}
    # degrees: item 7 has 6, all others 3 -> k=1,2 keep all 7 nodes
    for k in (1, 2):
        r = out[k]
        assert (r.n_club, r.e_club) == (7, 12)
        assert r.phi_ppm == 2 * 12 * 1_000_000 // (7 * 6)
    # k=3: only the hub survives -> the n<2 guard yields phi 0
    assert (out[3].n_club, out[3].e_club, out[3].phi_ppm) == (1, 0, 0)
    assert (out[8].n_club, out[8].phi_ppm) == (0, 0)
