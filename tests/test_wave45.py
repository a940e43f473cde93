"""Wave-45: KG walk-count census and source-overlap matrix."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_corpus import q_docs_source_overlap
from deja_view_spark.queries_kg import q_kg_walk_census


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )


def _doc(doc_id, text, lang="en", source="s1"):
    return Row(
        doc_id=doc_id, text=text, lang=lang, source=source,
        n_chars=len(text),
    )


# ------------------------------------------------------ kg_walk_census


def test_walk_census_hand_counted_graph(spark, tmp_path):
    # doc:1 -- {term:spark, term:vector, lang:en, src:s1}
    # doc:2 -- {term:spark, lang:de, src:s2}
    # user:9 -- item:5 (one engagement edge)
    _write(
        spark, tmp_path, "documents",
        [_doc(1, "spark vector", "en", "s1"),
         _doc(2, "spark", "de", "s2")],
    )
    _write(
        spark, tmp_path, "events",
        [Row(event_id=1, ts=datetime.datetime(2024, 1, 1, 12, 0, 0),
             user_id=9, event_type="view", value=1.0, props='{"k": 5}')],
    )
    out = {(r.k, r.from_type, r.to_type): r.n_walks
           for r in q_kg_walk_census(spark, str(tmp_path)).collect()}
    # k=1: one row per (type,type) edge direction
    assert out[(1, "doc", "term")] == 3
    assert out[(1, "term", "doc")] == 3
    assert out[(1, "doc", "lang")] == 2
    assert out[(1, "user", "item")] == 1
    assert len([k for k in out if k[0] == 1]) == 8
    # k=2 doc->*->doc: 5 via terms (d1-spark-{d1,d2}, d1-vector-d1,
    # d2-spark-{d1,d2}) + 2 via lang + 2 via src = 9
    assert out[(2, "doc", "doc")] == 9
    assert out[(2, "user", "user")] == 1
    assert out[(2, "term", "term")] == 5
    # k=3: the only user-anchored length-3 walk is u->i->u->i
    assert out[(3, "user", "item")] == 1


# ------------------------------------------------- docs_source_overlap


def test_source_overlap_matrix_exact(spark, tmp_path):
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "one two three four five six seven eight nine"
    docs = [
        _doc(1, t1, source="A"),
        _doc(2, t1, source="A"),
        _doc(3, t1, source="B"),
        _doc(4, t2, source="B"),
        _doc(5, t2, source="B"),
        _doc(6, "completely unrelated filler text with unique words",
             source="B"),
    ]
    _write(spark, tmp_path, "documents", docs)
    out = {(r.source_a, r.source_b): r
           for r in q_docs_source_overlap(spark, str(tmp_path)).collect()}
    assert set(out) == {("A", "A"), ("A", "B"), ("B", "B")}
    aa, ab, bb = out[("A", "A")], out[("A", "B")], out[("B", "B")]
    assert aa.n_pairs == 1          # (1,2)
    assert ab.n_pairs == 2          # (1,3), (2,3)
    assert bb.n_pairs == 1          # (4,5)
    assert (ab.n_docs_a, ab.n_docs_b) == (2, 4)
    assert ab.cross_rate_ppb == 2 * 10**9 // (2 * 4)
    assert aa.cross_rate_ppb == 1 * 10**9 // (2 * 2)
