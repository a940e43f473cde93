"""Wave-52: dedup transitivity audit and KG degree histogram."""

import datetime

from pyspark.sql import Row

from deja_view_spark.queries_kg import q_kg_degree_histogram
from deja_view_spark.queries_text import q_docs_dedup_transitivity


def _write(spark, tmp_path, table, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )


def _doc(i, text, lang="en", source="s1"):
    return Row(doc_id=i, text=text, lang=lang, source=source,
               n_chars=len(text))


S1 = "alpha beta gamma delta epsilon zeta"
S2 = "one two three four five six"
S3 = "red green blue cyan magenta yellow"
S4 = "north south east west upper lower"
T = "shared identical body of words repeated verbatim here"


def test_transitivity_open_chain_and_triangle(spark, tmp_path):
    # chain: a~b (share S2), b~c (share S3), a!~c  -> 1 open wedge
    # triangle: x,y,z identical                     -> 3 closed wedges
    docs = [
        _doc(1, f"{S1} {S2}"),
        _doc(2, f"{S2} {S3}"),
        _doc(3, f"{S3} {S4}"),
        _doc(11, T), _doc(12, T), _doc(13, T),
    ]
    _write(spark, tmp_path, "documents", docs)
    r = q_docs_dedup_transitivity(spark, str(tmp_path)).collect()[0]
    assert r.n_pairs == 5          # (1,2) (2,3) + triangle's 3
    assert r.n_wedges == 4         # chain's open wedge + 3 closed
    assert r.n_closed == 3
    assert r.closure_ppm == 750000


def test_degree_histogram_buckets(spark, tmp_path):
    docs = [_doc(1, "spark"), _doc(2, "spark")]
    _write(spark, tmp_path, "documents", docs)
    _write(
        spark, tmp_path, "events",
        [Row(event_id=1, ts=datetime.datetime(2024, 1, 1, 12, 0, 0),
             user_id=9, event_type="view", value=1.0, props='{"k": 5}')],
    )
    out = {(r.entity_type, r.bucket): r for r in
           q_kg_degree_histogram(spark, str(tmp_path)).collect()}
    # docs have degree 3 (term+lang+src) -> bucket 1 (deg_min 2)
    assert out[("doc", 1)].n_entities == 2
    assert out[("doc", 1)].deg_min == 2
    # term:spark / lang:en / src:s1 each have degree 2 -> bucket 1
    for t in ("term", "lang", "src"):
        assert out[(t, 1)].n_entities == 1
    # the engagement endpoints have degree 1 -> bucket 0, deg_min 1
    assert out[("user", 0)].n_entities == 1
    assert out[("item", 0)].deg_min == 1
    assert len(out) == 6
