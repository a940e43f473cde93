"""Wave-44: rendezvous shard audit and filter-funnel attribution."""

import hashlib

from pyspark.sql import Row

from deja_view_spark.queries_corpus import (
    RDV_W_NEW,
    RDV_W_OLD,
    q_docs_rendezvous_shards,
)
from deja_view_spark.queries_quality import q_docs_filter_funnel


def _write_docs(spark, tmp_path, docs):
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )


def _doc(doc_id, text, lang="en", source="s1"):
    return Row(
        doc_id=doc_id, text=text, lang=lang, source=source,
        n_chars=len(text),
    )


# -------------------------------------------- docs_rendezvous_shards


def _py_rdv(doc_id: int, w: int) -> int:
    best = max(
        hashlib.md5(f"{doc_id}:{s}".encode()).hexdigest() + f"#{s:02d}"
        for s in range(w)
    )
    return int(best[33:35])


def test_rendezvous_matches_python_twin_exactly(spark, tmp_path):
    ids = list(range(1, 201))
    _write_docs(spark, tmp_path, [_doc(i, f"text {i}") for i in ids])
    exp: dict[int, list[int]] = {}
    for i in ids:
        old, new = _py_rdv(i, RDV_W_OLD), _py_rdv(i, RDV_W_NEW)
        n_docs, n_moved = exp.setdefault(old, [0, 0])
        exp[old] = [n_docs + 1, n_moved + (1 if new != old else 0)]
    out = q_docs_rendezvous_shards(spark, str(tmp_path)).collect()
    assert {r.shard: [r.n_docs, r.n_moved] for r in out} == exp


def test_rendezvous_monotone_and_movement_rate(spark, tmp_path):
    ids = list(range(1000, 1600))
    _write_docs(spark, tmp_path, [_doc(i, f"text {i}") for i in ids])
    out = q_docs_rendezvous_shards(spark, str(tmp_path)).collect()
    # the rendezvous guarantee: every moved doc lands in the NEW shard
    assert all(r.n_moved_elsewhere == 0 for r in out)
    total = sum(r.n_docs for r in out)
    moved = sum(r.n_moved for r in out)
    assert total == len(ids)
    # expected movement = 1/W_NEW ~ 5.9%; allow generous binomial slack
    assert 0.02 < moved / total < 0.12


# ------------------------------------------------ docs_filter_funnel


def test_filter_funnel_attribution(spark, tmp_path):
    long_clean = " ".join(f"tok{i}" for i in range(1100))
    assert len(long_clean) > 5000
    docs = [
        _doc(1, "one two"),                                # short only
        _doc(2, long_clean),                               # long only
        _doc(3, " ".join(["spam"] * 50)),                  # low distinct
        _doc(4, "please contact us at bob@example.com for "
                "further details about the project"),      # pii only
        _doc(5, "mail a@b.co hi"),                         # short AND pii
        _doc(6, "the quick brown fox jumps over the lazy dog "
                "again today"),                            # passes
    ]
    _write_docs(spark, tmp_path, docs)
    out = {r.rule: r for r in
           q_docs_filter_funnel(spark, str(tmp_path)).collect()}
    assert [out[k].rule_order for k in
            ("too_short", "too_long", "low_distinct", "has_pii", "pass")
            ] == [1, 2, 3, 4, 5]
    assert all(r.n_docs == 6 for r in out.values())
    ts = out["too_short"]
    assert (ts.n_failing, ts.n_first, ts.n_sole) == (2, 2, 1)
    tl = out["too_long"]
    assert (tl.n_failing, tl.n_first, tl.n_sole) == (1, 1, 1)
    ld = out["low_distinct"]
    assert (ld.n_failing, ld.n_first, ld.n_sole) == (1, 1, 1)
    pii = out["has_pii"]
    # doc 5 fails short first, so pii is "first" only for doc 4 and
    # sole only for doc 4
    assert (pii.n_failing, pii.n_first, pii.n_sole) == (2, 1, 1)
    pa = out["pass"]
    assert (pa.n_failing, pa.n_first, pa.n_sole) == (1, 1, 1)
    assert ts.share_ppm == 333333
