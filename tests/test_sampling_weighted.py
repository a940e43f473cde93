"""Ground-truth tests for the weighted (A-ES) and temperature-alpha
samplers in queries_corpus.py — python md5 mirrors, independent of the
DuckDB oracles."""

import hashlib

import pyarrow.parquet as pq

from deja_view_spark.queries_corpus import (
    ES_SAMPLE_K,
    TEMP_ALPHA,
    TEMP_BUDGET_FRAC,
    _ES_DENOM,
    _ES_SALT,
    _TEMP_SALT,
    q_docs_lang_temperature_sample,
    q_docs_weighted_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    return pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pylist()


def test_weighted_sample_matches_python_reference(spark):
    import math

    scored = []
    for r in _docs():
        h = hashlib.md5(f"{_ES_SALT}:{r['doc_id']}".encode()).hexdigest()
        u = (int(h[:12], 16) + 1) / _ES_DENOM
        scored.append((r["doc_id"], r["lang"], r["n_chars"],
                       round(math.log(u) / r["n_chars"], 10)))
    scored.sort(key=lambda t: (-t[3], t[0]))
    expect = scored[:ES_SAMPLE_K]

    got = [
        (r["doc_id"], r["lang"], r["weight"], r["priority"])
        for r in q_docs_weighted_sample(spark, SF_DIR).collect()
    ]
    assert [g[:3] for g in got] == [e[:3] for e in expect]
    for g, e in zip(got, expect):
        assert abs(g[3] - e[3]) < 1e-9


def test_weighted_sample_prefers_heavy_docs(spark):
    # inclusion probability rises with weight: the sampled set's mean
    # n_chars must exceed the corpus mean (k is a minority of corpus)
    docs = _docs()
    rows = q_docs_weighted_sample(spark, SF_DIR).collect()
    assert len(rows) == min(ES_SAMPLE_K, len(docs))
    if len(rows) < len(docs):
        corpus_mean = sum(d["n_chars"] for d in docs) / len(docs)
        sample_mean = sum(r["weight"] for r in rows) / len(rows)
        assert sample_mean > corpus_mean


def test_temperature_sample_matches_python_reference(spark):
    docs = _docs()
    hist = {}
    for r in docs:
        hist[r["lang"]] = hist.get(r["lang"], 0) + 1
    z = sum(n ** TEMP_ALPHA for n in hist.values())
    n_total = sum(hist.values())
    rates = {
        lang: min(
            1.0, (n ** TEMP_ALPHA) / z * (TEMP_BUDGET_FRAC * n_total) / n
        )
        for lang, n in hist.items()
    }
    expect = []
    for r in docs:
        h = hashlib.md5(f"{_TEMP_SALT}:{r['doc_id']}".encode()).hexdigest()
        if int(h[:4], 16) < int(rates[r["lang"]] * 65536.0):
            expect.append((r["doc_id"], r["lang"], round(rates[r["lang"]], 4)))
    expect.sort()

    got = [
        (r["doc_id"], r["lang"], r["rate"])
        for r in q_docs_lang_temperature_sample(spark, SF_DIR).collect()
    ]
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in expect]
    for g, e in zip(got, expect):
        # python round() is banker's; Spark round is HALF_UP — compare
        # the rate numerically, membership above is exact
        assert abs(g[2] - e[2]) < 1.5e-4
    assert expect  # non-degenerate

    # temperature flattening: the head language is kept at a LOWER
    # rate than every tail language
    head = max(hist, key=lambda lang: hist[lang])
    assert all(rates[head] <= rates[lang] for lang in hist)


def test_weighted_sample_partition_invariant(spark):
    # determinism across physical layouts: same result at 1 partition
    from deja_view_spark.sources.catalog import load_table

    base = q_docs_weighted_sample(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").coalesce(1)
    docs.createOrReplaceTempView("_tmp_docs_one_part")
    # re-run through the same query body against the coalesced frame
    import deja_view_spark.queries_corpus as QC
    from pyspark.sql import functions as F

    h48 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(QC._ES_SALT), F.col("doc_id").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h48 + F.lit(1)) / F.lit(QC._ES_DENOM)
    key = F.log(u) / F.col("n_chars")
    alt = (
        docs.select(
            "doc_id",
            "lang",
            F.col("n_chars").alias("weight"),
            F.round(key, 10).alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(QC.ES_SAMPLE_K)
        .collect()
    )
    assert base == alt
