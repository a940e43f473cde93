"""Ground-truth tests for queries_lm.py — a pure-python brute-force
twin of each query run over the sf0.001 documents parquet, independent
of the DuckDB oracle that certifies the registry entries."""

import hashlib
import math
import re
from collections import Counter

import pyarrow.parquet as pq
import pytest

from deja_view_spark.queries_lm import (
    DSIR_BUCKETS,
    DSIR_TARGET_SOURCES,
    DSIR_TOP_K,
    LM_ADD_K,
    LM_TOP_BIGRAMS,
    LM_TRAIN_LANG,
    q_docs_dsir_weights,
    q_docs_lm_perplexity,
)
from deja_view_spark.queries_text import TOKEN_RE

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    for r in t:
        r["toks"] = re.findall(TOKEN_RE, r["text"].lower())
        r["bigrams"] = [
            f"{a} {b}" for a, b in zip(r["toks"], r["toks"][1:])
        ]
    return t


def test_lm_perplexity_matches_python_reference(spark):
    docs = _docs()
    c2 = Counter()
    for r in docs:
        if r["lang"] == LM_TRAIN_LANG:
            c2.update(r["bigrams"])
    # prune to top-K by (count desc, bigram asc)
    model = dict(
        sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))[:LM_TOP_BIGRAMS]
    )
    c1 = Counter()
    for bg, c in c2.items():
        c1[bg.split(" ", 1)[0]] += c
    vsz = len({bg.split(" ")[1] for bg in c2})

    expect = {}
    for r in docs:
        if not r["bigrams"]:
            continue
        total = 0.0
        for bg, cnt in Counter(r["bigrams"]).items():
            p = (model.get(bg, 0) + LM_ADD_K) / (
                c1.get(bg.split(" ", 1)[0], 0) + LM_ADD_K * vsz
            )
            total += cnt * -math.log2(p)
        bits = round(total / len(r["bigrams"]), 4)
        expect[r["doc_id"]] = [r["lang"], len(r["bigrams"]), bits, None]

    # per-language ntile(3) on (bits, doc_id): standard SQL bucket
    # sizing — first (n mod 3) buckets get one extra row
    by_lang = {}
    for d, (lang, _, bits, _) in expect.items():
        by_lang.setdefault(lang, []).append((bits, d))
    for lang, rows in by_lang.items():
        rows.sort()
        n = len(rows)
        base, rem = divmod(n, 3)
        sizes = [base + (1 if i < rem else 0) for i in range(3)]
        i = 0
        for b, size in enumerate(sizes):
            for _ in range(size):
                expect[rows[i][1]][3] = ["head", "middle", "tail"][b]
                i += 1

    got = {
        row["doc_id"]: (
            row["lang"],
            row["n_bigrams"],
            row["bits_per_bigram"],
            row["ppl_bucket"],
        )
        for row in q_docs_lm_perplexity(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for d in expect:
        assert got[d][0] == expect[d][0], d
        assert got[d][1] == expect[d][1], d
        assert got[d][2] == pytest.approx(expect[d][2], abs=2e-4), d
        assert got[d][3] == expect[d][3], d
    # tercile split is non-degenerate: every language shows all buckets
    for lang in by_lang:
        assert {v[3] for d, v in got.items() if v[0] == lang} == {
            "head",
            "middle",
            "tail",
        }


def _bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS


def test_dsir_weights_match_python_reference(spark):
    docs = _docs()
    tgt, raw = Counter(), Counter()
    doc_buckets = {}
    for r in docs:
        feats = r["toks"] + r["bigrams"]
        bs = [_bucket(f) for f in feats]
        if not bs:
            continue
        doc_buckets[r["doc_id"]] = (r["lang"], Counter(bs), len(bs))
        raw.update(bs)
        if r["source"] in DSIR_TARGET_SOURCES:
            tgt.update(bs)
    n_t, n_r = sum(tgt.values()), sum(raw.values())

    scored = []
    for doc_id, (lang, cnts, n) in doc_buckets.items():
        w = sum(
            c
            * (
                math.log((tgt.get(b, 0) + 1) / (n_t + DSIR_BUCKETS))
                - math.log((raw[b] + 1) / (n_r + DSIR_BUCKETS))
            )
            for b, c in cnts.items()
        )
        scored.append((doc_id, lang, n, round(w / n, 4)))
    scored.sort(key=lambda t: (-t[3], t[0]))
    expect = scored[:DSIR_TOP_K]

    got = [
        (r["doc_id"], r["lang"], r["n_feats"], r["dsir_weight"])
        for r in q_docs_dsir_weights(spark, SF_DIR).collect()
    ]
    assert len(got) == len(expect)
    assert {g[0] for g in got} == {e[0] for e in expect}
    by_id = {e[0]: e for e in expect}
    for g in got:
        e = by_id[g[0]]
        assert g[1] == e[1] and g[2] == e[2]
        assert g[3] == pytest.approx(e[3], abs=2e-4)


def test_dsir_target_docs_score_higher(spark):
    # docs drawn from the target sources define the target distribution,
    # so their mean importance weight must exceed the non-target mean
    docs = {r["doc_id"]: r["source"] for r in _docs()}
    rows = q_docs_dsir_weights(spark, SF_DIR).collect()
    t = [r["dsir_weight"] for r in rows if docs[r["doc_id"]] in DSIR_TARGET_SOURCES]
    o = [r["dsir_weight"] for r in rows if docs[r["doc_id"]] not in DSIR_TARGET_SOURCES]
    assert t and o
    assert sum(t) / len(t) > sum(o) / len(o)
