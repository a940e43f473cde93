"""Wave-18 operators: KG type signatures (schema induction), tokenizer
fertility per language, CUPED variance-reduced A/B evaluation."""

import collections
import re

import duckdb
import pytest

from deja_view_spark.queries_kg import q_kg_type_signatures
from deja_view_spark.queries_sequence import q_events_cuped
from deja_view_spark.queries_text import BPE_RE, q_docs_tokenizer_fertility
from tests.test_wave15 import _triples_py

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


# -------------------------------------------------- type signatures
def test_kg_type_signatures_matches_python(spark):
    triples = _triples_py()
    rows: dict = collections.defaultdict(int)
    totals: dict = collections.defaultdict(int)
    for s, p, o in triples:
        key = (p, s.split(":", 1)[0], o.split(":", 1)[0])
        rows[key] += 1
        totals[p] += 1
    got = q_kg_type_signatures(spark, SF).collect()
    assert len(got) == len(rows)
    for r in got:
        key = (r.pred, r.subj_type, r.obj_type)
        assert r.n_triples == rows[key]
        assert r.share_ppm == rows[key] * 1_000_000 // totals[r.pred]
    # clean pipeline: every predicate emits exactly ONE signature here
    per_pred = collections.Counter(r.pred for r in got)
    assert all(v == 1 for v in per_pred.values())
    # and those single signatures all carry share == 1e6
    assert all(r.share_ppm == 1_000_000 for r in got)
    # doc predicates bind doc subjects; event predicates bind users
    for r in got:
        if r.pred in ("has_term", "in_lang", "from_source"):
            assert r.subj_type == "doc"
        else:
            assert (r.subj_type, r.obj_type) == ("user", "item")


# ------------------------------------------------ tokenizer fertility
def test_fertility_matches_python(spark):
    con = _con()
    docs = con.sql("SELECT lang, text FROM documents").fetchall()
    # python re twin of the GPT-2-style pre-tokenizer (BPE_RE is
    # Java/RE2/python-compatible by design — see docs_bpe_token_stats)
    tok = re.compile(BPE_RE)
    agg: dict = collections.defaultdict(lambda: [0, 0, 0, 0])
    for lang, text in docs:
        a = agg[lang]
        a[0] += 1
        a[1] += len(text.split(" "))
        a[2] += len(tok.findall(text))
        a[3] += len(text.encode("utf-8"))
    got = q_docs_tokenizer_fertility(spark, SF).collect()
    assert [r.lang for r in got] == sorted(agg)
    for r in got:
        n_docs, words, toks, nbytes = agg[r.lang]
        assert (r.n_docs, r.total_words, r.total_tokens) == (
            n_docs, words, toks,
        )
        assert r.fertility_ppm == toks * 1_000_000 // words
        assert r.bytes_per_token_ppm == nbytes * 1_000_000 // toks
    # the pre-tokenizer splits sub-word units: fertility >= 1 token/word
    assert all(r.fertility_ppm >= 1_000_000 for r in got)


# ----------------------------------------------------------- CUPED
def _per_user():
    con = _con()
    return con.sql(
        """SELECT user_id,
                  CAST(sum(CASE WHEN event_type IN ('view', 'click')
                                THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(round(value * 100, 0) AS BIGINT)
                                ELSE 0 END) AS BIGINT)
           FROM events GROUP BY user_id"""
    ).fetchall()


def test_cuped_matches_python(spark):
    pu = _per_user()
    n = len(pu)
    sx = sum(x for _u, x, _y in pu)
    sy = sum(y for _u, _x, y in pu)
    sxx = sum(x * x for _u, x, _y in pu)
    sxy = sum(x * y for _u, x, y in pu)
    syy = sum(y * y for _u, _x, y in pu)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got = {r.cohort: r for r in q_events_cuped(spark, SF).collect()}
    assert set(got) == {"a", "b"}
    for cohort, r in got.items():
        rows = [
            (x, y) for u, x, y in pu
            if ("a" if u % 2 == 0 else "b") == cohort
        ]
        nc = len(rows)
        cx = sum(x for x, _y in rows)
        cy = sum(y for _x, y in rows)
        assert (r.n_users, r.cy) == (nc, cy)
        assert r.mean_y == pytest.approx(cy / nc / 100, abs=1e-4)
        adj = (cy - theta * (cx - nc * sx / n)) / nc / 100
        assert r.mean_y_adj == pytest.approx(adj, abs=1e-4)
        assert r.theta == pytest.approx(theta, abs=1e-4)
        vr = 1.0 - (n * sxy - sx * sy) ** 2 / (
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        assert r.var_ratio == pytest.approx(vr, abs=1e-4)


def test_cuped_preserves_pooled_mean(spark):
    """CUPED must not move the POOLED mean: the user-weighted average
    of adjusted cohort means equals the raw pooled mean (the covariate
    correction sums to ~zero over the full population)."""
    got = q_events_cuped(spark, SF).collect()
    n_tot = sum(r.n_users for r in got)
    raw = sum(r.n_users * r.mean_y for r in got) / n_tot
    adj = sum(r.n_users * r.mean_y_adj for r in got) / n_tot
    assert adj == pytest.approx(raw, abs=2e-4)  # 4dp rounding on inputs


def test_cuped_reduces_variance(spark):
    """On this corpus engagement correlates with spend, so the
    variance ratio must be strictly < 1 (the whole point of CUPED)."""
    got = q_events_cuped(spark, SF).collect()
    assert all(0.0 <= r.var_ratio < 1.0 for r in got)
