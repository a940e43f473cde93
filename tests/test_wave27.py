"""Wave-27: embedding label coherence, one-way ANOVA drift test."""

import collections
import math

import duckdb
import pytest

from deja_view_spark.queries_retrieval import q_embeddings_label_coherence
from deja_view_spark.queries_stats import q_docs_length_anova

SF = "/root/testdata/sf0.001"


def test_label_coherence_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT label, embedding FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    by_label: dict = collections.defaultdict(list)
    for lbl, v in rows:
        by_label[lbl].append([float(x) for x in v])
    dim = 64
    cents = {
        lbl: [
            round(sum(v[i] for v in vs) / len(vs), 4) for i in range(dim)
        ]
        for lbl, vs in by_label.items()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    got = {
        r.label: r for r in q_embeddings_label_coherence(spark, SF).collect()
    }
    assert set(got) == set(by_label)
    for lbl, vs in by_label.items():
        r = got[lbl]
        assert r.n_members == len(vs)
        own = sum(
            int(round(cos(v, cents[lbl]) * 10_000)) for v in vs
        ) * 100 // len(vs)
        # python round is banker's; engines round half-up — tolerate
        # one ppm-of-4dp unit per member at half boundaries
        assert abs(r.own_cos_ppm - own) <= len(vs)
        cc = {
            other: int(round(cos(cents[lbl], cents[other]) * 10_000))
            for other in cents
            if other != lbl
        }
        best = max(cc.items(), key=lambda t: (t[1], t[0]))
        assert (r.nearest_label, abs(r.nearest_cos_x1e4 - best[1]) <= 1) == (
            best[0], True,
        )
    # The audit DETECTS weak supervision: this corpus's labels are
    # synthetic (id-derived, not semantic), so own-centroid cosines
    # must be far from 1.0 — exactly the "noisy label" verdict the
    # report exists to surface. (On a semantically-labeled table the
    # own-cosine would dominate the cross-centroid one.)
    for r in got.values():
        assert r.nearest_label != r.label
        assert 0 < r.own_cos_ppm < 900_0000  # << 1.0 * 1e4 * 100


def test_anova_matches_python(spark):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT source, n_chars FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    by_src: dict = collections.defaultdict(list)
    for s, n in rows:
        by_src[s].append(n)
    k = len(by_src)
    n_total = len(rows)
    grand = sum(n for _s, n in rows)
    ss_between = sum(
        sum(xs) ** 2 / len(xs) for xs in by_src.values()
    ) - grand**2 / n_total
    ss_within = sum(x * x for _s, x in rows) - sum(
        sum(xs) ** 2 / len(xs) for xs in by_src.values()
    )
    f = (ss_between / (k - 1)) / (ss_within / (n_total - k))
    r = q_docs_length_anova(spark, SF).collect()[0]
    assert (r.k_groups, r.n_total) == (k, n_total)
    assert r.ss_between == pytest.approx(ss_between, rel=1e-6)
    assert r.ss_within == pytest.approx(ss_within, rel=1e-6)
    assert r.f_stat == pytest.approx(f, rel=1e-4)
    assert r.f_stat >= 0.0


def test_anova_closed_forms():
    # identical group means -> ss_between == 0 exactly
    groups = [[10, 20, 30], [15, 20, 25], [5, 20, 35]]
    grand = sum(sum(g) for g in groups)
    n = sum(len(g) for g in groups)
    ssb = sum(sum(g) ** 2 / len(g) for g in groups) - grand**2 / n
    assert ssb == pytest.approx(0.0, abs=1e-9)
