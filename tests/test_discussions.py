"""Discussions metrics suite (P10/P11/A7 real shapes) + F4 URL parse."""

import pytest
from pyspark.sql import functions as F

from deja_view_spark import queries_discussions as QD
from deja_view_spark.functions.text import parse_issue_url

SF_DIR = "/root/testdata/sf0.001"


def test_overview_internal_consistency(spark):
    ov = QD.q_discussions_overview(spark, SF_DIR).head().asDict()
    assert ov["total_discussions"] > 0
    assert 0.0 <= ov["answer_rate"] <= 100.0
    assert ov["total_unanswered_qa"] <= ov["total_discussions"]
    if ov["discussions_last_week"] > 0:
        assert (
            ov["week_over_week_change"]
            == ov["discussions_this_week"] - ov["discussions_last_week"]
        )


def test_unanswered_is_qa_and_null_answer(spark):
    rows = QD.q_discussions_unanswered_top(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # P10: Q&A-category predicate; P11: unanswered predicate
        assert r["category"].lower() in ("q&a", "help") or "question" in r[
            "category"
        ].lower()
    # newest-first ordering (reference discussions_metrics.py:133)
    created = [r["created_at"] for r in rows]
    assert created == sorted(created, reverse=True)


def test_category_counts_cover_all_discussions(spark):
    cats = QD.q_discussions_category_counts(spark, SF_DIR).collect()
    total = QD.q_discussions_overview(spark, SF_DIR).head()["total_discussions"]
    assert sum(r["n_discussions"] for r in cats) == total
    assert {r["category"] for r in cats} <= set(QD.CATEGORIES)


def test_suggest_discussions_contract(spark):
    rows = QD.q_suggest_discussions(spark, SF_DIR).collect()
    assert 0 < len(rows) <= QD.SUGGEST_MAX
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["score"] >= QD.SUGGEST_MIN_SCORE
        expect = (
            "high" if r["score"] >= 0.7 else "medium" if r["score"] >= 0.5 else "low"
        )
        assert r["confidence"] == expect


def test_parse_issue_url_fields(spark):
    df = spark.createDataFrame(
        [
            ("https://github.com/acme/widgets/issues/123",),
            ("https://github.com/o/r/pull/7",),
            ("not a url",),
        ],
        "url string",
    )
    rows = df.select(parse_issue_url(F.col("url"))).collect()
    assert tuple(rows[0]) == ("acme", "widgets", "issues", 123)
    assert tuple(rows[1]) == ("o", "r", "pull", 7)
    assert rows[2]["number"] is None and rows[2]["owner"] == ""
