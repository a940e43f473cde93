"""Scoring banks: direction tests mirroring the reference's unit suite
(test_github_similarity_service.py:421-471 — question >0.5,
feature >0.5, bug <0.5)."""

import pytest
from pyspark.sql import functions as F

from deja_view_spark.functions.scoring import discussion_score

CASES = [
    # (title, body, state, expected_side)  per reference score-direction tests
    ("How do I configure the cache?", "Looking for guidance and best practices", "open", "high"),
    ("Feature request: add dark mode", "It would be great to support themes", "open", "high"),
    ("RFC: new plugin architecture", "Proposal for community feedback and thoughts", "open", "high"),
    ("App crashes on startup", "Segfault with traceback attached", "open", "low"),
    ("Fix typo", "small fix", "closed", "low"),
]


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(
        [(i, t, b, s) for i, (t, b, s, _) in enumerate(CASES)],
        "id long, title string, body string, state string",
    )
    out = df.withColumn(
        "score",
        discussion_score(F.col("title"), F.col("body"), state=F.col("state")),
    ).collect()
    return {r.id: r.score for r in out}


def test_question_scores_high(scored):
    assert scored[0] > 0.5


def test_feature_scores_high(scored):
    assert scored[1] > 0.5


def test_proposal_scores_high(scored):
    assert scored[2] > 0.5


def test_bug_scores_low(scored):
    assert scored[3] < 0.5


def test_plain_scores_low(scored):
    assert scored[4] < 0.5


def test_clamped_01(spark):
    df = spark.createDataFrame(
        [("RFC: proposal idea?", "feature request thoughts feedback advice "
          "opinion community brainstorm explore guidance", "open")],
        "title string, body string, state string",
    )
    s = df.select(
        discussion_score(
            F.col("title"), F.col("body"), state=F.col("state")
        ).alias("s")
    ).head().s
    assert s == 1.0  # stacked bonuses clamp at 1.0 (reference :547)


def test_labels_bonus(spark):
    df = spark.createDataFrame(
        [("plain title", "plain body", ["Question"]), ("plain title", "plain body", [])],
        "title string, body string, labels array<string>",
    )
    rows = df.select(
        discussion_score(
            F.col("title"), F.col("body"), labels=F.col("labels")
        ).alias("s")
    ).collect()
    assert rows[0].s == pytest.approx(rows[1].s + 0.5)
