"""Service facade (deja_view_spark/service.py): the reference's API
surface as engine-backed methods — response shapes, lifecycle, and
error paths."""

import pytest

from deja_view_spark.service import SimilarityService
from deja_view_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def svc(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("svc_index")
    return SimilarityService(spark, str(d / "index"), dim=32)


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


def test_health_shape(svc):
    h = svc.health()
    assert h == {
        "status": "healthy",
        "version": "1.0.0",
        "service": "github-issues-similarity",
    }


def test_index_then_stats(svc, docs):
    out = svc.index(docs, repository="acme/widgets")
    assert out["indexed"] == docs.count()
    assert out["repository"] == "acme/widgets"
    assert set(out) >= {"indexed", "issues", "discussions", "repository",
                        "batches", "message"}
    st = svc.stats()
    assert st["total_issues"] == docs.count()
    assert st["repositories"] == ["acme/widgets"]


def test_find_similar_shape_and_exclusion(svc, docs):
    out = svc.find_similar("3", top_k=3)
    assert out["query_issue"] == {"doc_id": "3"}
    assert out["count"] == len(out["similar_issues"]) <= 3
    for item in out["similar_issues"]:
        assert item["doc_id"] != "3"
        assert 0.0 <= item["similarity"] <= 1.0
    sims = [i["similarity"] for i in out["similar_issues"]]
    assert sims == sorted(sims, reverse=True)


def test_find_similar_missing_doc(svc):
    with pytest.raises(LookupError, match="not indexed"):
        svc.find_similar("no-such-doc")


def test_suggest_discussions_shape(svc, docs):
    out = svc.suggest_discussions(
        docs, repository="acme/widgets", min_score=0.1, max_suggestions=5
    )
    assert out["total_suggestions"] == len(out["suggestions"]) <= 5
    assert out["dry_run"] is True and out["min_score"] == 0.1
    assert out["total_analyzed"] > 0
    scores = [s["score"] for s in out["suggestions"]]
    assert scores == sorted(scores, reverse=True)
    for s in out["suggestions"]:
        assert s["score"] >= 0.1
        assert s["confidence"] in {"high", "medium", "low"}


def test_clear_then_empty_stats(spark, docs, tmp_path):
    svc2 = SimilarityService(spark, str(tmp_path / "idx"), dim=32)
    svc2.index(docs.limit(10), repository="r/x")
    assert svc2.stats()["total_issues"] == 10
    assert svc2.clear() == {"message": "All issues cleared successfully"}
    assert svc2.stats() == {"total_issues": 0, "repositories": []}
    with pytest.raises(LookupError, match="no index"):
        svc2.find_similar("3")


def test_discussions_metrics_dataclass_shape(svc):
    out = svc.discussions_metrics(SF, top_k=5)
    # the reference DiscussionMetrics field set, key-for-key
    # (discussions_metrics.py:22-37)
    assert set(out) == {
        "total_discussions", "discussions_this_week",
        "discussions_last_week", "week_over_week_change",
        "week_over_week_percentage", "unanswered_qa",
        "total_unanswered_qa", "top_upvoted", "category_breakdown",
        "answer_rate", "avg_upvotes", "period_start", "period_end",
    }
    assert out["total_discussions"] > 0
    assert len(out["unanswered_qa"]) <= 5
    assert len(out["top_upvoted"]) <= 5
    assert sum(out["category_breakdown"].values()) == out["total_discussions"]
    assert 0.0 <= out["answer_rate"] <= 100.0
