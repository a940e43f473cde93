"""Document-text golden tests mirroring the reference's
test_github_similarity_service.py:207-247 assertions."""

from pyspark.sql import functions as F

from deja_view_spark.functions.text import (
    csv_to_labels,
    doc_id,
    doc_text,
    labels_to_csv,
    parse_issue_number,
    truncate_body,
)


def _one(spark, **row):
    defaults = dict(
        title="Bug in parser",
        body="It crashes",
        state="open",
        labels=["bug", "urgent"],
        is_pull_request=False,
        is_discussion=False,
        category=None,
    )
    defaults.update(row)
    return spark.createDataFrame(
        [tuple(defaults.values())],
        "title string, body string, state string, labels array<string>, "
        "is_pull_request boolean, is_discussion boolean, category string",
    )


def _doc(spark, **row):
    df = _one(spark, **row)
    return df.select(
        doc_text(
            F.col("title"), F.col("body"), F.col("state"), F.col("labels"),
            F.col("is_pull_request"), F.col("is_discussion"), F.col("category"),
        ).alias("t")
    ).head()[0]


def test_issue_document_golden(spark):
    # reference test_github_similarity_service.py:207-223
    t = _doc(spark)
    assert t == (
        "Title: Bug in parser\n\nType: Issue\n\nState: open\n\n"
        "Labels: bug, urgent\n\nBody: It crashes"
    )


def test_pull_request_type(spark):
    t = _doc(spark, is_pull_request=True)
    assert "Type: Pull Request" in t


def test_discussion_uses_category(spark):
    t = _doc(spark, is_discussion=True, category="Q&A")
    assert "Type: Discussion" in t and "Category: Q&A" in t
    assert "State:" not in t


def test_empty_labels_and_body_segments_omitted(spark):
    t = _doc(spark, labels=[], body=None)
    assert t == "Title: Bug in parser\n\nType: Issue\n\nState: open"


def test_body_truncated_at_10000(spark):
    # reference github_similarity_service.py:204-209
    long_body = "x" * 12_000
    t = _doc(spark, body=long_body)
    assert t.endswith("... [truncated]")
    body_seg = t.split("Body: ")[1]
    assert len(body_seg) == 10_000 + len("... [truncated]")


def test_truncate_noop_under_cap(spark):
    df = spark.createDataFrame([("short",)], "b string")
    assert df.select(truncate_body(F.col("b"))).head()[0] == "short"


def test_doc_id_build_and_parse(spark):
    df = spark.createDataFrame([("acme", "web", "issues", 42)],
                               "owner string, repo string, kind string, n long")
    out = df.select(
        doc_id(F.col("owner"), F.col("repo"), F.col("kind"), F.col("n")).alias("d")
    )
    d = out.head()[0]
    assert d == "acme/web/issues/42"  # github_similarity_service.py:344
    assert out.select(parse_issue_number(F.col("d"))).head()[0] == 42


def test_labels_csv_roundtrip(spark):
    # github_similarity_service.py:341,423 + empty-string -> [] edge
    df = spark.createDataFrame([(["a", "b"],), ([],)], "labels array<string>")
    csv = df.select(labels_to_csv(F.col("labels")).alias("c"))
    back = csv.select(csv_to_labels(F.col("c")).alias("l")).collect()
    assert back[0][0] == ["a", "b"]
    assert back[1][0] == []


def test_display_truncate(spark):
    """F14: title[:n] + '...' display trimming (reference cli.py:133)."""
    from deja_view_spark.functions.text import display_truncate

    df = spark.createDataFrame(
        [("x" * 80,), ("short",), ("y" * 60,)], "t string"
    )
    got = [r[0] for r in df.select(display_truncate(F.col("t"), 60)).collect()]
    assert got == ["x" * 60 + "...", "short", "y" * 60]
