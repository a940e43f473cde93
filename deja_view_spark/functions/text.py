"""Document-text construction and id handling.

Reference semantics preserved bit-for-bit (they change embeddings and
therefore edges):

- document template       -> reference github_similarity_service.py:186-211
- 10,000-char body cap    -> reference github_similarity_service.py:204-209
- doc_id format           -> reference github_similarity_service.py:328,344
- doc_id -> number parse  -> reference cli.py:495-501,534-541
- labels csv round-trip   -> reference github_similarity_service.py:341,357,423,589
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BODY_MAX_CHARS = 10_000
TRUNCATION_SUFFIX = "... [truncated]"


def truncate_body(body: Column, max_chars: int = BODY_MAX_CHARS) -> Column:
    """Cap body text, appending the reference's truncation marker.

    Mirrors reference github_similarity_service.py:204-209.
    """
    return F.when(
        F.length(body) > max_chars,
        F.concat(F.substring(body, 1, max_chars), F.lit(TRUNCATION_SUFFIX)),
    ).otherwise(body)


def doc_text(
    title: Column,
    body: Column,
    state: Column,
    labels: Column,
    is_pull_request: Column,
    is_discussion: Column,
    category: Column | None = None,
) -> Column:
    """Build the embedding document exactly as the reference does.

    Issue/PR variant (reference github_similarity_service.py:194-203):
        "Title: {t}\\n\\nType: {Issue|Pull Request}\\n\\nState: {s}
         [\\n\\nLabels: a, b][\\n\\nBody: ...]"
    Discussion variant (reference :188-192) uses "Type: Discussion" and
    "Category: {c}" instead of State.

    Labels segment is omitted when the array is empty; Body segment is
    omitted when body is null/empty; body capped at 10,000 chars.
    """
    type_seg = F.when(is_discussion, F.lit("Type: Discussion")).otherwise(
        F.when(is_pull_request, F.lit("Type: Pull Request")).otherwise(
            F.lit("Type: Issue")
        )
    )
    mid_seg = (
        F.when(
            is_discussion,
            F.concat(F.lit("Category: "), F.coalesce(category, F.lit(""))),
        ).otherwise(F.concat(F.lit("State: "), state))
        if category is not None
        else F.concat(F.lit("State: "), state)
    )
    labels_seg = F.when(
        labels.isNotNull() & (F.size(labels) > 0),
        F.concat(F.lit("Labels: "), F.array_join(labels, ", ")),
    )
    body_seg = F.when(
        body.isNotNull() & (F.length(body) > 0),
        F.concat(F.lit("Body: "), truncate_body(body)),
    )
    # concat_ws skips nulls -> optional segments drop out cleanly
    return F.concat_ws(
        "\n\n",
        F.concat(F.lit("Title: "), title),
        type_seg,
        mid_seg,
        labels_seg,
        body_seg,
    )


def doc_id(owner: Column, repo: Column, kind: Column, number: Column) -> Column:
    """"{owner}/{repo}/{issues|discussions}/{n}".

    Mirrors reference github_similarity_service.py:328,344.
    """
    return F.concat_ws("/", owner, repo, kind, number.cast("string"))


def parse_issue_number(doc_id_col: Column) -> Column:
    """Extract trailing number from a doc_id.

    Reference parses via split('/issues/')[-1] with '_' fallback
    (cli.py:495-501,534-541); a single anchored regex covers both.
    """
    return F.regexp_extract(doc_id_col, r"(\d+)$", 1).cast("long")


ISSUE_URL_RE = r"github\.com/([^/]+)/([^/]+)/(issues|pull)/(\d+)"


def parse_issue_url(url: Column) -> list[Column]:
    """Parse a GitHub issue/PR URL into (owner, repo, kind, number).

    Reference cli.py:84-90 strips the host and splits on '/', rejecting
    anything whose 3rd segment is not issues|pull; here one anchored
    regexp_extract per field — rows that do not match yield empty
    strings / NULL number (the caller filters, mirroring the
    reference's error exit).
    """
    return [
        F.regexp_extract(url, ISSUE_URL_RE, 1).alias("owner"),
        F.regexp_extract(url, ISSUE_URL_RE, 2).alias("repo"),
        F.regexp_extract(url, ISSUE_URL_RE, 3).alias("kind"),
        F.nullif(F.regexp_extract(url, ISSUE_URL_RE, 4), F.lit("")).cast(
            "long"
        ).alias("number"),
    ]


def labels_to_csv(labels: Column) -> Column:
    """ArrayType(String) -> comma-joined string (Chroma metadata compat).

    Reference github_similarity_service.py:341,357.
    """
    return F.array_join(labels, ",")


def csv_to_labels(csv: Column) -> Column:
    """Comma-joined string -> array; empty string -> empty array.

    Reference github_similarity_service.py:423,589 (str.split(',')).
    """
    return F.when(
        csv.isNull() | (csv == ""), F.array().cast("array<string>")
    ).otherwise(F.split(csv, ","))


def display_truncate(text: Column, n: int = 60) -> Column:
    """title[:n] + '...' display trimming (reference cli.py:133,255,392)."""
    return F.when(
        F.length(text) > n, F.concat(F.substring(text, 1, n), F.lit("..."))
    ).otherwise(text)
