"""Discussion-suitability scoring (reference F8-F10) as pure column
expressions — no UDFs, fully inside whole-stage codegen.

Reference semantics (github_similarity_service.py:451-547, pattern
banks :61-100):
- each pattern BANK contributes its weight at most once (the reference
  breaks after the first matching pattern) -> OR of rlike's × weight;
- keyword score scales with the COUNT of distinct keywords present,
  capped: min(0.3, count*0.1)  (:496-512);
- bug keywords subtract 0.15 once (:515-521);
- non-bug title indicator adds 0.2 once (:524-529);
- open-state bonus 0.15 (:532-533);
- title-pattern bonus 0.25 once (:536-545);
- final clamp to [0,1] (:547) and round(score,3) on output (:613);
- confidence: >=0.7 high, >=0.5 medium, else low (:600-607).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from deja_view_spark.functions.similarity import clamp01, confidence_bucket

QUESTION_PATTERNS = [
    r"^(how|what|why|when|where|which|who|can|could|should|would|will|is|are|do|does|did)\b",
    r"\?",
    r"\b(help|guidance|advice|opinion|thoughts|suggestions?|input|feedback)\b",
    r"\b(best practices?|recommendations?|approach|strategy|way)\b",
    r"\b(anyone|somebody|someone)\b.*\b(know|tried|experience|success)\b",
    r"\b(how to|how do|how can|how should)\b",
    r"\b(what.*think|thoughts on|opinions on)\b",
]

FEATURE_PATTERNS = [
    r"\b(feature request|enhancement|suggestion|proposal|idea|rfc)\b",
    r"\b(would like|wish|hope|want|need|desire)\b.*\b(feature|functionality|capability|ability|option)\b",
    r"\b(add|implement|support|include|introduce|create)\b.*\b(feature|option|ability|functionality|support|capability)\b",
    r"\b(it would be|would be nice|would be great|would be helpful)\b",
    r"\b(request|requesting)\b.*\b(feature|enhancement|addition)\b",
    r"\b(can we|could we|should we)\b.*\b(add|implement|support|have)\b",
    r"\b(feature|functionality|capability)\b.*\b(request|suggestion|proposal)\b",
]

PROPOSAL_PATTERNS = [
    r"\b(rfc|proposal|design doc|spec|specification)\b",
    r"\b(propose|proposing|suggest|suggesting)\b",
    r"\b(approach|solution|design|architecture)\b.*\b(discussion|feedback|thoughts)\b",
]

DISCUSSION_PHRASES = [
    r"\b(open to|looking for|seeking)\b.*\b(feedback|input|thoughts|suggestions)\b",
    r"\b(brainstorm|discuss|explore|consider)\b",
    r"\b(community|everyone|folks|people)\b.*\b(think|opinion|experience)\b",
    r"\b(share.*experience|lessons learned|what.*worked)\b",
]

DISCUSSION_KEYWORDS = [
    "opinion", "thoughts", "feedback", "advice", "best practice",
    "recommendation", "approach", "strategy", "philosophy",
    "design decision", "brainstorm", "explore", "consider", "community",
    "input", "guidance", "experience", "lessons", "workflow", "process",
    "methodology",
]

BUG_KEYWORDS = ["crash", "exception", "traceback", "stacktrace", "segfault"]

NON_BUG_INDICATORS = [
    "feature", "enhancement", "suggestion", "idea", "proposal", "rfc",
    "discussion",
]

TITLE_DISCUSSION_PATTERNS = [
    r"^(rfc|proposal|idea|suggestion|enhancement|feature)[:.]",
    r"\[(rfc|proposal|idea|suggestion|enhancement|feature)\]",
    r"\b(thoughts|feedback|opinions)\b.*\?",
]

DISCUSSION_LABELS = [
    "question", "help wanted", "discussion", "feature request",
    "enhancement", "idea", "proposal", "feedback", "opinions", "rfc",
    "design", "brainstorming", "suggestion",
]


def _bank_hit(text: Column, patterns: list[str]) -> Column:
    """Reference 'break on first match' == bank matched at all."""
    hit = F.lit(False)
    for p in patterns:
        hit = hit | text.rlike(p)
    return hit


def _any_contains(text: Column, words: list[str]) -> Column:
    hit = F.lit(False)
    for w in words:
        hit = hit | text.contains(w)
    return hit


def keyword_count(text: Column, words: list[str] | None = None) -> Column:
    """Count of DISTINCT keywords present (substring containment,
    reference :503-507)."""
    words = words if words is not None else DISCUSSION_KEYWORDS
    cnt = F.lit(0)
    for w in words:
        cnt = cnt + text.contains(w).cast("int")
    return cnt


def discussion_score(
    title: Column,
    body: Column,
    state: Column | None = None,
    labels: Column | None = None,
) -> Column:
    """Reference _calculate_discussion_score as one column expression."""
    title_l = F.lower(title)
    combined = F.concat_ws(" ", title_l, F.lower(F.coalesce(body, F.lit(""))))

    kw = keyword_count(combined)
    score = (
        _bank_hit(combined, QUESTION_PATTERNS).cast("double") * 0.4
        + _bank_hit(combined, FEATURE_PATTERNS).cast("double") * 0.35
        + _bank_hit(combined, PROPOSAL_PATTERNS).cast("double") * 0.45
        + _bank_hit(combined, DISCUSSION_PHRASES).cast("double") * 0.3
        + F.when(kw > 0, F.least(F.lit(0.3), kw * 0.1)).otherwise(0.0)
        - _any_contains(combined, BUG_KEYWORDS).cast("double") * 0.15
        + _any_contains(title_l, NON_BUG_INDICATORS).cast("double") * 0.2
        + _bank_hit(title_l, TITLE_DISCUSSION_PATTERNS).cast("double") * 0.25
    )
    if state is not None:
        score = score + (state == "open").cast("double") * 0.15
    if labels is not None:
        lowered = F.transform(labels, lambda x: F.lower(x))
        score = (
            score
            + F.arrays_overlap(
                lowered, F.array(*[F.lit(x) for x in DISCUSSION_LABELS])
            ).cast("double")
            * 0.5
        )
    return clamp01(score)


def score_with_confidence(score: Column) -> tuple[Column, Column]:
    """(round(score,3), confidence bucket) — reference :600-613."""
    return F.round(score, 3), confidence_bucket(score)
