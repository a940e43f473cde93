"""Release-notes document sink (S9 family): render the tiered release
markdown the reference builds in ``release_notes.py:118-219``
(``format_for_changelog``) from a classified items table.

Reference semantics replicated:
- tier alias sets ``{1: [tier 1|tier-1|tier1], 2: ..., 3: ...}``
  (release_notes.py:26-30);
- first tier whose alias set intersects the item's labels
  case-insensitively wins, else tier 0 = "Other Changes"
  (release_notes.py:94-107) — the same rule `queries_events.py:
  q_release_tiers` aggregates, so the rendered section counts are the
  driver-checked aggregate made visible;
- section order / headers / bullet shapes of release_notes.py:144-181
  (tier 1 bold title, tiers 2/3/0 plain, ``([#N](url)) by @author``);
- the contributors footer: sorted distinct authors across all tiers
  (release_notes.py:183-190).

Split of labor (same pattern as sources/report.py): tier
classification and per-tier truncation are DISTRIBUTED (one column
expression + one window); the collect is a sink over a release-sized
result. ``released_on`` is injectable so outputs are
byte-deterministic in tests (the reference stamps ``datetime.now()``,
release_notes.py:143).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# release_notes.py:26-30
TIER_ALIASES = {
    1: ["tier 1", "tier-1", "tier1"],
    2: ["tier 2", "tier-2", "tier2"],
    3: ["tier 3", "tier-3", "tier3"],
}

# release_notes.py:146,154,161,168
TIER_HEADERS = {
    1: "## 🚀 Major Features",
    2: "## ✨ Improvements",
    3: "## 🐛 Bug Fixes",
    0: "## 📝 Other Changes",
}
_TIER_ORDER = (1, 2, 3, 0)


def classify_tier(labels) -> F.Column:
    """First tier whose alias set intersects ``labels``
    (array<string>) case-insensitively, else 0
    (release_notes.py:94-107). Pure column expression — runs map-side
    in codegen."""
    lowered = F.transform(labels, F.lower)
    tier = F.lit(0)
    for t in (3, 2, 1):  # build when-chain so tier 1 wins ties
        tier = F.when(
            F.arrays_overlap(lowered, F.array(*[F.lit(a) for a in TIER_ALIASES[t]])),
            F.lit(t),
        ).otherwise(tier)
    return tier


def release_items_data(
    items: DataFrame, max_per_tier: int = 200
) -> dict[int, list[dict]]:
    """Classify + collect the release-sized item lists per tier.

    ``items``: (number, title, author, labels array<string>). Ordering
    inside a tier is (number asc) — deterministic at any parallelism
    (the reference iterates the GitHub API's updated-desc page order,
    which has no engine-side equivalent)."""
    w = Window.partitionBy("tier").orderBy(F.asc("number"))
    rows = (
        items.withColumn("tier", classify_tier(F.col("labels")))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_per_tier)
        .select("tier", "number", "title", "author")
        .orderBy("tier", "number")
        .collect()
    )
    tiered: dict[int, list[dict]] = {t: [] for t in _TIER_ORDER}
    for r in rows:
        tiered[r["tier"]].append(
            {"number": r["number"], "title": r["title"], "author": r["author"]}
        )
    return tiered


def format_for_changelog(
    tiered: dict[int, list[dict]],
    version: str | None = None,
    repo_name: str | None = None,
    released_on: str = "",
) -> str:
    """Markdown document with the reference's exact section structure
    (release_notes.py:118-196)."""
    lines: list[str] = []
    lines.append(f"# Release {version}" if version else "# Release Notes")
    lines.append(f"\n_Released on {released_on}_\n")

    def _url(n) -> str:
        return (
            f"https://github.com/{repo_name}/pull/{n}" if repo_name else f"#{n}"
        )

    for t in _TIER_ORDER:
        prs = tiered.get(t)
        if not prs:
            continue
        lines.append(TIER_HEADERS[t] + "\n")
        for pr in prs:
            title = (
                f"**{pr['title']}**" if t == 1 else pr["title"]
            )  # tier-1 titles bold (release_notes.py:149)
            lines.append(
                f"- {title} ([#{pr['number']}]({_url(pr['number'])}))"
                f" by @{pr['author']}"
            )
        lines.append("")

    contributors = sorted(
        {pr["author"] for prs in tiered.values() for pr in prs}
    )
    if contributors:
        lines.append("## 👥 Contributors\n")
        lines.append(
            "Thanks to all contributors: "
            + ", ".join(f"@{c}" for c in contributors)
            + "\n"
        )
    return "\n".join(lines)


def generate_release_notes(
    items: DataFrame,
    version: str | None = None,
    repo_name: str | None = None,
    released_on: str = "",
    output_file: str | None = None,
    max_per_tier: int = 200,
) -> str:
    """End-to-end: classify -> collect -> render -> (optionally) write
    (the reference's generate_release_notes, release_notes.py:198-230)."""
    tiered = release_items_data(items, max_per_tier=max_per_tier)
    doc = format_for_changelog(
        tiered, version=version, repo_name=repo_name, released_on=released_on
    )
    if output_file:
        with open(output_file, "w", encoding="utf-8") as f:
            f.write(doc)
    return doc
