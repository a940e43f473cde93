"""Deterministic synthetic source-code table generator.

Produces the authoritative KG input table from BASELINE.json
``input_hint``:

    repos(repo: string, path: string, commit: string, lang: string,
          content: string)

Properties (per FIXTURES.md §1):
- fully deterministic in (n_rows, seed) — every cell is a pure function
  of the row id, built from ``spark.range`` + column expressions only
  (no driver-side data, no Python UDF), so generation itself is
  distributed and scales linearly with executors;
- one hot repo ("bigcorp/monorepo") holding ~30% of rows, exercising
  the salted band join / AQE skew handling;
- ~40% of rows live in near-duplicate clusters of 4 (templated variants
  sharing a base text with small per-variant edits) so duplicate edges
  exist at thresholds 0.7/0.8/0.85/0.9;
- every content embeds one path-shaped cross-file mention
  ("see also <path>") pointing at another row's path, so
  (doc, mentions, file) triples are non-empty.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

_REPOS = [
    "bigcorp/monorepo",  # hot repo, ~30% of rows
    "acme/frontend",
    "acme/backend",
    "octo/tools",
    "octo/docs",
    "zen/ml-platform",
    "zen/data-pipeline",
    "kite/cli",
    "kite/sdk",
    "nova/website",
]

_LANGS = ["python", "typescript", "go", "markdown", "rust", "java"]
_EXT = {"python": "py", "typescript": "ts", "go": "go", "markdown": "md",
        "rust": "rs", "java": "java"}

_DIRS = ["core", "src", "lib", "pkg", "services", "internal", "app", "utils",
         "api", "tests"]
_NAMES = ["index", "main", "handler", "client", "server", "config", "parser",
          "model", "worker", "router", "cache", "auth", "store", "engine",
          "codec", "queue"]

# sentence banks: content text is assembled combinatorially from these,
# giving a large space of distinct documents with realistic shared vocab.
_TOPICS = [
    "the authentication flow times out when the session token expires",
    "memory usage grows without bound during long indexing runs",
    "the parser rejects unicode identifiers in imported modules",
    "websocket connections drop silently behind the load balancer",
    "the scheduler starves low priority jobs under heavy load",
    "configuration reload loses custom environment overrides",
    "the cache invalidation races with concurrent writers",
    "pagination returns duplicate entries across page boundaries",
    "the retry logic amplifies traffic during upstream outages",
    "file watchers leak descriptors after repeated restarts",
    "the query planner chooses a full scan despite a covering index",
    "metrics counters reset unexpectedly after hot deploys",
    "the serializer drops fields with default values on round trip",
    "batch jobs deadlock when the queue depth exceeds the pool size",
    "startup probes fail intermittently on cold container starts",
    "the diff algorithm mislabels moved blocks as deletions",
]
_ACTIONS = [
    "we should add a regression test covering this scenario",
    "a workaround is to restart the worker pool every hour",
    "profiling shows most time spent in the hashing routine",
    "the fix needs to land before the next release train",
    "this only reproduces with the feature flag enabled",
    "reverting the last refactor makes the symptom disappear",
    "logs show repeated timeouts from the downstream service",
    "increasing the buffer size merely delays the failure",
    "the error surfaces as a generic internal server error",
    "customers report this on both staging and production",
    "bisecting points at the dependency upgrade last month",
    "adding structured logging confirmed the race condition",
]
_DETAILS = [
    "steps to reproduce are documented in the runbook",
    "the stack trace implicates the connection pool shutdown path",
    "a minimal repro lives in the integration test suite",
    "latency percentiles regress by forty percent at peak",
    "the incident review assigned this a high severity",
    "related discussion happened in the architecture sync",
    "observability dashboards show a step change after deploy",
    "the proposed patch touches the serializer and the codec",
    "backporting to the maintenance branch needs approval",
    "rollout will be gated behind a canary at five percent",
]
_VARIANT_TAILS = [
    "reported from the nightly build pipeline",
    "observed again after the weekend deploy window",
    "confirmed on the arm64 runners as well",
    "reproduced locally with the sanitizer enabled",
]


def _mix(id_col: Column, salt: int) -> Column:
    """Deterministic 63-bit mix of the row id — xxhash64 is a stable
    Spark built-in, so every derived attribute is a pure function of id."""
    return F.abs(F.xxhash64(id_col, F.lit(salt), F.lit(SEED)))


def _pick(arr: list[str], key: Column) -> Column:
    """Deterministically index a literal array by a hashed key column."""
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (key % len(arr) + 1).cast("int"))


def _sentence_bank(id_key: Column, salt: int, bank: list[str], n: int) -> Column:
    """Concat n sentences drawn from a bank, keys derived from id_key."""
    parts = [_pick(bank, _mix(id_key, salt + i)) for i in range(n)]
    return F.concat_ws(". ", *parts)


def _ident_tokens(id_key: Column, salt: int, n: int) -> Column:
    """n code-identifier-like tokens from a ~2.6M-token space, keyed by
    id_key: e.g. "parser_3f2a1". Documents sharing id_key (cluster
    members) share them; unrelated documents almost never collide.

    This is what keeps the background cosine of unrelated documents low
    (vocabulary is effectively unbounded, like real source code), so the
    duplicate threshold separates cleanly — see tools/tune_lsh.py."""
    toks = []
    for i in range(n):
        h = _mix(id_key, salt * 1000 + i)
        toks.append(
            F.concat(
                _pick(_NAMES, h),
                F.lit("_"),
                F.lower(F.conv((h % 1048576).cast("string"), 10, 16)),
            )
        )
    return F.concat_ws(" ", *toks)


def generate_repos(spark: SparkSession, n_rows: int) -> DataFrame:
    """Build the repos table as a lazy DataFrame of ``n_rows`` rows."""
    df = spark.range(n_rows).withColumnRenamed("id", "row_id")
    rid = F.col("row_id")

    # --- repo: hot repo gets 30%, remainder spread over the other 9
    repo_roll = _mix(rid, 1) % 100
    other_idx = (_mix(rid, 2) % (len(_REPOS) - 1) + 1).cast("int")
    repo = F.when(repo_roll < 30, F.lit(_REPOS[0])).otherwise(
        F.element_at(F.array(*[F.lit(r) for r in _REPOS]), other_idx + 1)
    )

    # --- lang + path (path made unique by embedding the row id)
    lang = _pick(_LANGS, _mix(rid, 3))
    ext = F.element_at(
        F.create_map(*[F.lit(x) for kv in _EXT.items() for x in kv]), lang
    )
    path = F.concat_ws(
        "/",
        _pick(_DIRS, _mix(rid, 4)),
        F.concat(_pick(_NAMES, _mix(rid, 5)), F.lit("_"), rid.cast("string"),
                 F.lit("."), ext),
    )

    # --- commit: 40-char hex, deterministic
    commit = F.substring(F.sha2(F.concat(F.lit("commit:"), rid.cast("string")), 256), 1, 40)

    # --- near-duplicate clusters: rows are grouped in blocks of 4; a
    # block is a duplicate cluster iff mix(block) % 10 < 4 (~40% of rows).
    # Cluster members share the template key (the block id); singletons
    # use their own row id, so their text is unique.
    block = F.floor(rid / 4)
    is_cluster = (_mix(block.cast("long"), 6) % 10) < 4
    tpl_key = F.when(is_cluster, block).otherwise(rid).cast("long")

    body = _sentence_bank(tpl_key, 10, _TOPICS, 1)
    actions = _sentence_bank(tpl_key, 20, _ACTIONS, 1)
    details = _sentence_bank(tpl_key, 30, _DETAILS, 1)
    # identifier section: ~60 tokens from a huge keyed space — dominates
    # the token mass, so unrelated docs stay nearly orthogonal while
    # cluster members (same tpl_key) match on it exactly
    idents = _ident_tokens(tpl_key, 40, 60)
    # variant tail: differs per row inside a cluster -> near (not exact) dup
    tail = F.when(is_cluster, _pick(_VARIANT_TAILS, _mix(rid, 7))).otherwise(F.lit(""))

    # cross-file mention: another row's path, recomputed from mid
    mid = _mix(rid, 8) % F.greatest(F.lit(1), F.lit(n_rows)).cast("long")
    m_lang = _pick(_LANGS, _mix(mid, 3))
    m_ext = F.element_at(
        F.create_map(*[F.lit(x) for kv in _EXT.items() for x in kv]), m_lang
    )
    mention_path = F.concat_ws(
        "/",
        _pick(_DIRS, _mix(mid, 4)),
        F.concat(_pick(_NAMES, _mix(mid, 5)), F.lit("_"), mid.cast("string"),
                 F.lit("."), m_ext),
    )

    title = F.concat(
        F.lit("Issue: "),
        _pick(_TOPICS, _mix(tpl_key, 9)),
    )
    content = F.concat_ws(
        "\n\n",
        title,
        body,
        actions,
        details,
        idents,
        F.concat(F.lit("see also "), mention_path),
        tail,
    )

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def rows_for_sf(sf: float) -> int:
    """sf0.001 -> 2_000 rows; linear in sf (sf0.1 -> 200_000)."""
    return max(200, int(round(sf * 2_000_000)))


def write_repos(spark: SparkSession, out_dir: str, sf: float) -> None:
    """Materialize the repos table as parquet, partitioned the way the
    real pipeline wants to scan it (pruning on lang; repo kept as a
    column because 10 repos here would make pathological partitions —
    at real scale this is an Iceberg table bucketed by repo)."""
    generate_repos(spark, rows_for_sf(sf)).repartition(8).write.mode(
        "overwrite"
    ).parquet(out_dir)
