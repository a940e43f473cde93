"""Label write-back sink (S10): foreachPartition push with batching,
spool-transport receipts match the input exactly."""

import glob
import json
import sys

sys.path.insert(0, "/root/repo")

from deja_view_spark.sources.labelsink import write_labels  # noqa: E402


def test_write_labels_spools_every_row(spark, tmp_path):
    spool = str(tmp_path / "spool")
    rows = [(f"repo/issues/{i}", f"label-{i % 3}") for i in range(57)]
    df = spark.createDataFrame(rows, "issue_id string, label string").repartition(4)
    n = write_labels(df, spool, batch_size=10)
    assert n == 57

    got = []
    files = glob.glob(f"{spool}/labels_*.jsonl")
    assert len(files) >= 1  # one spool file per non-empty partition
    for p in files:
        with open(p, encoding="utf-8") as f:
            got.extend(json.loads(line) for line in f)
    assert sorted((r["issue_id"], r["label"]) for r in got) == sorted(rows)


def test_write_labels_empty_frame(spark, tmp_path):
    spool = str(tmp_path / "spool")
    df = spark.createDataFrame([], "issue_id string, label string")
    assert write_labels(df, spool) == 0
    assert glob.glob(f"{spool}/labels_*.jsonl") == []
