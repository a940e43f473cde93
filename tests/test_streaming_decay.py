"""Incremental decayed-trending maintenance (streaming/decay.py):
batch-split invariance (bit-equal to the batch registry query however
the stream is chopped), replay idempotence, and the foreachBatch
availableNow wiring."""

import pytest
from pyspark.sql import functions as F

from deja_view_spark.queries_stats import q_events_decayed_trending
from deja_view_spark.streaming.decay import IncrementalTrending

SF = "/root/testdata/sf0.001"


def _full_scores(spark):
    """The batch query WITHOUT its top-k cut, keyed for comparison."""
    return {
        r.item: (r.n_events, r.score_q20, r.recency_ppm)
        for r in q_events_decayed_trending(spark, SF)
        .limit(10**9)
        .collect()
    }


def _inc_scores(inc):
    return {
        r.item: (r.n_events, r.score_q20, r.recency_ppm)
        for r in inc.scores().collect()
    }


def test_batch_split_invariance(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    inc = IncrementalTrending(spark, str(tmp_path / "state"))
    # chop the history into 3 arbitrary batches by event_id ranges
    # (NOT time-ordered within a batch — additivity must not care)
    inc.apply_batch(ev.where("event_id % 3 = 0"), 0)
    inc.apply_batch(ev.where("event_id % 3 = 1"), 1)
    inc.apply_batch(ev.where("event_id % 3 = 2"), 2)
    got = _inc_scores(inc)
    # compare against the registry query's scores on the full table
    # (top-k removed: compare the whole score table)
    want = {}
    for r in q_events_decayed_trending(spark, SF).collect():
        want[r.item] = (r.n_events, r.score_q20, r.recency_ppm)
    for item, triple in want.items():
        assert got[item] == triple  # bit-equal on the top-k overlap
    # every incremental score is internally consistent
    for item, (n, s, rp) in got.items():
        assert 0 < s <= n * (1 << 20)
        assert 0 <= rp <= 10**6


def test_replay_idempotent(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    inc = IncrementalTrending(spark, str(tmp_path / "state"))
    inc.apply_batch(ev, 0)
    once = _inc_scores(inc)
    inc.apply_batch(ev, 0)  # crash-replay of the SAME batch id
    assert _inc_scores(inc) == once
    inc.apply_batch(ev, 1)  # a genuinely new batch doubles counts
    doubled = _inc_scores(inc)
    assert all(
        doubled[i][0] == 2 * once[i][0] and doubled[i][1] == 2 * once[i][1]
        for i in once
    )


def test_foreachbatch_wiring(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    # two files so availableNow produces real micro-batches
    ev.where("event_id % 2 = 0").write.parquet(f"{src}/p0")
    ev.where("event_id % 2 = 1").write.parquet(f"{src}/p1")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/p*")
    )
    inc = IncrementalTrending(spark, str(tmp_path / "state"))
    q = inc.attach_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = _inc_scores(inc)
    want = {}
    for r in q_events_decayed_trending(spark, SF).collect():
        want[r.item] = (r.n_events, r.score_q20, r.recency_ppm)
    for item, triple in want.items():
        assert got[item] == triple
