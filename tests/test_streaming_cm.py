"""Incremental count-min sketch maintenance (streaming/cm.py):
batch-split invariance (point estimates bit-equal to the batch
registry query however the stream is chopped), replay idempotence,
bounded state, and the foreachBatch availableNow wiring."""

from pyspark.sql import functions as F

from deja_view_spark.queries_events import (
    CM_DEPTH,
    CM_WIDTH,
    q_events_cm_sketch,
)
from deja_view_spark.streaming.cm import IncrementalCMSketch

SF = "/root/testdata/sf0.001"


def _batch_estimates(spark):
    """The batch query's (item -> cm_estimate) for its audited keys."""
    return {
        r.item: r.cm_estimate
        for r in q_events_cm_sketch(spark, SF).collect()
    }


def _keys_df(spark, items):
    return spark.createDataFrame([(i,) for i in sorted(items)], "item long")


def test_batch_split_invariance(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    inc = IncrementalCMSketch(spark, str(tmp_path / "state"))
    # chop the history into 3 arbitrary batches (not time-ordered)
    inc.apply_batch(ev.where("event_id % 3 = 0"), 0)
    inc.apply_batch(ev.where("event_id % 3 = 1"), 1)
    inc.apply_batch(ev.where("event_id % 3 = 2"), 2)
    want = _batch_estimates(spark)
    got = {
        r.item: r.cm_estimate
        for r in inc.estimates(_keys_df(spark, want)).collect()
    }
    assert got == want  # bit-equal estimates for the audited keys


def test_state_stays_sketch_sized(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    half = ev.where("event_id % 2 = 0")
    inc = IncrementalCMSketch(spark, str(tmp_path / "state"))
    inc.apply_batch(ev, 0)
    inc.apply_batch(half, 1)
    # merged state is bounded by the sketch dimensions, never the
    # item cardinality or event count
    assert inc.cells().count() <= CM_DEPTH * CM_WIDTH
    # total mass = depth * occurrences folded in
    nonnull = F.get_json_object("props", "$.k").isNotNull()
    n_occ = ev.where(nonnull).count() + half.where(nonnull).count()
    total = inc.cells().agg(F.sum("cnt")).first()[0]
    assert total == CM_DEPTH * n_occ


def test_replay_idempotent(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    inc = IncrementalCMSketch(spark, str(tmp_path / "state"))
    inc.apply_batch(ev, 0)
    keys = _keys_df(spark, range(20))
    once = {r.item: r.cm_estimate for r in inc.estimates(keys).collect()}
    inc.apply_batch(ev, 0)  # crash-replay of the SAME batch id
    again = {r.item: r.cm_estimate for r in inc.estimates(keys).collect()}
    assert again == once
    inc.apply_batch(ev, 1)  # a genuinely new batch doubles every cell
    doubled = {r.item: r.cm_estimate for r in inc.estimates(keys).collect()}
    assert all(doubled[i] == 2 * once[i] for i in once)


def test_unseen_key_estimates_nonnegative(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    inc = IncrementalCMSketch(spark, str(tmp_path / "state"))
    inc.apply_batch(ev, 0)
    # keys far outside the item domain: estimate is >= 0 (collisions
    # may make it positive — the one-sided guarantee)
    got = inc.estimates(_keys_df(spark, [10**12 + i for i in range(5)]))
    assert all(r.cm_estimate >= 0 for r in got.collect())


def test_foreachbatch_wiring(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    ev.where("event_id % 2 = 0").write.parquet(f"{src}/p0")
    ev.where("event_id % 2 = 1").write.parquet(f"{src}/p1")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/p*")
    )
    inc = IncrementalCMSketch(spark, str(tmp_path / "state"))
    q = inc.attach_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    want = _batch_estimates(spark)
    got = {
        r.item: r.cm_estimate
        for r in inc.estimates(_keys_df(spark, want)).collect()
    }
    assert got == want
