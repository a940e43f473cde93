"""Stream-static enrichment (streaming/enrich.py): dim hot-reload
between micro-batches, left-join miss visibility, replay idempotence,
foreachBatch availableNow wiring."""

from pyspark.sql import functions as F

from deja_view_spark.streaming.enrich import StreamStaticEnricher

SF = "/root/testdata/sf0.001"


def _dim(spark, version: str, users):
    return spark.createDataFrame(
        [(u, f"seg_{version}") for u in users], "user_id long, segment string"
    )


def test_dim_hot_reload_between_batches(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    users = [r.user_id for r in ev.select("user_id").distinct().collect()]
    dim_dir = str(tmp_path / "dim")
    enr = StreamStaticEnricher(
        spark, dim_dir, str(tmp_path / "out"), "user_id"
    )
    _dim(spark, "v1", users).write.mode("overwrite").parquet(dim_dir)
    enr.apply_batch(ev.where("event_id % 2 = 0"), 0)
    # dim updated BETWEEN batches: the next batch must see v2
    _dim(spark, "v2", users).write.mode("overwrite").parquet(dim_dir)
    enr.apply_batch(ev.where("event_id % 2 = 1"), 1)
    segs = {
        (r.batch % 2, r.segment)
        for r in enr.enriched()
        .select((F.col("event_id") % 2).alias("batch"), "segment")
        .distinct()
        .collect()
    }
    assert segs == {(0, "seg_v1"), (1, "seg_v2")}


def test_left_join_keeps_misses(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    users = sorted(
        r.user_id for r in ev.select("user_id").distinct().collect()
    )
    covered = users[: len(users) // 2]
    dim_dir = str(tmp_path / "dim")
    _dim(spark, "v1", covered).write.mode("overwrite").parquet(dim_dir)
    enr = StreamStaticEnricher(
        spark, dim_dir, str(tmp_path / "out"), "user_id"
    )
    enr.apply_batch(ev, 0)
    out = enr.enriched()
    assert out.count() == ev.count()  # nothing dropped
    misses = out.where(F.col("segment").isNull())
    assert misses.count() == ev.where(
        ~F.col("user_id").isin(covered)
    ).count()


def test_replay_idempotent(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    users = [r.user_id for r in ev.select("user_id").distinct().collect()]
    dim_dir = str(tmp_path / "dim")
    _dim(spark, "v1", users).write.mode("overwrite").parquet(dim_dir)
    enr = StreamStaticEnricher(
        spark, dim_dir, str(tmp_path / "out"), "user_id"
    )
    enr.apply_batch(ev, 0)
    once = enr.enriched().count()
    enr.apply_batch(ev, 0)  # crash-replay of the same batch id
    assert enr.enriched().count() == once


def test_foreachbatch_wiring(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    users = [r.user_id for r in ev.select("user_id").distinct().collect()]
    dim_dir = str(tmp_path / "dim")
    _dim(spark, "v1", users).write.mode("overwrite").parquet(dim_dir)
    src = str(tmp_path / "src")
    ev.where("event_id % 2 = 0").write.parquet(f"{src}/p0")
    ev.where("event_id % 2 = 1").write.parquet(f"{src}/p1")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/p*")
    )
    enr = StreamStaticEnricher(
        spark, dim_dir, str(tmp_path / "out"), "user_id"
    )
    q = enr.attach_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    out = enr.enriched()
    assert out.count() == ev.count()
    assert out.where(F.col("segment").isNull()).count() == 0
