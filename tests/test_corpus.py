"""Training-corpus prep operators: shard packing (distributed prefix
sum), stratified hash sampling, decontamination, and the composed
cleaning pipeline (queries_corpus.py, operators/packing.py)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from deja_view_spark.operators.packing import pack_shards, shard_manifest
from deja_view_spark.queries_corpus import (
    DECON_MIN_OVERLAP,
    EVAL_MOD,
    SAMPLE_RATES,
    _spark_keep,
    q_docs_decontaminate,
    q_docs_stratified_sample,
)

SF = "/root/testdata/sf0.001"


def _weights(spark, n=500, seed=7):
    # deterministic pseudo-random weights with gaps in doc_id space
    rows = [
        (i * 3 + (i % 5), 1 + (i * 2654435761 % 97))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _naive_pack(df, budget):
    """Single-window oracle: global ordered cumsum on one partition."""
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(
        "shard_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget)),
    )


@pytest.mark.parametrize("bucket_width", [16, 64, 4096])
def test_pack_shards_matches_single_window(spark, bucket_width):
    """The two-phase distributed prefix sum must equal the naive
    global-window packing for every row, at any bucket width."""
    df = _weights(spark)
    got = pack_shards(df, budget=300, bucket_width=bucket_width)
    want = _naive_pack(df, 300)
    diff = (
        got.select("doc_id", "shard_id")
        .exceptAll(want.select("doc_id", "shard_id"))
        .count()
    )
    assert diff == 0


def test_pack_shards_partitioning_invariance(spark):
    df = _weights(spark)
    a = pack_shards(df, budget=300).select("doc_id", "shard_id")
    b = pack_shards(df.repartition(13), budget=300).select(
        "doc_id", "shard_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pack_shards_budget_overflow_bounded(spark):
    """A shard may exceed the budget only by (at most) the weight of
    one document — greedy no-split semantics."""
    df = _weights(spark)
    budget = 300
    man = shard_manifest(pack_shards(df, budget=budget)).collect()
    max_w = df.agg(F.max("n_tokens")).first()[0]
    for r in man:
        assert r.shard_tokens < budget + max_w
    # shards are contiguous, ordered, and start at 0
    ids = [r.shard_id for r in man]
    assert ids == list(range(len(ids)))
    # doc ranges do not interleave
    for a, b in zip(man, man[1:]):
        assert a.last_doc < b.first_doc


def test_pack_shards_reserved_collision(spark):
    df = _weights(spark).withColumn("shard_id", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        pack_shards(df, budget=300)


def test_stratified_sample_deterministic_and_rate(spark):
    out1 = {r.doc_id for r in q_docs_stratified_sample(spark, SF).collect()}
    out2 = {r.doc_id for r in q_docs_stratified_sample(spark, SF).collect()}
    assert out1 == out2 and out1
    # rates land near nominal per language (md5 is uniform; the corpus
    # at sf0.001 is small, so allow wide but bounded tolerance)
    from deja_view_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    per = (
        docs.withColumn("kept", _spark_keep(F.col("doc_id"), F.col("lang")))
        .groupBy("lang")
        .agg(F.avg(F.col("kept").cast("int")).alias("rate"), F.count("*").alias("n"))
        .collect()
    )
    for r in per:
        assert abs(r.rate - SAMPLE_RATES[r.lang]) < 0.35


def test_stratified_sample_partitioning_invariant(spark):
    """The keep-set is a pure function of (doc_id, lang) — shuffling
    the input cannot change it (the reason for hash sampling over
    rand()/df.sample)."""
    from deja_view_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    a = docs.where(_spark_keep(F.col("doc_id"), F.col("lang")))
    b = docs.repartition(17).where(_spark_keep(F.col("doc_id"), F.col("lang")))
    assert {r.doc_id for r in a.collect()} == {r.doc_id for r in b.collect()}


def test_decontaminate_flags_planted_copy(spark):
    """A corpus document that verbatim-copies an eval document must be
    flagged with overlap >= the threshold."""
    from deja_view_spark.queries_corpus import _shingle_col  # noqa: F401
    from deja_view_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    ev = docs.where(F.col("doc_id") % EVAL_MOD == 0).limit(1).collect()[0]
    planted = spark.createDataFrame(
        [(999983, ev.text, ev.lang, ev.source, len(ev.text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    corpus = docs.unionByName(planted)
    # run the same logic as the query but over the augmented corpus
    from deja_view_spark.queries_text import _shingle_col as shc

    sh = corpus.select(
        "doc_id", F.explode(F.array_distinct(shc(F.col("text")))).alias("sh")
    )
    eval_sh = (
        sh.where(F.col("doc_id") % EVAL_MOD == 0)
        .withColumnRenamed("doc_id", "eval_doc")
    )
    hits = (
        sh.join(F.broadcast(eval_sh), "sh")
        .where(F.col("doc_id") != F.col("eval_doc"))
        .groupBy("doc_id", "eval_doc")
        .agg(F.count("*").alias("overlap"))
        .where(F.col("overlap") >= DECON_MIN_OVERLAP)
    )
    flagged = {r.doc_id for r in hits.collect()}
    assert 999983 in flagged


def test_decontaminate_self_excluded(spark):
    """Eval documents never hit themselves."""
    out = q_docs_decontaminate(spark, SF)
    # no flagged doc reports itself as its own eval hit: the query
    # groups per doc, so assert the pair-level guard via the query's
    # own output being self-consistent (flagged docs exist only when a
    # DIFFERENT eval doc overlaps)
    rows = out.collect()
    for r in rows:
        assert r.max_overlap >= DECON_MIN_OVERLAP


def test_decontaminate_broadcast_gate(spark):
    """When the eval split exceeds the broadcast bound, the plan must
    carry NO BroadcastExchange on the eval shingle side (hashed
    equi-join fallback) and still produce the same rows as the
    broadcast path — the 100-TB OOM guard for the corpus-fraction
    synthetic split."""
    import io
    from contextlib import redirect_stdout

    def plan_of(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    big = q_docs_decontaminate(spark, SF, broadcast_max_eval_docs=0)
    # the pair-building join must not broadcast the (oversized) eval
    # side; the only allowed broadcasts would be metadata-sized, and
    # this query has none
    plan = plan_of(big)
    assert "BroadcastExchange" not in plan, plan
    small = q_docs_decontaminate(spark, SF)  # default: broadcast path
    plan_small = plan_of(small)
    assert "BroadcastExchange" in plan_small, plan_small
    assert sorted(map(tuple, big.collect())) == sorted(
        map(tuple, small.collect())
    )


def test_decontaminate_gate_is_job_free(spark):
    """Round-5 ADVICE fix: building the decontaminate DataFrame must
    not run a data-scan Spark job (the gate resolves from parquet
    footers or an explicit eval_docs hint). spark.read.parquet itself
    runs a metadata-sized listing job in Spark 4, so the assertion is
    a DELTA: building the query costs no more jobs than bare
    load_table calls — the old eager pruned doc_id COUNT is gone."""
    from deja_view_spark.sources.catalog import load_table

    tracker = spark.sparkContext.statusTracker()

    def n_jobs():
        return len(tracker.getJobIdsForGroup(None) or [])

    base0 = n_jobs()
    load_table(spark, SF, "documents")
    per_load = n_jobs() - base0

    before = n_jobs()
    df = q_docs_decontaminate(spark, SF)
    delta = n_jobs() - before
    assert delta <= per_load, (
        f"gate ran extra Spark jobs at plan time: {delta} > {per_load}"
    )
    before = n_jobs()
    df2 = q_docs_decontaminate(spark, SF, eval_docs=10)
    assert n_jobs() - before <= per_load
    assert df.columns == df2.columns == ["doc_id", "n_eval_hits", "max_overlap"]


def test_write_training_shards_roundtrip(spark, tmp_path):
    from deja_view_spark.operators.packing import (
        pack_shards,
        shard_manifest,
        write_training_shards,
    )

    df = _weights(spark, n=300)
    out = str(tmp_path / "shards")
    man = write_training_shards(df, out, budget=500).collect()
    # manifest from disk == manifest from the in-memory packing
    want = shard_manifest(pack_shards(df, budget=500)).collect()
    assert sorted(map(tuple, man)) == sorted(map(tuple, want))
    # physical layout: one directory per shard
    import os

    dirs = {d for d in os.listdir(out) if d.startswith("shard_id=")}
    assert len(dirs) == len(man)
    # every row written exactly once
    back = spark.read.parquet(out)
    assert back.count() == df.count()


def test_salted_join_matches_plain_join(spark):
    from deja_view_spark.operators.skew import salted_join

    # heavy skew: 80% of fact rows share one key
    fact = spark.createDataFrame(
        [(1 if i % 5 else i, i, f"p{i}") for i in range(2000)],
        "k long, seq long, payload string",
    )
    dim = spark.createDataFrame(
        [(i, f"attr{i}") for i in range(0, 2000, 5)] + [(1, "attr1")],
        "k long, attr string",
    )
    for how in ("inner", "left"):
        got = salted_join(fact, dim, "k", n_salt=4, how=how)
        want = fact.join(dim, "k", how)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """The hot key's fact rows land in n_salt distinct salt groups —
    the property that breaks the single-reducer bottleneck."""
    from pyspark.sql import functions as F2

    fact = spark.createDataFrame(
        [(1, i, f"p{i}") for i in range(1000)], "k long, seq long, payload string"
    )
    non_key = ["seq", "payload"]
    salts = (
        fact.withColumn(
            "_salt", F2.pmod(F2.xxhash64(*non_key), F2.lit(8)).cast("int")
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 8


def test_salted_join_rejects_bad_args(spark):
    from deja_view_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, 2)], "k long, _salt long")
    with pytest.raises(ValueError, match="reserved"):
        salted_join(df, df.select("k"), "k")
    ok = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(ok, ok.select("k"), "k", how="full")
