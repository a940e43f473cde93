"""Planted-fixture tests for docs_span_dedup (overlapping k-token span
census) and events_funnel (ordered view->click->purchase funnel scan).

Both queries read {sf_dir}/{table}.parquet, so each test materializes a
tiny synthetic table in tmp_path and runs the real registry callable
against it — same code path as the driver."""

import datetime

import pytest
from pyspark.sql import functions as F

from deja_view_spark.queries_corpus import SPAN_K, SPAN_DF, q_docs_span_dedup
from deja_view_spark.queries_events import q_events_funnel

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "synth", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_span_dedup_catches_shifted_copy(spark, tmp_path):
    """A 10-token run copied at a DIFFERENT token offset is exactly
    what alignment-sensitive fixed segments miss and overlapping spans
    catch."""
    run = " ".join(f"tok{i}" for i in range(SPAN_K))  # the copied span
    doc_a = "alpha beta " + run + " gamma"        # run starts at offset 2
    doc_b = "x " + run + " y z"                   # run starts at offset 1
    filler = " ".join(f"solo{i}" for i in range(SPAN_K + 5))
    d = _write_docs(spark, tmp_path, [doc_a, doc_b, filler])
    out = q_docs_span_dedup(spark, d).collect()
    spans = {r.span for r in out}
    assert run in spans
    row = next(r for r in out if r.span == run)
    assert row.n_docs == 2 and row.n_occ == 2 and row.first_doc == 0


def test_span_dedup_hash_only_matches_default(spark):
    """The 100-TB hash-only census (16-byte shuffle rows + exemplar
    recovered via a survivors-only second pass) must emit exactly the
    default path's rows, and its plan must contain the survivor
    semi-join the docstring promises."""
    base = q_docs_span_dedup(spark, SF)
    esc = q_docs_span_dedup(spark, SF, hash_only=True)
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, esc.collect())
    )
    plan = esc._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_span_dedup_within_doc_repeat_not_df(spark, tmp_path):
    """A span repeated twice INSIDE one doc has n_docs=1 -> filtered by
    the df>={SPAN_DF} gate; n_occ counts all occurrences when the span
    also crosses documents."""
    run = " ".join(f"w{i}" for i in range(SPAN_K))
    doc_a = run + " mid " + run                   # twice in one doc
    d = _write_docs(spark, tmp_path, [doc_a, "unrelated " * SPAN_K])
    out = {r.span: r for r in q_docs_span_dedup(spark, d).collect()}
    assert run not in out  # single-doc repeats are not corpus dups
    doc_b = run + " tail"
    d = _write_docs(spark, tmp_path, [doc_a, doc_b])
    out = {r.span: r for r in q_docs_span_dedup(spark, d).collect()}
    assert out[run].n_docs == 2
    assert out[run].n_occ == 3  # two in doc_a + one in doc_b


def test_span_dedup_short_docs_emit_nothing(spark, tmp_path):
    d = _write_docs(spark, tmp_path, ["too short", "also tiny", ""])
    assert q_docs_span_dedup(spark, d).count() == 0


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type)"""
    data = [
        (
            eid,
            datetime.datetime(2024, 1, 1)
            + datetime.timedelta(microseconds=us),
            uid,
            et,
            1.0,
            "{}",
        )
        for eid, us, uid, et in rows
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_funnel_ordering_semantics(spark, tmp_path):
    """click BEFORE the first view must not count; click at the exact
    view timestamp must not count (strictly-after semantics); the
    first qualifying event per stage wins."""
    rows = [
        # user 1: full funnel, with a decoy click before the view and
        # a decoy click at exactly the view timestamp
        (1, 50, 1, "click"),
        (2, 100, 1, "view"),
        (3, 100, 1, "click"),     # same us as view -> not strictly after
        (4, 300, 1, "click"),     # t2
        (5, 250, 1, "purchase"),  # before t2 -> not counted
        (6, 900, 1, "purchase"),  # t3
        # user 2: view only
        (7, 10, 2, "view"),
        # user 3: never views
        (8, 10, 3, "purchase"),
        (9, 20, 3, "click"),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {r.user_id: r for r in q_events_funnel(spark, d).collect()}
    assert out[1].reached == 3
    assert out[1].click_gap_us == 200       # 300 - 100
    assert out[1].purchase_gap_us == 600    # 900 - 300
    assert out[2].reached == 1
    assert out[2].click_gap_us is None
    assert out[3].reached == 0
    assert out[3].view_us is None


def test_funnel_matches_conditional_min_joins(spark):
    """On the real sf0.001 corpus the single-shuffle scan must agree
    with the oracle's conditional-min join-chain formulation computed
    independently in Spark."""
    from deja_view_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.join(s1, "user_id")
        .where((F.col("event_type") == "click") & (F.col("us") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        ev.join(s2, "user_id")
        .where(
            (F.col("event_type") == "purchase") & (F.col("us") > F.col("t2"))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    joined = (
        ev.select("user_id")
        .distinct()
        .join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
    )
    expect = {
        r.user_id: (r.t1, r.t2, r.t3) for r in joined.collect()
    }
    got = {
        r.user_id: (
            r.view_us,
            None if r.click_gap_us is None else r.view_us + r.click_gap_us,
            None
            if r.purchase_gap_us is None
            else r.view_us + r.click_gap_us + r.purchase_gap_us,
        )
        for r in q_events_funnel(spark, SF).collect()
    }
    assert got == expect


def test_span_scrub_merges_overlapping_intervals(spark, tmp_path):
    """Two docs sharing an 11-token run produce two overlapping
    duplicated 10-token spans per doc (positions p and p+1); the union
    coverage must be 11 tokens, not 20."""
    from deja_view_spark.queries_corpus import q_docs_span_scrub

    run = " ".join(f"tok{i}" for i in range(SPAN_K + 1))  # 11 tokens
    doc_a = "lead " + run + " tail0 tail1"
    doc_b = run + " other words here now"
    d = _write_docs(spark, tmp_path, [doc_a, doc_b])
    out = {r.doc_id: r for r in q_docs_span_scrub(spark, d).collect()}
    assert out[0].n_dup_spans == 2          # spans at pos 2 and 3
    assert out[0].dup_tokens == SPAN_K + 1  # merged union, not 2*K
    assert out[1].dup_tokens == SPAN_K + 1
    # doc_b is 16 tokens, 11 duplicated -> frac ~0.6875 -> dropped
    assert not out[1].keep


def test_incremental_spans_flags_copied_batch_doc(spark, tmp_path):
    """A batch doc (md5-split 'new': doc_id 2) copying a 10-token run
    from a corpus doc (doc_id 0) is quarantined; an all-original batch
    doc (doc_id 4) reports zero contamination. doc_ids 2/4/9 fall in
    the 20% split, 0/1/3 in the corpus split (md5 % 5)."""
    from deja_view_spark.queries_corpus import q_docs_incremental_spans

    run = " ".join(f"c{i}" for i in range(SPAN_K))
    texts = {
        0: "corpus lead " + run + " corpus tail",         # corpus
        1: " ".join(f"other{i}" for i in range(SPAN_K)),   # corpus
        2: run + " fresh suffix words",                    # batch, copies
        4: " ".join(f"novel{i}" for i in range(SPAN_K + 2)),  # batch
    }
    rows = [(i, t, "en", "synth", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: r
        for r in q_docs_incremental_spans(spark, str(tmp_path)).collect()
    }
    assert set(out) == {2, 4}            # only batch docs reported
    assert out[2].n_contaminated == 1    # the copied span at pos 1
    assert out[2].n_corpus_docs == 1
    assert out[2].quarantine             # 1/4 spans > 0.2
    assert out[4].n_contaminated == 0 and not out[4].quarantine
