"""Streaming corpus-quality operators: the ingest-side form of the
batch quality filters (queries_quality.py).

Both operators are STATELESS map-side column expressions — exactly the
same builders the batch registry queries use, bound to a readStream
source — so the streaming gate/scrubber and the batch ones cannot
drift apart. That statelessness is also the scale property: a 100 TB/
day ingest filter must run scan-bandwidth-bound with no state store,
no watermark, and no shuffle; documents are gated/scrubbed the moment
they arrive, partition by partition.

- ``quality_gate_stream``: attaches the map-side Gopher metrics
  (n_tokens, distinct_ratio, dup_trigram_frac) and a ``keep`` flag.
  The most-frequent-bigram mass needs an aggregation, so it is a
  batch/windowed concern (q_docs_repetition), not an ingest gate —
  documented rather than smuggled in as hidden state.
- ``pii_scrub_stream``: per-bank match counts + the text column
  REPLACED by its redacted form, so nothing downstream of the scrubber
  can see raw PII (scrub-at-ingest, the standard compliance layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deja_view_spark.queries_quality import (
    MAX_DUP_TRIGRAM,
    MIN_DISTINCT_RATIO,
    pii_count_cols,
    pii_redact_col,
    repetition_scalar_cols,
)
from deja_view_spark.queries_text import TOKEN_RE


def quality_gate_transform(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The gate as a plain DataFrame transform — works on batch and
    streaming frames alike (no aggregation, no state)."""
    toks = F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_RE), 0)
    n, dr, dt = repetition_scalar_cols(toks)
    out = docs.select(
        *docs.columns,
        n.alias("n_tokens"),
        dr.alias("distinct_ratio"),
        dt.alias("dup_trigram_frac"),
    )
    keep = (F.col("distinct_ratio") >= MIN_DISTINCT_RATIO) & (
        F.col("dup_trigram_frac") <= MAX_DUP_TRIGRAM
    )
    return out.withColumn("keep", keep)


def pii_scrub_transform(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Counts per PII bank + the text column replaced by its redacted
    form; batch/streaming agnostic."""
    txt = F.col(text_col)
    others = [c for c in docs.columns if c != text_col]
    return docs.select(
        *others,
        *pii_count_cols(txt),
        pii_redact_col(txt).alias(text_col),
    )


def stream_quality_gate(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    schema: str,
    drop_failed: bool = False,
):
    """availableNow file-stream drain: read parquet docs, gate, write
    parquet. ``drop_failed=True`` filters to keep==true (the ingest
    shape); default annotates only, so downstream sees the flag."""
    src = spark.readStream.schema(schema).parquet(in_dir)
    gated = quality_gate_transform(src)
    if drop_failed:
        gated = gated.where(F.col("keep"))
    q = (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q


def stream_pii_scrub(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    schema: str,
):
    """availableNow file-stream drain: scrub-at-ingest, raw text never
    reaches the sink."""
    src = spark.readStream.schema(schema).parquet(in_dir)
    q = (
        pii_scrub_transform(src)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q
