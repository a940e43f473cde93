"""End-to-end KG build (SURVEY §7.1 picture).

    repos(repo, path, commit, lang, content)
      stage documents   : doc_id + sha256 lineage + doc_text (10k cap)
      stage embeddings  : vectorized embed UDF -> kg_embeddings/ (by repo)
      stage duplicates  : LSH self-join -> duplicate edges
      stage triples     : contains ∪ mentions ∪ duplicates -> kg_triples/
                          (partitioned by pred)
      stage canonical   : connected components -> same_as triples
      kg_lineage        : per-(stage, repo) lineage rows; resume =
                          anti-join (plans/lineage.py)

All writes use (per-writer) dynamic partition overwrite — re-running
any stage (or resuming a half-finished run) converges to the same
table state (idempotence: reference upsert-by-id semantics,
github_similarity_service.py:365-369, SURVEY §1.4).

Critical-path layout (the scaling-efficiency work): the featurized
table is eagerly localCheckpoint'ed ONCE (the single corpus text/UDF
pass), and everything that does not gate downstream compute runs OFF
the critical path in background threads over that cache:

    featurize (cache) ──┬─ [bg] write kg_embeddings + lineage
                        └─ duplicate self-join (cache)
                               ├─ [bg] connected components ─ same_as write
                               └─ contains∪mentions∪dups write
                           lineage (one narrow agg over written triples)

On a cluster the same overlap falls out of writing stages to an
Iceberg table from independent jobs; in one JVM, concurrent actions
share the scheduler. The serial terms this removes from the timed
path: the embeddings write+read-back roundtrip (~2x corpus bytes of
disk traffic), the separate lineage aggregation jobs, the CC loop
(hidden behind the triples write), and the final full-output count
(folded into the lineage agg).
"""

from __future__ import annotations

import os
import time
import uuid
from concurrent.futures import Future, ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deja_view_spark.functions.embedding import make_embed_udf
from deja_view_spark.functions.hashing import make_minhash_bands_udf
from deja_view_spark.functions.text import truncate_body
from deja_view_spark.operators.components import connected_components
from deja_view_spark.operators.selfjoin import duplicate_edges
from deja_view_spark.operators.triples import (
    PATH_TOKEN_RE,
    contains_triples,
    doc_key,
    duplicate_triples,
    mention_triples_from_emb,
    same_as_triples,
)
from deja_view_spark.plans import lineage as L


class KGPipeline:
    """Orchestrates the staged build over a repos-shaped source."""

    def __init__(
        self,
        spark: SparkSession,
        source: DataFrame,
        out_dir: str,
        threshold: float = 0.85,
        top_k: int = 3,
        dim: int = 128,
        convention: str = "report",
        method: str = "minhash",
        bands: int = 16,
        rows: int = 4,
        run_id: str | None = None,
        store_bands: bool = True,
        range_partition_write: bool = False,
    ):
        # defaults: threshold 0.85 is the reference's real-run setting
        # (test-final-report.md:3-6); report-convention 0.85 == cosine
        # 0.7, which clears the synthetic corpus' background tail (see
        # tools/tune_lsh.py); minhash banding is the north-star
        # candidate generator.
        self.spark = spark
        self.source = source
        self.out_dir = out_dir
        self.threshold = threshold
        self.top_k = top_k
        self.dim = dim
        self.convention = convention
        self.method = method
        self.bands = bands
        self.rows = rows
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.store_bands = store_bands
        self.range_partition_write = range_partition_write
        self.metrics: dict[str, dict] = {}
        self._pool = ThreadPoolExecutor(max_workers=2)
        self._bg: list[Future] = []
        from deja_view_spark.deploy import ensure_py_files

        ensure_py_files(spark)  # UDF workers need the package (--py-files)

    # ------------------------------------------------------------ stages
    def documents(self) -> DataFrame:
        """doc_id, sha256 lineage col, doc_text (body cap preserved —
        reference github_similarity_service.py:204-209)."""
        return (
            doc_key(self.source)
            .withColumn("sha256", F.sha2(F.col("content"), 256))
            .withColumn("doc_text", truncate_body(F.col("content")))
        )

    def _emb_path(self) -> str:
        return os.path.join(self.out_dir, "kg_embeddings")

    def _triples_path(self) -> str:
        return os.path.join(self.out_dir, "kg_triples")

    def _join_bg(self) -> None:
        """Wait for background writes; re-raise their failures."""
        futs, self._bg = self._bg, []
        for f in futs:
            f.result()

    def build_embeddings(self, resume: bool = False) -> DataFrame:
        """Stage 'embeddings': featurize ONCE into an eager cache; the
        kg_embeddings parquet write (partitioned by repo) and the
        lineage aggregation run in a background thread over that cache
        while downstream stages compute. Resume skips repos already
        recorded in lineage."""
        t0 = time.time()
        docs = self.documents()
        todo = docs
        if resume:
            done = L.completed_parts(self.spark, self.out_dir, "embeddings")
            todo = docs.join(
                done.withColumnRenamed("part_key", "repo"), "repo", "left_anti"
            )
        # embed + minhash in ONE projection/stage: the text is scanned
        # once and featurized here; the duplicate self-join downstream
        # re-reads no text and runs no Python (method='stored'). Two
        # scalar UDFs in the same stage measured faster than a fused
        # struct-returning UDF (44s vs 56s / 1M rows / local[32]).
        # count BEFORE any repartition: here it folds to a
        # metadata/count-only scan.
        n_in = todo.count()
        if self.range_partition_write:
            # optional tidy-file layout: each write task spans 1-2 repo
            # dirs. Costs a full-corpus shuffle (~1.5KB/row) + a
            # sampling pass; default OFF — the pipelined
            # scan->featurize->cache stage needs no exchange at all.
            # At cluster scale, prefer writing to an Iceberg table
            # bucketed by repo instead of re-sorting here.
            todo = todo.repartitionByRange(
                self.spark.sparkContext.defaultParallelism, "repo", "doc_id"
            )
        embed = make_embed_udf(dim=self.dim)
        # mentions ride the same single text pass (pure column exprs,
        # extracted from FULL content — not the 10k-capped doc_text —
        # self-references dropped): the triples stage then reads no
        # source text at all (one corpus scan for the whole pipeline).
        mentions = F.filter(
            F.array_distinct(
                F.regexp_extract_all(
                    F.col("content"), F.lit(PATH_TOKEN_RE), 1
                )
            ),
            lambda x: x != F.col("path"),
        )
        cols = [
            F.col("doc_id"),
            F.col("repo"),
            F.col("path"),
            F.col("lang"),
            F.col("sha256"),
            mentions.alias("mentions"),
            embed(F.col("doc_text")).alias("vector"),
        ]
        if self.store_bands:
            # seed matches duplicate_edges' default LSH seed so stored
            # and recomputed band paths emit identical candidate sets
            mh = make_minhash_bands_udf(
                bands=self.bands, rows=self.rows, seed=1337
            )
            cols.append(mh(F.col("doc_text")).alias("bands"))
        if n_in == 0:
            self.metrics["embeddings"] = {"input_rows": 0, "sec": time.time() - t0}
            if os.path.exists(self._emb_path()):
                return self.spark.read.parquet(self._emb_path())
            return self.spark.createDataFrame(
                [], "doc_id string, path string, lang string, "
                    "sha256 string, mentions array<string>, "
                    "vector array<float>, bands array<bigint>, repo string"
            )
        # the ONE featurize pass, materialized (MEMORY_AND_DISK — the
        # single-JVM analogue of a staged Iceberg table)
        emb = todo.select(*cols).localCheckpoint(eager=True)
        self.metrics["embeddings"] = {
            "input_rows": n_in,
            "sec": time.time() - t0,
        }

        def _write_and_lineage() -> None:
            tw = time.time()
            # Dynamic partition overwrite (per-writer option) only when
            # RESUMING — a subset write must keep other repos' files;
            # full builds use static overwrite (no staging-dir dance).
            (
                emb.write.mode("overwrite")
                .option(
                    "partitionOverwriteMode", "dynamic" if resume else "static"
                )
                .partitionBy("repo")
                .parquet(self._emb_path())
            )
            # embeddings are 1:1 with inputs and carry sha256 — one agg
            # over the CACHE records lineage; no source re-scan, no
            # read-back, no join
            L.record_lineage_from_table(
                emb, self.out_dir, "embeddings", self.run_id
            )
            self.metrics["embeddings"]["write_sec"] = round(time.time() - tw, 2)

        self._bg.append(self._pool.submit(_write_and_lineage))
        if resume:
            # downstream needs the FULL table (old + new rows): wait for
            # the subset write, then read back the merged table
            self._join_bg()
            return self.spark.read.parquet(self._emb_path())
        return emb

    def build_duplicate_edges(self, emb: DataFrame) -> DataFrame:
        # 'minhash' rides the bands column the featurizer already wrote
        # (method='stored'): the candidate stage re-reads no text and
        # runs no Python. 'lsh'/'exact' keep their own generators.
        method = "stored" if self.method == "minhash" and "bands" in emb.columns else self.method
        text = None
        if method == "minhash":
            text = self.documents().select("doc_id", "repo", "doc_text")
        return duplicate_edges(
            emb,
            threshold=self.threshold,
            top_k=self.top_k,
            scope_col="repo",
            convention=self.convention,
            method=method,
            bands=self.bands,
            rows=self.rows,
            text=text,
        )

    def build_triples(self, emb: DataFrame | None = None) -> DataFrame:
        """Stage 'triples': contains ∪ mentions ∪ duplicates written
        while connected components runs CONCURRENTLY (independent DAG
        branches over the checkpointed edge set); same_as lands in its
        own pred partition right after. Lineage counts + the total come
        from ONE narrow aggregation over the written table."""
        t0 = time.time()
        if emb is None:
            emb = self.spark.read.parquet(self._emb_path())
        # the LSH self-join feeds three consumers (duplicate triples,
        # connected components, the final union write) — checkpoint it
        # once so the band join + cosine verify run exactly once, not
        # per-consumer (on a cluster: persist(DISK_ONLY) / a staged
        # Iceberg table; localCheckpoint is its single-JVM analogue).
        t_dup = time.time()
        dup_edges = self.build_duplicate_edges(emb).localCheckpoint(eager=True)
        self.metrics["dup_edges"] = {"sec": time.time() - t_dup}

        # canonicalization overlaps the main triples write below: CC is
        # an iterative chain of small jobs over the (tiny, checkpointed)
        # edge set — scheduler gaps between its rounds interleave with
        # the write's tasks instead of serializing after them.
        t_cc = time.time()
        cc_fut = self._pool.submit(
            connected_components,
            dup_edges.where(F.col("src") < F.col("dst")),
            None,
            "src",
            "dst",
        )

        # contains + mentions come from the featurized cache (path and
        # pre-extracted mentions stored at embed time) — the triples
        # stage performs NO source-text scan.
        main = (
            contains_triples(emb)
            .unionByName(mention_triples_from_emb(emb))
            .unionByName(duplicate_triples(dup_edges))
        )
        (
            main.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("pred")
            .parquet(self._triples_path())
        )
        comp = cc_fut.result()
        self.metrics["cc"] = {"sec": time.time() - t_cc}
        (
            same_as_triples(comp)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("pred")
            .parquet(self._triples_path())
        )

        out = self.spark.read.parquet(self._triples_path())
        # lineage is keyed by repo: every subj is repo-prefixed
        # ("owner/name" or "owner/name/path"), so recover the part key.
        # ONE pruned scan (subj only) yields both the per-part counts
        # and, summed driver-side, the total triple count — no separate
        # full-output count job.
        counts_rows = (
            out.groupBy(
                F.regexp_extract(F.col("subj"), r"^([^/]+/[^/]+)", 1).alias(
                    "part_key"
                )
            )
            .agg(F.count("*").alias("output_rows"))
            .collect()
        )
        counts = self.spark.createDataFrame(
            counts_rows, "part_key string, output_rows long"
        )
        L.record_lineage(
            emb.select("repo", "sha256"), counts, self.out_dir,
            "triples", self.run_id,
        )
        self.metrics["triples"] = {
            "sec": time.time() - t0,
            "n_triples": int(sum(r["output_rows"] for r in counts_rows)),
        }
        return out

    def run(self, resume: bool = False) -> DataFrame:
        emb = self.build_embeddings(resume=resume)
        out = self.build_triples(emb)
        self._join_bg()  # surface background write/lineage failures
        return out
