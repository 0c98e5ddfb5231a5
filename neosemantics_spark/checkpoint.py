"""Resumable imports: processed-file checkpoint + per-partition lineage.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". The reference gets bounded-loss restartability from
commitSize partial transactions (RDFParserConfig.java:14;
DirectStatementLoader.java:214-245) — a transactional-store concept. The
Spark-native equivalent (SURVEY.md §3.1):

- `processed_files` table: one row per (repo, path, commit, content_sha)
  already ingested. A new run anti-joins the source against it and
  processes ONLY the delta, then appends the new rows. Re-running after a
  crash mid-append is safe: the triples output is overwritten per run_id
  directory and the checkpoint row lands only after the write succeeds.
- `lineage` table: one row per (run_id, repo, path, commit) with triple
  count + parse status — the per-partition commit ledger (the 25k-batch
  analogue; here a "batch" is a source file, the natural retry unit).
- `metrics` table: per-run ImportResults analogue
  (rdf/RDFProcedures.java:383-418).

The sandbox has no Iceberg catalog, so tables are parquet directories with
append semantics; on a real cluster these become `MERGE INTO` Iceberg
tables — the dataflow (anti-join, append-after-write) is identical.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.parse import extract_triples


def _table(spark: SparkSession, path: str) -> Optional[DataFrame]:
    try:
        return spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — table does not exist yet
        return None


@dataclass
class IncrementalResult:
    run_id: str
    new_files: int
    skipped_files: int
    triples: Optional[DataFrame]  # None when nothing new


class ImportCheckpoint:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.processed_path = os.path.join(root, "processed_files")
        self.lineage_path = os.path.join(root, "lineage")
        self.metrics_path = os.path.join(root, "metrics")
        self.triples_root = os.path.join(root, "triples")

    # ---------------------------------------------------------------- read
    def processed(self) -> Optional[DataFrame]:
        return _table(self.spark, self.processed_path)

    def lineage(self) -> Optional[DataFrame]:
        return _table(self.spark, self.lineage_path)

    def metrics(self) -> Optional[DataFrame]:
        return _table(self.spark, self.metrics_path)

    def all_triples(self) -> Optional[DataFrame]:
        return _table(self.spark, self.triples_root)

    # ---------------------------------------------------------------- run
    def run(self, src_files: DataFrame, run_id: Optional[str] = None) -> IncrementalResult:
        """Process only files not yet in the checkpoint; write triples for
        this run under triples/run_id=<id>/, then commit lineage +
        processed rows (write-then-commit ordering = crash safety: a crash
        before the commit leaves the delta unrecorded → next run redoes it
        idempotently, overwriting its own run directory)."""
        run_id = run_id or time.strftime("%Y%m%d%H%M%S")
        src = src_files.withColumn("content_sha", F.sha2("content", 256))
        done = self.processed()
        key = ["repo", "path", "commit", "content_sha"]
        if done is not None:
            todo = src.join(done.select(*key), key, "left_anti")
        else:
            todo = src
        todo = todo.cache()
        n_new = todo.count()
        n_total = src.count()
        if n_new == 0:
            self.spark.createDataFrame(
                [(run_id, 0, n_total, 0, 0)],
                "run_id string, files_processed long, files_skipped long, triples long, parse_errors long",
            ).write.mode("append").parquet(self.metrics_path)
            return IncrementalResult(run_id, 0, n_total, None)
        triples = extract_triples(todo.drop("content_sha"))
        out_dir = os.path.join(self.triples_root, f"run_id={run_id}")
        triples.write.mode("overwrite").parquet(out_dir)
        written = self.spark.read.parquet(out_dir)
        # per-file lineage ledger (the per-partition commit record)
        lineage = (
            written.groupBy("repo", "path", "commit")
            .agg(
                F.count(F.when(F.col("parse_error").isNull(), 1)).alias("n_triples"),
                F.max(F.col("parse_error").isNotNull().cast("int")).alias("had_error"),
            )
            .withColumn("run_id", F.lit(run_id))
        )
        lineage.write.mode("append").parquet(self.lineage_path)
        todo.select(*key).withColumn("run_id", F.lit(run_id)).write.mode("append").parquet(
            self.processed_path
        )
        n_triples = written.filter(F.col("parse_error").isNull()).count()
        n_errors = written.filter(F.col("parse_error").isNotNull()).count()
        self.spark.createDataFrame(
            [(run_id, n_new, n_total - n_new, n_triples, n_errors)],
            "run_id string, files_processed long, files_skipped long, triples long, parse_errors long",
        ).write.mode("append").parquet(self.metrics_path)
        return IncrementalResult(run_id, n_new, n_total - n_new, written)
