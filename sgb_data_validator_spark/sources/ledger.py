"""Per-partition resume ledger.

Reference analog: the offline workflow's on-disk stage manifests
(download_metadata.json / transformation_metadata.json,
/root/reference/src/api.py:1079-1092,1259-1275) — resumability via
checkpoints. Here the checkpoint is a small table:

  (part, status, error_count, warning_count, stats_digest, lineage,
   rows, elapsed_sec, rows_per_sec, run_id, run_ts)

Semantics:
* ``record()`` appends one row per validated partition (append-only —
  idempotent under retries; readers take the latest run per partition).
* ``pending_partitions()`` = all partitions of the fact minus the
  partitions whose LATEST ledger row is PASSED — re-submission skips
  validated partitions (north rule resumability).

Storage is a parquet directory in this sandbox. On a real deployment
this is an Iceberg table and ``record`` is an overwrite-by-partition
commit under snapshot isolation; the read path (latest-row-wins by
run_ts) is identical.

Concurrent writers: two runs validating the same partition both append
(append-only — no lost update); readers resolve the winner by
(run_ts desc, run_id desc), so an exact run_ts tie — true concurrency —
breaks deterministically on the larger run_id rather than
nondeterministically on file listing order. This mirrors the Iceberg
deployment, where the two commits serialize under optimistic
concurrency and the later snapshot wins. Pinned by
tests/test_pipeline_e2e.py::test_ledger_concurrent_writers_latest_wins.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LEDGER_SCHEMA = (
    "part string, status string, error_count long, warning_count long, "
    "stats_digest string, lineage string, rows long, elapsed_sec double, "
    "rows_per_sec double, run_id string, run_ts timestamp"
)


class Ledger:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], LEDGER_SCHEMA)

    def latest(self) -> DataFrame:
        w = Window.partitionBy("part").orderBy(F.desc("run_ts"), F.desc("run_id"))
        return (
            self.read()
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def pending_partitions(self, fact_parts: DataFrame) -> DataFrame:
        """Partitions still needing validation (not PASSED in latest run)."""
        done = self.latest().where(F.col("status") == "PASSED").select("part")
        return fact_parts.select("part").distinct().join(done, "part", "left_anti")

    def record(
        self,
        verdicts: DataFrame,
        digests: DataFrame,
        part_rows: DataFrame,
        elapsed_sec: float,
        lineage: str,
        run_id: str | None = None,
    ) -> str:
        """Append one ledger row per partition from this run's outputs.

        ``part_rows``: (part, rows) row counts per partition;
        ``digests``: (part, stats_digest).
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        now = time.time()
        entry = (
            verdicts.join(digests, "part", "left")
            .join(part_rows, "part", "left")
            .select(
                "part",
                "status",
                F.col("error_count").cast("long"),
                F.col("warning_count").cast("long"),
                "stats_digest",
                F.lit(lineage).alias("lineage"),
                F.coalesce(F.col("rows"), F.lit(0)).cast("long").alias("rows"),
                F.lit(float(elapsed_sec)).alias("elapsed_sec"),
                (F.coalesce(F.col("rows"), F.lit(0)) / F.lit(max(elapsed_sec, 1e-9))).alias(
                    "rows_per_sec"
                ),
                F.lit(run_id).alias("run_id"),
                F.timestamp_seconds(F.lit(now)).alias("run_ts"),
            )
        )
        entry.write.mode("append").parquet(self.path)
        return run_id


SKETCH_SCHEMA = (
    "part string, column string, rows long, sketch binary, "
    "run_id string, run_ts timestamp"
)


class SketchStore:
    """Sidecar store of per-(partition, column) MERGEABLE HyperLogLog
    sketches next to the ledger (same append-only / latest-row-wins
    semantics): the piece that makes DISTINCT COUNTS resumable, not
    just verdicts. approx_count_distinct stores a number per
    partition; numbers don't union, so "how many distinct conv_ids
    across ALL validated partitions" would rescan every partition ever
    validated. A stored DataSketches sketch unions in O(2^lg_k) bytes
    — re-submission sketches only the pending partitions
    (operators/stats.py:hll_partition_sketches) and the global answer
    is a union over the O(parts × columns) sketch frame, never the
    fact. On a real deployment this is an Iceberg table like the
    ledger; the union query is engine-side either way."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(SKETCH_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], SKETCH_SCHEMA)

    def record(self, sketches: DataFrame, run_id: str | None = None) -> str:
        """Append this run's (part, column, rows, sketch) frame."""
        run_id = run_id or uuid.uuid4().hex[:12]
        now = time.time()
        (
            sketches.select(
                "part",
                "column",
                F.col("rows").cast("long"),
                "sketch",
                F.lit(run_id).alias("run_id"),
                F.timestamp_seconds(F.lit(now)).alias("run_ts"),
            ).write.mode("append").parquet(self.path)
        )
        return run_id

    def latest(self) -> DataFrame:
        """Latest sketch per (part, column) — same winner rule as the
        ledger (run_ts desc, run_id desc) so retries and concurrent
        writers resolve identically in both stores."""
        w = Window.partitionBy("part", "column").orderBy(
            F.desc("run_ts"), F.desc("run_id")
        )
        return (
            self.read()
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def global_distinct(self) -> DataFrame:
        """(column, distinct_estimate) across every partition ever
        sketched — a union over the tiny sketch frame; no partition's
        data is re-read."""
        from sgb_data_validator_spark.operators.stats import hll_global_estimates

        return hll_global_estimates(self.latest())
