"""SparkSession factory tuned for the validation workload.

Local defaults mirror what the job would ship with via
``spark-submit --py-files engine.zip jobs/validate.py`` on a real
cluster; on a cluster the master / memory settings come from
spark-submit and only the SQL confs below matter.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sgb-data-validator-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with validation-friendly confs.

    * AQE on: runtime coalescing of shuffle partitions + skew-join
      splitting for the referential joins.
    * Arrow on: all pandas UDFs transfer via Arrow batches.
    * Session timezone pinned to UTC so timestamps round-trip
      identically against the DuckDB oracle and across clusters.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = os.cpu_count() if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # parquet scans: bigger row-group batches for the wide stats pass
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # keep partition dir columns (part=YYYY-MM-DD) as strings so the
        # canonical violations/ledger schemas are stable across read paths
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # every distinct plan JIT-compiles its whole-stage-codegen
        # classes; a long session running many plans (the bench runs
        # 60+) can fill the default ~240m code cache, after which the
        # JVM silently disables the JIT compiler and every later query
        # runs interpreted — measured 3-4x tail slowdowns. 512m holds
        # the full query battery with headroom.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTIONS", "-XX:ReservedCodeCacheSize=512m"
            ),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
