"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship: full transcript-validation pipeline over a
              turns view derived from the events table at sf0.001.
``queries`` — one entry per implemented operator (SURVEY.md §2),
              each over the driver testdata at sf_dir.
``oracle_sql`` — DuckDB twins for everything SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _utc(spark: SparkSession) -> SparkSession:
    """Timestamps are instants; every date_format/hour expression must
    render them in UTC to match the DuckDB oracle (which formats the
    stored micros as-is). The harness may hand us a session with a
    local timezone — pin it per call (runtime-settable conf)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: project sf0.001 events into the transcript shape
    (conv_id, turn_idx, role, text, tool, ts, part) and run the full
    validation pipeline — violations DataFrame out. Same plan as the
    oracle-checked ``transcript_pipeline`` query."""
    from sgb_data_validator_spark.plans.transform_queries import q_transcript_pipeline

    return q_transcript_pipeline(_utc(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sgb_data_validator_spark.plans.driver_queries import QUERIES

    def wrap(fn):
        return lambda spark, sf_dir: fn(_utc(spark), sf_dir)

    return {name: wrap(fn) for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from sgb_data_validator_spark.plans.driver_queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
