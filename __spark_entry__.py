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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: project sf0.001 events into the transcript shape
    (conv_id, turn_idx, role, text, tool, ts, part) and run the full
    validation pipeline — violations DataFrame out."""
    from pyspark.sql import Window

    from sgb_data_validator_spark.plans.pipeline import TranscriptTables, compute_violations

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    turns = ev.select(
        F.concat(F.lit("u"), F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),  # 'error' falls out of the role vocab
        F.col("props").alias("text"),
        F.when(F.col("event_type") == "click", F.lit("browser")).alias("tool"),
        "ts",
    ).withColumn("part", F.date_format("ts", "yyyy-MM-dd"))
    # manifest misses every 7th user ⇒ referential orphans + the transcript
    # role vocab {user,assistant,system,tool} flags all four event types —
    # swap in the event vocab so only 'error' violates
    from sgb_data_validator_spark.operators import rules as R

    convs = turns.select("conv_id").distinct().where(
        F.pmod(F.xxhash64("conv_id"), F.lit(7)) != 0
    )
    tools = spark.createDataFrame([("browser", "Browser")], "tool string, label string")
    t = TranscriptTables(turns=turns, conversations=convs, allowed_tools=tools)
    rules = R.RowRuleSet().add(
        R.not_null("text"),
        R.non_empty("text"),
        R.in_vocabulary("role", ["click", "view", "purchase", "signup"]),
        R.no_url_in_text("text"),
    )
    return compute_violations(t, row_rules=rules)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sgb_data_validator_spark.plans.driver_queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from sgb_data_validator_spark.plans.driver_queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
