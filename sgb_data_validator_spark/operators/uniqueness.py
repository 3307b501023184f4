"""Uniqueness check on composite keys with explicit skew handling.

Reference semantics: duplicate-identifier check
(/root/reference/validate.py:658-684, accumulation :694-699) — every
identifier seen more than once yields one error **per duplicate member**
listing the group; we preserve the per-member fan-out and put the group
size in the offending value.

Scale design (north rule: "salted repartition-and-count"): the key is
``(conv_id, turn_idx)`` over a Zipf-hot ``conv_id``. AQE's skew handling
applies to joins, NOT aggregations, so skew is absorbed explicitly with
a TWO-STAGE count:

  stage 1  groupBy(key..., salt) partial counts   — salt spreads any
           hot key's rows across the shuffle, bounding the biggest
           reduce task; ``spark_partition_id()`` is a free,
           deterministic-enough salt (any row distribution yields the
           same final counts).
  stage 2  groupBy(key...) sum of partials        — at most
           n_salts rows per key survive stage 1, so stage 2 is tiny.

Emitting per-member rows then needs the duplicate keys joined back to
the fact; duplicate keys are rare by construction, so that join is a
broadcast of the dup-key set — no second shuffle of the fact table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.rules import SEV_ERROR


def duplicate_key_counts(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keys appearing >1 time, with their multiplicities. Salted two-stage."""
    partial = df.groupBy(*keys, F.spark_partition_id().alias("_salt")).agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_partial").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def uniqueness_violations(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    rule_id: str = "unique.turn",
    severity: str = SEV_ERROR,
    part_col: str | None = "part",
) -> DataFrame:
    """One violation per duplicate member (reference fan-out semantics)."""
    dups = duplicate_key_counts(df, keys)
    keys = list(keys)
    part = (F.col(part_col) if part_col else F.lit(None)).cast("string")
    members = df.join(F.broadcast(dups), on=keys, how="inner")
    return members.select(
        F.lit(rule_id).alias("rule_id"),
        F.col(keys[0]).cast("string").alias("conv_id"),
        (F.col(keys[1]).cast("int") if len(keys) > 1 else F.lit(None).cast("int")).alias("turn_idx"),
        F.lit(",".join(keys)).alias("column"),
        F.concat(F.lit("duplicate x"), F.col("dup_count").cast("string")).alias("offending_value"),
        F.lit(severity).alias("severity"),
        part.alias("part"),
    )
