"""Sequence rules over the stable (conv_id, turn_idx) window ordering.

The reference has no window functions (its records are independent), but
the north star's transcript model adds two natural sequence invariants,
both expressed with a single window pass:

* ts monotonicity  — ``ts`` must be non-decreasing along ``turn_idx``
  within a conversation (lag compare).
* turn contiguity  — ``turn_idx`` must be dense 0..n-1 (lag diff == 1,
  first == 0) — SURVEY.md §2.5 W3.

Scale note: both rules share ONE window spec
``partitionBy(conv_id).orderBy(turn_idx)`` so Catalyst computes a single
shuffle+sort and evaluates both lags in the same Window physical node.
The hot conversation makes this window skewed; at 10^12 scale the
contiguity/monotonicity pass is the one operator that genuinely needs
the full per-conversation sequence, so the skew is inherent — mitigate
by running it on the projection (conv_id, turn_idx, ts) only (three
columns through the shuffle, not the text payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.rules import SEV_WARNING


def sequence_violations(
    turns: DataFrame,
    check_monotonic_ts: bool = True,
    check_contiguity: bool = True,
    severity: str = SEV_WARNING,
) -> DataFrame:
    """Both sequence rules in one window pass over a 4-column projection."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    slim = turns.select("conv_id", "turn_idx", "ts", "part").withColumn(
        "_prev_ts", F.lag("ts").over(w)
    ).withColumn("_prev_idx", F.lag("turn_idx").over(w))

    slots = []
    if check_monotonic_ts:
        slots.append(
            F.when(
                F.col("_prev_ts").isNotNull() & (F.col("ts") < F.col("_prev_ts")),
                F.struct(
                    F.lit("ts.monotonicity").alias("rule_id"),
                    F.lit("ts").alias("column"),
                    F.col("ts").cast("string").alias("offending_value"),
                ),
            )
        )
    if check_contiguity:
        gap = (
            (F.col("_prev_idx").isNull() & (F.col("turn_idx") != 0))
            | (F.col("_prev_idx").isNotNull() & (F.col("turn_idx") - F.col("_prev_idx") > 1))
        )
        slots.append(
            F.when(
                gap,
                F.struct(
                    F.lit("turn.contiguity").alias("rule_id"),
                    F.lit("turn_idx").alias("column"),
                    F.col("turn_idx").cast("string").alias("offending_value"),
                ),
            )
        )
    exploded = slim.select(
        "conv_id",
        "turn_idx",
        F.col("part").cast("string").alias("part"),
        F.explode(F.array_compact(F.array(*slots))).alias("_v"),
    )
    return exploded.select(
        F.col("_v.rule_id").alias("rule_id"),
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("_v.column").alias("column"),
        F.col("_v.offending_value").alias("offending_value"),
        F.lit(severity).alias("severity"),
        "part",
    )
