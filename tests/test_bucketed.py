"""Bucketed-layout audit: a turns ⋈ manifest join between tables
bucketed on conv_id must plan ZERO exchanges (and, with in-bucket
sortBy, zero extra Sorts) — the one-shuffle-at-ingest contract that
amortizes the fact shuffle across every later validation run."""

import pytest
from pyspark.sql import functions as F

from sgb_data_validator_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the test exercises the bucketed path
    (tiny fixtures would otherwise broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, tmp_path, no_broadcast):
    turns = spark.range(1000).select(
        (F.col("id") % 100).cast("string").alias("conv_id"),
        (F.col("id") / 100).cast("int").alias("turn_idx"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    manifest = spark.range(100).select(
        F.col("id").cast("string").alias("conv_id"),
        F.lit("batch0").alias("ingest_batch"),
    )
    write_bucketed(turns, "t_turns_b", str(tmp_path / "turns"), ["conv_id"], 4)
    write_bucketed(manifest, "t_manifest_b", str(tmp_path / "manifest"), ["conv_id"], 4)
    try:
        t = read_bucketed(spark, "t_turns_b")
        m = read_bucketed(spark, "t_manifest_b")
        joined = t.join(m, "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # with the scan-ordering conf on (see bucketed.py: Spark ≥3.0
        # hides sortBy metadata behind it, SPARK-28595), the in-bucket
        # sortBy satisfies the join ordering too: no Sort at all
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        try:
            plan2 = t.join(m, "conv_id")._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan2 and "Sort [" not in plan2, plan2
        finally:
            spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
        # correctness: every turn matched
        assert joined.count() == 1000
        # and the result is usable downstream without re-shuffle on the
        # same key: a conv-level agg rides the bucket partitioning too
        agg_plan = (
            t.groupBy("conv_id").count()._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in agg_plan, agg_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_turns_b")
        spark.sql("DROP TABLE IF EXISTS t_manifest_b")


def test_plain_parquet_reread_loses_bucketing(spark, tmp_path, no_broadcast):
    """The failure mode read_bucketed guards against: path-reading the
    same files drops bucket metadata and the join shuffles again."""
    df = spark.range(100).select(
        F.col("id").cast("string").alias("conv_id"), F.lit(1).alias("v")
    )
    write_bucketed(df, "t_a_b", str(tmp_path / "a"), ["conv_id"], 4)
    write_bucketed(df, "t_b_b", str(tmp_path / "b"), ["conv_id"], 4)
    try:
        a = spark.read.parquet(str(tmp_path / "a"))
        b = spark.read.parquet(str(tmp_path / "b"))
        plan = a.join(b, "conv_id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan  # bucketing silently lost
    finally:
        spark.sql("DROP TABLE IF EXISTS t_a_b")
        spark.sql("DROP TABLE IF EXISTS t_b_b")
