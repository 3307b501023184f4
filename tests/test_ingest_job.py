"""Ingest job (jobs/ingest.py): landing → partitioned+bucketed
warehouse layout, schema gate at the door, pruning + co-location
verified on the produced table."""

import pytest
from pyspark.sql import functions as F

from jobs.ingest import parse_args, run


@pytest.fixture()
def landing(spark, tmp_path):
    d = str(tmp_path / "landing")
    spark.range(2000).select(
        (F.col("id") % 100).cast("string").alias("conv_id"),
        (F.col("id") / 100).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.lit("2026-01-05").cast("timestamp") + (F.col("id") % 3).cast("int") * F.expr("INTERVAL 1 DAY")).alias("ts"),
    ).write.parquet(d)
    return d


def test_ingest_layout_and_pruning(spark, tmp_path, landing):
    args = parse_args(
        ["--landing", landing, "--table", "t_ingest", "--path", str(tmp_path / "wh"), "--buckets", "4", "--check-schema"]
    )
    try:
        assert run(spark, args) == 0
        t = spark.table("t_ingest")
        assert t.count() == 2000
        # part derived from ts and usable for pruning
        plan = (
            t.where(F.col("part") == "2026-01-05")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters: [isnotnull(part" in plan
        # conv-level agg rides the bucket layout: no exchange
        agg_plan = (
            t.groupBy("conv_id").count()._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in agg_plan, agg_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ingest")


def test_ingest_schema_gate_rejects(spark, tmp_path):
    d = str(tmp_path / "bad_landing")
    spark.range(10).select(
        F.col("id").cast("string").alias("conv_id"),
        # turn_idx missing entirely; ts wrong type
        F.lit("x").alias("ts"),
    ).write.parquet(d)
    args = parse_args(
        ["--landing", d, "--table", "t_bad", "--path", str(tmp_path / "whb"), "--check-schema"]
    )
    assert run(spark, args) == 2
    assert "t_bad" not in [t.name for t in spark.catalog.listTables()]
