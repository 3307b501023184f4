"""Mergeable HLL sketch store: per-partition sketches union to the
whole-table answer without rescanning validated partitions — the
resumable-distinct-count contract (north star: distinct-count via
HyperLogLog sketches, resumable from a checkpointed per-partition
ledger)."""

from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.stats import (
    hll_global_estimates,
    hll_partition_sketches,
)
from sgb_data_validator_spark.sources.ledger import SketchStore


def _frame(spark, parts):
    rows = [
        (p, f"c{i % mod}", f"t{i % 7}")
        for p, (n, mod) in parts.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "part string, conv_id string, tool string")


def test_partition_sketches_union_equals_whole_table(spark):
    """Union-of-per-partition-sketches == one sketch over the whole
    table (sketch merge is exact, not approximate-on-approximate):
    identical estimates, column by column."""
    df = _frame(spark, {"d1": (500, 40), "d2": (300, 25), "d3": (200, 60)})
    sk = hll_partition_sketches(df, ["conv_id", "tool"])
    got = {
        r.column: r.distinct_estimate for r in hll_global_estimates(sk).collect()
    }
    whole = {
        r.column: r.d
        for r in df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg(F.col("conv_id"), F.lit(12))).alias("d")
        ).selectExpr("'conv_id' as column", "d")
        .unionByName(
            df.agg(
                F.hll_sketch_estimate(F.hll_sketch_agg(F.col("tool"), F.lit(12))).alias("d")
            ).selectExpr("'tool' as column", "d")
        )
        .collect()
    }
    assert got == whole
    # at this cardinality (60 distinct, lg_k=12) HLL is exact
    assert got["conv_id"] == 60 and got["tool"] == 7


def test_sketch_store_resume_skips_validated_partitions(spark, tmp_path):
    """Run 1 sketches d1+d2; run 2 sketches ONLY d3 (the pending
    partition). global_distinct over the store equals the whole-table
    distinct — d1/d2 data was never re-read in run 2."""
    store = SketchStore(spark, str(tmp_path / "sketches"))
    df = _frame(spark, {"d1": (500, 40), "d2": (300, 25), "d3": (200, 60)})
    store.record(hll_partition_sketches(df.where(F.col("part") != "d3"), ["conv_id"]))
    store.record(hll_partition_sketches(df.where(F.col("part") == "d3"), ["conv_id"]))
    got = store.global_distinct().collect()
    assert got[0].column == "conv_id" and got[0].distinct_estimate == 60
    # three partitions, one latest sketch each
    assert store.latest().count() == 3


def test_sketch_store_latest_wins_on_revalidation(spark, tmp_path):
    """Re-validating a partition replaces its sketch (latest-row-wins,
    same rule as the ledger): after d1 shrinks to 5 distinct ids, the
    global estimate reflects the NEW d1, not the old one."""
    store = SketchStore(spark, str(tmp_path / "sketches"))
    big = _frame(spark, {"d1": (500, 40)})
    small = _frame(spark, {"d1": (50, 5)})
    store.record(hll_partition_sketches(big, ["conv_id"]), run_id="aaa")
    store.record(hll_partition_sketches(small, ["conv_id"]), run_id="bbb")
    got = store.global_distinct().collect()
    assert got[0].distinct_estimate == 5
