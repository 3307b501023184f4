from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.referential import (
    orphan_violations,
    zero_children_violations,
)
from sgb_data_validator_spark.operators.uniqueness import (
    duplicate_key_counts,
    uniqueness_violations,
)


def test_duplicate_members_fanout(spark):
    # reference emits one error PER duplicate member (validate.py:658-684)
    df = spark.createDataFrame(
        [("c1", 0), ("c1", 0), ("c1", 0), ("c1", 1), ("c2", 0), ("c2", 0)],
        "conv_id string, turn_idx int",
    )
    v = uniqueness_violations(df, part_col=None).collect()
    assert len(v) == 5  # 3 members of (c1,0) + 2 members of (c2,0)
    vals = {(r.conv_id, r.turn_idx): r.offending_value for r in v}
    assert vals[("c1", 0)] == "duplicate x3"
    assert vals[("c2", 0)] == "duplicate x2"
    assert all(r.rule_id == "unique.turn" and r.severity == "error" for r in v)


def test_duplicate_counts_salted_two_stage(spark):
    df = spark.createDataFrame(
        [("h", i % 3) for i in range(30)], "conv_id string, turn_idx int"
    ).repartition(4)
    got = {(r.conv_id, r.turn_idx): r.dup_count for r in duplicate_key_counts(df, ["conv_id", "turn_idx"]).collect()}
    assert got == {("h", 0): 10, ("h", 1): 10, ("h", 2): 10}
    # explicit-salt variant (for no-combine aggs) gives identical counts
    # through the manual two-stage plan
    salted = duplicate_key_counts(df, ["conv_id", "turn_idx"], explicit_salt=True)
    assert {(r.conv_id, r.turn_idx): r.dup_count for r in salted.collect()} == got
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("aggregate") >= 2
    assert "SPARK_PARTITION_ID" in plan or "spark_partition_id" in plan


def test_orphans_and_zero_children(spark):
    turns = spark.createDataFrame(
        [("c1", 0, "s"), ("c1", 1, "s"), ("ghost", 0, "s")],
        "conv_id string, turn_idx int, text string",
    )
    convs = spark.createDataFrame([("c1",), ("c2",)], "conv_id string")
    orphans = orphan_violations(turns, convs, "conv_id", "conv_id", "ref.conv_id",
                                part_col=None).collect()
    assert [(r.conv_id, r.turn_idx, r.offending_value) for r in orphans] == [("ghost", 0, "ghost")]

    empty = zero_children_violations(convs, turns, "conv_id", "conv_id").collect()
    assert [(r.rule_id, r.conv_id, r.severity) for r in empty] == [
        ("empty.conversation", "c2", "warning")
    ]


def test_orphan_join_is_broadcast(spark):
    turns = spark.createDataFrame([("c1", 0, "x")], "conv_id string, turn_idx int, text string")
    convs = spark.createDataFrame([("c1",)], "conv_id string")
    plan = orphan_violations(turns, convs, "conv_id", "conv_id", "r",
                             part_col=None)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_tool_check_ignores_nulls(spark):
    turns = spark.createDataFrame(
        [("c1", 0, None), ("c1", 1, "search"), ("c1", 2, "shell")],
        "conv_id string, turn_idx int, tool string",
    )
    tools = spark.createDataFrame([("search",)], "tool string")
    got = orphan_violations(turns, tools, "tool", "tool", "ref.tool", part_col=None).collect()
    assert [(r.turn_idx, r.offending_value) for r in got] == [(2, "shell")]
