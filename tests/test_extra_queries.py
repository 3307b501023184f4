"""Coverage queries beyond the core families: rollup, set-op run diff,
id-mapping migration, IVF ANN, and the availableNow streaming path.
Cross-engine value parity is tools/check_oracle.py's job; these tests
pin the SEMANTICS on tiny in-memory frames."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_rollup_has_subtotals_and_grand_total(spark):
    from sgb_data_validator_spark.plans.extra_queries import q_rollup_summary

    rows = q_rollup_summary(spark, SF).collect()
    by_key = {(r.part, r.event_type): r.n for r in rows}
    total = by_key[("(all)", "(all)")]
    day_subtotals = sum(n for (p, e), n in by_key.items() if e == "(all)" and p != "(all)")
    leaf_sum = sum(n for (p, e), n in by_key.items() if e != "(all)" and p != "(all)")
    assert total == day_subtotals == leaf_sum > 0


def test_run_diff_is_exactly_the_new_rules_violations(spark):
    from sgb_data_validator_spark.plans.extra_queries import (
        _events_as_turns,
        _transcript_rules,
        q_run_diff,
    )

    diff = q_run_diff(spark, SF)
    assert diff.where(F.col("rule_id") != "vocab.role").count() == 0
    expected = (
        _transcript_rules()
        .violations(_events_as_turns(spark, SF))
        .where(F.col("rule_id") == "vocab.role")
        .count()
    )
    assert diff.count() == expected > 0


def test_migrate_idmap_preserves_child_totals(spark):
    from sgb_data_validator_spark.plans.extra_queries import q_migrate_idmap

    out = q_migrate_idmap(spark, SF)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = out.agg(F.sum("n_lines")).collect()[0][0]
    # every lineitem's parent exists in orders, so the re-keyed child
    # count must equal the child table row count
    assert got == li.count()
    # new ids are dense 1..n over the parents that have children
    ids = [r.new_id for r in out.select("new_id").collect()]
    assert min(ids) >= 1 and max(ids) <= spark.read.parquet(f"{SF}/orders.parquet").count()


def test_knn_ivf_finds_injected_twins(spark):
    from sgb_data_validator_spark.plans.extra_queries import q_knn_ivf
    from sgb_data_validator_spark.plans.training_queries import (
        KNN_QUERY_MOD,
        TWIN_MOD,
        TWIN_OFFSET,
    )

    out = q_knn_ivf(spark, SF).collect()
    assert all(r["rank"] <= 5 and r.query_id != r.neighbor_id for r in out)
    # a query that has an injected scaled twin must rank it first with
    # cosine 1.0 — twin and source quantize to the same IVF cell because
    # scaling preserves direction
    top = {r.query_id: r for r in out if r["rank"] == 1}
    twin_queries = [q for q in top if q % TWIN_MOD == 0 and q % KNN_QUERY_MOD == 0 and q < TWIN_OFFSET]
    assert twin_queries
    for q in twin_queries:
        assert top[q].neighbor_id == q + TWIN_OFFSET
        assert abs(top[q].cos - 1.0) < 1e-9


def test_streaming_matches_batch_row_rules(spark):
    from sgb_data_validator_spark.plans.extra_queries import (
        _events_as_turns,
        _transcript_rules,
        q_streaming_row_rules,
    )

    streamed = {r.rule_id: r.n for r in q_streaming_row_rules(spark, SF).collect()}
    batch = {
        r.rule_id: r.n
        for r in _transcript_rules()
        .violations(_events_as_turns(spark, SF))
        .groupBy("rule_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    assert streamed == batch
