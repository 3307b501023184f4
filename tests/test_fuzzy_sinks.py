"""Tests for fuzzy matching, hierarchical membership, and report sinks."""

import glob

from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.fuzzy import (
    fuzzy_best_match,
    hierarchical_membership_violations,
    levenshtein_similarity,
)
from sgb_data_validator_spark.plans.pipeline import TranscriptTables, validate
from sgb_data_validator_spark.sources import sinks
from sgb_data_validator_spark.sources.generator import (
    FixtureConfig,
    generate_allowed_tools,
    generate_conversations,
    generate_turns,
)


def test_levenshtein_similarity_exact_values(spark):
    df = spark.createDataFrame([("kitten", "sitting"), ("abc", "abc"), ("", "xy")], "a string, b string")
    got = [r.s for r in df.select(levenshtein_similarity(F.col("a"), F.col("b")).alias("s")).collect()]
    # dist(kitten,sitting)=3, maxlen 7 → 10000 - floor(30000/7) = 10000-4285
    assert got == [5715, 10000, 0]


def test_fuzzy_best_match_top1_and_threshold(spark):
    fact = spark.createDataFrame(
        [(1, "Geschichte Basels"), (2, "zzzz qqqq")], "id long, label string"
    )
    dim = spark.createDataFrame(
        [("d1", "geschichte basel"), ("d2", "geschichte bern")], "k string, t string"
    )
    out = fuzzy_best_match(fact, dim, "id", "label", "k", "t", threshold_bp=6000).collect()
    assert [(r.fact_key, r.dim_key) for r in out] == [(1, "d1")]  # d1 wins, fact 2 below threshold


def test_hierarchical_membership(spark):
    df = spark.createDataFrame(
        [(1, "src14"), (2, "src3"), (3, "src2"), (4, None)], "doc_id long, code string"
    )
    out = hierarchical_membership_violations(df, "doc_id", "code", ["src1", "src2"])
    assert [r.doc_id for r in out.collect()] == ["2"]  # src14→prefix src1 ok; src3 bad; null skipped


def test_sinks_roundtrip(spark, tmp_path):
    cfg = FixtureConfig(n_turns=800)
    t = TranscriptTables(
        turns=generate_turns(spark, cfg),
        conversations=generate_conversations(spark, cfg),
        allowed_tools=generate_allowed_tools(spark),
    )
    res = validate(t)
    base = str(tmp_path / "report")
    sinks.write_all(res, base)
    # violations round-trip with part partitioning intact
    v = spark.read.parquet(f"{base}/violations")
    assert v.count() == res.violations.count()
    assert "part" in v.columns and dict(v.dtypes)["part"] == "string"
    # verdicts + stats readable
    assert spark.read.parquet(f"{base}/verdicts").count() == res.verdicts.count()
    assert spark.read.parquet(f"{base}/stats").count() == res.stats.count()
    # CSVs exist with a header row
    for sub in ("summary_csv", "pivot_csv"):
        files = glob.glob(f"{base}/{sub}/part-*.csv")
        assert files, sub
        assert open(files[0]).readline().strip()
