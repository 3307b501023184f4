"""Schema-contract diff (operators/schema_check.py): presence, type
equality with safe widening, nullability tightening, extra-column
policy, and the fail-fast asserter."""

import pytest
from pyspark.sql import types as T

from sgb_data_validator_spark.operators.schema_check import (
    assert_schema,
    schema_violations,
)

EXPECTED = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.LongType(), nullable=False),
        T.StructField("text", T.StringType(), nullable=True),
        T.StructField("score", T.DoubleType(), nullable=True),
    ]
)


def _findings(spark, actual, **kw):
    return {
        (r.rule_id, r.column): r
        for r in schema_violations(spark, actual, EXPECTED, **kw).collect()
    }


def test_exact_match_is_clean(spark):
    actual = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    assert schema_violations(spark, actual, EXPECTED).count() == 0
    assert_schema(spark, actual, EXPECTED)  # no raise


def test_missing_and_unexpected(spark):
    actual = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("debug_blob", T.BinaryType(), True),
        ]
    )
    actual2 = T.StructType([f for f in actual.fields if f.name != "score"])
    f = _findings(spark, actual2)
    assert f[("schema.missing_column", "score")].severity == "error"
    assert f[("schema.unexpected_column", "debug_blob")].severity == "error"
    f2 = _findings(spark, actual2, allow_extra=True)
    assert f2[("schema.unexpected_column", "debug_blob")].severity == "warning"


def test_widening_policy(spark):
    actual = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),  # int → bigint
            T.StructField("text", T.StringType(), True),
            T.StructField("score", T.FloatType(), True),  # float → double
        ]
    )
    f = _findings(spark, actual)
    assert f[("schema.type_mismatch", "turn_idx")].severity == "warning"
    assert f[("schema.type_mismatch", "score")].severity == "warning"
    f2 = _findings(spark, actual, allow_widening=False)
    assert f2[("schema.type_mismatch", "turn_idx")].severity == "error"


def test_nullability_tightening(spark):
    actual = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), True),  # nullable → NOT NULL contract
            T.StructField("turn_idx", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    f = _findings(spark, actual)
    assert f[("schema.nullability", "conv_id")].severity == "error"
    with pytest.raises(ValueError, match="schema.nullability"):
        assert_schema(spark, actual, EXPECTED)


def test_accepts_dataframe_and_wrong_type_is_error(spark):
    df = spark.createDataFrame([("a", "not_an_int", "t", 1.0)], ["conv_id", "turn_idx", "text", "score"])
    f = _findings(spark, df)
    assert f[("schema.type_mismatch", "turn_idx")].severity == "error"
