"""Schema conformance: the structural half of "schema + constraint
validation" — does an arriving batch's SCHEMA match the declared
contract, before any row is inspected?

Reference analog: the Pydantic model boundary (models.py:49-197 —
missing required alias / wrong type raises per-field) plus the
`extra: "allow"` permissiveness knob. On Spark the table schema is
metadata, so this check is a pure driver-side diff of StructTypes —
O(columns), ZERO data scanned (a 100 TB table's schema check costs the
same as a 100-row one). Returns violations in the engine's canonical
shape so schema findings flow through the same sinks/verdicts as row
findings.

Checked per column: presence (missing / unexpected), type equality
(with a safe-widening allowance: an actual int feeding a bigint
contract, float feeding double — the cast up loses nothing, and
narrower types arrive routinely from older writers), and nullability
tightening (a nullable actual feeding a non-nullable contract is the
error; the reverse is fine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sgb_data_validator_spark.operators.rules import SEV_ERROR, SEV_WARNING

#: widenings that preserve every value (ok when allow_widening=True)
_SAFE_WIDENINGS = {  # (expected, actual) in DataType.simpleString() spelling:
    # the ACTUAL type casts into the (wider) EXPECTED type losslessly
    ("bigint", "int"),
    ("bigint", "smallint"),
    ("bigint", "tinyint"),
    ("int", "smallint"),
    ("int", "tinyint"),
    ("smallint", "tinyint"),
    ("double", "float"),
    ("timestamp", "date"),
}

#: canonical output shape (mirrors rules.VIOLATION_COLS semantics:
#: conv_id/turn_idx are row coordinates — schema findings have none)
SCHEMA_VIOLATION_SCHEMA = (
    "rule_id string, column string, expected string, actual string, severity string"
)


def schema_violations(
    spark: SparkSession,
    actual: T.StructType | DataFrame,
    expected: T.StructType,
    allow_extra: bool = False,
    allow_widening: bool = True,
) -> DataFrame:
    """Diff ``actual`` (a frame or its schema) against the ``expected``
    contract; one row per finding. ``allow_extra`` mirrors the
    reference's ``extra: "allow"``: unexpected columns downgrade to a
    warning instead of an error."""
    if isinstance(actual, DataFrame):
        actual = actual.schema
    act = {f.name: f for f in actual.fields}
    exp = {f.name: f for f in expected.fields}
    rows: list[tuple[str, str, str, str, str]] = []

    for name, ef in exp.items():
        af = act.get(name)
        if af is None:
            rows.append(
                ("schema.missing_column", name, ef.dataType.simpleString(), "<absent>", SEV_ERROR)
            )
            continue
        et, at = ef.dataType.simpleString(), af.dataType.simpleString()
        if et != at:
            widening_ok = allow_widening and (et, at) in _SAFE_WIDENINGS
            rows.append(
                (
                    "schema.type_mismatch",
                    name,
                    et,
                    at,
                    SEV_WARNING if widening_ok else SEV_ERROR,
                )
            )
        if af.nullable and not ef.nullable:
            rows.append(
                ("schema.nullability", name, "NOT NULL", "nullable", SEV_ERROR)
            )
    for name in act:
        if name not in exp:
            rows.append(
                (
                    "schema.unexpected_column",
                    name,
                    "<absent>",
                    act[name].dataType.simpleString(),
                    SEV_WARNING if allow_extra else SEV_ERROR,
                )
            )
    return spark.createDataFrame(rows, SCHEMA_VIOLATION_SCHEMA)


def assert_schema(
    spark: SparkSession,
    actual: T.StructType | DataFrame,
    expected: T.StructType,
    **kw,
) -> None:
    """Raise with the full finding list when the contract is violated
    at error severity — the fail-fast form for job entry points."""
    bad = [
        r
        for r in schema_violations(spark, actual, expected, **kw).collect()
        if r.severity == SEV_ERROR
    ]
    if bad:
        lines = "\n".join(
            f"  {r.rule_id}: {r.column} expected={r.expected} actual={r.actual}"
            for r in bad
        )
        raise ValueError(f"schema contract violated:\n{lines}")
