"""Table-reference resolution (sources/catalog.py): parquet paths,
catalog names, the forced-iceberg error contract, and inference."""

import pytest

from sgb_data_validator_spark.sources.catalog import read_table


def test_path_reads_parquet(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(10).write.parquet(p)
    assert read_table(spark, p).count() == 10
    assert read_table(spark, p, fmt="parquet").count() == 10


def test_dotted_name_resolves_via_catalog(spark):
    spark.range(7).createOrReplaceTempView("cat_probe")
    # no slash, not a filesystem path → spark.table
    assert read_table(spark, "cat_probe").count() == 7
    assert read_table(spark, "cat_probe", fmt="table").count() == 7


def test_forced_iceberg_fails_actionably_without_plugin(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_table(spark, "db.turns", fmt="iceberg")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        read_table(spark, "x", fmt="orc2")
