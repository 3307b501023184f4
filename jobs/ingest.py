"""spark-submit entry point for ingest-time layout: landing files →
partitioned, bucketed, validated warehouse tables.

    spark-submit --py-files engine.zip jobs/ingest.py \
        --landing /data/landing/turns \
        --table turns_curated \
        --path /warehouse/turns \
        [--buckets 64] [--check-schema] [--table-format parquet]

Why this job exists (the 100 TB argument): every validation run joins
turns against the conversation manifest and re-aggregates per
conversation. Paying the conv_id shuffle ONCE here — day-partitioned
for pruning, conv_id-bucketed for exchange-free joins/aggs (see
sources/bucketed.py) — removes the fact shuffle from every subsequent
run, resume pass and regression diff. The schema contract is enforced
at the door (metadata-only, exit 2) so malformed batches never reach
the warehouse.

Reference analog: none — the reference re-fetches items from the API
per run (validate.py:114-136); this is the Spark-native ingest that
replaces that per-run re-read.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="ingest landing data into the bucketed warehouse layout")
    p.add_argument("--landing", required=True, help="landing dir / table ref of raw turns")
    p.add_argument("--table", required=True, help="warehouse table name to register")
    p.add_argument("--path", required=True, help="external location for the table files")
    p.add_argument("--buckets", type=int, default=64, help="bucket count on conv_id (size for ~200MB/bucket at full scale)")
    p.add_argument("--check-schema", action="store_true", help="fail fast (exit 2) on schema-contract violations")
    p.add_argument("--table-format", choices=["parquet", "iceberg", "table"], default=None)
    return p.parse_args(argv)


def run(spark: SparkSession, args: argparse.Namespace) -> int:
    from sgb_data_validator_spark.sources.bucketed import write_bucketed
    from sgb_data_validator_spark.sources.catalog import read_table

    turns = read_table(spark, args.landing, args.table_format)
    # derive the day partition from ts when the landing data lacks it —
    # BEFORE the schema gate, which checks the full contract incl. part
    if "part" not in turns.columns and "ts" in turns.columns:
        turns = turns.withColumn("part", F.date_format("ts", "yyyy-MM-dd"))
    if args.check_schema:
        from pyspark.sql.types import StructType

        from sgb_data_validator_spark.operators.schema_check import assert_schema
        from sgb_data_validator_spark.streaming.incremental import TURN_SCHEMA

        try:
            assert_schema(spark, turns, StructType.fromDDL(TURN_SCHEMA))
        except ValueError as exc:
            print(exc, file=sys.stderr)
            return 2

    write_bucketed(
        turns,
        args.table,
        args.path,
        bucket_cols=["conv_id"],
        n_buckets=args.buckets,
        sort_cols=["conv_id", "turn_idx"],
        partition_cols=["part"],
    )
    n_parts = spark.table(args.table).select("part").distinct().count()
    print(f"ingested {args.table} at {args.path}: {args.buckets} buckets, {n_parts} day partitions")
    return 0


def main() -> None:
    args = parse_args(sys.argv[1:])
    from sgb_data_validator_spark.session import get_spark

    spark = get_spark(app_name="sgb-ingest")
    try:
        sys.exit(run(spark, args))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
