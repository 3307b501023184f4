"""spark-submit entry point for a validation run.

    spark-submit --py-files engine.zip jobs/validate.py \
        --turns  /data/turns \
        --conversations /data/conversations \
        --allowed-tools /data/allowed_tools \
        --baseline-stats /data/baseline_stats \
        --out    /data/reports/run1 \
        --ledger /data/ledger \
        [--resume] [--parts 2026-01-05,2026-01-06]

Package with: ``cd repo && zip -r engine.zip sgb_data_validator_spark``.

Behavior (mirrors the reference CLI contract, validate.py:1051-1192):
* validates the selected partitions (all, explicit --parts, or the
  ledger's pending set with --resume),
* writes violations/verdicts/summary/pivot/stats under --out,
* appends one ledger row per partition (status, stats digest, lineage,
  rows/sec),
* exits 1 iff any error-severity violation exists (reference exit-code
  contract, validate.py:1191-1192).
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="transcript validation run")
    p.add_argument("--turns", required=True)
    p.add_argument("--conversations")
    p.add_argument("--allowed-tools")
    p.add_argument("--baseline-stats")
    p.add_argument("--out", required=True)
    p.add_argument("--ledger")
    p.add_argument("--resume", action="store_true", help="skip partitions PASSED in the ledger")
    p.add_argument("--parts", help="comma-separated explicit partition list")
    p.add_argument("--lineage", default="jobs/validate.py")
    return p.parse_args(argv)


def run(spark: SparkSession, args: argparse.Namespace) -> int:
    from sgb_data_validator_spark.operators.stats import stats_digest
    from sgb_data_validator_spark.plans.pipeline import TranscriptTables, validate
    from sgb_data_validator_spark.sources import sinks
    from sgb_data_validator_spark.sources.ledger import Ledger

    turns = spark.read.parquet(args.turns)
    if args.parts:
        turns = turns.where(F.col("part").isin(args.parts.split(",")))
    ledger = Ledger(spark, args.ledger) if args.ledger else None
    if args.resume and ledger is not None:
        pending = [r.part for r in ledger.pending_partitions(turns.select("part")).collect()]
        if not pending:
            print("nothing pending — all partitions PASSED in ledger")
            return 0
        turns = turns.where(F.col("part").isin(pending))

    t = TranscriptTables(
        turns=turns,
        conversations=spark.read.parquet(args.conversations) if args.conversations else None,
        allowed_tools=spark.read.parquet(args.allowed_tools) if args.allowed_tools else None,
        baseline_stats=spark.read.parquet(args.baseline_stats) if args.baseline_stats else None,
    )
    t0 = time.perf_counter()
    result = validate(t)
    sinks.write_all(result, args.out)
    elapsed = time.perf_counter() - t0

    if ledger is not None:
        part_rows = turns.groupBy(F.col("part").cast("string").alias("part")).agg(
            F.count(F.lit(1)).alias("rows")
        )
        ledger.record(
            result.verdicts, stats_digest(result.stats), part_rows, elapsed, args.lineage
        )

    for row in result.verdicts.orderBy("part").collect():
        print(f"{row.part}\t{row.status}\terrors={row.error_count}\twarnings={row.warning_count}")
    return 0 if result.passed else 1


def main() -> None:
    args = parse_args(sys.argv[1:])
    from sgb_data_validator_spark.session import get_spark

    spark = get_spark(app_name="sgb-validate")
    try:
        sys.exit(run(spark, args))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
