"""Measured resume-efficiency evidence for the north rule's checkpoint
clause ("resumable from a checkpointed per-partition ledger so
re-submission skips validated partitions").

The e2e tests (tests/test_pipeline_e2e.py) prove resume CORRECTNESS —
pending-set semantics, latest-row-wins, idempotent re-commit. This tool
measures the thing the clause is FOR: that a resumed run's cost scales
with the PENDING data, not the table size.

Protocol (one JVM, ledger state on disk exactly as across separate
spark-submit invocations — the resume contract lives entirely in the
parquet ledger, not in session state):

  1. Generate a clean 18-day fixture once (deterministic FIXTURES.md
     generator, ``dirt=False`` so every partition PASSES — resume skips
     PASSED partitions only; FAILED partitions are re-validated by
     design, which is semantics, not a skip demo), day-partitioned
     parquet. Hold out the last ``HOLDOUT`` day-partitions.
  2. run1 (cold): jobs/validate.run() over the first 16 partitions with
     a ledger → every partition recorded PASSED.  Wall = T1.
  3. Move the held-out partitions into the live table (the daily-ingest
     event: new data landed, old data untouched).
  4. run2 (resume): same CLI args + ``--resume`` → the ledger's pending
     set is exactly the new partitions; only they are scanned. Wall = T2.
  5. run3 (control): full re-validation of all 18 partitions WITHOUT
     the ledger — what re-submission would cost if the checkpoint did
     not exist.  Wall = T3.

Headline: T2 vs T3 (resume vs no-checkpoint re-run of the same
post-ingest table) and rows2/rows3 (the pending share). Resume is
working iff T2/T3 tracks rows2/rows3 plus a small fixed cost, i.e.
``resume_speedup = T3/T2`` is close to ``rows3/rows2``.

Arms deliberately exclude ``--conversations`` / ``--baseline-stats``:
manifest checks (empty.conversation, orphan joins) are
CONVERSATION-scoped, not partition-scoped — a resumed run re-checks the
whole manifest by design, so including them would mix a
correct-but-constant manifest cost into the per-partition skip signal
(and at 15 dirt-free days the drift checks are no-ops anyway). The
measured job is the per-partition core: fused row rules + salted
uniqueness + sequence rules + per-partition column stats + all report
sinks + ledger/sketch recording.

Also measures the sidecar SketchStore claim: the global distinct count
per column answered by unioning the stored per-partition HLL sketches
(cost independent of fact size) vs rescanning the full fact, plus the
sketch estimates' max relative error against exact countDistinct.

    python tools/resume_bench.py                  # ~20M turns, 18 days
    RESUME_BENCH_TURNS=2000000 python tools/resume_bench.py   # quick

Writes bench/RESUME_BENCH.json and prints one JSON summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TURNS = int(os.environ.get("RESUME_BENCH_TURNS", "20000000"))
DAYS = int(os.environ.get("RESUME_BENCH_DAYS", "18"))
HOLDOUT = int(os.environ.get("RESUME_BENCH_HOLDOUT", "2"))
WORK = os.environ.get(
    "RESUME_BENCH_DIR", os.path.join(REPO, ".bench", f"resume{N_TURNS // 1_000_000}m")
)
OUT = os.environ.get(
    "RESUME_BENCH_OUT", os.path.join(REPO, "bench", "RESUME_BENCH.json")
)


def _setup(spark) -> None:
    from sgb_data_validator_spark.sources.generator import (
        FixtureConfig,
        generate_allowed_tools,
        generate_turns,
    )

    if os.path.exists(os.path.join(WORK, "_meta.json")):
        return
    cfg = FixtureConfig(n_turns=N_TURNS, days=DAYS, dirt=False, n_empty_convs=0)
    t0 = time.perf_counter()
    generate_turns(spark, cfg).write.mode("overwrite").partitionBy("part").parquet(
        f"{WORK}/turns_all"
    )
    generate_allowed_tools(spark).write.mode("overwrite").parquet(f"{WORK}/allowed_tools")
    with open(os.path.join(WORK, "_meta.json"), "w") as fh:
        json.dump({"gen_sec": round(time.perf_counter() - t0, 1)}, fh)
    print(f"# fixture generated in {time.perf_counter() - t0:.0f}s", file=sys.stderr)


def _day_parts(path: str) -> list[str]:
    return sorted(d for d in os.listdir(path) if d.startswith("part="))


def _timed_run(spark, argv: list[str]) -> tuple[float, int]:
    """One validate.run() invocation; returns (wall_sec, exit_code)."""
    from jobs.validate import parse_args, run

    spark.catalog.clearCache()
    args = parse_args(argv)
    t0 = time.perf_counter()
    rc = run(spark, args)
    return time.perf_counter() - t0, rc


def main() -> None:
    from pyspark.sql import functions as F

    from sgb_data_validator_spark.session import get_spark

    spark = get_spark(app_name="resume-bench")
    spark.sparkContext.setLogLevel("ERROR")
    _setup(spark)

    live = os.path.join(WORK, "turns")
    all_parts = _day_parts(os.path.join(WORK, "turns_all"))
    initial, held = all_parts[:-HOLDOUT], all_parts[-HOLDOUT:]

    # fresh live table: first 16 day-partitions (copies, source untouched)
    for d in (live, os.path.join(WORK, "ledger"), os.path.join(WORK, "ledger_sketches")):
        shutil.rmtree(d, ignore_errors=True)
    for run_out in ("out1", "out2", "out3"):
        shutil.rmtree(os.path.join(WORK, run_out), ignore_errors=True)
    os.makedirs(live)
    for p in initial:
        shutil.copytree(os.path.join(WORK, "turns_all", p), os.path.join(live, p))

    base_argv = ["--turns", live, "--allowed-tools", f"{WORK}/allowed_tools"]
    ledger_argv = ["--ledger", f"{WORK}/ledger"]

    # warm the JVM/codegen paths so run1 isn't charged the one-time cost
    # the later arms don't pay (separate spark-submit runs all pay it
    # equally, so excluding it from every arm is the fair comparison)
    spark.read.parquet(live).agg(F.count(F.lit(1))).collect()

    rows1 = spark.read.parquet(live).count()
    t1, rc1 = _timed_run(spark, [*base_argv, "--out", f"{WORK}/out1", *ledger_argv])
    assert rc1 == 0, f"run1 must PASS every partition (clean fixture), rc={rc1}"

    # daily ingest: the held-out partitions land
    for p in held:
        shutil.copytree(os.path.join(WORK, "turns_all", p), os.path.join(live, p))
    rows_all = spark.read.parquet(live).count()
    rows2 = rows_all - rows1

    t2, rc2 = _timed_run(
        spark, [*base_argv, "--out", f"{WORK}/out2", *ledger_argv, "--resume"]
    )
    assert rc2 == 0, f"resume run must PASS the pending partitions, rc={rc2}"

    # ledger says: pending set is now empty
    from sgb_data_validator_spark.sources.ledger import Ledger

    n_pending = (
        Ledger(spark, f"{WORK}/ledger")
        .pending_partitions(spark.read.parquet(live).select("part"))
        .count()
    )

    # control: the same post-ingest table, no checkpoint
    t3, rc3 = _timed_run(spark, [*base_argv, "--out", f"{WORK}/out3"])
    assert rc3 == 0

    # second resumability claim: DISTINCT COUNTS resume too. The runs
    # above stored one mergeable HLL sketch per (partition, column) in
    # the sidecar store; the global distinct answer is a union over
    # that O(parts × columns) frame. Control: the same answer by
    # rescanning the whole fact. At 100 TB the rescan is hours; the
    # union's cost is independent of fact size.
    from sgb_data_validator_spark.sources.ledger import SketchStore

    store = SketchStore(spark, f"{WORK}/ledger_sketches")
    t0 = time.perf_counter()
    sketch_est = {
        r["column"]: r["distinct_estimate"] for r in store.global_distinct().collect()
    }
    t_sketch = time.perf_counter() - t0
    t0 = time.perf_counter()
    exact = (
        spark.read.parquet(live)
        .agg(
            F.countDistinct("conv_id").alias("conv_id"),
            F.countDistinct("role").alias("role"),
            F.countDistinct("tool").alias("tool"),
        )
        .collect()[0]
        .asDict()
    )
    t_rescan = time.perf_counter() - t0
    sketch_err = max(
        abs(sketch_est[c] - exact[c]) / max(exact[c], 1) for c in exact
    )

    summary = {
        "metric": "resume-from-ledger efficiency: wall of a resumed run vs a "
        "no-checkpoint full re-run on the same post-ingest table",
        "rows_initial": rows1,
        "rows_ingested": rows2,
        "rows_total": rows_all,
        "parts_initial": len(initial),
        "parts_ingested": len(held),
        "pending_after_resume": n_pending,
        "wall_run1_cold_sec": round(t1, 2),
        "wall_run2_resume_sec": round(t2, 2),
        "wall_run3_full_sec": round(t3, 2),
        "pending_row_share": round(rows2 / rows_all, 4),
        "resume_wall_share": round(t2 / t3, 4),
        "resume_speedup": round(t3 / t2, 2),
        "global_distinct_from_sketches_sec": round(t_sketch, 3),
        "global_distinct_rescan_sec": round(t_rescan, 2),
        "sketch_estimates": sketch_est,
        "exact_distincts": exact,
        "sketch_max_rel_err": round(sketch_err, 4),
        "loadavg": round(os.getloadavg()[0], 1),
    }
    print(json.dumps(summary))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(summary, fh, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
