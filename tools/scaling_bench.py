"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion (BASELINE.md §3): run the IDENTICAL validation job on the
IDENTICAL input at two local parallelism levels (N and 4N cores, fresh
JVM each) and report validated turns/sec at both plus
efficiency = tps_4N / (4 × tps_N).

    python tools/scaling_bench.py                 # orchestrate: setup + N + 4N
    python tools/scaling_bench.py --run 8         # one measured run (internal)
    SCALING_BENCH_TURNS=10000000                  # fixture size (default 1e7)

The fixture is the deterministic FIXTURES.md generator (Zipf-skewed
conv_id, all dirt classes) written once as day-partitioned parquet;
both runs read the same files. The measured job = full violations
pass (row rules + salted uniqueness + referential + sequence) + the
per-partition column-stats pass — the complete per-partition validation
workload.

Two modes (SCALING_BENCH_MODE):

* ``local``          — N vs 4N task slots in one JVM, taskset-pinned to
                       exactly N / 4N CPUs (round-1 methodology).
* ``local-cluster``  — N vs 4N PROCESS-ISOLATED executors
                       (``local-cluster[n,cores,mem]``): each executor
                       is its own JVM with its own heap/GC, scheduled
                       over the cluster manager — the closest sandbox
                       emulation of the north rule's "N and 4N
                       executors via spark-submit". The executor pair
                       (default 1×2 → 4×2 cores) sits in the
                       UNCONTENDED region of this single-NUMA VM
                       (≤ 8 of 32 CPUs busy), so shared-memory-bandwidth
                       saturation — the measured cause of the round-1
                       local-mode shortfall, see BASELINE.md §3 — does
                       not distort the executor-scaling signal.
      SCALING_BENCH_EXECS=1         N executors (4N run uses 4×)
      SCALING_BENCH_EXEC_CORES=2    cores per executor
      SCALING_BENCH_EXEC_MEM_MB=4096
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_DIR = os.environ.get("SCALING_BENCH_DIR", os.path.join(REPO, ".bench", "turns10m"))
N_TURNS = int(os.environ.get("SCALING_BENCH_TURNS", "10000000"))
CORES_N = int(os.environ.get("SCALING_BENCH_N", "8"))
CORES_4N = 4 * CORES_N
MODE = os.environ.get("SCALING_BENCH_MODE", "local")
EXEC_CORES = int(os.environ.get("SCALING_BENCH_EXEC_CORES", "2"))
EXEC_MEM_MB = int(os.environ.get("SCALING_BENCH_EXEC_MEM_MB", "4096"))
EXECS_N = int(os.environ.get("SCALING_BENCH_EXECS", "1"))


def _session(size: int):
    """``size`` = cores (local mode) or executor count (local-cluster)."""
    from sgb_data_validator_spark.session import get_spark

    if MODE == "local-cluster":
        # worker daemons need a SPARK_HOME; the pip wheel ships the jars
        os.environ.setdefault(
            "SPARK_HOME", os.path.dirname(__import__("pyspark").__file__)
        )
        master = f"local-cluster[{size},{EXEC_CORES},{EXEC_MEM_MB}]"
        total_cores = size * EXEC_CORES
        extra = {"spark.executor.memory": f"{EXEC_MEM_MB}m"}
    else:
        master = f"local[{size}]"
        total_cores = size
        extra = {}
    spark = get_spark(
        app_name=f"scaling-bench-{MODE}-{size}",
        master=master,
        shuffle_partitions=2 * total_cores,
        extra_conf={
            # enough splits for full waves at the highest core count
            # (default 128 MB over a ~5 GB fixture gives 32 cores a
            # ragged 1.3-wave scan)
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SCALING_BENCH_SPLIT", str(32 * 1024 * 1024)
            ),
            **extra,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def setup() -> None:
    from sgb_data_validator_spark.sources.generator import FixtureConfig, write_fixture_tables

    if os.path.exists(os.path.join(DATA_DIR, "_meta.json")):
        return
    spark = _session(CORES_4N)
    cfg = FixtureConfig(n_turns=N_TURNS, days=8)
    t0 = time.perf_counter()
    write_fixture_tables(spark, cfg, DATA_DIR)
    n = spark.read.parquet(f"{DATA_DIR}/turns").count()
    with open(os.path.join(DATA_DIR, "_meta.json"), "w") as fh:
        json.dump({"rows": n, "gen_sec": round(time.perf_counter() - t0, 1)}, fh)
    print(f"# generated {n} turns in {time.perf_counter() - t0:.0f}s", file=sys.stderr)
    spark.stop()


def run_once(size: int) -> None:
    cores = size * EXEC_CORES if MODE == "local-cluster" else size
    from pyspark.sql import functions as F

    from sgb_data_validator_spark.plans.pipeline import (
        TranscriptTables,
        compute_violations,
        transcript_stats,
    )

    spark = _session(size)
    t = TranscriptTables(
        turns=spark.read.parquet(f"{DATA_DIR}/turns"),
        conversations=spark.read.parquet(f"{DATA_DIR}/conversations"),
        allowed_tools=spark.read.parquet(f"{DATA_DIR}/allowed_tools"),
        baseline_stats=spark.read.parquet(f"{DATA_DIR}/baseline_stats"),
    )
    meta = json.load(open(os.path.join(DATA_DIR, "_meta.json")))
    # warmup: touch the scan so JVM/codegen startup is out of the timing
    t.turns.select(F.count(F.lit(1))).collect()

    # best-of-3: this sandbox is a shared host (load-average noise from
    # neighbors), so a single wall measurement can be off by 2×; the
    # minimum is the closest estimate of the job's intrinsic cost
    walls, counts = [], None
    for _ in range(int(os.environ.get("SCALING_BENCH_REPEATS", "3"))):
        t0 = time.perf_counter()
        n_viol = compute_violations(t).count()
        n_stats = transcript_stats(t.turns).count()
        walls.append(time.perf_counter() - t0)
        counts = (n_viol, n_stats)
    wall = min(walls)
    print(
        json.dumps(
            {
                "mode": MODE,
                "cores": cores,
                "executors": size if MODE == "local-cluster" else None,
                "rows": meta["rows"],
                "violations": counts[0],
                "stats_rows": counts[1],
                "wall_sec": round(wall, 2),
                "wall_all": [round(w, 2) for w in walls],
                "loadavg": round(os.getloadavg()[0], 1),
                "turns_per_sec": round(meta["rows"] / wall, 1),
            }
        )
    )
    spark.stop()


def orchestrate() -> None:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO

    def sub(args: list[str], cpus: int | None = None) -> str:
        # Pin measured runs to exactly `cpus` CPUs: local[N] only caps TASK
        # slots — GC, netty shuffle, parquet reader, and Python worker
        # threads would otherwise spill onto the host's idle cores and
        # inflate the small-N baseline. An N-core cluster node has N CPUs
        # total, so the affinity mask is the faithful simulation. The JVM
        # sizes its GC/thread pools from the mask (availableProcessors
        # respects sched_getaffinity).
        cmd = [sys.executable, os.path.abspath(__file__), *args]
        if cpus is not None and os.path.exists("/usr/bin/taskset"):
            cmd = ["/usr/bin/taskset", "-c", f"0-{cpus - 1}", *cmd]
        out = subprocess.run(
            cmd, env=env, cwd=REPO, capture_output=True, text=True, timeout=3600,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit(f"subprocess {args} failed")
        lines = out.stdout.strip().splitlines()
        return lines[-1] if lines else ""

    sub(["--setup"])
    if MODE == "local-cluster":
        # SCALING_BENCH_SIZES="1,2,4" measures a multi-point efficiency
        # CURVE (first and last entries are the N / 4N pair for the
        # summary); default stays the two-point N vs 4N pair
        sizes_env = os.environ.get("SCALING_BENCH_SIZES")
        if sizes_env:
            sizes = tuple(int(s) for s in sizes_env.split(","))
        else:
            sizes = (EXECS_N, 4 * EXECS_N)
        # pin to executor cores + 2 driver CPUs: on a real cluster the
        # driver is not stealing executor cores, and the executor CPU
        # budget must scale exactly 4× between the two arms
        pins = [s * EXEC_CORES + 2 for s in sizes]
        metric = (
            f"validated turns/sec at N={EXECS_N} vs 4N={4*EXECS_N} "
            f"process-isolated executors ({EXEC_CORES} cores, "
            f"{EXEC_MEM_MB}m heap each), same input"
        )
    else:
        sizes = (CORES_N, CORES_4N)
        pins = list(sizes)
        metric = "validated turns/sec at N vs 4N cores, same input"
    results = {}
    for size, pin in zip(sizes, pins):
        results[size] = json.loads(sub(["--run", str(size)], cpus=pin))
        print(json.dumps(results[size]))
    tps_n = results[sizes[0]]["turns_per_sec"]
    tps_4n = results[sizes[-1]]["turns_per_sec"]
    eff = tps_4n / (4 * tps_n)
    summary = {
        "metric": metric,
        "mode": MODE,
        "rows": results[sizes[0]]["rows"],
        "n": sizes[0],
        "4n": sizes[-1],
        "cores_n": results[sizes[0]]["cores"],
        "cores_4n": results[sizes[-1]]["cores"],
        "turns_per_sec_n": tps_n,
        "turns_per_sec_4n": tps_4n,
        "violations_per_arm": {str(sz): results[sz]["violations"] for sz in sizes},
        "curve": [
            {
                "executors": sz,
                "cores": results[sz]["cores"],
                "turns_per_sec": results[sz]["turns_per_sec"],
                "efficiency_vs_first": round(
                    results[sz]["turns_per_sec"]
                    / (results[sizes[0]]["turns_per_sec"] * sz / sizes[0]),
                    3,
                ),
            }
            for sz in sizes
        ],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))
    out = os.environ.get(
        "SCALING_BENCH_OUT", os.path.join(REPO, "bench", "BENCH_SCALING.json")
    )
    with open(out, "w") as fh:
        json.dump({"summary": summary, "runs": list(results.values())}, fh, indent=2)


if __name__ == "__main__":
    if "--setup" in sys.argv:
        setup()
    elif "--run" in sys.argv:
        run_once(int(sys.argv[sys.argv.index("--run") + 1]))
    else:
        orchestrate()
