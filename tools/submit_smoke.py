"""Deployment smoke: the north rule's literal shipping path —
``spark-submit --py-files engine.zip jobs/validate.py`` against
multi-executor (process-isolated, local-cluster) infrastructure.

    python tools/submit_smoke.py          # zip → submit → assert verdicts

Builds the engine zip from the working tree, generates a small fixture,
submits the validation job to ``local-cluster[2,2,2048]`` (two separate
executor JVMs — the sandbox stand-in for a real cluster), and asserts
the run exits 1 (dirt ⇒ errors, the reference exit-code contract) with
per-partition verdicts and a populated resume ledger on disk.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_zip(out: str) -> None:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "sgb_data_validator_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))


def main() -> int:
    import pyspark

    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    spark_submit = os.path.join(os.environ["SPARK_HOME"], "bin", "spark-submit")

    work = tempfile.mkdtemp(prefix="sgb_submit_")
    engine_zip = os.path.join(work, "engine.zip")
    build_zip(engine_zip)

    # fixture generated in-process (driver-side session, then stopped so
    # the submitted app owns the only SparkContext)
    from sgb_data_validator_spark.session import get_spark
    from sgb_data_validator_spark.sources.generator import FixtureConfig, write_fixture_tables

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    fx = os.path.join(work, "fx")
    write_fixture_tables(spark, FixtureConfig(n_turns=20_000), fx)
    spark.stop()

    cmd = [
        spark_submit,
        "--master", "local-cluster[2,2,2048]",
        "--conf", "spark.executor.memory=2g",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", engine_zip,
        os.path.join(REPO, "jobs", "validate.py"),
        "--turns", f"{fx}/turns",
        "--conversations", f"{fx}/conversations",
        "--allowed-tools", f"{fx}/allowed_tools",
        "--baseline-stats", f"{fx}/baseline_stats",
        "--out", f"{work}/report",
        "--ledger", f"{work}/ledger",
        "--lineage", "tools/submit_smoke.py",
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the app must import from --py-files only
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=900)

    ok_exit = proc.returncode == 1  # dirt ⇒ errors ⇒ exit 1 by contract
    verdict_lines = [
        l for l in proc.stdout.splitlines() if "\tPASSED\t" in l or "\tFAILED\t" in l
    ]
    report_ok = os.path.isdir(f"{work}/report/verdicts")
    ledger_ok = os.path.isdir(f"{work}/ledger")
    result = {
        "spark_submit": True,
        "master": "local-cluster[2,2,2048]",
        "py_files": "engine.zip (package only, no PYTHONPATH)",
        "exit_code": proc.returncode,
        "exit_contract_ok": ok_exit,
        "verdict_lines": len(verdict_lines),
        "report_written": report_ok,
        "ledger_written": ledger_ok,
        "pass": ok_exit and len(verdict_lines) >= 8 and report_ok and ledger_ok,
    }
    print(json.dumps(result))
    if not result["pass"]:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:])
    shutil.rmtree(work, ignore_errors=True)
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
