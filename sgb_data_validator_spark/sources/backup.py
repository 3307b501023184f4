"""Backup / restore of table snapshots (S10 completion).

Reference semantics re-expressed
(/root/reference/src/api.py:369-560 backup_item_set /
restore_from_backup; 864-1014 migrate_item_set — the migration half
lives in plans/extra_queries.q_migrate_idmap): a backup writes the
parent table, the child table, and a MANIFEST (counts + file map) to a
named directory; a restore reads everything back and verifies against
the manifest before touching anything.

Spark-first shape: each table lands as JSON lines (the reference's
format) written in parallel; the manifest carries the exact schema so
the restore read is explicit-schema — schema inference over a 100 TB
backup would be a full extra pass. The manifest row count rides the
write job itself via ``df.observe`` (an accumulator-backed aggregate on
the rows as they stream to the sink) — ONE scan per table per backup,
not a write plus a second counting read. The manifest itself is a
driver-side file: it is O(tables), not O(rows).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

MANIFEST = "manifest.json"


def backup_tables(tables: dict[str, DataFrame], backup_dir: str) -> dict:
    """Write every table as JSON lines + a manifest with row counts and
    schemas. Returns the manifest dict. Row counts are observed on the
    write job (no second scan)."""
    manifest: dict = {"tables": {}}
    for name, df in tables.items():
        path = os.path.join(backup_dir, name)
        obs = Observation(f"backup_{name}")
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode("overwrite").json(path)
        manifest["tables"][name] = {
            "path": path,
            "rows": obs.get["rows"],
            "schema": df.schema.json(),
        }
    os.makedirs(backup_dir, exist_ok=True)
    with open(os.path.join(backup_dir, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def restore_tables(spark: SparkSession, backup_dir: str) -> dict[str, DataFrame]:
    """Read every table back with the manifest's EXPLICIT schema (no
    inference scan)."""
    with open(os.path.join(backup_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    return {
        name: spark.read.schema(
            StructType.fromJson(json.loads(meta["schema"]))
        ).json(meta["path"])
        for name, meta in manifest["tables"].items()
    }


def verify_backup(spark: SparkSession, backup_dir: str) -> dict[str, dict]:
    """Dry-run check (the reference's restore dry_run=True): per table,
    restored row count vs the manifest count."""
    with open(os.path.join(backup_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    restored = restore_tables(spark, backup_dir)
    out = {}
    for name, meta in manifest["tables"].items():
        n = restored[name].count()
        out[name] = {"expected": meta["rows"], "restored": n, "ok": n == meta["rows"]}
    return out
