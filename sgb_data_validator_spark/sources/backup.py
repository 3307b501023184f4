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

#: column types excluded from the backup checksum: JSON text round-trips
#: of floats are not guaranteed bit-identical, so hashing them would
#: flag healthy restores. Counts still cover those columns' rows.
_NO_CHECKSUM_TYPES = ("float", "double", "decimal")


def _checksum_expr(df: DataFrame):
    """Order-free content checksum aggregate over the checksummable
    columns (Σ (xxhash64 mod P) mod P, exact decimal sum — same
    construction as operators/stats.py:partition_checksums, Spark-to-
    Spark so the fast native hash is fine). None if no column
    qualifies."""
    from sgb_data_validator_spark.operators.stats import CHECKSUM_PRIME

    cols = [
        f.name
        for f in df.schema.fields
        # a float type ANYWHERE in the column (array<double>, nested
        # struct/map fields) disqualifies it — JSON float round-trips
        # aren't bit-stable at any nesting depth, and a nested double
        # slipping into the hash would flag healthy restores MISMATCH
        if not any(t in f.dataType.simpleString() for t in _NO_CHECKSUM_TYPES)
    ]
    if not cols:
        return None, []
    p = F.lit(CHECKSUM_PRIME)
    h = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), p).cast("decimal(38,0)")
    return F.pmod(F.sum(h), p.cast("decimal(38,0)")).cast("bigint"), cols


def backup_tables(tables: dict[str, DataFrame], backup_dir: str) -> dict:
    """Write every table as JSON lines + a manifest with row counts,
    content checksums, and schemas. Returns the manifest dict. Counts
    AND checksums are observed on the write job itself (no second
    scan)."""
    manifest: dict = {"tables": {}}
    for name, df in tables.items():
        path = os.path.join(backup_dir, name)
        obs = Observation(f"backup_{name}")
        cks, cks_cols = _checksum_expr(df)
        aggs = [F.count(F.lit(1)).alias("rows")]
        if cks is not None:
            aggs.append(cks.alias("checksum"))
        df.observe(obs, *aggs).write.mode("overwrite").json(path)
        got = obs.get
        manifest["tables"][name] = {
            "path": path,
            "rows": got["rows"],
            "checksum": got.get("checksum"),
            "checksum_cols": cks_cols,
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
    restored row count AND content checksum vs the manifest — a count
    catches truncation, the checksum catches corruption/substitution.
    One aggregation per table (count + checksum in the same pass);
    manifests written before checksums existed verify by count only."""
    with open(os.path.join(backup_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    restored = restore_tables(spark, backup_dir)
    out = {}
    for name, meta in manifest["tables"].items():
        df = restored[name]
        expected_cks = meta.get("checksum")
        aggs = [F.count(F.lit(1)).alias("rows")]
        if expected_cks is not None:
            cks, _ = _checksum_expr(df)
            aggs.append(cks.alias("checksum"))
        got = df.agg(*aggs).first()
        entry = {
            "expected": meta["rows"],
            "restored": got["rows"],
            "ok": got["rows"] == meta["rows"],
        }
        if expected_cks is not None:
            entry["checksum_ok"] = got["checksum"] == expected_cks
            entry["ok"] = entry["ok"] and entry["checksum_ok"]
        out[name] = entry
    return out
