"""Stage-by-stage profile of the dedup_minhash pass at a given sf_dir.

    python tools/profile_minhash.py [sf_dir] [repeats]

Times each prefix of the minhash pipeline (scan+twins → shingle split →
shingle hashes → signatures → banding/explode → self-join/pairs) so the
bench regression can be attributed to a stage instead of guessed at.
Run serially (no concurrent Spark jobs — see BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from sgb_data_validator_spark.operators import dedup as D
    from sgb_data_validator_spark.plans.training_queries import (
        BAND_ROWS,
        K_MINHASH,
        _docs_with_twins,
        q_dedup_minhash,
    )
    from sgb_data_validator_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="profile_minhash")
    spark.sparkContext.setLogLevel("ERROR")

    def docs():
        return _docs_with_twins(spark, sf_dir)

    def variant_scan():
        return docs().count()

    def variant_split():
        return docs().select(
            F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("n")
        ).agg(F.sum("n")).collect()

    def variant_shingle_hash():
        d = docs().where(D.has_shingles(F.col("text"), 2))
        return d.select(
            F.size(D.shingle_hashes(D.word_shingles(F.col("text"), 2))).alias("n")
        ).agg(F.sum("n")).collect()

    def variant_sigs():
        d = docs().where(D.has_shingles(F.col("text"), 2)).select(
            F.col("doc_id").alias("id"),
            D.shingle_hashes(D.word_shingles(F.col("text"), 2)).alias("hvs"),
        )
        sigs = d.select(
            "id", *[s.alias(f"sig{i}") for i, s in enumerate(D.minhash_sig_cols(F.col("hvs"), K_MINHASH))]
        )
        return sigs.agg(F.sum("sig0")).collect()

    def variant_full():
        out = q_dedup_minhash(spark, sf_dir)
        n = out.count()
        return n

    results = {}
    for name, fn in [
        ("scan_twins", variant_scan),
        ("split_only", variant_split),
        ("shingle_hashes", variant_shingle_hash),
        ("signatures", variant_sigs),
        ("full_pairs", variant_full),
    ]:
        best = None
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)

    print(json.dumps({"sf_dir": sf_dir, "repeats": repeats, "stages_sec": results}))
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
