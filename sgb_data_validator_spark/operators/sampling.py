"""Deterministic stratified sampling for training-data curation.

A 100 TB corpus is rarely trained on whole: languages, sources, or
quality tiers are down-/up-weighted by sampling at per-stratum rates
(e.g. keep 50% of English, 10% of boilerplate-heavy sources). The
operator here is the reproducible form of that decision:

* membership = ``portable_hash(stratum ⊕ key) % 10_000 < rate_bp`` —
  pure codegen, no RNG state, no shuffle; the SAME rows are kept on
  every run, every engine, any partitioning (Spark's ``sampleBy`` is
  seed-stable but engine-private; the md5 basis-point rule is portable
  enough that the DuckDB oracle replays it exactly).
* rates are integer basis points per stratum; absent strata default to
  ``default_bp`` (0 = drop).

Scale shape: a WHERE clause on the scan — predicate evaluation is one
md5 per row, filters before anything downstream, and composes with
partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.dedup import portable_hash

SAMPLE_SEP = "\x1f"


def sample_bucket(strata: Column, key: Column) -> Column:
    """Stable bucket in [0, 10000) for a (stratum, key) pair."""
    return portable_hash(
        F.concat_ws(SAMPLE_SEP, strata.cast("string"), key.cast("string"))
    ) % 10_000


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates_bp: dict[str, int],
    default_bp: int = 0,
) -> DataFrame:
    """Rows kept at their stratum's basis-point rate, deterministically
    by key hash. ``rates_bp={"en": 5000}`` keeps ~50% of en rows —
    always the same ones."""
    rate = F.lit(default_bp)
    for stratum, bp in sorted(rates_bp.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(bp)).otherwise(rate)
    return df.where(sample_bucket(F.col(strata_col), F.col(key_col)) < rate)
