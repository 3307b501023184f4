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

from pyspark.sql import Column, DataFrame, Window
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


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.5,
    keep_rate: bool = False,
) -> DataFrame:
    """Temperature resampling of the stratum (language/source) mix —
    the data-driven upgrade over :func:`stratified_sample`'s hand-set
    rates. Each stratum s with share p_s is kept at a rate ∝ p_s^(α-1),
    normalized so the SMALLEST stratum keeps 100%: head strata are
    downweighted toward the flattened multinomial p_s^α used by
    multilingual pretraining mixes (α=1 keeps everything, α→0 equalizes).

    rate_bp(s) = floor(round(10000 · (c_min / c_s)^(1-α), 6)), with
    c_s the stratum row count — computed IN the plan (groupBy counts +
    a scalar min joined back via broadcast), never collected. Membership
    is the same portable md5 basis-point rule as stratified_sample, so
    the kept set is deterministic and engine-replayable; the round-at-
    6dp-before-floor step absorbs last-ulp pow() differences between
    engines.

    Scale shape: one map-side-combined count aggregation over the
    strata (tiny output), a broadcast join of the per-stratum rate back
    onto the fact scan, then a per-row md5 filter — the fact is never
    shuffled."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__c"))
    cmin = counts.agg(F.min("__c").alias("__cmin"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        strata_col,
        F.floor(
            F.round(
                F.lit(10000)
                * F.pow(F.col("__cmin").cast("double") / F.col("__c"), F.lit(1.0 - alpha)),
                6,
            )
        ).alias("__rate_bp"),
    )
    kept = df.join(F.broadcast(rates), strata_col).where(
        sample_bucket(F.col(strata_col), F.col(key_col)) < F.col("__rate_bp")
    )
    return kept if keep_rate else kept.drop("__rate_bp")


def group_topk(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    k: int,
    n_salts: int = 16,
) -> DataFrame:
    """Deterministic per-stratum sample of exactly min(k, |stratum|)
    rows: the k keys with the smallest portable hash — the reproducible
    analog of "show me k random docs per language" for eyeballing a
    100 TB corpus, stable across runs, engines, and partitionings.

    Spark-first scale shape (skew-proof exact top-k): a plain
    ``row_number() OVER (PARTITION BY stratum)`` shuffles every row of
    a hot stratum into ONE task. Instead phase 1 splits each stratum
    into ``n_salts`` hash-salted sub-groups and takes the top-k of each
    (bounded task size regardless of skew); phase 2 re-ranks the
    ≤ n_salts*k survivors per stratum — provably exact, because every
    global top-k row is a top-k row of its salt group. The DuckDB twin
    is the single-window form; results are identical.
    """
    if not isinstance(k, int) or isinstance(k, bool) or k < 1:
        raise ValueError(f"k must be a positive int, got {k!r}")
    ord_hash = portable_hash(
        F.concat_ws(SAMPLE_SEP, F.lit("topk"), F.col(key_col).cast("string"))
    )
    salted = df.select(
        F.col(strata_col).alias("stratum"),
        F.col(key_col).alias("key"),
        ord_hash.alias("__ord"),
        (portable_hash(F.col(key_col).cast("string")) % n_salts).alias("__salt"),
    )
    w1 = Window.partitionBy("stratum", "__salt").orderBy("__ord", "key")
    survivors = salted.withColumn("__rn", F.row_number().over(w1)).where(
        F.col("__rn") <= k
    )
    w2 = Window.partitionBy("stratum").orderBy("__ord", "key")
    return (
        survivors.drop("__rn", "__salt")
        .withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .where(F.col("rank") <= k)
        .drop("__ord")
    )


def epoch_shuffle_manifest(
    df: DataFrame,
    key_col: str,
    epochs: int,
    n_shards: int,
) -> DataFrame:
    """Deterministic training-order manifest: for each epoch, assign
    every key a shard and a position within the shard — the ordering
    contract a data loader needs ("give me epoch e, shard s, in
    order") that is reproducible across runs, engines, and cluster
    sizes. Each epoch gets an INDEPENDENT permutation (the hash is
    salted with the epoch), which is the whole point of reshuffling
    between epochs. Returns (epoch, shard, pos, key).

    Spark-first scale shape: the permutation is never global — a
    global row_number would serialize 100 TB through one task. Keys
    hash into ``n_shards`` shards (pick n_shards so a shard ≈ one
    loader task, e.g. corpus_bytes / 256 MB) and the order lives
    WITHIN the shard: one exchange on (epoch, shard), window
    partitions bounded by construction at |corpus| / n_shards. The
    epoch fan-out is a narrow explode of a literal sequence — the
    text/payload never enters the manifest, only the key does."""
    if not isinstance(epochs, int) or isinstance(epochs, bool) or epochs < 1:
        raise ValueError(f"epochs must be a positive int, got {epochs!r}")
    if not isinstance(n_shards, int) or isinstance(n_shards, bool) or n_shards < 1:
        raise ValueError(f"n_shards must be a positive int, got {n_shards!r}")
    fanned = df.select(
        F.col(key_col).alias("key"),
        F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))).alias("epoch"),
    )
    ord_hash = portable_hash(
        F.concat_ws(
            SAMPLE_SEP, F.lit("epoch"), F.col("epoch").cast("string"),
            F.col("key").cast("string"),
        )
    )
    sharded = fanned.select(
        F.col("epoch").cast("bigint").alias("epoch"),
        (ord_hash % n_shards).cast("bigint").alias("shard"),
        ord_hash.alias("__ord"),
        "key",
    )
    w = Window.partitionBy("epoch", "shard").orderBy("__ord", "key")
    return (
        sharded.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__ord")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    content_col: str,
    train_bp: int = 9800,
    val_bp: int = 9900,
) -> DataFrame:
    """Deterministic, leakage-safe train/val/test assignment.

    The split key is the CONTENT fingerprint (canonical word-set md5,
    operators.dedup.canonical_fingerprint), not the row id: exact and
    reorder-only duplicates hash to the same bucket and therefore land
    in the SAME split by construction — the standard guard against
    test-set contamination that id-keyed splits silently violate.
    Basis-point thresholds: bucket < train_bp → train, < val_bp → val,
    else test (defaults 98% / 1% / 1%).

    Scale shape: one md5 + two comparisons per row in the scan stage —
    zero shuffle, zero state, reproducible on any engine and any
    partitioning (the DuckDB oracle replays it exactly)."""
    from sgb_data_validator_spark.operators.dedup import canonical_fingerprint

    bucket = portable_hash(canonical_fingerprint(F.col(content_col))) % 10_000
    return df.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_bp, F.lit("train"))
        .when(F.col("split_bucket") < val_bp, F.lit("val"))
        .otherwise(F.lit("test")),
    )
