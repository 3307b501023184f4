"""Per-partition per-column profiling stats (reference A4).

Reference analog: ydata-profiling over the flattened frame
(/root/reference/src/profiling.py:11-83) — per-column null counts,
distinct counts, min/max, type inference. Re-expressed as ONE
groupBy(part) aggregation producing a long-format stats frame:

  (part, column, n, n_null, null_rate, min, max, approx_distinct,
   conform_rate)

Scale design: a single wide aggregate → one shuffle of tiny partial-agg
state per partition; distinct counts are HyperLogLog sketches
(``approx_count_distinct``, rsd configurable) per the north star — an
exact distinct over 10^12 rows would shuffle the full key set. Regex
conformance rates ride the same pass as ``sum(cast(rlike ...))``.

The stats digest (md5 over the canonicalized stats rows) feeds the
resume ledger.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    numeric: bool = False          # min/max cast to double for the long format
    conform_pattern: str | None = None  # regex the non-null values should match
    distinct_rsd: float = 0.05


def column_stats(
    df: DataFrame,
    columns: list[ColumnSpec],
    part_col: str | None = "part",
) -> DataFrame:
    """Long-format per-(partition, column) stats in ONE aggregation pass."""
    group = [part_col] if part_col else []
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        col = F.col(c.name)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"_null__{c.name}"))
        aggs.append(F.min(col.cast("string")).alias(f"_min__{c.name}"))
        aggs.append(F.max(col.cast("string")).alias(f"_max__{c.name}"))
        aggs.append(F.approx_count_distinct(col, c.distinct_rsd).alias(f"_dist__{c.name}"))
        if c.conform_pattern:
            aggs.append(
                F.sum(F.when(col.isNotNull() & col.rlike(c.conform_pattern), 1).otherwise(0)).alias(
                    f"_conf__{c.name}"
                )
            )
    wide = df.groupBy(*group).agg(*aggs)

    # unpivot wide → long with a struct array (stays in one projection)
    structs = []
    for c in columns:
        conform = (
            (F.col(f"_conf__{c.name}") / F.greatest(F.col("_n") - F.col(f"_null__{c.name}"), F.lit(1)))
            if c.conform_pattern
            else F.lit(None).cast("double")
        )
        structs.append(
            F.struct(
                F.lit(c.name).alias("column"),
                F.col("_n").alias("n"),
                F.col(f"_null__{c.name}").alias("n_null"),
                (F.col(f"_null__{c.name}") / F.col("_n")).alias("null_rate"),
                F.col(f"_min__{c.name}").alias("min"),
                F.col(f"_max__{c.name}").alias("max"),
                F.col(f"_dist__{c.name}").alias("approx_distinct"),
                conform.alias("conform_rate"),
            )
        )
    part = (F.col(part_col) if part_col else F.lit("__all__")).cast("string")
    return wide.select(part.alias("part"), F.explode(F.array(*structs)).alias("s")).select(
        "part", "s.*"
    )


def top_values(
    df: DataFrame,
    value_col: str,
    k: int,
    part_col: str | None = "part",
) -> DataFrame:
    """Top-k most frequent values per partition (the value-distribution
    block of the reference's profiling report, profiling.py:57-83).
    Ties break on the value itself so output is deterministic. Plan:
    one combinable (part, value) count + a top-k window over the
    aggregated frame — WindowGroupLimit prunes to k per group before
    the final exchange, so the window never sees the full value set."""
    group = ([F.col(part_col).alias("part")] if part_col else [F.lit("__all__").alias("part")])
    counts = df.where(F.col(value_col).isNotNull()).groupBy(
        *group, F.col(value_col).alias("value")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("part").orderBy(F.desc("n"), F.asc("value"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("part", "value", "n", F.col("rank").cast("int").alias("rank"))
    )


def column_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int,
    part_col: str | None = "part",
) -> DataFrame:
    """Fixed-width histogram of a numeric column per partition — the
    profiling histogram the reference emits per column
    (/root/reference/src/profiling.py:57-83), and the shared input shape
    of the χ² drift check (operators.drift.ts_chi_square).

    One groupBy((part, bin)) with map-side partial aggregation — the
    bin-assignment projection is pure codegen, values below/above the
    range clamp to the edge bins (bin 0 / bin n_bins-1)."""
    width = (hi - lo) / n_bins
    bin_col = F.least(
        F.greatest(
            F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)), F.lit(0)
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    group = ([F.col(part_col)] if part_col else []) + [bin_col.alias("bin")]
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(*group)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def stats_digest(stats: DataFrame) -> DataFrame:
    """Deterministic per-partition digest over the stats rows (→ ledger)."""
    canon = F.concat_ws(
        "|",
        F.col("column"),
        F.col("n").cast("string"),
        F.col("n_null").cast("string"),
        F.coalesce(F.col("min"), F.lit("")),
        F.coalesce(F.col("max"), F.lit("")),
    )
    return stats.groupBy("part").agg(
        F.md5(F.concat_ws("#", F.sort_array(F.collect_list(canon)))).alias("stats_digest")
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col,
    id_col: str,
    k: float = 3.0,
    mad_floor: float = 0.5,
) -> DataFrame:
    """Median/MAD robust outlier detection per group — the profiling
    family's (A4) answer to "which documents have anomalous lengths for
    their source": robust_z = (x − median) / max(MAD, mad_floor), emit
    rows with |robust_z| > k. Median+MAD resist the heavy-tailed length
    distributions real corpora have, where mean/stddev z-scores let a
    few megadocs mask everything else (reference analog: the profiling
    snapshot's per-column min/max/mean row, src/profiling.py:57-83, made
    actionable per record).

    Plan shape: TWO grouped exact-percentile aggregations over (group,
    value) — each a single shuffle keyed by the group — with the tiny
    per-group stats broadcast back onto the fact; the fact itself never
    re-shuffles. Exact percentile buffers a group's values in the
    aggregation; at extreme group cardinality swap F.percentile for
    approx_percentile (same plan, sketch-bounded memory) — the exact
    form is kept here because the DuckDB oracle (quantile_cont) matches
    it bit-for-bit on integer inputs. ``mad_floor`` guards the
    degenerate all-identical group (MAD 0) from dividing by zero while
    still flagging any deviation from it."""
    v = value_col if not isinstance(value_col, str) else F.col(value_col)
    base = df.where(v.isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        v.cast("double").alias("x"),
    )
    med = base.groupBy("grp").agg(F.percentile("x", 0.5).alias("med"))
    with_med = base.join(F.broadcast(med), "grp")
    mad = with_med.groupBy("grp").agg(
        F.percentile(F.abs(F.col("x") - F.col("med")), 0.5).alias("mad")
    )
    scored = with_med.join(F.broadcast(mad), "grp").withColumn(
        "robust_z",
        F.round((F.col("x") - F.col("med")) / F.greatest(F.col("mad"), F.lit(mad_floor)), 4),
    )
    return scored.where(F.abs(F.col("robust_z")) > k).select(
        "id", "grp", "x", "med", "mad", "robust_z"
    )


def rate_pchart(
    df: DataFrame,
    part_col: str,
    flag_col,
    k: float = 3.0,
) -> DataFrame:
    """Per-partition defect-rate control chart (Shewhart p-chart) over a
    boolean flag — the statistical-process-control layer the verdict
    report lacks: a fixed violation-count threshold can't tell "this
    partition is 4× larger so it has 4× the violations" from "this
    partition's violation RATE broke from the process". The p-chart
    compares each partition's rate p_i against the pooled rate p̄ with
    binomial control limits p̄ ± k·sqrt(p̄(1−p̄)/n_i) — limits tighten
    automatically on large partitions and loosen on small ones, so one
    k works across wildly uneven partition sizes (exactly the Zipf-day
    shape the north star's ingest has).

    Output: one row per partition (part, n, defects, rate, pooled_rate,
    z, status) where z is the binomial z-score and status ∈
    {IN_CONTROL, OUT_OF_CONTROL}.

    Plan shape: ONE map-side-combined groupBy(part) over the fact (the
    flag is computed in-scan), then the pooled rate as an in-plan window
    total over the O(parts) frame — the fact is scanned once and never
    re-shuffled; no driver-side count, no second pass (the r3 drift
    double-scan lesson applied from birth)."""
    flag = flag_col if not isinstance(flag_col, str) else F.col(flag_col)
    per = df.groupBy(F.col(part_col).cast("string").alias("part")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(flag.cast("int")).alias("defects"),
    )
    return pchart_from_counts(per, k=k)


def pchart_from_counts(per: DataFrame, k: float = 3.0) -> DataFrame:
    """p-chart core over a PRE-AGGREGATED (part, n, defects) frame —
    binomial proportion limits; defects must be ≤ n (one flag per row).
    The frame is O(parts) rows, so every window here is a
    single-partition exchange of a few dozen rows; callers that already
    hold per-partition counts (the validation pipeline's stats artifact)
    pay ZERO additional fact scans."""
    everything = Window.partitionBy()
    pooled = per.withColumn(
        "pooled_rate",
        F.sum("defects").over(everything) / F.sum("n").over(everything),
    )
    rate = F.col("defects") / F.col("n")
    sigma = F.sqrt(
        F.col("pooled_rate") * (1.0 - F.col("pooled_rate")) / F.col("n")
    )
    # degenerate series (pooled rate exactly 0 or 1 ⇒ sigma = 0): there
    # is no variance to standardize against, and under ANSI mode the
    # bare division would CRASH the whole report on a perfectly clean
    # corpus — define z = 0 (in control by definition); same guard in
    # every sibling chart and every SQL twin
    z = F.when(sigma > 0, (rate - F.col("pooled_rate")) / sigma).otherwise(F.lit(0.0))
    return pooled.select(
        "part",
        "n",
        "defects",
        F.round(rate, 6).alias("rate"),
        F.round("pooled_rate", 6).alias("pooled_rate"),
        F.round(z, 4).alias("z"),
        F.when(F.abs(z) > k, F.lit("OUT_OF_CONTROL"))
        .otherwise(F.lit("IN_CONTROL"))
        .alias("status"),
    )


def uchart_from_counts(per: DataFrame, k: float = 3.0) -> DataFrame:
    """u-chart (Poisson defects-per-unit) over a pre-aggregated (part,
    n, defects) frame — the p-chart's sibling for UNBOUNDED counts:
    several violations can fire on one turn, so violations-per-turn is
    a Poisson rate (can exceed 1), not a binomial proportion, and the
    correct limits are ū ± k·sqrt(ū/n_i) with ū = Σdefects/Σn. Same
    O(parts) in-plan window shape as pchart_from_counts."""
    everything = Window.partitionBy()
    pooled = per.withColumn(
        "u_bar",
        F.sum("defects").over(everything) / F.sum("n").over(everything),
    )
    u = F.col("defects") / F.col("n")
    sigma = F.sqrt(F.col("u_bar") / F.col("n"))
    # ū = 0 ⇒ sigma = 0: clean corpus must not crash (see pchart note)
    z = F.when(sigma > 0, (u - F.col("u_bar")) / sigma).otherwise(F.lit(0.0))
    return pooled.select(
        "part",
        "n",
        "defects",
        F.round(u, 6).alias("rate"),
        F.round("u_bar", 6).alias("u_bar"),
        F.round(z, 4).alias("z"),
        F.when(F.abs(z) > k, F.lit("OUT_OF_CONTROL"))
        .otherwise(F.lit("IN_CONTROL"))
        .alias("status"),
    )


def cusum_from_counts(
    per: DataFrame,
    k: float = 0.5,
    h: float = 4.0,
    target_rate: float | None = None,
) -> DataFrame:
    """Tabular CUSUM change detection over a pre-aggregated, date-ordered
    (part, n, defects) frame — the sequential complement of the Shewhart
    p-/u-charts (Page, Biometrika 1954): Shewhart limits catch a single
    day that jumps ≥3σ, but a process whose violation rate creeps up by
    ~1σ and STAYS there never trips them; CUSUM accumulates the
    standardized excursions, so a small persistent shift crosses the
    decision interval h within a few days (pinned by the
    shift-vs-spike test in tests/test_monitor_ops.py).

    Recurrences C⁺_i = max(0, C⁺_{i−1} + z_i − k) and
    C⁻_i = max(0, C⁻_{i−1} − z_i − k) are rewritten in their closed
    prefix-scan form — with P_i = Σ_{j≤i}(z_j − k) and
    Q_i = Σ_{j≤i}(z_j + k):

        C⁺_i = P_i − min(0, min_{j≤i} P_j)
        C⁻_i = max(0, max_{j≤i} Q_j) − Q_i

    so the whole chart is two cumulative windows over the O(parts)
    frame — no recursion, no iteration, and an ANSI-SQL twin replays it
    bit-for-bit (ordered cumulative folds are sequential and
    deterministic in both engines; equivalence to the recurrence is
    property-tested against a pure-Python replay). z_i is the same
    binomial standardization as pchart_from_counts; k (reference value,
    in σ) tunes the shift size targeted (k = δ/2 for a δσ shift), h is
    the decision interval (≈4–5σ for ARL₀ ≈ 370+).

    ``target_rate`` is the in-control process rate p₀ to standardize
    against; None (default) pools it from the series itself — note
    that on a two-regime series the pooled mean sits BETWEEN the
    regimes, so both arms accumulate and the chart reports the change
    POINT rather than which side is "normal"; pass the known target
    when one exists (the usual SPC deployment).

    Plan shape: callers holding per-partition counts pay zero fact
    scans; every window is a single-partition exchange of O(parts)
    rows, exactly like the other *_from_counts charts."""
    everything = Window.partitionBy()
    ordered = (
        Window.partitionBy()
        .orderBy("part")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pooled = per.withColumn(
        "pooled_rate",
        F.lit(float(target_rate))
        if target_rate is not None
        else F.sum("defects").over(everything) / F.sum("n").over(everything),
    )
    rate = F.col("defects") / F.col("n")
    sigma = F.sqrt(
        F.col("pooled_rate") * (1.0 - F.col("pooled_rate")) / F.col("n")
    )
    scored = pooled.withColumn(
        # sigma = 0 on a degenerate series: z = 0, see pchart_from_counts
        "_z",
        F.when(sigma > 0, (rate - F.col("pooled_rate")) / sigma).otherwise(F.lit(0.0)),
    )
    scanned = scored.select(
        "part",
        "n",
        "defects",
        "_z",
        F.sum(F.col("_z") - F.lit(k)).over(ordered).alias("_p"),
        F.sum(F.col("_z") + F.lit(k)).over(ordered).alias("_q"),
    )
    cpos = F.col("_p") - F.least(F.lit(0.0), F.min("_p").over(ordered))
    cneg = F.greatest(F.lit(0.0), F.max("_q").over(ordered)) - F.col("_q")
    return scanned.select(
        "part",
        "n",
        "defects",
        F.round("_z", 4).alias("z"),
        F.round(cpos, 4).alias("cusum_pos"),
        F.round(cneg, 4).alias("cusum_neg"),
        F.when((cpos > h) | (cneg > h), F.lit("SHIFTED"))
        .otherwise(F.lit("STABLE"))
        .alias("status"),
    )


def ewma_from_counts(
    per: DataFrame,
    lam: float = 0.25,
    L: float = 2.7,
    target_rate: float | None = None,
) -> DataFrame:
    """EWMA control chart over a pre-aggregated, date-ordered (part, n,
    defects) frame — the family member between Shewhart and CUSUM
    (Roberts, Technometrics 1959): the p-/u-charts weight only the
    current point, CUSUM weights all history equally; EWMA weights
    history geometrically (``lam`` = weight on the newest point), so it
    detects small-to-moderate persistent shifts faster than Shewhart
    while forgetting ancient history that CUSUM drags forever.

    The recurrence E_i = λ·z_i + (1−λ)·E_{i−1}, E_0 = 0 is rewritten in
    its closed rescaled-scan form

        E_i = λ · (1−λ)^i · Σ_{j≤i} z_j · (1−λ)^(−j)

    so the whole chart is one cumulative window over the O(parts)
    frame — no recursion — and an ANSI-SQL twin replays it bit-for-bit
    (equivalence to the recurrence is property-tested against a
    pure-Python replay). z_i is the same binomial standardization as
    pchart_from_counts; the variance-corrected control limit is

        ucl_i = L · sqrt(λ/(2−λ) · (1 − (1−λ)^(2i)))

    (exact time-varying limits — tighter for the first few points —
    rather than the asymptotic L·sqrt(λ/(2−λ))).

    Numerical bound of the rescaled form: (1−λ)^(−j) overflows a double
    at j ≈ 708/−ln(1−λ) (λ=0.25 ⇒ ~2,460 points). The chart frame is
    O(days-or-partitions), not O(rows), so real series sit far below
    that; a longer horizon should window the series (SPC charts are
    rolling-window artifacts anyway) or raise λ.

    ``target_rate`` is the in-control rate p₀ to standardize against
    (same contract as cusum_from_counts); None pools it from the series
    itself — on a two-regime series the pooled mean sits between the
    regimes, so pass the known target when one exists.

    Plan shape: identical to the sibling charts — callers holding
    per-partition counts pay zero fact scans; every window is a
    single-partition exchange of O(parts) rows."""
    everything = Window.partitionBy()
    by_part = Window.partitionBy().orderBy("part")
    ordered = by_part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    one_minus = 1.0 - lam
    pooled = per.withColumn(
        "pooled_rate",
        F.lit(float(target_rate))
        if target_rate is not None
        else F.sum("defects").over(everything) / F.sum("n").over(everything),
    )
    rate = F.col("defects") / F.col("n")
    sigma = F.sqrt(
        F.col("pooled_rate") * (1.0 - F.col("pooled_rate")) / F.col("n")
    )
    scored = pooled.withColumn(
        # sigma = 0 on a degenerate series: z = 0, see pchart_from_counts
        "_z",
        F.when(sigma > 0, (rate - F.col("pooled_rate")) / sigma).otherwise(F.lit(0.0)),
    )
    scanned = scored.select(
        "part",
        "n",
        "defects",
        "_z",
        F.row_number().over(by_part).alias("_i"),
        F.sum(
            F.col("_z") * F.pow(F.lit(one_minus), -F.row_number().over(by_part))
        )
        .over(ordered)
        .alias("_s"),
    )
    ewma = F.lit(lam) * F.pow(F.lit(one_minus), F.col("_i")) * F.col("_s")
    ucl = F.lit(L) * F.sqrt(
        F.lit(lam / (2.0 - lam))
        * (F.lit(1.0) - F.pow(F.lit(one_minus * one_minus), F.col("_i")))
    )
    return scanned.select(
        "part",
        "n",
        "defects",
        F.round("_z", 4).alias("z"),
        F.round(ewma, 4).alias("ewma"),
        F.round(ucl, 4).alias("ucl"),
        F.when(F.abs(ewma) > ucl, F.lit("OUT_OF_CONTROL"))
        .otherwise(F.lit("IN_CONTROL"))
        .alias("status"),
    )


def hll_partition_sketches(
    df: DataFrame,
    columns: list[str],
    part_col: str = "part",
    lg_k: int = 12,
) -> DataFrame:
    """Per-(partition, column) MERGEABLE HyperLogLog sketches
    (Apache DataSketches via ``hll_sketch_agg``) in long format
    (part, column, rows, sketch:binary) — the resumable form of the
    profiling pass's distinct counts: ``approx_count_distinct`` gives a
    partition a NUMBER, which cannot be combined with other partitions'
    numbers, so any cross-partition distinct question forces a rescan
    of everything. A stored sketch unions in O(2^lg_k) bytes, so the
    ledger can answer "global distinct conv_ids across all validated
    partitions" — including partitions validated by PREVIOUS runs —
    without touching their data again (:meth:`sources.ledger.Ledger
    .record_sketches`).

    Plan shape: ONE map-side-combined groupBy(part) computing every
    column's sketch in the same aggregation (sketches combine
    associatively, so partial aggregation applies exactly like sum),
    then an in-projection unpivot — the same single-pass long-format
    shape as column_stats."""
    aggs = [F.count(F.lit(1)).alias("_rows")] + [
        F.hll_sketch_agg(F.col(c).cast("string"), F.lit(lg_k)).alias(f"_sk__{c}")
        for c in columns
    ]
    wide = df.groupBy(F.col(part_col).cast("string").alias("part")).agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_rows").alias("rows"),
            F.col(f"_sk__{c}").alias("sketch"),
        )
        for c in columns
    ]
    return wide.select("part", F.explode(F.array(*structs)).alias("s")).select(
        "part", "s.*"
    )


def hll_global_estimates(sketches: DataFrame) -> DataFrame:
    """(column, distinct_estimate) — union the per-partition sketches
    per column and estimate. Input is the O(parts × columns) sketch
    frame, so this never touches the fact; the union is one tiny
    exchange keyed by column."""
    return (
        sketches.groupBy("column")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_estimate"))
    )


#: modulus for the order-free content checksum: hashes are reduced mod
#: this prime before the exact decimal sum, so the final ``% P`` folds
#: back into bigint and replays identically on any engine
CHECKSUM_PRIME = 2_147_483_647


def partition_checksums(
    df: DataFrame,
    part_col: str,
    hash_col,
) -> DataFrame:
    """Order-free per-partition content checksum: (part, n_rows,
    checksum) where checksum = (Σ (hash mod P)) mod P — the artifact
    that verifies a migrated / restored / replicated table matches its
    source WITHOUT a row-by-row diff (reference analog: the restore
    dry-run's per-table row counts, /root/reference/src/api.py:369-600;
    a count catches truncation, a content checksum catches corruption
    and substitution too).

    A SUM (not XOR) so a row duplicated an even number of times cannot
    cancel itself out; the per-row hash is reduced mod P first and the
    sum runs in decimal(38,0), so 10^12-row partitions stay exact with
    no bigint overflow, and the final mod folds back into bigint for
    storage beside the ledger. Callers pass the hash expression (e.g.
    portable md5 for cross-engine replay, xxhash64 for Spark-to-Spark
    backup manifests) so the portability/speed trade-off is theirs.

    One map-side-combined groupBy(part) — sums and counts combine;
    the fact is scanned once and only O(parts) rows move."""
    p = F.lit(CHECKSUM_PRIME)
    h = (F.pmod(hash_col, p)).cast("decimal(38,0)")
    return df.groupBy(F.col(part_col).cast("string").alias("part")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.pmod(F.sum(h), p.cast("decimal(38,0)")).cast("bigint").alias("checksum"),
    )


def checksum_diff(source: DataFrame, restored: DataFrame) -> DataFrame:
    """Compare two partition_checksums frames: one row per partition
    with status OK / MISSING (in source only) / EXTRA (in restored
    only) / MISMATCH (present in both, count or checksum differs).
    Full outer join on the O(parts) frames — no fact data touched."""
    s = source.select(
        "part",
        F.col("n_rows").alias("n_src"),
        F.col("checksum").alias("sum_src"),
    )
    r = restored.select(
        "part",
        F.col("n_rows").alias("n_dst"),
        F.col("checksum").alias("sum_dst"),
    )
    j = s.join(r, "part", "full_outer")
    status = (
        F.when(F.col("n_dst").isNull(), F.lit("MISSING"))
        .when(F.col("n_src").isNull(), F.lit("EXTRA"))
        .when(
            (F.col("n_src") == F.col("n_dst"))
            & (F.col("sum_src") == F.col("sum_dst")),
            F.lit("OK"),
        )
        .otherwise(F.lit("MISMATCH"))
    )
    return j.select("part", "n_src", "n_dst", "sum_src", "sum_dst", status.alias("status"))
