"""Corpus/transcript audit operators: conversation-structure
fingerprints, key-skew diagnostics, Benford first-digit audit, and
role co-occurrence PMI.

These extend the reference's record-at-a-time checks (validate.py
flags individual field violations) with the corpus-level integrity
audits a 10^12-turn table needs before training on it: template/bot
detection (identical conversation structures), partition-key skew
measurement (the input to the salting decisions uniqueness.py makes),
digit-distribution forensics on monetary columns, and pointwise
mutual information over role/tool co-occurrence. Everything is native
column expressions over aggregation-shrunk frames — the fact table is
scanned once per audit and only O(groups) rows ever move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.dedup import portable_hash

#: moduli for the positional conversation fingerprint. Chosen so every
#: intermediate stays far inside bigint even on a 10M-turn hot
#: conversation: h < 2^20, weight < 2^14 ⇒ term < 2^34 before its own
#: mod; each summed term < 2^30, so 10M turns sum to < 2^53.
FP_HASH_MOD = 1_000_003
FP_IDX_MOD = 9_973
FP_TERM_MOD = 999_999_937


def conv_fingerprints(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    prefix_len: int | None = None,
) -> DataFrame:
    """Order-sensitive per-conversation structure fingerprint as a pure
    aggregation — no collect_list, so a Zipf-hot 10M-turn conversation
    costs the same per-row work as a 2-turn one and never materializes
    its turn list on any executor.

    fp   = Σ ((hash(role) mod P1) · ((turn_idx mod P2)+1)) mod P3  — position-weighted,
           so swapping two different roles changes it (order-aware);
    hsum = Σ (hash(role) mod P1)                                   — order-free checksum
           that disambiguates most accidental fp collisions;
    plus n_turns. Grouping conversations on (fp, hsum, n_turns) finds
    structurally identical conversations (bot/template detection).
    Portable: hash is the md5-prefix bigint (operators/dedup.py:49),
    all arithmetic non-negative integer, so DuckDB replays it exactly.

    ``prefix_len`` restricts the fingerprint to the first k turns —
    opening-template detection (bot farms share openings even when
    later turns diverge; full-sequence duplicates are vanishingly rare
    once conversations run tens of turns). The turn_idx filter is a
    pushed-down predicate, so the fact scan skips non-prefix turns
    before any aggregation state is built.
    """
    if prefix_len is not None:
        turns = turns.where(F.col(idx_col) < prefix_len)
    h = portable_hash(F.col(role_col)) % F.lit(FP_HASH_MOD)
    w = (F.col(idx_col).cast("bigint") % F.lit(FP_IDX_MOD)) + F.lit(1)
    term = (h * w) % F.lit(FP_TERM_MOD)
    return turns.groupBy(conv_col).agg(
        F.sum(term).cast("bigint").alias("fp"),
        F.sum(h).cast("bigint").alias("hsum"),
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
    )


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Distribution-skew diagnostics for a partition/join key — the
    measurement side of the skew handling the engine applies (salted
    uniqueness, AQE skew joins): (metric, value) rows for n_keys,
    total_rows, max_share, top10_share, and the Gini coefficient of
    the per-key count distribution.

    One map-side-combined groupBy(key) over the fact; every window
    below runs on the O(distinct keys) frame (single-partition sort —
    documented, keys ≪ rows; at 10^9+ distinct keys swap the exact
    Gini for a quantile-sketch approximation). Ties rank
    deterministically by (count, key) so the DuckDB twin replays the
    exact top-10 cut.
    """
    per = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    asc = Window.orderBy(F.col("cnt").asc(), F.col(key_col).asc())
    desc = Window.orderBy(F.col("cnt").desc(), F.col(key_col).asc())
    ranked = per.select(
        F.col("cnt").cast("bigint").alias("cnt"),
        # ties contribute the same Σ rk·cnt under any tie order, so the
        # Gini is tie-order-free; the desc rank's (cnt, key) tie-break
        # pins the top-10 boundary cut for the DuckDB twin
        F.row_number().over(asc).cast("bigint").alias("rk"),
        F.row_number().over(desc).cast("bigint").alias("rk_desc"),
    )
    one = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.col("rk") * F.col("cnt")).alias("rk_dot"),
        F.sum(F.when(F.col("rk_desc") <= 10, F.col("cnt"))).alias("top10"),
    )
    n, tot = F.col("n_keys"), F.col("total")
    gini = (F.lit(2) * F.col("rk_dot") - (n + 1) * tot) / (n * tot)
    return one.select(
        F.explode(
            F.map_from_arrays(
                F.array(
                    F.lit("n_keys"),
                    F.lit("total_rows"),
                    F.lit("max_share"),
                    F.lit("top10_share"),
                    F.lit("gini"),
                ),
                F.array(
                    n.cast("double"),
                    tot.cast("double"),
                    F.round(F.col("max_cnt") / tot, 6),
                    F.round(F.col("top10") / tot, 6),
                    F.round(gini, 6),
                ),
            )
        ).alias("metric", "value")
    )


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution of a positive numeric
    column vs the Benford expectation log10(1+1/d) — the standard
    forensic audit for fabricated or unit-mixed monetary data. Single
    groupBy(digit) over the fact (9 groups), frequencies via an
    in-plan window over the grouped counts, no second scan.

    The digit is floor(x / 10^floor(log10 x)) — pure double math that
    both engines evaluate identically except when x sits exactly on a
    power of ten (measure-zero for real-valued amounts; documented).
    """
    x = F.col(value_col).cast("double")
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    per = (
        df.where(x > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return per.select(
        "digit",
        "n",
        F.round(F.col("n") / total, 6).alias("freq"),
        F.round(expected, 6).alias("expected"),
        F.round(F.abs(F.col("n") / total - expected), 6).alias("abs_dev"),
    )


def cooccurrence_pmi(
    turns: DataFrame,
    conv_col: str = "conv_id",
    dim_col: str = "role",
) -> DataFrame:
    """Pointwise mutual information over per-conversation co-occurrence
    of a low-cardinality dimension (role, tool): which pairs appear in
    the same conversation more (pmi>0) or less (pmi<0) often than
    independence predicts. The fact shrinks to the distinct
    (conv, value) frame first — at most |vocab| rows per conversation —
    so the pair self-join is on the shrunk frame, co-partitioned on
    conv_id, with per-value and total counts broadcast back onto the
    O(vocab²) pair frame."""
    dv = turns.select(conv_col, dim_col).distinct()
    per = dv.groupBy(dim_col).agg(F.count(F.lit(1)).cast("bigint").alias("n_one"))
    n_convs = dv.select(conv_col).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_convs")
    )
    a, b = dv.alias("a"), dv.alias("b")
    pairs = (
        a.join(b, on=conv_col)
        .where(F.col(f"a.{dim_col}") < F.col(f"b.{dim_col}"))
        .groupBy(
            F.col(f"a.{dim_col}").alias("value_a"),
            F.col(f"b.{dim_col}").alias("value_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    pa = per.select(F.col(dim_col).alias("value_a"), F.col("n_one").alias("n_a"))
    pb = per.select(F.col(dim_col).alias("value_b"), F.col("n_one").alias("n_b"))
    joined = (
        pairs.join(F.broadcast(pa), "value_a")
        .join(F.broadcast(pb), "value_b")
        .crossJoin(F.broadcast(n_convs))
    )
    pmi = F.log(
        F.col("n_both").cast("double")
        * F.col("n_convs")
        / (F.col("n_a") * F.col("n_b"))
    )
    return joined.select(
        "value_a",
        "value_b",
        "n_both",
        F.round(pmi, 6).alias("pmi"),
    )


def salt_plan(
    df: DataFrame,
    key_col: str,
    target_rows: int,
) -> DataFrame:
    """Actionable salting recommendations from the per-key count
    distribution — the DECISION step between :func:`key_skew_report`'s
    measurement and the salted repartition uniqueness.py applies: every
    key whose row count exceeds ``target_rows`` (the rows-per-task
    budget partitions are sized for) gets ``salt_factor`` =
    ceil(count / target_rows), the number of salt buckets that brings
    its largest shard back under budget. Keys under budget need no
    salt and are not emitted, so the plan is O(hot keys) — small enough
    to broadcast back into the salting join.

    One map-side-combined groupBy(key) over the fact; the filter and
    the ceil-division run on the O(distinct keys) frame. Integer
    arithmetic only, so the DuckDB twin replays it exactly."""
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    per = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    return per.where(F.col("cnt") > target_rows).select(
        key_col,
        "cnt",
        F.ceil(F.col("cnt") / F.lit(target_rows)).cast("int").alias("salt_factor"),
    )
