"""Fuzzy dimension matching and hierarchical membership.

Reference analogs:

* Fuzzy DOI enrichment (J5): normalize a literal, score it against a
  tiny dimension table, keep the best match over a threshold
  (/root/reference/src/transformations.py:544-690). The reference
  scores with difflib.SequenceMatcher; here the scorer is Levenshtein
  similarity — native in both Spark (F.levenshtein) and ANSI SQL, so
  the whole operator stays inside codegen AND carries a SQL oracle.
  Plan shape is the reference's exactly: crossJoin(broadcast(dim)) →
  score → Window top-1 per key → threshold.

* Iconclass hierarchical membership (J3): a notation is valid iff any
  of its hierarchical prefixes is in the vocabulary
  (/root/reference/src/iconclass.py:54-99, vocabularies.py:57-87).
  Re-expressed set-wise: expand the code into its prefix array with
  F.transform(sequence) (no Python), then arrays_overlap against a
  broadcast vocabulary array literal for small vocabs, or an exploded
  broadcast semi-join for large ones.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def levenshtein_similarity(a: Column, b: Column) -> Column:
    """1 - dist/maxlen in integer basis points [0, 10000] — exact
    integer arithmetic, bit-identical across engines."""
    maxlen = F.greatest(F.length(a), F.length(b), F.lit(1))
    return (F.lit(10_000) - F.floor((F.levenshtein(a, b) * 10_000) / maxlen)).cast("bigint")


def fuzzy_best_match(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    fact_text: str,
    dim_key: str,
    dim_text: str,
    threshold_bp: int = 6_000,
) -> DataFrame:
    """Best dim row per fact row by Levenshtein similarity, kept only at
    or above ``threshold_bp``. Ties break on dim key (deterministic).

    Scale shape: the dim broadcasts (it is tiny, like the reference's
    9-entry book table); the cross join is |fact| × |dim| scored rows,
    embarrassingly parallel; the only shuffle is the top-1 window keyed
    by the fact key."""
    f = fact.select(
        F.col(fact_key).alias("fact_key"), F.lower(F.trim(F.col(fact_text))).alias("fact_text")
    )
    d = F.broadcast(
        dim.select(F.col(dim_key).alias("dim_key"), F.lower(F.trim(F.col(dim_text))).alias("dim_text"))
    )
    scored = f.crossJoin(d).select(
        "fact_key",
        "dim_key",
        levenshtein_similarity(F.col("fact_text"), F.col("dim_text")).alias("sim_bp"),
    )
    w = Window.partitionBy("fact_key").orderBy(F.desc("sim_bp"), F.asc("dim_key"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("sim_bp") >= threshold_bp))
        .select("fact_key", "dim_key", "sim_bp")
    )


def fuzzy_best_match_exact(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    fact_text: str,
    dim_key: str,
    dim_text: str,
    threshold: float = 0.9,
) -> DataFrame:
    """Exact-parity variant of :func:`fuzzy_best_match`: the reference's
    directional sliding-window SequenceMatcher partial-ratio with
    NFKC/diacritic/stopword normalization
    (/root/reference/src/transformations.py:543-583), as an
    Arrow-batched pandas UDF over the SAME plan shape (broadcast dim ×
    fact → score → top-1 window → threshold). Use when the documented
    false-positive class the reference engineered against matters;
    the native Levenshtein path stays the oracle-checkable default."""
    from pyspark.sql.functions import pandas_udf

    from sgb_data_validator_spark.functions.pytext import (
        normalize_match_text,
        partial_ratio,
    )

    @pandas_udf("double")
    def _score(needle: pd.Series, haystack: pd.Series) -> pd.Series:
        return pd.Series(
            [
                partial_ratio(normalize_match_text(n), normalize_match_text(h))
                for n, h in zip(needle, haystack)
            ]
        )

    f = fact.select(F.col(fact_key).alias("fact_key"), F.col(fact_text).alias("_ft"))
    d = F.broadcast(
        dim.select(F.col(dim_key).alias("dim_key"), F.col(dim_text).alias("_dt"))
    )
    scored = f.crossJoin(d).select(
        "fact_key", "dim_key", F.round(_score(F.col("_dt"), F.col("_ft")), 6).alias("score")
    )
    w = Window.partitionBy("fact_key").orderBy(F.desc("score"), F.asc("dim_key"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("score") >= threshold))
        .select("fact_key", "dim_key", "score")
    )


def code_prefixes(code: Column) -> Column:
    """All character prefixes of ``code``, shortest first — the
    hierarchical expansion (iconclass.py:54-99 analog, without the
    domain-specific key/placeholder syntax)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(code)), lambda i: F.substring(code, 1, i)
    )


def hierarchical_membership_violations(
    df: DataFrame,
    id_col: str,
    code_col: str,
    vocabulary: list[str],
    rule_id: str = "hierarchy.code",
    severity: str = "error",
) -> DataFrame:
    """Codes whose prefix chain never touches the vocabulary ⇒ violation.

    For vocabularies that fit in a literal array (reference Iconclass:
    373 entries) this is pure codegen: prefix expansion + arrays_overlap
    — no join, no shuffle at all."""
    vocab = F.array(*[F.lit(v) for v in vocabulary])
    code = F.col(code_col)
    bad = code.isNotNull() & ~F.arrays_overlap(code_prefixes(code), vocab)
    return df.where(bad).select(
        F.lit(rule_id).alias("rule_id"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.lit(code_col).alias("column"),
        F.substring(code.cast("string"), 1, 80).alias("offending_value"),
        F.lit(severity).alias("severity"),
    )
