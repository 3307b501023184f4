"""Count-min-sketch heavy hitters over a token (or any key) column.

Companion to the HLL distinct-count path (plans/corpus_queries.py
``stats_hll``): HLL answers "how many distinct", CMS answers "which
values are frequent and roughly how frequent" in O(d·w) memory
regardless of cardinality (Cormode & Muthukrishnan, J. Algorithms
2005). The reference profiles exact top values driver-side
(/root/reference/src/validate.py stats aggregation studied for the
A4 surface); at 10^12 tokens the exact token groupBy shuffles one
row per distinct token, while the sketch shuffles at most
``d × w × n_partitions`` pre-combined cells.

Portability contract: row hashes are the same md5-prefix→bigint
construction as operators.dedup.portable_hash, salted per sketch row,
so the DuckDB oracle replays the sketch cell-for-cell.

Scale shape:
* build — project each occurrence to ``d`` (row, bucket) pairs and
  groupBy with map-side combine: the shuffle carries only the ~d·w
  partial cells per task, never a per-token row. The fact is read
  once; the sketch is a ≤ d·w-row frame that BROADCASTS back.
* query — any candidate set joins the broadcast sketch on its d
  buckets; estimate = min over the d cells (always ≥ the true count).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.dedup import portable_hash

CMS_SEP = "\x1f"


def cms_bucket(key: Column, row: int, width: int) -> Column:
    """Bucket of ``key`` in sketch row ``row``: salted portable hash
    mod width. Same expression the SQL oracle uses."""
    return portable_hash(F.concat_ws(CMS_SEP, F.lit(str(row)), key.cast("string"))) % width


def cms_build(
    occurrences: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-min sketch of the ``key_col`` stream as a (row, bucket,
    cell_n) frame with at most ``depth × width`` rows.

    ONE pass over the occurrences: each row projects to ``depth``
    (row, bucket) pairs via an in-row array (no join, no re-scan), the
    explode multiplies only 8-byte pairs (never the payload), and the
    groupBy's map-side combine collapses every task to ≤ d·w partial
    cells before the (tiny) shuffle."""
    cells = occurrences.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(
        F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cell_n"))


def cms_estimate(
    candidates: DataFrame, sketch: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Point-estimate every candidate key against a built sketch:
    ``est_n = min over the d rows of the key's cell`` (the classic CMS
    upper bound: est_n ≥ true count, with overestimation bounded by
    e·N/w at confidence 1 − e^−d).

    The sketch is ≤ d·w rows — broadcast; the candidate side stays
    partitioned and joins each of its d (row, bucket) probes against
    it, then min-folds in the projection (no aggregation node)."""
    carried = list(candidates.columns)
    cand = candidates.select(
        "*", *[cms_bucket(F.col(key_col), r, width).alias(f"__b{r}") for r in range(depth)]
    )
    sk = F.broadcast(sketch)
    out = cand
    for r in range(depth):
        out = out.join(
            sk.select(
                F.col("row").alias(f"__r{r}"),
                F.col("bucket").alias(f"__bb{r}"),
                F.col("cell_n").alias(f"__n{r}"),
            ),
            on=[F.col(f"__r{r}") == r, F.col(f"__b{r}") == F.col(f"__bb{r}")],
            how="left",
        )
    est = reduce(F.least, [F.coalesce(F.col(f"__n{r}"), F.lit(0)) for r in range(depth)])
    return out.select(*carried, est.cast("bigint").alias("est_n"))


# ------------------------------------------------------------- bloom filter

def bloom_build(df: DataFrame, key_col: str, k: int = 3, m: int = 4096) -> DataFrame:
    """Build an ``m``-bit Bloom filter over ``key_col`` as a ONE-ROW
    frame holding a DENSE array<bigint> of m/32 32-bit words (column
    ``words``; 32 bits per word keeps every shift far from the signed
    overflow both engines reject at 1 << 63) — the constant-size broadcast membership structure
    (Bloom, CACM 1970). Hash family is the salted portable md5
    construction shared with the CMS (``cms_bucket``), so the DuckDB
    oracle replays the filter word-for-word.

    Scale shape: ONE pass over the keys — each row projects to ``k``
    bucket ints in-row; bit_or with map-side combine collapses every
    task to ≤ m/64 partial words before a tiny shuffle; the dense
    word array folds out of a map literal (missing words → 0). The
    result is O(m) bytes REGARDLESS of key cardinality — at 10^12 keys
    this broadcasts where the exact key set cannot."""
    if m % 32 != 0 or m <= 0:
        raise ValueError(f"m must be a positive multiple of 32, got {m!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k!r}")
    buckets = df.select(
        F.explode(
            F.array(*[cms_bucket(F.col(key_col), i, m) for i in range(k)])
        ).alias("bucket")
    )
    words = buckets.groupBy(F.expr("bucket DIV 32").alias("w")).agg(
        F.expr("bit_or(shiftleft(cast(1 AS bigint), cast(bucket % 32 AS int)))").alias(
            "bits"
        )
    )
    m_words = m // 32
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("__mp")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m_words - 1)),
            lambda i: F.coalesce(F.try_element_at(F.col("__mp"), i), F.lit(0).cast("bigint")),
        ).alias("words")
    )


def bloom_probe(
    df: DataFrame, key_col: str, bloom: DataFrame, k: int = 3, m: int = 4096
) -> DataFrame:
    """Append a ``bloom_hit`` column: true iff ALL ``k`` bucket bits of
    ``key_col`` are set in the broadcast filter. No false negatives
    (every inserted key hits); false-positive rate ≈ (set-bit
    fraction)^k — callers confirm hits with an exact join against the
    (much smaller) candidate set. Pure per-row integer math against a
    broadcast one-row word array: the probed fact never shuffles, and
    each bit test is O(1) (element_at on the dense array + shift),
    not a scan of the filter."""
    probed = df.crossJoin(F.broadcast(bloom))
    bucket_cols = [f"__bloom_b{i}" for i in range(k)]
    for i, c in enumerate(bucket_cols):
        probed = probed.withColumn(c, cms_bucket(F.col(key_col), i, m))
    hit = F.lit(True)
    for c in bucket_cols:
        # SQL-string form: shiftright with a COLUMN shift amount is
        # SQL-only (the Python helper requires an int literal); DIV and
        # the & 1 mask mirror the DuckDB twin token-for-token
        hit = hit & F.expr(
            f"(shiftright(element_at(words, cast({c} DIV 32 AS int) + 1),"
            f" cast({c} % 32 AS int)) & 1) = 1"
        )
    return probed.withColumn("bloom_hit", hit).drop("words", *bucket_cols)
