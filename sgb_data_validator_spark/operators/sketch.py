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
