"""Bucketed-table layout for shuffle-free co-located joins.

At 10^12 turns the recurring joins — turns ⋈ conversation manifest on
conv_id, run-over-run diffs on (conv_id, turn_idx) — each pay a full
shuffle of the fact side per run if the tables live as plain parquet.
Hash-bucketing BOTH sides on the join key at write time (Spark's
`bucketBy` + `sortBy`) makes every later join a zero-exchange
SortMergeJoin: the scan itself satisfies the join's required
distribution and ordering, so validation re-runs, resume passes and
regression diffs never move the fact again. This is the standard
warehouse-side amortization: one shuffle at ingest, none per query.

The reference has no analog (it re-fetches items per run —
/root/reference/validate.py walks the API collection each time); this
module is the Spark-native replacement for that per-run re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external bucketed table (parquet at
    ``path``, registered as ``table``). ``n_buckets`` is a layout
    contract: joins are exchange-free only between tables bucketed on
    the same keys with the SAME bucket count (or an exact multiple,
    under spark.sql.bucketing.coalesceBucketsInJoin). Size it so one
    bucket ≈ one task's worth of data at full scale — for 10^12 turns
    at ~200 MB/bucket that is O(10^4–10^5) buckets, well inside
    metastore limits."""
    # Align write tasks with buckets first: without this every writer
    # task emits up to n_buckets files (tasks × buckets small-files
    # blowout at scale), and — the subtle half — Spark only trusts the
    # in-bucket sortBy order when a bucket is ONE file, so multi-file
    # buckets silently re-Sort in every downstream SortMergeJoin.
    # repartition uses the same Murmur3 hash as bucketBy, so the
    # alignment is exact: one task ⇒ one bucket ⇒ one file.
    writer = (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if partition_cols:
        # directory partitioning (pruning) composes with bucketing
        # (co-location): each task still owns one bucket, writing one
        # file per (partition, bucket) — files = parts × buckets, the
        # intended layout, not a small-file blowout
        writer = writer.partitionBy(*partition_cols)
    # sortBy within buckets lets SortMergeJoin skip its Sort too —
    # note Spark ≥3.0 only surfaces the scan's sort order under
    # spark.sql.legacy.bucketedTableScan.outputOrdering=true
    # (SPARK-28595: the single-file-per-bucket check it requires costs
    # a listing); the repartition above guarantees that precondition,
    # so readers that pay the conf get sort-free merges. Without the
    # conf the join is still exchange-free — the shuffle, not the
    # in-partition sort, is the scale cost.
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata — only the
    catalog path (``spark.table``) carries bucketing into the plan;
    ``spark.read.parquet(path)`` on the same files would silently
    drop the layout and reintroduce the join shuffle."""
    return spark.table(table)
