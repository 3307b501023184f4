"""Temporal joins Spark lacks natively: as-of join and range join.

Neither exists in the reference (its records are independent —
`/root/reference/validate.py` checks rows one at a time) nor in Spark's
DataFrame API, but both are staples of event/transcript pipelines:

* **as-of join** — for each left row, the single most recent right row
  with the same key at or before the left row's timestamp (attribution,
  "state as of", slowly-changing-dimension lookup).
* **range join** — match right-side point events into left-side time
  intervals (context windows around incidents, session enrichment).

Scale shapes (the whole point of these implementations):

as_of_join is the union-tag + running-``last(ignoreNulls)`` window:
tag right rows 0 and left rows 1, union the two sides on a narrow
projection, sort each key's timeline once, and carry the latest right
payload forward. ONE hash shuffle on the key, no join operator at all —
the naive alternative (inequality theta-join + row_number) explodes to
|L|×|R| per key before pruning. Skew: a single hot key serializes into
one window task on the default path; ``bucket_us`` switches to the
IMPLEMENTED chunk+carry split (time-bucketed windows + a running carry
over per-bucket summaries — the temporal analog of
``operators.windows``' turn-index chunks), property-tested equal to
the single-window output.

range_join buckets time: each right point lands in exactly ONE bucket
of width ``bucket_us``; each left interval explodes into the buckets it
covers (⌈len/bucket⌉+1 rows — pick ``bucket_us`` ≈ the typical interval
length so the fan-out stays ~2×). The match becomes an equi-join on the
bucket id plus an exact residual filter, so Catalyst runs a plain hash
join — never a BroadcastNestedLoopJoin/cartesian, which is what Spark
falls back to for raw inequality predicates. A qualifying (interval,
point) pair meets in exactly one bucket (the point's), so no dedup pass
is needed. Diurnal-peak bucket skew is AQE skew-join territory
(split oversized partitions at runtime).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(c: Column) -> Column:
    """Epoch microseconds as bigint. unix_micros rejects TIMESTAMP_NTZ
    (what Spark 4 infers from the testdata parquet); the cast is a
    no-op for LTZ and interprets NTZ in the session timezone — callers
    pin UTC, matching the oracle's epoch_us over the stored micros."""
    return F.unix_micros(c.cast("timestamp"))


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_us: int | None = None,
    right_order: str | None = None,
    bucket_us: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``right_cols`` from the
    most recent right row with the same ``on`` key and
    ``right_ts <= left_ts`` (NULLs when none). Ties on ``right_ts``
    between right rows resolve to the greatest ``right_order``
    (defaults to the first of ``right_cols``) — deterministic output.
    ``tolerance_us`` bounds the lookback: matches older than
    ``left_ts - tolerance_us`` are discarded (payload NULLed).

    ``bucket_us`` switches on the SKEW-SPLIT path: identical output
    (property-tested), but the per-key window is chunked into time
    buckets with a carried last-payload, so one hot key (a conversation
    with 10^8 turns) becomes many bounded tasks instead of one serial
    sort — choose ``bucket_us`` so a bucket holds ~10^5-10^6 rows of
    the hottest key. Default (None) is the single-window fast path.

    The matched right timestamp is always exposed as ``__asof_ts`` so
    callers can compute gaps without re-joining.
    """
    order_col = right_order or right_cols[0]
    payload = F.struct(
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c) for c in right_cols],
    )
    payload_type = right.select(payload.alias("p")).schema[0].dataType

    lcols = left.columns
    l2 = left.select(
        *lcols,
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("bigint").alias("__o"),
        F.lit(None).cast(payload_type).alias("__p"),
    )
    r2 = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(order_col).cast("bigint").alias("__o"),
        payload.alias("__p"),
    )
    u = l2.unionByName(r2)
    # right rows sort BEFORE left rows at the same instant (side 0 < 1):
    # `right_ts <= left_ts` inclusive semantics. last() over the
    # running frame then yields the latest right payload seen so far.
    if bucket_us is None:
        w = (
            Window.partitionBy("__k")
            .orderBy("__t", "__side", "__o")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).where(
            F.col("__side") == 1
        )
    else:
        # skew-split: chunk each key's timeline into time buckets so no
        # single window task holds a hot key's full history (the same
        # chunk+carry idea as operators.windows, keyed by time because
        # as-of inputs have no dense index). Three bounded passes:
        #   1. per-(key, bucket) LAST right payload — a combinable
        #      max_by aggregate (map-side partial, no sort);
        #   2. carry for each bucket = running last over the per-bucket
        #      summaries STRICTLY BEFORE it — a window over
        #      #occupied-buckets rows, thousands of times smaller than
        #      the data;
        #   3. the running-last window from the simple path, but
        #      partitioned by (key, bucket) — task size is bounded by
        #      bucket occupancy — with the carry as the fallback for
        #      rows before their bucket's first right row.
        # The carry join is co-partitioned with the window keys, so the
        # whole thing is two narrow shuffles of the union frame's keys.
        u = u.withColumn("__b", F.floor(epoch_us(F.col("__t")) / bucket_us))
        per_bucket = (
            u.where(F.col("__side") == 0)
            .groupBy("__k", "__b")
            .agg(F.max_by("__p", F.struct("__t", "__o")).alias("__bp"))
        )
        # the carry scan must cover buckets holding only LEFT rows too —
        # a left row whose bucket has no right rows still looks back
        # through it — so the summary frame is every occupied (key,
        # bucket), with NULL summaries skipped by the ignorenulls last
        buckets = u.select("__k", "__b").distinct()
        wb = (
            Window.partitionBy("__k")
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            buckets.join(per_bucket, ["__k", "__b"], "left")
            .withColumn("__carry", F.last("__bp", ignorenulls=True).over(wb))
            .select("__k", "__b", "__carry")
        )
        win = (
            Window.partitionBy("__k", "__b")
            .orderBy("__t", "__side", "__o")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = (
            u.join(carry, ["__k", "__b"], "left")
            .withColumn(
                "__m",
                F.coalesce(F.last("__p", ignorenulls=True).over(win), F.col("__carry")),
            )
            .where(F.col("__side") == 1)
        )
    if tolerance_us is not None:
        in_tol = epoch_us(F.col("__m.__asof_ts")) >= (
            epoch_us(F.col("__t")) - F.lit(tolerance_us)
        )
        matched = matched.withColumn(
            "__m", F.when(in_tol, F.col("__m")).otherwise(F.lit(None).cast(payload_type))
        )
    return matched.select(
        *lcols,
        F.col("__m.__asof_ts").alias("__asof_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    start_us: Column,
    end_us: Column,
    right_ts: str,
    bucket_us: int,
    end_exclusive: bool = True,
) -> DataFrame:
    """Point-in-interval range join: pair each left row with every
    right row whose ``right_ts`` falls in ``[start_us, end_us)`` (or
    ``[..]`` when ``end_exclusive=False``); bounds are bigint epoch
    MICROSECOND columns over the left frame. Right columns are carried
    with a ``r_`` prefix; left rows with no qualifying right rows are
    dropped (inner semantics — wrap with a left join on the output key
    for outer counts-with-zero).
    """
    lb = left.withColumn("__start_us", start_us).withColumn("__end_us", end_us)
    lb = lb.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col("__start_us") / bucket_us),
                F.floor(F.col("__end_us") / bucket_us),
            )
        ),
    )
    rb = right.select(
        F.floor(epoch_us(F.col(right_ts)) / bucket_us).alias("__b"),
        epoch_us(F.col(right_ts)).alias("__r_us"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
    )
    upper = (
        F.col("__r_us") < F.col("__end_us")
        if end_exclusive
        else F.col("__r_us") <= F.col("__end_us")
    )
    return (
        lb.join(rb, "__b")
        .where((F.col("__r_us") >= F.col("__start_us")) & upper)
        .drop("__b", "__r_us", "__start_us", "__end_us")
    )
