"""as-of join and range join: semantics + the physical shapes they
exist for (single-shuffle window, hash join instead of nested-loop)."""

import datetime

from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.temporal import as_of_join, range_join
from tests.test_plans import plan_of


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:10:00")),
            (2, 10, _ts("2024-01-01 00:00:00")),  # before any right row
            (3, 20, _ts("2024-01-01 00:05:00")),  # equal-ts right row qualifies
            (4, 30, _ts("2024-01-01 00:05:00")),  # key with no right rows
        ],
        "lid bigint, k bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 00:04:00")),
            (101, 10, _ts("2024-01-01 00:09:00")),  # latest before lid=1
            (102, 10, _ts("2024-01-01 00:11:00")),  # after lid=1 — excluded
            (103, 20, _ts("2024-01-01 00:05:00")),  # tie ts, lower id
            (104, 20, _ts("2024-01-01 00:05:00")),  # tie ts, higher id wins
        ],
        "rid bigint, k bigint, ts timestamp",
    )
    return left, right


def test_asof_basic_semantics(spark):
    left, right = _frames(spark)
    out = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["rid"])
    got = {r["lid"]: r["rid"] for r in out.collect()}
    assert got == {1: 101, 2: None, 3: 104, 4: None}


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = as_of_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["rid"],
        tolerance_us=30_000_000,  # 30 s: lid=1's match at -60 s goes stale
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    assert got == {1: None, 2: None, 3: 104, 4: None}


def test_asof_exposes_matched_ts(spark):
    left, right = _frames(spark)
    out = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["rid"])
    row = {r["lid"]: r for r in out.collect()}[1]
    assert row["__asof_ts"] == _ts("2024-01-01 00:09:00")


def test_asof_plan_is_single_window_no_join(spark):
    left, right = _frames(spark)
    plan = plan_of(
        as_of_join(left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["rid"])
    )
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree and "CartesianProduct" not in tree
    assert tree.count("Window") == 1


def test_range_join_boundaries_and_bucket_spans(spark):
    # interval [100s, 200s) in micros, bucket 60s: spans 3 buckets
    left = spark.createDataFrame([(1,)], "lid bigint")
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:01:39")),  # 99 s  — below start
            (2, _ts("2024-01-01 00:01:40")),  # 100 s — inclusive start
            (3, _ts("2024-01-01 00:02:30")),  # 150 s — inside, other bucket
            (4, _ts("2024-01-01 00:03:20")),  # 200 s — exclusive end
        ],
        "rid bigint, ts timestamp",
    )
    base = int(_ts("2024-01-01 00:00:00").replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)
    out = range_join(
        left,
        right,
        start_us=F.lit(base + 100_000_000),
        end_us=F.lit(base + 200_000_000),
        right_ts="ts",
        bucket_us=60_000_000,
    )
    assert sorted(r["r_rid"] for r in out.collect()) == [2, 3]
    inclusive = range_join(
        left, right,
        start_us=F.lit(base + 100_000_000), end_us=F.lit(base + 200_000_000),
        right_ts="ts", bucket_us=60_000_000, end_exclusive=False,
    )
    assert sorted(r["r_rid"] for r in inclusive.collect()) == [2, 3, 4]


def test_range_join_plan_is_hash_join_not_nested_loop(spark):
    left, right = _frames(spark)
    plan = plan_of(
        range_join(
            left.select("lid", "ts"),
            right.select("rid", "ts"),
            start_us=F.unix_micros("ts") - F.lit(300_000_000),
            end_us=F.unix_micros("ts"),
            right_ts="ts",
            bucket_us=300_000_000,
        )
    )
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" not in tree and "CartesianProduct" not in tree
    assert "HashJoin" in tree or "SortMergeJoin" in tree


def _brute_asof(left_rows, right_rows, tolerance_us=None):
    """O(|L|·|R|) reference: latest right (ts, rid) with ts <= left ts
    (max rid on ties), within tolerance."""
    out = {}
    for lid, k, lt in left_rows:
        best = None
        for rid, rk, rt in right_rows:
            if rk == k and rt <= lt and (tolerance_us is None or (lt - rt).total_seconds() * 1e6 <= tolerance_us):
                c = (rt, rid)
                if best is None or c > best:
                    best = c
        out[lid] = best[1] if best else None
    return out


def test_asof_modes_match_bruteforce_randomized(spark):
    """Property check: the single-window path, the bucketized skew-split
    path (several bucket widths, including ones smaller than the data
    span so carries really happen), and the brute-force reference all
    agree on pseudo-random inputs with ties and sparse keys."""
    import random

    rnd = random.Random(20260817)
    base = _ts("2024-01-01 00:00:00")
    left_rows = [
        (i, rnd.randint(0, 4), base + datetime.timedelta(seconds=rnd.randint(0, 5000)))
        for i in range(120)
    ]
    right_rows = [
        (1000 + i, rnd.randint(0, 5), base + datetime.timedelta(seconds=rnd.randint(0, 5000)))
        for i in range(150)
    ]
    # force exact-instant ties between sides and within the right side
    right_rows += [(2000, 0, left_rows[0][2]), (2001, 0, left_rows[0][2])]
    left = spark.createDataFrame(left_rows, "lid bigint, k bigint, ts timestamp")
    right = spark.createDataFrame(right_rows, "rid bigint, k bigint, ts timestamp")

    for tol in (None, 600_000_000):
        expected = _brute_asof(left_rows, right_rows, tol)
        for bucket in (None, 450_000_000, 60_000_000, 7_000_000_000):
            out = as_of_join(
                left, right, on="k", left_ts="ts", right_ts="ts",
                right_cols=["rid"], tolerance_us=tol, bucket_us=bucket,
            )
            got = {r["lid"]: r["rid"] for r in out.collect()}
            assert got == expected, f"bucket={bucket} tol={tol}"


def test_asof_bucketized_plan_windows_are_bucket_keyed(spark):
    """The skew-split path must partition its big window by (key,
    bucket) — the whole point — with the carry window running over the
    tiny per-bucket summary frame."""
    left, right = _frames(spark)
    plan = plan_of(
        as_of_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_cols=["rid"], bucket_us=60_000_000,
        )
    )
    tree = plan.split("\n\n")[0]
    # exactly two windows: the bucketed running-last over the union and
    # the carry scan over the per-bucket summaries — never a third,
    # key-only window (that would be the serial hot-key task back)
    assert tree.count("Window") == 2
    # the big window's spec is keyed by (key, bucket) — the detail
    # section prints the windowspecdefinition arguments
    assert "windowspecdefinition(__k" in plan and "__b" in plan


# --- adversarial boundaries for the bucketized skew-split ------------------
#
# Each case is named for the carry-semantics adversary it pins; the
# invariant is always: bucketized output == single-window fast path,
# row for row. BUCKET = 60 s; timestamps are chosen so epoch_us values
# land exactly where the case name says.

_BUCKET_US = 60_000_000  # 1 minute


def _asof_both_paths(spark, left_rows, right_rows, tolerance_us=None):
    left = spark.createDataFrame(left_rows, "lid bigint, k bigint, ts timestamp")
    right = spark.createDataFrame(right_rows, "rid bigint, k bigint, ts timestamp")
    kw = dict(on="k", left_ts="ts", right_ts="ts", right_cols=["rid"],
              tolerance_us=tolerance_us)
    fast = {r["lid"]: (r["rid"], r["__asof_ts"])
            for r in as_of_join(left, right, **kw).collect()}
    bucketed = {r["lid"]: (r["rid"], r["__asof_ts"])
                for r in as_of_join(left, right, bucket_us=_BUCKET_US, **kw).collect()}
    return fast, bucketed


def test_asof_bucketized_right_rows_exactly_on_bucket_edges(spark):
    """Right rows at exact bucket-boundary instants (epoch_us % bucket
    == 0) must belong to the bucket they START (floor), and a left row
    at the same instant in the same bucket still sees them (side
    ordering), while a left row one microsecond earlier must not."""
    edge = _ts("2024-01-01 00:02:00")       # exactly bucket 2 start
    rows_r = [(100, 10, _ts("2024-01-01 00:01:00")),   # bucket 1 edge
              (101, 10, edge)]                          # bucket 2 edge
    rows_l = [
        (1, 10, edge),                                          # same instant ⇒ 101
        (2, 10, edge - datetime.timedelta(microseconds=1)),     # 1 µs before ⇒ 100
        (3, 10, _ts("2024-01-01 00:03:00")),                    # next edge ⇒ 101
        (4, 10, _ts("2024-01-01 00:00:59")),                    # before bucket-1 edge ⇒ None
    ]
    fast, bucketed = _asof_both_paths(spark, rows_l, rows_r)
    assert bucketed == fast
    assert {k: v[0] for k, v in bucketed.items()} == {1: 101, 2: 100, 3: 101, 4: None}


def test_asof_bucketized_carry_spans_many_empty_buckets(spark):
    """A left row whose only match is MANY buckets back (every bucket
    between them empty) must still get it through the carried summary;
    with a tolerance shorter than the gap the match must null out —
    in both paths identically."""
    rows_r = [(100, 10, _ts("2024-01-01 00:00:30"))]   # bucket 0
    rows_l = [(1, 10, _ts("2024-01-01 00:09:30"))]     # bucket 9 — 8 empty buckets between
    fast, bucketed = _asof_both_paths(spark, rows_l, rows_r)
    assert bucketed == fast and bucketed[1][0] == 100
    # tolerance 2 min < 9 min gap ⇒ stale, nulled
    fast_t, bucketed_t = _asof_both_paths(
        spark, rows_l, rows_r, tolerance_us=120_000_000
    )
    assert bucketed_t == fast_t and bucketed_t[1] == (None, None)


def test_asof_bucketized_left_only_buckets_before_any_right_row(spark):
    """Left rows occupying buckets BEFORE the key's first right row:
    their buckets appear in the carry scan (they must — otherwise the
    carry skips them) with a NULL carry, and the match is NULL, not a
    row borrowed from a later bucket."""
    rows_r = [(100, 10, _ts("2024-01-01 00:05:30"))]   # bucket 5
    rows_l = [
        (1, 10, _ts("2024-01-01 00:00:10")),  # bucket 0, left-only
        (2, 10, _ts("2024-01-01 00:02:10")),  # bucket 2, left-only
        (3, 10, _ts("2024-01-01 00:05:10")),  # bucket 5, before its right row
        (4, 10, _ts("2024-01-01 00:06:10")),  # bucket 6, after ⇒ 100
    ]
    fast, bucketed = _asof_both_paths(spark, rows_l, rows_r)
    assert bucketed == fast
    assert {k: v[0] for k, v in bucketed.items()} == {1: None, 2: None, 3: None, 4: 100}


def test_asof_bucketized_tie_at_edge_prefers_highest_order(spark):
    """Two right rows tied at the SAME bucket-edge instant: the
    max_by((__t, __o)) per-bucket summary must pick the same winner as
    the fast path's (__t, __side, __o) sort — the greatest order key."""
    edge = _ts("2024-01-01 00:02:00")
    rows_r = [(100, 10, edge), (105, 10, edge), (103, 10, edge)]
    rows_l = [(1, 10, edge), (2, 10, _ts("2024-01-01 00:04:00"))]
    fast, bucketed = _asof_both_paths(spark, rows_l, rows_r)
    assert bucketed == fast
    assert {k: v[0] for k, v in bucketed.items()} == {1: 105, 2: 105}
