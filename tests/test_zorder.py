"""Z-order layout: key correctness + the actual file-pruning win.

The claim behind operators/zorder.py is workload-level: a table sorted
on ONE key answers the other dimension's predicates by scanning every
file, while a z-ordered layout keeps min/max zones narrow in BOTH
dimensions, so the worst single-dimension query over the workload
touches a strict subset of files. This test writes the same rows in
three layouts (x-sorted, y-sorted, z-ordered), applies one x-selective
and one y-selective predicate, counts files surviving min/max pruning
— exactly the decision a parquet reader makes from footer stats — and
asserts the z layout beats each 1-D layout on its blind dimension."""

import pytest
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.zorder import z_value, zorder_by

N_FILES = 16
BITS = 8


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame([(5, 3), (0, 0), (255, 255)], ["x", "y"])
    rows = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", z_value(F.col("x"), F.col("y"), 8).alias("z")).collect()
    }
    # x=5 (101), y=3 (011) → z = y2x2 y1x1 y0x0 = 0 1 1 0 1 1 = 0b011011 + interleave
    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in rows.items():
        assert z == morton(x, y)


def test_z_value_validates_bits(spark):
    df = spark.createDataFrame([(1, 1)], ["x", "y"])
    for bad in (0, 32, -1, 2.5):
        with pytest.raises(ValueError):
            z_value(F.col("x"), F.col("y"), bad)


def _write_layouts(spark, tmp):
    # sf0.01: 10k rows, 150 users → xb spans 0..149 (the sf0.001 user
    # domain is too narrow to tile)
    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select(
            "event_id",
            (F.col("user_id") % (1 << BITS)).alias("xb"),
            (
                F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
                % (1 << BITS)
            ).alias("yb"),
        )
    )
    zorder_by(ev, "xb", "yb", bits=BITS, n_files=N_FILES).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/z")
    ev.repartitionByRange(N_FILES, "xb").sortWithinPartitions("xb").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/xsort")
    ev.repartitionByRange(N_FILES, "yb").sortWithinPartitions("yb").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/ysort")
    return ev


def _files_touched(spark, path, x_rng=None, y_rng=None):
    stats = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("xb").alias("x0"), F.max("xb").alias("x1"),
            F.min("yb").alias("y0"), F.max("yb").alias("y1"),
        )
        .collect()
    )
    n = 0
    for r in stats:
        ok = True
        if x_rng is not None:
            ok &= r["x0"] <= x_rng[1] and r["x1"] >= x_rng[0]
        if y_rng is not None:
            ok &= r["y0"] <= y_rng[1] and r["y1"] >= y_rng[0]
        n += ok
    return n, len(stats)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    tmp = str(tmp_path)
    ev = _write_layouts(spark, tmp)
    x_rng, y_rng = (64, 95), (6, 11)

    zx, zn = _files_touched(spark, f"{tmp}/z", x_rng=x_rng)
    zy, _ = _files_touched(spark, f"{tmp}/z", y_rng=y_rng)
    xs_y, xn = _files_touched(spark, f"{tmp}/xsort", y_rng=y_rng)
    ys_x, yn = _files_touched(spark, f"{tmp}/ysort", x_rng=x_rng)
    # rangePartitioner may merge sparse ranges; denominators are per-layout
    assert zn >= N_FILES // 2 and xn >= N_FILES // 2 and yn >= N_FILES // 2

    # each 1-D layout is blind on its unsorted dimension (every file
    # spans the other key's whole domain)...
    assert xs_y == xn
    assert ys_x == yn
    # ...while the z layout prunes BOTH single-dimension predicates,
    # and beats each 1-D layout on that layout's blind dimension
    assert zx < zn and zx < ys_x
    assert zy < zn and zy < xs_y

    # pruning must be sound: rows inside the box are identical per layout
    want = sorted(
        r["event_id"]
        for r in ev.where(
            F.col("xb").between(*x_rng) & F.col("yb").between(*y_rng)
        ).collect()
    )
    for layout in ("z", "xsort", "ysort"):
        got = sorted(
            r["event_id"]
            for r in spark.read.parquet(f"{tmp}/{layout}")
            .where(F.col("xb").between(*x_rng) & F.col("yb").between(*y_rng))
            .collect()
        )
        assert got == want
