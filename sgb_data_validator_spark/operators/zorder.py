"""Z-order (Morton) layout keys: multi-dimensional data clustering so
min/max zone pruning works on BOTH predicate columns at once.

A table sorted on one key answers range scans on that key with tight
per-file min/max zones, but the second dimension's zones span the whole
domain — every file survives pruning. Interleaving the bits of two
bucketized keys (Morton 1966; the technique behind Delta/Iceberg
OPTIMIZE ZORDER and multi-dim zone maps) makes files cluster in BOTH
dimensions: a 2-D range predicate then intersects only the files whose
(min, max) z-range crosses the query box, so scan I/O falls from
"all files" to O(box perimeter) files.

Scale shape: the z-value is pure integer bit math on the unshuffled
scan (codegen; ~2·bits shift/mask/or terms folded into one projection),
so the only cost of laying out 10^12 rows this way is the sort/
repartitionByRange that any layout rewrite already pays. The expression
uses only shiftleft/shiftright/& — identical semantics on any engine,
so the DuckDB oracle replays keys bit-for-bit.

tests/test_zorder.py measures the actual pruning win: the same rows
written 16-files-sorted-by-z vs sorted-by-one-key, same 2-D box
predicate, files surviving min/max pruning counted on both layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns: bit i of ``x`` lands at position 2i, bit i of
    ``y`` at 2i+1. Callers bucketize to the ``bits`` budget first
    (e.g. ``col % (1 << bits)``); values outside it simply alias,
    which widens zones but never breaks correctness."""
    if not isinstance(bits, int) or not (1 <= bits <= 31):
        raise ValueError(f"bits must be an int in [1, 31], got {bits!r}")
    xi = x.cast("bigint")
    yi = y.cast("bigint")
    z = F.lit(0).cast("bigint")
    one = F.lit(1).cast("bigint")
    for i in range(bits):
        # Column.__or__ is BOOLEAN or — integer bit-merge needs bitwiseOR
        xbit = F.shiftright(xi, i).bitwiseAND(one)
        ybit = F.shiftright(yi, i).bitwiseAND(one)
        z = z.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return z


def zorder_by(
    df: DataFrame, x_col: str, y_col: str, bits: int = 16, n_files: int = 16
) -> DataFrame:
    """Return ``df`` with a ``zval`` column, range-partitioned and
    sorted by it — the frame a layout rewrite writes out so that each
    output file covers a compact z-range (a square-ish tile in (x, y)
    space) and min/max zone pruning bites on both columns."""
    with_z = df.withColumn(
        "zval", z_value(F.col(x_col) % (1 << bits), F.col(y_col) % (1 << bits), bits)
    )
    return with_z.repartitionByRange(n_files, "zval").sortWithinPartitions("zval")
