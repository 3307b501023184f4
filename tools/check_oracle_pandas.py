"""Pandas-path twin of tools/check_oracle.py — approximates the DRIVER's
correctness harness, which collects both sides into pandas and hashes
canonicalized cells. Round 1 proved the two paths disagree exactly where
cell TYPES diverge (Spark Decimal vs DuckDB float64, list cells pandas
cannot sort): this checker therefore compares, per column,

* the pandas dtype / python type CLASS on both sides, and
* values (floats to 9 dp, else str equality) after a full row sort,

so a query that would hash-mismatch or crash in the driver's pandas
canonicalizer fails HERE first. Usage:

    python tools/check_oracle_pandas.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_cell(v):
    import datetime
    import decimal

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, (list, tuple, dict, set)):
        raise TypeError(f"unhashable container cell: {type(v).__name__}")
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        raise TypeError("Decimal cell — driver hashes these differently from float64")
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_canon(pdf) -> list[str]:
    cols = sorted(pdf.columns)
    rows = []
    for t in pdf[cols].itertuples(index=False):
        rows.append("|".join(canon_cell(x) for x in t))
    return sorted(rows)


def main() -> int:
    import duckdb
    import numpy as np

    import __spark_entry__ as entrymod
    from sgb_data_validator_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir) and os.path.isdir(f"/root/testdata/{sf_dir}"):
        sf_dir = f"/root/testdata/{sf_dir}"  # allow bare "sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
            dpdf = con.execute(oracles[name]).df()
            # dtype-class parity per column: object-vs-float mismatches
            # are exactly what broke the round-1 driver rows
            for c in sorted(spdf.columns):
                sk, dk = spdf[c].dtype.kind, dpdf[c].dtype.kind
                # unify ints/floats-with-nulls kinds pandas produces
                grp = {"i": "num", "u": "num", "f": "num", "b": "bool",
                       "O": "obj", "M": "ts", "m": "td"}
                if grp.get(sk, sk) != grp.get(dk, dk):
                    raise TypeError(f"column {c}: spark dtype {spdf[c].dtype} vs duckdb {dpdf[c].dtype}")
            s_rows, d_rows = frame_canon(spdf), frame_canon(dpdf)
            ok = s_rows == d_rows
        except Exception as e:
            print(f"{name:32s} FAIL {type(e).__name__}: {e}")
            failures += 1
            continue
        print(f"{name:32s} {'OK  ' if ok else 'FAIL value-mismatch'} rows {len(s_rows)}/{len(d_rows)}")
        if not ok:
            failures += 1
            s_only = [x for x in s_rows if x not in set(d_rows)][:2]
            d_only = [x for x in d_rows if x not in set(s_rows)][:2]
            print(f"    spark-only: {s_only}\n    duck-only:  {d_only}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
