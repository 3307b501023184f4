"""Local stand-in for the driver's correctness gate: runs every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
against the same parquet, compares row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon_cell(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[tuple], col_order: list[int]) -> str:
    canon = sorted("|".join(_canon_cell(r[i]) for i in col_order) for r in rows)
    return hashlib.md5("\n".join(canon).encode()).hexdigest()


def main() -> int:
    import duckdb

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
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.execute(oracles[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
        except Exception as e:
            print(f"{name:32s} FAIL duckdb error: {e}")
            failures += 1
            continue
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        s_order = [scols.index(c) for c in sorted(scols)]
        d_order = [dcols.index(c) for c in sorted(dcols)]
        sh = value_hash(srows, s_order)
        dh = value_hash(drows, d_order)
        ok_h = sh == dh
        status = "OK  " if (ok_n and ok_c and ok_h) else "FAIL"
        print(f"{name:32s} {status} rows {len(srows)}/{len(drows)} cols={'=' if ok_c else f'{scols} vs {dcols}'} hash={'=' if ok_h else 'MISMATCH'}")
        if not (ok_n and ok_c and ok_h):
            failures += 1
            if not ok_h and ok_n and ok_c:
                sset = sorted("|".join(_canon_cell(r[i]) for i in s_order) for r in srows)
                dset = sorted("|".join(_canon_cell(r[i]) for i in d_order) for r in drows)
                sonly = [x for x in sset if x not in set(dset)][:3]
                donly = [x for x in dset if x not in set(sset)][:3]
                print(f"    spark-only: {sonly}")
                print(f"    duck-only:  {donly}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
