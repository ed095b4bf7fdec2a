"""Local stand-in for the driver's DuckDB oracle compare.

Runs every registry query on Spark and its oracle SQL on DuckDB over the
same sf dir; compares row count, column names, and an order-insensitive
value multiset (floats via repr of rounded values). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, ".")

import duckdb

from aktuell_spark.queries import EXTRA_QUERIES, QUERIES, TABLES
from aktuell_spark.session import get_spark


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = Counter()
    for row in rows:
        out[tuple(repr(row[i]) for i in order)] += 1
    return out


def main():
    args = [a for a in sys.argv[1:] if a != "--extra"]
    use_extra = "--extra" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    registry = {**QUERIES, **EXTRA_QUERIES}
    names = args[1:] or list(EXTRA_QUERIES if use_extra else QUERIES)
    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name in names:
        fn, sql = registry[name]
        if sql is None:
            df = fn(spark, sf_dir)
            print(f"{name:24s} rows-only: {df.count()} rows")
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = False
        if ok_cols and ok_count:
            a, b = normalize(srows, scols), normalize(drows, dcols)
            ok_vals = a == b
            if not ok_vals:
                diff_a = list((a - b).items())[:3]
                diff_b = list((b - a).items())[:3]
                print(f"{name:24s} VALUE MISMATCH\n  spark-only: {diff_a}\n  duck-only:  {diff_b}")
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failed.append(name)
        print(
            f"{name:24s} {status}  rows {len(srows)}/{len(drows)}  "
            f"cols={'OK' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'}"
        )
    print("\nFAILED:" if failed else "\nALL OK", failed if failed else "")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
