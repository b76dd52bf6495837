#!/usr/bin/env python3
"""Local replica of the driver's correctness compare.

Usage: selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB over <sfDir>/*.parquet
views, then compares schema (column names sorted) and cell values.
This is a dev tool only — NOT part of the Scala library.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_rows(tbl, cols):
    data = [tbl.column(c).to_pylist() for c in cols]
    return [tuple(norm(x) for x in row) for row in zip(*data)]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: schema spark={s_cols} duck={d_cols}")
            failures += 1
            continue
        s_rows = table_rows(spark_tbl, s_cols)
        d_rows = table_rows(duck, s_cols)
        if s_rows == d_rows:
            print(f"OK   {name}: {len(s_rows)} rows")
        else:
            failures += 1
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                    break
            else:
                n = min(len(s_rows), len(d_rows))
                print(f"  common prefix equal; extra rows from {n}:")
                print(f"    spark={s_rows[n:n+2]}\n    duck ={d_rows[n:n+2]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
