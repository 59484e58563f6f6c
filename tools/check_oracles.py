"""Validate every __spark_entry__ query against its DuckDB oracle.

Replicates the driver's comparison: row count, sorted column names, and
an order-insensitive value hash over stringified rows (floats repr'd
after float64 cast). Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


import os

EXACT = os.environ.get("ORACLE_EXACT", "0") == "1"


def norm_frame(df: pd.DataFrame) -> tuple:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype.kind == "f" and not EXACT:
            df[c] = df[c].astype("float64").round(9)
        df[c] = df[c].astype(str)
    rows = sorted(df.itertuples(index=False, name=None))
    return len(df), cols, hash(tuple(rows))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from onnxtr_spark.session import get_spark

    spark = get_spark("check_oracles", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(got)} rows  ({time.time() - t0:.1f}s)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        ng, cg, hg = norm_frame(got)
        nw, cw, hw = norm_frame(want)
        status = "OK  " if (ng, cg, hg) == (nw, cw, hw) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status}  {name}: spark {ng} rows, duckdb {nw} rows, cols {'=' if cg == cw else f'{cg} != {cw}'}, "
              f"hash {'=' if hg == hw else '!='}  ({time.time() - t0:.1f}s)")
        if status == "FAIL" and ng and nw and cg == cw:
            g = got[sorted(got.columns)].sort_values(sorted(got.columns)).head(5)
            w2 = want[sorted(want.columns)].sort_values(sorted(want.columns)).head(5)
            print("  spark head:\n", g.to_string(), "\n  duckdb head:\n", w2.to_string())

    spark.stop()
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
