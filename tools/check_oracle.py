"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names/types, and order-insensitive values.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from arachne_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return (
        df.sort_values(by=list(df.columns))
        .reset_index(drop=True)
    )


def main() -> None:
    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{SF_DIR}/{t}.parquet'"
        )
    spark = get_spark("oracle-check", master="local[8]",
                      shuffle_partitions=16)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)})")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {str(ex)[:300]}")
            continue
        if len(got) != len(want):
            failures.append(name)
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            continue
        if sorted(got.columns) != sorted(want.columns):
            failures.append(name)
            print(
                f"FAIL {name}: cols {sorted(got.columns)} "
                f"vs {sorted(want.columns)}"
            )
            continue
        g, w = canon(got), canon(want)
        gt, wt = list(map(str, g.dtypes)), list(map(str, w.dtypes))
        if gt != wt:
            print(f"note {name}: dtypes {gt} vs {wt}")
        if not g.equals(w):
            neq = (g != w).any(axis=1)
            failures.append(name)
            print(f"FAIL {name}: {neq.sum()} differing rows, e.g.")
            print(pd.concat(
                [g[neq].head(3), w[neq].head(3)],
                keys=["spark", "duck"],
            ))
            continue
        print(f"ok   {name}: {len(got)} rows match")
    spark.stop()
    print("FAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
