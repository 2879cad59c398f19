"""Local replica of the driver's correctness gate: run every
__spark_entry__ query at a given sf, run its DuckDB oracle, compare
row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from ovalspark.session import get_spark

TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # oracles that read query-materialized parquet key their dir by sf_dir
    entrymod.GATE_SF_DIR = sf_dir
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    fails = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERROR {str(e)[:300]}")
            fails += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(spd)} rows) OK" if len(spd) >= 0 else "??")
            continue
        try:
            dpd = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {str(e)[:300]}")
            fails += 1
            continue
        if sorted(spd.columns) != sorted(dpd.columns):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(spd.columns)} duck={sorted(dpd.columns)}")
            fails += 1
            continue
        if len(spd) != len(dpd):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(spd)} duck={len(dpd)}")
            fails += 1
            continue
        a, b = canon(spd), canon(dpd)
        # the driver's value hash is REPRESENTATION-sensitive: an int64 column
        # on one side rendered as float64 on the other (DuckDB HUGEINT sums)
        # hash-mismatches even when values are equal. Flag dtype-kind drift.
        kind_drift = [
            c for c in a.columns if a[c].dtype.kind != b[c].dtype.kind
        ]
        if kind_drift:
            print(
                f"{name}: DTYPE-KIND MISMATCH (driver hash would fail): "
                + ", ".join(f"{c} spark={a[c].dtype} duck={b[c].dtype}" for c in kind_drift)
            )
            fails += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"{name}: OK ({len(spd)} rows)")
        except AssertionError as e:
            print(f"{name}: VALUE MISMATCH")
            diff = (a != b)
            for c in a.columns:
                if diff[c].any():
                    i = diff[c].idxmax()
                    print(f"   col {c}: spark={a[c][i]!r} duck={b[c][i]!r} (row {i}, {int(diff[c].sum())} diffs)")
            fails += 1
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
