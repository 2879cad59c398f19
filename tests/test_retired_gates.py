"""Value checks for gates retired from the driver's 50-row correctness
window in round 9 (see __spark_entry__.RETIRED_GATES).

Each retired gate is subsumed by a surviving driver gate, but we keep
the exact Spark-vs-DuckDB compare here so retirement never silently
drops value coverage: same discipline as the driver (row count, column
names, order-insensitive values).

Runs at sf0.001 to stay fast; tools/check_oracle.py can re-run the same
gates at sf0.01 on demand.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_retired_registry_shape():
    live = entrymod.queries()
    retired = entrymod.retired_queries()
    # the driver records at most 50 rows; every live gate must fit
    assert len(live) == 50
    assert set(retired) == set(entrymod.RETIRED_GATES)
    assert not set(live) & set(retired)
    # oracle key parity on both sides
    assert set(entrymod.oracle_sql()) == set(live)
    assert set(entrymod.retired_oracle_sql()) == set(retired)


@pytest.mark.parametrize("name", sorted(entrymod.RETIRED_GATES))
def test_retired_gate_matches_oracle(name, spark, duck):
    entrymod.GATE_SF_DIR = SF_DIR
    fn = entrymod.retired_queries()[name]
    sql = entrymod.retired_oracle_sql()[name]
    spd = fn(spark, SF_DIR).toPandas()
    dpd = duck.execute(sql).df()
    assert sorted(spd.columns) == sorted(dpd.columns), name
    assert len(spd) == len(dpd), f"{name}: spark={len(spd)} duck={len(dpd)}"
    a, b = _canon(spd), _canon(dpd)
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            pd.testing.assert_series_equal(
                a[c].astype(float), b[c].astype(float),
                check_exact=False, rtol=1e-9, atol=1e-12, check_names=False,
            )
        else:
            assert a[c].astype(str).tolist() == b[c].astype(str).tolist(), (
                f"{name}: column {c} differs"
            )
