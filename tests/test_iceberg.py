"""Iceberg branch coverage.

The north-star storage layer is Iceberg (snapshot reads = oval's
read-before-overwrite, worker.go:43-75; metadata tables = V9 file-count
reconciliation). This sandbox has NO network (DNS to Maven Central fails)
and no iceberg-spark-runtime jar on disk, so the full round-trip test
skips with that reason; what CAN run without the jar — the format
dispatch, the identifier-vs-path routing, and Spark's data-source
resolution of the "iceberg" name — is executed unconditionally so the
branch never rots silently.

The SEMANTICS this round-trip would assert are no longer jar-blocked:
tests/test_snapshots.py runs the same three assertions (snapshot
read-before-overwrite, .files reconciliation, byte-identical old-snapshot
validation) against the jar-free versioned-manifest layer
(ovalspark/sources/snapshots.py), un-skipped; gate query q51 value-checks
the time-travel read against the DuckDB oracle.

To run the full test on a machine with the jar:
    spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.local.type=hadoop
    spark.sql.catalog.local.warehouse=/tmp/wh
"""

from __future__ import annotations

import pytest

from ovalspark.sources.tables import _iceberg_available, read_table, write_table


def test_auto_dispatch_routes_paths_to_parquet(spark, tmp_path, small_world):
    """fmt="auto" + a filesystem path must take the parquet branch
    regardless of jar availability (identifiers, not paths, are Iceberg)."""
    _, cat, _, _ = small_world
    p = str(tmp_path / "t")
    write_table(cat, p)  # auto → parquet (path)
    back = read_table(spark, p)
    assert back.count() == cat.count()
    assert set(back.columns) == set(cat.columns)


def test_iceberg_branch_reaches_format_resolution(spark, small_world):
    """With fmt="iceberg" forced and no jar, the branch must execute up to
    Spark's data-source lookup and fail THERE (not in our dispatch code):
    proves the call sites are live code, and documents the missing dep."""
    if _iceberg_available(spark):
        pytest.skip("iceberg runtime present — covered by the round-trip test")
    _, cat, _, _ = small_world
    with pytest.raises(Exception, match="(?i)iceberg"):
        read_table(spark, "local.db.t", fmt="iceberg").count()
    with pytest.raises(Exception, match="(?i)iceberg|catalog"):
        write_table(cat, "local.db.t", fmt="iceberg")


@pytest.mark.skipif(
    True,
    reason="iceberg-spark-runtime jar unreachable in this sandbox: no network "
    "(DNS to repo1.maven.org fails) and no jar on disk; enable on a machine "
    "with the jar via the confs in the module docstring",
)
def test_iceberg_round_trip_snapshot_and_metadata(spark, small_world):
    """Full Iceberg story: write TableSet as Iceberg, validate, overwrite,
    snapshot-read the pre-overwrite state (V8), reconcile counts against
    the .files metadata table (V9 via metadata, s3client.go:253-275)."""
    _, cat, docs, _ = small_world
    write_table(docs, "local.db.docs", fmt="iceberg")
    before = spark.sql("SELECT snapshot_id FROM local.db.docs.snapshots ORDER BY committed_at DESC LIMIT 1").collect()[0][0]
    write_table(docs.limit(10), "local.db.docs", fmt="iceberg")
    old = spark.read.option("snapshot-id", before).format("iceberg").load("local.db.docs")
    assert old.count() == docs.count()  # read-before-overwrite (V8)
    files = spark.sql("SELECT COUNT(*) FROM local.db.docs.files").collect()[0][0]
    assert files > 0  # LIST reconciliation source (V9)
