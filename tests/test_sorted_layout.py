"""Clustered layout (snapshot_write sort_by + sort_rewrite): disjoint
per-file bounds make manifest pruning O(selected) files — the scalable
answer to point/range lookups at 10^6 files, where every file of a
hash layout spans the whole key range and min/max skipping is useless."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ovalspark.sources.snapshots import (
    load_manifest,
    prune_files,
    snapshot_delete,
    snapshot_read,
    snapshot_write,
    sort_rewrite,
)


def _docs(spark, n=400):
    # shuffled ids so an unsorted layout really does span the key range
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.xxhash64("id") % 1000).alias("v"),
    ).orderBy(F.xxhash64("id", F.lit(7)))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sorted_write_prunes_to_selected_range(spark, tmp_path):
    unsorted = str(tmp_path / "u")
    snapshot_write(_docs(spark).repartition(8), unsorted)
    srt = str(tmp_path / "s")
    snapshot_write(_docs(spark).repartition(8), srt, sort_by="doc_id")

    m = load_manifest(srt)
    assert m["sort_by"] == ["doc_id"]
    n_files = len(m["files"])
    assert n_files == 8
    # the same point lookup: sorted layout plans O(1) files, unsorted O(all)
    assert len(prune_files(srt, conditions=("doc_id", 200, 210))) <= 2
    assert len(prune_files(unsorted, conditions=("doc_id", 200, 210))) == 8
    # pruned read returns exactly the range's rows
    got = snapshot_read(spark, srt, prune=("doc_id", 200, 210)).filter(
        "doc_id between 200 and 210"
    )
    assert got.count() == 11
    assert _rows(snapshot_read(spark, srt)) == _rows(_docs(spark))


def test_sorted_write_validates_columns(spark, tmp_path):
    with pytest.raises(ValueError, match="sort_by column"):
        snapshot_write(_docs(spark), str(tmp_path / "t"), sort_by=["nope"])


def test_sort_rewrite_clusters_and_materializes(spark, tmp_path):
    """sort_rewrite re-clusters a hash-laid-out table AND folds pending
    merge-on-read filters away in the same pass."""
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark).repartition(8), root)
    snapshot_delete(spark, root, "v % 10 = 0", strategy="merge-on-read")
    expect = _rows(snapshot_read(spark, root))

    sid = sort_rewrite(spark, root, "doc_id", target_file_mb=1)
    m = load_manifest(root, sid)
    assert m["sort_by"] == ["doc_id"] and m["operation"] == "replace"
    assert "row_filters" not in m
    assert m["materialized_filters"] == 1
    assert _rows(snapshot_read(spark, root)) == expect
    # clustered: a point prune now touches at most a boundary pair
    if len(m["files"]) > 2:
        assert len(prune_files(root, conditions=("doc_id", 42, 42))) <= 2
    # time travel to the pre-rewrite (filtered) state still works
    assert _rows(snapshot_read(spark, root, snapshot_id=2)) == expect


def test_sort_rewrite_unknown_column_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark), root)
    with pytest.raises(ValueError, match="cluster column"):
        sort_rewrite(spark, root, "nope")


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """Morton clustering: per-file bounds tighten on BOTH interleaved
    columns, so a range prune on EITHER skips files — lexicographic sort
    serves only its leading column."""
    n = 65536
    grid = spark.range(n).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
        F.col("id").alias("doc_id"),
        # incompressible padding so target_file_mb=1 yields many files
        F.sha2(F.concat(F.lit("pad"), F.col("id").cast("string")), 512).alias("pad"),
    ).orderBy(F.xxhash64("id"))  # shuffled input

    lex = str(tmp_path / "lex")
    snapshot_write(grid.repartition(16), lex)
    sort_rewrite(spark, lex, sort_by=["x", "y"], target_file_mb=1)
    zo = str(tmp_path / "zo")
    snapshot_write(grid.repartition(16), zo)
    sid = sort_rewrite(spark, zo, zorder=["x", "y"], target_file_mb=1)
    assert load_manifest(zo, sid)["zorder"] == ["x", "y"]

    n_files = len(load_manifest(zo, sid)["files"])
    assert n_files >= 8  # enough files for skipping to be visible

    # leading column: both layouts prune well
    assert len(prune_files(zo, conditions=("x", 10, 12))) < n_files
    # SECOND column: z-order prunes, lexicographic cannot
    z_y = len(prune_files(zo, conditions=("y", 10, 12)))
    lex_y = len(prune_files(lex, conditions=("y", 10, 12)))
    assert z_y < n_files
    assert lex_y == len(load_manifest(lex)["files"])  # every file survives
    # values unharmed
    got = snapshot_read(spark, zo, prune=("y", 10, 12)).filter("y between 10 and 12")
    assert got.count() == 3 * 256
    assert snapshot_read(spark, zo).count() == n
    assert snapshot_read(spark, zo).exceptAll(grid).count() == 0


def test_zorder_rejects_strings_and_bad_arity(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_write(
        spark.range(10).select(F.col("id"), F.lit("s").alias("s")), root
    )
    with pytest.raises(ValueError, match="NUMERIC"):
        sort_rewrite(spark, root, zorder=["id", "s"])
    with pytest.raises(ValueError, match="2-4"):
        sort_rewrite(spark, root, zorder=["id"])
    with pytest.raises(ValueError, match="exactly one"):
        sort_rewrite(spark, root, sort_by="id", zorder=["id", "id"])
    with pytest.raises(ValueError, match="exactly one"):
        sort_rewrite(spark, root)


def test_zorder_timestamp_and_date_columns(spark, tmp_path):
    """Temporal columns z-order through their epoch form (date cannot
    cast to double in Spark, and python float() on collected datetime
    extremes raises — both crashed the original scaling pass)."""
    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id") * 3600).alias("ts"),
        F.date_add(F.lit("2020-01-01").cast("date"), (F.col("id") % 365).cast("int")).alias("d"),
        (F.col("id") % 512).alias("v"),
        F.sha2(F.concat(F.lit("pad"), F.col("id").cast("string")), 512).alias("pad"),
    ).orderBy(F.xxhash64("id"))
    root = str(tmp_path / "t")
    snapshot_write(df.repartition(8), root)
    sid = sort_rewrite(spark, root, zorder=["ts", "v"], target_file_mb=1)
    assert load_manifest(root, sid)["zorder"] == ["ts", "v"]
    assert snapshot_read(spark, root).count() == n
    assert snapshot_read(spark, root).exceptAll(df).count() == 0
    # date as a zorder dimension also works
    sid2 = sort_rewrite(spark, root, zorder=["d", "v"], target_file_mb=1)
    assert load_manifest(root, sid2)["zorder"] == ["d", "v"]
    assert snapshot_read(spark, root).exceptAll(df).count() == 0


def test_zvalue_four_columns_stays_positive(spark):
    """bits*k must stay below the long sign bit: with 4 columns the
    interleave uses 15 bits, so even all-max codes yield a positive
    z-value (16 bits would shift dimension 3 into bit 63 and split the
    Morton curve at the sign)."""
    from ovalspark.sources.snapshots import _zvalue_expr

    bits = min(16, 63 // 4)
    assert bits == 15
    hi = (1 << bits) - 1
    df = spark.range(1).select(
        *[F.lit(hi).cast("long").alias(f"c{i}") for i in range(4)]
    )
    z = df.select(_zvalue_expr([F.col(f"c{i}") for i in range(4)], bits).alias("z"))
    val = z.collect()[0]["z"]
    assert val > 0
    assert val == (1 << (bits * 4)) - 1  # all interleaved bits set, none lost


def test_zorder_four_columns_end_to_end(spark, tmp_path):
    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 8).alias("a"),
        ((F.col("id") / 8) % 8).cast("long").alias("b"),
        ((F.col("id") / 64) % 8).cast("long").alias("c"),
        ((F.col("id") / 512) % 8).cast("long").alias("d"),
        F.col("id").alias("doc_id"),
        F.sha2(F.concat(F.lit("pad"), F.col("id").cast("string")), 512).alias("pad"),
    ).orderBy(F.xxhash64("id"))
    root = str(tmp_path / "t")
    snapshot_write(df.repartition(8), root)
    sid = sort_rewrite(spark, root, zorder=["a", "b", "c", "d"], target_file_mb=1)
    m = load_manifest(root, sid)
    assert m["zorder"] == ["a", "b", "c", "d"]
    assert snapshot_read(spark, root).count() == n
    assert snapshot_read(spark, root).exceptAll(df).count() == 0


def test_zorder_outlier_does_not_collapse_resolution(spark, tmp_path):
    """Scale bounds are p0.1/p99.9 quantiles: ONE extreme row must not
    flatten every normal value into a single code. With min/max scaling
    a y=10^12 outlier maps the whole 0..255 grid to code 0 and
    second-dimension pruning dies; quantile bounds keep it alive."""
    n = 65536
    grid = spark.range(n).select(
        (F.col("id") % 256).alias("x"),
        F.when(F.col("id") == 0, F.lit(10**12))
        .otherwise((F.col("id") / 256).cast("long"))
        .alias("y"),
        F.col("id").alias("doc_id"),
        F.sha2(F.concat(F.lit("pad"), F.col("id").cast("string")), 512).alias("pad"),
    ).orderBy(F.xxhash64("id"))
    zo = str(tmp_path / "zo")
    snapshot_write(grid.repartition(16), zo)
    sid = sort_rewrite(spark, zo, zorder=["x", "y"], target_file_mb=1)
    n_files = len(load_manifest(zo, sid)["files"])
    assert n_files >= 8
    # second-dimension range prune still skips most files despite the outlier
    survivors = len(prune_files(zo, conditions=("y", 10, 12)))
    assert survivors <= n_files // 2, (survivors, n_files)
    # values unharmed, outlier included
    got = snapshot_read(spark, zo, prune=("y", 10, 12)).filter("y between 10 and 12")
    assert got.count() == 3 * 256
    assert snapshot_read(spark, zo).exceptAll(grid).count() == 0


def test_cluster_incremental_merges_only_the_dirty_files(spark, tmp_path):
    """Incremental clustering: settled files carry BY REFERENCE (zero
    data movement), only layout-breaking appends merge into one fresh
    sorted run, and the pass converges — a second call with no new
    appends is a no-op, not an endless re-sort."""
    from ovalspark.sources.snapshots import cluster_incremental

    root = str(tmp_path / "t")
    base = spark.range(400).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    )
    snapshot_write(base.repartition(8), root, sort_by="doc_id")
    base_paths = {f["path"] for f in load_manifest(root)["files"]}
    assert len(base_paths) == 8
    # three unsorted single-file appends, each spanning the whole key range
    for s in range(3):
        app = spark.range(30).select(
            ((F.col("id") * 13 + s) % 397).alias("doc_id"),
            F.lit(100 + s).cast("bigint").alias("v"),
        )
        snapshot_write(app.coalesce(1), root, mode="append")
    # the DECLARED layout survives unsorted appends (cluster_incremental
    # reads it to know what to restore)
    assert load_manifest(root)["sort_by"] == ["doc_id"]
    expect = _rows(snapshot_read(spark, root))
    before = len(prune_files(root, conditions=("doc_id", 100, 110)))
    assert before >= 4  # 1-2 base files + all 3 spanning appends

    parent = load_manifest(root)["snapshot_id"]
    sid = cluster_incremental(spark, root)  # sort_by from the manifest
    assert sid == parent + 1
    m = load_manifest(root, sid)
    assert m["operation"] == "replace" and m["sort_by"] == ["doc_id"]
    paths = {f["path"] for f in m["files"]}
    # every settled base file carried by reference; all 3 dirty appends gone
    assert base_paths <= paths
    assert len(paths - base_paths) <= 2  # the merged delta run
    assert _rows(snapshot_read(spark, root)) == expect
    after = len(prune_files(root, conditions=("doc_id", 100, 110)))
    assert after <= 3 and after < before
    # fixed point: base + one internally-disjoint delta run has nothing
    # left to merge
    assert cluster_incremental(spark, root) == sid

    # a NEW append re-dirties the layout: the next pass merges it with
    # the previous delta run, still never touching the base
    snapshot_write(
        spark.range(50).select(
            ((F.col("id") * 7 + 5) % 389).alias("doc_id"),
            F.lit(200).cast("bigint").alias("v"),
        ).coalesce(1),
        root,
        mode="append",
    )
    expect2 = _rows(snapshot_read(spark, root))
    sid2 = cluster_incremental(spark, root)
    assert sid2 > sid
    m2 = load_manifest(root, sid2)
    paths2 = {f["path"] for f in m2["files"]}
    assert base_paths <= paths2
    assert _rows(snapshot_read(spark, root)) == expect2
    assert len(prune_files(root, conditions=("doc_id", 100, 110))) <= 3


def test_cluster_incremental_requires_a_layout(spark, tmp_path):
    from ovalspark.sources.snapshots import cluster_incremental

    root = str(tmp_path / "t")
    snapshot_write(_docs(spark).repartition(4), root)  # hash layout
    with pytest.raises(ValueError, match="no sort_by layout"):
        cluster_incremental(spark, root)
    # explicit columns work on an undeclared table
    sid = cluster_incremental(spark, root, sort_by="doc_id")
    assert load_manifest(root, sid)["sort_by"] == ["doc_id"]


def test_cluster_incremental_refuses_pending_mor_filters(spark, tmp_path):
    from ovalspark.sources.snapshots import cluster_incremental

    root = str(tmp_path / "t")
    snapshot_write(_docs(spark).repartition(4), root, sort_by="doc_id")
    snapshot_delete(spark, root, "v % 10 = 0", strategy="merge-on-read")
    with pytest.raises(ValueError, match="merge-on-read"):
        cluster_incremental(spark, root)
