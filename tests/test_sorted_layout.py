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
