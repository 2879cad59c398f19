"""Merge-on-read deletes (snapshots.py `_snapshot_delete_mor`,
`_read_with_filters`, `materialize_deletes`).

The scale-shaped delete: a predicate delete commits O(matched keys)
metadata instead of rewriting files; `snapshot_read` applies the filter
stratified by SCOPE (only files that existed at delete time), and
`materialize_deletes` pays the rewrite once. The scope discipline is
the correctness core: rows appended AFTER the delete that match the
predicate must survive."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

import ovalspark.sources.snapshots as sn
from ovalspark.sources.snapshots import (
    current_snapshot_id,
    load_manifest,
    materialize_deletes,
    merge_segments,
    read_deleted_docs,
    snapshot_compact,
    snapshot_delete,
    snapshot_read,
    snapshot_write,
)


def _docs(spark, lo, hi, lang="en"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit(lang).alias("lang"),
        F.col("id").alias("v"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _part_files(root):
    return set(glob.glob(os.path.join(root, "data", "snap-*", "part-*.parquet")))


@pytest.fixture
def low_spill(monkeypatch):
    monkeypatch.setattr(sn, "_SEGMENT_SPILL_ENTRIES", 4)


def test_mor_delete_is_metadata_only(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 100).repartition(4), root)
    before_files = _part_files(root)

    sid = snapshot_delete(spark, root, "v % 10 = 3", strategy="merge-on-read")
    assert sid == 2
    # zero data files rewritten — only the _deleted sidecar is new
    assert _part_files(root) - before_files == set()

    got = snapshot_read(spark, root)
    assert got.count() == 90
    assert got.filter("v % 10 = 3").count() == 0
    # time travel: pre-delete state intact
    assert snapshot_read(spark, root, snapshot_id=1).count() == 100
    m = load_manifest(root, sid)
    assert m["operation"] == "delete" and m["mor"] is True
    assert m["deleted_rows"] == 10 and m["total_rows"] == 90
    assert len(m["row_filters"]) == 1
    # the sidecar makes the commit CDC/read-back verifiable like CoW
    assert read_deleted_docs(spark, root, sid).count() == 10


def test_mor_null_predicate_rows_kept(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _docs(spark, 0, 10).withColumn(
        "v", F.when(F.col("v") < 3, None).otherwise(F.col("v"))
    )
    snapshot_write(df, root)
    snapshot_delete(spark, root, "v >= 7", strategy="merge-on-read")
    got = snapshot_read(spark, root)
    assert got.count() == 7  # 3 NULL-v rows kept + v in 3..6
    assert got.filter(F.col("v").isNull()).count() == 3


def test_mor_scope_spares_later_appends(spark, tmp_path):
    """THE scope test: rows appended after the delete that match the
    predicate are NOT deleted."""
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 50), root)
    snapshot_delete(spark, root, "v < 10", strategy="merge-on-read")
    assert snapshot_read(spark, root).count() == 40
    # re-append rows matching the old predicate
    snapshot_write(_docs(spark, 0, 10, lang="fr"), root, mode="append")
    got = snapshot_read(spark, root)
    assert got.count() == 50
    assert _rows(got.filter("v < 10")) == _rows(_docs(spark, 0, 10, lang="fr"))
    # the append carried the filter forward
    assert len(load_manifest(root)["row_filters"]) == 1
    assert load_manifest(root)["total_rows"] == 50


def test_mor_stacked_deletes_and_exact_counts(spark, tmp_path):
    """A second MoR delete counts only LIVE rows (not rows an earlier
    filter already removed) and both filters compose at read."""
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 100), root)
    snapshot_delete(spark, root, "v < 30", strategy="merge-on-read")
    sid = snapshot_delete(spark, root, "v < 60", strategy="merge-on-read")
    m = load_manifest(root, sid)
    assert m["deleted_rows"] == 30  # 30..59 only: 0..29 were already gone
    assert m["total_rows"] == 40
    assert snapshot_read(spark, root).count() == 40
    assert snapshot_read(spark, root).filter("v < 60").count() == 0
    # intermediate state still resolves with ONE filter
    assert snapshot_read(spark, root, snapshot_id=2).count() == 70


def test_mor_scope_survives_spill(spark, tmp_path, low_spill):
    """Inline entries later spilled into a segment keep filtering by
    PATH membership; appends after the spill stay unfiltered."""
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 20).repartition(2), root)
    snapshot_delete(spark, root, "v < 5", strategy="merge-on-read")
    # enough appends to force the inline list past the lowered spill point
    for i in range(6):
        snapshot_write(
            _docs(spark, 100 + i * 10, 110 + i * 10).repartition(2), root, mode="append"
        )
    assert load_manifest(root).get("file_segments"), "spill must have happened"
    got = snapshot_read(spark, root)
    assert got.count() == 15 + 60
    assert got.filter("v < 5").count() == 0
    assert got.filter("v >= 100").count() == 60


def test_mor_wide_inline_delete_spills_scope(spark, tmp_path, low_spill):
    """A delete over a wide un-segmented inventory spills it first so
    the recorded scope stays O(refs), not O(table)."""
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 60).repartition(8), root)  # 8 inline > spill 4
    sid = snapshot_delete(spark, root, "v < 6", strategy="merge-on-read")
    m = sn._load_manifest_raw(root, sid)
    assert m["files"] == [] and m["file_segments"]
    scope = m["row_filters"][0]["scope"]
    assert scope["files"] == [] and len(scope["segments"]) == 1
    assert snapshot_read(spark, root).count() == 54


def test_mor_pruned_read_still_filters(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 100).repartition(4, "v"), root)
    snapshot_delete(spark, root, "v % 2 = 0", strategy="merge-on-read")
    got = snapshot_read(spark, root, prune=("v", 10, 40)).filter(
        (F.col("v") >= 10) & (F.col("v") <= 40)
    )
    assert got.count() == 15  # odd v in [10, 40]
    assert got.filter("v % 2 = 0").count() == 0


def test_reorganizers_refuse_while_filters_pending(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 50).repartition(4), root)
    snapshot_delete(spark, root, "v < 10", strategy="merge-on-read")
    with pytest.raises(ValueError, match="materialize_deletes"):
        snapshot_delete(spark, root, F.col("v") < 20)  # CoW on filtered table
    with pytest.raises(ValueError, match="materialize_deletes"):
        snapshot_compact(spark, root, target_file_mb=1)
    with pytest.raises(ValueError, match="materialize_deletes"):
        merge_segments(root)
    with pytest.raises(ValueError, match="SQL-string"):
        snapshot_delete(spark, root, F.col("v") < 20, strategy="merge-on-read")


def test_batch_data_source_refuses_mor_table(spark, tmp_path):
    from ovalspark.sources.stream_source import register_snapshot_source

    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 20), root)
    snapshot_delete(spark, root, "v < 5", strategy="merge-on-read")
    register_snapshot_source(spark)
    df = spark.read.format("ovalspark_snapshots").option("path", root).load()
    with pytest.raises(Exception, match="merge-on-read|materialize"):
        df.count()


def test_materialize_deletes_pays_the_debt(spark, tmp_path):
    """Materialization rewrites ONLY filtered strata, carries the
    post-delete append's files by path identity, drops the filters, and
    re-enables the refused operations."""
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 50).repartition(2), root)
    snapshot_delete(spark, root, "v % 5 = 0", strategy="merge-on-read")
    snapshot_write(_docs(spark, 100, 110).repartition(1), root, mode="append")
    append_paths = {
        f["path"] for f in load_manifest(root)["files"] if "snap-3-" in f["path"]
    }
    assert append_paths

    sid = materialize_deletes(spark, root)
    m = load_manifest(root, sid)
    assert m["operation"] == "replace"
    assert "row_filters" not in m
    assert m["total_rows"] == 40 + 10
    # unfiltered append files carried BY REFERENCE (same paths)
    assert append_paths <= {f["path"] for f in m["files"]}
    got = snapshot_read(spark, root)
    assert got.count() == 50
    assert got.filter("v % 5 = 0 and v < 100").count() == 0
    assert _rows(got) == _rows(
        _docs(spark, 0, 50).filter("v % 5 != 0").unionByName(_docs(spark, 100, 110))
    )
    # time travel to the filtered era still applies its filters
    assert snapshot_read(spark, root, snapshot_id=2).count() == 40
    # refused operations work again
    snapshot_delete(spark, root, F.col("v") == 1)
    assert snapshot_read(spark, root).count() == 49
    assert materialize_deletes(spark, root) == current_snapshot_id(root)  # no-op


def test_mor_zero_matches_commits_nothing(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 10), root)
    assert snapshot_delete(spark, root, "v > 99", strategy="merge-on-read") == 1
    assert current_snapshot_id(root) == 1


def test_mor_cdc_feed_emits_retractions(spark, tmp_path, tmp_path_factory):
    """The CDC stream over a MoR delete retracts exactly the matched
    doc_ids — the sidecar keeps the feed strategy-agnostic."""
    from ovalspark.sources.stream_source import register_snapshot_source

    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 20), root)
    snapshot_delete(spark, root, "v < 4", strategy="merge-on-read")
    register_snapshot_source(spark)
    out = str(tmp_path / "mirror")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("ovalspark_snapshots")
        .option("path", root)
        .option("cdc", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    feed = spark.read.parquet(out)
    dels = feed.filter(F.col("_op") == "delete")
    assert dels.count() == 4
    assert {r["doc_id"] for r in dels.collect()} == {"d0", "d1", "d2", "d3"}
    # replaying inserts minus deletes reconstructs the table
    ins = feed.filter(F.col("_op") == "insert").select("doc_id", "lang", "v")
    mirror = ins.join(dels.select("doc_id"), "doc_id", "left_anti")
    assert _rows(mirror) == _rows(snapshot_read(spark, root))


def test_validate_delete_reads_back_mor_commit(spark, tmp_path):
    """The tail's delete read-back on a MoR commit verifies the
    STRATIFIED READ itself: clean by default; with the filter torn out
    of the manifest the survivors resurface and are all reported."""
    import json as _json

    from ovalspark.operators.incremental import validate_delete

    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 50).repartition(2), root)
    sid = snapshot_delete(spark, root, "v < 10", strategy="merge-on-read")
    assert validate_delete(spark, root, sid).count() == 0

    p = sn._resolve_manifest_path(root, sid)
    m = _json.load(open(p))
    m["row_filters"] = []
    open(p, "w").write(_json.dumps(m))
    sn._SEGMENT_CACHE.clear()
    v = validate_delete(spark, root, sid)
    assert v.count() == 10
    assert {r["violation_class"] for r in v.collect()} == {"DELETE_SURVIVOR"}
