"""Manifest-level HyperLogLog sketches (snapshot_write sketch_cols,
manifest_ndv, uniqueness_screen): the north star's 'approx-distinct via
HLL' pushed from query time into COMMIT metadata — whole-table NDV and
a duplicate pre-check with zero data files opened."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ovalspark.sources.snapshots import (
    load_manifest,
    manifest_ndv,
    snapshot_read,
    snapshot_write,
    uniqueness_screen,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 7).alias("bucket"),
    )


def test_sketches_fold_to_whole_table_ndv(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 5000).repartition(6), root, sketch_cols=["doc_id", "bucket"])
    snapshot_write(
        _docs(spark, 5000, 8000).repartition(4), root, mode="append",
        sketch_cols=["doc_id", "bucket"],
    )
    m = load_manifest(root)
    assert all("hll" in fe and set(fe["hll"]) == {"doc_id", "bucket"} for fe in m["files"])

    ndv = {r["col"]: r for r in manifest_ndv(spark, root).collect()}
    assert ndv["doc_id"]["coverage"] == pytest.approx(1.0)
    # lgK=11 sketches: ±~2.3% standard error; allow 3x
    assert ndv["doc_id"]["ndv_estimate"] == pytest.approx(8000, rel=0.07)
    assert ndv["bucket"]["ndv_estimate"] == 7  # low cardinality: exact
    # the fold opened ZERO data files — metadata-only plan
    assert manifest_ndv(spark, root).inputFiles() == []


def test_uniqueness_screen_verdicts(spark, tmp_path):
    # unique table: screen passes
    root = str(tmp_path / "u")
    snapshot_write(_docs(spark, 0, 4000).repartition(4), root, sketch_cols="doc_id")
    s = uniqueness_screen(spark, root)
    assert s["verdict"] == "pass_screen"

    # table with every doc duplicated: duplicates statistically certain
    dup_root = str(tmp_path / "d")
    d = _docs(spark, 0, 4000)
    snapshot_write(d.unionByName(d).repartition(4), dup_root, sketch_cols="doc_id")
    s = uniqueness_screen(spark, dup_root)
    assert s["verdict"] == "violation"
    assert s["duplicate_excess_estimate"] == pytest.approx(4000, rel=0.10)

    # partially sketched history: honest "unknown", never extrapolated
    part_root = str(tmp_path / "p")
    snapshot_write(_docs(spark, 0, 2000), part_root, sketch_cols="doc_id")
    snapshot_write(_docs(spark, 2000, 3000), part_root, mode="append")  # no sketch
    s = uniqueness_screen(spark, part_root)
    assert s["verdict"] == "unknown" and "coverage" in s["reason"]

    # no sketches at all
    bare_root = str(tmp_path / "b")
    snapshot_write(_docs(spark, 0, 100), bare_root)
    assert uniqueness_screen(spark, bare_root)["verdict"] == "unknown"


def test_ndv_refuses_pending_mor_filters(spark, tmp_path):
    from ovalspark.sources.snapshots import snapshot_delete

    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 1000), root, sketch_cols="doc_id")
    snapshot_delete(spark, root, "bucket = 0", strategy="merge-on-read")
    with pytest.raises(ValueError, match="materialize"):
        manifest_ndv(spark, root)


def test_sketches_survive_segment_spill(spark, tmp_path, monkeypatch):
    import ovalspark.sources.snapshots as sn

    monkeypatch.setattr(sn, "_SEGMENT_SPILL_ENTRIES", 3)
    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 500).repartition(2), root, sketch_cols="doc_id")
    for i in range(4):
        snapshot_write(
            _docs(spark, 500 + i * 100, 600 + i * 100).repartition(2),
            root, mode="append", sketch_cols="doc_id",
        )
    assert load_manifest(root).get("file_segments")
    ndv = manifest_ndv(spark, root, cols="doc_id").collect()[0]
    assert ndv["coverage"] == pytest.approx(1.0)
    assert ndv["ndv_estimate"] == pytest.approx(900, rel=0.07)
    assert snapshot_read(spark, root).count() == 900


def test_maintenance_inherits_sketch_coverage(spark, tmp_path):
    """Engine-owned rewrites never degrade sketch coverage: compact,
    sort_rewrite, materialize_deletes and upsert all recompute the
    parent's sketched columns for the files they emit."""
    from ovalspark.sources.snapshots import (
        materialize_deletes,
        snapshot_compact,
        snapshot_delete,
        snapshot_upsert,
        sort_rewrite,
    )

    root = str(tmp_path / "t")
    snapshot_write(_docs(spark, 0, 3000).repartition(4), root, sketch_cols="doc_id")

    def coverage():
        r = manifest_ndv(spark, root, cols="doc_id").collect()
        return r[0]["coverage"] if r else 0.0

    snapshot_upsert(spark, root, _docs(spark, 2000, 3500))
    materialize_deletes(spark, root)
    assert coverage() == pytest.approx(1.0)
    snapshot_delete(spark, root, "bucket = 3", strategy="merge-on-read")
    sort_rewrite(spark, root, "doc_id", target_file_mb=1)  # also materializes
    assert coverage() == pytest.approx(1.0)
    snapshot_compact(spark, root, target_file_mb=256)
    assert coverage() == pytest.approx(1.0)
    ndv = manifest_ndv(spark, root, cols="doc_id").collect()[0]
    n = snapshot_read(spark, root).count()
    assert ndv["ndv_estimate"] == pytest.approx(n, rel=0.07)
