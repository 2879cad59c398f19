"""Table doctor: diagnose reads pure metadata and returns the ordered
treatment plan; heal executes it and CONVERGES (a second heal finds
nothing). Op ordering constraints are the point — pending MoR filters
hide the physical findings and everything else refuses to run over
them, compaction is withheld from tables whose declared sort layout it
would destroy."""

from __future__ import annotations

from pyspark.sql import functions as F

from ovalspark.sources import snapshots as sn
from ovalspark.sources.doctor import diagnose, heal
from ovalspark.sources.snapshots import (
    load_manifest,
    prune_files,
    snapshot_delete,
    snapshot_read,
    snapshot_write,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _base(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    )


def test_heal_converges_on_multi_debt(spark, tmp_path):
    """Filter debt + layout debt on one table: diagnose surfaces ONLY
    materialization first (the physical findings are about to be
    rewritten), heal loops through both rounds, the table ends healthy
    and byte-identical."""
    root = str(tmp_path / "t")
    snapshot_write(_base(spark).repartition(8), root, sort_by="doc_id")
    snapshot_delete(spark, root, "v = 3", strategy="merge-on-read")  # filter debt
    for s in range(3):  # unsorted spanning appends AFTER the delete:
        # layout debt OUTSIDE the filter's scope, so materialization
        # (which rewrites exactly the filtered strata) cannot absorb it
        snapshot_write(
            spark.range(30).select(
                ((F.col("id") * 13 + s) % 397).alias("doc_id"),
                F.lit(100 + s).cast("bigint").alias("v"),
            ).coalesce(1),
            root,
            mode="append",
        )

    plan = diagnose(root)
    assert [f["op"] for f in plan] == ["materialize_deletes"]
    assert plan[0]["pending_filters"] == 1

    expect = _rows(snapshot_read(spark, root))
    executed = heal(spark, root)
    assert [f["op"] for f in executed] == ["materialize_deletes", "cluster_incremental"]
    assert all(f["snapshot_id"] for f in executed)
    assert diagnose(root) == []
    assert _rows(snapshot_read(spark, root)) == expect
    assert "row_filters" not in load_manifest(root)
    assert len(prune_files(root, conditions=("doc_id", 100, 110))) <= 3
    assert heal(spark, root) == []  # idempotent


def test_doctor_compacts_unsorted_tables_only(spark, tmp_path):
    # unsorted: 8 small files are debt
    u = str(tmp_path / "u")
    snapshot_write(_base(spark).repartition(8), u)
    plan = diagnose(u)
    assert [f["op"] for f in plan] == ["compact"]
    assert plan[0]["small_files"] == 8
    executed = heal(spark, u)
    assert executed[0]["op"] == "compact" and executed[0]["snapshot_id"]
    assert diagnose(u) == []
    assert len(load_manifest(u)["files"]) == 1

    # sorted + settled: small DISJOINT files are the layout working as
    # declared — bin-packing them would destroy the clustering
    s = str(tmp_path / "s")
    snapshot_write(_base(spark).repartition(8), s, sort_by="doc_id")
    assert diagnose(s) == []


def test_doctor_flags_fragmented_segments(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(sn, "_SEGMENT_SPILL_ENTRIES", 4)
    root = str(tmp_path / "t")
    snapshot_write(_base(spark, 40).repartition(2), root, sort_by="doc_id")
    for i in range(8):  # sorted appends keep the layout settled while
        # the inline tail spills into several tiny segments
        snapshot_write(
            spark.range(40 + i * 10, 50 + i * 10).select(
                F.col("id").alias("doc_id"), F.lit(1).cast("bigint").alias("v")
            ).coalesce(1),
            root,
            mode="append",
            sort_by="doc_id",
        )
    m = sn._load_manifest_raw(root, None)
    assert len(m.get("file_segments") or []) >= 2
    plan = diagnose(root, segment_target_entries=64)
    assert any(f["op"] == "merge_segments" for f in plan)
    heal(spark, root, segment_target_entries=64)
    assert diagnose(root, segment_target_entries=64) == []
    assert snapshot_read(spark, root).count() == 120


def test_doctor_surfaces_constraint_debt(tmp_path, spark):
    """With spark, diagnose reports contract debt as a NON-actionable
    finding; heal never touches it (fixing data is a decision, not
    hygiene); without spark the audit is skipped entirely."""
    from pyspark.sql import functions as F

    from ovalspark.sources.constraints import set_constraints
    from ovalspark.sources.doctor import diagnose, heal
    from ovalspark.sources.snapshots import current_snapshot_id, snapshot_write

    root = str(tmp_path / "t")
    snapshot_write(
        spark.range(300)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 4, None).otherwise(F.col("id")).alias("n_chars"),
        )
        .coalesce(1),  # one file: no small-file debt to distract the plan
        root,
    )
    set_constraints(
        root,
        [{"name": "nn", "kind": "not_null", "column": "n_chars"}],
        spark=spark,
        validate=False,  # adopt known-dirty
    )
    plan = diagnose(root, spark=spark)
    (finding,) = [f for f in plan if f["op"] == "audit_constraints"]
    assert finding["actionable"] is False
    assert finding["violations"] == {"nn": 4}
    assert all(f["op"] != "audit_constraints" for f in diagnose(root))
    before = current_snapshot_id(root)
    executed = heal(spark, root)
    assert all(f["op"] != "audit_constraints" for f in executed)
    assert current_snapshot_id(root) == before  # debt untouched
