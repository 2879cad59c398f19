"""V8 read-before-overwrite + V9 metadata reconciliation on the jar-free
snapshot layer (sources/snapshots.py) — the three assertions of the
(still jar-blocked) Iceberg round-trip test, running un-skipped:

1. snapshot-read of the pre-overwrite state returns the full old table
   (oval worker verifies an object's CURRENT content before overwriting,
   ``internal/runner/worker.go:43-75``);
2. the ``.files`` metadata table reconciles against actually-scanned row
   counts (``internal/s3client/s3client.go:253-275`` LIST reconciliation);
3. validation of the old snapshot is byte-identical before and after the
   overwrite commits (oval's resumable-run determinism bar).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ovalspark.sources.snapshots import (
    current_snapshot_id,
    load_manifest,
    reconcile_counts,
    snapshot_files,
    snapshot_history,
    snapshot_read,
    snapshot_write,
)
from ovalspark.sources.tables import read_table, write_table


def test_snapshot_read_before_overwrite(spark, tmp_path, small_world):
    """V8: an overwrite must not disturb a reader pinned to the previous
    snapshot — the old file list stays intact and fully readable."""
    _, cat, docs, _ = small_world
    root = str(tmp_path / "docs_tbl")
    before = snapshot_write(docs, root)

    snapshot_write(docs.limit(10), root, mode="overwrite")

    assert current_snapshot_id(root) == before + 1
    old = snapshot_read(spark, root, snapshot_id=before)
    assert old.count() == docs.count()
    assert snapshot_read(spark, root).count() == 10  # latest = post-overwrite
    # the old snapshot is content-identical, not just count-identical
    assert old.exceptAll(docs).count() == 0
    assert docs.exceptAll(old).count() == 0


def test_snapshot_files_metadata_reconciles(spark, tmp_path, small_world):
    """V9 via metadata: manifest row counts per file sum to the table count
    and match a real scan; reconcile_counts reports zero violations."""
    _, cat, _, _ = small_world
    root = str(tmp_path / "cat_tbl")
    sid = snapshot_write(cat.repartition(4), root)

    files = snapshot_files(spark, root, sid)
    assert files.count() > 0
    assert files.agg(F.sum("rows")).collect()[0][0] == cat.count()
    assert reconcile_counts(spark, root, sid).count() == 0


def test_reconcile_counts_detects_torn_file(spark, tmp_path, small_world):
    """Corrupt one data file's manifest entry → exactly that file flagged
    as COUNT_MISMATCH in the common violation schema."""
    import json
    import os

    _, cat, _, _ = small_world
    root = str(tmp_path / "torn_tbl")
    sid = snapshot_write(cat.repartition(3), root)
    mpath = os.path.join(root, "manifest", f"v{sid}.json")
    m = json.load(open(mpath))
    m["files"][0]["rows"] += 7  # simulate a torn write / stale footer
    with open(mpath, "w") as f:
        json.dump(m, f)

    v = reconcile_counts(spark, root, sid).collect()
    assert len(v) == 1
    assert v[0]["violation_class"] == "COUNT_MISMATCH"
    # manifests store root-relative paths; the violation reports resolved
    assert v[0]["doc_id"] == os.path.join(root, m["files"][0]["path"])
    assert int(v[0]["expected"]) == int(v[0]["actual"]) + 7


def test_target_file_size_controls_file_count(spark, tmp_path, small_world):
    """S2 file sizing: a huge target collapses the snapshot to one file; a
    small target splits an inflated table into several (estimate via the
    previous snapshot's bytes/row — metadata only, no extra data scan)."""
    _, _, docs, _ = small_world
    root = str(tmp_path / "sized")
    s1 = snapshot_write(docs, root)  # seed metadata for the bytes/row estimate
    m1 = load_manifest(root, s1)
    assert m1["total_bytes"] > 0

    s2 = snapshot_write(docs, root, mode="overwrite", target_file_mb=1024)
    assert len(load_manifest(root, s2)["files"]) == 1

    big = docs
    for _ in range(5):  # 32× the rows → est = 32 × snapshot bytes
        big = big.unionByName(big)
    m2 = load_manifest(root, s2)  # the estimate reads the PARENT manifest
    est_bytes = int(m2["total_bytes"] / m2["total_rows"] * big.count())
    want_files = max(1, -(-est_bytes // (1024 * 1024)))  # ceil(est / 1 MB)
    s3 = snapshot_write(big, root, mode="overwrite", target_file_mb=1)
    n_files = len(load_manifest(root, s3)["files"])
    assert n_files == want_files
    assert n_files > 1  # 32× the fixture docs comfortably exceeds 1 MB


def test_append_reuses_parent_files(spark, tmp_path, small_world):
    """Fast append: parent files referenced, not rewritten; history shows
    the lineage."""
    _, cat, _, _ = small_world
    root = str(tmp_path / "app_tbl")
    s1 = snapshot_write(cat, root)
    f1 = {f["path"] for f in load_manifest(root, s1)["files"]}
    s2 = snapshot_write(cat.limit(5), root, mode="append")
    f2 = {f["path"] for f in load_manifest(root, s2)["files"]}
    assert f1 < f2  # strict superset: old files by reference + new ones
    assert snapshot_read(spark, root, s2).count() == cat.count() + 5

    hist = {r["snapshot_id"]: r for r in snapshot_history(spark, root).collect()}
    assert hist[s1]["parent_id"] is None and not hist[s1]["is_current"]
    assert hist[s2]["parent_id"] == s1 and hist[s2]["is_current"]
    assert hist[s2]["operation"] == "append"


def test_validation_of_old_snapshot_is_byte_identical(spark, tmp_path, small_world):
    """V8 end-to-end: validate the table, overwrite it with corrupted
    content, re-validate the OLD snapshot — identical violation rows
    (none), while the new snapshot shows the injected faults. This is
    oval's read-before-overwrite check as time travel."""
    from ovalspark.datagen import inject_faults
    from ovalspark.operators import check_existence, validate_spans

    spec, cat, docs, _ = small_world
    root = str(tmp_path / "val_tbl")
    before = snapshot_write(docs, root)

    pre = validate_spans(snapshot_read(spark, root, before), cat, spec.n_assets).collect()
    assert pre == []

    bad, _ = inject_faults(docs, cat, spec, {"WRONG_KIND": 0.05})
    snapshot_write(bad.localCheckpoint(), root, mode="overwrite")

    post_old = validate_spans(snapshot_read(spark, root, before), cat, spec.n_assets).collect()
    assert post_old == pre == []
    post_new = validate_spans(snapshot_read(spark, root), cat, spec.n_assets)
    assert post_new.filter(F.col("violation_class") == "WRONG_KIND").count() > 0


def test_table_io_snapshot_format(spark, tmp_path, small_world):
    """read_table/write_table route fmt='snapshot' through the layer —
    same call sites as the Iceberg branch, jar-free."""
    _, cat, _, _ = small_world
    root = str(tmp_path / "io_tbl")
    write_table(cat, root, fmt="snapshot", partition_by=())
    write_table(cat.limit(3), root, fmt="snapshot", partition_by=(), mode="append")
    assert read_table(spark, root, fmt="snapshot").count() == cat.count() + 3
    assert read_table(spark, root, fmt="snapshot", snapshot_id=1).count() == cat.count()
    with pytest.raises(ValueError, match="snapshot_id"):
        read_table(spark, str(tmp_path / "nope"), fmt="auto", snapshot_id=1)


def test_table_io_snapshot_refuses_unhonorable_asks(spark, tmp_path, small_world):
    """fmt='snapshot' must refuse partition_by and unknown modes loudly —
    silently discarding either request corrupts caller expectations."""
    _, cat, _, _ = small_world
    root = str(tmp_path / "refuse_tbl")
    with pytest.raises(ValueError, match="partition_by"):
        write_table(cat, root, fmt="snapshot", partition_by=("partition_id",))
    with pytest.raises(ValueError, match="mode"):
        write_table(cat, root, fmt="snapshot", partition_by=(), mode="error")


def test_interrupted_commit_leaves_previous_snapshot(spark, tmp_path, small_world):
    """A writer that dies after writing data files but BEFORE the manifest
    commit leaves CURRENT on the previous snapshot — readers never see a
    partial table (oval's killed-run integrity, runner.go:71-104)."""
    _, cat, _, _ = small_world
    root = str(tmp_path / "crash_tbl")
    s1 = snapshot_write(cat, root)
    # simulate the torn commit: data files for snap-2 exist, no manifest
    cat.limit(1).write.parquet(f"{root}/data/snap-2")
    assert current_snapshot_id(root) == s1
    assert snapshot_read(spark, root).count() == cat.count()
    # and the next real commit allocates past the debris cleanly
    s2 = snapshot_write(cat.limit(2), root)
    assert s2 == s1 + 1


def test_interrupted_commit_after_manifest_before_current(spark, tmp_path, small_world):
    """The OTHER torn window: writer died after writing v<id>.json but
    BEFORE flipping CURRENT. The commit point is the CURRENT flip, so the
    orphan snapshot is invisible, discarded on the next write, and must
    never wedge the table."""
    import json
    import os

    _, cat, _, _ = small_world
    root = str(tmp_path / "crash2_tbl")
    s1 = snapshot_write(cat, root)
    # simulate: data + manifest for snap-2 exist, CURRENT still says 1
    cat.limit(3).write.parquet(f"{root}/data/snap-2")
    with open(os.path.join(root, "manifest", "v2.json"), "w") as f:
        json.dump({"snapshot_id": 2, "parent_id": s1, "operation": "overwrite",
                   "schema_ddl": "", "schema_json": "{}", "total_rows": 3,
                   "total_bytes": 1, "files": []}, f)
    assert current_snapshot_id(root) == s1
    assert snapshot_read(spark, root).count() == cat.count()  # orphan invisible

    s2 = snapshot_write(cat.limit(5), root)  # must not raise 'path exists'
    assert s2 == s1 + 1
    assert snapshot_read(spark, root).count() == 5
    assert snapshot_read(spark, root, s1).count() == cat.count()


def test_reconcile_handles_uri_unfriendly_roots(spark, tmp_path, small_world):
    """Path-vs-URI robustness: a root containing a space (percent-encoded
    by input_file_name) must reconcile cleanly — the join is on the
    UUID-unique part-file basename, not the full path text."""
    _, cat, _, _ = small_world
    root = str(tmp_path / "with space" / "tbl")
    sid = snapshot_write(cat.repartition(2), root)
    assert reconcile_counts(spark, root, sid).count() == 0


def test_concurrent_commit_cas_loser_raises(spark, tmp_path, small_world, monkeypatch):
    """First-wins CAS, deterministic: a writer whose parent moved under it
    (a winner commits between its parent read and its in-lock CAS check)
    must raise ConcurrentCommitError, clean up its data files, and leave
    the winner's snapshot intact."""
    import glob as g
    import os

    from ovalspark.sources import snapshots as sn

    _, cat, _, _ = small_world
    root = str(tmp_path / "cas_tbl")
    snapshot_write(cat, root)  # sid 1

    # inject the winner exactly into the race window: the loser has read
    # parent=1 and written its data; just before it takes the commit
    # guard, the winner commits sid 2 (through the guard seam — the same
    # injection point for any CommitGuard implementation)
    from ovalspark.sources import commit_guard as cg

    real_resolve = cg.resolve_guard
    fired = {"done": False}

    class SneakGuard(cg.CommitGuard):
        def __init__(self, inner):
            self.inner = inner

        def acquire(self, r, timeout_s=30.0):
            if not fired["done"]:
                fired["done"] = True
                snapshot_write(cat.limit(3), r)  # winner: sid 2
            return self.inner.acquire(r, timeout_s)

        def release(self, token):
            self.inner.release(token)

    monkeypatch.setattr(cg, "resolve_guard", lambda g=None: SneakGuard(real_resolve(g)))
    with pytest.raises(sn.ConcurrentCommitError):
        snapshot_write(cat.limit(7), root)

    assert current_snapshot_id(root) == 2
    assert snapshot_read(spark, root).count() == 3  # winner's content intact
    # loser's data dir was removed: only snap dirs referenced by manifests remain
    referenced = set()
    for sid in (1, 2):
        for f in load_manifest(root, sid)["files"]:
            referenced.add(os.path.dirname(f["path"]))
    on_disk = {os.path.relpath(d, root) for d in g.glob(f"{root}/data/snap-*")}
    assert on_disk == referenced


def test_concurrent_delete_vs_append_race(spark, tmp_path, small_world):
    """A delete and an append racing the same parent must resolve like
    any two writers: exactly first-wins CAS semantics — losers raise
    ConcurrentCommitError and clean up, every committed id resolves, and
    with one retry both operations land (ids dense). The delete's
    discovery scan happens OUTSIDE the guard, so this exercises the full
    read-then-CAS window."""
    import threading

    from ovalspark.sources.snapshots import ConcurrentCommitError, snapshot_delete

    _, cat, docs, _ = small_world
    root = str(tmp_path / "del_app_race_tbl")
    snapshot_write(docs.localCheckpoint().repartition(2, "partition_id"), root)
    extra = snapshot_read(spark, root).limit(5).localCheckpoint()

    start = threading.Barrier(2)
    results: list = [None, None]

    def deleter():
        try:
            start.wait(timeout=30)
            for _ in range(3):
                try:
                    results[0] = ("ok", snapshot_delete(spark, root, "partition_id = 0"))
                    return
                except ConcurrentCommitError:
                    continue
            results[0] = ("exhausted", None)
        except Exception as e:  # pragma: no cover
            results[0] = ("err", e)

    def appender():
        try:
            start.wait(timeout=30)
            for _ in range(3):
                try:
                    results[1] = ("ok", snapshot_write(extra, root, mode="append"))
                    return
                except ConcurrentCommitError:
                    continue
            results[1] = ("exhausted", None)
        except Exception as e:  # pragma: no cover
            results[1] = ("err", e)

    ts = [threading.Thread(target=deleter), threading.Thread(target=appender)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    assert [k for k, _ in results] == ["ok", "ok"], results
    sids = sorted(v for _, v in results)
    assert sids == [2, 3]  # both landed, dense ids
    for sid in (1, 2, 3):
        snapshot_read(spark, root, sid).count()  # every id resolvable
    # the delete's effect holds in the final state regardless of order —
    # UNLESS the append re-introduced partition-0 docs after the delete
    # committed (legitimate); assert exact final count instead
    final = snapshot_read(spark, root)
    n1 = snapshot_read(spark, root, 1).count()
    n_del = snapshot_read(spark, root, 1).filter("partition_id = 0").count()
    readd = extra.filter("partition_id = 0").count()
    delete_first = results[0][1] == 2
    expected = n1 - n_del + 5 if delete_first else n1 + 5 - n_del - readd
    assert final.count() == expected


def test_concurrent_commit_two_thread_race(spark, tmp_path, small_world):
    """Genuine two-thread race on one table: every outcome must preserve
    the invariants — ≥1 success, failures only ConcurrentCommitError, the
    final CURRENT readable, and every committed id resolvable."""
    import threading

    from ovalspark.sources.snapshots import ConcurrentCommitError

    _, cat, _, _ = small_world
    root = str(tmp_path / "race_tbl")
    snapshot_write(cat, root)

    start = threading.Barrier(2)
    results: list = [None, None]

    def writer(i):
        try:
            start.wait(timeout=30)
            results[i] = ("ok", snapshot_write(cat.limit(10 + i), root, mode="append"))
        except ConcurrentCommitError as e:
            results[i] = ("lost", e)
        except Exception as e:  # pragma: no cover - should not happen
            results[i] = ("err", e)

    ts = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]

    kinds = sorted(k for k, _ in results)
    assert "err" not in kinds
    assert kinds.count("ok") >= 1
    cur = current_snapshot_id(root)
    for sid in range(1, cur + 1):
        assert snapshot_read(spark, root, sid).count() > 0
    n_ok = kinds.count("ok")
    assert cur == 1 + n_ok  # each success advanced CURRENT exactly once


def test_stale_commit_lock_never_wedges(tmp_path, small_world):
    """A lock FILE left behind by a dead writer must not wedge the table —
    with flock the kernel released the dead holder's lock, so whatever
    bytes remain in the file (a pid, garbage, or nothing: the empty-file
    case wedged the old pid-parsing design forever) are meaningless."""
    import os

    _, cat, _, _ = small_world
    for content, name in (("999999999", "pid_tbl"), ("", "empty_tbl"), ("garbage", "junk_tbl")):
        root = str(tmp_path / name)
        os.makedirs(f"{root}/manifest", exist_ok=True)
        with open(f"{root}/manifest/COMMIT_LOCK", "w") as f:
            f.write(content)
        assert snapshot_write(cat.limit(5), root) == 1


def test_torn_manifest_invisible_everywhere(spark, tmp_path, small_world):
    """ADVICE: a manifest past CURRENT must not appear in history and must
    not resolve through load_manifest/snapshot_read — the CURRENT flip is
    the single visibility boundary."""
    import json
    import os

    _, cat, _, _ = small_world
    root = str(tmp_path / "torn_vis_tbl")
    s1 = snapshot_write(cat, root)
    with open(os.path.join(root, "manifest", "v2.json"), "w") as f:
        json.dump({"snapshot_id": 2, "parent_id": s1, "operation": "overwrite",
                   "schema_ddl": "", "schema_json": "{}", "total_rows": 1,
                   "total_bytes": 1, "files": []}, f)

    hist = snapshot_history(spark, root)
    assert [r["snapshot_id"] for r in hist.collect()] == [s1]
    with pytest.raises(FileNotFoundError, match="not committed"):
        load_manifest(root, 2)
    with pytest.raises(FileNotFoundError, match="not committed"):
        snapshot_read(spark, root, snapshot_id=2)


def test_vacuum_reclaims_debris_keeps_committed(spark, tmp_path, small_world):
    """vacuum removes torn manifests and unreferenced data dirs; every
    committed snapshot stays byte-identical."""
    import json
    import os

    from ovalspark.sources.snapshots import vacuum

    _, cat, _, _ = small_world
    root = str(tmp_path / "vac_tbl")
    s1 = snapshot_write(cat, root)
    s2 = snapshot_write(cat.limit(4), root, mode="overwrite")
    # debris: an orphan data dir + a torn manifest at CURRENT+1
    cat.limit(1).write.parquet(f"{root}/data/snap-3-deadbeef")
    with open(os.path.join(root, "manifest", "v3.json"), "w") as f:
        json.dump({"snapshot_id": 3, "parent_id": s2, "operation": "overwrite",
                   "schema_ddl": "", "schema_json": "{}", "total_rows": 1,
                   "total_bytes": 1, "files": []}, f)

    removed = vacuum(root)
    assert any("v3.json" in p for p in removed)
    assert any("snap-3-deadbeef" in p for p in removed)
    assert not os.path.exists(f"{root}/data/snap-3-deadbeef")
    # committed snapshots untouched, including the OLD overwritten one
    assert snapshot_read(spark, root, s1).count() == cat.count()
    assert snapshot_read(spark, root, s2).count() == 4


def test_manifest_column_stats_prune_files(spark, tmp_path):
    """Iceberg-style manifest file skipping: commit range-partitioned
    files, read with a prune range — only overlapping files reach Spark
    (inputFiles assertion), values identical to the unpruned filter, and
    a column without stats never prunes."""
    import os

    from ovalspark.sources.snapshots import load_manifest, prune_files, snapshot_read

    df = spark.range(10000).selectExpr(
        "id as v", "cast(id as string) as doc_id", "concat('k', lpad(cast(id as string), 6, '0')) as skey"
    )
    root = str(tmp_path / "prune_tbl")
    sid = snapshot_write(df.repartitionByRange(8, "v"), root)
    m = load_manifest(root, sid)
    assert len(m["files"]) == 8
    assert all("v" in f["col_stats"] and "skey" in f["col_stats"] for f in m["files"])

    # numeric range touching ~2 of 8 range-partitioned files
    pruned = prune_files(root, sid, ("v", 2000, 3000))
    assert 0 < len(pruned) < 8
    got = snapshot_read(spark, root, sid, prune=("v", 2000, 3000)).filter(
        "v between 2000 and 3000"
    )
    want = snapshot_read(spark, root, sid).filter("v between 2000 and 3000")
    assert {os.path.basename(p) for p in got.inputFiles()} == {
        os.path.basename(p) for p in pruned
    }
    assert got.count() == want.count() == 1001
    assert got.exceptAll(want).count() == 0

    # string bounds prune too (lexicographic zero-padded keys)
    sp = prune_files(root, sid, ("skey", "k005000", "k005100"))
    assert 0 < len(sp) < 8
    # absent column / absent stats: everything kept, nothing wrongly cut
    assert len(prune_files(root, sid, ("no_such_col", 0, 1))) == 8
    # conjunction of conditions intersects the survivors
    both = prune_files(root, sid, [("v", 2000, 3000), ("skey", "k005000", "k005100")])
    assert both == []  # disjoint ranges of the same row order share no file


def test_column_stats_survive_delete_and_append(spark, tmp_path):
    """Maintenance commits re-collect stats for rewritten files and keep
    carried-over entries intact, so pruning stays sound across the
    table's whole lifecycle."""
    from ovalspark.sources.snapshots import load_manifest, prune_files, snapshot_delete

    df = spark.range(1000).selectExpr("id as v", "cast(id as string) as doc_id")
    root = str(tmp_path / "prune_life_tbl")
    snapshot_write(df.repartitionByRange(4, "v"), root)
    sid2 = snapshot_delete(spark, root, F.col("v") < 100)
    m2 = load_manifest(root, sid2)
    assert all(f["col_stats"].get("v") for f in m2["files"])
    assert min(f["col_stats"]["v"]["min"] for f in m2["files"]) == 100
    # pruning the deleted range now selects nothing
    assert prune_files(root, sid2, ("v", 0, 99)) == []


def test_append_schema_conflicts_raise_additive_evolves(spark, tmp_path, small_world):
    """Schema gate, round-6 semantics: appends that DROP, RETYPE, or
    REORDER committed columns fail at write time; appends that ADD
    columns evolve the table additively (Iceberg add-column). Read-back
    nullability drift must not trip the gate; overwrite still reshapes."""
    from ovalspark.sources.snapshots import SchemaMismatchError

    _, cat, _, _ = small_world
    root = str(tmp_path / "schema_tbl")
    snapshot_write(cat, root)

    with pytest.raises(SchemaMismatchError, match="missing"):
        snapshot_write(cat.drop(cat.columns[-1]), root, mode="append")
    retyped = cat.withColumn(cat.columns[-1], F.col(cat.columns[-1]).cast("string"))
    with pytest.raises(SchemaMismatchError, match="conflicts"):
        snapshot_write(retyped, root, mode="append")
    reordered = cat.select(*reversed(cat.columns))
    with pytest.raises(SchemaMismatchError, match="conflicts"):
        snapshot_write(reordered, root, mode="append")

    # read-back of the table's own data appends cleanly (nullability and
    # metadata may differ; names+types+order are what count)
    snapshot_write(snapshot_read(spark, root).limit(3), root, mode="append")
    # overwrite establishes a NEW schema; appends then follow it
    evolved = cat.withColumn("extra", F.lit(1))
    s = snapshot_write(evolved, root, mode="overwrite")
    s2 = snapshot_write(evolved.limit(2), root, mode="append")
    assert s2 == s + 1


def test_additive_schema_evolution_null_fills_and_validates(spark, tmp_path):
    """An append ADDING a column widens the committed schema: the new
    snapshot reads old files with the column NULL-filled, time travel
    shows each snapshot's own shape, a delete across the boundary keeps
    the widened schema, and the gate still rejects a narrower re-append."""
    from ovalspark.sources.snapshots import SchemaMismatchError, snapshot_delete

    root = str(tmp_path / "evolve_tbl")
    old = spark.range(20).selectExpr("cast(id as string) as doc_id", "id as v")
    snapshot_write(old, root)

    new = spark.range(20, 30).selectExpr(
        "cast(id as string) as doc_id", "id as v", "'en' as lang"
    )
    s2 = snapshot_write(new, root, mode="append")
    m2 = load_manifest(root, s2)
    assert "lang" in m2["schema_ddl"]

    cur = snapshot_read(spark, root)
    assert cur.columns == ["doc_id", "v", "lang"]
    assert cur.count() == 30
    assert cur.filter("lang IS NULL").count() == 20  # old files null-fill
    assert cur.filter("lang = 'en'").count() == 10
    # time travel: snapshot 1 keeps its own (narrow) shape
    assert snapshot_read(spark, root, 1).columns == ["doc_id", "v"]

    # once widened, a narrow append is a dropped-column conflict
    with pytest.raises(SchemaMismatchError, match="missing"):
        snapshot_write(old.limit(2), root, mode="append")
    # ...and a further additive append keeps working
    s3 = snapshot_write(
        spark.range(30, 35).selectExpr(
            "cast(id as string) as doc_id", "id as v", "'fr' as lang", "0.5 as score"
        ),
        root,
        mode="append",
    )
    assert snapshot_read(spark, root, s3).columns == ["doc_id", "v", "lang", "score"]

    # a delete whose predicate names the EVOLVED column must null-match
    # (keep) pre-evolution rows and keep the widened schema
    s4 = snapshot_delete(spark, root, "lang = 'fr'")
    after = snapshot_read(spark, root, s4)
    assert after.columns == ["doc_id", "v", "lang", "score"]
    assert after.count() == 30  # only the 5 fr rows went
    assert after.filter("lang IS NULL").count() == 20


def test_safe_type_promotion_append(spark, tmp_path):
    """int→long / float→double appends commit as PROMOTIONS (round-7):
    the table's schema widens to the append's type, pre-promotion files
    read back value-identical through Spark's parquet upcast (top-level
    AND inside the spans struct), time travel keeps each snapshot's own
    width, and the lossy inverses (bigint→int, double→float) still raise."""
    from ovalspark.sources.snapshots import SchemaMismatchError, snapshot_delete

    root = str(tmp_path / "promote_tbl")
    narrow = spark.range(10).selectExpr(
        "cast(id as string) as doc_id",
        "cast(id as int) as v",
        "cast(id * 0.5 as float) as score",
        "array(named_struct('kind', 'text', 'offset', cast(id as int))) as spans",
    )
    snapshot_write(narrow, root)

    wide = spark.range(10, 15).selectExpr(
        "cast(id as string) as doc_id",
        "id as v",  # bigint
        "cast(id * 0.5 as double) as score",
        "array(named_struct('kind', 'text', 'offset', id)) as spans",
    )
    s2 = snapshot_write(wide, root, mode="append")

    cur = snapshot_read(spark, root, s2)
    got = dict(cur.dtypes)
    assert got["v"] == "bigint" and got["score"] == "double"
    assert "offset:bigint" in got["spans"].replace(" ", "")
    # pre-promotion values survive the widened read bit-exactly
    assert cur.count() == 15
    assert cur.selectExpr("sum(v)").first()[0] == sum(range(15))
    assert cur.selectExpr("sum(spans[0].offset)").first()[0] == sum(range(15))
    assert cur.selectExpr("sum(cast(score * 2 as bigint))").first()[0] == sum(range(15))
    # time travel: snapshot 1 keeps its original narrow types
    t1 = dict(snapshot_read(spark, root, 1).dtypes)
    assert t1["v"] == "int" and t1["score"] == "float"

    # once promoted, a narrow append is a lossy retype: rejected
    with pytest.raises(SchemaMismatchError, match="conflicts"):
        snapshot_write(narrow.limit(2), root, mode="append")
    # promotion composes with additive evolution in one append
    s3 = snapshot_write(wide.withColumn("lang", F.lit("en")), root, mode="append")
    assert snapshot_read(spark, root, s3).columns[-1] == "lang"

    # a delete across the promotion boundary rewrites survivors at the
    # WIDE schema and keeps it
    s4 = snapshot_delete(spark, root, "v >= 12")
    after = snapshot_read(spark, root, s4)
    assert dict(after.dtypes)["v"] == "bigint"
    assert after.selectExpr("max(v)").first()[0] == 11


def test_delta_validation_across_schema_evolution(spark, tmp_path, small_world):
    """Delta validation stays green across an additive boundary: the
    evolved append's delta validates against its catalog exactly as a
    same-shape append would (the added column rides along untouched)."""
    from ovalspark.operators.incremental import validate_snapshot_delta

    spec, cat, docs, _ = small_world
    half = F.pmod(F.xxhash64("doc_id", F.lit(3)), F.lit(2)) == 0
    base = docs.filter(half).localCheckpoint()
    delta = docs.filter(~half).withColumn("ingest_batch", F.lit("b2")).localCheckpoint()
    cat_delta = cat.join(delta.select("doc_id"), "doc_id", "semi").localCheckpoint()

    root = str(tmp_path / "evolve_delta_tbl")
    s1 = snapshot_write(base, root)
    s2 = snapshot_write(delta, root, mode="append")  # additive evolution
    v = validate_snapshot_delta(
        spark, root, cat_delta, spec.n_assets, from_id=s1, to_id=s2
    )
    assert v.count() == 0  # clean world stays clean across the boundary
    assert snapshot_read(spark, root, s2).filter("ingest_batch IS NULL").count() == base.count()


def test_vacuum_age_window_spares_staged_write(spark, tmp_path, small_world):
    """vacuum(min_age_s=N) must not touch a live writer's staged (not yet
    committed) data dir: everything younger than the window is spared;
    only a dated orphan goes."""
    import os
    import time

    from ovalspark.sources.snapshots import vacuum

    _, cat, _, _ = small_world
    root = str(tmp_path / "vac_window_tbl")
    snapshot_write(cat, root)
    # a writer mid-commit: data staged seconds ago, CURRENT not flipped
    staged = f"{root}/data/snap-2-11ffee00"
    cat.limit(3).write.parquet(staged)
    # a genuinely dead writer's debris: same shape, old mtime
    orphan = f"{root}/data/snap-2-00deed11"
    cat.limit(1).write.parquet(orphan)
    old = time.time() - 7200
    os.utime(orphan, (old, old))

    removed = vacuum(root, min_age_s=3600)
    assert any("snap-2-00deed11" in p for p in removed)
    assert os.path.isdir(staged)  # the in-flight writer's files survive
    # eager mode (maintenance window, no writers) still reclaims both
    removed2 = vacuum(root)
    assert any("snap-2-11ffee00" in p for p in removed2)


def test_snapshot_delete_rewrites_only_affected_files(spark, tmp_path, small_world):
    """Predicate delete: only files containing matching rows are
    rewritten (others carry over by reference), time travel shows both
    states, manifest_diff reports exactly the rewritten files, and delta
    validation of the delete commit raises no false LOST_DOC."""
    import os

    from ovalspark.operators.incremental import validate_snapshot_delta
    from ovalspark.sources.snapshots import manifest_diff, snapshot_delete

    spec, cat, docs, _ = small_world
    root = str(tmp_path / "del_tbl")
    # partition-id-sorted layout: each file holds a distinct doc range
    s1 = snapshot_write(docs.repartition(4, "partition_id"), root)
    n_before = docs.count()
    victims = docs.filter(F.col("partition_id") == 0)
    n_victims = victims.count()
    assert 0 < n_victims < n_before

    s2 = snapshot_delete(spark, root, F.col("partition_id") == 0)
    assert s2 == s1 + 1
    m1, m2 = load_manifest(root, s1), load_manifest(root, s2)
    assert m2["operation"] == "delete" and m2["deleted_rows"] == n_victims
    # both states readable
    assert snapshot_read(spark, root, s1).count() == n_before
    after = snapshot_read(spark, root, s2)
    assert after.count() == n_before - n_victims
    assert after.filter(F.col("partition_id") == 0).count() == 0
    # only files that HELD victims were rewritten; the rest are shared
    f1 = {f["path"] for f in m1["files"]}
    f2 = {f["path"] for f in m2["files"]}
    shared = f1 & f2
    assert shared, "unaffected files must carry over by reference"
    rewritten = sorted(f2 - f1)
    assert {os.path.basename(p) for p in manifest_diff(root, s1, s2)} == {
        os.path.basename(p) for p in rewritten
    }
    # shared (untouched) files contain no victims — the delete really was
    # scoped to affected files only
    if shared:
        untouched = spark.read.parquet(*[f"{root}/{p}" for p in sorted(shared)])
        assert untouched.filter(F.col("partition_id") == 0).count() == 0
    # delta validation of the delete commit: catalog = expected state of
    # the docs in the rewritten files; zero violations, no false LOST_DOC
    surviving = spark.read.parquet(*manifest_diff(root, s1, s2)).select("doc_id")
    cat_delta = cat.join(surviving, "doc_id", "semi").localCheckpoint()
    v = validate_snapshot_delta(spark, root, cat_delta, spec.n_assets, from_id=s1, to_id=s2)
    assert v.count() == 0

    # a predicate matching nothing commits nothing
    assert snapshot_delete(spark, root, F.col("partition_id") == 9999) == s2


def test_expire_snapshots_retention(spark, tmp_path):
    """Retention: expiring all but the last 2 snapshots removes exactly
    the old manifests, reclaims ONLY data no retained snapshot
    references (append chains share parents' files — those survive),
    keeps retained snapshots byte-identical, and makes expired-id time
    travel raise."""
    import glob as g
    import os

    from ovalspark.sources.snapshots import expire_snapshots, snapshot_history

    df = spark.range(100).selectExpr("cast(id as string) as doc_id")
    root = str(tmp_path / "ret_tbl")
    snapshot_write(df, root)                                  # 1: base
    snapshot_write(df.limit(10), root, mode="append")         # 2: shares 1's files
    snapshot_write(df.limit(20), root, mode="overwrite")      # 3: fresh files
    snapshot_write(df.limit(5), root, mode="append")          # 4: shares 3's files

    n_dirs_before = len(g.glob(f"{root}/data/snap-*"))
    # default min_age_s (1 h): manifests expire but FRESH data dirs are
    # spared — they are indistinguishable from a live writer's staging
    expired = expire_snapshots(root, keep_last=2)
    assert expired == [1, 2]
    assert len(g.glob(f"{root}/data/snap-*")) == n_dirs_before
    # maintenance window (no writers): reclaim now
    from ovalspark.sources.snapshots import vacuum as _vacuum

    _vacuum(root, min_age_s=0)
    ids = sorted(r.snapshot_id for r in snapshot_history(spark, root).collect())
    assert ids == [3, 4]
    with pytest.raises(FileNotFoundError):
        load_manifest(root, 1)
    # snapshot 3+4 read exactly as before; 4 still references 3's files
    assert snapshot_read(spark, root, 3).count() == 20
    assert snapshot_read(spark, root, 4).count() == 25
    # data dirs of snapshots 1/2 (exclusive) are gone; 3/4's survive
    remaining = {os.path.basename(d) for d in g.glob(f"{root}/data/snap-*")}
    assert len(remaining) < n_dirs_before
    live = {
        os.path.basename(os.path.dirname(f["path"]))
        for sid in (3, 4)
        for f in load_manifest(root, sid)["files"]
    }
    assert remaining == live
    with pytest.raises(ValueError, match="keep_last"):
        expire_snapshots(root, keep_last=0)
    # target_file_mb=0 must raise loudly, not silently no-op (threshold 0
    # classifies every file as "large enough" and returns parent)
    from ovalspark.sources.snapshots import snapshot_compact as _compact

    with pytest.raises(ValueError, match="target_file_mb"):
        _compact(spark, root, target_file_mb=0)


def test_expire_snapshots_by_age(spark, tmp_path):
    """Age-based retention: only snapshots whose manifest-recorded
    committed_at is outside the window expire; keep_last stays the floor
    (the tip never expires even at older_than_s=0); both criteria must
    not be absent; manifests record committed_at at the flip."""
    import json as _json
    import time as _time

    from ovalspark.sources.snapshots import (
        _resolve_manifest_path,
        expire_snapshots,
        snapshot_history,
    )

    root = str(tmp_path / "age_tbl")
    df = spark.range(30).selectExpr("cast(id as string) as doc_id")
    snapshot_write(df, root)
    snapshot_write(df.limit(5), root, mode="append")
    snapshot_write(df.limit(2), root, mode="append")
    assert load_manifest(root, 1)["committed_at"] > 0

    with pytest.raises(ValueError, match="keep_last and/or older_than_s"):
        expire_snapshots(root)
    # everything committed seconds ago: a 1-hour window expires nothing
    assert expire_snapshots(root, older_than_s=3600, do_vacuum=False) == []

    # age snapshot 1 artificially: rewrite its committed_at a day back
    p1 = _resolve_manifest_path(root, 1)
    m1 = _json.load(open(p1))
    m1["committed_at"] = _time.time() - 86400
    with open(p1, "w") as f:
        _json.dump(m1, f)
    assert expire_snapshots(root, older_than_s=3600, do_vacuum=False) == [1]

    # floor: older_than_s=0 can never expire the newest keep_last
    assert expire_snapshots(root, older_than_s=0, do_vacuum=False) == [2]
    hist = snapshot_history(spark, root).collect()
    assert [r.snapshot_id for r in hist] == [3]
    assert hist[0].committed_at is not None  # surfaced in .snapshots
    with pytest.raises(ValueError, match="older_than_s"):
        expire_snapshots(root, older_than_s=-5)


def test_snapshot_delete_discovery_cap_falls_back_to_full_rewrite(spark, tmp_path):
    """A delete whose matches overflow the discovery cap (the
    delete-everything shape) must commit WITHOUT building the full
    affected-basename set: every scanned file is rewritten, and the
    result is row-identical to the selective path."""
    import os

    from ovalspark.sources.snapshots import snapshot_delete

    df = spark.range(2000).selectExpr("id as v", "cast(id as string) as doc_id")
    root = str(tmp_path / "cap_tbl")
    snapshot_write(df.repartition(8), root)
    # predicate matches rows in every file; cap=2 forces the overflow path
    sid = snapshot_delete(spark, root, "v % 2 = 0", discovery_cap=2)
    assert sid == 2
    after = snapshot_read(spark, root, 2)
    assert after.count() == 1000
    assert after.filter("v % 2 = 0").count() == 0
    m = load_manifest(root, 2)
    assert m["deleted_rows"] == 1000
    # overflow path: no parent file carried by reference (all rewritten)
    parent_names = {os.path.basename(f["path"]) for f in load_manifest(root, 1)["files"]}
    assert all(os.path.basename(f["path"]) not in parent_names for f in m["files"])
    # time travel still shows the pre-delete state
    assert snapshot_read(spark, root, 1).count() == 2000


def test_snapshot_write_records_expected_docs(spark, tmp_path):
    """``expect=`` persists the writer's promised doc set as a manifest
    sidecar: count recorded, ids readable back, absent when not given,
    and the sidecar survives vacuum (it shares the live data dir)."""
    from ovalspark.sources.snapshots import read_expected_docs
    from ovalspark.sources.snapshots import vacuum as _vacuum

    root = str(tmp_path / "expect_tbl")
    df = spark.range(30).selectExpr("cast(id as string) as doc_id")
    promised = spark.range(35).selectExpr("cast(id as string) as doc_id", "id as extra")
    sid = snapshot_write(df, root, expect=promised)
    m = load_manifest(root, sid)
    assert m["expect"]["n_docs"] == 35
    got = read_expected_docs(spark, root, sid)
    assert got.columns == ["doc_id"]  # sidecar stores ids only
    assert got.count() == 35
    # 5 promised ids never written — the self-contained LOST_DOC signal
    assert got.join(snapshot_read(spark, root, sid), "doc_id", "anti").count() == 5

    sid2 = snapshot_write(df.limit(5), root, mode="append")
    assert read_expected_docs(spark, root, sid2) is None
    assert "expect" not in load_manifest(root, sid2)

    # an EMPTY append with a promise: its data dir is referenced ONLY by
    # the expect sidecar — vacuum must keep it (the promise = all LOST)
    sid3 = snapshot_write(
        df.limit(0), root, mode="append", expect=promised.limit(3)
    )
    assert load_manifest(root, sid3)["expect"]["n_docs"] == 3

    _vacuum(root, min_age_s=0)
    assert read_expected_docs(spark, root, sid).count() == 35
    assert read_expected_docs(spark, root, sid3).count() == 3


def test_snapshot_delete_prune_scopes_discovery(spark, tmp_path):
    """A range-shaped delete with caller-supplied prune bounds opens only
    the overlapping files at discovery time; the committed result is
    identical to the unpruned delete."""
    from ovalspark.sources.snapshots import snapshot_delete

    df = spark.range(4000).selectExpr("id as v", "cast(id as string) as doc_id")
    root = str(tmp_path / "del_prune_tbl")
    snapshot_write(df.repartitionByRange(8, "v"), root)
    sid = snapshot_delete(
        spark, root, "v between 1000 and 1100", prune=("v", 1000, 1100)
    )
    after = snapshot_read(spark, root, sid)
    assert after.count() == 4000 - 101
    assert after.filter("v between 1000 and 1100").count() == 0
    # files outside the range were never rewritten: their entries carried over
    m0, m1 = load_manifest(root, 1), load_manifest(root, sid)
    shared = {f["path"] for f in m0["files"]} & {f["path"] for f in m1["files"]}
    assert len(shared) >= 6  # 8 range files, predicate touches at most 2


def test_manifest_column_stats_zero_scan(spark, tmp_path):
    """Whole-table stats from metadata only: values match a real
    aggregation, the plan opens NO data files, integer columns are
    'exact', a statless column is absent, and the fold survives
    append + delete."""
    from ovalspark.sources.snapshots import manifest_column_stats, snapshot_delete

    df = spark.range(3000).selectExpr(
        "id as v",
        "cast(id as string) as doc_id",
        "case when id % 7 = 0 then null else id * 2 end as maybe",
    )
    root = str(tmp_path / "mstats_tbl")
    snapshot_write(df.repartitionByRange(4, "v"), root)
    snapshot_write(
        spark.range(3000, 3500).selectExpr(
            "id as v", "cast(id as string) as doc_id",
            "case when id % 7 = 0 then null else id * 2 end as maybe",
        ),
        root,
        mode="append",
    )
    sid = snapshot_delete(spark, root, "v >= 3400")

    st = manifest_column_stats(spark, root, sid)
    assert st.inputFiles() == []  # metadata only — no data file in the plan
    rows = {r.col_name: r for r in st.collect()}
    assert rows["v"].kind == "exact"
    assert (rows["v"].min_v, rows["v"].max_v) == ("0", "3399")
    assert rows["v"].n_rows == 3400 and rows["v"].n_nulls == 0
    exp_nulls = sum(1 for i in range(3400) if i % 7 == 0)
    assert rows["maybe"].n_nulls == exp_nulls
    assert rows["doc_id"].kind == "bound"  # string stats are bounds by contract


def test_validate_delete_read_back(spark, tmp_path):
    """Delete-then-verify (oval's delete + existence re-check): a clean
    delete verifies empty; a corrupted rewritten file (a matching row
    smuggled back in) yields DELETE_SURVIVOR rows naming the docs; the
    predicate comes from the manifest for SQL deletes and must be
    re-supplied for Column deletes."""
    import glob as g
    import json as j
    import os

    import pyarrow.parquet as pq

    from ovalspark.operators.incremental import validate_delete
    from ovalspark.sources.snapshots import load_manifest, snapshot_delete

    df = spark.range(400).selectExpr("cast(id as string) as doc_id", "cast(id % 4 as int) as grp")
    root = str(tmp_path / "vdel_tbl")
    snapshot_write(df.repartition(2, "grp"), root)
    sid = snapshot_delete(spark, root, "grp = 1")
    assert load_manifest(root, sid)["delete_predicate"] == "grp = 1"
    assert validate_delete(spark, root, sid).count() == 0  # verified clean

    # corrupt a REWRITTEN file in place: append a row that matches the
    # predicate (simulates a buggy rewrite / storage corruption)
    rewritten = sorted(
        g.glob(os.path.join(root, "data", f"snap-{sid}-*", "part-*.parquet"))
    )[0]
    t = pq.read_table(rewritten)
    import pyarrow as pa

    bad = pa.table({"doc_id": ["zombie"], "grp": pa.array([1], pa.int32())}).cast(t.schema)
    pq.write_table(pa.concat_tables([t, bad]), rewritten)
    # drop Hadoop's checksum sidecar: the in-place rewrite invalidates it
    # and LocalFS would (correctly) refuse the read — this test corrupts
    # CONTENT, not the transport
    crc = os.path.join(os.path.dirname(rewritten), f".{os.path.basename(rewritten)}.crc")
    if os.path.exists(crc):
        os.unlink(crc)
    v = validate_delete(spark, root, sid).collect()
    assert [r.violation_class for r in v] == ["DELETE_SURVIVOR"]
    assert v[0].doc_id == "zombie"

    # a Column delete records no predicate but persists the matched
    # doc_id set as a _deleted sidecar: verification is self-contained
    sid2 = snapshot_delete(spark, root, F.col("grp") == 2)
    m2 = load_manifest(root, sid2)
    assert m2["delete_predicate"] is None
    assert m2["deleted_docs"]["n_docs"] == m2["deleted_rows"] == 100
    assert validate_delete(spark, root, sid2).count() == 0
    # the explicitly re-supplied predicate path still works too
    assert validate_delete(spark, root, sid2, predicate="grp = 2").count() == 0
    # non-delete commits refuse verification
    with pytest.raises(ValueError, match="not a delete"):
        validate_delete(spark, root, 1)


def test_column_delete_sidecar_read_back(spark, tmp_path):
    """The _deleted sidecar closes the one unverifiable delete: a Column
    predicate has no SQL serialization, so the commit records the matched
    doc_id set and validate_delete semi-joins survivors against it —
    a smuggled-back deleted doc raises DELETE_SURVIVOR with no predicate
    re-supplied. A doc_id-less table can record neither and still
    demands an explicit predicate."""
    import glob as g
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ovalspark.operators.incremental import validate_delete
    from ovalspark.sources.snapshots import read_deleted_docs, snapshot_delete

    df = spark.range(300).selectExpr("cast(id as string) as doc_id", "cast(id % 3 as int) as grp")
    root = str(tmp_path / "sidecar_tbl")
    snapshot_write(df.repartition(2, "grp"), root)
    sid = snapshot_delete(spark, root, F.col("grp") == 1)
    promised = read_deleted_docs(spark, root, sid)
    assert promised.count() == 100
    assert promised.filter("cast(doc_id as int) % 3 != 1").count() == 0
    assert validate_delete(spark, root, sid).count() == 0

    # smuggle one promised-deleted doc back into a rewritten file
    rewritten = sorted(
        g.glob(os.path.join(root, "data", f"snap-{sid}-*", "part-*.parquet"))
    )[0]
    t = pq.read_table(rewritten)
    bad = pa.table({"doc_id": ["1"], "grp": pa.array([1], pa.int32())}).cast(t.schema)
    pq.write_table(pa.concat_tables([t, bad]), rewritten)
    crc = os.path.join(os.path.dirname(rewritten), f".{os.path.basename(rewritten)}.crc")
    if os.path.exists(crc):
        os.unlink(crc)
    v = validate_delete(spark, root, sid).collect()
    assert [r.violation_class for r in v] == ["DELETE_SURVIVOR"]
    assert v[0].doc_id == "1" and v[0].field == "deleted_docs"

    # SQL-string deletes carry the re-checkable predicate; no sidecar
    from ovalspark.sources.snapshots import load_manifest

    sid2 = snapshot_delete(spark, root, "grp = 2")
    assert "deleted_docs" not in load_manifest(root, sid2)

    # a table WITHOUT doc_id cannot record the set: explicit predicate
    # remains the only verification route, and its absence raises
    df2 = spark.range(50).selectExpr("id as k", "cast(id % 2 as int) as grp")
    root2 = str(tmp_path / "sidecar_nodoc")
    snapshot_write(df2, root2)
    sid3 = snapshot_delete(spark, root2, F.col("grp") == 0)
    assert "deleted_docs" not in load_manifest(root2, sid3)
    with pytest.raises(ValueError, match="predicate"):
        validate_delete(spark, root2, sid3)


def test_column_delete_all_rows_sidecar_survives_vacuum(spark, tmp_path):
    """A Column delete that removes EVERY row of its rewritten files
    leaves a data dir referenced only through the _deleted sidecar —
    vacuum must keep it (the expect-sidecar carve-out, inverted)."""
    from ovalspark.sources.snapshots import (
        read_deleted_docs,
        snapshot_delete,
        snapshot_read,
        vacuum,
    )

    df = spark.range(40).selectExpr("cast(id as string) as doc_id", "id as v")
    root = str(tmp_path / "sidecar_all")
    snapshot_write(df.coalesce(1), root)
    sid = snapshot_delete(spark, root, F.col("v") >= 0)  # everything goes
    assert snapshot_read(spark, root).count() == 0
    vacuum(root)
    assert read_deleted_docs(spark, root, sid).count() == 40


def test_snapshot_delete_null_predicate_rows_are_kept(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates NULL are
    NOT deleted (only predicate-TRUE rows go)."""
    from ovalspark.sources.snapshots import snapshot_delete

    df = spark.createDataFrame(
        [("a", 1), ("b", None), ("c", 5)], "doc_id string, score int"
    )
    root = str(tmp_path / "null_del_tbl")
    snapshot_write(df.coalesce(1), root)
    sid = snapshot_delete(spark, root, "score > 3")
    kept = {r.doc_id for r in snapshot_read(spark, root, sid).collect()}
    assert kept == {"a", "b"}  # NULL-scoring row b survives


def test_snapshot_compact_bin_packs_small_files(spark, tmp_path, small_world):
    """Compaction rewrites the sub-target files into fewer target-sized
    ones as a new snapshot; rows are identical, old layout still
    time-travels, operation is 'replace'."""
    from ovalspark.sources.snapshots import snapshot_compact

    _, cat, docs, _ = small_world
    root = str(tmp_path / "compact_tbl")
    # many tiny files: append commit-by-commit like a tail would
    s = snapshot_write(docs.limit(100).repartition(8), root)
    for i in range(3):
        s = snapshot_write(docs.limit(50).repartition(4), root, mode="append")
    m_before = load_manifest(root, s)
    assert len(m_before["files"]) >= 16

    s2 = snapshot_compact(spark, root, target_file_mb=64)
    m_after = load_manifest(root, s2)
    assert m_after["operation"] == "replace"
    assert len(m_after["files"]) < len(m_before["files"])
    assert m_after["total_rows"] == m_before["total_rows"]
    assert snapshot_read(spark, root, s2).count() == snapshot_read(spark, root, s).count()
    # compacting twice is a no-op once everything is packed
    assert snapshot_compact(spark, root, target_file_mb=64) in (s2, s2 + 1)


def test_first_commit_sizing_with_sampled_fallback(spark, tmp_path, small_world, monkeypatch):
    """S2 sizing on a FIRST commit with the private-API plan statistic
    unavailable: the sampled bytes/row estimate must still honor
    target_file_mb (huge target → one file; tiny target → several)."""
    from ovalspark.sources import snapshots as sn

    _, _, docs, _ = small_world
    monkeypatch.setattr(sn, "_plan_size_estimate", lambda df: None)

    root1 = str(tmp_path / "fallback_one")
    s = snapshot_write(docs, root1, target_file_mb=1024)
    assert len(load_manifest(root1, s)["files"]) == 1

    big = docs
    for _ in range(5):
        big = big.unionByName(big)
    root2 = str(tmp_path / "fallback_many")
    s = snapshot_write(big.localCheckpoint(), root2, target_file_mb=1)
    assert len(load_manifest(root2, s)["files"]) > 1


def test_snapshot_delete_rejects_invalid_discovery_cap(spark, tmp_path):
    """cap < 1 would make limit(cap+1) = limit(0) return no hit rows —
    a silent no-op delete. Invalid maintenance values raise loudly."""
    import pytest as _pytest

    from ovalspark.sources.snapshots import snapshot_delete

    root = str(tmp_path / "badcap_tbl")
    snapshot_write(spark.range(10).selectExpr("id as v"), root)
    for bad in (0, -1):
        with _pytest.raises(ValueError, match="discovery_cap"):
            snapshot_delete(spark, root, "v < 5", discovery_cap=bad)
    # table untouched: no delete commit happened
    assert snapshot_read(spark, root).count() == 10
