"""Delta-scoped incremental validation (operators/incremental.py) — the
batch analog of oval validating every PUT's read-back immediately
(``internal/runner/worker.go:100-118``): after an append commits, validate
ONLY the files that snapshot added, never re-scanning the corpus."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ovalspark.operators.incremental import validate_snapshot_delta
from ovalspark.sources.snapshots import load_manifest, manifest_diff, snapshot_write


def _split_world(spark, small_world, tmp_path, fault_fractions):
    """Base snapshot (clean docs) + appended delta snapshot (corrupted
    docs), split ~20/80 from the shared world by a doc_id hash."""
    from ovalspark.datagen import inject_faults

    spec, cat, docs, _ = small_world
    is_delta = F.pmod(F.xxhash64("doc_id", F.lit(53)), F.lit(5)) == 0
    cat_delta = cat.filter(is_delta).localCheckpoint()
    cat_base = cat.filter(~is_delta)
    docs_base = docs.filter(is_delta == False)  # noqa: E712 - same predicate on docs
    docs_delta = docs.filter(is_delta)
    bad_delta, _ = inject_faults(docs_delta, cat_delta, spec, fault_fractions)
    bad_delta = bad_delta.localCheckpoint()

    root = str(tmp_path / "delta_tbl")
    s1 = snapshot_write(docs_base.localCheckpoint(), root)
    s2 = snapshot_write(bad_delta, root, mode="append")
    return spec, cat, cat_base, cat_delta, bad_delta, root, s1, s2


def _basenames(paths):
    return {os.path.basename(p) for p in paths}


def test_delta_validation_catches_fault_and_scans_only_added_files(
    spark, tmp_path, small_world
):
    spec, cat, cat_base, cat_delta, bad_delta, root, s1, s2 = _split_world(
        spark, small_world, tmp_path, {"WRONG_KIND": 0.10, "LOST_DOC": 0.05}
    )
    added = manifest_diff(root, s1, s2)
    base_files = [f["path"] for f in load_manifest(root, s1)["files"]]
    assert added and _basenames(added).isdisjoint(_basenames(base_files))

    v = validate_snapshot_delta(spark, root, cat_delta, spec.n_assets, from_id=s1, to_id=s2)
    rows = v.collect()
    classes = {r["violation_class"] for r in rows}
    assert "WRONG_KIND" in classes and "LOST_DOC" in classes

    # every flagged doc belongs to the delta, never the base
    delta_ids = {r["doc_id"] for r in cat_delta.select("doc_id").collect()}
    assert all(r["doc_id"] in delta_ids for r in rows)

    # the PLAN proves pre-existing files were never opened: its parquet
    # inputs are exactly the added files
    scanned = _basenames(v.inputFiles())
    assert scanned == _basenames(added)
    assert scanned.isdisjoint(_basenames(base_files))


def test_delta_equals_full_validation_restricted_to_added_docs(spark, tmp_path, small_world):
    """Correctness contract: delta validation == full validation of the
    whole snapshot restricted to the delta's documents (the gate-query
    q53 shape, asserted here row-for-row within one session)."""
    from ovalspark.operators import check_existence, validate_spans
    from ovalspark.sources.snapshots import snapshot_read

    spec, cat, cat_base, cat_delta, bad_delta, root, s1, s2 = _split_world(
        spark, small_world, tmp_path, {"STALE_GENERATION": 0.10, "SIZE_MISMATCH": 0.05}
    )
    v_delta = validate_snapshot_delta(spark, root, cat_delta, spec.n_assets, from_id=s1, to_id=s2)

    all_docs = snapshot_read(spark, root, s2)
    v_full = validate_spans(all_docs, cat, spec.n_assets).unionByName(
        check_existence(all_docs, cat)
    )
    delta_ids = cat_delta.select("doc_id")
    v_full_restricted = v_full.join(delta_ids, "doc_id").select(*v_delta.columns)

    assert v_delta.exceptAll(v_full_restricted).count() == 0
    assert v_full_restricted.exceptAll(v_delta).count() == 0
    assert v_delta.count() > 0


def test_empty_diff_reports_expected_docs_lost(spark, tmp_path, small_world):
    """from_id == to_id adds nothing: a catalog expecting docs sees them
    all LOST; an empty catalog sees zero rows."""
    spec, cat, docs, _ = small_world
    root = str(tmp_path / "empty_diff_tbl")
    s1 = snapshot_write(docs.localCheckpoint(), root)

    few = cat.filter(F.col("exists")).limit(7).localCheckpoint()
    v = validate_snapshot_delta(spark, root, few, spec.n_assets, from_id=s1, to_id=s1)
    rows = v.collect()
    assert len(rows) == 7
    assert {r["violation_class"] for r in rows} == {"LOST_DOC"}

    none = cat.limit(0)
    assert validate_snapshot_delta(spark, root, none, spec.n_assets, from_id=s1, to_id=s1).count() == 0


def test_snapshot_tail_validates_each_commit_as_it_lands(spark, tmp_path, small_world):
    """The living form of validate-every-PUT: a writer thread appends two
    snapshots (one clean, one corrupted) while the tailer polls; the
    tailer must yield each commit in order, catch the fault ONLY in the
    corrupted delta, scope each plan to that delta's files, and terminate
    once no commit lands within the timeout."""
    import threading
    import time

    from ovalspark.datagen import inject_faults
    from ovalspark.operators.incremental import validate_snapshot_tail

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(97)), F.lit(3))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(3)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]
    bad2, _ = inject_faults(parts[2], cats[2], spec, {"WRONG_KIND": 0.15})
    bad2 = bad2.localCheckpoint()

    root = str(tmp_path / "tail_tbl")
    s1 = snapshot_write(parts[0], root)

    def writer():
        time.sleep(0.5)
        snapshot_write(parts[1], root, mode="append")  # clean append
        time.sleep(0.5)
        snapshot_write(bad2, root, mode="append")  # corrupted append

    t = threading.Thread(target=writer)
    t.start()
    got = []
    for sid, v in validate_snapshot_tail(
        spark, root, lambda sid: cats[sid - 1], spec.n_assets, after_id=s1, timeout_s=5.0
    ):
        added = _basenames(manifest_diff(root, sid - 1, sid))
        assert _basenames(v.inputFiles()) <= added  # plan scoped to this delta only
        got.append((sid, v.collect()))
    t.join()

    assert [sid for sid, _ in got] == [s1 + 1, s1 + 2]  # commit order, both seen
    assert got[0][1] == []  # clean append: zero violations
    classes = {r["violation_class"] for r in got[1][1]}
    assert classes == {"WRONG_KIND"}
    delta2_ids = {r["doc_id"] for r in cats[2].select("doc_id").collect()}
    assert all(r["doc_id"] in delta2_ids for r in got[1][1])


def _ten_commit_backlog(spark, tmp_path, small_world, name):
    """10 disjoint-doc commits (initial overwrite + 9 appends) with a
    WRONG_KIND fault planted in commit 7; returns (spec, root, cats)."""
    from ovalspark.datagen import inject_faults

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(10))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(10)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]
    bad7, _ = inject_faults(parts[6], cats[6], spec, {"WRONG_KIND": 0.2})
    parts[6] = bad7.localCheckpoint()

    root = str(tmp_path / name)
    snapshot_write(parts[0], root)
    for p in parts[1:]:
        snapshot_write(p, root, mode="append")
    return spec, root, cats


def test_tail_backlog_batches_into_one_spanning_job(spark, tmp_path, small_world):
    """A tailer waking up 10 commits behind must validate the WHOLE
    backlog as ONE item whose single delta plan spans every commit's
    files (instead of 10 jobs at the per-job scheduling floor), catch the
    fault planted in commit 7, and produce row-identical results to the
    per-commit tail."""
    from ovalspark.operators.incremental import validate_snapshot_tail

    spec, root, cats = _ten_commit_backlog(spark, tmp_path, small_world, "backlog_tbl")

    def catalog_for(sid):
        return cats[sid - 1]

    got = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=0, timeout_s=1.0, batch_commits=True
        )
    )
    assert len(got) == 1  # the 10-commit backlog arrived as ONE item
    sids, v = got[0]
    assert sids == list(range(1, 11))
    # the ONE plan's parquet inputs are exactly the union of all 10
    # commits' added files — one spanning job, nothing re-read, nothing
    # skipped
    assert _basenames(v.inputFiles()) == _basenames(manifest_diff(root, None, 10))

    rows = v.collect()
    commit7_ids = {r["doc_id"] for r in cats[6].select("doc_id").collect()}
    assert rows and {r["violation_class"] for r in rows} == {"WRONG_KIND"}
    assert all(r["doc_id"] in commit7_ids for r in rows)  # fault localized to commit 7

    # equivalence: batched backlog == concatenation of per-commit runs
    per_commit = []
    for sid, pv in validate_snapshot_tail(
        spark, root, catalog_for, spec.n_assets, after_id=0, timeout_s=1.0, batch_commits=False
    ):
        per_commit.extend(pv.collect())
    assert sorted(map(tuple, rows)) == sorted(map(tuple, per_commit))


def test_tail_backlog_batched_catches_misplaced_commit_docs(spark, tmp_path, small_world):
    """The masking case a plain union-catalog span job would miss: a doc
    EXPECTED by commit 2 but WRITTEN by commit 3 must report LOST_DOC
    (commit 2's verdict) + PHANTOM_DOC (commit 3's) in batched mode,
    row-identical to per-commit validation — not cancel out to clean."""
    from ovalspark.operators.incremental import validate_snapshot_tail

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(41)), F.lit(3))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(3)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]

    # move one of part-1's docs into part 2's files; catalogs unchanged
    moved_id = parts[1].select("doc_id").orderBy("doc_id").first()["doc_id"]
    moved_doc = parts[1].filter(F.col("doc_id") == moved_id).localCheckpoint()
    part1 = parts[1].filter(F.col("doc_id") != moved_id).localCheckpoint()
    part2 = parts[2].unionByName(moved_doc).localCheckpoint()

    def build(name):
        root = str(tmp_path / name)
        snapshot_write(parts[0], root)
        snapshot_write(part1, root, mode="append")
        snapshot_write(part2, root, mode="append")
        return root

    def run(root, batch):
        rows = []
        for _sid, v in validate_snapshot_tail(
            spark, root, lambda s: cats[s - 1], spec.n_assets,
            after_id=0, timeout_s=1.0, batch_commits=batch,
        ):
            rows.extend(v.collect())
        return sorted(map(tuple, rows))

    per_commit = run(build("mis_pc"), batch=False)
    batched = run(build("mis_b"), batch=True)
    assert batched == per_commit  # row-identical, including the pair below
    classes = [(r[1], r[6]) for r in batched if r[1] == moved_id]  # (doc_id, class)
    assert sorted(c for _, c in classes) == ["LOST_DOC", "PHANTOM_DOC"]


def test_tail_backlog_overwrite_span_falls_back_to_per_commit(spark, tmp_path, small_world):
    """An overwrite inside the backlog makes a span crossing it unsound
    (its diff would drop the overwritten commits' files), so the tailer
    must BREAK the run there: the commits before it still batch (round-6
    segmentation — previously the whole backlog fell back), the
    overwrite goes through as its own item."""
    from ovalspark.operators.incremental import validate_snapshot_tail

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(19)), F.lit(3))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(3)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]

    root = str(tmp_path / "ow_span_tbl")
    snapshot_write(parts[0], root)
    snapshot_write(parts[1], root, mode="append")
    snapshot_write(parts[2], root, mode="overwrite")  # drops 1+2's files

    got = list(
        validate_snapshot_tail(
            spark,
            root,
            lambda sid: cats[sid - 1],
            spec.n_assets,
            after_id=0,
            timeout_s=1.0,
            batch_commits=True,
        )
    )
    # pre-overwrite appends batch; the overwrite is its own item
    assert [s for s, _ in got] == [[1, 2], [3]]
    assert all(v.count() == 0 for _, v in got)  # each clean against its own catalog


def test_tail_checkpointed_batches_backlog_and_resumes_exactly(spark, tmp_path, small_world):
    """Checkpointed tail + batching: the backlog lands as one lineage
    span record (position = span's last id, every id resolvable), the
    sink is idempotent on the span partition, and a later commit resumes
    at exactly the next id."""
    from ovalspark.operators.incremental import TailState, validate_snapshot_tail_checkpointed

    spec, root, cats = _ten_commit_backlog(spark, tmp_path, small_world, "ckpt_backlog_tbl")
    state_path = str(tmp_path / "bk_state.json")
    sink = str(tmp_path / "bk_sink")

    def catalog_for(sid):
        return cats[(sid - 1) % 10]

    first = list(
        validate_snapshot_tail_checkpointed(
            spark,
            root,
            catalog_for,
            state_path,
            sink_dir=sink,
            n_assets=spec.n_assets,
            timeout_s=0.5,
            batch_commits=True,
        )
    )
    assert [s for s, _ in first] == [10]  # one durable step for the whole span
    assert first[0][1] > 0  # commit-7 fault surfaced through the span
    st = TailState(state_path)
    assert st.last_validated_id == 10
    recs = st.snapshots
    assert set(recs) == {str(i) for i in range(1, 11)}  # every id resolves
    assert recs["7"]["snapshot_ids"] == list(range(1, 11))  # ...to the span record
    assert spark.read.parquet(f"{sink}/snapshot=10").count() == first[0][1]

    # one more clean commit (commit 1's docs re-appended — a single
    # pending commit forms no span, so disjointness is never consulted):
    # resume picks up at exactly 11
    docs11 = spark.read.parquet(*manifest_diff(root, None, 1))
    snapshot_write(docs11, root, mode="append")
    second = list(
        validate_snapshot_tail_checkpointed(
            spark,
            root,
            lambda sid: cats[0],
            state_path,
            sink_dir=sink,
            n_assets=spec.n_assets,
            timeout_s=0.5,
            batch_commits=True,
        )
    )
    assert [s for s, _ in second] == [11]
    assert TailState(state_path).last_validated_id == 11


def test_tail_checkpointed_batched_crash_orphan_partition_converges(
    spark, tmp_path, small_world
):
    """The batched sink's partition key is the span's LAST id — which is
    timing-dependent: a crash between the sink write (snapshot=K) and the
    state advance, with more commits landing during downtime, makes the
    rerun form a LONGER span ending K' > K. Without cleanup the orphaned
    snapshot=K partition would double-count its commits' violations next
    to snapshot=K'. The rerun must delete every partition its span covers
    before writing, converging to the same sink bytes as an uninterrupted
    run."""
    from ovalspark.datagen import inject_faults
    from ovalspark.operators.incremental import (
        TailState,
        validate_snapshot_tail_checkpointed,
    )

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(11)), F.lit(12))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(12)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]
    bad, _ = inject_faults(parts[4], cats[4], spec, {"WRONG_KIND": 0.3})
    parts[4] = bad.localCheckpoint()

    root = str(tmp_path / "orphan_tbl")
    snapshot_write(parts[0], root)
    for p in parts[1:10]:
        snapshot_write(p, root, mode="append")

    def catalog_for(sid):
        return cats[sid - 1]

    state_path = str(tmp_path / "orphan_state.json")
    sink = str(tmp_path / "orphan_sink")
    first = list(
        validate_snapshot_tail_checkpointed(
            spark, root, catalog_for, state_path, sink_dir=sink,
            n_assets=spec.n_assets, timeout_s=0.5, batch_commits=True,
        )
    )
    assert [s for s, _ in first] == [10]
    assert os.path.isdir(f"{sink}/snapshot=10")

    # CRASH SIMULATION: partition snapshot=10 was written but the state
    # never advanced — and two more commits land during the downtime
    os.unlink(state_path)
    os.unlink(state_path + ".lineage.jsonl")
    snapshot_write(parts[10], root, mode="append")
    snapshot_write(parts[11], root, mode="append")

    second = list(
        validate_snapshot_tail_checkpointed(
            spark, root, catalog_for, state_path, sink_dir=sink,
            n_assets=spec.n_assets, timeout_s=0.5, batch_commits=True,
        )
    )
    assert [s for s, _ in second] == [12]  # rerun spans 1..12 in one job
    # the orphaned snapshot=10 partition is GONE — no double counting
    partitions = sorted(
        os.path.basename(d) for d in __import__("glob").glob(f"{sink}/snapshot=*")
    )
    assert partitions == ["snapshot=12"]
    assert TailState(state_path).last_validated_id == 12

    # uninterrupted control run over the same 12 commits: same bytes
    ctrl_state = str(tmp_path / "orphan_ctrl_state.json")
    ctrl_sink = str(tmp_path / "orphan_ctrl_sink")
    list(
        validate_snapshot_tail_checkpointed(
            spark, root, catalog_for, ctrl_state, sink_dir=ctrl_sink,
            n_assets=spec.n_assets, timeout_s=0.5, batch_commits=True,
        )
    )
    got = spark.read.parquet(f"{sink}/snapshot=12")
    want = spark.read.parquet(f"{ctrl_sink}/snapshot=12")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == second[0][1] > 0


def test_tail_verifies_delete_commits(spark, tmp_path, small_world):
    """A tailed DELETE commit carries its read-back obligation: a clean
    delete yields zero violations; a rewritten file with a smuggled-back
    predicate-matching row yields DELETE_SURVIVOR through the tail."""
    import glob as g
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ovalspark.operators.incremental import validate_snapshot_tail
    from ovalspark.sources.snapshots import snapshot_delete

    spec, cat, docs, _ = small_world
    root = str(tmp_path / "tail_del_tbl")
    snapshot_write(docs.localCheckpoint().repartition(2, "partition_id"), root)
    sid = snapshot_delete(spark, root, "partition_id = 0")

    def catalog_for(s):
        # survivors of the commit's rewritten files, the CLI's scoping
        ids = spark.read.parquet(*manifest_diff(root, s - 1, s)).select("doc_id")
        return cat.join(ids, "doc_id", "semi")

    got = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=1, timeout_s=0.5
        )
    )
    assert [s for s, _ in got] == [sid]
    assert got[0][1].count() == 0  # clean delete: survivors valid, none match

    # smuggle a predicate-matching row back into a rewritten file
    rewritten = sorted(
        g.glob(os.path.join(root, "data", f"snap-{sid}-*", "part-*.parquet"))
    )[0]
    t = pq.read_table(rewritten)
    row = t.slice(0, 1).to_pydict()
    row["partition_id"] = [0]  # matches the delete predicate
    # int96 timestamps: match Spark's own parquet encoding so the
    # rewritten file stays readable by the Spark scan under test
    pq.write_table(
        pa.concat_tables([t, pa.Table.from_pydict(row, t.schema)]),
        rewritten,
        use_deprecated_int96_timestamps=True,
    )
    crc = os.path.join(os.path.dirname(rewritten), f".{os.path.basename(rewritten)}.crc")
    if os.path.exists(crc):
        os.unlink(crc)

    got2 = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=1, timeout_s=0.5
        )
    )
    classes = {r.violation_class for r in got2[0][1].collect()}
    assert "DELETE_SURVIVOR" in classes


def test_tail_verifies_column_delete_via_sidecar(spark, tmp_path, small_world):
    """A COLUMN-predicate delete (no SQL serialization) is read-back
    verified by the tail through its _deleted sidecar: the smuggled-back
    doc is named by doc_id from the recorded set, no predicate anywhere
    in the verification path."""
    import glob as g
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from ovalspark.operators.incremental import validate_snapshot_tail
    from ovalspark.sources.snapshots import snapshot_delete

    spec, cat, docs, _ = small_world
    root = str(tmp_path / "tail_coldel_tbl")
    snapshot_write(docs.localCheckpoint().repartition(2, "partition_id"), root)
    sid = snapshot_delete(spark, root, F.col("partition_id") == 0)

    def catalog_for(s):
        ids = spark.read.parquet(*manifest_diff(root, s - 1, s)).select("doc_id")
        return cat.join(ids, "doc_id", "semi")

    got = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=1, timeout_s=0.5
        )
    )
    assert [s for s, _ in got] == [sid]
    assert got[0][1].count() == 0  # clean delete verifies empty

    rewritten = sorted(
        g.glob(os.path.join(root, "data", f"snap-{sid}-*", "part-*.parquet"))
    )[0]
    t = pq.read_table(rewritten)
    row = t.slice(0, 1).to_pydict()
    # the sidecar joins on doc_id (not the unserializable predicate):
    # the smuggled row must carry a doc the recorded set says is gone
    from ovalspark.sources.snapshots import read_deleted_docs

    row["doc_id"] = [read_deleted_docs(spark, root, sid).first().doc_id]
    pq.write_table(
        pa.concat_tables([t, pa.Table.from_pydict(row, t.schema)]),
        rewritten,
        use_deprecated_int96_timestamps=True,
    )
    crc = os.path.join(os.path.dirname(rewritten), f".{os.path.basename(rewritten)}.crc")
    if os.path.exists(crc):
        os.unlink(crc)

    got2 = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=1, timeout_s=0.5
        )
    )
    rows = [r for r in got2[0][1].collect() if r.violation_class == "DELETE_SURVIVOR"]
    assert rows and rows[0].field == "deleted_docs"


def test_tail_backlog_with_interleaved_deletes_batches_one_job(spark, tmp_path, small_world):
    """A backlog of appends WITH an interleaved predicate delete batches
    into ONE spanning job (round-5 fell back to per-commit for any span
    containing a delete): the job's inputs are the union of per-commit
    diffs — including the file the delete rewrote away, still validated
    under its own commit — results are row-identical to the per-commit
    tail, and a survivor smuggled back into the delete's rewritten file
    is caught as DELETE_SURVIVOR inside the batch."""
    import glob as g
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ovalspark.operators.incremental import validate_snapshot_tail
    from ovalspark.sources.snapshots import snapshot_delete

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(4))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(4)]
    cats = {
        i + 1: cat.join(parts[i].select("doc_id"), "doc_id", "semi").localCheckpoint()
        for i in range(3)
    }

    root = str(tmp_path / "del_span_tbl")
    snapshot_write(parts[0], root)
    snapshot_write(parts[1], root, mode="append")
    snapshot_write(parts[2], root, mode="append")
    # delete HALF of part 1 (by a stable doc_id hash): the delete's diff
    # is its survivor files; part 1's original file leaves the manifest
    pred = "pmod(xxhash64(doc_id, 7), 4) = 1 AND pmod(xxhash64(doc_id, 11), 2) = 0"
    sid_del = snapshot_delete(spark, root, pred)
    assert sid_del == 4
    snapshot_write(parts[3], root, mode="append")

    def catalog_for(s):
        if s == 4:  # the delete: expected state = its surviving docs
            ids = spark.read.parquet(*manifest_diff(root, 3, 4)).select("doc_id")
            return cat.join(ids, "doc_id", "semi")
        if s == 5:
            return cat.join(parts[3].select("doc_id"), "doc_id", "semi")
        return cats[s]

    batched = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=0, timeout_s=0.5,
            batch_commits=True,
        )
    )
    assert [sids for sids, _ in batched] == [[1, 2, 3, 4, 5]]  # ONE span
    v = batched[0][1]
    # the ONE job's inputs are the union of per-commit diffs — commit 2's
    # original file (rewritten away by the delete) included
    want_files = {
        os.path.basename(p)
        for s in range(1, 6)
        for p in manifest_diff(root, (s - 1) or None, s)
    }
    assert _basenames(v.inputFiles()) == want_files
    assert v.count() == 0  # clean world, legitimate delete: no violations

    per_commit = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=0, timeout_s=0.5,
        )
    )
    assert [s for s, _ in per_commit] == [1, 2, 3, 4, 5]
    for _, pv in per_commit:
        assert pv.count() == 0  # row-identical: both sides empty

    # smuggle a predicate-matching row back into a delete-rewritten file:
    # the batched span must catch it exactly as the per-commit tail does
    rewritten = sorted(
        g.glob(os.path.join(root, "data", f"snap-{sid_del}-*", "part-*.parquet"))
    )
    target = next(p for p in rewritten if pq.ParquetFile(p).metadata.num_rows > 0)
    t = pq.read_table(target)
    deleted_ids = [
        r["doc_id"]
        for r in spark.read.parquet(*manifest_diff(root, 1, 2))
        .filter(pred)
        .select("doc_id")
        .limit(1)
        .collect()
    ]
    row = t.slice(0, 1).to_pydict()
    row["doc_id"] = [deleted_ids[0]]  # matches the delete predicate again
    pq.write_table(
        pa.concat_tables([t, pa.Table.from_pydict(row, t.schema)]),
        target,
        use_deprecated_int96_timestamps=True,
    )
    crc = os.path.join(os.path.dirname(target), f".{os.path.basename(target)}.crc")
    if os.path.exists(crc):
        os.unlink(crc)

    batched2 = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=0, timeout_s=0.5,
            batch_commits=True,
        )
    )
    rows2 = batched2[0][1].collect()
    assert "DELETE_SURVIVOR" in {r.violation_class for r in rows2}
    per_commit2 = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=0, timeout_s=0.5,
        )
    )
    flat = [r for _, pv in per_commit2 for r in pv.collect()]

    def _canon(rows):  # None-safe order-insensitive comparison
        return sorted(tuple(str(v) for v in r) for r in rows)

    assert _canon(rows2) == _canon(flat)  # row-identical


def test_tail_replace_commit_verifies_equivalence(spark, tmp_path, small_world):
    """A compaction (replace) commit tailed as a cheap equivalence check
    instead of an O(table) re-validation: the catalog is never consulted
    (layout change, no new data), a clean compact yields zero violations,
    and a replace that silently drops a row is caught as
    REPLACE_MISMATCH — both directly and through the tail."""
    import glob as _glob
    import json as _json
    import uuid as _uuid

    from ovalspark.operators.incremental import validate_replace, validate_snapshot_tail
    from ovalspark.sources.snapshots import (
        _commit_manifest,
        _footer_stats,
        load_manifest,
        snapshot_compact,
        snapshot_read,
    )

    spec, cat, docs, _ = small_world
    root = str(tmp_path / "replace_tbl")
    snapshot_write(docs.repartition(6).localCheckpoint(), root)
    assert snapshot_compact(spark, root, target_file_mb=128) == 2
    assert load_manifest(root, 2)["operation"] == "replace"

    def no_catalog(sid):  # pragma: no cover - must never run
        raise AssertionError("replace validation must not consult the catalog")

    got = list(
        validate_snapshot_tail(
            spark, root, no_catalog, spec.n_assets, after_id=1, timeout_s=0.5
        )
    )
    assert [s for s, _ in got] == [2]
    assert got[0][1].count() == 0  # clean compaction verifies clean

    # corrupt replace: rewrite snapshot 2's rows MINUS one doc and commit
    # it as snapshot 3 with operation=replace — the engine must not trust
    # the operation label
    full = snapshot_read(spark, root, 2).localCheckpoint()
    doomed = full.select("doc_id").first()["doc_id"]
    data_dir = f"{root}/data/snap-3-{_uuid.uuid4().hex[:8]}"
    broken = full.filter(F.col("doc_id") != doomed)
    broken.write.parquet(data_dir)
    files = _footer_stats(_glob.glob(f"{data_dir}/part-*.parquet"), root)
    m2 = load_manifest(root, 2)
    _commit_manifest(
        root,
        2,
        3,
        {
            "snapshot_id": 3,
            "parent_id": 2,
            "operation": "replace",
            "schema_ddl": m2["schema_ddl"],
            "schema_json": m2["schema_json"],
            "total_rows": sum(f["rows"] for f in files),
            "total_bytes": sum(f["bytes"] for f in files),
            "files": files,
        },
    )
    v = validate_replace(spark, root, 3)
    rows = v.collect()
    assert [r["violation_class"] for r in rows] == ["REPLACE_MISMATCH"]
    assert rows[0]["expected"] != rows[0]["actual"]
    # and the tail surfaces it the same way
    got3 = list(
        validate_snapshot_tail(
            spark, root, no_catalog, spec.n_assets, after_id=2, timeout_s=0.5
        )
    )
    assert got3[0][1].count() == 1


def test_tail_backlog_compaction_splits_runs_not_whole_backlog(spark, tmp_path, small_world):
    """A periodic compaction inside an append backlog must not force the
    WHOLE backlog per-commit: the appends before it batch as one span,
    the replace goes through alone (verified by equivalence), and the
    appends after it batch as another span."""
    from ovalspark.operators.incremental import validate_snapshot_tail
    from ovalspark.sources.snapshots import load_manifest, snapshot_compact

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(13)), F.lit(5))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(5)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]

    root = str(tmp_path / "compact_run_tbl")
    snapshot_write(parts[0].repartition(4), root)
    snapshot_write(parts[1].repartition(4), root, mode="append")
    snapshot_write(parts[2].repartition(4), root, mode="append")
    sid_c = snapshot_compact(spark, root, target_file_mb=512)
    assert sid_c == 4 and load_manifest(root, 4)["operation"] == "replace"
    snapshot_write(parts[3], root, mode="append")
    snapshot_write(parts[4], root, mode="append")

    calls = []

    def catalog_for(s):
        calls.append(s)
        assert s != 4  # the replace must never consult the catalog
        return cats[s - 1] if s < 4 else cats[s - 2]

    got = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=0, timeout_s=0.5,
            batch_commits=True,
        )
    )
    assert [sids for sids, _ in got] == [[1, 2, 3], [4], [5, 6]]
    for _, v in got:
        assert v.count() == 0  # clean world end to end


def test_batched_span_delete_predicate_on_evolved_column(spark, tmp_path, small_world):
    """A batched span crossing an ADDITIVE SCHEMA EVOLUTION whose delete
    predicate names the evolved column: the span job must read at the
    span's widest committed schema (pre-evolution files NULL-fill) —
    with inferred schema the survivor filter could fail analysis or,
    worse, silently validate nothing. Results stay row-identical to the
    per-commit tail."""
    from ovalspark.operators.incremental import validate_snapshot_tail
    from ovalspark.sources.snapshots import snapshot_delete

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(31)), F.lit(2))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(2)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]

    root = str(tmp_path / "evolved_span_tbl")
    snapshot_write(parts[0], root)
    # additive evolution inside the span: commit 2 carries batch_tag
    snapshot_write(parts[1].withColumn("batch_tag", F.lit("b2")), root, mode="append")
    pred = "batch_tag = 'b2' AND pmod(xxhash64(doc_id, 41), 2) = 0"
    sid = snapshot_delete(spark, root, pred)
    assert sid == 3  # half of part 1 goes; batch_tag-NULL rows are kept

    def catalog_for(s):
        if s == 3:
            ids = spark.read.parquet(*manifest_diff(root, 2, 3)).select("doc_id")
            return cat.join(ids, "doc_id", "semi")
        return cats[s - 1]

    batched = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=0, timeout_s=0.3,
            batch_commits=True,
        )
    )
    assert [sids for sids, _ in batched] == [[1, 2, 3]]  # ONE evolved span
    assert batched[0][1].count() == 0
    per_commit = list(
        validate_snapshot_tail(
            spark, root, catalog_for, spec.n_assets, after_id=0, timeout_s=0.3,
        )
    )
    assert all(v.count() == 0 for _, v in per_commit)


def test_tail_batched_equals_per_commit_randomized_histories(spark, tmp_path, small_world):
    """Property over randomized commit histories: for seeded random
    sequences of appends, predicate deletes and compactions — with
    faults injected into random append commits — the batched tail's
    total violation row set equals the per-commit tail's, row for row
    (the overwrite-segmentation case has its own dedicated test). This
    is the strongest equivalence statement for the round-6 segmentation:
    whatever the op interleaving, batching never changes the answer."""
    import random

    from ovalspark.datagen import inject_faults
    from ovalspark.operators.incremental import validate_snapshot_tail
    from ovalspark.sources.snapshots import (
        load_manifest,
        snapshot_compact,
        snapshot_delete,
    )

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(29)), F.lit(8))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(8)]
    part_cats = [
        cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts
    ]

    def canon(rows):
        return sorted(tuple(str(v) for v in r) for r in rows)

    for seed in (11, 37):
        rng = random.Random(seed)
        root = str(tmp_path / f"rand_hist_{seed}")
        order = list(range(8))
        rng.shuffle(order)
        snapshot_write(parts[order[0]].repartition(3), root)
        cats = {1: part_cats[order[0]]}
        next_part = 1
        # ops: weighted mix; deletes use a stable doc_id-hash predicate
        while next_part < 8:
            op = rng.choices(["append", "delete", "compact"], [6, 2, 1])[0]
            if op == "append":
                i = order[next_part]
                p = parts[i]
                if rng.random() < 0.4:
                    bad, _ = inject_faults(p, part_cats[i], spec, {"WRONG_KIND": 0.2})
                    p = bad.localCheckpoint()
                sid = snapshot_write(p, root, mode="append")
                cats[sid] = part_cats[i]
                next_part += 1
            elif op == "delete":
                pred = (
                    f"pmod(xxhash64(doc_id, {rng.randrange(100)}), 4) = 0"
                )
                before = max(cats)
                sid = snapshot_delete(spark, root, pred)
                if sid == before:
                    continue  # matched nothing: no commit
                ids = spark.read.parquet(*manifest_diff(root, sid - 1, sid)).select("doc_id")
                cats[sid] = cat.join(ids, "doc_id", "semi").localCheckpoint()
            else:
                before = max(cats)
                sid = snapshot_compact(spark, root, target_file_mb=512)
                if sid == before:
                    continue
                cats[sid] = None  # replace: catalog never consulted

        def catalog_for(s):
            assert cats[s] is not None, f"catalog consulted for replace commit {s}"
            return cats[s]

        batched = list(
            validate_snapshot_tail(
                spark, root, catalog_for, spec.n_assets, after_id=0, timeout_s=0.3,
                batch_commits=True,
            )
        )
        per_commit = list(
            validate_snapshot_tail(
                spark, root, catalog_for, spec.n_assets, after_id=0, timeout_s=0.3,
            )
        )
        # every commit covered exactly once, in order, both modes
        assert [s for sids, _ in batched for s in sids] == [s for s, _ in per_commit]
        assert any(len(sids) > 1 for sids, _ in batched)  # batching actually fired
        b_rows = canon(r for _, v in batched for r in v.collect())
        p_rows = canon(r for _, v in per_commit for r in v.collect())
        assert b_rows == p_rows
        assert load_manifest(root, max(cats))  # history intact


def test_snapshot_tail_never_yields_torn_commit(spark, tmp_path, small_world):
    """A manifest at CURRENT+1 whose writer died before the flip is not a
    commit: the tailer must not surface it (CURRENT is the single
    visibility boundary), and a resumed tailer (after_id=N) sees only
    what committed after N."""
    import json as _json
    import os as _os

    from ovalspark.operators.incremental import iter_committed_snapshots

    spec, cat, docs, _ = small_world
    root = str(tmp_path / "torn_tail_tbl")
    s1 = snapshot_write(docs.localCheckpoint(), root)

    # fabricate a torn commit: manifest file exists, CURRENT never flipped
    torn_path = _os.path.join(root, "manifest", f"v{s1 + 1}.json")
    m = _json.load(open(_os.path.join(root, "manifest", f"v{s1}.json")))
    m["snapshot_id"], m["parent_id"] = s1 + 1, s1
    with open(torn_path, "w") as f:
        _json.dump(m, f)

    assert list(iter_committed_snapshots(root, after_id=s1, timeout_s=1.0)) == []
    # resume semantics: from 0, only the real commit appears
    assert list(iter_committed_snapshots(root, after_id=0, timeout_s=1.0)) == [s1]


def test_snapshot_tail_checkpoint_resume_is_exact_and_idempotent(spark, tmp_path, small_world):
    """Kill-between-snapshots resume: a first tailer validates commits 2-3
    and dies (we stop consuming); a second tailer with the same state file
    must resume at exactly 4 — never re-validating 2-3, never skipping —
    and the sink + state must equal an uninterrupted run's."""
    import json

    from ovalspark.datagen import inject_faults
    from ovalspark.operators.incremental import TailState, validate_snapshot_tail_checkpointed

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(131)), F.lit(4))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(4)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]
    bad3, _ = inject_faults(parts[3], cats[3], spec, {"WRONG_KIND": 0.2})
    bad3 = bad3.localCheckpoint()

    root = str(tmp_path / "ckpt_tail_tbl")
    state_path = str(tmp_path / "tail_state.json")
    sink = str(tmp_path / "tail_sink")
    snapshot_write(parts[0], root)
    snapshot_write(parts[1], root, mode="append")
    snapshot_write(parts[2], root, mode="append")

    def catalog_for(sid):
        return cats[sid - 1] if sid < 4 else cats[3]

    # first tailer: consume only the two pending commits, then "die"
    it = validate_snapshot_tail_checkpointed(
        spark, root, catalog_for, state_path, sink_dir=sink, n_assets=spec.n_assets, timeout_s=0.5
    )
    first = [next(it), next(it), next(it)]
    it.close()
    assert [s for s, _ in first] == [1, 2, 3]  # fresh state: base commit too
    assert TailState(state_path).last_validated_id == 3

    # a corrupted commit lands while no tailer runs
    snapshot_write(bad3, root, mode="append")

    second = list(
        validate_snapshot_tail_checkpointed(
            spark, root, catalog_for, state_path, sink_dir=sink, n_assets=spec.n_assets, timeout_s=0.5
        )
    )
    assert [s for s, _ in second] == [4]  # resumed exactly after 3
    assert second[0][1] > 0  # fault caught

    st = TailState(state_path).snapshots
    assert set(st) == {"1", "2", "3", "4"}
    assert all(st[k]["n_violations"] == 0 for k in ("1", "2", "3"))
    assert st["4"]["n_violations"] == second[0][1]
    # a torn lineage tail line (crash mid-append) is unclaimed and ignored
    with open(state_path + ".lineage.jsonl", "a") as f:
        f.write('{"snapshot_id": 5, "n_viol')
    st2 = TailState(state_path)
    assert st2.last_validated_id == 4 and set(st2.snapshots) == {"1", "2", "3", "4"}
    # sink holds exactly the per-snapshot violation sets
    v4 = spark.read.parquet(f"{sink}/snapshot=4")
    assert v4.count() == second[0][1]
    assert {r.violation_class for r in v4.collect()} == {"WRONG_KIND"}


def test_tailstate_lineage_rollup_bounds_the_log(tmp_path):
    """A long-lived tail's lineage log compacts into a rollup snapshot:
    the jsonl never outgrows rollup_bytes by more than one flush cycle,
    inspection resolves every id through rollup + tail overlay, and the
    write path stays one append + one tiny rename per record."""
    import json
    import os

    from ovalspark.operators.incremental import TailState

    path = str(tmp_path / "ts")
    st = TailState(path, rollup_bytes=16 * 1024)
    for i in range(1, 2001):
        st.record(i, i % 7, [f"part-{i}.parquet"])
    # the log was folded away repeatedly — bounded, not O(history)
    assert os.path.getsize(st.lineage_path) <= 16 * 1024 + 4096
    assert os.path.exists(st.rollup_path)

    st2 = TailState(path, rollup_bytes=16 * 1024)
    assert st2.last_validated_id == 2000
    snaps = st2.snapshots
    assert len(snaps) == 2000
    assert snaps["1"]["n_violations"] == 1 and snaps["1999"]["n_violations"] == 1999 % 7
    # span records resolve for every covered id through the rollup too
    st2.record(2003, 0, ["a.parquet", "b.parquet"], span=[2001, 2002, 2003])
    with open(st2.rollup_path) as f:
        json.load(f)  # rollup is one well-formed JSON document
    assert {snaps_id in TailState(path).snapshots for snaps_id in ("2001", "2002", "2003")} == {True}


def test_tailstate_rollup_crash_window_converges(tmp_path):
    """Crash between the rollup rename and the log truncate: every line
    is ALSO in the rollup, and the id-keyed overlay converges to the
    same records — no duplicates, no loss, and recording continues."""
    import json

    from ovalspark.operators.incremental import TailState

    path = str(tmp_path / "tscrash")
    st = TailState(path, rollup_bytes=1 << 30)  # never auto-compacts
    for i in range(1, 11):
        st.record(i, 0, [f"p{i}.parquet"])
    # simulate the torn compaction: rollup written, truncate never ran
    resolved = st.snapshots
    with open(st.rollup_path, "w") as f:
        json.dump(resolved, f)

    st2 = TailState(path)
    assert st2.last_validated_id == 10 and len(st2.snapshots) == 10
    st2.record(11, 2, ["p11.parquet"])
    snaps = TailState(path).snapshots
    assert set(snaps) == {str(i) for i in range(1, 12)}
    assert snaps["11"]["n_violations"] == 2


def test_validate_replace_expired_parent_is_diagnosable(spark, tmp_path):
    """Retention expiring a replace commit's parent before the tail
    catches up: equivalence is unverifiable, and the verdict must be a
    distinct REPLACE_UNVERIFIED row — diagnosable — never an unexplained
    FileNotFoundError crash."""
    from ovalspark.operators.incremental import validate_replace
    from ovalspark.sources.snapshots import (
        expire_snapshots,
        load_manifest,
        snapshot_compact,
    )

    root = str(tmp_path / "expired_parent_tbl")
    df = spark.range(500).selectExpr("id as v", "cast(id as string) as doc_id")
    snapshot_write(df.repartition(4), root)
    assert snapshot_compact(spark, root, target_file_mb=64) == 2
    assert load_manifest(root, 2)["operation"] == "replace"
    assert validate_replace(spark, root, 2).count() == 0  # parent present

    assert expire_snapshots(root, keep_last=1, min_age_s=0) == [1]
    rows = validate_replace(spark, root, 2).collect()
    assert [r["violation_class"] for r in rows] == ["REPLACE_UNVERIFIED"]
    assert "expired" in rows[0]["actual"]
