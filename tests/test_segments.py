"""Manifest file-list segments — the O(added)-metadata commit path.

Without segments every append manifest re-serializes the CUMULATIVE file
list: O(total files) metadata bytes per commit, O(total²) over a table's
life — at 10⁶ files × ~200 B/entry each append would rewrite ~200 MB of
JSON, which is the metadata bottleneck long before the data is. With
segments (Iceberg's manifest-list/manifest-file split, reference scale
target /root/reference/internal/s3client/s3client.go:145-162) an append
writes its own entries plus at most ONE spill of the parent's inline
tail; untouched segments ride through delete/compact by reference.

Every test here lowers ``_SEGMENT_SPILL_ENTRIES`` to force segmentation
on toy tables; the read side (``load_manifest`` expansion) must make the
storage split invisible to every consumer.
"""

import glob
import json
import os

import pytest

from ovalspark.sources import snapshots as sn
from ovalspark.sources.snapshots import (
    _load_manifest_raw,
    expire_snapshots,
    load_manifest,
    manifest_diff,
    snapshot_compact,
    snapshot_delete,
    snapshot_read,
    snapshot_write,
    vacuum,
)

SPILL = 4


@pytest.fixture
def low_spill(monkeypatch):
    monkeypatch.setattr(sn, "_SEGMENT_SPILL_ENTRIES", SPILL)


def _slice(spark, lo, hi):
    # 2 files per commit, disjoint v-ranges so deletes can target one era
    return (
        spark.range(lo, hi)
        .selectExpr("cast(id as string) as doc_id", "id as v")
        .repartition(2)
    )


def _build_chain(spark, root, n_commits=8, rows_per=10):
    sids = [snapshot_write(_slice(spark, 0, rows_per), root)]
    for i in range(1, n_commits):
        sids.append(
            snapshot_write(
                _slice(spark, i * rows_per, (i + 1) * rows_per), root, mode="append"
            )
        )
    return sids


def test_append_chain_spills_bounded_inline_and_reads_identically(spark, tmp_path, low_spill):
    """8 appends × 2 files: raw manifests stay bounded (inline ≤ spill +
    one commit's files; the rest in shared segments) while the EXPANDED
    view and every snapshot read are byte-identical to the unsegmented
    semantics — totals, per-snapshot time travel, full history."""
    root = str(tmp_path / "seg_tbl")
    sids = _build_chain(spark, root, n_commits=8, rows_per=10)

    raw = _load_manifest_raw(root, sids[-1])
    assert raw.get("file_segments"), "chain this long must have spilled"
    assert len(raw["files"]) <= SPILL + 2
    m = load_manifest(root, sids[-1])
    assert len(m["files"]) == 16  # expansion sees every file
    assert m["total_rows"] == 80
    assert m["total_rows"] == sum(f["rows"] for f in m["files"])
    assert m["total_bytes"] == sum(f["bytes"] for f in m["files"])
    # segment refs carry honest aggregates (maintenance never expands)
    for ref in raw["file_segments"]:
        entries = sn._read_segment(root, ref["loc"])
        assert ref["n_files"] == len(entries)
        assert ref["rows"] == sum(e["rows"] for e in entries)

    # time travel: every snapshot reads its own prefix exactly
    for i, sid in enumerate(sids):
        got = snapshot_read(spark, root, sid)
        assert got.count() == (i + 1) * 10
        assert got.selectExpr("sum(v)").first()[0] == sum(range((i + 1) * 10))


def test_append_metadata_bytes_stay_bounded(spark, tmp_path, low_spill):
    """The property the design buys: the manifest FILE a late append
    writes does not grow with table history (a full-listing manifest
    would). Segment refs grow at ~1/spill of the entry count — each ref
    also carries its folded column bounds (two-level pruning), a
    per-ref constant that at this toy spill (4) is a visible fraction
    but at the production threshold (512) is ~0.1% of the entries it
    replaces; the chain is long enough for the 1/spill slope to beat
    that constant."""
    root = str(tmp_path / "bounded_tbl")
    sids = _build_chain(spark, root, n_commits=16, rows_per=4)
    sizes = {
        sid: os.path.getsize(sn._resolve_manifest_path(root, sid)) for sid in sids
    }
    full_listing = len(json.dumps(load_manifest(root, sids[-1])["files"]))
    # the last manifest is a small fraction of what a cumulative listing
    # would re-serialize, and late manifests aren't growing linearly
    assert sizes[sids[-1]] < full_listing / 2
    assert sizes[sids[-1]] < 2 * sizes[sids[7]]


def test_manifest_diff_skips_shared_segments(spark, tmp_path, low_spill, monkeypatch):
    """Consecutive-commit diffs (the tail's per-poll scope) expand only
    segments NOT shared by both manifests — zero segment reads when the
    child didn't spill, exactly the added files always."""
    root = str(tmp_path / "diff_tbl")
    sids = _build_chain(spark, root, n_commits=8, rows_per=10)

    for prev, cur in zip(sids, sids[1:]):
        added = manifest_diff(root, prev, cur)
        expected = {
            f["path"] for f in load_manifest(root, cur)["files"]
        } - {f["path"] for f in load_manifest(root, prev)["files"]}
        assert {os.path.relpath(p, root) for p in added} == expected

    # find a non-spilling consecutive pair (child carries parent's inline
    # forward): diffing it must read no segment at all
    reads = []
    real = sn._read_segment
    monkeypatch.setattr(sn, "_read_segment", lambda r, loc: (reads.append(loc), real(r, loc))[1])
    for prev, cur in zip(sids, sids[1:]):
        if _load_manifest_raw(root, cur).get("file_segments") == _load_manifest_raw(
            root, prev
        ).get("file_segments"):
            reads.clear()
            manifest_diff(root, prev, cur)
            assert reads == []
            break
    else:
        pytest.fail("chain produced no non-spilling consecutive pair")


def test_delete_keeps_untouched_segments_by_reference(spark, tmp_path, low_spill):
    """A delete whose files all live in the inline tail leaves every
    parent segment ref IDENTICAL (no metadata rewrite); a delete inside
    one segment breaks only that segment, the others carry by loc."""
    root = str(tmp_path / "del_tbl")
    sids = _build_chain(spark, root, n_commits=8, rows_per=10)
    parent_raw = _load_manifest_raw(root, sids[-1])
    parent_seg_locs = [r["loc"] for r in parent_raw["file_segments"]]

    # last commit's rows (70..79) live in inline-tail files
    s_del = snapshot_delete(spark, root, "v >= 70")
    raw = _load_manifest_raw(root, s_del)
    assert [r["loc"] for r in raw.get("file_segments") or []] == parent_seg_locs
    after = snapshot_read(spark, root, s_del)
    assert after.count() == 70
    assert after.selectExpr("max(v)").first()[0] == 69
    m = load_manifest(root, s_del)
    assert m["total_rows"] == sum(f["rows"] for f in m["files"]) == 70

    # rows 0..9 live in the FIRST spilled segment: that one breaks, the
    # rest keep their locs
    s_del2 = snapshot_delete(spark, root, "v < 10")
    raw2 = _load_manifest_raw(root, s_del2)
    locs2 = {r["loc"] for r in raw2.get("file_segments") or []}
    assert locs2 < set(parent_seg_locs)  # strictly fewer, all inherited
    after2 = snapshot_read(spark, root, s_del2)
    assert after2.count() == 60
    assert after2.selectExpr("min(v)").first()[0] == 10
    # the broken segment's SURVIVOR entries moved loose, none lost
    assert load_manifest(root, s_del2)["total_rows"] == 60


def test_compact_across_segments_preserves_rows(spark, tmp_path, low_spill):
    root = str(tmp_path / "cmp_tbl")
    _build_chain(spark, root, n_commits=6, rows_per=10)
    before = snapshot_read(spark, root).orderBy("v").collect()
    sid = snapshot_compact(spark, root, target_file_mb=64)
    m = load_manifest(root, sid)
    # everything was tiny: compaction swallowed all segments
    assert not _load_manifest_raw(root, sid).get("file_segments")
    assert len(m["files"]) < 12
    assert snapshot_read(spark, root, sid).orderBy("v").collect() == before


def test_expire_and_vacuum_reclaim_only_unreferenced_segments(spark, tmp_path, low_spill):
    """Retention: segments referenced ONLY by expired manifests are
    reclaimed; segments the retained tip still references survive, and
    the tip reads unchanged. A hand-planted orphan segment is debris."""
    root = str(tmp_path / "ret_tbl")
    sids = _build_chain(spark, root, n_commits=8, rows_per=10)
    # a delete breaks the first segment → its loc is now referenced only
    # by PRE-delete manifests
    s_del = snapshot_delete(spark, root, "v < 10")
    live_locs = {
        r["loc"] for r in _load_manifest_raw(root, s_del).get("file_segments") or []
    }
    all_segs = {os.path.basename(p) for p in glob.glob(os.path.join(root, "manifest", "seg-*.json"))}
    assert live_locs < all_segs

    orphan = os.path.join(root, "manifest", "seg-999-deadbeef.json")
    with open(orphan, "w") as f:
        json.dump([], f)

    expire_snapshots(root, keep_last=1, min_age_s=0)
    remaining = {
        os.path.basename(p) for p in glob.glob(os.path.join(root, "manifest", "seg-*.json"))
    }
    assert remaining == live_locs  # dead-history segments + orphan gone
    tip = snapshot_read(spark, root)
    assert tip.count() == 70
    assert tip.selectExpr("min(v)").first()[0] == 10
    with pytest.raises(FileNotFoundError):
        load_manifest(root, sids[0])


def test_merge_segments_metadata_only_commit(spark, tmp_path, low_spill):
    """merge_segments rewrites fragmented segment refs into full-sized
    ones WITHOUT touching data: identical path set and totals, fewer
    refs, pre-merge snapshots still time-travel, and the commit is a
    'replace' the tail's equivalence check resolves with zero scans."""
    from ovalspark.operators.incremental import validate_replace
    from ovalspark.sources.snapshots import merge_segments

    root = str(tmp_path / "merge_tbl")
    sids = _build_chain(spark, root, n_commits=10, rows_per=10)
    raw_before = _load_manifest_raw(root, sids[-1])
    n_refs_before = len(raw_before["file_segments"])
    paths_before = {f["path"] for f in load_manifest(root, sids[-1])["files"]}

    sid = merge_segments(root, target_entries=16)
    assert sid == sids[-1] + 1
    raw = _load_manifest_raw(root, sid)
    assert raw["operation"] == "replace"
    assert len(raw["file_segments"]) < n_refs_before
    m = load_manifest(root, sid)
    assert {f["path"] for f in m["files"]} == paths_before
    assert m["total_rows"] == 100
    assert snapshot_read(spark, root, sid).selectExpr("sum(v)").first()[0] == sum(range(100))
    # pre-merge snapshot still expands its own refs
    assert snapshot_read(spark, root, sids[3]).count() == 40
    # zero-scan equivalence: removed and added are both empty, so the
    # verdict is clean without reading any data file
    assert validate_replace(spark, root, sid).count() == 0

    # idempotent: one full segment + small inline leaves nothing to merge
    assert merge_segments(root, target_entries=16) == sid


def test_merge_segments_noop_and_validation(spark, tmp_path, low_spill):
    from ovalspark.sources.snapshots import merge_segments

    root = str(tmp_path / "noop_tbl")
    sids = _build_chain(spark, root, n_commits=3, rows_per=10)  # 1 segment max
    assert merge_segments(root) == sids[-1]  # < 2 mergeable: no commit
    with pytest.raises(ValueError):
        merge_segments(root, target_entries=0)


def test_merge_then_retention_reclaims_old_fragments(spark, tmp_path, low_spill):
    from ovalspark.sources.snapshots import merge_segments

    root = str(tmp_path / "merge_ret_tbl")
    _build_chain(spark, root, n_commits=10, rows_per=10)
    sid = merge_segments(root, target_entries=16)
    live = {r["loc"] for r in _load_manifest_raw(root, sid)["file_segments"]}
    expire_snapshots(root, keep_last=1, min_age_s=0)
    remaining = {
        os.path.basename(p) for p in glob.glob(os.path.join(root, "manifest", "seg-*.json"))
    }
    assert remaining == live  # pre-merge fragments reclaimed
    assert snapshot_read(spark, root).count() == 100


@pytest.mark.parametrize("batch", [False, True])
def test_tail_crosses_merge_commit(spark, tmp_path, low_spill, small_world, batch):
    """A live tail consuming a table that gets merge_segments'd mid-
    stream keeps going: the merge commit yields zero violations through
    the zero-scan replace-equivalence path, and the append after it
    validates normally against its own catalog. Batch mode must treat
    the merge commit as a replace singleton between append runs."""
    import pyspark.sql.functions as F

    from ovalspark.operators.incremental import validate_snapshot_tail
    from ovalspark.sources.snapshots import merge_segments

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(7))
    parts = [docs.filter(bucket == i).repartition(2).localCheckpoint() for i in range(7)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]

    root = str(tmp_path / "tail_merge_tbl")
    snapshot_write(parts[0], root)
    for i in range(1, 6):
        snapshot_write(parts[i], root, mode="append")
    merge_sid = merge_segments(root, target_entries=16)
    assert merge_sid == 7
    assert _load_manifest_raw(root, merge_sid)["operation"] == "replace"
    snapshot_write(parts[6], root, mode="append")

    seen = {}
    for s, v in validate_snapshot_tail(
        spark,
        root,
        lambda sid: cats[sid - 1] if sid <= 6 else cats[6],
        spec.n_assets,
        timeout_s=2.0,
        batch_commits=batch,
    ):
        n = v.count()
        for sid in s if batch else [s]:
            seen[sid] = n
    assert set(seen) == set(range(1, 9))  # every commit incl. the merge
    assert all(n == 0 for n in seen.values())  # clean world, clean merge


def test_tail_never_expands_segments_on_append_runs(
    spark, tmp_path, low_spill, small_world, monkeypatch
):
    """The tail's per-poll metadata cost must stay O(changed), not
    O(table): over an appends-only segmented backlog it routes commits
    on RAW manifests and diffs skip shared segments, so the expanding
    ``load_manifest`` is never called and ``_read_segment`` fires at
    most once per spill boundary — not per commit × per segment."""
    import pyspark.sql.functions as F

    from ovalspark.operators.incremental import validate_snapshot_tail

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(13)), F.lit(8))
    parts = [docs.filter(bucket == i).repartition(2).localCheckpoint() for i in range(8)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]

    root = str(tmp_path / "tail_cost_tbl")
    snapshot_write(parts[0], root)
    for i in range(1, 8):
        snapshot_write(parts[i], root, mode="append")
    n_segments = len(_load_manifest_raw(root)["file_segments"])
    assert n_segments >= 2

    expansions = []
    seg_reads = []
    real_load, real_read = sn.load_manifest, sn._read_segment
    monkeypatch.setattr(
        sn, "load_manifest", lambda *a, **k: (expansions.append(a), real_load(*a, **k))[1]
    )
    monkeypatch.setattr(
        sn, "_read_segment", lambda *a, **k: (seg_reads.append(a), real_read(*a, **k))[1]
    )
    sn._SEGMENT_CACHE.clear()

    seen = []
    for s, v in validate_snapshot_tail(
        spark, root, lambda sid: cats[sid - 1], spec.n_assets, timeout_s=1.5
    ):
        v.count()
        seen.append(s)
    assert seen == list(range(1, 9))
    assert expansions == []  # routing + delta validation never expanded
    # one read per spill boundary at most (cache misses only), never
    # commits × segments
    assert len(seg_reads) <= n_segments


def test_two_level_prune_skips_whole_segments(spark, tmp_path, low_spill, monkeypatch):
    """Segment refs fold their members' column bounds at spill time
    (``_segment_ref_stats``), so a selective range prune is two-level:
    refs provably disjoint are skipped WITHOUT being read — O(refs +
    surviving segments) metadata, the property that keeps a pruned read
    cheap at 10⁶ files — and the surviving paths match the flat
    (expand-everything) prune exactly."""
    from ovalspark.sources.snapshots import prune_files, snapshot_read

    root = str(tmp_path / "prune_seg_tbl")
    sids = _build_chain(spark, root, n_commits=8, rows_per=10)
    raw = _load_manifest_raw(root, sids[-1])
    refs = raw["file_segments"]
    assert len(refs) >= 2
    # every ref carries the fold of its members' v-bounds
    for ref in refs:
        entries = sn._read_segment(root, ref["loc"])
        assert ref["col_stats"]["v"]["min"] == min(e["col_stats"]["v"]["min"] for e in entries)
        assert ref["col_stats"]["v"]["max"] == max(e["col_stats"]["v"]["max"] for e in entries)

    reads = []
    real_read = sn._read_segment
    monkeypatch.setattr(
        sn, "_read_segment", lambda *a, **k: (reads.append(a[1]), real_read(*a, **k))[1]
    )

    # range entirely in the INLINE tail (newest commits): zero segment reads
    inline_lo = min(e["col_stats"]["v"]["min"] for e in raw["files"])
    pruned = prune_files(root, sids[-1], ("v", inline_lo + 1, inline_lo + 2))
    assert reads == []
    assert 0 < len(pruned) <= len(raw["files"])
    got = snapshot_read(spark, root, sids[-1], prune=("v", inline_lo + 1, inline_lo + 2))
    want = snapshot_read(spark, root, sids[-1])
    cond = f"v between {inline_lo + 1} and {inline_lo + 2}"
    assert got.filter(cond).exceptAll(want.filter(cond)).count() == 0
    assert got.filter(cond).count() == want.filter(cond).count() == 2

    # range inside the OLDEST segment: exactly that one segment is read
    reads.clear()
    first = min(refs, key=lambda r: r["col_stats"]["v"]["min"])
    lo = first["col_stats"]["v"]["min"]
    pruned = prune_files(root, sids[-1], ("v", lo, lo + 1))
    assert reads == [first["loc"]]
    assert all(os.path.basename(p).startswith("part-") for p in pruned)
    # flat equivalence: same survivors as per-file pruning over the
    # fully expanded inventory
    monkeypatch.setattr(sn, "_read_segment", real_read)
    flat = [
        e["path"]
        for e in load_manifest(root, sids[-1])["files"]
        if e["col_stats"]["v"]["min"] <= lo + 1 and e["col_stats"]["v"]["max"] >= lo
    ]
    assert sorted(os.path.relpath(p, root) for p in pruned) == sorted(flat)

    # a column the fold dropped (or never had) prunes nothing at either
    # level — conservative by construction
    assert len(prune_files(root, sids[-1], ("no_such", 0, 1))) == 16


@pytest.mark.parametrize("seed", [11, 23])
def test_randomized_history_matches_shadow_model(spark, tmp_path, low_spill, seed):
    """Seeded random append/delete/compact/merge histories against a
    driver-side shadow multiset of row values: after every operation the
    expanded view must hold exactly the shadow's rows, the manifest's
    total_rows bookkeeping must match, the expanded file list must be
    duplicate-free, and a random two-level range prune must pick exactly
    the files a flat per-file filter over the expanded inventory picks
    (and read exactly the shadow's matching rows) — whatever sequence of
    spills, segment breaks, re-spills, and metadata merges the history
    produced re-folds every ref's bounds correctly or this diverges."""
    import random

    from ovalspark.sources.snapshots import merge_segments, prune_files

    rng = random.Random(seed)
    root = str(tmp_path / f"rand_tbl_{seed}")
    snapshot_write(_slice(spark, 0, 20), root)
    shadow = list(range(20))
    nxt = 20

    def check():
        got = sorted(
            r["v"] for r in snapshot_read(spark, root).select("v").collect()
        )
        assert got == sorted(shadow)
        m = load_manifest(root)
        assert m["total_rows"] == len(shadow)
        paths = [f["path"] for f in m["files"]]
        assert len(paths) == len(set(paths))  # expansion never duplicates
        # two-level prune vs the flat model over the expanded inventory
        lo = rng.randrange(0, nxt)
        hi = lo + rng.randrange(1, 15)
        pruned = set(prune_files(root, None, ("v", lo, hi)))
        flat = {
            sn._abs_path(root, f["path"])
            for f in m["files"]
            if f["col_stats"]["v"]["min"] <= hi and f["col_stats"]["v"]["max"] >= lo
        }
        assert pruned == flat
        rows = sorted(
            r["v"]
            for r in snapshot_read(spark, root, prune=("v", lo, hi))
            .filter(f"v between {lo} and {hi}")
            .collect()
        )
        assert rows == sorted(x for x in shadow if lo <= x <= hi)

    for _ in range(12):
        op = rng.choice(["append", "append", "delete", "compact", "merge"])
        if op == "append":
            n = rng.randrange(5, 25)
            snapshot_write(_slice(spark, nxt, nxt + n), root, mode="append")
            shadow.extend(range(nxt, nxt + n))
            nxt += n
        elif op == "delete":
            k, r = rng.choice([(3, 0), (5, 2), (7, 4)])
            snapshot_delete(spark, root, f"v % {k} = {r}")
            shadow = [x for x in shadow if x % k != r]
        elif op == "compact":
            snapshot_compact(spark, root, target_file_mb=64)
        else:
            merge_segments(root, target_entries=rng.choice([8, 16]))
        check()


def test_losing_append_unlinks_its_spill_segment(spark, tmp_path, low_spill, monkeypatch):
    """A writer that spills the parent's inline tail and then LOSES the
    commit CAS must unlink its segment file — otherwise every lost race
    leaks an orphan the table carries until vacuum. Deterministic form:
    the commit is forced to lose."""
    from ovalspark.sources.snapshots import ConcurrentCommitError

    root = str(tmp_path / "loser_tbl")
    _build_chain(spark, root, n_commits=2, rows_per=10)  # inline=4, no segs yet
    segs_before = set(glob.glob(os.path.join(root, "manifest", "seg-*.json")))

    def lose(*a, **k):
        raise ConcurrentCommitError("forced loss")

    monkeypatch.setattr(sn, "_commit_manifest", lose)
    with pytest.raises(ConcurrentCommitError):
        snapshot_write(_slice(spark, 20, 30), root, mode="append")  # would spill
    segs_after = set(glob.glob(os.path.join(root, "manifest", "seg-*.json")))
    assert segs_after == segs_before  # the loser's spill is gone
    monkeypatch.undo()
    # the table is undamaged: the same append now wins and spills cleanly
    sid = snapshot_write(_slice(spark, 20, 30), root, mode="append")
    assert load_manifest(root, sid)["total_rows"] == 30


def test_concurrent_segmented_appends_one_winner_then_retry(spark, tmp_path, low_spill):
    """Two threads race the SAME parent with appends that both want to
    spill: exactly one wins, the loser's retry lands on the winner's
    manifest, and the final expanded view has both commits' rows with no
    leaked segment files (every seg-*.json is referenced by some
    manifest)."""
    import threading

    from ovalspark.sources.snapshots import ConcurrentCommitError

    root = str(tmp_path / "race_tbl")
    _build_chain(spark, root, n_commits=3, rows_per=10)  # primed past one spill

    dfs = [_slice(spark, 100, 110).localCheckpoint(), _slice(spark, 200, 210).localCheckpoint()]
    won = [False, False]
    barrier = threading.Barrier(2)

    def writer(i):
        barrier.wait()
        for _ in range(5):  # optimistic retry loop, first-wins protocol
            try:
                snapshot_write(dfs[i], root, mode="append", guard="flock")
                won[i] = True
                return
            except ConcurrentCommitError:
                continue

    ts = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert won == [True, True]

    got = snapshot_read(spark, root)
    assert got.count() == 50
    assert got.filter("v >= 100 and v < 110").count() == 10
    assert got.filter("v >= 200 and v < 210").count() == 10
    # no orphan segments: everything on disk is referenced by a manifest
    referenced: set[str] = set()
    for s in range(1, sn.current_snapshot_id(root) + 1):
        for ref in _load_manifest_raw(root, s).get("file_segments") or []:
            referenced.add(ref["loc"])
    on_disk = {
        os.path.basename(p) for p in glob.glob(os.path.join(root, "manifest", "seg-*.json"))
    }
    assert on_disk <= referenced


def test_cli_maintain_merge_segments(spark, tmp_path, low_spill, capsys):
    from ovalspark.cli import main

    root = str(tmp_path / "cli_merge_tbl")
    sids = _build_chain(spark, root, n_commits=10, rows_per=10)
    rc = main(
        ["maintain", "--root", root, "--merge-segments", "--segment-target-entries", "16"]
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert report["merge_segments"]["snapshot_id"] == sids[-1] + 1
    assert snapshot_read(spark, root).count() == 100


def test_segmented_appends_under_catalog_guard(spark, tmp_path, low_spill):
    """Segments compose with the catalog-owned pointer: commits route the
    CAS through sqlite, manifests live under writer-unique locs, and the
    expanded read is still complete."""
    root = str(tmp_path / "cat_tbl")
    snapshot_write(_slice(spark, 0, 10), root, guard="sqlite")
    for i in range(1, 6):
        snapshot_write(_slice(spark, i * 10, (i + 1) * 10), root, mode="append", guard="sqlite")
    raw = _load_manifest_raw(root)
    assert raw.get("file_segments")
    got = snapshot_read(spark, root)
    assert got.count() == 60
    assert got.selectExpr("sum(v)").first()[0] == sum(range(60))


def test_segment_cache_serves_isolated_copies(spark, tmp_path, low_spill):
    """Entries served from the segment cache are the caller's to mutate:
    scribbling on a returned entry — INCLUDING its nested col_stats —
    must not poison the next read (the cache comment's claim, now tested
    one level deeper than the top-level dict)."""
    root = str(tmp_path / "cache_iso_tbl")
    _build_chain(spark, root, n_commits=6, rows_per=10)
    sid = sn.current_snapshot_id(root)
    raw = _load_manifest_raw(root, sid)
    loc = raw["file_segments"][0]["loc"]

    first = sn._read_segment(root, loc)
    assert first and first[0].get("col_stats"), "chain must carry stats"
    # mutate everything a validator or test harness might touch
    first[0]["path"] = "poisoned"
    first[0]["rows"] = -1
    first[0]["col_stats"]["v"]["min"] = 10**9
    first[0]["col_stats"]["v"]["max"] = -(10**9)

    second = sn._read_segment(root, loc)
    assert second[0]["path"] != "poisoned"
    assert second[0]["rows"] > 0
    assert second[0]["col_stats"]["v"]["min"] < 10**9
    assert second[0]["col_stats"]["v"]["max"] > -(10**9)
