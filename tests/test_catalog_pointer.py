"""Catalog-owned CURRENT pointer — the object-store commit shape.

The file CURRENT flip is a POSIX atomic rename, which the 100-TB target
(an S3-like object store) does not have. These tests prove the round-6
fix end to end: once a table's pointer is adopted into the sqlite
catalog, the commit point is a conditional ``UPDATE current SET id=?
WHERE id=<parent>`` (rowcount decides the winner) plus a catalog-recorded
manifest LOCATION under a writer-unique filename — so correctness no
longer depends on the guard's exclusion at all:

* two writers that BOTH passed staging and BOTH entered the critical
  section (exclusion deliberately disabled via a no-op guard) still
  commit exactly one winner, whose manifest content is what readers
  resolve;
* a writer killed mid-commit (after the manifest write and the
  uncommitted CAS, before the transaction commits) leaves no torn
  pointer — the table reads at the parent and the slot is retryable;
* readers resolve every committed id with the CURRENT file deleted or
  stale (it is a cache, not the pointer).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import uuid

import pytest

from tests.test_commit_race import _manifest, _write_data_dir


from ovalspark.sources.commit_guard import CommitGuard


class NullGuard(CommitGuard):
    """NO exclusion at all — both writers run the critical section
    concurrently. Used to prove the catalog CAS alone picks one winner
    (the dirlock lease-break scenario, distilled)."""

    name = "null"
    owns_pointer = False

    def acquire(self, root, timeout_s=30.0):
        return None

    def release(self, token):
        pass


def _null_guard_child(root, n_rows, tag, barrier, q):
    import shutil

    from ovalspark.sources.snapshots import ConcurrentCommitError, _commit_manifest

    try:
        files = _write_data_dir(root, 2, n_rows, tag)
        data_dir = os.path.dirname(os.path.join(root, files[0]["path"]))
        barrier.wait(timeout=60)
        try:
            _commit_manifest(root, 1, 2, _manifest(2, 1, files), NullGuard())
            q.put((tag, "ok", n_rows))
        except ConcurrentCommitError:
            shutil.rmtree(data_dir, ignore_errors=True)
            q.put((tag, "lost", n_rows))
    except BaseException as e:  # pragma: no cover - diagnostics only
        q.put((tag, f"err:{type(e).__name__}:{e}", n_rows))


def test_catalog_cas_one_winner_without_any_exclusion(spark, tmp_path):
    """Both writers pass staging AND both enter the commit concurrently
    (no-op guard): the catalog CAS alone picks exactly one winner, and
    the committed manifest is the WINNER's (writer-unique filenames mean
    the loser could not have overwritten it)."""
    from ovalspark.sources.snapshots import (
        _commit_manifest,
        current_snapshot_id,
        load_manifest,
        snapshot_read,
    )

    root = str(tmp_path / "nullguard_race")
    files1 = _write_data_dir(root, 1, 5, "seed")
    # seed under the sqlite guard: adopts the pointer into the catalog
    _commit_manifest(root, None, 1, _manifest(1, None, files1), "sqlite")

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(2)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_null_guard_child, args=(root, n, tag, barrier, q))
        for tag, n in (("alpha", 3), ("beta", 7))
    ]
    [p.start() for p in procs]
    [p.join(timeout=120) for p in procs]
    assert all(p.exitcode == 0 for p in procs), [p.exitcode for p in procs]

    results = {tag: (status, n) for tag, status, n in (q.get(timeout=10), q.get(timeout=10))}
    statuses = sorted(s for s, _ in results.values())
    assert statuses == ["lost", "ok"], results

    assert current_snapshot_id(root) == 2
    winner_tag = next(t for t, (s, _) in results.items() if s == "ok")
    winner_rows = next(n for s, n in results.values() if s == "ok")
    assert snapshot_read(spark, root, 2).count() == winner_rows
    # the resolved manifest is the winner's file, not the loser's debris
    assert winner_tag in load_manifest(root, 2)["files"][0]["path"]


def _kill_mid_commit_child(root, q):
    """Run the catalog commit protocol up to and INCLUDING the CAS, then
    die before the transaction commits — the torn-commit window. The CAS
    result is signalled through a FILE (an mp.Queue's feeder thread does
    not survive os._exit)."""
    import json

    from ovalspark.sources.commit_guard import SqliteCatalogGuard
    from ovalspark.sources.snapshots import _atomic_write, _catalog_cas, _manifest_dir

    files = _write_data_dir(root, 2, 9, "doomed")
    g = SqliteCatalogGuard()
    token = g.acquire(root)
    loc = f"v2-{uuid.uuid4().hex[:8]}.json"
    _atomic_write(
        os.path.join(_manifest_dir(root), loc), json.dumps(_manifest(2, 1, files))
    )
    won = _catalog_cas(root, 1, 2, loc, token)
    _atomic_write(os.path.join(root, "cas_result"), str(bool(won)))
    os._exit(9)  # die holding the open transaction: no COMMIT ever runs


def test_kill_mid_commit_leaves_no_torn_pointer(spark, tmp_path):
    from ovalspark.sources.snapshots import (
        _commit_manifest,
        current_snapshot_id,
        load_manifest,
        snapshot_read,
    )

    root = str(tmp_path / "kill_mid_commit")
    files1 = _write_data_dir(root, 1, 5, "seed")
    _commit_manifest(root, None, 1, _manifest(1, None, files1), "sqlite")

    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_kill_mid_commit_child, args=(root, None))
    p.start()
    p.join(timeout=120)
    assert p.exitcode == 9
    with open(os.path.join(root, "cas_result")) as f:
        assert f.read() == "True"  # the CAS itself succeeded...

    # ...but never committed: pointer still at 1, sid 2 unreadable
    assert current_snapshot_id(root) == 1
    with pytest.raises(FileNotFoundError):
        load_manifest(root, 2)

    # the slot is retryable: a fresh commit of sid 2 wins cleanly
    files2 = _write_data_dir(root, 2, 4, "retry")
    _commit_manifest(root, 1, 2, _manifest(2, 1, files2), "sqlite")
    assert current_snapshot_id(root) == 2
    assert snapshot_read(spark, root, 2).count() == 4
    assert "retry" in load_manifest(root, 2)["files"][0]["path"]


def test_readers_resolve_without_current_file(spark, tmp_path):
    """The CURRENT file is a read cache once the catalog owns the
    pointer: delete it, corrupt it — every committed id still resolves."""
    from ovalspark.sources.snapshots import (
        _current_path,
        current_snapshot_id,
        snapshot_history,
        snapshot_read,
        snapshot_write,
    )

    root = str(tmp_path / "no_current_file")
    df = spark.range(20).selectExpr("cast(id as string) as doc_id")
    snapshot_write(df, root, guard="sqlite")
    snapshot_write(df.limit(5), root, mode="append", guard="sqlite")

    os.unlink(_current_path(root))
    assert current_snapshot_id(root) == 2
    assert snapshot_read(spark, root, 1).count() == 20
    assert snapshot_read(spark, root, 2).count() == 25
    assert snapshot_history(spark, root).count() == 2

    # a STALE cache (crash between CAS and cache rewrite) is ignored too
    with open(_current_path(root), "w") as f:
        f.write("1")
    assert current_snapshot_id(root) == 2


def test_adoption_from_file_pointered_history(spark, tmp_path):
    """A table born under the file pointer (flock commits) is adopted by
    its first sqlite-guard commit; afterwards even FLOCK commits route
    the flip through the catalog, and pre-adoption history still reads."""
    from ovalspark.sources.snapshots import (
        _catalog_current,
        current_snapshot_id,
        snapshot_read,
        snapshot_write,
    )

    root = str(tmp_path / "adopted")
    df = spark.range(10).selectExpr("cast(id as string) as doc_id")
    snapshot_write(df, root, guard="flock")
    snapshot_write(df.limit(3), root, mode="append", guard="flock")
    assert _catalog_current(root) == (False, None)

    snapshot_write(df.limit(2), root, mode="append", guard="sqlite")
    assert _catalog_current(root) == (True, 3)

    # post-adoption flock commit: pointer advances IN THE CATALOG
    snapshot_write(df.limit(1), root, mode="append", guard="flock")
    assert _catalog_current(root) == (True, 4)
    assert current_snapshot_id(root) == 4
    for sid, want in ((1, 10), (2, 13), (3, 15), (4, 16)):
        assert snapshot_read(spark, root, sid).count() == want


def test_adopt_helper_idempotent(spark, tmp_path):
    from ovalspark.sources.snapshots import (
        _catalog_current,
        adopt_catalog_pointer,
        snapshot_write,
    )

    root = str(tmp_path / "adopt_helper")
    df = spark.range(6).selectExpr("cast(id as string) as doc_id")
    snapshot_write(df, root)  # default flock: file-pointered
    assert adopt_catalog_pointer(root) == 1
    assert _catalog_current(root) == (True, 1)
    assert adopt_catalog_pointer(root) == 1  # idempotent


def test_cas_compensates_pointer_flip_on_manifest_conflict(spark, tmp_path):
    """Defense-in-depth: if the pointer UPDATE succeeds but the manifests
    INSERT hits a primary-key conflict (a forged/stray row for the target
    sid), the loser must compensate the flip INSIDE the guard's
    still-open transaction — release() commits unconditionally, and a
    half-applied commit (pointer advanced, no manifest row) would leave
    the table's tip unresolvable."""
    import sqlite3

    from ovalspark.sources.snapshots import (
        ConcurrentCommitError,
        _catalog_db_path,
        _commit_manifest,
        current_snapshot_id,
        snapshot_read,
    )
    from tests.test_commit_race import _manifest, _write_data_dir

    root = str(tmp_path / "comp_tbl")
    files1 = _write_data_dir(root, 1, 5, "seed")
    _commit_manifest(root, None, 1, _manifest(1, None, files1), "sqlite")

    # forge a stray manifests row for sid 2 (no such commit ever ran)
    con = sqlite3.connect(_catalog_db_path(root))
    con.execute("INSERT INTO manifests (id, loc) VALUES (2, 'v2-forged.json')")
    con.commit()
    con.close()

    files2 = _write_data_dir(root, 2, 3, "victim")
    with pytest.raises(ConcurrentCommitError):
        _commit_manifest(root, 1, 2, _manifest(2, 1, files2), "sqlite")
    # the pointer must still be 1 — not a half-applied 2
    assert current_snapshot_id(root) == 1
    assert snapshot_read(spark, root, 1).count() == 5


def test_deep_history_resolution_stays_flat(spark, tmp_path):
    """150-commit catalog-owned history: every id resolves, the tip
    resolves through the catalog, and per-manifest resolution cost does
    not grow with depth (the O(1) primary-key lookup — a full-table scan
    per resolve would make a year of hourly commits unreadable)."""
    import time

    from ovalspark.sources.commit_guard import SqliteCatalogGuard
    from ovalspark.sources.snapshots import (
        _commit_manifest,
        current_snapshot_id,
        load_manifest,
    )
    from tests.test_commit_race import _manifest, _write_data_dir

    root = str(tmp_path / "deep_tbl")
    files = _write_data_dir(root, 1, 3, "seed")
    _commit_manifest(root, None, 1, _manifest(1, None, files), "sqlite")
    g = SqliteCatalogGuard()
    for sid in range(2, 151):
        # metadata-only commits: same file list, new manifest per id
        _commit_manifest(root, sid - 1, sid, _manifest(sid, sid - 1, files), g)
    assert current_snapshot_id(root) == 150

    def t_resolve(sid, n=20):
        t0 = time.perf_counter()
        for _ in range(n):
            load_manifest(root, sid)
        return (time.perf_counter() - t0) / n

    early, late = t_resolve(3), t_resolve(149)
    # flat within noise: a linear scan would be ~50x apart at this depth
    assert late < early * 5 + 0.01, (early, late)
    for sid in (1, 50, 100, 150):
        assert load_manifest(root, sid)["snapshot_id"] == sid


def test_tail_follows_live_writer_on_catalog_owned_table(spark, tmp_path, small_world):
    """Integration: a tailer follows commits landing from a concurrent
    writer thread on a CATALOG-owned table — the poll resolves CURRENT
    through the catalog, the commits flip it via CAS, and each delta
    validates clean against its own catalog."""
    import threading

    from ovalspark.operators.incremental import validate_snapshot_tail
    from pyspark.sql import functions as F

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(43)), F.lit(3))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(3)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]

    root = str(tmp_path / "live_cat_tbl")
    from ovalspark.sources.snapshots import snapshot_write as _sw

    _sw(parts[0], root, guard="sqlite")

    def writer():
        for p in parts[1:]:
            _sw(p, root, mode="append", guard="sqlite")

    t = threading.Thread(target=writer)
    t.start()
    got = list(
        validate_snapshot_tail(
            spark, root, lambda s: cats[s - 1], spec.n_assets,
            after_id=0, timeout_s=8.0, poll_interval_s=0.1,
        )
    )
    t.join()
    assert [s for s, _ in got] == [1, 2, 3]
    assert all(v.count() == 0 for _, v in got)


@pytest.mark.parametrize("catalog", ["sqlite", "http"])
def test_tail_follows_across_mid_stream_adoption(spark, tmp_path, small_world, catalog):
    """A live tailer is following a FILE-pointered table when the
    pointer is adopted into a catalog mid-stream (sqlite
    ``adopt_catalog_pointer`` / http ``attach_http_catalog``): the poll
    switches resolution source transparently — every commit before and
    after the adoption is validated exactly once, none doubled, none
    missed. The adoption window itself is safe by construction: sqlite's
    INSERT is invisible until its transaction commits, and the http
    descriptor's unknown-key reads fall back to the file pointer, so a
    poll landing inside the window still resolves the same id."""
    import threading

    from ovalspark.operators.incremental import validate_snapshot_tail
    from ovalspark.sources.snapshots import (
        _catalog_current,
        adopt_catalog_pointer,
        snapshot_write as _sw,
    )
    from pyspark.sql import functions as F

    spec, cat, docs, _ = small_world
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(47)), F.lit(4))
    parts = [docs.filter(bucket == i).localCheckpoint() for i in range(4)]
    cats = [cat.join(p.select("doc_id"), "doc_id", "semi").localCheckpoint() for p in parts]

    root = str(tmp_path / f"adopt_mid_{catalog}")
    _sw(parts[0], root, guard="flock")  # file-pointered birth

    server = None
    if catalog == "http":
        from ovalspark.sources.http_catalog import CatalogServer

        server = CatalogServer()
        endpoint = server.start()

    def writer():
        import time as _t

        _sw(parts[1], root, mode="append", guard="flock")
        _t.sleep(0.4)  # let the tail observe a pre-adoption commit
        if catalog == "http":
            from ovalspark.sources.http_catalog import attach_http_catalog

            attach_http_catalog(root, endpoint)
        else:
            adopt_catalog_pointer(root, guard="sqlite")
        for p in parts[2:]:
            _sw(p, root, mode="append", guard=catalog)

    t = threading.Thread(target=writer)
    t.start()
    try:
        got = list(
            validate_snapshot_tail(
                spark, root, lambda s: cats[s - 1], spec.n_assets,
                after_id=0, timeout_s=15.0, poll_interval_s=0.05,
            )
        )
        owned_after = _catalog_current(root)[0]
    finally:
        t.join()
        if server is not None:
            server.stop()
    # exactly once each, in order, across the resolution-source switch
    assert [s for s, _ in got] == [1, 2, 3, 4]
    assert all(v.count() == 0 for _, v in got)
    assert owned_after is True  # pointer ended catalog-owned


def test_maintenance_on_catalog_owned_table(spark, tmp_path):
    """Delete, compact, retention and vacuum all run against a
    catalog-pointered table: resolution goes through catalog locs, and
    vacuum removes CAS-loser debris by membership, not filename parse."""
    from ovalspark.sources.snapshots import (
        expire_snapshots,
        load_manifest,
        snapshot_compact,
        snapshot_delete,
        snapshot_history,
        snapshot_read,
        snapshot_write,
        vacuum,
    )

    root = str(tmp_path / "catalog_maint")
    df = spark.range(400).selectExpr("id as v", "cast(id as string) as doc_id")
    snapshot_write(df.repartition(6), root, guard="sqlite")
    sid2 = snapshot_delete(spark, root, "v < 50", guard="sqlite")
    assert sid2 == 2
    assert snapshot_read(spark, root, 2).count() == 350
    sid3 = snapshot_compact(spark, root, target_file_mb=64, guard="sqlite")
    assert sid3 == 3
    assert snapshot_read(spark, root, 3).count() == 350
    assert load_manifest(root, 3)["operation"] == "replace"

    expired = expire_snapshots(root, keep_last=2, guard="sqlite", do_vacuum=False)
    assert expired == [1]
    removed = vacuum(root, min_age_s=0)
    assert removed  # snapshot 1's unshared data is reclaimed
    assert sorted(r.snapshot_id for r in snapshot_history(spark, root).collect()) == [2, 3]
    assert snapshot_read(spark, root, 3).count() == 350


def _adoption_crash_child(root):
    """Run the REAL commit path (adoption-on-first-commit: table is
    file-pointered, guard owns the pointer) and die inside release()
    before the catalog transaction COMMITs — the ADVICE round-6 window:
    if the CURRENT read-cache were rewritten before the COMMIT is
    durable, this crash would leave CURRENT=3 with no committed catalog
    row and no v3.json (the manifest went to a writer-unique filename),
    wedging the table."""
    from ovalspark.sources.commit_guard import SqliteCatalogGuard
    from ovalspark.sources.snapshots import _commit_manifest
    from tests.test_commit_race import _manifest, _write_data_dir

    class DieBeforeCommitGuard(SqliteCatalogGuard):
        name = "die-before-commit"

        def release(self, token):
            os._exit(9)  # die holding the open transaction: no COMMIT

    files = _write_data_dir(root, 3, 7, "doomed")
    _commit_manifest(root, 2, 3, _manifest(3, 2, files), DieBeforeCommitGuard())


def test_adoption_crash_before_commit_leaves_table_readable(spark, tmp_path):
    """Crash between the (uncommitted) adoption CAS and the transaction
    COMMIT, on a previously file-pointered table: the documented
    guarantee — 'a writer killed mid-commit leaves CURRENT at the
    previous complete snapshot' — must hold on the adoption flow too.
    The read-cache flip is deferred until release() has durably
    COMMITted, so the crash leaves the file pointer untouched."""
    from ovalspark.sources.snapshots import (
        _catalog_current,
        current_snapshot_id,
        load_manifest,
        snapshot_read,
        snapshot_write,
    )

    root = str(tmp_path / "adoption_crash")
    df = spark.range(10).selectExpr("cast(id as string) as doc_id")
    snapshot_write(df, root, guard="flock")
    snapshot_write(df.limit(3), root, mode="append", guard="flock")
    assert _catalog_current(root) == (False, None)

    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_adoption_crash_child, args=(root,))
    p.start()
    p.join(timeout=120)
    assert p.exitcode == 9

    # NOT wedged: pointer still at 2, every resolve works, sid 3 absent
    assert current_snapshot_id(root) == 2
    assert load_manifest(root)["snapshot_id"] == 2
    assert snapshot_read(spark, root).count() == 13
    with pytest.raises(FileNotFoundError):
        load_manifest(root, 3)

    # the slot is retryable and adoption completes on the retry
    snapshot_write(df.limit(2), root, mode="append", guard="sqlite")
    assert _catalog_current(root) == (True, 3)
    assert snapshot_read(spark, root, 3).count() == 15


def test_adopt_helper_returns_catalog_id_when_cas_loses(spark, tmp_path, monkeypatch):
    """A concurrent adoption that slips between the owned-check and the
    CAS (guards of different types don't exclude each other): the INSERT
    loses, and the helper must surface the catalog's authoritative id —
    not the stale file-pointer value it resolved before the race."""
    import sqlite3

    import ovalspark.sources.snapshots as snap

    root = str(tmp_path / "adopt_lost")
    df = spark.range(6).selectExpr("cast(id as string) as doc_id")
    snap.snapshot_write(df, root, guard="flock")
    snap.snapshot_write(df.limit(2), root, mode="append", guard="flock")
    assert snap.current_snapshot_id(root) == 2

    # simulate the interleaving: the helper's owned-check sees the
    # pre-adoption state, then a competing adopter commits a current row
    # (id=1: it resolved an OLDER file pointer) before our CAS runs
    real = snap._catalog_current
    state = {"first": True}

    def raced(r):
        if state["first"]:
            state["first"] = False
            con = sqlite3.connect(snap._catalog_db_path(r))
            con.execute(
                "CREATE TABLE IF NOT EXISTS current "
                "(k TEXT PRIMARY KEY CHECK (k='CURRENT'), id INTEGER NOT NULL)"
            )
            con.execute("INSERT INTO current (k, id) VALUES ('CURRENT', 1)")
            con.commit()
            con.close()
            return False, None
        return real(r)

    monkeypatch.setattr(snap, "_catalog_current", raced)
    got = snap.adopt_catalog_pointer(root, guard="flock")
    assert got == 1  # the catalog's id, not our stale file-pointer 2
    monkeypatch.undo()
    assert snap._catalog_current(root) == (True, 1)
