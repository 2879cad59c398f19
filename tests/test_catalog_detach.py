"""http -> sqlite catalog DETACH (the inverse migration) and journal
disaster recovery — round-8 Missing #4: sqlite->http shipped, but
decommissioning a catalog service (or recovering from its journal after
it died) required manual surgery.

Protocol invariants under test:

* round-trip sqlite -> http -> sqlite preserves pointer, history
  resolution, and the refs keyspace (tags keep pinning);
* commits route locally after detach under any guard name;
* a writer racing the detach can never fork authority: the server
  answers 410 from the tombstone transaction onward, and the client
  reroutes through the (shared-root) descriptor;
* a detach CRASHED between server tombstone and descriptor flip
  self-heals: the next commit finishes the flip and lands locally;
* double-detach is idempotent;
* ``recover_table_from_journal`` rebuilds the local catalog from the
  dead service's sqlite journal file with no server round-trip.
"""

from __future__ import annotations

import json
import os
import sqlite3

import pytest


def _mk_http_table(spark, tmp_path, store_path=None):
    from ovalspark.sources.http_catalog import CatalogServer, attach_http_catalog
    from ovalspark.sources.snapshots import snapshot_write

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "manifest"))
    server = CatalogServer(store_path=store_path)
    endpoint = server.start()
    attach_http_catalog(root, endpoint)
    df = spark.range(20).selectExpr("cast(id as string) doc_id", "id v")
    snapshot_write(df, root, guard="http")
    snapshot_write(df.limit(5), root, mode="append", guard="http")
    return root, server, endpoint


def test_detach_round_trip_preserves_state(spark, tmp_path):
    """sqlite -> http -> sqlite: pointer, time travel, tags, and the
    expired-tombstone discipline all survive both moves."""
    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources.http_catalog import CatalogServer, migrate_pointer_to_http
    from ovalspark.sources.snapshots import (
        _refs_authority,
        create_tag,
        current_snapshot_id,
        expire_snapshots,
        list_tags,
        snapshot_read,
        snapshot_write,
    )

    root = str(tmp_path / "t")
    df = spark.range(20).selectExpr("cast(id as string) doc_id", "id v")
    snapshot_write(df, root, guard="sqlite")
    snapshot_write(df.limit(5), root, mode="append", guard="sqlite")
    create_tag(root, "golden", snapshot_id=1)
    snapshot_write(df.limit(2), root, mode="append", guard="sqlite")
    expired = expire_snapshots(root, keep_last=1, guard="sqlite", do_vacuum=False)
    assert expired == [2]  # sid1 is tag-pinned; sid2 tombstoned

    server = CatalogServer()
    endpoint = server.start()
    try:
        assert migrate_pointer_to_http(root, endpoint) == 3
        assert _refs_authority(root)[0] == "http"
        # ... live on http for a commit ...
        snapshot_write(df.limit(1), root, mode="append", guard="http")
        # detach: authority comes home
        assert hc.detach_http_catalog(root) == 4
        assert _refs_authority(root) == ("sqlite",)
        assert current_snapshot_id(root) == 4
        assert list_tags(root) == {"golden": 1}
        assert snapshot_read(spark, root, snapshot_id=1).count() == 20
        # the expired tombstone traveled: sid2 cannot be tagged back
        with pytest.raises((ValueError, FileNotFoundError)):
            create_tag(root, "ghost", snapshot_id=2)
        # commits route locally now, under any guard name
        snapshot_write(df.limit(3), root, mode="append", guard="sqlite")
        snapshot_write(df.limit(4), root, mode="append", guard="flock")
        assert current_snapshot_id(root) == 6
        con = sqlite3.connect(os.path.join(root, "manifest", "catalog.db"))
        assert con.execute("SELECT id FROM current").fetchone()[0] == 6
        con.close()
        # double-detach is an idempotent no-op returning the live pointer
        assert hc.detach_http_catalog(root) == 6
        # tag pinning still enforced locally
        expired = expire_snapshots(root, keep_last=1, guard="sqlite", do_vacuum=False)
        assert 1 not in expired
        assert list_tags(root) == {"golden": 1}
    finally:
        server.stop()


def test_stale_writer_cannot_fork_after_detach(spark, tmp_path):
    """A writer that still talks to the server after the detach gets
    410 everywhere; its commit reroutes through the descriptor and
    lands in the LOCAL catalog — never in the shadowed server state."""
    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources.snapshots import current_snapshot_id, snapshot_write

    root, server, endpoint = _mk_http_table(spark, tmp_path)
    try:
        with open(os.path.join(root, "manifest", "catalog.json")) as f:
            key = json.load(f)["key"]
        assert hc.detach_http_catalog(root) == 2
        # direct server access is dead for the key
        with pytest.raises(hc.CatalogDetachedError):
            hc.client_current(endpoint, key)
        with pytest.raises(hc.CatalogDetachedError):
            hc.client_cas(endpoint, key, 2, 3, "v3-forged.json")
        # a normal commit (descriptor already flipped) lands locally
        df = spark.range(3).selectExpr("cast(id as string) doc_id", "id v")
        snapshot_write(df, root, mode="append", guard="flock")
        assert current_snapshot_id(root) == 3
        con = sqlite3.connect(os.path.join(root, "manifest", "catalog.db"))
        assert con.execute("SELECT id FROM current").fetchone()[0] == 3
        con.close()
    finally:
        server.stop()


def test_crashed_flip_self_heals_on_next_commit(spark, tmp_path):
    """Detach died between the server tombstone and the descriptor
    flip: the table still SAYS http, the server answers 410. The next
    commit finishes the flip (idempotent re-detach) and lands locally —
    no operator intervention, no lost commit."""
    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources.snapshots import current_snapshot_id, snapshot_write

    root, server, endpoint = _mk_http_table(spark, tmp_path)
    try:
        with open(os.path.join(root, "manifest", "catalog.json")) as f:
            key = json.load(f)["key"]
        # simulate the crash: server-side detach happened, flip did not
        ptr, locs, refs = hc.client_detach(endpoint, key)
        assert ptr == 2
        assert os.path.exists(os.path.join(root, "manifest", "catalog.json"))
        # next commit self-heals: finishes the flip, commits locally
        df = spark.range(3).selectExpr("cast(id as string) doc_id", "id v")
        snapshot_write(df, root, mode="append", guard="flock")
        assert not os.path.exists(os.path.join(root, "manifest", "catalog.json"))
        assert current_snapshot_id(root) == 3
        con = sqlite3.connect(os.path.join(root, "manifest", "catalog.db"))
        assert con.execute("SELECT id FROM current").fetchone()[0] == 3
        assert dict(con.execute("SELECT id, loc FROM manifests").fetchall())
        con.close()
    finally:
        server.stop()


def test_round_trip_then_two_process_race(spark, tmp_path):
    """After sqlite -> http -> sqlite, the commit CAS still admits
    exactly one winner per slot across two OS processes — the race
    suite's invariant holds at the round-trip's final stop (and the
    http stop is covered by test_commit_race[http] standing)."""
    import multiprocessing as mp

    from tests.test_commit_race import _manifest, _race_child, _write_data_dir

    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources.http_catalog import CatalogServer, migrate_pointer_to_http
    from ovalspark.sources.snapshots import (
        _commit_manifest,
        current_snapshot_id,
        snapshot_read,
    )

    root = str(tmp_path / "t")
    files1 = _write_data_dir(root, 1, 5, "seed")
    _commit_manifest(root, None, 1, _manifest(1, None, files1), "sqlite")
    server = CatalogServer()
    endpoint = server.start()
    try:
        assert migrate_pointer_to_http(root, endpoint) == 1
        assert hc.detach_http_catalog(root) == 1
    finally:
        server.stop()

    ctx = mp.get_context("spawn")
    barrier, q = ctx.Barrier(2), ctx.Queue()
    procs = [
        ctx.Process(target=_race_child, args=(root, "sqlite", n, tag, barrier, q))
        for tag, n in (("alpha", 3), ("beta", 7))
    ]
    [p.start() for p in procs]
    [p.join(timeout=120) for p in procs]
    assert all(p.exitcode == 0 for p in procs), [p.exitcode for p in procs]
    results = {t: s for t, s, _ in (q.get(timeout=10), q.get(timeout=10))}
    assert sorted(results.values()) == ["lost", "ok"], results
    assert current_snapshot_id(root) == 2
    assert snapshot_read(spark, root, 1).count() == 5


def test_recover_from_journal_after_service_death(spark, tmp_path):
    """The service is gone for good; its sqlite journal survives.
    Recovery rebuilds pointer + locs + refs locally and removes the
    descriptor — the table is fully usable again."""
    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources.snapshots import (
        create_tag,
        current_snapshot_id,
        list_tags,
        snapshot_read,
        snapshot_write,
    )

    journal = str(tmp_path / "journal.db")
    root, server, endpoint = _mk_http_table(spark, tmp_path, store_path=journal)
    create_tag(root, "pinned", snapshot_id=1)
    server.stop()  # the "disaster": service never comes back

    assert hc.recover_table_from_journal(journal, root) == 2
    assert current_snapshot_id(root) == 2
    assert list_tags(root) == {"pinned": 1}
    assert snapshot_read(spark, root, snapshot_id=1).count() == 20
    df = spark.range(2).selectExpr("cast(id as string) doc_id", "id v")
    snapshot_write(df, root, mode="append", guard="sqlite")
    assert current_snapshot_id(root) == 3

    # refusal path: a journal with no rows for the key
    empty = str(tmp_path / "empty.db")
    con = sqlite3.connect(empty)
    con.execute("CREATE TABLE pointers (k TEXT PRIMARY KEY, id INTEGER NOT NULL)")
    con.execute("CREATE TABLE manifest_locs (k TEXT, id INTEGER, loc TEXT NOT NULL)")
    con.execute("CREATE TABLE refs (k TEXT, name TEXT, val TEXT NOT NULL)")
    con.commit()
    con.close()
    with pytest.raises(ValueError, match="no pointer"):
        hc.recover_table_from_journal(empty, root, key="whatever")
