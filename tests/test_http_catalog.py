"""Network-catalog protocol tests — the commit seam over a real TCP
round-trip.

test_commit_race.py already drives the generic invariants (one winner
per slot, dense ids, storm convergence) over the ``http`` guard; this
file covers what is NEW once the catalog is remote:

* the CAS is durable the moment the server replies, so the torn-commit
  window moves: a writer killed AFTER the CAS has committed (readers
  must resolve the new id through the catalog past a stale CURRENT
  cache and a still-held lease), a writer killed BEFORE it has not
  (slot retryable);
* lost CAS replies are replayed idempotently (writer-unique manifest
  location as the fence — see ``sources/http_catalog`` module doc);
* a stolen lease (writer stalled past the TTL) cannot tear a commit —
  the stalled writer's CAS loses by comparison;
* descriptor attachment: refusal when another catalog owns the pointer,
  adoption of existing file-pointered history, adoption-on-first-commit
  for empty tables;
* maintenance (delete / compact / expire / vacuum) runs unmodified
  against an http-owned table, pruning the server-side loc map.

Reference parity: oval keeps ALL its state in the object store and has
no catalog at all (internal/s3client/s3client.go); the network catalog
is the piece a 100-TB multi-host deployment adds, so its failure modes
get first-class tests here rather than a claim-by-analogy to sqlite.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time
import uuid

import pytest

from tests.test_commit_race import _manifest, _write_data_dir


@pytest.fixture()
def http_table(tmp_path):
    """A table root attached to a fresh in-process catalog server."""
    from ovalspark.sources.http_catalog import CatalogServer, attach_http_catalog

    root = str(tmp_path / "http_table")
    os.makedirs(os.path.join(root, "manifest"))
    server = CatalogServer()
    endpoint = server.start()
    attach_http_catalog(root, endpoint)
    yield root, server, endpoint
    server.stop()


def _descriptor(root: str) -> dict:
    with open(os.path.join(root, "manifest", "catalog.json")) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# kill-mid-commit: both sides of the durable-CAS boundary


def _kill_after_cas_child(root: str) -> None:
    """Drive the commit protocol through the CAS, then die BEFORE the
    deferred CURRENT cache flip and the lease release — the widest
    window a remote-catalog writer can leave open."""
    from ovalspark.sources.http_catalog import HttpCatalogGuard
    from ovalspark.sources.snapshots import _atomic_write, _catalog_cas, _manifest_dir

    files = _write_data_dir(root, 2, 9, "doomed")
    g = HttpCatalogGuard(lease_ttl_s=1.0)
    g.acquire(root)
    loc = f"v2-{uuid.uuid4().hex[:8]}.json"
    _atomic_write(os.path.join(_manifest_dir(root), loc), json.dumps(_manifest(2, 1, files)))
    won = _catalog_cas(root, 1, 2, loc)
    _atomic_write(os.path.join(root, "cas_result"), str(bool(won)))
    os._exit(9)  # lease still held, CURRENT cache still at 1


def test_kill_after_cas_pointer_advanced_and_consistent(spark, http_table):
    """Once the server has applied the CAS the commit IS durable: the
    dead writer's id must be current and readable even though its
    CURRENT read-cache write never happened and its lease is still
    held (until TTL). The sqlite twin of this test asserts the OPPOSITE
    outcome — there, durability waits for the held transaction's COMMIT
    (test_catalog_pointer.test_kill_mid_commit_leaves_no_torn_pointer)."""
    from ovalspark.sources.snapshots import (
        _commit_manifest,
        current_snapshot_id,
        snapshot_read,
    )

    root, _, _ = http_table
    files1 = _write_data_dir(root, 1, 5, "seed")
    _commit_manifest(root, None, 1, _manifest(1, None, files1), "http")

    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_kill_after_cas_child, args=(root,))
    p.start()
    p.join(timeout=120)
    assert p.exitcode == 9
    with open(os.path.join(root, "cas_result")) as f:
        assert f.read() == "True"

    # stale cache file, authoritative catalog
    with open(os.path.join(root, "manifest", "CURRENT")) as f:
        assert f.read().strip() == "1"
    assert current_snapshot_id(root) == 2
    assert snapshot_read(spark, root).count() == 9

    # the dead holder's lease expires by TTL; the next writer proceeds
    files3 = _write_data_dir(root, 3, 4, "next")
    _commit_manifest(root, 2, 3, _manifest(3, 2, files3), "http")
    assert current_snapshot_id(root) == 3
    assert snapshot_read(spark, root).count() == 4


def _kill_before_cas_child(root: str) -> None:
    """Stage data and the manifest file, then die WITHOUT ever calling
    the CAS: nothing durable happened at the catalog."""
    from ovalspark.sources.http_catalog import HttpCatalogGuard
    from ovalspark.sources.snapshots import _atomic_write, _manifest_dir

    files = _write_data_dir(root, 2, 9, "doomed")
    g = HttpCatalogGuard(lease_ttl_s=1.0)
    g.acquire(root)
    loc = f"v2-{uuid.uuid4().hex[:8]}.json"
    _atomic_write(os.path.join(_manifest_dir(root), loc), json.dumps(_manifest(2, 1, files)))
    os._exit(9)


def test_kill_before_cas_slot_retryable(spark, http_table):
    from ovalspark.sources.snapshots import (
        _commit_manifest,
        current_snapshot_id,
        load_manifest,
        snapshot_read,
    )

    root, _, _ = http_table
    files1 = _write_data_dir(root, 1, 5, "seed")
    _commit_manifest(root, None, 1, _manifest(1, None, files1), "http")

    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_kill_before_cas_child, args=(root,))
    p.start()
    p.join(timeout=120)
    assert p.exitcode == 9

    assert current_snapshot_id(root) == 1
    with pytest.raises(FileNotFoundError):
        load_manifest(root, 2)

    # the dead writer's manifest debris cannot alias the retry's
    # (writer-unique filenames); the slot commits cleanly after TTL
    files2 = _write_data_dir(root, 2, 4, "retry")
    _commit_manifest(root, 1, 2, _manifest(2, 1, files2), "http")
    assert current_snapshot_id(root) == 2
    assert snapshot_read(spark, root, 2).count() == 4
    assert "retry" in load_manifest(root, 2)["files"][0]["path"]


# ---------------------------------------------------------------------------
# lost-reply replay + lease stealing


def test_lost_reply_replay_is_idempotent(http_table):
    """At-least-once delivery, exactly-once effect: replaying OUR win
    (same sid, same writer-unique loc) reports won again; a DIFFERENT
    writer's attempt at the taken slot still loses."""
    from ovalspark.sources import http_catalog as hc

    root, _, endpoint = http_table
    key = _descriptor(root)["key"]
    assert hc.client_cas(endpoint, key, None, 1, "v1-aaaa.json") is True
    # reply lost, client retries the identical request
    assert hc.client_cas(endpoint, key, None, 1, "v1-aaaa.json") is True
    assert hc.client_cas(endpoint, key, 1, 2, "v2-bbbb.json") is True
    assert hc.client_cas(endpoint, key, 1, 2, "v2-bbbb.json") is True  # replay
    # a rival who also resolved parent=1 must lose, replay or not
    assert hc.client_cas(endpoint, key, 1, 2, "v2-cccc.json") is False
    assert hc.client_current(endpoint, key) == (True, 2)
    assert hc.client_manifest_loc(endpoint, key, 2) == "v2-bbbb.json"


def test_lost_reply_confirmed_as_win_after_pointer_advanced(http_table):
    """The hard lost-reply case: our CAS was APPLIED, the reply was lost,
    and a rival committed a CHILD before our retry landed (lease
    exclusion not holding — mixed guards or TTL expiry). The server's
    replay fence no longer matches (pointer is past sid), but reporting
    a loss here would make _commit_manifest unlink the LIVE manifest and
    rmtree committed data. client_cas must confirm via the recorded
    writer-unique loc and report the win."""
    from ovalspark.sources import http_catalog as hc

    root, _, endpoint = http_table
    key = _descriptor(root)["key"]
    # writer A's CAS applies; the reply is "lost" (we ignore it)
    assert hc.client_cas(endpoint, key, None, 1, "v1-aaaa.json") is True
    assert hc.client_cas(endpoint, key, 1, 2, "v2-wa.json") is True
    # rival B commits a child on top of A's (durable) commit
    assert hc.client_cas(endpoint, key, 2, 3, "v3-wb.json") is True
    # A's connection-level retry of its own sid-2 commit: pointer is now
    # 3 — neither parent nor sid matches, yet A DID win slot 2
    assert hc.client_cas(endpoint, key, 1, 2, "v2-wa.json") is True
    # a genuine loser of slot 2 (different loc) still loses
    assert hc.client_cas(endpoint, key, 1, 2, "v2-loser.json") is False
    assert hc.client_current(endpoint, key) == (True, 3)
    assert hc.client_manifest_loc(endpoint, key, 2) == "v2-wa.json"


def test_malformed_requests_answer_400_without_retry_burn(http_table):
    """A bad request must be answered (400 + diagnosis), not abort the
    connection: an aborted connection is indistinguishable from a dead
    service, so the client would burn its full retry/backoff budget and
    misreport the catalog as unreachable."""
    import time as _t

    from ovalspark.sources import http_catalog as hc

    root, _, endpoint = http_table
    key = _descriptor(root)["key"]
    t0 = _t.monotonic()
    code, body = hc._request("GET", f"{endpoint}/t/{key}/manifest/not-an-int")
    assert code == 400 and "error" in body
    code, body = hc._request("POST", f"{endpoint}/t/{key}/commit", {"parent": None})
    assert code == 400 and "error" in body  # missing required "id"
    code, body = hc._request("POST", f"{endpoint}/t/{key}/lease", {"owner": "x"})
    assert code == 400 and "error" in body  # missing ttl_s
    # all three round-trips answered promptly — no backoff sleeps burned
    assert _t.monotonic() - t0 < 1.0


def test_stolen_lease_cannot_tear_commit(http_table):
    """Writer A stalls past its lease TTL; writer B takes the lease and
    commits the slot. A's CAS then LOSES by comparison — exclusion is an
    optimization, the CAS is the correctness (same division of labor as
    the sqlite guard, proven over the wire)."""
    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources.http_catalog import HttpCatalogGuard
    from ovalspark.sources.snapshots import _commit_manifest, current_snapshot_id

    root, _, endpoint = http_table
    key = _descriptor(root)["key"]
    files1 = _write_data_dir(root, 1, 3, "seed")
    _commit_manifest(root, None, 1, _manifest(1, None, files1), "http")

    a = HttpCatalogGuard(lease_ttl_s=0.2)
    a.acquire(root)  # A stalls here; never explicitly released
    time.sleep(0.25)  # TTL elapses

    files2 = _write_data_dir(root, 2, 4, "b-wins")
    _commit_manifest(root, 1, 2, _manifest(2, 1, files2), HttpCatalogGuard(lease_ttl_s=5.0))
    assert current_snapshot_id(root) == 2

    # A wakes and pushes its CAS for the slot it thinks is free
    assert hc.client_cas(endpoint, key, 1, 2, "v2-stale-a.json") is False
    assert hc.client_manifest_loc(endpoint, key, 2) != "v2-stale-a.json"


def test_lease_waits_for_holder_then_grants(http_table):
    from ovalspark.sources.http_catalog import HttpCatalogGuard

    root, _, _ = http_table
    a = HttpCatalogGuard(lease_ttl_s=0.4)
    token = a.acquire(root)
    b = HttpCatalogGuard(lease_ttl_s=0.4)
    with pytest.raises(TimeoutError):
        b.acquire(root, timeout_s=0.1)
    a.release(token)
    b.release(b.acquire(root, timeout_s=5.0))


# ---------------------------------------------------------------------------
# attachment / adoption


def test_attach_adopts_existing_file_pointered_history(spark, tmp_path):
    """Pre-attachment commits stay readable (v<sid>.json fallback);
    post-attachment commits route through the service under any guard
    name, and time travel spans the boundary."""
    from ovalspark.sources.http_catalog import CatalogServer, attach_http_catalog
    from ovalspark.sources.snapshots import (
        current_snapshot_id,
        snapshot_read,
        snapshot_write,
    )

    root = str(tmp_path / "attach_history")
    df = spark.range(10).selectExpr("cast(id as string) doc_id", "id v")
    snapshot_write(df, root, guard="flock")
    snapshot_write(df.limit(3), root, mode="append", guard="flock")

    server = CatalogServer()
    try:
        adopted = attach_http_catalog(root, server.start())
        assert adopted == 2
        # commits under the http guard AND under flock both route the
        # flip through the service now (descriptor, not guard, decides)
        snapshot_write(df.limit(2), root, mode="append", guard="http")
        snapshot_write(df.limit(1), root, mode="append", guard="flock")
        assert current_snapshot_id(root) == 4
        assert snapshot_read(spark, root).count() == 16
        assert snapshot_read(spark, root, 1).count() == 10  # pre-attachment
        assert snapshot_read(spark, root, 3).count() == 15  # post
    finally:
        server.stop()


def test_attach_empty_table_adopts_on_first_commit(spark, http_table):
    from ovalspark.sources.snapshots import current_snapshot_id, snapshot_write

    root, server, _ = http_table
    assert current_snapshot_id(root) is None
    df = spark.range(5).selectExpr("cast(id as string) doc_id")
    snapshot_write(df, root, guard="http")
    assert current_snapshot_id(root) == 1
    key = _descriptor(root)["key"]
    assert server._store.get_pointer(key) == 1


def test_attach_refuses_sqlite_owned_table(spark, tmp_path):
    """Pointer migration between catalogs is explicitly out of scope —
    attaching must refuse, not silently fork commit authority."""
    from ovalspark.sources.http_catalog import CatalogServer, attach_http_catalog
    from ovalspark.sources.snapshots import snapshot_write

    root = str(tmp_path / "sqlite_owned")
    df = spark.range(4).selectExpr("cast(id as string) doc_id")
    snapshot_write(df, root, guard="sqlite")  # adopts into sqlite catalog
    server = CatalogServer()
    try:
        with pytest.raises(ValueError, match="already catalog-owned"):
            attach_http_catalog(root, server.start())
    finally:
        server.stop()
    assert not os.path.exists(os.path.join(root, "manifest", "catalog.json"))


def test_adopt_helper_idempotent_over_http(spark, http_table):
    from ovalspark.sources.snapshots import adopt_catalog_pointer, snapshot_write

    root, _, _ = http_table
    df = spark.range(4).selectExpr("cast(id as string) doc_id")
    snapshot_write(df, root, guard="http")
    assert adopt_catalog_pointer(root, guard="http") == 1
    assert adopt_catalog_pointer(root, guard="http") == 1


# ---------------------------------------------------------------------------
# maintenance against an http-owned table


def test_maintenance_lifecycle_over_http(spark, http_table):
    """delete → compact → expire → vacuum against the network catalog:
    same sequence test_catalog_pointer runs against sqlite. Expire must
    prune the SERVER's loc map so vacuum and resolution agree."""
    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources.snapshots import (
        current_snapshot_id,
        expire_snapshots,
        snapshot_compact,
        snapshot_delete,
        snapshot_read,
        snapshot_write,
        vacuum,
    )

    root, _, endpoint = http_table
    key = _descriptor(root)["key"]
    df = spark.range(100).selectExpr("cast(id as string) doc_id", "id v")
    snapshot_write(df.repartition(6), root, guard="http")
    sid2 = snapshot_delete(spark, root, "v < 50", guard="http")
    assert snapshot_read(spark, root).count() == 50
    sid3 = snapshot_compact(spark, root, target_file_mb=64, guard="http")
    assert sid3 == sid2 + 1
    assert snapshot_read(spark, root).count() == 50

    expired = expire_snapshots(root, keep_last=2, guard="http", do_vacuum=False)
    assert expired == [1]
    # server-side loc map pruned in the same sweep
    locs = hc.client_manifest_locs(endpoint, key)
    assert 1 not in locs and {sid2, sid3} <= set(locs)

    removed = vacuum(root)
    assert removed  # sid1's pre-delete files are unreferenced now
    assert snapshot_read(spark, root).count() == 50
    assert current_snapshot_id(root) == sid3


# ---------------------------------------------------------------------------
# pointer migration sqlite -> http


def test_migrate_sqlite_owned_table_to_http(spark, tmp_path):
    """The two-phase move: pointer + every manifest-loc row land in the
    service, pre-migration history stays time-travelable (locs copied,
    not re-derived), and post-migration commits route through the
    service under ANY guard name."""
    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources.http_catalog import CatalogServer, migrate_pointer_to_http
    from ovalspark.sources.snapshots import (
        current_snapshot_id,
        snapshot_read,
        snapshot_write,
    )

    root = str(tmp_path / "mig_tbl")
    df = spark.range(10).selectExpr("cast(id as string) doc_id", "id v")
    snapshot_write(df, root, guard="sqlite")
    snapshot_write(df.limit(4), root, mode="append", guard="sqlite")
    server = CatalogServer()
    endpoint = server.start()
    try:
        assert migrate_pointer_to_http(root, endpoint) == 2
        key = _descriptor(root)["key"]
        assert hc.client_current(endpoint, key) == (True, 2)
        # every sqlite loc row traveled (catalog-owned commits have
        # writer-unique filenames only the loc map can resolve)
        assert set(hc.client_manifest_locs(endpoint, key)) == {1, 2}
        assert snapshot_read(spark, root, 1).count() == 10  # pre-migration history
        # commits under http AND under the old sqlite name both route
        # through the service now (descriptor decides, not guard)
        snapshot_write(df.limit(2), root, mode="append", guard="http")
        snapshot_write(df.limit(1), root, mode="append", guard="sqlite")
        assert current_snapshot_id(root) == 4
        assert hc.client_current(endpoint, key) == (True, 4)
        assert snapshot_read(spark, root).count() == 17
        # idempotent re-run returns the live pointer
        assert migrate_pointer_to_http(root, endpoint) == 4
    finally:
        server.stop()


def test_migrate_refusals(spark, tmp_path):
    from ovalspark.sources.http_catalog import (
        CatalogServer,
        attach_http_catalog,
        migrate_pointer_to_http,
    )
    from ovalspark.sources.snapshots import snapshot_write

    df = spark.range(4).selectExpr("cast(id as string) doc_id")
    server = CatalogServer()
    endpoint = server.start()
    try:
        # file-pointered table: attach, don't migrate
        root1 = str(tmp_path / "file_tbl")
        snapshot_write(df, root1, guard="flock")
        with pytest.raises(ValueError, match="attach_http_catalog"):
            migrate_pointer_to_http(root1, endpoint)
        # http-owned table, DIFFERENT endpoint: refuse the cross-service move
        root2 = str(tmp_path / "http_tbl")
        snapshot_write(df, root2, guard="flock")
        attach_http_catalog(root2, endpoint)
        with pytest.raises(ValueError, match="catalog-to-catalog"):
            migrate_pointer_to_http(root2, "http://127.0.0.1:1")
        # same endpoint: idempotent, returns live pointer
        assert migrate_pointer_to_http(root2, endpoint) == 1
    finally:
        server.stop()


def test_seed_conflicts_refused_idempotent_retry_ok(http_table):
    """/seed must never overwrite a live key: empty -> ok, byte-equal
    retry -> ok (crash between seed and flip), anything else -> 409."""
    from ovalspark.sources import http_catalog as hc

    root, _, endpoint = http_table
    assert hc.client_seed(endpoint, "mkey", 3, {1: "v1-a.json", 3: "v3-c.json"}) is True
    # idempotent retry of the identical payload
    assert hc.client_seed(endpoint, "mkey", 3, {1: "v1-a.json", 3: "v3-c.json"}) is True
    # conflicting pointer or locs: refused
    assert hc.client_seed(endpoint, "mkey", 4, {1: "v1-a.json"}) is False
    assert hc.client_seed(endpoint, "mkey", 3, {1: "v1-OTHER.json", 3: "v3-c.json"}) is False
    # a live (CAS-built) key is never seedable
    assert hc.client_cas(endpoint, "live", None, 1, "v1-x.json") is True
    assert hc.client_seed(endpoint, "live", 9, {9: "v9-z.json"}) is False


def test_writer_racing_migration_never_forks_authority(spark, tmp_path):
    """A writer appending in a loop under guard='sqlite' while the main
    thread migrates mid-stream: every append must land exactly once
    (dense chain, correct row total) and the final pointer must be
    http-owned — the racing writer either committed before the freeze,
    waited through it, or re-routed after the flip."""
    import threading

    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources.http_catalog import CatalogServer, migrate_pointer_to_http
    from ovalspark.sources.snapshots import (
        current_snapshot_id,
        snapshot_read,
        snapshot_write,
    )

    root = str(tmp_path / "race_mig")
    df = spark.range(8).selectExpr("cast(id as string) doc_id", "id v")
    snapshot_write(df, root, guard="sqlite")

    n_appends = 6
    errors: list = []

    def writer():
        try:
            for _ in range(n_appends):
                snapshot_write(df.limit(2), root, mode="append", guard="sqlite")
        except Exception as e:  # noqa: BLE001 — surfaced in the assert below
            errors.append(e)

    server = CatalogServer()
    endpoint = server.start()
    try:
        t = threading.Thread(target=writer)
        t.start()
        time.sleep(0.3)  # let a few appends land under sqlite first
        migrated = migrate_pointer_to_http(root, endpoint)
        t.join(timeout=300)
        assert not errors, errors
        assert migrated >= 1
        assert current_snapshot_id(root) == 1 + n_appends
        key = _descriptor(root)["key"]
        assert hc.client_current(endpoint, key) == (True, 1 + n_appends)
        assert snapshot_read(spark, root).count() == 8 + 2 * n_appends
        # post-migration commits continue the same chain
        snapshot_write(df.limit(3), root, mode="append", guard="http")
        assert current_snapshot_id(root) == 2 + n_appends
    finally:
        server.stop()


def test_cas_rereads_descriptor_under_lock(spark, tmp_path, monkeypatch):
    """Deterministic TOCTOU reproduction: _catalog_cas reads the
    descriptor BEFORE taking the sqlite write lock. A writer under a
    non-sqlite guard that read descriptor=None, then blocked on the
    migration's freeze, must NOT win a CAS against the now-shadowed
    sqlite rows (its commit would be invisible to http readers — a
    lost commit / forked authority). The fix re-reads the descriptor
    once BEGIN IMMEDIATE succeeds and re-routes to http."""
    import sqlite3

    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources import snapshots as sn
    from ovalspark.sources.http_catalog import CatalogServer, migrate_pointer_to_http

    root = str(tmp_path / "toctou")
    df = spark.range(4).selectExpr("cast(id as string) doc_id", "id v")
    sn.snapshot_write(df, root, guard="sqlite")
    server = CatalogServer()
    endpoint = server.start()
    try:
        migrate_pointer_to_http(root, endpoint)
        key = _descriptor(root)["key"]
        assert hc.client_current(endpoint, key) == (True, 1)

        # simulate the pre-flip read: first descriptor call sees None
        real = sn._catalog_descriptor
        calls = {"n": 0}

        def stale_first(r):
            calls["n"] += 1
            return None if calls["n"] == 1 else real(r)

        monkeypatch.setattr(sn, "_catalog_descriptor", stale_first)
        won = sn._catalog_cas(root, 1, 2, "fake-loc-v2.json")
        assert won is True
        assert calls["n"] >= 2  # the under-lock re-read happened
        # the commit landed in the SERVICE, not the shadowed sqlite rows
        assert hc.client_current(endpoint, key) == (True, 2)
        con = sqlite3.connect(sn._catalog_db_path(root))
        row = con.execute("SELECT id FROM current WHERE k='CURRENT'").fetchone()
        con.close()
        assert row[0] == 1  # shadowed store untouched
    finally:
        server.stop()
