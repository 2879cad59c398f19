"""Catalog-owned refs: tags (and branch descriptors) follow the table's
POINTER AUTHORITY instead of living in root-local JSON.

Round-8 finding: tags lived in ``TAGS.json`` while a catalog-owned
table's pointer lived in sqlite/http — two sources of truth, so on a
shared-nothing deployment tag mutations raced outside the catalog's CAS
and the retention sweep's pin set could be stale relative to a
concurrent tag (expiring a snapshot that was being tagged). Now refs
route through ``snapshots._refs_authority``: the same store that owns
the pointer owns the refs, the pin re-check happens INSIDE the expiry
transaction, and expiry leaves ``expired:<sid>`` tombstones so a tag
racing the file unlink is refused instead of pinning a ghost.

Reference parity: oval keeps its whole resume context in ONE atomically
saved checkpoint (/root/reference/internal/runner/runner.go:250-273) —
one source of truth for restartable state; these tests pin the same
discipline for the table's named refs.
"""

from __future__ import annotations

import json
import os
import sqlite3

import pytest


def _mk_table(spark, root, guard):
    from ovalspark.sources.snapshots import snapshot_write

    df = spark.range(30).selectExpr("cast(id as string) doc_id", "id v")
    snapshot_write(df, root, guard=guard)
    snapshot_write(df.limit(5), root, mode="append", guard=guard)
    snapshot_write(df.limit(3), root, mode="append", guard=guard)


def test_sqlite_authority_tags_live_in_catalog_db(spark, tmp_path):
    """A sqlite-owned table's tags are rows in catalog.db (CAS +
    crash-durability of the database), not TAGS.json; the whole tag API
    is unchanged above the seam."""
    from ovalspark.sources.snapshots import (
        _refs_authority,
        create_tag,
        delete_tag,
        list_tags,
        resolve_tag,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root, guard="sqlite")
    assert _refs_authority(root) == ("sqlite",)
    assert create_tag(root, "audited", snapshot_id=2, guard="sqlite") == 2
    assert list_tags(root) == {"audited": 2}
    assert resolve_tag(root, "audited") == 2
    # stored in the catalog, NOT in the root-local file
    assert not os.path.exists(os.path.join(root, "manifest", "TAGS.json"))
    con = sqlite3.connect(os.path.join(root, "manifest", "catalog.db"))
    rows = dict(con.execute("SELECT name, val FROM refs").fetchall())
    con.close()
    assert rows == {"tag:audited": "2"}
    # immutability + delete semantics unchanged
    with pytest.raises(ValueError, match="immutable"):
        create_tag(root, "audited", snapshot_id=3)
    delete_tag(root, "audited")
    assert list_tags(root) == {}
    with pytest.raises(KeyError):
        delete_tag(root, "audited")


def test_http_authority_tag_visible_cross_host(spark, tmp_path):
    """A tag created through host A's catalog is visible to host B with
    NO shared filesystem: host B holds only the catalog descriptor
    (endpoint + table key), and list/resolve route every byte through
    the service."""
    from ovalspark.sources.http_catalog import CatalogServer, attach_http_catalog
    from ovalspark.sources.snapshots import (
        _manifest_dir,
        create_tag,
        list_tags,
        resolve_tag,
    )

    root_a = str(tmp_path / "host_a")
    os.makedirs(os.path.join(root_a, "manifest"))
    server = CatalogServer()
    endpoint = server.start()
    try:
        attach_http_catalog(root_a, endpoint)
        _mk_table(spark, root_a, guard="http")
        create_tag(root_a, "published", snapshot_id=1)

        # host B: descriptor only — no manifests, no data, no TAGS.json
        root_b = str(tmp_path / "host_b")
        os.makedirs(os.path.join(root_b, "manifest"))
        with open(os.path.join(_manifest_dir(root_a), "catalog.json")) as f:
            desc = f.read()
        with open(os.path.join(_manifest_dir(root_b), "catalog.json"), "w") as f:
            f.write(desc)
        assert list_tags(root_b) == {"published": 1}
        assert resolve_tag(root_b, "published") == 1
    finally:
        server.stop()


@pytest.mark.parametrize("guard", ["sqlite", "http"])
def test_tag_pins_against_expiry_catalog_owned(spark, tmp_path, guard):
    """The retention sweep re-reads the pin set inside the CATALOG
    transaction, so a catalog-owned tag protects its snapshot exactly as
    the file-authority tag does."""
    from ovalspark.sources.snapshots import (
        create_tag,
        expire_snapshots,
        list_tags,
        snapshot_read,
    )

    root = str(tmp_path / "t")
    server = None
    if guard == "http":
        from ovalspark.sources.http_catalog import CatalogServer, attach_http_catalog

        os.makedirs(os.path.join(root, "manifest"))
        server = CatalogServer()
        attach_http_catalog(root, server.start())
    try:
        _mk_table(spark, root, guard=guard)
        create_tag(root, "keep", snapshot_id=1, guard=guard)
        expired = expire_snapshots(root, keep_last=1, guard=guard, do_vacuum=False)
        assert expired == [2]  # 1 pinned by the tag, 3 by keep_last
        assert snapshot_read(spark, root, snapshot_id=1).count() == 30
        assert list_tags(root) == {"keep": 1}
    finally:
        if server is not None:
            server.stop()


def test_stale_expiry_candidate_loses_to_racing_tag(spark, tmp_path):
    """The exact round-8 race, driven deterministically: a sweeper
    computes its candidate list, a tagger on another host pins one of
    the candidates, THEN the sweeper's catalog transaction runs — the
    re-check inside the transaction must drop the newly-pinned id."""
    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources.http_catalog import CatalogServer, attach_http_catalog
    from ovalspark.sources.snapshots import snapshot_read

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "manifest"))
    server = CatalogServer()
    endpoint = server.start()
    try:
        attach_http_catalog(root, endpoint)
        _mk_table(spark, root, guard="http")
        with open(os.path.join(root, "manifest", "catalog.json")) as f:
            key = json.load(f)["key"]
        # sweeper computed candidates [1, 2]; tagger lands on 2 after
        won, reason = hc.client_tag_create(endpoint, key, "late-tag", 2)
        assert won and reason == "ok"
        approved = hc.client_expire(endpoint, key, [1, 2])
        assert approved == [1]  # 2 re-checked as pinned inside the txn
        assert snapshot_read(spark, root, snapshot_id=2).count() == 35
    finally:
        server.stop()


@pytest.mark.parametrize("guard", ["sqlite", "http"])
def test_tag_after_expiry_refused_by_tombstone(spark, tmp_path, guard):
    """Expiry tombstones its ids in the SAME transaction that drops the
    loc rows, so the other interleaving of the race — tag lands after
    the sweep committed but perhaps before/while files unlink — is
    refused loudly instead of pinning a ghost snapshot."""
    from ovalspark.sources.snapshots import create_tag, expire_snapshots

    root = str(tmp_path / "t")
    server = None
    if guard == "http":
        from ovalspark.sources.http_catalog import CatalogServer, attach_http_catalog

        os.makedirs(os.path.join(root, "manifest"))
        server = CatalogServer()
        attach_http_catalog(root, server.start())
    try:
        _mk_table(spark, root, guard=guard)
        assert expire_snapshots(root, keep_last=2, guard=guard, do_vacuum=False) == [1]
        with pytest.raises((ValueError, FileNotFoundError)):
            create_tag(root, "too-late", snapshot_id=1, guard=guard)
    finally:
        if server is not None:
            server.stop()


def test_branch_descriptor_is_catalog_state_cross_host(spark, tmp_path):
    """On a catalog-owned table the branch descriptor (existence +
    published flag) is a catalog ref: host B, holding only the
    descriptor file, sees the branch and its publish state, and a
    create of the same name from host B loses the insert CAS."""
    from ovalspark.sources.branches import (
        BranchError,
        create_branch,
        drop_branch,
        list_branches,
        publish_branch,
    )
    from ovalspark.sources.http_catalog import CatalogServer, attach_http_catalog
    from ovalspark.sources.snapshots import _manifest_dir, snapshot_write

    root_a = str(tmp_path / "host_a")
    os.makedirs(os.path.join(root_a, "manifest"))
    server = CatalogServer()
    endpoint = server.start()
    try:
        attach_http_catalog(root_a, endpoint)
        _mk_table(spark, root_a, guard="http")
        broot = create_branch(root_a, "audit")
        df = spark.range(4).selectExpr("cast(id as string) doc_id", "id v")
        snapshot_write(df, broot)

        root_b = str(tmp_path / "host_b")
        os.makedirs(os.path.join(root_b, "manifest"))
        with open(os.path.join(_manifest_dir(root_a), "catalog.json")) as f:
            desc = f.read()
        with open(os.path.join(_manifest_dir(root_b), "catalog.json"), "w") as f:
            f.write(desc)
        assert "audit" in list_branches(root_b)
        assert not list_branches(root_b)["audit"].get("published")

        sid = publish_branch(root_a, "audit", mode="append", guard="http")
        assert list_branches(root_b)["audit"]["published"]["main_sid"] == sid
        # a second publish refused even from the other host's view
        with pytest.raises(BranchError, match="already published"):
            publish_branch(root_b, "audit", mode="append", guard="http")
        drop_branch(root_a, "audit")
        assert "audit" not in list_branches(root_b)
    finally:
        server.stop()


def test_migration_carries_tags_and_keeps_pinning(spark, tmp_path):
    """sqlite -> http pointer migration moves the refs keyspace in the
    same freeze transaction: the tag resolves through the service
    afterwards and still pins its snapshot against expiry."""
    from ovalspark.sources import http_catalog as hc
    from ovalspark.sources.http_catalog import CatalogServer, migrate_pointer_to_http
    from ovalspark.sources.snapshots import (
        _refs_authority,
        create_tag,
        expire_snapshots,
        list_tags,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root, guard="sqlite")
    create_tag(root, "golden", snapshot_id=1, guard="sqlite")
    server = CatalogServer()
    endpoint = server.start()
    try:
        assert migrate_pointer_to_http(root, endpoint) == 3
        assert _refs_authority(root)[0] == "http"
        assert list_tags(root) == {"golden": 1}
        with open(os.path.join(root, "manifest", "catalog.json")) as f:
            key = json.load(f)["key"]
        assert hc.client_refs(endpoint, key, "tag") == {"tag:golden": "1"}
        assert expire_snapshots(root, keep_last=1, guard="http", do_vacuum=False) == [2]
        assert list_tags(root) == {"golden": 1}
    finally:
        server.stop()
